package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Dumps per-doc token xxhash64 values and the simhash so an external
  * reimplementation (the DuckDB oracle generator) can be validated
  * bit-for-bit before it becomes d04's oracle. Dev tool, not a driver
  * entry point. */
object HashDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = filter(split(Dedup.normalize(col("text")), " "), t => length(t) > 0)
    docs.select(
        col("doc_id"),
        toks.as("tokens"),
        transform(toks, t => xxhash64(t)).as("token_hashes"),
        Dedup.simhashColumn(col("text")).as("simhash"))
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
