package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog bootstrap over the driver parquet corpus (TESTDATA.md).
  *
  * Mirrors the reference's Database → Schema → Table registry
  * (lealone-db/src/main/java/org/lealone/db/schema/Schema.java) as a plain
  * view registry over parquet directories — SURVEY §1.2. Spark's catalog +
  * parquet footers replace Lealone's DDL-declared fixed schemas; schemas are
  * self-describing, and Catalyst gets pushdown/pruning for free.
  */
object Tables {

  /** All corpus tables (TPC-H-ish star schema + events/documents/embeddings). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark has no nanosecond
    // timestamp type, so the session reads it as nanos-since-epoch long
    // (spark.sql.legacy.parquet.nanosAsLong) and we surface micros.
    if (name == "events")
      df.withColumn("ts",
        // integer div, not `/` — double division loses precision at 1e18 ns
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every corpus table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
