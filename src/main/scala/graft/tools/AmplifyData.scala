package graft.tools

import org.apache.spark.sql.functions._

/** Materialize a k×-amplified copy of a driver SF dir (VERDICT r11
  * directive 5): every fact table replicated k× with per-copy key offsets
  * (key → key·k + i), so each copy is a disjoint, internally-consistent
  * sub-database and every join cardinality scales exactly k×. Dimension
  * tables (region/nation) copy unchanged — at 100 TB the dims stay
  * broadcast-sized too. The scheme is ScaleStress's clone discipline,
  * materialized to parquet so the UNMODIFIED graft.Bench can run the
  * full headline set at sf1-equivalent facts.
  * Usage: runMain graft.tools.AmplifyData [srcDir] [outDir] [k] */
object AmplifyData {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val src = a.headOption.getOrElse("/root/testdata/sf0.1")
    val out = a.lift(1).getOrElse("/tmp/graft_sfa")
    val k = a.lift(2).map(_.toInt).getOrElse(10)
    // key columns to offset per table: primary keys AND the foreign keys
    // that reference an offset primary key — never the dim keys
    val offsetKeys: Seq[(String, Seq[String])] = Seq(
      "region" -> Nil,
      "nation" -> Nil,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    offsetKeys.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val amp =
        if (keys.isEmpty) df
        else (0 until k).map { i =>
          keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) * k + i))
        }.reduce(_ unionByName _)
      amp.write.mode("overwrite").parquet(s"$out/$t.parquet")
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"[amplify] $t rows=$n")
    }
    spark.stop()
  }
}
