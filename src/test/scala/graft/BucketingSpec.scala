package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY "Partitioning & shuffle" mandate):
  * pre-bucketing both fact tables on the join key lets repeated joins run
  * with ZERO exchanges — the Spark-native equivalent of the reference's
  * clustered primary-key locality. Also: parquet footer aggregate pushdown =
  * the reference's index-only quick aggregate (Select.queryQuick,
  * Select.java:904 — COUNT/MIN/MAX answered from metadata, no scan).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    for (t <- Seq("li_bkt", "ord_bkt")) { // clear stale managed locations
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    val li = graft.core.Tables.load(spark, sf, "lineitem")
    val ord = graft.core.Tables.load(spark, sf, "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bkt")

    // force the non-broadcast path — at real scale both sides are too big
    // to broadcast and bucketing is exactly what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_bkt")
      .join(spark.table("ord_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    // the join itself needs no exchange — bucket layout co-locates both sides
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    val exchangesBeforeAgg = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(p).length
    assert(exchangesBeforeAgg == 0, s"join should be co-located:\n$p")

    // correctness unchanged vs the plain join
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(joined.collect().map(_.toString).sorted.toSeq == plain)
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
  }

  test("parquet footer aggregate pushdown answers COUNT/MIN/MAX without a scan") {
    // quick-aggregate needs the v2 parquet source (v1 FileScan can't push aggs)
    val v1Default = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      v1Default.split(",").filterNot(_.trim == "parquet").mkString(","))
    try {
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(expr("count(*)").as("n"), min(col("l_quantity")).as("mn"),
          max(col("l_quantity")).as("mx"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation"), p)
      val got = df.head()
      // values match the full-scan computation
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.set("spark.sql.sources.useV1SourceList", v1Default)
      val full = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(expr("count(*)"), min(col("l_quantity")), max(col("l_quantity"))).head()
      assert(got == full)
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.set("spark.sql.sources.useV1SourceList", v1Default)
    }
  }
}
