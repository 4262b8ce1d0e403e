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

  test("Tables.loadBucketed materializes once and joins co-located") {
    import graft.core.Tables
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem_l_orderkey_8")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders_o_orderkey_8")
    val li = Tables.loadBucketed(spark, sf, "lineitem", Seq("l_orderkey"), 8)
    val ord = Tables.loadBucketed(spark, sf, "orders", Seq("o_orderkey"), 8)
    // second call reuses the managed table (no rewrite): same files listed
    val files1 = li.inputFiles.toSeq.sorted
    val again = Tables.loadBucketed(spark, sf, "lineitem", Seq("l_orderkey"), 8)
    assert(again.inputFiles.toSeq.sorted == files1)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert("Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(p).isEmpty, s"loadBucketed join should be co-located:\n$p")
    // correctness parity with the plain scans
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(joined.collect().map(_.toString).sorted.toSeq == plain)
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem_l_orderkey_8")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders_o_orderkey_8")
  }

  test("date-partitioned layout prunes partitions at the scan") {
    // the canonical 100 TB layout: facts partitioned by day → time-range
    // queries read only matching directories (PartitionFilters, zero I/O on
    // the rest) — the Spark twin of the reference's index range scan.
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    val ev = graft.core.Tables.load(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("day") === lit("2024-01-02").cast("date"))
      .agg(count(lit(1)).as("n"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    // correctness: equals the unpartitioned filter
    val expect = ev.filter(col("day") === lit("2024-01-02").cast("date")).count()
    assert(q.head().getLong(0) == expect)
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
