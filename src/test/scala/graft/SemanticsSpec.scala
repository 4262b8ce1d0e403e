package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distribution-parity checks (SURVEY §7 step 5) and the A5 semantic
  * edge-case checklist from the reference's tests: Spark's partial/final
  * aggregation must reproduce the coordinator-side MergedResult semantics
  * (Select.queryGroupMerge / Select.calculate) regardless of partitioning.
  */
class SemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def results(name: String, s: SparkSession): Seq[String] =
    SparkEntry.queries(name)(s, sf)
      .collect().map(_.toString).sorted.toSeq

  test("partial/final agg parity: 1 partition == 32 partitions (MergedResult)") {
    // Same session, different shuffle parallelism per query via conf swap:
    // AVG/STDDEV/GROUP_CONCAT decomposition must not depend on partitioning.
    val names = Seq("q01_pricing_summary", "q20_stats_decomposed",
      "q24_group_concat", "q43_group_concat_udaf", "q45_histogram_udaf")
    for (n <- names) {
      val many = results(n, spark)
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      try {
        val one = results(n, spark)
        assert(one == many, s"$n differs between 1 and 32 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("A5: sum(boolean) counts true rows (Aggregate.java:577-580)") {
    val df = Seq(true, true, false, true).toDF("b")
    val n = df.agg(sum($"b".cast("int"))).head().getLong(0)
    assert(n == 3)
  }

  test("A5: scalar subquery — 0 rows → NULL, >1 rows → error (Subquery.java:37-49)") {
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("sq_t")
    Seq(10, 20).toDF("x").createOrReplaceTempView("sq_m")
    // 0 rows → NULL
    val r = spark.sql("SELECT (SELECT x FROM sq_m WHERE x > 99) AS s").head()
    assert(r.isNullAt(0))
    // >1 rows → runtime error
    val e = intercept[Exception] {
      spark.sql("SELECT (SELECT x FROM sq_m) AS s").collect()
    }
    assert(e.getMessage.toUpperCase.contains("MORE THAN ONE ROW") ||
      e.getMessage.contains("SCALAR_SUBQUERY_TOO_MANY_ROWS"))
  }

  test("A5: set ops match positionally with conversion to left types (SelectUnion.java:113)") {
    val left = Seq((1, "a")).toDF("x", "y")
    val right = Seq(("2", 5.0)).toDF("p", "q") // different names AND types
    val u = left.unionByName(right.toDF("x", "y"), allowMissingColumns = false)
    // positional union through our Engine path: column names come from LEFT
    assert(left.union(right.select($"p".cast("int"), $"q".cast("string"))).columns.toSeq
      == Seq("x", "y"))
  }

  test("A5: outer-join filter on null-supplying side stays post-join") {
    // filter on right column of LEFT join must not eliminate null rows
    val l = Seq(1, 2, 3).toDF("k")
    val r = Seq((1, 10)).toDF("k2", "v")
    val joined = l.join(r, $"k" === $"k2", "left")
    // WHERE v IS NULL keeps the padded rows — 2 of them
    assert(joined.filter($"v".isNull).count() == 2)
    // and an ON-clause-only filter keeps all left rows
    val onFiltered = l.join(r.filter($"v" > 100), $"k" === $"k2", "left")
    assert(onFiltered.count() == 3)
  }

  test("A5: NULLS sort low by default (SortOrder.java:55 parity)") {
    val df = Seq(Some(2), None, Some(1)).toDF("x")
    // H2 default: nulls first on ASC — Spark's asc is also nulls-first
    val got = df.orderBy($"x".asc).collect().map(r =>
      if (r.isNullAt(0)) -999 else r.getInt(0)).toSeq
    assert(got == Seq(-999, 1, 2))
  }

  test("H2 type mapping: decimal arithmetic keeps exactness (SURVEY §1.1)") {
    val df = Seq(("1234567890123.45", "0.10")).toDF("a", "b")
      .select($"a".cast("decimal(18,2)").as("a"), $"b".cast("decimal(4,2)").as("b"))
    val r = df.select(($"a" * $"b").as("p"), ($"a" + $"b").as("s")).head()
    assert(r.getDecimal(0).toString == "123456789012.3450")
    assert(r.getDecimal(1).toString == "1234567890123.55")
  }
}
