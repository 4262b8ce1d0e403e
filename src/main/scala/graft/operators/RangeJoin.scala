package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join — all (left, right) pairs with the same key and
  * right.time within [left.time + lower, left.time + upper) milliseconds.
  *
  * Spark plans a raw `l.k === r.k && r.t between …` as a shuffle join whose
  * range half evaluates row-by-row inside the same key — fine — but a
  * range-only (or hot-key) workload degenerates to nested loops over huge
  * key groups. This operator makes the time dimension part of the JOIN KEY:
  * time is bucketed at width = (upper - lower), each left row explodes into
  * the (at most 2) buckets its window overlaps, the join is a pure equi-join
  * on (key, bucket), and the exact predicate filters the survivors. Work is
  * proportional to true matches + one bucket of slop per row — never
  * |key group|², and the shuffle is a plain hash partition on (key, bucket),
  * so AQE's skew splitting applies to hot buckets like any other join.
  */
object RangeJoin {

  def bucketedRangeJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      lowerMs: Long, upperMs: Long): DataFrame = {
    require(upperMs > lowerMs, "upper bound must exceed lower bound")
    require(keyCols.nonEmpty, "bucketedRangeJoin needs at least one key column")
    val overlap = (left.columns.toSet intersect right.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(", ")} exist on both sides — " +
        "alias one side first (the equi-join would silently merge them)")
    val reserved = Set("__lt", "__rt", "__bkt", "__lo", "__hi")
    val taken = (left.columns ++ right.columns).filter(reserved).distinct
    require(taken.isEmpty,
      s"input columns ${taken.mkString(", ")} collide with the operator's " +
        "internal names — rename them first")
    val width = upperMs - lowerMs

    // timestamp columns convert to epoch millis; numeric columns are
    // already in caller units (lower/upper then share those units)
    def ms(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_millis(col(c))
        case _ => col(c).cast("long")
      }
    val lt = ms(left, leftTime)
    val rt = ms(right, rightTime)

    // exact integer floorDiv — (a - pmod(a, w)) / w — keeps negative epochs
    // and bucket boundaries exact; the left window [lt+lower, lt+upper)
    // spans at most 2 width-sized buckets
    // pure long arithmetic end to end: (a - pmod(a,w)) is the floor
    // multiple, and SQL `div` divides it exactly in integer space — no
    // double round-trip, so caller-unit times beyond 2^53 (e.g. epoch
    // nanos) still bucket correctly
    def bkt(c: String): Column =
      expr(s"($c - pmod($c, ${width}L)) div ${width}L")
    val l = left
      .withColumn("__lt", lt)
      .withColumn("__lo", col("__lt") + lit(lowerMs))
      .withColumn("__hi", col("__lt") + lit(upperMs) - 1)
      .withColumn("__bkt",
        explode(array_distinct(array(bkt("__lo"), bkt("__hi")))))
      .drop("__lo", "__hi")
    val r = right
      .withColumn("__rt", rt)
      .withColumn("__bkt", bkt("__rt"))

    l.join(r, keyCols :+ "__bkt")
      .filter(col("__rt") >= col("__lt") + lit(lowerMs) &&
        col("__rt") < col("__lt") + lit(upperMs))
      .drop("__bkt", "__lt", "__rt")
  }
}
