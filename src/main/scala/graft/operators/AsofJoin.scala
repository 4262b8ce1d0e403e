package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the most recent right
  * row with the same key and right.time ≤ left.time (or < when `strict`).
  * The operator every time-series/feature-store pipeline needs and Spark
  * lacks natively (beyond-reference surface; DuckDB ships it as ASOF JOIN,
  * which is exactly the oracle twin).
  *
  * Implementation is the union-and-carry-forward plan, NOT a range join:
  * both sides union into one stream, one window per key ordered by
  * (time, side) carries the latest right payload forward, and left rows
  * project it out. One shuffle on the key, per-key sorted windows (no
  * global ordering, no quadratic candidate pairs, no range-explosion) —
  * the shape that survives a 100 TB event log with hot keys bounded by
  * per-key data, never corpus size.
  *
  * Tie rule: at equal timestamps the right row is visible to the left row
  * unless `strict`. Right rows must be unique per (key, time) — duplicate
  * right timestamps have no deterministic winner (the same ambiguity
  * DuckDB's ASOF JOIN has); pre-aggregate the right side to one row per
  * (key, time) first.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(payloadCols.nonEmpty, "asofJoin needs right payload columns")
    val clash = payloadCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"right payload columns ${clash.mkString(", ")} already exist on the " +
        "left side — alias them before joining")
    val reserved = Set("__t", "__side", "__m", "__asof_time") ++
      payloadCols.map(c => s"__p_$c")
    val taken = (left.columns ++ right.columns).filter(reserved).distinct
    require(taken.isEmpty,
      s"input columns ${taken.mkString(", ")} collide with the operator's " +
        "internal/output names — rename them first")

    // right rows sort before left at equal time (<=); after it when strict
    val rightSide = if (strict) 2 else 0
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // SQL as-of semantics: a NULL right time satisfies no inequality, so
    // those rows can never match — drop them (they would otherwise sort
    // nulls-first and be carried forward as phantom matches). A NULL LEFT
    // time also sorts first, sees no surviving right row, and correctly
    // yields a NULL match.
    val r = right
      .filter(col(rightTime).isNotNull)
      .select(
        (keyCols.map(col) :+ col(rightTime).as("__t")) ++
          payloadCols.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__side", lit(rightSide))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry ONE struct (never null on a right row), not per-column values:
    // a NULL payload on the matched row must surface as NULL, not fall
    // through to an older right row
    val isRight = col("__side") =!= 1
    val pkg = when(isRight, struct(
      (col("__t").as("__asof_time") +:
        payloadCols.map(c => col(s"__p_$c").as(c))): _*))
    val carried = unioned
      .withColumn("__m", last(pkg, ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((left.columns.map(col) :+
        col("__m.__asof_time").as("__asof_time")) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
