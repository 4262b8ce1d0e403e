package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deliberate skew handling for joins whose hot keys overwhelm even AQE's
  * runtime skew-split (e.g. a power-law key joining a non-broadcastable
  * medium table). Standard salting: the skewed (probe) side gets a
  * deterministic salt in [0, saltFactor); the build side is replicated
  * saltFactor×; the join key becomes (key, salt), fanning each hot key out
  * over saltFactor reducers.
  *
  * Deterministic salt (hash of the full row, not rand()) keeps results
  * reproducible run-to-run — required by the correctness harness.
  */
object Skew {

  def saltedJoin(
      skewed: DataFrame,
      build: DataFrame,
      key: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched build row saltFactor times
    // (the build side is replicated); only probe-side-preserving joins are
    // sound under salting (round-1 advice)
    require(Set("inner", "left", "leftouter", "left_outer", "semi",
      "leftsemi", "left_semi", "anti", "leftanti", "left_anti")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti joins, not $joinType")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toSeq: _*)), lit(saltFactor))
        .cast("int"))
    val replicatedRight = build
      .withColumn("__salt", explode(lit((0 until saltFactor).toArray)))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt"),
        joinType)
      .drop(replicatedRight(key)).drop(saltedLeft("__salt"))
      .drop(replicatedRight("__salt"))
  }
}
