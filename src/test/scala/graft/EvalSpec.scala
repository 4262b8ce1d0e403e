package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

/** Exact model-eval statistics (t37's operator) against hand-computed
  * fixtures — the rank-sum AUC convention (unique ranks by (score, id)),
  * the confusion counts, and the derived IEEE metrics. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ranks ascending by (score, id): 0.1→1(T) 0.3→2(F) 0.4→3(F)
  // 0.7→4(T) 0.8→5(F) 0.9→6(T); rank-sum of positives = 1+4+6 = 11
  private lazy val fix = Seq(
    (1L, 0.9, true, true), (2L, 0.8, false, true),
    (3L, 0.7, true, true), (4L, 0.4, false, false),
    (5L, 0.1, true, false), (6L, 0.3, false, false))
    .toDF("id", "s", "y", "p")

  test("hand-computed fixture: rank sum, confusion, AUC = 5/9, P=R=F1=2/3") {
    val st = Eval.binaryEvalStats(fix, "id", "s", "y", "p")
    assert(st == Eval.BinaryEvalStats(6, 3, 3, 11, 2, 1, 1, 2))
    assert(st.auc.contains(5.0 / 9.0))
    assert(st.precision.contains(2.0 / 3.0))
    assert(st.recall.contains(2.0 / 3.0))
    assert(st.f1.contains(2.0 / 3.0))
    // partitioning-independent: the per-partition offset pass must agree
    // with the single-partition run whatever the layout
    val st7 = Eval.binaryEvalStats(fix.repartition(7), "id", "s", "y", "p")
    val st1 = Eval.binaryEvalStats(fix.coalesce(1), "id", "s", "y", "p")
    assert(st7 == st && st1 == st)
  }

  test("score ties rank by id (the documented deterministic convention)") {
    // equal scores: ranks 1..4 assigned by ascending id → positives
    // (ids 2, 4) take ranks 2 and 4; AUC = (6 − 3)/4 = 0.75 — the id
    // tie-break is a CONVENTION, not midrank smoothing (an all-tied
    // score column reads as id-ordered, which is why production callers
    // tie-break on a meaningful id; both twin sides share the rule)
    val tied = Seq((1L, 0.5, false, false), (2L, 0.5, true, true),
      (3L, 0.5, false, false), (4L, 0.5, true, true)).toDF("id", "s", "y", "p")
    val st = Eval.binaryEvalStats(tied, "id", "s", "y", "p")
    assert(st.rankSumPos == 6 && st.auc.contains(0.75))
  }

  test("degenerate classes: one-class AUC is NULL, empty input all-zero; " +
      "NULL labels/preds count as false") {
    val onePos = fix.withColumn("y", lit(true))
    assert(Eval.binaryEvalStats(onePos, "id", "s", "y", "p").auc.isEmpty)
    val empty = Eval.binaryEvalStats(fix.limit(0), "id", "s", "y", "p")
    assert(empty == Eval.BinaryEvalStats(0, 0, 0, 0, 0, 0, 0, 0) &&
      empty.auc.isEmpty && empty.precision.isEmpty && empty.f1.isEmpty)
    val withNulls = Seq((1L, 0.9, Some(true), Some(true)),
      (2L, 0.8, None, Some(true)), (3L, 0.1, Some(true), None))
      .toDF("id", "s", "y", "p")
    val st = Eval.binaryEvalStats(withNulls, "id", "s", "y", "p")
    assert(st == Eval.BinaryEvalStats(3, 2, 1, 4, 1, 1, 1, 0))
    // NULL score ranks LOWEST (coalesced to -inf on both twin sides):
    // a null-scored positive takes rank 1, not a nondeterministic slot
    val nullScore = Seq((1L, Some(0.5), false, false),
      (2L, None: Option[Double], true, false)).toDF("id", "s", "y", "p")
    assert(Eval.binaryEvalStats(nullScore, "id", "s", "y", "p")
      .rankSumPos == 1L)
  }

  test("calibration: fixed-edge buckets clamp outliers into end bins, " +
      "exact counts + one-division rates") {
    val df = Seq((0.05, true), (0.15, false), (0.15, true),
      (-5.0, false), (99.0, true)).toDF("s", "y")
    val got = Eval.calibration(df, "s", "y", lo = 0.0, width = 0.1,
        buckets = 10)
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(0) == ((0.0, 2L, 1L, 0.5))) // 0.05 + the clamped -5.0
    assert(got(1) == ((0.1, 2L, 1L, 0.5))) // the two 0.15s
    assert(got(9) == ((0.9, 1L, 1L, 1.0))) // clamped 99.0
    assert(got.size == 3) // empty bins are absent, not zero rows
  }

  test("binaryEval row shape: metrics surface once per (model, cls)") {
    val df = Eval.binaryEval(fix, "id", "s", "y", "p", "m1", "c1")
    val r = df.head()
    assert(df.count() == 1 && r.getString(0) == "m1" &&
      r.getString(1) == "c1" && r.getLong(5) == 11L &&
      r.getDouble(10) == 5.0 / 9.0)
    // perfect separation sanity: scores aligned with labels → AUC 1.0
    val perfect = Seq((1L, 0.9, true, true), (2L, 0.2, false, false),
      (3L, 0.8, true, true), (4L, 0.1, false, false)).toDF("id", "s", "y", "p")
    assert(Eval.binaryEvalStats(perfect, "id", "s", "y", "p")
      .auc.contains(1.0))
  }
}
