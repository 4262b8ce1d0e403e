package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-pipeline model-quality evaluation (VERDICT r9 directive 4): the
  * pipelines train models (t33 classifier, t35 lang-id) — this grades
  * them, EXACTLY, so the metrics themselves hash-verify against the
  * DuckDB twin.
  *
  * AUC is the Mann-Whitney rank-sum: with every row ranked by
  * (score, id) — the id tie-break makes ranks UNIQUE and the statistic
  * deterministic (the documented convention both sides share; midrank
  * tie handling would put query-time division inside the rank) —
  * AUC = (Σ ranks of positives − nPos(nPos+1)/2) / (nPos·nNeg): an
  * integer numerator and one IEEE division, bit-identical across
  * engines.
  *
  * The rank-sum is computed WITHOUT a global window (the
  * [[Sampling.packSequences]] offset shape): range-repartition by
  * (score, id), sort within partitions, one pass collecting per-partition
  * (rows, positives, local rank-sum, confusion counts) — #partitions
  * driver rows — then each partition's local positive rank-sum shifts by
  * its global row offset. At 100 TB the eval split flows through one
  * range exchange + one per-partition scan; no partition ever holds more
  * than its share and nothing corpus-sized reaches the driver. */
object Eval {

  /** Exact confusion + rank statistics of one binary task. All counts are
    * exact longs; the derived metrics are single IEEE operations over
    * them (mirrored verbatim by the SQL twin). `rankSumPos` overflows
    * long only past ~4.3e9 evaluated rows — an eval-split bound, not a
    * corpus bound. */
  final case class BinaryEvalStats(n: Long, nPos: Long, nNeg: Long,
      rankSumPos: Long, tp: Long, fp: Long, fn: Long, tn: Long) {
    def auc: Option[Double] =
      if (nPos == 0 || nNeg == 0) None
      else Some((rankSumPos - nPos * (nPos + 1) / 2).toDouble /
        (nPos.toDouble * nNeg.toDouble))
    def precision: Option[Double] =
      if (tp + fp == 0) None else Some(tp.toDouble / (tp + fp).toDouble)
    def recall: Option[Double] =
      if (tp + fn == 0) None else Some(tp.toDouble / (tp + fn).toDouble)
    def f1: Option[Double] =
      for { p <- precision; r <- recall; if p + r > 0.0 }
        yield 2.0 * p * r / (p + r)
  }

  /** Compute [[BinaryEvalStats]] for (score, label, pred) columns; NULL
    * labels/preds count as false (the SQL twin's CASE WHEN semantics),
    * and a NULL score ranks LOWEST — coalesced to −∞ on BOTH twin sides,
    * because the engines' bare NULL orderings disagree (Spark ascending
    * is NULLS FIRST, DuckDB's default is NULLS LAST — a latent
    * divergence the coalesce removes outright). */
  def binaryEvalStats(df: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, predCol: String): BinaryEvalStats = {
    val base = df.select(
      coalesce(col(scoreCol).cast("double"),
        lit(Double.NegativeInfinity)).as("__s"),
      col(idCol).cast("long").as("__id"),
      coalesce(col(labelCol).cast("boolean"), lit(false)).as("__y"),
      coalesce(col(predCol).cast("boolean"), lit(false)).as("__p"))
    val ordered = base.repartitionByRange(col("__s"), col("__id"))
      .sortWithinPartitions(col("__s"), col("__id"))
    // one pass per partition; result is #partitions driver rows
    val parts = ordered.rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; var pos = 0L; var localSum = 0L
      var tp = 0L; var fp = 0L; var fn = 0L; var tn = 0L
      it.foreach { r =>
        n += 1
        val y = r.getBoolean(2); val p = r.getBoolean(3)
        if (y) { pos += 1; localSum += n }
        if (y && p) tp += 1 else if (!y && p) fp += 1
        else if (y && !p) fn += 1 else tn += 1
      }
      Iterator((i, n, pos, localSum, tp, fp, fn, tn))
    }.collect().sortBy(_._1)
    val offsets = parts.map(_._2).scanLeft(0L)(_ + _)
    val rankSum = parts.zipWithIndex
      .map { case (p, i) => p._4 + offsets(i) * p._3 }.sum
    val n = parts.map(_._2).sum; val nPos = parts.map(_._3).sum
    BinaryEvalStats(n, nPos, n - nPos, rankSum,
      parts.map(_._5).sum, parts.map(_._6).sum,
      parts.map(_._7).sum, parts.map(_._8).sum)
  }

  /** Calibration (reliability) table: scores bucketed on FIXED literal
    * edges — bucket b covers [lo + b·w, lo + (b+1)·w), clamped to
    * [0, buckets) so outliers land in the end bins — with exact long
    * counts per bin and the observed positive rate as one IEEE division.
    * A well-calibrated score has obs_rate tracking the bin midpoint;
    * the judge of that is the CALLER — this operator only measures.
    * One hash aggregate over (buckets) rows; no window, no sort. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      lo: Double, width: Double, buckets: Int): DataFrame = {
    require(width > 0.0 && buckets > 0)
    val b = least(lit(buckets - 1), greatest(lit(0),
      floor((col(scoreCol).cast("double") - lit(lo)) / lit(width))
        .cast("int")))
    df.select(b.as("bucket"),
        coalesce(col(labelCol).cast("boolean"), lit(false)).as("__y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bucket"),
        (lit(lo) + col("bucket").cast("double") * lit(width)).as("bin_lo"),
        col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("obs_rate"))
  }

  private val evalSchema = StructType(Seq(
    StructField("model", StringType, nullable = false),
    StructField("cls", StringType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("n_pos", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("rank_sum_pos", LongType, nullable = false),
    StructField("tp", LongType, nullable = false),
    StructField("fp", LongType, nullable = false),
    StructField("fn", LongType, nullable = false),
    StructField("tn", LongType, nullable = false),
    StructField("auc", DoubleType, nullable = true),
    StructField("prec", DoubleType, nullable = true),
    StructField("rec", DoubleType, nullable = true),
    StructField("f1", DoubleType, nullable = true)))

  /** One (model, cls) metrics row as a DataFrame — union rows across
    * models/classes for a full eval report (t37's shape). */
  def binaryEval(df: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, predCol: String, model: String,
      cls: String): DataFrame = {
    val st = binaryEvalStats(df, idCol, scoreCol, labelCol, predCol)
    val row = Row(model, cls, st.n, st.nPos, st.nNeg, st.rankSumPos,
      st.tp, st.fp, st.fn, st.tn, st.auc.orNull, st.precision.orNull,
      st.recall.orNull, st.f1.orNull)
    df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(row), evalSchema)
  }
}
