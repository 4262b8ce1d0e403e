package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join — the streaming twin of
  * [[graft.operators.AsofJoin.asofJoin]] with arrival-order semantics:
  * each left event matches the latest right event with the same key and
  * event time ≤ its own, among the rights that have ARRIVED so far
  * (previous micro-batches + the same batch, which is sorted by event
  * time with rights before lefts at ties, exactly the batch tie rule).
  *
  * State per key is the list of right rows still above the watermark
  * horizon, PLUS one carry row below it (the newest sub-horizon right —
  * still the floor match for future lefts); with a watermark the store is
  * bounded by per-key arrival rate × delay, the same contract as Spark's
  * own stream-stream joins. Without a watermark nothing evicts (full
  * batch parity at unbounded-state cost).
  *
  * Equivalence contract: for events arriving within the watermark delay
  * of event time, emitted matches equal the batch operator's output;
  * StreamAsofSpec pins batch-mode ≡ streaming ≡
  * [[graft.operators.AsofJoin]]. A right event arriving after a left it
  * should have matched (beyond-delay late data) is the inherent
  * stream/batch gap.
  *
  * Fixed record shape (the [[StreamDedup]] convention): key long, event
  * time as timestamp column `ts`, left rows carry `id` long, right rows
  * carry `payload` double.
  */
object StreamAsof {

  final case class AsofRec(side: Int, k: Long, ms: Long, id: Long,
      payload: Double)
  final case class RightRow(ms: Long, payload: Double)
  final case class RightBuf(rights: List[RightRow]) // ascending by ms
  final case class AsofMatch(id: Long, k: Long, ms: Long,
      asof_ms: Option[Long], payload: Option[Double])

  /** `left` columns: id long, k long, ts timestamp.
    * `right` columns: k long, ts timestamp, payload double. */
  def asofJoinStream(
      left: DataFrame, right: DataFrame,
      watermarkDelay: Option[String] = None): Dataset[AsofMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    def wm(df: DataFrame) =
      watermarkDelay.map(d => df.withWatermark("ts", d)).getOrElse(df)

    val l = wm(left).select(lit(1).as("side"), col("k"),
      unix_millis(col("ts")).as("ms"), col("id"), lit(0.0).as("payload"))
    val r = wm(right).filter(col("ts").isNotNull)
      .select(lit(0).as("side"), col("k"), unix_millis(col("ts")).as("ms"),
        lit(-1L).as("id"), col("payload"))

    def fn(key: Long, recs: Iterator[AsofRec],
        state: GroupState[RightBuf]): Iterator[AsofMatch] = {
      // ascending buffer of rights; List ops are O(per-key batch) — the
      // production-scale variant would hold an ordered map, the contract
      // is identical
      var buf = state.getOption.map(_.rights).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
      // event time, rights before lefts at ties, id for determinism —
      // the batch operator's exact ordering
      recs.toSeq.sortBy(rec => (rec.ms, rec.side, rec.id)).foreach { rec =>
        if (rec.side == 0) {
          val (le, gt) = buf.partition(_.ms <= rec.ms)
          buf = le ::: RightRow(rec.ms, rec.payload) :: gt
        } else {
          out += (buf.takeWhile(_.ms <= rec.ms).lastOption match {
            case Some(rr) =>
              AsofMatch(rec.id, key, rec.ms, Some(rr.ms), Some(rr.payload))
            case None => AsofMatch(rec.id, key, rec.ms, None, None)
          })
        }
      }
      // evict below the watermark horizon, keeping the newest sub-horizon
      // right: it remains the floor match for any future left ≥ horizon
      val horizon = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
      if (horizon > 0) {
        val (below, above) = buf.partition(_.ms < horizon)
        buf = below.lastOption.toList ::: above
      }
      state.update(RightBuf(buf))
      out.iterator
    }

    l.unionByName(r).as[AsofRec]
      .groupByKey(_.k)
      .flatMapGroupsWithState[RightBuf, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
