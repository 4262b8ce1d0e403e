package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators over the `events` stream (beyond-reference surface —
  * the reference has no dataflow streaming at all, SURVEY §2.9; its async
  * layer is request scheduling). Structured Streaming is the Spark-native
  * model: same DataFrame transforms, incremental execution, watermark-driven
  * state eviction.
  *
  * Every operator has a batch twin with identical semantics so correctness
  * is provable against the DuckDB oracle (batch) and the streaming path is
  * asserted equal to the batch path in StreamingSpec.
  */
object Sessions {

  final case class SessionEvent(
      user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)

  final case class UserSession(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long, total_value: Double)

  // public: the state encoder's generated code must see the constructor
  final case class SessState(startMs: Long, endMs: Long, n: Long, total: Double)

  /** Tumbling/sliding window aggregation — works identically on a batch
    * DataFrame and a streaming one (watermark added only when streaming). */
  def windowedAgg(events: DataFrame, duration: String, slide: Option[String] = None,
      watermark: Option[String] = None): DataFrame = {
    val wm = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    val win = slide.map(s => window(col("ts"), duration, s))
      .getOrElse(window(col("ts"), duration))
    wm.groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total"))
  }

  /** Batch sessionization: split each user's event sequence on inactivity
    * gaps > gapMinutes (classic lag + cumulative-sum session ids — two
    * window passes over one shuffle by user_id). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("__ms", unix_millis(col("ts")))
      .withColumn("__prev", lag(col("__ms"), 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev").isNull || col("__ms") - col("__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("__ms")).as("start_ms"),
        max(col("__ms")).as("end_ms"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("__sid")
  }

  /** Streaming sessionization via flatMapGroupsWithState: sessions emit when
    * the event-time watermark passes their gap window. State per user is one
    * open session (bounded memory); eviction is watermark-driven, so a
    * 1000-executor deployment holds |active users| state, not |events|. */
  def sessionizeStream(events: Dataset[SessionEvent], gapMinutes: Int,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, evs: Iterator[SessionEvent],
        state: GroupState[SessState]): Iterator[UserSession] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
      if (state.hasTimedOut) {
        state.getOption.foreach(s =>
          out += UserSession(userId, s.startMs, s.endMs, s.n, s.total))
        state.remove()
      } else {
        var cur = state.getOption
        evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case None => cur = Some(SessState(t, t, 1L, e.value))
            case Some(s) if t - s.endMs <= gapMs =>
              cur = Some(SessState(s.startMs, math.max(s.endMs, t),
                s.n + 1, s.total + e.value))
            case Some(s) =>
              out += UserSession(userId, s.startMs, s.endMs, s.n, s.total)
              cur = Some(SessState(t, t, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Streaming exact dedup: watermark-bounded dropDuplicates on an id —
    * the streaming twin of d01 exact dedup. */
  def dedupStream(events: DataFrame, idCols: Seq[String], watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicates(idCols :+ "ts")

  /** Stream-stream interval join: events of two streams with equal keys
    * whose timestamps lie within `withinMinutes` of each other. Both sides
    * carry watermarks so join state is evicted (bounded memory — the
    * requirement for unbounded runs at scale). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      withinMinutes: Int, watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("l")
    val r = right.withWatermark("ts", watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts").between(
          col("l.ts") - expr(s"INTERVAL $withinMinutes MINUTES"),
          col("l.ts") + expr(s"INTERVAL $withinMinutes MINUTES")))
  }

  /** Left-outer stream-stream interval join: like [[intervalJoin]], but
    * left events with no match within the interval emit once with a
    * null-padded right side — after the watermark passes their interval,
    * which is when "no match" becomes provable in an unbounded stream.
    * Spark requires exactly this shape (both-side watermarks + a time
    * bound) for outer stream-stream joins; state stays bounded. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, key: String,
      withinMinutes: Int, watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("l")
    val r = right.withWatermark("ts", watermarkDelay).alias("r")
    val joined = l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts").between(
          col("l.ts") - expr(s"INTERVAL $withinMinutes MINUTES"),
          col("l.ts") + expr(s"INTERVAL $withinMinutes MINUTES")),
      "left_outer")
    // disambiguate the null-padded right side (r_*) so downstream sinks
    // see unique column names
    joined.select(
      left.columns.toSeq.map(c => col(s"l.$c")) ++
        right.columns.toSeq.map(c => col(s"r.$c").as(s"r_$c")): _*)
  }

  /** Streaming dedup where the id alone is the identity:
    * dropDuplicatesWithinWatermark dedups ids whose duplicates arrive
    * within the watermark delay of each other, without keying state on the
    * exact event time (the [[dedupStream]] contract). State per id is
    * evicted once the watermark passes — the right semantics when
    * duplicates cluster in time (retries, at-least-once sources). */
  def dedupStreamWithinWatermark(events: DataFrame, idCols: Seq[String],
      watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Batch twin of [[dedupStreamWithinWatermark]] with a DETERMINISTIC
    * keep-rule: per id, keep the earliest event — min `tsCol`, tie broken
    * by min `tieCol` (the streaming operator keeps the first ARRIVAL; when
    * the source replays in (ts, tie) order the two coincide, pinned in
    * StreamingSpec). Implementation is a struct-min aggregation, not a
    * window: partial (map-side) aggregation applies and the one shuffle
    * carries a single row per (partition, id) rather than every event —
    * the shape that survives a 100 TB replay. */
  def dedupBatchEarliest(events: DataFrame, idCols: Seq[String],
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val rest = events.columns.filterNot(idCols.contains).toSeq
    // (ts, tie) leads the struct so min() picks earliest-then-smallest-tie;
    // remaining fields ride along and never influence the order because
    // (ts, tie) is unique per event
    val ordered = (Seq(tsCol, tieCol) ++ rest.filterNot(c =>
      c == tsCol || c == tieCol)).map(c => col(c).as(c))
    val agg = events.groupBy(idCols.map(col): _*)
      .agg(min(struct(ordered: _*)).as("__e"))
    agg.select(events.columns.toSeq.map { c =>
      if (idCols.contains(c)) col(c) else col(s"__e.$c").as(c)
    }: _*)
  }

  /** Drain-all run: process everything available, then stop —
    * Trigger.AvailableNow gives batch-job semantics (and batch-job cluster
    * autoscaling) over the streaming code path, the standard way to run a
    * streaming pipeline as a scheduled backfill. Blocks until done. */
  def runAvailableNow(stream: DataFrame, path: String, checkpoint: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", path)
      .start()
    q.awaitTermination()
  }

  /** Write-path trigger hook — the Spark-native stand-in for the
    * reference's row triggers (api/Trigger.java, fired at Insert.update,
    * Insert.java:157-161): `onBatch` observes every micro-batch before it
    * commits to `path`. Returns the started query (caller stops it). */
  def writeWithTrigger(stream: DataFrame, path: String, checkpoint: String)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        onBatch(batch.toDF(), id)
        batch.write.mode("append").parquet(path)
      }
      .start()
}
