package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessions
import graft.streaming.Sessions.{SessionEvent, UserSession}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, String, String, Double)]) =
    rows.map { case (u, ts, et, v) =>
      SessionEvent(u, java.sql.Timestamp.valueOf(ts), et, v)
    }.toDF("user_id", "ts", "event_type", "value")

  private lazy val fixture = mkEvents(Seq(
    (1L, "2024-01-01 10:00:00", "view", 1.0),
    (1L, "2024-01-01 10:10:00", "click", 2.0),   // same session (10m gap)
    (1L, "2024-01-01 11:30:00", "view", 3.0),    // new session (80m gap)
    (2L, "2024-01-01 10:05:00", "view", 5.0),    // user 2, one session
    (2L, "2024-01-01 10:20:00", "purchase", 7.0)))

  private lazy val docFixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "ok"),                                       // too short -> dropped
    (3L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"),   // digit-heavy -> dropped
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("streaming quality filter equals the batch operator (stateless parity)") {
    import graft.streaming.TextPipeline
    val dir = Files.createTempDirectory("graft_qstream").toFile.getAbsolutePath
    docFixture.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = TextPipeline.qualityFilterStream(
        spark.readStream.schema(docFixture.schema).parquet(dir), "text")
      .writeStream.format("memory").queryName("graft_qf")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("graft_qf")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    val batch = TextPipeline.qualityFilterStream(docFixture, "text")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    assert(streamed == batch)
    assert(streamed.map(_._1) == Seq(1L, 4L)) // the gate actually fired
  }

  test("streaming chunking equals the batch operator (stateless parity)") {
    import graft.streaming.TextPipeline
    val dir = Files.createTempDirectory("graft_cstream").toFile.getAbsolutePath
    docFixture.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = TextPipeline.chunkStream(
        spark.readStream.schema(docFixture.schema).parquet(dir),
        "doc_id", "text", chunkTokens = 5, overlap = 2)
      .writeStream.format("memory").queryName("graft_ck")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val streamed = canon(spark.table("graft_ck"))
    val batch = canon(graft.operators.TextAnalysis.chunkText(
      docFixture, "doc_id", "text", chunkTokens = 5, overlap = 2))
    assert(streamed == batch)
    // overlap shape: doc 1 has 13 tokens -> chunks at strides of 3
    assert(streamed.filter(_._1 == 1L).map(_._2) == Seq(0L, 1L, 2L, 3L))
    assert(streamed.count(_._1 == 5L) == 0) // empty doc yields no chunks
  }

  test("rolling corpus stats: streaming with watermark equals batch (t18 twin)") {
    import graft.streaming.TextPipeline
    // timestamped doc stream across two windows and two sources
    val docs = Seq(
      (1L, "src_a", "2024-01-01 10:05:00",
        "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "src_a", "2024-01-01 10:40:00", "ok"), // quality-dropped
      (3L, "src_b", "2024-01-01 10:15:00",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (4L, "src_a", "2024-01-01 11:10:00",
        "another useful document with plenty of alphabetic words in this hour")
    ).map { case (id, src, ts, tx) =>
      (id, src, java.sql.Timestamp.valueOf(ts), tx)
    }.toDF("doc_id", "source", "ts", "text")
    val dir = Files.createTempDirectory("graft_rcs").toFile.getAbsolutePath
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = TextPipeline.rollingCorpusStats(
        spark.readStream.schema(docs.schema).parquet(dir),
        "ts", "source", "text", "1 hour", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("graft_rcs")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .filter(_._2 != "zz_sentinel").sortBy(t => (t._1, t._2)).toSeq
    val streamed = try {
      q.processAllAvailable()
      // push the watermark past every window end → append mode flushes all
      Seq((99L, "zz_sentinel",
          java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), "late marker"))
        .toDF("doc_id", "source", "ts", "text")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.processAllAvailable()
      canon(spark.table("graft_rcs"))
    } finally q.stop()
    val batch = canon(TextPipeline.rollingCorpusStats(
      docs, "ts", "source", "text", "1 hour"))
    assert(streamed == batch)
    // and the windows actually aggregated: 10:00 src_a has 2 docs, 1 kept
    val h10a = batch.find(t =>
      t._1 == java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime &&
        t._2 == "src_a").get
    assert(h10a._3 == 2L && h10a._6 == 1L && h10a._7 == 0.5)
  }

  test("rolling distinct sketch: streaming with watermark equals batch, " +
      "equals the t20 bounded-heap path (t21 twin)") {
    import graft.streaming.TextPipeline
    // two windows × two sources; src_a's 10:00 window crosses k=4 so the
    // ESTIMATE path runs; multi-batch arrival exercises the sketch MERGE
    val docs = Seq(
      (1L, "src_a", "2024-01-01 10:05:00", "apple banana cherry date egg"),
      (2L, "src_a", "2024-01-01 10:40:00", "apple fig grape hazelnut"),
      (3L, "src_b", "2024-01-01 10:15:00", "alpha beta"),
      (4L, "src_a", "2024-01-01 11:10:00", "iris jasmine")
    ).map { case (id, src, ts, tx) =>
      (id, src, java.sql.Timestamp.valueOf(ts), tx)
    }.toDF("doc_id", "source", "ts", "text")
    val dir = Files.createTempDirectory("graft_rkmv").toFile.getAbsolutePath
    docs.filter($"doc_id" <= 2).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = TextPipeline.rollingDistinctTokens(
        spark.readStream.schema(docs.schema).parquet(dir),
        "ts", "source", "text", "1 hour", k = 4,
        watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("graft_rkmv")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .filter(_._2 != "zz_sentinel").sortBy(t => (t._1, t._2)).toSeq
    val streamed = try {
      q.processAllAvailable()
      // later docs in a SECOND file → a second microbatch merges sketches
      docs.filter($"doc_id" > 2).union(
        Seq((99L, "zz_sentinel",
          java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), "late marker"))
          .toDF("doc_id", "source", "ts", "text"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.processAllAvailable()
      canon(spark.table("graft_rkmv"))
    } finally q.stop()
    val batch = canon(TextPipeline.rollingDistinctTokens(
      docs, "ts", "source", "text", "1 hour", k = 4))
    assert(streamed == batch)
    // src_a 10:00 holds 8 distinct tokens > k=4 → estimate path (n == k)
    val h10a = batch.find(t =>
      t._1 == java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime &&
        t._2 == "src_a").get
    assert(h10a._3 == 4L && h10a._5 != 4.0)
    // src_b 10:00: 2 distinct < k → exact
    val h10b = batch.find(t =>
      t._1 == java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime &&
        t._2 == "src_b").get
    assert(h10b._3 == 2L && h10b._5 == 2.0)
    // aggregator path ≡ the t20 bounded-heap path on the same grouping
    import graft.operators.TextAnalysis
    val viaHeap = TextAnalysis.kmvDistinctTokens(
        docs.filter($"ts" < java.sql.Timestamp.valueOf("2024-01-01 11:00:00")),
        "source", "text", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    val viaAgg = batch.filter(_._1 ==
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime)
      .map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1)
    assert(viaHeap == viaAgg)
  }

  test("batch sessionization splits on inactivity gaps") {
    val sessions = Sessions.sessionizeBatch(fixture, gapMinutes = 30)
      .orderBy($"user_id", $"start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    // (user, n_events, total) per session
    assert(sessions.toSeq == Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 2L, 12.0)))
  }

  test("streaming sessionization equals the batch twin after watermark flush") {
    val dir = Files.createTempDirectory("graft_stream").toFile.getAbsolutePath
    fixture.as[SessionEvent].coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(fixture.schema)
      .parquet(dir)
      .as[SessionEvent]
    val q = Sessions.sessionizeStream(stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("graft_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      // push the watermark far past every session end → all sessions flush
      mkEvents(Seq((99L, "2024-01-02 12:00:00", "view", 0.0)))
        .as[SessionEvent].coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.processAllAvailable() // extra batch so timed-out state emits

      val streamed = spark.table("graft_sessions").as[UserSession]
        .filter($"user_id" =!= 99L)
        .collect().map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events, s.total_value))
        .sortBy(x => (x._1, x._2)).toSeq
      val batch = Sessions.sessionizeBatch(fixture, 30)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowed aggregation: streaming complete mode equals batch") {
    val dir = Files.createTempDirectory("graft_stream_w").toFile.getAbsolutePath
    fixture.as[SessionEvent].coalesce(1).write.mode("overwrite").parquet(dir)

    val batch = Sessions.windowedAgg(fixture, "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet

    val stream = spark.readStream.schema(fixture.schema).parquet(dir)
    val q = Sessions.windowedAgg(stream, "1 hour")
      .writeStream.format("memory").queryName("graft_winagg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_winagg")
        .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    val dir = Files.createTempDirectory("graft_stream_d").toFile.getAbsolutePath
    val withDups = fixture.union(fixture.limit(2)) // re-send first two events
    withDups.as[SessionEvent].coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(fixture.schema).parquet(dir)
    val q = graft.streaming.Sessions.dedupStream(stream, Seq("user_id"), "1 hour")
      .writeStream.format("memory").queryName("graft_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_dedup").count() == fixture.count())
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    val dir = Files.createTempDirectory("graft_ssj").toFile.getAbsolutePath
    val clicks = mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", "click", 1.0),
      (2L, "2024-01-01 11:00:00", "click", 2.0)))
    val buys = mkEvents(Seq(
      (1L, "2024-01-01 10:05:00", "purchase", 10.0),  // within 10m of click
      (2L, "2024-01-01 12:00:00", "purchase", 20.0))) // outside
    clicks.coalesce(1).write.mode("overwrite").parquet(s"$dir/l")
    buys.coalesce(1).write.mode("overwrite").parquet(s"$dir/r")

    val batch = graft.streaming.Sessions.intervalJoin(
      spark.read.parquet(s"$dir/l"), spark.read.parquet(s"$dir/r"),
      "user_id", withinMinutes = 10).count()
    assert(batch == 1)

    val sl = spark.readStream.schema(clicks.schema).parquet(s"$dir/l")
    val sr = spark.readStream.schema(buys.schema).parquet(s"$dir/r")
    val q = graft.streaming.Sessions.intervalJoin(sl, sr, "user_id", 10)
      .writeStream.format("memory").queryName("graft_ssj").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_ssj").count() == batch)
    } finally q.stop()
  }

  test("left-outer interval join emits null-padded unmatched rows after watermark") {
    val dir = Files.createTempDirectory("graft_ssjo").toFile.getAbsolutePath
    val clicks = mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", "click", 1.0),
      (2L, "2024-01-01 11:00:00", "click", 2.0)))
    val buys = mkEvents(Seq(
      (1L, "2024-01-01 10:05:00", "purchase", 10.0),  // within 10m of click
      (2L, "2024-01-01 12:00:00", "purchase", 20.0))) // outside
    clicks.coalesce(1).write.mode("overwrite").parquet(s"$dir/l")
    buys.coalesce(1).write.mode("overwrite").parquet(s"$dir/r")

    val sl = spark.readStream.schema(clicks.schema).parquet(s"$dir/l")
    val sr = spark.readStream.schema(buys.schema).parquet(s"$dir/r")
    val q = Sessions.intervalJoinOuter(sl, sr, "user_id", 10, "5 minutes")
      .writeStream.format("memory").queryName("graft_ssjo").outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark must pass click2's interval before its no-match row can
      // emit — advance both sides far past it
      mkEvents(Seq((99L, "2024-01-02 00:00:00", "click", 0.0)))
        .coalesce(1).write.mode("append").parquet(s"$dir/l")
      mkEvents(Seq((99L, "2024-01-02 00:00:00", "purchase", 0.0)))
        .coalesce(1).write.mode("append").parquet(s"$dir/r")
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("graft_ssjo")
        .filter(col("user_id") =!= 99L)
        .select(col("user_id"), col("r_value"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .sortBy(_._1).toSeq
      // user 1 matched its purchase; user 2's click emitted null-padded
      assert(rows == Seq((1L, Some(10.0)), (2L, None)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups recurring ids without exact-ts identity") {
    val dir = Files.createTempDirectory("graft_ddww").toFile.getAbsolutePath
    // same user_id re-sent with a DIFFERENT timestamp — dedupStream (id+ts
    // identity) would keep both; within-watermark dedup keeps one
    val first = mkEvents(Seq((1L, "2024-01-01 10:00:00", "view", 1.0)))
    val retry = mkEvents(Seq((1L, "2024-01-01 10:00:30", "view", 1.0)))
    first.union(retry).coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(first.schema).parquet(dir)
    val q = Sessions.dedupStreamWithinWatermark(stream, Seq("user_id"), "1 hour")
      .writeStream.format("memory").queryName("graft_ddww").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_ddww").count() == 1)
    } finally q.stop()
  }

  test("dedupBatchEarliest = within-watermark dedup replayed in event-time order (q63 twin)") {
    val dir = Files.createTempDirectory("graft_ddbe").toFile.getAbsolutePath
    val rows = Seq( // (event_id, user_id, ts, value) — dup user_ids, one ts tie
      (10L, 1L, "2024-01-01 10:00:00", 1.0),
      (11L, 1L, "2024-01-01 10:00:00", 2.0), // ts tie → min event_id (10) wins
      (12L, 1L, "2024-01-01 10:20:00", 3.0),
      (20L, 2L, "2024-01-01 10:05:00", 5.0),
      (21L, 2L, "2024-01-01 10:30:00", 6.0))
    val df = rows.map { case (e, u, ts, v) =>
      (e, u, java.sql.Timestamp.valueOf(ts), v)
    }.toDF("event_id", "user_id", "ts", "value")

    val batch = Sessions.dedupBatchEarliest(df, Seq("user_id"),
        tsCol = "ts", tieCol = "event_id")
      .select($"event_id", $"user_id", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch == Set((10L, 1L, 1.0), (20L, 2L, 5.0)))

    // replay in (ts, event_id) order — first arrival = earliest event
    df.orderBy($"ts", $"event_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(df.schema).parquet(s"$dir/in")
    val q = Sessions.dedupStreamWithinWatermark(stream, Seq("user_id"), "1 hour")
      .writeStream.format("memory").queryName("graft_ddbe").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_ddbe")
        .select($"event_id", $"user_id", $"value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains everything then terminates") {
    val dir = Files.createTempDirectory("graft_avn").toFile.getAbsolutePath
    fixture.as[SessionEvent].coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(fixture.schema).parquet(s"$dir/in")
    Sessions.runAvailableNow(stream, s"$dir/out", s"$dir/ckpt") // blocks until done
    assert(spark.read.parquet(s"$dir/out").count() == fixture.count())
  }

  test("foreachBatch write trigger observes every batch (Trigger.java parity)") {
    val dir = Files.createTempDirectory("graft_trig").toFile.getAbsolutePath
    fixture.as[SessionEvent].coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = spark.readStream.schema(fixture.schema).parquet(s"$dir/in")
    val q = graft.streaming.Sessions.writeWithTrigger(
      stream, s"$dir/out", s"$dir/ckpt") { (batch, _) =>
      seen.addAndGet(batch.count())
    }
    try {
      q.processAllAvailable()
      assert(seen.get() == fixture.count())
      assert(spark.read.parquet(s"$dir/out").count() == fixture.count())
    } finally q.stop()
  }

  test("windowed agg on the real events table") {
    val ev = graft.core.Tables.load(spark, sf, "events")
    val out = Sessions.windowedAgg(ev, "1 hour")
    assert(out.count() > 0)
    val n = out.agg(sum($"n")).head().getLong(0)
    assert(n == ev.count())
  }
}
