package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.AsofJoin
import graft.streaming.StreamAsof

class StreamAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 7L, "2024-01-01 10:00:30"),
    (2L, 7L, "2024-01-01 10:02:00"),
    (3L, 7L, "2024-01-01 10:03:30"),
    (4L, 8L, "2024-01-01 10:01:00"), // key with no rights at all
    (5L, 9L, "2024-01-01 10:00:00")  // before its key's first right
  ).map { case (id, k, t) => (id, k, ts(t)) }.toDF("id", "k", "ts")

  private lazy val right = Seq(
    (7L, "2024-01-01 10:00:00", 1.5),
    (7L, "2024-01-01 10:02:00", 2.5), // equal-time tie with left id=2
    (7L, "2024-01-01 10:03:00", 3.5),
    (9L, "2024-01-01 10:01:00", 9.5)
  ).map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "ts", "payload")

  /** The batch operator's answer — the contract both modes must meet. */
  private lazy val expected: Map[Long, (Option[Long], Option[Double])] =
    AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("payload"))
      .select(col("id"), unix_millis(col("__asof_time")).as("ams"),
        col("payload"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.toString.toLong),
          Option(r.get(2)).map(_.toString.toDouble)))).toMap

  test("batch-mode execution equals the batch as-of operator") {
    val got = StreamAsof.asofJoinStream(left, right)
      .collect().map(m => m.id -> ((m.asof_ms, m.payload))).toMap
    assert(got == expected)
    // spot-check the semantics the fixture encodes
    assert(expected(2L)._2 == Some(2.5)) // equal-time right visible (<=)
    assert(expected(4L) == ((None, None)))
    assert(expected(5L) == ((None, None)))
  }

  test("streaming run (two event-time-ordered micro-batches) equals batch") {
    val dir = Files.createTempDirectory("graft_sasof").toFile.getAbsolutePath
    val cut = ts("2024-01-01 10:01:30")
    def lPart(p: Int) = left.filter(if (p == 0) $"ts" <= cut else $"ts" > cut)
    def rPart(p: Int) = right.filter(if (p == 0) $"ts" <= cut else $"ts" > cut)
    val lDir = s"$dir/lsrc"; val rDir = s"$dir/rsrc"
    lPart(0).coalesce(1).write.mode("overwrite").parquet(lDir)
    rPart(0).coalesce(1).write.mode("overwrite").parquet(rDir)

    val lStream = spark.readStream.schema(left.schema).parquet(lDir)
    val rStream = spark.readStream.schema(right.schema).parquet(rDir)
    val q = StreamAsof.asofJoinStream(lStream, rStream)
      .writeStream.format("memory").queryName("graft_stream_asof")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      // rights land (and drain) before the lefts that need them — the
      // arrival-order contract; appending lefts first could let a
      // micro-batch fire with only the left file visible
      rPart(1).coalesce(1).write.mode("append").parquet(rDir)
      q.processAllAvailable()
      lPart(1).coalesce(1).write.mode("append").parquet(lDir)
      q.processAllAvailable()
      val got = spark.table("graft_stream_asof")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(3)).map(_.toString.toLong),
            Option(r.get(4)).map(_.toString.toDouble)))).toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("watermark eviction keeps the carry row: old right still matches") {
    val dir = Files.createTempDirectory("graft_sasof_wm").toFile.getAbsolutePath
    val lDir = s"$dir/lsrc"; val rDir = s"$dir/rsrc"
    val l0 = Seq((1L, 7L, ts("2024-01-01 10:00:30"))).toDF("id", "k", "ts")
    val r0 = Seq((7L, ts("2024-01-01 10:00:00"), 1.5)).toDF("k", "ts", "payload")
    l0.coalesce(1).write.mode("overwrite").parquet(lDir)
    r0.coalesce(1).write.mode("overwrite").parquet(rDir)
    val lStream = spark.readStream.schema(l0.schema).parquet(lDir)
    val rStream = spark.readStream.schema(r0.schema).parquet(rDir)
    val q = StreamAsof.asofJoinStream(lStream, rStream,
        watermarkDelay = Some("1 minute"))
      .writeStream.format("memory").queryName("graft_stream_asof_wm")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      // a left 5 minutes later: the 10:00 right is far below the watermark
      // horizon by now, but the carry rule must keep it as the floor match
      Seq((2L, 7L, ts("2024-01-01 10:05:00"))).toDF("id", "k", "ts")
        .coalesce(1).write.mode("append").parquet(lDir)
      q.processAllAvailable()
      q.processAllAvailable() // one more cycle so the watermark advances
      val got = spark.table("graft_stream_asof_wm")
        .collect().map(r => r.getLong(0) ->
          Option(r.get(4)).map(_.toString.toDouble)).toMap
      assert(got(1L) == Some(1.5) && got(2L) == Some(1.5))
    } finally q.stop()
  }
}
