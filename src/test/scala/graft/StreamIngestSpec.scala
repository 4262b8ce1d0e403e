package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.Tables
import graft.operators.{Dedup, Incremental}
import graft.operators.Dedup.MinHashConfig
import graft.streaming.StreamIngest

/** Streaming delta ingest (StreamIngest): micro-batched survivors against
  * PERSISTED dedup state ≡ the one-shot batch ingest ≡ the full
  * recompute, with zero Structured Streaming state — survivor-ness is a
  * pure function of (row, state), so batch boundaries cannot matter. */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = MinHashConfig(numHashes = 64, bands = 16,
    threshold = 0.35)

  test("streaming ingest ≡ batch state ingest ≡ full recompute; " +
      "zero streaming state") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val prior = docs.filter(col("doc_id") % 10 =!= 9)
    val delta = docs.filter(col("doc_id") % 10 === 9).localCheckpoint(true)
    val stateDir = Files.createTempDirectory("graft_si_state")
      .toFile.getAbsolutePath
    Incremental.writeDedupState(prior, "doc_id", "text", cfg, stateDir)

    val full = Dedup.crossDedup(delta, prior, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaState = Incremental
      .crossDedupAgainstState(delta, "doc_id", "text", stateDir, cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaState == full)

    // the same delta as TWO micro-batches through the streaming path
    val inDir = Files.createTempDirectory("graft_si_in")
      .toFile.getAbsolutePath
    val ids = delta.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    delta.filter(col("doc_id") <= cut).coalesce(1)
      .write.mode("overwrite").parquet(inDir)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamIngest.crossDedupStream(
        spark.readStream.schema(delta.schema).parquet(inDir),
        "doc_id", "text", stateDir, cfg) { (surv, _) =>
      got.synchronized {
        got ++= surv.select("doc_id").collect().map(_.getLong(0))
      }
    }.trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      delta.filter(col("doc_id") > cut).coalesce(1)
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(got.sorted.toSeq == full)
      // stateless by construction: foreachBatch scopes every join to one
      // micro-batch — no stateful operator may appear
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
