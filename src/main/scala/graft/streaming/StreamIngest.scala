package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.{Dedup, Incremental}
import graft.operators.Dedup.MinHashConfig

/** Streaming incremental ingest — p07's delta path on a LIVE crawl
  * stream: each micro-batch cross-dedups against the PERSISTED dedup
  * state (`operators/Incremental`'s dedup_state table) and hands the
  * survivors to the sink, so new content lands in the lake already
  * deduped against everything processed before.
  *
  * `foreachBatch` scopes every dedup join/aggregate to ONE micro-batch
  * (the decontaminateBloomStream discipline): zero Structured Streaming
  * state — no stateful operator ever appears in a per-batch plan
  * (StreamIngestSpec asserts `stateOperators.isEmpty`). The only
  * cross-batch artifact is the state READ: a column-pruned parquet scan
  * prepared ONCE and cached as the static side of every micro-batch's
  * bucket join. A row's survivor-ness is a pure function of
  * (row, persisted state), so micro-batch boundaries cannot change the
  * answer: streaming ≡ `Incremental.crossDedupAgainstState` on the same
  * rows ≡ the full recompute (both pinned in StreamIngestSpec).
  *
  * SEMANTICS NOTE: each micro-batch dedups against the state AS WRITTEN —
  * survivors are NOT appended to the state mid-stream, so intra-stream
  * duplicates survive (exactly [[Dedup.crossDedup]]'s intra-batch
  * contract, deliberately). `Incremental.appendDedupState` on the
  * ingested crawl is the BETWEEN-crawls step, not the per-micro-batch
  * one — appending mid-stream would make results depend on micro-batch
  * boundaries, which is the property this design refuses. */
object StreamIngest {

  /** `sink(batchSurvivors, batchId)` receives each micro-batch's
    * surviving rows (the batch's own columns, victims dropped). */
  def crossDedupStream(
      deltaStream: DataFrame,
      idCol: String,
      textCol: String,
      stateDir: String,
      cfg: MinHashConfig = MinHashConfig(),
      maxBucket: Int = 1000)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val statePrep = Incremental
      .readDedupState(deltaStream.sparkSession, stateDir, cfg)
      .cache() // static side of every micro-batch's bucket join
    deltaStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(Dedup.crossDedupPrepped(batch, idCol, textCol, statePrep,
          cfg, maxBucket), batchId)
    }
  }
}
