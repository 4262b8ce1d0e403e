package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Streaming text-pipeline surface: the quality filter and the RAG
  * chunker applied to a document firehose. Both are STATELESS row
  * transforms — no watermark, no state store, any output mode — so the
  * batch operators apply verbatim and streaming results are exactly the
  * batch results on the same rows (StreamingSpec proves it).
  *
  * That statelessness is the design point: quality scoring and chunking
  * are per-document pure functions, so the streaming twin is the batch
  * expression tree on an unbounded frame — Structured Streaming's
  * incremental execution does the rest. Contrast the STATEFUL streaming
  * operators ([[StreamDedup]], [[StreamAsof]], [[Sessions]]) where
  * arrival order and watermarks change semantics.
  *
  * Scale note: on a stream, [[TextAnalysis.chunkText]]'s batch-side
  * materialization cut is a pass-through (see
  * [[graft.core.Checkpoint.cut]]), so the tokenizer expression is
  * re-evaluated per CHUNK row rather than once per doc inside each
  * microbatch — an O(tokens × chunks-per-doc) factor that is irrelevant
  * at typical chunk strides but worth a repartition-by-doc + cache only
  * if profiling a very-long-document stream says so.
  */
object TextPipeline {

  /** Quality-gated pass-through: input rows plus the quality signal
    * columns, keeping only docs passing the composite gate
    * (`quality_keep`). Append-mode safe. */
  def qualityFilterStream(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("*") +: TextAnalysis.qualitySignals(col(textCol)): _*)
      .filter(col("quality_keep"))

  /** Overlapping fixed-token chunking on a stream — exactly
    * [[TextAnalysis.chunkText]] (stateless explode). */
  def chunkStream(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame =
    TextAnalysis.chunkText(docs, idCol, textCol, chunkTokens, overlap)
}
