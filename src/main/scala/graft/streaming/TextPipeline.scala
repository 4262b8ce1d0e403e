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

  /** Rolling per-source corpus statistics over a timestamped document
    * stream — the windowed twin of the batch per-source rollup
    * (t04_corpus_stats): per (event-time window, source) doc counts,
    * token/char budgets, and the quality-keep rate. This is the ingest
    * dashboard every rolling crawl runs: "how much usable text did each
    * source deliver this hour".
    *
    * Stateful only through the tumbling-window aggregate: with a
    * watermark on `tsCol` the state store holds one row per open
    * (window, source) and append mode emits each row exactly once when
    * the watermark passes window end. On a batch frame the same code is
    * a plain partial+final hash aggregate — batch ≡ streaming on the
    * same rows (StreamingSpec parity). Scale shape: the quality signals
    * are per-row codegen expressions, the aggregate is map-side
    * combined, and cardinality is bounded by windows × sources — never
    * by document count. */
  def rollingCorpusStats(
      docs: DataFrame,
      tsCol: String,
      sourceCol: String,
      textCol: String,
      windowDur: String,
      watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(docs)(w => docs.withWatermark(tsCol, w))
    in.select(col(tsCol) +: col(sourceCol) +:
        TextAnalysis.qualitySignals(col(textCol)): _*)
      .groupBy(window(col(tsCol), windowDur), col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars_m")).as("total_chars"),
        sum(col("quality_keep").cast("long")).as("n_keep"))
      .select(col("window.start").as("window_start"), col(sourceCol),
        col("n_docs"), col("total_tokens"), col("total_chars"), col("n_keep"),
        (col("n_keep").cast("double") / col("n_docs")).as("keep_rate"))
  }

  /** Rolling distinct-token cardinality per (event-time window, source) —
    * the streaming form of the KMV sketch (t20): "how much NEW vocabulary
    * did each source deliver this hour". The
    * [[graft.functions.Aggregators.KmvSketch]] aggregator is associative,
    * commutative and bounded (≤ k longs per open (window, source) state
    * row), so Structured Streaming merges partial sketches across
    * microbatches exactly as a batch shuffle merges partial aggregates —
    * streaming ≡ batch on the same rows (StreamingSpec parity), and the
    * estimate uses the identical IEEE expression as the batch path. */
  def rollingDistinctTokens(
      docs: DataFrame,
      tsCol: String,
      sourceCol: String,
      textCol: String,
      windowDur: String,
      k: Int,
      watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(docs)(w => docs.withWatermark(tsCol, w))
    val kmv = udaf(new graft.functions.Aggregators.KmvSketch(k),
      org.apache.spark.sql.Encoders.LONG)
    in.select(col(tsCol), col(sourceCol),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .select(col(tsCol), col(sourceCol), xxhash64(col("__tok")).as("__h"))
      .groupBy(window(col(tsCol), windowDur), col(sourceCol))
      .agg(kmv(col("__h")).as("__sk"))
      .select(col("window.start").as("window_start"), col(sourceCol),
        col("__sk.n_sketch").as("n_sketch"),
        col("__sk.kth_hash").as("kth_hash"),
        TextAnalysis.kmvEstimate(col("__sk.n_sketch"), col("__sk.kth_hash"), k)
          .as("est_distinct"))
  }
}
