package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming benchmark decontamination — the streaming twin of
  * [[Dedup.decontaminate]] for the rolling-ingest shape: every incoming
  * crawl document is tagged with the distinct word n-grams it shares with
  * a STATIC benchmark set, before it ever lands in the lake.
  *
  * EAGER + STATELESS by design: the benchmark's distinct gram hashes
  * materialize ONCE at construction into a sorted long[] riding inside a
  * codegen expression ([[graft.functions.CountInSorted]] — binary search
  * per gram), so the stream side is a pure per-row projection: no
  * stream-static join, no state store, no shuffle, no watermark needed —
  * Append mode, unlimited throughput, and the operator runs identically
  * on a batch frame (StreamDedupSpec proves streaming ≡ batch ≡ the t06
  * join path).
  *
  * Contract: the EXACT benchmark gram set must fit on the driver and in
  * each task binary — benchmarks are KBs-to-MBs (t06's regime). When the
  * benchmark outgrows that, [[decontaminateBloomStream]] is the overflow
  * path: same exact answer, bloom prefilter + a stream-static
  * exact-confirm join per micro-batch.
  *
  * Output schema identical to [[Dedup.decontaminate]]: (idCol,
  * shared_grams, contaminated).
  */
object StreamDecontaminate {

  def decontaminateStream(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    // one bounded job: the benchmark's distinct gram hashes (bounded by
    // the benchmark, never the corpus); the sort happens on the driver —
    // a distributed orderBy before a collect would buy nothing but a
    // range-partitioning exchange
    val benchSorted = benchmark
      .select(explode(Dedup.wordNgramHashSet(col(textCol), n)).as("__g"))
      .distinct()
      .collect().map(_.getLong(0)).sorted
    val shared = coalesce(
      graft.functions.TextHashExprs.countInSorted(
        Dedup.wordNgramHashSet(col(textCol), n), benchSorted),
      lit(0L)) // NULL text → 0/false, matching the join path's coalesce
    corpus.select(col(idCol),
      shared.as("shared_grams"),
      (shared > 0).as("contaminated"))
  }

  /** Streaming BLOOM decontamination — the overflow path for benchmarks
    * too big to ship exactly in the task binary (t22's regime on a
    * stream): per micro-batch, the bloom bitset prefilters the batch's
    * gram stream joinlessly and a stream-STATIC equi-join against the
    * distinct benchmark gram table kills the false positives, so the
    * answer is EXACT and identical to [[Dedup.decontaminateBloom]] on the
    * same rows (StreamDedupSpec pins streaming ≡ t22 batch ≡ the t06 join
    * path).
    *
    * STATE BOUND (the contract this path exists for): the Structured
    * Streaming state store is never engaged — no stateful operator
    * appears in the per-batch plan; `foreachBatch` scopes the confirm
    * join and the per-doc hit aggregate to ONE micro-batch, whose state
    * drops with the batch. The only artifacts that persist across batches
    * are built ONCE at construction, both bounded by the BENCHMARK and
    * never the stream: the mBits bitset (512 KB at the default 2^22) and
    * the cached distinct benchmark gram table (the join's static side).
    * Per-row results are a pure function of (row, benchmark), so batch
    * boundaries cannot change them — exactly-once delivery is the sink
    * callback's concern, as with every foreachBatch pipeline.
    *
    * EAGER like [[Dedup.decontaminateBloom]]: constructing the writer
    * runs the bounded benchmark-side jobs (bloom fold + gram distinct)
    * before the first batch ticks.
    *
    * `sink(batchResult, batchId)` receives each micro-batch's (idCol,
    * shared_grams, contaminated) frame — write it wherever the pipeline
    * lands (memory table in the spec, the lake in production). */
  def decontaminateBloomStream(
      corpusStream: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      mBits: Int = 1 << 22,
      k: Int = 6)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val benchGrams = benchmark
      .select(explode(Dedup.wordNgramHashSet(col(textCol), n)).as("__g"))
      .distinct()
      .cache() // static join side, replayed every micro-batch
    val bits = Dedup.bloomBitsOf(
      benchmark.select(
        explode(Dedup.wordNgramHashSet(col(textCol), n)).as("__g")),
      "__g", mBits, k)
    corpusStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(Dedup.decontaminateBloomWith(batch, benchGrams, bits,
          idCol, textCol, n, mBits, k), batchId)
    }
  }
}
