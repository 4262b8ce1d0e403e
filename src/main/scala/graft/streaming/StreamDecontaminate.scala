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
  * each task binary — benchmarks are KBs-to-MBs (t06's regime). For a
  * benchmark too big to ship exactly, batch offers
  * [[Dedup.decontaminateBloom]]; a streaming bloom variant would need the
  * same exact-confirm join and with it a stream-static join per
  * micro-batch — take this exact path until benchmarks outgrow memory.
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
}
