package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Streaming near-duplicate detection over a document firehose — the
  * streaming twin of [[Dedup.minhashCandidates]] with arrival-order
  * semantics: each incoming document is checked against every PREVIOUSLY
  * seen document (the "keep earliest" discipline of batch dedup, where
  * earliest = arrival).
  *
  * Shape: the codegen'd shingle/minhash expressions run on the stream
  * exactly as in batch; each doc explodes into its LSH band keys; state
  * lives per (band, bucket) in the state store — one
  * flatMapGroupsWithState holding the bucket's signatures. An incoming
  * doc's signature is estimated (matching-lane fraction ≥ threshold −
  * 2σ margin, same rule as the batch Stage-A filter) against the bucket's
  * residents and a [[NearDupPair]] emits per hit.
  *
  * Contract notes (scale):
  *  - a pair sharing multiple bands emits once per shared bucket —
  *    at-least-once per matching band; distinct downstream (cheap: pairs
  *    are rare) exactly as the batch path dedups its bucket join.
  *  - state per bucket is capped at `maxPerBucket` residents (newest are
  *    dropped, not evicted — the streaming analog of the batch
  *    degenerate-bucket cap); total state ≈ docs × bands signature refs,
  *    which is what any dedup-against-all-history must hold — run with the
  *    RocksDB state store at scale.
  *  - emitted pairs are estimate-level (Stage A). Exact-Jaccard verify
  *    (Stage B) composes downstream by joining the pair stream against a
  *    document store, exactly as the batch operator's verify join does.
  *
  * Works identically when handed a BATCH DataFrame (Spark executes
  * flatMapGroupsWithState in batch mode) — StreamingSpec proves the
  * streaming run equals the batch-mode run and a brute-force expectation.
  */
object StreamDedup {

  final case class BandRec(doc_id: Long, band: Int, bucket: Long,
      sig: Array[Long], ms: Long)
  final case class BucketState(ids: List[Long], sigs: List[Array[Long]])
  final case class NearDupPair(id_prior: Long, id_new: Long, est: Double)

  /** `docs` columns: doc_id long, text string, ts timestamp. */
  def minhashCandidatesStream(
      docs: DataFrame,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(),
      maxPerBucket: Int = 1000,
      watermarkDelay: Option[String] = None): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val threshold = cfg.threshold
    val margin = 2.0 / math.sqrt(cfg.numHashes.toDouble)
    val wm = watermarkDelay.map(d => docs.withWatermark("ts", d)).getOrElse(docs)

    val banded = wm
      .withColumn("__sig", Dedup.minhashSignature(
        Dedup.shingleHashSet(col("text"), cfg.shingleSize), cfg.numHashes, cfg.seed))
      .withColumn("__bands", Dedup.bandHashes(col("__sig"), cfg.bands, cfg.rowsPerBand))
      .select(col("doc_id"),
        posexplode(col("__bands")).as(Seq("band", "bucket")),
        col("__sig").as("sig"), unix_millis(col("ts")).as("ms"))
      .select(col("doc_id"), col("band"), col("bucket"), col("sig"), col("ms"))
      .as[BandRec]

    def estOf(a: Array[Long], b: Array[Long]): Double = {
      val n = math.min(a.length, b.length)
      if (n == 0) return 0.0
      var i = 0; var m = 0
      while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
      m.toDouble / n
    }

    def fn(key: (Int, Long), recs: Iterator[BandRec],
        state: GroupState[BucketState]): Iterator[NearDupPair] = {
      var st = state.getOption.getOrElse(BucketState(Nil, Nil))
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
      // arrival order within the micro-batch: event time, then id — the
      // same total order the batch keep-earliest discipline uses
      recs.toSeq.sortBy(r => (r.ms, r.doc_id)).foreach { r =>
        val it = st.ids.iterator.zip(st.sigs.iterator)
        while (it.hasNext) {
          val (id, sig) = it.next()
          val e = estOf(sig, r.sig)
          if (e >= threshold - margin) out += NearDupPair(id, r.doc_id, e)
        }
        if (st.ids.size < maxPerBucket)
          st = BucketState(r.doc_id :: st.ids, r.sig :: st.sigs)
      }
      state.update(st)
      out.iterator
    }

    banded
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
