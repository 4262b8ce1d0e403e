package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** 10x-replicated corpus stress: every document appears 10x with distinct
  * ids — a worst-case dedup load (dense true-duplicate clusters) at 50k
  * docs / 650k embeddings-scale rows. Prints wall times; recorded in
  * NOTES_r1.md as headroom evidence. */
object ScaleStress {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    // optional arg: checkpoint mode (local | reliable) — cluster-durability
    // cost measurement for the iterative operators
    a.headOption.foreach { m =>
      spark.conf.set(graft.core.Checkpoint.ModeKey, m)
      println(s"[stress] checkpoint mode: $m")
    }
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val big = (0 until 10).map(i =>
        docs.select((col("doc_id") * 10 + i).as("doc_id"), col("text")))
      .reduce(_ union _).localCheckpoint(true)
    println("[stress] docs=" + big.count())
    val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.8)
    val survivors = time("minhash-dedup-50k-dense-dups") {
      Dedup.minhashDedup(big, "doc_id", "text", cfg).count()
    }
    println("[stress] survivors=" + survivors + " (expect ~5000: one per cluster)")
    val sim = time("simhash-pairs-50k") {
      Dedup.simhashCandidates(big, "doc_id", "text", maxHamming = 3).count()
    }
    println("[stress] simhash pairs=" + sim)
    // worst case for segment dedup: EVERY segment is cross-doc frequent
    // (10 copies), so the "frequent set is small" broadcast assumption is
    // deliberately violated — the plan must degrade to a shuffle anti-join
    // via AQE, not OOM the driver
    val segSurv = time("segment-dedup-50k-all-frequent") {
      Dedup.segmentDedup(big, "doc_id", "text",
        segWords = 3, maxDocFreq = 1).count()
    }
    println("[stress] segment-dedup rows=" + segSurv)
    // worst case for duplicate-span detection: EVERY 8-gram occurs 10x, so
    // every position is duplicated and spans cover whole documents — the
    // gram-partition count window carries the full token stream. The
    // aggregate is over a COMPUTED column so join/window elimination can't
    // hollow the measurement out (round-4 constraint #3).
    val spanTok = time("duplicate-spans-50k-all-dup") {
      Dedup.duplicateSpans(big, "doc_id", "text", k = 8)
        .agg(sum(col("span_end") - col("span_start") + lit(1))).head().getLong(0)
    }
    println("[stress] dup-span covered tokens=" + spanTok +
      " (expect ≈ corpus token count: one whole-doc span per doc)")
    // hot-boilerplate straggler case: ONE 8-gram replicated 1M× across 1M
    // docs (each doc = the shared gram + a unique tail token). A
    // gram-partitioned count window would sort all 1M occurrences in a
    // single unsplittable task; the hashed-gram groupBy map-side-combines
    // them to one row per input partition and broadcasts the dup set back.
    val hot = spark.range(1000000L).select(col("id").as("doc_id"),
      concat(lit("common cookie banner text appears on every site token"),
        col("id")).as("text"))
    val hotSpans = time("duplicate-spans-hot-gram-1M") {
      Dedup.duplicateSpans(hot, "doc_id", "text", k = 8).count()
    }
    println("[stress] hot-gram spans=" + hotSpans + " (expect 1000000: one per doc)")
    // longest-repeat dense worst case: every doc appears 10x, so EVERY
    // position of every doc is a duplicated start at every ladder level —
    // the refinement universe is the whole corpus and the per-doc answer is
    // the full doc length. Sum over a computed column so nothing hollows out.
    val lrep = time("longest-repeat-50k-all-dup") {
      Dedup.longestRepeat(big, "doc_id", "text")
        .agg(sum(col("longest_repeat"))).head().getLong(0)
    }
    println("[stress] longest-repeat token-sum=" + lrep +
      " (every doc fully duplicated: equals corpus token count)")
    val packedMax = time("pack-sequences-50k") {
      graft.operators.Sampling.packSequences(
        big.select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", budgetTokens = 2048L)
        .agg(max(col("bin"))).collect()(0).getLong(0)
    }
    println("[stress] pack bins=" + (packedMax + 1))

    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val bigEmb = (0 until 10).map(i =>
        emb.select((col("vec_id") * 10 + i).as("vec_id"), col("embedding")))
      .reduce(_ union _).localCheckpoint(true)
    println("[stress] vecs=" + bigEmb.count())
    val ann = time("ann-lsh-50k-corpus-100-queries") {
      Similarity.lshTopK(bigEmb, "vec_id", "embedding",
        bigEmb.filter(col("vec_id") < 100), "vec_id", "embedding",
        k = 10, dim = 64, bitsPerTable = 8, tables = 8).count()
    }
    println("[stress] ann rows=" + ann)
    val qann = time("ann-quantized-50k-corpus-100-queries") {
      Similarity.quantizedTopK(bigEmb, "vec_id", "embedding",
        bigEmb.filter(col("vec_id") < 100), "vec_id", "embedding",
        k = 10).count()
    }
    println("[stress] quantized ann rows=" + qann)

    // 10x events: the time-series joins (1M rows) — as-of carry-forward
    // and bucketed range join — under dense per-user histories
    val ev = graft.core.Tables.load(spark, dir, "events")
    val bigEv = (0 until 10).map(i =>
        ev.select((col("event_id") * 10 + i).as("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value")))
      .reduce(_ union _).localCheckpoint(true)
    println("[stress] events=" + bigEv.count())
    val asof = time("asof-join-1M") {
      graft.operators.AsofJoin.asofJoin(
        bigEv.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        bigEv.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value").as("pv")),
        Seq("user_id"), "ts", "pts", Seq("pv")).count()
    }
    println("[stress] asof rows=" + asof)
    val rng = time("range-join-1M") {
      graft.operators.RangeJoin.bucketedRangeJoin(
        bigEv.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"),
            col("ts").as("pts")),
        bigEv.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        Seq("user_id"), "pts", "ts", -3600000L, 0L).count()
    }
    println("[stress] range rows=" + rng)

    // round-4 ops under the same 10x worst cases: kNN graph on 20k vectors
    // (dense exact-duplicate clusters → every node's candidate list holds
    // its 9 clones), SemDeDup on the same (2000 size-10 components — the
    // dense-component worst case for label propagation), trigram quality on
    // 50k docs (model vocab unchanged, occurrence volume 10x)
    val knn = time("knn-graph-20k") {
      Similarity.knnGraph(bigEmb, "vec_id", "embedding",
        k = 5, dim = 64, bitsPerTable = 8, tables = 4).count()
    }
    println("[stress] knn edges=" + knn)
    // r13 (VERDICT r12 directive 4): candidate-pair growth gauge for the
    // capped knnGraph bucket agg — candidate count at 1x vs 10x with the
    // s05 headline params, plus the drop observation, so a super-linear
    // blow-up (or a silently capped bucket) is a visible number, not a
    // bench-time surprise. Dense clones multiply per-bucket occupancy by
    // the clone factor, so pairs/vector may grow by up to that factor —
    // the assert bounds growth at occupancy-linear (10x pairs/vector),
    // NOT quadratic-in-corpus.
    def knnCandidates(e: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val planes = (0 until 4).map(t =>
        Similarity.hyperplanes(64, 6, 42L + 200 + t))
      val b = e.select(col("vec_id").as("__id"),
        posexplode(array(planes.map(p =>
          Similarity.lshBucket(col("embedding"), p)): _*))
          .as(Seq("__tbl", "__bkt")))
      val cappedIds = udaf(
        new graft.functions.Aggregators.CollectCapped(1000),
        org.apache.spark.sql.Encoders.LONG)
      val buckets = b.groupBy(col("__tbl"), col("__bkt"))
        .agg(cappedIds(col("__id")).as("__bk"))
        .localCheckpoint(true)
      val dropped = buckets
        .agg(sum(when(col("__bk.n") > 1000, col("__bk.n")).otherwise(0L)))
        .head().getLong(0) // 1-row gauge aggregate
      val cand = buckets
        .filter(col("__bk.n").between(2, 1000))
        .select(explode(col("__bk.ids")).as("a"), col("__bk.ids").as("__i"))
        .select(col("a"), explode(col("__i")).as("b"))
        .filter(col("a") =!= col("b")).distinct().count()
      (cand, dropped)
    }
    val (cand1, drop1) = knnCandidates(emb)
    val (cand10, drop10) = knnCandidates(bigEmb)
    val nVec1 = emb.count(); val nVec10 = bigEmb.count()
    println(s"[stress] knn candidates 1x=$cand1 (n=$nVec1, dropped=$drop1) " +
      s"10x=$cand10 (n=$nVec10, dropped=$drop10) " +
      f"per-vector growth=${(cand10.toDouble / nVec10) / (cand1.toDouble / nVec1)}%.2fx")
    require(cand10.toDouble / nVec10 <= 10.5 * (cand1.toDouble / nVec1),
      "knn candidate pairs per vector grew faster than the 10x occupancy " +
        "factor — a quadratic-in-corpus blow-up the bucket cap should bound")
    val sem = time("semdedup-20k-dense-clusters") {
      Similarity.semDedup(bigEmb, "vec_id", "embedding",
        threshold = 0.9999, dim = 64, bitsPerTable = 8, tables = 4).count()
    }
    println("[stress] semdedup survivors=" + sem + " (expect 2000: one per clone cluster)")
    // round-5 ops under the same dense-clone corpus: k-means-partitioned
    // semdedup (clones share a coarse cell by construction → the within-
    // cell pair join carries every clone pair), IVF-PQ top-k (cell
    // equi-join + ADC lookups), and the KMV sketch over the 50k-doc corpus
    val coarse16 = Similarity.ivfTrain(bigEmb, "embedding",
      nCentroids = 16, seed = 42L)
    val semK = time("semdedup-kmeans-dense-clusters") {
      Similarity.semDedupKMeans(bigEmb, "vec_id", "embedding",
        coarse16, threshold = 0.9999).count()
    }
    println("[stress] semdedup-kmeans survivors=" + semK +
      " (expect 2000: clones are cell-local exact dups)")
    val cbs = Similarity.pqTrain(bigEmb, "embedding", dim = 64,
      m = 8, kc = 16, seed = 7L)
    val ivfpq = time("ivfpq-topk-dense") {
      Similarity.ivfPqTopK(bigEmb, "vec_id", "embedding",
        bigEmb.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 10, coarse16, cbs, dim = 64, nProbe = 4).count()
    }
    println("[stress] ivfpq rows=" + ivfpq)
    val docsFull = graft.core.Tables.load(spark, dir, "documents")
    val bigSrc = (0 until 10).map(i =>
        docsFull.select((col("doc_id") * 10 + i).as("doc_id"),
          col("source"), col("text")))
      .reduce(_ union _)
    // agg over the estimate so the sketch work can't be eliminated
    val kmv = time("kmv-sketch-50k-docs") {
      graft.operators.TextAnalysis.kmvDistinctTokens(
          bigSrc, "source", "text", k = 128)
        .agg(sum(col("est_distinct"))).head().getDouble(0)
    }
    println(f"[stress] kmv total est=$kmv%.0f (10x clones add no distinct tokens)")
    // agg over a computed column — a bare count() lets Catalyst ELIMINATE
    // the unique-key left join and skip the trigram work entirely
    val tri = time("trigram-quality-50k") {
      graft.operators.TextAnalysis.trigramQuality(big, "doc_id", "text",
          graft.operators.TextAnalysis.trigramModel(big, "text"))
        .agg(sum(col("freq_sum"))).collect()(0).getLong(0)
    }
    println("[stress] trigram total-freq=" + tri)

    // ---- composed pipelines p01/p02/p03 at 10x (round-6 directive #8):
    // the end-to-end flagship shapes, with stage-interface invariants.
    // p01 on a pure clone corpus must produce EXACTLY the 1x result
    // modulo the id map (keep-earliest reps collapse each clone cluster
    // to the i=0 copy), so the 1x run, executed inline, IS the oracle
    // for both row count and selected token mass.
    import graft.operators.{Sampling, TextAnalysis}
    def alphaOf(c: org.apache.spark.sql.Column) =
      when(length(c) > 0, length(regexp_replace(c, "[^a-zA-Z]", ""))
        .cast("double") / length(c)).otherwise(lit(0.0))
    def corpusPrep(d: org.apache.spark.sql.DataFrame) = {
      // mirrors queries/Pipeline.scala p01_corpus_prep stage for stage
      val reps = Dedup.qualityRepresentatives(
          d.select(col("doc_id"), col("text"),
            alphaOf(col("text")).as("alpha_ratio")),
          "doc_id", "text", "alpha_ratio",
          Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
        .filter(col("keep")).select(col("doc_id"), col("text"))
      val cleaned = Dedup.removeDuplicateSpans(reps, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("clean_text"))
      val gated = cleaned.select(col("doc_id") +: col("clean_text") +:
          TextAnalysis.blocklistSignals(col("clean_text"),
            Seq("dup", "spam", "error"), maxRatio = 0.05): _*)
        .filter(col("blocklist_keep"))
      val scored = gated
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("clean_text")).as("n_toks"),
          alphaOf(col("clean_text")).as("alpha_ratio"))
      Sampling.budgetSelect(scored, "doc_id", "source",
        "alpha_ratio", "n_toks", budgetTokens = 1500L)
    }
    val p1base = corpusPrep(docsFull).agg(count(lit(1)), sum(col("n_toks")))
      .head()
    val (p1rows, p1toks) = (p1base.getLong(0), p1base.getLong(1))
    val p1big = time("p01-corpus-prep-50k") {
      corpusPrep(bigSrc).agg(count(lit(1)), sum(col("n_toks"))).head()
    }
    println("[stress] p01 rows=" + p1big.getLong(0) + "/" + p1rows +
      " toks=" + p1big.getLong(1) + "/" + p1toks +
      " (10x must equal 1x: clone clusters collapse to the i=0 copy)")
    require(p1big.getLong(0) == p1rows && p1big.getLong(1) == p1toks,
      "p01 10x/1x interface drifted")

    // p02 shape: dedup-then-index — SemDeDup survivors become the IVF-PQ
    // corpus (dedup threshold 0.35 collapses each exact-clone cluster);
    // every query must still retrieve a full top-k from the pruned index
    val p2 = time("p02-embedding-prep-dense") {
      val survivors = Similarity.semDedupKMeans(
          bigEmb.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", coarse16, threshold = 0.9999)
        .select(col("vec_id"), col("embedding"))
      Similarity.ivfPqTopK(survivors, "vec_id", "embedding",
        bigEmb.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 10, coarse16, cbs, dim = 64, nProbe = 4).count()
    }
    println("[stress] p02 topk rows=" + p2 + " (expect 80: 8 queries x k)")
    require(p2 == 80L, "p02 top-k short after dedup-then-index")

    // p03 shape: 50k REAL PNG/WAV encodes + decodes feed the feature and
    // byte-budget stages; the budget bound is the exact invariant
    val p3 = time("p03-media-prep-50k-real-codec") {
      val media = graft.operators.Multimodal.syntheticMedia(big)
        .transform(graft.core.Checkpoint.cut)
      val feats = graft.operators.Multimodal.extractFeatures(media, dim = 16)
      val meta = graft.operators.Multimodal.decodeMeta(media)
        .select(col("media_id"), col("kind"), col("n_bytes"))
      val rnd = new scala.util.Random(11L)
      val cents = Seq.fill(4)(Seq.fill(16)(rnd.nextDouble()))
      val survivors = Similarity.semDedupKMeans(feats, "media_id", "feature",
          cents, threshold = 0.95)
        .select(col("media_id"),
          element_at(col("feature"), 1).cast("double").as("feat_score"))
      Sampling.budgetSelect(meta.join(survivors, Seq("media_id")),
          "media_id", "kind", "feat_score", "n_bytes", budgetTokens = 200000L)
        .groupBy(col("kind")).agg(max(col("cum_tokens")).as("mx"),
          count(lit(1)).as("n"))
        .agg(sum(col("n")).cast("long"), max(col("mx"))).head()
    }
    println("[stress] p03 selected=" + p3.getLong(0) +
      " max-cum-bytes=" + p3.getLong(1) + " (bound 200000)")
    require(p3.getLong(0) > 0 && p3.getLong(1) <= 200000L,
      "p03 budget bound violated")

    // ---- retrieval family (r8 ops) under the same 10x clone corpus.
    // Boolean/phrase matches must scale exactly 10x (every clone matches
    // like its base); BM25 clone sets must share bit-identical scores;
    // n-gram counts scale 10x while continuation counts DON'T move
    // (clones add no new (context, suffix) pairs).
    import graft.operators.TextAnalysis
    val rQueries = Seq(1 -> Seq("join", "hash"), 2 -> Seq("customer", "query"))
    val rPhrases = Seq(1 -> Seq("hash", "value"), 2 -> Seq("table", "table"))
    val bool1 = TextAnalysis.booleanSearch(docsFull, "doc_id", "text", rQueries)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bool10 = time("boolean-search-50k") {
      TextAnalysis.booleanSearch(big, "doc_id", "text", rQueries)
        .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    println("[stress] boolean 10x=" + bool10 + " 1x=" + bool1)
    require(bool10 == bool1.map { case (q, n) => q -> n * 10 },
      "boolean-search matches must scale exactly 10x on a clone corpus")
    val phr1 = graft.operators.TextAnalysis.phraseSearch(
        docsFull, "doc_id", "text", rPhrases)
      .agg(sum(col("n_matches"))).head().getLong(0)
    val phr10 = time("phrase-search-50k") {
      TextAnalysis.phraseSearch(big, "doc_id", "text", rPhrases)
        .agg(sum(col("n_matches"))).head().getLong(0)
    }
    println("[stress] phrase 10x=" + phr10 + " 1x=" + phr1)
    require(phr10 == phr1 * 10, "phrase matches must scale exactly 10x")
    val bmRows = time("bm25-topk-50k") {
      TextAnalysis.bm25TopK(big, "doc_id", "text", rQueries, k = 10)
        .select(col("query_id"), col("doc_id"), col("score")).collect()
    }
    // every clone of a doc scores identically → within each CLONE SET of
    // the top-10, scores are bit-identical (two distinct base docs may
    // legitimately tie, so the check is per-set equality, not a
    // distinct-count proxy)
    val perQ = bmRows.groupBy(_.getInt(0))
    perQ.foreach { case (q, rows) =>
      val bySet = rows.groupBy(_.getLong(1) / 10)
      println(s"[stress] bm25 q$q top-${rows.length}: " +
        s"${bySet.size} clone sets")
      bySet.foreach { case (base, rs) =>
        require(rs.map(_.getDouble(2)).distinct.length == 1,
          s"clone set $base of q$q has diverging scores")
      }
    }
    val lm1 = TextAnalysis.ngramLmCounts(docsFull, "text", n = 3, k = 100)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val lm10 = time("ngram-lm-counts-50k") {
      TextAnalysis.ngramLmCounts(big, "text", n = 3, k = 100)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    }
    val lmShared = lm1.keySet.intersect(lm10.keySet)
    println(s"[stress] ngram-lm shared top rows: ${lmShared.size}")
    require(lmShared.nonEmpty && lmShared.forall { g =>
      lm10(g)._1 == lm1(g)._1 * 10 && lm10(g)._2 == lm1(g)._2 },
      "ngram counts must scale 10x with continuation counts unchanged")

    // ---- round-8 ops. keep-best dedup under a single 500k-duplicate hot
    // key (the hot-URL skew case the struct-MAX shape exists for: a
    // window formulation would sort 500k rows in one task; the partial
    // aggregate combines them map-side). Exact invariants: survivor =
    // arg-max (quality, id) with quality ties broken toward the higher
    // id, counters exact.
    val hotKeyed = spark.range(1000000L).select(
      when(col("id") < 500000L, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("src"),
      (col("id") % 1000L).as("q"), col("id"))
    val d20n = time("keep-best-hot-key-1M") {
      Dedup.keepBestPerKey(hotKeyed, "src", "q", "id").count()
    }
    println("[stress] keep-best keys=" + d20n + " (expect 500001)")
    require(d20n == 500001L, "keep-best key count drifted")
    val hotRow = Dedup.keepBestPerKey(hotKeyed, "src", "q", "id")
      .filter(col("src") === "hot").head()
    println("[stress] hot key kept_id=" + hotRow.getLong(1) +
      " kept_q=" + hotRow.getLong(2) + " n=" + hotRow.getLong(3) +
      " totq=" + hotRow.getLong(4))
    require(hotRow.getLong(1) == 499999L && hotRow.getLong(2) == 999L &&
      hotRow.getLong(3) == 500000L && hotRow.getLong(4) == 249750000L,
      "hot-key arg-max survivor wrong")

    // LM scoring on the 10x clone corpus: the model's counts all scale by
    // 10 (scores shift — that is the corpus-trained contract), but the
    // OUTPUT SHAPE is exact: 10x rows, 10x total bigram occurrences.
    val lm1s = TextAnalysis.lmScore(docsFull, "doc_id", "text")
      .agg(count(lit(1)), sum(col("n_bigrams"))).head()
    val lm10s = time("lm-score-50k") {
      TextAnalysis.lmScore(big, "doc_id", "text")
        .agg(count(lit(1)), sum(col("n_bigrams"))).head()
    }
    println("[stress] lm-score rows=" + lm10s.getLong(0) + "/" +
      lm1s.getLong(0) + " bigrams=" + lm10s.getLong(1) + "/" + lm1s.getLong(1))
    require(lm10s.getLong(0) == lm1s.getLong(0) * 10 &&
      lm10s.getLong(1) == lm1s.getLong(1) * 10,
      "lm-score clone-corpus shape drifted")

    // repetition kernel is per-row: clone corpus passes exactly 10x the
    // rows and 10x the rep_pass count
    val rep1 = TextAnalysis.gopherRepetitionSignals(docsFull, "doc_id", "text")
      .agg(count(lit(1)), sum(col("rep_pass").cast("long"))).head()
    val rep10 = time("gopher-repetition-50k") {
      TextAnalysis.gopherRepetitionSignals(big, "doc_id", "text")
        .agg(count(lit(1)), sum(col("rep_pass").cast("long"))).head()
    }
    println("[stress] gopher-rep rows=" + rep10.getLong(0) +
      " pass=" + rep10.getLong(1))
    require(rep10.getLong(0) == rep1.getLong(0) * 10 &&
      rep10.getLong(1) == rep1.getLong(1) * 10,
      "repetition kernel clone invariance drifted")

    // frame dedup at 10x with KIND-PRESERVING clone ids (offset multiple
    // of 3 keeps doc_id%3, so every clone encodes the identical payload):
    // the distinct-content group set must be EXACTLY the 1x set with
    // n_frames/n_media scaled 10x and the representative = the offset-0
    // copy — and the whole thing runs on real decodes of every distinct
    // compressed frame.
    val kindSafe = (0 until 10).map(i =>
        docsFull.select((col("doc_id") + lit(300000L * i)).as("doc_id"),
          col("text")))
      .reduce(_ union _)
    val fd1 = graft.operators.Multimodal.frameDedup(
        graft.operators.Multimodal.syntheticMedia(docsFull))
      .agg(count(lit(1)), sum(col("n_frames")), sum(col("n_media"))).head()
    val fd10 = time("frame-dedup-50k-real-decode") {
      graft.operators.Multimodal.frameDedup(
          graft.operators.Multimodal.syntheticMedia(kindSafe))
        .agg(count(lit(1)), sum(col("n_frames")), sum(col("n_media"))).head()
    }
    println("[stress] frame-dedup groups=" + fd10.getLong(0) + "/" +
      fd1.getLong(0) + " frames=" + fd10.getLong(1) + "/" + fd1.getLong(1) +
      " media=" + fd10.getLong(2) + "/" + fd1.getLong(2))
    require(fd10.getLong(0) == fd1.getLong(0) &&
      fd10.getLong(1) == fd1.getLong(1) * 10 &&
      fd10.getLong(2) == fd1.getLong(2) * 10,
      "frame-dedup clone-corpus invariants drifted")

    // ---- late round-8 ops. The C4 gate and the composed p04 gate are
    // per-row: the clone corpus passes exactly 10x the rows with 10x the
    // keep counts.
    val c41 = docsFull.select(col("doc_id") +: TextAnalysis.c4Signals(
        regexp_replace(col("text"), "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})",
          "$1.\n")): _*)
      .agg(count(lit(1)), sum(col("c4_keep").cast("long"))).head()
    val c410 = time("c4-filter-50k") {
      big.select(col("doc_id") +: TextAnalysis.c4Signals(
          regexp_replace(col("text"), "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})",
            "$1.\n")): _*)
        .agg(count(lit(1)), sum(col("c4_keep").cast("long"))).head()
    }
    println("[stress] c4 rows=" + c410.getLong(0) + " keep=" + c410.getLong(1))
    require(c410.getLong(0) == c41.getLong(0) * 10 &&
      c410.getLong(1) == c41.getLong(1) * 10, "c4 clone invariance drifted")
    val p4big = time("p04-quality-gate-50k") {
      val page = regexp_replace(col("text"),
        "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
      val c4 = TextAnalysis.c4Signals(page)
      val staged = big.select(col("doc_id"),
        TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
        c4.last,
        graft.functions.TextHashExprs.gopherRepetition(col("text")).as("__r"))
      val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
        .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
        .reduce(_ && _)
      staged.agg(count(lit(1)),
        sum((col("gopher_pass") && repPass && col("c4_keep")).cast("long")))
        .head()
    }
    println("[stress] p04 rows=" + p4big.getLong(0) +
      " keep=" + p4big.getLong(1))
    require(p4big.getLong(0) == 50000L &&
      p4big.getLong(1) % 10 == 0, "p04 clone shape drifted")

    // learned-classifier apply at 10x (t33): the model fits ONCE on the
    // 1x corpus (exact long counts -> deterministic weights) and the
    // zero-exchange apply rides the clone corpus — per-row scores are a
    // pure function of the text, so keeps are EXACTLY 10x
    val (clfW, clfB) = TextAnalysis.qualityClassifierFit(docsFull, "text",
      TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
      dim = 1024, maxN = 2)
    val cl1 = TextAnalysis.qualityClassifierScore(
        docsFull, "doc_id", "text", clfW, clfB)
      .agg(count(lit(1)), sum(col("clf_keep").cast("long"))).head()
    val cl10 = time("clf-apply-50k") {
      TextAnalysis.qualityClassifierScore(big, "doc_id", "text", clfW, clfB)
        .agg(count(lit(1)), sum(col("clf_keep").cast("long"))).head()
    }
    // span decontamination at 10x (t36): benchmark fixed at 1x; the
    // excision is a pure per-row function of (text, benchmark), so the
    // clone corpus removes EXACTLY 10x the tokens from 10x the docs
    val benchFull = docsFull.filter(col("doc_id") % 7 === 0)
    val corpFull = docsFull.filter(col("doc_id") % 7 =!= 0)
    val bigCorp = (0 until 10).map(i =>
        corpFull.select((col("doc_id") * 10 + i).as("doc_id"), col("text")))
      .reduce(_ union _)
    val sp1 = Dedup.decontaminateSpans(corpFull, benchFull, "doc_id", "text")
      .agg(count(lit(1)), sum(col("n_removed_tokens"))).head()
    val sp10 = time("decon-spans-50k") {
      Dedup.decontaminateSpans(bigCorp, benchFull, "doc_id", "text")
        .agg(count(lit(1)), sum(col("n_removed_tokens"))).head()
    }
    println("[stress] decon-spans rows=" + sp10.getLong(0) + "/" +
      sp1.getLong(0) + " removed=" + sp10.getLong(1) + "/" + sp1.getLong(1))
    require(sp10.getLong(0) == sp1.getLong(0) * 10 &&
      sp10.getLong(1) == sp1.getLong(1) * 10,
      "span-decontamination clone invariance drifted")

    // DSIR select at 10x (t34): fit once on the 1x corpus; the apply is
    // per-row text-pure, the Gumbel noise is per-ID (clones get fresh
    // noise — resampling the bigger pool, the intended semantics), and
    // the threshold-broadcast selection must mark EXACTLY k winners with
    // a clean boundary (every selected key >= every unselected key,
    // tiebreak by id)
    val dsirW = TextAnalysis.dsirFit(docsFull, "text",
      col("source").isin("src0", "src1"), dim = 1024, maxN = 2)
    val ds10 = time("dsir-select-50k") {
      TextAnalysis.dsirSelect(bigSrc, "doc_id", "text", dsirW, k = 250)
        .agg(count(lit(1)), sum(col("selected").cast("long")),
          min(when(col("selected"), col("sel_key"))),
          max(when(!col("selected"), col("sel_key")))).head()
    }
    println("[stress] dsir rows=" + ds10.getLong(0) +
      " selected=" + ds10.getLong(1) +
      " boundary=" + ds10.getDouble(2) + "/" + ds10.getDouble(3))
    require(ds10.getLong(0) == 50000L && ds10.getLong(1) == 250L &&
      ds10.getDouble(2) >= ds10.getDouble(3),
      "dsir selection boundary drifted at 10x")

    // learned lang-id at 10x (t35): fit once on the 1x corpus; pred is a
    // pure function of the text, so the per-language match counts on the
    // clone corpus are EXACTLY 10x the 1x counts
    val lidM = TextAnalysis.langIdFit(docsFull, "text", "lang",
      dim = 1024, maxN = 2)
    val docsLang = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val bigLang = (0 until 10).map(i =>
        docsLang.select((col("doc_id") * 10 + i).as("doc_id"),
          col("lang"), col("text")))
      .reduce(_ union _)
    def lidCounts(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.langIdScore(d, "doc_id", "text", lidM,
          passthrough = Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum((col("pred_lang") === col("lang")).cast("long")).as("hit"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val lid1 = lidCounts(docsLang)
    val lid10 = time("langid-50k") { lidCounts(bigLang) }
    println("[stress] langid per-lang (n,hit) 1x=" + lid1.toSeq.sorted +
      " 10x=" + lid10.toSeq.sorted)
    require(lid10 == lid1.map { case (k, (n, h)) => k -> (n * 10, h * 10) },
      "lang-id clone invariance drifted")

    println("[stress] clf rows=" + cl10.getLong(0) + "/" + cl1.getLong(0) +
      " keep=" + cl10.getLong(1) + "/" + cl1.getLong(1))
    require(cl10.getLong(0) == cl1.getLong(0) * 10 &&
      cl10.getLong(1) == cl1.getLong(1) * 10,
      "classifier clone invariance drifted")

    // full quality funnel (p05) at 10x: rules + classifier fused per row —
    // keeps are a pure function of the text, so exactly 10x
    def funnel(df: org.apache.spark.sql.DataFrame) = {
      val page = regexp_replace(col("text"),
        "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
      val staged = df.select(col("doc_id"),
        TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
        TextAnalysis.c4Signals(page).last,
        graft.functions.TextHashExprs.gopherRepetition(col("text")).as("__r"),
        graft.functions.TextHashExprs.hashedGramScore(
          graft.operators.Dedup.normalize(col("text")), clfW, clfB, 2)
          .as("__s"))
      val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
        .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
        .reduce(_ && _)
      staged.agg(count(lit(1)), sum((col("gopher_pass") && repPass &&
        col("c4_keep") && col("__s") > lit(0.0)).cast("long"))).head()
    }
    val fu1 = funnel(docsFull)
    val fu10 = time("p05-quality-funnel-50k") { funnel(big) }
    println("[stress] p05 rows=" + fu10.getLong(0) + "/" + fu1.getLong(0) +
      " keep=" + fu10.getLong(1) + "/" + fu1.getLong(1))
    require(fu10.getLong(0) == fu1.getLong(0) * 10 &&
      fu10.getLong(1) == fu1.getLong(1) * 10,
      "p05 funnel clone invariance drifted")

    // p06 export at 10x: keep + span-clean are per-row pure functions of
    // the TEXT (ids only order the packing), so kept rows and clean-token
    // mass scale EXACTLY 10x against the fixed 1x benchmark; packing must
    // conserve tokens (max(tok_offset + n_tok) == sum(n_tok)) at both
    // scales
    def export(corp: org.apache.spark.sql.DataFrame) = {
      val page = regexp_replace(col("text"),
        "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
      val staged = corp.select(col("doc_id"), col("text"),
        TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
        TextAnalysis.c4Signals(page).last,
        graft.functions.TextHashExprs.gopherRepetition(col("text")).as("__r"),
        graft.functions.TextHashExprs.hashedGramScore(
          graft.operators.Dedup.normalize(col("text")), clfW, clfB, 2)
          .as("__s"))
      val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
        .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
        .reduce(_ && _)
      val kept = staged.filter(col("gopher_pass") && repPass &&
          col("c4_keep") && col("__s") > lit(0.0))
        .select(col("doc_id"), col("text"))
      val cleaned = Dedup.decontaminateSpans(kept, benchFull,
        "doc_id", "text")
      val withTok = cleaned.select(col("doc_id"),
        size(filter(split(col("clean_text"), " "), t => length(t) > 0))
          .cast("long").as("n_tok"))
      graft.operators.Sampling.packSequences(
          withTok, "doc_id", "n_tok", budgetTokens = 64L)
        .agg(count(lit(1)), sum(col("n_tok")),
          max(col("tok_offset") + col("n_tok"))).head()
    }
    val ex1 = export(corpFull)
    val ex10 = time("p06-export-50k") { export(bigCorp) }
    println("[stress] p06 rows=" + ex10.getLong(0) + "/" + ex1.getLong(0) +
      " tokens=" + ex10.getLong(1) + "/" + ex1.getLong(1))
    require(ex10.getLong(0) == ex1.getLong(0) * 10 &&
      ex10.getLong(1) == ex1.getLong(1) * 10,
      "p06 export clone invariance drifted")
    require(ex1.getLong(1) == ex1.getLong(2) &&
      ex10.getLong(1) == ex10.getLong(2),
      "p06 packing does not conserve tokens")

    // per-language funnel (p08) at 10x: lang-id routing + per-language
    // scoring are pure per-row functions of the TEXT, so the
    // per-PREDICTED-language (n, keep) counts scale exactly 10x (models
    // fitted once on the 1x corpus, the production shape)
    val plM = TextAnalysis.perClassClassifierFit(docsLang, "text", "lang",
      TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
      dim = 1024, maxN = 2)
    val sfxP = TextAnalysis.labelSuffixes(lidM.map(_._1))
    def perLangCounts(d: org.apache.spark.sql.DataFrame) = {
      val norm = graft.operators.Dedup.normalize(
        coalesce(col("text"), lit("")))
      val lidCols = lidM.zip(sfxP).map { case ((_, w, b), sx) =>
        graft.functions.TextHashExprs.hashedGramScore(norm, w, b, 2)
          .as(s"__lid_$sx") }
      val clfCols = plM.zip(sfxP).map { case ((_, w, b), sx) =>
        graft.functions.TextHashExprs.hashedGramScore(norm, w, b, 2)
          .as(s"__clf_$sx") }
      val staged = d.select(Seq(col("doc_id")) ++ lidCols ++ clfCols: _*)
      val best = greatest(sfxP.map(sx => col(s"__lid_$sx")): _*)
      val pred = coalesce(lidM.zip(sfxP).map { case (m, sx) =>
        when(col(s"__lid_$sx") === best, lit(m._1)) }: _*)
      val routed = coalesce(lidM.zip(sfxP).map { case (m, sx) =>
        when(pred === lit(m._1), col(s"__clf_$sx")) }: _*)
      staged.select(pred.as("pl"), (routed > lit(0.0)).cast("long").as("k"))
        .groupBy(col("pl"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("kp"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    val pl1 = perLangCounts(docsLang)
    val pl10 = time("p08-perlang-50k") { perLangCounts(bigLang) }
    println("[stress] p08 per-pred-lang (n,keep) 1x=" + pl1.toSeq.sorted +
      " 10x=" + pl10.toSeq.sorted)
    require(pl10 == pl1.map { case (k, (n, h)) => k -> (n * 10, h * 10) },
      "p08 per-language funnel clone invariance drifted")

    // incremental ingest (p07) at 10x: dedup state persisted from the 10x
    // PRIOR corpus (45k docs), the 10% delta (5k) ingested against it.
    // Survivor-ness is a pure function of (delta text, prior text SET),
    // which cloning preserves — so the 10x survivor ids are exactly the
    // 10 clones of each 1x survivor. maxBucket raised so LSH bucket caps
    // can't differ between the scales (cap effects are d08's concern,
    // not this invariant's).
    val cfgInc = Dedup.MinHashConfig(numHashes = 64, bands = 16,
      threshold = 0.35)
    val priorFull = docsFull.filter(col("doc_id") % 10 =!= 9)
    val deltaFull = docsFull.filter(col("doc_id") % 10 === 9)
    def clone10(df: org.apache.spark.sql.DataFrame) = (0 until 10).map(i =>
        df.select((col("doc_id") * 10 + i).as("doc_id"), col("text")))
      .reduce(_ union _)
    val incState = java.nio.file.Files
      .createTempDirectory("graft_stress_state").toFile.getAbsolutePath
    time("p07-state-build-45k") {
      graft.operators.Incremental.writeDedupState(
        clone10(priorFull), "doc_id", "text", cfgInc, incState)
    }
    val surv1 = Dedup.crossDedup(deltaFull, priorFull, "doc_id", "text",
        cfgInc, maxBucket = 20000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val surv10 = time("p07-delta-ingest-5k-vs-45k") {
      graft.operators.Incremental.crossDedupAgainstState(
          clone10(deltaFull), "doc_id", "text", incState, cfgInc,
          maxBucket = 20000)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    println("[stress] p07 survivors=" + surv10.size + "/" + surv1.size)
    require(surv10 ==
      surv1.flatMap(id => (0 until 10).map(i => id * 10 + i)),
      "p07 incremental-ingest clone invariance drifted")

    // registry-loaded apply (p09) at 10x (VERDICT r11 directive 4): the
    // crawl lifecycle under amplification. v1 = the three p09 models
    // (classifier + lang-id + unigram LM) fitted on the 1x corpus and
    // published to a versioned registry; batch 1 (clone copies 0-4)
    // scores FROM THE LOADED v1 copies; the refresh fits v2 on the full
    // 10x corpus (Laplace smoothing turns the x10 counts into drifted
    // weights) and batch 2 (copies 5-9) scores from loaded v2. Asserts:
    // (a) every loaded-model apply == the fit-model apply BIT-EXACTLY on
    //     its amplified batch (scores, predicted lang, and NLL per doc);
    // (b) after the refresh, re-scoring each batch from its RECORDED
    //     registry version reproduces the original outputs exactly.
    val M = graft.core.ModelStore
    val regRoot = java.nio.file.Files
      .createTempDirectory("graft_stress_registry").toFile.getAbsolutePath
    val scoreLog = java.nio.file.Files
      .createTempDirectory("graft_stress_scorelog").toFile.getAbsolutePath
    def ulmFit(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.unigramLmTrain(d, "text", vocabSize = 40, seedMaxLen = 4,
          seedMultiCap = 64, emIters = 2)
        .select("piece", "cnt", "logp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    def p09Apply(d: org.apache.spark.sql.DataFrame, w: Array[Double],
        b: Double, lid: Seq[(String, Array[Double], Double)],
        pieces: Seq[(String, Long, Double)]) = {
      val withClf = d.withColumn("clf_score",
        graft.functions.TextHashExprs.hashedGramScore(
          Dedup.normalize(coalesce(col("text"), lit(""))), w, b, 2))
      val scored = TextAnalysis.langIdScore(withClf, "doc_id", "text", lid,
          passthrough = Seq("clf_score", "text"), maxN = 2)
        .select(col("doc_id"), col("text"), col("clf_score"), col("pred_lang"))
      TextAnalysis.unigramLmScore(scored, "doc_id", "text",
          pieces.map(p => (p._1, p._3)),
          passthrough = Seq("clf_score", "pred_lang"))
        .select(col("doc_id"), col("clf_score"), col("pred_lang"), col("nll"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getDouble(1), r.getString(2), r.getDouble(3))).toMap
    }
    val batch1 = bigLang.filter(col("doc_id") % 10 < 5)
    val batch2 = bigLang.filter(col("doc_id") % 10 >= 5)
    // crawl 1: fit on the 1x corpus, publish v1, score batch 1 LOADED
    val ulm1 = ulmFit(docsFull)
    val fp1 = M.corpusFingerprint(docsFull, "doc_id", "text")
    val v1Clf = M.nextVersionPath(spark, regRoot, "quality_clf")
    M.save(spark, v1Clf, M.ClassifierModel(clfW, clfB, 1024, 2, fp1))
    val v1Lid = M.nextVersionPath(spark, regRoot, "langid")
    M.save(spark, v1Lid, M.LangIdModel(lidM, 1024, 2, fp1))
    val v1Ulm = M.nextVersionPath(spark, regRoot, "unigram_lm")
    M.save(spark, v1Ulm, M.UlmModel(ulm1, fp1))
    val fit1 = p09Apply(batch1, clfW, clfB, lidM, ulm1)
    val (lc1, ll1, lu1) = (M.loadClassifier(spark, v1Clf),
      M.loadLangId(spark, v1Lid), M.loadUlm(spark, v1Ulm))
    val loaded1 = time("p09-loaded-apply-v1-25k") {
      p09Apply(batch1, lc1.weights, lc1.bias, ll1.models, lu1.pieces)
    }
    require(loaded1 == fit1,
      "p09 loaded-v1 apply diverged from the fit apply at 10x")
    Seq("quality_clf" -> v1Clf, "langid" -> v1Lid, "unigram_lm" -> v1Ulm)
      .foreach { case (nm, v) =>
        graft.operators.Incremental.recordScoredBatch(
          spark, scoreLog, 1L, nm, v) }
    // crawl 2: the corpus grew 10x — refresh all three models, publish
    // v2, score batch 2 from the LOADED v2 copies
    val (w2, b2) = TextAnalysis.qualityClassifierFit(big, "text",
      TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
      dim = 1024, maxN = 2)
    val lid2 = TextAnalysis.langIdFit(bigLang, "text", "lang",
      dim = 1024, maxN = 2)
    val ulm2 = time("p09-ulm-refit-50k") { ulmFit(big) }
    require(!java.util.Arrays.equals(clfW, w2) || clfB != b2,
      "p09 refresh produced an identical classifier; no drift to reproduce")
    val fp2 = M.corpusFingerprint(big, "doc_id", "text")
    val v2Clf = M.nextVersionPath(spark, regRoot, "quality_clf")
    M.save(spark, v2Clf, M.ClassifierModel(w2, b2, 1024, 2, fp2))
    val v2Lid = M.nextVersionPath(spark, regRoot, "langid")
    M.save(spark, v2Lid, M.LangIdModel(lid2, 1024, 2, fp2))
    val v2Ulm = M.nextVersionPath(spark, regRoot, "unigram_lm")
    M.save(spark, v2Ulm, M.UlmModel(ulm2, fp2))
    require(v2Clf.endsWith("/v2") &&
      M.latestVersion(spark, regRoot, "quality_clf").contains(v2Clf),
      "p09 registry latest-version resolution drifted")
    val fit2 = p09Apply(batch2, w2, b2, lid2, ulm2)
    val (lc2, ll2, lu2) = (M.loadClassifier(spark, v2Clf),
      M.loadLangId(spark, v2Lid), M.loadUlm(spark, v2Ulm))
    val loaded2 = time("p09-loaded-apply-v2-25k") {
      p09Apply(batch2, lc2.weights, lc2.bias, ll2.models, lu2.pieces)
    }
    require(loaded2 == fit2,
      "p09 loaded-v2 apply diverged from the fit apply at 10x")
    Seq("quality_clf" -> v2Clf, "langid" -> v2Lid, "unigram_lm" -> v2Ulm)
      .foreach { case (nm, v) =>
        graft.operators.Incremental.recordScoredBatch(
          spark, scoreLog, 2L, nm, v) }
    // drift is observable on batch 1 (the reproduction claim below is
    // non-vacuous): the refreshed models score batch 1 differently
    val b1v2 = p09Apply(batch1, lc2.weights, lc2.bias, ll2.models,
      lu2.pieces)
    require(b1v2 != loaded1,
      "p09 v2 scores batch 1 identically to v1 — drift not observable")
    // the audit path under amplification: recorded version -> load ->
    // re-score -> bit-exact reproduction for BOTH batches
    for ((bid, bdf, orig) <- Seq((1L, batch1, loaded1),
        (2L, batch2, loaded2))) {
      def rec(nm: String) = graft.operators.Incremental
        .recordedVersion(spark, scoreLog, bid, nm)
        .getOrElse(sys.error(s"p09 score log lost batch $bid model $nm"))
      val rc = M.loadClassifier(spark, rec("quality_clf"))
      val rl = M.loadLangId(spark, rec("langid"))
      val ru = M.loadUlm(spark, rec("unigram_lm"))
      val replay = time(s"p09-recorded-replay-b$bid-25k") {
        p09Apply(bdf, rc.weights, rc.bias, rl.models, ru.pieces)
      }
      require(replay == orig,
        s"p09 batch $bid re-scored from its recorded versions diverged")
    }
    println("[stress] p09 registry: loaded==fit on both 25k batches, " +
      "recorded-version replay bit-exact after refresh")

    // cross-modal gate (m08) + composed multimodal filter (p10) at 10x
    // with KIND-PRESERVING clone ids: every clone of an image doc
    // carries the identical text AND (because doc_id%3 is preserved)
    // encodes the identical payload, so caption score, decoded
    // brightness, and every gate flag are clone-invariant — the
    // per-distinct (score, brightness, consistent) group counts and the
    // p10 keep counts must scale EXACTLY 10x through the real
    // encode->decode->join path. The model is fitted ONCE on the 1x
    // corpus (the production shape).
    def crossModalStats(d: org.apache.spark.sql.DataFrame) = {
      val img = d.filter(pmod(col("doc_id"), lit(3)) === 0)
      val page = regexp_replace(col("text"),
        "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
      val textSide = img.select(col("doc_id"),
        TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
        TextAnalysis.c4Signals(page).last,
        graft.functions.TextHashExprs.gopherRepetition(col("text"))
          .as("__r"),
        graft.functions.TextHashExprs.hashedGramScore(
          Dedup.normalize(coalesce(col("text"), lit(""))), clfW, clfB, 2)
          .as("s"))
      val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
        .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
        .reduce(_ && _)
      val media = graft.operators.Multimodal.decodeMeta(
          graft.operators.Multimodal.syntheticMedia(img))
        .select(col("media_id").as("doc_id"), col("width"), col("height"),
          col("content_sum"))
      val brightness = col("content_sum").cast("double") /
        (lit(3) * col("width") * col("height")).cast("double") / lit(255.0)
      val affinity = lit(0.5) + lit(0.5) * col("s") /
        (lit(1.0) + abs(col("s")))
      val consistent = abs(affinity - brightness) <= lit(0.35)
      val joined = textSide
        .select(col("doc_id"), col("gopher_pass"), repPass.as("rp"),
          col("c4_keep"), col("s"))
        .join(media, Seq("doc_id"))
        .select(col("s"), brightness.as("b"), consistent.as("c"),
          (col("gopher_pass") && col("rp") && col("c4_keep") && consistent)
            .as("keep"))
      val groups = joined.groupBy(col("s"), col("b"), col("c"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)) ->
          r.getLong(3)).toMap
      val keeps = joined.agg(count(lit(1)),
        sum(col("keep").cast("long"))).head()
      (groups, keeps.getLong(0), keeps.getLong(1))
    }
    val (cm1, cmN1, cmK1) = crossModalStats(docsFull)
    val (cm10, cmN10, cmK10) = time("m08-p10-crossmodal-50k") {
      crossModalStats(kindSafe)
    }
    println("[stress] crossmodal rows=" + cmN10 + "/" + cmN1 +
      " keep=" + cmK10 + "/" + cmK1 + " groups=" + cm10.size + "/" + cm1.size)
    require(cmN10 == cmN1 * 10 && cmK10 == cmK1 * 10,
      "m08/p10 clone invariance drifted (row/keep counts)")
    require(cm10 == cm1.map { case (k, v) => k -> (v * 10) },
      "m08 per-(score,brightness,flag) clone group counts drifted")

    // media resize / audio dedup at 10x with kind-preserving clone ids:
    // every clone resamples/decodes the identical payload, so the resize
    // checksum mass is exactly 10x and the distinct audio clip set is
    // IDENTICAL with 10x counts
    val rz1 = graft.operators.Multimodal.resizeImages(
        graft.operators.Multimodal.syntheticMedia(
          docsFull.filter(pmod(col("doc_id"), lit(3)) === 0)), maxEdge = 64)
      .agg(count(lit(1)), sum(col("resized_sum"))).head()
    val rz10 = time("image-resize-50k-real-resample") {
      graft.operators.Multimodal.resizeImages(
          graft.operators.Multimodal.syntheticMedia(
            kindSafe.filter(pmod(col("doc_id"), lit(3)) === 0)), maxEdge = 64)
        .agg(count(lit(1)), sum(col("resized_sum"))).head()
    }
    println("[stress] resize rows=" + rz10.getLong(0) + "/" + rz1.getLong(0) +
      " sum=" + rz10.getLong(1) + "/" + rz1.getLong(1))
    require(rz10.getLong(0) == rz1.getLong(0) * 10 &&
      rz10.getLong(1) == rz1.getLong(1) * 10, "resize clone mass drifted")
    val au1 = graft.operators.Multimodal.audioDedup(
        graft.operators.Multimodal.syntheticMedia(
          docsFull.filter(pmod(col("doc_id"), lit(3)) === 1)))
      .agg(count(lit(1)), sum(col("n_clips"))).head()
    val au10 = time("audio-dedup-50k-real-decode") {
      graft.operators.Multimodal.audioDedup(
          graft.operators.Multimodal.syntheticMedia(
            kindSafe.filter(pmod(col("doc_id"), lit(3)) === 1)))
        .agg(count(lit(1)), sum(col("n_clips"))).head()
    }
    println("[stress] audio groups=" + au10.getLong(0) + "/" + au1.getLong(0) +
      " clips=" + au10.getLong(1) + "/" + au1.getLong(1))
    require(au10.getLong(0) == au1.getLong(0) &&
      au10.getLong(1) == au1.getLong(1) * 10,
      "audio-dedup distinct-clip set drifted")

    // perceptual hash at 10x with kind-preserving clone ids: clones share
    // the EXACT hash, so the distinct-hash set is identical to 1x and
    // every hash's image count is exactly 10x — the grouping behavior the
    // per-SF fixture (all-distinct texts) cannot exercise
    val ph1 = graft.operators.Multimodal.imagePHash(
        graft.operators.Multimodal.syntheticMedia(
          docsFull.filter(pmod(col("doc_id"), lit(3)) === 0)))
      .groupBy(col("ahash")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)), sum(col("c"))).head()
    val ph10 = time("image-phash-50k-real-decode") {
      graft.operators.Multimodal.imagePHash(
          graft.operators.Multimodal.syntheticMedia(
            kindSafe.filter(pmod(col("doc_id"), lit(3)) === 0)))
        .groupBy(col("ahash")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), sum(col("c"))).head()
    }
    println("[stress] phash groups=" + ph10.getLong(0) + "/" + ph1.getLong(0) +
      " images=" + ph10.getLong(1) + "/" + ph1.getLong(1))
    require(ph10.getLong(0) == ph1.getLong(0) &&
      ph10.getLong(1) == ph1.getLong(1) * 10,
      "phash clone grouping drifted")

    // ANN recall eval on the 10x embedding corpus: the eval contract
    // (exactly k ground-truth rows per query, recall in [0,1]) must hold
    // under dense exact-duplicate clusters
    val rec = time("ann-recall-50k") {
      Similarity.recallAtK(
        Similarity.bruteForceTopK(bigEmb, "vec_id", "embedding",
          bigEmb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 10),
        Similarity.lshTopK(bigEmb, "vec_id", "embedding",
          bigEmb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, dim = 64, bitsPerTable = 5, tables = 8)).collect()
    }
    println("[stress] recall rows=" + rec.length +
      " mean=" + rec.map(_.getDouble(3)).sum / rec.length)
    require(rec.length == 8 && rec.forall(r => r.getLong(1) == 10L &&
      r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0),
      "recall eval contract drifted at 10x")

    // 10x lineitem (6M rows ≈ SF1): relational headliners, noop sink
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    val bigLi = (0 until 10).map(i =>
        li.withColumn("l_orderkey", col("l_orderkey") * 10 + i))
      .reduce(_ union _).localCheckpoint(true)
    println("[stress] lineitem rows=" + bigLi.count())
    bigLi.createOrReplaceTempView("big_lineitem")
    time("q1-shape-6M") {
      bigLi.filter(col("l_shipdate") <= lit("1999-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
          avg(col("l_extendedprice")).as("ap"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    val ord = graft.core.Tables.load(spark, dir, "orders")
    time("join-agg-6M") {
      bigLi.join(ord, expr("l_orderkey div 10") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
