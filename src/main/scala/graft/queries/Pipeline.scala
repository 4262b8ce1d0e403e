package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Beyond-reference LLM-pipeline operators (BASELINE.json north star):
  * deduplication, similarity search, text analysis, multimodal plumbing
  * over `documents` / `embeddings`. SQL-expressible signals carry a DuckDB
  * oracle; LSH/minhash/ANN entries are rows-only checked by the driver and
  * covered by ScalaTest specs with constructed fixtures instead.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Literal query set shared by t23 (boolean AND) and t24 (BM25): terms
    * drawn from the synthetic corpus vocabulary, plus one zero-df term
    * ("quantum") so the missing-term paths are exercised under the hash. */
  private val searchQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("join", "hash"),
    2 -> Seq("window", "stream", "sort"),
    3 -> Seq("customer", "query"),
    4 -> Seq("vector", "batch"),
    5 -> Seq("spark", "slow", "merge"),
    6 -> Seq("join", "quantum"))

  /** The same query set as a SQL VALUES list for the DuckDB twins —
    * DISTINCT per query, mirroring the operators' ts.distinct (a repeated
    * term would otherwise inflate the twin's per-query term count m and
    * silently diverge the hashes). */
  private val searchQueryValues: String = searchQueries
    .flatMap { case (q, ts) => ts.distinct.map(tm => s"($q,'$tm')") }
    .mkString(",")

  /** Literal phrase set for t25: phrase 2 repeats its word (multi-offset
    * votes), phrase 4 carries a zero-df word (empty by construction). */
  private val searchPhrases: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "value"),
    2 -> Seq("table", "table"),
    3 -> Seq("slow", "fast", "table"),
    4 -> Seq("join", "quantum"))

  /** (phrase, word, offset, length) VALUES rows for the DuckDB twin. */
  private val searchPhraseValues: String = searchPhrases
    .flatMap { case (q, ws) => ws.zipWithIndex.map { case (w, j) =>
      s"($q,'$w',$j,${ws.length})" } }.mkString(",")

  private val searchPhraseTermList: String = searchPhrases
    .flatMap(_._2).distinct.map(w => s"'$w'").mkString(",")

  /** ONE oracle for the whole decontamination contract family — t06
    * (broadcast join), t22 (bloom prefilter), t27 (stateless sorted-set
    * probe) all promise the IDENTICAL answer, so they share the literal
    * SQL: a tokenization fix can never silently fork the family. */
  private val decontaminateOracleSql: String = """
        WITH g AS (
          SELECT doc_id,
            CASE WHEN len(toks) < 8 THEN [list_aggregate(toks, 'string_agg', ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks)-6),
                        i -> toks[i] || toks[i+1] || toks[i+2] || toks[i+3] ||
                             toks[i+4] || toks[i+5] || toks[i+6] || toks[i+7]))
            END AS grams
          FROM (SELECT doc_id,
                  list_filter(string_split(
                    trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
                    x -> len(x) > 0) AS toks
                FROM documents)),
        bench AS (
          SELECT list_distinct(flatten(list(grams))) AS bg
          FROM g WHERE doc_id % 7 = 0)
        SELECT g.doc_id,
               CAST(len(list_intersect(g.grams, bench.bg)) AS BIGINT) AS shared_grams,
               len(list_intersect(g.grams, bench.bg)) > 0 AS contaminated
        FROM g, bench
        WHERE g.doc_id % 7 <> 0"""

  /** DuckDB twin of [[TextAnalysis.fingerprint]] (winnowing, k=8, w=4),
    * generated so the u64 arithmetic cannot drift from the Scala kernel
    * (TextHashKernels.winnowFingerprint). DuckDB has no wrapping 64-bit
    * integers, so every step runs in HUGEINT mod 2^64: the rolling
    * polynomial hash becomes a per-window direct sum (ring-homomorphic to
    * the wrapped rolling form), the splitmix64 multiplies split their
    * constant into 32-bit halves to stay inside INT128, and XOR round-trips
    * through signed BIGINT. Window minima compare SIGNED longs, exactly as
    * the JVM kernel does. Verified bit-exact on all 500 sf0.01 docs.
    * Assumes every normalized doc has ≥ 8 chars (corpus min is 44). */
  /** Shared CTE block for the d13/d14 duplicate-span oracles: word
    * tokenization, positioned 8-grams (list slice, DuckDB ranges are
    * end-exclusive and 1-based), duplicated start positions (count window
    * over the gram), and the gaps-and-islands grouping key (a new island
    * starts when a start does not overlap the previous gram's [pos,pos+7]
    * coverage). Integer-exact throughout. */
  private def dupSpanCtes: String = dupSpanCtesFrom("documents")

  /** Same CTE block over an arbitrary source relation (composed pipeline
    * oracles dedup a SUBSET, e.g. p01's quality representatives). */
  private def dupSpanCtesFrom(src: String): String = s"""
        toks AS (
          SELECT doc_id, list_filter(string_split(
              trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')),
              ' '), x -> len(x) > 0) AS t
          FROM $src),
        grams AS (
          SELECT doc_id, u.i - 1 AS pos,
                 array_to_string(t[u.i:u.i+7], ' ') AS gram
          FROM toks, unnest(range(1, greatest(len(t) - 6, 1))) AS u(i)),
        dpos AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n
            FROM grams)
          WHERE n > 1),
        marked AS (
          SELECT doc_id, pos,
            CASE WHEN pos <= lag(pos)
                   OVER (PARTITION BY doc_id ORDER BY pos) + 7
                 THEN 0 ELSE 1 END AS ni
          FROM dpos),
        isl AS (
          SELECT doc_id, pos,
            SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS g
          FROM marked)"""

  /** Pure-Scala BPE twin for t16's GENERATED oracle: identical
    * tokenization (lower → whitespace-class collapse → trim → split),
    * identical per-position pair counting, identical (freq DESC, a, b)
    * tiebreak, identical leftmost-first merge — run single-node on the
    * collected corpus, emitted as literal VALUES. The driver's compare
    * then checks the DISTRIBUTED trainer against this independent
    * single-node replay (the s03 trained-state pattern). */
  private def mergeLeftmost(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Single-node BPE replay (memoized per (dir, numMerges)): word
    * frequencies from the collected corpus with tokenization identical to
    * TextAnalysis.tokens, then the same deterministic merge loop as the
    * distributed trainer. Returns (rank, a, b, pairFreq) rows. */
  private val bpeReplayCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), Seq[(Int, String, String, Long)]]
  private def bpeReplay(s: SparkSession, dir: String,
      numMerges: Int): Seq[(Int, String, String, Long)] =
    bpeReplayCache.getOrElseUpdate((dir, numMerges), {
      val freq = scala.collection.mutable.HashMap.empty[String, Long]
      Tables.load(s, dir, "documents").select("text").collect().foreach { r =>
        Option(r.getString(0)).getOrElse("").toLowerCase
          .replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim
          .split(" ").filter(_.nonEmpty)
          .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L)
      }
      var vocab: Seq[(Vector[String], Long)] =
        freq.toSeq.map { case (w, f) => // code-point split = trainer's split(w,"")
          (graft.operators.TextAnalysis.codePointSplit(w), f) }
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var rank = 0
      var go = true
      while (rank < numMerges && go) {
        val pf = scala.collection.mutable.HashMap.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          var i = 0
          while (i + 1 < syms.length) {
            val k = (syms(i), syms(i + 1))
            pf(k) = pf.getOrElse(k, 0L) + f
            i += 1
          }
        }
        if (pf.isEmpty) go = false
        else {
          val ((a, b), f) =
            pf.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head
          merges += ((rank, a, b, f))
          vocab = vocab.map { case (syms, fr) => (mergeLeftmost(syms, a, b), fr) }
          rank += 1
        }
      }
      merges.result()
    })

  /** d17 oracle: single-node exact longest-repeat replay — ascending-L
    * sweep with monotonic pruning (a doc with no duplicated L-gram cannot
    * have one at L+1, and a pruned doc can never be another doc's partner:
    * sharing an L-gram would have kept both active). Plain string grams —
    * no hashes — so the distributed doubling/binary-search path is checked
    * against an independent algorithm AND collision-free arithmetic. */
  private def longestRepeatOracle(s: SparkSession, dir: String): String = {
    val toks = Tables.load(s, dir, "documents").select("doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> Option(r.getString(1)).getOrElse("")
          .toLowerCase.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim
          .split(" ").filter(_.nonEmpty).toVector
      }
    val best = scala.collection.mutable.HashMap.empty[Long, Long]
    var active = toks.toSeq
    var L = 1
    while (active.nonEmpty) {
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      active.foreach { case (_, t) =>
        var i = 0
        while (i + L <= t.length) {
          val g = t.slice(i, i + L).mkString(" ")
          counts(g) = counts.getOrElse(g, 0) + 1
          i += 1
        }
      }
      active = active.filter { case (id, t) =>
        var hit = false
        var i = 0
        while (!hit && i + L <= t.length) {
          if (counts(t.slice(i, i + L).mkString(" ")) > 1) hit = true
          i += 1
        }
        if (hit) best(id) = L.toLong
        hit
      }
      L += 1
    }
    if (best.isEmpty)
      "SELECT doc_id, CAST(0 AS BIGINT) AS longest_repeat FROM documents"
    else {
      val vals = best.toSeq.sorted.map { case (id, lr) => s"($id, $lr)" }
        .mkString(", ")
      s"""
        SELECT d.doc_id, CAST(COALESCE(v.lr, 0) AS BIGINT) AS longest_repeat
        FROM documents d LEFT JOIN (VALUES $vals) v(doc_id, lr)
          ON v.doc_id = d.doc_id"""
    }
  }

  /** Deterministic literal centroids for p03's media-feature cluster stage
    * — seeded constants (no training), shared verbatim by the plan and the
    * oracle generator, the same discipline as the seeded LSH hyperplanes. */
  private def mediaCentroids(k: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)(Seq.fill(dim)(rnd.nextDouble()))
  }

  /** p03 oracle: independent single-node replay of the whole media-prep
    * pipeline — real encode (PNG/WAV) + real content-statistics features
    * (decoded-pixel/PCM stats; the feature VALUES are not SQL-expressible,
    * so the replay recomputes them and inlines the final answer), naive
    * all-pairs within-cluster cosine (vs the distributed capped pair
    * join), greedy per-kind byte-budget selection. Fold orders match the
    * codegen kernels exactly (float widened to double, strict
    * left-to-right), so the compare is bit-exact. */
  private def mediaPrepOracle(s: SparkSession, dir: String, k: Int,
      threshold: Double, budgetBytes: Long): String = {
    val cents = mediaCentroids(k, 16, 11L).map(_.toArray)
    val rows = Tables.load(s, dir, "documents").select("doc_id", "text")
      .collect().map { r =>
        val id = r.getLong(0)
        val text = if (r.isNullAt(1)) null else r.getString(1)
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        // the REAL encoder (PNG/WAV containers) and the REAL content-
        // statistics feature extractor, replayed single-node
        val payload = Multimodal.encodeMedia(id, kind,
          if (text == null) null else text.getBytes("UTF-8"))
        val nBytes = if (payload == null) 0L else payload.length.toLong
        (id, kind, nBytes, Multimodal.contentFeatures(id, kind, payload, 16))
      }
    def dotf(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cluster(f: Array[Float]): Int = { // CentroidKernels.nearest twin
      var best = -1; var bestD = 0.0; var i = 0
      while (i < cents.length) {
        var acc = 0.0; var t0 = 0
        while (t0 < cents(i).length) {
          val d0 = f(t0).toDouble - cents(i)(t0); acc += d0 * d0; t0 += 1
        }
        if (best < 0 || acc < bestD || (bestD != bestD && acc == acc)) {
          best = i; bestD = acc
        }
        i += 1
      }
      best
    }
    val victims = scala.collection.mutable.HashSet.empty[Long]
    rows.groupBy(r => cluster(r._4)).values.foreach { g =>
      val sorted = g.sortBy(_._1)
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        val a = sorted(i); val b = sorted(j)
        val na = math.sqrt(dotf(a._4, a._4)); val nb = math.sqrt(dotf(b._4, b._4))
        if (dotf(a._4, b._4) / (na * nb) >= threshold) victims += b._1
      }
    }
    val vals = rows.filter(r => !victims.contains(r._1))
      .groupBy(_._2).toSeq.flatMap { case (kind, g) =>
        val ord = g.sortBy(r => (-r._4(0).toDouble, r._1))
        var cum = 0L
        ord.zipWithIndex.flatMap { case ((id, _, nb, f), idx) =>
          cum += nb
          if (cum <= budgetBytes)
            Some(s"($id, '$kind', $nb, CAST('${f(0).toDouble}' AS DOUBLE), " +
              s"${idx + 1}, $cum)")
          else None
        }
      }
    if (vals.isEmpty)
      """SELECT CAST(doc_id AS BIGINT) AS media_id, '' AS kind,
           CAST(0 AS BIGINT) AS n_bytes, CAST(0 AS DOUBLE) AS feat_score,
           CAST(0 AS BIGINT) AS rank, CAST(0 AS BIGINT) AS cum_bytes
         FROM documents WHERE FALSE"""
    else
      s"""
        SELECT CAST(media_id AS BIGINT) AS media_id, kind,
               CAST(n_bytes AS BIGINT) AS n_bytes, feat_score,
               CAST(rank AS BIGINT) AS rank, CAST(cum_bytes AS BIGINT) AS cum_bytes
        FROM (VALUES ${vals.mkString(",\n          ")})
          v(media_id, kind, n_bytes, feat_score, rank, cum_bytes)"""
  }

  /** Memoized DISTRIBUTED training run (t16's operator) — shared by t17's
    * query so Verify trains once per JVM; the oracle side deliberately
    * uses [[bpeReplay]] instead, keeping the cross-check independent. */
  private val bpeTrainCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), Seq[(String, String)]]
  private def bpeTrainedMerges(s: SparkSession, dir: String,
      numMerges: Int): Seq[(String, String)] =
    bpeTrainCache.getOrElseUpdate((dir, numMerges),
      graft.operators.TextAnalysis.bpeTrain(
          t(s, dir, "documents"), "text", numMerges)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** t17 oracle: the replay's merges applied (same leftmost-first rule)
    * to every distinct corpus word → a literal word → subword-count map,
    * joined to the exploded tokens and summed per doc. */
  private def bpeEncodeOracle(s: SparkSession, dir: String,
      numMerges: Int): String = {
    val merges = bpeReplay(s, dir, numMerges).map(m => (m._2, m._3))
    val words = scala.collection.mutable.LinkedHashSet.empty[String]
    Tables.load(s, dir, "documents").select("text").collect().foreach { r =>
      Option(r.getString(0)).getOrElse("").toLowerCase
        .replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim
        .split(" ").filter(_.nonEmpty).foreach(words += _)
    }
    def enc(w: String): Int = {
      var syms = graft.operators.TextAnalysis.codePointSplit(w)
      merges.foreach { case (a, b) =>
        if (syms.length > 1) syms = mergeLeftmost(syms, a, b) }
      syms.length
    }
    def q(x: String) = "'" + x.replace("'", "''") + "'"
    val mapRows = words.toSeq.sorted
      .map(w => s"(${q(w)}, ${enc(w)})").mkString(", ")
    raw"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(
              trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')),
              ' '), x -> len(x) > 0)) AS word
          FROM documents),
        map(word, n_sub) AS (VALUES $mapRows),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(n_sub) AS BIGINT) AS n_subwords
          FROM toks JOIN map USING (word) GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(agg.n_tokens, 0) AS n_tokens,
               COALESCE(agg.n_subwords, 0) AS n_subwords
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id"""
  }

  /** Single-node unigram-LM replay (memoized per (dir, params)): word
    * freqs from the collected corpus (the bpeReplay tokenization), then
    * the SAME deterministic seed → Viterbi-EM → prune sequence as
    * [[graft.operators.TextAnalysis.unigramLmTrain]], reimplemented with
    * plain driver loops — including an INDEPENDENT Viterbi that shares
    * only the documented convention (code-point symbols, longest
    * trailing piece on exact ties). Returns (piece, cnt, logp). */
  private val ulmReplayCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Int, Int), Seq[(String, Long, Double)]]
  private def ulmReplay(s: SparkSession, dir: String, vocabSize: Int,
      seedMaxLen: Int, seedMultiCap: Int,
      emIters: Int): Seq[(String, Long, Double)] =
    ulmReplayCache.getOrElseUpdate(
      (dir, vocabSize, seedMaxLen, seedMultiCap, emIters), {
      val freq = scala.collection.mutable.HashMap.empty[String, Long]
      Tables.load(s, dir, "documents").select("text").collect().foreach { r =>
        Option(r.getString(0)).getOrElse("").toLowerCase
          .replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim
          .split(" ").filter(_.nonEmpty)
          .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L)
      }
      val wordSyms = freq.toSeq.map { case (w, f) =>
        (graft.operators.TextAnalysis.codePointSplit(w), f) }
      def cpn(p: String): Int = p.codePointCount(0, p.length)
      // independent Viterbi: back-pointers store the PIECE, not an index
      def viterbi(syms: Vector[String], logp: Map[String, Double],
          maxLen: Int): List[String] = {
        val n = syms.length
        if (n == 0) return Nil
        val best = Array.fill(n + 1)(Double.NegativeInfinity)
        val bp = new Array[String](n + 1)
        best(0) = 0.0
        for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
          val piece = syms.slice(j, i).mkString
          logp.get(piece).foreach { lp =>
            if (best(j) + lp > best(i)) { best(i) = best(j) + lp; bp(i) = piece }
          }
        }
        var out = List.empty[String]; var k = n
        while (k > 0) { out = bp(k) :: out; k -= cpn(bp(k)) }
        out
      }
      val sc = scala.collection.mutable.HashMap.empty[String, Long]
      wordSyms.foreach { case (syms, f) =>
        for (i <- syms.indices; l <- 1 to seedMaxLen if i + l <= syms.length)
          sc.updateWith(syms.slice(i, i + l).mkString)(
            o => Some(o.getOrElse(0L) + f))
      }
      val chars = sc.toSeq.filter(p => cpn(p._1) == 1).sortBy(_._1)
      val multi0 = sc.toSeq.filter(p => cpn(p._1) > 1)
        .sortBy { case (p, c) => (-c, p) }.take(seedMultiCap)
      def estep(vc: Seq[(String, Long)]): Seq[(String, Long)] = {
        val total = vc.map(_._2).sum; val v = vc.size
        val logp = vc.map { case (p, c) =>
          p -> math.log((c + 1.0) / (total.toDouble + v)) }.toMap
        val maxLen = vc.map(p => cpn(p._1)).max
        val got = scala.collection.mutable.HashMap.empty[String, Long]
        wordSyms.foreach { case (syms, f) =>
          viterbi(syms, logp, maxLen).foreach(p =>
            got.updateWith(p)(o => Some(o.getOrElse(0L) + f))) }
        vc.map { case (p, _) => p -> got.getOrElse(p, 0L) }
      }
      def refit(vc: Seq[(String, Long)], iters: Int): Seq[(String, Long)] =
        (0 until iters).foldLeft(vc)((acc, _) => estep(acc))
      var vocab: Seq[(String, Long)] = chars ++ multi0
      var multiN = multi0.size
      while (chars.size + multiN > vocabSize && multiN > 0) {
        vocab = refit(vocab, emIters)
        val (cs, ms) = vocab.partition(p => cpn(p._1) == 1)
        val keepN = math.max(vocabSize - cs.size, ms.size * 3 / 4)
        vocab = cs ++ ms.sortBy { case (p, c) => (-c, p) }.take(keepN)
        multiN = vocab.size - cs.size
      }
      val fin = refit(vocab, 1)
      val total = fin.map(_._2).sum; val v = fin.size
      fin.map { case (p, c) =>
        (p, c, math.log((c + 1.0) / (total.toDouble + v))) }
    })

  private def ulmParams = (40, 4, 64, 2) // (vocabSize, seedMaxLen, cap, em)

  private def ulmOracle(s: SparkSession, dir: String): String = {
    val (vs, ml, cap, em) = ulmParams
    val rows = ulmReplay(s, dir, vs, ml, cap, em)
    def q(x: String) = "'" + x.replace("'", "''") + "'"
    rows.map { case (p, c, lp) =>
      s"(${q(p)}, CAST($c AS BIGINT), CAST('$lp' AS DOUBLE))" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") AS t(piece, cnt, logp)")
  }

  /** Memoized DISTRIBUTED-trained unigram vocab triples (piece, cnt,
    * logp) — t39/t40 encode and score with the distributed trainer's
    * vocab while their oracles re-derive everything from the independent
    * replay, so train and encode cross-check end to end (the t17
    * pattern); p09 persists the SAME triples through the ModelStore
    * registry and scores from the LOADED copy. */
  private val ulmPiecesCache = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(String, Long, Double)]]
  private def ulmTrainedPieces(s: SparkSession,
      dir: String): Seq[(String, Long, Double)] =
    ulmPiecesCache.getOrElseUpdate(dir, {
      val (vs, ml, cap, em) = ulmParams
      graft.operators.TextAnalysis.unigramLmTrain(
          t(s, dir, "documents"), "text", vs, ml, cap, em)
        .select("piece", "cnt", "logp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    })
  private def ulmTrainedVocab(s: SparkSession,
      dir: String): Seq[(String, Double)] =
    ulmTrainedPieces(s, dir).map(p => (p._1, p._3))

  private def ulmEncodeOracle(s: SparkSession, dir: String): String = {
    val (vs, ml, cap, em) = ulmParams
    val fin = ulmReplay(s, dir, vs, ml, cap, em)
    val total = fin.map(_._2).sum; val v = fin.size
    val logp = fin.map { case (p, c, _) =>
      p -> math.log((c + 1.0) / (total.toDouble + v)) }.toMap
    val maxLen = fin.map(p => p._1.codePointCount(0, p._1.length)).max
    val words = scala.collection.mutable.LinkedHashSet.empty[String]
    Tables.load(s, dir, "documents").select("text").collect().foreach { r =>
      Option(r.getString(0)).getOrElse("").toLowerCase
        .replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim
        .split(" ").filter(_.nonEmpty).foreach(words += _)
    }
    // the replay's own Viterbi, reused via the memoized final table: a
    // driver re-derivation (bp(i) piece back-pointers) — NOT the engine's
    def cpn(p: String): Int = p.codePointCount(0, p.length)
    def nPieces(w: String): Int = {
      val syms = graft.operators.TextAnalysis.codePointSplit(w)
      val n = syms.length
      if (n == 0) return 0
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val bp = new Array[String](n + 1)
      best(0) = 0.0
      for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
        val piece = syms.slice(j, i).mkString
        logp.get(piece).foreach { lp =>
          if (best(j) + lp > best(i)) { best(i) = best(j) + lp; bp(i) = piece }
        }
      }
      var cntP = 0; var k = n
      while (k > 0) { cntP += 1; k -= cpn(bp(k)) }
      cntP
    }
    def q(x: String) = "'" + x.replace("'", "''") + "'"
    val mapRows = words.toSeq.sorted
      .map(w => s"(${q(w)}, ${nPieces(w)})").mkString(", ")
    raw"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(
              trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')),
              ' '), x -> len(x) > 0)) AS word
          FROM documents),
        map(word, n_p) AS (VALUES $mapRows),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(n_p) AS BIGINT) AS n_pieces
          FROM toks JOIN map USING (word) GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(agg.n_tokens, 0) AS n_tokens,
               COALESCE(agg.n_pieces, 0) AS n_pieces
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id"""
  }

  /** DuckDB twin of t40: the replay's per-word (piece count, NLL) as
    * exact literals, per-doc BIGINT sums plus the SAME sorted-(word, nll)
    * double fold the engine runs (the t28 list_sort/list_reduce shape —
    * lowercase-ASCII words sort identically under both engines' binary
    * collation). */
  private def ulmPplOracle(s: SparkSession, dir: String): String = {
    val (vs, ml, cap, em) = ulmParams
    val fin = ulmReplay(s, dir, vs, ml, cap, em)
    val total = fin.map(_._2).sum; val v = fin.size
    val logp = fin.map { case (p, c, _) =>
      p -> math.log((c + 1.0) / (total.toDouble + v)) }.toMap
    val maxLen = fin.map(p => p._1.codePointCount(0, p._1.length)).max
    def cpn(p: String): Int = p.codePointCount(0, p.length)
    def segment(w: String): List[String] = {
      val syms = graft.operators.TextAnalysis.codePointSplit(w)
      val n = syms.length
      if (n == 0) return Nil
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val bp = new Array[String](n + 1)
      best(0) = 0.0
      for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
        val piece = syms.slice(j, i).mkString
        logp.get(piece).foreach { lp =>
          if (best(j) + lp > best(i)) { best(i) = best(j) + lp; bp(i) = piece }
        }
      }
      var out = List.empty[String]; var k = n
      while (k > 0) { out = bp(k) :: out; k -= cpn(bp(k)) }
      out
    }
    val words = scala.collection.mutable.LinkedHashSet.empty[String]
    Tables.load(s, dir, "documents").select("text").collect().foreach { r =>
      Option(r.getString(0)).getOrElse("").toLowerCase
        .replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim
        .split(" ").filter(_.nonEmpty).foreach(words += _)
    }
    def q(x: String) = "'" + x.replace("'", "''") + "'"
    val mapRows = words.toSeq.sorted.map { w =>
      val ps = segment(w)
      val nll = -ps.map(logp).sum
      s"(${q(w)}, ${ps.length}, CAST('$nll' AS DOUBLE))"
    }.mkString(", ")
    raw"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(
              trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')),
              ' '), x -> len(x) > 0)) AS word
          FROM documents),
        map(word, n_p, w_nll) AS (VALUES $mapRows),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(n_p) AS BIGINT) AS n_pieces,
                 list_reduce(list_prepend(CAST('0.0' AS DOUBLE),
                   list_transform(list_sort(list(struct_pack(
                     w := word, c := w_nll))), x -> x.c)),
                   (a, x) -> a + x) AS nll
          FROM toks JOIN map USING (word) GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(agg.n_tokens, 0) AS n_tokens,
               COALESCE(agg.n_pieces, 0) AS n_pieces,
               COALESCE(agg.nll, 0.0) AS nll,
               CASE WHEN COALESCE(agg.n_pieces, 0) > 0
                    THEN COALESCE(agg.nll, 0.0) /
                         CAST(agg.n_pieces AS DOUBLE) END AS avg_nll
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id"""
  }

  private def bpeOracle(s: SparkSession, dir: String, numMerges: Int): String = {
    val rows = bpeReplay(s, dir, numMerges)
    if (rows.isEmpty)
      "SELECT 0 AS merge_rank, '' AS sym_a, '' AS sym_b, " +
        "CAST(0 AS BIGINT) AS pair_freq WHERE false"
    else {
      def q(x: String) = "'" + x.replace("'", "''") + "'"
      rows.map { case (r, a, b, f) => s"($r, ${q(a)}, ${q(b)}, $f)" }
        .mkString("SELECT * FROM (VALUES ", ", ",
          ") AS t(merge_rank, sym_a, sym_b, pair_freq)")
    }
  }

  private def winnowOracle: String = {
    val N = "18446744073709551616::HUGEINT"
    val HALF = "9223372036854775808::HUGEINT"
    def tos(u: String) =
      s"CAST(($u) - (CASE WHEN ($u) >= $HALF THEN $N ELSE 0::HUGEINT END) AS BIGINT)"
    def tou(s0: String) =
      s"(CASE WHEN ($s0) < 0 THEN CAST(($s0) AS HUGEINT) + $N ELSE CAST(($s0) AS HUGEINT) END)"
    def xor64(a: String, b: String) = tou(s"xor(${tos(a)}, ${tos(b)})")
    def shr(u: String, k: Int) = s"(($u) // ${BigInt(1) << k}::HUGEINT)"
    def mulmod(x: String, c: BigInt) = {
      val (bh, bl) = (c >> 32, c & 0xFFFFFFFFL)
      s"((((($x) * $bh::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT" +
        s" + ($x) * $bl::HUGEINT) % $N)"
    }
    val stages = Seq( // splitmix64 finalizer, stage by stage
      "z" -> s"((z + ${BigInt("9e3779b97f4a7c15", 16)}::HUGEINT) % $N)",
      "z1" -> mulmod(xor64("z1", shr("z1", 30)), BigInt("bf58476d1ce4e5b9", 16)),
      "z2" -> mulmod(xor64("z2", shr("z2", 27)), BigInt("94d049bb133111eb", 16)),
      "z3" -> tos(xor64("z3", shr("z3", 31))))
    val mixed = stages.foldLeft("h") { case (acc, (v, e)) =>
      s"list_transform($acc, $v -> $e)"
    }
    val P = BigInt(1099511628211L)
    val pk = (0 to 7).map(j => P.modPow(BigInt(j), BigInt(1) << 64))
    val poly = ((0 to 6).map(j =>
      s"c[i${if (j == 0) "" else "+" + j}] * ${pk(7 - j)}::HUGEINT") :+ "c[i+7]")
      .mkString(" + ")
    val wrapSum =
      s"CAST((((list_reduce(list_transform(f, v -> CAST(v AS HUGEINT)), (a,b) -> a+b)" +
        s" % $N) + $N + $HALF) % $N) - $HALF AS BIGINT)"
    s"""
        WITH codes AS (
          SELECT doc_id, length(nrm) AS n,
            list_transform(range(1, length(nrm)+1),
              i -> CAST(unicode(nrm[i:i]) AS HUGEINT)) AS c
          FROM (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' ') AS nrm
                FROM documents)),
        hs AS (
          SELECT doc_id,
            list_transform(range(1, n - 6), i -> ($poly) % $N) AS h
          FROM codes WHERE n >= 8),
        mixed AS (SELECT doc_id, $mixed AS ms FROM hs),
        fp AS (
          SELECT doc_id,
            CASE WHEN len(ms) <= 4 THEN [list_aggregate(ms, 'min')]
                 ELSE list_distinct(list_transform(range(1, len(ms) - 2),
                        i -> list_aggregate(ms[i:i+3], 'min')))
            END AS f
          FROM mixed)
        SELECT doc_id,
          CAST(len(f) AS BIGINT) AS fp_size,
          list_aggregate(f, 'min') AS fp_min,
          list_aggregate(f, 'max') AS fp_max,
          $wrapSum AS fp_sum
        FROM fp"""
  }

  /** Exact DOUBLE literal list: plain decimal literals parse as DECIMAL in
    * DuckDB, and a list's common DECIMAL type quantizes any element whose
    * shortest double repr needs more fractional digits than the common
    * scale (~1e-18 perturbations — argmin-only oracles tolerate them, a
    * value-emitting oracle like s06 does not). The string→DOUBLE cast is
    * strtod: correctly rounded, so each literal is the EXACT double the
    * Spark plan inlined. */
  /** Exact-double list literal, compact form: one space-joined string
    * split + cast (each element takes its shortest round-trip decimal
    * instead of a ~30-char CAST wrapper — the 1024-dim weight tables are
    * the second-largest oracle_sql.json cost after the hash chain, and
    * the cast-from-string path is byte-identical to CAST('x' AS DOUBLE)). */
  private def dlistSql(xs: Seq[Double]): String =
    // empty input short-circuits: string_split('', ' ') is [''], whose
    // CAST('' AS DOUBLE) would make the oracle unparseable
    if (xs.isEmpty) "CAST([] AS DOUBLE[])"
    else s"list_transform(string_split('${xs.mkString(" ")}', ' '), " +
      "__v -> CAST(__v AS DOUBLE))"

  /** The exact left-to-right double fold both engines share (Spark
    * DotProduct kernel ≡ DuckDB list_reduce). */
  private def foldDotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x,y) -> x+y)"

  private def normSql(v: String): String =
    s"sqrt(list_reduce(list_transform($v, " +
      s"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"

  /** DuckDB twin of [[Similarity.bruteForceTopK]] over the sf fixtures
    * (vec_id < 8 queries, k=10) — shared by s01 and the s09 recall eval. */
  private val annBruteOracle: String = """
        WITH c AS (
          SELECT vec_id, embedding,
            sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b)) AS nrm
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_reduce(list_transform(list_zip(c.embedding, q.embedding),
              z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (a,b) -> a+b)
              / (c.nrm * q.nrm) AS cos_sim
          FROM c q JOIN c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
        QUALIFY rank <= 10"""

  /** The m-bit hyperplane sign bucket of `vecExpr` — the planes are seeded
    * CONSTANTS, so their exact double values inline as SQL literals
    * (Double.toString round-trips), making the "approximate" LSH paths
    * hash-verifiable: the oracle reproduces the same approximation. */
  private def lshBucketSql(vecExpr: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${foldDotSql(vecExpr, dlistSql(p))} >= 0 " +
        s"THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB twin of [[Similarity.lshTopK]] (s02): bucket codes from the
    * inlined hyperplanes, candidate pairs from shared (table, bucket),
    * exact fold-cosine re-rank, row_number top-k. */
  private def annLshOracle(tables: Int, bits: Int, seed: Long, k: Int): String = {
    val bks = (0 until tables)
      .map(t => lshBucketSql("embedding",
        graft.operators.Similarity.hyperplanes(64, bits, seed + t)))
      .mkString("[", ",\n            ", "]")
    s"""
        WITH c AS MATERIALIZED (
          SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
            $bks AS bks
          FROM embeddings),
        e AS MATERIALIZED (
          SELECT vec_id, tbl.range AS tbl, bks[tbl.range] AS bkt
          FROM c, range(1, ${tables + 1}) tbl),
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
          FROM e n JOIN e q ON n.tbl = q.tbl AND n.bkt = q.bkt
          WHERE q.vec_id < 8 AND n.vec_id <> q.vec_id),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
            ${foldDotSql("cn.embedding", "cq.embedding")} / (cn.nrm * cq.nrm) AS cos_sim
          FROM cand
          JOIN c cn ON cn.vec_id = cand.neighbor_id
          JOIN c cq ON cq.vec_id = cand.query_id)
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
        QUALIFY rank <= $k"""
  }

  /** DuckDB twin of [[Similarity.knnGraph]] (s05): same inlined-hyperplane
    * buckets (seed offset +200), candidate pairs from any shared (table,
    * bucket) in BOTH directions, exact fold-cosine re-rank, top-k per node. */
  private def knnGraphOracle(tables: Int, bits: Int, seed: Long, k: Int): String = {
    val bks = (0 until tables)
      .map(t => lshBucketSql("embedding",
        graft.operators.Similarity.hyperplanes(64, bits, seed + 200 + t)))
      .mkString("[", ",\n            ", "]")
    s"""
        WITH c AS MATERIALIZED (
          SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
            $bks AS bks
          FROM embeddings),
        e AS MATERIALIZED (
          SELECT vec_id, tbl.range AS tbl, bks[tbl.range] AS bkt
          FROM c, range(1, ${tables + 1}) tbl),
        cand AS (
          SELECT DISTINCT a.vec_id AS node_id, b.vec_id AS neighbor_id
          FROM e a JOIN e b ON a.tbl = b.tbl AND a.bkt = b.bkt
          WHERE a.vec_id <> b.vec_id),
        scored AS (
          SELECT cand.node_id, cand.neighbor_id,
            ${foldDotSql("ca.embedding", "cb.embedding")} / (ca.nrm * cb.nrm) AS cos_sim
          FROM cand
          JOIN c ca ON ca.vec_id = cand.node_id
          JOIN c cb ON cb.vec_id = cand.neighbor_id)
        SELECT node_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY node_id
                 ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
        QUALIFY rank <= $k"""
  }

  /** Shared CTE block for the [[Similarity.embeddingNearDupPairs]] twins
    * (d06, d10): inlined-hyperplane buckets → candidate pairs → exact
    * fold-cosine verified `pairs(id_a, id_b, cos_sim)`. */
  private def embNearDupCtes(tables: Int, bits: Int, seed: Long,
      threshold: Double): String = {
    val bks = (0 until tables)
      .map(t => lshBucketSql("embedding",
        graft.operators.Similarity.hyperplanes(64, bits, seed + 100 + t)))
      .mkString("[", ",\n            ", "]")
    s"""c AS MATERIALIZED (
          SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
            $bks AS bks
          FROM embeddings),
        e AS MATERIALIZED (
          SELECT vec_id, tbl.range AS tbl, bks[tbl.range] AS bkt
          FROM c, range(1, ${tables + 1}) tbl),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM e a JOIN e b ON a.tbl = b.tbl AND a.bkt = b.bkt
          WHERE a.vec_id < b.vec_id),
        pairs AS (
          SELECT cand.id_a, cand.id_b,
            ${foldDotSql("ca.embedding", "cb.embedding")} / (ca.nrm * cb.nrm)
              AS cos_sim
          FROM cand
          JOIN c ca ON ca.vec_id = cand.id_a
          JOIN c cb ON cb.vec_id = cand.id_b
          WHERE ${foldDotSql("ca.embedding", "cb.embedding")} / (ca.nrm * cb.nrm)
            >= $threshold)"""
  }

  /** DuckDB twin of [[Similarity.embeddingNearDupPairs]] (d06). */
  private def embNearDupOracle(tables: Int, bits: Int, seed: Long,
      threshold: Double): String =
    s"""
        WITH ${embNearDupCtes(tables, bits, seed, threshold)}
        SELECT id_a, id_b, cos_sim FROM pairs"""

  /** DuckDB twin of [[Similarity.semDedup]] (d10): the d06 pair CTEs, then
    * the same recursive transitive closure the d07 oracle uses — a victim
    * is any node that can reach a smaller id through the near-dup graph. */
  private def semDedupOracle(tables: Int, bits: Int, seed: Long,
      threshold: Double): String =
    s"""
        WITH ${embNearDupCtes(tables, bits, seed, threshold)},
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
            WHERE e.b <> r.src)
          SELECT * FROM r),
        victims AS (
          SELECT src AS node FROM reach GROUP BY src HAVING min(dst) < src)
        SELECT vec_id, label FROM embeddings
        WHERE vec_id NOT IN (SELECT node FROM victims)"""

  /** XXH64(seed=42) of a token's UTF-8 bytes in DuckDB HUGEINT mod-2^64
    * SQL — the engine-portable twin of Spark's `xxhash64`. The tail path is
    * unrolled for inputs < 32 bytes (3×8-byte, one 4-byte, 3×1-byte
    * conditional steps; corpus max token is 8 bytes); rotations become
    * shift-add on disjoint bit ranges, variable×constant multiplies split
    * the constant into 32-bit halves to stay inside INT128. Verified
    * bit-exact against the JVM on every sf0.01 document before adoption.
    * Shared by the simhash (d04) and KMV-sketch (t20) oracles. */
  private object XxhSql {
    val N = "18446744073709551616::HUGEINT"
    val HALF = "9223372036854775808::HUGEINT"
    val P1 = BigInt("11400714785074694791")
    val P2 = BigInt("14029467366897019727")
    val P3 = BigInt("1609587929392839161")
    val P4 = BigInt("9650029242287828579")
    val P5 = BigInt("2870177450012600261")
    def tos(u: String) =
      s"CAST(($u) - (CASE WHEN ($u) >= $HALF THEN $N ELSE 0::HUGEINT END) AS BIGINT)"
    def tou(s0: String) =
      s"(CASE WHEN ($s0) < 0 THEN CAST(($s0) AS HUGEINT) + $N ELSE CAST(($s0) AS HUGEINT) END)"
    def xor64(a: String, b: String) = tou(s"xor(${tos(a)}, ${tos(b)})")
    def shr(u: String, k: Int) = s"(($u) // ${BigInt(1) << k}::HUGEINT)"
    def rotl(x: String, r: Int) =
      s"(((($x) * ${BigInt(1) << r}::HUGEINT) % $N + (($x) // ${BigInt(1) << (64 - r)}::HUGEINT)))"
    def mulmod(x: String, c: BigInt) = {
      val (bh, bl) = (c >> 32, c & 0xFFFFFFFFL)
      s"((((($x) * $bh::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT" +
        s" + ($x) * $bl::HUGEINT) % $N)"
    }
    def hexByte(i: String) =
      s"((strpos('0123456789ABCDEF', hx[2*($i)-1:2*($i)-1])-1)*16" +
        s" + (strpos('0123456789ABCDEF', hx[2*($i):2*($i)])-1))"
    def rd(i: String, w: Int) = "(" + (0 until w).map(j =>
      s"CAST(${hexByte(s"($i)+$j")} AS HUGEINT) * ${BigInt(1) << (8 * j)}::HUGEINT")
      .mkString(" + ") + ")"

    /** CTE chain t0…th mapping an upstream `toks($key, tok)` relation to
      * `th($key, hu)` — hu = unsigned XXH64(tok, seed=42) as HUGEINT.
      *
      * Every step is STAGED through lateral column aliases (DuckDB
      * resolves same-SELECT alias references), so each large
      * sub-expression — the 8-byte word extraction, each mulmod/rotl/xor
      * — is emitted ONCE and referenced by a short name. The first cut
      * macro-expanded the whole tree (~600 KB of SQL per chain, the
      * single largest driver-artifact cost: oracle_sql.json hit 10.3 MB
      * and round 10's correctness artifact came back empty — VERDICT r10
      * directive 1b); staged, a chain is ~15 KB with IDENTICAL
      * arithmetic. Guards: dead lanes (c8 < i / no 4-byte word / no tail
      * byte) pin the extracted word to 0 inside the CASE, keeping every
      * staged intermediate inside [0, 2^64) — out-of-range hex reads
      * yield negative bytes whose products overflow the BIGINT cast in
      * tos() — and the final CASE forwards the untouched input hash.
      *
      * `maxBytes` bounds the supported token byte length; dead stages
      * are not emitted. The corpus max token is 8 bytes (asserted by the
      * hash-match itself: a longer token would hash through a missing
      * stage and mismatch LOUDLY). */
    def chain(key: String, maxBytes: Int = 15,
        materialized: Boolean = false): String = {
      val n8 = maxBytes / 8 // step8 stages that can ever run
      // MATERIALIZED pins every stage CTE: referenced-once CTEs otherwise
      // inline, and each stage references its input hash many times, so a
      // 2-stage chain's inlined expression tree grows past DuckDB's
      // allocator (observed: t33's first cut OOM'd at maxBytes=17)
      val m = if (materialized) "MATERIALIZED " else ""
      val sb = new StringBuilder
      sb.append(s"""
        t0 AS $m(
          SELECT $key, hex(encode(tok)) AS hx, octet_length(encode(tok)) AS n
          FROM toks),
        t1 AS $m(SELECT $key, hx, n,
          ((42 + $P5::HUGEINT + n) % $N) AS h0, n // 8 AS c8 FROM t0),""")
      var h = "h0"
      var t = "t1"
      // intermediate aliases carry the stage index: DuckDB resolves REAL
      // columns before lateral aliases, so a stage reusing its
      // predecessor's alias names would silently read the predecessor's
      // projected values
      (1 to n8).foreach { i =>
        sb.append(s"""
        t1$i AS $m(SELECT $key, hx, n, c8,
          CASE WHEN c8 >= $i THEN ${rd(s"${8 * (i - 1) + 1}", 8)}
               ELSE 0::HUGEINT END AS w$i,
          ${mulmod(s"w$i", P2)} AS ka$i,
          (${rotl(s"ka$i", 31)} % $N) AS kb$i,
          ${mulmod(s"kb$i", P1)} AS kc$i,
          ${xor64(h, s"kc$i")} AS xr$i,
          (${rotl(s"xr$i", 27)} % $N) AS xs$i,
          CASE WHEN c8 >= $i THEN ((${mulmod(s"xs$i", P1)} + $P4::HUGEINT) % $N)
               ELSE $h END AS h1$i FROM $t),""")
        h = s"h1$i"; t = s"t1$i"
      }
      sb.append(s"""
        t5 AS $m(SELECT $key, hx, n, 8*c8 AS o4, (n - 8*c8) >= 4 AS has4,
          CASE WHEN (n - 8*c8) >= 4 THEN ${rd("8*c8+1", 4)}
               ELSE 0::HUGEINT END AS b4,
          ${mulmod("b4", P1)} AS qa,
          ${xor64(h, "qa")} AS qb,
          (${rotl("qb", 23)} % $N) AS qc,
          CASE WHEN (n - 8*c8) >= 4
               THEN ((${mulmod("qc", P2)} + $P3::HUGEINT) % $N)
               ELSE $h END AS h4 FROM $t),
        t6 AS $m(SELECT $key, hx, n, o4 + (CASE WHEN has4 THEN 4 ELSE 0 END) AS ob, h4 FROM t5),""")
      var hb = "h4"
      var tb = "t6"
      (1 to 3).foreach { j =>
        val guard = s"n > ob+${j - 1}"
        sb.append(s"""
        t${6 + j} AS $m(SELECT $key, hx, n, ob,
          CASE WHEN $guard THEN CAST(${hexByte(s"ob+$j")} AS HUGEINT)
               ELSE 0::HUGEINT END AS bb$j,
          ${mulmod(s"bb$j", P5)} AS ra$j,
          ${xor64(hb, s"ra$j")} AS rb$j,
          (${rotl(s"rb$j", 11)} % $N) AS rc$j,
          CASE WHEN $guard THEN ${mulmod(s"rc$j", P1)}
               ELSE $hb END AS h${4 + j} FROM $tb),""")
        hb = s"h${4 + j}"; tb = s"t${6 + j}"
      }
      sb.append(s"""
        a1 AS $m(SELECT $key, ${xor64("h7", shr("h7", 33))} AS v1 FROM t9),
        a2 AS $m(SELECT $key, ${mulmod("v1", P2)} AS v2 FROM a1),
        a3 AS $m(SELECT $key, ${xor64("v2", shr("v2", 29))} AS v3 FROM a2),
        a4 AS $m(SELECT $key, ${mulmod("v3", P3)} AS v4 FROM a3),
        th AS $m(SELECT $key, ${xor64("v4", shr("v4", 32))} AS hu FROM a4)""")
      sb.toString
    }
  }

  /** DuckDB twin of [[Dedup.simhashColumn]]: the [[XxhSql]] XXH64 chain per
    * (doc, token), then the 64-lane SimHash tally. */
  private def simhashOracle: String = {
    import XxhSql.{N, tos}
    val bits = (0 until 64).map(b =>
      s"CASE WHEN SUM(CASE WHEN (hu // ${BigInt(1) << b}::HUGEINT) % 2 = 1" +
        s" THEN 1 ELSE -1 END) > 0 THEN ${BigInt(1) << b}::HUGEINT" +
        s" ELSE 0::HUGEINT END AS bit$b").mkString(",\n            ")
    val bitSum = (0 until 64).map(b => s"bit$b").mkString(" + ")
    s"""
        toks AS (
          SELECT doc_id, UNNEST(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' '), ' '),
            x -> len(x) > 0)) AS tok
          FROM documents),
        ${XxhSql.chain("doc_id", maxBytes = 15)},
        tallies AS (
          SELECT doc_id,
            $bits
          FROM th GROUP BY doc_id),
        sim AS MATERIALIZED (
          -- materialized: the pair join references sim twice, and inlining
          -- this expression tree twice explodes the planner
          SELECT doc_id, ${tos(s"($bitSum)")} AS simhash FROM tallies)"""
  }

  /** Trained hashed-gram NB classifier, memoized per (dir, dim, maxN) —
    * the s03/s06 trained-state pattern: the t33 query and its generated
    * oracle run in the same JVM, so both see IDENTICAL weight doubles
    * (the fit is deterministic anyway — exact long counts through
    * math.log — but sharing makes that a non-requirement). Seed labels =
    * t29's gopher_pass at the fixture's minStopHits=1. */
  private val clfCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int), (Array[Double], Double)]
  private def clfModel(s: SparkSession, dir: String,
      dim: Int, maxN: Int): (Array[Double], Double) =
    clfCache.getOrElseUpdate((dir, dim, maxN),
      TextAnalysis.qualityClassifierFit(t(s, dir, "documents"), "text",
        TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
        dim, maxN))

  /** DuckDB twin of [[TextAnalysis.qualityClassifierScore]] (t33): trained
    * weights + bias inline as exact-double literals; each gram occurrence
    * (unigram stream + chr(1)-joined bigram stream) re-hashes through the
    * [[XxhSql]] chain; bucket = unsigned hu mod dim (dim is a power of
    * two, so this equals the engine's sign-safe mask); the per-doc score
    * is the SAME bias-seeded bucket-ascending double fold the kernel
    * runs, so the DOUBLE scores hash-verify (the t28 sorted-fold
    * discipline). Gram-less docs fall back to the bare bias via the LEFT
    * JOIN — the kernel's empty-text contract. */
  private def qualityClassifierOracle(s: SparkSession, dir: String,
      dim: Int, maxN: Int): String = {
    require(maxN == 2, "oracle emits exactly the unigram+bigram streams")
    val (w, bias) = clfModel(s, dir, dim, maxN)
    val b = s"CAST('$bias' AS DOUBLE)"
    s"""
        WITH ${hashedGramScoreCtes(w.toIndexedSeq, b, dim)}
        SELECT d.doc_id, COALESCE(f.sc, $b) AS clf_score,
          COALESCE(f.sc, $b) > 0.0 AS clf_keep
        FROM documents d LEFT JOIN folded f ON f.doc_id = d.doc_id"""
  }

  /** The shared hashed-gram scoring CTE chain of the t33 classifier, t34
    * DSIR, and t35 lang-id oracles: gram streams → per-(doc, DISTINCT
    * gram) counts → one [[XxhSql]] chain per distinct gram → bucket =
    * unsigned hu mod dim → a `bias`-seeded bucket-ascending double fold
    * PER MODEL (the t28 sorted-fold discipline). `models` is
    * (suffix, weights, biasSql) — each emits `wt<suffix>` and
    * `folded<suffix>(doc_id, sc)`; the expensive chain and the
    * class-independent `bucketed` are shared. Gram-less docs are absent
    * from folded (callers LEFT JOIN and COALESCE to the bare bias). */
  private def hashedGramScoreCtesMulti(
      models: Seq[(String, IndexedSeq[Double], String)], dim: Int): String = {
    val shared = s"""dls AS (
          -- COALESCE: NULL text ≡ empty text on BOTH sides (the engine
          -- kernels coalesce before normalize — gram-less docs fall back
          -- to the bare bias/prior, never NULL)
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(coalesce(text, '')),
              '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0) AS toksl
          FROM documents),
        docgram AS MATERIALIZED (
          -- occurrence counts per (doc, gram): the corpus vocabulary is
          -- tiny next to the occurrence stream, so each DISTINCT gram
          -- runs the HUGEINT hash chain ONCE (57x fewer chain rows than
          -- per-occurrence hashing, which OOM'd/crawled the first cut)
          SELECT doc_id, tok, COUNT(*) AS cnt FROM (
            SELECT doc_id, toksl[CAST(i AS INT)] AS tok
            FROM dls, UNNEST(range(1, len(toksl)+1)) AS r(i)
            UNION ALL
            SELECT doc_id, toksl[CAST(i AS INT)] || chr(1) ||
                   toksl[CAST(i AS INT)+1] AS tok
            FROM dls, UNNEST(range(1, len(toksl))) AS r(i)
            WHERE len(toksl) >= 2)
          GROUP BY 1, 2),
        toks AS MATERIALIZED (SELECT DISTINCT tok FROM docgram),
        ${XxhSql.chain("tok", maxBytes = 17, materialized = true)},
        bucketed AS (
          SELECT g.doc_id, CAST(h.hu % $dim AS INT) AS bk,
                 SUM(g.cnt) AS cnt
          FROM docgram g JOIN th h USING (tok) GROUP BY 1, 2)"""
    val per = models.map { case (sfx, w, bias) =>
      val wl = dlistSql(w)
      s""",
        wt$sfx AS MATERIALIZED (
          SELECT CAST(range AS INT) AS bk,
                 ($wl)[CAST(range AS INT)+1] AS w
          FROM range(0, $dim)),
        folded$sfx AS (
          SELECT g.doc_id,
            list_reduce(list_prepend($bias,
              list_transform(list_sort(list(struct_pack(bk := g.bk,
                c := CAST(g.cnt AS DOUBLE) * wt$sfx.w))), x -> x.c)),
              (a, x) -> a + x) AS sc
          FROM bucketed g JOIN wt$sfx USING (bk)
          GROUP BY g.doc_id)"""
    }.mkString
    shared + per
  }

  /** Single-model form (t33/t34): `wt` + `folded`, no suffix. */
  private def hashedGramScoreCtes(w: IndexedSeq[Double], bias: String,
      dim: Int): String =
    hashedGramScoreCtesMulti(Seq(("", w, bias)), dim)

  /** Trained DSIR log importance ratios, memoized per (dir, dim, maxN) —
    * same shared-state discipline as [[clfModel]]. Target distribution =
    * the src0/src1 documents (the "trusted sources" seed). */
  private val dsirCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int), Array[Double]]
  private def dsirModel(s: SparkSession, dir: String,
      dim: Int, maxN: Int): Array[Double] =
    dsirCache.getOrElseUpdate((dir, dim, maxN),
      TextAnalysis.dsirFit(t(s, dir, "documents"), "text",
        col("source").isin("src0", "src1"), dim, maxN))

  /** DuckDB twin of [[TextAnalysis.dsirSelect]] (t34): the shared scoring
    * chain with bias 0, the Gumbel noise joined from the SAME
    * [[TextAnalysis.dsirGumbelTable]] literals the engine's plan carries
    * (no query-time ln on either side), and the top-k mark via ROW_NUMBER
    * (the oracle may use a window; the engine uses the threshold-broadcast
    * shape — same k winners by construction, ties broken by smaller
    * doc_id on both sides). */
  private def dsirOracle(s: SparkSession, dir: String,
      dim: Int, maxN: Int, k: Int): String = {
    require(maxN == 2, "oracle emits exactly the unigram+bigram streams")
    val w = dsirModel(s, dir, dim, maxN)
    val z = "CAST('0.0' AS DOUBLE)"
    val lvls = TextAnalysis.dsirGumbelLevels
    val gl = dlistSql(TextAnalysis.dsirGumbelTable)
    s"""
        WITH ${hashedGramScoreCtes(w.toIndexedSeq, z, dim)},
        scored AS (
          SELECT d.doc_id, COALESCE(f.sc, $z) AS dsir_logw
          FROM documents d LEFT JOIN folded f ON f.doc_id = d.doc_id),
        gq AS MATERIALIZED (
          SELECT CAST(range AS INT) AS lvl,
                 ($gl)[CAST(range AS INT)+1] AS g
          FROM range(0, $lvls)),
        keyed AS (
          SELECT doc_id, dsir_logw, dsir_logw + gq.g AS sel_key
          FROM scored JOIN gq ON gq.lvl = CAST(
            ((((doc_id % 1000000) + 1000000) % 1000000)
               * 2654435761) % 1000000 % $lvls AS INT))
        SELECT doc_id, dsir_logw, sel_key,
          (ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id)) <= $k
            AS selected
        FROM keyed"""
  }

  /** DuckDB twin of [[Dedup.decontaminateSpans]] (t36; shared with p06's
    * cleaning stage): positioned 8-grams joined against the benchmark
    * gram set (short benchmark docs contribute their whole text — the
    * wordNgramHashSet fallback), covered positions excised, string_agg
    * reconstruction; short corpus docs excise whole-text on a set hit. */
  private val decontaminateSpansOracle: String = """
        WITH toks AS (
          -- COALESCE: NULL text ≡ empty text (the engine coalesces before
          -- the excise kernel — a NULL doc cleans to '' with 0 removed)
          SELECT doc_id, list_filter(string_split(
              trim(regexp_replace(lower(coalesce(text, '')),
                '[ \t\n\x0b\f\r]+', ' ', 'g')),
              ' '), x -> len(x) > 0) AS t
          FROM documents),
        bgrams AS MATERIALIZED (
          SELECT DISTINCT gram FROM (
            SELECT array_to_string(t[u.i:u.i+7], ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
            WHERE doc_id % 7 = 0 AND len(t) >= 8
            UNION
            SELECT array_to_string(t, ' ')
            FROM toks WHERE doc_id % 7 = 0 AND len(t) < 8)),
        hit AS (
          SELECT g.doc_id, g.pos FROM (
            SELECT doc_id, u.i - 1 AS pos,
                   array_to_string(t[u.i:u.i+7], ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
            WHERE doc_id % 7 <> 0 AND len(t) >= 8) g
          JOIN bgrams b USING (gram)),
        covered AS (
          SELECT DISTINCT h.doc_id, c.p AS pos
          FROM hit h, unnest(range(h.pos, h.pos + 8)) AS c(p)),
        kept AS (
          SELECT tk.doc_id, tk.pos, tk.tok
          FROM (SELECT doc_id, u.i - 1 AS pos, t[u.i] AS tok
                FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
                WHERE doc_id % 7 <> 0) tk
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.doc_id = tk.doc_id AND c.pos = tk.pos)),
        clean AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS kept
          FROM kept GROUP BY doc_id)
        SELECT tt.doc_id,
               CASE WHEN len(tt.t) < 8 THEN
                 CASE WHEN array_to_string(tt.t, ' ') IN
                        (SELECT gram FROM bgrams)
                      THEN '' ELSE array_to_string(tt.t, ' ') END
               ELSE COALESCE(c.clean_text, '') END AS clean_text,
               CAST(CASE WHEN len(tt.t) < 8 THEN
                 CASE WHEN array_to_string(tt.t, ' ') IN
                        (SELECT gram FROM bgrams)
                      THEN len(tt.t) ELSE 0 END
               ELSE len(tt.t) - COALESCE(c.kept, 0) END AS BIGINT)
                 AS n_removed_tokens
        FROM toks tt
        LEFT JOIN clean c ON c.doc_id = tt.doc_id
        WHERE tt.doc_id % 7 <> 0"""

  /** DuckDB twin of the p05 quality funnel (shared with p06's keep
    * stage): the four stage twins composed by doc_id join — the ORACLE
    * may shuffle; the engine plan must not (PlanLint pins budget 0). */
  private def qualityFunnelOracle(s: SparkSession, dir: String): String = s"""
        WITH g AS (SELECT doc_id, gopher_pass
                   FROM (${gopherOracle(minStopHits = 1L)}) x),
        r AS (SELECT doc_id, rep_pass FROM ($gopherRepetitionOracle) y),
        c AS (SELECT doc_id, c4_keep FROM ($c4Oracle) z),
        k AS (SELECT doc_id, clf_score, clf_keep
              FROM (${qualityClassifierOracle(s, dir, dim = 1024, maxN = 2)}) w)
        SELECT g.doc_id, g.gopher_pass, r.rep_pass, c.c4_keep,
          k.clf_score, k.clf_keep,
          (g.gopher_pass AND r.rep_pass AND c.c4_keep AND k.clf_keep) AS keep
        FROM g JOIN r USING (doc_id) JOIN c USING (doc_id)
               JOIN k USING (doc_id)"""

  /** One (model, cls) metrics block of the t37 oracle over a joined CTE
    * `src(doc_id, s, y, p)` with non-null y/p: ROW_NUMBER ranks by
    * (s, doc_id) — the engine's unique-rank convention — exact BIGINT
    * confusion/rank sums (COALESCE'd so an empty split yields the
    * engine's all-zero row), then the metric expressions MIRROR
    * Eval.BinaryEvalStats operation-for-operation (one integer
    * numerator + one IEEE division each; f1 guarded by prec+rec > 0). */
  private def evalMetricsSql(src: String, model: String,
      cls: String): String = s"""
    SELECT '$model' AS model, '${cls.replace("'", "''")}' AS cls,
           n, n_pos, n_neg, rank_sum_pos, tp, fp, fn, tn,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE CAST(rank_sum_pos - (n_pos*(n_pos+1))//2 AS DOUBLE) /
                     (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END
             AS auc,
           prec, rec,
           CASE WHEN prec IS NOT NULL AND rec IS NOT NULL
                     AND prec + rec > 0.0
                THEN 2.0 * prec * rec / (prec + rec) END AS f1
    FROM (
      SELECT n, n_pos, n - n_pos AS n_neg, rank_sum_pos, tp, fp, fn, tn,
             CASE WHEN tp + fp = 0 THEN NULL
                  ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
               AS prec,
             CASE WHEN tp + fn = 0 THEN NULL
                  ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
               AS rec
      FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COALESCE(SUM(CASE WHEN y THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_pos,
               CAST(COALESCE(SUM(CASE WHEN y THEN rk ELSE 0 END), 0)
                 AS BIGINT) AS rank_sum_pos,
               CAST(COALESCE(SUM(CASE WHEN y AND p THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS tp,
               CAST(COALESCE(SUM(CASE WHEN NOT y AND p THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS fp,
               CAST(COALESCE(SUM(CASE WHEN y AND NOT p THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS fn,
               CAST(COALESCE(SUM(CASE WHEN NOT y AND NOT p THEN 1 ELSE 0 END),
                 0) AS BIGINT) AS tn
        FROM (SELECT y, p,
                     -- COALESCE to -inf: a NULL score ranks LOWEST on
                     -- both twins (Spark NULLS FIRST vs DuckDB NULLS
                     -- LAST would otherwise diverge)
                     ROW_NUMBER() OVER (ORDER BY
                       COALESCE(s, CAST('-infinity' AS DOUBLE)), doc_id)
                       AS rk
              FROM $src) rr) a) m"""

  /** DuckDB twin of t37: the u01 test-bucket filter, the t33 scoring
    * chain + t29 gopher seed labels for the classifier row, the full t35
    * chain for the per-language one-vs-rest rows — each graded by
    * [[evalMetricsSql]] and UNION ALL'd. */
  private def modelEvalOracle(s: SparkSession, dir: String): String = {
    val models = lidModels(s, dir, dim = 1024, maxN = 2)
    val sfx = graft.operators.TextAnalysis.labelSuffixes(models.map(_._1))
    def lity(l: String) = "'" + l.replace("'", "''") + "'"
    val lidJoins = models.zip(sfx).map { case ((lbl, _, _), sx) => s"""
        lid_j_$sx AS (
          SELECT l.doc_id, l.score_$sx AS s,
                 COALESCE(l.lang = ${lity(lbl)}, FALSE) AS y,
                 COALESCE(l.pred_lang = ${lity(lbl)}, FALSE) AS p
          FROM lid l JOIN tst USING (doc_id))""" }.mkString(",")
    val lidBlocks = models.zip(sfx).map { case ((lbl, _, _), sx) =>
      evalMetricsSql(s"lid_j_$sx", "langid", lbl) }
      .mkString("\n    UNION ALL\n")
    s"""
        WITH tst AS (
          SELECT doc_id FROM (
            SELECT doc_id, $permilleBucketSql AS bk FROM documents) bb
          WHERE bk >= 950),
        gop AS (SELECT doc_id, gopher_pass
                FROM (${gopherOracle(minStopHits = 1L)}) gg),
        clf AS (SELECT doc_id, clf_score
                FROM (${qualityClassifierOracle(s, dir, dim = 1024,
                  maxN = 2)}) cc),
        lid AS (SELECT * FROM (${langIdOracleGen(s, dir, dim = 1024,
                  maxN = 2)}) ll),
        clf_j AS (
          SELECT c.doc_id, c.clf_score AS s, g.gopher_pass AS y,
                 c.clf_score > 0.0 AS p
          FROM clf c JOIN gop g USING (doc_id) JOIN tst USING (doc_id)),
        $lidJoins
        ${evalMetricsSql("clf_j", "classifier", "keep")}
    UNION ALL
    $lidBlocks"""
  }

  /** p07's MinHash config — d08's fixture shape (64 hashes, 16 bands,
    * exact-Jaccard threshold 0.35, 5-char shingles). */
  private val p07Cfg = Dedup.MinHashConfig(
    numHashes = 64, bands = 16, threshold = 0.35)

  /** The p05 keep decision + token count in ONE zero-exchange scan
    * (shared by p07's prior high-water computation and its delta
    * ingest) — gate formulas identical to p05/p06 so the
    * [[qualityFunnelOracle]] twin covers the keep set. */
  private def p07FunnelKeep(df: org.apache.spark.sql.DataFrame,
      w: Array[Double], bias: Double): org.apache.spark.sql.DataFrame = {
    val page = regexp_replace(col("text"),
      "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
    val norm = Dedup.normalize(coalesce(col("text"), lit("")))
    val staged = df.select(col("doc_id"),
      TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
      TextAnalysis.c4Signals(page).last,
      graft.functions.TextHashExprs.gopherRepetition(col("text")).as("__r"),
      graft.functions.TextHashExprs.hashedGramScore(norm, w, bias, maxN = 2)
        .as("__s"),
      size(filter(split(norm, " "), t0 => length(t0) > 0))
        .cast("long").as("n_tok"))
    val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
      .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
      .reduce(_ && _)
    staged.filter(col("gopher_pass") && repPass && col("c4_keep") &&
        col("__s") > lit(0.0))
      .select(col("doc_id"), col("n_tok"))
  }

  /** Built-once-per-dir incremental state for p07 (the PRIOR round's
    * export, paid once — the p07 QUERY is the delta ingest): the prior
    * corpus (doc_id % 10 <> 9) persists as dedup_state, and pack_state
    * records the high-water token mass of its funnel-kept export. */
  private val p07StateCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def p07State(s: SparkSession, dir: String): String =
    p07StateCache.getOrElseUpdate(dir, {
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft_p07_state").toFile.getAbsolutePath
      val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
      val prior = t(s, dir, "documents").filter(col("doc_id") % 10 =!= 9)
      graft.operators.Incremental.writeDedupState(
        prior, "doc_id", "text", p07Cfg, stateDir)
      val hw = p07FunnelKeep(prior, w, bias)
        .agg(coalesce(sum(col("n_tok")), lit(0L)))
        .head().getLong(0) // 1-row high-water aggregate at state build
      graft.operators.Incremental.writePackState(s, stateDir, hw)
      stateDir
    })

  /** DuckDB twin of p07: the d08 exact cross-Jaccard victim set at the
    * %10 split, the p05 funnel keep, the prior export's token high-water,
    * and the u04 packing recurrence seeded at that high-water. The oracle
    * neither knows nor cares that the ENGINE read persisted state — the
    * equivalence `full-from-scratch ≡ prior-state + delta` is exactly
    * what IncrementalSpec pins. */
  private def p07Oracle(s: SparkSession, dir: String): String = s"""
        WITH shx AS (
          SELECT doc_id, nrm,
            list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
              i -> nrm[i:i+4])) AS sh
          FROM (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS nrm
                FROM documents)),
        victims AS (
          SELECT b.doc_id
          FROM shx b JOIN shx c ON b.doc_id % 10 = 9 AND c.doc_id % 10 <> 9
          WHERE b.nrm = c.nrm
             OR CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
                (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh)))
                >= 0.35),
        keepf AS (SELECT doc_id, keep
                  FROM (${qualityFunnelOracle(s, dir)}) f),
        toks AS (
          SELECT doc_id, CAST(len(list_filter(string_split(
            trim(regexp_replace(lower(coalesce(text, '')),
              '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')),
            ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        hw AS (
          SELECT CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS hw
          FROM toks t JOIN keepf k USING (doc_id)
          WHERE k.keep AND t.doc_id % 10 <> 9),
        surv AS (
          SELECT t.doc_id, t.n_tok
          FROM toks t JOIN keepf k USING (doc_id)
          WHERE t.doc_id % 10 = 9 AND k.keep
            AND t.doc_id NOT IN (SELECT doc_id FROM victims)),
        c2 AS (
          SELECT doc_id, n_tok,
            (SELECT hw FROM hw) +
            CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
          FROM surv)
        SELECT doc_id, n_tok, tok_offset, tok_offset // 64 AS bin
        FROM c2"""

  /** Built-once-per-dir ModelStore registry for p09 (VERDICT r10
    * directive 2): the t33 classifier, the t35 lang-id set, and the t38
    * unigram LM persist as v1 artifacts under one temp root; the p09
    * QUERY loads them back and scores from the LOADED copies. Parquet
    * round-trips doubles/longs bit-exactly (ModelStoreSpec pins it), so
    * the loaded-model scores hash against the SAME oracle twins the
    * fit-model queries use — any break in save/version/load surfaces as
    * a driver hash mismatch. */
  private val p09RegistryCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def p09Registry(s: SparkSession, dir: String): String =
    p09RegistryCache.getOrElseUpdate(dir, {
      val M = graft.core.ModelStore
      val root = java.nio.file.Files
        .createTempDirectory("graft_p09_registry").toFile.getAbsolutePath
      val fp = M.corpusFingerprint(t(s, dir, "documents"), "doc_id", "text")
      val (w, b) = clfModel(s, dir, dim = 1024, maxN = 2)
      M.save(s, M.nextVersionPath(s, root, "quality_clf"),
        M.ClassifierModel(w, b, 1024, 2, fp))
      M.save(s, M.nextVersionPath(s, root, "langid"),
        M.LangIdModel(lidModels(s, dir, dim = 1024, maxN = 2), 1024, 2, fp))
      M.save(s, M.nextVersionPath(s, root, "unigram_lm"),
        M.UlmModel(ulmTrainedPieces(s, dir), fp))
      root
    })

  /** Trained PER-LANGUAGE quality classifiers (p08's CCNet routing shape),
    * memoized per (dir, dim, maxN): one NB model per language, fitted on
    * that language's documents with the t29 gopher_pass seed labels —
    * ONE gram-level aggregate for all of them. */
  private val perLangClfCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int), Seq[(String, Array[Double], Double)]]
  private def perLangClfModels(s: SparkSession, dir: String,
      dim: Int, maxN: Int): Seq[(String, Array[Double], Double)] =
    perLangClfCache.getOrElseUpdate((dir, dim, maxN),
      TextAnalysis.perClassClassifierFit(t(s, dir, "documents"), "text",
        "lang", TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
        dim, maxN))

  /** DuckDB twin of the p08 per-language funnel: the SHARED gram chain
    * hosts the C lang-id models (suffix _l*) AND the C per-language
    * classifiers (suffix _c*); pred_lang resolves by the t35 CASE chain,
    * the routed clf_score by a CASE over pred_lang, and the rule gates
    * join from their stage twins (the oracle may shuffle; the engine's
    * plan must not — PlanLint pins budget 0). */
  private def perLangFunnelOracle(s: SparkSession, dir: String): String = {
    val lid = lidModels(s, dir, dim = 1024, maxN = 2)
    val perLang = perLangClfModels(s, dir, dim = 1024, maxN = 2)
    val sfx = graft.operators.TextAnalysis.labelSuffixes(lid.map(_._1))
    def lity(l: String) = "'" + l.replace("'", "''") + "'"
    val ctes = hashedGramScoreCtesMulti(
      lid.zip(sfx).map { case ((_, w, b), sx) =>
        (s"_l$sx", w.toIndexedSeq, s"CAST('$b' AS DOUBLE)") } ++
      perLang.zip(sfx).map { case ((_, w, b), sx) =>
        (s"_c$sx", w.toIndexedSeq, s"CAST('$b' AS DOUBLE)") }, 1024)
    val scoreCols = (lid.zip(sfx).map { case ((_, _, b), sx) =>
      s"COALESCE(folded_l$sx.sc, CAST('$b' AS DOUBLE)) AS s_l$sx" } ++
      perLang.zip(sfx).map { case ((_, _, b), sx) =>
        s"COALESCE(folded_c$sx.sc, CAST('$b' AS DOUBLE)) AS s_c$sx" })
      .mkString(",\n          ")
    val joins = sfx.flatMap(sx => Seq(
        s"LEFT JOIN folded_l$sx ON folded_l$sx.doc_id = d.doc_id",
        s"LEFT JOIN folded_c$sx ON folded_c$sx.doc_id = d.doc_id"))
      .mkString("\n          ")
    val best = s"greatest(${sfx.map(sx => s"s_l$sx").mkString(", ")})"
    val pred = "CASE " + lid.zip(sfx).map { case (m, sx) =>
      s"WHEN s_l$sx = $best THEN ${lity(m._1)}" }.mkString(" ") + " END"
    val routed = "CASE pred_lang " + lid.zip(sfx).map { case (m, sx) =>
      s"WHEN ${lity(m._1)} THEN s_c$sx" }.mkString(" ") + " END"
    s"""
        WITH $ctes,
        scored AS (
          SELECT d.doc_id,
          $scoreCols
          FROM documents d
          $joins),
        predicted AS (
          SELECT doc_id, ${sfx.map(sx => s"s_c$sx").mkString(", ")},
                 $pred AS pred_lang
          FROM scored),
        routed AS (
          SELECT doc_id, pred_lang, $routed AS clf_score FROM predicted),
        g AS (SELECT doc_id, gopher_pass
              FROM (${gopherOracle(minStopHits = 1L)}) x),
        r AS (SELECT doc_id, rep_pass FROM ($gopherRepetitionOracle) y),
        c AS (SELECT doc_id, c4_keep FROM ($c4Oracle) z)
        SELECT t.doc_id, t.pred_lang, g.gopher_pass, r.rep_pass, c.c4_keep,
          t.clf_score, t.clf_score > 0.0 AS clf_keep,
          (g.gopher_pass AND r.rep_pass AND c.c4_keep AND
            t.clf_score > 0.0) AS keep
        FROM routed t JOIN g USING (doc_id) JOIN r USING (doc_id)
             JOIN c USING (doc_id)"""
  }

  /** Trained multiclass lang-id models, memoized per (dir, dim, maxN) —
    * same shared-state discipline as [[clfModel]]. Labels = the corpus
    * `lang` column (the supervised fastText-lid setup). */
  private val lidCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int), Seq[(String, Array[Double], Double)]]
  private def lidModels(s: SparkSession, dir: String,
      dim: Int, maxN: Int): Seq[(String, Array[Double], Double)] =
    lidCache.getOrElseUpdate((dir, dim, maxN),
      TextAnalysis.langIdFit(t(s, dir, "documents"), "text", "lang",
        dim, maxN))

  /** DuckDB twin of [[TextAnalysis.langIdScore]] (t35): one folded CTE
    * per language over the SHARED gram/hash/bucket chain, priors+weights
    * inlined as exact doubles, and the argmax as the same
    * first-maximum-in-label-order CASE chain the engine's coalesced
    * WHENs resolve — ties (possible on gram-less docs, where every score
    * is its bare prior) break identically. */
  private def langIdOracleGen(s: SparkSession, dir: String,
      dim: Int, maxN: Int): String = {
    require(maxN == 2, "oracle emits exactly the unigram+bigram streams")
    val models = lidModels(s, dir, dim, maxN)
    // identifier-safe per-class suffixes (the ENGINE's labelSuffixes —
    // one function names both sides): a label is data, spliced into the
    // SQL only as an escaped string VALUE, never as an identifier
    val sfx = graft.operators.TextAnalysis.labelSuffixes(models.map(_._1))
    def lity(l: String) = "'" + l.replace("'", "''") + "'"
    val ctes = hashedGramScoreCtesMulti(
      models.zip(sfx).map { case ((_, w, b), sx) =>
        (s"_$sx", w.toIndexedSeq, s"CAST('$b' AS DOUBLE)") }, dim)
    val scoreCols = models.zip(sfx).map { case ((_, _, b), sx) =>
      s"COALESCE(folded_$sx.sc, CAST('$b' AS DOUBLE)) AS score_$sx" }
      .mkString(",\n          ")
    val joins = sfx.map(sx =>
      s"LEFT JOIN folded_$sx ON folded_$sx.doc_id = d.doc_id")
      .mkString("\n          ")
    val best = s"greatest(${sfx.map(sx => s"score_$sx").mkString(", ")})"
    val pred = "CASE " + models.zip(sfx).map { case (m, sx) =>
      s"WHEN score_$sx = $best THEN ${lity(m._1)}" }.mkString(" ") + " END"
    s"""
        WITH $ctes,
        scored AS (
          SELECT d.doc_id, d.lang,
          $scoreCols
          FROM documents d
          $joins)
        SELECT doc_id, lang, ${sfx.map(sx => s"score_$sx").mkString(", ")},
          $pred AS pred_lang,
          ($pred = lang) AS lang_match
        FROM scored"""
  }

  /** Trained IVF centroids, memoized per (dir, k, seed): the s03 query and
    * its generated oracle run in the same JVM (Verify runs queries, then
    * dumps oracle_sql.json), so both sides see the IDENTICAL doubles — the
    * k-means result never has to be deterministic across JVMs, only shared
    * within one. */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Long), Seq[Seq[Double]]]
  private def ivfCentroids(s: SparkSession, dir: String,
      nCentroids: Int, seed: Long): Seq[Seq[Double]] =
    ivfCache.getOrElseUpdate((dir, nCentroids, seed),
      Similarity.ivfTrain(t(s, dir, "embeddings"), "embedding", nCentroids, seed))

  /** DuckDB twin of [[Similarity.ivfProbe]] (s03): trained centroids inline
    * as double literals (Double.toString round-trips); cell assignment is
    * the same (dist, cell) struct-min over the same left-to-right double
    * fold; probe cells via list_sort + slice; exact fold-cosine re-rank. */
  private def annIvfOracle(s: SparkSession, dir: String,
      nCentroids: Int, nProbe: Int, seed: Long, k: Int): String = {
    val cents = ivfCentroids(s, dir, nCentroids, seed)
    // 0.0-seeded left fold of (x-c)^2, identical to Spark's aggregate(...)
    def sqDist(v: String, c: Seq[Double]): String = {
      val lits = dlistSql(c)
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($v, $lits), " +
        s"z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2]))), " +
        "(a,b) -> a+b)"
    }
    def cellStructs(v: String): String = cents.zipWithIndex.map { case (c, i) =>
      s"{'d': ${sqDist(v, c)}, 'cell': $i}"
    }.mkString("[", ",\n            ", "]")
    s"""
        WITH c AS MATERIALIZED (
          SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
            list_aggregate(${cellStructs("embedding")}, 'min').cell AS cell
          FROM embeddings),
        q AS MATERIALIZED (
          SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
            UNNEST(list_transform(
              list_sort(${cellStructs("embedding")})[1:$nProbe],
              s -> s.cell)) AS cell
          FROM embeddings WHERE vec_id < 8),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            ${foldDotSql("c.embedding", "q.embedding")} / (c.nrm * q.nrm) AS cos_sim
          FROM c JOIN q ON c.cell = q.cell AND c.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
        QUALIFY rank <= $k"""
  }

  /** Trained PQ codebooks, memoized per (dir, m, kc, seed) — the s03
    * trained-state pattern: query and generated oracle share the JVM. */
  private val pqCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Long), Seq[Seq[Seq[Double]]]]
  private def pqCodebooks(s: SparkSession, dir: String,
      m: Int, kc: Int, seed: Long): Seq[Seq[Seq[Double]]] =
    pqCache.getOrElseUpdate((dir, m, kc, seed),
      Similarity.pqTrain(t(s, dir, "embeddings"), "embedding", dim = 64,
        m = m, kc = kc, seed = seed))

  /** DuckDB twin of [[Similarity.pqTopK]] (s07): codebooks + ‖centroid‖²
    * tables inline as exact-double literals; per-subspace code = the same
    * (d, cell) struct-min over the vector SLICE; the query's dot tables,
    * the m lookups, and the fixed-j-order sum mirror the Spark plan's
    * fold orders exactly. */
  private def annPqOracle(s: SparkSession, dir: String,
      m: Int, kc: Int, seed: Long, k: Int): String = {
    val cbs = pqCodebooks(s, dir, m, kc, seed)
    val norm2 = Similarity.pqNorm2(cbs)
    val sub = 64 / m
    def sliceOf(v: String, j: Int) = s"$v[${j * sub + 1}:${(j + 1) * sub}]"
    // 0.0-seeded left folds, matching aggregate(..., 0.0, +) in the plan
    def dot0(v: String, c: Seq[Double]): String =
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($v, ${dlistSql(c)}), " +
        s"z -> CAST(z[1] AS DOUBLE) * z[2])), (a,b) -> a+b)"
    def sqd(v: String, c: Seq[Double]): String =
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($v, ${dlistSql(c)}), " +
        s"z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2]))), " +
        "(a,b) -> a+b)"
    def codeOf(j: Int): String = "list_aggregate(" + cbs(j).zipWithIndex.map {
      case (c, i) => s"{'d': ${sqd(sliceOf("embedding", j), c)}, 'cell': $i}"
    }.mkString("[", ",\n            ", "]") + ", 'min').cell"
    val codeCols = (0 until m).map(j => s"${codeOf(j)} AS k$j").mkString(",\n            ")
    val recNorm2 = (0 until m).map(j =>
      s"${dlistSql(norm2(j))}[k$j + 1]").mkString("(", " + ", ")")
    val tableCols = (0 until m).map(j => "[" + cbs(j).map(c =>
      dot0(sliceOf("embedding", j), c)).mkString(",\n              ") +
      s"] AS t$j").mkString(",\n            ")
    val adc = (0 until m).map(j => s"t$j[k$j + 1]").mkString("(", " + ", ")")
    s"""
        WITH c0 AS MATERIALIZED (
          SELECT vec_id,
            $codeCols
          FROM embeddings),
        c AS MATERIALIZED (
          SELECT vec_id, sqrt($recNorm2) AS an, ${(0 until m).map(j => s"k$j").mkString(", ")}
          FROM c0),
        q AS MATERIALIZED (
          SELECT vec_id, ${normSql("embedding")} AS qn,
            $tableCols
          FROM embeddings WHERE vec_id < 8),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            $adc / (c.an * q.qn) AS pq_cos
          FROM c CROSS JOIN q
          WHERE c.vec_id <> q.vec_id AND c.an > 0 AND q.qn > 0)
        SELECT query_id, neighbor_id, pq_cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY pq_cos DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
        QUALIFY rank <= $k"""
  }

  /** DuckDB twin of [[Similarity.ivfPqTopK]] (s08): the s03 coarse-cell
    * CTEs composed with the s07 code/table machinery — coarse centroids,
    * codebooks and norm tables all inline as exact-double literals; the
    * candidate set is the same cell equi-join, scores the same m lookups
    * + fixed-order sum. */
  private def annIvfPqOracle(s: SparkSession, dir: String,
      nCoarse: Int, coarseSeed: Long, m: Int, kc: Int, pqSeed: Long,
      nProbe: Int, k: Int): String =
    ivfPqOracleImpl(s, dir, nCoarse, coarseSeed, m, kc, pqSeed, nProbe, k,
      semDedupThreshold = None)

  /** p02: the s08 twin with the corpus restricted to d19-rule SemDeDup
    * survivors (within-COARSE-cell keep-earliest at `threshold`). */
  private def embeddingPrepOracle(s: SparkSession, dir: String,
      nCoarse: Int, coarseSeed: Long, m: Int, kc: Int, pqSeed: Long,
      threshold: Double, nProbe: Int, k: Int): String =
    ivfPqOracleImpl(s, dir, nCoarse, coarseSeed, m, kc, pqSeed, nProbe, k,
      semDedupThreshold = Some(threshold))

  private def ivfPqOracleImpl(s: SparkSession, dir: String,
      nCoarse: Int, coarseSeed: Long, m: Int, kc: Int, pqSeed: Long,
      nProbe: Int, k: Int, semDedupThreshold: Option[Double]): String = {
    val coarse = ivfCentroids(s, dir, nCoarse, coarseSeed)
    val cbs = pqCodebooks(s, dir, m, kc, pqSeed)
    val norm2 = Similarity.pqNorm2(cbs)
    val sub = 64 / m
    def sliceOf(v: String, j: Int) = s"$v[${j * sub + 1}:${(j + 1) * sub}]"
    def dot0(v: String, c: Seq[Double]): String =
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($v, ${dlistSql(c)}), " +
        s"z -> CAST(z[1] AS DOUBLE) * z[2])), (a,b) -> a+b)"
    def sqd(v: String, c: Seq[Double]): String =
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($v, ${dlistSql(c)}), " +
        s"z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2]))), " +
        "(a,b) -> a+b)"
    def structsOver(v: String, cents: Seq[Seq[Double]]): String =
      cents.zipWithIndex.map { case (c, i) =>
        s"{'d': ${sqd(v, c)}, 'cell': $i}"
      }.mkString("[", ",\n            ", "]")
    def codeOf(j: Int): String =
      s"list_aggregate(${structsOver(sliceOf("embedding", j), cbs(j))}, 'min').cell"
    val codeCols = (0 until m).map(j => s"${codeOf(j)} AS k$j")
      .mkString(",\n            ")
    val recNorm2 = (0 until m).map(j =>
      s"${dlistSql(norm2(j))}[k$j + 1]").mkString("(", " + ", ")")
    val tableCols = (0 until m).map(j => "[" + cbs(j).map(c =>
      dot0(sliceOf("embedding", j), c)).mkString(",\n              ") +
      s"] AS t$j").mkString(",\n            ")
    val adc = (0 until m).map(j => s"t$j[k$j + 1]").mkString("(", " + ", ")")
    s"""
        WITH c0 AS MATERIALIZED (
          SELECT vec_id,
            list_aggregate(${structsOver("embedding", coarse)}, 'min').cell AS cell,
            $codeCols
          FROM embeddings),${semDedupThreshold.map(thr => s"""
        asn AS MATERIALIZED (
          SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
            list_aggregate(${structsOver("embedding", coarse)}, 'min').cell AS cl
          FROM embeddings),
        vict AS (
          SELECT DISTINCT y.vec_id AS victim
          FROM asn AS x JOIN asn AS y ON x.cl = y.cl AND x.vec_id < y.vec_id
          WHERE ${foldDotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)
                  >= $thr),""").getOrElse("")}
        c AS MATERIALIZED (
          SELECT vec_id, cell, sqrt($recNorm2) AS an,
                 ${(0 until m).map(j => s"k$j").mkString(", ")}
          FROM c0${semDedupThreshold.map(_ =>
            " WHERE vec_id NOT IN (SELECT victim FROM vict)").getOrElse("")}),
        q AS MATERIALIZED (
          SELECT vec_id, ${normSql("embedding")} AS qn,
            UNNEST(list_transform(
              list_sort(${structsOver("embedding", coarse)})[1:$nProbe],
              s -> s.cell)) AS cell,
            $tableCols
          FROM embeddings WHERE vec_id < 8),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            $adc / (c.an * q.qn) AS ivfpq_cos
          FROM c JOIN q ON c.cell = q.cell AND c.vec_id <> q.vec_id
          WHERE c.an > 0 AND q.qn > 0)
        SELECT query_id, neighbor_id, ivfpq_cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ivfpq_cos DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
        QUALIFY rank <= $k"""
  }

  /** Shared by the k-means oracles: the same 0.0-seeded left fold of
    * (x-c)² and (d, cell) struct list the s03 twin builds — `list_aggregate
    * (…, 'min')` over it IS nearest-centroid assignment (lexicographic
    * struct compare, ties toward the smaller cell), mirroring Spark's
    * `array_min` over [[Similarity.kmeansAssign]]'s struct array. */
  private def kmCellStructsSql(v: String, cents: Seq[Seq[Double]]): String = {
    def sqDist(c: Seq[Double]): String = {
      val lits = dlistSql(c)
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($v, $lits), " +
        s"z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2]))), " +
        "(a,b) -> a+b)"
    }
    cents.zipWithIndex.map { case (c, i) =>
      s"{'d': ${sqDist(c)}, 'cell': $i}"
    }.mkString("[", ",\n            ", "]")
  }

  /** Shared KMV oracle tail: expects an upstream `toks0($keys, tok)` CTE;
    * distinct keyed tokens through the [[XxhSql]] chain, per-key k smallest
    * by UNSIGNED hu (HUGEINT order) → `sk($keys, n, kthu)`. `keys` may be a
    * comma-separated column list (it splices into every SELECT/PARTITION). */
  private def kmvSketchCtes(keys: String, k: Int): String = s"""
        toks AS (SELECT DISTINCT $keys, tok FROM toks0),
        ${XxhSql.chain(keys)},
        dh AS (SELECT DISTINCT $keys, hu FROM th),
        kmin AS (
          SELECT $keys, hu,
            ROW_NUMBER() OVER (PARTITION BY $keys ORDER BY hu ASC) AS rnk
          FROM dh),
        sk AS (
          SELECT $keys, COUNT(*) AS n, MAX(hu) AS kthu
          FROM kmin WHERE rnk <= $k GROUP BY ALL)"""

  /** KMV output columns from `sk` — kth back to signed BIGINT; the
    * estimate mirrors the engine's IEEE op order exactly ((kthu - 2^63) is
    * the sign-flipped sort value: long→double, + 2^63, + 1, / 2^64). */
  private def kmvSelectSql(k: Int): String = s"""
               CAST(n AS BIGINT) AS n_sketch,
               ${XxhSql.tos("kthu")} AS kth_hash,
               CASE WHEN n < $k THEN CAST(n AS DOUBLE)
                    ELSE CAST(${k - 1} AS DOUBLE) /
                         ((CAST(CAST(kthu - ${XxhSql.HALF} AS BIGINT) AS DOUBLE)
                            + 9.223372036854776e18 + 1.0)
                          / 1.8446744073709552e19) END AS est_distinct"""

  /** DuckDB twin of [[TextAnalysis.kmvDistinctTokens]] (t20). */
  private def kmvOracle(k: Int): String = s"""
        WITH toks0 AS (
          SELECT source, UNNEST(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0)) AS tok
          FROM documents),
        ${kmvSketchCtes("source", k)}
        SELECT source, ${kmvSelectSql(k)}
        FROM sk"""

  /** DuckDB twin of [[graft.streaming.TextPipeline.rollingDistinctTokens]]
    * (t21): the t18 deterministic doc_id-minutes time grid, keyed by
    * (hour window, source). */
  private def kmvWindowedOracle(k: Int): String = s"""
        WITH toks0 AS (
          SELECT ((1704067200000 + doc_id * 60000) // 3600000) * 3600000
                   AS win_start_ms,
                 source, UNNEST(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0)) AS tok
          FROM documents WHERE doc_id < 180),
        ${kmvSketchCtes("win_start_ms, source", k)}
        SELECT win_start_ms, source, ${kmvSelectSql(k)}
        FROM sk"""

  /** DuckDB twin of [[Similarity.kmeansAssign]] (s06): trained centroids
    * inline as exact double literals; assignment + distance both read off
    * the same struct-min. */
  private def kmeansAssignOracle(s: SparkSession, dir: String,
      nCentroids: Int, seed: Long): String = {
    val cs = kmCellStructsSql("embedding", ivfCentroids(s, dir, nCentroids, seed))
    s"""
        SELECT vec_id,
               list_aggregate($cs, 'min').cell AS cluster,
               list_aggregate($cs, 'min').d AS sq_dist
        FROM embeddings"""
  }

  /** DuckDB twin of [[Similarity.semDedupKMeans]] (d19): within-cluster
    * pairs only (the paper's quadratic bound), exact fold-cosine with the
    * a-side = smaller id (operand order matches the Spark plan), greedy
    * keep-earliest victims via NOT IN. */
  private def semDedupKMeansOracle(s: SparkSession, dir: String,
      nCentroids: Int, seed: Long, threshold: Double): String = {
    s"""
        WITH asn AS MATERIALIZED (
          SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm,
            list_aggregate(${kmCellStructsSql("embedding",
              ivfCentroids(s, dir, nCentroids, seed))}, 'min').cell AS cl
          FROM embeddings),
        victims AS (
          SELECT DISTINCT y.vec_id AS victim
          FROM asn AS x JOIN asn AS y ON x.cl = y.cl AND x.vec_id < y.vec_id
          WHERE ${foldDotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)
                  >= $threshold)
        SELECT vec_id, label, cl AS cluster FROM asn
        WHERE vec_id NOT IN (SELECT victim FROM victims)"""
  }

  /** DuckDB twin of [[Multimodal.syntheticMedia]] + [[Multimodal.decodeMeta]]
    * — the strongest possible oracle for a real codec: the encoder chooses
    * geometry as the Java fold `h = fold(1125899906842597, acc*31 +
    * signedByte)` over the SOURCE text bytes and fills pixels/samples by
    * cycling those bytes, so DuckDB — which never sees the PNG/WAV binary —
    * independently predicts what `javax.imageio` / `javax.sound` must
    * recover: width, height, n_frames, container format, and the checksum
    * over every DECODED pixel channel / PCM sample (closed form over the
    * cyclic fill: floor(m/n)·Σbytes + prefix(m mod n)). A header-only fake
    * decode cannot reproduce `content_sum`; a mismatch anywhere in
    * encode→container→decode breaks the hash. DuckDB reads bytes out of
    * hex(encode(text)), folds in HUGEINT mod 2^64, and mirrors Java's
    * truncating signed division. Produces the `decoded` CTE every m-query
    * builds on (no n_bytes — compressed container sizes are not
    * SQL-expressible; m01 inlines them via [[mediaBytesValues]]). */
  private def mediaDecodeOracle: String = {
    val N = "18446744073709551616::HUGEINT"
    val HALF = "9223372036854775808::HUGEINT"
    def hexByte(i: String) = // value of byte i (1-based) from the hex dump
      s"((strpos('0123456789ABCDEF', hx[2*$i-1:2*$i-1])-1)*16" +
        s" + (strpos('0123456789ABCDEF', hx[2*$i:2*$i])-1))"
    def jdiv(x: String, d: Int) = // Java's truncating signed division
      s"(CASE WHEN $x < 0 THEN -((-($x)) // $d) ELSE ($x) // $d END)"
    // Σ of the first (m mod n) unsigned bytes + floor(m/n) full cycles —
    // the cyclic-fill checksum closed form (corpus texts are never empty)
    def cyc(m: String) =
      s"((CAST($m AS BIGINT) // n) * s_all + CAST(COALESCE(list_sum(" +
        s"ubl[1:CAST(CAST($m AS BIGINT) % n AS INT)]), 0) AS BIGINT))"
    // position-WEIGHTED cyclic closed form: Σ_{i=0}^{m-1} (i+1)·b[i mod n].
    // Byte r (1-based) of the text occupies positions r, r+n, r+2n, … —
    // c = (m-r)//n + 1 of them — whose 1-based weights sum to
    // c·r + n·c(c-1)/2; total ≤ 255·m(m+1)/2 ≈ 5·10^11 at the raster cap,
    // BIGINT-safe. Order-sensitive twin of the engine's sumsRgb /
    // audioChecksums weighted sums.
    def wcyc(m: String) =
      s"(CAST(COALESCE(list_sum(list_transform(range(1, n+1), r -> " +
        s"CASE WHEN r <= CAST($m AS BIGINT) THEN ubl[CAST(r AS INT)] * " +
        s"(((CAST($m AS BIGINT) - r) // n + 1) * r + " +
        s"n * ((CAST($m AS BIGINT) - r) // n + 1) * " +
        s"((CAST($m AS BIGINT) - r) // n) // 2) ELSE 0 END)), 0) AS BIGINT))"
    s"""
        bytes AS (
          SELECT doc_id, hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS n
          FROM documents),
        ubx AS (
          SELECT doc_id,
            list_transform(range(1, n+1), i -> ${hexByte("i")}) AS ubl
          FROM bytes),
        folded AS (
          SELECT doc_id, n,
            list_reduce(
              list_prepend(1125899906842597::HUGEINT,
                list_transform(range(1, n+1),
                  i -> CAST(CASE WHEN ${hexByte("i")} >= 128
                            THEN ${hexByte("i")} - 256
                            ELSE ${hexByte("i")} END AS HUGEINT))),
              (acc, x) -> ((acc * 31 + x) % $N + $N) % $N) AS hu
          FROM bytes),
        keyed AS (
          SELECT f.doc_id AS media_id,
            ['image','audio','video'][CAST(f.doc_id % 3 AS INT) + 1] AS kind,
            f.n, u.ubl,
            CAST(COALESCE(list_sum(u.ubl), 0) AS BIGINT) AS s_all,
            CAST((hu) - (CASE WHEN (hu) >= $HALF THEN $N ELSE 0::HUGEINT END) AS BIGINT) AS hs,
            abs(CAST((hu) - (CASE WHEN (hu) >= $HALF THEN $N ELSE 0::HUGEINT END) AS BIGINT)) AS ah,
            abs(${jdiv(s"CAST((hu) - (CASE WHEN (hu) >= $HALF THEN $N ELSE 0::HUGEINT END) AS BIGINT)", 7)}) AS ah7,
            abs(${jdiv(s"CAST((hu) - (CASE WHEN (hu) >= $HALF THEN $N ELSE 0::HUGEINT END) AS BIGINT)", 11)}) AS ah11
          FROM folded f JOIN ubx u ON u.doc_id = f.doc_id),
        geom AS (
          SELECT media_id, kind, n, ubl, s_all, hs,
            CASE kind WHEN 'image' THEN CAST(ah % 192 + 1 AS INT)
                      WHEN 'video' THEN CAST(ah % 64 + 1 AS INT) END AS width,
            CASE kind WHEN 'image' THEN CAST(ah7 % 108 + 1 AS INT)
                      WHEN 'video' THEN CAST(ah7 % 36 + 1 AS INT) END AS height,
            CASE kind WHEN 'audio' THEN CAST(ah % 4800 + 1 AS INT)
                      WHEN 'video' THEN CAST(ah11 % 300 + 1 AS INT) END AS n_frames,
            CASE kind WHEN 'image' THEN 'png' WHEN 'audio' THEN 'wave'
                      ELSE 'gvid/png' END AS format
          FROM keyed),
        decoded AS (
          SELECT media_id, kind, width, height, n_frames, format,
            CASE kind
              WHEN 'image' THEN ${cyc("3 * width * height")}
              WHEN 'audio' THEN 256 * ${cyc("n_frames")}
                                - 32768 * CAST(n_frames AS BIGINT)
              ELSE CAST(n_frames AS BIGINT) * ${cyc("3 * width * height")}
            END AS content_sum,
            -- order-sensitive weighted checksum; for video this is the
            -- PER-FRAME value (positions restart at each decoded frame,
            -- matching frameChecksums), for audio it is 256·wcyc(nf)
            -- minus the -128 bias times Σ(j+1) = nf(nf+1)/2
            CASE kind
              WHEN 'image' THEN ${wcyc("3 * width * height")}
              WHEN 'audio' THEN 256 * ${wcyc("n_frames")}
                - 32768 * (CAST(n_frames AS BIGINT)
                           * (CAST(n_frames AS BIGINT) + 1) // 2)
              ELSE ${wcyc("3 * width * height")}
            END AS content_wsum
          FROM geom)"""
  }

  /** m01's n_bytes oracle: the compressed PNG/WAV container size is not
    * SQL-expressible, so the generator replays the ENCODER single-node
    * (the p03 replay discipline) and inlines (media_id, n_bytes) literals
    * — the decode side of the compare stays fully independent (DuckDB
    * recomputes geometry + content checksums from the text alone). */
  private def mediaBytesValues(s: SparkSession, dir: String): String =
    Tables.load(s, dir, "documents").select("doc_id", "text")
      .collect().map { r =>
        val id = r.getLong(0)
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val payload = Multimodal.encodeMedia(id, kind,
          if (r.isNullAt(1)) null else r.getString(1).getBytes("UTF-8"))
        s"($id, ${if (payload == null) 0 else payload.length})"
      }.mkString(",\n          ")

  /** DuckDB twin of [[TextAnalysis.langId]], generated from the same
    * stopword map so the lists cannot drift. */
  private def langIdOracle: String = {
    val entries = TextAnalysis.stopwords.toSeq.sortBy(_._1).map { case (lang, ws) =>
      val lst = ws.map(w => s"'${w}'").mkString("[", ",", "]")
      s"{'score': len(list_intersect(toks, $lst)), 'lang': '$lang'}"
    }.mkString(",\n              ")
    s"""
        WITH t AS (
          SELECT doc_id,
            list_distinct(list_filter(string_split(
              trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
              x -> len(x) > 0)) AS toks
          FROM documents),
        s AS (
          SELECT doc_id,
            list_aggregate([
              $entries], 'max') AS best
          FROM t)
        SELECT doc_id,
               CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS pred_lang
        FROM s"""
  }

  val all: Seq[Q] = Seq(

    // ---- Exact dedup: survivor = min doc_id per identical text.
    Q("d01_dedup_exact",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select(col("doc_id"), col("dup_cnt")),
      Some("""
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
        FROM documents GROUP BY text""")),

    // ---- MinHash+LSH near-dup candidate pairs with exact Jaccard verify.
    // Oracle: all-pairs exact character-5-shingle Jaccard (feasible at the
    // driver's sf0.01 gate scale; the LSH path must reproduce it exactly —
    // Jaccard over hashed shingle sets equals Jaccard over the raw sets
    // modulo 2^-64 collisions, and banding recall is 1.0 in the ≥0.9
    // Jaccard regime the corpus duplicates occupy).
    Q("d02_minhash_pairs",
      (s, dir) => Dedup.minhashCandidates(
        t(s, dir, "documents"), "doc_id", "text",
        Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35)),
      Some("""
        WITH s AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
              i -> nrm[i:i+4])) AS sh
          FROM (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nrm
                FROM documents))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE jaccard >= 0.35""")),

    // ---- MinHash dedup survivors (keep-earliest). Oracle: drop every doc
    // with an exact-Jaccard near-duplicate of smaller id (all-pairs at
    // gate scale; same exactness argument as d02).
    Q("d03_minhash_dedup",
      (s, dir) => Dedup.minhashDedup(
          t(s, dir, "documents"), "doc_id", "text",
          Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      Some("""
        WITH s AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
              i -> nrm[i:i+4])) AS sh
          FROM (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nrm
                FROM documents)),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35)
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT id_b FROM pairs)""")),

    // ---- Transitive MinHash dedup: connected components over the near-dup
    // graph (label propagation; one min-id survivor per component).
    // Oracle: recursive transitive closure over the exact all-pairs edge
    // set — a victim is any node that can reach a smaller id.
    Q("d07_minhash_dedup_transitive",
      (s, dir) => Dedup.minhashDedupTransitive(
          t(s, dir, "documents"), "doc_id", "text",
          Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""
        WITH pairs AS (
          WITH s AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
                i -> nrm[i:i+4])) AS sh
            FROM (SELECT doc_id,
                    trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nrm
                  FROM documents))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
            WHERE e.b <> r.src)
          SELECT * FROM r),
        victims AS (
          SELECT src AS node FROM reach GROUP BY src HAVING min(dst) < src)
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id NOT IN (SELECT node FROM victims)""")),

    // ---- Duplicate-cluster assignment (d11): every doc labeled with its
    // transitive near-dup cluster id — the auditable form of d07 (who was
    // dropped, attributed to whom). Oracle: the d07 closure with
    // min-reachable-id as the label, singletons labeling themselves.
    Q("d11_dedup_clusters",
      (s, dir) => Dedup.minhashClusters(
          t(s, dir, "documents"), "doc_id", "text",
          Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
        .select(col("doc_id"), col("cluster")),
      Some("""
        WITH pairs AS (
          WITH s AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
                i -> nrm[i:i+4])) AS sh
            FROM (SELECT doc_id,
                    trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nrm
                  FROM documents))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
            WHERE e.b <> r.src)
          SELECT * FROM r),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
          FROM reach GROUP BY src)
        SELECT d.doc_id, COALESCE(comp.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp ON comp.node = d.doc_id""")),

    // ---- Per-cluster duplicate statistics (d12): the audit rollup over
    // d11 — cluster sizes and the char budget a dedup pass keeps vs drops
    // (survivor = min-id member = the cluster id itself). Integer-exact
    // counts/sums only. Oracle: the d11 closure twin + GROUP BY cluster.
    Q("d12_cluster_stats",
      (s, dir) => Dedup.clusterStats(
          t(s, dir, "documents"), "doc_id", "text",
          Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35)),
      Some("""
        WITH pairs AS (
          WITH s AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
                i -> nrm[i:i+4])) AS sh
            FROM (SELECT doc_id,
                    trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nrm
                  FROM documents))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
            WHERE e.b <> r.src)
          SELECT * FROM r),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
          FROM reach GROUP BY src),
        labeled AS (
          SELECT d.doc_id, COALESCE(comp.cluster, d.doc_id) AS cluster,
                 length(d.text) AS chars
          FROM documents d LEFT JOIN comp ON comp.node = d.doc_id)
        SELECT cluster,
               CAST(count(*) AS BIGINT) AS cluster_size,
               CAST(sum(chars) AS BIGINT) AS total_chars,
               CAST(max(chars) AS BIGINT) AS max_chars,
               CAST(sum(chars) -
                    max(CASE WHEN doc_id = cluster THEN chars END) AS BIGINT)
                 AS dropped_chars
        FROM labeled GROUP BY cluster""")),

    // ---- Quality-aware cluster representatives (d16): the d11 clusters
    // with the survivor chosen by (alpha_ratio DESC, id) — keep the BEST
    // copy, not the earliest. Exact-IEEE quality + id tiebreak keeps the
    // choice hash-verifiable. Oracle: the closure twin + first_value.
    Q("d16_quality_reps",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(
          col("doc_id"), col("text"),
          when(length(col("text")) > 0,
            length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
              .cast("double") / length(col("text")))
            .otherwise(lit(0.0)).as("alpha_ratio"))
        Dedup.qualityRepresentatives(docs, "doc_id", "text", "alpha_ratio",
            Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
          .select(col("doc_id"), col("cluster"), col("rep_id"), col("keep"),
            col("alpha_ratio"))
      },
      Some("""
        WITH pairs AS (
          WITH s AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
                i -> nrm[i:i+4])) AS sh
            FROM (SELECT doc_id,
                    trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nrm
                  FROM documents))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
            WHERE e.b <> r.src)
          SELECT * FROM r),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
          FROM reach GROUP BY src),
        labeled AS (
          SELECT d.doc_id, COALESCE(comp.cluster, d.doc_id) AS cluster,
                 CASE WHEN length(d.text) > 0
                      THEN CAST(length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g'))
                             AS DOUBLE) / length(d.text)
                      ELSE 0.0 END AS alpha_ratio
          FROM documents d LEFT JOIN comp ON comp.node = d.doc_id)
        SELECT doc_id, cluster,
               first_value(doc_id) OVER (PARTITION BY cluster
                 ORDER BY alpha_ratio DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS rep_id,
               doc_id = first_value(doc_id) OVER (PARTITION BY cluster
                 ORDER BY alpha_ratio DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS keep,
               alpha_ratio
        FROM labeled""")),

    // ---- Exact duplicate-span detection (d13): the ExactSubstr shape at
    // fixed k=8 word grams — a position is duplicated when its 8-gram
    // occurs at >1 (doc,pos) site corpus-wide; overlapping grams merge
    // into maximal spans. Oracle: the same integer-exact definition in
    // plain SQL (unnest-built grams, count window, gaps-and-islands).
    Q("d13_duplicate_spans",
      (s, dir) => Dedup.duplicateSpans(
        t(s, dir, "documents"), "doc_id", "text", k = 8),
      Some(s"""
        WITH $dupSpanCtes
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 7 AS BIGINT) AS span_end,
               CAST(count(*) AS BIGINT) AS n_dup_grams
        FROM isl GROUP BY doc_id, g""")),

    // ---- Per-doc duplication profile (d15): the filter-score view of
    // d13 — duplicated-gram counts, covered tokens, and the covered
    // ratio per document (integer counts + one exact IEEE division).
    Q("d15_duplication_profile",
      (s, dir) => Dedup.duplicationProfile(
        t(s, dir, "documents"), "doc_id", "text", k = 8),
      Some(s"""
        WITH $dupSpanCtes,
        dg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
          FROM dpos GROUP BY doc_id),
        dt AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_tokens FROM (
            SELECT DISTINCT dpos.doc_id, c.p
            FROM dpos, unnest(range(dpos.pos, dpos.pos + 8)) AS c(p))
          GROUP BY doc_id),
        base AS (
          SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                 CAST(greatest(len(t) - 7, 0) AS BIGINT) AS n_grams
          FROM toks)
        SELECT b.doc_id, b.n_tokens, b.n_grams,
               COALESCE(dg.n_dup_grams, 0) AS n_dup_grams,
               COALESCE(dt.n_dup_tokens, 0) AS n_dup_tokens,
               CASE WHEN b.n_tokens > 0
                    THEN CAST(COALESCE(dt.n_dup_tokens, 0) AS DOUBLE) / b.n_tokens
                    ELSE 0.0 END AS dup_ratio
        FROM base b
        LEFT JOIN dg ON dg.doc_id = b.doc_id
        LEFT JOIN dt ON dt.doc_id = b.doc_id""")),

    // ---- Duplicate-span removal (d14): cut every token covered by a
    // duplicated 8-gram (aggressive all-copies variant — deterministic,
    // no global tie-break state); remaining tokens re-join in order.
    Q("d14_remove_dup_spans",
      (s, dir) => Dedup.removeDuplicateSpans(
        t(s, dir, "documents"), "doc_id", "text", k = 8),
      Some(s"""
        WITH $dupSpanCtes,
        covered AS (
          SELECT DISTINCT dpos.doc_id, c.p AS pos
          FROM dpos, unnest(range(dpos.pos, dpos.pos + 8)) AS c(p)),
        kept AS (
          SELECT tk.doc_id, tk.pos, tk.tok
          FROM (SELECT doc_id, u.i - 1 AS pos, t[u.i] AS tok
                FROM toks, unnest(range(1, len(t) + 1)) AS u(i)) tk
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.doc_id = tk.doc_id AND c.pos = tk.pos)),
        clean AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS kept
          FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(c.clean_text, '') AS clean_text,
               CAST(len(tt.t) - COALESCE(c.kept, 0) AS BIGINT)
                 AS n_removed_tokens
        FROM documents d
        JOIN toks tt ON tt.doc_id = d.doc_id
        LEFT JOIN clean c ON c.doc_id = d.doc_id""")),

    // ---- SimHash near-dup pairs (custom Catalyst expression + banding).
    // maxHamming=3 → 4 derived 16-bit bands with an EXACT pigeonhole recall
    // guarantee (round-1 ran hamming≤16 over 4 bands, which silently missed
    // pairs with hamming 4..16; radius 3 is the classic near-dup setting —
    // larger radii need proportionally more, narrower bands and go
    // quadratic on coarse buckets).
    // Oracle supports tokens up to 15 bytes (explicit maxBytes at the
    // XxhSql.chain call in simhashOracle; corpus max is 8). A longer token
    // hashes through a missing stage and FAILS the hash-verify loudly —
    // raise maxBytes there if the corpus ever grows longer tokens.
    Q("d04_simhash_pairs",
      (s, dir) => Dedup.simhashCandidates(
        t(s, dir, "documents"), "doc_id", "text", maxHamming = 3),
      Some(s"""
        WITH ${simhashOracle}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""")),

    // ---- Exact word-3-gram Jaccard over LSH candidates.
    // Oracle: all-pairs word-3-gram Jaccard (short docs collapse to one
    // whole-text gram, mirroring wordNgramHashSet's cnt<n branch).
    Q("d05_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 3, threshold = 0.1,
        Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.0)),
      Some("""
        WITH s AS (
          SELECT doc_id,
            CASE WHEN len(toks) < 3 THEN [list_aggregate(toks, 'string_agg', ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks)-1),
                        i -> toks[i] || toks[i+1] || toks[i+2]))
            END AS g
          FROM (SELECT doc_id,
                  list_filter(string_split(
                    trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
                    x -> len(x) > 0) AS toks
                FROM documents))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
          (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS ngram_jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE ngram_jaccard >= 0.1""")),

    // ---- Incremental (cross-corpus) dedup: the rolling-crawl shape — drop
    // from a new batch (doc_id%5=4, a deterministic 20% at any SF) whatever
    // duplicates the existing corpus (the other 80%), exact OR near. Batch-
    // internal dups survive by design. Oracle: all-pairs exact cross-side
    // Jaccard + normalized-text equality (same hashed-shingle ≡ raw-shingle
    // equivalence as d02/d03).
    Q("d08_cross_dedup",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.crossDedup(
            d.filter(col("doc_id") % 5 === 4), d.filter(col("doc_id") % 5 =!= 4),
            "doc_id", "text",
            Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some("""
        WITH s AS (
          SELECT doc_id, nrm,
            list_distinct(list_transform(range(1, greatest(len(nrm)-3, 1)),
              i -> nrm[i:i+4])) AS sh
          FROM (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nrm
                FROM documents)),
        victims AS (
          SELECT b.doc_id
          FROM s b JOIN s c ON b.doc_id % 5 = 4 AND c.doc_id % 5 <> 4
          WHERE b.nrm = c.nrm
             OR CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
                (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))) >= 0.35)
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id % 5 = 4 AND doc_id NOT IN (SELECT doc_id FROM victims)""")),

    // ---- Embedding near-dup pairs via hyperplane LSH + cosine verify.
    // The LSH path is approximate vs ground truth but DETERMINISTIC: the
    // seeded hyperplanes are constants, so the oracle inlines their exact
    // doubles and reproduces the same candidate set + cosine bit-for-bit —
    // the approximation itself is hash-verified.
    Q("d06_embedding_neardup",
      (s, dir) => Similarity.embeddingNearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35, dim = 64, bitsPerTable = 6, tables = 8),
      Some(embNearDupOracle(tables = 8, bits = 6, seed = 42L, threshold = 0.35))),

    // ---- SemDeDup: transitive semantic dedup in embedding space — the
    // d06 near-dup graph fed through connected components (min-label
    // propagation), one min-id representative kept per cluster. Oracle:
    // the d06 pair CTEs + d07's recursive-closure victim rule.
    Q("d10_semdedup",
      (s, dir) => Similarity.semDedup(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.35, dim = 64, bitsPerTable = 6, tables = 8,
          seed = 42L)
        .select(col("vec_id"), col("label")),
      Some(semDedupOracle(tables = 8, bits = 6, seed = 42L,
        threshold = 0.35))),

    // ---- ANN: exact brute-force cosine top-k (baseline; corpus-linear).
    // Oracle reproduces the cosine bit-for-bit: the same float→double cast,
    // the same left-to-right product fold (list_reduce ≡ Spark `aggregate`),
    // the same (corpus_norm * query_norm) operand order — so cos_sim
    // hash-matches as a raw double, no rounding tolerance needed.
    Q("s01_ann_bruteforce",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10)
      },
      Some(annBruteOracle)),

    // ---- ANN: hyperplane-LSH bucketed top-k (scale path; sublinear).
    // Oracled like d06: the seeded planes inline as literals, so the
    // bucket codes, candidate set, and re-rank reproduce exactly.
    Q("s02_ann_lsh",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, dim = 64, bitsPerTable = 5, tables = 8)
      },
      Some(annLshOracle(tables = 8, bits = 5, seed = 42L, k = 10))),

    // ---- ANN: IVF-flat (k-means cells + probe; third ANN strategy).
    // Oracled like s02, one step further: the data-dependent trained
    // centroids are memoized within the Verify JVM and inlined into the
    // DuckDB twin as exact double literals, so cell assignment, probe set,
    // and re-rank all reproduce bit-for-bit — the trained approximation
    // itself is hash-verified.
    Q("s03_ann_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfProbe(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, centroids = ivfCentroids(s, dir, 16, 42L), nProbe = 4)
      },
      None,
      oracleGen = Some((s, dir) =>
        annIvfOracle(s, dir, nCentroids = 16, nProbe = 4, seed = 42L, k = 10))),

    // ---- k-NN graph over the corpus embeddings: every node's top-k LSH
    // neighbors (the semdedup/cluster backbone). Self-join on (table,
    // bucket) — no broadcast side — then exact cosine re-rank through the
    // bounded-heap TopKPerKey. Oracled like s02: the seeded hyperplanes
    // inline as exact double literals, so the approximation itself is
    // hash-checked.
    Q("s05_knn_graph",
      (s, dir) => Similarity.knnGraph(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5, dim = 64, bitsPerTable = 6, tables = 4, seed = 42L),
      Some(knnGraphOracle(tables = 4, bits = 6, seed = 42L, k = 5))),

    // ---- k-means corpus clustering (s06): nearest-centroid assignment of
    // every embedding — the partition key for within-cluster pipeline work
    // (d19 builds on it). Trained centroids memoized in the Verify JVM and
    // inlined into the DuckDB twin as exact double literals (s03 pattern),
    // so the trained clustering itself is hash-verified.
    Q("s06_kmeans_assign",
      (s, dir) => Similarity.kmeansAssign(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        ivfCentroids(s, dir, 8, 7L)),
      None,
      oracleGen = Some((s, dir) =>
        kmeansAssignOracle(s, dir, nCentroids = 8, seed = 7L))),

    // ---- ANN: product quantization / ADC (s07; Jégou et al. 2011 —
    // the FAISS-default compressed-domain ranking, completing the ANN
    // family: brute / LSH / IVF / int8 / PQ). The corpus crosses the join
    // as m byte codes, never as floats; scores are m table lookups. The
    // trained codebooks inline into the DuckDB twin as exact-double
    // literals, so the compressed-domain ranking hash-verifies like every
    // other ANN path.
    Q("s07_ann_pq",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, codebooks = pqCodebooks(s, dir, m = 8, kc = 16, seed = 7L),
          dim = 64)
      },
      None,
      oracleGen = Some((s, dir) =>
        annPqOracle(s, dir, m = 8, kc = 16, seed = 7L, k = 10))),

    // ---- ANN: IVF-PQ (s08) — coarse cells + in-cell ADC, the standard
    // billion-scale index shape (per-query work ~nProbe/nCells of the
    // corpus AND every score a table lookup; no float vectors cross the
    // join). Composes s03's trained coarse quantizer with s07's codebooks;
    // both literal-inline into the twin, so the composed approximation is
    // hash-verified end to end.
    Q("s08_ann_ivfpq",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, coarse = ivfCentroids(s, dir, 16, 42L),
          codebooks = pqCodebooks(s, dir, m = 8, kc = 16, seed = 7L),
          dim = 64, nProbe = 4)
      },
      None,
      oracleGen = Some((s, dir) =>
        annIvfPqOracle(s, dir, nCoarse = 16, coarseSeed = 42L,
          m = 8, kc = 16, pqSeed = 7L, nProbe = 4, k = 10))),

    // ---- ANN recall evaluation (s09): recall@k of the LSH index (s02's
    // exact parameters) against the brute-force ground truth (s01's) —
    // the eval every index deployment runs before its parameters ship.
    // The approximation AND the ground truth both reproduce in SQL (the
    // seeded hyperplanes inline as literals), so the recall numbers
    // themselves are hash-verified. Cost is O(queries x k) beyond
    // producing the two inputs.
    Q("s09_ann_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.recallAtK(
          Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 10),
          Similarity.lshTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding",
            k = 10, dim = 64, bitsPerTable = 5, tables = 8))
      },
      Some(s"""
        WITH exact AS (
          SELECT query_id, neighbor_id FROM ($annBruteOracle) x),
        approx AS (
          SELECT query_id, neighbor_id
          FROM (${annLshOracle(tables = 8, bits = 5, seed = 42L, k = 10)}) y)
        SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
          CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
          CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS recall
        FROM exact e
        LEFT JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id""")),

    // ---- SemDeDup, k-means-partitioned (d19; Abbas et al. 2023 §3 as
    // published): exact pairwise cosine ONLY within each k-means cluster,
    // greedy keep-earliest survivor rule. Complements d10 (the LSH-graph
    // variant) — here centroid COUNT is the knob that bounds the quadratic
    // term as the corpus grows. Fully oracled: inlined trained centroids +
    // exact fold-cosine make the approximate clustering hash-checked.
    Q("d19_semdedup_kmeans",
      (s, dir) => Similarity.semDedupKMeans(
          t(s, dir, "embeddings").select(col("vec_id"), col("label"),
            col("embedding")),
          "vec_id", "embedding", ivfCentroids(s, dir, 8, 7L),
          threshold = 0.35)
        .select(col("vec_id"), col("label"), col("cluster")),
      None,
      oracleGen = Some((s, dir) =>
        semDedupKMeansOracle(s, dir, nCentroids = 8, seed = 7L,
          threshold = 0.35))),

    // ---- Text stats with DuckDB oracle (token counts, char-class ratios,
    // quality flag — the SQL-expressible subset of TextAnalysis.analyze).
    Q("t01_text_stats",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(Seq(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("token_count")) ++
          TextAnalysis.qualitySignals(col("text")): _*)
      },
      Some("""
        WITH q AS (
          SELECT doc_id,
                 text,
                 LENGTH(text) AS nc,
                 LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha,
                 LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS digits,
                 LENGTH(REGEXP_REPLACE(text, '[^ ]', '', 'g')) AS spaces,
                 LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
                             x -> LENGTH(x) > 0) AS toks
          FROM documents)
        SELECT doc_id,
               CAST(LEN(toks) AS BIGINT) AS token_count,
               CAST(nc AS BIGINT) AS n_chars_m,
               CAST(LEN(toks) AS BIGINT) AS n_tokens,
               CASE WHEN nc > 0 THEN CAST(alpha AS DOUBLE) / nc ELSE 0.0 END AS alpha_ratio,
               CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE) / nc ELSE 0.0 END AS digit_ratio,
               CAST(spaces AS DOUBLE) / GREATEST(nc, 1) AS space_ratio,
               CASE WHEN LEN(toks) > 0
                    THEN CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks)
                    ELSE 0.0 END AS mean_token_len,
               (nc >= 20 AND LEN(toks) >= 5
                AND CASE WHEN nc > 0 THEN CAST(alpha AS DOUBLE) / nc ELSE 0.0 END > 0.5
                AND CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE) / nc ELSE 0.0 END < 0.3)
                 AS quality_keep
        FROM q""")),

    // ---- Language ID (stopword-evidence heuristic; deterministic).
    // Oracle mirrors the argmax exactly: per-language distinct-stopword hit
    // counts, winner = max (score, lang) struct — list_aggregate 'max' uses
    // the same field-lexicographic struct ordering as Spark's array_max,
    // including the ties→last-lang-code rule.
    Q("t02_lang_id",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang")),
      Some(langIdOracle)),

    // ---- Winnowing fingerprint, surfaced as order-free set aggregates
    // (size/min/max/wrapping-sum) so the DuckDB twin can reproduce them
    // bit-exactly — see [[winnowOracle]] for the mod-2^64 construction.
    Q("t03_fingerprint",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("__fp"))
        .select(col("doc_id"),
          size(col("__fp")).cast("long").as("fp_size"),
          array_min(col("__fp")).as("fp_min"),
          array_max(col("__fp")).as("fp_max"),
          aggregate(col("__fp"), lit(0L), (a, x) => a + x).as("fp_sum")),
      Some(winnowOracle)),

    // ---- Per-source corpus statistics: the rollup every ingest pipeline
    // reports (doc counts, token/char budgets, quality-keep rate).
    Q("t04_corpus_stats",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("source") +: TextAnalysis.qualitySignals(col("text")): _*)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("n_chars_m")).as("total_chars"),
            sum(col("quality_keep").cast("long")).as("n_keep"))
          .withColumn("keep_rate",
            col("n_keep").cast("double") / col("n_docs"))
      },
      Some("""
        WITH q AS (
          SELECT source,
                 LENGTH(text) AS nc,
                 LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha,
                 LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS digits,
                 LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
                             x -> LENGTH(x) > 0) AS toks
          FROM documents)
        SELECT source, n_docs, total_tokens, total_chars, n_keep,
               CAST(n_keep AS DOUBLE) / n_docs AS keep_rate
        FROM (
          SELECT source,
                 COUNT(*) AS n_docs,
                 CAST(SUM(LEN(toks)) AS BIGINT) AS total_tokens,
                 CAST(SUM(nc) AS BIGINT) AS total_chars,
                 CAST(SUM(CASE WHEN nc >= 20 AND LEN(toks) >= 5
                   AND CASE WHEN nc > 0 THEN CAST(alpha AS DOUBLE)/nc ELSE 0.0 END > 0.5
                   AND CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE)/nc ELSE 0.0 END < 0.3
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
          FROM q GROUP BY source)""")),

    // ---- Composed embedding-prep pipeline (p02): dedup-then-index — the
    // embedding-side twin of p01, as ONE query. SemDeDup survivors (d19's
    // within-cluster keep-earliest rule) become the IVF-PQ corpus (s08's
    // coarse cells + in-cell ADC), so queries never retrieve a dropped
    // near-duplicate. Both stages reuse the SAME trained coarse quantizer
    // and codebooks; the oracle composes the d19 victims CTE with the s08
    // scoring CTEs restricted to survivors — the hash checks the interface
    // (who survived INTO the index), not just each stage alone.
    Q("p02_embedding_prep",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val coarse = ivfCentroids(s, dir, 16, 42L)
        val survivors = Similarity.semDedupKMeans(
            emb.select(col("vec_id"), col("embedding")),
            "vec_id", "embedding", coarse, threshold = 0.35)
          .select(col("vec_id"), col("embedding"))
        Similarity.ivfPqTopK(
          survivors, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, coarse = coarse,
          codebooks = pqCodebooks(s, dir, m = 8, kc = 16, seed = 7L),
          dim = 64, nProbe = 4)
      },
      None,
      oracleGen = Some((s, dir) =>
        embeddingPrepOracle(s, dir, nCoarse = 16, coarseSeed = 42L,
          m = 8, kc = 16, pqSeed = 7L, threshold = 0.35, nProbe = 4,
          k = 10))),

    // ---- Composed media-prep pipeline (p03): the multimodal pillar end to
    // end as ONE query — real-codec content-statistics features over the
    // binary payload column (m03's plumbing) → SemDeDup-style near-dup drop on the feature
    // vectors (d19's within-cluster keep-earliest rule, seeded literal
    // centroids) → per-kind byte-budget selection of the survivors (u08's
    // greedy rule with n_bytes as the cost). The oracle is an independent
    // single-node replay (see [[mediaPrepOracle]]), so the hash checks the
    // stage INTERFACES: who survived dedup INTO the budget pass.
    // ---- Composed quality gate (p04): the three paper-named gates —
    // Gopher quality (t29), Gopher repetition (t30), C4 line+page (t31,
    // over the same derived punctuated page) — fused into ONE scan with
    // zero exchanges: the full "keep/drop + cleaned text" pre-training
    // filter pass. The oracle composes the three stage twins by doc_id
    // join (the ORACLE may shuffle; the engine plan must not).
    Q("p04_quality_gate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val page = regexp_replace(col("text"), "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
        val c4 = TextAnalysis.c4Signals(page)
        val staged = docs.select(col("doc_id"),
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
          c4.head, c4.last,
          graft.functions.TextHashExprs.gopherRepetition(col("text"))
            .as("__r"))
        val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
          .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
          .reduce(_ && _)
        staged.select(col("doc_id"), col("gopher_pass"),
          repPass.as("rep_pass"), col("c4_keep"),
          (col("gopher_pass") && repPass && col("c4_keep")).as("keep"),
          col("clean_text"))
      },
      Some(s"""
        WITH g AS (SELECT doc_id, gopher_pass
                   FROM (${gopherOracle(minStopHits = 1L)}) x),
        r AS (SELECT doc_id, rep_pass FROM ($gopherRepetitionOracle) y),
        c AS (SELECT doc_id, clean_text, c4_keep FROM ($c4Oracle) z)
        SELECT g.doc_id, g.gopher_pass, r.rep_pass, c.c4_keep,
          (g.gopher_pass AND r.rep_pass AND c.c4_keep) AS keep,
          c.clean_text
        FROM g JOIN r USING (doc_id) JOIN c USING (doc_id)""")),

    // ---- Cross-modal caption<->audio consistency gate (m09): the audio
    // sibling of m08 (the CLAP-style audio-caption filter shape) — the
    // same caption kernel against the mean decoded PCM sample level of
    // the SAME document's audio twin, normalized to [0,1] from the exact
    // content_sum/n_frames integers ((mean + 32768) / 65536). Same
    // zero-exchange-plus-one-join plan and oracle discipline as m08; no
    // separate bench bar — identical plan shape and cost class as m08,
    // whose P58 bar carries the family's perf signal (the t21
    // fixed-subset precedent).
    Q("m09_audio_caption_consistency",
      (s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val audioDocs = t(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(3)) === 1)
        val textSide = audioDocs.select(col("doc_id"),
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(coalesce(col("text"), lit(""))),
            w, bias, maxN = 2).as("caption_score"))
        val mediaSide = Multimodal.decodeMeta(
            Multimodal.syntheticMedia(audioDocs))
          .select(col("media_id").as("doc_id"), col("n_frames"),
            col("content_sum"))
        val level = (col("content_sum").cast("double") / col("n_frames") +
          lit(32768.0)) / lit(65536.0)
        val affinity = lit(0.5) + lit(0.5) * col("caption_score") /
          (lit(1.0) + abs(col("caption_score")))
        textSide.join(mediaSide, Seq("doc_id"))
          .select(col("doc_id"), col("n_frames"), col("caption_score"),
            level.as("level"), affinity.as("caption_affinity"),
            abs(affinity - level).as("gap"),
            (abs(affinity - level) <= lit(0.35)).as("consistent"))
      },
      None,
      oracleGen = Some((s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val b = s"CAST('$bias' AS DOUBLE)"
        val aff = "(0.5::DOUBLE + 0.5::DOUBLE * c.caption_score" +
          " / (1.0::DOUBLE + abs(c.caption_score)))"
        s"""
        WITH ${mediaDecodeOracle},
        ${hashedGramScoreCtesMulti(Seq(("_cap", w.toIndexedSeq, b)), 1024)},
        cap AS (
          SELECT d.doc_id, COALESCE(f.sc, $b) AS caption_score
          FROM documents d LEFT JOIN folded_cap f ON f.doc_id = d.doc_id
          WHERE d.doc_id % 3 = 1),
        au AS (
          SELECT media_id AS doc_id, n_frames,
            (CAST(content_sum AS DOUBLE) / n_frames + 32768.0::DOUBLE)
              / 65536.0::DOUBLE AS level
          FROM decoded WHERE kind = 'audio')
        SELECT c.doc_id, a.n_frames, c.caption_score, a.level,
          $aff AS caption_affinity,
          abs($aff - a.level) AS gap,
          abs($aff - a.level) <= 0.35::DOUBLE AS consistent
        FROM cap c JOIN au a USING (doc_id)"""
      })),

    // ---- Composed multimodal pretrain filter (p10): the image-caption
    // corpus end to end — p04's three fused text gates (Gopher quality +
    // repetition + C4, still ONE zero-exchange scan) plus the m08
    // cross-modal consistency gate (t33 caption kernel vs the REAL
    // decoded brightness of the same doc's image twin), one doc_id
    // equi-join between the scan and the map-shaped decode side. keep =
    // all four gates — the standard multimodal-pretraining selection.
    // The oracle composes the four stage twins by doc_id join (the
    // ORACLE may shuffle; the engine plan must not — PlanLint budget 0).
    Q("p10_multimodal_export",
      (s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val imgDocs = t(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(3)) === 0)
        val page = regexp_replace(col("text"),
          "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
        val c4 = TextAnalysis.c4Signals(page)
        val staged = imgDocs.select(col("doc_id"),
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
          c4.last,
          graft.functions.TextHashExprs.gopherRepetition(col("text"))
            .as("__r"),
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(coalesce(col("text"), lit(""))),
            w, bias, maxN = 2).as("caption_score"))
        val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
          .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
          .reduce(_ && _)
        val textSide = staged.select(col("doc_id"), col("gopher_pass"),
          repPass.as("rep_pass"), col("c4_keep"), col("caption_score"))
        val mediaSide = Multimodal.decodeMeta(
            Multimodal.syntheticMedia(imgDocs))
          .select(col("media_id").as("doc_id"), col("width"),
            col("height"), col("content_sum"))
        val brightness = col("content_sum").cast("double") /
          (lit(3) * col("width") * col("height")).cast("double") / lit(255.0)
        val affinity = lit(0.5) + lit(0.5) * col("caption_score") /
          (lit(1.0) + abs(col("caption_score")))
        val consistent = abs(affinity - brightness) <= lit(0.35)
        textSide.join(mediaSide, Seq("doc_id"))
          .select(col("doc_id"), col("gopher_pass"), col("rep_pass"),
            col("c4_keep"), col("caption_score"),
            brightness.as("brightness"), consistent.as("consistent"),
            (col("gopher_pass") && col("rep_pass") && col("c4_keep") &&
              consistent).as("keep"))
      },
      None,
      oracleGen = Some((s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val b = s"CAST('$bias' AS DOUBLE)"
        val aff = "(0.5::DOUBLE + 0.5::DOUBLE * cap.caption_score" +
          " / (1.0::DOUBLE + abs(cap.caption_score)))"
        s"""
        WITH ${mediaDecodeOracle},
        ${hashedGramScoreCtesMulti(Seq(("_cap", w.toIndexedSeq, b)), 1024)},
        g AS (SELECT doc_id, gopher_pass
              FROM (${gopherOracle(minStopHits = 1L)}) x
              WHERE doc_id % 3 = 0),
        r AS (SELECT doc_id, rep_pass FROM ($gopherRepetitionOracle) y
              WHERE doc_id % 3 = 0),
        c AS (SELECT doc_id, c4_keep FROM ($c4Oracle) z
              WHERE doc_id % 3 = 0),
        cap AS (
          SELECT d.doc_id, COALESCE(f.sc, $b) AS caption_score
          FROM documents d LEFT JOIN folded_cap f ON f.doc_id = d.doc_id
          WHERE d.doc_id % 3 = 0),
        img AS (
          SELECT media_id AS doc_id,
            CAST(content_sum AS DOUBLE)
              / CAST(3*width*height AS DOUBLE) / 255.0::DOUBLE AS brightness
          FROM decoded WHERE kind = 'image')
        SELECT g.doc_id, g.gopher_pass, r.rep_pass, c.c4_keep,
          cap.caption_score, img.brightness,
          abs($aff - img.brightness) <= 0.35::DOUBLE AS consistent,
          (g.gopher_pass AND r.rep_pass AND c.c4_keep AND
            abs($aff - img.brightness) <= 0.35::DOUBLE) AS keep
        FROM g JOIN r USING (doc_id) JOIN c USING (doc_id)
             JOIN cap USING (doc_id) JOIN img USING (doc_id)"""
      })),

    Q("p03_media_prep",
      (s, dir) => {
        // the encode pass is real codec work now — cut lineage so the two
        // consumers (features + decode) don't re-encode every payload
        val media = Multimodal.syntheticMedia(t(s, dir, "documents"))
          .transform(graft.core.Checkpoint.cut)
        val feats = Multimodal.extractFeatures(media, dim = 16)
        val meta = Multimodal.decodeMeta(media)
          .select(col("media_id"), col("kind"), col("n_bytes"))
        val survivors = Similarity.semDedupKMeans(feats, "media_id", "feature",
            mediaCentroids(4, 16, 11L), threshold = 0.999)
          .select(col("media_id"),
            element_at(col("feature"), 1).cast("double").as("feat_score"))
        graft.operators.Sampling.budgetSelect(
            meta.join(survivors, Seq("media_id")),
            "media_id", "kind", "feat_score", "n_bytes",
            budgetTokens = 1000000L)
          .withColumnRenamed("cum_tokens", "cum_bytes")
      },
      None,
      oracleGen = Some((s, dir) =>
        mediaPrepOracle(s, dir, k = 4, threshold = 0.999,
          budgetBytes = 1000000L))),

    // ---- Composed corpus-prep pipeline (p01): the end-to-end shape a
    // real training-data user ships, as ONE query — quality-aware dedup
    // representatives (d16) → duplicate-span removal among the survivors
    // (d14) → blocklist gate on the CLEANED text (t09) → per-source token
    // budget selection on cleaned quality (u08). Every stage is the
    // already-oracled operator; the oracle composes the four stage twins
    // as one CTE chain, so the hash checks the INTERFACES between stages,
    // not just each stage alone.
    Q("p01_corpus_prep",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        def alphaOf(c: org.apache.spark.sql.Column) = when(length(c) > 0,
          length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") / length(c))
          .otherwise(lit(0.0))
        val reps = Dedup.qualityRepresentatives(
            docs.select(col("doc_id"), col("text"),
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
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("clean_text")).as("n_toks"),
            alphaOf(col("clean_text")).as("alpha_ratio"))
        graft.operators.Sampling.budgetSelect(scored, "doc_id", "source",
          "alpha_ratio", "n_toks", budgetTokens = 1500L)
      },
      Some(s"""
        WITH nrm0 AS (
          SELECT doc_id, text, source,
            trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS nrm,
            CASE WHEN length(text) > 0
                 THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        AS DOUBLE) / length(text)
                 ELSE 0.0 END AS alpha_ratio
          FROM documents),
        shs AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(len(nrm)-3, 1)), i -> nrm[i:i+4])) AS sh
          FROM nrm0),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM shs a JOIN shs b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
            WHERE e.b <> r.src)
          SELECT * FROM r),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
          FROM reach GROUP BY src),
        labeled AS (
          SELECT n.doc_id, COALESCE(comp.cluster, n.doc_id) AS cluster,
                 n.alpha_ratio, n.text
          FROM nrm0 n LEFT JOIN comp ON comp.node = n.doc_id),
        surv AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
              doc_id = first_value(doc_id) OVER (PARTITION BY cluster
                ORDER BY alpha_ratio DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS keep
            FROM labeled) WHERE keep),
        ${dupSpanCtesFrom("surv")},
        covered AS (
          SELECT DISTINCT dpos.doc_id, c.p AS pos
          FROM dpos, unnest(range(dpos.pos, dpos.pos + 8)) AS c(p)),
        kept AS (
          SELECT tk.doc_id, tk.pos, tk.tok
          FROM (SELECT doc_id, u.i - 1 AS pos, t[u.i] AS tok
                FROM toks, unnest(range(1, len(t) + 1)) AS u(i)) tk
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.doc_id = tk.doc_id AND c.pos = tk.pos)),
        clean AS (
          SELECT s2.doc_id, COALESCE(c.clean_text, '') AS clean_text
          FROM surv s2 LEFT JOIN (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                   count(*) AS kept_n
            FROM kept GROUP BY doc_id) c ON c.doc_id = s2.doc_id),
        ctoks AS (
          SELECT doc_id, clean_text, list_filter(string_split(
              trim(regexp_replace(lower(clean_text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')),
              ' '), x -> len(x) > 0) AS toks2
          FROM clean),
        gated AS (
          SELECT doc_id, clean_text, toks2 FROM ctoks
          WHERE (CASE WHEN len(toks2) > 0
                 THEN CAST(len(list_filter(toks2,
                   t2 -> list_contains(['dup', 'spam', 'error'], t2))) AS DOUBLE)
                   / len(toks2)
                 ELSE 0.0 END) <= 0.05),
        q AS (
          SELECT g.doc_id, d.source,
            CAST(len(g.toks2) AS BIGINT) AS n_toks,
            CASE WHEN length(g.clean_text) > 0
                 THEN CAST(length(regexp_replace(g.clean_text, '[^a-zA-Z]', '', 'g'))
                        AS DOUBLE) / length(g.clean_text)
                 ELSE 0.0 END AS alpha_ratio
          FROM gated g JOIN documents d ON d.doc_id = g.doc_id),
        rr AS (
          SELECT doc_id, source, n_toks, alpha_ratio,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY alpha_ratio DESC, doc_id) AS BIGINT) AS rank,
            CAST(SUM(n_toks) OVER (PARTITION BY source
              ORDER BY alpha_ratio DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
          FROM q)
        SELECT doc_id, source, n_toks, alpha_ratio, rank, cum_tokens
        FROM rr WHERE cum_tokens <= 1500""")),

    // ---- Longest duplicated span (d17): per-doc max L with an L-token
    // gram repeated anywhere corpus-wide — the true-ExactSubstr statistic
    // the fixed-k family can't express. Distributed prefix doubling +
    // in-bracket binary search (Dedup.longestRepeat); oracle = GENERATED
    // independent single-node ascending-L replay on plain strings.
    Q("d17_longest_repeat",
      (s, dir) => Dedup.longestRepeat(t(s, dir, "documents"), "doc_id", "text"),
      None,
      oracleGen = Some((s, dir) => longestRepeatOracle(s, dir))),

    // ---- Rolling per-source corpus statistics (t18): the STREAMING
    // operator (TextPipeline.rollingCorpusStats — tumbling event-time
    // window + per-source budgets) run on a batch frame; StreamingSpec
    // proves streaming ≡ batch on the same rows. Arrival times are
    // synthesized deterministically (doc_id minutes past an hour-aligned
    // epoch) so the window grid is oracle-able; the operator itself is
    // generic over any timestamped document stream.
    Q("t18_rolling_corpus_stats",
      (s, dir) => graft.streaming.TextPipeline.rollingCorpusStats(
          t(s, dir, "documents").withColumn("ts",
            timestamp_millis(lit(1704067200000L) + col("doc_id") * 60000L)),
          "ts", "source", "text", "1 hour")
        .select(unix_millis(col("window_start")).as("win_start_ms"),
          col("source"), col("n_docs"), col("total_tokens"),
          col("total_chars"), col("n_keep"), col("keep_rate")),
      Some("""
        WITH q AS (
          SELECT ((1704067200000 + doc_id * 60000) // 3600000) * 3600000
                   AS win_start_ms,
                 source,
                 LENGTH(text) AS nc,
                 LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha,
                 LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS digits,
                 LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
                             x -> LENGTH(x) > 0) AS toks
          FROM documents)
        SELECT win_start_ms, source, n_docs, total_tokens, total_chars, n_keep,
               CAST(n_keep AS DOUBLE) / n_docs AS keep_rate
        FROM (
          SELECT win_start_ms, source,
                 COUNT(*) AS n_docs,
                 CAST(SUM(LEN(toks)) AS BIGINT) AS total_tokens,
                 CAST(SUM(nc) AS BIGINT) AS total_chars,
                 CAST(SUM(CASE WHEN nc >= 20 AND LEN(toks) >= 5
                   AND CASE WHEN nc > 0 THEN CAST(alpha AS DOUBLE)/nc ELSE 0.0 END > 0.5
                   AND CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE)/nc ELSE 0.0 END < 0.3
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
          FROM q GROUP BY win_start_ms, source)""")),

    // ---- Within-document repetition (Gopher rep filters): duplicate-token
    // and duplicate-2-gram fractions, pure array built-ins.
    Q("t05_repetition",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id") +:
          TextAnalysis.repetitionSignals(col("text")): _*),
      Some("""
        WITH tk AS (
          SELECT doc_id,
                 LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
                             x -> LENGTH(x) > 0) AS toks
          FROM documents),
        g AS (
          SELECT doc_id, toks,
                 CASE WHEN LEN(toks) >= 2
                      THEN LIST_TRANSFORM(RANGE(1, LEN(toks)),
                             i -> toks[i] || ' ' || toks[i+1])
                      ELSE [] END AS grams
          FROM tk)
        SELECT doc_id,
               CAST(LEN(toks) AS BIGINT) AS n_tokens,
               CASE WHEN LEN(toks) > 0
                    THEN 1.0 - CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks)
                    ELSE 0.0 END AS dup_token_ratio,
               CASE WHEN LEN(grams) > 0
                    THEN 1.0 - CAST(LEN(LIST_DISTINCT(grams)) AS DOUBLE) / LEN(grams)
                    ELSE 0.0 END AS dup_2gram_ratio
        FROM g""")),

    // ---- Benchmark decontamination: distinct word-8-grams shared with a
    // benchmark set (doc_id%7=0 — deterministic at any SF). The near-dups
    // the corpus contains make the hit set non-trivial. Oracle: string-gram
    // list_intersect against the flattened benchmark gram set (hashed ≡ raw
    // gram equivalence as d05).
    Q("t06_decontaminate",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.decontaminate(
          d.filter(col("doc_id") % 7 =!= 0),
          d.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 8)
      },
      Some(decontaminateOracleSql)),

    // ---- Stateless/streaming decontamination (t27): third member of the
    // t06 contract family (identical oracle), the STREAM-INGEST shape:
    // the benchmark's distinct gram hashes ride as ONE sorted long[]
    // inside a codegen binary-search expression, so every corpus row
    // answers its own shared-gram count locally — no join, no shuffle, no
    // state; the operator runs unchanged on a readStream (StreamDedupSpec
    // proves streaming ≡ batch ≡ the t06 join path).
    Q("t27_decontaminate_stream",
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.streaming.StreamDecontaminate.decontaminateStream(
          d.filter(col("doc_id") % 7 =!= 0),
          d.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 8)
      },
      Some(decontaminateOracleSql)),

    // ---- Bloom-prefiltered decontamination (t22): same EXACT contract as
    // t06 (identical oracle — the bloom is a prefilter, never the answer),
    // different 100 TB shape: the benchmark grams fold into one 512 KB
    // bitset instead of an exact broadcast set, each corpus gram probes it
    // in codegen, and only bloom hits reach the exact confirm join. The
    // path that matters at scale: a GB-sized benchmark set stops being
    // broadcastable long before its bloom does. FP-heavy regimes (tiny m)
    // are pinned exact in DedupSpec; here m = 2^22 for the honest shape.
    Q("t22_decontaminate_bloom",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.decontaminateBloom(
          d.filter(col("doc_id") % 7 =!= 0),
          d.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 8)
      },
      Some(decontaminateOracleSql)),

    // ---- Span-level decontamination (t36): the surgical member of the
    // t06 family — benchmark-overlapping n-gram spans are EXCISED from
    // the corpus text instead of flagging whole documents. One
    // zero-exchange codegen kernel pass (the benchmark's sorted gram
    // hashes ride in the task binary, the t27 contract); same 8-gram
    // split as t06/t22/t27. Oracle: positioned 8-grams joined against
    // the benchmark gram set, covered positions excised, string_agg
    // reconstruction — the d14 shape with a cross-set gram table.
    Q("t36_decontaminate_spans",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.decontaminateSpans(
          d.filter(col("doc_id") % 7 =!= 0),
          d.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 8)
      },
      Some(decontaminateSpansOracle)),



    // ---- Boolean AND retrieval (t23): every doc containing ALL of a
    // query's terms, over an implicit inverted index — term-universe
    // IN-filter at the scan, broadcast literal query table, one (query,
    // doc) groupBy. Integer-exact. Query 6 carries a zero-df term
    // ("quantum"), so its AND result is EMPTY by construction — the
    // missing-term path is what the hash verifies there.
    Q("t23_boolean_search",
      (s, dir) => TextAnalysis.booleanSearch(
        t(s, dir, "documents"), "doc_id", "text", searchQueries),
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0))) AS t
          FROM documents),
        q(query_id, t) AS (VALUES $searchQueryValues),
        qn AS (SELECT query_id, COUNT(*) AS m FROM q GROUP BY query_id),
        hits AS (
          SELECT q.query_id, tok.doc_id, COUNT(*) AS n_terms
          FROM tok JOIN q USING (t)
          GROUP BY q.query_id, tok.doc_id)
        SELECT hits.query_id, hits.doc_id, hits.n_terms
        FROM hits JOIN qn USING (query_id)
        WHERE hits.n_terms = qn.m""")),

    // ---- BM25 top-k retrieval (t24): the standard lexical ranker over
    // the corpus for a literal query set, top-10 per query through the
    // bounded-heap TopKPerKey operator (never a full per-query sort). The
    // IDF table materializes driver-side (≤ |universe| values) and embeds
    // as literals in BOTH plans — ln never runs inside either engine's
    // distributed plan — and the per-query score folds contributions in
    // sorted term order, so every float op is order-fixed and the DOUBLE
    // scores hash-verify bit-for-bit (see bm25TopK's determinism
    // contract). oracleGen recomputes the same IDF doubles at verify time.
    Q("t24_bm25_topk",
      (s, dir) => TextAnalysis.bm25TopK(
        t(s, dir, "documents"), "doc_id", "text", searchQueries, k = 10),
      None,
      oracleGen = Some((s, dir) => {
        val universe = searchQueries.flatMap(_._2).distinct.sorted
        val (idf, _, _) = TextAnalysis.bm25Idf(
          t(s, dir, "documents"), "text", universe)
        // STRING-cast, not a bare decimal literal: DuckDB parses a decimal
        // literal as DECIMAL first and its DECIMAL→DOUBLE conversion
        // double-rounds (measured: CAST(0.18712348678936194 AS DOUBLE) is
        // 1 ulp off strtod of the same digits) — the string form parses
        // straight to the intended double
        def d(x: Double) = s"CAST('$x' AS DOUBLE)"
        val idfCase = universe.map(tm => s"WHEN '$tm' THEN ${d(idf(tm))}")
          .mkString("CASE t ", " ", s" ELSE ${d(0.0)} END")
        val inList = universe.map(tm => s"'$tm'").mkString(",")
        s"""
        WITH dls AS (
          SELECT doc_id, toks, len(toks) AS dl
          FROM (SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
                  x -> len(x) > 0) AS toks
                FROM documents)),
        stats AS (
          SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
          FROM dls),
        tf AS (
          SELECT doc_id, t, COUNT(*) AS tf, MAX(dl) AS dl
          FROM (SELECT doc_id, unnest(toks) AS t, dl FROM dls)
          WHERE t IN ($inList)
          GROUP BY doc_id, t),
        contrib AS (
          SELECT doc_id, t,
            ($idfCase) * (CAST(tf AS DOUBLE) * ${d(1.2 + 1.0)}) /
            (CAST(tf AS DOUBLE) + ${d(1.2)} * (${d(1.0)} - ${d(0.75)} +
              ${d(0.75)} * (CAST(dl AS DOUBLE) / stats.avgdl))) AS c
          FROM tf, stats),
        q(query_id, t) AS (VALUES $searchQueryValues),
        scored AS (
          SELECT query_id, doc_id,
            list_reduce(
              list_transform(list_sort(list(struct_pack(t := t, c := c))),
                x -> x.c),
              (a, x) -> a + x) AS score
          FROM contrib JOIN q USING (t)
          GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
          FROM scored)
        WHERE rank <= 10"""
      })),

    // ---- Positional phrase search (t25): docs where the phrase words
    // appear CONSECUTIVELY, with distinct-start-position counts — the
    // exact-boilerplate / benchmark-sentence detector. Phrase 2 repeats
    // its word ("table table") so the multi-offset vote path is what the
    // hash verifies; phrase 4 carries a zero-df word → empty. Spark
    // posexplode is 0-based and DuckDB positions are 1-based — both sides
    // only ever compare votes at aligned starts, so the base cancels.
    Q("t25_phrase_search",
      (s, dir) => TextAnalysis.phraseSearch(
        t(s, dir, "documents"), "doc_id", "text", searchPhrases),
      Some(s"""
        WITH dls AS (
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0) AS toks
          FROM documents),
        occ AS (
          SELECT doc_id, i AS pos, toks[i] AS t
          FROM dls, UNNEST(range(1, len(toks)+1)) AS r(i)
          WHERE toks[i] IN ($searchPhraseTermList)),
        q(phrase_id, t, off, m) AS (VALUES $searchPhraseValues),
        votes AS (
          SELECT q.phrase_id, occ.doc_id, occ.pos - q.off AS start, q.m,
                 COUNT(*) AS v
          FROM occ JOIN q USING (t)
          GROUP BY 1, 2, 3, 4)
        SELECT phrase_id, doc_id, COUNT(*) AS n_matches
        FROM votes WHERE v = m AND start >= 1
        GROUP BY phrase_id, doc_id""")),

    // ---- Kneser-Ney n-gram LM count table (t26): per trigram, its raw
    // count plus the continuation statistics of its bigram suffix
    // (distinct left contexts — the count KN backs off to). The integer
    // core of KenLM-style LM training, bounded by top-k (ties →
    // lexicographic ngram, a total order).
    Q("t26_ngram_lm_counts",
      (s, dir) => TextAnalysis.ngramLmCounts(
        t(s, dir, "documents"), "text", n = 3, k = 200),
      Some("""
        WITH dls AS (
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0) AS toks
          FROM documents),
        grams AS (
          SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS ngram,
                 toks[i] AS ctx,
                 toks[i+1] || ' ' || toks[i+2] AS suffix
          FROM dls, UNNEST(range(1, len(toks) - 1)) AS r(i)
          WHERE len(toks) >= 3),
        counts AS (
          SELECT ngram, suffix, COUNT(*) AS count FROM grams GROUP BY 1, 2),
        cont AS (
          SELECT suffix, COUNT(DISTINCT ctx) AS n_contexts
          FROM grams GROUP BY 1)
        SELECT ngram, count, suffix, n_contexts
        FROM counts JOIN cont USING (suffix)
        ORDER BY count DESC, ngram LIMIT 200""")),

    // ---- Corpus trigram LM quality score (the CCNet/KenLM shape reduced
    // to exact integers): char-trigram corpus model, then per-doc mean +
    // rare-fraction of each occurrence's corpus frequency — gibberish has
    // rare trigrams. Integer sums + one exact double division, so even the
    // model-dependent score hash-verifies.
    Q("t10_trigram_quality",
      (s, dir) => {
        val d = t(s, dir, "documents")
        TextAnalysis.trigramQuality(d, "doc_id", "text",
          TextAnalysis.trigramModel(d, "text"), rareMaxFreq = 5L)
      },
      Some("""
        WITH nrm AS (
          SELECT doc_id,
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS t
          FROM documents),
        tg AS (
          SELECT doc_id,
            unnest(list_transform(range(1, length(t) - 1),
              i -> substring(t, CAST(i AS INT), 3))) AS trigram
          FROM nrm WHERE length(t) >= 3),
        model AS (SELECT trigram, COUNT(*) AS freq FROM tg GROUP BY trigram),
        sc AS (
          SELECT tg.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_trigrams,
            CAST(SUM(COALESCE(model.freq, 0)) AS BIGINT) AS freq_sum,
            CAST(SUM(CASE WHEN COALESCE(model.freq, 0) <= 5 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rare
          FROM tg LEFT JOIN model USING (trigram) GROUP BY tg.doc_id)
        SELECT d.doc_id,
          COALESCE(sc.n_trigrams, 0) AS n_trigrams,
          COALESCE(sc.freq_sum, 0) AS freq_sum,
          COALESCE(sc.n_rare, 0) AS n_rare,
          CAST(sc.freq_sum AS DOUBLE) / sc.n_trigrams AS avg_freq,
          CAST(COALESCE(sc.n_rare, 0) AS DOUBLE)
            / GREATEST(COALESCE(sc.n_trigrams, 0), 1) AS rare_ratio
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""")),

    // ---- Per-language trigram quality (t15): each doc scores against
    // ITS OWN language's model — the CCNet per-language discipline (a zh
    // doc against the en model reads as gibberish). Same integer-exact
    // contract as t10, model keyed by lang.
    Q("t15_trigram_quality_lang",
      (s, dir) => {
        val d = t(s, dir, "documents")
        TextAnalysis.trigramQualityPerKey(d, "doc_id", "text", "lang",
          TextAnalysis.trigramModelPerKey(d, "text", "lang"), rareMaxFreq = 5L)
      },
      Some("""
        WITH nrm AS (
          SELECT doc_id, lang,
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS t
          FROM documents),
        tg AS (
          SELECT doc_id, lang,
            unnest(list_transform(range(1, length(t) - 1),
              i -> substring(t, CAST(i AS INT), 3))) AS trigram
          FROM nrm WHERE length(t) >= 3),
        model AS (
          SELECT lang, trigram, COUNT(*) AS freq FROM tg GROUP BY lang, trigram),
        sc AS (
          SELECT tg.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_trigrams,
            CAST(SUM(COALESCE(model.freq, 0)) AS BIGINT) AS freq_sum,
            CAST(SUM(CASE WHEN COALESCE(model.freq, 0) <= 5 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rare
          FROM tg LEFT JOIN model USING (lang, trigram) GROUP BY tg.doc_id)
        SELECT d.doc_id, d.lang AS model_key,
          COALESCE(sc.n_trigrams, 0) AS n_trigrams,
          COALESCE(sc.freq_sum, 0) AS freq_sum,
          COALESCE(sc.n_rare, 0) AS n_rare,
          CAST(sc.freq_sum AS DOUBLE) / sc.n_trigrams AS avg_freq,
          CAST(COALESCE(sc.n_rare, 0) AS DOUBLE)
            / GREATEST(COALESCE(sc.n_trigrams, 0), 1) AS rare_ratio
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""")),

    // ---- Readability scoring (Flesch family): sentence/word/vowel-group
    // counts → the classic linear formulas; every float step is one
    // correctly-rounded IEEE op on exact integer ratios.
    Q("t11_readability",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id") +:
          TextAnalysis.readabilitySignals(col("text")): _*),
      Some("""
        WITH tk AS (
          SELECT doc_id, text,
            list_filter(string_split(
              trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
              x -> len(x) > 0) AS toks
          FROM documents),
        c AS (
          SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_words,
            CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
              AS n_sentences,
            CAST(COALESCE(list_sum(list_transform(toks,
              t -> GREATEST(len(regexp_extract_all(t, '[aeiouy]+')), 1))), 0)
              AS BIGINT) AS n_syllables
          FROM tk)
        SELECT doc_id, n_words, n_sentences, n_syllables,
          206.835::DOUBLE - 1.015::DOUBLE *
            (CAST(n_words AS DOUBLE) / n_sentences) - 84.6::DOUBLE *
            (CAST(n_syllables AS DOUBLE) / GREATEST(n_words, 1))
            AS flesch_reading_ease,
          0.39::DOUBLE * (CAST(n_words AS DOUBLE) / n_sentences)
            + 11.8::DOUBLE * (CAST(n_syllables AS DOUBLE) / GREATEST(n_words, 1))
            - 15.59::DOUBLE AS fk_grade_level
        FROM c""")),

    // ---- Overlapping fixed-token chunking (t12, the RAG/embedding-prep
    // shape): chunk i covers tokens [i·stride, i·stride+32), stride 24.
    // Both engines slice the SAME materialized token array, so chunk text
    // and counts hash-verify exactly.
    Q("t12_chunk_text",
      (s, dir) => TextAnalysis.chunkText(
        t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, overlap = 8),
      Some("""
        WITH tk AS (
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0) AS toks
          FROM documents),
        c AS (
          SELECT doc_id, toks,
            CASE WHEN len(toks) = 0 THEN 0
                 ELSE 1 + (GREATEST(len(toks) - 32, 0) + 23) // 24 END AS nch
          FROM tk),
        ch AS (
          SELECT doc_id, toks, CAST(u.i AS BIGINT) AS chunk_idx
          FROM c, UNNEST(range(0, nch)) u(i))
        SELECT doc_id, chunk_idx,
          array_to_string(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ')
            AS chunk_text,
          CAST(len(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS BIGINT)
            AS chunk_tokens
        FROM ch""")),

    // ---- Per-doc distinctive terms (t13): TF-IDF with UNLOGGED inverse
    // document frequency (tf·N/df — ln() is not correctly-rounded and
    // differs across engines; the log-free variant keeps the score one
    // exact integer product + one IEEE division, hash-verifiable).
    Q("t13_tfidf_topk",
      (s, dir) => TextAnalysis.tfidfTopTerms(
        t(s, dir, "documents"), "doc_id", "text", k = 3),
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0)) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, term),
        dfq AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM documents),
        sc AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                 CAST(tf.tf AS DOUBLE) * n.n_docs / dfq.df AS tfidf
          FROM tf JOIN dfq USING (term), n)
        SELECT doc_id, term, tf, df, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term ASC) AS INT) AS rank
        FROM sc QUALIFY rank <= 3""")),

    // ---- Stratified deterministic sample: per-language keep rates (the
    // corpus-mixing shape: downsample the over-represented language, keep
    // the tail whole), still a pure function of the id.
    Q("u02_stratified_sample",
      (s, dir) => graft.operators.Sampling.stratifiedSample(
          t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 200, "es" -> 500, "zh" -> 800), defaultPermille = 1000)
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""
        WITH b AS (
          SELECT doc_id, lang, source,
            ((((doc_id % 1000000) + 1000000) % 1000000) * 2654435761) % 1000 AS bk
          FROM documents)
        SELECT doc_id, lang, source FROM b
        WHERE bk < CASE lang WHEN 'en' THEN 200 WHEN 'es' THEN 500
                             WHEN 'zh' THEN 800 ELSE 1000 END""")),

    // ---- Deterministic train/val/test split: hash-mod assignment, a pure
    // function of the id — identical rows land in identical splits on 500
    // rows or 100 TB, re-runs and re-ingests agree (rand() cannot).
    Q("u01_hash_split",
      (s, dir) => graft.operators.Sampling.hashSplit(
          t(s, dir, "documents"), "doc_id",
          trainPermille = 900, valPermille = 50)
        .select(col("doc_id"), col("split")),
      // bucket formula mirrors Sampling.permilleBucket exactly: mod 10^6
      // BEFORE the multiply, so neither engine can overflow and the twin
      // holds at any id scale (pmod twin: ((x%m)+m)%m for negative ids)
      Some(s"""
        WITH b AS (
          SELECT doc_id, $permilleBucketSql AS bk
          FROM documents)
        SELECT doc_id, $splitCaseSql AS split
        FROM b""")),

    // ---- Audio-clip exact dedup (m06): real WAV PCM decode -> one
    // aggregate on (frame count, additive + position-weighted decoded
    // sample checksums — the weighted one is ORDER-sensitive) — the audio
    // sibling of m04's frame dedup; the oracle predicts both checksums
    // from the text alone.
    Q("m06_audio_dedup",
      // same document-side kind pre-filter as m05 (pmod 3 == 1 = audio)
      (s, dir) => Multimodal.audioDedup(
        Multimodal.syntheticMedia(
          t(s, dir, "documents").filter(pmod(col("doc_id"), lit(3)) === 1))),
      Some(s"""
        WITH $mediaDecodeOracle
        SELECT n_frames, content_sum AS pcm_sum, content_wsum AS pcm_wsum,
               CAST(COUNT(*) AS BIGINT) AS n_clips,
               MIN(media_id) AS rep_media_id
        FROM decoded WHERE kind = 'audio'
        GROUP BY 1, 2, 3""")),

    // ---- Perceptual image hash (m07): aHash over the real decoded
    // pixels — 8x8 block grid, integer cross-multiplied mean bits, the
    // standard perceptual first-pass for image dedup. The 64-bit hash is
    // predicted by the oracle from the text alone (exact integer math on
    // both sides), so a fake or partial decode cannot match.
    Q("m07_image_phash",
      (s, dir) => Multimodal.imagePHash(
        Multimodal.syntheticMedia(
          t(s, dir, "documents").filter(pmod(col("doc_id"), lit(3)) === 0))),
      Some(imagePHashOracle)),

    // ---- Cross-modal caption<->image consistency gate (m08, VERDICT
    // r11 directive 7): the standard multimodal-pretraining filter — a
    // text-side caption score (the t33 hashed-gram NB kernel, one
    // zero-exchange scan) against a REAL decoded-content statistic of
    // the SAME document's image twin (mean channel brightness from the
    // exact decoded pixel sum), joined on ONE doc_id equi-join. The
    // affinity squash is algebraic (no transcendentals: s -> 0.5 +
    // 0.5*s/(1+|s|)), so every double is one IEEE op from exact
    // integers on both engines. The oracle predicts BOTH sides from
    // the text alone (gram chain + the cyclic-fill closed form), so a
    // fake decode, a drifted classifier, or a mis-joined pair cannot
    // hash-match.
    Q("m08_caption_consistency",
      (s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val imgDocs = t(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(3)) === 0)
        val textSide = imgDocs.select(col("doc_id"),
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(coalesce(col("text"), lit(""))),
            w, bias, maxN = 2).as("caption_score"))
        val mediaSide = Multimodal.decodeMeta(
            Multimodal.syntheticMedia(imgDocs))
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("content_sum"))
        val brightness = col("content_sum").cast("double") /
          (lit(3) * col("width") * col("height")).cast("double") / lit(255.0)
        val affinity = lit(0.5) + lit(0.5) * col("caption_score") /
          (lit(1.0) + abs(col("caption_score")))
        textSide.join(mediaSide, Seq("doc_id"))
          .select(col("doc_id"), col("width"), col("height"),
            col("caption_score"), brightness.as("brightness"),
            affinity.as("caption_affinity"),
            abs(affinity - brightness).as("gap"),
            (abs(affinity - brightness) <= lit(0.35)).as("consistent"))
      },
      None,
      oracleGen = Some((s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val b = s"CAST('$bias' AS DOUBLE)"
        val aff = "(0.5::DOUBLE + 0.5::DOUBLE * c.caption_score" +
          " / (1.0::DOUBLE + abs(c.caption_score)))"
        s"""
        WITH ${mediaDecodeOracle},
        ${hashedGramScoreCtesMulti(Seq(("_cap", w.toIndexedSeq, b)), 1024)},
        cap AS (
          SELECT d.doc_id, COALESCE(f.sc, $b) AS caption_score
          FROM documents d LEFT JOIN folded_cap f ON f.doc_id = d.doc_id
          WHERE d.doc_id % 3 = 0),
        img AS (
          SELECT media_id AS doc_id, width, height,
            CAST(content_sum AS DOUBLE)
              / CAST(3*width*height AS DOUBLE) / 255.0::DOUBLE AS brightness
          FROM decoded WHERE kind = 'image')
        SELECT c.doc_id, i.width, i.height, c.caption_score, i.brightness,
          $aff AS caption_affinity,
          abs($aff - i.brightness) AS gap,
          abs($aff - i.brightness) <= 0.35::DOUBLE AS consistent
        FROM cap c JOIN img i USING (doc_id)"""
      })),

    // ---- Real image resize (m05): decode -> integer nearest-neighbor
    // resample -> re-encode PNG -> independent re-decode + checksum. The
    // oracle predicts the RESIZED pixel checksum from the text alone
    // (closed form per source pixel), so a metadata-only resize cannot
    // hash-match.
    Q("m05_image_resize",
      // kind pre-filter on the DOCUMENT side (pmod 3 == 0 IS the image
      // assignment): an encode mapPartitions is opaque to filter
      // pushdown, so filtering after syntheticMedia would still encode
      // every audio clip and video container just to discard them
      (s, dir) => Multimodal.resizeImages(
        Multimodal.syntheticMedia(
          t(s, dir, "documents").filter(pmod(col("doc_id"), lit(3)) === 0)),
        maxEdge = 64),
      Some(imageResizeOracle(maxEdge = 64))),

    // ---- Contamination-aware split (u10): the production guard rail
    // composed end to end — hash-split the corpus (u01's bit-exact bucket
    // formula), then QUARANTINE any train-bound doc sharing an 8-gram
    // with the benchmark set (t06's decontamination). val/test keep their
    // split (eval-side contamination is reported, not rerouted). One
    // doc_id equi-join beyond the two component plans.
    Q("u10_decontaminated_split",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val corpus = d.filter(col("doc_id") % 7 =!= 0)
        val deco = Dedup.decontaminate(corpus,
          d.filter(col("doc_id") % 7 === 0), "doc_id", "text", n = 8)
        graft.operators.Sampling.hashSplit(corpus, "doc_id",
            trainPermille = 900, valPermille = 50)
          .select(col("doc_id"), col("split"))
          .join(deco, Seq("doc_id"))
          .select(col("doc_id"),
            when(col("contaminated") && col("split") === "train",
              lit("quarantine")).otherwise(col("split")).as("split"),
            col("shared_grams"), col("contaminated"))
      },
      Some(s"""
        WITH deco AS ($decontaminateOracleSql),
        b AS (
          SELECT doc_id, $permilleBucketSql AS bk
          FROM documents WHERE doc_id % 7 <> 0),
        sp AS (
          SELECT doc_id, bk, $splitCaseSql AS base_split FROM b)
        SELECT d.doc_id,
          CASE WHEN d.contaminated AND sp.base_split = 'train'
               THEN 'quarantine' ELSE sp.base_split END AS split,
          d.shared_grams, d.contaminated
        FROM deco d JOIN sp USING (doc_id)""")),

    // ---- Multimodal: REAL decode over really-encoded payloads — PNG via
    // javax.imageio, WAV via javax.sound, GVID (PNG frames) for video. The
    // oracle predicts geometry + the decoded-content checksum from the
    // TEXT alone (see mediaDecodeOracle) and inlines only the compressed
    // container sizes, so a header-only or lossy decode cannot hash-match.
    Q("m01_media_decode",
      (s, dir) => Multimodal.decodeMeta(
        Multimodal.syntheticMedia(t(s, dir, "documents"))),
      None,
      oracleGen = Some((s, dir) => s"""
        WITH ${mediaDecodeOracle},
        nb AS (
          SELECT * FROM (VALUES ${mediaBytesValues(s, dir)}) v(media_id, n_bytes))
        SELECT d.media_id, d.kind, CAST(nb.n_bytes AS BIGINT) AS n_bytes,
               d.width, d.height, d.n_frames, d.format, d.content_sum
        FROM decoded d JOIN nb ON nb.media_id = d.media_id""")),

    // ---- Multimodal: frame sampling (row explosion per sampled frame) —
    // audio frame counts now come from the REAL WAV header parse; the
    // oracle's fold-derived n_frames only matches if the container
    // round-trips them.
    Q("m02_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.decodeMeta(Multimodal.syntheticMedia(t(s, dir, "documents"))),
        everyNth = 30),
      Some(s"""
        WITH ${mediaDecodeOracle}
        SELECT media_id, kind, n_frames,
               CAST(f // 30 AS INT) AS sample_idx,
               CAST(f AS INT) AS frame_idx
        FROM decoded, UNNEST(range(0, CAST(n_frames AS BIGINT), 30)) AS u(f)
        WHERE n_frames IS NOT NULL""")),

    // ---- Multimodal: feature extraction + resize stages over the REAL
    // decoded content (image/audio features = decoded-pixel/PCM
    // statistics; values not SQL-expressible — the surfaced shape (dim)
    // and the resize arithmetic are oracled). maxEdge 96 < the 192-px
    // image encoder cap, so downscaling genuinely triggers on image rows
    // (video frames cap at 64x36 and pass through).
    Q("m03_media_features",
      (s, dir) => {
        // same cut as p03: two consumers of the real-codec encode pass
        val media = Multimodal.syntheticMedia(t(s, dir, "documents"))
          .transform(graft.core.Checkpoint.cut)
        val feats = Multimodal.extractFeatures(media, dim = 16)
        val resized = Multimodal.resizeMeta(Multimodal.decodeMeta(media), maxEdge = 96)
        resized.join(feats, Seq("media_id"))
          .select(col("media_id"), col("kind"), col("out_width"), col("out_height"),
            size(col("feature")).as("feat_dim"))
      },
      Some(s"""
        WITH ${mediaDecodeOracle},
        resized AS (
          SELECT media_id, kind, width, height,
            CASE WHEN greatest(width, height) > 96
                 THEN 96.0 / greatest(width, height) ELSE 1.0 END AS scale
          FROM decoded)
        SELECT media_id, kind,
               CAST(trunc(width * scale) AS INT) AS out_width,
               CAST(trunc(height * scale) AS INT) AS out_height,
               16 AS feat_dim
        FROM resized""")),

    // ---- PII detect + redact (the pre-training privacy pass). The corpus
    // text is digit-free word soup, so the query enriches it with
    // DETERMINISTIC synthetic PII derived from doc_id (the synthetic-media
    // trick): the regex engines then face real addresses/IPs/phones, and
    // counts + redacted spans hash-verify exactly — the patterns live in
    // the Java∩RE2 subset (no backrefs/lookaround), so both engines agree.
    Q("t07_pii_redact",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val enriched = d.withColumn("text2", concat(col("text"),
          when(col("doc_id") % 2 === 0, concat(lit(" reach me at user"),
            col("doc_id").cast("string"), lit("@mail.example.org")))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0, concat(lit(" from 10."),
            (col("doc_id") % 256).cast("string"), lit(".0."),
            (col("doc_id") % 97).cast("string"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, concat(lit(" call +1 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
        enriched.select(
          (col("doc_id") +: TextAnalysis.piiSignals(col("text2")) :+
            TextAnalysis.redactPii(col("text2")).as("redacted")): _*)
      },
      Some {
        val Seq(em, ip, ph) = TextAnalysis.piiPatterns.map(_._2)
        s"""
        WITH e AS (
          SELECT doc_id,
            text
            || CASE WHEN doc_id % 2 = 0 THEN ' reach me at user'
                 || CAST(doc_id AS VARCHAR) || '@mail.example.org' ELSE '' END
            || CASE WHEN doc_id % 3 = 0 THEN ' from 10.'
                 || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                 || CAST(doc_id % 97 AS VARCHAR) ELSE '' END
            || CASE WHEN doc_id % 5 = 0 THEN ' call +1 555-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
            AS text2
          FROM documents),
        r AS (
          SELECT doc_id, text2,
            regexp_replace(text2, '$em', '<EMAIL>', 'g') AS t1,
            regexp_replace(regexp_replace(text2,
              '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g') AS t2
          FROM e)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text2, '$em')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(t1, '$ip')) AS BIGINT) AS n_ipv4,
          CAST(len(regexp_extract_all(t2, '$ph')) AS BIGINT) AS n_phone,
          (len(regexp_extract_all(text2, '$em')) > 0
            OR len(regexp_extract_all(t1, '$ip')) > 0
            OR len(regexp_extract_all(t2, '$ph')) > 0) AS has_pii,
          regexp_replace(t2, '$ph', '<PHONE>', 'g') AS redacted
        FROM r"""
      }),

    // ---- Blocklist (bad-words) filter, C4-style: token-level hit count,
    // fraction, and keep flag against a literal list.
    Q("t09_blocklist_filter",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select((col("doc_id") +: TextAnalysis.blocklistSignals(
          col("text"), Seq("dup", "spam", "error"), maxRatio = 0.05)): _*)
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0) AS toks
          FROM documents)
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(toks,
            t -> list_contains(['dup', 'spam', 'error'], t))) AS BIGINT)
            AS n_flagged,
          CASE WHEN len(toks) > 0
               THEN CAST(len(list_filter(toks,
                 t -> list_contains(['dup', 'spam', 'error'], t))) AS DOUBLE)
                 / len(toks)
               ELSE 0.0 END AS flagged_ratio,
          (CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks,
                  t -> list_contains(['dup', 'spam', 'error'], t))) AS DOUBLE)
                  / len(toks)
                ELSE 0.0 END) <= 0.05 AS blocklist_keep
        FROM tok""")),

    // ---- BPE pair statistics (t14): top-k adjacent char pairs weighted by
    // word frequency — the first tokenizer-training merge iteration. The
    // pair explode runs over the VOCABULARY, not the corpus.
    Q("t14_bpe_pairs",
      (s, dir) => TextAnalysis.bpePairStats(
        t(s, dir, "documents"), "text", k = 20),
      Some("""
        WITH w AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
          FROM (SELECT unnest(list_filter(string_split(
                  trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
                  x -> len(x) > 0)) AS word
                FROM documents)
          GROUP BY word),
        p AS (
          SELECT substring(word, CAST(i AS INT), 2) AS pair, wc
          FROM w, UNNEST(range(1, length(word))) u(i))
        SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count
        FROM p GROUP BY pair
        ORDER BY pair_count DESC, pair LIMIT 20""")),

    // ---- Full BPE tokenizer training (t16): 20 merge rounds over the
    // word-frequency table (corpus read ONCE; every round is vocab-sized).
    // Oracle: GENERATED — an independent single-node Scala replay of the
    // same deterministic algorithm, inlined as literal VALUES (the s03
    // trained-state pattern), so the distributed trainer's entire merge
    // sequence is hash-checked.
    Q("t16_bpe_train",
      (s, dir) => TextAnalysis.bpeTrain(
        t(s, dir, "documents"), "text", numMerges = 20),
      None,
      oracleGen = Some((s, dir) => bpeOracle(s, dir, numMerges = 20))),

    // ---- BPE corpus encoding (t17): apply t16's learned merges and
    // report per-doc token/subword budgets. The query encodes with the
    // DISTRIBUTED trainer's merges (memoized per JVM); the oracle's
    // word → subword map comes from the INDEPENDENT single-node replay —
    // so train and encode cross-check each other end to end.
    Q("t17_bpe_encode",
      (s, dir) => TextAnalysis.bpeEncode(
        t(s, dir, "documents"), "doc_id", "text",
        bpeTrainedMerges(s, dir, numMerges = 20)),
      None,
      oracleGen = Some((s, dir) => bpeEncodeOracle(s, dir, numMerges = 20))),

    // ---- Unigram-LM (SentencePiece-family) tokenizer training (t38):
    // the OTHER production tokenizer family beside BPE — Kudo 2018's
    // seed-then-prune with hard Viterbi-EM, corpus read ONCE into the
    // (word, freq) table, every later job dictionary-sized. Oracle:
    // GENERATED — an independent single-node replay of the same
    // deterministic sequence (the t16 pattern), so the full seed → EM →
    // prune trajectory hash-checks, logp doubles included.
    Q("t38_unigram_train",
      (s, dir) => {
        val (vs, ml, cap, em) = ulmParams
        TextAnalysis.unigramLmTrain(t(s, dir, "documents"), "text",
          vs, ml, cap, em)
      },
      None,
      oracleGen = Some((s, dir) => ulmOracle(s, dir))),

    // ---- Unigram-LM corpus encoding (t39): Viterbi-segment every doc
    // with t38's learned vocab and report per-doc token/piece budgets.
    // The query encodes with the DISTRIBUTED trainer's vocab; the
    // oracle's word → piece-count map comes from the INDEPENDENT replay —
    // train and encode cross-check each other end to end (t17 pattern).
    Q("t39_unigram_encode",
      (s, dir) => TextAnalysis.unigramLmEncode(
        t(s, dir, "documents"), "doc_id", "text", ulmTrainedVocab(s, dir)),
      None,
      oracleGen = Some((s, dir) => ulmEncodeOracle(s, dir))),

    // ---- Unigram-LM perplexity scoring (t40): the metric CCNet actually
    // filters on, under t38's trained piece LM — per-doc NLL (sorted-fold
    // deterministic, the t28 discipline) and per-piece average. The
    // query scores with the DISTRIBUTED vocab; the oracle inlines the
    // INDEPENDENT replay's per-word (pieces, nll) literals — a third
    // end-to-end cross-check of the trainer twins.
    Q("t40_unigram_ppl",
      (s, dir) => TextAnalysis.unigramLmScore(
        t(s, dir, "documents"), "doc_id", "text", ulmTrainedVocab(s, dir)),
      None,
      oracleGen = Some((s, dir) => ulmPplOracle(s, dir))),

    // ---- Corpus vocabulary: top-k tokens by total frequency with document
    // frequency — partial agg map-side, TakeOrderedAndProject merge (no
    // global sort at any corpus size); ties break lexicographically.
    Q("t08_vocab_topk",
      (s, dir) => TextAnalysis.topTokens(
        t(s, dir, "documents"), "doc_id", "text", k = 15),
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0)) AS token
          FROM documents)
        SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
        FROM tok GROUP BY token
        ORDER BY freq DESC, token LIMIT 15""")),

    // ---- KMV distinct-token sketch per source (t20): the bounded-memory
    // cardinality estimator — k smallest distinct token hashes per source,
    // (k-1)/u_k estimate. The oracle replays the full XXH64 chain in
    // HUGEINT mod-2^64 SQL and the same IEEE double normalization, so the
    // sketch (and its estimate) hash-verify bit-for-bit.
    // k=16 < the ~31 distinct tokens per source in the synthetic corpus,
    // so the ESTIMATE branch (not just the exact-below-k path) is what the
    // hash verifies
    Q("t20_kmv_distinct",
      (s, dir) => TextAnalysis.kmvDistinctTokens(
        t(s, dir, "documents"), "source", "text", k = 16),
      Some(kmvOracle(k = 16))),

    // ---- Rolling distinct-token cardinality (t21): the streaming KMV twin
    // on the t18 time grid — per (hour window, source) vocabulary inflow,
    // via the mergeable KmvSketch AGGREGATOR (the streaming-state form;
    // StreamingSpec proves streaming ≡ batch ≡ the t20 bounded-heap path).
    // doc_id < 180 = three full hour windows: the oracle's XXH64 chain runs
    // per distinct (window, source, token) — the subset keeps it at the
    // proven d04-chain scale (the full-corpus twin runs but sits near
    // DuckDB's memory ceiling under load; the OPERATOR is corpus-size-free)
    Q("t21_rolling_distinct",
      (s, dir) => graft.streaming.TextPipeline.rollingDistinctTokens(
          t(s, dir, "documents").filter(col("doc_id") < 180)
            .withColumn("ts",
              timestamp_millis(lit(1704067200000L) + col("doc_id") * 60000L)),
          "ts", "source", "text", "1 hour", k = 8)
        .select(unix_millis(col("window_start")).as("win_start_ms"),
          col("source"), col("n_sketch"), col("kth_hash"),
          col("est_distinct")),
      Some(kmvWindowedOracle(k = 8))),

    // ---- Token frequency-of-frequency spectrum (t19): the Zipf/Good-
    // Turing corpus profile — n distinct tokens per exact frequency f and
    // the token mass each bin carries. Integer-exact; the second exchange
    // is one row per DISTINCT frequency (negligible at any scale).
    Q("t19_freq_spectrum",
      (s, dir) => TextAnalysis.freqSpectrum(t(s, dir, "documents"), "text"),
      Some("""
        WITH tok AS (
          SELECT unnest(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0)) AS token
          FROM documents),
        tf AS (
          SELECT token, COUNT(*) AS f FROM tok GROUP BY token)
        SELECT f, COUNT(*) AS n_tokens, f * COUNT(*) AS mass
        FROM tf GROUP BY f""")),

    // ---- Segment-level cross-corpus dedup (CCNet shape): 3-word segments,
    // drop those appearing in >1 document, reassemble survivors in order.
    // The frequent-segment set is the SMALL join side by construction →
    // broadcast anti-join at any scale.
    Q("d09_segment_dedup",
      (s, dir) => graft.operators.Dedup.segmentDedup(
        t(s, dir, "documents"), "doc_id", "text",
        segWords = 3, maxDocFreq = 1),
      Some("""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0) AS tk
          FROM documents),
        base AS (
          SELECT doc_id, CASE WHEN len(tk) > 0
            THEN list_transform(range(1, len(tk)+1, 3),
                   i -> {'idx': i, 'seg': array_to_string(tk[i:i+2], ' ')})
            ELSE [] END AS segs
          FROM toks),
        flat0 AS (SELECT doc_id, unnest(segs) AS s FROM base),
        flat AS (SELECT doc_id, s.idx AS idx, s.seg AS seg FROM flat0),
        freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM flat GROUP BY seg),
        kept AS (SELECT flat.* FROM flat JOIN freq USING (seg) WHERE freq.df <= 1),
        reb AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS clean_text,
                       COUNT(*) AS segs_kept
                FROM kept GROUP BY doc_id)
        SELECT b.doc_id, COALESCE(r.clean_text, '') AS clean_text,
               COALESCE(r.segs_kept, 0) AS segs_kept,
               CAST(len(b.segs) AS BIGINT) AS segs_total
        FROM base b LEFT JOIN reb r USING (doc_id)""")),

    // ---- Priority sampling (Duffield/Lund/Thorup): deterministic
    // weight-sensitive top-k — priority = weight / hash-uniform(id); every
    // arithmetic step is one correctly-rounded IEEE op, so the sample
    // hash-verifies exactly.
    Q("u03_priority_sample",
      (s, dir) => graft.operators.Sampling.prioritySample(
          t(s, dir, "documents"), "doc_id", "n_chars", k = 100)
        .select(col("doc_id"), col("n_chars"), col("priority")),
      Some("""
        WITH b AS (
          SELECT doc_id, n_chars,
            CAST(n_chars AS DOUBLE) /
              (CAST(((((doc_id % 1000000) + 1000000) % 1000000)
                 * 2654435761) % 1000000 + 1 AS DOUBLE) / 1000000.0)
              AS priority
          FROM documents)
        SELECT doc_id, n_chars, priority
        FROM b ORDER BY priority DESC, doc_id LIMIT 100""")),

    // ---- Per-stratum priority sample (u06): k weighted winners per
    // language, via the custom bounded-heap TopKPerKeyExec (no per-stratum
    // full sort).
    Q("u06_stratified_priority_sample",
      (s, dir) => graft.operators.Sampling.stratifiedPrioritySample(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id", "n_chars", "lang", kPerStratum = 30),
      Some("""
        WITH b AS (
          SELECT doc_id, lang, n_chars,
            CAST(n_chars AS DOUBLE) /
              (CAST(((((doc_id % 1000000) + 1000000) % 1000000)
                 * 2654435761) % 1000000 + 1 AS DOUBLE) / 1000000.0)
              AS priority
          FROM documents)
        SELECT doc_id, lang, n_chars, priority,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY priority DESC, doc_id) AS INT) AS rank
        FROM b QUALIFY rank <= 30""")),

    // ---- Temperature (T=2) domain rebalancing: per-language quota ∝
    // √count — flatten the head, keep the tail (the multilingual-mixture
    // shape) — then each stratum's quota deterministic hash-priority
    // winners. The one cross-stratum float reduction (Σ√n) folds over
    // SORTED weights so both engines sum in the same order.
    Q("u07_temperature_rebalance",
      (s, dir) => graft.operators.Sampling.temperatureRebalance(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", "lang", budget = 200L)
        .select(col("doc_id"), col("lang"), col("rank"),
          col("quota"), col("n_docs")),
      Some("""
        WITH c AS (
          SELECT lang, COUNT(*) AS n_docs,
            sqrt(CAST(COUNT(*) AS DOUBLE)) AS w
          FROM documents GROUP BY lang),
        tot AS (
          SELECT list_reduce(list_sort(list(w)), (a, b) -> a + b) AS wtot
          FROM c),
        plan AS (
          SELECT lang, n_docs,
            CAST(floor(200.0::DOUBLE * w / wtot) AS BIGINT) AS quota
          FROM c, tot),
        pri AS (
          SELECT doc_id, lang,
            CAST(((((doc_id % 1000000) + 1000000) % 1000000)
              * 2654435761) % 1000000 + 1 AS DOUBLE) / 1000000.0 AS u
          FROM documents),
        r AS (
          SELECT doc_id, lang,
            CAST(ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY u, doc_id) AS INT) AS rank
          FROM pri)
        SELECT r.doc_id, r.lang, r.rank, plan.quota, plan.n_docs
        FROM r JOIN plan USING (lang) WHERE r.rank <= plan.quota""")),

    // ---- Token-budget data selection (u08): per source, best docs by
    // (alpha_ratio DESC, id) until the cumulative token count would
    // exceed the budget — the greedy selection pass of a pretraining
    // mix. Integer token sums + exact-IEEE quality ratio keep it
    // hash-verifiable.
    Q("u08_token_budget_select",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(
          col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_toks"),
          when(length(col("text")) > 0,
            length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
              .cast("double") / length(col("text")))
            .otherwise(lit(0.0)).as("alpha_ratio"))
        graft.operators.Sampling.budgetSelect(
          docs, "doc_id", "source", "alpha_ratio", "n_toks",
          budgetTokens = 1500L)
      },
      Some("""
        WITH q AS (
          SELECT doc_id, source,
            CAST(len(list_filter(string_split(
                trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')),
                ' '), x -> len(x) > 0)) AS BIGINT) AS n_toks,
            CASE WHEN length(text) > 0
                 THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        AS DOUBLE) / length(text)
                 ELSE 0.0 END AS alpha_ratio
          FROM documents),
        r AS (
          SELECT doc_id, source, n_toks, alpha_ratio,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY alpha_ratio DESC, doc_id) AS BIGINT) AS rank,
            CAST(SUM(n_toks) OVER (PARTITION BY source
              ORDER BY alpha_ratio DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
          FROM q)
        SELECT doc_id, source, n_toks, alpha_ratio, rank, cum_tokens
        FROM r WHERE cum_tokens <= 1500""")),

    // ---- Domain-mixture selection (u09): hit literal target shares per
    // source under a 200-doc budget — quota = floor(budget × share), the
    // quota lowest (knuth-hash, id) rows win; sources outside the target
    // map get nothing, under-populated sources contribute what they have.
    // Quotas are computed ONCE in Scala and inlined as integer literals in
    // both plans.
    Q("u09_domain_mix", {
      val targets = Map("src0" -> 0.25, "src1" -> 0.25, "src2" -> 0.2,
        "src3" -> 0.2, "src4" -> 0.1)
      (s, dir) => graft.operators.Sampling.domainMix(
          t(s, dir, "documents"), "doc_id", "source", targets, budget = 200L)
        .select(col("doc_id"), col("source"), col("mix_rank"))
    },
      Some {
        val targets = Seq("src0" -> 0.25, "src1" -> 0.25, "src2" -> 0.2,
          "src3" -> 0.2, "src4" -> 0.1)
        val cases = targets.map { case (k, sh) =>
          s"WHEN '$k' THEN ${(200L * sh).toLong}"
        }.mkString(" ")
        s"""
        WITH r AS (
          SELECT doc_id, source,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY ((((doc_id % 1000000) + 1000000) % 1000000)
                        * 2654435761) % 1000000, doc_id) AS BIGINT) AS mix_rank
          FROM documents)
        SELECT doc_id, source, mix_rank FROM r
        WHERE mix_rank <= CASE source $cases ELSE 0 END"""
      }),

    // ---- Deterministic corpus shuffle (u05): the pretraining epoch
    // permutation as a pure function of the id — rank under (knuth-hash,
    // id) order, numbered by per-partition offsets (no global window).
    Q("u05_corpus_shuffle",
      (s, dir) => graft.operators.Sampling.shuffleDeterministic(
          t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("shuffle_pos")),
      Some("""
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY
                 ((((doc_id % 1000000) + 1000000) % 1000000) * 2654435761)
                   % 1000000, doc_id) - 1 AS shuffle_pos
        FROM documents""")),

    // ---- Concat-then-chunk sequence packing: exclusive token prefix sum
    // in doc_id order → bin = offset / budget. No single-partition window:
    // range repartition + per-partition offsets (a Long per partition
    // collected, partitions fill in parallel — Dml.assignContiguous's
    // two-phase pattern).
    Q("u04_pack_sequences",
      (s, dir) => {
        val withTok = t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tok"))
        graft.operators.Sampling.packSequences(
          withTok, "doc_id", "n_tok", budgetTokens = 64L)
      },
      Some("""
        WITH t AS (
          SELECT doc_id, CAST(len(list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        c AS (
          SELECT doc_id, n_tok,
            CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
          FROM t)
        SELECT doc_id, n_tok, tok_offset, tok_offset // 64 AS bin FROM c""")),

    // ---- ANN over int8 scalar-quantized codes (4× lighter vectors, integer
    // inner loop). floor(x·scale + 0.5) round-half-up is engine-portable,
    // so the quantization itself — and therefore the "approximate"
    // neighbor ranking — hash-verifies bit-for-bit like s01/s02/s03.
    Q("s04_ann_quantized",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.quantizedTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 10)
      },
      Some("""
        WITH sc AS (
          SELECT vec_id, embedding,
            list_aggregate(list_transform(embedding,
              x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
          FROM embeddings),
        qz AS (
          SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) *
              (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5) AS INT)) AS q
          FROM sc),
        n AS (
          SELECT vec_id, q,
            sqrt(CAST(list_reduce(list_transform(list_zip(q, q),
              z -> CAST(z[1] AS BIGINT) * z[2]), (a,b) -> a+b) AS DOUBLE)) AS nrm
          FROM qz),
        scored AS (
          SELECT qr.vec_id AS query_id, n.vec_id AS neighbor_id,
            CAST(list_reduce(list_transform(list_zip(n.q, qr.q),
              z -> CAST(z[1] AS BIGINT) * z[2]), (a,b) -> a+b) AS DOUBLE)
              / (n.nrm * qr.nrm) AS qcos_sim
          FROM n qr JOIN n ON qr.vec_id < 8 AND n.vec_id <> qr.vec_id
            AND n.nrm > 0 AND qr.nrm > 0)
        SELECT query_id, neighbor_id, qcos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY qcos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored QUALIFY rank <= 10""")),

    // ---- Gopher quality-rule gate (t29): the paper's named document
    // rules (Rae et al. 2021 A1.1) with per-rule verdicts and the
    // composite pass — signal values are integer counts or single int/int
    // divisions so even the DOUBLE ratios hash-verify. One scan, no
    // shuffle. minStopHits=1: the synthetic corpus tops out at one
    // distinct English function word per doc, so the paper's >=2 would
    // fail every row and the composite would gate nothing.
    Q("t29_gopher_filter",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id") +:
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L): _*),
      Some(gopherOracle(minStopHits = 1L))),

    // ---- Gopher repetition-rule gate (t30): the paper's other rule half
    // (Rae et al. 2021 A1.1) — duplicate line/paragraph fractions
    // (row-count + char-weighted), top-{2,3,4}-gram char fractions,
    // duplicate-{5..10}-gram char fractions, composite rep_pass at the
    // paper's thresholds. ONE codegen kernel pass per row, zero exchanges.
    Q("t30_gopher_repetition",
      (s, dir) => TextAnalysis.gopherRepetitionSignals(
        t(s, dir, "documents"), "doc_id", "text"),
      Some(gopherRepetitionOracle)),

    // ---- C4 line+page cleaning (t31): the third paper-named gate next
    // to t29/t30 — terminal-punctuation / min-words / javascript line
    // rules, sentence-count / brace / boilerplate-phrase page rules,
    // CLEANED text carried in the output. Pure per-row codegen column
    // expressions: zero exchanges.
    // The fixture text carries no newlines or punctuation, so the gate
    // runs over a DERIVED page: a sentence break after every 6th word
    // (same leftmost-non-overlap regex contract in both engines), which
    // leaves a trailing unpunctuated partial line — every line rule and
    // the sentence-count page rule exercise BOTH branches under the hash.
    Q("t31_c4_filter",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id") +: TextAnalysis.c4Signals(
          regexp_replace(col("text"), "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")): _*),
      Some(c4Oracle)),

    // ---- Bigram LM fluency score (t28): corpus-trained add-one bigram
    // model, per-doc MEAN conditional probability (the CCNet "score every
    // doc under a corpus LM" pass; arithmetic-mean-of-p instead of
    // log-perplexity so every float op is correctly-rounded IEEE — see
    // TextAnalysis.lmScore). Fold order is fixed (sorted distinct
    // bigrams), so the model-dependent DOUBLE score hash-verifies.
    Q("t28_lm_score",
      (s, dir) => TextAnalysis.lmScore(t(s, dir, "documents"), "doc_id", "text"),
      Some(lmScoreOracle)),

    // ---- CCNet perplexity buckets (t32): the paper's head/middle/tail
    // split, per source — every doc ranked by its corpus-LM fluency
    // (t28's bit-exact score) and NTILE(3)-bucketed within its source.
    // Deterministic: (lm_score DESC, doc_id) total order; the scores
    // hash-verify, so the ranking and buckets do too. One window sort
    // per source beyond the t28 plan.
    Q("t32_ccnet_buckets",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        TextAnalysis.lmScore(t(s, dir, "documents"), "doc_id", "text")
          .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
            Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("lm_score"),
            ntile(3).over(Window.partitionBy(col("source"))
              .orderBy(col("lm_score").desc, col("doc_id")))
              .as("bucket"))
          .withColumn("bucket_label",
            when(col("bucket") === 1, lit("head"))
              .when(col("bucket") === 2, lit("middle"))
              .otherwise(lit("tail")))
      },
      Some(s"""
        WITH lm AS ($lmScoreOracle),
        ranked AS (
          SELECT lm.doc_id, d.source, lm.lm_score,
            CAST(NTILE(3) OVER (PARTITION BY d.source
              ORDER BY lm.lm_score DESC, lm.doc_id) AS INT) AS bucket
          FROM lm JOIN documents d ON d.doc_id = lm.doc_id)
        SELECT doc_id, source, lm_score, bucket,
          CASE WHEN bucket = 1 THEN 'head'
               WHEN bucket = 2 THEN 'middle' ELSE 'tail' END AS bucket_label
        FROM ranked""")),

    // ---- Learned quality classifier (t33): the fourth paper gate — the
    // DCLM / FineWeb-Edu workhorse filter shape, a linear model over
    // hashed word-gram features (fastText's feature space), trained as
    // multinomial NB from t29-gopher_pass seed labels in ONE gram-level
    // aggregate and APPLIED as one zero-exchange codegen kernel pass.
    // The trained weights inline into the generated oracle as exact
    // double literals (the s03/s06 trained-state pattern), and the
    // deterministic bucket-ascending score fold makes the DOUBLE scores
    // themselves hash-verify.
    Q("t33_quality_classifier",
      (s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        TextAnalysis.qualityClassifierScore(t(s, dir, "documents"),
          "doc_id", "text", w, bias, maxN = 2)
      },
      None,
      oracleGen = Some((s, dir) =>
        qualityClassifierOracle(s, dir, dim = 1024, maxN = 2))),

    // ---- DSIR importance resampling (t34): Xie et al. 2023 — the
    // data-selection workhorse behind domain-matched pretraining mixes.
    // Fit = ONE gram-level aggregate (target p̂ = src0/src1 docs vs raw
    // q̂ = the whole corpus, Laplace-smoothed over 1024 hashed buckets);
    // apply = the zero-exchange hashedGramScore kernel per document;
    // select = Gumbel-top-k importance resampling with deterministic
    // hash-derived noise, winners marked via a distributed-top-k
    // threshold broadcast (no global window). DOUBLE log-weights and
    // keys hash-verify against the DuckDB twin.
    Q("t34_dsir_select",
      (s, dir) => {
        val w = dsirModel(s, dir, dim = 1024, maxN = 2)
        TextAnalysis.dsirSelect(t(s, dir, "documents"), "doc_id", "text",
          w, k = 25, maxN = 2)
      },
      None,
      oracleGen = Some((s, dir) =>
        dsirOracle(s, dir, dim = 1024, maxN = 2, k = 25))),

    // ---- Learned language identification (t35): the fastText-lid shape
    // at word granularity — multiclass multinomial NB over the shared
    // hashed-gram feature space, one weight vector + prior per language
    // (supervised on the corpus `lang` column). Fit = ONE gram-level
    // aggregate with per-class count columns; apply = one zero-exchange
    // scan with C kernel columns and a first-maximum-in-label-order
    // argmax. The per-class DOUBLE scores, the prediction, AND the
    // truth-match flag all hash-verify against the twin.
    Q("t35_langid_learned",
      (s, dir) => {
        val models = lidModels(s, dir, dim = 1024, maxN = 2)
        TextAnalysis.langIdScore(t(s, dir, "documents"), "doc_id", "text",
            models, passthrough = Seq("lang"), maxN = 2)
          .withColumn("lang_match", col("pred_lang") === col("lang"))
      },
      None,
      oracleGen = Some((s, dir) =>
        langIdOracleGen(s, dir, dim = 1024, maxN = 2))),

    // ---- In-pipeline model evaluation (t37): exact AUC (Mann-Whitney
    // rank-sum with the (score, id) tie-break convention — integer
    // numerator, one IEEE division) plus precision/recall/F1 at the
    // models' own decision thresholds, graded on the u01 held-out test
    // split. One row for the t33 classifier vs its gopher_pass seed
    // labels; one row per language for t35 one-vs-rest. The rank-sum
    // runs WITHOUT a global window (range-repartition + per-partition
    // offsets — the packSequences shape); the ORACLE may use
    // ROW_NUMBER, the engine must not.
    Q("t37_model_eval",
      (s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val models = lidModels(s, dir, dim = 1024, maxN = 2)
        val test = graft.operators.Sampling.hashSplit(
            t(s, dir, "documents"), "doc_id",
            trainPermille = 900, valPermille = 50)
          .filter(col("split") === "test")
        val clfScored = test.select(col("doc_id"),
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(coalesce(col("text"), lit(""))),
            w, bias, maxN = 2).as("clf_score"))
        val clfRow = graft.operators.Eval.binaryEval(
          clfScored.withColumn("clf_keep", col("clf_score") > lit(0.0)),
          "doc_id", "clf_score", "gopher_pass", "clf_keep",
          "classifier", "keep")
        val lidScored = TextAnalysis.langIdScore(test, "doc_id", "text",
          models, passthrough = Seq("lang"), maxN = 2)
        val sfx = TextAnalysis.labelSuffixes(models.map(_._1))
        models.zip(sfx).map { case ((lbl, _, _), sx) =>
          graft.operators.Eval.binaryEval(
            lidScored
              .withColumn("__y", coalesce(col("lang") === lit(lbl),
                lit(false)))
              .withColumn("__p", coalesce(col("pred_lang") === lit(lbl),
                lit(false))),
            "doc_id", s"score_$sx", "__y", "__p", "langid", lbl)
        }.foldLeft(clfRow)(_ union _)
      },
      None,
      oracleGen = Some((s, dir) => modelEvalOracle(s, dir))),

    // ---- Score calibration (t41): the reliability table for the t33
    // classifier — fixed-edge buckets over the NB score vs the observed
    // gopher_pass rate (exact long counts, one IEEE division per bin; no
    // window, no sort, ONE hash aggregate). Together with t37's AUC this
    // completes in-pipeline model grading: discrimination AND calibration.
    Q("t41_calibration",
      (s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val scored = t(s, dir, "documents").select(
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(coalesce(col("text"), lit(""))),
            w, bias, maxN = 2).as("clf_score"))
        graft.operators.Eval.calibration(scored, "clf_score",
          "gopher_pass", lo = -8.0, width = 1.0, buckets = 16)
      },
      None,
      oracleGen = Some((s, dir) => s"""
        WITH clf AS (SELECT doc_id, clf_score
                     FROM (${qualityClassifierOracle(s, dir, dim = 1024,
                       maxN = 2)}) cc),
        g AS (SELECT doc_id, gopher_pass
              FROM (${gopherOracle(minStopHits = 1L)}) gg),
        j AS (SELECT LEAST(15, GREATEST(0,
                CAST(floor((c.clf_score - (-8.0)) / 1.0) AS INT)))
                AS bucket,
              g.gopher_pass AS y
              FROM clf c JOIN g USING (doc_id))
        SELECT bucket,
               -8.0 + CAST(bucket AS DOUBLE) * 1.0 AS bin_lo,
               CAST(count(*) AS BIGINT) AS n,
               CAST(COALESCE(SUM(CASE WHEN y THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_pos,
               CAST(COALESCE(SUM(CASE WHEN y THEN 1 ELSE 0 END), 0)
                 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS obs_rate
        FROM j GROUP BY bucket""")),

    // ---- Full quality funnel (p05): the production DCLM/FineWeb shape —
    // the three RULE gates (p04's fusion) plus the LEARNED classifier
    // (t33) in the SAME single scan, zero exchanges: every gate is a
    // per-row pure function, so the whole keep/drop decision (rules AND
    // model) costs one pass over the corpus. The oracle composes the four
    // stage twins by doc_id join (the ORACLE may shuffle; the engine plan
    // must not — PlanLint pins budget 0).
    Q("p05_quality_funnel",
      (s, dir) => {
        val (wghts, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val docs = t(s, dir, "documents")
        val page = regexp_replace(col("text"),
          "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
        val c4 = TextAnalysis.c4Signals(page)
        val staged = docs.select(col("doc_id"),
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
          c4.last,
          graft.functions.TextHashExprs.gopherRepetition(col("text"))
            .as("__r"),
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(col("text")), wghts, bias, maxN = 2)
            .as("clf_score"))
        val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
          .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
          .reduce(_ && _)
        staged.select(col("doc_id"), col("gopher_pass"),
          repPass.as("rep_pass"), col("c4_keep"),
          col("clf_score"), (col("clf_score") > lit(0.0)).as("clf_keep"),
          (col("gopher_pass") && repPass && col("c4_keep") &&
            col("clf_score") > lit(0.0)).as("keep"))
      },
      None,
      oracleGen = Some((s, dir) => qualityFunnelOracle(s, dir))),

    // ---- Pretraining-data export (p06): the end-to-end last mile over
    // this round's additions — the p05 keep decision (rules + learned
    // classifier, one fused scan), span-level decontamination of the
    // survivors against the benchmark split (t36's kernel), and
    // fixed-window sequence packing of the CLEANED token counts (u04's
    // deterministic offsets). Per-row stages compose into the same scan;
    // packing adds the one range exchange it always costs.
    // budgetTokens = 64 is the FIXTURE window (oracle-scale); production
    // packs at the model context (2k-8k) — a parameter, same cost (see
    // the README "Fixture constants vs production knobs" table and u04).
    Q("p06_pretrain_export",
      (s, dir) => {
        val (wghts, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val d = t(s, dir, "documents")
        val bench = d.filter(col("doc_id") % 7 === 0)
        val corp = d.filter(col("doc_id") % 7 =!= 0)
        val page = regexp_replace(col("text"),
          "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
        val c4 = TextAnalysis.c4Signals(page)
        val staged = corp.select(col("doc_id"), col("text"),
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
          c4.last,
          graft.functions.TextHashExprs.gopherRepetition(col("text"))
            .as("__r"),
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(col("text")), wghts, bias, maxN = 2)
            .as("clf_score"))
        val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
          .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
          .reduce(_ && _)
        val kept = staged
          .filter(col("gopher_pass") && repPass && col("c4_keep") &&
            col("clf_score") > lit(0.0))
          .select(col("doc_id"), col("text"))
        val cleaned = Dedup.decontaminateSpans(
          kept, bench, "doc_id", "text", n = 8)
        val withTok = cleaned.select(col("doc_id"),
          col("n_removed_tokens"),
          size(filter(split(col("clean_text"), " "), t => length(t) > 0))
            .cast("long").as("n_tok"))
        graft.operators.Sampling.packSequences(
          withTok, "doc_id", "n_tok", budgetTokens = 64L)
      },
      None,
      oracleGen = Some((s, dir) => s"""
        WITH funnel AS (
          SELECT doc_id, keep FROM (${qualityFunnelOracle(s, dir)}) f),
        spans AS (
          SELECT doc_id, clean_text, n_removed_tokens
          FROM ($decontaminateSpansOracle) g),
        kept2 AS (
          SELECT sp.doc_id, sp.clean_text, sp.n_removed_tokens
          FROM spans sp JOIN funnel USING (doc_id) WHERE funnel.keep),
        tok2 AS (
          SELECT doc_id, n_removed_tokens,
            CAST(len(list_filter(string_split(clean_text, ' '),
              x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM kept2),
        c2 AS (
          SELECT doc_id, n_removed_tokens, n_tok,
            CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
          FROM tok2)
        SELECT doc_id, n_removed_tokens, n_tok, tok_offset,
               tok_offset // 64 AS bin
        FROM c2""")),

    // ---- Incremental corpus ingest (p07): the operational 100 TB shape —
    // the prior corpus' dedup signatures and export high-water PERSIST
    // as parquet state (built once per dir in p07State); the QUERY is
    // the delta ingest a production pipeline runs per crawl: cross-dedup
    // the new 10% against the persisted state (no recompute over the
    // old corpus), funnel only the survivors, and pack with offsets
    // CONTINUING from the stored high-water so the append is stable.
    Q("p07_incremental_ingest",
      (s, dir) => {
        val (w, bias) = clfModel(s, dir, dim = 1024, maxN = 2)
        val stateDir = p07State(s, dir)
        val delta = t(s, dir, "documents").filter(col("doc_id") % 10 === 9)
        val survivors = graft.operators.Incremental.crossDedupAgainstState(
          delta, "doc_id", "text", stateDir, p07Cfg)
        val kept = p07FunnelKeep(survivors, w, bias)
        val hw = graft.operators.Incremental.readPackHighWater(s, stateDir)
        graft.operators.Sampling.packSequences(kept, "doc_id", "n_tok",
          budgetTokens = 64L, startOffset = hw)
      },
      None,
      oracleGen = Some((s, dir) => p07Oracle(s, dir))),

    // ---- Per-language quality funnel (p08): the CCNet deployment shape
    // p05 lacks — each language carries its OWN quality model, and a doc
    // routes through the model of its PREDICTED language (truth is
    // unknown at apply time). Still ONE zero-exchange scan: C lang-id
    // kernel columns + C per-language classifier kernel columns (codegen
    // CSE shares the gram stream), argmax, a routing CASE, and the three
    // rule gates — 2C+3 weight sets ride as plan literals.
    Q("p08_perlang_funnel",
      (s, dir) => {
        val lid = lidModels(s, dir, dim = 1024, maxN = 2)
        val perLang = perLangClfModels(s, dir, dim = 1024, maxN = 2)
        require(lid.map(_._1) == perLang.map(_._1),
          "lang-id and per-language classifier label sets must align")
        val sfx = TextAnalysis.labelSuffixes(lid.map(_._1))
        val docs = t(s, dir, "documents")
        val page = regexp_replace(col("text"),
          "((?:[^ \\t\\n\\x0B\\f\\r]+ ){6})", "$1.\n")
        val c4 = TextAnalysis.c4Signals(page)
        val norm = Dedup.normalize(coalesce(col("text"), lit("")))
        val lidCols = lid.zip(sfx).map { case ((_, w, b), sx) =>
          graft.functions.TextHashExprs.hashedGramScore(norm, w, b, maxN = 2)
            .as(s"__lid_$sx") }
        val clfCols = perLang.zip(sfx).map { case ((_, w, b), sx) =>
          graft.functions.TextHashExprs.hashedGramScore(norm, w, b, maxN = 2)
            .as(s"__clf_$sx") }
        val staged = docs.select(Seq(col("doc_id"),
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
          c4.last,
          graft.functions.TextHashExprs.gopherRepetition(col("text"))
            .as("__r")) ++ lidCols ++ clfCols: _*)
        val pred =
          if (lid.size == 1) lit(lid.head._1)
          else {
            val best = greatest(sfx.map(sx => col(s"__lid_$sx")): _*)
            coalesce(lid.zip(sfx).map { case (m, sx) =>
              when(col(s"__lid_$sx") === best, lit(m._1)) }: _*)
          }
        val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
          .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
          .reduce(_ && _)
        val routed = coalesce(lid.zip(sfx).map { case (m, sx) =>
          when(pred === lit(m._1), col(s"__clf_$sx")) }: _*)
        staged.select(col("doc_id"), pred.as("pred_lang"),
          col("gopher_pass"), repPass.as("rep_pass"), col("c4_keep"),
          routed.as("clf_score"), (routed > lit(0.0)).as("clf_keep"),
          (col("gopher_pass") && repPass && col("c4_keep") &&
            routed > lit(0.0)).as("keep"))
      },
      None,
      oracleGen = Some((s, dir) => perLangFunnelOracle(s, dir))),

    // ---- Registry-loaded apply (p09): the ModelStore DURABILITY path
    // under the driver's oracle hash (VERDICT r10 directive 2) —
    // fit-session models (t33 classifier, t35 lang-id, t38 unigram LM)
    // persist to a versioned registry once per dir, the query LOADS the
    // latest versions back from parquet, and every apply kernel runs
    // FROM THE LOADED COPIES. The oracle twins are the fit-model ones —
    // load ≡ fit bit-exactness is exactly what the hash checks. clf +
    // lang-id share ONE zero-exchange kernel scan (clf_score rides
    // langIdScore's passthrough); the ppl columns join on doc_id (t40's
    // dictionary-sized word table keeps the corpus side one exchange).
    Q("p09_registry_apply",
      (s, dir) => {
        val M = graft.core.ModelStore
        val root = p09Registry(s, dir)
        val clf = M.loadClassifier(s,
          M.latestVersion(s, root, "quality_clf").get)
        val lid = M.loadLangId(s, M.latestVersion(s, root, "langid").get)
        val ulm = M.loadUlm(s, M.latestVersion(s, root, "unigram_lm").get)
        val docs = t(s, dir, "documents")
        val withClf = docs.withColumn("clf_score",
          graft.functions.TextHashExprs.hashedGramScore(
            Dedup.normalize(coalesce(col("text"), lit(""))),
            clf.weights, clf.bias, clf.maxN))
        val scored = TextAnalysis.langIdScore(withClf, "doc_id", "text",
            lid.models, passthrough = Seq("clf_score", "text"),
            maxN = lid.maxN)
          .select(col("doc_id"), col("text"), col("clf_score"),
            (col("clf_score") > lit(0.0)).as("clf_keep"), col("pred_lang"))
        // kernels ride t40's own doc-side join via passthrough — no
        // corpus×corpus join on top of the dictionary shape
        TextAnalysis.unigramLmScore(scored, "doc_id", "text",
          ulm.pieces.map(p => (p._1, p._3)),
          passthrough = Seq("clf_score", "clf_keep", "pred_lang"))
      },
      None,
      oracleGen = Some((s, dir) => s"""
        WITH clfq AS (SELECT doc_id, clf_score, clf_keep
          FROM (${qualityClassifierOracle(s, dir, dim = 1024, maxN = 2)}) c),
        lidq AS (SELECT doc_id, pred_lang
          FROM (${langIdOracleGen(s, dir, dim = 1024, maxN = 2)}) l),
        pplq AS (SELECT doc_id, n_tokens, n_pieces, nll, avg_nll
          FROM (${ulmPplOracle(s, dir)}) p)
        SELECT c.doc_id, c.clf_score, c.clf_keep, l.pred_lang,
               p.n_tokens, p.n_pieces, p.nll, p.avg_nll
        FROM clfq c JOIN lidq l USING (doc_id)
             JOIN pplq p USING (doc_id)""")),

    // ---- Canonical-source keep-best dedup (d20): the crawl pipeline's
    // URL dedup — one hash-aggregate per canonical key with the arg-max
    // carried as a struct MAX partial state (never a per-key window sort,
    // which hot URLs would skew). Integer-exact.
    Q("d20_url_dedup",
      (s, dir) => Dedup.keepBestPerKey(
        t(s, dir, "documents"), "source", "n_chars", "doc_id"),
      Some("""
        WITH g AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_quality
          FROM documents GROUP BY source),
        b AS (
          SELECT source, doc_id AS kept_id, n_chars AS kept_quality,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id DESC) AS rn
          FROM documents)
        SELECT g.source, b.kept_id, b.kept_quality, g.n_docs, g.total_quality
        FROM g JOIN b USING (source) WHERE b.rn = 1""")),

    // ---- Frame-level media dedup (m04): per-frame REAL decode (every
    // video frame individually through the PNG reader) → one
    // hash-aggregate on (geometry, additive + position-weighted pixel
    // checksums — the weighted one is ORDER-sensitive, so permuted-pixel
    // frames no longer collide). The oracle predicts both checksums from
    // the text alone (additive: per-media content_sum / n_frames — exact:
    // the GVID scene is static; weighted: the per-frame cyclic closed
    // form), so a header-only or lossy decode cannot hash-match.
    Q("m04_frame_dedup",
      // document-side kind pre-filter (pmod 3 != 1 drops the audio
      // assignment): the encode mapPartitions is opaque to filter
      // pushdown, so frameChecksums' own audio filter would run AFTER
      // every audio clip had been encoded
      (s, dir) => Multimodal.frameDedup(
        Multimodal.syntheticMedia(
          t(s, dir, "documents").filter(pmod(col("doc_id"), lit(3)) =!= 1))),
      Some(s"""
        WITH ${mediaDecodeOracle},
        frames AS (
          SELECT media_id, width, height, content_sum AS pix_sum,
                 content_wsum AS pix_wsum
          FROM decoded WHERE kind = 'image'
          UNION ALL
          SELECT media_id, width, height,
                 content_sum // CAST(n_frames AS BIGINT) AS pix_sum,
                 content_wsum AS pix_wsum
          FROM decoded, UNNEST(range(0, CAST(n_frames AS BIGINT))) AS u(f)
          WHERE kind = 'video')
        SELECT width, height, pix_sum, pix_wsum,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
               MIN(media_id) AS rep_media_id
        FROM frames GROUP BY 1, 2, 3, 4"""))
  )

  /** DuckDB twin of [[TextAnalysis.lmScore]] — shared by t28 and the
    * t32 CCNet bucket split. */
  private def lmScoreOracle: String = """
        WITH dls AS (
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' '),
            x -> len(x) > 0) AS toks
          FROM documents),
        grams AS (
          SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
          FROM dls, UNNEST(range(1, len(toks))) AS r(i)
          WHERE len(toks) >= 2),
        doc_bigrams AS (
          SELECT doc_id, bigram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2),
        model AS (
          SELECT bigram, string_split(bigram, ' ')[1] AS ctx,
                 SUM(cnt) AS cb
          FROM doc_bigrams GROUP BY 1, 2),
        ctxc AS (SELECT ctx, SUM(cb) AS cu FROM model GROUP BY 1),
        voc AS (
          SELECT COUNT(DISTINCT string_split(bigram, ' ')[2]) AS v FROM model),
        contrib AS (
          SELECT d.doc_id, d.bigram,
            d.cnt,
            CAST(d.cnt AS DOUBLE) *
              ((CAST(m.cb AS DOUBLE) + CAST('1.0' AS DOUBLE)) /
               CAST(c.cu + voc.v AS DOUBLE)) AS c
          FROM doc_bigrams d
          JOIN model m USING (bigram)
          JOIN ctxc c ON c.ctx = m.ctx, voc),
        folded AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
            list_reduce(
              list_transform(list_sort(list(struct_pack(bigram := bigram, c := c))),
                x -> x.c),
              (a, x) -> a + x) AS s
          FROM contrib GROUP BY doc_id)
        SELECT doc_id, n_bigrams, s / CAST(n_bigrams AS DOUBLE) AS lm_score
        FROM folded"""

  /** DuckDB twin of `Sampling.permilleBucket` + the 900/950 split CASE —
    * ONE definition shared by u01 and u10 so the bucket formula cannot
    * drift between twins (mod 10^6 BEFORE the multiply: neither engine
    * can overflow; the +m wrap is the pmod twin for negative ids). */
  private def permilleBucketSql: String =
    "((((doc_id % 1000000) + 1000000) % 1000000) * 2654435761) % 1000"
  private def splitCaseSql: String =
    """CASE WHEN bk < 900 THEN 'train'
               WHEN bk < 950 THEN 'val'
               ELSE 'test' END"""

  /** DuckDB twin of [[Multimodal.imagePHash]]: per-pixel channel sums in
    * closed form from the cyclic fill, 8x8 block grid by integer floor,
    * bits by exact integer cross-multiplication, and the 64-bit hash
    * assembled in HUGEINT then wrapped to the signed BIGINT Spark holds
    * (bit 63 flips the sign - the same mod-2^64 trick as the decode
    * oracle's fold). */
  private def imagePHashOracle: String = s"""
        WITH $mediaDecodeOracle,
        imgs AS (
          SELECT g.media_id, g.n, g.ubl, g.width AS w, g.height AS h
          FROM geom g WHERE g.kind = 'image'),
        px AS (
          SELECT media_id, w, h,
            ((y * 8) // h) * 8 + ((x * 8) // w) AS b,
            ubl[CAST((3 * (y * w + x)) % n AS INT) + 1]
              + ubl[CAST((3 * (y * w + x) + 1) % n AS INT) + 1]
              + ubl[CAST((3 * (y * w + x) + 2) % n AS INT) + 1] AS g
          FROM imgs,
               UNNEST(range(0, h)) AS uy(y),
               UNNEST(range(0, w)) AS ux(x)),
        blocks AS (
          SELECT media_id, w, h, b,
            CAST(SUM(g) AS BIGINT) AS bs, COUNT(*) AS bp
          FROM px GROUP BY 1, 2, 3, 4),
        tot AS (
          SELECT media_id, CAST(SUM(bs) AS BIGINT) AS ts
          FROM blocks GROUP BY 1),
        hashes AS (
          SELECT b.media_id, b.w, b.h,
            SUM(CASE WHEN b.bs * (b.w * b.h) > t.ts * b.bp
                THEN (1::HUGEINT << CAST(b.b AS INT))
                ELSE 0::HUGEINT END) AS hh
          FROM blocks b JOIN tot t USING (media_id)
          GROUP BY 1, 2, 3)
        SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          CAST(hh - (CASE WHEN hh >= 9223372036854775808::HUGEINT
            THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)
            AS BIGINT) AS ahash
        FROM hashes"""

  /** DuckDB twin of [[Multimodal.resizeImages]]: the geometry comes from
    * the shared decode oracle CTEs; every RESIZED pixel has the closed
    * form ubl[(3*(sy*w + sx) + c) mod n] with sy/sx the integer
    * nearest-neighbor source coordinates, so the resized checksum is
    * predicted from the text alone. */
  private def imageResizeOracle(maxEdge: Int): String = s"""
        WITH $mediaDecodeOracle,
        imgs AS (
          SELECT g.media_id, g.n, g.ubl, g.width AS w, g.height AS h
          FROM geom g WHERE g.kind = 'image'),
        dims AS (
          SELECT media_id, n, ubl, w, h,
            CASE WHEN greatest(w, h) > $maxEdge
                 THEN greatest((w * $maxEdge) // greatest(w, h), 1)
                 ELSE w END AS ow,
            CASE WHEN greatest(w, h) > $maxEdge
                 THEN greatest((h * $maxEdge) // greatest(w, h), 1)
                 ELSE h END AS oh
          FROM imgs),
        px AS (
          SELECT media_id, w, h, ow, oh,
            ubl[CAST((3 * (((y * h) // oh) * w + ((x * w) // ow)) + c) % n
              AS INT) + 1] AS v
          FROM dims,
               UNNEST(range(0, oh)) AS uy(y),
               UNNEST(range(0, ow)) AS ux(x),
               UNNEST([0, 1, 2]) AS uc(c))
        SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
          CAST(SUM(v) AS BIGINT) AS resized_sum
        FROM px GROUP BY 1, 2, 3, 4, 5"""

  /** DuckDB twin of [[TextAnalysis.c4Signals]] — the page-phrase list is
    * generated from the same constant as the Scala side. */
  private def c4Oracle: String = {
    val phrases = TextAnalysis.c4PagePhrases
      .map(p => s"NOT contains(lt, '$p')").mkString(" AND ")
    s"""
        WITH paged AS (
          SELECT doc_id, regexp_replace(text,
            '((?:[^ \\t\\n\\x0b\\f\\r]+ ){6})', '\\1.' || chr(10), 'g') AS text
          FROM documents),
        base AS (
          SELECT doc_id, text, lower(text) AS lt,
            list_filter(list_transform(string_split(text, chr(10)),
              x -> trim(x)), x -> x <> '') AS lns
          FROM paged),
        k AS (
          SELECT doc_id, text, lt, lns,
            list_filter(lns, l ->
              (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
                OR ends_with(l, '"'))
              AND len(list_filter(string_split(l, ' '), w -> len(w) > 0))
                >= ${TextAnalysis.c4MinLineWords}
              AND NOT contains(lower(l), 'javascript')) AS kept
          FROM base),
        sig AS (
          SELECT doc_id,
            -- DuckDB array_to_string([]) is NULL where Spark array_join
            -- is '' — coalesce to the Spark semantic
            COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
            CAST(len(lns) AS BIGINT) AS n_lines,
            CAST(len(kept) AS BIGINT) AS n_kept_lines,
            CAST(length(COALESCE(array_to_string(kept, chr(10)), ''))
              - length(regexp_replace(
                  COALESCE(array_to_string(kept, chr(10)), ''),
                  '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
            NOT contains(text, '{') AS ok_no_brace,
            ($phrases) AS ok_no_phrases
          FROM k)
        SELECT doc_id, clean_text, n_lines, n_kept_lines, n_sentences,
          ok_no_brace, ok_no_phrases,
          (n_sentences >= ${TextAnalysis.c4MinSentences}
            AND ok_no_brace AND ok_no_phrases) AS c4_keep
        FROM sig"""
  }

  /** DuckDB twin of [[TextAnalysis.gopherRepetitionSignals]] — the n-gram
    * families are generated from the same (2..4 top / 5..10 dup) ranges
    * and thresholds as the Scala side so the two cannot drift. The twin
    * computes grams relationally (UNNEST + GROUP BY + one window for the
    * deterministic (count DESC, gram ASC) arg-max) — the oracle need not
    * be shuffle-free, only value-identical. */
  private def gopherRepetitionOracle: String = {
    val topCols = (2 to 4).map(n =>
      s"""CASE WHEN b.norm_len > 0
         THEN CAST(COALESCE(t.top$n, 0) AS DOUBLE) / b.norm_len
         ELSE CAST('0.0' AS DOUBLE) END AS top_${n}gram_char_frac""")
    val dupCols = (5 to 10).map(n =>
      s"""CASE WHEN COALESCE(d.tot$n, 0) > 0
         THEN CAST(d.rep$n AS DOUBLE) / d.tot$n
         ELSE CAST('0.0' AS DOUBLE) END AS dup_${n}gram_char_frac""")
    // every threshold interpolated from the Scala-side constants — a bar
    // change in TextAnalysis.gopherRepetitionBars cannot leave the twin
    // at a stale literal
    val passTerms = TextAnalysis.gopherRepetitionNames
      .zip(TextAnalysis.gopherRepetitionBars)
      .map { case (nm, bar) => s"$nm <= $bar" }
    s"""
        WITH base AS (
          SELECT doc_id,
            list_filter(list_transform(string_split(text, chr(10)),
              x -> trim(x)), x -> x <> '') AS lns,
            list_filter(list_transform(string_split(text, chr(10)||chr(10)),
              x -> trim(x)), x -> x <> '') AS prs,
            list_filter(string_split(trim(regexp_replace(lower(text),
              '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
              x -> len(x) > 0) AS toks
          FROM documents),
        base2 AS (
          SELECT doc_id, lns, prs, toks,
            length(array_to_string(toks, ' ')) AS norm_len
          FROM base),
        grams AS (
          SELECT doc_id, n, array_to_string(toks[i:i+n-1], ' ') AS gram
          FROM base2,
               UNNEST([2,3,4,5,6,7,8,9,10]) AS tn(n),
               UNNEST(range(1, len(toks) - n + 2)) AS r(i)),
        counts AS (
          SELECT doc_id, n, gram, COUNT(*) AS c, length(gram) AS gl
          FROM grams GROUP BY 1, 2, 3, length(gram)),
        topg AS (
          SELECT doc_id, n, c * gl AS chars,
            ROW_NUMBER() OVER (PARTITION BY doc_id, n
              ORDER BY c DESC, gram ASC) AS rn
          FROM counts WHERE n <= 4),
        topp AS (
          SELECT doc_id,
            ${(2 to 4).map(n =>
              s"MAX(CASE WHEN n = $n THEN chars END) AS top$n")
              .mkString(", ")}
          FROM topg WHERE rn = 1 GROUP BY doc_id),
        dupp AS (
          SELECT doc_id,
            ${(5 to 10).map(n =>
              s"SUM(CASE WHEN n = $n THEN (c - 1) * gl END) AS rep$n, " +
              s"SUM(CASE WHEN n = $n THEN c * gl END) AS tot$n")
              .mkString(", ")}
          FROM counts WHERE n >= 5 GROUP BY doc_id),
        sig AS (
          SELECT b.doc_id,
            CASE WHEN len(b.lns) > 0
              THEN CAST(len(b.lns) - len(list_distinct(b.lns)) AS DOUBLE)
                / len(b.lns) ELSE CAST('0.0' AS DOUBLE) END AS dup_line_frac,
            CASE WHEN COALESCE(list_sum(list_transform(b.lns,
                x -> length(x))), 0) > 0
              THEN CAST(list_sum(list_transform(b.lns, x -> length(x)))
                  - list_sum(list_transform(list_distinct(b.lns),
                    x -> length(x))) AS DOUBLE)
                / list_sum(list_transform(b.lns, x -> length(x)))
              ELSE CAST('0.0' AS DOUBLE) END AS dup_line_char_frac,
            CASE WHEN len(b.prs) > 0
              THEN CAST(len(b.prs) - len(list_distinct(b.prs)) AS DOUBLE)
                / len(b.prs) ELSE CAST('0.0' AS DOUBLE) END AS dup_para_frac,
            CASE WHEN COALESCE(list_sum(list_transform(b.prs,
                x -> length(x))), 0) > 0
              THEN CAST(list_sum(list_transform(b.prs, x -> length(x)))
                  - list_sum(list_transform(list_distinct(b.prs),
                    x -> length(x))) AS DOUBLE)
                / list_sum(list_transform(b.prs, x -> length(x)))
              ELSE CAST('0.0' AS DOUBLE) END AS dup_para_char_frac,
            ${(topCols ++ dupCols).mkString(",\n            ")}
          FROM base2 b
          LEFT JOIN topp t USING (doc_id)
          LEFT JOIN dupp d USING (doc_id))
        SELECT doc_id, dup_line_frac, dup_line_char_frac, dup_para_frac,
          dup_para_char_frac,
          ${(2 to 4).map(n => s"top_${n}gram_char_frac").mkString(", ")},
          ${(5 to 10).map(n => s"dup_${n}gram_char_frac").mkString(", ")},
          (${passTerms.mkString("\n            AND ")}) AS rep_pass
        FROM sig"""
  }

  /** DuckDB twin of [[TextAnalysis.gopherSignals]], generated from the same
    * stopword list and thresholds so the two sides cannot drift. */
  private def gopherOracle(minStopHits: Long): String = {
    val stops = TextAnalysis.gopherStopwords.map(w => s"'$w'").mkString("[", ",", "]")
    // every threshold interpolated from the shared TextAnalysis constants
    // (the gopherRepetitionOracle discipline) — a bar change on the Scala
    // side cannot leave this twin at a stale literal
    import TextAnalysis._
    val okWords = s"n_words >= $gopherMinWords AND n_words <= $gopherMaxWords"
    val okMeanLen = s"mean_word_len >= $gopherMeanWordLenMin" +
      s" AND mean_word_len <= $gopherMeanWordLenMax"
    val okSymbols = s"symbol_ratio <= $gopherMaxSymbolRatio"
    val okAlpha = s"alpha_word_ratio >= $gopherMinAlphaRatio"
    val okStops = s"stop_hits >= $minStopHits"
    val okBullets = s"bullet_ratio <= $gopherMaxBulletRatio"
    val okEllipsis = s"ellipsis_line_ratio <= $gopherMaxEllipsisRatio"
    s"""
        WITH base AS (
          SELECT doc_id, text,
            list_filter(string_split(
              trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '),
              x -> len(x) > 0) AS toks,
            string_split(text, chr(10)) AS lns
          FROM documents),
        sig AS (
          SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_words,
            CASE WHEN len(toks) > 0
                 THEN CAST(list_sum(list_transform(toks, x -> length(x)))
                      AS DOUBLE) / len(toks)
                 ELSE CAST('0.0' AS DOUBLE) END AS mean_word_len,
            CAST(length(text) - length(regexp_replace(text, '#', '', 'g'))
                 + (length(text) - length(replace(text, '...', ''))) // 3
                 + length(text) - length(regexp_replace(text, '…', '', 'g'))
              AS DOUBLE) / GREATEST(len(toks), 1) AS symbol_ratio,
            CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                      AS DOUBLE) / len(toks)
                 ELSE CAST('0.0' AS DOUBLE) END AS alpha_word_ratio,
            CAST(len(list_intersect(list_distinct(toks), $stops)) AS BIGINT)
              AS stop_hits,
            CAST(len(list_filter(lns, l ->
                starts_with(ltrim(l, ' '), '-') OR starts_with(ltrim(l, ' '), '*')
                OR starts_with(ltrim(l, ' '), '•'))) AS DOUBLE)
              / GREATEST(len(lns), 1) AS bullet_ratio,
            CAST(len(list_filter(lns, l ->
                ends_with(rtrim(l, ' '), '...') OR ends_with(rtrim(l, ' '), '…')))
              AS DOUBLE) / GREATEST(len(lns), 1) AS ellipsis_line_ratio
          FROM base)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
          stop_hits, bullet_ratio, ellipsis_line_ratio,
          ($okWords) AS ok_words, ($okMeanLen) AS ok_mean_len,
          ($okSymbols) AS ok_symbols, ($okAlpha) AS ok_alpha,
          ($okStops) AS ok_stops, ($okBullets) AS ok_bullets,
          ($okEllipsis) AS ok_ellipsis,
          (($okWords) AND ($okMeanLen) AND ($okSymbols) AND ($okAlpha)
            AND ($okStops) AND ($okBullets) AND ($okEllipsis)) AS gopher_pass
        FROM sig"""
  }
}
