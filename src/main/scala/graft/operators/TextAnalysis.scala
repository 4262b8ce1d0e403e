package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup.normalize

/** Text analysis for training-data pipelines (beyond-reference surface):
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure column expressions (codegen'd, partition-parallel, no UDFs).
  */
object TextAnalysis {

  /** Tokens of the normalized text (non-empty, whitespace-split). */
  def tokens(text: Column): Column =
    filter(split(normalize(text), " "), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: word-piece regex over the raw text
    * (letters runs, digit runs, single punctuation — the common pre-tokenizer
    * shape), cheap proxy for LLM token budgeting at corpus scale. */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text,
        "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])" + // punct/space boundaries
          "|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"), // letter↔digit
      t => length(trim(t)) > 0)).cast("long")

  /** Per-language stopword evidence (tiny curated lists; deterministic). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
      "was", "for", "on", "are", "with", "as", "at", "this", "but", "be"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
      "auf", "für", "von", "sich", "dem", "den", "auch", "es", "ich", "zu", "sie"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "des", "du", "que",
      "qui", "dans", "pour", "pas", "sur", "avec", "au", "ce", "il", "je"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "un", "de", "que",
      "en", "no", "se", "por", "con", "para", "su", "al", "lo", "como"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人",
      "都", "一", "他", "这", "中", "大", "来", "上", "个", "们"))

  /** Heuristic language ID: stopword-hit rate per language over the token
    * set; winner = max hits (ties → lexicographically last code — documented
    * determinism, not linguistics). Docs with zero evidence → "und". */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scored = array(stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(toks, lit(words.toArray))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality signals: char/word stats and character-class ratios (the
    * classic Gopher/C4-style filters), plus a composite keep/drop flag. */
  def qualitySignals(text: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("long")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("long")
    val spaces = length(regexp_replace(text, "[^ ]", "")).cast("long")
    val toks = tokens(text)
    val nToks = size(toks).cast("long")
    // sum of token lengths == length of the separator-free concat — a pure
    // codegen'd built-in instead of an interpreted per-element fold
    val meanTokLen = when(nToks > 0,
      length(concat_ws("", toks)).cast("double") / nToks)
      .otherwise(lit(0.0))
    val alphaRatio = when(nChars > 0, alpha.cast("double") / nChars).otherwise(lit(0.0))
    val digitRatio = when(nChars > 0, digits.cast("double") / nChars).otherwise(lit(0.0))
    Seq(
      nChars.as("n_chars_m"),
      nToks.as("n_tokens"),
      alphaRatio.as("alpha_ratio"),
      digitRatio.as("digit_ratio"),
      (spaces.cast("double") / greatest(nChars, lit(1L))).as("space_ratio"),
      meanTokLen.as("mean_token_len"),
      (nChars >= 20 && nToks >= 5 && alphaRatio > 0.5 && digitRatio < 0.3)
        .as("quality_keep"))
  }

  /** Within-document repetition signals (the Gopher-style rep filters):
    * duplicate-token fraction and duplicate word-2-gram fraction. High
    * values flag boilerplate/spam; pure array built-ins, no UDFs. */
  def repetitionSignals(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val n = size(toks)
    val dupTok = when(n > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / n)
      .otherwise(lit(0.0))
    // word 2-grams: zip each token with its successor
    val grams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val ng = size(grams)
    val dupGram = when(ng > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / ng)
      .otherwise(lit(0.0))
    Seq(n.cast("long").as("n_tokens"),
      dupTok.as("dup_token_ratio"),
      dupGram.as("dup_2gram_ratio"))
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): k-shingle
    * hashes → min hash per sliding window of `w` → distinct set. Two docs
    * share fingerprint hashes iff they share k-length substrings; robust to
    * reordering/insertion. Pure array exprs over one pass of the text. */
  def fingerprint(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.TextHashExprs.winnowFingerprint(normalize(text), k, w)

  /** PII patterns, in the regex subset Java (`java.util.regex`) and RE2
    * share (no backreferences, no lookaround) so the DuckDB twin matches
    * the exact same spans. Order matters: emails are redacted first (an
    * address contains digit runs a later pattern could otherwise nibble).
    * (name, pattern, replacement). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9]{1,3}[ -][0-9]{3}[ -]?[0-9]{3,4}\\b", "<PHONE>"))

  /** Per-category PII match counts plus a composite flag — the detect side
    * of the standard pre-training privacy pass. Each pattern counts on the
    * text AFTER the earlier patterns' redactions (the same sequential basis
    * [[redactPii]] uses), so counts always equal the number of tokens the
    * redaction emits — an IP inside an email is counted as email only,
    * never double-reported. Pure codegen'd `regexp_count`s, no UDFs. */
  def piiSignals(text: Column): Seq[Column] = {
    val staged = piiPatterns.scanLeft(text) { case (acc, (_, p, tok)) =>
      regexp_replace(acc, p, tok)
    }
    val counts = piiPatterns.zip(staged).map { case ((n, p, _), basis) =>
      regexp_count(basis, lit(p)).cast("long").as(s"n_$n")
    }
    counts :+ counts.map(_ > 0).reduce(_ || _).as("has_pii")
  }

  /** Redacted text: every PII span replaced by its category token, applied
    * in [[piiPatterns]] order (replacement tokens contain no digits or `@`,
    * so later patterns cannot re-match earlier redactions). */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, p, tok)) =>
      regexp_replace(acc, p, tok)
    }

  /** Blocklist filter signals (the C4-style bad-words pass): per-document
    * count and fraction of tokens on the list, plus a keep flag. Pure
    * array built-ins, one scan; the list is a broadcast-free literal. */
  def blocklistSignals(text: Column, words: Seq[String],
      maxRatio: Double = 0.0): Seq[Column] = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val flagged = size(filter(toks,
      t => array_contains(lit(words.toArray), t))).cast("long")
    val ratio = when(n > 0, flagged.cast("double") / n).otherwise(lit(0.0))
    Seq(n.as("n_tokens"), flagged.as("n_flagged"),
      ratio.as("flagged_ratio"), (ratio <= maxRatio).as("blocklist_keep"))
  }

  /** Character trigrams of the normalized text (overlapping, order kept;
    * texts shorter than 3 normalized chars yield an empty array). Custom
    * codegen'd one-scan expression: the composed transform(sequence(...),
    * i -> substr(nrm, i, 3)) re-evaluates the normalize() regex per
    * ELEMENT (interpreted lambda + projection collapse) — O(len²) per doc. */
  def charTrigrams(text: Column): Column =
    graft.functions.TextHashExprs.charGrams(normalize(text), 3)

  /** Corpus character-trigram model: total occurrence count per trigram
    * (the CCNet/KenLM-style LM signal, reduced to exact integer counts so
    * the score is cross-engine hash-verifiable — corpus-frequency mean
    * rather than log-prob, same ranking intent: gibberish has rare
    * trigrams). One explode + hash aggregation; map-side partial combine
    * keeps the shuffle at |vocab|, not |corpus|. */
  def trigramModel(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(charTrigrams(col(textCol))).as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("freq"))

  /** Per-document trigram quality score against a corpus model: mean and
    * rare-fraction of the corpus frequency of each trigram OCCURRENCE.
    * All-integer sums + one exact double division → bit-identical across
    * engines. Docs with no trigrams score NULL mean and 0 rare count.
    *
    * The model may come from a DIFFERENT corpus (the CCNet shape: score a
    * crawl against a clean reference model) — trigrams absent from the
    * model count with frequency 0, i.e. maximally rare; an inner join
    * would silently drop exactly the strongest gibberish evidence.
    *
    * Scale: the model is |vocab|-sized (bounded by ~alphabet³, typically
    * ≪ corpus) — Spark's AQE broadcasts it when small; the per-occurrence
    * join is an equi-join on the trigram key either way, never all-pairs. */
  def trigramQuality(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, rareMaxFreq: Long = 5L): DataFrame = {
    val occ = df.select(col(idCol).as("doc_id"),
      explode(charTrigrams(col(textCol))).as("trigram"))
    val scored = occ.join(model, Seq("trigram"), "left")
      .withColumn("freq", coalesce(col("freq"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("freq")).as("freq_sum"),
        sum((col("freq") <= rareMaxFreq).cast("long")).as("n_rare"))
    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("freq_sum"), lit(0L)).as("freq_sum"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        (col("freq_sum").cast("double") / col("n_trigrams")).as("avg_freq"),
        (coalesce(col("n_rare"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_trigrams"), lit(0L)), lit(1L)))
          .as("rare_ratio"))
  }

  /** Per-key trigram language model (the CCNet per-LANGUAGE shape:
    * one model per lang/source rather than one global model). Same
    * integer-count contract as [[trigramModel]], keyed by `model_key`. */
  def trigramModelPerKey(df: DataFrame, textCol: String,
      keyCol: String): DataFrame =
    df.select(col(keyCol).as("model_key"),
        explode(charTrigrams(col(textCol))).as("trigram"))
      .groupBy("model_key", "trigram").agg(count(lit(1)).as("freq"))

  /** Per-document trigram quality against the model OF ITS OWN KEY —
    * a zh doc scores against the zh model, never the en one (scoring a
    * minority language against the majority model misreads it as
    * gibberish, the exact failure CCNet's per-language models fix).
    * Same left-join + integer-sum discipline as [[trigramQuality]]; a
    * NULL key (or a key with no model rows) scores all-rare. The join
    * stays an equi-join on (key, trigram); the model remains
    * vocab-per-key sized, broadcastable by AQE. */
  def trigramQualityPerKey(df: DataFrame, idCol: String, textCol: String,
      keyCol: String, model: DataFrame, rareMaxFreq: Long = 5L): DataFrame = {
    val occ = df.select(col(idCol).as("doc_id"),
      col(keyCol).as("model_key"),
      explode(charTrigrams(col(textCol))).as("trigram"))
    val scored = occ.join(model, Seq("model_key", "trigram"), "left")
      .withColumn("freq", coalesce(col("freq"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("freq")).as("freq_sum"),
        sum((col("freq") <= rareMaxFreq).cast("long")).as("n_rare"))
    df.select(col(idCol).as("doc_id"), col(keyCol).as("model_key"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("model_key"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("freq_sum"), lit(0L)).as("freq_sum"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        (col("freq_sum").cast("double") / col("n_trigrams")).as("avg_freq"),
        (coalesce(col("n_rare"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_trigrams"), lit(0L)), lit(1L)))
          .as("rare_ratio"))
  }

  /** Readability signals (Flesch reading-ease family): sentence count
    * (terminator runs, min 1), word count, syllable estimate (vowel-group
    * runs per token, min 1 per word). Scores are the classic linear
    * formulas — every arithmetic step is one correctly-rounded IEEE op on
    * exact integer ratios, so the doubles hash-verify across engines. */
  def readabilitySignals(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val nSents = greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("long")
    val nSyll = aggregate(toks, lit(0L),
      (acc, t) => acc + greatest(regexp_count(t, lit("[aeiouy]+")), lit(1)))
    val wps = nWords.cast("double") / nSents
    val spw = nSyll.cast("double") / greatest(nWords, lit(1L))
    Seq(nWords.as("n_words"), nSents.as("n_sentences"),
      nSyll.as("n_syllables"),
      (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
        .as("flesch_reading_ease"),
      (lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
        .as("fk_grade_level"))
  }

  /** Overlapping fixed-token chunking (the RAG/embedding-prep shape):
    * chunk i covers tokens [i·stride, i·stride + chunkTokens), stride =
    * chunkTokens − overlap; a doc yields 1 + ⌈max(n − chunkTokens, 0) /
    * stride⌉ chunks (an empty doc yields none). Emits (doc_id, chunk_idx,
    * chunk_text, chunk_tokens).
    *
    * The token array is materialized (lineage cut) BEFORE the per-chunk
    * slices: the slicing lambda runs per chunk, and without the cut
    * projection collapse would inline the tokenizer into it — quadratic
    * in document length (the t10/s04 lesson). */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens > 0 and 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toked = df.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("__toks"))
      .transform(graft.core.Checkpoint.cut)
    val n = size(col("__toks")).cast("long")
    // integer ceil-div via exact double floor (token counts ≪ 2^53)
    val nChunks = lit(1L) +
      floor((greatest(n - chunkTokens, lit(0L)) + (stride - 1)) /
        lit(stride.toDouble)).cast("long")
    toked
      .select(col("doc_id"), col("__toks"),
        // n=0 → empty array (explode drops the doc); a bare
        // sequence(0, -1) would DESCEND, emitting phantom chunks
        explode(when(n > 0, sequence(lit(0L), nChunks - 1))
          .otherwise(array().cast("array<bigint>"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"),
        size(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)))
          .cast("long").as("chunk_tokens"))
  }

  /** Per-document top-k distinctive terms by tf·(N/df) — TF-IDF with the
    * UNLOGGED inverse document frequency, so every score is one exact
    * integer product and one IEEE division (ln() is not correctly-rounded
    * and differs across engines; the log-free variant keeps the signal
    * hash-verifiable). Ties → lexicographically first term. Shape: two
    * hash aggregations + an equi-join on the term key + bounded-heap
    * top-k — no all-pairs, no global sort. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
    graft.plans.TopKPerKey(scored, Seq("doc_id"),
      Seq(("tfidf", true), ("term", false)), k)
  }

  /** BPE pair statistics (the first tokenizer-training iteration): the
    * top-k adjacent character pairs by corpus occurrence count, each word
    * weighted by its frequency. Two hash aggregations — (word → count)
    * then (pair → Σ count·multiplicity) — so the pair explode runs over
    * the VOCABULARY (≪ corpus), plus a TakeOrderedAndProject merge.
    * Pairs come from the codegen'd one-scan [[graft.functions.CharGrams]]
    * kernel; ties → lexicographically first pair. */
  def bpePairStats(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("__wc"))
      .select(col("__wc"),
        explode(graft.functions.TextHashExprs.charGrams(col("word"), 2))
          .as("pair"))
      .groupBy(col("pair")).agg(sum(col("__wc")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(k)

  /** Full BPE tokenizer training (the iterated form of [[bpePairStats]]):
    * `numMerges` rounds of (count adjacent symbol pairs weighted by word
    * frequency → merge the most frequent pair, ties to the
    * lexicographically first (a, b)). Returns the learned merge table
    * (rank, sym_a, sym_b, pair_freq) — the tokenizer artifact.
    *
    * The scalable shape: ONE corpus pass aggregates the (word, freq)
    * table; every merge round then touches only that vocabulary-sized
    * frame (the classic trick real BPE trainers use — corpus size stops
    * mattering after the first aggregation). Each round is one small
    * aggregate + a driver argmax; the merge rewrite is a leftmost-first
    * scan per word — a Scala function over vocab rows (vocab-sized, NOT
    * corpus-sized, so the non-codegen cost is bounded). Lineage cuts every
    * ROUND keep the plan compilable. Determinism end to end: integer
    * frequencies, lexicographic tiebreaks, no sampling.
    *
    * `batch` > 1 amortizes the per-round driver round-trip + lineage cut
    * toward a production-sized vocab (30-50k merges): each round takes the
    * top-`batch` pairs in rank order and selects every pair that shares NO
    * symbol (operand or merged output) with ANY higher-ranked pair —
    * selected or skipped; the rest are skipped and re-measured next round
    * (the symbol-partitioned conflict rule — a hot symbol like 'e' no
    * longer ends the round at the first clash, so a round lands a large
    * fraction of its batch). Tainting skipped pairs' symbols too is what
    * keeps the batch faithful to sequential training: every selected pair
    * is independent of every pair the sequential trainer would have
    * considered before it, so its count and rewrite coincide with the
    * sequential run whenever the argmax picks do (the residual divergence —
    * pairs CREATED mid-round can't be seen until the next count — is the
    * standard batched-BPE tradeoff, shared with the prefix rule this
    * replaces). `batch = 1` (the default, and the oracle path) is exactly
    * the classic sequential trainer.
    *
    * Symbols are CODE POINTS (split(w, "") never separates a surrogate
    * pair), matching [[bpeEncode]] — astral-plane characters stay whole
    * symbols on both sides.
    *
    * CONTRACT NOTE — the `rank` column is batch-dependent: when an
    * independent pair follows a SKIPPED conflict inside a round, its rank
    * can permute relative to the `batch = 1` sequential order (disjoint
    * merges commute, so the encoding is unaffected — pinned in
    * TextAnalysisSpec). The stable cross-run artifact is the merge SET
    * (sym_a, sym_b, pair_freq), not the merge ORDER; consumers diffing
    * vocabularies across runs with different `batch` must compare by set
    * or re-rank by (pair_freq desc, sym_a, sym_b) — not by `rank`. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      batch: Int = 1): DataFrame = {
    require(batch >= 1, "batch must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // applies a round's selected merges in rank order, leftmost-first each
    val mergeBatchUdf = udf((syms: Seq[String], as: Seq[String], bs: Seq[String]) => {
      var cur = syms
      var j = 0
      while (j < as.length) {
        if (cur.length > 1) {
          val a = as(j); val b = bs(j)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < cur.length) {
            if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
              out += (a + b); i += 2 // leftmost-first, skip past the merge
            } else { out += cur(i); i += 1 }
          }
          cur = out.toSeq
        }
        j += 1
      }
      cur
    })
    var vocab = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("w"), "").as("syms"))
      .transform(graft.core.Checkpoint.cut)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val m = math.min(batch, numMerges - rank)
      val top = vocab
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0)))))
          .as("p"))
        .select(col("p")("0").as("a"), col("p")("1").as("b"), col("freq"))
        .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("a"), col("b"))
        .limit(m).collect()
      if (top.isEmpty) continue = false
      else {
        // rank-ordered independent subset: a pair sharing a symbol (operand
        // or merged output) with ANY higher-ranked pair — selected OR
        // skipped — is SKIPPED and re-measured next round. Tainting the
        // skipped pairs' symbols too is what makes the batch faithful:
        // every selected pair is then independent of every pair sequential
        // training would have considered before it, so its count and
        // rewrite match the sequential trainer's whenever the argmax picks
        // coincide. (Selected-only tainting admits a non-commuting chain:
        // with (e,s) > (s,t) > (t,h), skipping only (s,t) would let (t,h)
        // merge this round at a rank sequential training gives to (s,t) —
        // "st" then tokenizes differently. The first pair is always
        // independent of the empty prefix, so round progress is
        // guaranteed.)
        val touched = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        top.foreach { r =>
          val (a, b) = (r.getString(0), r.getString(1))
          if (!touched(a) && !touched(b) && !touched(a + b))
            sel += ((a, b, r.getLong(2)))
          touched ++= Seq(a, b, a + b)
        }
        sel.foreach { case (a, b, pf) =>
          merges += ((rank, a, b, pf)); rank += 1
        }
        vocab = vocab.select(col("freq"),
            mergeBatchUdf(col("syms"),
              typedLit(sel.map(_._1).toSeq), typedLit(sel.map(_._2).toSeq))
              .as("syms"))
          .transform(graft.core.Checkpoint.cut)
      }
    }
    merges.result().toDF("merge_rank", "sym_a", "sym_b", "pair_freq")
  }

  /** Viterbi segmentation of one word under a unigram-LM piece table —
    * the ONE decoding convention every unigram-LM path shares (trainer
    * E-step, [[unigramLmEncode]], and — independently reimplemented —
    * the t38 oracle replay): symbols are CODE POINTS
    * ([[codePointSplit]]); positions scanned left to right; at each end
    * position candidate pieces are tried LONGEST FIRST with
    * strictly-greater replacement, so an exact score tie keeps the
    * longest trailing piece — a deterministic convention, not midpoint
    * smoothing. Single-code-point pieces are always in the vocab (the
    * trainer guarantees it), so every word segments. */
  private[graft] def viterbiSegment(w: String, logp: Map[String, Double],
      maxLen: Int): Vector[String] = {
    val syms = codePointSplit(w)
    val n = syms.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen) // smallest j = longest piece first
      while (j < i) {
        logp.get(syms.slice(j, i).mkString) match {
          case Some(lp) if best(j) + lp > best(i) =>
            best(i) = best(j) + lp; back(i) = j
          case _ =>
        }
        j += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var k = n
    while (k > 0) { out = syms.slice(back(k), k).mkString :: out; k = back(k) }
    out.toVector
  }

  /** Unigram-LM (SentencePiece-family) tokenizer trainer — the OTHER
    * production tokenizer family beside BPE (t16): Kudo 2018's
    * seed-then-prune shape with hard (Viterbi) EM. Like [[bpeTrain]],
    * the corpus is read ONCE into the distinct (word, freq) table; every
    * later job is dictionary-sized, never corpus-sized:
    *
    *  1. SEED: every 1..seedMaxLen-code-point substring of every distinct
    *     word, occurrence-weighted by word frequency — all single
    *     code points (mandatory: they keep every word segmentable) plus
    *     the top `seedMultiCap` multi-symbol pieces by (count desc,
    *     piece asc).
    *  2. EM (×emIters per round): probabilities from current counts with
    *     Laplace smoothing — logp = ln((cnt+1)/(total+|vocab|)), exact
    *     longs through math.log, deterministic — then one distributed
    *     E-step: broadcast the logp table, [[viterbiSegment]] each
    *     DISTINCT word, aggregate freq-weighted piece counts (exact
    *     longs — order-free, so distributed ≡ single-node replay
    *     bit-exactly).
    *  3. PRUNE: keep single code points + the top
    *     max(vocabSize − #chars, ¾·#multi) multi-symbol pieces by
    *     (count desc, piece asc); repeat from 2 until the vocab fits.
    *
    * One final E-step refits counts over the final vocab; the output
    * (piece, cnt, logp) rows embed from the driver (vocab-sized). The
    * whole prune SEQUENCE is deterministic — UnigramLmSpec pins it and
    * the t38 oracle replays it independently. */
  def unigramLmTrain(df: DataFrame, textCol: String, vocabSize: Int,
      seedMaxLen: Int = 4, seedMultiCap: Int = 512,
      emIters: Int = 2): DataFrame = {
    require(vocabSize > 0 && seedMaxLen >= 2 && emIters >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .transform(graft.core.Checkpoint.cut)
    val subUdf = udf((w: String) => {
      val syms = codePointSplit(w)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        var l = 1
        while (l <= seedMaxLen && i + l <= syms.length) {
          out += syms.slice(i, i + l).mkString; l += 1
        }
        i += 1
      }
      out.toSeq
    })
    val cpLen = udf((s: String) => s.codePointCount(0, s.length))
    val seed = words
      .select(col("freq"), explode(subUdf(col("w"))).as("p"))
      .groupBy("p").agg(sum(col("freq")).as("cnt"))
      .transform(graft.core.Checkpoint.cut)
    // bounded collects: the alphabet, then the top-capped multi pieces
    val chars: Seq[(String, Long)] = seed.filter(cpLen(col("p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    require(chars.nonEmpty, "empty corpus: no symbols to seed from")
    require(vocabSize > chars.size,
      s"vocabSize $vocabSize must exceed the ${chars.size} mandatory " +
        "single-code-point pieces")
    val multi0: Seq[(String, Long)] = seed.filter(cpLen(col("p")) > 1)
      .orderBy(col("cnt").desc, col("p"))
      .limit(seedMultiCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    def cpn(s: String): Int = s.codePointCount(0, s.length)
    def estep(vc: Seq[(String, Long)]): Map[String, Long] = {
      val total = vc.map(_._2).sum
      val v = vc.size
      val logp = vc.map { case (p, c) =>
        p -> math.log((c + 1.0) / (total.toDouble + v)) }.toMap
      val maxLen = vc.map(p => cpn(p._1)).max
      val segUdf = udf((w: String) => viterbiSegment(w, logp, maxLen))
      words.select(col("freq"), explode(segUdf(col("w"))).as("p"))
        .groupBy("p").agg(sum(col("freq")).as("c"))
        .collect() // bounded by the current vocab, never the corpus
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    def refit(vc: Seq[(String, Long)], iters: Int): Seq[(String, Long)] = {
      var cur = vc
      (0 until iters).foreach { _ =>
        val got = estep(cur)
        cur = cur.map { case (p, _) => p -> got.getOrElse(p, 0L) }
      }
      cur
    }
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
    val total = fin.map(_._2).sum
    val v = fin.size
    fin.map { case (p, c) =>
      (p, c, math.log((c + 1.0) / (total.toDouble + v))) }
      .toDF("piece", "cnt", "logp")
  }

  /** Corpus encoding with a trained unigram-LM vocab — the companion of
    * [[unigramLmTrain]] and the t17 shape: [[viterbiSegment]] runs once
    * per DISTINCT word (the dictionary), the corpus-sized side is one
    * equi-join + hash aggregate. Returns (doc_id, n_tokens, n_pieces);
    * empty docs report zeros. */
  def unigramLmEncode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Double)]): DataFrame = {
    require(vocab.nonEmpty)
    val logp = vocab.toMap
    val maxLen = vocab.map(p => p._1.codePointCount(0, p._1.length)).max
    val nPiecesUdf = udf((w: String) =>
      viterbiSegment(w, logp, maxLen).length)
    val wordsAll = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("word"))
    val dict = wordsAll.select(col("word")).distinct()
      .withColumn("n_p", nPiecesUdf(col("word")).cast("long"))
    val agg = wordsAll.join(dict, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_p")).as("n_pieces"))
    df.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** Unigram-LM perplexity scoring — what CCNet actually filters on,
    * powered by [[unigramLmTrain]]'s vocab: each document's negative
    * log-likelihood under the trained piece LM (Viterbi-segmented) and
    * its per-piece average. Per-word NLL computes once per DISTINCT word
    * (left-to-right piece order — deterministic); the per-doc total
    * folds word contributions in SORTED (word, nll) order (the t28
    * discipline), so the model-dependent DOUBLE scores hash-verify
    * against the replay-literal twin. Returns (doc_id, n_tokens,
    * n_pieces, nll, avg_nll); empty docs report zeros with NULL avg. */
  def unigramLmScore(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Double)],
      passthrough: Seq[String] = Nil): DataFrame = {
    require(vocab.nonEmpty)
    val logp = vocab.toMap
    val maxLen = vocab.map(p => p._1.codePointCount(0, p._1.length)).max
    val segUdf = udf((w: String) => {
      val ps = viterbiSegment(w, logp, maxLen)
      (ps.length.toLong, -ps.map(logp).sum)
    })
    val words = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("word"))
    val dict = words.select(col("word")).distinct()
      .withColumn("__s", segUdf(col("word")))
      .select(col("word"), col("__s._1").as("n_p"), col("__s._2").as("w_nll"))
    val agg = words.join(dict, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_p")).as("n_pieces"),
        aggregate(
          array_sort(collect_list(struct(col("word"), col("w_nll")))),
          lit(0.0), (a, x) => a + x.getField("w_nll")).as("nll"))
    // passthrough columns ride the EXISTING doc-side join (column pruning
    // drops them from the explode branch) — a caller composing extra
    // per-doc columns (p09's loaded-model kernels) pays zero additional
    // exchanges instead of a corpus×corpus doc_id join
    df.select(col(idCol).as("doc_id") +: passthrough.map(col): _*)
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id") +: passthrough.map(col) :+
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens") :+
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces") :+
        coalesce(col("nll"), lit(0.0)).as("nll") :+
        when(coalesce(col("n_pieces"), lit(0L)) > 0,
          coalesce(col("nll"), lit(0.0)) /
            col("n_pieces").cast("double")).as("avg_nll"): _*)
  }

  /** Code-point split — the single-node twin of the trainer's
    * `split(w, "")` (Java-regex zero-width splits never separate a
    * surrogate pair), so [[bpeEncode]] and every oracle replay see the
    * SAME symbols as the distributed trainer for astral-plane characters.
    * A UTF-16 `w.map(_.toString)` would shatter them into lone
    * surrogates and silently diverge. */
  private[graft] def codePointSplit(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** BPE corpus encoding with a learned merge table — the companion of
    * [[bpeTrain]]: apply the merges in rank order to every word and
    * report per-doc token/subword budgets (what a tokenizer pass feeds
    * the packer). The encode closure runs once per DISTINCT word (the
    * dictionary), never per occurrence — the corpus-sized side is one
    * equi-join on the word plus a hash aggregate. Returns
    * (doc_id, n_tokens, n_subwords); empty docs report zeros. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val ms = merges.toIndexedSeq
    val nSubUdf = udf((w: String) => {
      var syms: Vector[String] = codePointSplit(w)
      ms.foreach { case (a, b) =>
        if (syms.length > 1) {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms.length
    })
    val words = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("word"))
    val dict = words.select(col("word")).distinct()
      .withColumn("n_sub", nSubUdf(col("word")).cast("long"))
    val agg = words.join(dict, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sub")).as("n_subwords"))
    df.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
  }

  /** Corpus vocabulary: top-k tokens by total frequency (ties →
    * lexicographic token order), with document frequency. Partial
    * aggregation map-side, then a TakeOrderedAndProject merge — no global
    * sort materializes at any corpus size. */
  def topTokens(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("__doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"), countDistinct(col("__doc")).as("doc_freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** Boolean AND retrieval over an implicit inverted index: for each
    * (query_id, terms) query, every document containing ALL the query's
    * terms, with the matched-term count. The training-data shape:
    * "find every doc mentioning X and Y" over a TB corpus without
    * building a serving index.
    *
    * Plan (100 TB shape): the term universe is a LITERAL IN-filter at the
    * scan (only matching tokens survive the explode), the query table is
    * a broadcast literal, and the single shuffle is the (query, doc)
    * groupBy — corpus-linear, no index materialization, no pairwise
    * anything. Integer-exact end to end. */
  def booleanSearch(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val spark = df.sparkSession
    import spark.implicits._
    val universe = queries.flatMap(_._2).distinct
    val qterms = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("query_id", "__t")
    val qsizes = queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("query_id", "__m")
    df.select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("__t"))
      .filter(col("__t").isin(universe: _*))
      .join(broadcast(qterms), Seq("__t"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms")) // distinct per doc by construction
      .join(broadcast(qsizes), Seq("query_id"))
      .filter(col("n_terms") === col("__m")) // AND semantics: all terms hit
      .select(col("query_id"), col("doc_id"), col("n_terms"))
  }

  /** BM25 top-k retrieval (Robertson/Spärck Jones; the standard lexical
    * ranking function) for a bounded literal query set over the corpus.
    *
    * EAGER: construction runs one bounded Spark job — the per-term
    * document frequencies (≤ |term universe| rows) and the corpus size
    * materialize up front so each term's IDF embeds as a LITERAL in the
    * plan (the same materialize-then-embed shape as the Bloom
    * decontaminator; it also keeps `ln` out of the distributed plan, so
    * an oracle can replay the exact same IDF doubles).
    *
    * Determinism contract (what makes this hash-verifiable cross-engine):
    * every floating-point step is either IEEE-identical given identical
    * inputs (+,*,/ on doubles, integer-exact tf/dl/N) or a driver-side
    * constant (the IDF literals); the per-query score folds the per-term
    * contributions in SORTED TERM ORDER (sort_array before the fold), so
    * float addition order is fixed — a bare SUM would hash-diverge at ulp
    * scale across engines.
    *
    * Plan (100 TB shape): term-universe IN-filter at the scan, one
    * (doc, term) tf aggregation, broadcast literal query table, one
    * (query, doc) score aggregation, then bounded-heap top-k per query
    * ([[graft.plans.TopKPerKey]] — never a full per-query sort).
    * Output: (query_id, doc_id, score, rank), rank 1-based best-first,
    * ties broken by doc_id. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val universe = queries.flatMap(_._2).distinct.sorted
    val base = df.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
    // integer-exact corpus stats; avgdl divides as double (IEEE-identical)
    val stats = base.agg(sum(col("__dl")).as("__sumdl"),
      count(lit(1)).as("__n"))
    val tf = base
      .select(col("doc_id"), col("__dl"), explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(universe: _*))
      .groupBy(col("doc_id"), col("__t"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val (idf, _, _) = bm25Idf(df, textCol, universe)
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val contrib = tf.crossJoin(broadcast(stats))
      .withColumn("__c",
        element_at(typedLit(idf), col("__t")) *
          (col("__tf").cast("double") * lit(k1 + 1.0)) /
          (col("__tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * (col("__dl").cast("double") / avgdl))))
      .select(col("doc_id"), col("__t"), col("__c"))
    val qterms = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("query_id", "__t")
    val scored = contrib.join(broadcast(qterms), Seq("__t"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        transform(
          sort_array(collect_list(struct(col("__t").as("t"), col("__c").as("c")))),
          x => x("c")),
        lit(0.0), (acc, x) => acc + x).as("score"))
    graft.plans.TopKPerKey(scored, Seq("query_id"),
      Seq(("score", true), ("doc_id", false)), k)
  }

  /** Positional phrase search: for each (phrase_id, words) phrase, every
    * document where the words appear CONSECUTIVELY, with the count of
    * distinct start positions. The dedup/contamination cousin of
    * [[booleanSearch]]: "which docs contain this exact boilerplate /
    * benchmark sentence", position-exact.
    *
    * Plan (100 TB shape): ONE positional explode of the corpus filtered
    * to the phrase-term universe at the scan; each occurrence of phrase
    * word w_j at position p votes for start p-j via a broadcast literal
    * (phrase, word, offset) table; a start with all m votes is a match.
    * One (phrase, doc, start) groupBy + one (phrase, doc) count — never
    * a positional self-join per phrase word. Integer-exact. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[(Int, Seq[String])]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_._2.nonEmpty),
      "every phrase needs at least one word")
    val spark = df.sparkSession
    import spark.implicits._
    val universe = phrases.flatMap(_._2).distinct
    // (phrase, word, offset, m): one row per phrase POSITION (a repeated
    // word carries each of its offsets)
    val qpos = phrases.flatMap { case (q, ws) =>
      ws.zipWithIndex.map { case (w, j) => (q, w, j, ws.length) } }
      .toDF("phrase_id", "__t", "__off", "__m")
    df.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__t")))
      .filter(col("__t").isin(universe: _*))
      .join(broadcast(qpos), Seq("__t"))
      // negative starts can never complete a phrase — drop those votes
      // BEFORE the shuffle, not after the aggregation
      .filter(col("__pos") >= col("__off"))
      .groupBy(col("phrase_id"), col("doc_id"),
        (col("__pos") - col("__off")).as("__start"), col("__m"))
      .agg(count(lit(1)).as("__votes")) // offset j votes iff token(start+j)=w_j — once each
      .filter(col("__votes") === col("__m"))
      .groupBy(col("phrase_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Kneser-Ney-style n-gram LM count table — the integer core of KenLM
    * (or any interpolated-KN) training: per n-gram, its raw corpus count
    * and the CONTINUATION statistics of its (n-1)-gram suffix (how many
    * DISTINCT left contexts precede it — the count KN backs off to,
    * Kneser & Ney 1995). Top-k by count (ties → lexicographic n-gram) so
    * the artifact is bounded at any corpus size; integer-exact end to
    * end.
    *
    * Plan (100 TB shape): one positional n-gram explode (list-local) into
    * ONE (ngram) count groupBy — the persisted count table any KenLM
    * pipeline writes (materialized once, lineage cut). Because an n-gram
    * IS its (context, suffix) pair, the continuation stats are a
    * row-count re-aggregation of that table's suffix column — the raw
    * gram stream is never aggregated twice and countDistinct never runs.
    * The suffix join touches only the k TakeOrdered survivors. */
  def ngramLmCounts(df: DataFrame, textCol: String, n: Int,
      k: Int): DataFrame = {
    require(n >= 2, "n-gram order must be >= 2 (the suffix needs a context)")
    val counts = df.select(explode(graft.functions.TextHashExprs
        .wordNgrams(normalize(col(textCol)), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("count"))
      // the (n-1)-gram suffix this n-gram continues
      .withColumn("suffix", substring_index(col("ngram"), " ", -(n - 1)))
      .transform(graft.core.Checkpoint.cut) // feeds two branches below
    // N1+(• suffix), the count KN backs off to: each `counts` row is a
    // DISTINCT ngram = a distinct (left context, suffix) pair, so distinct
    // contexts per suffix is a plain row count over the count table
    val continuation = counts.groupBy(col("suffix"))
      .agg(count(lit(1)).as("n_contexts"))
    counts.orderBy(col("count").desc, col("ngram")).limit(k)
      .join(continuation, Seq("suffix"))
      .select(col("ngram"), col("count"), col("suffix"), col("n_contexts"))
      .orderBy(col("count").desc, col("ngram"))
  }

  /** The BM25 IDF table for a term universe: one bounded job computing
    * (N, df per term), folded to idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))
    * in the DRIVER — ≤ |universe| values, embedded as plan literals by
    * [[bm25TopK]] and replayed verbatim by its oracle generator. Returns
    * (idf map, N, df map). */
  def bm25Idf(df: DataFrame, textCol: String,
      universe: Seq[String]): (Map[String, Double], Long, Map[String, Long]) = {
    // ONE corpus pass: every doc emits its matching distinct terms plus a
    // sentinel (it contains a space, which no whitespace-split token can),
    // so the sentinel's group count IS the corpus size N
    val sentinel = " N "
    val rows = df
      .select(explode(concat(array(lit(sentinel)),
        array_intersect(array_distinct(tokens(col(textCol))),
          typedLit(universe)))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows(sentinel)
    val dfCounts = rows - sentinel
    val idf = universe.map { t =>
      val d = dfCounts.getOrElse(t, 0L).toDouble
      t -> math.log((n - d + 0.5) / (d + 0.5) + 1.0)
    }.toMap
    (idf, n, dfCounts)
  }

  /** Token frequency-of-frequency spectrum (the Zipf/Good-Turing corpus
    * profile: how many distinct tokens occur exactly f times, and how much
    * token mass that bin carries). The classic corpus-health readout —
    * singleton share flags OCR noise / boilerplate floods before training.
    * Integer-exact end to end. Shape: token groupBy (partial agg map-side)
    * → re-agg on the tiny f domain — the second exchange carries one row
    * per DISTINCT frequency, negligible at any corpus size. */
  def freqSpectrum(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__f"))
      .groupBy("__f").agg(count(lit(1)).as("n_tokens"))
      .select(col("__f").as("f"), col("n_tokens"),
        (col("__f") * col("n_tokens")).as("mass"))

  /** KMV (k-minimum-values) distinct-token sketch per stratum — the
    * bounded-memory cardinality estimator (Bar-Yossef et al. 2002): keep
    * the k smallest distinct xxhash64 values per stratum; the kth smallest,
    * normalized into (0,1], estimates distinct = (k-1)/u_k. Unlike exact
    * `countDistinct`, state per stratum is k longs — mergeable, and the
    * same sketch at 500 rows or 100 TB. Deterministic end to end (a pure
    * function of the hash set), so the sketch itself is hash-verifiable
    * against an engine-portable XXH64 twin.
    *
    * Shape: explode → (stratum, hash) distinct (partial-agg dedup
    * map-side) → bounded-heap k-min per stratum ([[graft.plans.TopKPerKey]]
    * on the unsigned order) → one row per stratum. Output:
    * (stratum, n_sketch, kth_hash, est_distinct); strata with fewer than k
    * distinct hashes report their exact count. */
  def kmvDistinctTokens(df: DataFrame, strataCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val hashed = df
      .select(col(strataCol).as("stratum"),
        explode(tokens(col(textCol))).as("__tok"))
      .select(col("stratum"), xxhash64(col("__tok")).as("__h"))
      .distinct()
      // flip the sign bit: signed order over __hu == unsigned order over __h
      .withColumn("__hu", col("__h").bitwiseXOR(lit(Long.MinValue)))
    val kept = graft.plans.TopKPerKey(
      hashed, Seq("stratum"), Seq(("__hu", false)), k)
    // kth smallest unsigned = max kept; back to the signed hash for output
    val agg = kept.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_sketch"),
        max(col("__hu")).as("__kthu"))
      .withColumn("kth_hash", col("__kthu").bitwiseXOR(lit(Long.MinValue)))
    agg.select(col("stratum").as(strataCol), col("n_sketch"),
      col("kth_hash"),
      kmvEstimate(col("n_sketch"), col("kth_hash"), k).as("est_distinct"))
  }

  /** KMV estimate from a finished sketch (n_sketch, kth_hash): exact below
    * k, else (k-1)/u_k with u_k = (U+1)/2^64 computed from the sign-flipped
    * kth = U - 2^63 — every step a single correctly-rounded IEEE op on the
    * same inputs in any engine (long→double, + 2^63, + 1, / exact 2^64),
    * which is what lets the estimate hash-verify. Shared by the batch
    * bounded-heap path and the [[graft.functions.Aggregators.KmvSketch]]
    * aggregator (streaming) path. */
  private[graft] def kmvEstimate(n: Column, kthHash: Column, k: Int): Column = {
    val u = (kthHash.bitwiseXOR(lit(Long.MinValue)).cast("double")
      + lit(9.223372036854776e18) + lit(1.0)) / lit(1.8446744073709552e19)
    when(n < k, n.cast("double")).otherwise(lit((k - 1).toDouble) / u)
  }

  /** The Gopher rule set's 8-word stopword list (Rae et al. 2021, §A1.1):
    * a doc must contain at least two of these to pass the stopword rule. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule thresholds (Rae et al. 2021, §A1.1), named
    * once so the Scala defaults and the DuckDB oracle interpolate the
    * SAME constants — a threshold change cannot leave the twin at a
    * stale literal (the gopherRepetitionBars discipline, applied here). */
  val gopherMinWords = 50L
  val gopherMaxWords = 100000L
  val gopherMeanWordLenMin = 3.0
  val gopherMeanWordLenMax = 10.0
  val gopherMaxSymbolRatio = 0.1
  val gopherMinAlphaRatio = 0.80
  val gopherMaxBulletRatio = 0.90
  val gopherMaxEllipsisRatio = 0.30

  /** The C4 cleaning thresholds (Raffel et al. 2020, §2.2) — same
    * shared-constant discipline as the Gopher bars above. */
  val c4MinLineWords = 3
  val c4MinSentences = 5

  /** Gopher-style document quality rules (Rae et al. 2021, appendix A1.1),
    * surfaced as the per-rule signal, the per-rule verdict, and the
    * composite `gopher_pass` — the standard pre-training keep/drop gate.
    * Differences from [[qualitySignals]] (t01): these are the PAPER's
    * named rules with its thresholds, including the LINE-level rules
    * (bullet-start / ellipsis-end fractions) t01 has no counterpart for.
    *
    * Every signal is an integer count or a single int/int IEEE division,
    * so the DOUBLE ratios hash-verify bit-for-bit against the SQL twin.
    * "Alphabetic" is judged as ASCII `[a-z]` over the NORMALIZED
    * (lowercased) tokens — a documented heuristic, matched exactly by the
    * oracle. Pure codegen'd column expressions over one scan: no UDF, no
    * shuffle (exchange budget 0).
    *
    * Thresholds default to the paper's values; `minStopHits` is
    * parameterized because corpora whose token distribution lacks the
    * English function words (synthetic or non-English corpora) would
    * otherwise fail the composite uniformly — the driver fixture uses 1.
    */
  def gopherSignals(text: Column, minWords: Long = gopherMinWords,
      maxWords: Long = gopherMaxWords, minStopHits: Long = 2L): Seq[Column] = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val meanLen = when(nWords > 0,
      length(concat_ws("", toks)).cast("double") / nWords).otherwise(lit(0.0))
    // symbols: '#', the three-dot ellipsis (non-overlapping, left-to-right
    // — both engines' replace contract), and U+2026
    val nHash = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val nDots = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val nUEll = (length(text) -
      length(regexp_replace(text, "…", ""))).cast("long")
    val symRatio = (nHash + nDots + nUEll).cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val alphaRatio = when(nWords > 0,
      alphaWords.cast("double") / nWords).otherwise(lit(0.0))
    val stopHits = size(array_intersect(array_distinct(toks),
      lit(gopherStopwords.toArray))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => {
      val t = ltrim(l)
      t.startsWith("-") || t.startsWith("*") || t.startsWith("•")
    })).cast("long")
    val ellLines = size(filter(lines, l => {
      val t = rtrim(l)
      t.endsWith("...") || t.endsWith("…")
    })).cast("long")
    val bulletRatio = bulletLines.cast("double") / greatest(nLines, lit(1L))
    val ellRatio = ellLines.cast("double") / greatest(nLines, lit(1L))
    val okWords = nWords >= minWords && nWords <= maxWords
    val okMeanLen = meanLen >= gopherMeanWordLenMin &&
      meanLen <= gopherMeanWordLenMax
    val okSymbols = symRatio <= gopherMaxSymbolRatio
    val okAlpha = alphaRatio >= gopherMinAlphaRatio
    val okStops = stopHits >= minStopHits
    val okBullets = bulletRatio <= gopherMaxBulletRatio
    val okEllipsis = ellRatio <= gopherMaxEllipsisRatio
    Seq(
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"), alphaRatio.as("alpha_word_ratio"),
      stopHits.as("stop_hits"), bulletRatio.as("bullet_ratio"),
      ellRatio.as("ellipsis_line_ratio"),
      okWords.as("ok_words"), okMeanLen.as("ok_mean_len"),
      okSymbols.as("ok_symbols"), okAlpha.as("ok_alpha"),
      okStops.as("ok_stops"), okBullets.as("ok_bullets"),
      okEllipsis.as("ok_ellipsis"),
      (okWords && okMeanLen && okSymbols && okAlpha && okStops &&
        okBullets && okEllipsis).as("gopher_pass"))
  }

  /** Page-level phrases whose presence anywhere in the lowercased text
    * drops the document under the C4 rules (Raffel et al. 2020 §2.2's
    * boilerplate/placeholder classes, as a fixed documented list). */
  val c4PagePhrases: Seq[String] =
    Seq("lorem ipsum", "terms of use", "privacy policy", "cookie policy")

  /** C4-style line + page cleaning (Raffel et al. 2020, §2.2) — the third
    * member of the paper-named gate family next to [[gopherSignals]] and
    * [[gopherRepetitionSignals]]. Line rules (each line space-trimmed):
    * keep iff it ends in terminal punctuation (`.` `!` `?` `"`), has at
    * least `minLineWords` whitespace words, and does not contain
    * `javascript` (case-insensitive). Page rules: keep iff the cleaned
    * page has at least `minSentences` sentences (terminal-punctuation
    * count over kept lines), contains no `{`, and contains none of
    * [[c4PagePhrases]] (case-insensitive). The output carries the CLEANED
    * text (kept lines joined by `\n`), the per-stage counters, and the
    * composite `c4_keep` — documented deterministic heuristics, mirrored
    * exactly by the oracle.
    *
    * Pure per-row codegen column expressions over one scan — zero
    * exchanges at any corpus size (the same 100 TB shape as t29/t30). */
  def c4Signals(text: Column, minLineWords: Int = c4MinLineWords,
      minSentences: Int = c4MinSentences): Seq[Column] = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    def keepLine(l: Column): Column = {
      val punct = l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")
      val words = size(filter(split(l, " "), w => length(w) > 0))
      punct && words >= minLineWords && !lower(l).contains("javascript")
    }
    val kept = filter(lines, keepLine(_))
    val cleanText = array_join(kept, "\n")
    // sentences = terminal-punctuation marks in the kept text
    val nSentences = (length(cleanText) -
      length(regexp_replace(cleanText, "[.!?]", ""))).cast("long")
    val lowered = lower(text)
    val noBrace = !text.contains("{")
    val noPhrase = c4PagePhrases.map(p => !lowered.contains(p)).reduce(_ && _)
    val keep = nSentences >= minSentences && noBrace && noPhrase
    Seq(
      cleanText.as("clean_text"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      nSentences.as("n_sentences"),
      noBrace.as("ok_no_brace"),
      noPhrase.as("ok_no_phrases"),
      keep.as("c4_keep"))
  }

  /** Gopher REPETITION rules (Rae et al. 2021, appendix A1.1 — the other
    * half of the rule set next to [[gopherSignals]]' quality rules):
    * duplicate line/paragraph fractions (row-count and char-weighted),
    * the top-{2,3,4}-gram character fractions, the duplicate
    * {5..10}-gram character fractions, and the composite `rep_pass` at
    * the paper's thresholds.
    *
    * Definitions (documented heuristics, mirrored exactly by the oracle):
    * lines are space-trimmed non-empty `\n` splits, paragraphs the same
    * over `\n\n`; duplicate-X char fraction = chars in occurrences AFTER
    * the first / chars in all occurrences; the top-n-gram char fraction
    * is count(top gram) x length(top gram) over the normalized text
    * length, where the top gram is the lexicographically-FIRST gram of
    * maximal count (a total order, deterministic on both engines). Every
    * ratio is a single long/long IEEE division, so the DOUBLEs
    * hash-verify bit-for-bit.
    *
    * Shape: ONE codegen kernel pass per row
    * ([[graft.functions.TextHashKernels.gopherRepetition]]) emitting all
    * 13 signals as an array slot — zero exchanges at any corpus size.
    * The interpreted higher-order-function formulation (9 wordNgrams
    * arrays + 3 array_sorts + 8 array_distincts) measured 9.85 s at
    * sf0.1; the kernel's two-step projection keeps it to one kernel call
    * per row (CollapseProject will not merge a multiply-referenced
    * non-trivial alias back into 13 copies). */
  /** Kernel slot names, in [[graft.functions.TextHashKernels.gopherRepetition]]
    * order — shared by [[gopherRepetitionSignals]] and composed gates. */
  val gopherRepetitionNames: Seq[String] =
    Seq("dup_line_frac", "dup_line_char_frac",
      "dup_para_frac", "dup_para_char_frac") ++
    (2 to 4).map(n => s"top_${n}gram_char_frac") ++
    (5 to 10).map(n => s"dup_${n}gram_char_frac")

  /** The paper's thresholds, rule for rule (same order as the names). */
  val gopherRepetitionBars: Seq[Double] =
    Seq(0.30, 0.20, 0.30, 0.20) ++ Seq(0.20, 0.18, 0.16) ++
    Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)

  def gopherRepetitionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val names = gopherRepetitionNames
    val bars = gopherRepetitionBars
    val staged = df.select(col(idCol),
      graft.functions.TextHashExprs.gopherRepetition(col(textCol)).as("__r"))
    val sigCols = names.zipWithIndex.map { case (nm, i) =>
      element_at(col("__r"), i + 1).as(nm) }
    val pass = names.zipWithIndex.map { case (_, i) =>
      element_at(col("__r"), i + 1) <= bars(i) }.reduce(_ && _)
    staged.select(col(idCol) +: sigCols :+ pass.as("rep_pass"): _*)
  }

  /** Per-document bigram LM fluency score — the CCNet-style "score every
    * doc under a corpus LM" quality pass, with the corpus itself as the
    * training set. The model is an add-one-smoothed bigram model:
    *
    *   p(w2 | w1) = (C(w1 w2) + 1) / (C(w1 ·) + V)
    *
    * with C(w1 ·) the token-count of bigrams continuing w1 and V the
    * number of distinct continuation words in the corpus. The score is the
    * MEAN conditional probability over the doc's bigram occurrences —
    * deliberately the arithmetic mean of p, not log-perplexity: ln() is
    * not correctly-rounded IEEE and JVM fdlibm vs DuckDB libm diverge at
    * ulp scale, while every op here (int→double casts, one division per
    * distinct bigram, multiply by the occurrence count, an order-fixed
    * sum) IS correctly rounded — so even the model-dependent DOUBLE score
    * hash-verifies bit-for-bit. Per doc the contributions fold in SORTED
    * bigram order (distinct bigrams — a total order), the same discipline
    * as [[bm25TopK]].
    *
    * Shape (the KenLM-training join plan): one gram scan → (doc, bigram)
    * partial-agg counts (lineage cut: feeds the corpus model AND the
    * scoring join) → bigram model re-agg → context re-agg → V as a 1-row
    * broadcast — then score via two model joins keyed on the bigram/
    * context and one per-doc fold. The model tables scale with DISTINCT
    * grams, not corpus size; nothing collects to the driver. Docs with
    * fewer than 2 tokens have no bigrams and are absent from the output
    * (documented; the oracle inner-joins identically). */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docBigrams = df.select(col(idCol).as("__id"),
        explode(graft.functions.TextHashExprs
          .wordNgrams(normalize(col(textCol)), 2)).as("bigram"))
      .groupBy(col("__id"), col("bigram")).agg(count(lit(1)).as("cnt"))
      .transform(graft.core.Checkpoint.cut) // feeds model AND scoring
    val bigramCounts = docBigrams.groupBy(col("bigram"))
      .agg(sum(col("cnt")).as("cb"))
      .withColumn("ctx", substring_index(col("bigram"), " ", 1))
      .transform(graft.core.Checkpoint.cut) // feeds context agg AND join
    val contextCounts = bigramCounts.groupBy(col("ctx"))
      .agg(sum(col("cb")).as("cu"))
    val vocab = bigramCounts
      .agg(count_distinct(substring_index(col("bigram"), " ", -1)).as("v"))
    val contrib = docBigrams
      .join(bigramCounts, Seq("bigram"))
      .join(contextCounts, Seq("ctx"))
      .crossJoin(broadcast(vocab))
      .select(col("__id"), col("bigram"), col("cnt"),
        (col("cnt").cast("double") *
          ((col("cb").cast("double") + lit(1.0)) /
            (col("cu") + col("v")).cast("double"))).as("c"))
    contrib.groupBy(col("__id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        aggregate(
          array_sort(collect_list(struct(col("bigram"), col("c")))),
          lit(0.0), (a, x) => a + x.getField("c")).as("__s"))
      .select(col("__id").as(idCol), col("n_bigrams"),
        (col("__s") / col("n_bigrams").cast("double")).as("lm_score"))
  }

  /** FIT of the learned quality classifier (the DCLM / FineWeb-Edu
    * workhorse shape: a linear model over hashed word-gram features, the
    * fastText feature space): multinomial Naive Bayes with Laplace
    * smoothing — a LINEAR classifier in log space, whose fit is ONE
    * gram-level aggregate (the directive-shaped 100 TB fit: partial
    * map-side combine collapses each partition to ≤ dim+1 rows before the
    * single shuffle). Features are every occurrence of every word n-gram
    * of orders 1..maxN, hashed into `dim` buckets (dim a power of two).
    *
    * Labels come from any boolean Column over the same rows (the standard
    * seed-labeling trick: an existing rule gate such as t29's
    * `gopher_pass` provides weak supervision and the learned model
    * smooths/generalizes it). A sentinel bucket id `dim` rides in the
    * same exploded stream once per document, so the per-class DOCUMENT
    * counts (for the bias) come out of the same single aggregate — no
    * second job. The ≤ dim+1 result rows materialize on the driver and
    * the weights embed as plan literals (the bounded
    * materialize-then-embed shape of bm25Idf / bloomBitsOf, documented
    * there and in PlanLintSpec's collect audit).
    *
    * Weights: w[b] = ln((pos_b+1)/(posTot+dim)) − ln((neg_b+1)/(negTot+dim)),
    * bias = ln((posDocs+1)/(negDocs+1)); keep ⇔ score > 0 — exact NB
    * decision rule. Counts are exact longs, so the fit is deterministic:
    * re-running it on the same data reproduces bit-identical doubles. */
  def qualityClassifierFit(df: DataFrame, textCol: String, label: Column,
      dim: Int = 1024, maxN: Int = 2): (Array[Double], Double) = {
    val (pos, neg, posDocs, negDocs) =
      hashedGramClassCounts(df, textCol, label, dim, maxN)
    val posTot = pos.sum; val negTot = neg.sum
    val w = Array.tabulate(dim)(b =>
      math.log((pos(b) + 1.0) / (posTot + dim)) -
        math.log((neg(b) + 1.0) / (negTot + dim)))
    (w, math.log((posDocs + 1.0) / (negDocs + 1.0)))
  }

  /** The shared gram-level class-count aggregate of
    * [[qualityClassifierFit]] and [[dsirFit]]: per hashed-gram bucket,
    * the occurrence counts in label-true vs label-false documents, plus
    * the per-class DOCUMENT counts via the sentinel bucket `dim`. ONE
    * aggregate, ≤ dim+1 result rows on the driver (partial map-side
    * combine collapses each partition before the single shuffle — the
    * 100 TB fit shape). */
  private def hashedGramClassCounts(df: DataFrame, textCol: String,
      label: Column, dim: Int, maxN: Int)
      : (Array[Long], Array[Long], Long, Long) = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two")
    val buckets = graft.functions.TextHashExprs.hashedGramBuckets(
      normalize(col(textCol)), dim, maxN)
    // the label MUST be projected in its own step BELOW the explode: a
    // non-trivial expression selected alongside a generator ends up
    // re-evaluated per GENERATED row (measured: the gopher_pass label ×
    // ~200 grams/doc turned a 0.7 s fit into 30 s); pre-projected, it
    // runs once per document and the Generate merely replicates the value
    val rows = df.select(col(textCol), label.as("__y"))
      .select(col("__y"),
        explode(concat(buckets, array(lit(dim)))).as("__b"))
      .groupBy(col("__b"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__neg"))
      .collect() // bounded: ≤ dim+1 rows (the gram-level model aggregate)
    var posDocs = 0L; var negDocs = 0L
    val pos = new Array[Long](dim); val neg = new Array[Long](dim)
    rows.foreach { r =>
      val b = r.getInt(0); val p = r.getLong(1); val g = r.getLong(2)
      if (b == dim) { posDocs = p; negDocs = g }
      else { pos(b) = p; neg(b) = g }
    }
    (pos, neg, posDocs, negDocs)
  }

  /** FIT of one [[qualityClassifierFit]]-shaped NB model PER CLASS (the
    * CCNet deployment shape: each language gets its own quality model,
    * fitted only on that language's documents) — still ONE gram-level
    * aggregate: the per-(class × label) occurrence counts ride as 2C agg
    * columns of the same explode (classes are a bounded label universe,
    * collected first; the sentinel bucket `dim` carries per-class
    * document counts). ≤ dim+1 result rows; exact long counts through
    * math.log — deterministic. Rows with a NULL class contribute to no
    * model. Returns (class, weights, bias) sorted by class — the same
    * label order [[langIdFit]] produces, so routing by predicted class
    * aligns by construction. */
  def perClassClassifierFit(df: DataFrame, textCol: String,
      classCol: String, label: Column, dim: Int = 1024,
      maxN: Int = 2): Seq[(String, Array[Double], Double)] = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two")
    val classes = df.select(col(classCol).cast("string")).na.drop()
      .distinct().collect().map(_.getString(0)).sorted // bounded label set
    require(classes.nonEmpty, s"no non-null classes in $classCol")
    val buckets = graft.functions.TextHashExprs.hashedGramBuckets(
      normalize(col(textCol)), dim, maxN)
    val aggs = classes.toIndexedSeq.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(when(col("__c") === c && col("__y"), 1L).otherwise(0L))
          .as(s"__p_$i"),
        sum(when(col("__c") === c && !col("__y"), 1L).otherwise(0L))
          .as(s"__n_$i")) }
    // label/class pre-projected BELOW the explode (the Generate
    // re-evaluation trap documented at hashedGramClassCounts)
    val rows = df.select(col(textCol),
        col(classCol).cast("string").as("__c"),
        coalesce(label, lit(false)).as("__y"))
      .select(col("__c"), col("__y"),
        explode(concat(buckets, array(lit(dim)))).as("__b"))
      .groupBy(col("__b")).agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: <= dim+1 rows (the gram-level model aggregate)
    val pos = classes.map(_ => new Array[Long](dim))
    val neg = classes.map(_ => new Array[Long](dim))
    val posDocs = new Array[Long](classes.length)
    val negDocs = new Array[Long](classes.length)
    rows.foreach { r =>
      val b = r.getInt(0)
      classes.indices.foreach { i =>
        val p = r.getLong(1 + 2 * i); val n = r.getLong(2 + 2 * i)
        if (b == dim) { posDocs(i) = p; negDocs(i) = n }
        else { pos(i)(b) = p; neg(i)(b) = n }
      }
    }
    classes.indices.map { i =>
      val pTot = pos(i).sum; val nTot = neg(i).sum
      val w = Array.tabulate(dim)(b =>
        math.log((pos(i)(b) + 1.0) / (pTot + dim)) -
          math.log((neg(i)(b) + 1.0) / (nTot + dim)))
      (classes(i), w, math.log((posDocs(i) + 1.0) / (negDocs(i) + 1.0)))
    }.toSeq
  }

  /** FIT of DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): two bag-of-hashed-
    * ngrams models — the TARGET distribution p̂ (documents matching the
    * `target` label, e.g. a trusted source) and the RAW distribution q̂
    * (the WHOLE corpus, target included — DSIR's raw side is the source
    * pool itself, unlike the NB classifier's complement class) — each
    * Laplace-smoothed over the same `dim` hashed buckets. The per-bucket
    * log importance ratio ln p̂(b) − ln q̂(b) is the model; a document's
    * log importance weight is its feature-count dot product with it.
    * Same single gram-level aggregate as the classifier fit; exact long
    * counts through math.log make the fit deterministic. */
  def dsirFit(df: DataFrame, textCol: String, target: Column,
      dim: Int = 1024, maxN: Int = 2): Array[Double] = {
    val (pos, neg, _, _) =
      hashedGramClassCounts(df, textCol, target, dim, maxN)
    val tgtTot = pos.sum; val allTot = tgtTot + neg.sum
    Array.tabulate(dim)(b =>
      math.log((pos(b) + 1.0) / (tgtTot + dim)) -
        math.log((pos(b) + neg(b) + 1.0) / (allTot + dim)))
  }

  /** FIT of the learned language identifier (the fastText-lid shape at
    * word granularity): MULTICLASS multinomial Naive Bayes over the same
    * hashed word-gram feature space as the quality classifier — one
    * weight vector and prior per language. ONE gram-level aggregate with
    * a per-class count column (classes are a bounded label universe,
    * collected first); the sentinel bucket `dim` carries per-class
    * DOCUMENT counts for the priors. ≤ dim+1 result rows; weights embed
    * as plan literals. Exact long counts through math.log — the fit is
    * deterministic. Returns (label, weights, logPrior) sorted by label
    * (the tie-break order of [[langIdScore]]). */
  /** Identifier-safe column suffix per class label, shared by the engine
    * ([[langIdScore]]'s `score_<sfx>` columns) and the generated DuckDB
    * twin's CTE/column names: the case-folded labels themselves when
    * EVERY label is a plain lowercase identifier and they stay distinct
    * after folding (the common lang-code case — zero renaming), else
    * positional `c<i>` for ALL labels (all-or-nothing, so a real label
    * can never collide with a positional name). A label with spaces,
    * quotes, or case that collides under DuckDB's identifier lowercasing
    * can no longer break the fit aggregate or the generated SQL; labels
    * surface as VALUES (pred_lang) untouched. */
  private[graft] def labelSuffixes(labels: Seq[String]): Seq[String] = {
    val folded = labels.map(_.toLowerCase)
    val allSafe = folded.forall(_.matches("[a-z][a-z0-9_]*")) &&
      folded.distinct.size == folded.size
    if (allSafe) folded else labels.indices.map(i => s"c$i")
  }

  def langIdFit(df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 256, maxN: Int = 2): Seq[(String, Array[Double], Double)] = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two")
    val classes = df.select(col(labelCol).cast("string")).na.drop()
      .distinct().collect().map(_.getString(0)).sorted // bounded label set
    require(classes.nonEmpty, s"no non-null labels in $labelCol")
    val buckets = graft.functions.TextHashExprs.hashedGramBuckets(
      normalize(col(textCol)), dim, maxN)
    // positional aliases — a label is data, never an identifier (the
    // result rows are read positionally below anyway)
    val aggs = classes.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      sum(when(col("__y") === c, 1L).otherwise(0L)).as(s"__c_$i") }
    val rows = df.select(col(textCol), col(labelCol).cast("string").as("__y"))
      .select(col("__y"),
        explode(concat(buckets, array(lit(dim)))).as("__b"))
      .groupBy(col("__b")).agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: ≤ dim+1 rows (the gram-level model aggregate)
    val cnt = classes.map(_ => new Array[Long](dim))
    val docs = new Array[Long](classes.length)
    rows.foreach { r =>
      val b = r.getInt(0)
      classes.indices.foreach { i =>
        val v = r.getLong(i + 1)
        if (b == dim) docs(i) = v else cnt(i)(b) = v
      }
    }
    val totalDocs = docs.sum
    classes.indices.map { i =>
      val tot = cnt(i).sum
      val w = Array.tabulate(dim)(b =>
        math.log((cnt(i)(b) + 1.0) / (tot + dim)))
      (classes(i), w,
        math.log((docs(i) + 1.0) / (totalDocs.toDouble + classes.length)))
    }.toSeq
  }

  /** APPLY of the learned language identifier: one zero-exchange scan
    * with C [[graft.functions.TextHashExprs.hashedGramScore]] kernel
    * columns (whole-stage codegen's subexpression elimination shares the
    * gram stream) and the argmax resolved as first-maximum in
    * label-ascending order (coalesced WHENs — a deterministic tie-break
    * the SQL twin reproduces with the same CASE chain). Passthrough
    * columns ride along so callers can compare pred vs truth without a
    * join. */
  def langIdScore(df: DataFrame, idCol: String, textCol: String,
      models: Seq[(String, Array[Double], Double)],
      passthrough: Seq[String] = Nil, maxN: Int = 2): DataFrame = {
    require(models.nonEmpty)
    // NULL text ≡ empty text (the oracle's COALESCE-to-bare-prior
    // contract): a gram-less doc scores each class at its prior
    val norm = normalize(coalesce(col(textCol), lit("")))
    val sfx = labelSuffixes(models.map(_._1))
    val scoreCols = models.zip(sfx).map { case ((_, w, b), s) =>
      graft.functions.TextHashExprs.hashedGramScore(norm, w, b, maxN)
        .as(s"score_$s") }
    val scored = df.select(
      (col(idCol) +: passthrough.map(col)) ++ scoreCols: _*)
    // greatest() needs >= 2 args; a degenerate single-class model still
    // predicts its class (NULL text -> NULL pred, as with C >= 2)
    val pred =
      if (models.size == 1)
        when(col(s"score_${sfx.head}").isNotNull, lit(models.head._1))
      else {
        val best = greatest(sfx.map(s => col(s"score_$s")): _*)
        coalesce(models.zip(sfx).map { case (m, s) =>
          when(col(s"score_$s") === best, lit(m._1)) }: _*)
      }
    scored.withColumn("pred_lang", pred)
  }

  /** Discretized Gumbel(0,1) noise table for [[dsirSelect]]: level q of
    * [[dsirGumbelLevels]] carries −ln(−ln((q+0.5)/L)). Computed ONCE in
    * Scala and inlined as plan/SQL literals on BOTH sides (the t33
    * trained-weight discipline) — query-time `ln` is the one op Java and
    * DuckDB libm disagree on by 1 ulp, so neither engine runs it. 4096
    * levels is noise resolution, not sample size: ties broken by id. */
  val dsirGumbelLevels = 4096
  lazy val dsirGumbelTable: IndexedSeq[Double] =
    IndexedSeq.tabulate(dsirGumbelLevels)(q =>
      -math.log(-math.log((q + 0.5) / dsirGumbelLevels.toDouble)))

  /** APPLY + SELECT of DSIR: score every document's log importance
    * weight with the zero-exchange [[graft.functions.TextHashExprs
    * .hashedGramScore]] kernel (bias 0 — gram-less docs score 0), then
    * Gumbel-top-k importance RESAMPLING without replacement (Xie et al.
    * §2.3): sel_key = logw + Gumbel(0,1), the noise looked up from the
    * [[dsirGumbelTable]] literal at a level derived from the same
    * deterministic Knuth hash mix as [[Sampling.prioritySample]] —
    * re-runs agree exactly and the DOUBLE keys hash-verify against the
    * SQL twin (one literal lookup + one add; no query-time
    * transcendentals). The k winners are marked via a threshold
    * broadcast: a distributed top-k (TakeOrderedAndProject —
    * per-partition heaps, no global sort) yields the k-th (key, id)
    * boundary, k driver rows, and `selected` is a pure comparison in the
    * same scan — no global window at 100 TB. Ties on the boundary key
    * break by smaller id, matching the top-k ordering. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], k: Int, maxN: Int = 2): DataFrame = {
    require(k > 0, "k must be positive")
    val lvl = pmod(pmod(col(idCol).cast("long"), lit(1000000L)) *
      lit(2654435761L), lit(1000000L)) % lit(dsirGumbelLevels.toLong)
    val scored = df.select(col(idCol),
        graft.functions.TextHashExprs.hashedGramScore(
          // NULL text ≡ empty text: gram-less docs carry logw 0 (the
          // oracle's COALESCE contract), never a NULL sel_key
          normalize(coalesce(col(textCol), lit(""))),
          weights, 0.0, maxN).as("dsir_logw"),
        lvl.as("__lvl"))
      .withColumn("sel_key", col("dsir_logw") +
        element_at(typedLit(dsirGumbelTable), (col("__lvl") + 1).cast("int")))
      .drop("__lvl")
      .transform(graft.core.Checkpoint.cut) // feeds boundary AND output
    val top = scored.orderBy(col("sel_key").desc, col(idCol)).limit(k)
      .select(col("sel_key"), col(idCol).cast("long")).collect()
    if (top.length < k) scored.withColumn("selected", lit(true))
    else {
      val thrKey = top.map(_.getDouble(0)).min
      val thrId = top.filter(_.getDouble(0) == thrKey).map(_.getLong(1)).max
      scored.withColumn("selected",
        col("sel_key") > lit(thrKey) ||
          (col("sel_key") === lit(thrKey) && col(idCol) <= lit(thrId)))
    }
  }

  /** APPLY of the learned quality classifier: one zero-exchange codegen
    * kernel pass per row (the hashed-feature dot product with the
    * deterministic bucket-ascending fold — DOUBLE scores hash-verify
    * against the SQL twin). At 100 TB this is the whole point: the fit
    * runs once on a sample or a prior corpus snapshot, the apply is a
    * pure map over every document with the model riding along as one
    * double[] plan literal. */
  def qualityClassifierScore(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double, maxN: Int = 2): DataFrame =
    df.select(col(idCol),
        graft.functions.TextHashExprs.hashedGramScore(
          // NULL text ≡ empty text: scores the bare bias (the oracle's
          // LEFT JOIN + COALESCE contract), never NULL
          normalize(coalesce(col(textCol), lit(""))),
          weights, bias, maxN).as("clf_score"))
      .withColumn("clf_keep", col("clf_score") > lit(0.0))

  /** One row per document with every text-analysis signal. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      Seq(col(idCol), tokenCount(col(textCol)).as("token_count"),
        subwordCount(col(textCol)).as("subword_count"),
        langId(col(textCol)).as("pred_lang"),
        xxhash64(normalize(col(textCol))).as("content_hash"),
        size(fingerprint(col(textCol))).cast("long").as("fp_size")) ++
        qualitySignals(col(textCol)): _*)
}
