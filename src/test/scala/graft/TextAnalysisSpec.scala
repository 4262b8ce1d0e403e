package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("language id picks the language with stopword evidence") {
    val docs = Seq(
      (1L, "the cat is on the mat and it is happy with you"),
      (2L, "der Hund ist nicht auf der Matte und auch nicht froh"),
      (3L, "le chat est dans la maison avec le chien pour une heure"),
      (4L, "el gato es una mascota y el perro es otra mascota como tal"),
      (5L, "qwerty zxcvb asdfgh")
    ).toDF("doc_id", "text")
    val got = docs.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "es")
    assert(got(5L) == "und")
  }

  test("token counts") {
    val df = Seq((1L, "  one   two\tthree\nfour  "), (2L, ""), (3L, "solo")).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 0L, 3L -> 1L))
  }

  test("subword count splits letter/digit/punct runs") {
    val df = Seq((1L, "hello,world42 foo-bar")).toDF("id", "text")
    // hello , world 42 foo - bar => 7 pieces
    val n = df.select(TextAnalysis.subwordCount($"text")).as[Long].head()
    assert(n == 7L)
  }

  test("quality signals flag degenerate docs") {
    val df = Seq(
      (1L, "A perfectly normal sentence with plenty of alphabetic content here."),
      (2L, "1234567890 9876543210 1111111 22222 3333 444"),
      (3L, "x")
    ).toDF("id", "text")
    val rows = df.select(Seq($"id") ++ TextAnalysis.qualitySignals($"text"): _*)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("quality_keep"))).toMap
    assert(rows(1L))
    assert(!rows(2L)) // all digits
    assert(!rows(3L)) // too short
  }

  test("fingerprints: identical text identical, shared content overlaps") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "entirely different words composed for a disjoint fingerprint set")
    ).toDF("id", "text")
    val fp = df.select($"id", TextAnalysis.fingerprint($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L) == fp(2L))
    assert((fp(1L) & fp(3L)).size < fp(1L).size / 2)
  }

  test("analyze produces one row per doc with all signals") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val out = TextAnalysis.analyze(docs, "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.columns.toSet.contains("pred_lang"))
    assert(out.columns.toSet.contains("quality_keep"))
  }

  test("repetition signals: constructed duplicate-token and 2-gram cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),          // no repetition
      (2L, "spam spam spam spam"), // all dup tokens AND dup 2-grams
      (3L, "x"),                // single token: no 2-grams → ratio 0
      (4L, "")                  // empty → all zeros
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id" +:
        TextAnalysis.repetitionSignals($"text"): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 0.0, 0.0)))
    assert(out(2L)._2 == 0.75)      // 1 distinct of 4 tokens
    assert(out(2L)._3 > 0.6)        // "spam spam" ×3 → 1 distinct of 3
    assert(out(3L) == ((1L, 0.0, 0.0)))
    assert(out(4L) == ((0L, 0.0, 0.0)))
  }

  test("hash split: deterministic, exhaustive, and subset-stable") {
    import spark.implicits._
    import graft.operators.Sampling
    val ids = (0L until 1000L).toDF("id")
    val s1 = Sampling.hashSplit(ids, "id").groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row assigned; buckets roughly honor the 900/50/50 contract
    assert(s1.values.sum == 1000L)
    assert(s1("train") > 800 && s1.getOrElse("val", 0L) > 0 &&
      s1.getOrElse("test", 0L) > 0)
    // pure function of the id: a SUBSET gets identical assignments
    val sub = Sampling.hashSplit(ids.filter($"id" < 100), "id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val full = Sampling.hashSplit(ids, "id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(sub.forall { case (k, v) => full(k) == v })
    // deterministic sample is a strict subset rule, repeat-stable
    val a = Sampling.deterministicSample(ids, "id", 100).collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids, "id", 100).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < 1000)
    // larger keep-fraction strictly contains the smaller one
    val bigger = Sampling.deterministicSample(ids, "id", 300).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(bigger))
  }

  test("stratified sample: per-stratum rates, default for unmapped/null strata") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = (0L until 900L).map(i =>
      (i, Seq("en", "de", null).apply((i % 3L).toInt))).toDF("id", "lang")
    val kept = Sampling.stratifiedSample(rows, "id", "lang",
        Map("en" -> 100, "de" -> 1000), defaultPermille = 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // de: rate 1000 keeps every row of the stratum
    assert(byLang("de").size == 300)
    // null stratum: default 0 keeps nothing
    assert(!byLang.contains(null))
    // en: keep set == the unconditional deterministic sample at the same
    // rate restricted to the stratum (same bucket function)
    val enIds = rows.filter($"lang" === "en")
    val expected = Sampling.deterministicSample(enIds, "id", 100)
      .select("id").as[Long].collect().toSet
    assert(byLang.getOrElse("en", Set.empty) == expected)
  }

  test("priority sample: weight-sensitive, deterministic, exactly k rows") {
    import spark.implicits._
    import graft.operators.Sampling
    // one row carries ~all the weight — it must always be sampled
    val rows = (0L until 500L).map(i =>
      (i, if (i == 123L) 1000000L else 10L)).toDF("id", "w")
    val a = Sampling.prioritySample(rows, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    val b = Sampling.prioritySample(rows, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 50 && a.contains(123L))
  }

  test("stratified priority sample: k winners per stratum, heavy row kept") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = (0L until 300L).map(i =>
      (i, Seq("en", "de", "fr")((i % 3).toInt),
        if (i == 42L) 100000L else 10L)).toDF("id", "lang", "w")
    val out = Sampling.stratifiedPrioritySample(rows, "id", "w", "lang", 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    assert(out.keySet == Set("en", "de", "fr"))
    assert(out.values.forall(_.length == 5)) // exactly k per stratum
    // the overwhelming-weight row (id 42, lang "en") always sampled
    assert(out("en").exists(_._2 == 42L))
    val again = Sampling.stratifiedPrioritySample(rows, "id", "w", "lang", 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(again == out.values.flatten.toSet) // deterministic
  }

  test("shuffleDeterministic: a stable permutation, partition-count invariant") {
    import spark.implicits._
    import graft.operators.Sampling
    val a = Sampling.shuffleDeterministic(
        (0L until 300L).toDF("id").repartition(7), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Sampling.shuffleDeterministic(
        (0L until 300L).toDF("id").repartition(2), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)                                   // cluster-size invariant
    assert(a.values.toSeq.sorted == (0L until 300L)) // a true permutation
    assert(a.toSeq.sortBy(_._2).map(_._1) != (0L until 300L).toSeq) // shuffled
  }

  test("packSequences: exclusive prefix sum in id order, bin boundaries") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = Seq((3L, 30L), (1L, 50L), (2L, 40L), (4L, 10L))
      .toDF("id", "n_tok").repartition(3) // scrambled input partitioning
    val out = Sampling.packSequences(rows, "id", "n_tok", budgetTokens = 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // id order 1,2,3,4 → offsets 0,50,90,120 → bins 0,0,0,1
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((50L, 0L)))
    assert(out(3L) == ((90L, 0L)))
    assert(out(4L) == ((120L, 1L)))
  }

  test("trigramQualityPerKey: each doc scores against its own language model") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "en", "the quick brown fox the quick brown fox"),
      (2L, "en", "the quick brown fox jumps high"),
      (3L, "zh", "汉字文本一样 汉字文本一样 汉字文本一样")
    ).toDF("doc_id", "lang", "text")
    val model = TextAnalysis.trigramModelPerKey(docs, "text", "lang")
    val out = TextAnalysis.trigramQualityPerKey(
        docs, "doc_id", "text", "lang", model, rareMaxFreq = 1L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    // the zh doc's trigrams repeat within ITS model -> freq >= 2 -> zero
    // rare; under a global model pooled with en it would score identically
    // here, but under the WRONG model (en) every zh trigram would be rare
    assert(out(3L)._1 == "zh" && out(3L)._2 == 0L)
    val wrongModel = model.filter($"model_key" === "en")
    val cross = TextAnalysis.trigramQualityPerKey(
        docs, "doc_id", "text", "lang", wrongModel, rareMaxFreq = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(cross(3L)._1 == cross(3L)._2) // no zh model -> ALL trigrams rare
  }

  test("bpeTrain: exact merge sequence, leftmost-first, stops when dry") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, "text", numMerges = 10)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    // aaab×3, ab×2: (a,a) counts 2 per aaab (overlapping positions) = 6;
    // leftmost-first merge gives [aa,a,b]; then (a,b)=3+2; then (aa,ab)=3;
    // then every word is one symbol -> training stops at 3 merges, not 10
    assert(m == Seq((0, "a", "a", 6L), (1, "a", "b", 5L), (2, "aa", "ab", 3L)))
  }

  test("bpeEncode: learned merges compress known words, partial elsewhere") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val corpus = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(corpus, "text", numMerges = 10)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Seq((1L, "aaab aaab ab"), (2L, "aab"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(enc, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 3L))) // every trained word -> one symbol
    // unseen "aab": (a,a) applies -> [aa, b]; later merges don't
    assert(out(2L) == ((1L, 2L)))
    assert(out(3L) == ((0L, 0L))) // empty doc reports zeros
  }

  test("bpeTrain batch>1 equals sequential when top pairs are disjoint") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // top pairs (a,b) > (c,d) > (e,f) are symbol-disjoint whole words, so
    // merging one cannot change another's count or create a hotter pair —
    // the exact regime where one batched round ≡ `batch` sequential rounds
    val docs = Seq((1L, ("ab " * 5) + ("cd " * 4) + ("ef " * 3)))
      .toDF("doc_id", "text")
    def train(batch: Int) = TextAnalysis.bpeTrain(docs, "text", 3, batch)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val seq1 = train(1)
    assert(seq1 == Seq((0, "a", "b", 5L), (1, "c", "d", 4L), (2, "e", "f", 3L)))
    assert(train(3) == seq1)
  }

  test("bpeTrain batch: a conflicting pair is skipped and re-measured") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // (a,b)=3 then (b,c)=2 share symbol b: the round selects (a,b) only,
    // (b,c) is re-counted and lands next round — result identical to m=1
    val docs = Seq((1L, ("ab " * 3) + ("bc " * 2))).toDF("doc_id", "text")
    def train(batch: Int) = TextAnalysis.bpeTrain(docs, "text", 2, batch)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val seq1 = train(1)
    assert(seq1 == Seq((0, "a", "b", 3L), (1, "b", "c", 2L)))
    assert(train(2) == seq1)
  }

  test("bpeTrain batch: a pair chained through a SKIPPED pair's symbol is " +
      "also skipped (taint rule) — result identical to sequential") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // counts: (e,s)=5 > (s,t)=4 > (t,h)=3. (s,t) skips on the shared 's';
    // (t,h) must ALSO skip (shared 't' with the SKIPPED pair): selecting it
    // would give (t,h) the round-2 rank sequential training gives (s,t),
    // and those two do NOT commute ("sth" would tokenize differently).
    val docs = Seq((1L, ("es " * 5) + ("st " * 4) + ("th " * 3)))
      .toDF("doc_id", "text")
    def train(batch: Int) = TextAnalysis.bpeTrain(docs, "text", 3, batch)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val seq1 = train(1)
    assert(seq1 ==
      Seq((0, "e", "s", 5L), (1, "s", "t", 4L), (2, "t", "h", 3L)))
    assert(train(3) == seq1)
  }

  test("bpeTrain batch: independent pairs past a skipped conflict still " +
      "land in the round (documented rank permutation vs sequential)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // counts: (a,b)=5 > (b,c)=4 > (d,e)=3. batch=3 selects (a,b), skips
    // (b,c) on the shared 'b', and still lands (d,e) the same round;
    // (b,c) re-measures next round. The merge SET equals sequential; the
    // rank order of the independent picks permutes — disjoint merges
    // commute, so the trained tokenizer encodes identically.
    val docs = Seq((1L, ("ab " * 5) + ("bc " * 4) + ("de " * 3)))
      .toDF("doc_id", "text")
    def train(batch: Int) = TextAnalysis.bpeTrain(docs, "text", 3, batch)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(train(1) ==
      Seq((0, "a", "b", 5L), (1, "b", "c", 4L), (2, "d", "e", 3L)))
    assert(train(3) ==
      Seq((0, "a", "b", 5L), (1, "d", "e", 3L), (2, "b", "c", 4L)))
  }

  test("bpe symbols are code points on both train and encode sides (astral-safe)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // U+1D54F is a surrogate pair in UTF-16; a code-unit split on either
    // side would shatter it and the learned merge could never apply
    val docs = Seq((1L, "𝕏y 𝕏y")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("𝕏", "y")))
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(out == ((2L, 2L))) // two tokens, each one merged symbol
  }

  test("budgetSelect: greedy prefix within budget, crossing doc excluded") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = Seq(
      // (id, stratum, quality, tokens)
      (1L, "a", 0.9, 40L), (2L, "a", 0.8, 40L), (3L, "a", 0.7, 40L),
      (4L, "a", 0.6, 5L), // crossing doc 3 excluded; 4 does NOT backfill
      (5L, "b", 0.5, 200L), // first doc alone exceeds budget -> empty stratum
      (6L, "c", 0.4, 100L)  // exactly the budget -> kept
    ).toDF("id", "src", "q", "n_tok").repartition(3)
    val out = Sampling.budgetSelect(rows, "id", "src", "q", "n_tok", 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    // greedy is PREFIX selection: once doc 3 crosses, later docs are out
    // too even if they would fit (deterministic, one pass, no knapsack)
    assert(out.keySet == Set(1L, 2L, 6L))
    assert(out(1L) == ((1L, 40L)) && out(2L) == ((2L, 80L)))
    assert(out(6L) == ((1L, 100L)))
  }

  test("PII: per-category counts, composite flag, redaction order") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or admin@example.com now"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +44 555-123 or +1 555 9876 today"),
      (4L, "no pii here at all"),
      (5L, "mix a@b.io on 8.8.8.8 tel +1 555-0000")).toDF("id", "text")
    val out = docs.select(
      ($"id" +: TextAnalysis.piiSignals($"text") :+
        TextAnalysis.redactPii($"text").as("red")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5)))
      .toMap
    assert(out(1L) == ((2L, 0L, 0L, true,
      "mail me at <EMAIL> or <EMAIL> now")))
    assert(out(2L) == ((0L, 2L, 0L, true, "server <IP> and <IP> up")))
    assert(out(3L) == ((0L, 0L, 2L, true, "call <PHONE> or <PHONE> today")))
    assert(out(4L) == ((0L, 0L, 0L, false, "no pii here at all")))
    assert(out(5L) == ((1L, 1L, 1L, true, "mix <EMAIL> on <IP> tel <PHONE>")))
  }

  test("PII: counts and redaction agree on overlapping spans") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // the IP-shaped span lives INSIDE the email match: counted as email
    // only, because counts run on the same sequential basis as redaction
    val doc = Seq((1L, "ping user@1.2.3.4.com now")).toDF("id", "text")
    val r = doc.select(
      (lit(1) +: TextAnalysis.piiSignals($"text") :+
        TextAnalysis.redactPii($"text").as("red")): _*).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L) // 1 email, 0 IPs
    assert(r.getString(5) == "ping <EMAIL> now")
  }

  test("blocklist filter: counts, ratio, keep threshold, empty doc") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "good words spam more spam"),   // 2/5 flagged
      (2L, "all clean text here"),
      (3L, " ")).toDF("id", "text")
    val out = docs.select(
      ($"id" +: TextAnalysis.blocklistSignals($"text", Seq("spam", "bad"),
        maxRatio = 0.2)): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((5L, 2L, 0.4, false)))
    assert(out(2L) == ((4L, 0L, 0.0, true)))
    assert(out(3L) == ((0L, 0L, 0.0, true)))
  }

  test("charTrigrams: overlapping windows, normalization, short-text guard") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "AB  cd"), (2L, "ab"), (3L, "")).toDF("id", "text")
    val out = docs.select($"id", TextAnalysis.charTrigrams($"text").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("ab ", "b c", " cd")) // lowercased, ws collapsed
    assert(out(2L) == Seq.empty) // len<3 → empty, NOT a descending sequence
    assert(out(3L) == Seq.empty)
  }

  test("trigramQuality: corpus-frequency mean and rare fraction, exact") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // corpus: "aaaa" (trigrams aaa×2), "aaab" (aaa, aab), "xyz" (xyz)
    val docs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "xyz")).toDF("id", "text")
    val model = TextAnalysis.trigramModel(docs, "text") // aaa→3, aab→1, xyz→1
    val out = TextAnalysis.trigramQuality(docs, "id", "text", model,
        rareMaxFreq = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(1L) == ((2L, 6L, 0L, 3.0, 0.0)))   // aaa,aaa → mean 3, no rare
    assert(out(2L) == ((2L, 4L, 1L, 2.0, 0.5)))   // aaa(3) + aab(1)
    assert(out(3L) == ((1L, 1L, 1L, 1.0, 1.0)))   // xyz unique → all rare
  }

  test("trigramQuality: cross-corpus model counts unseen trigrams as rare") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val reference = Seq((1L, "aaaa")).toDF("id", "text") // model: aaa→2
    val crawl = Seq((10L, "aaaxyz")).toDF("id", "text")  // aaa,aax,axy,xyz
    val out = TextAnalysis.trigramQuality(crawl, "id", "text",
        TextAnalysis.trigramModel(reference, "text"), rareMaxFreq = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    // 4 trigrams: aaa seen (freq 2), the other 3 UNSEEN → freq 0, rare
    assert(out(10L) == ((4L, 2L, 3L, 0.75)))
  }

  test("readability: hand-computed Flesch scores, sentence/syllable floors") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat. it ran!"),     // 5 words, 2 sentences, 5 syllables
      (2L, "zzz brr")                   // no vowels → 1 syllable per word
    ).toDF("id", "text")
    val out = docs.select($"id" +: TextAnalysis.readabilitySignals($"text"): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (w1, s1, y1, fre1) = out(1L)
    assert((w1, s1, y1) == ((5L, 2L, 5L)))
    assert(fre1 == 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0))
    val (w2, s2, y2, _) = out(2L)
    assert((w2, s2, y2) == ((2L, 1L, 2L))) // floors: ≥1 sentence, ≥1 syll/word
  }

  test("temperatureRebalance: √count quotas, deterministic winners") {
    import spark.implicits._
    import graft.operators.Sampling
    // strata: a=400 docs, b=100, c=25 → weights 20, 10, 5 → Σ=35
    val rows = (0L until 525L).map(i =>
      (i, if (i < 400) "a" else if (i < 500) "b" else "c")).toDF("id", "lang")
    val out = Sampling.temperatureRebalance(rows, "id", "lang", budget = 70L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(4), r.getLong(3))) // lang, id, rank, quota, n_docs
    val byLang = out.groupBy(_._1)
    // quotas: floor(70·20/35)=40, floor(70·10/35)=20, floor(70·5/35)=10
    assert(byLang("a").length == 40 && byLang("b").length == 20 &&
      byLang("c").length == 10)
    // temperature flattening: a has 16× c's docs but only 4× the quota
    assert(out.forall { case (_, _, rank, quota, _) => rank <= quota })
    // deterministic: re-run agrees exactly
    val again = Sampling.temperatureRebalance(rows, "id", "lang", budget = 70L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == out.map(t => (t._1, t._2)).toSet)
  }

  test("chunkText: overlap windows, short docs, empty docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y"),                 // shorter than one chunk
      (3L, " ")                    // empty after normalize
    ).toDF("id", "text")
    val out = TextAnalysis.chunkText(docs, "id", "text",
        chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // stride 2: starts 0,2,4,6 → 1+ceil((10-4)/2) = 4 chunks
    assert(d1.map(c => (c._3, c._4)).toSeq == Seq(
      ("a b c d", 4L), ("c d e f", 4L), ("e f g h", 4L), ("g h i j", 4L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "x y", 2L)))
    assert(!out.exists(_._1 == 3L)) // empty doc yields no chunks
  }

  test("tfidfTopTerms: rare term outranks frequent common term") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "common common common zebra"),
      (2L, "common other words here"),
      (3L, "common more stuff there")).toDF("id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5)))
    val d1 = top.filter(_._1 == 1L).sortBy(_._6)
    // zebra: tf 1, df 1 → 1·3/1 = 3.0 beats common: tf 3, df 3 → 3·3/3 = 3.0
    // — equal scores, tie → lexicographically first term ("common")
    assert(d1.map(t => (t._2, t._5)).toSeq ==
      Seq(("common", 3.0), ("zebra", 3.0)))
    // doc 2's uniques (df 1): score 3.0 each, common drops to 1·3/3 = 1.0
    val d2 = top.filter(_._1 == 2L)
    assert(d2.forall(t => t._2 != "common"))
  }

  test("bpePairStats: word-frequency-weighted pair counts, single chars drop") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "ab" ×3 (2 docs), "abc" ×1, "x" ×1 → ab: 3+1=4, bc: 1; "x" no pairs
    val docs = Seq((1L, "ab ab abc"), (2L, "ab x")).toDF("id", "text")
    val top = TextAnalysis.bpePairStats(docs, "text", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("ab", 4L), ("bc", 1L)))
  }

  test("topTokens: frequency order, lexicographic ties, doc frequency") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "b b a c"), (2L, "b a  c"), (3L, "zz c")).toDF("id", "text")
    val top = TextAnalysis.topTokens(docs, "id", "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // b: freq 3 in 2 docs; c: freq 3 in 3 docs — tie breaks to 'b' first
    assert(top.toSeq == Seq(("b", 3L, 2L), ("c", 3L, 3L), ("a", 2L, 2L)))
  }

  test("freqSpectrum: bins partition the vocabulary, mass sums to corpus") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // a×3, b×2, c×2, d×1, e×1, f×1 → f=3:1 tok, f=2:2, f=1:3
    val docs = Seq((1L, "a a b c d"), (2L, "a b c e f"), (3L, null: String))
      .toDF("id", "text")
    val sp = TextAnalysis.freqSpectrum(docs, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sp == Map(3L -> ((1L, 3L)), 2L -> ((2L, 4L)), 1L -> ((3L, 3L))))
    // invariants: Σ n_tokens = |vocab|, Σ mass = total token count
    assert(sp.values.map(_._1).sum == 6L && sp.values.map(_._2).sum == 10L)
  }

  test("kmvDistinctTokens: exact below k, estimate near truth above k, " +
      "deterministic") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // stratum "small": 5 distinct tokens (< k) → exact count
    // stratum "big": 1000 distinct tokens (>> k) → KMV estimate
    val small = Seq(("small", "a b c d e"))
    val big = (0 until 1000).grouped(50).map(g =>
      ("big", g.map(i => s"tok$i").mkString(" "))).toSeq
    val docs = (small ++ big).toDF("src", "text")
    val out = TextAnalysis.kmvDistinctTokens(docs, "src", "text", k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("small")._1 == 5L && out("small")._3 == 5.0)
    assert(out("big")._1 == 64L)
    // KMV stderr ≈ n/√k ≈ 125 here; 3σ bound keeps the test deterministic
    // in spirit (the hash set is fixed, this documents estimator quality)
    assert(math.abs(out("big")._3 - 1000.0) < 375.0, s"est=${out("big")._3}")
    // pure function of the data: re-run bit-identical
    val again = TextAnalysis.kmvDistinctTokens(docs, "src", "text", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again("big") == out("big")._3)
  }

  test("booleanSearch: AND semantics, repeated tokens count once, " +
      "zero-df term empties the query") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma alpha"), // repeated alpha: distinct per doc
      (2L, "alpha delta"),
      (3L, "beta gamma"),
      (4L, "alpha beta")).toDF("doc_id", "text")
    val out = TextAnalysis.booleanSearch(docs, "doc_id", "text", Seq(
        10 -> Seq("alpha", "beta"),
        11 -> Seq("gamma"),
        12 -> Seq("alpha", "nosuchterm")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (10, 1L, 2L), (10, 4L, 2L), // docs with BOTH alpha and beta
      (11, 1L, 1L), (11, 3L, 1L))) // zero-df term → query 12 empty
  }

  test("bm25TopK: ranks by the textbook formula, rank contract, " +
      "missing term contributes nothing") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // doc 1: high tf of 'rare'; doc 2: one hit in a LONG doc (length
    // normalization demotes it); doc 3: common term only
    val docs = Seq(
      (1L, "rare rare rare pad"),
      (2L, "rare " + Seq.fill(40)("pad").mkString(" ")),
      (3L, "common pad pad pad")).toDF("doc_id", "text")
    val qs = Seq(1 -> Seq("rare", "ghost")) // ghost: df=0, no contribution
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
      .sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 2L)) // only docs containing 'rare'
    assert(out.map(_._4).toSeq == Seq(1, 2))   // 1-based dense ranks
    // textbook recomputation (same fixed-order ops) matches exactly
    val n = 3.0
    val avgdl = (4.0 + 41.0 + 4.0) / 3.0
    val idf = math.log((n - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2000000000000002) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
    assert(out.find(_._2 == 1L).get._3 == s(3.0, 4.0))
    assert(out.find(_._2 == 2L).get._3 == s(1.0, 41.0))
  }

  test("phraseSearch: consecutive-only, overlapping repeats, zero-df word") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c a b"),   // "a b" twice; "b a" once (positions 1→2)
      (2L, "b a c"),       // "a b" never (only reversed)
      (3L, "x x x")).toDF("doc_id", "text") // overlapping "x x": 2 starts
    val out = TextAnalysis.phraseSearch(docs, "doc_id", "text", Seq(
        1 -> Seq("a", "b"),
        2 -> Seq("x", "x"),
        3 -> Seq("a", "ghost")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1, 1L, 2L), // both "a b" occurrences; doc 2's reversed pair absent
      (2, 3L, 2L))) // overlapping starts count separately; query 3 empty
  }

  test("ngramLmCounts: counts and suffix continuation stats, top-k order") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // trigram "b c d" appears with two DISTINCT left contexts for its
    // suffix "c d" (b after a, and b after e) → n_contexts("c d") = 1
    // (only 'b' precedes "c d"); "a b c" and "e b c": suffix "b c" has
    // contexts {a, e} → 2
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "e b c d"),
      (3L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmCounts(docs, "text", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    // top-k order: count desc, then lexicographic ngram
    assert(out.map(_._1).toSeq == Seq("a b c", "b c d", "e b c"))
    assert(out.map(_._2).toSeq == Seq(2L, 2L, 1L))
    val byNgram = out.map(t => t._1 -> ((t._3, t._4))).toMap
    assert(byNgram("a b c") == (("b c", 2L))) // contexts of "b c": {a, e}
    assert(byNgram("b c d") == (("c d", 1L))) // only 'b' precedes "c d"
    assert(byNgram("e b c") == (("b c", 2L)))
  }

  test("gopherSignals: each named rule fires on its designed violation") {
    import spark.implicits._
    val pad = (1 to 60).map(i => s"word$i").mkString(" ")   // 60 clean words
    val good = s"the cat sat and that dog ran to be of it $pad"
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to count"),                  // n_words < 50
      (3L, s"$good ${"#" * 200}"),                 // symbol_ratio > 0.1
      (4L, s"$good ${"42 " * 40}"),                // alpha ratio < 0.80
      (5L, (1 to 60).map(i => s"w$i").mkString(" ")), // no stopwords at all
      (6L, (1 to 60).map(i => s"- bullet line $i").mkString("\n")), // bullets
      (7L, (1 to 60).map(i => s"line $i trails off...").mkString("\n")) // ellipses
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id" +:
        TextAnalysis.gopherSignals($"text", minStopHits = 1L): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, name: String): Boolean =
      out(id).getBoolean(out(id).fieldIndex(name))
    assert(b(1L, "gopher_pass"))
    assert(!b(2L, "ok_words") && !b(2L, "gopher_pass"))
    assert(!b(3L, "ok_symbols") && b(3L, "ok_words"))
    assert(!b(4L, "ok_alpha"))
    assert(!b(5L, "ok_stops"))
    assert(!b(6L, "ok_bullets"))
    assert(!b(7L, "ok_ellipsis"))
    // stop_hits counts DISTINCT stopword types, not occurrences
    assert(out(1L).getLong(out(1L).fieldIndex("stop_hits")) == 6L)
  }

  test("c4Signals: line rules, page rules, cleaned text exact") {
    import spark.implicits._
    val goodLines = (1 to 6).map(i => s"This is sentence number $i.")
    val docs = Seq(
      (1L, goodLines.mkString("\n")),                       // clean keep
      (2L, (goodLines :+ "no punct line here").mkString("\n")), // line dropped
      (3L, (goodLines :+ "Uses JavaScript everywhere.").mkString("\n")),
      (4L, (goodLines :+ "object { nested }").mkString("\n")), // brace page drop
      (5L, goodLines.take(3).mkString("\n")),               // <5 sentences
      (6L, (goodLines :+ "Read our Privacy Policy today.").mkString("\n")),
      (7L, "Shortest sentence here. Yes indeed done.")      // 1 line, 2 sentences
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id" +: TextAnalysis.c4Signals($"text"): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    def f[T](id: Long, name: String): T =
      out(id).getAs[T](out(id).fieldIndex(name))
    assert(f[Boolean](1L, "c4_keep") &&
      f[String](1L, "clean_text") == goodLines.mkString("\n") &&
      f[Long](1L, "n_sentences") == 6L)
    // unpunctuated line dropped from clean_text but page survives
    assert(f[Long](2L, "n_kept_lines") == 6L && f[Long](2L, "n_lines") == 7L &&
      f[Boolean](2L, "c4_keep"))
    // javascript line dropped (case-insensitive)
    assert(f[Long](3L, "n_kept_lines") == 6L && f[Boolean](3L, "c4_keep"))
    // brace anywhere on the page drops it even though the line was
    // already filtered
    assert(!f[Boolean](4L, "ok_no_brace") && !f[Boolean](4L, "c4_keep"))
    assert(f[Long](5L, "n_sentences") == 3L && !f[Boolean](5L, "c4_keep"))
    // page phrase is case-insensitive and page-level (the line itself
    // passes the line rules)
    assert(f[Long](6L, "n_kept_lines") == 7L &&
      !f[Boolean](6L, "ok_no_phrases") && !f[Boolean](6L, "c4_keep"))
    assert(f[Long](7L, "n_sentences") == 2L && !f[Boolean](7L, "c4_keep"))
  }

  test("gopherRepetitionSignals: hand-computed fractions on designed docs") {
    import spark.implicits._
    val docs = Seq(
      // 4 lines, "dup line" twice; 2 paragraphs, distinct
      (1L, "dup line\nunique one\ndup line\nanother\n\nsecond para"),
      // "a b" repeated: top 2-gram dominates; 5-grams all duplicated
      (2L, Seq.fill(6)("a b").mkString(" ")),
      // long enough that the count-1 top gram's chars are a small fraction
      (3L, (1 to 60).map(i => s"word$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def d(id: Long, name: String): Double =
      out(id).getDouble(out(id).fieldIndex(name))
    // doc 1 lines: [dup line, unique one, dup line, another, second para]
    // (the \n\n boundary also splits lines) → 5 lines, 1 repeat
    assert(d(1L, "dup_line_frac") == 1.0 / 5.0)
    // repeat chars: "dup line" (8) over total 8+10+8+7+11 = 44
    assert(d(1L, "dup_line_char_frac") == 8.0 / 44.0)
    assert(d(1L, "dup_para_frac") == 0.0)
    // doc 2: "a b a b …" ×6 → tokens a,b ×6; 2-grams: "a b"×6, "b a"×5
    // top 2-gram = count 6 × len 3 = 18 chars over norm_len 23
    assert(d(2L, "top_2gram_char_frac") == 18.0 / 23.0)
    // 5-grams: 8 occurrences, 2 distinct ("a b a b a", "b a b a b", len 9)
    // rep = (8-2)*9 over 8*9
    assert(d(2L, "dup_5gram_char_frac") == 54.0 / 72.0)
    assert(!out(2L).getBoolean(out(2L).fieldIndex("rep_pass")))
    // doc 3: nothing repeats anywhere
    assert(d(3L, "dup_line_frac") == 0.0 &&
      d(3L, "top_4gram_char_frac") > 0.0 &&
      d(3L, "dup_10gram_char_frac") == 0.0)
    assert(out(3L).getBoolean(out(3L).fieldIndex("rep_pass")))
  }

  test("lmScore matches a hand-built add-one bigram model") {
    import spark.implicits._
    // corpus: "a b" ×2 docs and "a c b" — bigrams: (a b):2, (a c):1, (c b):1
    // contexts: a→3, c→1; V = |{b, c}| = 2
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c b"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val pAB = (2.0 + 1.0) / (3.0 + 2.0)   // C(a b)+1 / (C(a ·)+V)
    val pAC = (1.0 + 1.0) / (3.0 + 2.0)
    val pCB = (1.0 + 1.0) / (1.0 + 2.0)
    assert(got(1L) == ((1L, pAB)))
    assert(got(2L) == ((1L, pAB)))
    assert(got(3L)._1 == 2L)
    assert(math.abs(got(3L)._2 - (pAC + pCB) / 2.0) < 1e-15)
    // <2 tokens → no bigrams → absent (documented contract)
    assert(!got.contains(4L))
  }

  test("domainMix: literal quotas, under-populated strata cap, " +
      "unmapped strata excluded, subset-stable") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = (0L until 300L).map(i =>
      (i, Seq("web", "code", "books").apply((i % 3L).toInt)))
      .toDF("id", "src")
    val out = Sampling.domainMix(rows, "id", "src",
        Map("web" -> 0.5, "code" -> 0.05), budget = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // quotas: web floor(100×.5)=50 of 100 available; code 5; books absent
    assert(bySrc("web").size == 50 && bySrc("code").size == 5 &&
      !bySrc.contains("books"))
    // a SUPERSET draw keeps every previously kept web row (stable ranks:
    // adding rows of OTHER strata can't displace web winners)
    val bigger = Sampling.domainMix(rows, "id", "src",
        Map("web" -> 0.6, "code" -> 0.05), budget = 100L)
      .collect().filter(_.getString(1) == "web").map(_.getLong(0)).toSet
    assert(bySrc("web").subsetOf(bigger))
    // under-populated stratum: quota above availability takes everything
    val tiny = Sampling.domainMix(rows.filter($"id" < 9), "id", "src",
        Map("web" -> 1.0), budget = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(tiny == Set(0L, 3L, 6L))
  }
}
