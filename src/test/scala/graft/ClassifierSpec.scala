package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHashExprs
import graft.operators.{Dedup, TextAnalysis}

/** The learned quality classifier (t33): kernel ≡ Column-formula parity
  * (the DedupSpec discipline for every codegen kernel), deterministic
  * refit, the NB decision-rule contract, and the empty/gram-less edge. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.load(spark, sf, "documents")

  test("hashedGramBuckets ≡ the interpreted Column formula (unigram + " +
      "\\u0001-joined bigram xxhash64 pmod dim), as multisets") {
    val dim = 1024
    val norm = Dedup.normalize(col("text"))
    val toks = filter(split(norm, " "), t => length(t) > 0)
    val n = size(toks)
    val g2 = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit("\u0001"), b))
    val formula = transform(concat(toks, g2),
      g => pmod(xxhash64(g), lit(dim)).cast("int"))
    val rows = docs.select(
        sort_array(TextHashExprs.hashedGramBuckets(norm, dim, 2)).as("k"),
        sort_array(formula).as("f"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
    }
  }

  test("hashedGramScore ≡ a driver-side replay of the bias-seeded " +
      "bucket-ascending fold over the kernel's own bucket counts") {
    val dim = 64 // small dim → dense collisions exercise count > 1 paths
    val rnd = new scala.util.Random(7)
    val w = Array.fill(dim)(rnd.nextGaussian())
    val bias = -0.25
    val rows = docs.limit(50).select(
        TextHashExprs.hashedGramBuckets(Dedup.normalize(col("text")), dim, 2)
          .as("b"),
        TextHashExprs.hashedGramScore(Dedup.normalize(col("text")), w, bias, 2)
          .as("s"))
      .collect()
    rows.foreach { r =>
      val cnt = new Array[Int](dim)
      r.getSeq[Int](0).foreach(b => cnt(b) += 1)
      var expect = bias
      (0 until dim).foreach(b =>
        if (cnt(b) != 0) expect += cnt(b).toDouble * w(b))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(expect))
    }
  }

  test("fit is deterministic (bit-identical weights on refit) and the " +
      "NB decision rule separates the seed labels it was trained on") {
    val label = TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last
    val (w1, b1) = TextAnalysis.qualityClassifierFit(docs, "text", label,
      dim = 256, maxN = 2)
    val (w2, b2) = TextAnalysis.qualityClassifierFit(docs, "text", label,
      dim = 256, maxN = 2)
    assert(b1 == b2 && w1.toSeq == w2.toSeq)
    // learnability sanity: on the training corpus itself the mean score
    // of label-true docs must exceed the mean of label-false docs (NB
    // with a real signal can hardly fail this; a wiring bug — swapped
    // classes, wrong bucket mask — fails it loudly)
    val scored = TextAnalysis.qualityClassifierScore(docs, "doc_id", "text",
        w1, b1, maxN = 2)
      .join(docs.select(col("doc_id"), label.as("y")), Seq("doc_id"))
    val m = scored.groupBy(col("y")).agg(avg(col("clf_score")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set(true, false), s"fixture lost a class: $m")
    assert(m(true) > m(false), s"NB failed to separate its own labels: $m")
  }

  test("DSIR: fit deterministic, target docs weigh heavier, select marks " +
      "exactly k with the boundary tiebreak") {
    val target = col("source").isin("src0", "src1")
    val w1 = TextAnalysis.dsirFit(docs, "text", target, dim = 256, maxN = 2)
    val w2 = TextAnalysis.dsirFit(docs, "text", target, dim = 256, maxN = 2)
    assert(w1.toSeq == w2.toSeq) // exact long counts through math.log
    val sel = TextAnalysis.dsirSelect(docs, "doc_id", "text", w1, k = 25,
      maxN = 2)
    // exactly k winners; the whole corpus stays in the output
    assert(sel.count() == docs.count())
    assert(sel.filter(col("selected")).count() == 25)
    // importance sanity: mean log-weight of target docs exceeds non-target
    // (the ratio model is trained to prefer exactly these documents)
    val m = sel.join(docs.select(col("doc_id"), target.as("y")), Seq("doc_id"))
      .groupBy(col("y")).agg(avg(col("dsir_logw")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false), s"DSIR failed to prefer its target: $m")
    // the selected set is exactly the top-k of (sel_key DESC, doc_id ASC)
    val byKey = sel.orderBy(col("sel_key").desc, col("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).take(25).toSet
    val marked = sel.filter(col("selected"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(marked == byKey)
    // k >= corpus → everything selected (the short-corpus guard)
    val tiny = docs.limit(3)
    assert(TextAnalysis.dsirSelect(tiny, "doc_id", "text", w1, k = 25)
      .filter(col("selected")).count() == 3)
  }

  test("learned lang-id: deterministic refit, beats the majority-class " +
      "baseline on its training corpus, prior-argmax on gram-less docs") {
    val m1 = TextAnalysis.langIdFit(docs, "text", "lang", dim = 256, maxN = 2)
    val m2 = TextAnalysis.langIdFit(docs, "text", "lang", dim = 256, maxN = 2)
    assert(m1.map(_._1) == m2.map(_._1) &&
      m1.zip(m2).forall { case (a, b) =>
        a._2.toSeq == b._2.toSeq && a._3 == b._3 })
    assert(m1.map(_._1) == m1.map(_._1).sorted) // label-ascending contract
    val scored = TextAnalysis.langIdScore(docs, "doc_id", "text", m1,
      passthrough = Seq("lang"), maxN = 2)
    val n = scored.count()
    val hit = scored.filter(col("pred_lang") === col("lang")).count()
    val majority = docs.groupBy(col("lang")).count()
      .agg(max("count")).head().getLong(0)
    // NB trained on its own corpus must beat always-guess-the-majority —
    // a wiring bug (swapped classes, wrong prior, broken argmax) fails this
    assert(hit > majority, s"lang-id no better than majority: $hit vs $majority of $n")
    // gram-less doc: every score is its bare prior, argmax = max prior
    // (the largest class), ties by label order; NULL text ≡ empty text
    // (the oracle's COALESCE-to-prior contract — a corpus NULL must not
    // diverge from the generated twin)
    import spark.implicits._
    val edge = Seq((1L, Some("")), (2L, None)).toDF("doc_id", "text")
    val got = TextAnalysis.langIdScore(edge, "doc_id", "text", m1)
      .select(col("doc_id"), col("pred_lang"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val expectedPred = m1.filter(_._3 == m1.map(_._3).max).map(_._1).min
    assert(got(1L) == expectedPred, s"got ${got(1L)}, want $expectedPred " +
      s"(priors ${m1.map(m => m._1 -> m._3)})")
    assert(got(2L) == expectedPred) // NULL ≡ '' — same prior-argmax
  }

  test("gram-less input scores exactly the bias; NULL text ≡ empty text") {
    val w = Array.fill(16)(1.0)
    val df = Seq((1L, Some("")), (2L, Some("one two")), (3L, None))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassifierScore(df, "doc_id", "text",
        w, bias = 0.125, maxN = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 0.125) // empty text: no grams, bare bias
    assert(got(2L) == 0.125 + 3.0) // 2 unigrams + 1 bigram, all w=1
    assert(got(3L) == 0.125) // NULL ≡ '' (the oracle's COALESCE contract)
    // dsirSelect: a NULL-text doc carries logw 0 and a REAL sel_key —
    // it competes in the resampling rather than vanishing into NULL
    val sel = TextAnalysis.dsirSelect(df, "doc_id", "text", w, k = 2)
    assert(sel.filter(col("dsir_logw").isNull || col("sel_key").isNull)
      .count() == 0)
    assert(sel.filter(col("doc_id") === 3L).head().getDouble(1) == 0.0)
  }

  test("labelSuffixes: safe labels pass through; unsafe sets go positional " +
      "and langIdScore still schedules/argmaxes correctly") {
    assert(TextAnalysis.labelSuffixes(Seq("de", "en")) == Seq("de", "en"))
    // any unsafe member (space/quote/leading digit) or a case-fold
    // collision flips the WHOLE set to positional — no mixed collisions
    assert(TextAnalysis.labelSuffixes(Seq("a b", "en")) == Seq("c0", "c1"))
    assert(TextAnalysis.labelSuffixes(Seq("EN", "en")) == Seq("c0", "c1"))
    assert(TextAnalysis.labelSuffixes(Seq("it's", "9x")) == Seq("c0", "c1"))
    import spark.implicits._
    val weird = Seq((1L, "alpha beta gamma", "l one"),
      (2L, "delta epsilon zeta", "L'2"), (3L, "alpha beta delta", "l one"))
      .toDF("doc_id", "text", "lang")
    val m = TextAnalysis.langIdFit(weird, "text", "lang", dim = 16, maxN = 2)
    val scored = TextAnalysis.langIdScore(weird, "doc_id", "text", m,
      passthrough = Seq("lang"))
    // columns are positional (identifier-safe), values are the raw labels
    assert(scored.columns.toSet.intersect(Set("score_c0", "score_c1"))
      .size == 2, scored.columns.toSeq)
    val hit = scored.filter(col("pred_lang") === col("lang")).count()
    assert(hit == 3L, s"unsafe-label NB should memorize its 3-doc corpus")
  }
}
