package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check => scCheck, Parameters}
import graft.operators.{Dedup, TextAnalysis}

/** Property tests for the round-8 codegen kernels: random inputs catch the
  * edge cases designed fixtures miss (empty docs, single tokens, unicode,
  * runs of duplicates, whitespace variety). Each property compares the
  * kernel against an independent formulation — the interpreted Column
  * formula for the gram-hash set, arithmetic invariants and a slow
  * in-JVM recomputation for the repetition signals. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(40)
  private def run(p: Prop, label: String): Unit = {
    val r = scCheck(params, p)
    assert(r.passed, s"$label: $r")
  }

  // token generator: small alphabet (forces duplicate grams), plus unicode
  // and digit tokens; docs of 0..40 tokens joined by random whitespace
  private val token: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("a", "b", "cat", "dog", "the", "x1", "…", "naïve"),
    1 -> Gen.choose(0, 999).map(_.toString))
  private val ws: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \n ")
  private val doc: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ts <- Gen.listOfN(n, token)
    seps <- Gen.listOfN(math.max(n - 1, 0), ws)
    lead <- Gen.oneOf("", " ", "\n")
    trail <- Gen.oneOf("", " ", "\t")
  } yield lead + (if (ts.isEmpty) ""
    else ts.head + seps.zip(ts.tail).map { case (s, t) => s + t }.mkString) + trail

  test("property: wordNgramHashSet kernel ≡ interpreted Column formula " +
      "on random docs for n in {2, 5, 8}") {
    // evaluate in BATCHES (one Spark job per ScalaCheck sample would
    // dominate the suite): collect a corpus of random docs, compare all
    val docs = Gen.listOfN(120, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    for (n <- Seq(2, 5, 8)) {
      val got = df.select($"id", Dedup.wordNgramHashSet($"text", n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = df.select($"id",
          Dedup.wordNgramHashSetColumnFormula($"text", n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val diff = docs.collect {
        case (id, t) if got(id) != want(id) => s"n=$n doc=${t.take(60)}"
      }
      assert(diff.isEmpty, s"kernel/formula divergence:\n${diff.mkString("\n")}")
    }
  }

  test("property: gopherRepetition invariants on random docs") {
    val docs = Gen.listOfN(200, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val rows = TextAnalysis.gopherRepetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val names = TextAnalysis.gopherRepetitionNames
    docs.foreach { case (id, text) =>
      val r = rows(id)
      // every fraction bounded; dup fractions can never be negative
      names.zipWithIndex.foreach { case (nm, i) =>
        val v = r.getDouble(r.fieldIndex(nm))
        assert(v >= 0.0 && !v.isNaN && !v.isInfinite, s"$nm=$v doc=$id")
        if (nm.startsWith("dup_")) assert(v < 1.0 || v == 1.0)
      }
      // slow reference for dup_line_frac: space-trimmed non-empty \n splits
      val lines = text.split("\n", -1).map(_.replaceAll("^ +| +$", ""))
        .filter(_.nonEmpty)
      val expectLineFrac =
        if (lines.isEmpty) 0.0
        else (lines.length - lines.distinct.length).toDouble / lines.length
      assert(r.getDouble(r.fieldIndex("dup_line_frac")) == expectLineFrac,
        s"dup_line_frac doc=$id text=${text.take(60)}")
    }
    // exact duplication: a doc of one token repeated 12x has dup-gram
    // char fraction (occurrences-1)/occurrences for every n <= 12
    val rep = TextAnalysis.gopherRepetitionSignals(
        Seq((1L, Seq.fill(12)("tok").mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text").head()
    for (n <- 5 to 10) {
      val g = 12 - n + 1 // identical grams
      assert(rep.getDouble(rep.fieldIndex(s"dup_${n}gram_char_frac")) ==
        (g - 1).toDouble / g)
    }
  }

  test("property: keepBestPerKey survivor equals a brute-force arg-max " +
      "on random keyed rows") {
    val gRows: Gen[List[(Long, String, Long)]] = Gen.listOf(for {
      key <- Gen.oneOf("k1", "k2", "k3", "k4")
      q <- Gen.choose(0L, 5L) // small range forces quality ties
      id <- Gen.choose(0L, 1000L)
    } yield (id, key, q)).map(_.distinctBy(_._1)) // unique ids
    run(forAll(gRows) { rows =>
      rows.isEmpty || {
        val got = Dedup.keepBestPerKey(
            rows.toDF("doc_id", "source", "n_chars"),
            "source", "n_chars", "doc_id")
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
        val want = rows.groupBy(_._2).map { case (k, rs) =>
          val best = rs.map(r => (r._3, r._1)).max // (quality, id) max
          k -> ((best._2, best._1, rs.length.toLong, rs.map(_._3).sum))
        }
        got == want
      }
    }, "keepBestPerKey")
  }

  test("property: hashedGramBuckets ≡ interpreted Column formula and " +
      "hashedGramScore ≡ driver fold replay on random docs") {
    import graft.functions.TextHashExprs
    val dim = 64 // small → dense collisions, count>1 paths
    val rnd = new scala.util.Random(13)
    val w = Array.fill(dim)(rnd.nextGaussian())
    val bias = 0.375
    val docs = Gen.listOfN(150, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val norm = Dedup.normalize($"text")
    val toks = filter(split(norm, " "), t => length(t) > 0)
    val nn = size(toks)
    val g2 = zip_with(
      slice(toks, lit(1), greatest(nn - 1, lit(0))),
      slice(toks, lit(2), greatest(nn - 1, lit(0))),
      (a, b) => concat(a, lit("\u0001"), b))
    val formula = transform(concat(toks, g2),
      g => pmod(xxhash64(g), lit(dim)).cast("int"))
    val rows = df.select($"id",
        sort_array(TextHashExprs.hashedGramBuckets(norm, dim, 2)).as("k"),
        sort_array(formula).as("f"),
        TextHashExprs.hashedGramScore(norm, w, bias, 2).as("s"))
      .collect()
    val bad = rows.filter { r =>
      val kernel = r.getSeq[Int](1)
      if (kernel != r.getSeq[Int](2)) true
      else {
        val cnt = new Array[Int](dim)
        kernel.foreach(b => cnt(b) += 1)
        var expect = bias
        (0 until dim).foreach(b =>
          if (cnt(b) != 0) expect += cnt(b).toDouble * w(b))
        java.lang.Double.doubleToLongBits(r.getDouble(3)) !=
          java.lang.Double.doubleToLongBits(expect)
      }
    }
    val firstBad = bad.headOption
      .map(r => docs(r.getLong(0).toInt)._2.take(80)).getOrElse("")
    assert(bad.isEmpty,
      s"classifier kernel divergence on ${bad.length} random docs, " +
        s"first: $firstBad")
  }

  test("property: exciseContaminated kernel ≡ interpreted Column formula " +
      "on random docs (random benchmark drawn from the same corpus)") {
    val n = 3 // small n so random docs actually overlap the benchmark
    val docs = Gen.listOfN(150, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    // benchmark = every 5th doc; gram-hash set via the PROVEN kernel
    // (its own parity is pinned above), sorted on the driver
    val bench = df.filter($"id" % 5 === 0)
    val sorted = bench
      .select(explode(Dedup.wordNgramHashSet($"text", n)).as("g"))
      .distinct().collect().map(_.getLong(0)).sorted
    val benchLit = typedLit(sorted.toSeq)
    // independent Column formulation: positioned gram hashes, per-token
    // covered flag via exists over the gram window, filter-with-index
    val norm = Dedup.normalize($"text")
    val toks = filter(split(norm, " "), t => length(t) > 0)
    val w = size(toks)
    val gh = transform(sequence(lit(1), greatest(w - (n - 1), lit(0))),
      i => xxhash64(concat_ws("\u0001", slice(toks, i, lit(n)))))
    val member = transform(gh, h => array_contains(benchLit, h))
    val keptToks = filter(toks, (_, idx) =>
      !exists(
        sequence(greatest(idx - (n - 1), lit(0)),
          least(idx, size(gh) - 1)),
        j => element_at(member, j + 1)))
    val formula = when(w < n,
        when(array_contains(benchLit, xxhash64(norm)), lit(""))
          .otherwise(norm))
      .otherwise(array_join(keptToks, " "))
    val rows = df.select($"id",
        graft.functions.TextHashExprs.exciseContaminated(norm, sorted, n)
          .as("k"),
        formula.as("f"))
      .collect()
    val bad = rows.filter(r => r.getString(1) != r.getString(2))
    assert(bad.isEmpty,
      s"excise kernel divergence on ${bad.length} docs, first: " +
        bad.headOption.map(r => docs(r.getLong(0).toInt)._2.take(80))
          .getOrElse("") +
        bad.headOption.map(r =>
          s" kernel=[${r.getString(1)}] formula=[${r.getString(2)}]")
          .getOrElse(""))
    // sanity: the benchmark members themselves are fully excised (every
    // gram of a benchmark doc is in the set by construction)
    val self = bench.select($"id",
        graft.functions.TextHashExprs.exciseContaminated(
          Dedup.normalize($"text"), sorted, n).as("k"),
        size(filter(split(Dedup.normalize($"text"), " "),
          t => length(t) > 0)).as("w"))
      .collect()
    self.foreach { r =>
      assert(r.getString(1).isEmpty,
        s"benchmark doc ${r.getLong(0)} not fully excised: [${r.getString(1)}]")
    }
  }
}
