package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Adversarial-regime stress for bloom-prefiltered decontamination
  * (VERDICT r7 directive 8): 10x-clone corpus with a DELIBERATELY
  * undersized bitset, so the bloom runs FP-heavy instead of its tuned
  * ~0.8%. Two invariants, checked on EVERY run:
  *
  *   1. answer identity — the exact-confirm join must kill every false
  *      positive: decontaminateBloom's full result set-equals the exact
  *      decontaminate's (exceptAll both ways), not just on aggregates;
  *   2. real filtering — the probe-hit count over the corpus gram stream
  *      must sit strictly between the true-hit count (FPs exist, the
  *      regime is genuinely adversarial) and the total gram count
  *      (the bloom still prunes; a saturated bitset would pass
  *      everything and silently degrade to t06's join-everything shape).
  *
  * Wall times print per run; take the median of 3 for the committed
  * BASELINE.md row. */
object T22Stress {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = a.lift(1).map(_.toInt).getOrElse(3)
    // undersized on purpose: ~2.7 grams per bit at the 10x bench-gram
    // volume → ~93% of bits set, FP ≈ 0.65 at k=6 — vs the tuned
    // 10 bits/gram (~0.8%). Small enough to be genuinely adversarial,
    // large enough that the probe still prunes a measurable fraction.
    val mBits = a.lift(2).map(_.toInt).getOrElse(1 << 16)
    val docs0 = graft.core.Tables.load(spark, dir, "documents")
    val big = (0 until 10).map(i =>
        docs0.select((col("doc_id") * 10 + i).as("doc_id"),
          col("text")))
      .reduce(_ union _).localCheckpoint(true)
    // split on the BASE document (doc_id div 10), not the clone id — a
    // clone-id split puts a copy of nearly every doc on the bench side,
    // making every corpus gram a TRUE hit (no FP regime to test)
    val bench = big.filter((col("doc_id") / 10).cast("long") % 7 === 0)
    val corpus = big.filter((col("doc_id") / 10).cast("long") % 7 =!= 0)
    println("[t22s] corpus docs=" + corpus.count() +
      " bench docs=" + bench.count() + " mBits=" + mBits)

    // invariant-2 instrumentation: same hash family + bitset the operator
    // builds internally, probed over the same corpus gram stream
    val benchGrams = bench
      .select(explode(Dedup.wordNgramHashSet(col("text"), 8)).as("__g"))
    val bits = Dedup.bloomBitsOf(benchGrams, "__g", mBits)
    val corpusGrams = corpus
      .select(explode(Dedup.wordNgramHashSet(col("text"), 8)).as("__g"))
      .localCheckpoint(true)
    val total = corpusGrams.count()
    val hits = corpusGrams
      .filter(Dedup.bloomMightContain(bits, col("__g"), mBits)).count()
    val trueHits = corpusGrams
      .join(benchGrams.distinct(), Seq("__g"), "left_semi").count()
    println(f"[t22s] grams total=$total hits=$hits true=$trueHits " +
      f"fp-rate=${(hits - trueHits).toDouble / math.max(1, total - trueHits)}%.3f " +
      f"filtered=${1.0 - hits.toDouble / total}%.3f")
    require(hits > trueHits,
      "regime not adversarial: no false positives — bitset too large")
    require(hits < total,
      "bloom saturated: probe passes every gram, no filtering happens")

    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .localCheckpoint(true)
    (1 to reps).foreach { k =>
      val t0 = System.nanoTime()
      val bloom = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
        n = 8, mBits = mBits)
      val diff = bloom.exceptAll(exact).count() + exact.exceptAll(bloom).count()
      println(f"[t22s] run$k wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"diff-rows=$diff")
      require(diff == 0L,
        "answer drifted from exact decontaminate under the FP-heavy regime")
    }
    spark.stop()
  }
}
