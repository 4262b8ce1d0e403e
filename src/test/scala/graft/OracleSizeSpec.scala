package graft

/** Oracle-blob size caps (VERDICT r10 directive 1b): oracle_sql.json grew
  * to 10.3 MB (single generated oracles to 1.5 MB — the pure-SQL XXH64
  * chain macro-expanded its byte-extraction tree ~18× per stage, and each
  * 1024-dim weight table cost ~30 bytes/double), and artifact size became
  * the single point of driver-verification failure: CORRECTNESS_r10 came
  * back `{}`. The chain is now staged through lateral aliases and weight
  * lists ride one split-string literal, so the caps here pin the fixed
  * per-oracle structure cost: any regression back toward macro-expansion
  * fails the build before it can kill a round's artifacts.
  *
  * Generated at sf0.001 (trains every model on the small fixture). The
  * corpus-dependent VALUES tables (vocab replays) grow mildly with SF —
  * Verify's verify_status.json records the actual sf0.01 sizes per run —
  * but the structural costs capped here are SF-independent. */
class OracleSizeSpec extends SparkSpec {

  test("every generated oracle stays under 300 KB and the blob under " +
      "3 MB (sf0.001)") {
    val oracles = SparkEntry.oracleSqlFor(spark, "/root/testdata/sf0.001")
    assert(oracles.size >= 170, s"only ${oracles.size} oracles generated")
    val sizes = oracles.map { case (k, v) =>
      k -> v.getBytes("UTF-8").length }
    val over = sizes.filter(_._2 > 300 * 1024)
    assert(over.isEmpty,
      s"oracles over the 300 KB single-query cap: $over")
    val total = sizes.values.sum
    assert(total <= 3 * 1024 * 1024,
      s"oracle blob is $total bytes, over the 3 MB cap; largest: " +
        sizes.toSeq.sortBy(-_._2).take(5).mkString(", "))
  }
}
