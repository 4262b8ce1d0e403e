package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Unigram-LM tokenizer trainer (t38/t39): the deterministic prune
  * sequence, the Viterbi convention, and the encode round trip — on a
  * hand-built corpus where the right answers are computable by eye. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // "abab" dominates: the piece 'ab' (and 'abab') must out-survive junk
  private lazy val corpus = Seq(
    (1L, "abab abab abab cd"),
    (2L, "abab abab cd cd"),
    (3L, "abab xy"),
    (4L, "abab abab abab abab")).toDF("doc_id", "text")

  test("trainer: chars always survive, high-frequency pieces out-survive " +
      "junk, the prune sequence is deterministic across re-runs") {
    val v1 = TextAnalysis.unigramLmTrain(corpus, "text", vocabSize = 8,
        seedMaxLen = 4, seedMultiCap = 16, emIters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val v2 = TextAnalysis.unigramLmTrain(corpus, "text", vocabSize = 8,
        seedMaxLen = 4, seedMultiCap = 16, emIters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(v1 == v2) // bit-identical refit (counts are exact longs)
    val pieces = v1.map(_._1).toSet
    val chars = Set("a", "b", "c", "d", "x", "y")
    assert(chars.subsetOf(pieces), s"mandatory chars missing: $pieces")
    assert(v1.size == 8)
    // the two multi slots (8 − 6 chars) go to the two real repeated
    // words by Viterbi count — 'abab' (10) and 'cd' (3); the singleton
    // 'xy' and every transient fragment ('ab' loses its mass to 'abab'
    // once the longer piece exists) are pruned
    val multi = pieces -- chars
    assert(multi == Set("abab", "cd"), s"prune picked: $multi")
  }

  test("viterbiSegment: longest-trailing-piece tie convention, " +
      "char fallback keeps every word segmentable") {
    val logp = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -2.0, "abab" -> -4.0)
    // 'abab': [abab] scores -4.0; [ab][ab] also -4.0 — the tie keeps the
    // LONGEST trailing piece, and backtracking from the end the single
    // 4-symbol piece wins
    assert(TextAnalysis.viterbiSegment("abab", logp, 4) == Vector("abab"))
    // 'aba': [ab][a] = -5.0 beats [a][b][a] = -9.0
    assert(TextAnalysis.viterbiSegment("aba", logp, 4) == Vector("ab", "a"))
    // unseen chars would break coverage — with chars present, any word
    // segments (here 'ba' has no 'ba' piece: [b][a])
    assert(TextAnalysis.viterbiSegment("ba", logp, 4) == Vector("b", "a"))
    assert(TextAnalysis.viterbiSegment("", logp, 4) == Vector.empty)
  }

  test("encode round trip: n_pieces from the trained vocab, empty docs " +
      "report zeros, piece mass is Viterbi-consistent with the trainer") {
    val trained = TextAnalysis.unigramLmTrain(corpus, "text", vocabSize = 8,
        seedMaxLen = 4, seedMultiCap = 16, emIters = 2)
      .select("piece", "logp").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val withEmpty = corpus.union(Seq((5L, "")).toDF("doc_id", "text"))
    val byId = TextAnalysis.unigramLmEncode(
        withEmpty, "doc_id", "text", trained)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(5L) == ((0L, 0L)))
    // doc 4: four 'abab' words; with 'abab' (or 2×'ab') in vocab each
    // word is 1-2 pieces — never the 4-char fallback
    val (nTok4, nP4) = byId(4L)
    assert(nTok4 == 4L && nP4 <= 8L && nP4 >= 4L, (nTok4, nP4))
    // piece mass ≥ token count (a word is at least one piece)
    byId.values.foreach { case (t0, p0) => assert(p0 >= t0) }
  }
}
