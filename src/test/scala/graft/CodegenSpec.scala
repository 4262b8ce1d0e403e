package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The custom expressions must run INSIDE whole-stage codegen (round-2:
  * they were CodegenFallback). CODEGEN_ONLY + fallback=false makes any
  * broken generated path a hard error instead of a silent interpreted
  * fallback, and parity against default mode pins the semantics. */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (3L, "the quick brown fox jumps over the lazy cat and runs far away home"),
    (4L, "completely different content about spark dataframes and catalyst"),
    (5L, "xy") // shorter than the shingle size → degenerate branch
  ).toDF("doc_id", "text")

  private def forced[A](body: => A): A = {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("text-hash expressions evaluate under forced codegen with eval parity") {
    def all() = docs.select(
        $"doc_id",
        Dedup.shingleHashSet($"text", 5).as("sh"),
        graft.functions.TextHashExprs.winnowFingerprint(
          Dedup.normalize($"text"), 8, 4).as("fp"),
        Dedup.simhashColumn($"text").as("sim"))
      .withColumn("sig",
        graft.functions.TextHashExprs.minhashSig($"sh", 32, 42L))
      .select($"doc_id", $"sim",
        xxhash64(concat_ws(",", transform($"sh", _.cast("string")))).as("sh_h"),
        xxhash64(concat_ws(",", transform($"fp", _.cast("string")))).as("fp_h"),
        xxhash64(concat_ws(",", transform($"sig", _.cast("string")))).as("sig_h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val generated = forced(all())
    assert(generated == all())
    assert(generated.size == 5)
  }

  test("word_segments under forced codegen ≡ token-slice composition") {
    import graft.functions.TextHashExprs
    val texts = Seq((1L, "a b c d e f g"), (2L, "one two"), (3L, " "),
      (4L, "x")).toDF("id", "text")
    def segs() = texts.select($"id",
        TextHashExprs.wordSegments(Dedup.normalize($"text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val generated = forced(segs())
    assert(generated == segs())
    assert(generated(1L) == List("a b c", "d e f", "g")) // trailing partial
    assert(generated(2L) == List("one two"))
    assert(generated(3L) == Nil) // whitespace-only normalizes to empty
    assert(generated(4L) == List("x"))
  }

  test("char_grams under forced codegen ≡ per-position substring") {
    import graft.functions.TextHashExprs
    val texts = Seq((1L, "abcde"), (2L, "ab"), (3L, "")).toDF("id", "text")
    def grams() = texts.select($"id",
        TextHashExprs.charGrams($"text", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val generated = forced(grams())
    assert(generated == grams())
    assert(generated(1L) == List("abc", "bcd", "cde"))
    assert(generated(2L) == Nil) // shorter than k → empty
    assert(generated(3L) == Nil)
  }

  test("vector expressions (dot_product, quantize_int8) under forced codegen") {
    import graft.functions.VecExprs
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(0.1f, 0.2f, 0.3f))).toDF("id", "v")
    def all() = vecs.select($"id",
        VecExprs.dotProduct($"v", $"v").as("d"),
        VecExprs.quantizeCodes($"v").as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toList)).toSet
    val generated = forced(all())
    assert(generated == all())
    assert(generated.exists { case (id, _, q) =>
      id == 1L && q == List(64.0, -127.0, 32.0) })
    assert(generated.exists { case (id, _, q) =>
      id == 2L && q == List(0.0, 0.0, 0.0) })
  }

  test("jaccard/matching-fraction binary expressions under forced codegen") {
    def pairs() = Dedup.minhashCandidates(docs, "doc_id", "text",
        Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val generated = forced(pairs())
    assert(generated == pairs())
    assert(generated.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }
}
