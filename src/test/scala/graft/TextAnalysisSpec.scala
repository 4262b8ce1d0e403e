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
}
