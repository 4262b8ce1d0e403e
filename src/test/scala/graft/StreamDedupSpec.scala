package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.6)

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home", "2024-01-01 10:00:00"),
    (4L, "completely different content about spark dataframes and catalyst", "2024-01-01 10:01:00"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away home", "2024-01-01 10:02:00"),
    (5L, "unrelated short text that matches nothing else in this corpus", "2024-01-01 10:03:00"),
    (3L, "the quick brown fox jumps over the lazy cat and runs far away home", "2024-01-01 10:04:00"),
    (6L, "the quick brown fox jumps over the lazy dog and runs far away home", "2024-01-01 10:05:00")
  ).map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    .toDF("doc_id", "text", "ts")

  /** Brute-force expectation: (earlier, later) by arrival where the pair
    * shares ≥1 LSH band AND the signature estimate clears threshold−2σ. */
  private lazy val expected: Set[(Long, Long)] = {
    val rows = docs
      .withColumn("sig", Dedup.minhashSignature(
        Dedup.shingleHashSet($"text", cfg.shingleSize), cfg.numHashes, cfg.seed))
      .withColumn("bands", Dedup.bandHashes($"sig", cfg.bands, cfg.rowsPerBand))
      .select($"doc_id", $"sig", $"bands", unix_millis($"ts").as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray, r.getLong(3)))
      .sortBy(x => (x._4, x._1))
    val margin = 2.0 / math.sqrt(cfg.numHashes.toDouble)
    (for {
      i <- rows.indices
      j <- (i + 1) until rows.length
      (ida, siga, bandsa, _) = rows(i)
      (idb, sigb, bandsb, _) = rows(j)
      if bandsa.zip(bandsb).exists { case (x, y) => x == y }
      est = siga.zip(sigb).count { case (x, y) => x == y }.toDouble / siga.length
      if est >= cfg.threshold - margin
    } yield (ida, idb)).toSet
  }

  test("batch-mode execution of the streaming operator matches brute force") {
    val got = StreamDedup.minhashCandidatesStream(docs, cfg)
      .collect().map(p => (p.id_prior, p.id_new)).toSet
    assert(got == expected)
    // the dense-dup cluster (1,2,6 identical; 3 near) is fully linked
    assert(expected.contains((1L, 2L)) && expected.contains((1L, 6L))
      && expected.contains((2L, 6L)) && expected.contains((1L, 3L)))
    assert(!expected.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("streaming run (two micro-batches) equals batch mode and brute force") {
    val dir = Files.createTempDirectory("graft_sdedup").toFile.getAbsolutePath
    val (first, second) = (docs.filter($"doc_id" <= 4), docs.filter($"doc_id" > 4))
    first.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamDedup.minhashCandidatesStream(stream, cfg)
      .writeStream.format("memory").queryName("graft_stream_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      second.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("graft_stream_dedup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming decontamination ≡ batch ≡ the t06 join path") {
    import graft.streaming.StreamDecontaminate
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words beta gamma delta epsilon zeta eta theta iota suffix"),
      (2L, "no overlap with anything in the benchmark set at all here now"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "short doc"),
      (5L, null.asInstanceOf[String])) // NULL text → (0, false) on BOTH paths
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // batch-mode execution of the streaming operator == the join-based op
    val joinPath = rows(Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8))
    val statelessBatch = rows(StreamDecontaminate.decontaminateStream(
      corpus, bench, "doc_id", "text", n = 8))
    assert(statelessBatch == joinPath)
    // true streaming run (two micro-batches) emits the same rows
    val dir = Files.createTempDirectory("graft_sdecon").toFile.getAbsolutePath
    corpus.filter($"doc_id" <= 2).coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema).parquet(dir)
    val q = StreamDecontaminate.decontaminateStream(
        stream, bench, "doc_id", "text", n = 8)
      .writeStream.format("memory").queryName("graft_stream_decon")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      corpus.filter($"doc_id" > 2).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(rows(spark.table("graft_stream_decon")) == joinPath)
    } finally q.stop()
  }

  test("streaming BLOOM decontamination ≡ t22 batch ≡ the t06 join path " +
      "(zero streaming state; two micro-batches)") {
    import graft.streaming.StreamDecontaminate
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words beta gamma delta epsilon zeta eta theta iota suffix"),
      (2L, "no overlap with anything in the benchmark set at all here now"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "short doc"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val joinPath = rows(Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8))
    // deliberately undersized bitset (t22's adversarial FP regime): the
    // exact-confirm join must still kill every false positive
    val batchBloom = rows(Dedup.decontaminateBloom(
      corpus, bench, "doc_id", "text", n = 8, mBits = 1 << 10, k = 6))
    assert(batchBloom == joinPath)
    val dir = Files.createTempDirectory("graft_sbdecon").toFile.getAbsolutePath
    corpus.filter($"doc_id" <= 2).coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema).parquet(dir)
    val acc = java.util.Collections.synchronizedSet(
      new java.util.HashSet[(Long, Long, Boolean)]())
    val q = StreamDecontaminate.decontaminateBloomStream(
        stream, bench, "doc_id", "text", n = 8, mBits = 1 << 10, k = 6) {
        (batch, _) => batch.collect().foreach(r =>
          acc.add((r.getLong(0), r.getLong(1), r.getBoolean(2))))
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      corpus.filter($"doc_id" > 2).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      // zero streaming state engaged: no stateful operator in the query
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty)
      import scala.jdk.CollectionConverters._
      assert(acc.asScala.toSet == joinPath)
    } finally q.stop()
  }

  test("quality gates (t29/t30 signals) run unchanged on readStream " +
      "and match batch row for row") {
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "the cat sat and that dog ran to be of it " +
        (1 to 60).map(i => s"word$i").mkString(" ")),
      (2L, "dup line\ndup line\n" + Seq.fill(6)("a b").mkString(" ")),
      (3L, "short one")).toDF("doc_id", "text")
    // the compared output must CARRY both gates' columns — a projection
    // that drops the t29 signals would let Catalyst prune them and the
    // test would prove nothing about their streaming behavior
    def gates(df: org.apache.spark.sql.DataFrame) = {
      val staged = df
        .select(col("doc_id") +: col("text") +:
          TextAnalysis.gopherSignals(col("text"), minStopHits = 1L): _*)
        .withColumn("__r",
          graft.functions.TextHashExprs.gopherRepetition(col("text")))
      val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
        .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
        .reduce(_ && _)
      staged.select(col("doc_id"), col("gopher_pass"), col("stop_hits"),
        col("n_words"), col("bullet_ratio"), col("symbol_ratio"),
        repPass.as("rep_pass"),
        element_at(col("__r"), 1).as("dup_line_frac"),
        element_at(col("__r"), 5).as("top_2gram_char_frac"))
    }
    val batch = gates(corpus).collect().map(_.toString).sorted.toSeq
    val dir = Files.createTempDirectory("graft_sqgate").toFile.getAbsolutePath
    corpus.filter($"doc_id" <= 1).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = gates(spark.readStream.schema(corpus.schema).parquet(dir))
      .writeStream.format("memory").queryName("graft_stream_qgate")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      corpus.filter($"doc_id" > 1).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_qgate")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("full quality funnel (rules + learned classifier + DSIR weight) " +
      "runs unchanged on readStream — the fit-offline/apply-on-ingest shape") {
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "the cat sat and that dog ran to be of it " +
        (1 to 60).map(i => s"word$i").mkString(" ")),
      (2L, "dup line\ndup line\n" + Seq.fill(6)("a b").mkString(" ")),
      (3L, "short one"),
      (4L, "the cat and the dog sat to be of it in a house with " +
        (1 to 50).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    // models fit OFFLINE on the static corpus (exact long counts →
    // deterministic weights); the stream applies them as plan literals —
    // the deployment shape: refit on snapshots, score every ingested row
    val label = TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last
    val (clfW, clfB) = TextAnalysis.qualityClassifierFit(corpus, "text",
      label, dim = 256, maxN = 2)
    val dsirW = TextAnalysis.dsirFit(corpus, "text", $"doc_id" <= 2,
      dim = 256, maxN = 2)
    def funnel(df: org.apache.spark.sql.DataFrame) = {
      val c4 = TextAnalysis.c4Signals(col("text"))
      val staged = df.select(col("doc_id"),
        TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last,
        c4.last,
        graft.functions.TextHashExprs.gopherRepetition(col("text")).as("__r"),
        graft.functions.TextHashExprs.hashedGramScore(
          Dedup.normalize(col("text")), clfW, clfB, maxN = 2).as("clf_score"),
        graft.functions.TextHashExprs.hashedGramScore(
          Dedup.normalize(col("text")), dsirW, 0.0, maxN = 2).as("dsir_logw"))
      val repPass = TextAnalysis.gopherRepetitionBars.zipWithIndex
        .map { case (bar, i) => element_at(col("__r"), i + 1) <= bar }
        .reduce(_ && _)
      staged.select(col("doc_id"), col("gopher_pass"),
        repPass.as("rep_pass"), col("c4_keep"), col("clf_score"),
        col("dsir_logw"),
        (col("gopher_pass") && repPass && col("c4_keep") &&
          col("clf_score") > lit(0.0)).as("keep"))
    }
    val batch = funnel(corpus).collect().map(_.toString).sorted.toSeq
    val dir = Files.createTempDirectory("graft_sqfun").toFile.getAbsolutePath
    corpus.filter($"doc_id" <= 2).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = funnel(spark.readStream.schema(corpus.schema).parquet(dir))
      .writeStream.format("memory").queryName("graft_stream_funnel")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      corpus.filter($"doc_id" > 2).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_funnel")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
      // stateless by construction: no stateful operator may appear
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("span-level decontamination (t36 kernel) runs unchanged on " +
      "readStream — benchmark grams ride the task binary, zero state") {
    val bench = Seq(
      (100L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "keep0 one two three four five six seven eight keepz"),
      (2L, "nothing shared at all in this row of plain words here"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val batch = Dedup.decontaminateSpans(corpus, bench, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    // the same sorted benchmark array applied to a streaming corpus: the
    // operator's corpus side is a pure select, so it accepts a streaming
    // frame directly
    val dir = Files.createTempDirectory("graft_sspan").toFile.getAbsolutePath
    corpus.filter($"doc_id" <= 1).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = Dedup.decontaminateSpans(
        spark.readStream.schema(corpus.schema).parquet(dir),
        bench, "doc_id", "text")
      .writeStream.format("memory").queryName("graft_stream_span")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      corpus.filter($"doc_id" > 1).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_span")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
