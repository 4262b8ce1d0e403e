package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Incremental, TextAnalysis}

/** r13 stage-timing harness for the VERDICT r12 directives 2/3: time the
  * individual stages of p07_incremental_ingest and p01_corpus_prep in
  * isolation (noop sink per guide §1.4) so the drift watches can be
  * root-caused instead of re-based. Scratch tool — not part of the driver
  * contract. Usage: runMain graft.tools.R13Stage <sfDir> [p07|p01]
  */
object R13Stage {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a(0)
    val which = if (a.length > 1) a(1) else "all"

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, runs: Int = 3)(f: => Unit): Double = {
      f // warm-up
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.size / 2)
      println(f"[r13stage] $label median=$med%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
      med
    }

    val docs = graft.core.Tables.load(spark, dir, "documents")

    if (which == "p07" || which == "all") {
      val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16,
        threshold = 0.35)
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft_r13_p07_state").toFile.getAbsolutePath
      val prior = docs.filter(col("doc_id") % 10 =!= 9)
      Incremental.writeDedupState(prior, "doc_id", "text", cfg, stateDir)
      val delta = docs.filter(col("doc_id") % 10 === 9)

      spark.sparkContext.setJobDescription("p07 stage: state read")
      time("p07.state_read") {
        noop(Incremental.readDedupState(spark, stateDir, cfg))
      }
      spark.sparkContext.setJobDescription("p07 stage: delta prep")
      time("p07.delta_prep") {
        noop(Dedup.crossPrep(delta, "doc_id", "text", cfg))
      }
      spark.sparkContext.setJobDescription("p07 stage: banded candidates")
      time("p07.candidates") {
        val st = Incremental.readDedupState(spark, stateDir, cfg)
        val bPrep = Dedup.crossPrep(delta, "doc_id", "text", cfg)
        noop(Dedup.crossMinhashCandidatesPrepped(bPrep, st, cfg, 1000))
      }
      spark.sparkContext.setJobDescription("p07 stage: exact victims")
      time("p07.exact_victims") {
        val st = Incremental.readDedupState(spark, stateDir, cfg)
        val bPrep = Dedup.crossPrep(delta, "doc_id", "text", cfg)
        noop(bPrep.select(col("__id").as("__victim"), col("__nrm"))
          .join(st.select(col("__nrm")).distinct(), Seq("__nrm"), "left_semi")
          .select(col("__victim")))
      }
      spark.sparkContext.setJobDescription("p07 stage: full cross-dedup")
      time("p07.cross_dedup") {
        noop(Incremental.crossDedupAgainstState(delta, "doc_id", "text",
          stateDir, cfg))
      }
      spark.sparkContext.setJobDescription("p07 full query")
      time("p07.full_query") {
        noop(graft.SparkEntry.queries("p07_incremental_ingest")(spark, dir))
      }
      spark.sparkContext.setJobDescription(null)
    }

    if (which == "p01" || which == "all") {
      val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16,
        threshold = 0.35)
      def alphaOf(c: org.apache.spark.sql.Column) = when(length(c) > 0,
        length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") / length(c))
        .otherwise(lit(0.0))
      val withAlpha = docs.select(col("doc_id"), col("text"),
        alphaOf(col("text")).as("alpha_ratio"))

      spark.sparkContext.setJobDescription("p01 stage: minhash candidates")
      time("p01.candidates") {
        noop(Dedup.minhashCandidates(withAlpha, "doc_id", "text", cfg))
      }
      spark.sparkContext.setJobDescription("p01 stage: clusters (cc)")
      time("p01.clusters") {
        noop(Dedup.minhashClusters(withAlpha, "doc_id", "text", cfg))
      }
      spark.sparkContext.setJobDescription("p01 stage: representatives")
      val reps = Dedup.qualityRepresentatives(withAlpha, "doc_id", "text",
          "alpha_ratio", cfg)
        .filter(col("keep")).select(col("doc_id"), col("text"))
      time("p01.representatives") { noop(reps) }
      spark.sparkContext.setJobDescription("p01 stage: span removal (d16)")
      val cleaned = Dedup.removeDuplicateSpans(reps, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("clean_text"))
      time("p01.span_removal") { noop(cleaned) }
      spark.sparkContext.setJobDescription("p01 stage: blocklist gate (t09)")
      val gated = cleaned.select(col("doc_id") +: col("clean_text") +:
          TextAnalysis.blocklistSignals(col("clean_text"),
            Seq("dup", "spam", "error"), maxRatio = 0.05): _*)
        .filter(col("blocklist_keep"))
      time("p01.blocklist") { noop(gated) }
      spark.sparkContext.setJobDescription("p01 stage: budget select (u08)")
      val scored = gated
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("clean_text")).as("n_toks"),
          alphaOf(col("clean_text")).as("alpha_ratio"))
      time("p01.budget_select") {
        noop(graft.operators.Sampling.budgetSelect(scored, "doc_id",
          "source", "alpha_ratio", "n_toks", budgetTokens = 1500L))
      }
      spark.sparkContext.setJobDescription("p01 full query")
      time("p01.full_query") {
        noop(graft.SparkEntry.queries("p01_corpus_prep")(spark, dir))
      }
      spark.sparkContext.setJobDescription(null)
    }

    spark.stop()
  }
}
