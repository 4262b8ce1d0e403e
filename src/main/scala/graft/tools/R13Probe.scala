package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Incremental}

/** r13 scratch probe: sub-stage timing inside p07's candidate path.
  * Not part of the driver contract. */
object R13Probe {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, runs: Int = 3)(f: => Unit): Unit = {
      f
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[r13probe] $label median=${ts(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    println("[r13probe] n_docs=" + docs.count())
    val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_r13_probe_state").toFile.getAbsolutePath
    val prior = docs.filter(col("doc_id") % 10 =!= 9)
    Incremental.writeDedupState(prior, "doc_id", "text", cfg, stateDir)
    val stateBytes = new java.io.File(stateDir + "/dedup_state.parquet")
      .listFiles().map(_.length()).sum
    println("[r13probe] state_bytes=" + stateBytes)
    val delta = docs.filter(col("doc_id") % 10 === 9)

    val raw = graft.core.Tables.load(spark, stateDir, "dedup_state")
    time("state.raw_all_cols") { noop(raw) }
    time("state.id_sig_only") { noop(raw.select("doc_id", "sig")) }
    time("state.id_sig_bands") {
      noop(raw.select(col("doc_id"), col("sig"))
        .withColumn("b", Dedup.bandHashes(col("sig"), cfg.bands,
          cfg.rowsPerBand)))
    }
    time("state.id_nrm") { noop(raw.select("doc_id", "nrm")) }
    time("state.id_sh") { noop(raw.select("doc_id", "sh")) }

    val st = Incremental.readDedupState(spark, stateDir, cfg)
    val bPrep = Dedup.crossPrep(delta, "doc_id", "text", cfg)

    // sub-stages of crossMinhashCandidatesPrepped
    val cappedIds = udaf(
      new graft.functions.Aggregators.CollectCapped(1000),
      org.apache.spark.sql.Encoders.LONG)
    def bucketIds(base: org.apache.spark.sql.DataFrame, out: String) = base
      .select(col("__id"), posexplode(col("__bands")).as(Seq("__b", "__bh")))
      .groupBy(col("__b"), col("__bh"))
      .agg(cappedIds(col("__id")).as("__bk"))
      .filter(col("__bk.n") <= 1000)
      .select(col("__b"), col("__bh"), col("__bk.ids").as(out))

    time("cand.bucket_corpus") { noop(bucketIds(st, "__cids")) }
    time("cand.bucket_batch") { noop(bucketIds(bPrep, "__bids")) }
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
    time("cand.bucket_corpus_fb100k") { noop(bucketIds(st, "__cids")) }
    time("cand.bucket_batch_fb100k") { noop(bucketIds(bPrep, "__bids")) }
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    val pairs = bucketIds(bPrep, "__bids")
      .join(bucketIds(st, "__cids"), Seq("__b", "__bh"))
      .select(explode(col("__bids")).as("batch_id"), col("__cids"))
      .select(col("batch_id"), explode(col("__cids")).as("corpus_id"))
      .distinct()
    time("cand.pairs") { noop(pairs) }
    val margin = 2.0 / math.sqrt(cfg.numHashes.toDouble)
    val estimated = pairs
      .join(bPrep.select(col("__id").as("batch_id"), col("__sig").as("__ga")),
        Seq("batch_id"))
      .join(st.select(col("__id").as("corpus_id"), col("__sig").as("__gb")),
        Seq("corpus_id"))
      .withColumn("__est",
        graft.functions.TextHashExprs.matchingFraction(col("__ga"),
          col("__gb")))
      .filter(col("__est") >= cfg.threshold - margin)
      .select(col("batch_id"), col("corpus_id"))
    time("cand.estimated") { noop(estimated) }
    time("cand.full") {
      noop(Dedup.crossMinhashCandidatesPrepped(bPrep, st, cfg, 1000))
    }
    println("[r13probe] n_pairs=" + pairs.count() +
      " n_est=" + estimated.count())
    spark.stop()
  }
}
