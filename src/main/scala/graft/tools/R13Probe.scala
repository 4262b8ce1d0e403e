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

    // ---- self-join path (minhashCandidates) breakdown -------------------
    val base = docs.select(
        col("doc_id").as("__id"),
        Dedup.shingleHashSet(col("text"), cfg.shingleSize).as("__sh"))
      .withColumn("__sig",
        Dedup.minhashSignature(col("__sh"), cfg.numHashes, cfg.seed))
      .withColumn("__bands",
        Dedup.bandHashes(col("__sig"), cfg.bands, cfg.rowsPerBand))
    time("self.base_cut") {
      noop(base.localCheckpoint(true))
    }
    val baseC = base.localCheckpoint(true)
    val bandedSelf = baseC.select(col("__id"),
      posexplode(col("__bands")).as(Seq("__b", "__bh")))
    val pairsSelf = bandedSelf
      .groupBy(col("__b"), col("__bh"))
      .agg(cappedIds(col("__id")).as("__bk"))
      .filter(col("__bk.n").between(2, 1000))
      .select(explode(col("__bk.ids")).as("id_a"), col("__bk.ids").as("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    time("self.pairs") { noop(pairsSelf) }
    val sigs = baseC.select(col("__id"), col("__sig"))
    val estSelf = pairsSelf
      .join(sigs.select(col("__id").as("id_a"), col("__sig").as("__ga")),
        Seq("id_a"))
      .join(sigs.select(col("__id").as("id_b"), col("__sig").as("__gb")),
        Seq("id_b"))
      .withColumn("__est",
        graft.functions.TextHashExprs.matchingFraction(col("__ga"),
          col("__gb")))
      .filter(col("__est") >= cfg.threshold - margin)
      .select(col("id_a"), col("id_b"))
    time("self.estimated") { noop(estSelf) }
    val sets = baseC.select(col("__id"), col("__sh"))
    val exactSelf = estSelf
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("__sa")),
        Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("__sb")),
        Seq("id_b"))
      .withColumn("jaccard",
        graft.functions.TextHashExprs.jaccardSorted(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= cfg.threshold)
    time("self.exact") { noop(exactSelf) }
    time("self.full_candidates") {
      noop(Dedup.minhashCandidates(docs, "doc_id", "text", cfg))
    }
    println("[r13probe] self n_pairs=" + pairsSelf.count() +
      " n_est=" + estSelf.count() + " n_exact=" + exactSelf.count())
    // selectivity of the size-ratio prune on this fixture
    val sz = baseC.select(col("__id"), size(col("__sh")).as("__n"))
    val nSize = pairsSelf
      .join(sz.select(col("__id").as("id_a"), col("__n").as("__na")),
        Seq("id_a"))
      .join(sz.select(col("__id").as("id_b"), col("__n").as("__nb")),
        Seq("id_b"))
      .filter(least(col("__na"), col("__nb")).cast("double") >=
        lit(cfg.threshold) *
          greatest(col("__na"), col("__nb")).cast("double") - lit(1e-9))
      .count()
    println("[r13probe] self n_size_pass=" + nSize)
    println("[r13probe] size_histogram:")
    baseC.select((size(col("__sh")) / 100).cast("int").as("bucket"))
      .groupBy("bucket").count().orderBy("bucket").show(30)

    // cc label propagation rounds
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", cfg)
      .localCheckpoint(true)
    time("self.cc_labelprop", runs = 3) {
      noop(graft.operators.ConnectedComponents.labelPropagation(
        cand.select(col("id_a"), col("id_b"))))
    }
    spark.stop()
  }
}
