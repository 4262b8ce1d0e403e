package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable registry for TRAINED pipeline artifacts (VERDICT r9 directive 2):
  * classifier weights, DSIR ratios, lang-id models, BPE merge tables, IVF
  * centroids, PQ codebooks, and decontamination bloom bitsets persist as
  * versioned parquet instead of living only in per-JVM memo caches — a new
  * session LOADS instead of re-fitting (at 100 TB a refit is a silent
  * repeated full-corpus cost, and an unpinned model is a reproducibility
  * hole: two sessions that refit on a moving corpus score differently).
  *
  * Layout: one artifact = one parquet directory `<root>/<name>/v<N>`, all
  * families sharing ONE long-format schema (section/i/j/p/k/s/v/l) so a
  * single reader serves every kind. Doubles and longs round-trip through
  * parquet bit-exactly, so load-then-apply ≡ fit-then-apply EXACTLY (the
  * scores already hash-verify against the DuckDB twins — ModelStoreSpec
  * pins the equivalence). Versions are append-only: [[nextVersionPath]]
  * allocates v(max+1), [[latestVersion]] resolves the newest, and
  * [[list]] surfaces the whole registry (also exposed in the SQL front
  * door as `INFORMATION_SCHEMA.MODELS` under `SET MODEL_REGISTRY`).
  *
  * Every artifact carries its fit PROVENANCE: the hyperparameters that
  * shaped the feature space (dim/maxN/seed/…) and [[corpusFingerprint]]
  * of the corpus it was fitted on — apply-side code can refuse a model
  * whose fingerprint does not match the corpus snapshot it expects.
  * Driver-side state is bounded by MODEL size (dim, C·dim, merges,
  * k·d, m·kc·subdim, mBits/64 — never the corpus), the same
  * materialize-then-embed bound the fits themselves obey. */
object ModelStore {

  /** The one row layout every artifact family shares. Long-format:
    * `section` names the payload stream ('meta' | 'w' | 'label' | 'lw' |
    * 'merge' | 'centroid' | 'code' | 'bits'), i/j/p are up to three
    * integer indices, k/s carry strings, v doubles, l longs. */
  private val schema = StructType(Seq(
    StructField("section", StringType, nullable = false),
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("p", LongType, nullable = false),
    StructField("k", StringType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("l", LongType, nullable = false)))

  private def row(section: String, i: Long = 0L, j: Long = 0L, p: Long = 0L,
      k: String = "", s: String = "", v: Double = 0.0, l: Long = 0L): Row =
    Row(section, i, j, p, k, s, v, l)

  private def meta(k: String, s: String = "", v: Double = 0.0,
      l: Long = 0L): Row = row("meta", k = k, s = s, v = v, l = l)

  // ---- artifact families -------------------------------------------------

  /** Hashed-gram NB quality classifier (t33's fit output + its feature-
    * space hyperparameters). */
  final case class ClassifierModel(weights: Array[Double], bias: Double,
      dim: Int, maxN: Int, fitFingerprint: Long)

  /** DSIR log importance ratios (t34). */
  final case class DsirModel(weights: Array[Double], dim: Int, maxN: Int,
      fitFingerprint: Long)

  /** Multiclass lang-id: (label, weights, logPrior) in label-ascending
    * order (t35's argmax tie-break contract). */
  final case class LangIdModel(models: Seq[(String, Array[Double], Double)],
      dim: Int, maxN: Int, fitFingerprint: Long)

  /** Ordered BPE merge table (t16/t17): rank i merges (left, right). */
  final case class BpeModel(merges: Seq[(String, String)],
      fitFingerprint: Long)

  /** IVF coarse centroids (s03/s08): centroids(c)(pos). */
  final case class IvfModel(centroids: Seq[Seq[Double]], seed: Long,
      fitFingerprint: Long)

  /** PQ codebooks (s07/s08): codebooks(subspace)(code)(pos). */
  final case class PqModel(codebooks: Seq[Seq[Seq[Double]]], seed: Long,
      fitFingerprint: Long)

  /** Decontamination bloom bitset (t22/t27): the mBits-wide bitset plus
    * its hash-family arity k. */
  final case class BloomModel(bits: Array[Long], mBits: Int, k: Int,
      fitFingerprint: Long)

  /** Trained unigram-LM tokenizer vocab (t38): (piece, count, logp) —
    * counts are the exact longs the logp derive from, so a loaded model
    * can re-derive smoothing-consistent probabilities. */
  final case class UlmModel(pieces: Seq[(String, Long, Double)],
      fitFingerprint: Long)

  /** Order-independent EXACT fingerprint of a fit corpus: XOR of
    * xxhash64(id, text) over all rows — one aggregate, one long, stable
    * under partitioning/order, sensitive to any added/removed/edited doc
    * (an XOR of 64-bit hashes; adversarial collisions are out of scope —
    * this is provenance, not authentication). */
  def corpusFingerprint(df: DataFrame, idCol: String,
      textCol: String): Long = {
    val r = df.select(xxhash64(col(idCol), col(textCol)).as("__h"))
      .agg(expr("bit_xor(__h)").as("fp")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  // ---- save --------------------------------------------------------------

  private def write(spark: SparkSession, path: String, kind: String,
      metas: Seq[Row], payload: Seq[Row]): Unit = {
    val rows = (meta("kind", s = kind) +: metas) ++ payload
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .coalesce(1).write.mode("errorifexists").parquet(path)
  }

  def save(spark: SparkSession, path: String, m: ClassifierModel): Unit =
    write(spark, path, "classifier",
      Seq(meta("dim", l = m.dim), meta("max_n", l = m.maxN),
        meta("bias", v = m.bias), meta("fingerprint", l = m.fitFingerprint)),
      m.weights.toIndexedSeq.zipWithIndex.map { case (w, b) =>
        row("w", i = b, v = w) })

  def save(spark: SparkSession, path: String, m: DsirModel): Unit =
    write(spark, path, "dsir",
      Seq(meta("dim", l = m.dim), meta("max_n", l = m.maxN),
        meta("fingerprint", l = m.fitFingerprint)),
      m.weights.toIndexedSeq.zipWithIndex.map { case (w, b) =>
        row("w", i = b, v = w) })

  def save(spark: SparkSession, path: String, m: LangIdModel): Unit =
    write(spark, path, "langid",
      Seq(meta("dim", l = m.dim), meta("max_n", l = m.maxN),
        meta("fingerprint", l = m.fitFingerprint)),
      m.models.zipWithIndex.flatMap { case ((lbl, w, prior), c) =>
        row("label", i = c, s = lbl, v = prior) +:
          w.toIndexedSeq.zipWithIndex.map { case (x, b) =>
            row("lw", i = c, j = b, v = x) } })

  def save(spark: SparkSession, path: String, m: BpeModel): Unit =
    write(spark, path, "bpe",
      Seq(meta("fingerprint", l = m.fitFingerprint)),
      m.merges.zipWithIndex.map { case ((a, b), r) =>
        row("merge", i = r, k = a, s = b) })

  def save(spark: SparkSession, path: String, m: IvfModel): Unit =
    write(spark, path, "ivf",
      Seq(meta("seed", l = m.seed), meta("fingerprint", l = m.fitFingerprint)),
      m.centroids.zipWithIndex.flatMap { case (c, ci) =>
        c.zipWithIndex.map { case (x, pos) =>
          row("centroid", i = ci, j = pos, v = x) } })

  def save(spark: SparkSession, path: String, m: PqModel): Unit =
    write(spark, path, "pq",
      Seq(meta("seed", l = m.seed), meta("fingerprint", l = m.fitFingerprint)),
      m.codebooks.zipWithIndex.flatMap { case (sub, si) =>
        sub.zipWithIndex.flatMap { case (c, ci) =>
          c.zipWithIndex.map { case (x, pos) =>
            row("code", i = si, j = ci, p = pos, v = x) } } })

  def save(spark: SparkSession, path: String, m: BloomModel): Unit =
    write(spark, path, "bloom",
      Seq(meta("m_bits", l = m.mBits), meta("bloom_k", l = m.k),
        meta("fingerprint", l = m.fitFingerprint)),
      m.bits.toIndexedSeq.zipWithIndex.map { case (w, i) =>
        row("bits", i = i, l = w) })

  def save(spark: SparkSession, path: String, m: UlmModel): Unit =
    write(spark, path, "ulm",
      Seq(meta("fingerprint", l = m.fitFingerprint)),
      m.pieces.zipWithIndex.map { case ((p, c, lp), i) =>
        row("piece", i = i, s = p, l = c, v = lp) })

  // ---- load --------------------------------------------------------------

  private def readAll(spark: SparkSession, path: String)
      : (Map[String, Row], Array[Row]) = {
    // bounded by MODEL size (see object scaladoc), never the corpus
    val rows = spark.read.schema(schema).parquet(path).collect()
    val metas = rows.filter(_.getString(0) == "meta")
      .map(r => r.getString(4) -> r).toMap
    (metas, rows)
  }

  /** The artifact kind stored at `path` ('classifier' | 'dsir' | …). */
  def kindOf(spark: SparkSession, path: String): String = {
    val (metas, _) = readAll(spark, path)
    metas("kind").getString(5)
  }

  def loadClassifier(spark: SparkSession, path: String): ClassifierModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "classifier",
      s"$path holds a ${metas("kind").getString(5)}, not a classifier")
    val dim = metas("dim").getLong(7).toInt
    val w = new Array[Double](dim)
    rows.filter(_.getString(0) == "w")
      .foreach(r => w(r.getLong(1).toInt) = r.getDouble(6))
    ClassifierModel(w, metas("bias").getDouble(6), dim,
      metas("max_n").getLong(7).toInt, metas("fingerprint").getLong(7))
  }

  def loadDsir(spark: SparkSession, path: String): DsirModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "dsir",
      s"$path holds a ${metas("kind").getString(5)}, not a dsir model")
    val dim = metas("dim").getLong(7).toInt
    val w = new Array[Double](dim)
    rows.filter(_.getString(0) == "w")
      .foreach(r => w(r.getLong(1).toInt) = r.getDouble(6))
    DsirModel(w, dim, metas("max_n").getLong(7).toInt,
      metas("fingerprint").getLong(7))
  }

  def loadLangId(spark: SparkSession, path: String): LangIdModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "langid",
      s"$path holds a ${metas("kind").getString(5)}, not a langid model")
    val dim = metas("dim").getLong(7).toInt
    val labels = rows.filter(_.getString(0) == "label")
      .map(r => r.getLong(1).toInt -> ((r.getString(5), r.getDouble(6))))
      .sortBy(_._1)
    val ws = labels.map(_ => new Array[Double](dim))
    rows.filter(_.getString(0) == "lw").foreach(r =>
      ws(r.getLong(1).toInt)(r.getLong(2).toInt) = r.getDouble(6))
    LangIdModel(
      labels.map { case (c, (lbl, prior)) => (lbl, ws(c), prior) }.toSeq,
      dim, metas("max_n").getLong(7).toInt, metas("fingerprint").getLong(7))
  }

  def loadBpe(spark: SparkSession, path: String): BpeModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "bpe",
      s"$path holds a ${metas("kind").getString(5)}, not a bpe model")
    BpeModel(rows.filter(_.getString(0) == "merge")
        .sortBy(_.getLong(1))
        .map(r => (r.getString(4), r.getString(5))).toSeq,
      metas("fingerprint").getLong(7))
  }

  def loadIvf(spark: SparkSession, path: String): IvfModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "ivf",
      s"$path holds a ${metas("kind").getString(5)}, not an ivf model")
    val cs = rows.filter(_.getString(0) == "centroid")
      .groupBy(_.getLong(1)).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getLong(2)).map(_.getDouble(6)).toSeq }
    IvfModel(cs, metas("seed").getLong(7), metas("fingerprint").getLong(7))
  }

  def loadPq(spark: SparkSession, path: String): PqModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "pq",
      s"$path holds a ${metas("kind").getString(5)}, not a pq model")
    val cb = rows.filter(_.getString(0) == "code")
      .groupBy(_.getLong(1)).toSeq.sortBy(_._1)
      .map { case (_, sub) =>
        sub.groupBy(_.getLong(2)).toSeq.sortBy(_._1)
          .map { case (_, c) =>
            c.sortBy(_.getLong(3)).map(_.getDouble(6)).toSeq } }
    PqModel(cb, metas("seed").getLong(7), metas("fingerprint").getLong(7))
  }

  def loadBloom(spark: SparkSession, path: String): BloomModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "bloom",
      s"$path holds a ${metas("kind").getString(5)}, not a bloom model")
    val bits = rows.filter(_.getString(0) == "bits").sortBy(_.getLong(1))
      .map(_.getLong(7)).toArray
    BloomModel(bits, metas("m_bits").getLong(7).toInt,
      metas("bloom_k").getLong(7).toInt, metas("fingerprint").getLong(7))
  }

  def loadUlm(spark: SparkSession, path: String): UlmModel = {
    val (metas, rows) = readAll(spark, path)
    require(metas("kind").getString(5) == "ulm",
      s"$path holds a ${metas("kind").getString(5)}, not a unigram-LM vocab")
    UlmModel(rows.filter(_.getString(0) == "piece").sortBy(_.getLong(1))
        .map(r => (r.getString(5), r.getLong(7), r.getDouble(6))).toSeq,
      metas("fingerprint").getLong(7))
  }

  // ---- versioning / registry ----------------------------------------------

  private def fs(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsOf(spark: SparkSession, root: String,
      name: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(root, name)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toIndexedSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
      .sorted
  }

  /** Path of the NEXT version of `name` under `root` (v1 if none exist) —
    * append-only: saves never overwrite a published version. */
  def nextVersionPath(spark: SparkSession, root: String,
      name: String): String =
    s"$root/$name/v${versionsOf(spark, root, name).lastOption.getOrElse(0) + 1}"

  /** Newest published version of `name`, if any. */
  def latestVersion(spark: SparkSession, root: String,
      name: String): Option[String] =
    versionsOf(spark, root, name).lastOption.map(v => s"$root/$name/v$v")

  /** The registry catalog: one row per (name, version) with its kind and
    * provenance metadata — the DataFrame behind the SQL front door's
    * `INFORMATION_SCHEMA.MODELS` (under `SET MODEL_REGISTRY '<root>'`). */
  def list(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val entries =
      if (!f.exists(rootPath)) Seq.empty[(String, Int, String)]
      else f.listStatus(rootPath).toIndexedSeq.filter(_.isDirectory)
        .map(_.getPath.getName).sorted.flatMap { name =>
          versionsOf(spark, root, name).map(v => (name, v, s"$root/$name/v$v"))
        }
    entries.map { case (name, v, path) =>
      val (metas, _) = readAll(spark, path)
      def lm(k: String): Long =
        metas.get(k).map(_.getLong(7)).getOrElse(0L)
      (name, v, metas("kind").getString(5), lm("dim"), lm("max_n"),
        lm("fingerprint"), path)
    }.toDF("model_name", "version", "kind", "dim", "max_n",
      "fit_fingerprint", "path")
  }
}
