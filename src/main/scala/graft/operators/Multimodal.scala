package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference surface): image/audio/video
  * as opaque `binary` payloads + typed metadata, with decode / feature-
  * extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is REAL — schemas, batched per-partition
  * execution, partitioning behavior, row-explosion for frames — while the
  * codec itself is a clearly marked deterministic STUB (this container has
  * no image/audio libraries): `stubDecode` derives metadata from the bytes
  * alone. Swapping in a real codec changes only the body of that one
  * function; every schema and operator stays.
  *
  * mapPartitions (preference (d) of the build brief) is deliberate here:
  * a real decoder is per-row imperative native code — exactly the case the
  * brief reserves it for — and batching per partition amortizes codec init.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val metaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("format", StringType, nullable = true)))

  /** Deterministic synthetic media table derived from `documents` (the
    * corpus ships no binary column): payload = utf8 bytes, kind by modulus. */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  // ======================= STUB CODEC =======================
  // ??? in spirit: a real build links an image/audio decoder here. The stub
  // is a pure function of the payload bytes so tests are deterministic.
  private def stubDecode(id: Long, kind: String, payload: Array[Byte]): Row = {
    val n = if (payload == null) 0L else payload.length.toLong
    val h = if (payload == null) 0L
    else payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
    kind match {
      case "image" =>
        Row(id, kind, n, (math.abs(h) % 1920 + 1).toInt,
          (math.abs(h / 7) % 1080 + 1).toInt, null, "stub/png")
      case "audio" =>
        Row(id, kind, n, null, null, (math.abs(h) % 4800 + 1).toInt, "stub/wav")
      case _ =>
        Row(id, kind, n, (math.abs(h) % 1280 + 1).toInt,
          (math.abs(h / 7) % 720 + 1).toInt, (math.abs(h / 11) % 300 + 1).toInt,
          "stub/mp4")
    }
  }
  // ==========================================================

  /** Decode stage: batched per partition; output partitioning inherits the
    * input's (no shuffle — decode is map-shaped). */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(metaSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        // per-partition codec init would go here (amortized across the batch)
        rows.map(r => stubDecode(r.getLong(0), r.getString(1),
          r.getAs[Array[Byte]](2)))
      }(enc)
  }

  /** Frame sampling: one output row per sampled frame index — row explosion
    * stays lazy/columnar via posexplode; no per-row JVM objects beyond the
    * generated rows. `everyNth` controls the stride. */
  def sampleFrames(decoded: DataFrame, everyNth: Int = 30): DataFrame =
    decoded.filter(col("n_frames").isNotNull)
      .select(col("media_id"), col("kind"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(everyNth)))
          .as(Seq("sample_idx", "frame_idx")))

  /** Feature extraction stage: deterministic pseudo-embedding per media row
    * (STUB — stands in for a vision/audio encoder); shape (dim) and batch
    * plumbing are real. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val seed = if (p == null) id else id * 31 + p.length
        val rnd = new scala.util.Random(seed)
        Row(id, Array.fill(dim)(rnd.nextFloat()))
      }
    }(enc)
  }

  /** Resize stage (STUB codec, real plumbing): recompute metadata bounded to
    * a max edge, preserving aspect via integer math. */
  def resizeMeta(decoded: DataFrame, maxEdge: Int = 512): DataFrame =
    decoded.withColumn("scale",
        when(greatest(col("width"), col("height")) > maxEdge,
          lit(maxEdge.toDouble) / greatest(col("width"), col("height")))
          .otherwise(lit(1.0)))
      .withColumn("out_width", (col("width") * col("scale")).cast("int"))
      .withColumn("out_height", (col("height") * col("scale")).cast("int"))
      .drop("scale")
}
