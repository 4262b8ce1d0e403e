package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Decode-cache hit-rate instrumentation (VERDICT r10 directive 3): p03's
  * wall time has read high in three degraded-box windows, and a silently
  * cold/dead content-addressed frame cache would look EXACTLY like a slow
  * box. This pins the cache structurally: the number of REAL PNG decodes
  * a video pass performs must equal Σ(distinct compressed frames per
  * video) — strictly fewer than the total frame count, because the
  * synthetic corpus (like still-heavy real corpora) repeats compressed
  * frames verbatim. A dead cache fails the equality loudly; no wall-clock
  * reading is involved. */
class DecodeCacheSpec extends SparkSpec {

  test("video decode count == Σ distinct frames per video (cache " +
      "collapses byte-identical repeats)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val videos = Multimodal.syntheticMedia(docs)
      .filter(col("kind") === "video")
      .select("media_id", "payload").collect()
    assert(videos.nonEmpty, "fixture has no video rows")

    // expected decodes: the distinct compressed-frame count per container
    // (the same per-video content-addressing the engine caches on)
    var totalFrames = 0L
    var distinctFrames = 0L
    videos.foreach { r =>
      val frames = Multimodal
        .gvidFrames(r.getLong(0), r.getAs[Array[Byte]](1)).toSeq
      totalFrames += frames.size
      distinctFrames += frames.map(java.nio.ByteBuffer.wrap).toSet.size
    }
    assert(distinctFrames < totalFrames,
      s"fixture has no repeated frames (distinct=$distinctFrames of " +
        s"$totalFrames) — the cache assertion would be vacuous")

    val media = Multimodal.syntheticMedia(docs)
      .filter(col("kind") === "video")
    val before = Multimodal.frameDecodeCount.get()
    Multimodal.decodeMeta(media).write.format("noop")
      .mode("overwrite").save()
    val decodes = Multimodal.frameDecodeCount.get() - before
    assert(decodes == distinctFrames,
      s"decodeMeta ran $decodes real decodes; expected $distinctFrames " +
        s"(distinct frames) of $totalFrames total — cache hit rate " +
        "regressed")

    // the feature pass shares the same per-video cache discipline
    val before2 = Multimodal.frameDecodeCount.get()
    Multimodal.extractFeatures(media).write.format("noop")
      .mode("overwrite").save()
    val decodes2 = Multimodal.frameDecodeCount.get() - before2
    assert(decodes2 == distinctFrames,
      s"extractFeatures ran $decodes2 real decodes; expected " +
        s"$distinctFrames")
  }

  test("a checkpointed media frame feeds both consumers from ONE encode " +
      "pass (p03's Checkpoint.cut contract)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // the counter measures real codec work only: null texts return before
    // the increment, so the contract binds on NON-NULL payloads
    val nPayloads = docs.filter(docs("text").isNotNull).count()
    // snapshot BEFORE the cut: an eager checkpoint runs the encode at
    // cut() time, which is exactly the once we want to count
    val before = Multimodal.mediaEncodeCount.get()
    // p03's exact staging: encode once behind the cut, consume twice
    val media = Multimodal.syntheticMedia(docs)
      .transform(graft.core.Checkpoint.cut)
    Multimodal.extractFeatures(media, dim = 16).write.format("noop")
      .mode("overwrite").save()
    Multimodal.decodeMeta(media).write.format("noop")
      .mode("overwrite").save()
    val encodes = Multimodal.mediaEncodeCount.get() - before
    assert(encodes == nPayloads,
      s"two consumers of the cut media frame cost $encodes encodes for " +
        s"$nPayloads payloads — the materialization barrier regressed")
  }

  test("codec hot paths stay off the JDK's globally-locked provider " +
      "registries") {
    // r12 amplified-bench finding: AudioSystem's encode AND decode both
    // resolve providers through JDK13Services.getProviders, which is
    // `static synchronized` — a process-global lock taken per clip that
    // serialized 32-thread audio stages to ~0.4 ms/clip (m06 12.5x at
    // 10x data while the image family parallelized). The WAV container
    // is written and parsed directly now; this lint keeps the registry
    // call from quietly coming back.
    val src = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "src/main/scala/graft/operators/Multimodal.scala"))
    assert(!src.contains("javax.sound.sampled.AudioSystem"),
      "an AudioSystem provider-registry call was reintroduced on a " +
        "codec path — it serializes every decode/encode thread in the " +
        "process; use parseWavPcm / the canonical RIFF write instead")
  }
}
