package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dml, Multimodal, Recursive}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeInto = update-else-insert keyed semantics (Merge.java:146)") {
    val target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "v", "x")
    val source = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("k", "v", "x")
    val out = Dml.mergeInto(target, source, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)))
  }

  test("mergeInto duplicate source keys: last wins / error / unchecked") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val source = Seq((2, "first"), (3, "x"), (2, "last")).toDF("k", "v")

    // default: sequential-apply net effect — last source row per key wins
    val out = Dml.mergeInto(target, source, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "a"), (2, "last"), (3, "x")))

    // error mode mirrors the reference's PK violation (Merge.java:146)
    val err = intercept[Exception] {
      Dml.mergeInto(target, source, Seq("k"), onDupSourceKeys = "error").collect()
    }
    assert(err.getMessage.contains("duplicate source key"))

    // error mode passes untouched when keys are unique
    val clean = Seq((2, "B"), (4, "d")).toDF("k", "v")
    assert(Dml.mergeInto(target, clean, Seq("k"), onDupSourceKeys = "error")
      .count() == 3)

    // unchecked keeps the zero-cost legacy contract (caller pre-dedups)
    assert(Dml.mergeInto(target, clean, Seq("k"), onDupSourceKeys = "unchecked")
      .count() == 3)
  }

  test("update rewrites only matching rows; delete keeps null-condition rows") {
    val t = Seq((1, 5.0), (2, -3.0)).toDF("k", "bal")
    val upd = Dml.update(t, $"bal" < 0, Map("bal" -> lit(0.0)))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(upd == Set((1, 5.0), (2, 0.0)))

    val d = Seq((1, Some(true)), (2, Some(false)), (3, None)).toDF("k", "del")
    val kept = Dml.delete(d, $"del").select("k").as[Int].collect().toSet
    assert(kept == Set(2, 3)) // null condition ⇒ not deleted
  }

  test("recursive fixpointAll generates the H2 UNION ALL sequence") {
    val out = Recursive.fixpointAll(spark.range(1, 2).toDF("n")) { f =>
      f.filter($"n" < 5).select(($"n" + 1).as("n"))
    }.as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("recursive fixpoint computes transitive closure (distinct)") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val seed = edges.select($"src".as("origin"), $"dst".as("node"))
    val closure = Recursive.fixpoint(seed) { f =>
      f.join(edges, f("node") === edges("src"))
        .select(f("origin"), edges("dst").as("node"))
    }.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(closure == Set((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)))
  }

  test("multimodal decode is deterministic with the declared schema") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(50)
    val media = Multimodal.syntheticMedia(docs)
    val meta1 = Multimodal.decodeMeta(media)
    assert(meta1.schema == Multimodal.metaSchema)
    val a = meta1.collect().map(_.toString).sorted
    val b = Multimodal.decodeMeta(media).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(meta1.count() == 50)
  }

  test("frame sampling explodes only video/audio rows with frame counts") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(60)
    val meta = Multimodal.decodeMeta(Multimodal.syntheticMedia(docs))
    val frames = Multimodal.sampleFrames(meta, everyNth = 10)
    assert(frames.count() > 0)
    val bad = frames.filter($"frame_idx" >= $"n_frames" || $"frame_idx" % 10 =!= 0)
    assert(bad.count() == 0)
  }

  test("frameChecksums: one row per image, one per decoded video frame, " +
      "video frames agree with decodeMeta's whole-payload sum") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(60)
    val media = Multimodal.syntheticMedia(docs)
    val frames = Multimodal.frameChecksums(media)
    assert(frames.schema == Multimodal.frameSchema)
    assert(frames.filter($"kind" === "audio").count() == 0)
    // each image contributes exactly one frame row at frame_idx 0
    val imgIds = media.filter($"kind" === "image").select($"media_id")
      .as[Long].collect().toSet
    val imgFrames = frames.filter($"kind" === "image")
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect()
    assert(imgFrames.map(_._1).toSet == imgIds)
    assert(imgFrames.forall(_._2 == 0))
    // per-video: frame count and SUM of per-frame checksums must equal
    // decodeMeta's n_frames / whole-payload content_sum (the independent
    // decode path), and frame indices are 0..n-1
    val perVideo = frames.filter($"kind" === "video")
      .groupBy($"media_id")
      .agg(count(lit(1)).as("nf"), sum($"pix_sum").as("s"),
        min($"frame_idx").as("lo"), max($"frame_idx").as("hi"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))).toMap
    val meta = Multimodal.decodeMeta(media).filter($"kind" === "video")
      .select($"media_id", $"n_frames", $"content_sum")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(perVideo.keySet == meta.keySet)
    meta.foreach { case (id, (nf, cs)) =>
      val (gotNf, gotSum, lo, hi) = perVideo(id)
      assert(gotNf == nf.toLong && gotSum == cs && lo == 0 && hi == nf - 1)
    }
  }

  test("frameDedup: static-scene videos collapse to one distinct frame; " +
      "counts and representative are exact") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(60)
    val media = Multimodal.syntheticMedia(docs)
    val frames = Multimodal.frameChecksums(media).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4), r.getLong(5),
        r.getLong(6)))
    val expected = frames.groupBy(t => (t._2, t._3, t._4, t._5)).map {
      case (k, rows) =>
        k -> ((rows.length.toLong, rows.map(_._1).distinct.length.toLong,
          rows.map(_._1).min))
    }
    val got = Multimodal.frameDedup(media).collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
    // the static-scene contract: some video has >1 frame but the content
    // dedups to a single distinct (its n_frames collapses into one row)
    assert(expected.exists { case (_, (nFrames, nMedia, _)) => nFrames > nMedia })
  }

  test("frameDedup key is order-sensitive: two frames with the same pixel " +
      "MULTISET but permuted order share pix_sum yet get distinct keys") {
    def png(pixels: Array[Int]): Array[Byte] = {
      // 2x2 gray image from 4 channel values (r=g=b per pixel)
      val img = new java.awt.image.BufferedImage(
        2, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var i = 0
      while (i < 4) {
        val v = pixels(i)
        img.setRGB(i % 2, i / 2, (v << 16) | (v << 8) | v)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "image", png(Array(10, 20, 30, 40))),
      org.apache.spark.sql.Row(2L, "image", png(Array(40, 30, 20, 10))))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val fr = Multimodal.frameChecksums(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(5), r.getLong(6)))).toMap
    assert(fr(1L)._1 == fr(2L)._1)  // additive sums collide (same multiset)
    assert(fr(1L)._2 != fr(2L)._2)  // weighted sums separate them
    assert(Multimodal.frameDedup(media).count() == 2) // NOT merged
  }

  test("resizeImages: bounded geometry, aspect kept, no-op when small, " +
      "no-op checksum equals the decode checksum") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(60)
    val media = Multimodal.syntheticMedia(docs)
    val meta = Multimodal.decodeMeta(media).filter($"kind" === "image")
      .select($"media_id", $"width", $"height", $"content_sum")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    val out = Multimodal.resizeImages(media, maxEdge = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))))
      .toMap
    assert(out.keySet == meta.keySet)
    out.foreach { case (id, (w, h, ow, oh, sum)) =>
      assert((w, h) == ((meta(id)._1, meta(id)._2)))
      assert(math.max(ow, oh) <= math.max(64, 1) && ow >= 1 && oh >= 1)
      if (math.max(w, h) <= 64) {
        // no resample: geometry unchanged and the checksum of the
        // re-encoded image must equal the original decode checksum
        assert((ow, oh) == ((w, h)) && sum == meta(id)._3)
      } else {
        // integer NN mapping, exactly
        assert(ow == math.max(1, w * 64 / math.max(w, h)) &&
          oh == math.max(1, h * 64 / math.max(w, h)))
      }
    }
    // the fixture spans both branches
    assert(out.exists { case (_, (w, h, _, _, _)) => math.max(w, h) > 64 })
    assert(out.exists { case (_, (w, h, _, _, _)) => math.max(w, h) <= 64 })
  }

  test("imagePHash: deterministic, equal for identical content, " +
      "distinct for the fixture pair, bits only where blocks exist") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog many many times"),
      (3L, "the quick brown fox jumps over the lazy dog many many times"),
      (6L, "completely different content with other words and rhythm here")
    ).toDF("doc_id", "text") // ids ≡ 0 mod 3 → all image kind
    val media = Multimodal.syntheticMedia(docs)
    val got = Multimodal.imagePHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.keySet == Set(0L, 3L, 6L))
    // identical text → identical payload → identical hash
    assert(got(0L) == got(3L))
    // this specific fixture pair differs (deterministic corpus, stable)
    assert(got(0L) != got(6L))
    // determinism across evaluations
    val again = Multimodal.imagePHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == got)
  }

  test("feature extraction yields fixed-dim float vectors") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(20)
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs), dim = 8)
    assert(feats.select(size($"feature")).as[Int].collect().forall(_ == 8))
  }

  test("aggregators: group_concat ordering, histogram counts, selectivity") {
    val gc = udaf(new graft.functions.Aggregators.GroupConcat("-"))
    val df = Seq(("b", "x2"), ("a", "x1"), ("c", "x3")).toDF("k", "v")
    val s = df.agg(gc($"k", $"v")).as[String].head()
    assert(s == "x1-x2-x3")

    val hist = udaf(new graft.functions.Aggregators.Histogram,
      org.apache.spark.sql.Encoders.LONG)
    val h = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("x").agg(hist($"x"))
      .as[Seq[(Long, Long)]].head()
    assert(h == Seq((1L, 2L), (2L, 1L), (3L, 3L)))

    val sel = udaf(new graft.functions.Aggregators.Selectivity(),
      org.apache.spark.sql.Encoders.LONG)
    val v = (1L to 100L).map(i => i % 10).toDF("x").agg(sel($"x")).as[Int].head()
    assert(v == 10)
  }

  test("CollectCappedPairs: aligned arrays, true count over cap, no truncation under") {
    val cp = udaf(new graft.functions.Aggregators.CollectCappedPairs(5))
    // 8 pairs into one group across 4 partitions: n must be the true count,
    // at most 5 stored, and as(i)/bs(i) must stay aligned (b = a * 100)
    val df = spark.range(8).repartition(4)
      .select(lit(1).as("g"), $"id".as("a"), ($"id" * 100).as("b"))
    val over = df.groupBy($"g").agg(cp($"a", $"b").as("bk"))
      .select($"bk.n", $"bk.as", $"bk.bs").head()
    assert(over.getLong(0) == 8L)
    val as = over.getSeq[Long](1); val bs = over.getSeq[Long](2)
    assert(as.size == 5 && bs.size == 5)
    assert(as.indices.forall(i => bs(i) == as(i) * 100))
    // under the cap: everything kept, still aligned
    val under = spark.range(4).repartition(2)
      .select(lit(1).as("g"), $"id".as("a"), ($"id" * 7).as("b"))
      .groupBy($"g").agg(cp($"a", $"b").as("bk"))
      .select($"bk.n", $"bk.as", $"bk.bs").head()
    assert(under.getLong(0) == 4L)
    assert(under.getSeq[Long](1).sorted == Seq(0L, 1L, 2L, 3L))
    assert(under.getSeq[Long](1).zip(under.getSeq[Long](2))
      .forall { case (a, b) => b == a * 7 })
  }

  test("asofJoin: backward match, equal-time tie, strict mode, no-match null") {
    import graft.operators.AsofJoin
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 50L))
      .toDF("id", "k", "t")
    val right = Seq(
      ("a", 10L, "r10"), ("a", 15L, "r15"), ("c", 1L, "rc"))
      .toDF("k", "rt", "payload")

    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("payload"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.toString.toLong), Option(r.getString(4))))).toMap
    assert(out(1L) == ((Some(10L), Some("r10"))))  // equal time matches (<=)
    assert(out(2L) == ((Some(15L), Some("r15"))))  // latest earlier row
    assert(out(3L) == ((None, None)))              // nothing at-or-before
    assert(out(4L) == ((None, None)))              // key with no right rows

    val strict = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("payload"), strict = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(strict(1L).isEmpty)            // equal time excluded under <
    assert(strict(2L) == Some("r15"))
  }

  test("bucketedRangeJoin ≡ naive range join, boundaries exact") {
    import graft.operators.RangeJoin
    val left = Seq((1L, "a", 1000L), (2L, "a", 5000L), (3L, "b", 1000L))
      .toDF("lid", "k", "lt")
    val right = (0L until 40L).map(i => (100L + i, "a", i * 250L))
      .toDF("rid", "k", "rt")
    val got = RangeJoin.bucketedRangeJoin(left, right, Seq("k"),
        "lt", "rt", lowerMs = -1000L, upperMs = 500L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, Seq("k"))
      .filter($"rt" >= $"lt" - 1000L && $"rt" < $"lt" + 500L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
    // window [0, 1500) for lid=1: rt 0,250,...,1250 → 6 matches incl. both
    // boundaries behaving half-open
    assert(got.count(_._1 == 1L) == 6)
    assert(got.count(_._1 == 3L) == 0) // key isolation
  }

  test("asofJoin: NULL payload on the matched row stays NULL") {
    import graft.operators.AsofJoin
    val left = Seq((1L, "a", 30L)).toDF("id", "k", "t")
    val right = Seq(("a", 10L, Some("old")), ("a", 20L, None))
      .toDF("k", "rt", "payload")
    val r = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
      Seq("payload")).head()
    // matched row is t=20 (its null payload must NOT fall through to t=10)
    assert(r.getLong(3) == 20L && r.isNullAt(4))
  }

  test("asofJoin: NULL times never match (SQL inequality semantics)") {
    import graft.operators.AsofJoin
    val left = Seq((1L, "a", Some(30L)), (2L, "a", None)).toDF("id", "k", "t")
    val right = Seq(("a", None: Option[Long], "phantom"), ("a", Some(20L), "real"))
      .toDF("k", "rt", "payload")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("payload"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(out(1L) == Some("real")) // NULL-time right row is invisible
    assert(out(2L).isEmpty)         // NULL-time left row matches nothing
  }

  test("bucketedRangeJoin: exact buckets beyond 2^53 (epoch-nanos units)") {
    import graft.operators.RangeJoin
    val base = 1704067200000000000L // epoch ns, > 2^53
    val left = Seq((1L, "a", base)).toDF("lid", "k", "lt")
    val right = Seq((10L, "a", base - 999L), (11L, "a", base - 1000L),
        (12L, "a", base + 1L))
      .toDF("rid", "k", "rt")
    val got = RangeJoin.bucketedRangeJoin(left, right, Seq("k"),
        "lt", "rt", lowerMs = -1000L, upperMs = 1L) // caller units: ns
      .select("rid").collect().map(_.getLong(0)).toSet
    // [base-1000, base+1): rid 10 and 11 in, 12 out (half-open upper)
    assert(got == Set(10L, 11L))
  }
}
