package graft

import org.apache.spark.sql.functions._

/** m08 cross-modal caption↔image consistency gate: structural contracts
  * the two-SF oracle hash cannot state directly. The oracle proves the
  * VALUES; these cases pin the shape — completeness (exactly one row per
  * image-kind document), the derived-column algebra (gap/consistent
  * recompute from the surfaced parts with zero tolerance), range bounds
  * (affinity and brightness both live in [0,1], so the 0.35 gate is
  * meaningful), and determinism across plan executions. */
class CrossModalSpec extends SparkSpec {

  private lazy val result = {
    val df = SparkEntry.queries("m08_caption_consistency")(spark, sf)
    df.collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))
    }
  }

  test("exactly one row per image-kind document (join loses and " +
      "duplicates nothing)") {
    val imgIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val outIds = result.map(_._1)
    assert(outIds.length == outIds.distinct.length, "duplicate doc_ids")
    assert(outIds.toSet == imgIds,
      "output id set != image-kind document set")
  }

  test("gap and consistent recompute exactly from the surfaced columns") {
    result.foreach { case (id, _, _, score, brightness, affinity, gap,
        consistent) =>
      val aff = 0.5 + 0.5 * score / (1.0 + math.abs(score))
      assert(aff == affinity, s"doc $id: affinity algebra drifted")
      assert(math.abs(aff - brightness) == gap,
        s"doc $id: gap != |affinity - brightness|")
      assert((gap <= 0.35) == consistent, s"doc $id: gate flag drifted")
    }
  }

  test("both comparands are bounded in [0,1] — the 0.35 gate binds") {
    result.foreach { case (id, w, h, _, brightness, affinity, _, _) =>
      assert(w >= 1 && w <= 192 && h >= 1 && h <= 108,
        s"doc $id: image geometry outside the encoder caps")
      assert(brightness >= 0.0 && brightness <= 1.0,
        s"doc $id: brightness=$brightness outside [0,1]")
      assert(affinity > 0.0 && affinity < 1.0,
        s"doc $id: affinity=$affinity outside (0,1)")
    }
    // the gate must actually split the corpus at sf0.001 — an
    // all-true or all-false flag would make the oracle hash vacuous
    val flags = result.map(_._8).toSet
    assert(flags == Set(true, false),
      s"gate does not split the fixture corpus: $flags")
  }

  test("m09 audio sibling: one row per audio doc, level bounded, " +
      "algebra recomputes") {
    val audioIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("m09_audio_caption_consistency")(spark, sf)
      .collect().map { r =>
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      }
    assert(rows.map(_._1).toSet == audioIds &&
      rows.length == audioIds.size, "audio id set drifted")
    rows.foreach { case (id, nf, score, level, affinity, gap, consistent) =>
      assert(nf >= 1 && nf <= 4800, s"doc $id: n_frames outside encoder cap")
      assert(level >= 0.0 && level <= 1.0, s"doc $id: level outside [0,1]")
      val aff = 0.5 + 0.5 * score / (1.0 + math.abs(score))
      assert(aff == affinity && math.abs(aff - level) == gap &&
        (gap <= 0.35) == consistent, s"doc $id: m09 algebra drifted")
    }
  }

  test("re-execution is bit-identical (deterministic kernels + decode)") {
    val again = SparkEntry.queries("m08_caption_consistency")(spark, sf)
      .collect().map { r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))
      }
    assert(again.sortBy(_._1).sameElements(result.sortBy(_._1)))
  }
}
