package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // closest to 0
    (2L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal to 0
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite of 0
    (5L, Array(1.0f, 0.0f, 0.0f, 0.0f))    // duplicate of 0
  ).toDF("vec_id", "embedding")

  test("cosine column computes expected values") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" === 0L && $"b.vec_id" === 3L)
      .select(Similarity.cosine($"a.embedding", $"b.embedding")).as[Double].head()
    assert(math.abs(c) < 1e-9)
  }

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val q = vecs.filter($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(5L, 1L, 2L)) // dup first (cos=1)
    assert(top.head.getDouble(2) == 1.0)
  }

  test("lsh top-k finds the exact duplicate with rank 1") {
    val q = vecs.filter($"vec_id" === 0L)
    val top = Similarity.lshTopK(vecs, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 3, dim = 4, bitsPerTable = 2, tables = 4)
      .orderBy($"rank").collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(1) == 5L && top.head.getDouble(2) == 1.0)
  }

  test("ivf top-k finds the exact duplicate with rank 1") {
    val q = vecs.filter($"vec_id" === 0L)
    val top = Similarity.ivfTopK(vecs, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 3, nCentroids = 2, nProbe = 2)
      .orderBy($"rank").collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(1) == 5L && top.head.getDouble(2) == 1.0)
  }

  test("knn graph: duplicate pair are each other's rank-1, ranks contiguous") {
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding",
      k = 3, dim = 4, bitsPerTable = 2, tables = 4)
    val rows = g.collect()
    val top1 = rows.filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0 and 5 are identical vectors: each must be the other's best neighbor
    assert(top1(0L) == 5L && top1(5L) == 0L)
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("node_id", "neighbor_id", "cos_sim", "rank"))
    // per-node ranks are 1..n without gaps and capped at k
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.size) && ranks.size <= 3)
    }
    // the duplicate edge carries exact cosine 1.0
    val e05 = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 5L).get
    assert(e05.getDouble(2) == 1.0)
  }

  test("semDedup: transitive clusters keep the min-id representative") {
    import spark.implicits._
    // chain: 10 ~ 11 ~ 12 (adjacent cos > 0.999, ends further apart) — all
    // three must collapse to the single representative 10 TRANSITIVELY
    val chain = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(1.0f, 0.03f, 0.0f, 0.0f)),
      (12L, Array(1.0f, 0.06f, 0.0f, 0.0f)),
      (20L, Array(0.0f, 0.0f, 1.0f, 0.0f))  // isolated: always survives
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(chain, "vec_id", "embedding",
        threshold = 0.999, dim = 4, bitsPerTable = 2, tables = 6)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L))
  }

  test("salted join equals plain join (Skew.saltedJoin)") {
    import graft.operators.Skew
    val big = Seq((1, "x"), (1, "y"), (1, "z"), (2, "w")).toDF("k", "v")
    val dim = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k", "name")
    val salted = Skew.saltedJoin(big, dim, "k", saltFactor = 4)
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    val plain = big.join(dim, Seq("k"))
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("embedding near-dup pairs catch duplicates above threshold") {
    val pairs = Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.99, dim = 4, bitsPerTable = 2, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 5L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("int8 quantization: round-half-up codes, zero vector stays zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = df.select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // scale = 127/1.0; 0.5*127+0.5 = 64.0 → floor 64; -127+0.5 → floor -126.5 = -127
    assert(q(1L) == Seq(127, -127, 64, 0))
    assert(q(2L) == Seq(0, 0, 0, 0))
  }

  test("integer dot (reference semantics) ≡ codegen double-fold on codes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Seq(0.3f, -0.7f, 0.05f, 1.0f),
                      Seq(-0.9f, 0.2f, 0.8f, -0.1f))).toDF("id", "a", "b")
    val (viaInt, viaFold) = df.select(
        Similarity.dotInt(
          Similarity.quantizeInt8(col("a")), Similarity.quantizeInt8(col("b")))
          .cast("double"),
        Similarity.dot(
          graft.functions.VecExprs.quantizeCodes(col("a")),
          graft.functions.VecExprs.quantizeCodes(col("b"))))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    assert(viaInt == viaFold)
  }

  test("quantized ANN ranking ≈ exact ranking on well-separated clusters") {
    // clusters far apart: int8 rounding can't reorder them
    val q0 = vecs.filter($"vec_id" === 0L)
    val qt = Similarity.quantizedTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 2)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 2)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(qt.toSeq == exact.toSeq)
  }

  test("pqTopK: lossless codebooks reproduce exact ranking; codes quantize") {
    import org.apache.spark.sql.functions.col
    // codebook 0 holds every sub0 present → reconstruction exact → the
    // ADC ranking must equal brute force on the same fixture
    val cb0 = Seq(Seq(1.0, 0.0), Seq(0.9, 0.1), Seq(0.5, 0.5),
      Seq(0.0, 1.0), Seq(-1.0, 0.0))
    val cb1 = Seq(Seq(0.0, 0.0))
    val q0 = vecs.filter($"vec_id" === 0L)
    val pq = Similarity.pqTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 3, Seq(cb0, cb1), dim = 4)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.toSeq == exact.toSeq)
    // lossy codebook: (0.5,0.5) snaps to its nearest code, score follows
    // the RECONSTRUCTION — vec 2 ranked by cos(code), not cos(original)
    val lossy = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val pq2 = Similarity.pqTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 5, Seq(lossy, cb1), dim = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // vec 2 = (.5,.5,0,0) → code (1,0,0,0) → pq_cos = dot/( ‖code‖·‖q‖ )
    // = 1/(1·1) against q=(1,0,0,0)
    assert(math.abs(pq2(2L) - 1.0) < 1e-12)
  }

  test("ivfPqTopK: single-cell + lossless codebooks ≡ brute force; " +
      "probing restricts candidates to probed cells") {
    import org.apache.spark.sql.functions.col
    val cb0 = Seq(Seq(1.0, 0.0), Seq(0.9, 0.1), Seq(0.5, 0.5),
      Seq(0.0, 1.0), Seq(-1.0, 0.0))
    val cb1 = Seq(Seq(0.0, 0.0))
    val q0 = vecs.filter($"vec_id" === 0L)
    // one coarse cell = no pruning; lossless codes = exact scores
    val one = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 3,
        coarse = Seq(Seq(0.0, 0.0, 0.0, 0.0)), codebooks = Seq(cb0, cb1),
        dim = 4, nProbe = 1)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.toSeq == exact.toSeq)
    // two coarse cells around ±x, nProbe=1: query (1,0,0,0) probes its own
    // cell — vec 4 = (−1,0,0,0) lives in the other cell, never a candidate
    val probed = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        q0, "vec_id", "embedding", k = 5,
        coarse = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(-1.0, 0.0, 0.0, 0.0)),
        codebooks = Seq(cb0, cb1), dim = 4, nProbe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(!probed.contains(4L) && probed.contains(1L))
  }

  test("kmeansAssign: nearest centroid wins, distance ties to smaller cell") {
    import org.apache.spark.sql.functions.col
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val out = Similarity.kmeansAssign(vecs, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(out(0L) == ((0, 0.0)))          // exactly centroid 0
    assert(out(1L)._1 == 0 && out(3L)._1 == 1)
    assert(out(5L) == ((0, 0.0)))
    // (0.5, 0.5): equidistant from both centroids → smaller cell id
    assert(out(2L)._1 == 0)
    // (−1,0,0,0): 4.0 from c0, 2.0 from c1 → cell 1, exact distance 2.0
    assert(out(4L) == ((1, 2.0)))
  }

  test("semDedupKMeans: within-cluster dups drop keep-earliest; " +
      "cross-cluster near-dups survive (the paper's recall trade)") {
    import org.apache.spark.sql.functions.col
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    // vecs: 0,1,5 land in cell 0 (0≈1≈5 near-dups); 3 in cell 1; 4 → cell
    // whose distance is smaller: (−1,0,0,0) is 4.0 from c0, 2.0 from c1 → 1
    val out = Similarity.semDedupKMeans(vecs, "vec_id", "embedding",
        cents, threshold = 0.95)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 1 and 5 are cos≥0.95 to 0 within cell 0 → dropped, 0 kept
    assert(!out.contains(1L) && !out.contains(5L) && out(0L) == 0)
    // 2 (cos .707 to everything) and the cell-1 residents survive
    assert(out.contains(2L) && out(3L) == 1 && out(4L) == 1)
    // determinism: survivors are a pure function of (data, centroids)
    val again = Similarity.semDedupKMeans(vecs, "vec_id", "embedding",
        cents, threshold = 0.95)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(again == out.keySet)
  }

  test("semDedupKMeans: over-cap clusters skip dedup observably, " +
      "never go quadratic silently") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a degenerate corpus: 50 identical vectors → ONE cluster, all mutual
    // near-dups. Under the cap they'd collapse to one survivor; OVER the
    // cap the cluster skips dedup and every row passes through, with the
    // skip count emitted on the semdedup_kmeans observation.
    val clones = (0L until 50L).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val capped = Similarity.semDedupKMeans(clones, "vec_id", "embedding",
      cents, threshold = 0.95, maxCluster = 10)
    // the action must run THIS df's QueryExecution (count() plans its own)
    assert(capped.collect().length == 50)
    val metric = capped.queryExecution.observedMetrics("semdedup_kmeans")
    assert(metric.getAs[Long]("skipped_cluster_rows") == 50L)
    // same corpus under a generous cap: one survivor, zero skips
    val full = Similarity.semDedupKMeans(clones, "vec_id", "embedding",
      cents, threshold = 0.95)
    assert(full.collect().map(_.getLong(0)).toSeq == Seq(0L))
    assert(full.queryExecution.observedMetrics("semdedup_kmeans")
      .getAs[Long]("skipped_cluster_rows") == 0L)
  }

  test("recallAtK: per-query hit counts and recall fractions exact") {
    import spark.implicits._
    val exact = Seq(
      (1, 10L), (1, 11L), (1, 12L), (1, 13L),
      (2, 20L), (2, 21L)).toDF("query_id", "neighbor_id")
    val approx = Seq(
      (1, 10L), (1, 13L), (1, 99L),  // 2 of 4 hit; 99 is a non-hit extra
      (2, 20L), (2, 21L),            // perfect
      (3, 30L)                       // query absent from ground truth
    ).toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(exact, approx)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // ground-truth-driven: query 3 (no exact rows) doesn't appear;
    // approx extras never inflate recall
    assert(got.keySet == Set(1, 2))
    assert(got(1) == ((4L, 2L, 0.5)))
    assert(got(2) == ((2L, 2L, 1.0)))
  }

  test("recallAtK: duplicate approx pairs are deduped, never inflate n_hit " +
      "past n_exact (recall stays <= 1.0)") {
    import spark.implicits._
    val exact = Seq((1, 10L), (1, 11L)).toDF("query_id", "neighbor_id")
    // a contract-violating topK producer emits (1,10) three times; the
    // left join would otherwise count it 3x -> n_hit=4 > n_exact=2
    val approx = Seq((1, 10L), (1, 10L), (1, 10L), (1, 11L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(exact, approx)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1) == ((2L, 2L, 1.0)))
  }
}
