package graft

import graft.SparkEntry

/** Plan-shape assertions: the properties that make these queries survive a
  * 100× scale-up — filter/column pushdown into the parquet scan, broadcast
  * of small dims, TakeOrderedAndProject for top-k, partial+final hash
  * aggregation, whole-stage codegen presence. A regression here is a
  * performance bug even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Final AQE plan: execute first so isFinalPlan=true (codegen markers
    * only appear in the final adaptive plan). */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02 filter+projection push into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_discount"), p) // filter reached the source
    // column pruning: only the 6 needed columns in ReadSchema
    val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs.contains("l_partkey") && !rs.contains("l_tax"), rs)
  }

  test("q03 broadcasts the small dims, shuffles the facts") {
    val p = plan("q03_join_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
    // partial+final aggregation (distributed agg decomposition)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q18 top-k plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q18_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
  }

  test("q09 semi-join planned as a real semi join") {
    val p = plan("q09_semi_join")
    assert(p.contains("LeftSemi"), p)
  }

  test("q01 aggregation runs inside whole-stage codegen") {
    val p = finalPlan("q01_pricing_summary")
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
  }

  test("q16 distinct decomposes into partial+final hash aggregate") {
    val p = plan("q16_distinct_multi")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q66 range join plans as an equi-join on (key, bucket), never nested loops") {
    val p = plan("q66_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p) // the degeneracy the bucketing exists to avoid
    assert(p.contains("__bkt"), p) // time bucket is part of the join key
  }

  test("q65 as-of join: per-key window only, no global sort or nested loops") {
    val p = plan("q65_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    // every sort is partition-local under a hash partitioning on user_id,
    // never a rangepartitioning(=global) sort
    assert(!p.contains("rangepartitioning"), p)
  }

  test("t08 vocab top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("t08_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t07 PII scan has no exchange at all") {
    val p = plan("t07_pii_redact")
    assert(!p.contains("Exchange"), p)
  }

  test("s05 knn graph: bucket equi-join + bounded-heap top-k, no nested loops") {
    val p = plan("s05_knn_graph")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p) // candidates come from the (table, bucket) equi-join, never all-pairs
    assert(p.contains("TopKPerKey"), p) // custom bounded-heap operator
  }

  test("q73 lateral top-n decorrelates into a window, no per-row re-execution") {
    val p = plan("q73_lateral")
    // Catalyst rewrites the correlated LIMIT subquery into a partitioned
    // window + filter — the reference would re-run it per row
    // (Select.java:510-567 setEvaluatableRecursive)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t10 trigram quality: equi-joins only, partial+final model aggregate") {
    val p = plan("t10_trigram_quality")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the corpus model aggregates map-side before its shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("d13 duplicate spans: hashed-gram partial agg + semi join, no straggler window") {
    val p = finalPlan("d13_duplicate_spans").split("== Initial Plan ==")(0)
    // dup-count (hashed gram) + islands (doc) — the gram build sits behind
    // the checkpoint cut; nothing else shuffles
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 3, p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the dup test MUST be a partial-aggregated groupBy feeding a semi join
    // (map-side combine collapses hot boilerplate grams; AQE can split or
    // broadcast a join where a count window is one unsplittable partition)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("partial_count"), p)
    // and the only windows left are the per-DOC island windows, never a
    // gram-partitioned one
    assert(!p.contains("windowspecdefinition(gram"), p)
  }

  test("d04 simhash buckets are capped with observable drops") {
    val p = finalPlan("d04_simhash_pairs").split("== Initial Plan ==")(0)
    assert(p.contains("collectcapped"), p)      // bounded-memory bucket lists
    assert(p.contains("simhash_lsh"), p)        // dropped_band_rows observation
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("u08 budget select: one per-stratum sort exchange does rank AND sum") {
    val p = finalPlan("u08_token_budget_select").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert("Window".r.findAllIn(p).length <= 2, p) // same window spec reused
    assert(!p.contains("Join"), p)
  }

  test("p01 composed corpus-prep: one keyed exchange per stage, no joins gone quadratic") {
    val p = finalPlan("p01_corpus_prep").split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // pinned stage boundaries (keys audited from the final plan): component
    // label (__node), cluster rep window + survivor join-back (cluster ×2),
    // span-removal gram/rebuild (doc_id ×3), budget window (source) —
    // every exchange is a stage interface, nothing redundant in between
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 7, p)
  }

  test("s06 kmeans assignment is zero-shuffle (pure centroid-literal expression)") {
    val p = finalPlan("s06_kmeans_assign").split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    // column pruning: label is never read for the assignment
    val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs.contains("label"), rs)
  }

  test("d19 semdedup-kmeans: cluster-keyed pair join, broadcast size gate, " +
      "no all-pairs") {
    val p = finalPlan("d19_semdedup_kmeans").split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // ok-cluster and size lookups broadcast (cluster count = centroid count)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("semdedup_kmeans"), p) // skipped_cluster_rows observation
  }

  test("t20 kmv sketch: partial-agg distinct + bounded-heap k-min, " +
      "no per-stratum full sort") {
    val p = finalPlan("t20_kmv_distinct").split("== Initial Plan ==")(0)
    // hash dedup aggregates map-side before its shuffle
    assert(p.contains("HashAggregate"), p)
    // the k-min runs through the custom bounded-heap operator, not a window
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
  }

  test("s07 pq: codes-only join side, broadcast query tables, codegen encode") {
    val p = finalPlan("s07_ann_pq").split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // tiny query side broadcast
    // the float vector never crosses the join: both checkpoint scans carry
    // codes/tables + norms only — no embedding column survives the cut
    assert(!p.contains("embedding") && !p.contains("__cv") &&
      !p.contains("__qv"), p)
    assert(p.contains("__k0") && p.contains("__t0"), p)
    // the encode itself (behind the cut) runs the codegen kernel: assert on
    // an uncut assignment plan
    val enc = graft.operators.Similarity.kmeansAssign(
        spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id", "embedding",
        Seq(Seq.fill(64)(0.0), Seq.fill(64)(1.0)))
      .queryExecution.executedPlan.toString
    assert(enc.contains("nearest_centroid"), enc)
    assert(!enc.contains("lambdafunction"), enc)
  }

  test("s08 ivf-pq: cell EQUI-join (never BNLJ), codes-only sides, " +
      "bounded-heap top-k") {
    val p = finalPlan("s08_ann_ivfpq").split("== Initial Plan ==")(0)
    // the billion-scale shape: per-query candidate work = its nProbe cells,
    // joined by cell id — a hash join, never a nested loop over the corpus
    assert(p.contains("BroadcastHashJoin") && p.contains("__cell"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    // no float vector crosses the join — both checkpoint scans carry
    // cell + codes + ADC tables + norms only
    assert(!p.contains("embedding") && !p.contains("__cv") &&
      !p.contains("__qv"), p)
    assert(p.contains("__k0") && p.contains("__t0"), p)
    // top-k via the bounded-heap operator, not a global sort
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("p02 embedding prep: dedup-then-index composes without quadratic joins") {
    val p = finalPlan("p02_embedding_prep").split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), p)
    // final stage = the s08 cell equi-join against broadcast query tables,
    // then the bounded-heap top-k; candidate work is cell-bounded
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TopKPerKey"), p)
  }

  test("p03 media prep: cluster-keyed pair join, fused budget windows, " +
      "no quadratic joins") {
    val p = finalPlan("p03_media_prep").split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // near-dup candidates come from the __cl equi-join, never all-pairs
    assert(p.contains("__cl"), p)
    // both budget windows (rank + running sum) share ONE per-kind sort
    // exchange — same spec, fused by Catalyst
    assert("Exchange hashpartitioning\\(kind".r.findAllIn(p).length == 1, p)
    // stage boundaries only: media_id join, victim anti-join, cluster
    // pair join sides, kind window — nothing redundant in between
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 6, p)
  }

  test("u09 domain mix: one per-stratum sort exchange, quota is a literal CASE") {
    val p = finalPlan("u09_domain_mix").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q72 unpivot stays a generator over aggregated rows (one shuffle)") {
    // AQE toString appends the pre-adaptive plan — count the final section only
    val p = finalPlan("q72_unpivot").split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(p).length <= 1, p)
    assert(p.contains("Expand"), p) // unpivot = generator, not a join/union
  }
}
