package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver benchmark: headline queries over SPARK_GRAFT_SF_DIR, one SHORT
  * JSON line on stdout (driver contract; <1 KB — the driver keeps only a
  * ~2 KB stdout tail, see [[renderLine]]) plus a full-detail sidecar
  * `bench_detail.json` (override: SPARK_GRAFT_BENCH_DETAIL) carrying the
  * per-query medians and outlier adjudication triples. Each query is
  * forced end-to-end with a noop datasource write (full plan execution,
  * no driver collect, no disk write skew).
  *
  * Timing is the per-query median across `runs` INTERLEAVED passes: the
  * whole suite runs N times and each query's median is taken across passes,
  * after one untimed warm-up pass (JIT + codegen cache + parquet footer
  * cache). Interleaving means a transiently contended minute degrades one
  * pass of every query — which the cross-pass median rejects — instead of
  * all consecutive runs of a single query, which a per-query median cannot
  * reject. Per-pass times go to stderr for auditability.
  *
  * The set covers BASELINE.md B1-B8 plus the beyond-reference pipeline
  * heads (dedup, simhash, ANN, text analysis).
  *
  * SELF-ADJUDICATION (VERDICT r8 directive 1): interleaved medians reject
  * a one-pass contention episode, but an episode spanning ALL passes of a
  * contiguous query stretch survives the median while the start-of-list
  * calibration anchors read healthy (the r8 q67/t09/s05 false alarm). So
  * after the timed passes, any query whose in-pass median exceeds
  * `outlierRatio` (default 1.5) × its committed BASELINE.md bar is re-run
  * ISOLATED — 5 back-to-back runs, median — and BOTH numbers are emitted
  * in the JSON as `"outliers": {name: {inpass, isolated, bar}}`. A
  * transient episode shows isolated ≤ bar (no regression, adjudicated in
  * the artifact itself); a real regression shows isolated ≈ inpass.
  * Ratios only bind at the bars' scale, so the check runs only on sf0.1;
  * `SPARK_GRAFT_BENCH_OUTLIER_RATIO` overrides the trigger (lowering it
  * exercises the mechanism on a healthy box — see NOTES).
  */
object Bench {

  /** Committed sf0.1 bars, one per headline query — MUST mirror the
    * BASELINE.md value column exactly (BenchBarsSpec parses BASELINE.md
    * and fails the build on any drift, so neither copy can go stale). */
  val bars: Map[String, Double] = Map(
    "q02_filter_project" -> 0.299,
    "q01_pricing_summary" -> 0.918,
    "q03_join_revenue_by_nation" -> 1.518,
    "q03_bucketed_revenue" -> 0.791,
    "q04_left_join" -> 0.376,
    "q18_topk" -> 0.154,
    "q14_except" -> 0.257,
    "q28_string_funcs" -> 0.148,
    "q21_minmax_countdistinct" -> 0.866,
    "q09_semi_join" -> 0.270,
    "q34_window_rank" -> 0.528,
    "q35_window_running_sum" -> 0.330,
    "d03_minhash_dedup" -> 1.668,
    "d04_simhash_pairs" -> 0.642,
    "s01_ann_bruteforce" -> 0.487,
    "t01_text_stats" -> 0.626,
    "d09_segment_dedup" -> 0.888,
    "s04_ann_quantized" -> 0.759,
    "t07_pii_redact" -> 0.707,
    "t08_vocab_topk" -> 0.570,
    "u04_pack_sequences" -> 0.844,
    "q65_asof_join" -> 0.656,
    "q66_range_join" -> 0.595,
    "q67_rolling_features" -> 0.471,
    "t09_blocklist_filter" -> 0.624,
    "s05_knn_graph" -> 0.95,
    "t10_trigram_quality" -> 1.15,
    "d13_duplicate_spans" -> 1.74,
    "s06_kmeans_assign" -> 0.118,
    "d19_semdedup_kmeans" -> 0.661,
    "u09_domain_mix" -> 0.170,
    "t19_freq_spectrum" -> 0.328,
    "t20_kmv_distinct" -> 0.669,
    "s07_ann_pq" -> 0.610,
    "s08_ann_ivfpq" -> 0.555,
    "t23_boolean_search" -> 0.395,
    "t24_bm25_topk" -> 1.151,
    "t25_phrase_search" -> 0.662,
    "t26_ngram_lm_counts" -> 0.637,
    "t29_gopher_filter" -> 0.776,
    "t28_lm_score" -> 1.478,
    "d20_url_dedup" -> 0.283,
    "m04_frame_dedup" -> 1.647,
    "t30_gopher_repetition" -> 0.543,
    "s09_ann_recall" -> 0.765,
    "t31_c4_filter" -> 0.648,
    "t32_ccnet_buckets" -> 1.447,
    "p04_quality_gate" -> 1.115,
    "u10_decontaminated_split" -> 0.676,
    "m05_image_resize" -> 1.099,
    "m06_audio_dedup" -> 0.571,
    "m07_image_phash" -> 1.063,
    "m08_caption_consistency" -> 1.201,
    "p10_multimodal_export" -> 1.239,
    "t33_quality_classifier" -> 0.259,
    "t34_dsir_select" -> 0.430,
    "t35_langid_learned" -> 0.452,
    "t36_decontaminate_spans" -> 0.758,
    "p06_pretrain_export" -> 2.405,
    "p01_corpus_prep" -> 5.086,
    "p02_embedding_prep" -> 0.881,
    "p03_media_prep" -> 2.460,
    "p05_quality_funnel" -> 1.013,
    "t37_model_eval" -> 1.599,
    "t38_unigram_train" -> 1.321,
    "t39_unigram_encode" -> 0.622,
    "t40_unigram_ppl" -> 1.441,
    "t41_calibration" -> 0.619,
    "p07_incremental_ingest" -> 1.593,
    "p08_perlang_funnel" -> 1.478,
    "p09_registry_apply" -> 1.834)

  val headline: Seq[String] = Seq(
    "q02_filter_project",        // B1 scan+filter+project
    "q01_pricing_summary",       // B2 hash agg + HAVING
    "q03_join_revenue_by_nation",// B3 multi-join + agg
    "q03_bucketed_revenue",      // B3c same join over the co-located layout
                                 //     (one-time bucketed write lands in the
                                 //     untimed warm-up pass — the README
                                 //     write-amortization contract)
    "q04_left_join",             // B3 outer
    "q18_topk",                  // B4 sort+limit
    "q14_except",                // B5 set ops
    "q28_string_funcs",          // B6 scalar-function pipeline
    "q21_minmax_countdistinct",  // B7 distinct + partial/final agg
    "q09_semi_join",             // B8 IN-subquery semi join
    "q34_window_rank",           // window functions
    "q35_window_running_sum",
    "d03_minhash_dedup",         // pipeline: LSH dedup
    "d04_simhash_pairs",         // pipeline: simhash candidates
    "s01_ann_bruteforce",        // pipeline: exact ANN baseline
    "t01_text_stats",            // pipeline: text analysis
    "d09_segment_dedup",         // pipeline: segment-level corpus dedup
    "s04_ann_quantized",         // pipeline: int8-quantized ANN
    "t07_pii_redact",            // pipeline: regex PII redaction
    "t08_vocab_topk",            // pipeline: corpus vocabulary top-k
    "u04_pack_sequences",        // pipeline: sequence packing
    "q65_asof_join",             // time-series: backward as-of join
    "q66_range_join",            // time-series: bucketed range join
    "q67_rolling_features",      // time-series: rolling window features
    "t09_blocklist_filter",      // pipeline: blocklist filter
    "s05_knn_graph",             // pipeline: corpus kNN graph (LSH self-join)
    "t10_trigram_quality",       // pipeline: trigram LM quality score
    "d13_duplicate_spans",       // pipeline: exact duplicate-span detection
    "s06_kmeans_assign",         // pipeline: k-means corpus clustering
    "d19_semdedup_kmeans",       // pipeline: SemDeDup (k-means-partitioned)
    "u09_domain_mix",            // pipeline: domain-mixture selection
    "t19_freq_spectrum",         // pipeline: Zipf frequency spectrum
    "t20_kmv_distinct",          // pipeline: KMV distinct-count sketch
    "s07_ann_pq",                // pipeline: PQ-ADC compressed-domain ANN
    "s08_ann_ivfpq",             // pipeline: IVF-PQ cell-pruned ANN
    "t23_boolean_search",        // retrieval: boolean AND over inverted terms
    "t24_bm25_topk",             // retrieval: BM25 bounded-heap top-k
    "t25_phrase_search",         // retrieval: positional phrase match
    "t26_ngram_lm_counts",       // LM training: KN n-gram count table
    "t29_gopher_filter",         // quality: Gopher rule gate (zero-exchange)
    "t28_lm_score",              // quality: corpus-trained bigram LM scoring
    "d20_url_dedup",             // dedup: canonical-key keep-best (struct MAX)
    "m04_frame_dedup",           // media: frame-level dedup over real decodes
    "t30_gopher_repetition",     // quality: repetition rules (one-pass kernel)
    "s09_ann_recall",            // eval: ANN recall@k vs brute ground truth
    "t31_c4_filter",            // quality: C4 line+page cleaning gate
    "t32_ccnet_buckets",         // quality: CCNet LM-score bucket split
    "p04_quality_gate",          // composed: all three paper gates, one scan
    "u10_decontaminated_split",  // composed: decontamination-aware split
    "m05_image_resize",          // media: real NN resample + re-encode
    "m06_audio_dedup",           // media: audio PCM-checksum dedup
    "m07_image_phash",           // media: perceptual aHash over real decodes
    "m08_caption_consistency",   // cross-modal: caption vs decoded brightness
    "t33_quality_classifier",    // quality: learned hashed-gram NB apply
    "t34_dsir_select",           // selection: DSIR Gumbel-top-k resampling
    "t35_langid_learned",        // quality: learned multiclass lang-id
    "t36_decontaminate_spans",   // decon: surgical span excision (kernel)
    "p01_corpus_prep",           // composed: end-to-end corpus prep
    "p02_embedding_prep",        // composed: embedding prep
    "p03_media_prep",            // composed: media prep (real codecs)
    "p05_quality_funnel",        // composed: rules + classifier, one scan
    "p06_pretrain_export",       // composed: funnel + span-clean + pack
    "t37_model_eval",            // eval: exact AUC/P/R rank-sum jobs
    "t38_unigram_train",         // tokenizer: unigram-LM seed/EM/prune
    "t39_unigram_encode",        // tokenizer: Viterbi dictionary encode
    "t40_unigram_ppl",           // quality: unigram-LM perplexity scoring
    "t41_calibration",           // eval: reliability table, one aggregate
    "p07_incremental_ingest",    // composed: delta vs persisted state
    "p08_perlang_funnel",        // composed: per-language routing funnel
    "p09_registry_apply",        // composed: apply from LOADED registry models
    "p10_multimodal_export")     // composed: text gates + cross-modal gate

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-up pass (not timed): session/codegen/readers.
    headline.foreach { n =>
      try exec(n)
      catch { case e: Throwable =>
        System.err.println(s"[bench-warmup] $n failed: ${e.getMessage}")
      }
    }

    // Interleaved timed passes: suite-order run x N, median across passes.
    val passTimes: Seq[Seq[(String, Double)]] = (1 to runs).map { pass =>
      headline.flatMap { n =>
        try {
          val t = exec(n)
          System.err.println(f"[bench-pass $pass] $n $t%.3f s")
          Some(n -> t)
        } catch { case e: Throwable =>
          System.err.println(s"[bench-pass $pass] $n failed: ${e.getMessage}")
          None
        }
      }
    }
    val byQuery = passTimes.flatten.groupBy(_._1)
    val results = headline.flatMap { n =>
      byQuery.get(n).map { ts =>
        val sorted = ts.map(_._2).sorted
        n -> sorted(sorted.length / 2)
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val atBars = sfDir.replaceAll("/+$", "").endsWith("sf0.1")

    // Outlier self-adjudication: re-run in-pass >ratio×bar queries
    // ISOLATED (5 back-to-back runs, median) so the artifact itself
    // distinguishes a mid-pass box episode from a real regression.
    val outlierRatio =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUTLIER_RATIO", "1.5").toDouble
    val outliers: Seq[(String, Double, Double, Double)] =
      if (!atBars) Seq.empty
      else results.flatMap { case (n, med) =>
        bars.get(n).filter(bar => med > bar * outlierRatio).map { bar =>
          val ts = (1 to 5).map { _ =>
            try exec(n)
            catch { case _: Throwable => Double.NaN }
          }.filterNot(_.isNaN).sorted
          val iso = if (ts.isEmpty) Double.NaN else ts(ts.length / 2)
          System.err.println(f"[bench-outlier] $n inpass=$med%.3f " +
            f"isolated=$iso%.3f bar=$bar%.3f")
          (n, med, iso, bar)
        }
      }
    val outliersJson =
      if (!atBars) "null"
      else outliers.map { case (n, inpass, iso, bar) =>
        "\"" + n + "\":{" + f""""inpass":$inpass%.3f,"isolated":$iso%.3f,"bar":$bar%.3f}"""
      }.mkString("{", ",", "}")
    val outlierCount = if (!atBars) -1 else outliers.size
    // Box-state self-adjudication (VERDICT r7 directive 3): the three
    // cheapest fixed-plan queries double as a machine calibration probe —
    // measured/bar ratios against their committed BASELINE.md sf0.1 bars
    // (B1/B2/B4). A pass where these bare, byte-identical plans run ≫1×
    // carries its own evidence that the BOX is slow, not the engine;
    // ratios only make sense at the bars' scale, so the field is null off
    // sf0.1.
    val calBars = Map(
      "q02_filter_project" -> 0.299, // B1
      "q01_pricing_summary" -> 0.918, // B2
      "q18_topk" -> 0.154) // B4
    val calibration =
      if (!sfDir.replaceAll("/+$", "").endsWith("sf0.1")) "null"
      else {
        val byName = results.toMap
        calBars.toSeq.sortBy(_._1).flatMap { case (q, bar) =>
          byName.get(q).map(v => "\"" + q + "\":" + f"${v / bar}%.2f")
        }.mkString("{", ",", "}")
      }
    // ARTIFACT CONTRACT (VERDICT r10 directive 1a): the driver captures
    // only a ~2 KB stdout tail, and the r10 line (68 queries + 28 outlier
    // adjudication triples) grew to 3.8 KB — the driver's json parse saw a
    // mid-line fragment and recorded `parsed: null`. The parsed stdout
    // line therefore stays SMALL and FIXED-SHAPE (<1 KB by BenchLineSpec):
    // headline total + calibration anchors + outlier COUNT + a pointer to
    // the sidecar. The full per-query map and the outlier triples move to
    // bench_detail.json (written before the line, so the pointer is never
    // dangling) and to stderr, which the driver streams unbounded.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "bench_detail.json")
    val detail =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":$qs,"calibration":$calibration,""" +
      s""""outliers":$outliersJson,"sf":"$sfDir"}"""
    // the stdout line is the round's ONE parsed signal — a failed sidecar
    // write (read-only cwd, bad env path) must never take it down; the
    // detail also always goes to stderr, which survives regardless
    try Files.writeString(Paths.get(detailPath), detail)
    catch { case e: Throwable =>
      System.err.println(s"[bench-detail-write-failed] $detailPath: " +
        e.getMessage)
    }
    System.err.println(s"[bench-detail] $detail")
    println(renderLine(total, results.size, calibration, outlierCount,
      detailPath, sfDir))
    spark.stop()
  }

  /** The ONE parsed stdout line — kept under 1 KB (BenchLineSpec) so the
    * driver's bounded stdout-tail capture always sees a complete JSON
    * object. `outlierCount` is -1 off sf0.1 (bars don't bind) and emits
    * as null; the per-query breakdown lives in `detail`. */
  def renderLine(total: Double, nQueries: Int, calibration: String,
      outlierCount: Int, detailPath: String, sfDir: String): String = {
    val oc = if (outlierCount < 0) "null" else outlierCount.toString
    // paths are env-controlled: escape them, or one quote/backslash in
    // SPARK_GRAFT_BENCH_DETAIL breaks the round's single parsed artifact
    def js(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":$nQueries,"calibration":$calibration,"outlier_count":$oc,"detail":"${js(detailPath)}","sf":"${js(sfDir)}"}"""
  }
}
