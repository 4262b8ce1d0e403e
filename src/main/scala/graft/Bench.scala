package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: headline queries over SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout (driver contract). Each query is forced end-to-end with a
  * noop datasource write (full plan execution, no driver collect, no disk
  * write skew).
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
  */
object Bench {

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
    "m07_image_phash")           // media: perceptual aHash over real decodes

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
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"calibration":$calibration,"sf":"$sfDir"}""")
    spark.stop()
  }
}
