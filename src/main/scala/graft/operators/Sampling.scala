package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/splitting — beyond-reference surface for
  * the training-data pipeline: split assignment must be a PURE FUNCTION of
  * the record id (stable across runs, partitions, cluster sizes, and
  * re-ingests), never `rand()` or a sampling job. Hash-mod assignment is
  * the standard shape: zero state, zero shuffle, trivially auditable, and
  * the exact same rows land in the same split on 500 rows or 100 TB.
  */
object Sampling {

  /** Knuth multiplicative-hash bucket in [0, 1000). The id is first reduced
    * mod 10^6 so the multiply NEVER overflows a long (999999 × 2654435761 <
    * 2^63) — overflow wraparound would be engine-specific and unverifiable
    * (DuckDB raises where Java wraps); the bucket is therefore a pure,
    * portable function of `id mod 10^6`, fine for split assignment.
    * Negative ids land in [0, 10^6) via pmod. */
  private def permilleBucket(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(1000000L)) * lit(2654435761L), lit(1000L))

  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"Sampling id column $idCol must be integral (got $dt): a silent " +
        "cast-to-NULL would route every row to one split. Hash string ids " +
        "to a long first (e.g. xxhash64).")
  }

  /** Train/val/test split column: bucket < train → "train",
    * < train+val → "val", else "test". */
  def hashSplit(df: DataFrame, idCol: String,
      trainPermille: Int = 900, valPermille: Int = 50): DataFrame = {
    require(trainPermille + valPermille <= 1000,
      "train + val permille must be <= 1000")
    requireIntegralId(df, idCol)
    val b = permilleBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPermille, lit("train"))
        .when(b < trainPermille + valPermille, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic keep-fraction sample: rows whose bucket falls below
    * `keepPermille`. Repeated runs (and supersets of the data) always
    * agree on kept rows — the property rand()-sampling lacks. */
  def deterministicSample(df: DataFrame, idCol: String,
      keepPermille: Int): DataFrame = {
    requireIntegralId(df, idCol)
    df.filter(permilleBucket(col(idCol)) < keepPermille)
  }

  /** Stratified deterministic sample: a per-stratum keep rate (permille),
    * still a pure function of the id — the standard corpus-mixing shape
    * (downsample over-represented languages/sources, keep the long tail
    * whole). The rate lookup is a literal CASE chain (broadcast-free,
    * codegen'd); strata absent from the map fall back to
    * `defaultPermille`. A NULL stratum uses the default too. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      permilleByStratum: Map[String, Int],
      defaultPermille: Int = 1000): DataFrame = {
    require((defaultPermille +: permilleByStratum.values.toSeq)
      .forall(p => p >= 0 && p <= 1000), "permille rates must be in [0,1000]")
    requireIntegralId(df, idCol)
    val rate = permilleByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (k, p)) =>
        when(col(strataCol) === k, lit(p)).otherwise(acc)
      }
    df.filter(permilleBucket(col(idCol)) < rate)
  }

  /** Knuth multiplicative bucket in [0, 10^6) — same overflow-safe shape
    * as [[permilleBucket]], finer range (shuffle keys, uniforms). */
  private def bucket1M(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(1000000L)) * lit(2654435761L),
      lit(1000000L))

  /** Deterministic uniform in (0, 1]: Knuth bucket over [0, 10^6) shifted
    * to [1, 10^6], divided in double. Every step (long→double, /10^6) is a
    * single correctly-rounded IEEE op, so the value is bit-identical in any
    * engine — the property that lets a weighted sample be hash-verified. */
  private def hashUniform(id: Column): Column =
    (bucket1M(id) + 1).cast("double") / lit(1000000.0)

  /** Priority sampling (Duffield, Lund & Thorup, JACM'07): a deterministic
    * weight-sensitive sample of k rows. Each row gets priority = weight/u
    * with u a pure hash-uniform of the id; the k largest priorities win
    * (ties → smaller id). Heavier rows are proportionally likelier to make
    * the cut, re-runs and re-ingests agree exactly, and the plan is one
    * scan + TakeOrderedAndProject (per-partition heaps, no global sort). */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("priority"),
      "input already has a 'priority' column (the operator's output column) " +
        "— rename it first, or it would be silently overwritten")
    requireIntegralId(df, idCol)
    df.withColumn("priority",
        col(weightCol).cast("double") / hashUniform(col(idCol)))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Per-stratum priority sample: the k weighted winners of EACH stratum
    * (balanced per-language/source samples — the corpus-audit shape),
    * same deterministic priority = weight / hash-uniform(id) as
    * [[prioritySample]]. Runs through the custom bounded-heap
    * [[graft.plans.TopKPerKey]] operator (strata are bounded-cardinality
    * keys — its contract), so no per-stratum full sort materializes. */
  def stratifiedPrioritySample(df: DataFrame, idCol: String,
      weightCol: String, strataCol: String, kPerStratum: Int): DataFrame = {
    require(kPerStratum > 0, "kPerStratum must be positive")
    requireIntegralId(df, idCol)
    val taken = df.columns.filter(Set("priority", "rank")).distinct
    require(taken.isEmpty,
      s"input columns ${taken.mkString(", ")} collide with the operator's " +
        "output names — rename them first")
    val scored = df.withColumn("priority",
      col(weightCol).cast("double") / hashUniform(col(idCol)))
    graft.plans.TopKPerKey(scored, Seq(strataCol),
      Seq(("priority", true), (idCol, false)), kPerStratum)
  }

  /** Temperature-based domain rebalancing (the multilingual-mixture shape:
    * per-domain quota ∝ count^(1/T) with T=2, i.e. √count — flattens the
    * head, keeps the tail; √ because `sqrt` is a correctly-rounded IEEE op
    * everywhere, unlike `pow`). Emits the `budget`-sized sample: each
    * stratum's `quota = floor(budget · √n_s / Σ√n)` deterministic winners
    * by hash-uniform priority (ties → smaller id).
    *
    * Determinism discipline: the only cross-stratum float reduction (Σ√n)
    * folds left-to-right over the SORTED weights (strata are
    * bounded-cardinality, so the collect_list is a few doubles) — an
    * unordered SUM() could differ in the last bit between engines. The
    * per-stratum top-quota runs through the bounded-heap
    * [[graft.plans.TopKPerKey]] at k = budget (quota ≤ budget always),
    * then filters rank ≤ quota — no per-stratum full sort.
    *
    * Rows with a NULL stratum are excluded (the plan join is null-rejecting,
    * as in SQL GROUP BY + JOIN USING); a stratum too small for one slot
    * (floor → quota 0) contributes no rows. */
  def temperatureRebalance(df: DataFrame, idCol: String, strataCol: String,
      budget: Long): DataFrame = {
    require(budget > 0 && budget <= Int.MaxValue,
      "budget must be in (0, Int.MaxValue] (it bounds the per-stratum heap)")
    requireIntegralId(df, idCol)
    val taken = df.columns.filter(Set("rank", "quota", "n_docs", "__u"))
    require(taken.isEmpty,
      s"input columns ${taken.mkString(", ")} collide with the operator's " +
        "internal/output names — rename them first")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__w", sqrt(col("n_docs").cast("double")))
    val total = counts.agg(
      aggregate(array_sort(collect_list(col("__w"))), lit(0.0),
        (a, x) => a + x).as("__wtot"))
    val plan = counts.crossJoin(total)
      .select(col(strataCol), col("n_docs"),
        floor(lit(budget.toDouble) * col("__w") / col("__wtot"))
          .cast("long").as("quota"))
    val ranked = graft.plans.TopKPerKey(
      df.withColumn("__u", hashUniform(col(idCol))),
      Seq(strataCol), Seq(("__u", false), (idCol, false)), budget.toInt)
    ranked.join(broadcast(plan), Seq(strataCol))
      .filter(col("rank") <= col("quota"))
      .drop("__u")
  }

  /** Token-budget data selection (the "best docs until the budget runs
    * out" pass every pretraining mix does): per stratum, rank docs by
    * (quality DESC, id ASC) and keep the prefix whose CUMULATIVE token
    * count stays within `budgetTokens` — greedy, deterministic, exact
    * (token counts are integers; the quality key is whatever exact
    * column the caller provides). The crossing doc is excluded: kept
    * docs always fit the budget.
    *
    * Shape: one per-stratum window (rank + running sum in a single sort
    * exchange keyed by the stratum). A pathologically large stratum is
    * one sort partition — the classic skew caveat; salt the stratum or
    * pre-filter with [[temperatureRebalance]]-style quotas if profiling
    * an extreme mix says so. Returns the kept rows + (rank, cum_tokens).
    */
  def budgetSelect(df: DataFrame, idCol: String, strataCol: String,
      qualityCol: String, tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    requireIntegralId(df, idCol)
    val taken = df.columns.filter(Set("rank", "cum_tokens"))
    require(taken.isEmpty,
      s"input columns ${taken.mkString(", ")} collide with the operator's " +
        "internal/output names — rename them first")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum(col(tokensCol).cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budgetTokens)
  }

  /** Deterministic corpus shuffle (the pretraining epoch permutation):
    * every row gets a stable `shuffle_pos` = its rank under
    * (hash(id), id) order — re-runs, re-ingests, and different cluster
    * sizes all agree, unlike orderBy(rand()). The sort is a range
    * partition (scales like any distributed sort); the numbering is the
    * two-phase per-partition-offset fill — no single-partition window at
    * any corpus size. */
  def shuffleDeterministic(df: DataFrame, idCol: String): DataFrame = {
    requireIntegralId(df, idCol)
    val taken = df.columns.filter(Set("shuffle_pos", "__bk")).distinct
    require(taken.isEmpty,
      s"input columns ${taken.mkString(", ")} collide with the operator's " +
        "internal/output names — rename them first")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val sorted = df.withColumn("__bk", bucket1M(col(idCol)))
      .repartitionByRange(col("__bk"), col(idCol))
      .sortWithinPartitions(col("__bk"), col(idCol))
      .drop("__bk")
      .transform(graft.core.Checkpoint.cut)
    val schema = sorted.schema
    // zipWithIndex IS the two-phase count-then-offset fill (and counts in
    // Long, so >2^31-row partitions number correctly)
    val numbered = sorted.rdd.zipWithIndex().map { case (r, pos) =>
      Row.fromSeq(r.toSeq :+ pos)
    }
    df.sparkSession.createDataFrame(numbered,
      schema.add("shuffle_pos", LongType, nullable = false))
  }

  /** Domain-mixture selection: draw a corpus whose per-stratum (source/
    * language/domain) composition matches `targetShares`, deterministically.
    * Each stratum's quota = floor(budget × share); its winners are the
    * quota lowest (hash(id), id) rows — a stable pseudo-random draw, so
    * re-runs, re-ingests and supersets agree on every kept row (the same
    * pure-function-of-id discipline as [[hashSplit]]). Strata absent from
    * the map get quota 0; a stratum with fewer rows than its quota
    * contributes everything it has (the caller audits the realized mix via
    * the returned `mix_rank` ≤ quota rows).
    *
    * Shape: one per-stratum window (rank in a single sort exchange keyed by
    * the stratum) — the [[budgetSelect]] scale caveat applies: strata are
    * bounded-cardinality keys; a pathologically hot stratum is one sort
    * partition. Returns kept rows + `mix_rank` (1-based within stratum). */
  def domainMix(df: DataFrame, idCol: String, strataCol: String,
      targetShares: Map[String, Double], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(targetShares.values.forall(s => s >= 0.0 && s <= 1.0),
      "target shares must be in [0,1]")
    requireIntegralId(df, idCol)
    require(!df.columns.contains("mix_rank"),
      "input already has a 'mix_rank' column (the operator's output " +
        "column) — rename it first")
    // literal CASE chain (codegen'd, broadcast-free), like stratifiedSample
    val quota = targetShares.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (k, s)) =>
        when(col(strataCol) === k, lit((budget * s).toLong)).otherwise(acc)
      }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(bucket1M(col(idCol)).asc, col(idCol).asc)
    df.withColumn("mix_rank", row_number().over(w).cast("long"))
      .filter(col("mix_rank") <= quota)
  }

  /** Concat-then-chunk sequence packing (the standard pretraining batch
    * shape: concatenate all docs in id order, slice the stream into
    * `budgetTokens`-sized chunks; a doc's bin is where its first token
    * lands). Emits `tok_offset` (exclusive prefix sum of `tokensCol` in
    * `idCol` order) and `bin` = tok_offset / budget.
    *
    * Scale: NO single-partition global window — a range repartition on the
    * id gives a globally ordered partitioning, one lightweight job collects
    * per-partition token totals (a Long per partition, not data), then
    * every partition fills its offset range in parallel (the same
    * two-phase pattern as [[Dml.assignContiguous]]). The sorted input is
    * lineage-cut before the two jobs, so the shuffle+sort runs once and
    * both jobs read the SAME materialized rows — determinism holds even
    * over a nondeterministic source. NULL token counts pack as 0. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long): DataFrame =
    packSequences(df, idCol, tokensCol, budgetTokens, startOffset = 0L)

  /** [[packSequences]] continuing from a prior export's high-water mark:
    * `startOffset` seeds the global cumulative offset, so an APPENDED
    * batch packs exactly as if it had been part of the original run
    * (stable offsets/bins across incremental ingests — the p07 contract;
    * a partially-filled final bin keeps filling). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long, startOffset: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(startOffset >= 0L, "startOffset must be >= 0")
    val taken = df.columns.filter(Set("tok_offset", "bin")).distinct
    require(taken.isEmpty,
      s"input columns ${taken.mkString(", ")} collide with the operator's " +
        "output names — rename them first")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ordered = df.repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .transform(graft.core.Checkpoint.cut)
    val schema = ordered.schema
    val tokIdx = schema.fieldIndex(tokensCol)
    def tok(r: Row): Long =
      if (r.isNullAt(tokIdx)) 0L
      else r.get(tokIdx).asInstanceOf[Number].longValue
    val rdd = ordered.rdd
    val sums = rdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(0L)((a, r) => a + tok(r)))))
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(startOffset)(_ + _)
    val packed = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq ++ Seq(acc, acc / budgetTokens))
        acc += tok(r)
        row
      }
    }
    val outSchema = schema
      .add("tok_offset", LongType, nullable = false)
      .add("bin", LongType, nullable = false)
    df.sparkSession.createDataFrame(packed, outSchema)
  }
}
