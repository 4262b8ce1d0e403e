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
}
