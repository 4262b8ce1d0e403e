package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine query + its DuckDB oracle (SURVEY §5: golden-result hash
  * comparison replaces the reference's per-assertion JUnit style).
  *
  * `oracle == None` → driver records a weaker rows-only check (used for ops
  * not expressible in ANSI SQL, e.g. MinHash dedup).
  *
  * `oracleGen` generates the oracle SQL at verify time with access to the
  * session + SF dir — for oracles that inline DATA-DEPENDENT deterministic
  * state as literals (e.g. trained IVF centroids, the same way seeded
  * hyperplanes are already inlined as constants). Takes precedence over
  * `oracle` when both are set.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleGen: Option[(SparkSession, String) => String] = None)

object Q {

  /** Cast a money-like double column (exact to 2 decimals in the corpus) to
    * DECIMAL(18,2) *before* any arithmetic. Casting raw 2-decimal values is
    * bit-identical across engines (the double IS the nearest double to the
    * 2-decimal literal, and both engines recover it), whereas casting
    * *derived* doubles is not: Spark routes double→decimal through the
    * shortest string repr (BigDecimal.valueOf) — double rounding — while
    * DuckDB rounds the exact binary expansion. All downstream decimal
    * arithmetic is then exact, making aggregation order irrelevant — the
    * same decomposition discipline the reference uses for distributed
    * aggregate merging (Select.queryGroupMerge, Select.java:1069-1134).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact deterministic sum of a decimal expression, surfaced as DOUBLE. */
  def dsum(c: Column): Column = sum(c).cast("double")

  /** SQL twin of [[dsum]] ∘ [[dec2]] for the DuckDB oracle. */
  def dsumSql(e: String): String = s"CAST(SUM($e) AS DOUBLE)"

  def dec2Sql(e: String): String = s"CAST(($e) AS DECIMAL(18,2))"

  /** Exact mean: exact decimal sum divided by count in double (identical IEEE
    * division on identical inputs in both engines). */
  def davg(c: Column): Column = sum(c).cast("double") / count(lit(1))

  def davgSql(e: String): String = s"CAST(SUM($e) AS DOUBLE) / COUNT(*)"
}
