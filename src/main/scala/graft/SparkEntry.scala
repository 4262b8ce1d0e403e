package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from SURVEY §2;
  * `oracleSql` holds the DuckDB twin executed by the driver on the same
  * parquet tables (column names aligned on both sides — the compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** All query families (reference parity + beyond-reference pipeline ops). */
  def allQ: Seq[Q] =
    Relational.all ++ Aggregates.all ++ FunctionsQ.all ++ FunctionsQ2.all ++
      Advanced.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** Driver-contract accessor. NOTE: generated oracles inline DATA-DEPENDENT
    * trained state (s03's IVF centroids) that is memoized per JVM — extract
    * this map from the SAME process that ran `queries` (Verify does exactly
    * that, via [[oracleSqlFor]]); a separate JVM would retrain and could
    * produce different centroid literals than the queries used. */
  def oracleSql: Map[String, String] = {
    val spark = SparkSession.getActiveSession.getOrElse(
      graft.core.GraftSession.configure(
        SparkSession.builder().master("local[4]")).getOrCreate())
    oracleSqlFor(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01"))
  }

  /** Oracle map with generated (data-dependent) oracles evaluated against
    * `dir` — Verify passes its sfDir so generated literals (e.g. trained
    * IVF centroids) match the data the queries actually ran on. `names`
    * restricts WHICH generators run (None = all): the data-dependent ones
    * (IVF training, media-encode replay) are expensive, so a local
    * iteration filter must apply before generation, not after. */
  def oracleSqlFor(spark: SparkSession, dir: String,
      names: Option[Set[String]] = None): Map[String, String] =
    allQ.filter(q => names.forall(_.contains(q.name))).flatMap(q =>
      q.oracleGen.map(g => q.name -> g(spark, dir).trim)
        .orElse(q.oracle.map(sql => q.name -> sql.trim))).toMap
}
