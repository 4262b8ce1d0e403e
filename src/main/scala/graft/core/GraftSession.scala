package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical configuration.
  *
  * H2-compatibility choices (SURVEY §7 "hard parts"): ANSI mode OFF so
  * type coercions behave like H2/DuckDB rather than erroring; UTC session
  * timezone for oracle parity; shuffle partitions sized for the local[N]
  * harness, with AQE enabled so the same plans re-partition themselves on a
  * real cluster (runtime coalescing + skew-join splitting at 100 TB).
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // Older corpus generations carried TIMESTAMP(NANOS) — Spark has no nanos
    // type; read those as long and convert in Tables.load (micros truncation).
    // Harmless for micros-generated corpora, which arrive as TIMESTAMP_NTZ.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    // ANSI TIME (Spark 4.1 TimeType, flag-gated): the reference's TIME
    // column/literal/CURTIME surface (Value.java:93) maps to a real typed
    // column instead of the former HH:mm:ss string fallback.
    .config("spark.sql.timeType.enabled", "true")
    .config("spark.ui.enabled", "false")

  /** Local session for tests/CLI, with the H2 function/aggregate registry
    * installed (SURVEY §7 module `functions/`). */
  def local(threads: Int = 4): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$threads]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", threads.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.H2Functions.registerAll(s)
    graft.functions.Aggregators.registerAll(s)
    s
  }
}
