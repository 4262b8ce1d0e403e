package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * SELF-DIAGNOSIS (VERDICT r10 directive 1c): round 10's CORRECTNESS
  * artifact came back `{}` with no engine-side evidence of which stage
  * died. Verify now re-parses its OWN oracle_sql.json with a strict JSON
  * parser (Jackson — the same family as the driver's json.load) and
  * writes `verify_status.json` beside it: per-query ok/fail/seconds, the
  * oracle blob's parse status, and its total/largest sizes — so an empty
  * driver artifact is attributable from the repo side alone. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (unset in driver runs): comma-separated query
    // names to dump/compare; everything else is skipped
    // empty names are dropped BEFORE building the set: "" splits to
    // Array("") and a Set("") would silently filter out every query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val status = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify-ok] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
        true
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        false
      }
      (name, ok, (System.nanoTime() - t0) / 1e9)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracle = SparkEntry.oracleSqlFor(spark, sfDir, only)
    val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // --- self-diagnosis: strict re-parse + size accounting + status dump
    val parseStatus = try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json)
      if (node.size() == oracle.size) "ok"
      else s"parsed_but_lost_keys:${node.size()}/${oracle.size}"
    } catch { case e: Throwable =>
      s"PARSE_FAILED:${e.getMessage.take(120)}"
    }
    val sizes = oracle.map { case (k, v) => k -> v.getBytes("UTF-8").length }
    val (maxName, maxBytes) =
      if (sizes.isEmpty) ("", 0) else sizes.maxBy(_._2)
    val nOk = status.count(_._2)
    val rows = status.map { case (n, ok, sec) =>
      s"""${q(n)}:{"ok":$ok,"sec":${f"$sec%.2f"}}"""
    }.mkString("{", ",", "}")
    val statusJson =
      s"""{"n_queries":${status.size},"n_ok":$nOk,""" +
      s""""n_fail":${status.size - nOk},""" +
      s""""oracle_json_parse":${q(parseStatus)},""" +
      s""""oracle_total_bytes":${json.getBytes("UTF-8").length},""" +
      s""""oracle_max_query":${q(maxName)},""" +
      s""""oracle_max_bytes":$maxBytes,""" +
      s""""queries":$rows}"""
    // the status file is diagnosis, not the artifact — its write must
    // never fail a run whose oracle_sql.json already landed
    try Files.writeString(Paths.get(s"$outDir/verify_status.json"),
      statusJson)
    catch { case e: Throwable =>
      System.err.println(s"[verify-status-write-failed] ${e.getMessage}")
    }
    System.err.println(s"[verify-status] n_ok=$nOk/${status.size} " +
      s"oracle_parse=$parseStatus total=${json.length}B " +
      s"max=$maxName:${maxBytes}B")
    spark.stop()
  }
}
