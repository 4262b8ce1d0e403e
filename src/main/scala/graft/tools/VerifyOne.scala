package graft.tools

import org.apache.spark.sql.SparkSession

/** Verify a SUBSET of SparkEntry queries against their oracles — same dump
  * shape as graft.Verify (per-query parquet + oracle_sql.json restricted to
  * the requested names) so scripts/check_oracle.py works on the output
  * directory unchanged. Dev tool for per-operator iteration; the driver
  * contract stays graft.Verify.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <query...> */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      System.err.println(
        f"[verify-ok] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val oracle = graft.SparkEntry.oracleSqlFor(spark, sfDir)
      .filter { case (k, _) => names.contains(k) }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""
    val json = oracle.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
