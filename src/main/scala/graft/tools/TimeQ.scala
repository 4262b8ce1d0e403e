package graft.tools

/** Time one or more SparkEntry queries N times (median printed) — scratch
  * harness for perf work, not part of the driver contract.
  * Usage: runMain graft.tools.TimeQ <sfDir> <runs> <query...> */
object TimeQ {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val dir = a(0)
    val runs = a(1).toInt
    a.drop(2).foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = (1 to runs).map(_ => once()).sorted
      println(f"[timeq] $name median=${ts(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
