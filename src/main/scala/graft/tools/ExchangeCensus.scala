package graft.tools

/** Print the Exchange count of every SparkEntry query plan at sf0.001 —
  * generator for PlanLintSpec's exchange-budget map (scratch tool). */
object ExchangeCensus {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = a.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.allQ.sortBy(_.name).foreach { q =>
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      val n = "(?<!Broadcast)Exchange".r.findAllIn(p).length
      println(s"""    "${q.name}" -> $n,""")
    }
    spark.stop()
  }
}
