package graft.tools

/** Print the executed (AQE-final) plan of one or more SparkEntry queries —
  * scratch harness for plan audits, not part of the driver contract.
  * Usage: runMain graft.tools.PlanDump <sfDir> <query...> */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    a.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, a(0))
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
