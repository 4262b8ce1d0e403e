package graft.tools
object PlanDump {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    a.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
