package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with thresholds lowered to toy scale, a
  * power-law key distribution makes AQE split the skewed partition —
  * the runtime behavior that keeps hot keys from stalling a 1000-executor
  * join. Complemented by the deliberate `Skew.saltedJoin` (SimilaritySpec)
  * for cases AQE can't fix.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      // downstream agg re-shuffles anyway; let AQE split even so
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(Option(spark.conf.get(k))).toOption.flatten).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows of key 0 (hot) + uniform tail; dim side 100 keys.
      // incompressible payload so shuffle bytes reflect the skew
      val big = spark.range(0, 60000).toDF("i")
        .select(when($"i" < 50000, 0L).otherwise($"i" % 100).as("k"),
          md5(concat(lit("payload"), $"i")).as("v"))
      val dim = spark.range(0, 100).toDF("k").withColumn("name", concat(lit("n"), $"k"))
      val joined = big.join(dim, Seq("k"))
      assert(joined.collect().length == 60000) // executes THIS plan to final
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isSkew=true") || p.contains("skewed"), p.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
