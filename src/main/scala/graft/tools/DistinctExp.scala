package graft.tools
import org.apache.spark.sql.functions._
object DistinctExp {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
        .sorted.drop(1).headOption.foreach(m => println(f"[exp] $label $m%.2fs"))
    }
    // warm
    li.groupBy("l_linestatus").agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    time("expand-2-distincts") {
      li.groupBy(col("l_linestatus")).agg(
        min(col("l_quantity")), max(col("l_quantity")),
        countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
        count(col("l_quantity")))
        .write.format("noop").mode("overwrite").save()
    }
    time("split-join") {
      val base = li.groupBy(col("l_linestatus")).agg(
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"),
        count(col("l_quantity")).as("n"))
      val d1 = li.select("l_linestatus","l_orderkey").distinct()
        .groupBy("l_linestatus").agg(count(lit(1)).as("cd1"))
      val d2 = li.select("l_linestatus","l_partkey").distinct()
        .groupBy("l_linestatus").agg(count(lit(1)).as("cd2"))
      base.join(d1, "l_linestatus").join(d2, "l_linestatus")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
