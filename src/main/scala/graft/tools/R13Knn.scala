package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** r13 scratch probe: LSH bucket occupancy for s05's knnGraph params at a
  * given scale dir (cap sizing evidence). Not part of the driver contract.
  * Usage: runMain graft.tools.R13Knn <sfDir> [amplify]
  */
object R13Knn {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a(0)
    val amplify = if (a.length > 1) a(1).toInt else 1
    val emb0 = graft.core.Tables.load(spark, dir, "embeddings")
    val emb = if (amplify == 1) emb0 else
      (0 until amplify).map(i => emb0.select(
        (col("vec_id") * amplify + i).as("vec_id"), col("embedding")))
        .reduce(_ union _)
    println("[r13knn] n_vec=" + emb.count() + " amplify=" + amplify)
    val planes = (0 until 4).map(t =>
      Similarity.hyperplanes(64, 6, 42L + 200 + t))
    val b = emb.select(col("vec_id"),
      posexplode(array(planes.map(p =>
        Similarity.lshBucket(col("embedding"), p)): _*))
        .as(Seq("__tbl", "__bkt")))
    val occ = b.groupBy("__tbl", "__bkt").count()
    occ.agg(max("count").as("max_bucket"),
      expr("percentile(count, 0.99)").as("p99"),
      avg("count").as("mean"), count(lit(1)).as("n_buckets")).show()
    spark.stop()
  }
}
