package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for operator stages (not part of the driver contract). */
object Profile {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    println("[profile] docs=" + docs.count())
    val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35)
    val base = time("sig+bands") {
      docs.select(col("doc_id").as("__id"),
          Dedup.shingleHashSet(col("text"), cfg.shingleSize).as("__sh"))
        .withColumn("__sig", Dedup.minhashSignature(col("__sh"), cfg.numHashes, cfg.seed))
        .withColumn("__bands", Dedup.bandHashes(col("__sig"), cfg.bands, cfg.rowsPerBand))
        .drop("__sig").localCheckpoint(true)
    }
    val banded = base.select(col("__id"), posexplode(col("__bands")).as(Seq("__b","__bh")))
    val l = banded.select(col("__b"),col("__bh"),col("__id").as("id_a"))
    val r = banded.select(col("__b").as("b2"),col("__bh").as("h2"),col("__id").as("id_b"))
    val pairs = time("pair-join") {
      l.join(r, col("__b")===col("b2") && col("__bh")===col("h2") && col("id_a")<col("id_b"))
        .select("id_a","id_b").distinct().localCheckpoint(true)
    }
    println("[profile] candidate pairs=" + pairs.count())
    val sets = base.select(col("__id"), col("__sh"))
    time("jaccard-verify") {
      val j = pairs
        .join(sets.select(col("__id").as("id_a"), col("__sh").as("sa")), Seq("id_a"))
        .join(sets.select(col("__id").as("id_b"), col("__sh").as("sb")), Seq("id_b"))
        .withColumn("j", size(array_intersect(col("sa"),col("sb"))).cast("double")/
          size(array_union(col("sa"),col("sb"))).cast("double"))
        .filter(col("j") >= 0.35).select("id_a","id_b","j")
      j.write.format("noop").mode("overwrite").save(); j
    }
    time("full-run-2nd") {
      Dedup.minhashDedup(docs, "doc_id", "text", cfg).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
