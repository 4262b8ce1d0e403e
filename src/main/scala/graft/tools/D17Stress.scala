package graft.tools

import org.apache.spark.sql.functions._

/** Focused dense-corpus stress for the longest-repeat operator: runs the
  * REAL operator end-to-end `reps` times on the 10x-clone corpus and
  * prints wall + the token-sum invariant (= corpus token count when every
  * doc is fully duplicated). Scratch tool for variance-aware timing. */
object D17Stress {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = a.lift(1).map(_.toInt).getOrElse(2)
    val docs0 = graft.core.Tables.load(spark, dir, "documents")
    val big = (0 until 10).map(i =>
        docs0.select((col("doc_id") * 10 + i).as("doc_id"), col("text")))
      .reduce(_ union _).localCheckpoint(true)
    println("[d17s] docs=" + big.count())
    (1 to reps).foreach { k =>
      val t0 = System.nanoTime()
      val s = graft.operators.Dedup.longestRepeat(big, "doc_id", "text")
        .agg(sum(col("longest_repeat"))).head().getLong(0)
      println(f"[d17s] run$k wall=${(System.nanoTime() - t0) / 1e9}%.1fs token-sum=$s")
    }
    spark.stop()
  }
}
