package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Time the t33 classifier's one-time FIT (the single gram-level
  * aggregate) — scratch probe backing the BASELINE.md note that the
  * committed t33 bar is the steady-state APPLY with the fit memoized.
  * Usage: runMain graft.tools.ClfFitProbe [sfDir] [reps] */
object ClfFitProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val label = TextAnalysis.gopherSignals(col("text"), minStopHits = 1L).last
    (1 to a.lift(1).map(_.toInt).getOrElse(3)).foreach { i =>
      val t0 = System.nanoTime()
      val (w, b) = TextAnalysis.qualityClassifierFit(docs, "text", label,
        dim = 1024, maxN = 2)
      println(f"[clf-fit] run$i ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"bias=$b%.4f nonzero=${w.count(_ != 0.0)}")
    }
    spark.stop()
  }
}
