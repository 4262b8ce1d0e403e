package graft.tools

/** Wall-time probe for production-sized BPE vocab training: `numMerges`
  * merges at a given batch size over a documents table. The batched merge
  * rounds exist so a 30-50k-merge vocab doesn't mean 30-50k sequential
  * driver round-trips + lineage cuts; this measures the actual win.
  *
  * Usage: runMain graft.tools.BpeBench [sfDir] [numMerges] [batch]
  */
object BpeBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = a.lift(1).map(_.toInt).getOrElse(256)
    val batch = a.lift(2).map(_.toInt).getOrElse(16)
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val t0 = System.nanoTime()
    val n = graft.operators.TextAnalysis
      .bpeTrain(docs, "text", merges, batch).count()
    println(f"[bpe-bench] merges=$n batch=$batch " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs dir=$dir")
    spark.stop()
  }
}
