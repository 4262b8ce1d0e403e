package graft.tools
import org.apache.spark.sql.functions._
object FrameStats {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val vids = graft.operators.Multimodal.syntheticMedia(docs)
      .filter(col("kind") === "video").select("media_id", "payload").collect()
    var total = 0L; var perVideoDistinct = 0L
    val global = scala.collection.mutable.HashSet.empty[java.nio.ByteBuffer]
    vids.foreach { r =>
      val fs = graft.operators.Multimodal
        .gvidFrames(r.getLong(0), r.getAs[Array[Byte]](1)).toSeq
      total += fs.size
      perVideoDistinct += fs.map(java.nio.ByteBuffer.wrap).toSet.size
      fs.foreach(f => global += java.nio.ByteBuffer.wrap(f))
    }
    println(s"[framestats] videos=${vids.length} totalFrames=$total " +
      s"perVideoDistinct=$perVideoDistinct globalDistinct=${global.size}")
    spark.stop()
  }
}
