package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for the longest-repeat dense worst case —
  * not part of the driver contract. Replicates Dedup.longestRepeat's
  * phases with timers to localize the 10x-clone stress cost. */
object D17Probe {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val amp = a.lift(1).map(_.toInt).getOrElse(10)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d17] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs0 = graft.core.Tables.load(spark, dir, "documents")
    val docs = (0 until amp).map(i =>
        docs0.select((col("doc_id") * amp + i).as("doc_id"), col("text")))
      .reduce(_ union _).localCheckpoint(true)
    println("[d17] docs=" + docs.count())

    val toks = filter(split(lower(regexp_replace(col("text"),
      "[ \\t\\n\\x0B\\f\\r]+", " ")), " "), t => length(t) > 0)
    val base0 = time("base0 cut") {
      graft.core.Checkpoint.cut(
        docs.select(col("doc_id").as("__id"), posexplode(toks).as(Seq("pos", "tok")))
          .select(col("__id"), col("pos"), xxhash64(col("tok")).as("h0")))
    }
    println("[d17] positions=" + base0.count())
    val wDoc = Window.partitionBy("__id").orderBy("pos")
    val maxLen = time("maxLen") {
      base0.groupBy(col("__id")).count().agg(max(col("count"))).head().getLong(0)
    }
    val levels = math.min(
      math.max(0, 63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxLen))),
      63)
    println(s"[d17] maxLen=$maxLen levels=$levels")
    var lad = base0
    time("ladder windows + cut") {
      var j = 0
      while (j < levels) {
        val nxt = lead(col(s"h$j"), 1 << j).over(wDoc)
        lad = lad.withColumn(s"h${j + 1}",
          when(nxt.isNotNull, xxhash64(col(s"h$j"), nxt)))
        j += 1
      }
      lad = graft.core.Checkpoint.cut(lad)
      lad.count()
    }
    val dupStarts = time("dupStarts x levels") {
      (0 to levels).map { jj =>
        val hs = lad.filter(col(s"h$jj").isNotNull)
          .select(col("__id"), col("pos"), col(s"h$jj").as("__h"))
        val dups = hs.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1).select(col("__h"))
        val d = graft.core.Checkpoint.cut(
          hs.join(dups, Seq("__h"), "left_semi")
            .select(col("__id"), col("pos"), col("__h")))
        println(s"[d17]   level $jj dupStarts=" + d.count())
        d
      }
    }
    val jmax = time("jmax union-distinct") {
      val j = dupStarts.zipWithIndex.map { case (d, jj) =>
          d.select(col("__id")).distinct().withColumn("__j", lit(jj)) }
        .reduce(_ union _)
        .groupBy(col("__id")).agg(max(col("__j")).as("__j"))
      val s0 = graft.core.Checkpoint.cut(
        j.selectExpr("__id", "__j",
          "CAST(shiftleft(1, __j) AS BIGINT) AS lo",
          "CAST(shiftleft(1, __j + 1) AS BIGINT) - 1 AS hi"))
      s0.count(); s0
    }
    var state = jmax
    val packed = time("packed arrays cut") {
      val d = graft.core.Checkpoint.cut(
        dupStarts.zipWithIndex.map { case (d0, jj) =>
            d0.withColumn("__j", lit(jj)) }.reduce(_ union _)
          .groupBy(col("__id"), col("__j"))
          .agg(sort_array(collect_list(struct(
            col("pos").cast("long").as("p"), col("__h").as("h")))).as("__ph"))
          .select(col("__id"), col("__j"),
            col("__ph.p").as("__poss"), col("__ph.h").as("__hs")))
      println("[d17]   rows=" + d.count()); d
    }
    var r = 0
    var done = false
    while (r < levels && !done) {
      time(s"refine round $r") {
        val withMid = state.withColumn("__mid", expr("(lo + hi + 1) div 2"))
        val lens = withMid.filter(col("lo") < col("hi"))
          .select(col("__j"), col("__mid").as("__L")).distinct()
        val lensByJ: Map[Int, Seq[Long]] = lens.collect()
          .map(row => (row.getInt(0), row.getLong(1)))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
        if (lensByJ.isEmpty) done = true
        else {
          val pairUdf = udf((j: Int, poss: Seq[Long], hs: Seq[Long]) => {
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            lensByJ.getOrElse(j, Nil).foreach { ll =>
              val d = ll - (1L << j)
              var a = 0
              var b = 0
              while (a < poss.length) {
                val target = poss(a) + d
                while (b < poss.length && poss(b) < target) b += 1
                if (b < poss.length && poss(b) == target)
                  out += ((ll, hs(a), hs(b)))
                a += 1
              }
            }
            out.toSeq
          })
          val probes = graft.core.Checkpoint.cut(
            packed
              .filter(col("__j").isin(lensByJ.keys.toSeq: _*))
              .select(col("__id"), col("__j"),
                explode(pairUdf(col("__j"), col("__poss"), col("__hs"))).as("__e"))
              .select(col("__id"), col("__j"), col("__e._1").as("__L"),
                col("__e._2").as("__h"), col("__e._3").as("__t")))
          val dupKeys = probes
            .groupBy(col("__j"), col("__L"), col("__h"), col("__t"))
            .agg(count(lit(1)).as("__n"))
            .filter(col("__n") > 1)
            .select(col("__j"), col("__L"), col("__h"), col("__t"))
          val hitDocs = probes
            .join(dupKeys, Seq("__j", "__L", "__h", "__t"), "left_semi")
            .select(col("__id"), col("__L")).distinct()
            .withColumn("__hit", lit(true))
          state = graft.core.Checkpoint.cut(
            withMid
              .join(hitDocs,
                withMid("__id") === hitDocs("__id") &&
                  withMid("__mid") === hitDocs("__L"), "left")
              .select(withMid("__id"), withMid("__j"),
                when(col("lo") < col("hi"),
                    when(col("__hit").isNotNull, col("__mid")).otherwise(col("lo")))
                  .otherwise(col("lo")).as("lo"),
                when(col("lo") < col("hi"),
                    when(col("__hit").isNotNull, col("hi"))
                      .otherwise(col("__mid") - 1))
                  .otherwise(col("hi")).as("hi")))
          state.count()
        }
      }
      r += 1
    }
    spark.stop()
  }
}
