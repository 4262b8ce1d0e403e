package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The three reference aggregates with no Spark twin (SURVEY §4.3):
  * GROUP_CONCAT with ORDER BY + SEPARATOR (Aggregate.java:219-229,
  * AggregateDataGroupConcat.java), HISTOGRAM (AggregateDataHistogram.java),
  * SELECTIVITY (AggregateDataSelectivity.java, feeding ANALYZE
  * ddl/Analyze.java:59-98).
  *
  * Implemented as typed `Aggregator`s (the Spark-native CREATE AGGREGATE:
  * the reference's reflection-driven init/add/getResult contract,
  * api/AggregateFunction.java:16-43, maps onto zero/reduce/merge/finish).
  * All three decompose into partial+final form automatically — Spark plans
  * ObjectHashAggregate with map-side partials, the distributed twin of
  * MergedResult re-aggregation (Select.queryGroupMerge).
  *
  * Note the composition-first alternative for GROUP_CONCAT
  * (collect_list+array_sort, Aggregates.groupConcat) stays the hot-path
  * choice; this class exists for full ORDER BY-by-arbitrary-key semantics.
  */
object Aggregators {

  /** GROUP_CONCAT(v ORDER BY k SEPARATOR sep): input = (sort key, value). */
  class GroupConcat(sep: String, desc: Boolean = false)
      extends Aggregator[(String, String), mutable.ArrayBuffer[(String, String)], String] {
    def zero: mutable.ArrayBuffer[(String, String)] = mutable.ArrayBuffer.empty
    def reduce(b: mutable.ArrayBuffer[(String, String)], a: (String, String)) = {
      if (a._2 != null) b += a; b
    }
    def merge(b1: mutable.ArrayBuffer[(String, String)],
        b2: mutable.ArrayBuffer[(String, String)]) = { b1 ++= b2; b1 }
    def finish(b: mutable.ArrayBuffer[(String, String)]): String = {
      val sorted = b.sortBy(_._1)
      (if (desc) sorted.reverse else sorted).map(_._2).mkString(sep)
    }
    def bufferEncoder: Encoder[mutable.ArrayBuffer[(String, String)]] =
      Encoders.kryo[mutable.ArrayBuffer[(String, String)]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** HISTOGRAM(x): sorted (value, count) pairs as array<struct>. */
  class Histogram
      extends Aggregator[java.lang.Long, mutable.HashMap[Long, Long], Seq[(Long, Long)]] {
    def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[Long, Long], a: java.lang.Long) = {
      if (a != null) b.update(a, b.getOrElse(a.longValue(), 0L) + 1L); b
    }
    def merge(b1: mutable.HashMap[Long, Long], b2: mutable.HashMap[Long, Long]) = {
      b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }; b1
    }
    def finish(b: mutable.HashMap[Long, Long]): Seq[(Long, Long)] =
      b.toSeq.sortBy(_._1)
    def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] =
      Encoders.kryo[mutable.HashMap[Long, Long]]
    def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** SELECTIVITY(x): estimated distinct percentage 0..100, as the
    * reference's ANALYZE uses for its cost model. Distinct hashes tracked
    * exactly up to `maxTracked`, then scaled linearly (same bounded-memory
    * discipline as AggregateDataSelectivity). */
  class Selectivity(maxTracked: Int = 10000)
      extends Aggregator[java.lang.Long, (mutable.HashSet[Long], Long), Int] {
    def zero: (mutable.HashSet[Long], Long) = (mutable.HashSet.empty, 0L)
    def reduce(b: (mutable.HashSet[Long], Long), a: java.lang.Long) = {
      if (a != null && b._1.size < maxTracked) b._1 += a.longValue()
      (b._1, b._2 + (if (a != null) 1L else 0L))
    }
    def merge(b1: (mutable.HashSet[Long], Long), b2: (mutable.HashSet[Long], Long)) = {
      b2._1.foreach { h => if (b1._1.size < maxTracked) b1._1 += h }
      (b1._1, b1._2 + b2._2)
    }
    def finish(b: (mutable.HashSet[Long], Long)): Int = {
      if (b._2 == 0L) return 0
      val est = if (b._1.size >= maxTracked) b._1.size.toLong.max(1L) else b._1.size.toLong
      math.min(100, math.max(1, (est * 100 / b._2).toInt))
    }
    def bufferEncoder: Encoder[(mutable.HashSet[Long], Long)] =
      Encoders.kryo[(mutable.HashSet[Long], Long)]
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** Register SQL-callable forms (CREATE AGGREGATE parity,
    * ddl/CreateAggregate.java). */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("group_concat_ord",
      org.apache.spark.sql.functions.udaf(new GroupConcat(",")))
    spark.udf.register("histogram_agg",
      org.apache.spark.sql.functions.udaf(new Histogram, Encoders.LONG))
    spark.udf.register("selectivity",
      org.apache.spark.sql.functions.udaf(new Selectivity(), Encoders.LONG))
  }
}
