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

  /** GROUP_CONCAT(v ORDER BY k SEPARATOR sep): input = (sort key, value).
    *
    * Buffer = (used slots, flat interleaved [k0, v0, k1, v1, …]) with
    * doubling growth — the same flat-buffer discipline as [[CollectCapped]]
    * / [[KmvSketch]]: a product-encoded native string array instead of a
    * kryo'd ArrayBuffer, so partial-merge hops serialize as unsafe array
    * data (the measured dominant cost of object-buffer aggregation on the
    * dedup hot paths; latent here because GROUP_CONCAT groups are usually
    * small, but the shape is now uniformly bounded-cost). */
  class GroupConcat(sep: String, desc: Boolean = false)
      extends Aggregator[(String, String), (Int, Array[String]), String] {
    def zero: (Int, Array[String]) = (0, new Array[String](8))
    def reduce(b: (Int, Array[String]), a: (String, String)): (Int, Array[String]) = {
      if (a._2 == null) b
      else {
        val arr = if (b._2.length < b._1 + 2)
          java.util.Arrays.copyOf(b._2, math.max(b._1 + 2, b._2.length * 2))
        else b._2
        arr(b._1) = a._1
        arr(b._1 + 1) = a._2
        (b._1 + 2, arr)
      }
    }
    def merge(b1: (Int, Array[String]), b2: (Int, Array[String])): (Int, Array[String]) = {
      val need = b1._1 + b2._1
      val arr = if (b1._2.length < need)
        java.util.Arrays.copyOf(b1._2, math.max(need, b1._2.length * 2))
      else b1._2
      System.arraycopy(b2._2, 0, arr, b1._1, b2._1)
      (need, arr)
    }
    def finish(b: (Int, Array[String])): String = {
      val pairs = (0 until b._1 by 2).map(i => (b._2(i), b._2(i + 1)))
      val sorted = pairs.sortBy(_._1) // stable: equal keys keep arrival order
      (if (desc) sorted.reverse else sorted).map(_._2).mkString(sep)
    }
    def bufferEncoder: Encoder[(Int, Array[String])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Array[String])]()
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
    * exactly up to `maxTracked`; past saturation the estimate scales by the
    * rows seen while the tracker was live — est = size · total/tracked —
    * mirroring the reference's bounded-memory scaling
    * (AggregateDataSelectivity; round-1 advice: the unscaled version
    * under-estimated selectivity on high-cardinality inputs).
    *
    * Buffer = (tracked hashes, non-null rows total, rows seen while the
    * tracker was unsaturated). Merge scales the absorbed partial's tracking
    * window by the fraction of its set that fit. */
  class Selectivity(maxTracked: Int = 10000)
      extends Aggregator[java.lang.Long, (mutable.HashSet[Long], Long, Long), Int] {
    def zero: (mutable.HashSet[Long], Long, Long) = (mutable.HashSet.empty, 0L, 0L)
    def reduce(b: (mutable.HashSet[Long], Long, Long), a: java.lang.Long) = {
      if (a == null) b
      else {
        val tracking = b._1.size < maxTracked
        if (tracking) b._1 += a.longValue()
        (b._1, b._2 + 1L, b._3 + (if (tracking) 1L else 0L))
      }
    }
    def merge(b1: (mutable.HashSet[Long], Long, Long),
        b2: (mutable.HashSet[Long], Long, Long)) = {
      val total = b1._2 + b2._2
      var absorbed = 0L
      b2._1.foreach { h =>
        if (b1._1.size < maxTracked) { b1._1 += h; absorbed += 1L }
      }
      val trk2 = if (b2._1.isEmpty) b2._3 else b2._3 * absorbed / b2._1.size
      (b1._1, total, b1._3 + trk2)
    }
    def finish(b: (mutable.HashSet[Long], Long, Long)): Int = {
      if (b._2 == 0L) return 0
      // percent = est*100/total with est = size·total/tracked ⇒ size*100/tracked
      val tracked = math.max(1L, math.min(b._3, b._2))
      math.min(100, math.max(1, (b._1.size * 100 / tracked).toInt))
    }
    def bufferEncoder: Encoder[(mutable.HashSet[Long], Long, Long)] =
      Encoders.kryo[(mutable.HashSet[Long], Long, Long)]
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** Output of [[CollectCapped]]: true element count + at most `cap` ids. */
  final case class CappedIds(n: Long, ids: Seq[Long])

  /** Size-capped id collector for LSH bucket aggregation: counts every
    * element but stores at most `cap` — buffer memory is bounded BY
    * CONSTRUCTION, so a degenerate bucket (boilerplate/empty-text floods,
    * the exact case the cap guards) can never OOM the reducer the way an
    * uncapped collect_list can. Buckets with n ≤ cap are never truncated
    * (partial merges sum to n ≤ cap); over-cap buckets keep their true n
    * for the caller's observable-drop metric and are dropped anyway. */
  class CollectCapped(cap: Int)
      extends Aggregator[java.lang.Long, Array[Long], CappedIds] {
    // buffer layout: [n, used, id0, id1, …] — a flat long array (doubling
    // growth) instead of a kryo'd ArrayBuffer: the buffer serializes as a
    // native unsafe long array on every partial-merge hop, which is the
    // dominant cost of the bucket aggregation on the dedup hot paths
    def zero: Array[Long] = Array(0L, 0L)
    private def append(b: Array[Long], a: Long): Array[Long] = {
      val used = b(1).toInt
      val out = if (b.length < used + 3)
        java.util.Arrays.copyOf(b, math.max(used + 3, b.length * 2))
      else b
      out(2 + used) = a
      out(1) = used + 1
      out
    }
    def reduce(b: Array[Long], a: java.lang.Long): Array[Long] = {
      // null-safe skip (uncounted): lets a tagged union feed two capped
      // collectors through when(side, id) columns in ONE aggregation —
      // the fused cross-dedup bucket agg — without a side's nulls
      // inflating the other side's true count
      if (a == null) return b
      val out = if (b(1) < cap) append(b, a.longValue) else b
      out(0) += 1
      out
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      val total = b1(0) + b2(0)
      var out = b1
      var i = 0
      while (i < b2(1).toInt && out(1) < cap) {
        out = append(out, b2(2 + i)); i += 1
      }
      out(0) = total
      out
    }
    def finish(b: Array[Long]): CappedIds =
      CappedIds(b(0), b.slice(2, 2 + b(1).toInt).toSeq)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[CappedIds] = Encoders.product[CappedIds]
  }

  /** Output of [[CollectCappedPairs]]: true pair count + at most `cap`
    * (a, b) pairs as parallel arrays. */
  final case class CappedPairs(n: Long, as: Seq[Long], bs: Seq[Long])

  /** [[CollectCapped]] for (id, payload) PAIRS — lets an LSH bucket carry
    * each member's hash/signature alongside its id, so the pair-verify
    * stage (e.g. simhash hamming) runs list-locally on the bucket row
    * instead of joining ids back to the corpus for their hashes: at scale
    * that retires two corpus-size shuffle joins. Same capped-flat-buffer
    * discipline; the cap counts pairs, the buffer is bounded at 2·cap+2
    * longs by construction. */
  class CollectCappedPairs(cap: Int)
      extends Aggregator[(Long, Long), Array[Long], CappedPairs] {
    // buffer layout: [n, used, a0, b0, a1, b1, …] — `used` counts PAIRS
    def zero: Array[Long] = Array(0L, 0L)
    private def append(b: Array[Long], x: Long, y: Long): Array[Long] = {
      val used = b(1).toInt
      val out = if (b.length < 2 * used + 4)
        java.util.Arrays.copyOf(b, math.max(2 * used + 4, b.length * 2))
      else b
      out(2 + 2 * used) = x
      out(3 + 2 * used) = y
      out(1) = used + 1
      out
    }
    def reduce(b: Array[Long], a: (Long, Long)): Array[Long] = {
      val out = if (b(1) < cap) append(b, a._1, a._2) else b
      out(0) += 1
      out
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      val total = b1(0) + b2(0)
      var out = b1
      var i = 0
      while (i < b2(1).toInt && out(1) < cap) {
        out = append(out, b2(2 + 2 * i), b2(3 + 2 * i)); i += 1
      }
      out(0) = total
      out
    }
    def finish(b: Array[Long]): CappedPairs = {
      val u = b(1).toInt
      val as = new Array[Long](u); val bs = new Array[Long](u)
      var i = 0
      while (i < u) { as(i) = b(2 + 2 * i); bs(i) = b(3 + 2 * i); i += 1 }
      CappedPairs(b(0), scala.collection.immutable.ArraySeq.unsafeWrapArray(as),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bs))
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[CappedPairs] = Encoders.product[CappedPairs]
  }

  /** Output of [[KmvSketch]]: kept distinct-hash count + the kth smallest
    * (unsigned order) hash, signed. kth is only meaningful at n == k. */
  final case class KmvState(n_sketch: Long, kth_hash: Long)

  /** Mergeable KMV (k-minimum-values) distinct-count sketch over xxhash64
    * values: the buffer is the ≤ k smallest DISTINCT hashes in unsigned
    * order — bounded by construction (k longs), associative and
    * commutative, so it runs as a batch groupBy aggregate AND as a
    * streaming stateful aggregate with identical results
    * (StreamingSpec parity). The buffer stores sign-FLIPPED values
    * (h ^ Long.MinValue), kept sorted ascending = unsigned ascending;
    * insert/merge dedup via binary search. */
  class KmvSketch(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], KmvState] {
    require(k >= 2, "k must be >= 2")
    // buffer layout: [used, v1 ≤ v2 ≤ … ≤ v_used] — sign-flipped hashes,
    // sorted ascending (= unsigned ascending), flat long array for native
    // unsafe-array encoding on partial-merge hops (like [[CollectCapped]])
    def zero: Array[Long] = Array(0L)
    private def insert(b0: Array[Long], v: Long): Array[Long] = {
      val used = b0(0).toInt
      if (used >= k && v >= b0(used)) return b0
      // first index in [1, used] holding a value >= v
      var lo = 1
      var hi = used + 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b0(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo <= used && b0(lo) == v) return b0 // distinct only
      val b = if (b0.length < used + 2)
        java.util.Arrays.copyOf(b0, math.max(used + 2, b0.length * 2))
      else b0
      System.arraycopy(b, lo, b, lo + 1, used - lo + 1)
      b(lo) = v
      b(0) = math.min(used + 1, k) // a shifted-out (k+1)-th value is ignored
      b
    }
    def reduce(b: Array[Long], a: java.lang.Long): Array[Long] =
      insert(b, a.longValue ^ Long.MinValue)
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var out = b1
      var i = 1
      while (i <= b2(0).toInt) { out = insert(out, b2(i)); i += 1 }
      out
    }
    def finish(b: Array[Long]): KmvState = {
      val used = b(0).toInt
      KmvState(used.toLong, if (used == 0) 0L else b(used) ^ Long.MinValue)
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  }

  /** Mergeable Bloom bitset over precomputed BIT POSITIONS (longs in
    * [0, mBits)): the buffer is the fixed mBits/64-word bitset itself —
    * bounded by construction, associative/commutative (bitwise OR), flat
    * long array for native unsafe-array encoding on partial-merge hops.
    *
    * The input is positions, not element hashes, so the SAME Column
    * expression ([[graft.operators.Dedup.bloomPositions]]) feeds both the
    * build side (exploded here) and the membership test
    * ([[graft.operators.Dedup.bloomMightContain]]) — no-false-negatives
    * holds by construction rather than by two hand-kept hash replicas.
    * At 10 bits/element the false-positive rate with k=6 probes is ~0.8%;
    * every consumer must exact-confirm hits (the bloom is a prefilter,
    * never the answer). */
  class BloomBits(mBits: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "mBits must be a power of two >= 64")
    private val words = mBits >>> 6
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], a: java.lang.Long): Array[Long] = {
      if (a != null) {
        val pos = a.longValue()
        require(pos >= 0 && pos < mBits, s"bloom position $pos out of [0,$mBits)")
        b((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { b1(i) |= b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
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
