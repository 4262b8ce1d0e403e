package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hot-path text hashing as custom Catalyst expressions (SURVEY §4.3 rule:
  * native Expression beats UDF beats interpreted lambda). Spark's
  * higher-order array functions evaluate their lambdas interpretively per
  * element; for shingle/minhash inner loops over hundreds of elements ×
  * dozens of lanes per row that dominates the dedup operators' runtime
  * (26s → ~1s on the sf0.1 bench after this change). Each expression here
  * is one JIT-friendly loop per row.
  *
  * All expressions implement `doGenCode` (round-2): the generated code
  * calls a static kernel in [[TextHashKernels]], so the expression stays
  * inside whole-stage codegen — no interpreted-eval boxing boundary, no
  * fallback row conversion — while the loop itself runs as ordinary
  * compiled bytecode. (Inlining the loop as generated Java would add
  * nothing: it is already a single virtual-call-free loop per row.)
  */

/** Static kernels shared by interpreted eval and generated code. A
  * top-level object compiles to static forwarders, so generated Java calls
  * `graft.functions.TextHashKernels.xxx(...)` directly. */
object TextHashKernels {

  /** Bloom membership probe over a long-word bitset: true iff every one
    * of the k bit positions pos_i = xxhash64(h, i) & (mBits-1) is set.
    * Matches [[graft.operators.Dedup.bloomPosition]] BIT-FOR-BIT — Spark's
    * XxHash64 folds left-to-right from seed 42, and the position literal i
    * is an INT lane (hashInt, verified against spark's own evaluation;
    * hashLong over i.toLong is a DIFFERENT family) — but the shared inner
    * hash of `h` is computed ONCE per probe and each pos_i once: the
    * Column-conjunct formulation evaluates every pos_i twice (word index +
    * bit offset), i.e. up to 4k hash calls per gram on the corpus hot path
    * vs. this kernel's k+1. */
  def bloomProbe(bits: Array[Long], h: Long, mBits: Int, k: Int): Boolean = {
    val base = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, 42L)
    var i = 0
    while (i < k) {
      val pos = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashInt(i, base) & (mBits - 1L)
      if (((bits((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  /** splitmix64 finalizer — well-mixed bits for band hashing. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val P = 1099511628211L // FNV prime as rolling multiplier

  /** Distinct rolling-hash values of all character k-shingles, sorted. */
  def shingleHashSet(input: UTF8String, k: Int): ArrayData = {
    val s = input.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array(mix(s.hashCode.toLong)))
    var pk = 1L // P^(k-1) for the rolling subtract
    var i = 0
    while (i < k - 1) { pk *= P; i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](math.min(n, 1024))
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.min(n, 1024))
    var h = 0L
    i = 0
    while (i < k) { h = h * P + s.charAt(i); i += 1 }
    var m = mix(h)
    if (seen.add(m)) out += m
    while (i < n) {
      h = (h - s.charAt(i - k) * pk) * P + s.charAt(i)
      m = mix(h)
      if (seen.add(m)) out += m
      i += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr) // sorted set → downstream merge-Jaccard is O(n)
    new GenericArrayData(arr)
  }

  /** Fixed-size word segments of normalized (single-spaced, trimmed) text:
    * one scan, segments as substrings between word boundaries; a trailing
    * partial segment is emitted (slice semantics). Empty text → empty. */
  def wordSegments(input: UTF8String, w: Int): ArrayData = {
    val s = input.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
    var segStart = 0
    var words = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        words += 1
        if (words == w || i == n) {
          out += UTF8String.fromString(s.substring(segStart, i))
          words = 0
          segStart = i + 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[AnyRef].asInstanceOf[Array[Any]])
  }

  /** How many elements of `arr` are present in the SORTED long array
    * `sorted` — binary search per element, zero allocation. The stateless
    * decontamination probe: the benchmark gram set rides as one sorted
    * reference array and each document answers its own shared-gram count
    * locally (no join, no state). */
  def countInSorted(arr: ArrayData, sorted: Array[Long]): Long = {
    var hits = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0)
        hits += 1
      i += 1
    }
    hits
  }

  /** SPAN-level decontamination in one pass: normalized (single-spaced,
    * trimmed) text with every token covered by a BENCHMARK n-gram
    * excised; survivors re-join single-spaced. Grams hash exactly as
    * [[wordNgramHashSet]] (XXH64 seed 42 over the \u0001-joined tokens)
    * and probe the SORTED benchmark array by binary search — the
    * stateless t27 shape, surgical instead of flag-and-drop. Fewer than
    * n words degenerates like [[wordNgramHashSet]]: the whole-text hash
    * probes the set, a hit excises the whole document (empty string).
    * One boolean[] of word width; no allocation per gram beyond the
    * shared builder. */
  def exciseContaminated(input: UTF8String, sorted: Array[Long],
      n: Int): UTF8String = {
    val s = input.toString
    if (s.isEmpty) return UTF8String.EMPTY_UTF8
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    starts += 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') starts += i + 1; i += 1 }
    val w = starts.length
    def xx(str: String): Long = {
      val u = UTF8String.fromString(str)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }
    if (w < n)
      return if (java.util.Arrays.binarySearch(sorted, xx(s)) >= 0)
        UTF8String.EMPTY_UTF8
      else input
    val covered = new Array[Boolean](w)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j + n <= w) {
      sb.setLength(0)
      var t = j
      while (t < j + n) {
        if (t > j) sb.append('\u0001')
        val end = if (t + 1 == w) s.length else starts(t + 1) - 1
        sb.append(s, starts(t), end)
        t += 1
      }
      if (java.util.Arrays.binarySearch(sorted, xx(sb.toString)) >= 0) {
        var c = j
        while (c < j + n) { covered(c) = true; c += 1 }
      }
      j += 1
    }
    val out = new java.lang.StringBuilder(s.length)
    var t2 = 0
    while (t2 < w) {
      if (!covered(t2)) {
        if (out.length > 0) out.append(' ')
        val end = if (t2 + 1 == w) s.length else starts(t2 + 1) - 1
        out.append(s, starts(t2), end)
      }
      t2 += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** All overlapping n-word grams of normalized (single-spaced, trimmed)
    * text, space-joined, in order — one scan over word boundaries, one
    * substring per gram. Fewer than n words → empty. The codegen
    * replacement for the interpreted transform(sequence, slice, concat_ws)
    * lambda chain (measured 4+ s of the t26 explode at sf0.1). */
  def wordNgrams(input: UTF8String, n: Int): ArrayData = {
    val s = input.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    starts += 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') starts += i + 1; i += 1 }
    val w = starts.length
    if (w < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](w - n + 1)
    var j = 0
    while (j + n <= w) {
      val end = if (j + n == w) s.length else starts(j + n) - 1
      out(j) = UTF8String.fromString(s.substring(starts(j), end))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct xxhash64 values of all overlapping n-word grams of
    * normalized (single-spaced, trimmed) text, SORTED — each gram hashed
    * as Spark's `xxhash64(concat_ws("\u0001", tokens))` would hash it
    * (XXH64 seed 42 over the UTF-8 bytes of the \u0001-joined
    * concatenation - the unambiguous token boundary);
    * fewer than n words → one hash of the whole normalized text (the
    * space-JOINED form — for a single-spaced input that IS the input).
    * Bit-for-bit the Column formula `sort_array(array_distinct(transform(
    * sequence…, i => xxhash64(concat_ws("\u0001", slice(toks, i, n))))))`,
    * which evaluates its lambda interpretively per gram and re-slices the
    * token array each time — measured 4.7 s of the t06 decontamination
    * family's 5k-doc scan vs this kernel's one pass (DedupSpec pins the
    * kernel ≡ Column-formula parity). */
  def wordNgramHashSet(input: UTF8String, n: Int): ArrayData = {
    val s = input.toString
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    if (s.nonEmpty) starts += 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') starts += i + 1; i += 1 }
    val w = if (s.isEmpty) 0 else starts.length
    def xx(str: String): Long = {
      val u = UTF8String.fromString(str)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }
    if (w < n) return new GenericArrayData(Array[Any](xx(s)))
    val seen = new java.util.HashSet[java.lang.Long](math.min(w, 1024))
    val out = new scala.collection.mutable.ArrayBuffer[Long](w - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j + n <= w) {
      sb.setLength(0)
      var t = j
      while (t < j + n) {
        if (t > j) sb.append('\u0001')
        val end = if (t + 1 == w) s.length else starts(t + 1) - 1
        sb.append(s, starts(t), end)
        t += 1
      }
      val h = xx(sb.toString)
      if (seen.add(h)) out += h
      j += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** Shared gram enumeration for the hashed-feature classifier kernels:
    * every OCCURRENCE (not distinct) of every word n-gram of orders
    * 1..maxN over normalized (single-spaced, trimmed) text, each hashed
    * exactly as [[wordNgramHashSet]] hashes a gram (XXH64 seed 42 over
    * the UTF-8 bytes of the \u0001-joined tokens; an order-1 gram is the
    * bare token). An order with fewer than n words contributes nothing
    * (no whole-text fallback here — the classifier's feature space is
    * grams, not documents); empty text contributes nothing. */
  private def eachGramHash(s: String, maxN: Int,
      f: java.util.function.LongConsumer): Unit = {
    if (s.isEmpty) return
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    starts += 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') starts += i + 1; i += 1 }
    val w = starts.length
    val sb = new java.lang.StringBuilder(64)
    var n = 1
    while (n <= maxN) {
      var j = 0
      while (j + n <= w) {
        sb.setLength(0)
        var t = j
        while (t < j + n) {
          if (t > j) sb.append('\u0001')
          val end = if (t + 1 == w) s.length else starts(t + 1) - 1
          sb.append(s, starts(t), end)
          t += 1
        }
        val u = UTF8String.fromString(sb.toString)
        f.accept(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
        j += 1
      }
      n += 1
    }
  }

  /** Hashed-feature bucket id of every gram occurrence (orders 1..maxN):
    * bucket = low log2(dim) bits of the gram's XXH64 (dim must be a power
    * of two, enforced at the Expression, so the masked bits equal
    * pmod(hash, dim) and the unsigned-mod SQL twin). The FIT side of the
    * hashed classifier: explode → one gram-level aggregate. */
  def hashedGramBuckets(input: UTF8String, dim: Int, maxN: Int): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](64)
    eachGramHash(input.toString, maxN, h => out += (h & (dim - 1L)).toInt)
    new GenericArrayData(out.toArray)
  }

  /** Linear score over the hashed gram features in ONE pass: per-bucket
    * occurrence counts accumulate locally, then the score folds
    * bucket-ASCENDING from the bias — s = bias; for b in 0..dim-1 with
    * cnt[b]>0: s += cnt[b]·w[b] — a deterministic double summation order
    * the SQL twin reproduces with a bucket-sorted list_reduce (the t28
    * sorted-fold discipline), so the DOUBLE scores hash-verify. Zero-count
    * buckets are skipped on BOTH sides (adding literal 0.0 terms could
    * flip a -0.0 accumulator to +0.0). The APPLY side of the hashed
    * classifier: zero exchanges, one codegen call per row. */
  def hashedGramScore(input: UTF8String, weights: Array[Double],
      bias: Double, maxN: Int): Double = {
    val dim = weights.length
    val cnt = new Array[Int](dim)
    eachGramHash(input.toString, maxN, h => cnt((h & (dim - 1L)).toInt) += 1)
    var sc = bias
    var b = 0
    while (b < dim) {
      if (cnt(b) != 0) sc += cnt(b).toDouble * weights(b)
      b += 1
    }
    sc
  }

  /** All overlapping k-char substrings, in order (char-gram stream for the
    * trigram LM quality operator). Like the sibling kernels this indexes
    * UTF-16 code units (astral-plane chars count as two); identical to
    * Spark's substr over BMP text, where code unit == codepoint. */
  def charGrams(input: UTF8String, k: Int): ArrayData = {
    val s = input.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](n - k + 1)
    var i = 0
    while (i + k <= n) {
      out(i) = UTF8String.fromString(s.substring(i, i + k))
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** All 13 Gopher repetition signals (Rae et al. 2021 A1.1) in ONE pass
    * per document, in this fixed order:
    * [0] dup_line_frac [1] dup_line_char_frac
    * [2] dup_para_frac [3] dup_para_char_frac
    * [4..6] top_{2,3,4}gram_char_frac [7..12] dup_{5..10}gram_char_frac.
    *
    * Semantics mirror the relational oracle exactly: lines/paragraphs are
    * space-trimmed non-empty `\n` / `\n\n` splits of the RAW text; grams
    * run over the normalized text (lowercase via UTF8String.toLowerCase —
    * the same routine as Spark's `lower()` — then `[ \t\n\f\r]+`
    * collapsed to single spaces and trimmed, matching Dedup.normalize);
    * char counts are CODEPOINTS (matching `length()`); the top gram is
    * the lexicographically-first gram of maximal count. Lexicographic
    * tie-break uses String.compareTo (UTF-16 code-unit order) — identical
    * to engine byte order over BMP text, the sibling kernels' documented
    * caveat. Every fraction is one long/long IEEE division → bit-exact
    * against the SQL twin.
    *
    * The interpreted equivalent (9 wordNgrams arrays + 3 array_sorts + 8
    * array_distincts + per-element fold lambdas) measured 9.85 s at
    * sf0.1; this kernel is a single JIT-friendly pass with per-n hash
    * maps. */
  def gopherRepetition(input: UTF8String): ArrayData = {
    val out = new Array[Any](13)
    val raw = input.toString
    // ---- line / paragraph duplicate stats over the raw text
    def splitDupStats(delim: String, fracSlot: Int, charSlot: Int): Unit = {
      val seen = new java.util.HashSet[String]()
      var total = 0L; var totChars = 0L; var disChars = 0L
      var from = 0
      while (from <= raw.length) {
        val hit = raw.indexOf(delim, from)
        val end = if (hit < 0) raw.length else hit
        // trim ASCII spaces only (the `trim()` contract both engines share)
        var a = from; var b = end
        while (a < b && raw.charAt(a) == ' ') a += 1
        while (b > a && raw.charAt(b - 1) == ' ') b -= 1
        if (b > a) {
          val seg = raw.substring(a, b)
          val cp = seg.codePointCount(0, seg.length).toLong
          total += 1L; totChars += cp
          if (seen.add(seg)) disChars += cp
        }
        if (hit < 0) from = raw.length + 1 else from = hit + delim.length
      }
      out(fracSlot) =
        if (total > 0L) (total - seen.size).toDouble / total else 0.0
      out(charSlot) =
        if (totChars > 0L) (totChars - disChars).toDouble / totChars else 0.0
    }
    splitDupStats("\n", 0, 1)
    splitDupStats("\n\n", 2, 3)
    // ---- normalized text (Dedup.normalize semantics) + word starts
    val lowered = input.toLowerCase.toString
    val nb = new java.lang.StringBuilder(lowered.length)
    var i = 0; var pendingSpace = false
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (ws) { if (nb.length > 0) pendingSpace = true }
      else { if (pendingSpace) { nb.append(' '); pendingSpace = false }
        nb.append(c) }
      i += 1
    }
    val norm = nb.toString
    val normLen = norm.codePointCount(0, norm.length).toLong
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    if (norm.nonEmpty) starts += 0
    i = 0
    while (i < norm.length) { if (norm.charAt(i) == ' ') starts += i + 1; i += 1 }
    val w = if (norm.isEmpty) 0 else starts.length
    def gramEnd(lastWord: Int): Int =
      if (lastWord + 1 == w) norm.length else starts(lastWord + 1) - 1
    // ---- top-{2,3,4}-gram char fractions
    var n = 2
    while (n <= 4) {
      val counts = new java.util.HashMap[String, Int]()
      var j = 0
      while (j + n <= w) {
        val k = norm.substring(starts(j), gramEnd(j + n - 1))
        counts.put(k, counts.getOrDefault(k, 0) + 1)
        j += 1
      }
      var bestCnt = 0; var bestGram: String = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCnt ||
            (e.getValue == bestCnt && bestGram != null &&
              e.getKey.compareTo(bestGram) < 0)) {
          bestCnt = e.getValue; bestGram = e.getKey
        }
      }
      val chars = if (bestGram == null) 0L
        else bestCnt.toLong * bestGram.codePointCount(0, bestGram.length)
      out(4 + (n - 2)) = if (normLen > 0L) chars.toDouble / normLen else 0.0
      n += 1
    }
    // ---- duplicate-{5..10}-gram char fractions
    n = 5
    while (n <= 10) {
      val seen = new java.util.HashSet[String]()
      var tot = 0L; var dis = 0L
      var j = 0
      while (j + n <= w) {
        val g = norm.substring(starts(j), gramEnd(j + n - 1))
        val cp = g.codePointCount(0, g.length).toLong
        tot += cp
        if (seen.add(g)) dis += cp
        j += 1
      }
      out(7 + (n - 5)) = if (tot > 0L) (tot - dis).toDouble / tot else 0.0
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Fraction of positions where two equal-length long arrays agree. */
  def matchingFraction(a: ArrayData, b: ArrayData): Double = {
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

  /** Exact Jaccard of two SORTED distinct long arrays via linear merge. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
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

  /** MinHash signature: lane j = min over x of a_j*x + b_j. */
  def minhashSig(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val numHashes = as.length
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

  /** Winnowing fingerprint: k-shingle rolling-hash stream → min per sliding
    * window of w (monotone deque, O(n)) → distinct set. */
  def winnowFingerprint(input: UTF8String, k: Int, w: Int): ArrayData = {
    val s = input.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array(mix(s.hashCode.toLong)))
    var pk = 1L
    var i = 0
    while (i < k - 1) { pk *= P; i += 1 }
    val m = n - k + 1 // number of shingles
    val stream = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * P + s.charAt(i); i += 1 }
    stream(0) = mix(h)
    while (i < n) {
      h = (h - s.charAt(i - k) * pk) * P + s.charAt(i)
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
}

/** Distinct rolling-hash values of all character k-shingles of the input
  * string → array<long> (unordered set semantics). Polynomial rolling hash
  * over UTF-16 code units, splitmix64-finalized. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.shingleHashSet(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.shingleHashSet($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length long arrays agree — the
  * MinHash Jaccard estimator over two signatures. */
case class MatchingFraction(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "matching_fraction"

  override def nullSafeEval(l: Any, r: Any): Any =
    TextHashKernels.matchingFraction(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHashKernels.matchingFraction($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatchingFraction =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard of two SORTED distinct long arrays via linear merge —
  * replaces interpreted array_intersect/array_union on the LSH verification
  * path (the dominant cost once candidates number in the 100k's). */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(l: Any, r: Any): Any =
    TextHashKernels.jaccardSorted(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHashKernels.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over a hashed set: lane j = min over x of mix-free
  * affine a_j*x+b_j — one tight two-level loop, array<long>(numHashes) out.
  * The lane coefficients ride into generated code as reference objects. */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val lanes: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L)
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minhashSig(input.asInstanceOf[ArrayData], lanes._1, lanes._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", lanes._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", lanes._2, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.minhashSig($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fixed-size word segments of NORMALIZED text (single-spaced, trimmed):
  * every run of `w` words, as the exact substring between word boundaries
  * — equal to concat_ws(" ", slice(tokens, i, w)) but one scan of the
  * string instead of a token array + interpreted per-segment lambdas. */
/** Count of the child array's elements present in a SORTED reference long
  * array (rides into generated code as one long[] reference object). */
case class CountInSorted(child: Expression, sorted: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_sorted"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.countInSorted(input.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedSet", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.countInSorted($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSorted =
    copy(child = newChild)
}

/** Normalized text with every token covered by a benchmark n-gram excised
  * (span-level decontamination; the sorted benchmark hash set rides as a
  * task-binary reference array, the t27 discipline). */
case class ExciseContaminated(child: Expression, sorted: Array[Long], n: Int)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "excise_contaminated"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.exciseContaminated(input.asInstanceOf[UTF8String],
      sorted, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("benchSorted", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.exciseContaminated($c, $ref, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): ExciseContaminated =
    copy(child = newChild)
}

/** Overlapping space-joined n-word grams of normalized text, in order. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

case class WordSegments(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_segments"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordSegments(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.wordSegments($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WordSegments =
    copy(child = newChild)
}

/** All overlapping k-char substrings in one scan. The composed alternative
  * — transform(sequence(1, length(s)-k+1), i -> substr(s, i, k)) — is a
  * higher-order function: its lambda evaluates INTERPRETED per element and
  * re-evaluates the (arbitrarily expensive) child expression per element
  * after projection collapse inlines it; with normalize() as the child
  * that made the trigram operator O(len²) regex work per document
  * (26s → 1.4s on the sf0.1 bench for t10). */
case class CharGrams(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.charGrams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.charGrams($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

/** Sorted distinct word-n-gram xxhash64 set — see
  * [[TextHashKernels.wordNgramHashSet]] for the exact hash contract. */
case class WordNgramHashSet(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hash_set"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordNgramHashSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.wordNgramHashSet($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashSet =
    copy(child = newChild)
}

/** The 13 Gopher repetition signals as one array-of-double column — see
  * [[TextHashKernels.gopherRepetition]] for the slot order and the exact
  * per-signal semantics. */
case class GopherRepetition(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gopher_repetition"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.gopherRepetition(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.gopherRepetition($c);")

  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}

/** Winnowing fingerprint: k-shingle rolling-hash stream → min per sliding
  * window of w (classic monotone-deque, O(n)) → distinct set. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.winnowFingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.winnowFingerprint($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Bloom-bitset membership probe (boolean) over a 64-bit element hash.
  * The bitset rides into generated code as ONE long[] reference object;
  * the k positions derive from a single shared xxhash64 of the element
  * hash — half the hash work of the k-conjunct Column formulation — and
  * the sharing happens INSIDE the static kernel, not across generated
  * conjuncts, so the Janino split-function CSE trap the
  * [[graft.operators.Dedup.bloomPosition]] scaladoc documents cannot
  * apply. Position family identical to bloomPosition (parity pinned in
  * DedupSpec). */
case class BloomProbe(child: Expression, bits: Array[Long], mBits: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.bloomProbe(bits, input.asInstanceOf[Long], mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.bloomProbe($bitsRef, $c, $mBits, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

/** Hashed-feature bucket ids of every gram occurrence, orders 1..maxN —
  * the fit-side stream of the hashed linear classifier (t33). */
case class HashedGramBuckets(child: Expression, dim: Int, maxN: Int)
    extends UnaryExpression {
  require(dim > 0 && (dim & (dim - 1)) == 0,
    s"dim must be a power of two (got $dim): bucket = hash & (dim-1) must " +
      "equal pmod(hash, dim) and the oracle's unsigned-mod twin")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "hashed_gram_buckets"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.hashedGramBuckets(input.asInstanceOf[UTF8String], dim, maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.hashedGramBuckets($c, $dim, $maxN);")

  override protected def withNewChildInternal(newChild: Expression): HashedGramBuckets =
    copy(child = newChild)
}

/** Linear classifier score over hashed gram features in ONE codegen pass —
  * see [[TextHashKernels.hashedGramScore]] for the deterministic
  * bucket-ascending fold contract. The trained weights ride into generated
  * code as one double[] reference object (the BloomProbe pattern). */
case class HashedGramScore(child: Expression, weights: Array[Double],
    bias: Double, maxN: Int) extends UnaryExpression {
  require(weights.length > 0 && (weights.length & (weights.length - 1)) == 0,
    s"weights.length must be a power of two (got ${weights.length})")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "hashed_gram_score"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.hashedGramScore(input.asInstanceOf[UTF8String], weights,
      bias, maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clfWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.hashedGramScore($c, $wRef, ${bias}D, $maxN);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedGramScore =
    copy(child = newChild)
}

object TextHashExprs {
  def hashedGramBuckets(c: Column, dim: Int, maxN: Int): Column =
    GraftColumnBridge.column(HashedGramBuckets(
      GraftColumnBridge.expression(c), dim, maxN))
  def hashedGramScore(c: Column, weights: Array[Double], bias: Double,
      maxN: Int): Column =
    GraftColumnBridge.column(HashedGramScore(
      GraftColumnBridge.expression(c), weights, bias, maxN))
  def bloomProbe(c: Column, bits: Array[Long], mBits: Int, k: Int): Column =
    GraftColumnBridge.column(BloomProbe(GraftColumnBridge.expression(c), bits, mBits, k))
  def shingleHashSet(c: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashSet(GraftColumnBridge.expression(c), k))
  def minhashSig(c: Column, numHashes: Int, seed: Long): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c), numHashes, seed))
  def winnowFingerprint(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowFingerprint(GraftColumnBridge.expression(c), k, w))
  def wordSegments(c: Column, w: Int): Column =
    GraftColumnBridge.column(WordSegments(GraftColumnBridge.expression(c), w))
  def wordNgrams(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(c), n))
  def countInSorted(c: Column, sorted: Array[Long]): Column =
    GraftColumnBridge.column(CountInSorted(GraftColumnBridge.expression(c), sorted))
  def exciseContaminated(c: Column, sorted: Array[Long], n: Int): Column =
    GraftColumnBridge.column(ExciseContaminated(
      GraftColumnBridge.expression(c), sorted, n))
  def charGrams(c: Column, k: Int): Column =
    GraftColumnBridge.column(CharGrams(GraftColumnBridge.expression(c), k))
  def gopherRepetition(c: Column): Column =
    GraftColumnBridge.column(GopherRepetition(GraftColumnBridge.expression(c)))
  def wordNgramHashSet(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgramHashSet(GraftColumnBridge.expression(c), n))
  def jaccardSorted(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardSorted(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def matchingFraction(a: Column, b: Column): Column =
    GraftColumnBridge.column(MatchingFraction(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
