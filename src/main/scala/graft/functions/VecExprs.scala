package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels for the similarity operators. The composed alternative —
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)` — evaluates its
  * lambdas interpretively per element (the same trap the dedup hot loops
  * hit, SURVEY §4.3); this expression is one codegen-resident loop per row
  * and preserves the EXACT numeric contract of that composition: each
  * element widened to double, products accumulated strictly left-to-right
  * (IEEE-identical to the DuckDB list_reduce oracle twin). */
object VecKernels {
  /** Sequential dot product; `aFloat`/`bFloat` select the element reader. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Int8 scalar-quantization codes as exact doubles: scale = 127/max|xᵢ|,
    * code = floor(x·scale + 0.5). Same IEEE ops as the composed
    * transform/array_max twin (and the DuckDB oracle) — one codegen loop
    * instead of three interpreted lambda passes per vector. */
  def quantize(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      // a null slot would silently unbox to 0.0 and break the cross-engine
      // hash-verify contract (the composed twin propagates NULL) — fail loud
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        "quantize_int8: null array element — filter or coalesce elements first")
      val x = math.abs(if (aFloat) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > mx) mx = x
      i += 1
    }
    val scale = if (mx > 0) 127.0 / mx else 0.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = math.floor(x * scale + 0.5)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Nearest-centroid kernel — see [[NearestCentroid]]. */
object CentroidKernels {
  /** argmin over centroids of the 0.0-seeded left fold Σ(xᵢ-cᵢ)², ties to
    * the smaller index — bit-identical to
    * `array_min(array(struct(sqDistFold, i)...))` over the same literals
    * (lexicographic struct compare: distance first, then cell; NaN ordered
    * GREATEST per Spark's total order, so a NaN distance never wins over a
    * finite one and an all-NaN row picks the smallest index). */
  def nearest(a: ArrayData, aFloat: Boolean,
      cents: Array[Array[Double]]): org.apache.spark.sql.catalyst.InternalRow = {
    var best = -1
    var bestD = 0.0
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var acc = 0.0
      var t = 0
      while (t < c.length) {
        val x = if (aFloat) a.getFloat(t).toDouble else a.getDouble(t)
        val d0 = x - c(t)
        acc += d0 * d0
        t += 1
      }
      // NaN-aware: acc beats bestD when strictly smaller OR bestD is NaN and
      // acc is not (Spark orders NaN greatest; NaN==NaN ties keep first index)
      if (best < 0 || acc < bestD || (bestD != bestD && acc == acc)) {
        best = i; bestD = acc
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestD, best)
  }
}

/** Nearest k-means centroid of an array<float|double> vector against a
  * CONSTANT centroid matrix → struct(d: double, cell: int). One codegen
  * loop per row replacing kc interpreted fold lambdas — the same
  * interpreted-lambda trap [[DotProduct]] fixed for the dot products
  * (SURVEY §4.3), hit by every nearest-centroid assignment (s03 corpus
  * side, s06, d19, s07's per-subspace encode). Numeric contract identical
  * to the composed form, so the literal-inlined DuckDB twins still hold. */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val centArray: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<float|double>, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any): Any =
    CentroidKernels.nearest(a.asInstanceOf[ArrayData], elemFloat, centArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centArray,
      "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CentroidKernels.nearest($a, $elemFloat, $cents);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** dot(a, b) over array<float|double> columns → double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.dot($a, $b, " +
        s"${elemFloat(left)}, ${elemFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Int8 quantization codes of an array<float|double> column, emitted as
  * array<double> (exact small integers — ready for [[DotProduct]] without a
  * cast pass; callers wanting storage-width int8 cast the result). */
case class QuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 needs array<float|double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(a: Any): Any =
    VecKernels.quantize(a.asInstanceOf[ArrayData], elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecKernels.quantize($a, $elemFloat);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object VecExprs {
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Quantization codes as array<double> — see [[QuantizeInt8]]. */
  def quantizeCodes(a: Column): Column =
    GraftColumnBridge.column(QuantizeInt8(GraftColumnBridge.expression(a)))

  /** struct(d, cell) of the nearest centroid — see [[NearestCentroid]]. */
  def nearestCentroid(a: Column, centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(a), centroids))
}
