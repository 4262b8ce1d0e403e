package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k-per-key as a first-class operator (build-brief tier (c): custom
  * LogicalPlan + Strategy + SparkPlan).
  *
  * The composed alternative — `row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k` — SORTS every key's full candidate set. At 100 TB an
  * ANN re-rank can hold millions of candidates per query; this operator
  * keeps a bounded k-element binary heap per key instead: O(n log k) time
  * and O(|keys|·k) memory, with the same cluster-by-key distribution
  * requirement (Spark inserts the exchange; AQE still re-plans it).
  *
  * Output = child columns + an int `rank` column (1-based, best first),
  * exactly the contract of the window formulation it replaces.
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    // constructor field (not a val) so analyzer copies preserve the exprId
    rankAttr: AttributeReference =
      AttributeReference("rank", IntegerType, nullable = false)())
    extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  // all rows of one key must meet in one partition (Spark adds the shuffle)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // heap keeps the WORST retained row on top → O(log k) replacement
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1,
            ordering.reverse.asInstanceOf[java.util.Comparator[InternalRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val heap = it.next()
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
        var r = 0
        while (r < rows.length) {
          val joined = new GenericInternalRow(childOutput.length + 1)
          var c = 0
          while (c < childOutput.length) { joined(c) = rows(r).asInstanceOf[InternalRow]
            .get(c, childOutput(c).dataType); c += 1 }
          joined(childOutput.length) = r + 1
          out += joined
          r += 1
        }
      }
      val toUnsafe = UnsafeProjection.create(output.map(_.dataType).toArray)
      out.iterator.map(toUnsafe)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Window-composed fallback with bounded memory per partition: Spark's
    * sort-based window spills to disk, so it survives arbitrarily many
    * distinct keys — at the price of a full per-key sort. Use when the key
    * cardinality per partition is unbounded (general groupwise top-k over
    * a high-cardinality key); the heap operator is the right choice for
    * the ANN re-rank contract (bounded query set). */
  def windowed(df: DataFrame, keyNames: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val ord = orderBy.map { case (n, desc) =>
      if (desc) col(n).desc else col(n).asc }
    df.withColumn("rank",
        row_number().over(Window.partitionBy(keyNames.map(col): _*).orderBy(ord: _*)))
      .filter(col("rank") <= k)
  }

  /** Rows of `df` ranked 1..k per key, best first. `orderBy` entries are
    * (columnName, descending). Attribute resolution happens here against the
    * analyzed child (the classic-Column bridge yields lazy ColumnNode
    * wrappers the analyzer won't resolve inside a foreign node). Registers
    * the strategy on first use (idempotent).
    *
    * MEMORY CONTRACT: the heap executor holds O(|distinct keys in
    * partition| · k) rows with no spill — sized for the ANN re-rank shape
    * (keys = the broadcast query set, thousands at most). For an unbounded/
    * high-cardinality key use [[windowed]], which spills via Spark's
    * sort-based window at the cost of a full per-key sort. */
  def apply(df: DataFrame, keyNames: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    val keys = keyNames.map(attr)
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftColumnBridge.ofRows(spark, TopKPerKeyNode(keys, order, k, plan))
  }
}
