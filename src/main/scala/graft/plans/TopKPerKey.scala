package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension demo (SURVEY.md §7.3 ladder, rung (c)): top-k
  * rows per key as a first-class plan node.
  *
  * Relationship to built-ins: Spark ≥3.5's InferWindowGroupLimit already
  * limits rank<=k window filters map-side (WindowGroupLimit), but it still
  * SORTS each partition (O(n log n)); this operator keeps bounded heaps
  * (O(n log k), no sort) and is available as an explicit API for pipelines
  * that want per-key top-k without a rank column at all. Only ≤ k rows per
  * (key, partition) reach the shuffle in either case.
  *
  * Pieces: logical node → planner Strategy → partial + final physical nodes
  * (the final declares ClusteredDistribution so EnsureRequirements inserts
  * the exchange), registered via SparkSessionExtensions.
  */
final case class TopKPerKeyNode(
    keys: Seq[NamedExpression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

abstract class TopKPerKeyExecBase extends UnaryExecNode {
  def keys: Seq[NamedExpression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  /** Keep the best ≤ k rows per distinct key within each partition.
    *
    * MEMORY CAVEAT: the partial stage holds one k-row heap per distinct key
    * seen in the partition, in an unspillable HashMap — worst-case
    * O(distinctKeysPerPartition × k) rows. That is the same order as what
    * the partial stage must EMIT (its entire purpose is ≤ k rows per
    * (key, partition) crossing the wire), so it is only a concern when a
    * single input partition holds more distinct keys × k than executor
    * memory — size input splits accordingly, or fall back to the window
    * formulation (rank ≤ k), which sort-spills, for pathological
    * cardinalities. */
  protected def topKPerPartition(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, child.output)
    val rowOrd: Ordering[InternalRow] = GenerateOrdering.generate(order, child.output)
    // head of the heap = the CURRENT WORST retained row (so we can evict)
    val heapOrd: java.util.Comparator[InternalRow] = rowOrd.reverse
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    iter.foreach { row =>
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, heapOrd)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) {
        heap.add(row.copy())
      } else if (rowOrd.compare(row, heap.peek()) < 0) { // better than worst
        heap.poll()
        heap.add(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
  }
}

/** Map-side partial: bounded heaps, no distribution requirement. */
final case class PartialTopKPerKeyExec(
    keys: Seq[NamedExpression], order: Seq[SortOrder], k: Int, child: SparkPlan)
  extends TopKPerKeyExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(topKPerPartition, preservesPartitioning = true)
  override protected def withNewChildInternal(c: SparkPlan) = copy(child = c)
}

/** Reduce-side final: requires co-location by key (EnsureRequirements
  * inserts the hash exchange), then the same bounded-heap pass yields the
  * global per-key top-k. Output rows are sorted per key for determinism. */
final case class FinalTopKPerKeyExec(
    keys: Seq[NamedExpression], order: Seq[SortOrder], k: Int, child: SparkPlan)
  extends TopKPerKeyExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val rowOrd: Ordering[InternalRow] = GenerateOrdering.generate(order, child.output)
      topKPerPartition(iter).toArray.sortWith((a, b) => rowOrd.compare(a, b) < 0)
        .iterator
    }, preservesPartitioning = true)
  override protected def withNewChildInternal(c: SparkPlan) = copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      FinalTopKPerKeyExec(keys, order, k,
        PartialTopKPerKeyExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** The top `k` rows per key group, best-first by `order` (column name →
    * ascending?). Ties should be broken by appending a unique column.
    * Expressions are built as pure catalyst trees (UnresolvedAttribute +
    * SortOrder) — Column-API sort nodes carry non-serializable ColumnNode
    * baggage that poisons executor closures. */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val spark = df.sparkSession
    GraftFunctions.installPlanner(spark)
    val keys: Seq[NamedExpression] = keyCols.map(UnresolvedAttribute(_))
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute(name), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(spark,
      TopKPerKeyNode(keys, sortOrders, k, Bridge.logicalPlan(df)))
  }
}
