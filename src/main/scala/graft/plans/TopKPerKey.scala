package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key — the custom-operator stack (logical
  * node → strategy → physical exec) for a query shape Spark only
  * expresses as `row_number() OVER (PARTITION BY key ORDER BY o) <= k`,
  * whose physical plan fully sorts every partition.
  *
  * This operator never sorts: each task keeps a bounded k-element heap
  * per key. It runs in two phases — a partial pass on whatever
  * partitioning the child has (map-side combine: at most k rows per
  * key per partition survive), then a final pass clustered on the key.
  * The shuffle moves O(k × keys) rows instead of the whole input, and
  * per-task memory is O(k × keys-per-task) instead of a sort buffer —
  * at 100 TB the difference between "latest 20 per symbol" touching
  * every row once and sorting 100 TB.
  *
  * Output rows are the exact top-k set per key (heap order, not
  * sorted); callers needing intra-key order add a cheap k-row sort.
  */
case class TopKPerKeyPlan(k: Int, keyExprs: Seq[Expression],
                          orderExprs: Seq[SortOrder],
                          child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plants the two-phase physical pair for [[TopKPerKeyPlan]]. */
object TopKPerKeyStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan => L}
  override def apply(plan: L): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order, planLater(child), partial = true)
      TopKPerKeyExec(k, keys, order, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keyExprs: Seq[Expression],
                          orderExprs: Seq[SortOrder],
                          child: SparkPlan,
                          partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keyExprs) :: Nil

  // final phase preserves the clustered partitioning of its child
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keyExprs
    val orderLocal = orderExprs
    val schema = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, schema)
      // rowOrd: a < b iff a sorts first (is better). Scala's
      // PriorityQueue surfaces the MAX at head — under rowOrd that is
      // the sort-last (worst) retained row, exactly the eviction
      // candidate.
      val rowOrd = new LazilyGeneratedOrdering(orderLocal, schema)
      implicit val heapOrd: Ordering[UnsafeRow] =
        rowOrd.asInstanceOf[Ordering[InternalRow]].on[UnsafeRow](r => r: InternalRow)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow]
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (heapOrd.lt(row.asInstanceOf[UnsafeRow], heap.head)) {
          // strictly better than the current worst
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
