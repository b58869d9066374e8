package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Custom whole-operator tier (SURVEY.md §3): per-group top-k as its
  * own LogicalPlan + Strategy + physical operator.
  *
  * The built-in formulation (`row_number` window + filter) sorts every
  * group fully inside WindowExec — O(n log n) per partition and the
  * whole partition buffered. This operator keeps one bounded k-heap
  * per group (O(n log k), O(groups × k) memory) and never materializes
  * a sort of the losers — the difference between "sort 100 TB" and
  * "stream 100 TB through fixed-size heaps". Registered through
  * `GraftExtensions.injectPlannerStrategy`.
  */
case class GroupTopK(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Attribute = AttributeReference("rk", IntegerType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(group, order, k, child, rankAttr) =>
      // Two-phase like partial aggregation: a narrow partial pass caps
      // each input partition at k rows PER GROUP before the exchange,
      // so the shuffle moves at most partitions × groups × k rows —
      // never the full input (top-k of per-partition top-ks is the
      // global top-k). With no group at all the final pass merges the
      // ≤ partitions × k survivors on a single task.
      GroupTopKExec(group, order, k, rankAttr,
        GroupTopKExec(group, order, k, rankAttr, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

case class GroupTopKExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan,
    partial: Boolean = false)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  /** Co-locate each group on one task — the only shuffle this
    * operator needs. A `partial` pass runs narrow (any distribution);
    * a global (group-less) final pass merges on a single task, fed
    * only ≤ k rows per upstream partition by the partial pass.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (group.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(group) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val outputAttrs = output
    val isPartial = partial
    child.execute().mapPartitions ({ it: Iterator[InternalRow] =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      // PriorityQueue dequeues the max under its ordering; the max
      // under rowOrd is the sort-last (worst) row -> evicted at >k
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[UnsafeRow](rowOrd.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        if (heap.size > limit) heap.dequeue()
      }
      if (isPartial) {
        // survivors only — rank is assigned by the final pass
        heaps.iterator.flatMap { case (_, heap) => heap.dequeueAll.reverse.iterator }
          .map(identity[InternalRow])
      } else {
        val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.iterator.flatMap { case (_, heap) =>
          val bestFirst: Seq[UnsafeRow] = heap.dequeueAll.reverse
          bestFirst.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, i + 1)
            resultProj(joined(row, rankRow)): InternalRow
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
