package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (the SURVEY §7.3 route (c): LogicalPlan +
  * Strategy + SparkPlan via SparkSessionExtensions): bounded top-k rows
  * per group.
  *
  * The window formulation (`row_number().over(partitionBy g orderBy s)
  * <= k`) shuffles EVERY input row and sorts every group before the
  * filter throws most rows away. This operator runs in two phases like a
  * partial aggregate: a map-side pass keeps at most k rows per group per
  * partition in bounded heaps, so the exchange moves ≤ k·|groups| rows
  * per partition instead of the whole input; the reduce-side pass merges
  * heaps after a hash shuffle on the group key. At 100 TB with small k
  * the shuffle shrinks by orders of magnitude — the same reason partial
  * aggregation exists.
  *
  * Memory contract: O(|groups per partition| · k) rows, no spill — the
  * same envelope as a hash aggregate buffer (and the window form's sort
  * buffer is strictly larger). Ties beyond k are dropped row_number-style;
  * pass a TOTAL order for deterministic results.
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
                        order: Seq[SortOrder], child: LogicalPlan,
                        rankAttr: Option[Attribute] = None)
    extends UnaryNode {
  require(k > 0, s"topKPerGroup needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial exec below the
  * exchange, final exec above (the exchange is inserted by
  * EnsureRequirements from the final's required distribution). Only the
  * final exec emits the optional rank column — a partial rank would be
  * per-partition-local and meaningless after the merge.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, child, rank) =>
      val partial = TopKPerGroupExec(k, g, o, planLater(child), isPartial = true)
      TopKPerGroupExec(k, g, o, partial, isPartial = false, rankAttr = rank) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
                            order: Seq[SortOrder], child: SparkPlan,
                            isPartial: Boolean,
                            rankAttr: Option[Attribute] = None)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (isPartial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (isPartial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val outputLocal = child.output
    val rankLocal = rankAttr.isDefined && !isPartial
    val rankedTypes = (child.output ++ rankAttr).map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, outputLocal)
      val ordering = new LazilyGeneratedOrdering(orderLocal, outputLocal)
      // max-heap on the sort order: the head is the WORST retained row,
      // evicted when a better one arrives
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.offer(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      // rank path: emit UnsafeRows (downstream exchanges serialize
      // UnsafeRow directly; a GenericInternalRow would CCE there)
      val toUnsafe = if (rankLocal) UnsafeProjection.create(rankedTypes) else null
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val heap = it.next()
        val rows = new Array[InternalRow](heap.size())
        var i = 0
        while (!heap.isEmpty) { rows(i) = heap.poll(); i += 1 }
        // drain gives worst-first; reverse for sort-order emission.
        // On the final pass the emission position IS the group rank
        // (1-based, row_number semantics) — appending it here makes a
        // trailing window re-rank of already-pruned rows redundant.
        var j = rows.length - 1
        while (j >= 0) {
          if (rankLocal) {
            val joined = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              outputLocal.length + 1)
            var c = 0
            while (c < outputLocal.length) {
              joined.update(c, rows(j).get(c, outputLocal(c).dataType)); c += 1
            }
            joined.update(outputLocal.length, rows.length - j)
            out += toUnsafe(joined).copy()
          } else out += rows(j)
          j -= 1
        }
      }
      out.iterator
    }
  }


  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
