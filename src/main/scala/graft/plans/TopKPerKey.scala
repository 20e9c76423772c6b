package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator extension (SURVEY.md §2.1 q57): per-key top-k as a
  * first-class plan node — custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * (`GraftExtensions`) / `experimental.extraStrategies` (`GraftSession`).
  *
  * Why not a window? `row_number().over(partitionBy(key).orderBy(o)) <= k`
  * fully sorts every partition before discarding all but k rows per key.
  * This operator keeps a bounded k-row heap per key — O(n log k) with no
  * sort buffer — and, crucially, runs a *partial* pass before the shuffle,
  * so each map task ships at most k rows per key: on a skewed 100 TB input
  * the exchange carries ~keys×k rows instead of everything. Same algebra as
  * partial aggregation: top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B)).
  *
  * Memory: one (key → k-row heap) map per task, bounded by distinct keys
  * per partition × k — the same envelope as a hash aggregate over the key.
  */
case class TopKPerKey(keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy: lower the logical node to partial + final exec, letting
  * EnsureRequirements insert the key-clustered exchange between them. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ordering, k, child) =>
      val partial = TopKPerKeyExec(keys, ordering, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, ordering, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Physical per-key bounded-heap top-k. `partial = true` runs map-side on
  * whatever distribution the child has; the final pass requires clustering
  * by the keys so each key's global top-k lives in exactly one task. */
case class TopKPerKeyExec(keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrders = ordering
    val limit = k
    val attrs = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      // PriorityQueue dequeues its MAX first; under the requested ordering the
      // max is the *worst* of the kept rows, i.e. exactly the eviction victim.
      val ord: Ordering[InternalRow] = RowOrdering.create(sortOrders, attrs)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { r =>
        val h = heaps.getOrElseUpdate(keyProj(r).copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (h.size < limit) h.enqueue(r.copy())
        else if (ord.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r.copy()) }
      }
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }
  }
}
