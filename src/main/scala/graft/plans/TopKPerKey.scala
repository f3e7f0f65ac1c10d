package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator tier of the extension ladder — a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` (SURVEY §2.8 tier c):
  * per-key top-k WITHOUT sorting.
  *
  * Honest comparison with the built-in route
  * (`row_number().over(Window...) <= k`): since 3.5 Spark's
  * `InferWindowGroupLimit` already rewrites that into partial+final
  * `WindowGroupLimit`s, so the shuffle carries only ≤ keys·k rows per
  * map partition — but BOTH limit stages still run behind a full
  * per-partition SORT, and the Window (rank) pass sorts again after
  * the exchange. This operator keeps the same partial/final
  * shuffle-reduction shape while replacing every sort with bounded
  * k-row heaps: O(n log k) comparisons, O(keys·k) memory per
  * partition, zero SortExec anywhere. The partial stage has no
  * distribution requirement (map-side), the final stage declares
  * `ClusteredDistribution` and Spark inserts the exchange between
  * them.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"topKPerKey k must be >= 1, got $k")
  // match groupBy/Window: map-typed grouping keys are not groupable
  keys.foreach(key => require(!TopKPerKey.containsMap(key.dataType),
    s"topKPerKey key ${key.sql} has a map type, which cannot be a grouping key"))
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKey {
  private[plans] def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
}

/** Planner strategy: register via `spark.experimental.extraStrategies`
  * (works on any live session) or a `SparkSessionExtensions`
  * `injectPlannerStrategy`. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // float keys must group like groupBy/Window would: normalize
      // -0.0/0.0 and NaN bit patterns BEFORE both the byte-equality
      // HashMap and the clustered hash (the optimizer inserts this
      // for Aggregate; a custom node must do it itself)
      val normKeys = keys.map(org.apache.spark.sql.GraftSqlBridge.normalizeFloats)
      // partial (map-side, no distribution requirement) under final
      // (clustered) — Spark inserts the exchange between them, which
      // then carries ≤ keys·k rows per map partition
      TopKPerKeyExec(normKeys, order, k, partial = false,
        TopKPerKeyExec(normKeys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical per-key top-k: requires clustering on `keys` (Spark
  * inserts the exchange), then one pass per partition maintaining a
  * k-row max-heap per key — the heap root is the WORST kept row, so a
  * new row displaces it only when it sorts strictly earlier. Rows and
  * keys are copied on retention (the input iterator reuses buffers). */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // local copies: referencing case-class fields inside the closure
    // would capture `this` (a SparkPlan — not serializable)
    val childOutput = child.output
    val localKeys = keys
    val localOrder = order
    val localK = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(localKeys, childOutput)
      val ord = RowOrdering.create(localOrder, childOutput)
      // max-heap via reversed comparator: peek() = worst retained row
      val heapCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](localK, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < localK) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
