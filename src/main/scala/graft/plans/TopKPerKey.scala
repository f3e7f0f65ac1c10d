package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BaseOrdering, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
  *
  * Memory posture: the per-partition heap map tracks its retained
  * bytes against `spark.graft.topKPerKey.spillBytes` (default 128 MiB
  * per task). Past the budget the map SPILLS to a local run file
  * sorted by key BYTES — UnsafeRow byte equality is key equality
  * (the strategy normalizes float keys first), so unsigned
  * lexicographic byte order is a valid grouping order — and the run
  * files are k-way merged with the in-memory remainder at the end of
  * the partition, combining per-key heaps as runs meet. High key
  * cardinality therefore degrades to sequential disk I/O instead of
  * OOM, the same contract as Spark's sort-based route.
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
  val SpillBytesKey = "spark.graft.topKPerKey.spillBytes"
  val SpillBytesDefault: Long = 128L << 20

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
  * keys are copied on retention (the input iterator reuses buffers)
  * and stored as UnsafeRows so retained bytes are measurable and
  * spillable (see [[TopKPerKey]] memory posture). */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(keys)) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "spillCount" -> SQLMetrics.createMetric(sparkContext, "number of heap-map spills"),
    "spillBytes" -> SQLMetrics.createSizeMetric(sparkContext, "bytes spilled to disk"))

  override protected def doExecute(): RDD[InternalRow] = {
    // local copies: referencing case-class fields inside the closure
    // would capture `this` (a SparkPlan — not serializable)
    val childOutput = child.output
    val localKeys = keys
    val localOrder = order
    val localK = k
    val budget = conf.getConfString(
      TopKPerKey.SpillBytesKey, TopKPerKey.SpillBytesDefault.toString).toLong
    val spillCount = longMetric("spillCount")
    val spillBytes = longMetric("spillBytes")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(localKeys, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = RowOrdering.create(localOrder, childOutput)
      new TopKHeapMap(iter, keyProj, rowProj, ord, localK, budget,
        childOutput.length, spillCount, spillBytes).result()
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** One partition's heap map with byte-budgeted disk spilling. */
private[plans] final class TopKHeapMap(
    input: Iterator[InternalRow],
    keyProj: UnsafeProjection,
    rowProj: UnsafeProjection,
    ord: BaseOrdering,
    k: Int,
    budgetBytes: Long,
    numFields: Int,
    spillCountMetric: SQLMetric,
    spillBytesMetric: SQLMetric) {

  // max-heap via reversed comparator: peek() = worst retained row
  private val heapCmp = new java.util.Comparator[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
  }
  private val heaps =
    new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
  private var retainedBytes = 0L
  private val spillFiles = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
  private val openRuns = scala.collection.mutable.ArrayBuffer.empty[TopKSpillRun]

  // a task killed (or a downstream limit that stops draining the
  // merge) must strand neither run files nor open read streams
  Option(org.apache.spark.TaskContext.get()).foreach(
    _.addTaskCompletionListener[Unit] { _ =>
      openRuns.foreach(_.close())
      spillFiles.foreach(_.delete())
    })

  private def offer(heap: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit =
    if (heap.size < k) {
      heap.add(row)
      retainedBytes += row.getSizeInBytes
    } else if (ord.compare(row, heap.peek()) < 0) {
      retainedBytes -= heap.poll().getSizeInBytes
      heap.add(row)
      retainedBytes += row.getSizeInBytes
    }

  private def insertAll(): Unit =
    while (input.hasNext) {
      val row = input.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](k, heapCmp)
        val kc = key.copy()
        heaps.put(kc, heap)
        retainedBytes += kc.getSizeInBytes
      }
      // project to UnsafeRow and copy: the input iterator reuses its
      // buffer, and byte-backed rows are what the spill writer needs
      offer(heap, rowProj(row).copy())
      if (retainedBytes > budgetBytes && heaps.size > 1) spill()
    }

  /** Sorted entries of the live map (unsigned key-byte order — a valid
    * grouping order because byte equality IS key equality). */
  private def sortedEntries(): Array[java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]] = {
    val arr = heaps.entrySet().toArray(
      new Array[java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]](0))
    java.util.Arrays.sort(arr,
      (a: java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]],
       b: java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]) =>
        java.util.Arrays.compareUnsigned(a.getKey.getBytes, b.getKey.getBytes))
    arr
  }

  /** Drain the map to one key-sorted run file and reset the budget. */
  private def spill(): Unit = {
    // place runs in Spark's executor-local dirs (spark.local.dir,
    // disk-usage accounted); tmpdir only when no SparkEnv exists
    val file = Option(org.apache.spark.SparkEnv.get) match {
      case Some(env) => env.blockManager.diskBlockManager.createTempLocalBlock()._2
      case None => java.io.File.createTempFile("graft-topk-spill", ".run")
    }
    spillFiles += file
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(file), 1 << 16))
    try {
      val entries = sortedEntries()
      out.writeInt(entries.length)
      entries.foreach { e =>
        val kb = e.getKey.getBytes
        out.writeInt(kb.length); out.write(kb)
        out.writeInt(e.getValue.size())
        e.getValue.forEach { r =>
          val rb = r.getBytes
          out.writeInt(rb.length); out.write(rb)
        }
      }
    } finally out.close()
    spillCountMetric += 1
    spillBytesMetric += file.length()
    heaps.clear()
    retainedBytes = 0L
  }

  def result(): Iterator[InternalRow] = {
    insertAll()
    import scala.jdk.CollectionConverters._
    if (spillFiles.isEmpty)
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    else {
      // merge the on-disk runs with the in-memory remainder: every
      // run is key-byte-sorted, so equal keys meet at the merge head
      // and their heaps combine under the same k bound
      if (!heaps.isEmpty) spill()
      val runs = spillFiles.map { f =>
        val r = new TopKSpillRun(f, numFields)
        openRuns += r
        r
      }.filter(_.advance())
      new TopKMergeIterator(runs.toSeq, heapCmp, ord, k)
    }
  }
}

/** Streaming reader over one key-sorted spill run. */
private[plans] final class TopKSpillRun(file: java.io.File, numFields: Int) {
  private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
    new java.io.FileInputStream(file), 1 << 16))
  private var closed = false
  private var remaining = in.readInt()
  var curKey: Array[Byte] = _
  var curRows: Array[UnsafeRow] = _

  def close(): Unit = if (!closed) { closed = true; in.close() }

  def advance(): Boolean =
    if (remaining <= 0) { close(); file.delete(); false }
    else {
      remaining -= 1
      val klen = in.readInt()
      curKey = new Array[Byte](klen)
      in.readFully(curKey)
      curRows = Array.fill(in.readInt()) {
        val rlen = in.readInt()
        val b = new Array[Byte](rlen)
        in.readFully(b)
        val r = new UnsafeRow(numFields)
        r.pointTo(b, rlen)
        r
      }
      true
    }
}

/** k-way merge of key-sorted runs, combining per-key heaps. */
private[plans] final class TopKMergeIterator(
    runs: Seq[TopKSpillRun],
    heapCmp: java.util.Comparator[UnsafeRow],
    ord: BaseOrdering,
    k: Int) extends Iterator[InternalRow] {

  private val pq = new java.util.PriorityQueue[TopKSpillRun](
    math.max(1, runs.size),
    (a: TopKSpillRun, b: TopKSpillRun) =>
      java.util.Arrays.compareUnsigned(a.curKey, b.curKey))
  runs.foreach(pq.add)

  private var current: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()

  private def loadNextKey(): Unit = {
    val first = pq.poll()
    if (first == null) return
    // snapshot the key REFERENCE before folding: advance() replaces
    // curKey with a fresh array, so this stays the merge key even
    // after the run moves on
    val mergeKey = first.curKey
    val heap = new java.util.PriorityQueue[UnsafeRow](k, heapCmp)
    def fold(run: TopKSpillRun): Unit = {
      run.curRows.foreach { r =>
        if (heap.size < k) heap.add(r)
        else if (ord.compare(r, heap.peek()) < 0) { heap.poll(); heap.add(r) }
      }
      if (run.advance()) pq.add(run)
    }
    fold(first)
    while (pq.peek() != null &&
      java.util.Arrays.compareUnsigned(pq.peek().curKey, mergeKey) == 0)
      fold(pq.poll())
    current = heap.iterator()
  }

  override def hasNext: Boolean = {
    while (!current.hasNext && pq.peek() != null) loadNextKey()
    current.hasNext
  }

  override def next(): InternalRow = {
    if (!hasNext) throw new NoSuchElementException("empty merge iterator")
    current.next()
  }
}
