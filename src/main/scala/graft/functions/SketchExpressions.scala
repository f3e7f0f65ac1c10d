package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values (KMV) distinct-count sketch aggregate.
  *
  * Keeps the `k` smallest DISTINCT values of a `long` hash column per
  * group — fixed-size state (≤ k longs), associative merge, one pass:
  * the same scale contract as HyperLogLog (`approx_count_distinct`),
  * which is what makes either sketch affordable where an exact
  * `count_distinct` would shuffle every distinct value at 100 TB.
  *
  * Why it exists next to HLL: Spark's HLL sketch is engine-internal,
  * so `llm_approx_distinct` can only get a rows-only driver check.
  * KMV over the engine-neutral [[Hashing.md5i32]] hash is exactly
  * replayable in ANSI SQL (`row_number() ≤ k` over distinct hashes),
  * so the sketch CONTENTS — not just a tolerance band — are
  * differentially checked against DuckDB. Estimator (Bar-Yossef et
  * al. 2002; Beyer et al. 2007 "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations"): with hashes uniform on
  * [0, M) and hₖ the k-th smallest, the distinct count ≈ (k−1)·M/hₖ;
  * below k distinct values the sketch IS the exact answer. Standard
  * error ~1/√k (k = 256 ⇒ ~6 %).
  *
  * The aggregate returns the sorted minima themselves (ascending
  * `array<long>`), not the estimate: the array is what merges across
  * groups (union cardinality = merge arrays, re-truncate to k) and
  * what the SQL oracle can reproduce verbatim; callers derive the
  * estimate with integer arithmetic in-plan ([[KMinValues.kmvEstimate]]).
  *
  * Determinism: the retained set is a pure function of the input
  * VALUE set — dedup before truncation means row order, partitioning,
  * and merge order cannot change the result (unlike e.g. a sampled
  * top-k). Null inputs are skipped, the empty group evals to an empty
  * array.
  */
case class KMinValuesAgg(child: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"k_min_values needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinValuesAgg =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_values expects a bigint hash column, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // bounded insert: below capacity always add; at capacity only a
    // value strictly below the current max can displace it
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValuesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValuesAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** Value-carrying sibling of [[KMinValuesAgg]]: keeps the `k`
  * lexicographically-smallest DISTINCT `(hash, value)` pairs per
  * group — i.e. a bounded uniform sample of rows (smallest hashes)
  * with a payload value riding along. Same scale contract (≤ k pairs
  * of state, associative merge, one pass) and the same oracle story:
  * over the engine-neutral md5 hash the retained pairs replay as
  * `row_number() ≤ k` over `ORDER BY h, v`, so a quantile estimated
  * from the sample is differentially checkable bit-for-bit —
  * the sketch route to windowed quantiles where Spark's own
  * `approx_percentile` (also bounded-state) is engine-internal and
  * rows-only checkable. Determinism: dedup-before-truncate on the
  * PAIR ordering, so row order, partitioning, and merge order cannot
  * change the retained set. */
case class KMinByHashAgg(hash: Expression, value: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]] {

  require(k >= 2, s"k_min_by_hash needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(hash, value)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinByHashAgg =
    copy(hash = newChildren(0), value = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType &&
        value.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_by_hash expects (bigint hash, double value), got " +
        s"(${hash.dataType.simpleString}, ${value.dataType.simpleString})")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](
      implicitly[Ordering[(Long, Double)]])

  private def add(buf: java.util.TreeSet[(Long, Double)],
                  p: (Long, Double)): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (implicitly[Ordering[(Long, Double)]].lt(p, buf.last)) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Double)],
                      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      add(buf, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(a: java.util.TreeSet[(Long, Double)],
                     b: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, Double)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (h, v) = it.next()
      out(i) = InternalRow(h, v)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (h, v) = it.next(); bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.add((bb.getLong, bb.getDouble))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinByHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinByHashAgg =
    copy(inputAggBufferOffset = newOffset)
}

object KMinValues {
  /** Hash domain of [[Hashing.md5i32]]: unsigned 32-bit. */
  val HashDomain: Long = 1L << 32

  /** Column-level entry point: the sorted k smallest distinct values
    * of a `bigint` column, as `array<long>`. */
  def k_min_values(hash: Column, k: Int): Column =
    GraftSqlBridge.toColumn(KMinValuesAgg(
      GraftSqlBridge.toExpression(hash), k).toAggregateExpression())

  /** Column-level entry point for [[KMinByHashAgg]]: the k
    * lexicographically-smallest distinct `(hash, value)` pairs, as
    * a sorted `array<struct<h:bigint,v:double>>`. */
  def k_min_by_hash(hash: Column, value: Column, k: Int): Column =
    GraftSqlBridge.toColumn(KMinByHashAgg(
      GraftSqlBridge.toExpression(hash),
      GraftSqlBridge.toExpression(value), k).toAggregateExpression())

  /** Distinct-count estimate from a KMV array over the md5i32 domain:
    * exact size when the sketch is below capacity, else
    * `(k−1)·2³² div hₖ` — pure integer arithmetic, so Spark and the
    * SQL oracle agree bit-for-bit. */
  def kmvEstimate(kmv: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val hk = element_at(kmv, k)
    val quot = GraftSqlBridge.toColumn(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.catalyst.expressions.Literal((k - 1).toLong * HashDomain),
        GraftSqlBridge.toExpression(hk)))
    when(size(kmv) < k, size(kmv).cast("long")).otherwise(quot)
  }
}
