package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * works but higher-order functions are CodegenFallback — every
  * candidate pair in the similarity operators pays interpreted lambda
  * dispatch per element. This expression is the "(b) custom Catalyst
  * Expression" tier of the extension ladder: same left-to-right
  * double summation (bit-identical results), one tight generated
  * loop, stays inside whole-stage codegen.
  *
  * Null handling: null input array ⇒ null result (BinaryExpression
  * default); element nulls are not expected (vectors are dense) and
  * read as 0.0 via ArrayData.getDouble's primitive access.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Fresh names: when both children are non-nullable the generated
      // block is emitted unbraced into the enclosing scope, so fixed
      // local names would collide when one projection holds several
      // DotProducts (withLshBuckets emits 16) and janino would reject
      // the whole stage — silently falling back to interpreted eval.
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Weighted vector-sum aggregate — the block power iteration's
  * workhorse: for a dense `array<double>` column x and J scalar
  * weight expressions w₁..w_J, accumulates the J stacked vectors
  * `Σ_rows wⱼ(row)·x(row)` into ONE aggregate column returning a flat
  * `array<double>` of length J·d (slice j·d..(j+1)·d is direction j).
  *
  * Why an aggregate expression and not J·d `sum(...)` columns: at
  * d = 64, J = 2 that is 128 aggregate expressions — past codegen's
  * field budget, so the whole aggregate drops to the interpreted
  * path AND every one of the 128 columns re-evaluates its
  * `element_at` chain. Here the per-row update is one tight primitive
  * loop over the ArrayData (read each element once, J fused
  * multiply-adds), the buffer is J·d doubles, and partial/final
  * merge is element-wise add — the same left-to-right accumulation
  * order per partition as the column-wise form, so the established
  * round-then-compare determinism discipline is unchanged.
  *
  * Null handling: a null vector or null weight skips the row (dense
  * embedding pipelines never produce them; skipping matches what the
  * column-wise `sum` would do). Ragged vector widths fail loudly.
  */
case class VectorAxpyAgg(vec: Expression, weights: Seq[Expression],
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Double]] {

  require(weights.nonEmpty, "vec_axpy needs at least one weight")

  override def children: Seq[Expression] = vec +: weights
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAxpyAgg =
    copy(vec = newChildren.head, weights = newChildren.tail.toSeq)

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (vecOk && weights.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_axpy expects (array<double>, double...)")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v == null) return buffer
    val ws = new Array[Double](weights.length)
    var j = 0
    while (j < ws.length) {
      val w = weights(j).eval(input)
      if (w == null) return buffer
      ws(j) = w.asInstanceOf[Double]
      j += 1
    }
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer == null) new Array[Double](n * ws.length)
      else {
        require(buffer.length == n * ws.length,
          s"vec_axpy: ragged vector width $n vs ${buffer.length / ws.length}")
        buffer
      }
    var k = 0
    while (k < n) {
      val x = arr.getDouble(k)
      j = 0
      while (j < ws.length) { buf(j * n + k) += ws(j) * x; j += 1 }
      k += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a == null) b
    else if (b == null) a
    else {
      require(a.length == b.length, "vec_axpy: ragged partial buffers")
      var k = 0
      while (k < a.length) { a(k) += b(k); k += 1 }
      a
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
      bb.asDoubleBuffer().put(buffer)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val out = new Array[Double](bytes.length / 8)
      java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
      out
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAxpyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAxpyAgg =
    copy(inputAggBufferOffset = newOffset)
}

object VectorExpressions {
  /** Column-level entry point for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(DotProduct(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Column-level entry point for [[VectorAxpyAgg]]: one aggregate
    * column holding `[Σw₁·x ; Σw₂·x ; …]` flattened. */
  def vec_axpy(vec: Column, weights: Column*): Column =
    GraftSqlBridge.toColumn(VectorAxpyAgg(
      GraftSqlBridge.toExpression(vec),
      weights.map(GraftSqlBridge.toExpression)).toAggregateExpression())
}
