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

object VectorExpressions {
  /** Column-level entry point for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(DotProduct(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
