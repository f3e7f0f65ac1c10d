package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 moved the classic `new Column(expr)` / `col.expr` surface
  * behind `private[sql]` (`classic.ExpressionUtils`); extension
  * libraries shipping custom Catalyst `Expression`s (our codegen'd
  * `DotProduct`) still need the conversion, and placing one tiny
  * bridge object in the sql package is the established pattern for
  * that — no Spark internals are modified or shadowed.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
