package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the library's custom
  * expressions with the SQL function registry, so a session built
  * with
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  * (or `spark.sql.extensions=graft.functions.GraftExtensions`) can
  * call them from SQL — `SELECT dot_product(a, b)` — as well as from
  * the typed Column API ([[VectorExpressions.dot_product]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
  }
}
