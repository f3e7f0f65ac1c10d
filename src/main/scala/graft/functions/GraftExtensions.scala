package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions entry point: registers the library's custom
  * expressions with the SQL function registry, so a session built
  * with
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  * (or `spark.sql.extensions=graft.functions.GraftExtensions`) can
  * call them from SQL — `SELECT dot_product(a, b)` — as well as from
  * the typed Column API ([[VectorExpressions.dot_product]]).
  *
  * Also registers the whole-operator tier: the
  * [[graft.plans.RowNumberTopKRewrite]] optimizer rule upgrades plain
  * `row_number() <= k` window-filter SQL to the native heap-based
  * [[graft.plans.TopKPerKey]] plan, and the matching planner strategy
  * makes the logical node executable.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RowNumberTopKRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingles(tokens, n) takes exactly 2 arguments")
        val n = litInt(args(1), "shingles n")
        require(n >= 1, s"shingles n must be >= 1, got $n")
        Shingles(args.head, n)
      }))
    e.injectFunction((
      new FunctionIdentifier("md5_i32"),
      new ExpressionInfo(classOf[Md5Int32].getName, "md5_i32"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "md5_i32(value, prefix[, offset]) takes 2 or 3 arguments")
        val prefix = args(1) match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"md5_i32 prefix must be a string literal, got $other")
        }
        val offset = if (args.length == 3) litInt(args(2), "md5_i32 offset") else 0
        // md5 digests are 16 bytes; a 4-byte read needs offset <= 12
        require(offset >= 0 && offset <= 12,
          s"md5_i32 offset must be in [0, 12], got $offset")
        Md5Int32(args.head, prefix, offset)
      }))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_intersect_count takes exactly 2 arguments")
        SortedIntersectCount(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName,
        "sorted_intersect"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_intersect takes exactly 2 arguments")
        SortedIntersect(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("count_token_eq"),
      new ExpressionInfo(classOf[CountTokenEq].getName, "count_token_eq"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "count_token_eq(tokens, term) takes exactly 2 arguments")
        val term = args(1) match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"count_token_eq term must be a string literal, got $other")
        }
        CountTokenEq(args.head, term)
      }))
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(i: Int, _) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
