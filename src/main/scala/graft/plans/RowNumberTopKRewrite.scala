package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer tier of the extension ladder (`Rule[LogicalPlan]`,
  * registered by [[graft.functions.GraftExtensions]]): rewrite the
  * ubiquitous per-key top-k idiom
  *
  * {{{
  *   SELECT <cols>                       -- rank projected AWAY
  *   FROM (SELECT *, row_number() OVER
  *           (PARTITION BY p ORDER BY o) AS rn FROM t)
  *   WHERE rn <= k                       -- plus optional residuals
  * }}}
  *
  * into the native [[TopKPerKey]] plan, so ANY caller writing plain
  * window SQL gets the heap-based operator — bounded k-row heaps,
  * zero SortExec — without code changes. Spark's own
  * `InferWindowGroupLimit` (3.5+) already shrinks the shuffle for
  * this pattern, but both of its limit stages and the final Window
  * pass still run behind full per-partition sorts; this rewrite
  * removes the sorts entirely (see [[TopKPerKey]] for the honest
  * comparison and the spill contract).
  *
  * The rewrite fires only when it is provably safe:
  *  - the Window computes exactly ONE expression, a bare
  *    `row_number()` (rank/dense_rank keep ties and need the sort);
  *  - the filter bounds that attribute by a literal (`<= k`, `< k`,
  *    `= 1`, reversed forms), any residual conjuncts reference only
  *    the window's input and are deterministic (as is the
  *    projection — a `rand()` residual re-evaluated over the
  *    operator's reduced row set would change results);
  *  - the rank attribute is projected away (the operator does not
  *    emit a rank column);
  *  - the partition spec is non-empty (a global top-k is already
  *    TakeOrderedAndProject territory) and the order spec non-empty.
  *
  * Both routes break ties arbitrarily when the order is not total, so
  * the rewrite never changes a deterministic result. A
  * `WindowGroupLimit` Spark already inserted below the Window for the
  * same spec is stripped — the native operator subsumes it.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window)) =>
      rewrite(projectList, cond, w).getOrElse(p)
  }

  private def rewrite(projectList: Seq[NamedExpression], cond: Expression,
                      w: Window): Option[LogicalPlan] = {
    val rankAttr = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) =>
        Some(a.toAttribute)
      case _ => None
    }
    rankAttr.flatMap { rank =>
      val (limits, residual) =
        splitConjunctivePredicates(cond).partition(limitOf(_, rank).isDefined)
      val k = limits match {
        case Seq(one) => limitOf(one, rank)
        case _ => None // zero (no bound) or conflicting bounds: leave as-is
      }
      k.filter(_ >= 1)
        .filter(_ => w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty)
        .filter(_ => residual.forall(_.references.subsetOf(w.child.outputSet)))
        .filter(_ => projectList.forall(_.references.subsetOf(w.child.outputSet)))
        // moving a nondeterministic residual below/above the window
        // (or re-evaluating a nondeterministic projection over a
        // differently-ordered row set) changes results — the same
        // guard Catalyst's own predicate-movement rules apply
        .filter(_ => residual.forall(_.deterministic))
        .filter(_ => projectList.forall(_.deterministic))
        .map { k =>
          // strip Spark's own group-limit for the SAME spec: the
          // native operator replaces exactly that work
          val child = w.child match {
            case wgl: WindowGroupLimit
              if wgl.partitionSpec == w.partitionSpec &&
                wgl.orderSpec == w.orderSpec && wgl.limit >= k => wgl.child
            case c => c
          }
          // ColumnPruning cannot see through a custom node: prune the
          // input to the attributes the result, keys, order, and
          // residuals actually need
          val needed = AttributeSet(
            projectList.flatMap(_.references) ++
              w.partitionSpec.flatMap(_.references) ++
              w.orderSpec.flatMap(_.references) ++
              residual.flatMap(_.references))
          val pruned =
            if (needed == child.outputSet) child
            else Project(child.output.filter(needed.contains), child)
          val topk = TopKPerKey(w.partitionSpec, w.orderSpec, k, pruned)
          Project(projectList,
            residual.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
        }
    }
  }

  /** The k bound a single predicate puts on the rank attribute, if
    * it is one of the recognized literal shapes. */
  private def limitOf(e: Expression, rank: Attribute): Option[Int] = e match {
    case LessThanOrEqual(r: AttributeReference, Literal(v: Int, IntegerType))
      if r.exprId == rank.exprId => Some(v)
    case LessThan(r: AttributeReference, Literal(v: Int, IntegerType))
      if r.exprId == rank.exprId => Some(v - 1)
    case EqualTo(r: AttributeReference, Literal(v: Int, IntegerType))
      if r.exprId == rank.exprId && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), r: AttributeReference)
      if r.exprId == rank.exprId => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), r: AttributeReference)
      if r.exprId == rank.exprId => Some(v - 1)
    case EqualTo(Literal(v: Int, IntegerType), r: AttributeReference)
      if r.exprId == rank.exprId && v == 1 => Some(1)
    case _ => None
  }
}
