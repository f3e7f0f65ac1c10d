package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit (round-10 verdict item 3): the
  * per-query guards in [[PlanShapeSpec]] pin the plans whose rewrites
  * were hand-fought; THIS spec sweeps EVERY `SparkEntry.queries`
  * entry and asserts the global invariants no query may silently
  * regress out of. The invariants are STRUCTURAL, not a name list:
  *
  *  1. a `CartesianProduct` / `BroadcastNestedLoopJoin` is legal only
  *     when its build (resp. either) side is provably bounded from
  *     the plan itself — a no-grouping aggregate (exactly 1 row), a
  *     literal local table, or a limit/top-k — i.e. the library's
  *     documented "1-row aggregate re-entry" idiom. A data×data
  *     product has no bounded side and fails.
  *  2. a whole-frame `Window` (empty partitionSpec ⇒ single
  *     partition) is legal only over an already-aggregated or
  *     limit-bounded frame — the window may collapse an AGGREGATE to
  *     one partition (day series, digit spines, per-key rollups ≪
  *     corpus), never a raw scan.
  *  3. the residual NAME whitelist — entries the plan shape alone
  *     cannot prove bounded — must stay exact: stale entries fail.
  *
  * The audit builds plans with AQE off (the bm25-guard precedent:
  * `AdaptiveSparkPlanExec` is a leaf to `collect`, so the real
  * operator tree is only traversable pre-adaptive; AQE only ever
  * REMOVES work at runtime, so the static tree is the conservative
  * one to audit).
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  /** Queries whose nested-loop/cartesian build side is bounded by
    * DATA semantics the plan cannot show — value = why. (The title
    * probes, forecast/PCA/spectrum 1-row re-entries, and sketch-merge
    * frames all PROVE bounded structurally and need no entry here.) */
  private val knnProbeNote =
    "build side is the probe set `vec_id < NumProbes` (a literal range " +
      "over dense ids, ≤ NumProbes rows) broadcast against the corpus — " +
      "the documented serve shape (Similarity.scala); the plan cannot " +
      "see the id density that bounds the filter"
  private val nestedLoopOk: Map[String, String] = Map(
    "llm_knn_exact" -> knnProbeNote,
    "llm_knn_ivf_persisted" -> knnProbeNote,
    "llm_knn_ivfpq" -> knnProbeNote,
    "llm_knn_label_eval" -> knnProbeNote,
    "llm_knn_negatives" -> knnProbeNote,
    "llm_knn_pq" -> knnProbeNote,
    "llm_knn_pq_refine" -> knnProbeNote,
    "llm_knn_recall" -> knnProbeNote,
    "llm_knn_sq" -> knnProbeNote,
    "rel_ab_test" ->
      ("build side aggregates by arm = md5 % 2 with an arm = 1 filter " +
        "below: exactly one group row (Relational ab-test Welch frame)"),
    "rel_chi_square" ->
      ("build side is the distinct event-type frame: grouping key's " +
        "data domain is the handful of event types, ≪ broadcast cap"),
    "rel_seasonal_anomaly" ->
      ("build side keys on day-of-week/effect frames: ≤ 7 grouped rows " +
        "re-entering the daily series"),
    "llm_kmv_overlap" ->
      ("build side is the per-source KMV sketch frame: |sources| rows " +
        "of ≤ k-minima state each, the sketch-algebra broadcast")
  )

  /** Queries with a whole-frame window over a non-aggregate child
    * that is still bounded — value = the bound. */
  private val globalWindowOk: Map[String, String] = Map(
    "rel_bootstrap_ci" ->
      ("window over the resample grid: |resamples| × calendar-days " +
        "rows, both literals/aggregates — bounded, but the grid is " +
        "built by a Generate the shape rule does not look through")
  )

  // -- structural boundedness ---------------------------------------

  /** Descend through caching/reuse indirections so the audit sees the
    * real subtree, not an opaque leaf. */
  private def inner(p: SparkPlan): Seq[SparkPlan] = p match {
    case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
    case r: ReusedExchangeExec => Seq(r.child)
    case _ => p.children
  }

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: inner(p).flatMap(walk)

  /** A subtree that provably produces a bounded row count: a global
    * (no-grouping) aggregate is exactly 1 row; a literal local table
    * is as big as its literal list; limits/top-k are their k. Unions
    * and joins of bounded frames stay bounded; explodes in this
    * library expand literal grids / ≤k sketch arrays (module
    * contracts pin corpus-keyed collect_list to zero), so they pass
    * through. Anything reaching a scan or a keyed aggregate is NOT
    * bounded. */
  private def bounded(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
    case l: LocalTableScanExec => l.rows.size <= 64
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec => true
    case u: UnionExec => u.children.forall(bounded)
    case j if j.nodeName.contains("Join") => inner(j).exists(bounded)
    case other =>
      val kids = inner(other)
      kids.nonEmpty && kids.forall(bounded)
  }

  private def nljOffense(p: SparkPlan): Boolean = p match {
    case j: BroadcastNestedLoopJoinExec =>
      val build = j.buildSide match {
        case BuildRight => j.right
        case BuildLeft => j.left
      }
      !bounded(build)
    case c: CartesianProductExec =>
      !bounded(c.left) && !bounded(c.right)
    case _ => false
  }

  private def windowOffense(p: SparkPlan): Boolean = p match {
    case w: WindowExec if w.partitionSpec.isEmpty =>
      // the whole-frame window must sit over an aggregate/limit —
      // "single partition" is then ≤ the aggregate's key cardinality,
      // never the corpus
      !walk(w.child).exists {
        case a: BaseAggregateExec => true
        case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
        case _ => false
      }
    case _ => false
  }

  // one sweep, shared by the tests
  private lazy val audited: Map[String, (Int, Int)] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries.map { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val nodes = walk(plan)
      name -> (nodes.count(nljOffense), nodes.count(windowOffense))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("every cartesian/nested-loop join has a provably bounded side") {
    val offenders = audited.collect {
      case (n, (nlj, _)) if nlj > 0 && !nestedLoopOk.contains(n) => n
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"data×data nested-loop/cartesian plans: $offenders")
  }

  test("every whole-frame window sits over an aggregated frame") {
    val offenders = audited.collect {
      case (n, (_, w)) if w > 0 && !globalWindowOk.contains(n) => n
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"whole-frame windows over non-aggregated frames: $offenders")
  }

  test("residual whitelists carry no stale entries") {
    val staleNlj = nestedLoopOk.keySet.filter(n =>
      audited.get(n).exists(_._1 == 0))
    val staleWin = globalWindowOk.keySet.filter(n =>
      audited.get(n).exists(_._2 == 0))
    val unknown = (nestedLoopOk.keySet ++ globalWindowOk.keySet)
      .diff(audited.keySet)
    assert(staleNlj.isEmpty && staleWin.isEmpty && unknown.isEmpty,
      s"stale nested-loop entries: $staleNlj; stale window entries: " +
        s"$staleWin; whitelisted but unregistered: $unknown")
  }
}
