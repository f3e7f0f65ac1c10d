package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit (round-10 verdict item 3): the
  * per-query guards in [[PlanShapeSpec]] pin the plans whose rewrites
  * were hand-fought; THIS spec sweeps EVERY `SparkEntry.queries`
  * entry and asserts the global invariants no query may silently
  * regress out of:
  *
  *  1. no `CartesianProduct` / `BroadcastNestedLoopJoin` anywhere in
  *     the plan, except queries on the enumerated whitelist — each a
  *     documented ≤1-row (or ≤k-literal-row) broadcast re-entry of a
  *     driver-bounded aggregate, never a data×data product;
  *  2. no whole-frame `Window` (empty partitionSpec ⇒ all rows on one
  *     partition) except over the enumerated provably-bounded frames
  *     (calendar-day counts, ≤k-row aggregates, grid literals);
  *  3. whitelists carry NO stale entries: an entry whose plan no
  *     longer contains the flagged node fails the audit too, so the
  *     whitelist shrinks with the code instead of fossilizing.
  *
  * The audit builds plans with AQE off (the bm25-guard precedent:
  * `AdaptiveSparkPlanExec` is a leaf to `collect`, so the real
  * operator tree is only traversable pre-adaptive; AQE only ever
  * REMOVES exchanges at runtime, so the static tree is the
  * conservative one to audit).
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  /** Queries whose plan may contain BroadcastNestedLoopJoin or
    * CartesianProduct — value = why that is bounded. */
  private val nestedLoopOk: Map[String, String] = Map(
    "ref_title_levels" ->
      "1-row broadcast probe (the searched title's actor set) joined θ-style against the movies view — ReferenceQueries.scala",
    "ref_title_levels_bucketed" ->
      "same 1-row probe re-entry over the bucketed movies snapshot",
    "ref_title_dup_probe" ->
      "same 1-row probe path, duplicate-title fixture",
    "ref_title_missing" ->
      "same 1-row probe path, miss ⇒ empty result",
    "rel_forecast_baseline" ->
      "1-row fitted-coefficients frame crossJoined back onto the ≤calendar-days daily frame — TimeSeries.scala",
    "rel_forecast_discount" ->
      "1-row what-if coefficient frame, same re-entry",
    "rel_ab_test" ->
      "two 1-row arm aggregates crossJoined for the Welch statistic",
    "rel_seasonal_decompose" ->
      "1-row grand-mean frame broadcast back over the daily frame",
    "rel_seasonal_anomaly" ->
      "decomposition residual path shares the 1-row grand-mean re-entry",
    "rel_revenue_bootstrap_ci" ->
      "1-row (n, seed) frame crossJoined to the resample index literals",
    "llm_embed_pca" ->
      "1-row moment aggregate (mean vector) re-entered over the corpus",
    "llm_embed_spectrum" ->
      "1-row Rayleigh-coefficient frame per block-iteration round",
    "llm_embed_qa" ->
      "1-row corpus-moment frame re-entered for the per-dim z audit"
  )

  /** Queries whose plan may contain a whole-frame Window — value =
    * the bound on the windowed frame. */
  private val globalWindowOk: Map[String, String] = Map(
    "rel_benford_audit" ->
      "share-of-total over the 9-row digit spine",
    "rel_pareto_abc" ->
      "running share over the ≤customers aggregate — bounded by the Pareto cut output, and range-sorted upstream",
    "rel_concurrency_peak" ->
      "carry-in prefix over the ≤calendar-days per-day frame (documented in TimeSeries.scala:391)",
    "rel_revenue_drawdown" ->
      "running max over the ≤calendar-days daily revenue frame",
    "rel_gini_revenue" ->
      "Lorenz rank over the per-customer aggregate (≤customers rows after the one corpus scan; acceptable at the 15k-customer dim — documented in PlanShapeSpec gini pin)"
  )

  // one sweep, shared by the tests: query name -> (plan string,
  // empty-partition window count)
  private lazy val audited: Map[String, (String, Int)] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries.map { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val globalWindows = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.length
      name -> (plan.toString, globalWindows)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def hasNlj(s: String): Boolean =
    s.contains("CartesianProduct") || s.contains("BroadcastNestedLoopJoin")

  test("no cartesian/nested-loop join outside the bounded-probe whitelist") {
    val offenders = audited.collect {
      case (n, (s, _)) if hasNlj(s) && !nestedLoopOk.contains(n) => n
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"unwhitelisted nested-loop/cartesian plans: $offenders\n" +
        offenders.headOption.map(n => audited(n)._1.take(2000)).getOrElse(""))
  }

  test("no whole-frame window outside the bounded-frame whitelist") {
    val offenders = audited.collect {
      case (n, (_, w)) if w > 0 && !globalWindowOk.contains(n) => n
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"unwhitelisted whole-frame windows: $offenders\n" +
        offenders.headOption.map(n => audited(n)._1.take(2000)).getOrElse(""))
  }

  test("whitelists carry no stale entries") {
    val staleNlj = nestedLoopOk.keySet.filter(n =>
      audited.get(n).exists(p => !hasNlj(p._1)))
    val staleWin = globalWindowOk.keySet.filter(n =>
      audited.get(n).exists(_._2 == 0))
    val unknown = (nestedLoopOk.keySet ++ globalWindowOk.keySet)
      .diff(audited.keySet)
    assert(staleNlj.isEmpty && staleWin.isEmpty && unknown.isEmpty,
      s"stale nested-loop entries: $staleNlj; stale window entries: " +
        s"$staleWin; whitelisted but unregistered: $unknown")
  }
}
