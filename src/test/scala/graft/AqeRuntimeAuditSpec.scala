package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** RUNTIME (post-adaptive) plan audit — round-11 verdict item 4.
  *
  * [[PlanAuditSpec]] audits the STATIC plan with AQE off (the
  * conservative tree: AQE only removes work). This spec closes the
  * other half of the story: it EXECUTES the heaviest catalog queries
  * with AQE on — the bench and cluster posture — and then walks the
  * final adaptive plan (`AdaptiveSparkPlanHelper` descends through
  * `AdaptiveSparkPlanExec` / query-stage boundaries to the tree that
  * actually ran) asserting the invariants that only exist at runtime:
  *
  *  1. NO SPILLS: every operator's `spillSize` metric is 0. A
  *     broadcast the runtime re-planned into a spilling sort-merge
  *     join, or a hash aggregate that outgrew its partition, shows up
  *     here and nowhere in the static tree. (At test scale a spill is
  *     always a plan bug, never a capacity fact.)
  *  2. BOUNDED BROADCASTS: every `BroadcastExchangeExec` that ran
  *     reports `dataSize` ≤ 64 MB — a corpus-sized frame riding a
  *     stale broadcast hint would pass the static audit (hints are
  *     name-blind) but trip this as soon as real bytes flow.
  *  3. NO RUNTIME CARTESIANS: the adaptive re-plan may swap join
  *     strategies; a data×data `CartesianProduct` /
  *     `BroadcastNestedLoopJoin` materializing MORE rows than the
  *     product of the library's documented 1-row/probe-set bounds
  *     (`numOutputRows` > the cap) means a bounded-side contract was
  *     violated at runtime.
  *
  * Scope: the ~20 heaviest catalog entries by the committed prior
  * bench (they own >60 % of catalog wall time and every iterative /
  * join-heavy shape in the library), executed at the suite's sf. The
  * skew-split engagement assertion lives in [[PlanShapeSpec]] (it
  * needs a purpose-built skewed fixture, not the corpus).
  */
class AqeRuntimeAuditSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {

  /** Top of BENCH_prior.json (round-11 clean best-of-3), minus the
    * multimodal codec entry whose wall time is decode, not plan. */
  private val heaviest = Seq(
    "rel_graph_cc_contract", "rel_graph_ppr", "rel_graph_cc",
    "rel_pagerank_actors", "rel_pagerank_weighted", "rel_fuzzy_join",
    "rel_graph_modularity", "llm_approx_distinct_bound",
    "llm_split_leakage", "rel_graph_lpa", "rel_market_basket",
    "rel_entity_clusters", "rel_graph_clustering_coeff",
    "rel_join_revenue_segment", "rel_graph_link_predict",
    "rel_triangle_count", "rel_fd_audit", "rel_quantile_bound",
    "rel_concurrency_peak", "llm_langid_chargram",
    "rel_referential_integrity", "llm_semdedup_atscale")

  /** The `dataSize` metric of a broadcast hash relation includes the
    * map's PREALLOCATED page space — empirically a flat 64 MiB floor
    * on this Spark build (every tiny probe/rank broadcast in the
    * catalog reports 67,108,864 + a few KB of real rows). The cap is
    * therefore floor + 64 MiB of actual payload: tight enough that a
    * corpus-sized frame riding a stale broadcast hint at suite sf
    * still trips it, loose enough that the allocator floor never
    * false-positives. */
  private val BroadcastCapBytes = 128L * 1024 * 1024
  /** numOutputRows cap for an unbounded-looking product node: the
    * library's 1-row-aggregate re-entries emit ≤ |other side| rows and
    * the knn probe set is ≤ 64 probes × k — 1e6 is an order of
    * magnitude above anything legitimate at suite sf. */
  private val ProductRowsCap = 1000000L

  /** Execute and return every node of the FINAL adaptive tree,
    * including exchange/stage-reused subtrees. The action MUST drive
    * the dataframe's OWN QueryExecution: a `write` (even noop) wraps
    * the logical plan in a NEW command QueryExecution, leaving
    * `df.queryExecution` un-executed — its adaptive plan would still
    * be the initial tree with all metrics zero, and every runtime
    * assertion would pass vacuously. `collect()` executes exactly the
    * plan this spec then walks (suite sf keeps results tiny). */
  private def ranPlan(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    collect(df.queryExecution.executedPlan) { case p => p }
  }

  // one execution sweep shared by the assertions
  private lazy val swept: Map[String, Seq[SparkPlan]] =
    heaviest.map { name =>
      name -> ranPlan(SparkEntry.queries(name)(spark, sf))
    }.toMap

  test("runtime audit covers only registered catalog entries") {
    val unknown = heaviest.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"audited but unregistered: $unknown")
  }

  test("the walked trees really ran: metrics are populated, not zero") {
    // guards the audit itself against the vacuous-pass failure mode
    // (walking an un-executed adaptive plan whose metrics are all 0)
    val dead = swept.collect { case (name, nodes)
      if !nodes.exists(_.metrics.get("numOutputRows").exists(_.value > 0)) =>
      name
    }.toSeq.sorted
    assert(dead.isEmpty, s"queries whose walked plan shows no executed rows: $dead")
  }

  test("no operator spilled at runtime in any heavy query") {
    val spills = swept.toSeq.flatMap { case (name, nodes) =>
      nodes.flatMap(n => n.metrics.get("spillSize")
        .filter(_.value > 0)
        .map(m => s"$name/${n.nodeName}=${m.value}"))
    }
    assert(spills.isEmpty, s"runtime spills: $spills")
  }

  test("every broadcast that ran stayed under the size cap") {
    val fat = swept.toSeq.flatMap { case (name, nodes) =>
      nodes.collect {
        case b: BroadcastExchangeExec
          if b.metrics.get("dataSize").exists(_.value > BroadcastCapBytes) =>
          s"$name=${b.metrics("dataSize").value}B"
      }
    }
    assert(fat.isEmpty, s"oversized runtime broadcasts: $fat")
  }

  test("no product node materialized unbounded rows at runtime") {
    val offenders = swept.toSeq.flatMap { case (name, nodes) =>
      nodes.collect {
        case j: BroadcastNestedLoopJoinExec
          if j.metrics.get("numOutputRows").exists(_.value > ProductRowsCap) =>
          s"$name/nlj=${j.metrics("numOutputRows").value}"
        case c: CartesianProductExec
          if c.metrics.get("numOutputRows").exists(_.value > ProductRowsCap) =>
          s"$name/cartesian=${c.metrics("numOutputRows").value}"
      }
    }
    assert(offenders.isEmpty, s"runtime products past the row cap: $offenders")
  }
}
