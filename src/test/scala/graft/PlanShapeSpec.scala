package graft

import graft.operators.{Relational, TimeSeries}
import graft.sources.Ingest
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards for the round-5 join decompositions:
  * the rewrites exist to AVOID a specific bad physical plan, so a
  * silent regression back to it must fail the build, not just slow
  * the bench. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  test("range join plans a hash/merge equi-join, never a nested loop") {
    val plan = TimeSeries.rangeJoinWeekly(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucket decomposition regressed to a cartesian plan:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join on the bucket key:\n$plan")
  }

  test("fuzzy join plans equi-joins only — no cartesian block") {
    val plan = Relational.fuzzyJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"wildcard blocking regressed to a cartesian plan:\n$plan")
  }

  test("bm25 plans array scans — no explode, no corpus-keyed shuffle") {
    val qe = graft.operators.TextAnalytics.bm25(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // per-term tf is size(filter(...)) in ONE projection: an explode
    // (Generate) would put a corpus×terms intermediate on the wire
    assert(!plan.contains("Generate"),
      s"bm25 regressed to a per-term explode:\n$plan")
    // the only exchange is the 1-row stats aggregate + the broadcast
    // back + the top-k: nothing hash-partitions the corpus
    assert(!plan.contains("hashpartitioning"),
      s"bm25 shuffles the corpus:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k is not a bounded TakeOrdered:\n$plan")
    // the per-term tf kernel is the codegen'd CountTokenEq — nothing
    // in the physical plan may run as an interpreted CodegenFallback
    // (the HOF filter() form it replaced was one)
    val fallbacks = qe.executedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback => e
      })
    }.flatten
    assert(fallbacks.isEmpty,
      s"bm25 plan contains interpreted expressions: ${fallbacks.map(_.getClass.getSimpleName).distinct}")
  }

  test("z-order box predicates push down to the parquet scan") {
    import spark.implicits._
    val probe = Ingest.zorderedLineitem(spark, sf)
      .filter($"l_partkey".between(100, 140) && $"l_suppkey".between(2, 6))
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
    assert(scan.nonEmpty, "no file scan in plan")
    val pushed = scan.get.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_partkey") && pushed.contains("l_suppkey"),
      s"box filters not pushed: $pushed")
  }
}
