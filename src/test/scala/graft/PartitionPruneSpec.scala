package graft

import graft.sources.Ingest
import org.scalatest.funsuite.AnyFunSuite

class PartitionPruneSpec extends AnyFunSuite with SparkSpec {

  test("month filter on the partitioned snapshot prunes to one directory") {
    import spark.implicits._
    val probe = Ingest.partitionedOrders(spark, sf)
      .filter($"o_month" === "1996-06")
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scan.nonEmpty, "no file scan in plan")
    // the predicate must land in PartitionFilters (directory pruning
    // before IO), not DataFilters (per-row evaluation after reading)
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "o_month")),
      s"o_month not a partition filter: ${scan.get.partitionFilters}")
    assert(scan.get.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.get.selectedPartitions.partitionCount}")
  }

  test("partitioned layout is lossless vs the raw table") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val part = Ingest.partitionedOrders(spark, sf)
      .agg(count(lit(1)), sum($"o_orderkey")).head()
    val raw = graft.sources.Tables.orders(spark, sf)
      .agg(count(lit(1)), sum($"o_orderkey")).head()
    assert(part == raw)
  }
}
