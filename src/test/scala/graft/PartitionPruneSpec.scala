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

  test("dim join prunes the month partitions DYNAMICALLY (DPP fired)") {
    import spark.implicits._
    // AQE wraps stages in AdaptiveSparkPlanExec (opaque to collect);
    // DPP is an optimizer/physical-planning rewrite, so pin the plan
    // statically for inspection
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try dppBody() finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def dppBody(): Unit = {
    import spark.implicits._
    val df = Ingest.dppSnapshot(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // the month-partitioned fact scan must carry a runtime pruning
    // subquery — no literal month predicate exists at plan time
    val factScan = scans.find(_.partitionFilters.nonEmpty)
    assert(factScan.nonEmpty, s"no partition-filtered scan:\n$scans")
    assert(factScan.get.partitionFilters.mkString.contains("dynamicpruning"),
      s"DPP did not fire: ${factScan.get.partitionFilters}")
    // and it actually skipped directories at RUNTIME: the executed
    // scan's partition metric (post-dynamic-filter) < total months
    // (selectedPartitions is the static pre-filter listing)
    val total = Ingest.partitionedOrders(spark, sf)
      .select($"o_month").distinct().count()
    val read = factScan.get.metrics("numPartitions").value
    assert(read < total, s"scan read all $total partitions — nothing pruned")
    assert(rows.length.toLong == read, "one output row per surviving month")
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

  test("compaction plan: files right-sized, contiguous, lossless") {
    import spark.implicits._
    val target = graft.sources.Ingest.CompactTargetRows
    val plan = graft.sources.Ingest.compactionPlan(spark, sf)
      .as[(Long, Long, Long, java.sql.Date, java.sql.Date)].collect()
    // lossless: planned rows == table rows; file ids contiguous from 0
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(plan.map(_._3).sum == total)
    assert(plan.map(_._1).toSeq == plan.indices.map(_.toLong))
    // right-sized: days never split, so a file can miss the target
    // by at most one day's rows on either side
    val maxDay = graft.sources.Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date($"o_orderdate"))
      .count().agg(org.apache.spark.sql.functions.max($"count"))
      .head().getLong(0)
    plan.dropRight(1).foreach { f =>
      assert(f._3 > target - maxDay && f._3 <= target + maxDay,
        s"file ${f._1} badly sized (target $target, maxDay $maxDay): $f")
    }
    // contiguity: file k ends before file k+1 begins (range pruning
    // survives compaction)
    plan.sliding(2).foreach {
      case Array(x, y) => assert(x._5.before(y._4), s"overlap: $x / $y")
      case _ => ()
    }
  }

  test("schema evolution: mergeSchema unions generations, old files serve NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val merged = Ingest.evolvedOrders(spark, sf)
    // the evolved column exists in the MERGED schema but genuinely
    // not in the gen-1 files (evolution happened at the file level)
    assert(merged.schema.fieldNames.contains("o_orderpriority"))
    val gen1Only = spark.read.parquet(
      merged.inputFiles.filter(_.contains("gen1")).toIndexedSeq: _*)
    assert(!gen1Only.schema.fieldNames.contains("o_orderpriority"))
    // NULL-fill contract: every gen-1 row reads NULL, every gen-2
    // row keeps its value; no rows lost vs the raw table
    assert(merged.filter($"v" === 1 && $"o_orderpriority".isNotNull).count() == 0)
    assert(merged.filter($"v" === 2 && $"o_orderpriority".isNull).count() == 0)
    assert(merged.count() ==
      graft.sources.Tables.orders(spark, sf).count())
  }
}
