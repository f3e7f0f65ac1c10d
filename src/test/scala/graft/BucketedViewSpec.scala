package graft

import graft.operators.ReferenceQueries
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

class BucketedViewSpec extends AnyFunSuite with SparkSpec {

  test("title probe on the bucketed view prunes to one bucket") {
    import spark.implicits._
    // autoBucketedScan drops the bucketed layout for scans it thinks
    // don't benefit; pin it off so the point-probe keeps the layout
    // and bucket pruning is visible in the plan.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val b = Tables.moviesBucketed(spark, sf)
      val probe = b.filter($"title" === "order-1")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 16"),
        s"expected bucket pruning in plan:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("bucketed title query returns the same result as the view query") {
    val a = ReferenceQueries.titleLevels(spark, sf, "order-1").collect().toSeq
    val b = ReferenceQueries.titleLevelsBucketed(spark, sf, "order-1").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
