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

  test("materialized co-actor edges: src-keyed aggregate has no exchange, content matches derivation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val e = Tables.coActorEdgesBucketed(spark, sf)
      // the degree aggregate groups on the bucketing key: partial and
      // final aggregate collapse onto the bucket-local scan, zero
      // exchanges on the edge side
      val deg = e.groupBy($"src").agg(count(lit(1)).as("d"))
      val plan = deg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"src-keyed aggregate over the bucketed edge table must not shuffle:\n$plan")
      // content ≡ the inline explode→self-join→count derivation
      // (weights included: wt is the pair co-occurrence count)
      val sel = Tables.movies(spark, sf).select($"id", explode($"actors").as("a"))
      val inline = sel.as("x").join(sel.as("y"), Seq("id"))
        .filter($"x.a" =!= $"y.a")
        .groupBy($"x.a".as("src"), $"y.a".as("dst"))
        .agg(count(lit(1)).as("wt"))
      assert(e.count() == inline.count() &&
        e.except(inline).count() == 0 && inline.except(e).count() == 0,
        "materialized edge table must hold exactly the derived weighted edge set")
      assert(e.filter($"wt" < 1L).count() == 0, "weights must be >= 1")
      // integrity card: every arc has its reverse (asym_edges == 0)
      val card = graft.operators.Graph.coActorEdgeSummary(spark, sf).head()
      assert(card.getLong(card.fieldIndex("asym_edges")) == 0L)
      assert(card.getLong(card.fieldIndex("n_edges")) > 0L)
    } finally spark.conf.set(key, prev)
  }

  test("co-bucketed orders-lineitem join carries no exchange and matches plain route") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // force the big-big strategy (no broadcast escape, as at 100 TB)
    // so the co-partitioned layout is what makes the join shuffle-free
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    prev.foreach { case (k, _) => spark.conf.set(k, "-1") }
    try {
      val o = Tables.bucketed(spark, sf, "orders", "o_orderkey")
      val l = Tables.bucketed(spark, sf, "lineitem", "l_orderkey")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(l("l_orderkey"), o("o_orderpriority"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      // and the full shipped aggregate equals the plain-table route
      val got = graft.operators.Relational.bucketedJoin(spark, sf)
        .as[(String, Double, Long)].collect().toSeq
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          sum($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1.0) - $"l_discount").cast("decimal(18,2)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
        .as[(String, Double, Long)].collect().toSeq
      assert(got == plain && got.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
