package graft

import graft.operators.Relational
import org.apache.spark.sql.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite with SparkSpec {

  test("native per-key top-k == window formulation, and never sorts below") {
    val native = Relational.topKPerKeyNative(spark, sf)
    val window = Relational.windowTopPerSegment(spark, sf)
    assert(native.collect().map(_.toSeq).toSeq ==
      window.collect().map(_.toSeq).toSeq)
    assert(native.count() > 0)
    // the operator's subtree must hold no SortExec — the whole point
    // is bounded heaps instead of a per-partition sort (the tiny
    // presentation sort/rank ABOVE the operator is allowed). AQE wraps
    // the plan adaptively, so probe with it off for a stable tree.
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val probe = Relational.topKPerKeyNative(spark, sf)
      val exec = probe.queryExecution.executedPlan
        .collectFirst { case t: graft.plans.TopKPerKeyExec => t }
      assert(exec.nonEmpty, "TopKPerKeyExec missing from physical plan")
      val sortsBelow = exec.get.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sortsBelow.isEmpty, s"sort below the top-k operator: $sortsBelow")
    } finally spark.conf.set(aqeKey, prev)
  }

  test("heap semantics: exact per-key top-k on a skewed literal frame") {
    import spark.implicits._
    val df = Seq(
      ("a", 5L), ("a", 1L), ("a", 9L), ("a", 7L), ("a", 7L),
      ("b", 2L), ("c", 3L), ("c", 3L), ("c", 4L)
    ).toDF("key", "v")
    // top-2 by v DESC (ties broken by v only — duplicates both kept)
    val got = GraftSqlBridge.topKPerKey(df,
      Seq(df("key")), Seq(df("v").desc), 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got == Map(
      "a" -> Seq(7L, 9L),   // 9 and one of the 7s
      "b" -> Seq(2L),       // group smaller than k: whole group
      "c" -> Seq(3L, 4L)))
  }

  test("float keys group like groupBy: -0.0/0.0 form ONE group") {
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (-0.0, 3L), (1.5, 4L))
      .toDF("key", "v")
    val got = GraftSqlBridge.topKPerKey(df, Seq(df("key")), Seq(df("v").desc), 2)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    // without normalization the byte-distinct ±0.0 keys would each
    // keep their own top-2 (emitting v=1,2,3); normalized they share
    // one group keeping only v=3,2
    assert(got.map(_._2) == Set(3L, 2L, 4L), s"got $got")
  }

  test("map-typed keys are rejected up front") {
    import spark.implicits._
    val df = Seq((Map("a" -> 1), 1L)).toDF("key", "v")
    val e = intercept[IllegalArgumentException] {
      GraftSqlBridge.topKPerKey(df, Seq(df("key")), Seq(df("v").desc), 1)
    }
    assert(e.getMessage.contains("map type"))
  }

  test("result is invariant under input repartitioning") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (s"k${i % 7}", i)).toDF("key", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      GraftSqlBridge.topKPerKey(d, Seq(d("key")), Seq(d("v").desc), 5)
        .collect().map(_.toSeq).toSet
    assert(run(df.repartition(1)) == run(df.repartition(13)))
    assert(run(df).size == 35) // 7 keys × top-5, all values distinct
  }

  test("heap map spills past the byte budget and still matches the window route") {
    import spark.implicits._
    val key = graft.plans.TopKPerKey.SpillBytesKey
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    val prevAqe = spark.conf.get(aqeKey)
    // a few KiB forces many spill cycles over 5,000 keys × top-3.
    // AQE off so the executed plan tree (and its metric accumulators)
    // is directly traversable — query stages hide their subtrees.
    spark.conf.set(key, (8 * 1024).toString)
    spark.conf.set(aqeKey, "false")
    try {
      val df = (1L to 50000L).map(i => (s"key-${i % 5000}", i)).toDF("key", "v")
      val native = GraftSqlBridge.topKPerKey(df, Seq(df("key")), Seq(df("v").desc), 3)
      val got = native.collect().map(_.toSeq).toSet
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val want = df.withColumn("rn", row_number().over(
          Window.partitionBy($"key").orderBy($"v".desc)))
        .filter($"rn" <= 3).drop("rn").collect().map(_.toSeq).toSet
      assert(got == want, s"spilling changed the result: " +
        s"missing=${want.diff(got).take(3)} extra=${got.diff(want).take(3)}")
      // the run must actually have spilled — otherwise this test
      // silently stops covering the merge path
      val spills = native.queryExecution.executedPlan.collect {
        case t: graft.plans.TopKPerKeyExec => t.metrics("spillCount").value
      }.sum
      assert(spills > 0, "no spill happened under an 8 KiB budget")
    } finally {
      spark.conf.set(aqeKey, prevAqe)
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("weighted reservoir per key == window formulation; heaps, not sorts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = 5
    val rows = graft.operators.TextAnalytics.reservoirPerKey(spark, sf, k)
      .collect()
    // every stratum is capped at k with contiguous 1..n ranks
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      val rks = rs.map(_.getLong(1)).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq && rks.length <= k,
        s"$lang ranks: $rks")
    }
    // pure-window reference over the identically keyed frame
    val d = graft.sources.Tables.documents(spark, sf)
    val u = (graft.functions.Hashing.md5i32($"text", 11).cast("double") + 1.0) /
      4294967296.0
    val keyed = d.select($"doc_id", $"lang",
        size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
          .as("n_tokens"),
        (-log(u)).as("nl"))
      .filter($"n_tokens" > 0)
      .withColumn("skey", $"nl" / $"n_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"skey".asc, $"doc_id".asc)
    val want = keyed.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"lang", $"rk", $"doc_id", $"n_tokens",
        round($"skey", 6).as("sample_key"))
      .orderBy($"lang", $"rk")
    assert(rows.map(_.toSeq).toSeq == want.collect().map(_.toSeq).toSeq)
    // physical plan: the native operator carries the sample, and no
    // SortExec lives beneath it (the rank window above sorts ≤ k·strata)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val probe = graft.operators.TextAnalytics.reservoirPerKey(spark, sf, k)
      val exec = probe.queryExecution.executedPlan
        .collectFirst { case t: graft.plans.TopKPerKeyExec => t }
      assert(exec.nonEmpty, "TopKPerKeyExec missing from physical plan")
      val sortsBelow = exec.get.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sortsBelow.isEmpty, s"sort below the reservoir: $sortsBelow")
    } finally spark.conf.set(aqeKey, prev)
  }
}
