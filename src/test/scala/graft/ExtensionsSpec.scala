package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make custom expressions callable
  * from plain SQL in a session built with withExtensions.
  *
  * Care in a shared-JVM test run: the SparkContext is JVM-global, so
  * this spec must NOT stop() its session (that would kill every other
  * suite's session too); it detaches the default session so
  * getOrCreate honors withExtensions, then restores it. */
class ExtensionsSpec extends AnyFunSuite {
  test("dot_product is callable from SQL via GraftExtensions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val got = spark.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(got == 11.0)
      // the round-3 kernels are SQL-callable too
      val sh = spark.sql(
        "SELECT shingles(array('a','b','c','d'), 3) AS s")
        .head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      val h = spark.sql("SELECT md5_i32('abc', '7:') AS h").head().getLong(0)
      val ref = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("7:abc".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8), 16)
      assert(h == ref)
      // the round-7 tf kernel is SQL-callable too
      val c = spark.sql(
        "SELECT count_token_eq(array('a','b','a'), 'a') AS c")
        .head().getLong(0)
      assert(c == 2L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("optimizer rule upgrades row_number()<=k SQL to the native top-k") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-rule-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.adaptive.enabled", "false") // stable plan tree
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      Seq(("a", 5L, 1), ("a", 1L, 2), ("a", 9L, 3), ("a", 7L, 4),
        ("b", 2L, 5), ("c", 3L, 6), ("c", 4L, 7), ("c", 8L, 8))
        .toDF("k", "v", "id").createOrReplaceTempView("t")
      val q = spark.sql(
        """SELECT k, v FROM (
          |  SELECT k, v, row_number() OVER
          |    (PARTITION BY k ORDER BY v DESC, id) AS rn FROM t)
          |WHERE rn <= 2 ORDER BY k, v DESC""".stripMargin)
      val plan = q.queryExecution.executedPlan
      assert(plan.collectFirst {
        case t: graft.plans.TopKPerKeyExec => t
      }.nonEmpty, s"rewrite did not fire:\n$plan")
      assert(plan.collectFirst {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"WindowExec survived the rewrite:\n$plan")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 9L), ("a", 7L), ("b", 2L), ("c", 8L), ("c", 4L)))
      // residual conjunct rides above the operator, same result filtered
      val r = spark.sql(
        """SELECT k, v FROM (
          |  SELECT k, v, row_number() OVER
          |    (PARTITION BY k ORDER BY v DESC, id) AS rn FROM t)
          |WHERE rn <= 2 AND v > 2 ORDER BY k, v DESC""".stripMargin)
      assert(r.queryExecution.executedPlan.collectFirst {
        case t: graft.plans.TopKPerKeyExec => t
      }.nonEmpty)
      assert(r.collect().map(r0 => (r0.getString(0), r0.getLong(1))).toSeq ==
        Seq(("a", 9L), ("a", 7L), ("c", 8L), ("c", 4L)))
      // NEGATIVE: rank kept in the output -> no rewrite (the native
      // operator emits no rank column)
      val keep = spark.sql(
        """SELECT k, v, rn FROM (
          |  SELECT k, v, row_number() OVER
          |    (PARTITION BY k ORDER BY v DESC, id) AS rn FROM t)
          |WHERE rn <= 2""".stripMargin)
      assert(keep.queryExecution.executedPlan.collectFirst {
        case t: graft.plans.TopKPerKeyExec => t
      }.isEmpty, "rewrite must not fire when the rank column survives")
      // NEGATIVE: rank/dense_rank keep ties -> no rewrite
      val rank = spark.sql(
        """SELECT k, v FROM (
          |  SELECT k, v, rank() OVER
          |    (PARTITION BY k ORDER BY v DESC) AS rn FROM t)
          |WHERE rn <= 2""".stripMargin)
      assert(rank.queryExecution.executedPlan.collectFirst {
        case t: graft.plans.TopKPerKeyExec => t
      }.isEmpty, "rewrite must not fire for rank()")
      // NEGATIVE: nondeterministic residual -> no rewrite (it would
      // re-evaluate over the operator's reduced row set instead of
      // the window's full one — the same guard Catalyst's own
      // predicate-movement rules apply)
      val nondet = spark.sql(
        """SELECT k, v FROM (
          |  SELECT k, v, row_number() OVER
          |    (PARTITION BY k ORDER BY v DESC, id) AS rn FROM t)
          |WHERE rn <= 2 AND rand() < 0.5""".stripMargin)
      assert(nondet.queryExecution.executedPlan.collectFirst {
        case t: graft.plans.TopKPerKeyExec => t
      }.isEmpty, "rewrite must not fire with a nondeterministic residual")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
