package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.GraphExpressions.{sorted_intersect, sorted_intersect_count}

/** The equivalence spec promised by `GraphExpressions`' scaladoc:
  * on sorted duplicate-free inputs the two-pointer merge must agree
  * bit-for-bit with `array_intersect` (count and array forms), over
  * both the primitive-long fast path and the generic ordering path
  * (string ids — the co-actor graph's natural key), and through BOTH
  * evaluation routes (whole-stage codegen on, then the interpreted
  * eval via codegen-off). An unsorted-input negative documents the
  * SORTEDNESS precondition: the expression does NOT sort for you. */
class SortedIntersectSpec extends SparkSpec {

  private def seeds = (1 to 40).map(i => Seed(0xC0FFEEL + i))

  private val longSetGen: Gen[Seq[Long]] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted))

  private val strSetGen: Gen[Seq[String]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        ('a' to 'z').map(_.toString) ++ (1 to 40).map("actor_" + _)))
        .map(_.distinct.sorted))

  private def pairs[T](g: Gen[Seq[T]]): Seq[(Seq[T], Seq[T])] =
    seeds.map { s =>
      val a = g.apply(Gen.Parameters.default, s).get
      val b = g.apply(Gen.Parameters.default, s.next.next).get
      (a, b)
    }

  /** Runs `body` with whole-stage codegen on, then fully interpreted.
    * Toggling wholeStage alone is NOT enough (round-14 ADVICE): with
    * whole-stage off, projections still compile expressions through
    * `doGenCode` (the default factoryMode is FALLBACK), so the
    * interpreted `nullSafeEval` branches never run. The second pass
    * therefore also pins factoryMode=NO_CODEGEN, which forces
    * InterpretedUnsafeProjection and the eval path. */
  private def bothCodegenRoutes(body: => Unit): Unit = {
    body // default: whole-stage codegen on
    val ws = "spark.sql.codegen.wholeStage"
    val fm = "spark.sql.codegen.factoryMode"
    val prevWs = spark.conf.get(ws)
    val prevFm = spark.conf.get(fm, "FALLBACK")
    spark.conf.set(ws, "false")
    spark.conf.set(fm, "NO_CODEGEN")
    try body finally {
      spark.conf.set(ws, prevWs)
      spark.conf.set(fm, prevFm)
    }
  }

  test("merge == array_intersect on sorted duplicate-free long arrays") {
    import spark.implicits._
    val df = pairs(longSetGen).toDF("a", "b").cache()
    bothCodegenRoutes {
      val bad = df.select(
          sorted_intersect_count($"a", $"b").as("mc"),
          size(array_intersect($"a", $"b")).cast("long").as("rc"),
          sorted_intersect($"a", $"b").as("ma"),
          array_sort(array_intersect($"a", $"b")).as("ra"))
        .filter($"mc" =!= $"rc" || $"ma" =!= $"ra")
      assert(bad.count() == 0, bad.collect().mkString("; "))
    }
  }

  test("merge == array_intersect on sorted duplicate-free int arrays") {
    import spark.implicits._
    // int is its own fast path (the narrowed-id triangle route)
    val df = pairs(longSetGen).map { case (a, b) =>
      (a.map(_.toInt), b.map(_.toInt))
    }.toDF("a", "b").cache()
    bothCodegenRoutes {
      val bad = df.select(
          sorted_intersect_count($"a", $"b").as("mc"),
          size(array_intersect($"a", $"b")).cast("long").as("rc"),
          sorted_intersect($"a", $"b").as("ma"),
          array_sort(array_intersect($"a", $"b")).as("ra"))
        .filter($"mc" =!= $"rc" || $"ma" =!= $"ra")
      assert(bad.count() == 0, bad.collect().mkString("; "))
    }
  }

  test("merge == array_intersect on sorted duplicate-free string arrays") {
    import spark.implicits._
    val df = pairs(strSetGen).toDF("a", "b").cache()
    bothCodegenRoutes {
      val bad = df.select(
          sorted_intersect_count($"a", $"b").as("mc"),
          size(array_intersect($"a", $"b")).cast("long").as("rc"),
          sorted_intersect($"a", $"b").as("ma"),
          array_sort(array_intersect($"a", $"b")).as("ra"))
        .filter($"mc" =!= $"rc" || $"ma" =!= $"ra")
      assert(bad.count() == 0, bad.collect().mkString("; "))
    }
  }

  test("identity, disjoint, empty, and null edges") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),  // identity
      (Seq(1L, 2L, 3L), Seq(4L, 5L), 0L),      // disjoint
      (Seq.empty[Long], Seq(1L, 2L), 0L),      // empty side
      (Seq.empty[Long], Seq.empty[Long], 0L)   // both empty
    ).toDF("a", "b", "want")
    bothCodegenRoutes {
      assert(df.filter(
        sorted_intersect_count($"a", $"b") =!= $"want").count() == 0)
    }
    // null propagates (BinaryExpression null-safety)
    val n = spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) IS NULL")
    assert(n.head().getBoolean(0))
  }

  test("null ELEMENTS match array_intersect: nulls-last, null == null") {
    import spark.implicits._
    // schema containsNull=true — the SQL-facing slow path; semantics
    // pinned against array_intersect (one shared null survives) and
    // array_sort's nulls-last order is the sortedness precondition
    val df = Seq(
      (Seq(Some(1L), Some(2L), None), Seq(Some(2L), None), 2L),
      (Seq(Some(1L), None), Seq(Some(2L), Some(3L)), 0L),
      (Seq[Option[Long]](None), Seq[Option[Long]](None), 1L),
      (Seq(Some(1L), Some(2L)), Seq(Some(2L), Some(9L)), 1L)
    ).toDF("a", "b", "want")
    bothCodegenRoutes {
      val bad = df.select(
          sorted_intersect_count($"a", $"b").as("mc"),
          size(array_intersect($"a", $"b")).cast("long").as("rc"),
          sorted_intersect($"a", $"b").as("ma"),
          array_sort(array_intersect($"a", $"b")).as("ra"),
          $"want")
        .filter($"mc" =!= $"want" || $"rc" =!= $"want" ||
          !($"ma" <=> $"ra"))
      assert(bad.count() == 0, bad.collect().mkString("; "))
    }
    // string elements with nulls ride the same null-aware generic path
    val s = Seq((Seq(Some("a"), Some("b"), None), Seq(Some("b"), None)))
      .toDF("a", "b")
    bothCodegenRoutes {
      assert(s.select(sorted_intersect_count($"a", $"b"))
        .head().getLong(0) == 2L)
    }
  }

  test("UNSORTED inputs give wrong answers: the precondition is real") {
    import spark.implicits._
    // {3,1,2} ∩ {2,3,1} = 3 elements, but the merge on these
    // unsorted encodings finds fewer — documenting (not blessing)
    // the sortedness contract callers must uphold via array_sort.
    val df = Seq((Seq(3L, 1L, 2L), Seq(2L, 3L, 1L))).toDF("a", "b")
    val merged = df.select(sorted_intersect_count($"a", $"b")).head().getLong(0)
    val truth = df.select(size(array_intersect($"a", $"b"))).head().getInt(0)
    assert(truth == 3 && merged < truth,
      s"expected the unsorted merge to undercount (got $merged vs $truth)")
  }

  test("mismatched or non-atomic element types fail analysis cleanly") {
    import spark.implicits._
    val df = Seq((Seq(1L), Seq("x"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(sorted_intersect_count($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("sorted_intersect_count"))
  }
}
