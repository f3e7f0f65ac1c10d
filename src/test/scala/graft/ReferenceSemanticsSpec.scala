package graft

import graft.operators.ReferenceQueries
import org.apache.spark.sql.DataFrame

/** Pins the reference's query semantics on the golden `movies_tiny`
  * fixture (FIXTURES.md §1): level bucketing, self-exclusion,
  * missing-key emptiness, cap-at-4 with raw count preserved,
  * duplicate-title probe collapse.
  */
class ReferenceSemanticsSpec extends SparkSpec {
  import spark.implicits._

  def tiny: DataFrame = Seq(
    ("1", "M1", Seq("A", "B", "C", "D", "E")),
    ("2", "M2", Seq("A", "B", "C", "D", "X")),
    ("3", "M3", Seq("A", "B", "C", "Y", "Z")),
    ("4", "M4", Seq("A", "B", "P", "Q", "R")),
    ("5", "M5", Seq("A", "S", "T", "U", "V")),
    ("6", "M6", Seq("W", "S", "T", "U", "V"))
  ).toDF("id", "title", "actors")

  test("title query: levels = min(overlap,4), zero-overlap dropped, self excluded") {
    val got = ReferenceQueries.titleLevelsOn(tiny, "M1")
      .select("name", "cnt", "level").as[(String, Long, Long)].collect().toList
    // Expected per FIXTURES.md: M2→4 common→level4, M3→3, M4→2, M5→1, M6 dropped
    assert(got == List(("M5", 1L, 1L), ("M4", 2L, 2L), ("M3", 3L, 3L), ("M2", 4L, 4L)))
    assert(!got.exists(_._1 == "M1"), "searched movie must be excluded (mapReduce.erl:49)")
    assert(!got.exists(_._1 == "M6"), "overlap 0 is dropped, not level 0")
  }

  test("title query: overlap 5+ still caps at level 4 but keeps raw cnt") {
    val withClone = tiny.union(Seq(("7", "M7", Seq("A", "B", "C", "D", "E"))).toDF)
    val row = ReferenceQueries.titleLevelsOn(withClone, "M1")
      .filter($"name" === "M7").select("cnt", "level").as[(Long, Long)].head()
    assert(row == ((5L, 4L)), "level caps at 4 (mapReduce.erl:52-53); raw count preserved")
  }

  test("title query: missing title ⇒ empty result (master.erl:148-154)") {
    assert(ReferenceQueries.titleLevelsOn(tiny, "NoSuchMovie").count() == 0)
  }

  test("title query: duplicate titles collapse to a single probe (ETS set semantics)") {
    val dup = tiny.union(Seq(("9", "M1", Seq("Z", "Q"))).toDF)
    val got = ReferenceQueries.titleLevelsOn(dup, "M1")
    // one probe row only: each candidate movie appears at most once
    val names = got.select("name").as[String].collect()
    assert(names.distinct.length == names.length,
      "duplicate probe rows must not fan out candidates")
  }

  test("actor query: per-coactor global count, capped level, self excluded") {
    val got = ReferenceQueries.actorCoactorsOn(tiny, "A")
      .select("name", "cnt", "level").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("B") == ((4L, 4L)), "B shares M1-M4 = 4 → level4, raw cnt kept (master.erl:326-329)")
    assert(got("C") == ((3L, 3L)))
    assert(got("D") == ((2L, 2L)))
    for (a <- Seq("E", "X", "Y", "Z", "P", "Q", "R", "S", "T", "U", "V"))
      assert(got(a) == ((1L, 1L)), s"$a should be level1")
    assert(!got.contains("A"), "searched actor excluded (mapReduce.erl:84)")
    assert(!got.contains("W"), "W never co-stars with A")
    assert(got.size == 14)
  }

  test("actor query: unknown actor ⇒ empty") {
    assert(ReferenceQueries.actorCoactorsOn(tiny, "Nobody").count() == 0)
  }

  test("level histogram groups and sorts members per level") {
    val hist = ReferenceQueries.levelHistogram(spark, sf, "order-1")
    val levels = hist.select("level").as[Long].collect()
    assert(levels.sameElements(levels.sorted))
  }

  test("actor degrees: bucket census replays from a driver-side degree pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.operators.ReferenceQueries.actorDegrees(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    val co = graft.sources.Tables.movies(spark, sf)
      .select($"id", explode($"actors").as("a"))
      .as[(String, String)].collect()
      .toSeq.groupBy(_._1).values.flatMap { cast =>
        val as: Seq[String] = cast.map(_._2).distinct
        for (x <- as; y <- as if x != y) yield (x, y)
      }.toSeq.distinct
    val deg = co.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def bucket(d: Long) = 64L - java.lang.Long.numberOfLeadingZeros(d)
    val expect = deg.values.groupBy(bucket).map { case (b, ds) =>
      b -> (ds.size.toLong, ds.max)
    }
    assert(rows === expect)
    // an actor's degree IS its Actor-query result size: spot-check one
    val someActor = deg.keys.head
    val coCount = graft.operators.ReferenceQueries
      .actorCoactors(spark, sf, someActor).count()
    assert(coCount == deg(someActor),
      s"degree of $someActor must equal its co-actor query size")
  }

  // --- batched multi-probe forms (round-10, SURVEY §2.3 J3 at-scale shape) ---

  test("title batch ≡ N single-probe runs (incl. a missing title and a dup)") {
    import spark.implicits._
    val dup = tiny.union(Seq(("9", "M1", Seq("Z", "Q"))).toDF)
    val probes = Seq("M1", "M4", "M6", "NoSuchMovie")
    val batch = ReferenceQueries.titleLevelsBatchOn(dup, probes)
      .select("probe", "name", "cnt", "level")
      .as[(String, String, Long, Long)].collect().toSet
    val singles = probes.flatMap { t =>
      ReferenceQueries.titleLevelsOn(dup, t)
        .select("name", "cnt", "level").as[(String, Long, Long)]
        .collect().map { case (n, c, l) => (t, n, c, l) }
    }.toSet
    assert(batch == singles,
      "batch must equal the union of single-probe results, probe-tagged")
    assert(!batch.exists(_._1 == "NoSuchMovie"),
      "missing title contributes no rows inside a batch (master.erl:148-154)")
  }

  test("actor batch ≡ N single-probe runs; shared movies count per probe") {
    import spark.implicits._
    val probes = Seq("A", "W", "Nobody")
    val batch = ReferenceQueries.actorCoactorsBatchOn(tiny, probes)
      .select("probe", "name", "cnt", "level")
      .as[(String, String, Long, Long)].collect().toSet
    val singles = probes.flatMap { a =>
      ReferenceQueries.actorCoactorsOn(tiny, a)
        .select("name", "cnt", "level").as[(String, Long, Long)]
        .collect().map { case (n, c, l) => (a, n, c, l) }
    }.toSet
    assert(batch == singles)
    // M6 contains W; M5/M6 both contain S,T,U,V: S counts once for A
    // (via M5) and once for W (via M6) — independent per-probe counts
    assert(batch(("A", "S", 1L, 1L)) && batch(("W", "S", 1L, 1L)))
  }

  test("batch plans are equi-joins: no nested-loop / cartesian, on both tiers") {
    for (cap <- Seq(None, Some("0"))) {
      cap match {
        case Some(v) => spark.conf.set(graft.util.Broadcasting.maxRowsKey, v)
        case None    => spark.conf.unset(graft.util.Broadcasting.maxRowsKey)
      }
      try {
        val t = ReferenceQueries.titleLevelsBatch(spark, sf,
          ReferenceQueries.DefaultBatchTitles)
        val a = ReferenceQueries.actorCoactorsBatch(spark, sf,
          ReferenceQueries.DefaultBatchActors)
        for (df <- Seq(t, a)) {
          assert(df.count() > 0)
          val plan = df.queryExecution.executedPlan.toString
          assert(!plan.contains("BroadcastNestedLoopJoin") &&
            !plan.contains("CartesianProduct"),
            s"batch probe must stay an equi-join (cap=$cap):\n$plan")
        }
      } finally spark.conf.unset(graft.util.Broadcasting.maxRowsKey)
    }
  }
}
