package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's entire query language: two parameterized
  * query shapes (`#query{searchCategory ∈ {"Title","Actor"}}`,
  * `Code/master.erl:23`, `Code/clientGUI.erl:22`), rebuilt Spark-first.
  *
  * Semantics pinned from the reference (SURVEY.md §3):
  *   - Title query (`Code/mapReduce.erl:21-30,44-74`): every movie ≠ T
  *     scored by |cast(T) ∩ cast(M)|; overlap 0 dropped; level =
  *     min(overlap, 4); results sorted by name (`Code/master.erl:340-354`).
  *   - Actor query (`Code/mapReduce.erl:31-41,76-105` +
  *     `Code/master.erl:282-329`): movies containing A → explode casts →
  *     drop A → global count per co-actor → level = min(count, 4), raw
  *     count preserved on level-4 rows (`Code/mapReduce.erl:102-103`).
  *   - Missing title ⇒ empty actor list ⇒ every level empty
  *     (`Code/master.erl:148-154`: `ets:lookup` miss → `[]`).
  *
  * Deviations (documented per SURVEY.md §7 "hard parts"): actor-query
  * output is deterministically sorted (the reference leaves it in
  * map-iteration order, `Code/master.erl:168-173`); intersection
  * dedups (`array_intersect`) where the reference's list comprehension
  * counts left-side duplicates (`Code/mapReduce.erl:150-153`) — equal
  * on duplicate-free casts, which our view guarantees.
  */
object ReferenceQueries {

  /** Catalog probe sets for the batched forms — fixed so the Spark
    * entry and its oracle SQL can never drift. One deliberately
    * missing title pins the per-probe miss semantics inside a batch
    * (`Code/master.erl:148-154`: lookup miss ⇒ no rows). */
  val DefaultBatchTitles: Seq[String] =
    Seq("order-1", "order-2", "order-3", "order-no-such")
  val DefaultBatchActors: Seq[String] = Seq("7", "11", "42")

  /** Title query as one job, no driver-side collect.
    *
    * The reference does a master-side hash lookup title→cast and
    * broadcasts the probe list inside the query record to every worker
    * (`Code/master.erl:148-160,194-203`). Spark-first: the probe is a
    * 1-row DataFrame broadcast-joined against all movies — the same
    * broadcast-hash pattern, but it stays distributed (no `.collect()`;
    * at 100 TB the probe lookup is a parquet point-read with predicate
    * pushdown, not a driver materialization).
    *
    * Single pass: `least(common, 4)` replaces the reference's four
    * re-scoring scans per level (`Code/mapReduce.erl:52-72`, §4.2).
    */
  def titleLevels(spark: SparkSession, sfDir: String, searchTitle: String): DataFrame =
    titleLevelsOn(Tables.movies(spark, sfDir), searchTitle)

  /** Same query over any `(id, title, actors)` DataFrame (spec entry
    * point for the golden fixtures of FIXTURES.md §1). */
  def titleLevelsOn(movies: DataFrame, searchTitle: String): DataFrame = {
    // P8 input validation — the reference rejects empty search text
    // GUI-side (`Code/clientGUI.erl:81-84`); here it is an API
    // precondition of the query builder.
    require(searchTitle.trim.nonEmpty, "searchTitle must be non-empty")
    val spark = movies.sparkSession
    import spark.implicits._
    // Duplicate titles: the reference's master lookup table is an ETS
    // `set` keyed by title, so the last CSV row wins
    // (`Code/csv_to_ets.erl:23-24,53`). "Last" is file order, which a
    // distributed read doesn't define, so the deterministic analogue
    // is highest-id wins — pinned identically in [[titleLevelsSql]]
    // so a duplicate-title probe stays oracle-comparable. The sort
    // runs on a frame already filtered to one title (≈1 row).
    val probe = movies
      .filter($"title" === lit(searchTitle))
      .select($"id", $"actors".as("probe_actors"))
      .orderBy($"id".desc)
      .limit(1)
      .select($"probe_actors")
    movies
      .filter($"title" =!= lit(searchTitle)) // P3: exclude searched movie
      .join(broadcast(probe))                // J1+J2: broadcast 1-row build side
      .withColumn("common", size(array_intersect($"actors", $"probe_actors"))) // J3/U2
      .filter($"common" >= 1)                                 // P6: overlap 0 dropped
      .withColumn("level", least($"common", lit(4)).cast("bigint")) // A2
      .select($"title".as("name"), $"common".cast("bigint").as("cnt"), $"level")
      .orderBy($"level", $"name")                             // O1
  }

  /** Title query routed through the bucketed materialized view
    * ([[Tables.moviesBucketed]]) — identical semantics, but the probe
    * lookup is a bucket-pruned point read (1 of 16 buckets) instead
    * of a full view scan: the plan every title probe should have at
    * real scale. Same oracle as [[titleLevels]]. */
  def titleLevelsBucketed(spark: SparkSession, sfDir: String, searchTitle: String): DataFrame =
    titleLevelsOn(Tables.moviesBucketed(spark, sfDir), searchTitle)

  /** Duplicate-title probe semantics pinned by an oracle query: the
    * reference's ETS `set` keyed by title keeps one row per title,
    * last insert wins (`Code/csv_to_ets.erl:23-24,53`); our
    * deterministic analogue is highest-id wins. Runs on a literal
    * frame (sfDir unused) so the duplicate actually exists. */
  def titleDupProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val movies = Seq(
      (1L, "m", Seq("a", "b", "c")),
      (2L, "m", Seq("c", "d")), // duplicate title, higher id: this probe wins
      (3L, "x", Seq("c", "e")),
      (4L, "y", Seq("a", "b")),
      (5L, "z", Seq("c", "d", "e"))
    ).toDF("id", "title", "actors")
    titleLevelsOn(movies, "m")
  }

  val titleDupProbeMoviesSql: String =
    """SELECT * FROM (VALUES
      |  (1, 'm', ['a','b','c']),
      |  (2, 'm', ['c','d']),
      |  (3, 'x', ['c','e']),
      |  (4, 'y', ['a','b']),
      |  (5, 'z', ['c','d','e'])) AS t(id, title, actors)""".stripMargin

  def titleDupProbeSql: String = titleLevelsSqlOn(titleDupProbeMoviesSql, "m")

  def titleLevelsSql(searchTitle: String): String =
    titleLevelsSqlOn(Tables.moviesSql, searchTitle)

  /** [[titleLevelsSql]] over any movies CTE body. */
  def titleLevelsSqlOn(moviesCte: String, searchTitle: String): String =
    s"""WITH movies AS ($moviesCte),
       |probe AS (SELECT actors AS probe_actors FROM movies
       |          WHERE title = '$searchTitle' ORDER BY id DESC LIMIT 1)
       |SELECT m.title AS name,
       |       CAST(len(list_intersect(m.actors, p.probe_actors)) AS BIGINT) AS cnt,
       |       CAST(LEAST(len(list_intersect(m.actors, p.probe_actors)), 4) AS BIGINT) AS level
       |FROM movies m CROSS JOIN probe p
       |WHERE m.title <> '$searchTitle'
       |  AND len(list_intersect(m.actors, p.probe_actors)) >= 1
       |ORDER BY level, name""".stripMargin

  /** Actor query: semi-join filter → explode → global count → bucket.
    * The reference's 48-line two-phase partial/final merge
    * (`Code/master.erl:282-329`) collapses into Spark's partial+final
    * hash aggregate — map-side combine makes the shuffle carry one row
    * per (partition, co-actor), exactly the reference's per-partition
    * counts map (`Code/mapReduce.erl:86-90`).
    */
  def actorCoactors(spark: SparkSession, sfDir: String, actor: String): DataFrame =
    actorCoactorsOn(Tables.movies(spark, sfDir), actor)

  def actorCoactorsOn(movies: DataFrame, actor: String): DataFrame = {
    require(actor.trim.nonEmpty, "actor must be non-empty") // P8
    val spark = movies.sparkSession
    import spark.implicits._
    movies
      .filter(array_contains($"actors", lit(actor)))      // P4/J4: semi-join on 1-row set
      .select(explode($"actors").as("name"))              // UDTF-shaped flatten
      .filter($"name" =!= lit(actor))                     // P5: drop the searched actor
      .groupBy($"name")
      .agg(count(lit(1)).as("cnt"))                       // A1+A3 partial+final
      .withColumn("level", least($"cnt", lit(4)).cast("bigint")) // A2 + determine_level
      .select($"name", $"cnt", $"level")
      .orderBy($"level", $"name") // deviation: reference leaves Actor output unsorted
  }

  def actorCoactorsSql(actor: String): String =
    s"""WITH movies AS (${Tables.moviesSql}),
       |co AS (SELECT unnest(actors) AS name FROM movies WHERE list_contains(actors, '$actor'))
       |SELECT name, COUNT(*) AS cnt,
       |       CAST(LEAST(COUNT(*), 4) AS BIGINT) AS level
       |FROM co WHERE name <> '$actor'
       |GROUP BY name ORDER BY level, name""".stripMargin

  /** Per-level histogram with sorted member list — the presentation
    * aggregate behind the reference's graph boxes
    * (`Code/movie_graph.erl:37-39`, `Code/actor_graph.erl:37-39`, A5/A6).
    * `collect_list` is bounded here (members of one level at one probe),
    * so it is presentation-safe, not a hot-path pattern.
    */
  def levelHistogram(spark: SparkSession, sfDir: String, searchTitle: String): DataFrame = {
    import spark.implicits._
    titleLevels(spark, sfDir, searchTitle)
      .groupBy($"level")
      .agg(
        count(lit(1)).as("n"),
        array_join(sort_array(collect_list($"name")), ",").as("members"))
      .orderBy($"level")
  }

  def levelHistogramSql(searchTitle: String): String =
    s"""WITH base AS (${titleLevelsSql(searchTitle)})
       |SELECT level, COUNT(*) AS n,
       |       string_agg(name, ',' ORDER BY name) AS members
       |FROM base GROUP BY level ORDER BY level""".stripMargin

  // ---------------------------------------------------------------
  // Batched multi-probe forms (round-10): the θ→equi rewrite SURVEY
  // §2.3 J3 names as the at-scale serve shape. The reference answers
  // one probe per full corpus scan (`Code/mapReduce.erl:44-74` runs
  // per query); a production serve layer gets N probes per batch, and
  // answering them as N broadcast θ-joins re-scans the corpus N
  // times. The batch form amortizes: explode BOTH sides on actor,
  // ONE equi-join on the actor key, group by (probe, movie) — the
  // corpus is scanned once regardless of N.
  // ---------------------------------------------------------------

  /** N title probes in ONE job. Semantics per probe are exactly
    * [[titleLevelsOn]] (duplicate title ⇒ highest-id wins; missing
    * title ⇒ no rows for that probe; overlap 0 dropped; level =
    * min(overlap, 4)) — spec-pinned equal to N single-probe runs.
    *
    * Plan shape: the probe relation (requested titles' casts,
    * exploded to one row per (probe, actor)) is tier-gated broadcast
    * ([[graft.util.Broadcasting]]) against the exploded corpus —
    * a BroadcastHashJoin on the actor key for serve-sized batches,
    * falling back to a shuffled equi-join (never a nested loop —
    * plan-guard spec) when the batch outgrows the tier. The overlap
    * count is a plain partial+final aggregate: casts are
    * duplicate-free by the view's `collect_set` construction, so
    * COUNT over matched actors ≡ |cast(T) ∩ cast(M)|, the
    * `array_intersect` the single-probe form computes. */
  def titleLevelsBatch(spark: SparkSession, sfDir: String, titles: Seq[String]): DataFrame =
    titleLevelsBatchOn(Tables.movies(spark, sfDir), titles)

  def titleLevelsBatchOn(movies: DataFrame, titles: Seq[String]): DataFrame = {
    require(titles.nonEmpty && titles.forall(_.trim.nonEmpty),
      "every searched title must be non-empty") // P8
    val spark = movies.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"title").orderBy($"id".desc)
    // one row per (requested title, cast member); dup titles resolved
    // highest-id-wins BEFORE the explode, as in the single-probe form
    val probes = movies
      .filter($"title".isin(titles.distinct: _*))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"title".as("probe"), explode($"actors").as("actor"))
    // rowBound: one count over the session-cached movies view — paid
    // once per batch, not per probe; past the tier the hint is dropped
    // and Catalyst/AQE picks the shuffled route
    val gated = graft.util.Broadcasting.maybeBroadcast(probes, probes.count())
    movies.select($"id", $"title", explode($"actors").as("actor"))
      .join(gated, "actor")                      // J3 as an equi-join
      .filter($"title" =!= $"probe")             // P3 per probe
      // group by the movie ID, not the title: duplicate candidate
      // TITLES are distinct movies and stay distinct rows, exactly as
      // in the single-probe scan (spec-pinned on the dup fixture)
      .groupBy($"probe", $"id", $"title")
      .agg(count(lit(1)).as("cnt"))              // = |∩| on set-valued casts
      .withColumn("level", least($"cnt", lit(4)).cast("bigint"))
      .select($"probe", $"title".as("name"), $"cnt", $"level")
      .orderBy($"probe", $"level", $"name")      // O1 per probe
  }

  def titleLevelsBatchSql(titles: Seq[String]): String = {
    val vals = titles.distinct.map(t => s"('$t')").mkString(", ")
    s"""WITH movies AS (${Tables.moviesSql}),
       |req AS (SELECT * FROM (VALUES $vals) AS t(probe)),
       |picked AS (
       |  SELECT m.title AS probe, m.actors
       |  FROM movies m JOIN req r ON m.title = r.probe
       |  QUALIFY row_number() OVER (PARTITION BY m.title ORDER BY m.id DESC) = 1),
       |probes AS (SELECT probe, unnest(actors) AS actor FROM picked),
       |ex AS (SELECT id, title, unnest(actors) AS actor FROM movies)
       |SELECT p.probe, e.title AS name, COUNT(*) AS cnt,
       |       CAST(LEAST(COUNT(*), 4) AS BIGINT) AS level
       |FROM ex e JOIN probes p ON e.actor = p.actor
       |WHERE e.title <> p.probe
       |GROUP BY p.probe, e.id, e.title
       |ORDER BY probe, level, name""".stripMargin
  }

  /** N actor probes in ONE job; per-probe semantics are exactly
    * [[actorCoactorsOn]]. The probe list is a driver-side literal
    * (N rows exactly), so its broadcast is unconditionally safe; the
    * movie-hit frame (movies containing ANY probe) joins back to the
    * exploded corpus on the movie id — a plain equi-join AQE can
    * still runtime-broadcast from actual sizes when the hit set is
    * small, and shuffles when a probe is a superstar actor. A movie
    * containing two probes contributes to both probes' counts
    * independently (the join key carries the probe through). */
  def actorCoactorsBatch(spark: SparkSession, sfDir: String, actors: Seq[String]): DataFrame =
    actorCoactorsBatchOn(Tables.movies(spark, sfDir), actors)

  def actorCoactorsBatchOn(movies: DataFrame, actors: Seq[String]): DataFrame = {
    require(actors.nonEmpty && actors.forall(_.trim.nonEmpty),
      "every searched actor must be non-empty") // P8
    val spark = movies.sparkSession
    import spark.implicits._
    val probes = actors.distinct.toDF("probe")
    val ex = movies.select($"id", explode($"actors").as("name"))
    val hits = ex.join(broadcast(probes), $"name" === $"probe") // J4 batched
      .select($"id", $"probe")
    ex.join(hits, "id")
      .filter($"name" =!= $"probe")              // P5 per probe
      .groupBy($"probe", $"name")
      .agg(count(lit(1)).as("cnt"))              // A1+A3 per probe
      .withColumn("level", least($"cnt", lit(4)).cast("bigint"))
      .select($"probe", $"name", $"cnt", $"level")
      .orderBy($"probe", $"level", $"name")
  }

  def actorCoactorsBatchSql(actors: Seq[String]): String = {
    val vals = actors.distinct.map(a => s"('$a')").mkString(", ")
    s"""WITH movies AS (${Tables.moviesSql}),
       |ex AS (SELECT id, unnest(actors) AS name FROM movies),
       |req AS (SELECT * FROM (VALUES $vals) AS t(probe)),
       |hits AS (SELECT e.id, r.probe FROM ex e JOIN req r ON e.name = r.probe)
       |SELECT h.probe, e.name, COUNT(*) AS cnt,
       |       CAST(LEAST(COUNT(*), 4) AS BIGINT) AS level
       |FROM ex e JOIN hits h ON e.id = h.id
       |WHERE e.name <> h.probe
       |GROUP BY h.probe, e.name
       |ORDER BY probe, level, name""".stripMargin
  }

  /** Degree distribution of the co-actor graph — the structural card
    * for the graph BOTH reference queries walk (an actor's degree is
    * its distinct co-star count; the Actor query's result size IS its
    * probe's degree). Buckets are power-of-two (bucket b covers
    * degrees [2^(b−1), 2^b)), computed as the BIT LENGTH of the
    * degree — pure integer arithmetic, no float log2 near a
    * power-of-two boundary.
    *
    * Scale: reads the build-once materialized co-actor edge table
    * ([[Tables.coActorEdgesBucketed]], round-10 — previously this
    * query re-derived the edge list with its own per-movie cast
    * self-join every session); an actor's degree is its out-degree
    * there, and the degree aggregate groups on the bucketing key so
    * it runs bucket-local with no exchange on the edge side. Then
    * one ≤64-row histogram. */
  def actorDegrees(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val deg = Tables.coActorEdgesBucketed(spark, sfDir)
      .groupBy($"src".as("actor")).agg(count(lit(1)).as("deg"))
    deg
      .select(length(expr("bin(deg)")).cast("bigint").as("bucket"), $"deg")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_actors"), max($"deg").as("max_deg"))
      .orderBy($"bucket")
  }

  val actorDegreesSql: String =
    s"""WITH movies AS (${Tables.moviesSql}),
       |am AS (SELECT id, unnest(actors) AS a FROM movies),
       |deg AS (
       |  SELECT actor, COUNT(*) AS deg FROM (
       |    SELECT DISTINCT x.a AS actor, y.a AS co
       |    FROM am x JOIN am y ON x.id = y.id AND x.a <> y.a)
       |  GROUP BY actor)
       |SELECT CAST(length(bin(deg)) - position('1' IN bin(deg)) + 1
       |         AS BIGINT) AS bucket,
       |  COUNT(*) AS n_actors, MAX(deg) AS max_deg
       |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin
}
