package graft.operators

import graft.functions.Hashing
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) over the `embeddings` table, plus the
  * two pipeline operators built on the trained model: IVF centroid
  * training (the step `Similarity.knnIvf` documents as a stand-in) and
  * SemDeDup-style cluster-scoped semantic deduplication.
  *
  * The reference has nothing vector-shaped (its data kernels are
  * ~30-line map/reduce folds, `Code/mapReduce.erl:109-170`); this is
  * the training-data-pipeline extension surface.
  *
  * Algorithm (engine-neutral, differentially checkable):
  *  - init: the `k` corpus vectors with the smallest salted content
  *    hash (`md5i32(vec_id)`), ranked — deterministic across engines,
  *    partition layouts, and runs; cells are numbered 0..k-1 in rank
  *    order.
  *  - assign: plain Lloyd's on unit-normalized input — each vector goes
  *    to the centroid minimizing squared Euclidean distance, i.e.
  *    maximizing `dot(v,c) - ||c||²/2` (the `||v||²` term is constant
  *    per row). Scores are rounded to 6 decimals before comparison and
  *    ties break to the LOWEST cell, so both engines make identical
  *    choices even when last-ulp doubles differ.
  *  - update: per-dimension member mean, rounded to 6 decimals — the
  *    rounding re-synchronizes the two engines after their (order-
  *    dependent) floating sums.
  *  - fixed iteration count: `Iters` rounds, then one final assignment
  *    for membership counts. A cell that loses all members drops out
  *    (standard Lloyd's behavior, identical in both engines).
  *
  * Scale posture (100 TB):
  *  - Assignment is MAP-SIDE ONLY: the k·d centroid matrix is inlined
  *    as literals (broadcast-equivalent), each row computes k codegen'd
  *    [[graft.functions.DotProduct]] scores and an argmax — zero
  *    shuffle, zero join. This is the shape MLlib's KMeans uses.
  *  - The update step shuffles k·d (cell, dim) partial means — the
  *    aggregate is partial+final, so executors pre-combine; the shuffle
  *    payload is O(k·d·partitions), independent of corpus size.
  *  - The driver materializes exactly k·d rounded doubles per
  *    iteration (the centroid matrix — the canonical Lloyd's driver
  *    footprint), never corpus rows.
  */
object Clustering {

  val K = 8
  val Iters = 3
  val InitSalt = 13
  val Dims = 64

  /** Above this k the map-side literal argmax gives way to a broadcast
    * centroid join: a k·d literal tree in one projection outgrows
    * codegen long before k reaches the tens-of-thousands of cells
    * SemDeDup uses at web scale. */
  val AssignLiteralMaxK = 64

  /** Sizing rule for k: enough cells to keep the expected cell near
    * `target` members. k is a CAPACITY knob — it must grow with the
    * corpus so the per-cell pair verify stays bounded and the
    * cell-keyed join stays parallel. */
  val TargetCellSize = 256L
  def kFor(n: Long, target: Long = TargetCellSize, maxK: Int = 1 << 16): Int =
    math.max(1L, math.min(maxK.toLong, (n + target - 1) / target)).toInt

  /** Trained centroid: cell id, per-dim values (rounded to 6 dp after
    * each mean update; init vectors are the raw normalized input). */
  final case class Centroid(cell: Int, cv: Array[Double])

  // Trained models are tiny (k·d doubles) and depend only on the input
  // path and k, so cache driver-side — no session resources held.
  // Bounded (FIFO, 64): in-place corpus regeneration mints a new
  // content-token key each time, and an unbounded map would retain
  // every superseded model for the JVM's lifetime (round-13 ADVICE 3).
  private val modelCache = new graft.util.BoundedMemo[Seq[Centroid]](64)

  // training-run witness for the persisted-index no-retrain spec:
  // incremented once per actual Lloyd's training, never by cache or
  // index-serve hits
  private[graft] val trainRuns = new java.util.concurrent.atomic.AtomicInteger

  private[graft] def clearModelCache(): Unit = modelCache.clear()

  // Session-keyed frame cache (shared util): the assigned/blocked
  // frame feeds three plan subtrees in semDedup (size agg + both join
  // sides) — materialize it once per (input, model) instead of
  // re-running the k-way argmax three times.
  private val frameCache = new graft.util.FrameCache()
  private def cached(stage: String, df: DataFrame): DataFrame =
    frameCache.getOrElseUpdate(df.sparkSession,
      graft.util.FrameCache.key(stage, df))(df.cache())

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  private def litArray(xs: Array[Double]): Column =
    array(xs.toIndexedSeq.map(lit(_)): _*)

  /** `round(dot(v, c) - ||c||²/2, 6)` — the assignment score. The
    * `||c||²/2` term is computed driver-side from the same centroid
    * values the oracle's `list_dot_product(cv, cv)` sees; both engines
    * round the combined score to 6 dp before comparing. */
  private def score(v: Column, c: Centroid): Column = {
    val half = c.cv.foldLeft(0.0)((s, x) => s + x * x) / 2.0
    round(dot(v, litArray(c.cv)) - lit(half), 6)
  }

  /** Map-side argmax cell assignment: lowest cell wins score ties ==
    * "ORDER BY score DESC, cell" in the oracle. Scores land in ONE
    * array literal and `array_position(scores, array_max(scores))`
    * takes the first (= lowest-cell) maximum, so each score subtree
    * is evaluated exactly once per row — the earlier when-chain form
    * re-planted every score in both `greatest` and its branch. */
  private def assignCell(v: Column, centroids: Seq[Centroid]): Column = {
    require(centroids.nonEmpty, "k-means model has no centroids")
    val cs = centroids.sortBy(_.cell)
    if (cs.length == 1) lit(cs.head.cell)
    else {
      val scores = array(cs.map(c => score(v, c)): _*)
      val cellIds = array(cs.map(c => lit(c.cell)): _*)
      element_at(cellIds, array_position(scores, array_max(scores)).cast("int"))
    }
  }

  /** Append `cell` to a `(vec_id, v)` frame, dispatching on k:
    *  - k ≤ [[AssignLiteralMaxK]]: [[assignCell]] — zero shuffle, the
    *    centroid matrix rides in the codegen'd projection.
    *  - larger k: broadcast the centroid frame, score the ×k
    *    expansion, and take `max(struct(score, -cell))` per vector —
    *    highest score, ties to the LOWEST cell, identical semantics.
    *    The aggregate is partial+final, so the expansion collapses
    *    back to one row per vector map-side before the exchange. */
  private[graft] def withCell(e: DataFrame, model: Seq[Centroid]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    require(model.nonEmpty, "k-means model has no centroids")
    if (model.size <= AssignLiteralMaxK)
      e.withColumn("cell", assignCell($"v", model))
    else withCellJoin(e, model)
  }

  /** The broadcast-join tier, exposed for the equivalence spec. */
  private[graft] def withCellJoin(e: DataFrame, model: Seq[Centroid]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cdf = spark.createDataFrame(model.map(c =>
        (c.cell, c.cv.toSeq, c.cv.foldLeft(0.0)((s, x) => s + x * x) / 2.0)))
      .toDF("cell", "cv", "half")
    e.join(broadcast(cdf))
      .withColumn("s", round(dot($"v", $"cv") - $"half", 6))
      .groupBy($"vec_id")
      .agg(first($"v").as("v"),
        max(struct($"s".as("score"), (-$"cell").as("negcell"))).as("m"))
      .select($"vec_id", $"v", (-$"m.negcell").as("cell"))
  }

  /** One Lloyd's update: per-dim member means (rounded), collected as
    * the next centroid matrix. `posexplode` is 0-based; dims are
    * published 1-based to match the oracle's `generate_subscripts`. */
  private def updateCentroids(e: DataFrame, centroids: Seq[Centroid]): Seq[Centroid] = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = withCell(e, centroids)
      .select($"cell", posexplode($"v").as(Seq("dim", "val")))
      .groupBy($"cell", $"dim")
      .agg(round(avg($"val"), 6).as("m"))
      .collect()
    rows.groupBy(_.getInt(0)).toSeq.map { case (cell, rs) =>
      // dims come from the data (0-based posexplode), not a constant —
      // the facade trains on caller frames of any width
      val cv = new Array[Double](rs.map(_.getInt(1)).max + 1)
      rs.foreach(r => cv(r.getInt(1)) = r.getDouble(2))
      Centroid(cell, cv)
    }.sortBy(_.cell)
  }

  /** Train on any `(vec_id, v: array<double>)` unit-normalized frame.
    * Runs `iters` full Lloyd's rounds; each round is one corpus scan
    * (map-side assign) + one k·d-group aggregate. */
  def trainKmeansOf(e: DataFrame, k: Int = K, iters: Int = Iters): Seq[Centroid] = {
    val spark = e.sparkSession
    import spark.implicits._
    trainRuns.incrementAndGet()
    val init = e
      .withColumn("h", Hashing.md5i32($"vec_id".cast("string"), InitSalt))
      .orderBy($"h", $"vec_id")
      .limit(k)
      .select($"v")
      .collect()
      .zipWithIndex
      .map { case (r, i) => Centroid(i, r.getSeq[Double](0).toArray) }
      .toSeq
    // rejected up front (P8 convention): an empty corpus has no model,
    // and failing here beats an opaque analysis error downstream
    require(init.nonEmpty, "k-means requires a non-empty corpus")
    (1 to iters).foldLeft(init)((cs, _) => updateCentroids(e, cs))
  }

  /** Cached trained model for the standard embeddings table. */
  def kmeansModel(spark: SparkSession, sfDir: String,
                  k: Int = K, iters: Int = Iters): Seq[Centroid] =
    modelCache.getOrElseUpdate(
      s"$sfDir#${graft.util.ContentToken.ofPath(s"$sfDir/embeddings.parquet")}#$k#$iters",
      trainKmeansOf(Similarity.normalized(spark, sfDir), k, iters))

  /** Mean squared distance to the assigned centroid (the Lloyd's
    * objective): with unit-norm rows, `d² = 1 − 2·score`. Exposed for
    * model-quality monitoring and the convergence spec. */
  def wcssOf(e: DataFrame, model: Seq[Centroid]): Double = {
    val spark = e.sparkSession
    import spark.implicits._
    require(model.nonEmpty, "k-means model has no centroids")
    val cs = model.sortBy(_.cell)
    val scores = cs.map(c => score($"v", c))
    val best = if (scores.length == 1) scores.head else greatest(scores: _*)
    e.agg(avg(lit(1.0) - lit(2.0) * best)).head().getDouble(0)
  }

  // ---------------------------------------------------------------
  // llm_kmeans — trained centroids + final membership counts
  // ---------------------------------------------------------------

  /** Final model as rows: (cell, dim [1-based], cval, n_members). The
    * per-dim rows pin every centroid component against the oracle's
    * replay of the identical training run. */
  def kmeans(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val model = kmeansModel(spark, sfDir)
    val e = Similarity.normalized(spark, sfDir)
    val sizes = withCell(e, model)
      .groupBy($"cell").agg(count(lit(1)).as("n_members"))
    val centroidRows = model.flatMap(c =>
      c.cv.zipWithIndex.map { case (x, d) => (c.cell, d + 1, x) })
    spark.createDataFrame(centroidRows).toDF("cell", "dim", "cval")
      .join(broadcast(sizes), "cell")
      .select($"cell", $"dim", $"cval", $"n_members")
      .orderBy($"cell", $"dim")
  }

  /** Oracle CTE chain replaying the training run: init pick, then per
    * iteration an assign CTE (cross join + rank window — semantically
    * identical to the map-side argmax) and a mean-update CTE. */
  private[operators] def kmeansChainSql(k: Int, iters: Int): String =
    kmeansChainSql(k, iters, "e", "")

  /** Parameterized chain: trains over CTE `src`, prefixing every
    * chain CTE with `pfx` — so one oracle can replay SEVERAL
    * independent trainings (the PQ sub-codebooks replay one chain
    * per vector subspace). The final centroids land in `${pfx}c$iters`. */
  private[operators] def kmeansChainSql(k: Int, iters: Int,
                                        src: String, pfx: String): String =
    kmeansChainSqlInit(k.toString, iters, src, pfx)

  /** DYNAMIC-k chain: the cell count is not a literal but the
    * [[kFor]] sizing rule evaluated over `src` itself —
    * ⌈count/target⌉ clamped to [1, maxK] — so the oracle replays the
    * exact k the Scala side derives from `e.count()`. The init CTE
    * ranks by the same salted hash and keeps `rn <= k` via a scalar
    * subquery instead of a literal LIMIT; every subsequent Lloyd's
    * step is k-free, so the step CTEs are shared verbatim with the
    * fixed-k chain. */
  private[operators] def kmeansChainSqlKFor(iters: Int, src: String, pfx: String,
                                            target: Long = TargetCellSize,
                                            maxK: Int = 1 << 16): String = {
    val kExpr =
      s"(SELECT LEAST($maxK, GREATEST(1, CAST(CEIL(COUNT(*) / $target.0) AS BIGINT))) FROM $src)"
    val init =
      s"""${pfx}c0 AS (
         |  SELECT rn - 1 AS cell, v AS cv FROM (
         |    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn
         |    FROM (SELECT vec_id, v, ${Hashing.md5i32Sql("vec_id::VARCHAR", InitSalt)} AS h
         |          FROM $src))
         |  WHERE rn <= $kExpr)""".stripMargin
    init + ",\n" + kmeansChainStepsSql(iters, src, pfx)
  }

  private def kmeansChainSqlInit(k: String, iters: Int,
                                 src: String, pfx: String): String = {
    val init =
      s"""${pfx}c0 AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, v AS cv
         |  FROM (SELECT vec_id, v, ${Hashing.md5i32Sql("vec_id::VARCHAR", InitSalt)} AS h
         |        FROM $src ORDER BY h, vec_id LIMIT $k))""".stripMargin
    init + ",\n" + kmeansChainStepsSql(iters, src, pfx)
  }

  /** The k-free Lloyd's step CTEs (assign → mean-update → collect),
    * shared by the fixed-k and dynamic-k chains. */
  private def kmeansChainStepsSql(iters: Int, src: String, pfx: String): String = {
    val steps = (1 to iters).map { t =>
      s"""${pfx}s$t AS (
         |  SELECT e.vec_id, e.v, c.cell,
         |         round(list_dot_product(e.v, c.cv)
         |               - 0.5 * list_dot_product(c.cv, c.cv), 6) AS score
         |  FROM $src e, ${pfx}c${t - 1} c),
         |${pfx}a$t AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT vec_id, v, cell,
         |           row_number() OVER (PARTITION BY vec_id
         |             ORDER BY score DESC, cell) AS rn
         |    FROM ${pfx}s$t) WHERE rn = 1),
         |${pfx}m$t AS (
         |  SELECT cell, dim, round(avg(val), 6) AS m FROM (
         |    SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS val
         |    FROM ${pfx}a$t) GROUP BY cell, dim),
         |${pfx}c$t AS (SELECT cell, list(m ORDER BY dim) AS cv FROM ${pfx}m$t GROUP BY cell)""".stripMargin
    }
    steps.mkString(",\n")
  }

  // ---------------------------------------------------------------
  // llm_kcenter_select — greedy farthest-point coreset selection
  // ---------------------------------------------------------------

  /** Selection budget for the k-center coreset. */
  val KCenterK = 8

  /** Greedy k-center (farthest-point) selection over the normalized
    * embeddings: seed at the minimum vec_id, then k−1 rounds each
    * adding the vector FARTHEST from the current selection (minimum
    * max-cosine, vec_id tie-break) — the classic 2-approximation of
    * the k-center objective, and the coreset/diversity-sampling
    * primitive behind active learning and training-data pruning
    * ("cover the embedding space with k exemplars"). Emits the
    * selected ids in pick order plus the achieved coverage radius
    * max_x min_{s∈S} (1 − cos(x, s)).
    *
    * Determinism: every candidate's coverage score is
    * MAX(round(dot, 6)) — the k-means rounding contract — so the
    * per-round argmin and the radius replay bit-for-bit as chained
    * CTEs in the oracle. Scale: k−1 rounds of ONE corpus scan
    * against ≤ k broadcast centroid literals (the kmeansModel
    * posture — driver holds k·d doubles, never corpus rows); the
    * argmin per round is a bounded TakeOrdered. */
  def kcenterSelect(spark: SparkSession, sfDir: String,
                    k: Int = KCenterK): DataFrame = {
    import spark.implicits._
    val e = cached("kcenterE", Similarity.normalized(spark, sfDir))
    // degenerate guards: an empty corpus returns an empty (typed)
    // frame; a corpus smaller than the budget selects every vector
    // once and stops (the greedy would otherwise re-pick selected
    // points — distance 0 — and emit duplicates)
    val seedRows = e.orderBy($"vec_id").limit(1)
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect()
    if (seedRows.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("ord", "vec_id", "radius")
    val budget = math.min(k.toLong, e.count())
    val seed = seedRows.head
    val sel = scala.collection.mutable.ArrayBuffer(
      (0L, seed._1, seed._2.toArray))
    def mdCol: Column = array_max(array(
      sel.map(s => round(dot($"v", litArray(s._3)), 6)).toSeq: _*))
    for (t <- 1L until budget) {
      // selected ids excluded: an exact-duplicate vector ties a
      // selected point at md = 1.0 and the id tie-break could
      // otherwise re-emit the selected one (oracle mirrors the NOT IN)
      val next = e.filter(!$"vec_id".isin(sel.map(_._2).toSeq: _*))
        .select($"vec_id", $"v", mdCol.as("md"))
        .orderBy($"md".asc, $"vec_id".asc).limit(1)
        .select($"vec_id", $"v").as[(Long, Seq[Double])].head()
      sel += ((t, next._1, next._2.toArray))
    }
    val minMd = e.select(mdCol.as("md")).agg(min($"md")).head().getDouble(0)
    val radius = BigDecimal(1.0 - minMd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    sel.map { case (ord, id, _) => (ord, id, radius) }.toSeq
      .toDF("ord", "vec_id", "radius")
  }

  def kcenterSelectSql(k: Int = KCenterK): String = {
    val head =
      s"""WITH e AS (${Similarity.normalizedSql}),
         |sel0 AS MATERIALIZED (
         |  SELECT CAST(0 AS BIGINT) AS ord, vec_id, v FROM e
         |  WHERE vec_id = (SELECT MIN(vec_id) FROM e))""".stripMargin
    val steps = (1 until k).map { t =>
      s"""md$t AS MATERIALIZED (
         |  SELECT e.vec_id, e.v,
         |    MAX(round(list_dot_product(e.v, s.v), 6)) AS md
         |  FROM e, sel${t - 1} s
         |  WHERE e.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
         |  GROUP BY e.vec_id, e.v),
         |p$t AS (
         |  SELECT CAST($t AS BIGINT) AS ord, vec_id, v FROM (
         |    SELECT vec_id, v, row_number() OVER (ORDER BY md, vec_id)
         |      AS rn FROM md$t) WHERE rn = 1),
         |sel$t AS MATERIALIZED (
         |  SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM p$t)"""
        .stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$head$steps,
       |rad AS (
       |  SELECT round(1 - MIN(md), 6) AS radius FROM (
       |    SELECT MAX(round(list_dot_product(e.v, s.v), 6)) AS md
       |    FROM e, sel${k - 1} s GROUP BY e.vec_id))
       |SELECT ord, vec_id, radius FROM sel${k - 1}, rad
       |ORDER BY ord""".stripMargin
  }

  def kmeansSql(k: Int = K, iters: Int = Iters): String =
    s"""WITH e AS (${Similarity.normalizedSql}),
       |${kmeansChainSql(k, iters)},
       |sf AS (
       |  SELECT e.vec_id, c.cell,
       |         round(list_dot_product(e.v, c.cv)
       |               - 0.5 * list_dot_product(c.cv, c.cv), 6) AS score
       |  FROM e, c$iters c),
       |af AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rn FROM sf) WHERE rn = 1),
       |sizes AS (SELECT cell, COUNT(*) AS n_members FROM af GROUP BY cell)
       |SELECT m.cell::INT AS cell, m.dim::INT AS dim, m.m AS cval, s.n_members
       |FROM m$iters m JOIN sizes s USING (cell)
       |ORDER BY cell, dim""".stripMargin

  // ---------------------------------------------------------------
  // llm_kmeans_purity — cell label purity of the trained model
  // ---------------------------------------------------------------

  /** Label purity of the trained k-means cells: every vector assigned
    * to its cell (same cached model as `llm_kmeans` — trained once
    * per session), each cell scored by the fraction its majority
    * label holds (ties to the smaller label). The clustering never
    * saw the labels, so high purity certifies the embedding geometry
    * separates the label classes — the unsupervised counterpart of
    * [[Similarity.knnLabelEval]], and the quality gate run before
    * trusting the cells for SemDeDup / IVF routing.
    *
    * Scale posture: assignment is the same map-side argmax as
    * training (k·d doubles broadcast, one corpus scan); everything
    * after is (cells × labels)-ary. */
  def kmeansPurity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val model = kmeansModel(spark, sfDir)
    val e = Similarity.normalized(spark, sfDir)
    val labels = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label".cast("long").as("lb"))
    val counts = withCell(e, model).join(labels, "vec_id")
      .groupBy($"cell", $"lb").agg(count(lit(1)).as("n"))
    val top = counts.withColumn("r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"cell").orderBy($"n".desc, $"lb")))
      .filter($"r" === 1)
      .select($"cell", $"lb".as("majority_label"), $"n".as("n_majority"))
    counts.groupBy($"cell").agg(sum($"n").as("n_vecs"))
      .join(top, "cell")
      .select($"cell".cast("long").as("cell"), $"n_vecs",
        $"majority_label", $"n_majority",
        round($"n_majority".cast("double") / $"n_vecs", 6).as("purity"))
      .orderBy($"cell")
  }

  def kmeansPuritySql(k: Int = K, iters: Int = Iters): String =
    s"""WITH e AS (${Similarity.normalizedSql}),
       |${kmeansChainSql(k, iters)},
       |sf AS (
       |  SELECT e.vec_id, c.cell,
       |         round(list_dot_product(e.v, c.cv)
       |               - 0.5 * list_dot_product(c.cv, c.cv), 6) AS score
       |  FROM e, c$iters c),
       |af AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rn FROM sf) WHERE rn = 1),
       |j AS (SELECT a.cell, CAST(m.label AS BIGINT) AS lb
       |      FROM af a JOIN embeddings m ON a.vec_id = m.vec_id),
       |counts AS (SELECT cell, lb, COUNT(*) AS n FROM j GROUP BY cell, lb),
       |top AS (
       |  SELECT cell, lb AS majority_label, n AS n_majority FROM (
       |    SELECT cell, lb, n, row_number() OVER (PARTITION BY cell
       |      ORDER BY n DESC, lb) AS r FROM counts) WHERE r = 1),
       |tot AS (SELECT cell, SUM(n) AS n_vecs FROM counts GROUP BY cell)
       |SELECT CAST(t.cell AS BIGINT) AS cell,
       |  CAST(t.n_vecs AS BIGINT) AS n_vecs,
       |  p.majority_label, p.n_majority,
       |  round(p.n_majority::DOUBLE / t.n_vecs, 6) AS purity
       |FROM tot t JOIN top p ON t.cell = p.cell
       |ORDER BY cell""".stripMargin

  // ---------------------------------------------------------------
  // llm_semdedup_demo — cluster-scoped semantic near-dedup (SemDeDup shape)
  // ---------------------------------------------------------------

  /** Semantic near-duplicate pairs, candidates scoped to a shared
    * k-means cell (the SemDeDup recipe: cluster the corpus, compare
    * only within clusters). Complements the LSH-banded
    * [[Similarity.embedNearDups]]: candidate structure comes from the
    * trained partition of the space, so cost is Σ_cells |cell|²/2
    * instead of bucket-collision-bounded — and the same cells feed the
    * IVF index, so the clustering is trained once and reused.
    *
    * Pairs are verified with exact cosine ≥ `threshold`; the min-id
    * member of each pair is the canonical survivor (`vec_a < vec_b`),
    * so `vec_b` rows form the drop list.
    *
    * Capacity knobs, both of which must scale with the corpus:
    *  - k (cell count): sized by [[kFor]] ≈ n / [[TargetCellSize]]
    *    (SemDeDup uses tens of thousands of clusters at web scale) so
    *    the per-cell |cell|²/2 verify stays bounded.
    *  - the self-join is SUB-BUCKETED above [[CellJoinCap]]: an
    *    oversized cell's members are hash-split into g =
    *    ⌈|cell|/cap⌉ blocks and the left side fans out to every
    *    block, so one hot cell becomes g join keys of ≤ cap build
    *    rows each instead of one skewed key — the same bound the LSH
    *    operators put on bucket collisions. The pair SET is
    *    unchanged (each unordered pair matches on exactly the
    *    survivor's block), so the oracle SQL stays the plain
    *    cell-equi-join. */
  def semDedup(spark: SparkSession, sfDir: String,
               threshold: Double = 0.4, k: Int = K): DataFrame =
    semDedupOf(Similarity.normalized(spark, sfDir),
      kmeansModel(spark, sfDir, k), threshold)

  /** Cap on build-side rows per semDedup join key; cells above it are
    * hash-split into ⌈size/cap⌉ blocks. */
  val CellJoinCap = 4096

  /** Frame-parametric core: `e` must be unit-normalized `(vec_id, v)`. */
  def semDedupOf(e: DataFrame, model: Seq[Centroid],
                 threshold: Double, cellCap: Int = CellJoinCap): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    require(cellCap > 0, "cell cap must be positive")
    val assigned = cached("semdedup-assigned",
      withCell(e, model).select($"cell", $"vec_id", $"v"))
    // cell sizes are ≤ k rows — broadcast them back to derive each
    // cell's block count g; blk ∈ [0, g) is a hash of the member id
    val sizes = assigned.groupBy($"cell").agg(count(lit(1)).as("csz"))
    val blocked = assigned.join(broadcast(sizes), "cell")
      .withColumn("g",
        ceil($"csz".cast("double") / lit(cellCap.toDouble)).cast("int"))
      .withColumn("blk", pmod(hash($"vec_id"), $"g"))
    // probe side fans out to all g blocks; build side keeps its own
    // block — pair (a,b) with a.vec_id < b.vec_id matches exactly
    // once, on key (cell, b.blk). For cells under the cap g == 1 and
    // this is bit-for-bit the plain cell self-join.
    // the cell JOIN key stays wide (long) while the carried cell
    // column keeps its narrow type: an (int cell, int blk) key pair
    // packs into one long whose hash-map slots come from the LOW
    // word — blk, which is 0 for every under-cap cell — collapsing
    // the build map into a handful of chains (the round-15
    // modularity degeneracy, confirmed for this join by the
    // PackedKeyAudit sweep). A (long, int) pair is unpackable, so
    // the map hashes the full row key.
    val left = blocked
      .withColumn("peer", explode(sequence(lit(0), $"g" - 1)))
      .select($"cell", $"cell".cast("long").as("cellk"), $"peer",
        $"vec_id", $"v")
    val right = blocked.select($"cell".cast("long").as("cellk"), $"blk",
      $"vec_id", $"v")
    val pairs = left.as("a")
      .join(right.as("b"),
        col("a.cellk") === col("b.cellk") && col("a.peer") === col("b.blk") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cell").as("cell"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dot(col("a.v"), col("b.v")), 6).as("cosine"))
    pairs.filter($"cosine" >= threshold)
      .select($"cell", $"vec_a", $"vec_b", $"cosine")
      .orderBy($"vec_a", $"vec_b")
  }

  def semDedupSql(k: Int = K, iters: Int = Iters,
                  threshold: Double = 0.4): String =
    s"""WITH e AS (${Similarity.normalizedSql}),
       |${kmeansChainSql(k, iters)},
       |${semDedupTailSql(iters, threshold)}""".stripMargin

  /** The assign + cell-scoped pair-verify tail shared by the fixed-k
    * and at-scale SemDeDup oracles (both read the trained centroids
    * from `c$iters`). */
  private def semDedupTailSql(iters: Int, threshold: Double): String =
    s"""sf AS (
       |  SELECT e.vec_id, e.v, c.cell,
       |         round(list_dot_product(e.v, c.cv)
       |               - 0.5 * list_dot_product(c.cv, c.cv), 6) AS score
       |  FROM e, c$iters c),
       |af AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT vec_id, v, cell, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rn FROM sf) WHERE rn = 1)
       |SELECT a.cell::INT AS cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(list_dot_product(a.v, b.v), 6) AS cosine
       |FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.v, b.v), 6) >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------
  // llm_semdedup_atscale — SemDeDup with corpus-sized cell count
  // ---------------------------------------------------------------

  /** The AT-SCALE SemDeDup configuration, driver-checked (round-11
    * verdict item 1): identical operator to [[semDedup]], but the
    * cell count is NOT a fixed demo constant — it is the [[kFor]]
    * capacity rule, k ≈ n / [[TargetCellSize]], evaluated against
    * the corpus at hand. This is the configuration whose cost is
    * linear in the corpus: expected Σ|cell|²/2 ≈ n·target/2 grows
    * 1:1 with n (the fixed-k=8 demo registered as `llm_semdedup_demo`
    * is quadratic — its cells grow with the corpus, and its pair
    * verify read 14× at the round-11 10× sweep), while the
    * [[CellJoinCap]] sub-bucketing keeps any single hot cell from
    * skewing the join. Assignment dispatches through [[withCell]]:
    * map-side literal argmax for small k, broadcast-centroid join
    * once kFor crosses [[AssignLiteralMaxK]] — both one corpus scan.
    *
    * The oracle replays the identical dynamic-k training chain
    * ([[kmeansChainSqlKFor]]): the SAME ⌈count/target⌉ sizing, the
    * same salted-hash init ranking, the same rounded Lloyd's
    * updates — so the entry is hash-checked end-to-end, sizing rule
    * included. */
  def semDedupAtScale(spark: SparkSession, sfDir: String,
                      threshold: Double = 0.4): DataFrame = {
    val e = Similarity.normalized(spark, sfDir)
    val k = kFor(e.count())
    semDedupOf(e, kmeansModel(spark, sfDir, k), threshold)
  }

  def semDedupAtScaleSql(iters: Int = Iters, threshold: Double = 0.4): String =
    s"""WITH e AS (${Similarity.normalizedSql}),
       |${kmeansChainSqlKFor(iters, "e", "")},
       |${semDedupTailSql(iters, threshold)}""".stripMargin
}
