package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`): brute-force cosine top-k as
  * the exact baseline, and random-hyperplane LSH for the bucketed
  * scale path. The reference has nothing vector-shaped; this is the
  * training-data-pipeline extension surface.
  *
  * Scale posture (100 TB):
  *  - Exact top-k: probes are broadcast (small side), the corpus is
  *    scanned once, and ranking is a per-probe bounded heap
  *    (`row_number <= k` over a window keyed by probe) — linear in
  *    corpus size, never corpus×corpus.
  *  - LSH: signatures are per-row scalar work (no join, no shuffle);
  *    candidates come from equi-joins on (band, bucket) keys, so the
  *    compared set is bucket-bounded. Banding (4 bands × 4 planes)
  *    trades recall versus bucket size exactly like MinHash banding.
  *  - Cosines are computed in DOUBLE after an explicit element cast
  *    (`zip_with` + sequential `aggregate` fold — deterministic
  *    summation order), emitted rounded to 6 decimals so both engines
  *    hash identically; ranks tie-break on `vec_id`.
  *
  * The LSH hyperplane weights are derived from the engine-neutral md5
  * family (`w(p,d) = md5_32("p:d") % 2001 - 1000`) in the JVM and
  * inlined as literals into BOTH the Spark plan and the oracle SQL —
  * the differential check then covers the dot/sign/bucket/rank
  * pipeline with a shared, reproducible plane family.
  */
object Similarity {

  // -- engine-neutral double-precision cosine ----------------------

  private def vd(c: Column): Column = transform(c, _.cast("double"))

  /** Codegen'd dot product ([[graft.functions.DotProduct]]) — same
    * left-to-right double summation as the higher-order-function fold
    * (bit-identical; pinned by SimilaritySpec), minus the interpreted
    * lambda dispatch per element. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  /** The built-in fold equivalent, kept as the reference
    * implementation for the equivalence spec. */
  private[graft] def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Cosine over pre-cast double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  // -- LSH plane family (JVM-side md5, mirrored into oracle SQL) ---

  val NumPlanes = 16
  val PlaneBands = 4
  val PlanesPerBand: Int = NumPlanes / PlaneBands
  val Dims = 64

  /** w(p,d) ∈ [-1000, 1000] from the md5_32 family — identical to
    * what `Hashing.md5i32(lit(s"$p:$d"), …)` would compute in-plan. */
  private[graft] def planeWeight(p: Int, d: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 2001L - 1000L
  }

  private def planeArray(p: Int): Column =
    array((0 until Dims).map(d => lit(planeWeight(p, d).toDouble)): _*)

  private def planeSqlList(p: Int): String =
    (0 until Dims).map(d => s"${planeWeight(p, d)}.0").mkString("[", ", ", "]")

  /** Per-row LSH signature bits and per-band bucket keys.
    * `bucket_b = Σ_j bit(b*r+j) << j` — a pure projection, no shuffle. */
  def withLshBuckets(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val bits = (0 until NumPlanes).map(p => (dot($"v", planeArray(p)) >= 0).cast("long"))
    val withBands = (0 until PlaneBands).foldLeft(e) { (df, b) =>
      val key = (0 until PlanesPerBand)
        .map(j => bits(b * PlanesPerBand + j) * (1L << j))
        .reduce(_ + _)
      df.withColumn(s"bucket$b", key)
    }
    withBands
  }

  private def embDouble(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir).select($"vec_id", vd($"embedding").as("v"))
  }

  // Normalized vectors and LSH buckets are CACHED per (session, sf):
  // without the materialization barrier, projection collapse inlines
  // the normalize-transform into every downstream consumer (16 plane
  // dots, both join sides, every union branch) and the expression
  // tree explodes combinatorially. Materializing once is also the
  // 100 TB posture — a signature/normalized table is written once and
  // reused by every probe batch, never recomputed per query.
  // shared bounded session cache (stopped-session + FIFO eviction)
  private val frameCache = new graft.util.FrameCache()

  /** Unit-normalized vectors: cosine becomes a single dot product —
    * one array fold per candidate instead of three. The norm is
    * computed once per ROW (not inside the per-element lambda). */
  private def embNormed(spark: SparkSession, sfDir: String): DataFrame =
    frameCache.getOrElseUpdate(spark, s"norm:$sfDir:${corpusToken(sfDir)}")(
      normalizeOf(Tables.embeddings(spark, sfDir)).cache())

  /** Package-level accessors for operators built on the normalized
    * embedding frame (k-means / SemDeDup in [[Clustering]]). */
  private[operators] def normalized(spark: SparkSession, sfDir: String): DataFrame =
    embNormed(spark, sfDir)
  private[operators] def normalizedSql: String = embNormedSql

  private def embBucketed(spark: SparkSession, sfDir: String): DataFrame =
    frameCache.getOrElseUpdate(spark, s"buckets:$sfDir:${corpusToken(sfDir)}")(
      withLshBuckets(embNormed(spark, sfDir)).cache())

  private val embNormedSql: String =
    """SELECT vec_id,
      |  list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v
      |FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings)""".stripMargin

  // ---------------------------------------------------------------
  // llm_knn_exact — brute-force cosine top-k (the exact baseline)
  // ---------------------------------------------------------------

  /** Unit-normalize any `(vec_id, embedding: array<float|double>)`
    * frame — the frame-parametric entry; cache the result if reused. */
  def normalizeOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select($"vec_id", vd($"embedding").as("v"))
      .withColumn("nrm", sqrt(dot($"v", $"v")))
      .select($"vec_id", transform($"v", _ / $"nrm").as("v"))
  }

  /** [[knnExact]] over any embeddings frame (normalizes inline). */
  def knnExactOf(embeddings: DataFrame, numProbes: Int = 5, k: Int = 10): DataFrame =
    knnExactNormed(normalizeOf(embeddings), numProbes, k)

  def knnExact(spark: SparkSession, sfDir: String,
               numProbes: Int = 5, k: Int = 10): DataFrame =
    knnExactNormed(embNormed(spark, sfDir), numProbes, k)

  private def knnExactNormed(e: DataFrame, numProbes: Int, k: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val probes = e.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    val ranked = e.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cosine", round(dot($"v", $"pv"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= k)
    ranked.select($"probe_id", $"rank".cast("long").as("rank"),
      $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"probe_id", $"rank")
  }

  def knnExactSql(numProbes: Int = 5, k: Int = 10): String =
    s"""WITH e AS ($embNormedSql),
       |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < $numProbes),
       |scored AS (
       |  SELECT probe_id, vec_id, round(list_dot_product(v, pv), 6) AS cosine
       |  FROM e, probes WHERE vec_id <> probe_id
       |), ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored
       |)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // llm_knn_lsh — bucketed approximate top-k
  // ---------------------------------------------------------------

  /** Approximate top-k: only candidates sharing ≥1 LSH band bucket
    * with the probe are scored. At scale the scan-side never
    * materializes corpus×probes — candidates per probe are bounded by
    * bucket occupancy. */
  def knnLsh(spark: SparkSession, sfDir: String,
             numProbes: Int = 20, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = embBucketed(spark, sfDir)
    // band-keyed long form: (vec_id, v, band, bucket)
    val banded = (0 until PlaneBands).map { b =>
      e.select($"vec_id", $"v", lit(b).as("band"), col(s"bucket$b").as("bucket"))
    }.reduce(_ union _)
    val probes = banded.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"band", $"bucket")
    // dedup multi-band collisions on ID PAIRS (narrow rows), then join
    // the vectors back — never shuffle 64-double arrays through the
    // distinct
    val candIds = banded.select($"vec_id", $"band", $"bucket")
      .join(probes, Seq("band", "bucket"))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id")
      .distinct()
    val e0 = embNormed(spark, sfDir)
    val cand = candIds
      .join(e0.select($"vec_id", $"v"), "vec_id")
      .join(broadcast(e0.filter($"vec_id" < numProbes)
        .select($"vec_id".as("probe_id"), $"v".as("pv"))), "probe_id")
    cand
      .withColumn("cosine", round(dot($"v", $"pv"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"probe_id", $"rank")
  }

  private def bucketExprSql(b: Int): String =
    (0 until PlanesPerBand).map { j =>
      val p = b * PlanesPerBand + j
      s"(CASE WHEN list_dot_product(v, ${planeSqlList(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  def knnLshSql(numProbes: Int = 20, k: Int = 5): String = {
    val bandSelects = (0 until PlaneBands).map { b =>
      s"SELECT vec_id, v, $b AS band, ${bucketExprSql(b)} AS bucket FROM e"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS ($embNormedSql),
       |banded AS ($bandSelects),
       |probes AS (SELECT vec_id AS probe_id, v AS pv, band, bucket
       |           FROM banded WHERE vec_id < $numProbes),
       |cand AS (
       |  SELECT DISTINCT c.probe_id, c.pv, b.vec_id, b.v
       |  FROM banded b JOIN (SELECT * FROM probes) c
       |    ON b.band = c.band AND b.bucket = c.bucket AND b.vec_id <> c.probe_id
       |), ranked AS (
       |  SELECT probe_id, vec_id,
       |         round(list_dot_product(v, pv), 6) AS cosine,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY round(list_dot_product(v, pv), 6) DESC, vec_id) AS rank
       |  FROM cand
       |)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_embed_neardup — embedding-cosine near-duplicate pairs
  // ---------------------------------------------------------------

  /** Per-band bucket WIDTH (in hyperplane bits) sized from the corpus,
    * the [[Clustering.kFor]] precedent applied to LSH banding. A FIXED
    * band width keeps the bucket COUNT constant, so bucket occupancy —
    * and with it the self-join's candidate-pair count, n²/buckets per
    * band — grows quadratically with the corpus (measured 17.5× wall
    * at a 10× data step with the old 4-bit bands). Bucket capacity is
    * a knob that must grow with n: one extra bit per corpus doubling
    * keeps expected occupancy near [[NearDupTargetBucket]], so
    * candidate pairs stay ~n·target/2 per band — linear.
    *
    * Integer form (no log2 — bit-for-bit reproducible in SQL):
    * bits = #{ j ∈ [0, maxBits) : target·2^j < n }, min 1. */
  val NearDupTargetBucket = 64L
  val NearDupMaxBits = 16
  // hash-family offset: the adaptive planes are a family of their own,
  // disjoint from the fixed 16-plane knnLsh family above
  private val NearDupPlaneBase = 1000

  def nearDupBitsFor(n: Long, target: Long = NearDupTargetBucket,
                     maxBits: Int = NearDupMaxBits): Int =
    math.max(1, (0 until maxBits).count(j => target * (1L << j) < n))

  /** Candidate-generation recall of [[embedNearDups]] for a pair of
    * cosine exactly `t` at corpus size `n`:
    * r = 1 − (1 − p^bits)^bands with p = 1 − arccos(t)/π. The
    * documented recall envelope (see [[embedNearDups]]'s contract);
    * driver-side math only — never part of a query plan. */
  def nearDupRecallEnvelope(n: Long, t: Double,
                            bands: Int = PlaneBands): Double = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, t))) / math.Pi
    val perBand = math.pow(p, nearDupBitsFor(n).toDouble)
    1.0 - math.pow(1.0 - perBand, bands.toDouble)
  }

  /** All pairs with cosine ≥ `threshold` AMONG CANDIDATES from shared
    * LSH band buckets (a < b). The embedding-space sibling of MinHash
    * near-dedup: same banded-bucket candidate structure, cosine
    * instead of Jaccard as the verifier.
    *
    * Band width is DATA-SIZED ([[nearDupBitsFor]]): the corpus count
    * is one parquet-metadata-cheap action on the cached normalized
    * frame, and the oracle derives the identical width from its own
    * COUNT(*) (integer comparisons, no fp), so both engines bucket
    * with the same planes.
    *
    * RECALL CONTRACT ([[nearDupRecallEnvelope]], pinned by spec): a
    * hyperplane agrees on a pair of cosine t with probability
    * p(t) = 1 − arccos(t)/π, so a pair collides in ≥1 of the
    * `PlaneBands` bands with probability
    * r(n, t) = 1 − (1 − p(t)^bits(n))^bands — candidate-generation
    * recall DECAYS as the corpus grows (one p(t)× step per corpus
    * doubling until the 16-bit cap). At true near-dup cosines it
    * stays usable through the cap (t = .95 → r ≥ .55 at every n);
    * at the catalog default t = 0.4 (chosen so the synthetic corpus,
    * whose max pairwise cosine is ~0.51, yields a non-empty oracled
    * result) the envelope is ~6% at sf1 and shrinks ~0.63× per
    * further doubling — at that threshold this operator is a
    * DETERMINISTIC CANDIDATE SAMPLER (the oracle replays the same
    * buckets bit-for-bit), not a high-recall enumerator. Callers
    * needing enumerated low-cosine pairs want [[knnExact]]'s
    * brute-force route; callers at real near-dup thresholds get the
    * documented envelope. Uncorrelated pairs (the n² mass) collide
    * ~2^-bits per band, which is what keeps candidates ~linear.
    *
    * Verify-BEFORE-dedup (round-11 sf1 lesson): the raw candidate
    * stream is bucket-bounded but still the big side — distinct-ing
    * the IDs first put all candidates through an exchange and then
    * re-attached both vectors per survivor. Dotting inside the band
    * join's own codegen stage instead means a candidate that fails
    * the threshold dies in-loop without ever being materialized; only
    * the verified pairs (output-sized) reach the band-collision
    * `distinct`. Cosine is deterministic per pair, so
    * distinct-after-verify returns the identical set. */
  def embedNearDups(spark: SparkSession, sfDir: String,
                    threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    val e = embNormed(spark, sfDir)
    val bits = nearDupBitsFor(e.count())
    val banded = (0 until PlaneBands).map { b =>
      val bucket = (0 until bits).map { j =>
        (dot($"v", planeArray(NearDupPlaneBase + b * NearDupMaxBits + j)) >= 0)
          .cast("long") * (1L << j)
      }.reduce(_ + _)
      e.select($"vec_id", $"v", lit(b).as("band"), bucket.as("bucket"))
    }.reduce(_ union _)
    banded.as("ea")
      .join(banded.as("eb"),
        col("ea.band") === col("eb.band") && col("ea.bucket") === col("eb.bucket") &&
          col("ea.vec_id") < col("eb.vec_id"))
      .select(col("ea.vec_id").as("a"), col("eb.vec_id").as("b"),
        round(dot(col("ea.v"), col("eb.v")), 6).as("cosine"))
      .filter($"cosine" >= threshold)
      .distinct()
      .select($"a".as("vec_a"), $"b".as("vec_b"), $"cosine")
      .orderBy($"vec_a", $"vec_b")
  }

  /** Oracle twin: the band width comes from a 1-row COUNT(*) CTE with
    * the same integer comparisons as [[nearDupBitsFor]]; the bucket is
    * the full maxBits-term sum with each term masked by `j < bits`
    * (static SQL cannot vary its term count, so unused planes
    * contribute 0). */
  def embedNearDupsSql(threshold: Double = 0.4): String = {
    val bitsExpr = (0 until NearDupMaxBits)
      .map(j => s"(CASE WHEN ${NearDupTargetBucket * (1L << j)} < cnt THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val bandSelects = (0 until PlaneBands).map { b =>
      val bucket = (0 until NearDupMaxBits).map { j =>
        val p = NearDupPlaneBase + b * NearDupMaxBits + j
        s"(CASE WHEN $j < bits AND list_dot_product(v, ${planeSqlList(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("\n      + ")
      s"SELECT vec_id, v, $b AS band,\n        $bucket AS bucket FROM e, nb"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS ($embNormedSql),
       |nb AS (SELECT GREATEST(1, $bitsExpr) AS bits
       |       FROM (SELECT COUNT(*) AS cnt FROM e)),
       |banded AS ($bandSelects)
       |SELECT DISTINCT ea.vec_id AS vec_a, eb.vec_id AS vec_b,
       |  round(list_dot_product(ea.v, eb.v), 6) AS cosine
       |FROM banded ea JOIN banded eb
       |  ON ea.band = eb.band AND ea.bucket = eb.bucket AND ea.vec_id < eb.vec_id
       |WHERE round(list_dot_product(ea.v, eb.v), 6) >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_knn_ivf — inverted-file (coarse-quantizer) approximate top-k
  // ---------------------------------------------------------------

  val IvfCells = 16
  val IvfNProbe = 2

  /** IVF ANN: the second scale path next to LSH. Corpus vectors are
    * assigned to their nearest "centroid" cell once; a probe searches
    * only its `nprobe` nearest cells. Candidates per probe are
    * bounded by cell occupancy (n/cells · nprobe in expectation) and
    * the cell assignment is an embarrassingly parallel argmax against
    * a broadcast centroid table.
    *
    * Centroid selection is a deterministic hash-ranked sample of the
    * corpus (stand-in for a k-means training step, which is an
    * offline job at real scale; the INDEX STRUCTURE — assignment,
    * inverted cells, nprobe search — is the operator under test and
    * is exactly mirrored in the oracle). */
  def knnIvf(spark: SparkSession, sfDir: String,
             numProbes: Int = 20, k: Int = 5,
             cells: Int = IvfCells, nprobe: Int = IvfNProbe): DataFrame = {
    import spark.implicits._
    val e = embNormed(spark, sfDir)
    val centroids = e
      .withColumn("h", graft.functions.Hashing.md5i32($"vec_id".cast("string"), 11))
      .orderBy($"h", $"vec_id")
      .limit(cells)
      .select($"vec_id".as("cell"), $"v".as("cv"))
    ivfSearch(e, centroids, numProbes, k, nprobe)
  }

  /** IVF over PROPERLY TRAINED centroids — [[Clustering.kmeansModel]]
    * replaces the hash-ranked sample with real Lloyd's output, closing
    * the "k-means stand-in" documented on [[knnIvf]]. The trained
    * matrix is k·d driver-side doubles, inlined as a local relation
    * and broadcast — the index structure (assignment, inverted cells,
    * nprobe search) is shared with [[knnIvf]] via [[ivfSearch]]. */
  def knnIvfKmeans(spark: SparkSession, sfDir: String,
                   numProbes: Int = 20, k: Int = 5,
                   nprobe: Int = IvfNProbe): DataFrame = {
    import spark.implicits._
    val model = Clustering.kmeansModel(spark, sfDir)
    val centroids = model.map(c => (c.cell, c.cv)).toDF("cell", "cv")
    ivfSearch(embNormed(spark, sfDir), centroids, numProbes, k, nprobe)
  }

  // ---------------------------------------------------------------
  // llm_knn_ivf_persisted — build-once / query-many persisted index
  // ---------------------------------------------------------------

  /** Write a trained IVF index as a parquet layout under `dir`:
    * `centroids/` holds the k·d matrix `(cell, cv)`, `cells/` holds
    * the inverted assignment `(vec_id, v, cell)` PARTITIONED BY cell —
    * so a probe batch that searches `nprobe` cells reads exactly those
    * cell directories and leaves the rest of the corpus on disk (the
    * S5 snapshot discipline applied to the index itself). This is the
    * production retrieval shape: training is an offline job that runs
    * once; query batches mount the index and never touch the raw
    * embeddings again. */
  def writeIvfIndex(e: DataFrame, model: Seq[Clustering.Centroid],
                    dir: String): Unit = {
    val spark = e.sparkSession
    import spark.implicits._
    val centroids = spark.createDataFrame(model.map(c => (c.cell, c.cv.toSeq)))
      .toDF("cell", "cv")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    ivfAssign(e, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Mount a persisted IVF index: `(centroids, cells)` frames off the
    * parquet layout [[writeIvfIndex]] wrote. Pure reads — no
    * training, no corpus scan. */
  def readIvfIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/cells"))

  /** Serve kNN queries from a MOUNTED index directory — the read
    * path of the build-once/query-many contract. Never trains and
    * never reads the embeddings table: everything comes off the
    * index parquet (spec-pinned via the training-run counter). */
  def knnIvfServe(spark: SparkSession, dir: String,
                  numProbes: Int = 20, k: Int = 5,
                  nprobe: Int = IvfNProbe): DataFrame = {
    val (centroids, cells) = readIvfIndex(spark, dir)
    ivfServe(cells, centroids, numProbes, k, nprobe)
  }

  // one disk build per (sfDir, k) per JVM — the bench's min-of-3 and
  // a session's repeated probes reuse the layout, mirroring the
  // offline-build/online-serve split
  private val indexDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Content-version fingerprint of the embeddings input: sorted
    * (file name, length, mtime) of every data file under the table
    * path, hashed. The persisted-index contract is build-once per
    * CORPUS VERSION, not per path — a `_SUCCESS`-exists check alone
    * served a stale index after the corpus at the same path was
    * regenerated (caught live by the round-12 sf1 differential:
    * `llm_knn_ivf_persisted` hash-red against the re-derived 10×
    * data while the in-session route stayed green). At warehouse
    * scale this token is the table format's snapshot/version id;
    * for raw parquet the file census is the same signal. */
  private[graft] def corpusToken(sfDir: String): String =
    graft.util.ContentToken.ofPath(s"$sfDir/embeddings.parquet")

  // full-path-sanitized name, NOT a 32-bit hash of the path: two
  // corpora must never share an index directory (String.hashCode
  // collisions are trivially constructible, and a collision here
  // silently serves neighbors from the wrong corpus); the content
  // token versions the layout against in-place corpus regeneration
  private[graft] def ivfIndexDir(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_v3_${
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}_k${Clustering.K}_${
      corpusToken(sfDir)}"

  /** [[knnIvfKmeans]] through a PERSISTED index: train (session-cached
    * model), write the parquet index once per (corpus, k), then serve
    * every query from the mounted layout. Result-identical to the
    * in-session route — parquet round-trips doubles exactly and the
    * serve arithmetic is shared ([[ivfServe]]) — so the oracle is the
    * same replayed k-means chain.
    *
    * The on-disk build is crash/concurrency-safe: writers build into
    * a process-unique staging dir and PROMOTE with an atomic rename,
    * so another process (e.g. Verify and Bench against the same
    * corpus) either sees no index or a complete one — never a torn
    * overwrite. Losing builders delete their stage and serve the
    * winner's layout (identical content: the build is deterministic). */
  def knnIvfPersisted(spark: SparkSession, sfDir: String,
                      numProbes: Int = 20, k: Int = 5,
                      nprobe: Int = IvfNProbe): DataFrame = {
    // memo key is the token-bearing directory, not the raw path: a
    // corpus regenerated mid-session resolves to a NEW dir and
    // triggers a fresh build instead of serving the stale layout
    val dir = indexDirs.getOrElseUpdate(ivfIndexDir(sfDir), {
      val d = ivfIndexDir(sfDir)
      if (!new java.io.File(s"$d/cells/_SUCCESS").exists()) {
        val stage = s"${d}_stage_${java.lang.ProcessHandle.current().pid()}_${System.nanoTime()}"
        writeIvfIndex(embNormed(spark, sfDir),
          Clustering.kmeansModel(spark, sfDir), stage)
        if (!new java.io.File(s"$d/cells/_SUCCESS").exists())
          new java.io.File(stage).renameTo(new java.io.File(d))
        // a losing (or racing) builder's stage is dead weight
        val leftover = new java.io.File(stage)
        if (leftover.exists()) deleteRecursively(leftover)
      }
      d
    })
    knnIvfServe(spark, dir, numProbes, k, nprobe)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** The IVF index search given a `(cell, cv)` centroid frame: assign
    * corpus vectors to nearest cells, probe the `nprobe` nearest cells
    * per query, rank candidates by exact cosine. */
  private def ivfSearch(e: DataFrame, centroids: DataFrame,
                        numProbes: Int, k: Int, nprobe: Int): DataFrame =
    ivfServe(ivfAssign(e, centroids), centroids, numProbes, k, nprobe)

  /** The BUILD half of IVF: nearest-cell assignment by rounded cosine
    * (ties to the lowest cell). Shared verbatim between the in-session
    * search and [[writeIvfIndex]] — the persisted inverted lists must
    * hold exactly the cells the live route would assign, or
    * boundary-line vectors silently change cells between the two. */
  private def ivfAssign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.join(broadcast(centroids))
      .withColumn("cos_c", round(dot($"v", $"cv"), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cos_c".desc, $"cell")))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cell")
  }

  /** The SERVE half of IVF: given an already-built index — the
    * `(vec_id, v, cell)` inverted assignment and the `(cell, cv)`
    * centroid frame — rank the `nprobe`-cell candidates per probe.
    * Split out so the persisted-index path serves without ever
    * seeing the raw corpus (the no-retrain contract). */
  private def ivfServe(assign: DataFrame, centroids: DataFrame,
                       numProbes: Int, k: Int, nprobe: Int): DataFrame = {
    val spark = assign.sparkSession
    import spark.implicits._
    val probeCells = assign.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
      .join(broadcast(centroids))
      .withColumn("cos_c", round(dot($"pv", $"cv"), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cos_c".desc, $"cell")))
      .filter($"rn" <= nprobe)
      .select($"probe_id", $"pv", $"cell")
    probeCells.join(assign, "cell")
      .filter($"vec_id" =!= $"probe_id")
      .withColumn("cosine", round(dot($"v", $"pv"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"probe_id", $"rank")
  }

  def knnIvfSql(numProbes: Int = 20, k: Int = 5,
                cells: Int = IvfCells, nprobe: Int = IvfNProbe): String =
    s"""WITH e AS ($embNormedSql),
       |centroids AS (
       |  SELECT vec_id AS cell, v AS cv FROM e
       |  ORDER BY ${graft.functions.Hashing.md5i32Sql("vec_id::VARCHAR", 11)}, vec_id
       |  LIMIT $cells
       |), ${ivfSearchSql(numProbes, k, nprobe)}""".stripMargin

  /** [[knnIvfKmeans]] oracle: the k-means training chain supplies the
    * `centroids` CTE; the search SQL is shared with [[knnIvfSql]]. */
  def knnIvfKmeansSql(numProbes: Int = 20, k: Int = 5,
                      kCells: Int = Clustering.K,
                      iters: Int = Clustering.Iters,
                      nprobe: Int = IvfNProbe): String =
    s"""WITH e AS ($embNormedSql),
       |${Clustering.kmeansChainSql(kCells, iters)},
       |centroids AS (SELECT cell, cv FROM c$iters),
       |${ivfSearchSql(numProbes, k, nprobe)}""".stripMargin

  /** Search-stage SQL shared by both IVF oracles; expects CTEs `e`
    * (vec_id, v) and `centroids` (cell, cv) to be in scope. */
  private def ivfSearchSql(numProbes: Int, k: Int, nprobe: Int): String =
    s"""${ivfSearchCtes(numProbes, nprobe)}
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin

  /** The IVF chain through `ranked` only — reused by [[knnRecallSql]]
    * which joins it against the exact ranking instead of emitting it. */
  private def ivfSearchCtes(numProbes: Int, nprobe: Int): String =
    s"""assign AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY round(list_dot_product(e.v, c.cv), 6) DESC, c.cell) AS rn
       |    FROM e, centroids c)
       |  WHERE rn = 1
       |), probe_cells AS (
       |  SELECT probe_id, pv, cell FROM (
       |    SELECT a.vec_id AS probe_id, a.v AS pv, c.cell,
       |           row_number() OVER (PARTITION BY a.vec_id
       |             ORDER BY round(list_dot_product(a.v, c.cv), 6) DESC, c.cell) AS rn
       |    FROM assign a, centroids c WHERE a.vec_id < $numProbes)
       |  WHERE rn <= $nprobe
       |), ranked AS (
       |  SELECT p.probe_id, a.vec_id,
       |         round(list_dot_product(a.v, p.pv), 6) AS cosine,
       |         row_number() OVER (PARTITION BY p.probe_id
       |           ORDER BY round(list_dot_product(a.v, p.pv), 6) DESC, a.vec_id) AS rank
       |  FROM probe_cells p JOIN assign a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.probe_id
       |)""".stripMargin

  // ---------------------------------------------------------------
  // llm_knn_recall_at_k — IVF recall eval against the exact ranking
  // ---------------------------------------------------------------

  /** Recall@k of the IVF index against the brute-force exact ranking,
    * per probe — the acceptance number an ANN rollout is judged by
    * (the eval card next to [[knnLabelEval]]'s label consistency).
    * Both rankings use identical probe sets, tie-breaks, and rounded
    * cosines, so the intersection is well defined; recall is an exact
    * hits/k rational.
    *
    * Scale: the exact side is probes×corpus — affordable for an EVAL
    * over a probe SAMPLE (that is what recall measurement costs,
    * ground truth included); the IVF side is the production path. */
  def knnRecallAtK(spark: SparkSession, sfDir: String,
                   numProbes: Int = 20, k: Int = 5): DataFrame = {
    import spark.implicits._
    val exact = knnExact(spark, sfDir, numProbes, k)
      .select($"probe_id", $"neighbor_id")
    val ivf = knnIvf(spark, sfDir, numProbes, k)
      .select($"probe_id".as("p2"), $"neighbor_id".as("n2"))
    val hits = exact
      .join(ivf, $"probe_id" === $"p2" && $"neighbor_id" === $"n2")
      .groupBy($"probe_id").agg(count(lit(1)).as("h"))
    exact.select($"probe_id").distinct()
      .join(hits, Seq("probe_id"), "left")
      .select($"probe_id",
        coalesce($"h", lit(0L)).as("n_hits"),
        (coalesce($"h", lit(0L)).cast("double") / k).as("recall"))
      .orderBy($"probe_id")
  }

  def knnRecallSql(numProbes: Int = 20, k: Int = 5,
                   cells: Int = IvfCells, nprobe: Int = IvfNProbe): String =
    s"""WITH e AS ($embNormedSql),
       |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e
       |           WHERE vec_id < $numProbes),
       |exsc AS (SELECT probe_id, vec_id,
       |           round(list_dot_product(v, pv), 6) AS cosine
       |         FROM e, probes WHERE vec_id <> probe_id),
       |exk AS (SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cosine DESC, vec_id) AS rnk FROM exsc)
       |  WHERE rnk <= $k),
       |centroids AS (
       |  SELECT vec_id AS cell, v AS cv FROM e
       |  ORDER BY ${graft.functions.Hashing.md5i32Sql("vec_id::VARCHAR", 11)}, vec_id
       |  LIMIT $cells
       |), ${ivfSearchCtes(numProbes, nprobe)},
       |ivfk AS (SELECT probe_id, vec_id FROM ranked WHERE rank <= $k),
       |hits AS (SELECT exk.probe_id, COUNT(*) AS h
       |         FROM exk JOIN ivfk ON exk.probe_id = ivfk.probe_id
       |           AND exk.vec_id = ivfk.vec_id
       |         GROUP BY exk.probe_id)
       |SELECT p.probe_id,
       |  CAST(COALESCE(h, 0) AS BIGINT) AS n_hits,
       |  CAST(COALESCE(h, 0) AS DOUBLE) / $k AS recall
       |FROM (SELECT DISTINCT probe_id FROM exk) p
       |LEFT JOIN hits ON p.probe_id = hits.probe_id
       |ORDER BY p.probe_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_knn_sq — int8 scalar-quantized scan + exact re-rank
  // ---------------------------------------------------------------

  /** Symmetric int8 scalar quantization: unit-normalized components
    * lie in [-1, 1], so `round(x·127)` is an exact int8 code. The
    * integer-valued codes make the approximate score
    * `Σ qa·qb / 127²` ENGINE-EXACT (integer arithmetic in double
    * carriers), which keeps the candidate set differential-checkable. */
  private def quantize(v: Column): Column = transform(v, x => round(x * 127))

  /** Two-stage ANN, the quantization tier every production vector
    * store ships: (1) scan the int8-coded corpus for each probe's
    * top `k·refine` by approximate integer dot product, (2) re-rank
    * only those candidates with the exact double cosine.
    *
    * Scale posture (100 TB): stage 1 is the only corpus-wide pass and
    * it reads CODES — 4× less I/O than f32 vectors (the stored form
    * would be `array<tinyint>`; the arithmetic here runs in exact
    * integer-valued doubles so the oracle can replay it). Stage 2
    * re-fetches full vectors for only probes×k·refine ids — a narrow
    * equi-join. Same broadcast-probes / per-probe-heap shape as
    * [[knnExact]], with the heavy scan on the small representation. */
  def knnSq(spark: SparkSession, sfDir: String,
            numProbes: Int = 5, k: Int = 10, refine: Int = 4): DataFrame =
    knnSqNormed(embNormed(spark, sfDir), numProbes, k, refine)

  /** [[knnSq]] over any embeddings frame (normalizes inline). */
  def knnSqOf(embeddings: DataFrame, numProbes: Int = 5, k: Int = 10,
              refine: Int = 4): DataFrame =
    knnSqNormed(normalizeOf(embeddings), numProbes, k, refine)

  private def knnSqNormed(e: DataFrame, numProbes: Int, k: Int,
                          refine: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val q = e.select($"vec_id", quantize($"v").as("q"))
    val probesQ = q.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"q".as("pq"))
    // stage 1: approximate top k·refine per probe over the coded corpus
    val cands = q.join(broadcast(probesQ), $"vec_id" =!= $"probe_id")
      .withColumn("approx", dot($"q", $"pq"))
      .withColumn("arn", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"approx".desc, $"vec_id")))
      .filter($"arn" <= k * refine)
      .select($"probe_id", $"vec_id")
    // stage 2: exact re-rank of the candidate ids only
    val probesV = e.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    cands
      .join(e, "vec_id")
      .join(broadcast(probesV), "probe_id")
      .withColumn("cosine", round(dot($"v", $"pv"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"probe_id", $"rank")
  }

  def knnSqSql(numProbes: Int = 5, k: Int = 10, refine: Int = 4): String =
    s"""WITH e AS ($embNormedSql),
       |q AS (SELECT vec_id, list_transform(v, x -> round(x * 127)) AS q FROM e),
       |pq AS (SELECT vec_id AS probe_id, q AS pq FROM q WHERE vec_id < $numProbes),
       |cands AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |           row_number() OVER (PARTITION BY probe_id
       |             ORDER BY list_dot_product(q.q, pq.pq) DESC, vec_id) AS arn
       |    FROM q, pq WHERE vec_id <> probe_id)
       |  WHERE arn <= ${k * refine}
       |), pv AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < $numProbes),
       |ranked AS (
       |  SELECT c.probe_id, c.vec_id,
       |         round(list_dot_product(e.v, pv.pv), 6) AS cosine,
       |         row_number() OVER (PARTITION BY c.probe_id
       |           ORDER BY round(list_dot_product(e.v, pv.pv), 6) DESC, c.vec_id) AS rank
       |  FROM cands c
       |  JOIN e ON e.vec_id = c.vec_id
       |  JOIN pv ON pv.probe_id = c.probe_id
       |)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // llm_knn_pq — product-quantization ANN (ADC over a coded corpus)
  // ---------------------------------------------------------------

  val PqSubspaces = 8
  val PqSubDims: Int = Dims / PqSubspaces
  val PqCodes = 16
  val PqIters = 2

  // PQ codebooks are M tiny k-means models (k·d/M doubles each) and
  // depend only on the corpus path — driver-data cache, same idiom as
  // Clustering.modelCache
  // bounded like Clustering.modelCache: token-keyed entries from
  // regenerated corpora must not accumulate for the JVM's lifetime
  private val pqCache =
    new graft.util.BoundedMemo[Seq[Seq[Clustering.Centroid]]](64)

  /** One sub-codebook per disjoint `PqSubDims`-dim slice: Lloyd's on
    * the SLICED corpus, reusing [[Clustering.trainKmeansOf]] verbatim
    * so the oracle replays each training with the shared chain SQL.
    * Frame-parametric (the facade's PQ training entry); expects a
    * unit-normalized `(vec_id, v)` frame of [[Dims]] dims. */
  def trainPqOf(e: DataFrame): Seq[Seq[Clustering.Centroid]] = {
    val spark = e.sparkSession
    import spark.implicits._
    (0 until PqSubspaces).map { m =>
      Clustering.trainKmeansOf(
        e.select($"vec_id", slice($"v", m * PqSubDims + 1, PqSubDims).as("v")),
        PqCodes, PqIters)
    }
  }

  private def pqCodebooks(spark: SparkSession, sfDir: String): Seq[Seq[Clustering.Centroid]] =
    pqCache.getOrElseUpdate(s"$sfDir#${corpusToken(sfDir)}#$PqSubspaces#$PqCodes#$PqIters",
      trainPqOf(embNormed(spark, sfDir)))

  /** [[knnPq]] over any `(vec_id, embedding)` frame with
    * caller-trained codebooks (normalizes inline) — the
    * frame-parametric ADC search half. */
  def knnPqOf(embeddings: DataFrame, books: Seq[Seq[Clustering.Centroid]],
              numProbes: Int = 20, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = normalizeOf(embeddings)
    val probes = e.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    pqAdcRank(pqCodesLong(e, books), pqLut(probes, books), k)
  }

  /** Product-quantization ANN — the COMPRESSION tier of the ANN
    * ladder (LSH prunes by bucket, IVF prunes by cell, SQ shrinks
    * 8×, PQ shrinks ~64×): each vector is stored as `PqSubspaces`
    * small codes (nearest sub-centroid per disjoint slice), and a
    * probe scores candidates WITHOUT touching vectors — asymmetric
    * distance computation (ADC): dot(q, x) ≈ Σ_m LUT_m[code_m(x)]
    * where `LUT_m[c] = dot(q_m, centroid_{m,c})` (Jégou et al.,
    * IEEE TPAMI 2011).
    *
    * Scale posture (100 TB): the coded corpus is the ONLY
    * corpus-wide scan and it is `PqSubspaces` small ints per vector
    * — 64-dim f64 collapses to 4 codes; the LUT is
    * probes × subspaces × codes rows, broadcast; the ADC sum is one
    * partial+final aggregate over narrow rows. Training touches the
    * corpus `PqIters` times offline (same posture as IVF-kmeans).
    * The sub-dots are summed in FIXED subspace order (conditional
    * sums, then `p0+p1+p2+p3`) so both engines add identically
    * before the 6-dp round. */
  /** The coded corpus, long-form `(m, vec_id, code)`: per subspace a
    * map-side literal argmax (zero shuffle). Shared by [[knnPq]] and
    * [[knnIvfPq]]. */
  private def pqCodesLong(e: DataFrame, books: Seq[Seq[Clustering.Centroid]]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    (0 until PqSubspaces).map { m =>
      val em = e.select($"vec_id", slice($"v", m * PqSubDims + 1, PqSubDims).as("v"))
      Clustering.withCell(em, books(m))
        .select(lit(m).as("m"), $"vec_id", $"cell".as("code"))
    }.reduce(_ unionByName _)
  }

  /** The per-probe ADC lookup table `(probe_id, m, code, pdot)` —
    * probes × subspaces × codes rows, broadcast-sized by construction. */
  private def pqLut(probes: DataFrame, books: Seq[Seq[Clustering.Centroid]]): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val cbRows = books.zipWithIndex.flatMap { case (cs, m) =>
      cs.map(c => (m, c.cell, c.cv.toSeq)) }
    val cb = spark.createDataFrame(cbRows).toDF("m", "code", "cv")
    probes.join(cb)
      .select($"probe_id", $"m", $"code",
        dot(slice($"pv", $"m" * lit(PqSubDims) + lit(1), lit(PqSubDims)), $"cv")
          .as("pdot"))
  }

  /** ADC scoring + top-k cut over a `(m, vec_id, code)` coded frame
    * joined to a broadcast LUT: the M partials collapse map-side,
    * summed in FIXED subspace order before the 6-dp round. */
  private def pqAdcRank(codes: DataFrame, lut: DataFrame, k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val parts = (0 until PqSubspaces).map(m =>
      sum(when($"m" === m, $"pdot")).as(s"p$m"))
    val approx = (0 until PqSubspaces).map(m => col(s"p$m")).reduce(_ + _)
    // join on the DENSE self-packed key m·K + code (∈ [0, M·K), K =
    // PqCodes) instead of the (m, code) pair: Spark packs a two-int
    // key into one long whose broadcast hash map slots on the LOW
    // word — here `code`, only K distinct values, so every build row
    // crowded into K slot chains (the round-15 modularity
    // degeneracy). The dense packed key keys the map on M·K
    // consecutive values — its dense-array mode — and every
    // corpus-row probe is one index load. Same match set: (m, code)
    // ↔ m·K + code is a bijection on the code range.
    codes.withColumn("mc", $"m" * lit(PqCodes) + $"code")
      .join(broadcast(lut.withColumn("mc", $"m" * lit(PqCodes) + $"code")
        .drop("m", "code")), Seq("mc"))
      .filter($"vec_id" =!= $"probe_id")
      .groupBy($"probe_id", $"vec_id")
      .agg(parts.head, parts.tail: _*)
      .withColumn("approx_score", round(approx, 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"approx_score".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"approx_score")
      .orderBy($"probe_id", $"rank")
  }

  def knnPq(spark: SparkSession, sfDir: String,
            numProbes: Int = 20, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = embNormed(spark, sfDir)
    val books = pqCodebooks(spark, sfDir)
    val probes = e.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    pqAdcRank(pqCodesLong(e, books), pqLut(probes, books), k)
  }

  // -- shared PQ oracle-SQL fragments (used by knnPqSql, knnIvfPqSql,
  // pqErrorSql, knnPqRefineSql) --------------------------------------

  /** `e0..e{M-1}` slice CTEs over CTE `e`. */
  private def pqSlicesSql: String =
    (0 until PqSubspaces).map { m =>
      val a = m * PqSubDims + 1
      val b = (m + 1) * PqSubDims
      s"e$m AS (SELECT vec_id, v[$a:$b] AS v FROM e)"
    }.mkString(",\n")

  /** All M training chains (`q{m}c0..q{m}c$PqIters`). */
  private def pqChainsSql: String =
    (0 until PqSubspaces).map(m =>
      Clustering.kmeansChainSql(PqCodes, PqIters, s"e$m", s"q$m")).mkString(",\n")

  /** `cb(m, code, cv)`: the unioned final codebooks. */
  private def pqCbSql: String =
    (0 until PqSubspaces).map(m =>
      s"SELECT $m AS m, cell AS code, cv FROM q${m}c$PqIters")
      .mkString("cb AS (", "\n  UNION ALL ", ")")

  /** `codes(m, vec_id, code)`: the rounded-score argmax encode the
    * chain's assign step uses, against the FINAL centroids. */
  private def pqCodesSql: String =
    (0 until PqSubspaces).map { m =>
      s"""SELECT $m AS m, vec_id, cell AS code FROM (
         |    SELECT e.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_dot_product(e.v, c.cv)
         |               - 0.5 * list_dot_product(c.cv, c.cv), 6) DESC, c.cell) AS rn
         |    FROM e$m e, q${m}c$PqIters c) WHERE rn = 1""".stripMargin
    }.mkString("codes AS (", "\n  UNION ALL ", ")")

  private def pqLutSqlFragment: String =
    s"""lut AS (
       |  SELECT probe_id, m, code,
       |         list_dot_product(pv[m * $PqSubDims + 1 : (m + 1) * $PqSubDims], cv) AS pdot
       |  FROM probes, cb)""".stripMargin

  private def pqPartCols(qual: String = ""): String =
    (0 until PqSubspaces).map(m =>
      s"SUM(CASE WHEN ${qual}m = $m THEN pdot END) AS p$m").mkString(", ")

  private def pqPartSum: String =
    (0 until PqSubspaces).map(m => s"p$m").mkString(" + ")

  def knnPqSql(numProbes: Int = 20, k: Int = 5): String =
    s"""WITH e AS ($embNormedSql),
       |$pqSlicesSql,
       |$pqChainsSql,
       |$pqCbSql,
       |$pqCodesSql,
       |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < $numProbes),
       |$pqLutSqlFragment,
       |adc AS (
       |  SELECT l.probe_id, c.vec_id, ${pqPartCols()}
       |  FROM codes c JOIN lut l USING (m, code)
       |  WHERE c.vec_id <> l.probe_id
       |  GROUP BY l.probe_id, c.vec_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, round($pqPartSum, 6) AS approx_score,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY round($pqPartSum, 6) DESC, vec_id) AS rank
       |  FROM adc)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank,
       |       vec_id AS neighbor_id, approx_score
       |FROM ranked WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // llm_knn_pq_refine — two-stage PQ serve: ADC shortlist + exact
  // re-rank (how a PQ index actually answers queries)
  // ---------------------------------------------------------------

  /** The production PQ serve path: stage 1 shortlists each probe's
    * top `k·refine` candidates by ADC over the coded corpus (codes
    * only — the cheap, compressed scan); stage 2 re-ranks ONLY those
    * candidates with the exact cosine on full vectors. The two-stage
    * split is why PQ's lossy scores are acceptable in practice: the
    * quantizer only has to keep true neighbors inside the shortlist,
    * not rank them, and the refine factor buys shortlist recall at
    * linear cost. (Same shape as [[knnSq]]'s int8 two-stage; this is
    * its PQ counterpart with codes 8× smaller again.)
    *
    * Scale posture (100 TB): the only corpus-wide pass reads 8 small
    * ints per vector; stage 2 fetches full vectors for
    * probes × k·refine ids — a narrow equi-join against the corpus,
    * never a second scan of it. */
  def knnPqRefine(spark: SparkSession, sfDir: String,
                  numProbes: Int = 20, k: Int = 5,
                  refine: Int = 4): DataFrame = {
    import spark.implicits._
    val e = embNormed(spark, sfDir)
    val books = pqCodebooks(spark, sfDir)
    val probes = e.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    // stage 1: ADC shortlist (the PQ rank cut at k·refine)
    val shortlist = pqAdcRank(pqCodesLong(e, books), pqLut(probes, books), k * refine)
      .select($"probe_id", $"neighbor_id".as("vec_id"))
    // stage 2: exact re-rank of shortlist ids only
    shortlist
      .join(e, "vec_id")
      .join(broadcast(probes), "probe_id")
      .withColumn("cosine", round(dot($"v", $"pv"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"probe_id", $"rank")
  }

  def knnPqRefineSql(numProbes: Int = 20, k: Int = 5,
                     refine: Int = 4): String =
    s"""WITH e AS ($embNormedSql),
       |$pqSlicesSql,
       |$pqChainsSql,
       |$pqCbSql,
       |$pqCodesSql,
       |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < $numProbes),
       |$pqLutSqlFragment,
       |adc AS (
       |  SELECT l.probe_id, c.vec_id, ${pqPartCols()}
       |  FROM codes c JOIN lut l USING (m, code)
       |  WHERE c.vec_id <> l.probe_id
       |  GROUP BY l.probe_id, c.vec_id),
       |shortlist AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |           row_number() OVER (PARTITION BY probe_id
       |             ORDER BY round($pqPartSum, 6) DESC, vec_id) AS arn
       |    FROM adc)
       |  WHERE arn <= ${k * refine}),
       |ranked AS (
       |  SELECT s.probe_id, s.vec_id,
       |         round(list_dot_product(e.v, p.pv), 6) AS cosine,
       |         row_number() OVER (PARTITION BY s.probe_id
       |           ORDER BY round(list_dot_product(e.v, p.pv), 6) DESC, s.vec_id) AS rank
       |  FROM shortlist s
       |  JOIN e ON e.vec_id = s.vec_id
       |  JOIN probes p ON p.probe_id = s.probe_id)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank,
       |       vec_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // llm_pq_error — PQ codebook quality (reconstruction error)
  // ---------------------------------------------------------------

  /** Per-subspace mean squared reconstruction error of the PQ
    * codebooks — THE quality metric of a product quantizer (Faiss
    * reports it per training run): for each vector slice, the
    * squared distance to its assigned sub-centroid,
    * `‖v_m‖² − 2·v_m·c + ‖c‖²`, averaged over the corpus. Rising
    * error on a new corpus slice is the retrain signal; the
    * per-subspace split shows WHICH slice of the embedding space the
    * codebook no longer covers.
    *
    * Scale posture: one pass over the sliced corpus joined to its
    * own code assignment (both narrow, same key) and the broadcast
    * codebook; the output is `PqSubspaces` rows. */
  def pqError(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = embNormed(spark, sfDir)
    val books = pqCodebooks(spark, sfDir)
    val slices = (0 until PqSubspaces).map { m =>
      e.select($"vec_id", lit(m).as("m"),
        slice($"v", m * PqSubDims + 1, PqSubDims).as("vm"))
    }.reduce(_ unionByName _)
    val cbRows = books.zipWithIndex.flatMap { case (cs, m) =>
      cs.map(c => (m, c.cell, c.cv.toSeq)) }
    val cb = spark.createDataFrame(cbRows).toDF("m", "code", "cv")
    slices
      .join(pqCodesLong(e, books), Seq("vec_id", "m"))
      // dense self-packed codebook key (see pqAdcRank): the (m, code)
      // pair would pack into a long slotted on the K-valued low word
      .withColumn("mc", $"m" * lit(PqCodes) + $"code")
      .join(broadcast(cb.withColumn("mc", $"m" * lit(PqCodes) + $"code")
        .drop("m", "code")), Seq("mc"))
      .withColumn("se",
        dot($"vm", $"vm") - lit(2.0) * dot($"vm", $"cv") + dot($"cv", $"cv"))
      .groupBy($"m")
      .agg(count(lit(1)).as("n_vectors"),
        round(avg($"se"), 6).as("mse"))
      .select($"m".cast("long").as("subspace"), $"n_vectors", $"mse")
      .orderBy($"subspace")
  }

  def pqErrorSql(): String = {
    val subs = 0 until PqSubspaces
    val slices = pqSlicesSql
    val chains = pqChainsSql
    // per subspace: assign (the chain's rounded argmax against the
    // final centroids), then the squared reconstruction distance
    val per = subs.map { m =>
      s"""SELECT $m AS m, vec_id, v,
         |       cv FROM (
         |    SELECT e.vec_id, e.v, c.cv,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_dot_product(e.v, c.cv)
         |               - 0.5 * list_dot_product(c.cv, c.cv), 6) DESC, c.cell) AS rn
         |    FROM e$m e, q${m}c$PqIters c) WHERE rn = 1""".stripMargin
    }.mkString("assigned AS (", "\n  UNION ALL ", ")")
    s"""WITH e AS ($embNormedSql),
       |$slices,
       |$chains,
       |$per
       |SELECT CAST(m AS BIGINT) AS subspace, COUNT(*) AS n_vectors,
       |       round(avg(list_dot_product(v, v)
       |             - 2.0 * list_dot_product(v, cv)
       |             + list_dot_product(cv, cv)), 6) AS mse
       |FROM assigned GROUP BY m ORDER BY subspace""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_knn_negatives — hard-negative mining for retrieval training
  // ---------------------------------------------------------------

  /** Hard-negative mining — the training-data generation step behind
    * dense-retriever training (DPR's BM25 negatives, ANCE's
    * ANN-refreshed negatives): for each probe, skip the top
    * `skipTop` exact-cosine neighbors (presumed positives /
    * near-duplicates of the query) and emit the next `numNeg` — the
    * high-similarity-but-not-top band that makes contrastive
    * training hard. Output rows carry the band rank (1-based within
    * the negative band) so a sampler can weight by difficulty.
    *
    * Scale posture: identical to [[knnExact]] — broadcast probe set,
    * ONE corpus scan, per-probe bounded heap (`row_number ≤
    * skipTop+numNeg` is the native group-limit shape); the band
    * filter is a post-cut projection, so mining negatives costs
    * exactly one top-(skipTop+numNeg) pass. */
  def knnNegatives(spark: SparkSession, sfDir: String,
                   numProbes: Int = 20, skipTop: Int = 5,
                   numNeg: Int = 10): DataFrame = {
    import spark.implicits._
    val e = embNormed(spark, sfDir)
    val probes = e.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    e.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cosine", round(dot($"v", $"pv"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" > skipTop && $"rank" <= skipTop + numNeg)
      .select($"probe_id", ($"rank" - skipTop).cast("long").as("neg_rank"),
        $"vec_id".as("negative_id"), $"cosine")
      .orderBy($"probe_id", $"neg_rank")
  }

  def knnNegativesSql(numProbes: Int = 20, skipTop: Int = 5,
                      numNeg: Int = 10): String =
    s"""WITH e AS ($embNormedSql),
       |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < $numProbes),
       |scored AS (
       |  SELECT probe_id, vec_id, round(list_dot_product(v, pv), 6) AS cosine
       |  FROM e, probes WHERE vec_id <> probe_id
       |), ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored
       |)
       |SELECT probe_id, CAST(rank - $skipTop AS BIGINT) AS neg_rank,
       |       vec_id AS negative_id, cosine
       |FROM ranked WHERE rank > $skipTop AND rank <= ${skipTop + numNeg}
       |ORDER BY probe_id, neg_rank""".stripMargin

  // ---------------------------------------------------------------
  // llm_knn_ivfpq — the composed Faiss-style index: IVF cells prune
  // candidates, PQ codes score the survivors
  // ---------------------------------------------------------------

  /** IVF+PQ: the canonical billion-scale ANN layout (Jégou et al.'s
    * IVFADC) — a trained coarse quantizer routes each probe to its
    * `nprobe` nearest cells, and ONLY vectors in those cells are
    * scored, by PQ code lookup (ADC), never by touching the raw
    * vectors. Both halves are this library's existing operators
    * composed: the [[knnIvfKmeans]] cell structure over
    * [[Clustering.kmeansModel]], and [[knnPq]]'s coded corpus + LUT.
    * (Codes quantize the raw vectors, not cell residuals — the
    * simpler of the two published IVFADC variants; documented so the
    * oracle's replay stays one shared chain per codebook.)
    *
    * Scale posture (100 TB): candidates per probe are bounded by
    * cell occupancy × nprobe AND scored at 8 ints per vector — the
    * two orthogonal cost cuts multiply: IVF reads ~nprobe/cells of
    * the corpus, PQ reads ~1/64 of each vector's bytes. The coarse
    * routing table (k cells) and the ADC LUT both broadcast; the
    * only corpus-proportional frames are the cell assignment and the
    * coded corpus, both narrow, both joined on their co-located key. */
  def knnIvfPq(spark: SparkSession, sfDir: String,
               numProbes: Int = 20, k: Int = 5,
               nprobe: Int = IvfNProbe): DataFrame = {
    import spark.implicits._
    val e = embNormed(spark, sfDir)
    val coarse = Clustering.kmeansModel(spark, sfDir)
    val centroids = coarse.map(c => (c.cell, c.cv)).toDF("cell", "cv")
    val books = pqCodebooks(spark, sfDir)
    // cell route per probe: nprobe nearest coarse cells (same rounded
    // ranking as the IVF serve path)
    val probes = e.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    val probeCells = probes.join(broadcast(centroids))
      .withColumn("cos_c", round(dot($"pv", $"cv"), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cos_c".desc, $"cell")))
      .filter($"rn" <= nprobe)
      .select($"probe_id", $"cell")
    // candidate pairs: probes meet ONLY their routed cells' members
    val cands = ivfAssign(e, centroids).select($"vec_id", $"cell")
      .join(broadcast(probeCells), "cell")
      .select($"probe_id", $"vec_id")
    // ADC over candidates: code rows join the bounded candidate set
    // first (narrow ⋈ narrow), then the broadcast LUT
    val parts = (0 until PqSubspaces).map(m =>
      sum(when($"m" === m, $"pdot")).as(s"p$m"))
    val approx = (0 until PqSubspaces).map(m => col(s"p$m")).reduce(_ + _)
    pqCodesLong(e, books)
      .join(cands, "vec_id")
      .filter($"vec_id" =!= $"probe_id")
      .join(broadcast(pqLut(probes, books)), Seq("probe_id", "m", "code"))
      .groupBy($"probe_id", $"vec_id")
      .agg(parts.head, parts.tail: _*)
      .withColumn("approx_score", round(approx, 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"approx_score".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"approx_score")
      .orderBy($"probe_id", $"rank")
  }

  def knnIvfPqSql(numProbes: Int = 20, k: Int = 5,
                  kCells: Int = Clustering.K,
                  coarseIters: Int = Clustering.Iters,
                  nprobe: Int = IvfNProbe): String = {
    val slices = pqSlicesSql
    val chains = pqChainsSql
    val cb = pqCbSql
    val codes = pqCodesSql
    val partCols = pqPartCols("cd.")
    val partSum = pqPartSum
    s"""WITH e AS ($embNormedSql),
       |${Clustering.kmeansChainSql(kCells, coarseIters)},
       |centroids AS (SELECT cell, cv FROM c$coarseIters),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY round(list_dot_product(e.v, c.cv), 6) DESC, c.cell) AS rn
       |    FROM e, centroids c)
       |  WHERE rn = 1),
       |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < $numProbes),
       |probe_cells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT p.probe_id, c.cell,
       |           row_number() OVER (PARTITION BY p.probe_id
       |             ORDER BY round(list_dot_product(p.pv, c.cv), 6) DESC, c.cell) AS rn
       |    FROM probes p, centroids c)
       |  WHERE rn <= $nprobe),
       |cands AS (
       |  SELECT pc.probe_id, a.vec_id
       |  FROM assign a JOIN probe_cells pc USING (cell)
       |  WHERE a.vec_id <> pc.probe_id),
       |$slices,
       |$chains,
       |$cb,
       |$codes,
       |lut AS (
       |  SELECT probe_id, m, code,
       |         list_dot_product(pv[m * $PqSubDims + 1 : (m + 1) * $PqSubDims], cv) AS pdot
       |  FROM probes, cb),
       |adc AS (
       |  SELECT cd.probe_id, cd.vec_id, $partCols
       |  FROM (SELECT ca.probe_id, c.vec_id, c.m, c.code
       |        FROM codes c JOIN cands ca USING (vec_id)) cd
       |  JOIN lut l ON l.probe_id = cd.probe_id
       |            AND l.m = cd.m AND l.code = cd.code
       |  GROUP BY cd.probe_id, cd.vec_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, round($partSum, 6) AS approx_score,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY round($partSum, 6) DESC, vec_id) AS rank
       |  FROM adc)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank,
       |       vec_id AS neighbor_id, approx_score
       |FROM ranked WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_knn_label_eval — embedding quality via label consistency
  // ---------------------------------------------------------------

  /** Embedding-quality evaluation by kNN label consistency: each of
    * the first `numProbes` vectors is classified by the MAJORITY
    * label of its `k` exact cosine neighbors (ties to the smaller
    * label) and compared to its own label — the standard
    * label-agreement probe of an embedding space (neighbors sharing
    * labels ⇒ the geometry respects the labeling). Output per true
    * label: probes, correct votes, accuracy.
    *
    * Scale posture: the probe set is parameter-bounded, so its
    * broadcast is justified at any corpus size; ONE corpus scan
    * scores all probes, the per-probe `row_number() ≤ k` cut is the
    * native-heap rewrite shape, and everything after the cut is
    * ≤ numProbes·k rows. */
  def knnLabelEval(spark: SparkSession, sfDir: String,
                   numProbes: Int = 32, k: Int = 10): DataFrame = {
    import spark.implicits._
    require(numProbes >= 1 && k >= 1, "probes and k must be >= 1")
    val el = embNormed(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"label".cast("long").as("lb")), "vec_id")
    val probes = el.filter($"vec_id" < numProbes)
      .select($"vec_id".as("probe_id"), $"v".as("pv"), $"lb".as("own"))
    val ranked = el.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cosine", round(dot($"v", $"pv"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= k)
    val pred = ranked
      .groupBy($"probe_id", $"own", $"lb").agg(count(lit(1)).as("nv"))
      .withColumn("r", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"nv".desc, $"lb")))
      .filter($"r" === 1)
    pred.groupBy($"own".as("label"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when($"lb" === $"own", 1).otherwise(0)).cast("long")
          .as("n_correct"))
      .withColumn("accuracy",
        round($"n_correct".cast("double") / $"n_probes", 6))
      .orderBy($"label")
  }

  def knnLabelEvalSql(numProbes: Int = 32, k: Int = 10): String =
    s"""WITH e AS ($embNormedSql),
       |el AS (SELECT e.vec_id, e.v, CAST(m.label AS BIGINT) AS lb
       |       FROM e JOIN embeddings m ON e.vec_id = m.vec_id),
       |probes AS (SELECT vec_id AS probe_id, v AS pv, lb AS own
       |           FROM el WHERE vec_id < $numProbes),
       |ranked AS (
       |  SELECT probe_id, own, lb,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY round(list_dot_product(v, pv), 6) DESC, vec_id)
       |           AS rank
       |  FROM el, probes WHERE el.vec_id <> probe_id
       |), votes AS (
       |  SELECT probe_id, own, lb, COUNT(*) AS nv
       |  FROM ranked WHERE rank <= $k GROUP BY probe_id, own, lb
       |), pred AS (
       |  SELECT probe_id, own, lb,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY nv DESC, lb) AS r
       |  FROM votes)
       |SELECT own AS label, COUNT(*) AS n_probes,
       |  CAST(SUM(CASE WHEN lb = own THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct,
       |  round(SUM(CASE WHEN lb = own THEN 1 ELSE 0 END)::DOUBLE / COUNT(*),
       |        6) AS accuracy
       |FROM pred WHERE r = 1 GROUP BY own ORDER BY label""".stripMargin

  // ---------------------------------------------------------------
  // llm_embed_qa — embedding-table hygiene report
  // ---------------------------------------------------------------

  /** Embedding hygiene per label — the QA card an embedding table is
    * checked against before any ANN index is built over it: vector
    * counts, dimension consistency (a ragged table silently breaks
    * every dot product), zero-norm vectors (cosine-undefined — they
    * poison normalization), and the L2-norm envelope. Per-row norms
    * are bit-identical across engines (the codegen'd dot walks the
    * array in order, as does `list_dot_product`); only the norm
    * AVERAGE is order-sensitive and rounds to 4 dp.
    *
    * Scale: one scan, per-row codegen'd dot, one partial+final
    * aggregate on the label key. */
  def embedQaOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings
      .select($"label", size($"embedding").cast("long").as("dim"),
        sqrt(dot(vd($"embedding"), vd($"embedding"))).as("nrm"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        min($"dim").as("min_dim"), max($"dim").as("max_dim"),
        sum(when($"nrm" === 0.0, 1L).otherwise(0L)).as("n_zero"),
        round(avg($"nrm"), 4).as("avg_norm"),
        round(min($"nrm"), 4).as("min_norm"),
        round(max($"nrm"), 4).as("max_norm"))
      .orderBy($"label")
  }

  def embedQa(spark: SparkSession, sfDir: String): DataFrame =
    embedQaOf(Tables.embeddings(spark, sfDir))

  val embedQaSql: String =
    """WITH n AS (SELECT label, len(embedding) AS dim,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(MIN(dim) AS BIGINT) AS min_dim,
      |  CAST(MAX(dim) AS BIGINT) AS max_dim,
      |  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  round(AVG(nrm), 4) AS avg_norm,
      |  round(MIN(nrm), 4) AS min_norm,
      |  round(MAX(nrm), 4) AS max_norm
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------
  // llm_embed_pca — top principal component by power iteration
  // ---------------------------------------------------------------

  /** Power-iteration count — enough for clear spectral gaps; each
    * iteration re-rounds the direction to 6 dp (the GD/PageRank
    * discipline) so cross-engine sum-order noise cannot compound. */
  val PcaIters = 8

  /** Top principal component of the embedding cloud by distributed
    * power iteration — the anisotropy probe run before whitening or
    * dimensionality reduction (a dominant direction with a high
    * explained fraction usually means an uncentered or degenerate
    * embedding model; see Mu & Viswanath 2018 on all-but-the-top).
    *
    * The matrix `XᵀX` is NEVER materialized: each iteration computes
    * `w = Σᵢ (xᵢ·v)·xᵢ` as one map-side pass — a per-row in-order dot
    * against the broadcast direction literal plus a d-wide
    * partial+final aggregate — so the driver holds exactly d doubles
    * and the executors stream the corpus once per iteration. That is
    * the 100-TB shape: d² work per ROW, never d² state, never a
    * shuffle wider than one d-column row.
    *
    * Output: the unit loading vector, the covariance eigenvalue
    * `‖w‖/n`, and the explained-variance fraction `‖w‖/trace`. */
  private val pcaSchema =
    "dim BIGINT, loading DOUBLE, eigenvalue DOUBLE, explained_frac DOUBLE"

  def embedPcaOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val x0 = embeddings.select(vd($"embedding").as("x"))
    val firstRow = x0.select(size($"x")).limit(1).collect()
    if (firstRow.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(pcaSchema))
    val d = firstRow.head.getInt(0)
    val xs = frameCache.getOrElseUpdate(spark,
      graft.util.FrameCache.key("pca-x", x0))(x0.cache())
    val mu = xs.select((1 to d).map(k =>
      round(avg(element_at($"x", k)), 6).as(s"m$k")): _*)
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val muArr = array(mu.map(lit): _*)
    val centered = frameCache.getOrElseUpdate(spark,
      graft.util.FrameCache.key("pca-c", x0))(
      xs.select(zip_with($"x", muArr, (a, b) => a - b).as("cx")).cache())
    val (v, lambda) = powerIterate(centered, d)
    val nv = centered.agg(count(lit(1)).cast("double").as("n"),
      sum(dot($"cx", $"cx")).as("tv")).head()
    val (n, totVar) = (nv.getDouble(0), nv.getDouble(1))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val eig = r4(lambda / n)
    val expl = if (totVar == 0.0) 0.0 else r4(lambda / totVar)
    v.zipWithIndex
      .map { case (l, i) => (i + 1L, l, eig, expl) }.toSeq
      .toDF("dim", "loading", "eigenvalue", "explained_frac")
      .orderBy($"dim")
  }

  def embedPca(spark: SparkSession, sfDir: String): DataFrame =
    embedPcaOf(Tables.embeddings(spark, sfDir))

  /** One distributed power-iteration solve over a centered frame:
    * returns the rounded unit direction and the raw ‖w‖ of the last
    * step (≈ the XᵀX eigenvalue). Shared by [[embedPcaOf]]'s shape
    * and the deflated second solve in [[embedSpectrumOf]]. */
  private def powerIterate(centered: DataFrame, d: Int): (Array[Double], Double) = {
    val spark = centered.sparkSession
    import spark.implicits._
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to PcaIters) {
      // one codegen'd dot score per row + ONE vec_axpy aggregate
      // column (not d sum() columns — [[graft.functions.VectorAxpyAgg]])
      val s = dot(col("cx"), array(v.map(lit): _*))
      val w = centered.select(col("cx"), s.as("s"))
        .agg(graft.functions.VectorExpressions.vec_axpy($"cx", $"s").as("w"))
        .head().getSeq[Double](0).toArray
      lambda = math.sqrt(w.map(a => a * a).sum)
      // all-identical vectors center to zero: ‖w‖ = 0 and the update
      // is undefined — the direction is arbitrary, keep the previous
      // one and report the (correct) zero eigenvalue
      if (lambda == 0.0) return (v, 0.0)
      v = w.map(a => BigDecimal(a / lambda)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    (v, lambda)
  }

  // ---------------------------------------------------------------
  // llm_embed_spectrum — top-2 spectrum by deflated power iteration
  // ---------------------------------------------------------------

  /** Top-2 covariance spectrum via BLOCK (subspace) power iteration
    * (round-10, replacing the deflated two-loop route): both
    * directions advance in the SAME corpus pass — one aggregate per
    * iteration computes `w₁ = Σ(cx·v₁)cx` and `w₂ = Σ(cx·v₂)cx` as a
    * single 2d-column partial+final sum, then the driver
    * orthonormalizes the 2-column block by Gram–Schmidt (q₁ = w₁/‖w₁‖,
    * q₂ = (w₂−(q₁·w₂)q₁)/‖·‖ — the QR of a d×2 matrix, 2d doubles of
    * driver state). Iteration count is unchanged but the corpus passes
    * HALVE: [[PcaIters]] aggregates total instead of 2×[[PcaIters]]
    * plus a projection pass — at 100 TB spectrum cost is pass count ×
    * scan cost, so this is a 2× on the dominant term. The deflated
    * route survives as [[embedSpectrumDeflatedOf]] and the
    * equivalence spec pins block ≈ deflated on the catalog cloud.
    *
    * The λ₂/λ₁ ratio is the isotropy read: ≈1 means no dominant
    * anisotropy axis, ≪1 means the cloud is rod-shaped and wants
    * the all-but-the-top correction before cosine retrieval.
    *
    * Convergence caveat, by design: [[PcaIters]] fixed iterations
    * resolve the components only as fast as the spectral gap — on a
    * near-degenerate (isotropic) spectrum the two reported values
    * approach each other and their ORDER is not meaningful (the
    * ratio may round past 1). That is the correct reading, not an
    * error: ratio ≈ 1 IS the "no dominant axis" answer.
    *
    * Determinism (the GD/PageRank discipline): each direction
    * re-rounds to 6 dp per iteration, final values report at 4 dp —
    * both engines' sum-order noise (~1e-15 relative) dies at the
    * grain, and [[embedSpectrumSql]] replays the identical block
    * chain. Degenerate input (‖w‖ = 0) keeps the previous direction
    * with a zero eigenvalue on BOTH sides (the SQL mirrors carry
    * explicit CASE guards — advisor r9). */
  def embedSpectrumOf(embeddings: DataFrame): DataFrame =
    spectrumFrom(embeddings) { (centered, d) => blockIterate(centered, d) }

  /** Pre-round-10 deflated route (power-iterate, Hotelling-deflate,
    * power-iterate again — 2×[[PcaIters]]+1 corpus passes), kept as
    * the independent second opinion the block/deflated equivalence
    * spec compares against. */
  private[graft] def embedSpectrumDeflatedOf(embeddings: DataFrame): DataFrame =
    spectrumFrom(embeddings) { (centered, d) =>
      val (v1, l1) = powerIterate(centered, d)
      val v1Arr = array(v1.map(lit): _*)
      val deflated = centered
        .withColumn("pj", dot(col("cx"), v1Arr))
        .select(zip_with(col("cx"), v1Arr, (a, b) => a - col("pj") * b).as("cx"))
      val (_, l2) = powerIterate(deflated, d)
      (l1, l2)
    }

  /** Shared spectrum scaffold: cache + center the cloud, run `solve`
    * for (λ₁, λ₂), emit the 2-row spectrum card. */
  private def spectrumFrom(embeddings: DataFrame)(
      solve: (DataFrame, Int) => (Double, Double)): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val x0 = embeddings.select(vd($"embedding").as("x"))
    val firstRow = x0.select(size($"x")).limit(1).collect()
    if (firstRow.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "component BIGINT, eigenvalue DOUBLE, " +
            "explained_frac DOUBLE, isotropy_ratio DOUBLE"))
    val d = firstRow.head.getInt(0)
    val xs = frameCache.getOrElseUpdate(spark,
      graft.util.FrameCache.key("pca-x", x0))(x0.cache())
    val mu = xs.select((1 to d).map(k =>
      round(avg(element_at($"x", k)), 6).as(s"m$k")): _*)
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val centered = frameCache.getOrElseUpdate(spark,
      graft.util.FrameCache.key("pca-c", x0))(
      xs.select(zip_with($"x", array(mu.map(lit): _*), (a, b) => a - b)
        .as("cx")).cache())
    val (l1, l2) = solve(centered, d)
    val n = centered.count().toDouble
    val tv = centered.agg(sum(dot($"cx", $"cx"))).head().getDouble(0)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def frac(a: Double, b: Double) = if (b == 0.0) 0.0 else r4(a / b)
    Seq(
      (1L, r4(l1 / n), frac(l1, tv), frac(l2, l1)),
      (2L, r4(l2 / n), frac(l2, tv), frac(l2, l1)))
      .toDF("component", "eigenvalue", "explained_frac", "isotropy_ratio")
      .orderBy($"component")
  }

  /** Alternating-sign second init direction — deterministic, unit
    * norm, guaranteed not collinear with the uniform first init. */
  private def altInit(d: Int): Array[Double] =
    Array.tabulate(d)(i => (if (i % 2 == 0) 1.0 else -1.0) / math.sqrt(d.toDouble))

  /** One block subspace iteration loop: [[PcaIters]] corpus passes,
    * each ONE 2d-column aggregate; driver-side Gram–Schmidt per pass
    * with per-iteration 6-dp rounding. Returns (λ₁, λ₂) = the LAST
    * pass's pre-normalization norms (‖w₁‖, ‖w₂−(q₁·w₂)q₁‖), the
    * XᵀX eigenvalue estimates at convergence. */
  private[graft] def blockIterate(centered: DataFrame, d: Int): (Double, Double) = {
    import centered.sparkSession.implicits._
    def round6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var v1 = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var v2 = altInit(d)
    var l1 = 0.0
    var l2 = 0.0
    for (_ <- 1 to PcaIters) {
      // per pass: two codegen'd dot scores per row, ONE vec_axpy
      // aggregate column carrying both stacked w vectors (2d-column
      // sum() would blow the codegen field budget — see
      // [[graft.functions.VectorAxpyAgg]])
      val s1 = dot(col("cx"), array(v1.map(lit): _*))
      val s2 = dot(col("cx"), array(v2.map(lit): _*))
      val stacked = centered
        .select(col("cx"), s1.as("s1"), s2.as("s2"))
        .agg(graft.functions.VectorExpressions
          .vec_axpy($"cx", $"s1", $"s2").as("w"))
        .head().getSeq[Double](0)
      val w1 = stacked.slice(0, d).toArray
      val w2 = stacked.slice(d, 2 * d).toArray
      l1 = math.sqrt(w1.map(a => a * a).sum)
      // ‖w‖ = 0 (all-identical cloud, or a direction the cloud is
      // exactly orthogonal to): keep the previous direction, report
      // the (correct) zero eigenvalue — mirrored by the SQL CASE
      val q1 = if (l1 == 0.0) v1 else w1.map(a => round6(a / l1))
      val proj = {
        var s = 0.0; var k = 0
        while (k < d) { s += q1(k) * w2(k); k += 1 } // in-order, = list_dot_product
        s
      }
      val w2o = Array.tabulate(d)(k => w2(k) - proj * q1(k))
      l2 = math.sqrt(w2o.map(a => a * a).sum)
      val q2 = if (l2 == 0.0) v2 else w2o.map(a => round6(a / l2))
      v1 = q1
      v2 = q2
    }
    (l1, l2)
  }

  def embedSpectrum(spark: SparkSession, sfDir: String): DataFrame =
    embedSpectrumOf(Tables.embeddings(spark, sfDir))

  /** Oracle: exact replay of the BLOCK chain [[blockIterate]] runs —
    * per iteration one 2-score pass over the centered frame, the two
    * pos-summed w vectors, then the Gram–Schmidt normalize with the
    * same 6-dp rounding. Divisors are CASE-guarded: a degenerate
    * (constant) cloud keeps the previous direction with zero
    * eigenvalue instead of dividing by zero (advisor r9). */
  def embedSpectrumSql(d: Int = 64): String = {
    def iter(i: Int): String =
      s"""s$i AS (SELECT cx,
         |    list_dot_product(cx, (SELECT v FROM av${i - 1})) AS s1,
         |    list_dot_product(cx, (SELECT v FROM bv${i - 1})) AS s2
         |  FROM c),
         |u$i AS (SELECT generate_subscripts(cx, 1) AS pos, unnest(cx) AS val,
         |          s1, s2 FROM s$i),
         |w1_$i AS MATERIALIZED (SELECT list(w ORDER BY pos) AS w FROM (
         |  SELECT pos, SUM(val * s1) AS w FROM u$i GROUP BY pos)),
         |w2_$i AS MATERIALIZED (SELECT list(w ORDER BY pos) AS w FROM (
         |  SELECT pos, SUM(val * s2) AS w FROM u$i GROUP BY pos)),
         |av$i AS MATERIALIZED (
         |  SELECT CASE WHEN list_dot_product(w, w) = 0
         |         THEN (SELECT v FROM av${i - 1})
         |         ELSE list_transform(w,
         |           x -> round(x / sqrt(list_dot_product(w, w)), 6)) END AS v
         |  FROM w1_$i),
         |w2o_$i AS MATERIALIZED (
         |  SELECT [w2.w[k] - list_dot_product(q.v, w2.w) * q.v[k]
         |          for k in range(1, len(w2.w) + 1)] AS w
         |  FROM w2_$i w2 CROSS JOIN av$i q),
         |bv$i AS MATERIALIZED (
         |  SELECT CASE WHEN list_dot_product(w, w) = 0
         |         THEN (SELECT v FROM bv${i - 1})
         |         ELSE list_transform(w,
         |           x -> round(x / sqrt(list_dot_product(w, w)), 6)) END AS v
         |  FROM w2o_$i)""".stripMargin
    s"""WITH xx AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
       |mu AS MATERIALIZED (SELECT list(m ORDER BY pos) AS mu FROM (
       |  SELECT pos, round(AVG(val), 6) AS m FROM (
       |    SELECT generate_subscripts(x, 1) AS pos, unnest(x) AS val
       |    FROM xx) GROUP BY pos)),
       |c AS MATERIALIZED (
       |  SELECT [x[i] - mu[i] for i in range(1, len(x) + 1)] AS cx
       |  FROM xx CROSS JOIN mu),
       |av0 AS (SELECT [1.0 / sqrt($d.0) for i in range(1, ${d + 1})] AS v),
       |bv0 AS (SELECT [(CASE WHEN i % 2 = 1 THEN 1.0 ELSE -1.0 END)
       |                / sqrt($d.0) for i in range(1, ${d + 1})] AS v),
       |${(1 to PcaIters).map(iter).mkString(",\n")},
       |nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |         SUM(list_dot_product(cx, cx)) AS tv FROM c),
       |l1 AS (SELECT sqrt(list_dot_product(w, w)) AS l FROM w1_$PcaIters),
       |l2 AS (SELECT sqrt(list_dot_product(w, w)) AS l FROM w2o_$PcaIters)
       |SELECT component,
       |  round(lam / n, 4) AS eigenvalue,
       |  CASE WHEN tv = 0 THEN 0.0 ELSE round(lam / tv, 4) END AS explained_frac,
       |  CASE WHEN l1.l = 0 THEN 0.0 ELSE round(l2.l / l1.l, 4) END AS isotropy_ratio
       |FROM (SELECT CAST(1 AS BIGINT) AS component, (SELECT l FROM l1) AS lam
       |      UNION ALL SELECT CAST(2 AS BIGINT), (SELECT l FROM l2))
       |CROSS JOIN nv CROSS JOIN l1 CROSS JOIN l2
       |ORDER BY component""".stripMargin
  }

  /** Oracle replay of the identical iteration chain; `d` is the
    * catalog table's embedding width. Divisors CASE-guarded like
    * [[embedSpectrumSql]] (degenerate cloud ⇒ keep previous
    * direction, zero eigenvalue — the Scala powerIterate contract). */
  def embedPcaSql(d: Int = 64): String = {
    def iter(i: Int): String = {
      val (pv, w, vn) = (s"v${i - 1}", s"w$i", s"v$i")
      s"""s$i AS (SELECT cx, list_dot_product(cx, (SELECT v FROM $pv)) AS s
         |        FROM c),
         |u$i AS (SELECT generate_subscripts(cx, 1) AS pos, unnest(cx) AS val,
         |          s FROM s$i),
         |$w AS MATERIALIZED (SELECT list(w ORDER BY pos) AS w FROM (
         |  SELECT pos, SUM(val * s) AS w FROM u$i GROUP BY pos)),
         |$vn AS MATERIALIZED (
         |  SELECT CASE WHEN list_dot_product(w, w) = 0
         |         THEN (SELECT v FROM $pv)
         |         ELSE list_transform(w,
         |           x -> round(x / sqrt(list_dot_product(w, w)), 6)) END AS v
         |  FROM $w)""".stripMargin
    }
    s"""WITH xx AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
       |mu AS MATERIALIZED (SELECT list(m ORDER BY pos) AS mu FROM (
       |  SELECT pos, round(AVG(val), 6) AS m FROM (
       |    SELECT generate_subscripts(x, 1) AS pos, unnest(x) AS val
       |    FROM xx) GROUP BY pos)),
       |c AS MATERIALIZED (
       |  SELECT [x[i] - mu[i] for i in range(1, len(x) + 1)] AS cx
       |  FROM xx CROSS JOIN mu),
       |v0 AS (SELECT [1.0 / sqrt($d.0) for i in range(1, ${d + 1})] AS v),
       |${(1 to PcaIters).map(iter).mkString(",\n")},
       |nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |         SUM(list_dot_product(cx, cx)) AS tv FROM c),
       |lam AS (SELECT sqrt(list_dot_product(w, w)) AS l FROM w$PcaIters)
       |SELECT CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
       |  unnest(v) AS loading,
       |  round(l / n, 4) AS eigenvalue,
       |  CASE WHEN tv = 0 THEN 0.0 ELSE round(l / tv, 4) END AS explained_frac
       |FROM v$PcaIters CROSS JOIN nv CROSS JOIN lam ORDER BY dim""".stripMargin
  }
}

