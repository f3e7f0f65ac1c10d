package graft.operators

import graft.functions.Hashing._
import graft.functions.TextAnalysis._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface the reference lacks entirely (its
  * only text op is splitting a cast string on ",",
  * `Code/mapReduce.erl:140-143`): corpus statistics, top terms,
  * language ID, quality scoring, token accounting, fingerprinting.
  *
  * Scale posture (100 TB): every query is scan → per-row codegen'd
  * scalar work → one partial+final hash aggregate on a low-cardinality
  * key (lang / quality bucket / term). No joins, no UDFs, no driver
  * materialization; `explode`d term streams shrink map-side before the
  * shuffle. Top-N finishes with TakeOrderedAndProject, not a global
  * sort.
  */
object TextAnalytics {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  // Named tuning defaults, referenced by BOTH the Scala operators and
  // their oracle SQL (and by the composed pipeline's chain on both
  // sides) — a change here propagates everywhere or nowhere; a
  // literal re-typed in one place is exactly how an oracle silently
  // diverges from the operator it checks.
  val DecontamBenchK = 25
  val DecontamNgram = 5
  val DecontamSalt = 31
  val MixAlphaDefault = 0.3
  val KmvKDefault = 256
  val PackCtxDefault = 512
  val PackShardsDefault = 4

  // the shared session-keyed frame cache (the Dedup/Graph idiom) for
  // the few operators here whose intermediate feeds multiple branches
  private val frameCache = new graft.util.FrameCache()

  private def cached(stage: String, df: DataFrame): DataFrame =
    frameCache.getOrElseUpdate(df.sparkSession,
      graft.util.FrameCache.key(stage, df))(df.cache())

  // ---------------------------------------------------------------
  // llm_text_stats — per-language corpus statistics
  // ---------------------------------------------------------------

  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .withColumn("n_tokens", size(tokens($"text")).cast("long"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("total_chars"),
        sum($"n_tokens").cast("long").as("total_tokens"),
        (sum($"n_tokens").cast("double") / count(lit(1))).as("avg_tokens"),
        min($"n_chars").cast("long").as("min_chars"),
        max($"n_chars").cast("long").as("max_chars"))
      .orderBy($"lang")
  }

  val textStatsSql: String =
    s"""WITH d AS (SELECT lang, n_chars, len($tokensSql) AS n_tokens FROM documents)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
       |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_top_terms — global top-20 terms
  // ---------------------------------------------------------------

  /** explode → partial+final count → top-N. The final `orderBy+limit`
    * compiles to TakeOrderedAndProject (per-partition heap + driver
    * merge of N rows), not a global sort — the safe top-k shape at
    * any corpus size. */
  def topTerms(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select(explode(tokens($"text")).as("term"))
      .groupBy($"term")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term")
      .limit(k)
  }

  def topTermsSql(k: Int = 20): String =
    s"""SELECT term, COUNT(*) AS n
       |FROM (SELECT unnest($tokensSql) AS term FROM documents)
       |GROUP BY term ORDER BY n DESC, term LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // llm_lang_id — stopword-marker language ID vs the labeled column
  // ---------------------------------------------------------------

  /** Confusion matrix of the marker heuristic against the `lang`
    * label. Scoring is a per-row intersect against literal arrays —
    * zero joins; honest on this synthetic corpus (word-salad text
    * mostly scores as English or unknown regardless of label). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // The CASE references each score up to 4 times (and the und-arm
    // all 5), so inlining `langScore(dt, l)` would plant up to 15
    // copies of the tokenize+intersect subtree in one projection.
    // Hoist `dt` and each score into its own column instead: CASE
    // then compares attributes, and CollapseProject keeps non-cheap
    // expressions referenced more than once in their own Project, so
    // each is evaluated exactly once per row.
    val langs = langMarkers.map(_._1)
    val withDt = docs(spark, sfDir)
      .withColumn("dt", array_distinct(tokens($"text")))
    val scored = langs.foldLeft(withDt) { (df, l) =>
      df.withColumn(s"s_$l", langScore($"dt", l))
    }
    val s = langs.map(l => l -> col(s"s_$l")).toMap
    val predicted =
      when(s("en") === 0 && s("es") === 0 && s("de") === 0 &&
        s("fr") === 0 && s("zh") === 0, lit("und"))
        .when(s("en") >= s("es") && s("en") >= s("de") &&
          s("en") >= s("fr") && s("en") >= s("zh"), lit("en"))
        .when(s("es") >= s("de") && s("es") >= s("fr") && s("es") >= s("zh"), lit("es"))
        .when(s("de") >= s("fr") && s("de") >= s("zh"), lit("de"))
        .when(s("fr") >= s("zh"), lit("fr"))
        .otherwise(lit("zh"))
    scored
      .withColumn("predicted", predicted)
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"predicted")
  }

  val langIdSql: String = {
    val dt = s"list_distinct($tokensSql)"
    def sc(l: String) = langScoreSql("dt", l)
    s"""WITH d AS (SELECT lang, $dt AS dt FROM documents),
       |scored AS (SELECT lang,
       |  ${sc("en")} AS s_en, ${sc("es")} AS s_es, ${sc("de")} AS s_de,
       |  ${sc("fr")} AS s_fr, ${sc("zh")} AS s_zh FROM d)
       |SELECT lang,
       |  CASE
       |    WHEN s_en=0 AND s_es=0 AND s_de=0 AND s_fr=0 AND s_zh=0 THEN 'und'
       |    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       |    WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |    WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
       |    WHEN s_fr >= s_zh THEN 'fr'
       |    ELSE 'zh'
       |  END AS predicted,
       |  COUNT(*) AS n_docs
       |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_quality_score — heuristic quality buckets
  // ---------------------------------------------------------------

  /** Length / word-shape / stopword-ratio heuristics folded into a
    * quality bucket, reported as a bucket histogram. All features are
    * integer-derived so the double ratios are bit-identical across
    * engines. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nWords   = regexp_count($"text", lit("\\w+")).cast("long")
    val nPunct   = regexp_count($"text", lit("[.,;:!?]")).cast("long")
    val wordChars = length(regexp_replace(lower($"text"), "\\W+", "")).cast("long")
    val stopHits = langScore(array_distinct(tokens($"text")), "en").cast("long")
    val featured = docs(spark, sfDir)
      .withColumn("n_words", nWords)
      .withColumn("n_punct", nPunct)
      .withColumn("mean_wlen",
        wordChars.cast("double") / greatest(nWords, lit(1L)))
      .withColumn("stop_hits", stopHits)
    val quality =
      when($"n_words" >= 30 && $"mean_wlen" >= 3.0 && $"mean_wlen" <= 8.0
        && $"stop_hits" > 0, lit("good"))
        .when($"n_words" >= 10, lit("fair"))
        .otherwise(lit("poor"))
    featured
      .withColumn("quality", quality)
      .groupBy($"quality")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum($"n_words").cast("double") / count(lit(1))).as("avg_words"),
        sum($"n_punct").cast("long").as("total_punct"))
      .orderBy($"quality")
  }

  val qualityScoreSql: String =
    s"""WITH f AS (SELECT
       |  len(regexp_extract_all(text, '\\w+')) AS n_words,
       |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       |  length(regexp_replace(lower(text), '\\W+', '', 'g'))::DOUBLE
       |    / greatest(len(regexp_extract_all(text, '\\w+')), 1) AS mean_wlen,
       |  ${langScoreSql(s"list_distinct($tokensSql)", "en")} AS stop_hits
       |  FROM documents)
       |SELECT CASE
       |    WHEN n_words >= 30 AND mean_wlen >= 3.0 AND mean_wlen <= 8.0
       |         AND stop_hits > 0 THEN 'good'
       |    WHEN n_words >= 10 THEN 'fair'
       |    ELSE 'poor' END AS quality,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_words) AS DOUBLE) / COUNT(*) AS avg_words,
       |  CAST(SUM(n_punct) AS BIGINT) AS total_punct
       |FROM f GROUP BY 1 ORDER BY quality""".stripMargin

  // ---------------------------------------------------------------
  // llm_token_count — per-document token accounting
  // ---------------------------------------------------------------

  /** Whitespace tokens, word tokens, and a BPE-ish subword count
    * (greedy ≤4-char word chunks — the standard "chars/4" budget
    * estimate, computed exactly). Pure per-row codegen; at 100 TB
    * this is the map side of any token-budget accounting job. */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir).select(
      $"doc_id",
      regexp_count($"text", lit("\\S+")).cast("long").as("ws_tokens"),
      regexp_count($"text", lit("\\w+")).cast("long").as("word_tokens"),
      regexp_count($"text", lit("\\w{1,4}")).cast("long").as("subword_tokens"),
      $"n_chars".cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS word_tokens,
      |  CAST(len(regexp_extract_all(text, '\w{1,4}')) AS BIGINT) AS subword_tokens,
      |  CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_fingerprint — shingle-hash document fingerprints
  // ---------------------------------------------------------------

  /** Rolling word-3-gram hash fingerprint per document: the min hash
    * (winnowing-style representative), the exact sum (order-free
    * checksum; 32-bit values keep any realistic document far inside
    * BIGINT), and the shingle count. Shingle duplicates are kept so
    * repeated passages weight the checksum. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"doc_id", explode(shingles(tokens($"text"), 3)).as("sh"))
      .select($"doc_id", md5i32($"sh", 0).as("h"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        min($"h").as("fp_min"),
        sum($"h").cast("long").as("fp_sum"))
      .orderBy($"doc_id")
  }

  /** HyperLogLog register geometry, shared with the oracle SQL.
    * p=10 → m=1024 registers (~1 KB per group); rho is computed from
    * the low HllW bits of the 32-bit md5 hash, so the max register
    * value is HllR = HllW+1. */
  val HllP = 10
  val HllM: Int = 1 << HllP
  val HllW: Int = 32 - HllP
  val HllR: Int = HllW + 1
  /** Standard HLL bias constant α_m for m ≥ 128, materialized as a
    * Scala double and re-serialized at full precision into the oracle
    * SQL, so both engines start the estimate from the bit-identical
    * constant. */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)
  /** α's companion: m²·2^HllR, exact in double (a power of two). */
  val HllM2R: Double = HllM.toDouble * HllM.toDouble * (1L << HllR).toDouble

  /** HyperLogLog approximate distinct-shingle counts per language,
    * with the ENTIRE register state differentially checked: the
    * registers ride the engine-neutral [[Hashing.md5i32]] (register
    * index = high HllP hash bits, rho = leading-zero rank of the low
    * HllW bits), so the DuckDB oracle rebuilds the same m=1024
    * register values and the same estimate — unlike Spark's built-in
    * `approx_count_distinct`, whose xxhash64 layout can't leave the
    * JVM (that engine-internal sketch is still certified by the
    * tolerance-band twin [[approxDistinctBound]]).
    *
    * Output: `n_zero` (empty registers) and `s_scaled` =
    * Σ_j 2^(HllR − M_j) — the harmonic denominator scaled by 2^HllR
    * so it is an integer, exact and summation-order-invariant in
    * BIGINT (the float harmonic sum would round differently across
    * merge orders). `est_distinct` applies the standard estimator:
    * linear counting when raw ≤ 2.5m with zero registers present,
    * else α·m²·2^HllR / s_scaled; every arithmetic step after the
    * integer state is written identically in both engines (IEEE ops
    * on identical inputs), so the estimate hash-matches too. The
    * 2³²-range correction is omitted: at n ≥ 2³²/30 distinct
    * shingles per group, move to p=14+ registers, not a correction.
    *
    * Scale contract: groupBy(lang, idx) carries ≤ m rows per group
    * per task after map-side combine — fixed-size sketch state, one
    * pass, no shuffle of the raw shingle stream; registers merge by
    * MAX, so partial sketches from 1000 executors combine exactly. */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    approxDistinctOf(docs(spark, sfDir))

  def approxDistinctOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val mask = (1L << HllW) - 1
    val regs = documents
      .select($"lang", explode(shingles(tokens($"text"), 3)).as("sh"))
      .select($"lang", md5i32($"sh", 0).as("h"))
      .select($"lang", shiftright($"h", HllW).as("idx"),
        $"h".bitwiseAND(lit(mask)).as("w"))
      .select($"lang", $"idx",
        when($"w" === 0L, lit(HllR.toLong))
          .otherwise(lit((HllW + 1).toLong) - length(expr("bin(w)")).cast("long"))
          .as("rho"))
      .groupBy($"lang", $"idx")
      .agg(max($"rho").as("mj"))
    regs
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllR - mj)")).as("s_used"))
      .select($"lang",
        (lit(HllM.toLong) - $"n_used").as("n_zero"),
        ($"s_used" + (lit(HllM.toLong) - $"n_used") * lit(1L << HllR))
          .as("s_scaled"))
      .withColumn("raw_est", lit(HllAlpha) * lit(HllM2R) / $"s_scaled".cast("double"))
      .select($"lang", $"n_zero", $"s_scaled",
        when($"raw_est" <= lit(2.5 * HllM) && $"n_zero" > 0L,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / $"n_zero".cast("double")))
          .otherwise($"raw_est").as("est_distinct"))
      .orderBy($"lang")
  }

  /** Oracle of [[approxDistinct]]: replays register build, scaled
    * harmonic sum, and estimator branch from the same md5 bits. */
  def approxDistinctSql(): String = {
    val alpha = java.lang.Double.toString(HllAlpha)
    val m2r = java.lang.Double.toString(HllM2R)
    s"""WITH t AS (SELECT lang, $tokensSql AS ts FROM documents),
       |sh AS (SELECT lang, unnest(${shingles3Sql("ts")}) AS sh FROM t),
       |bits AS (SELECT lang, h >> $HllW AS idx, h & ${(1L << HllW) - 1} AS w
       |         FROM (SELECT lang, ${md5i32Sql("sh", 0)} AS h FROM sh)),
       |regs AS (
       |  SELECT lang, idx,
       |    MAX(CASE WHEN w = 0 THEN $HllR
       |        ELSE ${HllW + 1} - (length(bin(w)) - position('1' IN bin(w)) + 1)
       |        END) AS mj
       |  FROM bits GROUP BY 1, 2),
       |agg AS (
       |  SELECT lang, COUNT(*) AS n_used,
       |    SUM(1::BIGINT << ($HllR - mj)) AS s_used
       |  FROM regs GROUP BY lang),
       |fin AS (
       |  SELECT lang, $HllM - n_used AS n_zero,
       |    s_used + ($HllM - n_used) * ${1L << HllR} AS s_scaled
       |  FROM agg),
       |est AS (
       |  SELECT lang, n_zero, s_scaled,
       |    $alpha * $m2r / CAST(s_scaled AS DOUBLE) AS raw_est
       |  FROM fin)
       |SELECT lang, CAST(n_zero AS BIGINT) AS n_zero,
       |  CAST(s_scaled AS BIGINT) AS s_scaled,
       |  CASE WHEN raw_est <= ${2.5 * HllM} AND n_zero > 0
       |       THEN ${HllM.toDouble} * ln(${HllM.toDouble} / CAST(n_zero AS DOUBLE))
       |       ELSE raw_est END AS est_distinct
       |FROM est ORDER BY lang""".stripMargin
  }

  /** Driver-witnessed error bound for [[approxDistinct]]: per
    * language, the exact distinct count plus `within_bound` = |HLL −
    * exact| ≤ `bound`·exact. The oracle computes the same exact
    * counts and a literal TRUE, so a hash match certifies BOTH that
    * the exact counts agree across engines AND that every sketch
    * estimate met the bound — the sketch itself never has to leave
    * the engine. Diagnostic query only: production ships the sketch
    * ([[approxDistinct]]); this one pays the exact distinct to
    * certify it. */
  def approxDistinctBound(spark: SparkSession, sfDir: String,
                          rsd: Double = 0.02, bound: Double = 0.05): DataFrame = {
    import spark.implicits._
    // ONE shingle pass: sketch + exact share the same explode (the
    // exact twin is diagnostic-only; paying the tokenize+shingle
    // pipeline twice doubled the scan for no information)
    docs(spark, sfDir)
      .select($"lang", explode(shingles(tokens($"text"), 3)).as("sh"))
      .groupBy($"lang")
      .agg(
        approx_count_distinct($"sh", rsd).as("approx_shingles"),
        count_distinct($"sh").as("exact_shingles"))
      .select($"lang", $"exact_shingles",
        (abs($"approx_shingles" - $"exact_shingles").cast("double")
          <= $"exact_shingles".cast("double") * bound).as("within_bound"))
      .orderBy($"lang")
  }

  def approxDistinctBoundSql(): String =
    s"""WITH t AS (SELECT lang, $tokensSql AS ts FROM documents)
       |SELECT lang,
       |  CAST(COUNT(DISTINCT sh) AS BIGINT) AS exact_shingles,
       |  TRUE AS within_bound
       |FROM (SELECT lang, unnest(${shingles3Sql("ts")}) AS sh FROM t)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Exact twin of [[approxDistinct]] for the spec's error-bound
    * check only — never shipped as a query (the exact distinct is the
    * scale-killer the sketch exists to avoid). */
  def exactDistinctShingles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"lang", explode(shingles(tokens($"text"), 3)).as("sh"))
      .groupBy($"lang")
      .agg(count_distinct($"sh").as("exact_shingles"))
      .orderBy($"lang")
  }

  /** KMV distinct-shingle sketch per language — the differentially
    * checkable sibling of [[approxDistinct]]. Same scale contract as
    * HLL (fixed ≤ k-long state per group, associative merge, one
    * pass, the raw shingle stream never shuffles whole), but the
    * sketch rides the engine-neutral [[Hashing.md5i32]] hash, so the
    * oracle reproduces the EXACT retained minima and estimate with
    * `row_number() ≤ k` over distinct hashes — the sketch contents
    * are hash-checked, not tolerance-banded. `kth_min` is the k-th
    * smallest retained hash (the estimator's denominator, NULL below
    * capacity); `est_distinct` = (k−1)·2³² div kth_min, integer-exact
    * on both engines. */
  def approxDistinctKmv(spark: SparkSession, sfDir: String,
                        k: Int = KmvKDefault): DataFrame = {
    import spark.implicits._
    import graft.functions.KMinValues._
    docs(spark, sfDir)
      .select($"lang", explode(shingles(tokens($"text"), 3)).as("sh"))
      .select($"lang", md5i32($"sh", 0).as("h"))
      .groupBy($"lang")
      .agg(k_min_values($"h", k).as("kmv"))
      .select($"lang",
        size($"kmv").cast("long").as("n_kept"),
        when(size($"kmv") === k, element_at($"kmv", k)).as("kth_min"),
        kmvEstimate($"kmv", k).as("est_distinct"))
      .orderBy($"lang")
  }

  def approxDistinctKmvSql(k: Int = KmvKDefault): String =
    s"""WITH t AS (SELECT lang, $tokensSql AS ts FROM documents),
       |sh AS (SELECT lang, unnest(${shingles3Sql("ts")}) AS sh FROM t),
       |h AS (SELECT DISTINCT lang, ${md5i32Sql("sh", 0)} AS h FROM sh),
       |r AS (SELECT lang, h,
       |        row_number() OVER (PARTITION BY lang ORDER BY h) AS rk,
       |        COUNT(*) OVER (PARTITION BY lang) AS nd
       |      FROM h)
       |SELECT lang,
       |  CAST(LEAST(nd, $k) AS BIGINT) AS n_kept,
       |  MAX(CASE WHEN rk = $k THEN h END) AS kth_min,
       |  CASE WHEN nd < $k THEN CAST(nd AS BIGINT)
       |       ELSE ${(k - 1).toLong * graft.functions.KMinValues.HashDomain}
       |            // MAX(CASE WHEN rk = $k THEN h END) END AS est_distinct
       |FROM r GROUP BY lang, nd ORDER BY lang""".stripMargin

  /** Corpus-level distinct estimate by MERGING the per-language KMV
    * sketches — the sketch-algebra path a 1000-executor rollup takes:
    * partial sketches combine by array-union + re-truncate-to-k, so
    * the corpus estimate costs one pass over ≤ k·|groups| retained
    * longs, NEVER a rescan of the raw shingle stream. The merged
    * sketch is EXACTLY the sketch a direct global pass would build
    * (any global top-k minimum is within its own group's top-k, so
    * the union of per-group minima contains every global minimum —
    * spec-pinned), and the oracle replays the merge literally:
    * per-lang `row_number() ≤ k`, union-distinct, re-rank. */
  def approxDistinctKmvMerged(spark: SparkSession, sfDir: String,
                              k: Int = KmvKDefault): DataFrame = {
    import spark.implicits._
    import graft.functions.KMinValues._
    val perGroup = docs(spark, sfDir)
      .select($"lang", explode(shingles(tokens($"text"), 3)).as("sh"))
      .select($"lang", md5i32($"sh", 0).as("h"))
      .groupBy($"lang")
      .agg(k_min_values($"h", k).as("kmv"))
    perGroup
      .select($"lang", explode($"kmv").as("h"))
      .agg(countDistinct($"lang").cast("long").as("n_groups"),
        k_min_values($"h", k).as("kmv"))
      .select($"n_groups",
        size($"kmv").cast("long").as("n_kept"),
        when(size($"kmv") === k, element_at($"kmv", k)).as("kth_min"),
        kmvEstimate($"kmv", k).as("est_distinct"))
  }

  def approxDistinctKmvMergedSql(k: Int = KmvKDefault): String =
    s"""WITH t AS (SELECT lang, $tokensSql AS ts FROM documents),
       |sh AS (SELECT lang, unnest(${shingles3Sql("ts")}) AS sh FROM t),
       |hl AS (SELECT DISTINCT lang, ${md5i32Sql("sh", 0)} AS h FROM sh),
       |r AS (SELECT lang, h,
       |        row_number() OVER (PARTITION BY lang ORDER BY h) AS rk
       |      FROM hl),
       |m AS (SELECT DISTINCT h FROM r WHERE rk <= $k),
       |g AS (SELECT h, row_number() OVER (ORDER BY h) AS rk,
       |        COUNT(*) OVER () AS nd
       |      FROM m)
       |SELECT (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM hl)
       |         AS n_groups,
       |  CAST(LEAST(nd, $k) AS BIGINT) AS n_kept,
       |  MAX(CASE WHEN rk = $k THEN h END) AS kth_min,
       |  CASE WHEN nd < $k THEN CAST(nd AS BIGINT)
       |       ELSE ${(k - 1).toLong * graft.functions.KMinValues.HashDomain}
       |            // MAX(CASE WHEN rk = $k THEN h END) END AS est_distinct
       |FROM g GROUP BY nd""".stripMargin

  /** Pairwise source-overlap estimates from KMV sketches ALONE — the
    * set-algebra payoff of the sketch family: once per-source
    * sketches exist (one corpus pass, ≤ k longs each), every pairwise
    * union estimate is an array merge and every intersection follows
    * by inclusion–exclusion (|A∩B| ≈ Â + B̂ − Û), so auditing all
    * |sources|² overlaps costs a |sources|-row self-join of sketch
    * rows — NEVER a corpus-scale pair join (contrast
    * `llm_cross_source_dupes`, which finds the individual duplicate
    * PAIRS and pays the banded join for them). Output is integer end
    * to end (`overlap_permille` = 1000·Î div Û), so the oracle
    * replays every pair bit-for-bit. The pair join is group-quadratic
    * (≤ |sources|² sketch rows), not corpus-quadratic — the sketch
    * side broadcasts at any corpus size. */
  def kmvSourceOverlap(spark: SparkSession, sfDir: String,
                       k: Int = KmvKDefault): DataFrame =
    kmvSourceOverlapOf(docs(spark, sfDir), k)

  /** [[kmvSourceOverlap]] over any `(source, text)` frame. */
  def kmvSourceOverlapOf(documents: DataFrame, k: Int = KmvKDefault): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    import graft.functions.KMinValues._
    val sk = documents
      .select($"source", explode(shingles(tokens($"text"), 3)).as("sh"))
      .select($"source", md5i32($"sh", 0).as("h"))
      .groupBy($"source")
      .agg(k_min_values($"h", k).as("kmv"))
    val pairs = sk.select($"source".as("src_a"), $"kmv".as("ka"))
      .join(broadcast(sk.select($"source".as("src_b"), $"kmv".as("kb"))),
        $"src_a" < $"src_b")
      .withColumn("u",
        slice(array_sort(array_distinct(concat($"ka", $"kb"))), 1, k))
    val estInter =
      greatest(kmvEstimate($"ka", k) + kmvEstimate($"kb", k)
        - kmvEstimate($"u", k), lit(0L))
    pairs
      .select($"src_a", $"src_b",
        kmvEstimate($"ka", k).as("est_a"),
        kmvEstimate($"kb", k).as("est_b"),
        kmvEstimate($"u", k).as("est_union"),
        estInter.as("est_inter"))
      .withColumn("overlap_permille",
        when($"est_union" === 0L, lit(0L))
          .otherwise(expr("est_inter * 1000 DIV est_union")))
      .orderBy($"src_a", $"src_b")
  }

  def kmvSourceOverlapSql(k: Int = KmvKDefault): String = {
    val c = (k - 1).toLong * graft.functions.KMinValues.HashDomain
    s"""WITH t AS (SELECT source, $tokensSql AS ts FROM documents),
       |sh AS (SELECT source, unnest(${shingles3Sql("ts")}) AS sh FROM t),
       |hs AS (SELECT DISTINCT source, ${md5i32Sql("sh", 0)} AS h FROM sh),
       |r AS (SELECT source, h,
       |        row_number() OVER (PARTITION BY source ORDER BY h) AS rk,
       |        COUNT(*) OVER (PARTITION BY source) AS nd
       |      FROM hs),
       |est AS (SELECT source,
       |    CASE WHEN MAX(nd) < $k THEN CAST(MAX(nd) AS BIGINT)
       |         ELSE $c // MAX(CASE WHEN rk = $k THEN h END) END AS est
       |  FROM r GROUP BY source),
       |m AS (SELECT source, h FROM r WHERE rk <= $k),
       |p AS (SELECT a.source AS src_a, b.source AS src_b
       |      FROM est a JOIN est b ON a.source < b.source),
       |uh AS (SELECT DISTINCT p.src_a, p.src_b, m.h
       |       FROM p JOIN m ON m.source = p.src_a OR m.source = p.src_b),
       |ur AS (SELECT src_a, src_b, h,
       |         row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk,
       |         COUNT(*) OVER (PARTITION BY src_a, src_b) AS nd
       |       FROM uh),
       |uest AS (SELECT src_a, src_b,
       |    CASE WHEN MAX(nd) < $k THEN CAST(MAX(nd) AS BIGINT)
       |         ELSE $c // MAX(CASE WHEN rk = $k THEN h END) END AS est_union
       |  FROM ur GROUP BY src_a, src_b)
       |SELECT u.src_a, u.src_b, ea.est AS est_a, eb.est AS est_b,
       |  u.est_union,
       |  GREATEST(ea.est + eb.est - u.est_union, 0) AS est_inter,
       |  CASE WHEN u.est_union = 0 THEN 0
       |       ELSE GREATEST(ea.est + eb.est - u.est_union, 0) * 1000
       |            // u.est_union END AS overlap_permille
       |FROM uest u
       |JOIN est ea ON ea.source = u.src_a
       |JOIN est eb ON eb.source = u.src_b
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_quantile_sketch — bounded-sample quantiles, oracle-exact
  // ---------------------------------------------------------------

  val QsketchSDefault = 256

  /** Per-language document-length quantiles (p25/p50/p75/p90 of
    * `n_chars`) estimated from a BOUNDED hash-sample — the quantile
    * member of the sketch family, shadowing Spark's engine-internal
    * `approx_percentile` (rows-only checkable, like HLL) the way the
    * KMV sketch shadows HLL: the sample is the `s` rows with the
    * smallest engine-neutral md5 hash of `doc_id` per group, so the
    * oracle replays the EXACT retained rows and rank-arithmetic
    * estimates — integer end to end, hash-compared, never
    * tolerance-banded.
    *
    * Scale contract: bottom-s-by-hash is associative exactly like
    * KMV's bottom-k minima (any global minimum is inside its own
    * partition's bottom-s, so partial samples union + re-truncate),
    * and the retention runs through the native bounded-heap
    * [[graft.plans.TopKPerKey]] operator — one shuffle on `lang`,
    * O(s·groups) state, no per-partition sort, the corpus never
    * sorts globally (the scale-killer exact per-group quantiles pay
    * in `rel_quantiles`). The estimate at p is the sample value at
    * rank ⌈m·p/100⌉ (m = retained rows): empirical-CDF inversion,
    * whose error concentrates as √(p(1−p)/s) — spec-checked against
    * the exact quantiles at a deliberately truncating s. */
  def quantileSketch(spark: SparkSession, sfDir: String,
                     s: Int = QsketchSDefault): DataFrame =
    quantileSketchOf(docs(spark, sfDir), s)

  /** [[quantileSketch]] over any `(doc_id, lang, n_chars)` frame. */
  def quantileSketchOf(documents: DataFrame, s: Int = QsketchSDefault): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(s >= 1, s"sample size must be >= 1, got $s")
    val keyed = documents.select($"lang", $"doc_id", $"n_chars",
      md5i32($"doc_id".cast("string"), 23).as("h"))
    val samp = org.apache.spark.sql.GraftSqlBridge.topKPerKey(
      keyed, Seq(keyed("lang")), Seq(keyed("h").asc, keyed("doc_id").asc), s)
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n_chars".asc, $"doc_id".asc)
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    val ps = Seq(25, 50, 75, 90).toDF("p")
    samp
      .withColumn("vr", row_number().over(byVal).cast("long"))
      .withColumn("m", count(lit(1)).over(byLang))
      .crossJoin(broadcast(ps))
      // ⌈m·p/100⌉ in pure integer arithmetic — `div`, not `/` (which
      // widens to double on Spark and would diverge from DuckDB's //)
      .filter($"vr" === expr("(m * p + 99) div 100"))
      .select($"lang", $"p".cast("long").as("p"), $"m".as("n_sampled"),
        $"n_chars".as("est_n_chars"))
      .orderBy($"lang", $"p")
  }

  /** Corpus-level quantiles by MERGING the per-language bottom-s
    * samples — the rollup path a 1000-executor fleet takes: partial
    * samples union and re-truncate to the global bottom-s (any
    * global minimum-hash row is inside its own group's bottom-s, the
    * KMV-merge argument verbatim), so the corpus estimate costs one
    * pass over ≤ s·|groups| retained rows, never a rescan of the
    * corpus. Merged ≡ the direct global sample — spec-pinned — and
    * the oracle replays the merge literally. */
  def quantileSketchMerged(spark: SparkSession, sfDir: String,
                           s: Int = QsketchSDefault): DataFrame = {
    import spark.implicits._
    val keyed = docs(spark, sfDir).select($"lang", $"doc_id", $"n_chars",
      md5i32($"doc_id".cast("string"), 23).as("h"))
    val perGroup = org.apache.spark.sql.GraftSqlBridge.topKPerKey(
      keyed, Seq(keyed("lang")), Seq(keyed("h").asc, keyed("doc_id").asc), s)
    val g = perGroup.withColumn("g", lit(1))
    val merged = org.apache.spark.sql.GraftSqlBridge.topKPerKey(
      g, Seq(g("g")), Seq(g("h").asc, g("doc_id").asc), s)
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"n_chars".asc, $"doc_id".asc)
    val ps = Seq(25, 50, 75, 90).toDF("p")
    merged
      .withColumn("vr", row_number().over(byVal).cast("long"))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")))
      .crossJoin(broadcast(ps))
      .filter($"vr" === expr("(m * p + 99) div 100"))
      .select($"p".cast("long").as("p"), $"m".as("n_sampled"),
        $"n_chars".as("est_n_chars"))
      .orderBy($"p")
  }

  def quantileSketchMergedSql(s: Int = QsketchSDefault): String =
    s"""WITH d AS (SELECT lang, doc_id, n_chars,
       |    ${md5i32Sql("CAST(doc_id AS VARCHAR)", 23)} AS h
       |  FROM documents),
       |r AS (SELECT lang, doc_id, n_chars, h,
       |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
       |      FROM d),
       |m0 AS (SELECT doc_id, n_chars, h FROM r WHERE rk <= $s),
       |g AS (SELECT doc_id, n_chars,
       |        row_number() OVER (ORDER BY h, doc_id) AS rk
       |      FROM m0),
       |v AS (SELECT n_chars, doc_id,
       |        row_number() OVER (ORDER BY n_chars, doc_id) AS vr,
       |        COUNT(*) OVER () AS m
       |      FROM g WHERE rk <= $s)
       |SELECT CAST(p AS BIGINT) AS p, CAST(m AS BIGINT) AS n_sampled,
       |  n_chars AS est_n_chars
       |FROM v, (VALUES (25), (50), (75), (90)) q(p)
       |WHERE vr = (m * p + 99) // 100
       |ORDER BY p""".stripMargin

  def quantileSketchSql(s: Int = QsketchSDefault): String =
    s"""WITH d AS (SELECT lang, doc_id, n_chars,
       |    ${md5i32Sql("CAST(doc_id AS VARCHAR)", 23)} AS h
       |  FROM documents),
       |r AS (SELECT lang, doc_id, n_chars,
       |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
       |      FROM d),
       |v AS (SELECT lang, doc_id, n_chars,
       |        row_number() OVER (PARTITION BY lang
       |          ORDER BY n_chars, doc_id) AS vr,
       |        COUNT(*) OVER (PARTITION BY lang) AS m
       |      FROM r WHERE rk <= $s)
       |SELECT lang, CAST(p AS BIGINT) AS p, CAST(m AS BIGINT) AS n_sampled,
       |  n_chars AS est_n_chars
       |FROM v, (VALUES (25), (50), (75), (90)) q(p)
       |WHERE vr = (m * p + 99) // 100
       |ORDER BY lang, p""".stripMargin

  /** TF-IDF: top-3 characteristic terms per document. Term
    * frequencies and document frequencies are two hash aggregates
    * (term-per-doc, then term); idf joins back by term — at corpus
    * scale the df table is small (vocabulary-sized) and broadcasts.
    * The corpus size `n` stays IN-PLAN as a broadcast 1-row cross
    * join (mirroring the oracle's `n` CTE) — no eager driver action
    * fires at query-construction time. Scores rounded to 4 decimals:
    * `ln` is the one non-exact scalar here and libm implementations
    * may differ in the last ulp. */
  def tfidf(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    // cached: feeds both the tf aggregate and the df distinct-count —
    // one tokenize scan (shares the unigramLogprob cache discipline)
    val terms = cached("tfidfTerms",
      docs(spark, sfDir)
        .select($"doc_id", explode(tokens($"text")).as("term")))
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = terms.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs(spark, sfDir).agg(count(lit(1)).cast("double").as("n"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round($"tf" * log(($"n" + 1.0) / ($"df" + 1.0)), 4))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"score".desc, $"term")))
      .filter($"rank" <= k)
      .select($"doc_id", $"rank".cast("long").as("rank"), $"term", $"score")
      .orderBy($"doc_id", $"rank")
  }

  def tfidfSql(k: Int = 3): String =
    s"""WITH terms AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(*) AS df
       |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |         round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 4) AS score
       |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
       |), ranked AS (
       |  SELECT doc_id, term, score,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM scored
       |)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score
       |FROM ranked WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  /** Stratified deterministic sampling: N docs per language, ranked
    * by content hash — the balanced-sample builder for training
    * mixes. Reproducible across runs/engines and partition layouts
    * (unlike `sampleBy`); one window per stratum key. */
  def stratifiedSample(spark: SparkSession, sfDir: String, perLang: Int = 20): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang")
          .orderBy(md5i32($"text", 7), $"doc_id")))
      .filter($"rk" <= perLang)
      .select($"lang", $"rk".cast("long").as("rk"), $"doc_id")
      .orderBy($"lang", $"rk")
  }

  def stratifiedSampleSql(perLang: Int = 20): String =
    s"""SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id FROM (
       |  SELECT lang, doc_id,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY ${md5i32Sql("text", 7)}, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $perLang ORDER BY lang, rk""".stripMargin

  /** Data-quality constraint check — the expectation gate a pipeline
    * runs before accepting a batch: key uniqueness, non-null/non-empty
    * payloads, metadata consistency (n_chars == length(text)), domain
    * membership. One scan, one row of violation counts; zero means
    * the batch passes. All counts are exact and engine-neutral. */
  def dataQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, sfDir)
    val dupKeys = d.groupBy($"doc_id").agg(count(lit(1)).as("c"))
      .filter($"c" > 1).agg(coalesce(sum($"c"), lit(0L)).as("v")).select($"v")
    val rowChecks = d.agg(
      sum(when($"text".isNull || length($"text") === 0, 1L).otherwise(0L))
        .cast("long").as("empty_text"),
      sum(when($"n_chars" =!= length($"text"), 1L).otherwise(0L))
        .cast("long").as("bad_n_chars"),
      sum(when(!$"lang".isin("en", "es", "de", "fr", "zh"), 1L).otherwise(0L))
        .cast("long").as("bad_lang"),
      count(lit(1)).as("n_rows"))
    rowChecks.join(dupKeys.select($"v".as("dup_key_rows")))
  }

  val dataQualitySql: String =
    """WITH dup AS (
      |  SELECT COALESCE(SUM(c), 0) AS dup_key_rows FROM (
      |    SELECT COUNT(*) AS c FROM documents GROUP BY doc_id HAVING COUNT(*) > 1))
      |SELECT
      |  CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
      |  CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS bad_n_chars,
      |  CAST(SUM(CASE WHEN lang NOT IN ('en','es','de','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
      |  COUNT(*) AS n_rows,
      |  CAST((SELECT dup_key_rows FROM dup) AS BIGINT) AS dup_key_rows
      |FROM documents""".stripMargin

  val fingerprintSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |sh AS (SELECT doc_id, unnest(${shingles3Sql("ts")}) AS sh FROM t),
       |h AS (SELECT doc_id, ${md5i32Sql("sh", 0)} AS h FROM sh)
       |SELECT doc_id, COUNT(*) AS n_shingles,
       |  MIN(h) AS fp_min, CAST(SUM(h) AS BIGINT) AS fp_sum
       |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_winnow_fingerprint — winnowing (rolling window-min) selection
  // ---------------------------------------------------------------

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * scheme): hash every word-3-gram, slide a window of `w`
    * consecutive hashes, keep the minimum of each full window, and
    * emit the distinct selected hashes per document. Guarantees every
    * run of `w` shingles contributes a fingerprint, so documents
    * sharing any passage of ≥ `w+2` words share a fingerprint —
    * while storing ~2/(w+1) of the hashes a full shingle set needs.
    *
    * Scale: one shuffle on `doc_id`; the window sort is bounded by
    * document length (never corpus size) and BOTH window functions
    * (count + min) share the same partitioning and sort. */
  def winnowFingerprint(spark: SparkSession, sfDir: String, w: Int = 4): DataFrame =
    winnowFingerprintOf(docs(spark, sfDir), w)

  /** [[winnowFingerprint]] over any `(doc_id, text)` frame. */
  def winnowFingerprintOf(documents: DataFrame, w: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(w >= 1, s"window must be >= 1, got $w")
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
    val ahead = byDoc.orderBy($"pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    documents
      .select($"doc_id", posexplode(shingles(tokens($"text"), 3)).as(Seq("pos", "sh")))
      .select($"doc_id", $"pos", md5i32($"sh", 7).as("h"))
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("fp", min($"h").over(ahead))
      .filter($"pos" + w <= $"n") // full windows only (pos is 0-based)
      .select($"doc_id", $"fp").distinct()
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_fp"),
        min($"fp").as("fp_min"),
        sum($"fp").cast("long").as("fp_sum"))
      .orderBy($"doc_id")
  }

  def winnowFingerprintSql(w: Int = 4): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |s AS (SELECT doc_id, generate_subscripts(shs, 1) AS pos, unnest(shs) AS sh
       |      FROM (SELECT doc_id, ${shingles3Sql("ts")} AS shs FROM t)),
       |h AS (SELECT doc_id, pos, ${md5i32Sql("sh", 7)} AS h FROM s),
       |wm AS (SELECT doc_id, pos,
       |         COUNT(*) OVER (PARTITION BY doc_id) AS n,
       |         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
       |       FROM h),
       |fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE pos + $w <= n + 1)
       |SELECT doc_id, COUNT(*) AS n_fp, MIN(fp) AS fp_min,
       |  CAST(SUM(fp) AS BIGINT) AS fp_sum
       |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_dup_spans — cross-document duplicate-span detection
  // ---------------------------------------------------------------

  /** Cross-document duplicate-span detection — the "exact substring
    * dedup" signal (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): a span is `k` consecutive word tokens,
    * and an occurrence is DUPLICATED when the same span text appears
    * in at least one OTHER document. Per document: total span
    * occurrences, duplicated occurrences, duplicated fraction — the
    * cross-corpus quality signal a C4/RefinedWeb-style filter
    * thresholds on ([[repetitionSignals]] is the within-doc
    * complement). Documents shorter than `k` tokens have no spans and
    * no row.
    *
    * Scale posture (100 TB): spans are token-proportional, so the
    * document-frequency aggregate over span identities is THE corpus
    * shuffle — the same shape as TF-IDF's df pass. Span identity
    * travels as the codegen'd md5 64-bit word pair, never the ~k-word
    * string (16 fixed bytes per posting — the n-gram Jaccard
    * discipline, `Dedup.scala`). The dup-span set joined back is
    * corpus-proportional in the worst case, so it carries NO
    * broadcast hint — both sides share the (ha, hb) shuffle key and
    * AQE picks the strategy from actual sizes. */
  def dupSpans(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    dupSpansOf(docs(spark, sfDir), k)

  /** [[dupSpans]] over any `(doc_id, text)`-bearing frame. */
  def dupSpansOf(documents: DataFrame, k: Int = 5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(k >= 1, s"span width must be >= 1, got $k")
    // the hashed span stream feeds the df aggregate AND the join
    // back — cache it once per (session, input)
    val sp = cached(s"dupspans-$k", documents
      .select($"doc_id", explode(shingles(tokens($"text"), k)).as("sh"))
      .withColumn("p", md5Pair($"sh"))
      .select($"doc_id", $"p.a".as("ha"), $"p.b".bitwiseOR(lit(1L)).as("hb")))
    val dup = sp.select($"doc_id", $"ha", $"hb").distinct()
      .groupBy($"ha", $"hb").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2).select($"ha", $"hb")
    // total spans per doc is arithmetic (n_tokens − k + 1, duplicates
    // kept by construction) — no reason to shuffle the span stream
    // for a count the tokenizer already knows
    val tot = documents.select($"doc_id",
      (size(tokens($"text")) - (k - 1)).cast("long").as("n_spans"))
      .filter($"n_spans" >= 1)
    val dups = sp.join(dup, Seq("ha", "hb"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_dup"))
    tot.join(dups, Seq("doc_id"), "left")
      .select($"doc_id", $"n_spans",
        coalesce($"n_dup", lit(0L)).as("n_dup_spans"),
        round(coalesce($"n_dup", lit(0L)).cast("double") /
          $"n_spans".cast("double"), 6).as("dup_fraction"))
      .orderBy($"doc_id")
  }

  def dupSpansSql(k: Int = 5): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |s AS (SELECT doc_id, unnest(${shinglesNSql("ts", k)}) AS sh FROM t),
       |h AS (SELECT doc_id, $md5PairASql AS ha, $md5PairBSql AS hb FROM s),
       |df AS (SELECT ha, hb FROM (
       |         SELECT ha, hb, COUNT(DISTINCT doc_id) AS df
       |         FROM h GROUP BY ha, hb) x WHERE df >= 2),
       |tot AS (SELECT doc_id, len(ts) - ${k - 1} AS n_spans FROM t
       |        WHERE len(ts) >= $k),
       |dup AS (SELECT doc_id, COUNT(*) AS n_dup
       |        FROM h JOIN df USING (ha, hb) GROUP BY doc_id)
       |SELECT t.doc_id, CAST(t.n_spans AS BIGINT) AS n_spans,
       |  CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
       |  ROUND(CAST(COALESCE(d.n_dup, 0) AS DOUBLE)
       |        / CAST(t.n_spans AS DOUBLE), 6) AS dup_fraction
       |FROM tot t LEFT JOIN dup d USING (doc_id) ORDER BY doc_id""".stripMargin

  /** The inspection companion of [[dupSpans]]: the most-shared span
    * TEXTS (top `topN` by distinct-document count, ties by span) —
    * what a pipeline owner actually reads when tuning a dedup
    * threshold: boilerplate, licenses, navigation chrome. Diagnostic
    * top-N: the span string shuffles here (~k words vs the 16-byte
    * hash posting — a small constant); a production variant at 100 TB
    * keys the df pass on the hash pair as [[dupSpansOf]] does and
    * joins the strings back for only the N winners. */
  def topDupSpans(spark: SparkSession, sfDir: String,
                  k: Int = 5, topN: Int = 20): DataFrame =
    topDupSpansOf(docs(spark, sfDir), k, topN)

  /** [[topDupSpans]] over any `(doc_id, text)`-bearing frame. */
  def topDupSpansOf(documents: DataFrame, k: Int = 5,
                    topN: Int = 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select($"doc_id", explode(shingles(tokens($"text"), k)).as("span"))
      .distinct()
      .groupBy($"span").agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= 2)
      .orderBy($"n_docs".desc, $"span").limit(topN)
  }

  def topDupSpansSql(k: Int = 5, topN: Int = 20): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |s AS (SELECT DISTINCT doc_id, unnest(${shinglesNSql("ts", k)}) AS span
       |      FROM t)
       |SELECT span, COUNT(*) AS n_docs FROM s GROUP BY span
       |HAVING COUNT(*) >= 2
       |ORDER BY n_docs DESC, span LIMIT $topN""".stripMargin

  // ---------------------------------------------------------------
  // llm_dup_span_removal — exact-substring dedup, applied
  // ---------------------------------------------------------------

  /** Exact-substring deduplication APPLIED (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" §4.1
    * "ExactSubstr"): every token covered by a `k`-token span whose
    * text occurs more than once in the corpus — in ANOTHER document
    * or repeated within the same one — is removed, and each document
    * is reassembled from its surviving tokens in order.
    * [[dupSpans]] is the measurement (cross-doc df signal); this is
    * the transformation that produces the cleaned corpus. The
    * occurrence criterion here is total occurrences ≥ 2 (not distinct
    * docs ≥ 2): a document that repeats its own k-span is boilerplate
    * the paper's method also strips.
    *
    * Output per input document: original token count, tokens removed,
    * and the cleaned text (tokens space-joined — the operator's
    * contract is token stream in, token stream out). Documents
    * shorter than `k` tokens have no spans and pass through intact.
    *
    * Scale posture (100 TB): the span-occurrence count over codegen'd
    * 16-byte md5 span identities is THE corpus shuffle ([[dupSpans]]'s
    * df shape); covered-position expansion is a ≤k-wide `sequence`
    * explode off the dup-span occurrences only; the reassembly is a
    * per-document grouped sort bounded by DOCUMENT length, never
    * corpus size. The dup-span identity set is corpus-proportional in
    * the worst case so the semi join carries NO broadcast hint — both
    * sides share the (ha, hb) key and AQE picks the build side. */
  def dupSpanRemoval(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    dupSpanRemovalOf(docs(spark, sfDir), k)

  /** [[dupSpanRemoval]] over any `(doc_id, text)`-bearing frame. */
  def dupSpanRemovalOf(documents: DataFrame, k: Int = 5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(k >= 1, s"span width must be >= 1, got $k")
    // hashed span occurrences with their start positions; shared with
    // the occurrence-count aggregate AND the coverage join
    val sp = cached(s"dupremove-$k", documents
      .select($"doc_id", posexplode(shingles(tokens($"text"), k)).as(Seq("pos", "sh")))
      .withColumn("p", md5Pair($"sh"))
      .select($"doc_id", $"pos", $"p.a".as("ha"), $"p.b".bitwiseOR(lit(1L)).as("hb")))
    val dup = sp.groupBy($"ha", $"hb").agg(count(lit(1)).as("c"))
      .filter($"c" >= 2).select($"ha", $"hb")
    // positions covered by some duplicated span: expand each dup
    // occurrence to its k token positions, dedup overlaps
    val covered = sp.join(dup, Seq("ha", "hb"), "left_semi")
      .select($"doc_id", explode(sequence($"pos", $"pos" + (k - 1))).as("cpos"))
      .distinct()
    val toks = documents
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("cpos", "tok")))
    val clean = toks.join(covered, Seq("doc_id", "cpos"), "left_anti")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct($"cpos", $"tok"))),
          x => x.getField("tok")), " ").as("clean_text"))
    documents
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens"))
      .join(clean, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        ($"n_tokens" - coalesce($"n_kept", lit(0L))).cast("long").as("n_removed"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id")
  }

  def dupSpanRemovalSql(k: Int = 5): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |s AS (SELECT doc_id, generate_subscripts(shs, 1) - 1 AS pos, unnest(shs) AS sh
       |      FROM (SELECT doc_id, ${shinglesNSql("ts", k)} AS shs FROM t)),
       |dup AS (SELECT sh FROM (SELECT sh, COUNT(*) AS c FROM s GROUP BY sh) x
       |        WHERE c >= 2),
       |cov AS (SELECT DISTINCT doc_id, pos + g AS cpos
       |        FROM (SELECT s.doc_id, s.pos FROM s JOIN dup USING (sh))
       |        CROSS JOIN (SELECT unnest(range(0, $k)) AS g)),
       |tok AS (SELECT doc_id, generate_subscripts(ts, 1) - 1 AS cpos,
       |               unnest(ts) AS tok FROM t),
       |kept AS (SELECT tok.doc_id, tok.cpos, tok.tok FROM tok
       |         LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.cpos = cov.cpos
       |         WHERE cov.doc_id IS NULL),
       |clean AS (SELECT doc_id, COUNT(*) AS n_kept,
       |                 string_agg(tok, ' ' ORDER BY cpos) AS clean_text
       |          FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
       |  CAST(len(t.ts) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed,
       |  COALESCE(c.clean_text, '') AS clean_text
       |FROM t LEFT JOIN clean c USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_mix_weights — temperature-weighted source mixing
  // ---------------------------------------------------------------

  /** Temperature-based source mixing (the multilingual sampling rule
    * of GPT-3 / XLM-R: p_i ∝ n_i^α with α < 1 upweighting
    * low-resource sources): per language, document/token counts, the
    * α-tempered sampling weight over TOKEN counts, and the expected
    * documents drawn per epoch at a fixed budget. One partial+final
    * aggregate collapses the corpus to ≤|sources| rows; the weight
    * arithmetic (including the 1-row normalizer re-entering as a
    * broadcast-NLJ cross join) never touches corpus-sized data. */
  def mixWeights(spark: SparkSession, sfDir: String,
                 alpha: Double = MixAlphaDefault, budget: Long = 100000L): DataFrame =
    mixWeightsOf(docs(spark, sfDir), alpha, budget)

  /** [[mixWeights]] over any `(lang, text)`-bearing frame. */
  def mixWeightsOf(documents: DataFrame,
                   alpha: Double = MixAlphaDefault, budget: Long = 100000L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val per = documents
      .select($"lang", size(tokens($"text")).cast("long").as("n_tokens"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("toks"))
    val z = per.agg(sum(pow($"toks", alpha)).as("z"))
    per.crossJoin(z)
      .select($"lang", $"n_docs", $"toks".cast("long").as("n_tokens"),
        round(pow($"toks", alpha) / $"z", 6).as("weight"),
        round(lit(budget.toDouble) * pow($"toks", alpha) / $"z", 2)
          .as("expected_docs"))
      .orderBy($"lang")
  }

  def mixWeightsSql(alpha: Double = MixAlphaDefault, budget: Long = 100000L): String =
    s"""WITH per AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |         SUM(len($tokensSql)) AS toks
       |  FROM documents GROUP BY lang),
       |z AS (SELECT SUM(pow(toks, ${alpha}e0)) AS z FROM per)
       |SELECT lang, n_docs, CAST(toks AS BIGINT) AS n_tokens,
       |  ROUND(pow(toks, ${alpha}e0) / z.z, 6) AS weight,
       |  ROUND(${budget.toDouble}e0 * pow(toks, ${alpha}e0) / z.z, 2)
       |    AS expected_docs
       |FROM per, z ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_heavy_hitters_bound — Count-Min-Sketch certification
  // ---------------------------------------------------------------

  /** Driver-witnessed error bound for Count-Min-Sketch term counts —
    * the [[approxDistinctBound]] pattern applied to the second
    * classic streaming sketch. The sketch aggregates partial+final
    * across partitions (fixed depth×width counters, the only term-
    * frequency structure that merges at 100 TB); the top-`k` exact
    * counts then certify `exact ≤ estimate ≤ exact + ε·N` per term.
    * The oracle computes the same exact top-`k` and a literal TRUE,
    * so a hash match proves both engines' counts AND the bound. The
    * sketch bytes and the `k` certified rows come to the driver
    * (KBs); the corpus never does. Diagnostic query — production
    * ships the sketch and skips the exact twin. */
  def heavyHittersBound(spark: SparkSession, sfDir: String, k: Int = 20,
                        eps: Double = 0.0005, confidence: Double = 0.99,
                        seed: Int = 42): DataFrame = {
    import spark.implicits._
    val terms = docs(spark, sfDir).select(explode(tokens($"text")).as("term"))
    val agg = terms.agg(
      expr(s"count_min_sketch(term, ${eps}D, ${confidence}D, $seed)").as("cms"),
      count(lit(1)).as("total")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]]("cms")))
    val cap = math.ceil(eps * agg.getAs[Long]("total")).toLong
    val certified = terms.groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term").limit(k)
      .as[(String, Long)].collect()
      .map { case (t, n) =>
        val est = cms.estimateCount(t)
        (t, n, est >= n && est <= n + cap)
      }
    spark.createDataFrame(certified.toIndexedSeq)
      .toDF("term", "n", "within_bound")
      .orderBy($"n".desc, $"term")
  }

  def heavyHittersBoundSql(k: Int = 20): String =
    s"""SELECT term, COUNT(*) AS n, TRUE AS within_bound
       |FROM (SELECT unnest($tokensSql) AS term FROM documents)
       |GROUP BY term ORDER BY n DESC, term LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // llm_repetition — Gopher-style repetition signals
  // ---------------------------------------------------------------

  /** Per-document repetition diagnostics (the Gopher/C4 family of
    * filters, adapted to line-less documents): top-word fraction,
    * duplicate-word fraction, duplicate-3-gram fraction, and the
    * resulting keep/flag decision. The flag is computed FROM the
    * rounded fractions so both engines branch on identical doubles.
    *
    * Scale: two doc-local codegen'd folds
    * ([[graft.functions.TokenDupStats]] /
    * [[graft.functions.ShingleDupStats]]) joined on doc_id — no
    * corpus-sized exchange anywhere, per-document state never exceeds
    * its distinct-term count, and no global structure exists at all. */
  def repetitionSignals(spark: SparkSession, sfDir: String,
                        topWordMax: Double = 0.09,
                        dup3gramMax: Double = 0.6): DataFrame = {
    import spark.implicits._
    val t = docs(spark, sfDir).select($"doc_id", tokens($"text").as("ts"))
    // the SAME doc-local stat folds the quality gate uses (the shared
    // [[qualityStats]] projection): one expression pass per document,
    // no corpus-sized exchange and no stats join — short docs carry
    // n_sh = 0 and the division nulls exactly where the old left
    // join's nulls sat
    val scored = qualityStats(t)
      .select($"doc_id",
        round($"max_c".cast("double") / $"n_words", 6).as("top_word_frac"),
        round(lit(1.0) - $"n_distinct".cast("double") / $"n_words", 6)
          .as("dup_word_frac"),
        coalesce(round(lit(1.0) - $"d_sh".cast("double") / $"n_sh", 6), lit(0.0))
          .as("dup_3gram_frac"))
    scored
      .withColumn("flagged",
        when($"top_word_frac" > topWordMax || $"dup_3gram_frac" > dup3gramMax, 1L)
          .otherwise(0L))
      // hash exchange below the output sort: with no shuffle left
      // under it (the folds removed both aggregates), the sort's
      // range-partitioning SAMPLING job would re-execute the scan +
      // fold projection from parquet; sampling a reused shuffle of
      // the small numeric frame instead runs the folds once
      // (measured: 4.5–9.0 s run-to-run → stable ~1.5 s at sf1)
      .repartition($"doc_id")
      .orderBy($"doc_id")
  }

  def repetitionSignalsSql(topWordMax: Double = 0.09,
                           dup3gramMax: Double = 0.6): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |w AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, COUNT(*) AS n_distinct,
       |         CAST(MAX(c) AS BIGINT) AS max_c
       |  FROM (SELECT doc_id, term, COUNT(*) AS c
       |        FROM (SELECT doc_id, unnest(ts) AS term FROM t) GROUP BY doc_id, term)
       |  GROUP BY doc_id),
       |s AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_sh, COUNT(*) AS d_sh
       |  FROM (SELECT doc_id, sh, COUNT(*) AS c
       |        FROM (SELECT doc_id, unnest(${shingles3Sql("ts")}) AS sh FROM t)
       |        GROUP BY doc_id, sh)
       |  GROUP BY doc_id),
       |f AS (
       |  SELECT w.doc_id,
       |    round(max_c::DOUBLE / n_words, 6) AS top_word_frac,
       |    round(1.0 - n_distinct::DOUBLE / n_words, 6) AS dup_word_frac,
       |    COALESCE(round(1.0 - d_sh::DOUBLE / n_sh, 6), 0.0) AS dup_3gram_frac
       |  FROM w LEFT JOIN s ON w.doc_id = s.doc_id)
       |SELECT doc_id, top_word_frac, dup_word_frac, dup_3gram_frac,
       |  CAST(CASE WHEN top_word_frac > $topWordMax
       |             OR dup_3gram_frac > $dup3gramMax
       |       THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_unigram_logprob — corpus-LM surprisal scoring
  // ---------------------------------------------------------------

  /** Per-document average unigram surprisal (−ln p(w) under the
    * corpus's own unigram distribution) and the derived perplexity —
    * the model-free stand-in for LM-based quality scoring: boilerplate
    * and repetitive documents score low, rare-token documents high.
    *
    * Scale: the unigram table is vocabulary-sized → broadcast join;
    * the corpus token total stays in-plan as a broadcast 1-row cross
    * join (no driver action at plan-build). Perplexity is derived from
    * the ROUNDED mean so the one libm-sensitive step (`exp`) consumes
    * identical inputs in both engines. */
  def unigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // cached: the token frame feeds THREE subtrees (vocab counts,
    // corpus total, per-token join) — one tokenize scan, not three
    // (the decontaminateOverlap lesson applied library-wide)
    val terms = cached("unigramTerms",
      docs(spark, sfDir)
        .select($"doc_id", explode(tokens($"text")).as("term")))
    val freq = terms.groupBy($"term").agg(count(lit(1)).as("cnt"))
    val tot = terms.agg(count(lit(1)).cast("double").as("tot"))
    terms.join(broadcast(freq), "term")
      .crossJoin(broadcast(tot))
      .withColumn("surprisal", -log($"cnt" / $"tot"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg($"surprisal"), 4).as("avg_surprisal"))
      .withColumn("ppl", round(exp($"avg_surprisal"), 4))
      .orderBy($"doc_id")
  }

  val unigramLogprobSql: String =
    s"""WITH terms AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |freq AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
       |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM terms),
       |s AS (SELECT doc_id, -ln(cnt / tot) AS surprisal
       |      FROM terms JOIN freq USING (term) CROSS JOIN tot),
       |d AS (SELECT doc_id, COUNT(*) AS n_tokens,
       |             round(avg(surprisal), 4) AS avg_surprisal
       |      FROM s GROUP BY doc_id)
       |SELECT doc_id, n_tokens, avg_surprisal, round(exp(avg_surprisal), 4) AS ppl
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_ppl_buckets — CCNet-style perplexity terciles per language
  // ---------------------------------------------------------------

  /** CCNet's curation move over the surprisal scores: per LANGUAGE,
    * rank documents by perplexity and cut into head / middle / tail
    * terciles; head+middle survive, the tail (the LM's least
    * plausible text) is dropped (Wenzek et al., LREC 2020 — the
    * pipeline behind the LLaMA CommonCrawl corpus). Emits one row
    * per (lang, bucket): doc count, ppl bounds, chars carried, and
    * the keep flag — the table a mixing step consumes.
    *
    * Scale posture: reuses [[unigramLogprob]]'s plan (vocab-sized
    * broadcast + one token scan); the tercile cut is ntile over a
    * per-language window — partition-bounded, no global sort; the
    * output is (langs × 3) rows. Ties rank by (ppl, doc_id) so both
    * engines cut identically. */
  def pplBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ppl = unigramLogprob(spark, sfDir).select($"doc_id", $"ppl")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"ppl", $"doc_id")
    ppl.join(docs(spark, sfDir).select($"doc_id", $"lang", $"n_chars"), "doc_id")
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(min($"ppl"), 4).as("ppl_lo"),
        round(max($"ppl"), 4).as("ppl_hi"),
        sum($"n_chars").cast("long").as("n_chars"),
        (first($"bucket") <= 2L).as("keep"))
      .orderBy($"lang", $"bucket")
  }

  val pplBucketsSql: String =
    s"""WITH terms AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |freq AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
       |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM terms),
       |s AS (SELECT doc_id, -ln(cnt / tot) AS surprisal
       |      FROM terms JOIN freq USING (term) CROSS JOIN tot),
       |d AS (SELECT doc_id, round(avg(surprisal), 4) AS avg_surprisal
       |      FROM s GROUP BY doc_id),
       |p AS (SELECT doc_id, round(exp(avg_surprisal), 4) AS ppl FROM d),
       |b AS (SELECT p.doc_id, doc.lang, doc.n_chars, p.ppl,
       |             CAST(ntile(3) OVER (PARTITION BY doc.lang
       |               ORDER BY p.ppl, p.doc_id) AS BIGINT) AS bucket
       |      FROM p JOIN documents doc ON doc.doc_id = p.doc_id)
       |SELECT lang, bucket, COUNT(*) AS n_docs,
       |       round(MIN(ppl), 4) AS ppl_lo, round(MAX(ppl), 4) AS ppl_hi,
       |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |       bucket <= 2 AS keep
       |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin

  // ---------------------------------------------------------------
  // llm_quality_filter — composite Gopher-style keep/drop gate
  // ---------------------------------------------------------------

  /** The composite curation decision the individual signals feed: a
    * document is KEPT iff it passes ALL of (Gopher-style rules)
    * length ≥ 20 words, mean word length ∈ [3, 10], top-word
    * fraction ≤ 0.2, duplicate-3-gram fraction ≤ 0.6. Reports
    * per-language survival (docs kept, chars kept, keep rate) — the
    * number a curation run actually acts on. Two doc-local codegen'd
    * stat folds (word stats, shingle stats) joined on doc_id, then
    * one partial+final rollup on lang. */
  /** Per-doc word statistics feeding the Gopher-style gate — shared
    * verbatim by [[qualityFilter]] and the composed pipeline's stage
    * 1 so the two can never diverge. `t` must carry `(doc_id, ts)`. */
  /** BOTH per-doc stat folds in one projection over the token frame
    * `t(doc_id, ts, …)`: word stats ([[graft.functions.TokenDupStats]])
    * and 3-shingle stats ([[graft.functions.ShingleDupStats]]),
    * flattened to `(doc_id, n_words, n_distinct, wchars, max_c, n_sh,
    * d_sh)`. One expression pass per document — no corpus-sized
    * exchange AND no stats-to-stats join (the old route built two
    * explode/aggregate frames and joined them; kept as
    * [[qualityWordStatsAgg]]/[[qualityShingleStatsAgg]], the
    * equivalence-spec references). The size filter replicates
    * explode-of-empty dropping the doc (the gate's inner join counted
    * only docs with ≥ 1 token); docs with < 3 tokens carry
    * `n_sh = 0`, and every consumer's `d_sh / n_sh` division nulls on
    * zero exactly where the old left join produced nulls — the
    * coalesce guards behave identically. All outputs exact longs. */
  private[graft] def qualityStats(t: DataFrame): DataFrame = {
    import t.sparkSession.implicits._
    // every non-ts column of t rides through, so no consumer needs a
    // join back to its own scan
    val pass = t.columns.filter(_ != "ts").map(col).toSeq
    // the filter sits on the INPUT column (cheap tokenizer re-eval
    // when pushed below the projection) rather than on a fold field,
    // whose pushdown substitution would re-run the whole fold per row
    // inside the Filter; size(ts) > 0 keeps exactly the rows the old
    // explode route's inner join kept (null ts ⇒ null ⇒ drop)
    t.filter(size($"ts") > 0)
      .select(pass ++ Seq(
        graft.functions.TokenDupStats.token_dup_stats($"ts").as("w"),
        graft.functions.ShingleDupStats.shingle_dup_stats($"ts", 3).as("s")): _*)
      .select(pass ++ Seq($"w.n_words".as("n_words"),
        $"w.n_distinct".as("n_distinct"),
        $"w.wchars".as("wchars"), $"w.max_c".as("max_c"),
        $"s.n_sh".as("n_sh"), $"s.d_sh".as("d_sh")): _*)
  }

  /** The explode/aggregate formulation [[qualityWordStats]] replaced
    * — kept as the equivalence-spec reference (the
    * [[graft.functions.TextAnalysis.shinglesHof]] convention). */
  private[graft] def qualityWordStatsAgg(t: DataFrame): DataFrame = {
    import t.sparkSession.implicits._
    t.select($"doc_id", explode($"ts").as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(
        sum($"c").cast("long").as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(length($"term") * $"c").cast("long").as("wchars"),
        max($"c").cast("long").as("max_c"))
  }

  /** Explode/aggregate reference for [[qualityStats]]'s shingle
    * half. */
  private[graft] def qualityShingleStatsAgg(t: DataFrame): DataFrame = {
    import t.sparkSession.implicits._
    t.select($"doc_id", explode(shingles($"ts", 3)).as("sh"))
      .groupBy($"doc_id", $"sh").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(
        sum($"c").cast("long").as("n_sh"),
        count(lit(1)).as("d_sh"))
  }

  /** The composite keep predicate over the joined stats columns. */
  private[operators] def qualityKeepCond: Column = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    col("n_words") >= 20 &&
      (col("wchars").cast("double") / col("n_words")).between(3.0, 10.0) &&
      col("max_c").cast("double") / col("n_words") <= 0.2 &&
      coalesce(lit(1.0) - col("d_sh").cast("double") / col("n_sh"),
        lit(0.0)) <= 0.6
  }

  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = docs(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars", tokens($"text").as("ts"))
    // both stat folds ride the SAME projection ([[qualityStats]]):
    // scan → project → filter → lang rollup, no join at all
    qualityStats(t)
      .withColumn("keep", qualityKeepCond.cast("long"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"keep").cast("long").as("n_kept"),
        sum($"keep" * $"n_chars").cast("long").as("kept_chars"),
        round(sum($"keep").cast("double") / count(lit(1)), 6).as("keep_rate"))
      .orderBy($"lang")
  }

  /** SQL mirror of [[qualityWordStats]]/[[qualityShingleStats]] over
    * a token CTE `src(doc_id, ts)`, as CTEs `w`/`sh3` — shared by
    * [[qualityFilterSql]] and the pipeline oracle so the gate's SQL
    * can no more diverge than its Scala side. */
  private[operators] def qualityStatsCtesSql(src: String): String =
    s"""w AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       |         CAST(SUM(length(term) * c) AS BIGINT) AS wchars,
       |         CAST(MAX(c) AS BIGINT) AS max_c
       |  FROM (SELECT doc_id, term, COUNT(*) AS c
       |        FROM (SELECT doc_id, unnest(ts) AS term FROM $src)
       |        GROUP BY doc_id, term)
       |  GROUP BY doc_id),
       |sh3 AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_sh, COUNT(*) AS d_sh
       |  FROM (SELECT doc_id, sh, COUNT(*) AS c
       |        FROM (SELECT doc_id, unnest(${shingles3Sql("ts")}) AS sh FROM $src)
       |        GROUP BY doc_id, sh)
       |  GROUP BY doc_id)""".stripMargin

  /** The keep predicate over joined `w`/`sh3` columns (SQL mirror of
    * [[qualityKeepCond]]). */
  private[operators] val qualityKeepWhereSql: String =
    """w.n_words >= 20
      |          AND w.wchars::DOUBLE / w.n_words BETWEEN 3.0 AND 10.0
      |          AND w.max_c::DOUBLE / w.n_words <= 0.2
      |          AND COALESCE(1.0 - sh3.d_sh::DOUBLE / sh3.n_sh, 0.0) <= 0.6""".stripMargin

  /** The hash-ranked benchmark id pick (SQL), shared with the
    * pipeline oracle's `bench` CTE. */
  private[operators] def benchIdsSubSql(benchK: Int = DecontamBenchK): String =
    s"""SELECT doc_id FROM (
       |  SELECT doc_id, ${md5i32Sql("text", DecontamSalt)} AS h
       |  FROM documents ORDER BY h, doc_id LIMIT $benchK)""".stripMargin

  val qualityFilterSql: String =
    s"""WITH t AS (SELECT doc_id, lang, n_chars, $tokensSql AS ts FROM documents),
       |${qualityStatsCtesSql("t")},
       |k AS (
       |  SELECT t.lang, t.n_chars,
       |    CASE WHEN $qualityKeepWhereSql
       |         THEN 1 ELSE 0 END AS keep
       |  FROM t JOIN w USING (doc_id) LEFT JOIN sh3 USING (doc_id))
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(keep) AS BIGINT) AS n_kept,
       |  CAST(SUM(keep * n_chars) AS BIGINT) AS kept_chars,
       |  round(SUM(keep)::DOUBLE / COUNT(*), 6) AS keep_rate
       |FROM k GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_feature_hash — hashed bag-of-words (HashingTF shape)
  // ---------------------------------------------------------------

  /** Feature hashing: terms hash into `dims` buckets (the fixed-width
    * trick that removes the vocabulary from the feature pipeline —
    * no dictionary to build, broadcast, or keep consistent across a
    * 100 TB corpus). Emits per-document sparse-vector invariants
    * (nnz, L1 mass, an index-weighted checksum) rather than the
    * vector itself so the layout is oracle-checkable. Pure scalar
    * hash + two partial+final aggregates on doc-local keys. */
  def featureHash(spark: SparkSession, sfDir: String, dims: Int = 64): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .select($"doc_id", pmod(md5i32($"term", 31), lit(dims)).as("b"))
      .groupBy($"doc_id", $"b").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nnz"),
        sum($"c").cast("long").as("l1"),
        sum($"b" * $"c").cast("long").as("idx_checksum"))
      .orderBy($"doc_id")
  }

  def featureHashSql(dims: Int = 64): String =
    s"""WITH t AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |h AS (SELECT doc_id, ${md5i32Sql("term", 31)} % $dims AS b FROM t),
       |v AS (SELECT doc_id, b, COUNT(*) AS c FROM h GROUP BY doc_id, b)
       |SELECT doc_id, COUNT(*) AS nnz, CAST(SUM(c) AS BIGINT) AS l1,
       |  CAST(SUM(b * c) AS BIGINT) AS idx_checksum
       |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_bigram_logprob — conditional (bigram) LM surprisal
  // ---------------------------------------------------------------

  /** Bigram corpus-LM surprisal per document: −ln p(w|prev) with
    * p(w|prev) = cnt(prev,w) / cnt(prev,·), both counts from the
    * corpus itself (every bigram is seen ≥1, so no smoothing term).
    * The order-2 companion to [[unigramLogprob]] — repetitive docs
    * score LOW (their bigrams dominate their own contexts) while
    * scrambled text scores high, which is exactly the split a
    * perplexity filter needs. Bigrams reuse the codegen'd 2-gram
    * shingle expression; both vocabularies broadcast (vocab ≪
    * corpus at any scale — they grow sub-linearly). */
  def bigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // cached for the same three-subtree reason as [[unigramLogprob]]
    val bi = cached("bigramShingles",
      docs(spark, sfDir)
        .select($"doc_id", explode(shingles(tokens($"text"), 2)).as("bg"))
        .withColumn("prev", split($"bg", " ").getItem(0)))
    val bgFreq = bi.groupBy($"bg").agg(count(lit(1)).as("cb"))
    val pvFreq = bi.groupBy($"prev").agg(count(lit(1)).as("cp"))
    bi.join(broadcast(bgFreq), "bg")
      .join(broadcast(pvFreq), "prev")
      .withColumn("surprisal", -log($"cb".cast("double") / $"cp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg($"surprisal"), 4).as("avg_surprisal"))
      .withColumn("ppl", round(exp($"avg_surprisal"), 4))
      .orderBy($"doc_id")
  }

  val bigramLogprobSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |bi AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS prev
       |       FROM (SELECT doc_id, unnest(${shinglesNSql("ts", 2)}) AS bg FROM t)),
       |bf AS (SELECT bg, COUNT(*) AS cb FROM bi GROUP BY bg),
       |pf AS (SELECT prev, COUNT(*) AS cp FROM bi GROUP BY prev),
       |s AS (SELECT doc_id, -ln(cb::DOUBLE / cp) AS surprisal
       |      FROM bi JOIN bf USING (bg) JOIN pf USING (prev)),
       |d AS (SELECT doc_id, COUNT(*) AS n_bigrams,
       |             round(avg(surprisal), 4) AS avg_surprisal
       |      FROM s GROUP BY doc_id)
       |SELECT doc_id, n_bigrams, avg_surprisal,
       |       round(exp(avg_surprisal), 4) AS ppl
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_pmi_collocations — pointwise-mutual-information collocations
  // ---------------------------------------------------------------

  /** Bigrams with unstable PMI are noise: the floor keeps pairs seen
    * often enough for the log-ratio to mean something (Church &
    * Hanks' classic caveat). */
  val PmiMinCount = 5
  val PmiTopK = 50

  /** Top collocations by pointwise mutual information: PMI(a,b) =
    * ln( p(ab) / (p(a)·p(b)) ) with p(ab) = c(ab)/B over corpus
    * bigrams and p(·) = c(·)/N over corpus tokens — the classic
    * "which word pairs co-occur far above chance" query
    * (collocation mining, MWE detection for tokenizer vocab audits).
    * Rare pairs are floored at [[PmiMinCount]] before scoring.
    *
    * Scale posture: two partial+final counts (unigram, bigram — both
    * vocab-cardinality, sub-linear in the corpus), the two scalar
    * totals as 1-row broadcast crossJoins, and the surviving
    * collocation frame joins the broadcast unigram vocab twice —
    * exactly [[bigramLogprob]]'s join geometry, sharing its cached
    * shingle stage. Determinism: the PMI is ONE fixed-
    * parenthesization double expression over exact integer counts,
    * rounded once at 4 dp; top-k breaks ties on the pair itself. */
  def pmiCollocations(spark: SparkSession, sfDir: String,
                      minCount: Int = PmiMinCount, k: Int = PmiTopK): DataFrame =
    pmiCollocationsOf(docs(spark, sfDir), minCount, k)

  def pmiCollocationsOf(documents: DataFrame,
                        minCount: Int = PmiMinCount, k: Int = PmiTopK): DataFrame = {
    import documents.sparkSession.implicits._
    val toks = cached("pmiTokens",
      documents.select(explode(tokens($"text")).as("term")))
    val uni = toks.groupBy($"term").agg(count(lit(1)).as("cu"))
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val bi = cached("bigramShingles",
      documents
        .select($"doc_id", explode(shingles(tokens($"text"), 2)).as("bg"))
        .withColumn("prev", split($"bg", " ").getItem(0)))
    val nBg = bi.agg(count(lit(1)).as("n_bg"))
    bi.groupBy($"bg").agg(count(lit(1)).as("c_ab"))
      .filter($"c_ab" >= minCount)
      .withColumn("term_a", split($"bg", " ").getItem(0))
      .withColumn("term_b", split($"bg", " ").getItem(1))
      .join(broadcast(uni.select($"term".as("term_a"), $"cu".as("c_a"))), "term_a")
      .join(broadcast(uni.select($"term".as("term_b"), $"cu".as("c_b"))), "term_b")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBg))
      .withColumn("pmi", round(
        log(($"c_ab".cast("double") / $"n_bg") /
          (($"c_a".cast("double") / $"n_tok") * ($"c_b".cast("double") / $"n_tok"))),
        4))
      .orderBy($"pmi".desc, $"term_a", $"term_b")
      .limit(k)
      .select($"term_a", $"term_b", $"c_ab".cast("long").as("c_ab"),
        $"c_a".cast("long").as("c_a"), $"c_b".cast("long").as("c_b"), $"pmi")
  }

  def pmiCollocationsSql(minCount: Int = PmiMinCount, k: Int = PmiTopK): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |tok AS (SELECT unnest(ts) AS term FROM t),
       |u AS (SELECT term, COUNT(*) AS cu FROM tok GROUP BY term),
       |n AS (SELECT COUNT(*) AS n_tok FROM tok),
       |bi AS (SELECT unnest(${shinglesNSql("ts", 2)}) AS bg FROM t),
       |b AS (SELECT COUNT(*) AS n_bg FROM bi),
       |g AS (SELECT bg, COUNT(*) AS c_ab FROM bi
       |      GROUP BY bg HAVING COUNT(*) >= $minCount),
       |s AS (SELECT string_split(bg, ' ')[1] AS term_a,
       |             string_split(bg, ' ')[2] AS term_b, c_ab FROM g)
       |SELECT s.term_a, s.term_b, CAST(s.c_ab AS BIGINT) AS c_ab,
       |  CAST(ua.cu AS BIGINT) AS c_a, CAST(ub.cu AS BIGINT) AS c_b,
       |  round(ln((s.c_ab::DOUBLE / n_bg) /
       |    ((ua.cu::DOUBLE / n_tok) * (ub.cu::DOUBLE / n_tok))), 4) AS pmi
       |FROM s JOIN u ua ON s.term_a = ua.term
       |       JOIN u ub ON s.term_b = ub.term, n, b
       |ORDER BY pmi DESC, s.term_a, s.term_b LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // llm_kn_bigram — Kneser-Ney smoothed bigram LM surprisal
  // ---------------------------------------------------------------

  /** Absolute discount for the interpolated Kneser-Ney model; 0.75 is
    * the textbook fixed-discount choice. */
  val KnDiscount = 0.75

  /** Interpolated Kneser-Ney bigram surprisal per document — the
    * smoothed upgrade of [[bigramLogprob]]'s MLE model:
    *
    *   P(w|v) = max(c(v,w) − d, 0)/c(v·) + (d·N₁₊(v·)/c(v·)) · N₁₊(·w)/B
    *
    * with c(v·) the context token count, N₁₊(v·) the distinct
    * continuations of v, N₁₊(·w) the distinct contexts preceding w
    * (the continuation count — KN's insight: "Francisco" is frequent
    * but follows only "San", so its backoff mass is tiny), and B the
    * number of distinct bigram types. The interpolation weights are
    * exact: Σ_w∈V P(w|v) = 1 for every context (spec-pinned on a
    * fixture, including unseen (v,w) pairs where the discounted term
    * is 0) — Σ_w N₁₊(·w) = B makes the backoff integrate to
    * d·N₁₊(v·)/c(v·), exactly the mass discounting removed.
    *
    * All model statistics are integers; P is the same
    * fixed-parenthesization double expression in both engines, so the
    * oracle hash-checks the smoothed probabilities themselves.
    *
    * Scale: three aggregates off the shared cached bigram frame (the
    * [[bigramLogprob]] stage cache — computed once for both LM
    * queries), each keyed on vocab-cardinality keys; all three model
    * tables broadcast (vocab ≪ corpus, grows sub-linearly); B rides a
    * 1-row crossJoin, never a driver literal. */
  def knBigram(spark: SparkSession, sfDir: String): DataFrame =
    knBigramOf(docs(spark, sfDir))

  def knBigramOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val bi = cached("bigramShingles",
      documents
        .select($"doc_id", explode(shingles(tokens($"text"), 2)).as("bg"))
        .withColumn("prev", split($"bg", " ").getItem(0)))
    val bgFreq = cached("knBgFreq",
      bi.groupBy($"bg").agg(count(lit(1)).as("cb")))
    val ctx = bgFreq
      .withColumn("prev", split($"bg", " ").getItem(0))
      .groupBy($"prev")
      .agg(sum($"cb").cast("long").as("cp"), count(lit(1)).as("nfol"))
    val cont = bgFreq
      .withColumn("nxt", split($"bg", " ").getItem(1))
      .groupBy($"nxt").agg(count(lit(1)).as("nprec"))
    val types = bgFreq.agg(count(lit(1)).as("ntypes"))
    bi
      .join(broadcast(bgFreq.select($"bg", $"cb")), "bg")
      .join(broadcast(ctx), "prev")
      .withColumn("nxt", split($"bg", " ").getItem(1))
      .join(broadcast(cont), "nxt")
      .crossJoin(broadcast(types))
      .withColumn("p",
        (greatest($"cb".cast("double") - lit(KnDiscount), lit(0.0))
          / $"cp".cast("double")) +
          (lit(KnDiscount) * $"nfol".cast("double") / $"cp".cast("double")) *
            ($"nprec".cast("double") / $"ntypes".cast("double")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log($"p")), 4).as("avg_kn_surprisal"))
      .withColumn("kn_ppl", round(exp($"avg_kn_surprisal"), 4))
      .orderBy($"doc_id")
  }

  val knBigramSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |bi AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS prev,
       |              string_split(bg, ' ')[2] AS nxt
       |       FROM (SELECT doc_id, unnest(${shinglesNSql("ts", 2)}) AS bg FROM t)),
       |bf AS (SELECT bg, COUNT(*) AS cb FROM bi GROUP BY bg),
       |ctx AS (SELECT string_split(bg, ' ')[1] AS prev,
       |               CAST(SUM(cb) AS BIGINT) AS cp, COUNT(*) AS nfol
       |        FROM bf GROUP BY 1),
       |cont AS (SELECT string_split(bg, ' ')[2] AS nxt, COUNT(*) AS nprec
       |         FROM bf GROUP BY 1),
       |ty AS (SELECT COUNT(*) AS ntypes FROM bf),
       |s AS (SELECT doc_id,
       |        (GREATEST(CAST(cb AS DOUBLE) - $KnDiscount, 0.0)
       |          / CAST(cp AS DOUBLE)) +
       |        ($KnDiscount * CAST(nfol AS DOUBLE) / CAST(cp AS DOUBLE)) *
       |          (CAST(nprec AS DOUBLE) / CAST(ntypes AS DOUBLE)) AS p
       |      FROM bi JOIN bf USING (bg) JOIN ctx USING (prev)
       |           JOIN cont USING (nxt) CROSS JOIN ty),
       |d AS (SELECT doc_id, COUNT(*) AS n_bigrams,
       |             round(avg(-ln(p)), 4) AS avg_kn_surprisal
       |      FROM s GROUP BY doc_id)
       |SELECT doc_id, n_bigrams, avg_kn_surprisal,
       |       round(exp(avg_kn_surprisal), 4) AS kn_ppl
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_f2_sketch — AMS second-moment (self-join size) estimate
  // ---------------------------------------------------------------

  /** Independent ±1 hash functions in the AMS sketch. */
  val F2Sketches = 16

  /** AMS (Alon–Matias–Szegedy) F₂ sketch of the term stream: F₂ =
    * Σ_t f_t² is the self-join size of the term column — the
    * statistic a join planner needs to price a skewed equi-join
    * before running it (F₂/n is the expected matches per probe row).
    * Each of the [[F2Sketches]] estimators is S_i = Σ_tokens
    * sign_i(term) with sign_i = ±1 from BIT i of ONE salted
    * md5(term) — 16 bits of a single digest instead of 16 separately
    * salted digests, which made the hash 16× the projection cost of
    * the whole query for signs statistically indistinguishable on a
    * term stream; E[S_i²] = F₂ exactly, Var ≤ 2F₂². The whole sketch
    * state is 16 longs, merged by plain addition across any
    * partitioning — CONSTANT-size state where the exact F₂ needs a
    * full distinct aggregation of the term column.
    *
    * Output is one row: the 16-long state itself (space-joined, so
    * the oracle hash-checks the sketch contents), the mean-of-16
    * estimate (integer DIV — exact), the exact F₂ as the diagnostic
    * twin (dropped in production: it costs the distinct-term
    * shuffle the sketch avoids), and the signed relative error. */
  def f2Sketch(spark: SparkSession, sfDir: String): DataFrame =
    f2SketchOf(docs(spark, sfDir))

  def f2SketchOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val terms = cached("f2-terms",
      documents.select(explode(tokens($"text")).as("term")))
    // one digest, 16 bits (the affine-MinHash discipline): hashing
    // was 16x the projection cost when each sign salted its own md5
    val h = md5i32($"term", 100)
    def sign(i: Int): Column =
      (shiftright(h, i).bitwiseAND(lit(1L)) * 2L - 1L)
    val sketch = terms
      .agg(count(lit(1)).as("n_tokens"),
        array((0 until F2Sketches).map(i => sum(sign(i))): _*).as("s"))
      .select($"n_tokens",
        array_join(transform($"s", x => x.cast("string")), " ").as("sketch"),
        aggregate($"s", lit(0L), (acc, x) => acc + x * x).as("s2sum"))
      .withColumn("f2_est", expr(s"s2sum DIV $F2Sketches"))
    val exact = terms.groupBy($"term").agg(count(lit(1)).as("f"))
      .agg(sum($"f" * $"f").cast("long").as("f2_exact"))
    sketch.crossJoin(exact) // two 1-row aggregates
      .select($"n_tokens", $"sketch", $"f2_est", $"f2_exact",
        round(($"f2_est" - $"f2_exact").cast("double")
          / $"f2_exact".cast("double"), 6).as("err_frac"))
  }

  def f2SketchSql(): String = {
    val signs = (0 until F2Sketches).map { i =>
      s"CAST(SUM(((${md5i32Sql("term", 100)} >> $i) & 1) * 2 - 1) AS BIGINT)"
    }
    s"""WITH terms AS (SELECT unnest($tokensSql) AS term FROM documents),
       |sk AS (SELECT COUNT(*) AS n_tokens,
       |         [${signs.mkString(",\n          ")}] AS s
       |       FROM terms),
       |fl AS (SELECT n_tokens, s,
       |         list_aggregate(list_transform(s, x -> x * x), 'sum') AS s2sum
       |       FROM sk),
       |ex AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact FROM
       |         (SELECT COUNT(*) AS f FROM terms GROUP BY term))
       |SELECT n_tokens,
       |  array_to_string(list_transform(s, x -> CAST(x AS VARCHAR)), ' ')
       |    AS sketch,
       |  CAST(s2sum // $F2Sketches AS BIGINT) AS f2_est, f2_exact,
       |  round(CAST(s2sum // $F2Sketches - f2_exact AS DOUBLE)
       |        / CAST(f2_exact AS DOUBLE), 6) AS err_frac
       |FROM fl CROSS JOIN ex""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_source_cap — per-source document caps with budget accounting
  // ---------------------------------------------------------------

  /** Per-source (per-host/per-domain in a crawl) document cap: keep at
    * most `cap` docs per source, chosen by deterministic content-hash
    * rank, and account the surviving token budget. The standard
    * anti-domination guard in crawl curation — one window per source
    * key, reproducible across engines and partition layouts. */
  def sourceCap(spark: SparkSession, sfDir: String, cap: Int = 15): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"source")
          .orderBy(md5i32($"text", 21), $"doc_id")))
      .withColumn("ws_tokens", regexp_count($"text", lit("\\S+")).cast("long"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"rk" <= cap, 1L).otherwise(0L)).cast("long").as("n_kept"),
        sum(when($"rk" <= cap, $"ws_tokens").otherwise(0L)).cast("long")
          .as("kept_tokens"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------
  // llm_decontaminate — train/eval n-gram overlap check
  // ---------------------------------------------------------------

  /** Decontamination: flag corpus documents sharing ANY distinct
    * word-`n`-gram with a held-out benchmark set — the standard
    * strict train/eval overlap rule (LLM evals are decontaminated by
    * exactly this n-gram containment test). The benchmark here is a
    * deterministic hash-ranked sample standing in for an external
    * eval suite.
    *
    * Scale: the benchmark n-gram set is eval-suite-sized (thousands
    * of docs), so it BROADCASTS; the corpus side is one shingle scan
    * streamed against the broadcast hash set — no corpus-side
    * shuffle at all until the tiny flagged aggregate. This is the
    * asymmetric sibling of n-gram dedup (corpus×corpus). */
  def decontaminate(spark: SparkSession, sfDir: String,
                    benchK: Int = DecontamBenchK, n: Int = DecontamNgram,
                    minShared: Long = 1L): DataFrame = {
    import spark.implicits._
    def gramsOf(d: DataFrame) = d.select($"doc_id",
      explode(array_distinct(shingles(tokens($"text"), n))).as("g"))
    val benchIds = docs(spark, sfDir)
      .withColumn("h", md5i32($"text", DecontamSalt))
      .orderBy($"h", $"doc_id")
      .limit(benchK)
      .select($"doc_id".as("bench_id"))
    // shingle the benchK docs AFTER the id join — the explode blocks
    // filter pushdown, so deriving both sides from one corpus-wide
    // gram frame would tokenize the whole corpus twice
    val benchGrams = gramsOf(docs(spark, sfDir)
      .join(broadcast(benchIds), $"doc_id" === $"bench_id"))
      .select($"doc_id".as("bench_id"), $"g")
    val corpusGrams = gramsOf(docs(spark, sfDir)
      .join(broadcast(benchIds), $"doc_id" === $"bench_id", "left_anti"))
    corpusGrams
      .join(broadcast(benchGrams), "g")
      .groupBy($"doc_id", $"bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter($"shared_ngrams" >= minShared)
      .orderBy($"doc_id", $"bench_id")
  }

  /** Bloom-prefiltered decontamination — identical OUTPUT to
    * [[decontaminate]] (the exact gram join confirms every candidate,
    * so bloom false positives vanish from the result), different
    * SCALE shape: the benchmark n-gram set folds into ONE fixed-size
    * bloom bitset (the same `BloomFilterAggregate` /
    * `BloomFilterMightContain` pair Spark's runtime-filter rewrite
    * plants, here explicit), which ships to executors as a literal in
    * the corpus scan's codegen'd predicate. The corpus stream drops
    * non-overlapping grams BEFORE the join — at fpp=3% that is ~97%
    * of an uncontaminated corpus never entering the exchange. The
    * row-set broadcast of [[decontaminate]] is fine at eval-suite
    * size; the bitset is what survives when the "benchmark" side is
    * itself large (holdout shards, contamination blacklists):
    * megabytes of bits versus an unbounded broadcast relation.
    *
    * Construction runs two small jobs up front (gram count + sketch
    * fold) — the same eager-model shape as [[Clustering.kmeansModel]].
    */
  def decontaminateBloom(spark: SparkSession, sfDir: String,
                         benchK: Int = DecontamBenchK, n: Int = DecontamNgram,
                         minShared: Long = 1L, fpp: Double = 0.03): DataFrame = {
    import spark.implicits._
    def gramsOf(d: DataFrame) = d.select($"doc_id",
      explode(array_distinct(shingles(tokens($"text"), n))).as("g"))
    val benchIds = docs(spark, sfDir)
      .withColumn("h", md5i32($"text", DecontamSalt))
      .orderBy($"h", $"doc_id")
      .limit(benchK)
      .select($"doc_id".as("bench_id"))
    val benchGrams = gramsOf(docs(spark, sfDir)
      .join(broadcast(benchIds), $"doc_id" === $"bench_id"))
      .select($"doc_id".as("bench_id"), $"g")
    val expected = math.max(1L, benchGrams.count())
    val bloom = benchGrams
      .agg(org.apache.spark.sql.GraftSqlBridge
        .bloomFilterAgg($"g", expected, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpusGrams = gramsOf(docs(spark, sfDir)
      .join(broadcast(benchIds), $"doc_id" === $"bench_id", "left_anti"))
    corpusGrams
      .filter(org.apache.spark.sql.GraftSqlBridge.mightContain(bloom, $"g"))
      .join(broadcast(benchGrams), "g")
      .groupBy($"doc_id", $"bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter($"shared_ngrams" >= minShared)
      .orderBy($"doc_id", $"bench_id")
  }

  def decontaminateSql(benchK: Int = DecontamBenchK, n: Int = DecontamNgram,
                       minShared: Long = 1L): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(${shinglesNSql("ts", n)})) AS g FROM t),
       |bench AS (SELECT doc_id AS bench_id FROM (${benchIdsSubSql(benchK)})),
       |bg AS (SELECT bench_id, g FROM g JOIN bench ON g.doc_id = bench.bench_id),
       |cg AS (SELECT doc_id, g FROM g
       |       WHERE doc_id NOT IN (SELECT bench_id FROM bench))
       |SELECT doc_id, bench_id, COUNT(*) AS shared_ngrams
       |FROM cg JOIN bg USING (g)
       |GROUP BY doc_id, bench_id HAVING COUNT(*) >= $minShared
       |ORDER BY doc_id, bench_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_decontaminate_overlap — doc-level coverage-ratio variant
  // ---------------------------------------------------------------

  /** Coverage-ratio decontamination: for every corpus document, the
    * FRACTION of its distinct `n`-grams that appear anywhere in the
    * benchmark set, flagged past `minFrac` — the document-level
    * thresholding rule (GPT-3/PaLM-style "substantial overlap"
    * decontamination), versus [[decontaminate]]'s strict
    * any-shared-gram per-benchmark-pair rule. Pair attribution is
    * dropped on purpose: the benchmark grams collapse to ONE distinct
    * set, so a doc overlapping many benchmark entries is counted
    * once, and the output is corpus-rows, not pairs.
    *
    * Scale: identical asymmetric shape to [[decontaminate]] — the
    * distinct benchmark gram set is eval-suite-bounded and
    * broadcasts ([[decontaminateBloom]]'s bitset is the swap-in when
    * even that is large); the corpus side is one shingle scan whose
    * left-semi probe and per-doc count never shuffle gram strings
    * corpus-wide. */
  def decontaminateOverlap(spark: SparkSession, sfDir: String,
                           benchK: Int = DecontamBenchK, n: Int = DecontamNgram,
                           minFrac: Double = 0.5): DataFrame = {
    import spark.implicits._
    require(minFrac >= 0 && minFrac <= 1, s"minFrac must be in [0,1], got $minFrac")
    def gramsOf(d: DataFrame) = d.select($"doc_id",
      explode(array_distinct(shingles(tokens($"text"), n))).as("g"))
    val benchIds = docs(spark, sfDir)
      .withColumn("h", md5i32($"text", DecontamSalt))
      .orderBy($"h", $"doc_id")
      .limit(benchK)
      .select($"doc_id".as("bench_id"))
    val benchGramSet = gramsOf(docs(spark, sfDir)
      .join(broadcast(benchIds), $"doc_id" === $"bench_id"))
      .select($"g").distinct()
    // cached: the corpus gram frame feeds BOTH the shared-count and
    // total-count aggregates — without it the full corpus is
    // tokenized and shingled twice, breaking the one-shingle-scan
    // scale claim above
    val corpusGrams = cached("decontamOverlapGrams",
      gramsOf(docs(spark, sfDir)
        .join(broadcast(benchIds), $"doc_id" === $"bench_id", "left_anti")))
    val shared = corpusGrams
      .join(broadcast(benchGramSet), Seq("g"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    corpusGrams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams",
        coalesce($"n_shared", lit(0L)).as("n_shared"),
        round(coalesce($"n_shared", lit(0L)).cast("double") /
          $"n_grams".cast("double"), 6).as("overlap_frac"),
        (coalesce($"n_shared", lit(0L)).cast("double") /
          $"n_grams".cast("double") >= minFrac).as("contaminated"))
      .orderBy($"doc_id")
  }

  def decontaminateOverlapSql(benchK: Int = DecontamBenchK,
                              n: Int = DecontamNgram,
                              minFrac: Double = 0.5): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(${shinglesNSql("ts", n)})) AS g FROM t),
       |bench AS (SELECT doc_id AS bench_id FROM (${benchIdsSubSql(benchK)})),
       |bg AS (SELECT DISTINCT g FROM g JOIN bench ON g.doc_id = bench.bench_id),
       |cg AS (SELECT doc_id, g FROM g
       |       WHERE doc_id NOT IN (SELECT bench_id FROM bench)),
       |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM cg GROUP BY doc_id),
       |sh AS (SELECT doc_id, COUNT(*) AS n_shared
       |       FROM cg JOIN bg USING (g) GROUP BY doc_id)
       |SELECT t.doc_id, t.n_grams,
       |  CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
       |  ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / t.n_grams, 6)
       |    AS overlap_frac,
       |  CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / t.n_grams >= ${minFrac}e0
       |    AS contaminated
       |FROM tot t LEFT JOIN sh s USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_bpe_pairs — BPE merge-candidate statistics
  // ---------------------------------------------------------------

  /** The frequency kernel of BPE tokenizer training: the most common
    * adjacent symbol pairs within words across the corpus — exactly
    * the statistic each BPE merge round maximizes (training iterates:
    * count pairs → merge the argmax → recount). Emitted as the
    * top-`topN` (pair, count) table; pairs are space-joined symbol
    * keys (the codegen'd [[shingles]] kernel over the character
    * array).
    *
    * Scale: explode → partial+final count on the pair key (symbol-
    * pair cardinality, tiny) → TakeOrdered. The iterative merge loop
    * above this kernel is driver-coordinated like k-means: one such
    * aggregate per merge round. */
  def bpePairStats(spark: SparkSession, sfDir: String, topN: Int = 20): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select(explode(tokens($"text")).as("term"))
      .select(explode(shingles(split($"term", ""), 2)).as("pair"))
      .groupBy($"pair")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(topN)
  }

  def bpePairStatsSql(topN: Int = 20): String =
    s"""WITH terms AS (SELECT unnest($tokensSql) AS term FROM documents),
       |c AS (SELECT string_split(term, '') AS cs FROM terms),
       |p AS (SELECT unnest([cs[i] || ' ' || cs[i+1]
       |                    for i in range(1, len(cs))]) AS pair FROM c)
       |SELECT pair, COUNT(*) AS n FROM p
       |GROUP BY pair ORDER BY n DESC, pair LIMIT $topN""".stripMargin

  // ---------------------------------------------------------------
  // llm_bpe_train — driver-coordinated BPE merge loop
  // ---------------------------------------------------------------

  /** ACTUAL BPE training, `steps` merge rounds deep (the iterative
    * loop [[bpePairStats]] is one round of): count weighted symbol
    * pairs over the word-frequency dictionary, merge the argmax pair
    * corpus-wide, recount. Returns the merge table
    * `(step, pair, freq)` — the model a BPE tokenizer ships.
    *
    * Every symbol rides with its OWN boundary spaces (`' a  b '` =
    * `' a '` + `' b '`), so one literal
    * `replace(' a  b ' → ' ab ')` is exact greedy left-to-right BPE:
    * a match consumes only its own boundaries, never the NEXT
    * occurrence's leading space — `a b a b` merges to `[ab, ab]`
    * (a single-space encoding would eat the shared separator and
    * merge alternate occurrences only), while overlapping runs like
    * `a a a` still merge greedily to `[aa, a]`.
    *
    * Scale posture: BPE trains on the (word, freq) dictionary, never
    * the corpus — one corpus shuffle builds the dict (vocabulary-
    * bounded), then each round is a dict-sized pair count
    * (partial+final sum) plus a 1-row argmax collect. Driver state is
    * `steps` strings (the k-means centroid precedent). The oracle
    * replays the identical loop as chained CTEs. Training stops early
    * (short merge table) when no pair is left to merge. */
  def bpeTrain(spark: SparkSession, sfDir: String, steps: Int = 3): DataFrame =
    bpeTrainOf(docs(spark, sfDir), steps)

  /** The `(sentinel-encoded word, freq)` dictionary both BPE passes
    * train/encode over: chars double-space-joined so each symbol owns
    * a leading AND trailing space. */
  private def bpeDictOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents
      .select(explode(tokens($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), array_join(split($"term", ""), "  "), lit(" "))
        .as("s"), $"freq")
  }

  /** One merge's literal search/replacement under the double-space
    * encoding; `pair` is the space-joined symbol pair (`"a b"`). */
  private def bpeSearch(pair: String) = s" ${pair.replace(" ", "  ")} "
  private def bpeReplacement(pair: String) = s" ${pair.replace(" ", "")} "

  /** Symbols of an encoded dict string (tokens carry no spaces). */
  private def bpeSymbols(s: org.apache.spark.sql.Column) =
    regexp_extract_all(s, lit("\\S+"), lit(0))

  /** Caller-frame form over any `(text)` -bearing frame. */
  def bpeTrainOf(documents: DataFrame, steps: Int = 3): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // each round's dict is cached so the next round's pair count is
    // ONE replace over the previous cache — O(dict) per round — not a
    // re-execution of the whole merge chain from the initial dict
    // (O(steps²) passes for deeper merge tables). The previous
    // round's cache is released only after this round's collect has
    // materialized the new one.
    var cur: DataFrame = bpeDictOf(documents).cache()
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Long, String, Long)]
    var exhausted = false
    for (step <- 1 to steps if !exhausted) {
      val top = cur
        .select(explode(shingles(bpeSymbols($"s"), 2)).as("pair"), $"freq")
        .groupBy($"pair").agg(sum($"freq").as("c"))
        .orderBy($"c".desc, $"pair").limit(1)
        .collect().headOption
      // `cur` is materialized by the collect above; its parent cache
      // is no longer an input to anything
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      top match {
        case None => exhausted = true // no pair left: stop early
        case Some(row) =>
          val (pair, c) = (row.getString(0), row.getLong(1))
          merges += ((step.toLong, pair, c))
          prev = cur
          cur = cur.select(
            replace($"s", lit(bpeSearch(pair)), lit(bpeReplacement(pair)))
              .as("s"), $"freq").cache()
      }
    }
    if (prev != null) prev.unpersist(blocking = false)
    cur.unpersist(blocking = false)
    merges.result().toDF("step", "pair", "freq").orderBy($"step")
  }

  /** Encode with the trained merges: apply the `steps` learned
    * replaces to the weighted dictionary and account the compression
    * — total symbols before/after and the per-word average. The
    * encode path a tokenizer runs over every shard at scale: train
    * once (driver collects `steps` strings), then encoding is pure
    * per-row scalar work — `steps` literal replaces, no joins, one
    * final partial+final aggregate. */
  def bpeEncode(spark: SparkSession, sfDir: String, steps: Int = 3): DataFrame =
    bpeEncodeOf(docs(spark, sfDir), steps)

  /** Caller-frame form over any `(text)`-bearing frame. */
  def bpeEncodeOf(documents: DataFrame, steps: Int = 3): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val merges = bpeTrainOf(documents, steps)
      .select($"pair").as[String].collect()
    val encoded = merges.foldLeft(bpeDictOf(documents)) { (df, pair) =>
      df.withColumn("s",
        replace($"s", lit(bpeSearch(pair)), lit(bpeReplacement(pair))))
    }
    encoded
      .select($"freq",
        size(bpeSymbols($"s")).cast("long").as("n_sym"),
        length(regexp_replace($"s", " ", "")).cast("long").as("n_chars"))
      .agg(
        sum($"freq" * $"n_chars").cast("long").as("symbols_before"),
        sum($"freq" * $"n_sym").cast("long").as("symbols_after"),
        round(sum($"freq" * $"n_sym") / sum($"freq").cast("double"), 6)
          .as("avg_symbols_per_word"))
  }

  def bpeEncodeSql(steps: Int = 3): String = {
    val chain = bpeChainSql(steps)
    s"""$chain
       |SELECT
       |  CAST(SUM(freq * len(replace(s, ' ', ''))) AS BIGINT)
       |    AS symbols_before,
       |  CAST(SUM(freq * len(regexp_extract_all(s, '\\S+'))) AS BIGINT)
       |    AS symbols_after,
       |  ROUND(SUM(freq * len(regexp_extract_all(s, '\\S+')))
       |        / CAST(SUM(freq) AS DOUBLE), 6) AS avg_symbols_per_word
       |FROM d$steps""".stripMargin
  }

  /** The shared training chain: CTEs `d0..d$steps` (dictionary
    * strings after each merge) and `t1..t$steps` (each round's argmax
    * pair + weighted count). Mirrors the double-space sentinel
    * encoding: every symbol owns its boundary spaces, so the literal
    * replace is exact greedy left-to-right BPE (see [[bpeTrain]]). */
  private def bpeChainSql(steps: Int): String = {
    val head =
      s"""WITH terms AS (SELECT unnest($tokensSql) AS term FROM documents),
         |dict AS (SELECT term, COUNT(*) AS freq FROM terms GROUP BY term),
         |d0 AS (SELECT ' ' || list_aggregate(string_split(term, ''),
         |                                    'string_agg', '  ') || ' ' AS s,
         |              freq
         |       FROM dict)""".stripMargin
    val rounds = (1 to steps).map { i =>
      s"""p$i AS (
         |  SELECT pair, SUM(freq) AS c FROM (
         |    SELECT unnest([ts[j] || ' ' || ts[j+1]
         |                   for j in range(1, len(ts))]) AS pair, freq
         |    FROM (SELECT regexp_extract_all(s, '\\S+') AS ts, freq
         |          FROM d${i - 1}))
         |  GROUP BY pair),
         |t$i AS (SELECT pair, c FROM p$i ORDER BY c DESC, pair LIMIT 1),
         |d$i AS (SELECT replace(s,
         |          ' ' || (SELECT replace(pair, ' ', '  ') FROM t$i) || ' ',
         |          ' ' || (SELECT replace(pair, ' ', '') FROM t$i) || ' ') AS s,
         |        freq FROM d${i - 1})""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$head$rounds"
  }

  def bpeTrainSql(steps: Int = 3): String = {
    val out = (1 to steps)
      .map(i => s"SELECT CAST($i AS BIGINT) AS step, pair, " +
        s"CAST(c AS BIGINT) AS freq FROM t$i")
      .mkString("\nUNION ALL\n")
    s"${bpeChainSql(steps)}\n$out\nORDER BY step"
  }

  // ---------------------------------------------------------------
  // llm_pii_redact — pattern scrub with per-language accounting
  // ---------------------------------------------------------------

  /** PII-style redaction: replace every token matching a deny
    * pattern with `[PII]` and account for the scrub per language
    * (docs touched, total hits, corpus size after). The pattern here
    * is a literal word alternation because the synthetic corpus has
    * no real emails/SSNs — in production the same operator runs with
    * the usual email/phone/IP regexes. Both engines evaluate the
    * IDENTICAL pattern (plain alternation + `\b`, valid in Java
    * regex and RE2 alike) so counts and redacted lengths are
    * engine-identical.
    *
    * Scale: pure per-row scalar work (two regex passes) feeding a
    * partial+final aggregate on `lang` — embarrassingly parallel, no
    * shuffle of the text itself. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .withColumn("hits",
        size(regexp_extract_all($"text", lit(PiiPattern), lit(0))))
      .withColumn("redacted", regexp_replace($"text", PiiPattern, "[PII]"))
      .groupBy($"lang")
      .agg(
        sum(when($"hits" > 0, 1L).otherwise(0L)).cast("long").as("n_docs_hit"),
        sum($"hits").cast("long").as("n_hits"),
        sum(length($"redacted")).cast("long").as("chars_after"))
      .orderBy($"lang")
  }

  /** Deny-list stand-in for the email/phone/IP patterns. */
  val PiiPattern = "\\b(customer|vector|stream)\\b"

  val piiRedactSql: String =
    s"""WITH d AS (
       |  SELECT lang,
       |         len(regexp_extract_all(text, '$PiiPattern')) AS hits,
       |         len(regexp_replace(text, '$PiiPattern', '[PII]', 'g'))
       |           AS len_after
       |  FROM documents)
       |SELECT lang,
       |  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_hit,
       |  CAST(SUM(hits) AS BIGINT) AS n_hits,
       |  CAST(SUM(len_after) AS BIGINT) AS chars_after
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  def sourceCapSql(cap: Int = 15): String =
    s"""WITH r AS (
       |  SELECT source,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY ${md5i32Sql("text", 21)}, doc_id) AS rk,
       |         len(regexp_extract_all(text, '\\S+')) AS ws_tokens
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN rk <= $cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN rk <= $cap THEN ws_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // llm_split — deterministic train/val/test assignment
  // ---------------------------------------------------------------

  /** Hash-based corpus split (80/10/10 by default): each doc lands in
    * exactly one of train/val/test by its salted content hash — the
    * assignment every training pipeline needs to be REPRODUCIBLE
    * (re-running on a re-sharded or incrementally grown corpus keeps
    * every old doc's split), and content-keyed so byte-identical dups
    * can never straddle the train/eval boundary. Reports per (split,
    * lang) doc and token counts.
    *
    * Scale: one scan, per-row salted-md5 scalar (codegen'd), one
    * partial+final aggregate on the 15-ary (split, lang) key. */
  def corpusSplit(spark: SparkSession, sfDir: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame =
    corpusSplitOf(docs(spark, sfDir), trainPct, valPct)

  /** Caller-frame form over any `(text, lang)`-bearing frame. */
  def corpusSplitOf(documents: DataFrame, trainPct: Int = 80,
                    valPct: Int = 10): DataFrame = {
    import documents.sparkSession.implicits._
    val h = pmod(md5i32($"text", 17), lit(100))
    documents
      .withColumn("split",
        when(h < trainPct, "train")
          .when(h < trainPct + valPct, "val")
          .otherwise("test"))
      .withColumn("n_tokens", size(tokens($"text")).cast("long"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("n_tokens"))
      .orderBy($"split", $"lang")
  }

  def corpusSplitSql(trainPct: Int = 80, valPct: Int = 10): String =
    s"""WITH d AS (
       |  SELECT lang, len($tokensSql) AS n_tokens,
       |         ${md5i32Sql("text", 17)} % 100 AS h
       |  FROM documents)
       |SELECT CASE WHEN h < $trainPct THEN 'train'
       |            WHEN h < ${trainPct + valPct} THEN 'val'
       |            ELSE 'test' END AS split,
       |  lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |FROM d GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_heldout_ppl — held-out perplexity of the corpus LM
  // ---------------------------------------------------------------

  /** Held-out perplexity evaluation: an add-1-smoothed per-language
    * unigram LM is trained on the TRAIN split (the same salted hash
    * split [[corpusSplitOf]] reports on — h < 80) and scored on the
    * held-out TEST split (h ≥ 90), reporting per language the token
    * masses, train self-perplexity, held-out perplexity, and the
    * overfit gap. This is the eval loop data pipelines run on every
    * curation change: a filter that helps should LOWER held-out
    * ppl; a gap blowing up says the corpus stopped generalizing
    * (dedup leak, contamination, vocabulary collapse).
    *
    * Smoothing: p(w) = (cnt(w)+1)/(N+V+1) with unseen test tokens
    * at 1/(N+V+1) — the +1 in the denominator is the single shared
    * OOV bucket. Determinism: counts are exact BIGINTs; per-token
    * `ln` and the final `exp` ride the library-wide round(…, 4)
    * absorption (the [[unigramLogprob]] precedent); the gap is one
    * correctly-rounded subtraction of the rounded values.
    *
    * Scale: one tokenize scan (cached — feeds the LM counts, the
    * stats, and both eval sides), one (lang, term) aggregate, two
    * equi-joins against the vocab-keyed counts (AQE broadcasts them
    * while they fit; at a 100 TB vocabulary the join degrades to a
    * plain shuffle, never a driver structure), per-lang bounded
    * output. */
  def heldoutPpl(spark: SparkSession, sfDir: String): DataFrame =
    heldoutPplOf(docs(spark, sfDir))

  /** [[heldoutPpl]] over any caller `(lang, text)` frame. */
  def heldoutPplOf(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = cached("heldoutToks", documents
      .select($"lang", pmod(md5i32($"text", 17), lit(100)).as("h"),
        explode(tokens($"text")).as("term")))
    val train = toks.filter($"h" < 80).select($"lang", $"term")
    val test = toks.filter($"h" >= 90).select($"lang", $"term")
    val counts = train.groupBy($"lang", $"term").agg(count(lit(1)).as("cnt"))
    val stats = train.groupBy($"lang")
      .agg(count(lit(1)).as("nn"), countDistinct($"term").as("v"))
    def eval(side: DataFrame, nCol: String, pplCol: String): DataFrame =
      side
        .join(counts, Seq("lang", "term"), "left")
        .join(broadcast(stats), Seq("lang")) // one row per language
        .select($"lang", (-log((coalesce($"cnt", lit(0L)) + lit(1.0))
          / ($"nn" + $"v" + lit(1.0)))).as("s"))
        .groupBy($"lang")
        .agg(count(lit(1)).as(nCol), round(exp(round(avg($"s"), 4)), 4).as(pplCol))
    // FULL outer on lang (round-10 advice): a language with no
    // held-out documents is exactly the eval-coverage failure this
    // operator exists to catch — it must surface loudly as a row
    // with null heldout columns (n_test_tokens 0), not drop from the
    // report; a test-only language (possible under a caller split)
    // surfaces symmetrically with null train columns.
    eval(train, "n_train_tokens", "train_ppl")
      .join(eval(test, "n_test_tokens", "heldout_ppl"), Seq("lang"), "full")
      .select($"lang", $"n_train_tokens", $"train_ppl",
        coalesce($"n_test_tokens", lit(0L)).as("n_test_tokens"),
        $"heldout_ppl",
        ($"heldout_ppl" - $"train_ppl").as("overfit_gap"))
      .orderBy($"lang")
  }

  def heldoutPplSql(): String = {
    def ev(side: String) =
      s"""SELECT e.lang, CAST(COUNT(*) AS BIGINT) AS n,
         |  round(exp(round(avg(-ln((COALESCE(c.cnt, 0) + 1.0)
         |                          / (s.nn + s.v + 1.0))), 4)), 4) AS ppl
         |FROM $side e
         |LEFT JOIN c ON c.lang = e.lang AND c.term = e.term
         |JOIN s ON s.lang = e.lang
         |GROUP BY e.lang""".stripMargin
    s"""WITH t AS (
       |  SELECT lang, ${md5i32Sql("text", 17)} % 100 AS h,
       |         unnest($tokensSql) AS term
       |  FROM documents),
       |tr AS (SELECT lang, term FROM t WHERE h < 80),
       |te AS (SELECT lang, term FROM t WHERE h >= 90),
       |c AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
       |      FROM tr GROUP BY 1, 2),
       |s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nn,
       |             CAST(COUNT(DISTINCT term) AS BIGINT) AS v
       |      FROM tr GROUP BY 1),
       |etr AS (${ev("tr")}),
       |ete AS (${ev("te")})
       |SELECT COALESCE(etr.lang, ete.lang) AS lang,
       |  etr.n AS n_train_tokens, etr.ppl AS train_ppl,
       |  COALESCE(ete.n, 0) AS n_test_tokens, ete.ppl AS heldout_ppl,
       |  ete.ppl - etr.ppl AS overfit_gap
       |FROM etr FULL JOIN ete ON etr.lang = ete.lang
       |ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_seq_pack — context-window packing accounting
  // ---------------------------------------------------------------

  /** GPT-style sequence-packing audit: concatenate each (lang, shard)
    * document stream in doc_id order, cut it every `ctx` tokens, and
    * account the packing per language — documents and tokens packed,
    * context windows ("bins") consumed, padding lost in each stream's
    * final partial bin, and documents straddling a bin boundary (the
    * ones an attention mask must split). This is the accounting pass
    * a training-data pipeline runs before materializing packed
    * sequences.
    *
    * Scale posture (100 TB): packing is order-sequential WITHIN a
    * stream, so the corpus is sharded into `lang × shards` independent
    * streams first — the window's partition key. Parallelism is the
    * stream count (shards is a capacity knob ≈ cores at bench scale,
    * thousands in production; packing quality is shard-invariant
    * because bins never span shards). One sort per stream, then two
    * partial+final aggregates; no joins.
    */
  def seqPack(spark: SparkSession, sfDir: String,
              ctx: Int = PackCtxDefault, shards: Int = PackShardsDefault): DataFrame =
    seqPackOf(docs(spark, sfDir), ctx, shards)

  /** Caller-frame form over any `(doc_id, text, lang)` frame. */
  def seqPackOf(documents: DataFrame, ctx: Int = PackCtxDefault,
                shards: Int = PackShardsDefault): DataFrame = {
    import documents.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"shard").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    documents
      .select($"lang", $"doc_id",
        pmod($"doc_id", lit(shards)).as("shard"),
        size(tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      // a doc crosses a bin boundary iff its first and last token land
      // in different bins of the concatenated stream
      .withColumn("crosses",
        when($"n_tokens" > 0 &&
          floor(($"cum" - 1) / ctx) > floor(($"cum" - $"n_tokens") / ctx), 1L)
          .otherwise(0L))
      .groupBy($"lang", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("toks"),
        sum($"crosses").as("crossers"))
      .groupBy($"lang")
      .agg(
        sum($"n_docs").cast("long").as("n_docs"),
        sum($"toks").cast("long").as("total_tokens"),
        sum(when($"toks" > 0, floor(($"toks" - 1) / ctx) + 1).otherwise(0L))
          .cast("long").as("n_bins"),
        sum(when($"toks" > 0,
          (floor(($"toks" - 1) / ctx) + 1) * ctx - $"toks").otherwise(0L))
          .cast("long").as("pad_tokens"),
        sum($"crossers").cast("long").as("n_boundary_docs"))
      .orderBy($"lang")
  }

  /** Materialize the packed bins (shards = 1 stream per language):
    * per (lang, bin) the doc count, token fill, and an md5 over the
    * bin's concatenated documents in pack order — the content
    * identity of the training sequence a sink would write. One window
    * pass + one aggregate; the only wide column (text) moves once,
    * into its own bin's group. */
  def seqPackBins(spark: SparkSession, sfDir: String, ctx: Int = 512): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(spark, sfDir)
      .select($"doc_id", $"lang", $"text",
        size(tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("bin", floor(($"cum" - $"n_tokens") / ctx))
      .groupBy($"lang", $"bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("bin_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct($"doc_id", $"text"))),
            x => x.getField("text")), " ").cast("binary")).as("content_hash"))
      .orderBy($"lang", $"bin")
  }

  def seqPackBinsSql(ctx: Int = 512): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, text, len($tokensSql) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, text, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT lang, CAST((cum - n_tokens) // $ctx AS BIGINT) AS bin,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       |  md5(string_agg(text, ' ' ORDER BY doc_id)) AS content_hash
       |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin

  def seqPackSql(ctx: Int = PackCtxDefault, shards: Int = PackShardsDefault): String =
    s"""WITH d AS (
       |  SELECT lang, doc_id, doc_id % $shards AS shard,
       |         len($tokensSql) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT lang, shard, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d),
       |s AS (
       |  SELECT lang, shard, COUNT(*) AS n_docs, SUM(n_tokens) AS toks,
       |         SUM(CASE WHEN n_tokens > 0
       |                   AND (cum - 1) // $ctx > (cum - n_tokens) // $ctx
       |                  THEN 1 ELSE 0 END) AS crossers
       |  FROM c GROUP BY lang, shard)
       |SELECT lang,
       |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN toks > 0 THEN (toks - 1) // $ctx + 1
       |                ELSE 0 END) AS BIGINT) AS n_bins,
       |  CAST(SUM(CASE WHEN toks > 0
       |                THEN ((toks - 1) // $ctx + 1) * $ctx - toks
       |                ELSE 0 END) AS BIGINT) AS pad_tokens,
       |  CAST(SUM(crossers) AS BIGINT) AS n_boundary_docs
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_doc_chunk — overlapping token-window chunking
  // ---------------------------------------------------------------

  /** Split every document into overlapping `chunk`-token windows at
    * `stride` steps (RAG / long-context preprocessing): chunk i of a
    * doc covers tokens [1 + i·stride, 1 + i·stride + chunk). Emits one
    * row per chunk with its token count and an md5 content hash —
    * the downstream identity for chunk-level dedup and retrieval.
    *
    * Scale posture (100 TB): pure per-row work — tokenize once, one
    * `explode` of the start-offset sequence (fan-out is
    * ceil(tokens/stride), bounded by document length), codegen'd
    * slice/join/md5 per chunk. No shuffle at all until the
    * presentation sort; in production the sink writes chunks
    * partition-local.
    */
  def docChunk(spark: SparkSession, sfDir: String,
               chunk: Int = 64, stride: Int = 48): DataFrame =
    docChunkOf(docs(spark, sfDir), chunk, stride)

  /** Caller-frame form over any `(doc_id, text)` frame. */
  def docChunkOf(documents: DataFrame, chunk: Int = 64,
                 stride: Int = 48): DataFrame = {
    import documents.sparkSession.implicits._
    documents
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("n", size($"toks"))
      // starts 1, 1+stride, ... ≤ n (empty docs produce no chunks)
      .select($"doc_id", $"toks",
        explode(filter(
          sequence(lit(1), greatest($"n", lit(1)), lit(stride)),
          s => s <= $"n")).as("start"))
      .select(
        $"doc_id",
        floor(($"start" - 1) / stride).as("chunk_idx"),
        $"start".cast("long").as("start_tok"),
        size(slice($"toks", $"start", lit(chunk))).cast("long")
          .as("n_chunk_tokens"),
        md5(array_join(slice($"toks", $"start", lit(chunk)), " ")
          .cast("binary")).as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  def docChunkSql(chunk: Int = 64, stride: Int = 48): String =
    s"""WITH d AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |x AS (SELECT doc_id, ts,
       |             unnest(range(1, len(ts) + 1, $stride)) AS start
       |      FROM d)
       |SELECT doc_id,
       |  (start - 1) // $stride AS chunk_idx,
       |  CAST(start AS BIGINT) AS start_tok,
       |  CAST(len(ts[start : start + ${chunk - 1}]) AS BIGINT)
       |    AS n_chunk_tokens,
       |  md5(list_aggregate(ts[start : start + ${chunk - 1}],
       |      'string_agg', ' ')) AS chunk_hash
       |FROM x ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------
  // llm_bm25 — Okapi BM25 keyword retrieval
  // ---------------------------------------------------------------

  /** Okapi BM25 (k1 = 1.2, b = 0.75) top-`k` retrieval for a fixed
    * query-term set — the classic lexical ranker a retrieval /
    * RAG-indexing pipeline pairs with the [[tfidf]] characteristic
    * terms and the kNN dense retrievers (`Similarity.scala`). Uses
    * the +1-inside-the-log idf variant so scores stay positive even
    * for terms in more than half the corpus.
    *
    * Scale posture (100 TB): NO per-term explode and no join — per-doc
    * term frequencies for the |q| query terms are codegen'd
    * [[graft.functions.CountTokenEq]] array scans in ONE projection
    * (bit-identical to the interpreted `size(filter(...))` HOF form
    * it replaces — spec-pinned; the plan-shape spec pins no-Generate /
    * no-hashpartitioning / no-CodegenFallback in the scorer), so the
    * whole query is scan → 1-row global aggregate (N, avgdl,
    * per-term df) → broadcast cross join back →
    * TakeOrderedAndProject. The only shuffle is the |q|+2-column
    * single-row aggregate; the corpus moves exactly once end to end.
    */
  def bm25(spark: SparkSession, sfDir: String,
           query: Seq[String] = bm25DefaultQuery, k: Int = 15): DataFrame =
    bm25Of(docs(spark, sfDir), query, k)

  val bm25DefaultQuery: Seq[String] = Seq("spark", "join", "window", "stream")

  /** [[bm25]] over any `(doc_id, text)`-bearing frame. */
  def bm25Of(documents: DataFrame, query: Seq[String] = bm25DefaultQuery,
             k: Int = 15): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(query.nonEmpty, "BM25 needs at least one query term")
    require(k >= 1, s"top-k must be >= 1, got $k")
    val k1 = 1.2
    val b = 0.75
    val tfCols = query.indices.map(i =>
      graft.functions.CountTokenEq.count_token_eq($"tk", query(i)).as(s"tf_$i"))
    val per = documents
      .select($"doc_id", tokens($"text").as("tk"))
      .select($"doc_id" +: size($"tk").cast("long").as("dl") +: tfCols: _*)
    // one single-row aggregate carries every corpus statistic the
    // scorer needs; it re-enters the plan as a broadcast cross join
    // (the tfidf/unigramLogprob discipline — no driver action fires)
    val aggCols =
      count(lit(1)).cast("double").as("n") +:
        (sum($"dl").cast("double") / count(lit(1))).as("avgdl") +:
        query.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).cast("double").as(s"df_$i"))
    val g = per.agg(aggCols.head, aggCols.tail: _*)
    // fixed left-to-right term order keeps the float sum bit-identical
    // with the oracle's expression order
    val score = query.indices.map { i =>
      val df = col(s"df_$i")
      log(($"n" - df + 0.5) / (df + 0.5) + 1.0) *
        (col(s"tf_$i") * lit(k1 + 1)) /
        (col(s"tf_$i") + lit(k1) * (lit(1 - b) + lit(b) * $"dl" / $"avgdl"))
    }.reduce(_ + _)
    per.crossJoin(broadcast(g))
      .withColumn("score", round(score, 4))
      .filter($"score" > 0)
      .select($"doc_id", $"score")
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  def bm25Sql(query: Seq[String] = bm25DefaultQuery, k: Int = 15): String = {
    val k1 = 1.2
    val b = 0.75
    val tfs = query.indices.map(i =>
      s"len(list_filter(tk, x -> x = '${query(i)}')) AS tf_$i").mkString(",\n|        ")
    val dfs = query.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$i")
      .mkString(",\n|        ")
    val terms = query.indices.map(i =>
      s"ln((n - df_$i + 0.5) / (df_$i + 0.5) + 1.0) * (tf_$i * ${k1 + 1}) / " +
        s"(tf_$i + $k1 * (${1 - b} + $b * dl / avgdl))").mkString("\n|    + ")
    s"""WITH base AS (SELECT doc_id, $tokensSql AS tk FROM documents),
       |per AS (SELECT doc_id, len(tk) AS dl,
       |        $tfs
       |        FROM base),
       |g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |        CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
       |        $dfs
       |      FROM per),
       |scored AS (SELECT doc_id, round(
       |    $terms, 4) AS score
       |  FROM per CROSS JOIN g)
       |SELECT doc_id, score FROM scored WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_vocab_coverage — OOV rate against a corpus-derived vocabulary
  // ---------------------------------------------------------------

  /** Out-of-vocabulary accounting per language against the corpus's
    * own top-`v` terms — the coverage check run before committing to
    * a tokenizer vocabulary (how much of each language's token mass
    * falls outside the shared vocab). Docs with zero tokens carry no
    * token mass and drop out of the per-doc stage; `n_docs` counts
    * token-bearing documents.
    *
    * Scale posture (100 TB): the vocab is parameter-bounded (`v`
    * rows after a partial+final term count and a top-`v` heap), so
    * its broadcast is justified at ANY corpus size — unlike the
    * corpus-proportional hints round 5 flagged. The token stream
    * then left-joins the broadcast vocab map-side (no shuffle of the
    * stream beyond the per-doc aggregate it needs anyway), and the
    * per-doc rows collapse to ≤|langs| output rows.
    */
  def vocabCoverage(spark: SparkSession, sfDir: String, v: Int = 100): DataFrame =
    vocabCoverageOf(docs(spark, sfDir), v)

  /** [[vocabCoverage]] over any `(doc_id, lang, text)` frame. */
  def vocabCoverageOf(documents: DataFrame, v: Int = 100): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(v >= 1, s"vocab size must be >= 1, got $v")
    // cached: feeds both the vocab ranking and the per-doc OOV join
    val terms = cached("vocabTerms",
      documents
        .select($"doc_id", $"lang", explode(tokens($"text")).as("term")))
    val vocab = terms.groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term").limit(v)
      .select($"term", lit(1).as("in_vocab"))
    val perDoc = terms.join(broadcast(vocab), Seq("term"), "left")
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"in_vocab".isNull, 1).otherwise(0)).as("n_oov"))
    perDoc.groupBy($"lang")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum($"n_tokens").cast("long").as("total_tokens"),
        sum($"n_oov").cast("long").as("oov_tokens"),
        round(sum($"n_oov").cast("double") / sum($"n_tokens"), 6).as("oov_rate"))
      .orderBy($"lang")
  }

  def vocabCoverageSql(v: Int = 100): String =
    s"""WITH terms AS (
       |  SELECT doc_id, lang, unnest($tokensSql) AS term FROM documents),
       |vocab AS (SELECT term FROM (
       |  SELECT term, COUNT(*) AS n FROM terms GROUP BY term
       |  ORDER BY n DESC, term LIMIT $v)),
       |pd AS (
       |  SELECT t.doc_id, t.lang, COUNT(*) AS n_tokens,
       |         SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
       |  FROM terms t LEFT JOIN vocab v ON t.term = v.term
       |  GROUP BY t.doc_id, t.lang)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(n_oov) AS BIGINT) AS oov_tokens,
       |  round(CAST(SUM(n_oov) AS DOUBLE) / SUM(n_tokens), 6) AS oov_rate
       |FROM pd GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_length_buckets — sequence-length bucketing for inference
  // ---------------------------------------------------------------

  /** Fixed-ladder sequence-length bucketing (16, 32, …, 2048 with a
    * 4096 overflow) — the batching planner for inference / eval
    * serving, where every sequence pads to its bucket length and
    * batches of `batch` sequences form within a bucket. Sequences
    * longer than the top rung TRUNCATE to it (the serving default),
    * so token counts here are post-truncation. Reports per bucket
    * the doc count, batch count, kept vs padded token mass, and
    * padding waste — the numbers that pick ladder rungs.
    *
    * The ladder is CASE-compared (no `log2`), so bucket assignment is
    * bit-identical across engines; batch count is arithmetic
    * (`ceil(n_docs/batch)`), not a window pass — at corpus scale
    * this is ONE scan and ONE tiny aggregate (≤9 groups), nothing
    * else. The actual batch-member assignment at scale is
    * [[seqPackAssign]]'s shape; this op is the planner that sizes it.
    */
  def lengthBuckets(spark: SparkSession, sfDir: String, batch: Int = 8): DataFrame =
    lengthBucketsOf(docs(spark, sfDir), batch)

  /** Bucket rungs: powers of two from 16 to 2048, then 4096 overflow. */
  private val bucketLadder: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)

  /** [[lengthBuckets]] over any `(text)`-bearing frame. */
  def lengthBucketsOf(documents: DataFrame, batch: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(batch >= 1, s"batch size must be >= 1, got $batch")
    val bucket = bucketLadder.foldRight(lit(4096L)) { (rung, fall) =>
      when($"n_tokens" <= rung, lit(rung)).otherwise(fall)
    }
    documents
      .select(least(size(tokens($"text")).cast("long"), lit(4096L))
        .as("n_tokens"))
      .withColumn("bucket", bucket)
      .groupBy($"bucket")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"n_tokens").cast("long").as("total_tokens"))
      .withColumn("n_batches",
        (floor(($"n_docs" - 1) / batch) + 1).cast("long"))
      .withColumn("padded_tokens", ($"n_docs" * $"bucket").cast("long"))
      .withColumn("pad_waste",
        round(lit(1.0) - $"total_tokens".cast("double") / $"padded_tokens", 6))
      .select($"bucket", $"n_docs", $"n_batches", $"total_tokens",
        $"padded_tokens", $"pad_waste")
      .orderBy($"bucket")
  }

  def lengthBucketsSql(batch: Int = 8): String = {
    val ladder = bucketLadder
      .map(r => s"WHEN n_tokens <= $r THEN $r").mkString("\n|      ")
    s"""WITH d AS (
       |  SELECT least(len($tokensSql), 4096) AS n_tokens FROM documents),
       |b AS (SELECT n_tokens,
       |    CASE $ladder
       |      ELSE 4096 END AS bucket
       |  FROM d),
       |g AS (SELECT bucket, COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens
       |      FROM b GROUP BY bucket)
       |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs,
       |  CAST((n_docs - 1) // $batch + 1 AS BIGINT) AS n_batches,
       |  CAST(total_tokens AS BIGINT) AS total_tokens,
       |  CAST(n_docs * bucket AS BIGINT) AS padded_tokens,
       |  round(1.0 - CAST(total_tokens AS DOUBLE) / (n_docs * bucket), 6)
       |    AS pad_waste
       |FROM g ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_prefix_groups — shared-prefix grouping (KV-cache planning)
  // ---------------------------------------------------------------

  /** Shared-prefix grouping: documents whose first `p` tokens are
    * identical form a group, ranked by the KV-cache token savings of
    * serving them together — after the first member pays the prefix,
    * every further member reuses its cache entry, saving
    * `(n_docs − 1) · prefix_len` prefill tokens. This is the batch
    * planner behind prefix-cache-aware request routing (and, on
    * training data, a template/boilerplate detector: big groups are
    * shared headers). Documents shorter than `p` group on their whole
    * text. Top-`k` groups by savings, identified by prefix md5.
    *
    * Scale posture (100 TB): prefix hash is a codegen'd scalar per
    * row; ONE partial+final count on the 16-byte hash (never the
    * prefix text), then TakeOrdered(k). Nothing corpus-proportional
    * leaves the aggregate. */
  def prefixGroups(spark: SparkSession, sfDir: String,
                   p: Int = 16, k: Int = 20): DataFrame =
    prefixGroupsOf(docs(spark, sfDir), p, k)

  /** [[prefixGroups]] over any `(doc_id, text)`-bearing frame. */
  def prefixGroupsOf(documents: DataFrame, p: Int = 16, k: Int = 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(p >= 1, s"prefix length must be >= 1, got $p")
    require(k >= 1, s"top-k must be >= 1, got $k")
    documents
      .select($"doc_id", slice(tokens($"text"), 1, p).as("pfx"))
      .filter(size($"pfx") > 0)
      .select(md5(concat_ws(" ", $"pfx")).as("prefix_hash"),
        size($"pfx").cast("long").as("prefix_len"))
      .groupBy($"prefix_hash", $"prefix_len")
      .agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= 2)
      .withColumn("tokens_saved", ($"n_docs" - 1) * $"prefix_len")
      .select($"prefix_hash", $"prefix_len", $"n_docs", $"tokens_saved")
      .orderBy($"tokens_saved".desc, $"prefix_hash")
      .limit(k)
  }

  def prefixGroupsSql(p: Int = 16, k: Int = 20): String =
    s"""WITH d AS (
       |  SELECT doc_id, list_slice($tokensSql, 1, $p) AS pfx
       |  FROM documents),
       |h AS (SELECT md5(list_aggregate(pfx, 'string_agg', ' ')) AS prefix_hash,
       |             CAST(len(pfx) AS BIGINT) AS prefix_len
       |      FROM d WHERE len(pfx) > 0),
       |g AS (SELECT prefix_hash, prefix_len, COUNT(*) AS n_docs
       |      FROM h GROUP BY prefix_hash, prefix_len)
       |SELECT prefix_hash, prefix_len, n_docs,
       |  CAST((n_docs - 1) * prefix_len AS BIGINT) AS tokens_saved
       |FROM g WHERE n_docs >= 2
       |ORDER BY tokens_saved DESC, prefix_hash LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // llm_zipf_fit — Zipf's-law fit of the term-frequency distribution
  // ---------------------------------------------------------------

  /** Per-language Zipf's-law fit: least-squares slope / intercept /
    * R² of ln(freq) against ln(rank) over each language's top-`v`
    * terms. Natural corpora track slope ≈ −1; a corpus whose slope or
    * R² drifts (template spam flattens the head, boilerplate floods
    * single ranks) fails the health check before training does.
    *
    * Scale posture (100 TB): term counts are one partial+final
    * shuffle on (lang, term) — vocabulary-cardinality, ≪ corpus. The
    * per-language top-`v` cut is the `row_number() ≤ k` window-filter
    * shape [[graft.plans.RowNumberTopKRewrite]] upgrades to the
    * native bounded-heap plan under the library extensions, so the
    * rank pass holds v rows per language, not the vocabulary. The
    * regression itself runs over ≤ v·|langs| rows — driver-trivial,
    * executed distributed anyway. */
  def zipfFit(spark: SparkSession, sfDir: String, v: Int = 500): DataFrame =
    zipfFitOf(docs(spark, sfDir), v)

  /** [[zipfFit]] over any `(lang, text)`-bearing frame. */
  def zipfFitOf(documents: DataFrame, v: Int = 500): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(v >= 2, s"need at least 2 ranked terms for a fit, got $v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n".desc, $"term")
    documents
      .select($"lang", explode(tokens($"text")).as("term"))
      .groupBy($"lang", $"term").agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= v)
      .select($"lang",
        log($"rnk".cast("double")).as("x"), log($"n".cast("double")).as("y"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_terms"),
        round(expr("regr_slope(y, x)"), 6).as("slope"),
        round(expr("regr_intercept(y, x)"), 6).as("intercept"),
        round(expr("regr_r2(y, x)"), 6).as("r2"))
      .orderBy($"lang")
  }

  def zipfFitSql(v: Int = 500): String =
    s"""WITH terms AS (
       |  SELECT lang, unnest($tokensSql) AS term FROM documents),
       |tc AS (SELECT lang, term, COUNT(*) AS n FROM terms
       |       GROUP BY lang, term),
       |rk AS (SELECT lang, term, n, ROW_NUMBER() OVER (
       |         PARTITION BY lang ORDER BY n DESC, term) AS rnk
       |       FROM tc),
       |xy AS (SELECT lang, ln(CAST(rnk AS DOUBLE)) AS x,
       |              ln(CAST(n AS DOUBLE)) AS y
       |       FROM rk WHERE rnk <= $v)
       |SELECT lang, COUNT(*) AS n_terms,
       |  round(regr_slope(y, x), 6) AS slope,
       |  round(regr_intercept(y, x), 6) AS intercept,
       |  round(regr_r2(y, x), 6) AS r2
       |FROM xy GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_weighted_sample — deterministic weighted sampling (A-ES)
  // ---------------------------------------------------------------

  /** Efraimidis–Spirakis weighted sampling without replacement:
    * each document draws a deterministic uniform u from its content
    * hash and ranks by key = −ln(u)/w with weight w = token count —
    * the top-`k` by smallest key IS a weight-proportional sample
    * (heavier documents draw systematically smaller keys). The md5
    * derivation makes the "randomness" reproducible across engines
    * and re-runs — the same property [[hashSample]]'s Bernoulli
    * variant pins, upgraded to weighted-without-replacement.
    *
    * Zero-weight (empty) documents are excluded outright rather than
    * riding division-by-zero semantics, which the two engines don't
    * share. Scale posture: scan → filter → TakeOrdered(k); no
    * shuffle beyond the top-k merge, nothing corpus-proportional. */
  def weightedSample(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    weightedSampleOf(docs(spark, sfDir), k)

  /** [[weightedSample]] over any `(doc_id, lang, text)` frame. */
  def weightedSampleOf(documents: DataFrame, k: Int = 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(k >= 1, s"sample size must be >= 1, got $k")
    // u ∈ (0, 1]: the +1 keeps ln defined at the all-zero digest
    val u = (md5i32($"text", 11).cast("double") + 1.0) / 4294967296.0
    documents
      .select($"doc_id", $"lang",
        size(tokens($"text")).cast("long").as("n_tokens"),
        (-log(u)).as("nl"))
      .filter($"n_tokens" > 0)
      .withColumn("key", $"nl" / $"n_tokens")
      .orderBy($"key".asc, $"doc_id")
      .limit(k)
      .select($"doc_id", $"lang", $"n_tokens", round($"key", 6).as("sample_key"))
  }

  def weightedSampleSql(k: Int = 20): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, len($tokensSql) AS n_tokens,
       |    -ln((${md5i32Sql("text", 11)} + 1.0) / 4294967296.0)
       |      AS nl
       |  FROM documents)
       |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  round(nl / n_tokens, 6) AS sample_key
       |FROM d WHERE n_tokens > 0
       |ORDER BY nl / n_tokens, doc_id LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // llm_reservoir_per_key — weighted reservoir per stratum
  // ---------------------------------------------------------------

  /** Per-stratum weighted reservoir: the [[weightedSampleOf]]
    * Efraimidis–Spirakis keys, but `k` winners PER LANGUAGE instead
    * of `k` global — the builder for a mix that is balanced across
    * strata AND weight-proportional within each (the global top-k
    * would let one token-heavy language crowd out the rest).
    *
    * Scale posture: this is "reservoir sampling" as a distributed
    * dataflow — the classic streaming reservoir keeps per-key state
    * on one machine; here each executor keeps a bounded k-heap per
    * key via the native [[graft.plans.TopKPerKey]] operator (one
    * shuffle on `lang`, partial heaps merged map-side, NO
    * per-partition full sort), so per-key state is O(k·strata) and
    * the output ≤ k·strata rows regardless of corpus size. The tiny
    * rank window afterwards sorts only the ≤ k survivors per key.
    * Reproducible across runs, engines, and partition layouts — the
    * "randomness" is the content-hash uniform draw. */
  def reservoirPerKey(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    reservoirPerKeyOf(docs(spark, sfDir), k)

  /** [[reservoirPerKey]] over any `(doc_id, lang, text)` frame. */
  def reservoirPerKeyOf(documents: DataFrame, k: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(k >= 1, s"sample size must be >= 1, got $k")
    val u = (md5i32($"text", 11).cast("double") + 1.0) / 4294967296.0
    val keyed = documents
      .select($"doc_id", $"lang",
        size(tokens($"text")).cast("long").as("n_tokens"),
        (-log(u)).as("nl"))
      .filter($"n_tokens" > 0)
      .withColumn("skey", $"nl" / $"n_tokens")
    // one sort spec drives both the heap retention and the rank
    // window (the topKPerKeyNative rule — two copies would mis-rank)
    val sortSpec = Seq(keyed("skey").asc, keyed("doc_id").asc)
    val top = org.apache.spark.sql.GraftSqlBridge.topKPerKey(
      keyed, Seq(keyed("lang")), sortSpec, k)
    top
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"skey".asc, $"doc_id".asc)).cast("long"))
      .select($"lang", $"rk", $"doc_id",
        $"n_tokens", round($"skey", 6).as("sample_key"))
      .orderBy($"lang", $"rk")
  }

  def reservoirPerKeySql(k: Int = 10): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, len($tokensSql) AS n_tokens,
       |    -ln((${md5i32Sql("text", 11)} + 1.0) / 4294967296.0) AS nl
       |  FROM documents),
       |r AS (
       |  SELECT lang, doc_id, n_tokens, nl / n_tokens AS skey,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY nl / n_tokens, doc_id) AS rk
       |  FROM d WHERE n_tokens > 0)
       |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id,
       |  CAST(n_tokens AS BIGINT) AS n_tokens, round(skey, 6) AS sample_key
       |FROM r WHERE rk <= $k ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------
  // llm_dsir_select — importance-resampling data selection (DSIR)
  // ---------------------------------------------------------------

  val DsirDims = 256
  val DsirSalt = 53
  val DsirSelectN = 200
  val DsirTargetLang = "en"

  /** DSIR data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every
    * raw document by how much more likely its hashed-unigram features
    * are under a TARGET distribution than under the RAW corpus, keep
    * the top N. The feature space is `dims` hash buckets (the
    * [[featureHash]] trick — no vocabulary to build, broadcast, or
    * keep consistent); both distributions are add-1-smoothed bucket
    * unigram models, and a document's log importance weight is the
    * sum of ln(p_target(bucket)/p_raw(bucket)) over its tokens. The
    * target slice here is the corpus's own `lang = 'en'` partition —
    * the stand-in for the paper's Wikipedia+books target corpus.
    * Deterministic top-N replaces the paper's Gumbel-noised
    * resampling (documented deviation: no RNG, so both engines and
    * every re-run select identically).
    *
    * Scale posture: ONE token scan — the cached bucket frame feeds
    * the bucket model, the totals, and the per-doc sum; the model is
    * `dims` rows → broadcast, totals ride a broadcast 1-row cross
    * join; the per-doc sum is a partial+final aggregate on doc_id.
    * The exact global rank is a window at test scale; at 100 TB the
    * keep set comes from an `approxQuantile` threshold on `lw`
    * instead (selection is a weight threshold either way — only the
    * exact rank column is test-scale luxury). Ranking uses the
    * ROUNDED weight with doc_id ties so both engines cut the same
    * boundary. */
  def dsirSelect(spark: SparkSession, sfDir: String, dims: Int = DsirDims,
                 selectN: Int = DsirSelectN): DataFrame = {
    import spark.implicits._
    require(dims >= 2, s"bucket count must be >= 2, got $dims")
    require(selectN >= 1, s"selection size must be >= 1, got $selectN")
    val terms = cached("dsirTerms",
      docs(spark, sfDir)
        .select($"doc_id", $"lang", explode(tokens($"text")).as("term"))
        .select($"doc_id", $"lang",
          pmod(md5i32($"term", DsirSalt), lit(dims)).as("b")))
    val isTarget = $"lang" === DsirTargetLang
    val buckets = terms.groupBy($"b")
      .agg(count(lit(1)).cast("double").as("cr"),
        sum(when(isTarget, 1L).otherwise(0L)).cast("double").as("ct"))
    val tots = terms.agg(count(lit(1)).cast("double").as("nr"),
      sum(when(isTarget, 1.0).otherwise(0.0)).as("nt"))
    val llr = buckets.crossJoin(broadcast(tots))
      .select($"b",
        (log(($"ct" + 1.0) / ($"nt" + dims))
          - log(($"cr" + 1.0) / ($"nr" + dims))).as("llr"))
    // + 0.0 normalizes IEEE negative zero: a document whose llr sum is
    // a tiny negative rounds to -0.0 in DuckDB but +0.0 in Spark
    // (HALF_UP via BigDecimal), and the driver's %.9g compare prints
    // them differently — first seen at sf1, where the bigger corpus
    // actually lands a sum in (-5e-5, 0). (-0.0) + 0.0 == +0.0 in
    // both engines and is the identity everywhere else.
    val byDoc = terms.join(broadcast(llr), "b")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (round(sum($"llr"), 4) + lit(0.0)).as("lw"))
    // distributed exact rank: a bare Window.orderBy would funnel the
    // whole corpus through ONE task at any scale; the GlobalRank tier
    // keeps the window below capacity and range-partitions past it
    // (parquet metadata makes the bounding count cheap)
    val scored = docs(spark, sfDir).select($"doc_id", $"lang")
      .join(byDoc, Seq("doc_id"), "left")
      .na.fill(Map("n_tokens" -> 0L, "lw" -> 0.0))
    graft.util.GlobalRank
      .withRowNumber(scored, "rank", docs(spark, sfDir).count(),
        $"lw".desc, $"doc_id")
      .withColumn("keep", $"rank" <= selectN)
      .select($"doc_id", $"lang", $"n_tokens", $"lw", $"rank", $"keep")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------
  // llm_shuffle_shards — deterministic global shuffle + sharding
  // ---------------------------------------------------------------

  val ShuffleShards = 8
  val ShuffleSalt = 71

  /** The training-order shuffle: every document gets a deterministic
    * pseudo-random position (salted hash of its id), shards by
    * position modulus, and takes a dense within-shard sequence in
    * position order — the step that turns a curated corpus into N
    * reproducibly-shuffled training shard files. Hash-derived order
    * means no RNG state to checkpoint and byte-identical shards on
    * re-run (same property every sampler here pins, applied to
    * ordering); changing the salt is a fresh epoch-level reshuffle.
    *
    * Scale posture (100 TB): shard assignment is a scalar hash — no
    * shuffle at all until the write repartitions on `shard` (one
    * hash exchange); the sequence is a window PARTITIONED BY shard,
    * so each sort is shard-local (corpus/N), never global. Collisions
    * in the 32-bit position tie-break on doc_id in both engines. */
  def shuffleShards(spark: SparkSession, sfDir: String,
                    shards: Int = ShuffleShards): DataFrame = {
    import spark.implicits._
    require(shards >= 1, s"shard count must be >= 1, got $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"h", $"doc_id")
    docs(spark, sfDir)
      .select($"doc_id", $"n_chars",
        md5i32($"doc_id".cast("string"), ShuffleSalt).as("h"))
      .withColumn("shard", pmod($"h", lit(shards)).cast("long"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select($"shard", $"seq", $"doc_id", $"n_chars")
      .orderBy($"shard", $"seq")
  }

  def shuffleShardsSql(shards: Int = ShuffleShards): String =
    s"""WITH h AS (
       |  SELECT doc_id, n_chars,
       |    ${md5i32Sql("CAST(doc_id AS VARCHAR)", ShuffleSalt)} AS h
       |  FROM documents),
       |s AS (SELECT doc_id, n_chars, h, h % $shards AS shard FROM h)
       |SELECT shard, CAST(row_number() OVER (PARTITION BY shard
       |         ORDER BY h, doc_id) AS BIGINT) AS seq,
       |  doc_id, n_chars
       |FROM s ORDER BY shard, seq""".stripMargin

  def dsirSelectSql(dims: Int = DsirDims, selectN: Int = DsirSelectN): String =
    s"""WITH t AS (SELECT doc_id, lang, unnest($tokensSql) AS term FROM documents),
       |h AS (SELECT doc_id, lang,
       |        ${md5i32Sql("term", DsirSalt)} % $dims AS b FROM t),
       |bk AS (SELECT b, COUNT(*)::DOUBLE AS cr,
       |         SUM(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END)::DOUBLE AS ct
       |       FROM h GROUP BY b),
       |tt AS (SELECT COUNT(*)::DOUBLE AS nr,
       |         SUM(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END)::DOUBLE AS nt
       |       FROM h),
       |s AS (SELECT h.doc_id,
       |        ln((ct + 1) / (nt + $dims)) - ln((cr + 1) / (nr + $dims)) AS llr
       |      FROM h JOIN bk USING (b) CROSS JOIN tt),
       |d AS (SELECT doc_id, COUNT(*) AS n_tokens,
       |        round(SUM(llr), 4) + 0.0 AS lw
       |      FROM s GROUP BY doc_id),
       |j AS (SELECT doc.doc_id, doc.lang,
       |        COALESCE(d.n_tokens, 0) AS n_tokens, COALESCE(d.lw, 0.0) AS lw
       |      FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id),
       |r AS (SELECT *, CAST(row_number() OVER (ORDER BY lw DESC, doc_id) AS BIGINT)
       |        AS rank FROM j)
       |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, lw, rank,
       |  rank <= $selectN AS keep
       |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_sentence_stats — sentence segmentation signals
  // ---------------------------------------------------------------

  /** Per-document sentence statistics (count, mean and max words per
    * sentence) — the line/sentence-structure signals the Gopher rule
    * family reads beyond bag-of-words. Segmentation is the simple
    * terminal-punctuation split (`[.!?]+`) both engines agree on;
    * everything stays inside higher-order array functions — no
    * explode, so the corpus never fans out sentence-wise on the wire,
    * and the per-row state is one small array.
    *
    * The mean is a raw division of exact longs (deterministic, no
    * rounding); sentence-less docs report zeros. */
  def sentenceStatsOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val segs = split($"text", "[.!?]+")
    val wordsPer = transform(segs,
      s => size(regexp_extract_all(lower(s), lit("[\\p{L}\\p{N}_]+"), lit(0)))
        .cast("long"))
    documents
      .select($"doc_id", filter(wordsPer, w => w > 0L).as("ws"))
      .select($"doc_id",
        size($"ws").cast("long").as("n_sentences"),
        coalesce(aggregate($"ws", lit(0L), (a, x) => a + x), lit(0L))
          .as("n_words"),
        coalesce(array_max($"ws"), lit(0L)).as("max_sent_words"))
      .select($"doc_id", $"n_sentences",
        ($"n_words".cast("double") / greatest($"n_sentences", lit(1L)))
          .as("avg_sent_words"),
        $"max_sent_words")
      .orderBy($"doc_id")
  }

  def sentenceStats(spark: SparkSession, sfDir: String): DataFrame =
    sentenceStatsOf(docs(spark, sfDir))

  val sentenceStatsSql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    [len(regexp_extract_all(lower(seg), '[\p{L}\p{N}_]+'))
      |     for seg in string_split_regex(text, '[.!?]+')] AS wall
      |  FROM documents),
      |f AS (SELECT doc_id, list_filter(wall, w -> w > 0) AS ws FROM s)
      |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_sentences,
      |  CAST(COALESCE(list_sum(ws), 0) AS DOUBLE)
      |    / greatest(len(ws), 1) AS avg_sent_words,
      |  CAST(COALESCE(list_max(ws), 0) AS BIGINT) AS max_sent_words
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_code_detect — code-vs-prose heuristic gate
  // ---------------------------------------------------------------

  /** Code-vs-prose detection by punctuation-structure counting (the
    * cheap gate a curation pipeline runs before language ID — code
    * misclassifies as low-quality prose otherwise): braces,
    * semicolons, and indented lines score each document, and the
    * verdict compares cross-multiplied integers against the document
    * length so no float sits on the decision boundary. Report is the
    * per-source census a mixing policy consumes.
    *
    * Scale: per-row counting via length-difference and one line
    * split, one source-keyed aggregate — a single scan. */
  val CodeScoreNum = 50

  def codeDetectOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    def occur(ch: String) =
      (length($"text") - length(regexp_replace($"text", java.util.regex.Pattern.quote(ch), "")))
        .cast("long")
    val indented = size(filter(split($"text", "\\n"),
      l => l.startsWith("  ") || l.startsWith("\t"))).cast("long")
    val scored = documents.select($"source",
      (occur("{") + occur("}") + occur(";") * 2L + indented * 3L).as("score"),
      greatest(length($"text").cast("long"), lit(1L)).as("n_chars"))
      .withColumn("is_code", $"score" * lit(CodeScoreNum.toLong) >= $"n_chars")
    scored.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"is_code", 1L).otherwise(0L)).as("n_code"))
      .select($"source", $"n_docs", $"n_code",
        ($"n_code".cast("double") / $"n_docs").as("code_frac"))
      .orderBy($"source")
  }

  def codeDetect(spark: SparkSession, sfDir: String): DataFrame =
    codeDetectOf(docs(spark, sfDir))

  val codeDetectSql: String =
    s"""WITH f AS (
       |  SELECT source,
       |    (length(text) - length(replace(text, '{', '')))
       |      + (length(text) - length(replace(text, '}', '')))
       |      + (length(text) - length(replace(text, ';', ''))) * 2
       |      + len(list_filter(string_split(text, chr(10)),
       |            l -> l LIKE '  %' OR l LIKE chr(9) || '%')) * 3 AS score,
       |    greatest(length(text), 1) AS n_chars
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN score * $CodeScoreNum >= n_chars
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
       |  CAST(SUM(CASE WHEN score * $CodeScoreNum >= n_chars
       |       THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS code_frac
       |FROM f GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // llm_countmin_replay — engine-neutral Count-Min sketch, cell
  // contents differentially checked
  // ---------------------------------------------------------------

  /** Count-Min sketch parameters shared by the Scala operator and its
    * oracle SQL. depth×width = 2048 counters — the whole frequency
    * structure is ~16 KB regardless of corpus size. */
  val CmsDepth = 4
  val CmsWidth = 512
  val CmsTopK = 15

  /** Count-Min sketch over the term stream with every counter exactly
    * replayed by the oracle — the [[graft.functions.KMinValuesAgg]]
    * story (KMV vs HLL) applied to the second classic sketch:
    * [[heavyHittersBound]] certifies Spark's engine-internal
    * `count_min_sketch` only up to its ε·N band, because its cell
    * layout (random Murmur rows) cannot be reproduced outside the
    * JVM. This sketch hashes with the engine-neutral affine family
    * derived from ONE md5 digest per term
    * ([[graft.functions.Hashing.md5Pair]] words `a`, `b|1`; row i's
    * hash is `(a + i·b) mod 2^32` via
    * [[graft.functions.Hashing.affine32]] — the MinHash one-digest
    * discipline), so the DuckDB oracle rebuilds the SAME depth×width
    * counter table and the SAME min-over-rows estimates bit-for-bit —
    * the sketch CONTENTS are the check, not a tolerance band.
    *
    * Build is a plain aggregate (no custom state needed): explode
    * each term into `depth` (salt, cell) assignments, partial+final
    * count per cell. Map-side combine collapses every task's slice to
    * ≤ depth·width rows before the shuffle, so the exchange carries
    * ≤ 2048 rows per task no matter how many terms — the property
    * that makes CMS the frequency structure that merges at 100 TB
    * (per-executor sketches sum cell-wise; a per-term exact count
    * would shuffle every distinct term). Estimates for the top-`k`
    * exact terms ride a broadcast of the ≤ 2048-row sketch; CMS
    * guarantees est ≥ exact per probe (`overcount` ≥ 0, and = 0 when
    * no heavier term collides on all `depth` rows).
    *
    * Diagnostic twin discipline (as [[heavyHittersBound]]): the exact
    * top-`k` is the certificate; production ships only the cells. */
  def countMinReplayOf(documents: DataFrame, depth: Int = CmsDepth,
                       width: Int = CmsWidth, k: Int = CmsTopK): DataFrame = {
    import documents.sparkSession.implicits._
    val terms = cached("cms-terms",
      documents.select(explode(tokens($"text")).as("term")))
    // affine row family from ONE digest (the MinHash discipline):
    // the depth per-token hashes were depth separately salted md5
    // passes over the term stream; the i-th row hash is now two
    // arithmetic ops on the shared digest words. The digest struct is
    // PROJECTED before the explode (the md5Pair contract: inlining
    // p.getField into every array element copies the whole digest
    // subtree into the generator, where codegen subexpression
    // elimination cannot reach — each row paid 8 md5 passes instead
    // of 1, which is how the one-digest rewrite managed to get SLOWER
    // than the 4 salted passes it replaced: 3.20 → 4.56 s sf1,
    // round-15 verdict item 2).
    def withAb(df: DataFrame): DataFrame = df
      .withColumn("hp", graft.functions.Hashing.md5Pair($"term"))
      .withColumn("ha", $"hp.a")
      .withColumn("hb", $"hp.b".bitwiseOR(lit(1L)))
      .drop("hp")
    def saltCells = array((0 until depth).map(s =>
      struct(lit(s).as("salt"),
        pmod(graft.functions.Hashing.affine32($"ha", $"hb", s),
          lit(width.toLong)).as("cell"))): _*)
    val cells = withAb(terms)
      .select(explode(saltCells).as("sc"))
      .select($"sc.salt".as("salt"), $"sc.cell".as("cell"))
      .groupBy($"salt", $"cell")
      .agg(count(lit(1)).as("c"))
    val top = terms.groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term").limit(k)
    val probe = withAb(top)
      .select($"term", $"n", explode(saltCells).as("sc"))
      .select($"term", $"n", $"sc.salt".as("salt"), $"sc.cell".as("cell"))
    // the sketch is statically ≤ depth·width rows — broadcast is safe
    // by construction, no tier gate needed
    probe.join(broadcast(cells), Seq("salt", "cell"))
      .groupBy($"term", $"n")
      .agg(min($"c").as("est"))
      .select($"term", $"n", $"est", ($"est" - $"n").as("overcount"))
      .orderBy($"n".desc, $"term")
  }

  def countMinReplay(spark: SparkSession, sfDir: String): DataFrame =
    countMinReplayOf(docs(spark, sfDir))

  def countMinReplaySql(depth: Int = CmsDepth, width: Int = CmsWidth,
                        k: Int = CmsTopK): String = {
    val a = "('0x' || substr(md5(term), 1, 8))::BIGINT"
    val b = "(('0x' || substr(md5(term), 9, 8))::BIGINT | 1)"
    val h = s"((($a + salt * $b) & 4294967295))"
    s"""WITH terms AS (SELECT unnest($tokensSql) AS term FROM documents),
       |salts AS (SELECT unnest(range($depth)) AS salt),
       |cells AS (
       |  SELECT salt, $h % $width AS cell, COUNT(*) AS c
       |  FROM terms CROSS JOIN salts GROUP BY 1, 2),
       |top AS (SELECT term, COUNT(*) AS n FROM terms
       |        GROUP BY term ORDER BY n DESC, term LIMIT $k),
       |probe AS (SELECT t.term, t.n, s.salt, $h % $width AS cell
       |          FROM top t CROSS JOIN salts s)
       |SELECT p.term, p.n, MIN(c.c) AS est, MIN(c.c) - p.n AS overcount
       |FROM probe p JOIN cells c ON p.salt = c.salt AND p.cell = c.cell
       |GROUP BY p.term, p.n
       |ORDER BY n DESC, term""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_inverted_index — df-capped posting-list build
  // ---------------------------------------------------------------

  /** Posting-list tuning shared with the oracle: terms with df
    * outside [2, IndexDfCap] are dropped (df=1 terms retrieve
    * nothing; df > cap terms are stopword-class, the same df
    * discipline as the dedup shingle index), and each surviving term
    * keeps its `IndexPostings` best postings. */
  val IndexDfCap = 400
  val IndexPostings = 8
  val IndexTopTerms = 20

  /** Inverted-index build — the retrieval-side build-once artifact
    * (the text analogue of the persisted IVF index): term → df,
    * total tf, and a bounded posting list of the `p` highest-tf
    * documents (ties doc_id asc), rendered `doc:tf` space-joined so
    * the whole artifact row is hash-comparable.
    *
    * Scale shape: tf is one partial+final aggregate on (term,
    * doc_id); df/ttf reuses that output co-partitioned on term; the
    * per-term posting cap runs through the native bounded-heap
    * top-k operator ([[graft.plans.TopKPerKey]]) — ≤ p rows per term
    * per task cross the wire, no per-term sort of the full posting
    * set anywhere. The df cap bounds the worst-case posting list
    * BEFORE the heap even sees it, so no stopword's million-document
    * posting set is ever materialized. Output here is the catalog
    * sample (top terms by df); the production sink writes the full
    * banded index partitioned by term bucket. */
  def invertedIndexOf(documents: DataFrame, dfCap: Int = IndexDfCap,
                      p: Int = IndexPostings,
                      topTerms: Int = IndexTopTerms): DataFrame = {
    import documents.sparkSession.implicits._
    val tf = documents
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").cast("long").as("ttf"))
      .filter($"df".between(2, dfCap))
    val kept = tf.join(stats, "term")
    val best = org.apache.spark.sql.GraftSqlBridge.topKPerKey(
      kept, Seq(kept("term")), Seq(kept("tf").desc, kept("doc_id").asc), p)
    best
      .groupBy($"term", $"df", $"ttf")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct((-$"tf").as("negtf"), $"doc_id"))),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            (-x.getField("negtf")).cast("string"))),
        " ").as("postings"))
      .orderBy($"df".desc, $"ttf".desc, $"term")
      .limit(topTerms)
      .select($"term", $"df", $"ttf", $"postings")
  }

  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    invertedIndexOf(docs(spark, sfDir))

  def invertedIndexSql(dfCap: Int = IndexDfCap, p: Int = IndexPostings,
                       topTerms: Int = IndexTopTerms): String =
    s"""WITH tf AS (
       |  SELECT term, doc_id, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($tokensSql) AS term FROM documents)
       |  GROUP BY term, doc_id),
       |st AS (
       |  SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS ttf
       |  FROM tf GROUP BY term HAVING COUNT(*) BETWEEN 2 AND $dfCap),
       |pk AS (
       |  SELECT t.term, t.doc_id, t.tf,
       |    row_number() OVER (PARTITION BY t.term
       |                       ORDER BY t.tf DESC, t.doc_id) AS rk
       |  FROM tf t JOIN st USING (term)),
       |po AS (
       |  SELECT term,
       |    string_agg(doc_id || ':' || tf, ' ' ORDER BY tf DESC, doc_id)
       |      AS postings
       |  FROM pk WHERE rk <= $p GROUP BY term)
       |SELECT s.term, s.df, s.ttf, po.postings
       |FROM st s JOIN po USING (term)
       |ORDER BY df DESC, ttf DESC, term LIMIT $topTerms""".stripMargin
}
