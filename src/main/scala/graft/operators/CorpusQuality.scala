package graft.operators

import graft.functions.Hashing.md5i32Sql
import graft.functions.TextAnalysis._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality and data-mixing operators for training-data
  * curation, extending the engine past the reference's only text op
  * (splitting a cast string on "," — `Code/mapReduce.erl:140-143`)
  * toward the published filtering/weighting recipes used to build
  * LLM pretraining corpora: the Gopher rule suite (Rae et al. 2021),
  * soft deduplication by n-gram commonness (down-weighting instead of
  * dropping), z-scored curriculum staging, and per-source n-gram
  * novelty accounting.
  *
  * Scale posture (100 TB): every operator is scan → per-row codegen'd
  * (or array-HOF) feature extraction → partial+final hash aggregates
  * on low-cardinality keys (rule / stage / source) or on the shingle
  * key. No global sorts, no windows over the raw corpus, no driver
  * materialization beyond 1-row stats frames. Rule thresholds are
  * compared in INTEGER arithmetic (`alpha*5 >= words*4`, not
  * `alpha/words >= 0.8`) so the pass/fail boundary is exact on both
  * engines; the one float boundary (curriculum z-cuts) is rounded to
  * 4 dp first, the library-wide idiom for cross-engine float noise
  * (see [[Relational.outlierZscoreOf]]).
  */
object CorpusQuality {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  // shared frame cache for the operators whose shingle stream feeds
  // two aggregation branches (the Dedup/TextAnalytics idiom)
  private val frameCache = new graft.util.FrameCache()

  private def cached(stage: String, df: DataFrame): DataFrame =
    frameCache.getOrElseUpdate(df.sparkSession,
      graft.util.FrameCache.key(stage, df))(df.cache())

  /** All five marker lists folded together — the Gopher stopword rule
    * only asks "does the document contain common function words in
    * ANY supported language". */
  private val allMarkers: Seq[String] = langMarkers.flatMap(_._2)

  // Gopher rule thresholds — ONE definition feeding the per-rule
  // report, the curation pipeline's gate, and both oracles.
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMinMwl = 3   // mean word length bounds, compared as
  val GopherMaxMwl = 10  // word_chars vs bounds*words (integer-exact)
  val GopherMinStop = 2

  // ---------------------------------------------------------------
  // llm_gopher_rules — per-rule failure accounting (Rae et al. 2021)
  // ---------------------------------------------------------------

  /** The Gopher quality-rule suite, reported as one row per rule with
    * its corpus-wide failure count and rate, plus an `any_rule` row
    * (documents failing at least one rule — the fraction a
    * Gopher-style gate would drop). Rules, adapted to what the
    * corpus model here can express (no line structure):
    *
    *  - `word_count`        50 ≤ tokens ≤ 100 000
    *  - `mean_word_length`  3 ≤ word-chars / tokens ≤ 10
    *  - `alpha_ratio`       ≥ 80 % of tokens contain a letter
    *  - `digit_ratio`       ≤ 30 % of tokens are all-digit
    *  - `stopwords`         ≥ 2 distinct function-word markers
    *
    * All thresholds are evaluated in integer arithmetic so the
    * boundary is bit-exact across engines. One scan, one 1-row
    * aggregate, then a 6-row explode — nothing here grows with the
    * corpus.
    */
  /** Per-document Gopher feature frame — ONE definition feeding the
    * rule census and the score-evaluation queries (AUC/calibration)
    * so the label can never drift from the gate. */
  private[operators] def gopherFeaturesOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val ts = tokens($"text")
    documents.select(
      $"doc_id",
      size(ts).cast("long").as("n_words"),
      length(regexp_replace(lower($"text"), "[^\\p{L}\\p{N}_]+", ""))
        .cast("long").as("word_chars"),
      size(filter(ts, t => t.rlike("\\p{L}"))).cast("long").as("alpha_words"),
      size(filter(ts, t => t.rlike("^\\p{N}+$"))).cast("long").as("digit_words"),
      size(array_intersect(array_distinct(ts),
        array(allMarkers.map(lit): _*))).cast("long").as("stop_hits"))
  }

  // the five rule predicates over a gopherFeaturesOf frame — object-
  // level so every consumer compares the SAME integer expressions
  private def failWc = !(col("n_words") >= GopherMinWords.toLong &&
    col("n_words") <= GopherMaxWords.toLong)
  private def failMwl = !(col("word_chars") >= col("n_words") * GopherMinMwl.toLong &&
    col("word_chars") <= col("n_words") * GopherMaxMwl.toLong)
  private def failAlpha = !(col("alpha_words") * 5L >= col("n_words") * 4L)
  private def failDigit = !(col("digit_words") * 10L <= col("n_words") * 3L)
  private def failStop = !(col("stop_hits") >= GopherMinStop.toLong)

  /** Per-document any-rule failure flag `(doc_id, fail_any)`. */
  private[operators] def gopherFlagsOf(documents: DataFrame): DataFrame =
    gopherFeaturesOf(documents).select(col("doc_id"),
      (failWc || failMwl || failAlpha || failDigit || failStop)
        .as("fail_any"))

  def gopherRulesOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val f = gopherFeaturesOf(documents)
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val agg = f.agg(
      count(lit(1)).as("total"),
      cnt(failWc).as("f_wc"), cnt(failMwl).as("f_mwl"),
      cnt(failAlpha).as("f_alpha"), cnt(failDigit).as("f_digit"),
      cnt(failStop).as("f_stop"),
      cnt(failWc || failMwl || failAlpha || failDigit || failStop)
        .as("f_any"))
    agg.select($"total", explode(array(
      struct(lit("alpha_ratio").as("rule"), $"f_alpha".as("n_fail")),
      struct(lit("any_rule").as("rule"), $"f_any".as("n_fail")),
      struct(lit("digit_ratio").as("rule"), $"f_digit".as("n_fail")),
      struct(lit("mean_word_length").as("rule"), $"f_mwl".as("n_fail")),
      struct(lit("stopwords").as("rule"), $"f_stop".as("n_fail")),
      struct(lit("word_count").as("rule"), $"f_wc".as("n_fail")))).as("r"))
      .select($"r.rule".as("rule"), $"r.n_fail".as("n_fail"),
        ($"r.n_fail".cast("double") / $"total").as("fail_rate"))
      .orderBy($"rule")
  }

  def gopherRules(spark: SparkSession, sfDir: String): DataFrame =
    gopherRulesOf(docs(spark, sfDir))

  val gopherRulesSql: String = {
    val markers = allMarkers.map(m => s"'$m'").mkString(", ")
    s"""WITH t AS (SELECT $tokensSql AS ts, lower(text) AS lt FROM documents),
       |f AS (SELECT len(ts) AS n_words,
       |  length(regexp_replace(lt, '[^\\p{L}\\p{N}_]+', '', 'g')) AS word_chars,
       |  len(list_filter(ts, x -> regexp_matches(x, '\\p{L}'))) AS alpha_words,
       |  len(list_filter(ts, x -> regexp_matches(x, '^\\p{N}+$$'))) AS digit_words,
       |  len(list_intersect(list_distinct(ts), [$markers])) AS stop_hits
       |  FROM t),
       |g AS (SELECT COUNT(*) AS total,
       |  SUM(CASE WHEN NOT (n_words >= $GopherMinWords AND n_words <= $GopherMaxWords) THEN 1 ELSE 0 END) AS f_wc,
       |  SUM(CASE WHEN NOT (word_chars >= n_words * $GopherMinMwl AND word_chars <= n_words * $GopherMaxMwl) THEN 1 ELSE 0 END) AS f_mwl,
       |  SUM(CASE WHEN NOT (alpha_words * 5 >= n_words * 4) THEN 1 ELSE 0 END) AS f_alpha,
       |  SUM(CASE WHEN NOT (digit_words * 10 <= n_words * 3) THEN 1 ELSE 0 END) AS f_digit,
       |  SUM(CASE WHEN NOT (stop_hits >= $GopherMinStop) THEN 1 ELSE 0 END) AS f_stop,
       |  SUM(CASE WHEN NOT (n_words >= $GopherMinWords AND n_words <= $GopherMaxWords)
       |            OR NOT (word_chars >= n_words * $GopherMinMwl AND word_chars <= n_words * $GopherMaxMwl)
       |            OR NOT (alpha_words * 5 >= n_words * 4)
       |            OR NOT (digit_words * 10 <= n_words * 3)
       |            OR NOT (stop_hits >= $GopherMinStop) THEN 1 ELSE 0 END) AS f_any
       |  FROM f)
       |SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
       |  CAST(n_fail AS DOUBLE) / total AS fail_rate
       |FROM (
       |  SELECT 'alpha_ratio' AS rule, f_alpha AS n_fail, total FROM g
       |  UNION ALL SELECT 'any_rule', f_any, total FROM g
       |  UNION ALL SELECT 'digit_ratio', f_digit, total FROM g
       |  UNION ALL SELECT 'mean_word_length', f_mwl, total FROM g
       |  UNION ALL SELECT 'stopwords', f_stop, total FROM g
       |  UNION ALL SELECT 'word_count', f_wc, total FROM g)
       |ORDER BY rule""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_score_auc / llm_score_calibration — does the LM surprisal
  // score predict the rule gate? (ROC-AUC + reliability table)
  // ---------------------------------------------------------------

  /** ROC-AUC of the corpus-LM surprisal score
    * ([[TextAnalytics.unigramLogprob]]) against the Gopher any-rule
    * label ([[gopherFlagsOf]]): AUC = P(score(failing doc) >
    * score(passing doc)), ties counted half — the standard check
    * that a cheap continuous score agrees with the rule gate before
    * it replaces the gate at a tunable threshold (the perplexity-
    * filtering validation step in curation pipelines).
    *
    * Computed as the grouped rank-sum (Mann–Whitney U), never a
    * per-pair join: group documents by score value, one ordered
    * window over the SCORE GRID (documents collapse onto the 4-dp
    * surprisal grid — bounded, never corpus-sized), then
    * 2U = Σ_s n_pos(s)·(2·cum_neg(<s) + n_neg(s)) in exact BIGINTs.
    * AUC is ONE shared-text double chain (CASE-guarded: a class
    * empty → NaN). Overflow bound: 2U ≤ 2·P·N must fit BIGINT —
    * past ~10⁹ documents per class route U through DECIMAL(38,0).
    * Documents with zero tokens have no score and are excluded (they
    * fail word_count by definition; documented). */
  def scoreAuc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = TextAnalytics.unigramLogprob(spark, sfDir)
      .select($"doc_id", $"avg_surprisal".as("score"))
      .join(gopherFlagsOf(docs(spark, sfDir)), "doc_id")
      .select($"score", $"fail_any".as("label"))
    aucOf(scored)
  }

  /** [[scoreAuc]] over any `(score: double, label: boolean)` frame —
    * higher scores should predict `label = true`. */
  private[graft] def aucOf(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val g = scored.groupBy($"score").agg(
      sum(when($"label", 1L).otherwise(0L)).as("np"),
      sum(when($"label", 0L).otherwise(1L)).as("nn"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"score")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    g.withColumn("cumn", coalesce(sum($"nn").over(w), lit(0L)))
      .agg(count(lit(1)).as("n_scores"),
        sum($"np").as("p"), sum($"nn").as("n"),
        coalesce(sum($"np" * (lit(2L) * $"cumn" + $"nn")), lit(0L)).as("u2"))
      .select($"n_scores", $"p".as("n_pos"), $"n".as("n_neg"),
        expr(AucExpr).as("auc"))
  }

  /** The AUC chain — ONE text shared by Spark and the oracle. */
  private val AucExpr: String =
    """(CASE WHEN p = 0 OR n = 0 THEN CAST('NaN' AS DOUBLE)
      |  ELSE CAST(u2 AS DOUBLE)
      |   / (2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE)) END)""".stripMargin

  /** Reliability table for the surprisal score: documents bucketed
    * into `bins` equal-width score bands (integer boundary math on
    * the 1e-4 score grid — never a float percentile), each band
    * reporting its document count, mean score, and observed
    * rule-failure rate. A monotone failure-rate column is what
    * "the score is calibrated enough to threshold" looks like.
    * Floor-scaled rates (1e-6) and floor-mean scores, all BIGINT
    * until the final display division. */
  def scoreCalibration(spark: SparkSession, sfDir: String,
                       bins: Int = 10): DataFrame = {
    import spark.implicits._
    val scored = TextAnalytics.unigramLogprob(spark, sfDir)
      .select($"doc_id", $"avg_surprisal".as("score"))
      .join(gopherFlagsOf(docs(spark, sfDir)), "doc_id")
      .select(expr("CAST(round(score * 10000) AS BIGINT)").as("s4"),
        $"fail_any".as("label"))
    val bounds = scored.agg(min($"s4").as("lo"), max($"s4").as("hi"))
    scored.crossJoin(broadcast(bounds)) // 1-row bounds
      .select(
        expr(s"LEAST(CAST(${bins - 1} AS BIGINT)," +
          s" (s4 - lo) * $bins DIV (hi - lo + 1))").as("bin"),
        $"s4", $"label")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"),
        (expr("CAST(SUM(s4) DIV COUNT(1) AS BIGINT)")
          .cast("double") / 10000.0).as("mean_surprisal"),
        (expr("CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) * 1000000" +
          " DIV COUNT(1) AS BIGINT)")
          .cast("double") / 1000000.0).as("fail_rate"))
      .orderBy($"bin")
  }

  /** Shared oracle CTEs: per-document surprisal score (the
    * [[TextAnalytics.unigramLogprobSql]] construction) joined to the
    * Gopher any-rule flag. Yields `sc(score, np, nn)` for the AUC
    * and `sl(s4, pos)` for the calibration bands. */
  private def scoredSqlCtes: String = {
    val markers = allMarkers.map(m => s"'$m'").mkString(", ")
    s"""terms AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |freq AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
       |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM terms),
       |sdoc AS (SELECT doc_id, round(avg(-ln(cnt / tot)), 4) AS score
       |         FROM terms JOIN freq USING (term) CROSS JOIN tot
       |         GROUP BY doc_id),
       |gfeat AS (SELECT doc_id, len(ts) AS n_words,
       |    length(regexp_replace(lt, '[^\\p{L}\\p{N}_]+', '', 'g'))
       |      AS word_chars,
       |    len(list_filter(ts, x -> regexp_matches(x, '\\p{L}')))
       |      AS alpha_words,
       |    len(list_filter(ts, x -> regexp_matches(x, '^\\p{N}+$$')))
       |      AS digit_words,
       |    len(list_intersect(list_distinct(ts), [$markers])) AS stop_hits
       |  FROM (SELECT doc_id, $tokensSql AS ts, lower(text) AS lt
       |        FROM documents)),
       |gf AS (SELECT doc_id,
       |  CASE WHEN NOT (n_words >= $GopherMinWords AND n_words <= $GopherMaxWords)
       |        OR NOT (word_chars >= n_words * $GopherMinMwl AND word_chars <= n_words * $GopherMaxMwl)
       |        OR NOT (alpha_words * 5 >= n_words * 4)
       |        OR NOT (digit_words * 10 <= n_words * 3)
       |        OR NOT (stop_hits >= $GopherMinStop) THEN 1 ELSE 0 END AS pos
       |  FROM gfeat)""".stripMargin
  }

  def scoreAucSql(): String =
    s"""WITH ${scoredSqlCtes},
       |sc AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS np,
       |         CAST(SUM(1 - pos) AS BIGINT) AS nn
       |       FROM sdoc JOIN gf USING (doc_id) GROUP BY score),
       |cum AS (SELECT np, nn,
       |    CAST(COALESCE(SUM(nn) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cumn
       |  FROM sc),
       |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_scores,
       |    CAST(SUM(np) AS BIGINT) AS p, CAST(SUM(nn) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM(np * (2 * cumn + nn)), 0) AS BIGINT) AS u2
       |  FROM cum)
       |SELECT n_scores, p AS n_pos, n AS n_neg, $AucExpr AS auc
       |FROM agg""".stripMargin

  def scoreCalibrationSql(bins: Int = 10): String =
    s"""WITH ${scoredSqlCtes},
       |sl AS (SELECT CAST(round(score * 10000) AS BIGINT) AS s4, pos
       |       FROM sdoc JOIN gf USING (doc_id)),
       |bounds AS (SELECT MIN(s4) AS lo, MAX(s4) AS hi FROM sl),
       |b AS (SELECT LEAST(${bins - 1},
       |        (s4 - lo) * $bins // (hi - lo + 1)) AS bin, s4, pos
       |      FROM sl, bounds)
       |SELECT CAST(bin AS BIGINT) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(CAST(SUM(s4) AS BIGINT) // COUNT(*) AS DOUBLE) / 10000.0
       |    AS mean_surprisal,
       |  CAST(SUM(pos) * 1000000 // COUNT(*) AS DOUBLE) / 1000000.0
       |    AS fail_rate
       |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------
  // llm_soft_dedup — down-weighting by n-gram commonness
  // ---------------------------------------------------------------

  /** Soft deduplication (the SoftDeDup idea: arXiv 2403.00435 —
    * re-weight common text instead of dropping it): each document's
    * duplication factor is the mean corpus document-frequency of its
    * distinct 3-gram shingles, its sampling weight is the reciprocal,
    * and the report is the per-source effective corpus size
    * (`Σ weight`) and effective token mass (`Σ weight · tokens`)
    * against the raw counts.
    *
    * The duplication factor is `Σ df / n_grams` — a ratio of exact
    * longs, so the per-document weight is bit-identical across
    * engines; only the final per-source sums are float-order
    * sensitive, far below the comparator's 9-significant-digit
    * normalization. Shingle-less documents (< 3 tokens) get weight 1.
    *
    * Scale: the shingle stream is built once (cached — it feeds both
    * the df aggregate and the join back), df is a partial+final
    * aggregate on the shingle key, and the join back is shingle-key
    * co-partitioned with the aggregate — no all-pairs stage anywhere,
    * the same posture as the hard-dedup family in [[Dedup]].
    */
  def softDedupWeightsOf(documents: DataFrame, n: Int = 3): DataFrame = {
    import documents.sparkSession.implicits._
    val base = documents.select($"doc_id", $"source",
      tokens($"text").as("ts"))
    val g = cached("softDedupGrams",
      base.select($"doc_id",
        explode(array_distinct(shingles($"ts", n))).as("g")))
    val dfreq = g.groupBy($"g").agg(count(lit(1)).as("df"))
    val dup = g.join(dfreq, "g")
      .groupBy($"doc_id")
      .agg((sum($"df").cast("double") / count(lit(1))).as("dup"))
    base.select($"doc_id", $"source", size($"ts").cast("long").as("n_tokens"))
      .join(dup, Seq("doc_id"), "left")
      .withColumn("dup", coalesce($"dup", lit(1.0)))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("raw_tokens"),
        sum(lit(1.0) / $"dup").as("eff_docs"),
        sum(($"n_tokens" / $"dup")).as("eff_tokens"),
        avg($"dup").as("avg_dup"))
      .orderBy($"source")
  }

  def softDedupWeights(spark: SparkSession, sfDir: String): DataFrame =
    softDedupWeightsOf(docs(spark, sfDir))

  def softDedupWeightsSql(n: Int = 3): String =
    s"""WITH t AS (SELECT doc_id, source, $tokensSql AS ts FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(${shinglesNSql("ts", n)})) AS g FROM t),
       |dfreq AS (SELECT g, COUNT(*) AS df FROM g GROUP BY g),
       |dup AS (SELECT doc_id, CAST(SUM(df) AS DOUBLE) / COUNT(*) AS dup
       |        FROM g JOIN dfreq USING (g) GROUP BY doc_id),
       |d AS (SELECT t.doc_id, t.source, len(ts) AS n_tokens,
       |             COALESCE(dup, 1.0) AS dup
       |      FROM t LEFT JOIN dup ON t.doc_id = dup.doc_id)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
       |  SUM(1.0 / dup) AS eff_docs,
       |  SUM(n_tokens / dup) AS eff_tokens,
       |  AVG(dup) AS avg_dup
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // llm_curriculum — z-scored difficulty staging
  // ---------------------------------------------------------------

  /** Curriculum staging: a lexical difficulty score per document
    * (type-token ratio × mean word length — the vocabulary-density
    * proxy), z-scored against the corpus and cut at −0.5 / 0 / +0.5
    * into four stages, reported as per-stage composition.
    *
    * Deliberately NOT an equal-count `ntile`: an exact global ntile
    * is a corpus-wide total order — a single-partition window at any
    * scale. Fixed z-cuts need only a 1-row mean/stddev aggregate
    * broadcast back over the scan, so the whole operator is two
    * distributed passes whatever the corpus size. The z is rounded to
    * 4 dp before cutting (the [[Relational.outlierZscoreOf]] idiom)
    * so engine-order float noise cannot flip a stage assignment.
    */
  def curriculumStagesOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val ts = tokens($"text")
    val f = documents.select($"doc_id", $"lang",
      size(ts).cast("long").as("n_tokens"),
      size(array_distinct(ts)).cast("long").as("n_types"),
      length(regexp_replace(lower($"text"), "[^\\p{L}\\p{N}_]+", ""))
        .cast("long").as("word_chars"))
      .withColumn("score",
        ($"n_types".cast("double") / greatest($"n_tokens", lit(1L))) *
          ($"word_chars".cast("double") / greatest($"n_tokens", lit(1L))))
    val stats = f.agg(avg($"score").as("mu"),
      stddev_samp($"score").as("sd"))
    f.crossJoin(broadcast(stats))
      .withColumn("z", round(($"score" - $"mu") / $"sd", 4))
      .withColumn("stage",
        when($"z" < -0.5, lit("s1_easy"))
          .when($"z" < 0.0, lit("s2_medium"))
          .when($"z" < 0.5, lit("s3_hard"))
          .otherwise(lit("s4_hardest")))
      .groupBy($"stage")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"lang").as("n_langs"),
        sum($"n_tokens").as("total_tokens"),
        avg($"score").as("avg_score"))
      .orderBy($"stage")
  }

  def curriculumStages(spark: SparkSession, sfDir: String): DataFrame =
    curriculumStagesOf(docs(spark, sfDir))

  val curriculumStagesSql: String =
    s"""WITH f AS (SELECT doc_id, lang,
       |    len($tokensSql) AS n_tokens,
       |    len(list_distinct($tokensSql)) AS n_types,
       |    length(regexp_replace(lower(text), '[^\\p{L}\\p{N}_]+', '', 'g')) AS word_chars
       |  FROM documents),
       |sc AS (SELECT doc_id, lang, n_tokens,
       |    (CAST(n_types AS DOUBLE) / greatest(n_tokens, 1)) *
       |    (CAST(word_chars AS DOUBLE) / greatest(n_tokens, 1)) AS score
       |  FROM f),
       |st AS (SELECT AVG(score) AS mu, STDDEV_SAMP(score) AS sd FROM sc),
       |z AS (SELECT doc_id, lang, n_tokens, score,
       |    ROUND((score - mu) / sd, 4) AS z FROM sc CROSS JOIN st)
       |SELECT CASE WHEN z < -0.5 THEN 's1_easy'
       |            WHEN z < 0.0 THEN 's2_medium'
       |            WHEN z < 0.5 THEN 's3_hard'
       |            ELSE 's4_hardest' END AS stage,
       |  COUNT(*) AS n_docs,
       |  COUNT(DISTINCT lang) AS n_langs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  AVG(score) AS avg_score
       |FROM z GROUP BY 1 ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------
  // llm_ngram_novelty — per-source exclusive-content accounting
  // ---------------------------------------------------------------

  /** Per-source n-gram novelty: of each source's distinct 3-gram
    * vocabulary, how much appears in NO other source. High novelty =
    * the source contributes unique content to the mix; low novelty =
    * its text is restatements of what other sources already provide —
    * the source-level complement of per-document dedup, used to set
    * mixture weights.
    *
    * Scale: distinct (source, gram) pairs via one partial+final
    * aggregate, gram spread via a second, then a co-partitioned join
    * back on the gram key — the inverted-index shape of
    * [[Dedup.ngramJaccard]], never all-pairs.
    */
  def ngramNoveltyOf(documents: DataFrame, n: Int = 3): DataFrame = {
    import documents.sparkSession.implicits._
    val sg = cached("noveltySourceGrams",
      documents.select($"source",
        explode(array_distinct(shingles(tokens($"text"), n))).as("g"))
        .distinct())
    val spread = sg.groupBy($"g").agg(count(lit(1)).as("n_sources"))
    sg.join(spread, "g")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"n_sources" === 1L, 1L).otherwise(0L)).as("n_exclusive"))
      .withColumn("novelty",
        $"n_exclusive".cast("double") / greatest($"n_grams", lit(1L)))
      .orderBy($"source")
  }

  def ngramNovelty(spark: SparkSession, sfDir: String): DataFrame =
    ngramNoveltyOf(docs(spark, sfDir))

  def ngramNoveltySql(n: Int = 3): String =
    s"""WITH t AS (SELECT source, $tokensSql AS ts FROM documents),
       |sg AS (SELECT DISTINCT source, unnest(list_distinct(${shinglesNSql("ts", n)})) AS g FROM t),
       |spread AS (SELECT g, COUNT(*) AS n_sources FROM sg GROUP BY g)
       |SELECT source, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exclusive,
       |  CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / greatest(COUNT(*), 1) AS novelty
       |FROM sg JOIN spread USING (g)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // llm_tokenizer_fertility — tokenizer economics per language
  // ---------------------------------------------------------------

  /** Tokenizer fertility per language: subword pieces emitted per
    * word (the ≤4-char greedy chunking of
    * [[TextAnalytics.tokenCount]], but in Unicode classes so CJK
    * counts) and characters covered per subword. Fertility is THE
    * number that decides how a fixed token budget divides across
    * languages — a lang at fertility 2 pays twice the sequence length
    * of one at 1 for the same word count. One scan, one aggregate on
    * the 5-ary language key; ratios divide exact corpus-level longs,
    * so they are bit-identical across engines.
    */
  def tokenizerFertilityOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents
      .select($"lang",
        regexp_count($"text", lit("[\\p{L}\\p{N}_]+")).cast("long").as("words"),
        regexp_count($"text", lit("[\\p{L}\\p{N}_]{1,4}")).cast("long").as("subwords"),
        length(regexp_replace(lower($"text"), "[^\\p{L}\\p{N}_]+", ""))
          .cast("long").as("word_chars"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"words").as("words"),
        sum($"subwords").as("subwords"),
        (sum($"subwords").cast("double") / greatest(sum($"words"), lit(1L)))
          .as("fertility"),
        (sum($"word_chars").cast("double") / greatest(sum($"subwords"), lit(1L)))
          .as("chars_per_subword"))
      .orderBy($"lang")
  }

  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame =
    tokenizerFertilityOf(docs(spark, sfDir))

  val tokenizerFertilitySql: String =
    """WITH f AS (SELECT lang,
      |    len(regexp_extract_all(text, '[\p{L}\p{N}_]+')) AS words,
      |    len(regexp_extract_all(text, '[\p{L}\p{N}_]{1,4}')) AS subwords,
      |    length(regexp_replace(lower(text), '[^\p{L}\p{N}_]+', '', 'g')) AS word_chars
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(words) AS BIGINT) AS words,
      |  CAST(SUM(subwords) AS BIGINT) AS subwords,
      |  CAST(SUM(subwords) AS DOUBLE) / greatest(SUM(words), 1) AS fertility,
      |  CAST(SUM(word_chars) AS DOUBLE) / greatest(SUM(subwords), 1)
      |    AS chars_per_subword
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_span_corruption — T5-style denoising mask accounting
  // ---------------------------------------------------------------

  /** Span-corruption sample prep (the T5 denoising objective): each
    * token position is masked by a deterministic salted hash of
    * `(doc_id, position)` at rate 1/`rate`, runs of masked positions
    * collapse into sentinel spans, and the report is the per-document
    * mask accounting a seq2seq packer consumes (`n_spans` = number of
    * sentinels inserted, `n_masked` = target-side length). Hash-keyed
    * masking is what makes the corruption REPRODUCIBLE across reruns
    * and re-shards — the rand() alternative changes every sample on
    * every execution plan.
    *
    * Scale: posexplode → per-row codegen'd hash → one window lag
    * PARTITIONED BY doc (never a global order) → per-doc aggregate.
    */
  def spanCorruptionOf(documents: DataFrame, rate: Int = 6,
                       salt: Int = 17): DataFrame = {
    import documents.sparkSession.implicits._
    require(rate >= 2, s"mask rate denominator must be >= 2, got $rate")
    val toks = documents
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    toks
      .withColumn("masked",
        graft.functions.Hashing.md5i32(
          concat($"doc_id".cast("string"), lit(":"), $"pos".cast("string")),
          salt) % rate === 0)
      .withColumn("span_start",
        $"masked" && !coalesce(lag($"masked", 1).over(w), lit(false)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"masked", 1L).otherwise(0L)).as("n_masked"),
        sum(when($"span_start", 1L).otherwise(0L)).as("n_spans"))
      .withColumn("corruption_rate",
        $"n_masked".cast("double") / $"n_tokens")
      .orderBy($"doc_id")
  }

  def spanCorruption(spark: SparkSession, sfDir: String): DataFrame =
    spanCorruptionOf(docs(spark, sfDir))

  def spanCorruptionSql(rate: Int = 6, salt: Int = 17): String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS ts FROM documents),
       |p AS (SELECT doc_id, generate_subscripts(ts, 1) - 1 AS pos FROM t),
       |m AS (SELECT doc_id, pos,
       |        ${md5i32Sql("doc_id || ':' || pos", salt)} % $rate = 0 AS masked
       |      FROM p),
       |s AS (SELECT doc_id, masked,
       |        masked AND NOT coalesce(
       |          lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), false)
       |          AS span_start
       |      FROM m)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       |  CAST(SUM(CASE WHEN span_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
       |  CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS corruption_rate
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_char_entropy — character-entropy quality signal
  // ---------------------------------------------------------------

  /** Per-document Shannon entropy over the character distribution —
    * the classic gibberish/boilerplate detector (near-zero entropy =
    * one repeated character; binary-garbage and keyboard-mash text
    * sit far from the natural-language band). Computed as
    * `ln(N) − Σ c·ln(c) / N` from exact per-character counts so the
    * only float work is the final two-term expression, rounded to
    * 4 dp (the cross-engine `ln` ulp guard).
    *
    * Scale: explode to (doc, char) → partial+final count aggregate
    * (map-side combine collapses each partition to its local char
    * histogram first) → per-doc fold. Alphabet-bounded intermediate:
    * rows after the first aggregate ≤ docs × |alphabet|.
    */
  def charEntropyOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    // the per-doc histogram is doc-local by definition, so the whole
    // explode → (doc, char) hash aggregate → per-doc fold pipeline
    // (kept as [[charEntropyExplodeOf]], the equivalence-spec
    // reference) collapses to ONE codegen'd pass per document
    // ([[graft.functions.CharEntropyStats]]): no exchange carries
    // character rows at any scale — the operator is scan → projection
    // → docs-sized sort. round() stays Spark-side (HALF_UP BigDecimal,
    // the cross-engine ln ulp guard at 4 dp). Empty docs are filtered
    // (parity with explode-of-empty dropping the doc); null text
    // nulls the struct and the filter drops it.
    documents
      // length(text) > 0 ⟺ st.n_chars > 0 (both count code points;
      // null text nulls both) — filtering on the INPUT keeps the
      // pushed-down Filter from evaluating the fold a second time
      .filter(length($"text") > 0)
      .select($"doc_id",
        graft.functions.CharEntropyStats.char_entropy_stats($"text").as("st"))
      .select($"doc_id", $"st.n_chars".as("n_chars"),
        $"st.uniq_chars".as("uniq_chars"),
        round($"st.entropy_raw", 4).as("entropy"))
      .orderBy($"doc_id")
  }

  /** The aggregate formulation [[charEntropyOf]] replaced — chars in
    * ONE linear split pass (NOT a per-position substring window,
    * which is O(i) per UTF8String call ⇒ quadratic per doc — measured
    * 4→23 s at sf1). split('') keeps ALL characters (newlines
    * included, unlike the '.' regex) plus one trailing "" that the
    * length-sized slice drops. Kept as the equivalence-spec reference
    * implementation (the [[graft.functions.TextAnalysis.shinglesHof]]
    * convention). */
  private[graft] def charEntropyExplodeOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents
      .select($"doc_id",
        explode(expr("slice(split(text, ''), 1, length(text))")).as("ch"))
      .groupBy($"doc_id", $"ch")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_chars"),
        count(lit(1)).as("uniq_chars"),
        round(log(sum($"c")) -
          sum($"c".cast("double") * log($"c")) / sum($"c"), 4)
          .as("entropy"))
      .orderBy($"doc_id")
  }

  def charEntropy(spark: SparkSession, sfDir: String): DataFrame =
    charEntropyOf(docs(spark, sfDir))

  val charEntropySql: String =
    """WITH ch AS (SELECT doc_id,
      |              unnest([text[i] for i in range(1, length(text) + 1)]) AS ch
      |            FROM documents),
      |h AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars, COUNT(*) AS uniq_chars,
      |  round(ln(SUM(c)) - SUM(c::DOUBLE * ln(c)) / SUM(c), 4) AS entropy
      |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // llm_dataset_card — one-query corpus datasheet
  // ---------------------------------------------------------------

  /** The dataset-card numbers ("Datasheets for Datasets" /
    * HuggingFace dataset-card style) in one corpus pass: volume,
    * token mass, language/source spread, length distribution, and
    * the quality-gate pass rate — the summary a corpus release ships
    * next to the data. One scan, one 1-row aggregate, exploded to
    * (metric, value) rows; every value is a ratio of exact longs or
    * an exact count, so the card is bit-stable across engines.
    */
  def datasetCardOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val ts = tokens($"text")
    val f = documents.select($"lang", $"source",
      size(ts).cast("long").as("n_tokens"),
      $"n_chars".cast("long").as("n_chars"),
      (size(ts) >= 30 &&
        size(array_intersect(array_distinct(ts),
          array(allMarkers.map(lit): _*))) >= 2).as("passes"))
    val agg = f.agg(
      count(lit(1)).as("n_docs"),
      sum($"n_tokens").as("n_tokens"),
      sum($"n_chars").as("n_chars"),
      countDistinct($"lang").as("n_langs"),
      countDistinct($"source").as("n_sources"),
      min($"n_tokens").as("min_tokens"),
      max($"n_tokens").as("max_tokens"),
      sum(when($"passes", 1L).otherwise(0L)).as("n_pass"))
    agg.select(explode(array(
      struct(lit("docs").as("metric"), $"n_docs".cast("double").as("value")),
      struct(lit("langs").as("metric"), $"n_langs".cast("double").as("value")),
      struct(lit("mean_tokens_per_doc").as("metric"),
        ($"n_tokens".cast("double") / $"n_docs").as("value")),
      struct(lit("quality_pass_rate").as("metric"),
        ($"n_pass".cast("double") / $"n_docs").as("value")),
      struct(lit("sources").as("metric"), $"n_sources".cast("double").as("value")),
      struct(lit("tokens").as("metric"), $"n_tokens".cast("double").as("value")),
      struct(lit("tokens_max").as("metric"), $"max_tokens".cast("double").as("value")),
      struct(lit("tokens_min").as("metric"), $"min_tokens".cast("double").as("value")),
      struct(lit("total_chars").as("metric"), $"n_chars".cast("double").as("value"))))
      .as("m"))
      .select($"m.metric".as("metric"), $"m.value".as("value"))
      .orderBy($"metric")
  }

  def datasetCard(spark: SparkSession, sfDir: String): DataFrame =
    datasetCardOf(docs(spark, sfDir))

  val datasetCardSql: String = {
    val markers = allMarkers.map(m => s"'$m'").mkString(", ")
    s"""WITH f AS (SELECT lang, source, len($tokensSql) AS n_tokens,
       |    n_chars,
       |    (len($tokensSql) >= 30 AND
       |     len(list_intersect(list_distinct($tokensSql), [$markers])) >= 2)
       |      AS passes
       |  FROM documents),
       |g AS (SELECT COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens,
       |        SUM(n_chars) AS n_chars,
       |        COUNT(DISTINCT lang) AS n_langs,
       |        COUNT(DISTINCT source) AS n_sources,
       |        MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
       |        SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS n_pass
       |      FROM f)
       |SELECT metric, value FROM (
       |  SELECT 'docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM g
       |  UNION ALL SELECT 'langs', CAST(n_langs AS DOUBLE) FROM g
       |  UNION ALL SELECT 'mean_tokens_per_doc',
       |    CAST(n_tokens AS DOUBLE) / n_docs FROM g
       |  UNION ALL SELECT 'quality_pass_rate',
       |    CAST(n_pass AS DOUBLE) / n_docs FROM g
       |  UNION ALL SELECT 'sources', CAST(n_sources AS DOUBLE) FROM g
       |  UNION ALL SELECT 'tokens', CAST(n_tokens AS DOUBLE) FROM g
       |  UNION ALL SELECT 'tokens_max', CAST(max_tokens AS DOUBLE) FROM g
       |  UNION ALL SELECT 'tokens_min', CAST(min_tokens AS DOUBLE) FROM g
       |  UNION ALL SELECT 'total_chars', CAST(n_chars AS DOUBLE) FROM g)
       |ORDER BY metric""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_langid_chargram — char-trigram-profile language ID
  // ---------------------------------------------------------------

  /** Profile size per language — shared with the oracle. */
  val LangIdProfile = 30

  /** Character-trigram language identification (the textcat /
    * Cavnar–Trenkle family, and what fastText's langid distills): a
    * per-language profile of the [[LangIdProfile]] most frequent char
    * trigrams is learned from the corpus itself, each document scores
    * `hits(lang) / trigrams(doc)` against every profile, and argmax
    * (ties to the alphabetically first language) predicts. Output is
    * the (lang, predicted) confusion matrix — the independent cross-
    * check of the stopword-marker [[TextAnalytics]] lang-ID: two
    * methods with disjoint failure modes (markers need whole words;
    * trigram profiles see morphology and script). NOTE on the
    * harness corpus: its language labels share one vocabulary pool
    * (the zh documents contain no CJK), so the corpus matrix
    * measures profile overlap, not achievable accuracy — the spec
    * pins a perfect diagonal on a distinct-script fixture instead.
    *
    * Scale: trigram stream → (lang, gram) aggregate → per-lang top-30
    * rank (windows partition by LANGUAGE, 5-ary — never global) →
    * broadcast-size profile join back → per-(doc, lang) counts →
    * per-doc argmax window (doc-partitioned). Everything after the
    * first aggregate is profile- or doc-bounded.
    */
  def langIdChargramOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    // trigrams via the codegen'd native
    // [[graft.functions.CharNgrams]]: one lead-byte walk over the
    // lowered UTF8String, no regex split into per-char strings, no
    // slice copy, no per-gram concatWs (the split('')+slice+shingles
    // composition it replaced — equivalence spec-pinned — paid all
    // three per document; before THAT, a per-position substring
    // window was O(i) per UTF8String call ⇒ quadratic per doc, and
    // regexp_extract_all(text, '.') paid the regex engine once per
    // char). Gram count per doc is exactly max(len−2, 0), so the
    // per-doc totals come straight off the document frame with NO
    // exchange over the corpus-sized exploded gram stream.
    // ASCII-only assumption (like the \w regex note above), now only
    // in the oracle mirror: the native walk grams the lowered
    // string's own length (the old slice was bounded by length(text),
    // which full-case mappings like U+0130 → i + combining dot can
    // disagree with), but DuckDB's simple-mapping lower() can still
    // disagree with the JVM's full mapping on such points — both fine
    // on this corpus (ASCII TPC-H-derived text).
    val withGrams = cached("langIdGrams", documents
      .select($"doc_id", $"lang",
        graft.functions.CharNgrams.char_ngrams(lower($"text"), 3).as("gs")))
    // Measured negative result (round 16): collapsing the gram
    // stream ONCE to per-(doc, lang, gram) counts for both consumers
    // (profile aggregate + hits probe, sharing the exchange via
    // ReusedExchange) is 2× SLOWER at sf1 (6.6 → 12.9 s): the
    // doc-keyed gram grouping is nearly collapse-free (distinct
    // (doc, gram) ≈ gram occurrences on this corpus), so it pays a
    // corpus-sized hash aggregate AND exchange where the two explode
    // scans pay neither — both downstream aggregates collapse
    // map-side to profile-/doc-bounded rows on their own. The double
    // explode of the cached gram arrays stays.
    val grams = withGrams.select($"doc_id", $"lang", explode($"gs").as("g"))
    val prof = grams.groupBy($"lang".as("plang"), $"g")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"plang").orderBy($"cnt".desc, $"g")))
      .filter($"rk" <= LangIdProfile)
      .select($"plang", $"g")
    // the profile is bounded by contract (|langs| × LangIdProfile
    // rows): collect it (the BPE-merge-table bounded-collect
    // discipline) and fold the probe side into ONE per-doc scan
    // ([[graft.functions.CountInGramSets]]) — the second corpus-sized
    // explode, its broadcast hash probe, and the (doc, lang)
    // re-aggregate (kept as [[langIdChargramJoinOf]], the
    // equivalence-spec reference) all collapse into the expression;
    // no corpus-sized operator remains downstream of the profile
    // aggregate. Per-doc totals are len−2 by construction of the
    // gram window — size(gs), an O(docs) projection.
    val profRows = prof.collect()
    val plangs = profRows.map(_.getString(0)).distinct.sorted.toSeq
    val best =
      if (plangs.isEmpty) withGrams.select($"doc_id", lit("x").as("plang")).limit(0)
      else {
        val sets = plangs.map(p => profRows.toSeq
          .collect { case r if r.getString(0) == p => r.getString(1) })
        withGrams
          .select($"doc_id", size($"gs").as("total"),
            posexplode(graft.functions.CountInGramSets
              .count_in_gram_sets($"gs", sets)).as(Seq("idx", "hits")))
          .filter($"hits" > 0)
          .select($"doc_id",
            element_at(array(plangs.map(lit): _*), $"idx" + 1).as("plang"),
            ($"hits".cast("double") / $"total").as("score"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"doc_id").orderBy($"score".desc, $"plang")))
          .filter($"rk" === 1)
      }
    documents.select($"doc_id", $"lang")
      .join(best.select($"doc_id", $"plang"), Seq("doc_id"), "left")
      .na.fill(Map("plang" -> "unknown"))
      .groupBy($"lang", $"plang".as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"predicted")
  }

  /** The join formulation [[langIdChargramOf]]'s probe side replaced
    * — exploded gram stream ⋈ broadcast profile ⋈ per-doc totals.
    * Kept as the equivalence-spec reference implementation (the
    * [[charEntropyExplodeOf]] convention); gram build inlined so the
    * reference never touches the session frame cache. */
  private[graft] def langIdChargramJoinOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val withGrams = documents
      .select($"doc_id", $"lang",
        graft.functions.CharNgrams.char_ngrams(lower($"text"), 3).as("gs"))
    val grams = withGrams.select($"doc_id", $"lang", explode($"gs").as("g"))
    val prof = grams.groupBy($"lang".as("plang"), $"g")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"plang").orderBy($"cnt".desc, $"g")))
      .filter($"rk" <= LangIdProfile)
      .select($"plang", $"g")
    val docTotals = withGrams.select($"doc_id", size($"gs").as("total"))
    val hits = grams.join(broadcast(prof), "g")
      .groupBy($"doc_id", $"lang", $"plang")
      .agg(count(lit(1)).as("hits"))
    val best = hits.join(docTotals, "doc_id")
      .withColumn("score", $"hits".cast("double") / $"total")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"score".desc, $"plang")))
      .filter($"rk" === 1)
    documents.select($"doc_id", $"lang")
      .join(best.select($"doc_id", $"plang"), Seq("doc_id"), "left")
      .na.fill(Map("plang" -> "unknown"))
      .groupBy($"lang", $"plang".as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"predicted")
  }

  def langIdChargram(spark: SparkSession, sfDir: String): DataFrame =
    langIdChargramOf(docs(spark, sfDir))

  def langIdChargramSql(p: Int = LangIdProfile): String = {
    val chars = "[lower(text)[i] for i in range(1, length(text) + 1)]"
    s"""WITH t AS (SELECT doc_id, lang, $chars AS cs FROM documents),
       |g AS MATERIALIZED (SELECT doc_id, lang,
       |       unnest(${shinglesNSql("cs", 3)}) AS g FROM t),
       |pf AS (SELECT plang, g FROM (
       |         SELECT lang AS plang, g,
       |           row_number() OVER (PARTITION BY lang
       |             ORDER BY COUNT(*) DESC, g) AS rk
       |         FROM g GROUP BY lang, g)
       |       WHERE rk <= $p),
       |tot AS (SELECT doc_id, COUNT(*) AS total FROM g GROUP BY doc_id),
       |hits AS (SELECT doc_id, lang, plang, COUNT(*) AS hits
       |         FROM g JOIN pf USING (g) GROUP BY doc_id, lang, plang),
       |best AS (SELECT doc_id, plang FROM (
       |           SELECT h.doc_id, plang,
       |             row_number() OVER (PARTITION BY h.doc_id
       |               ORDER BY CAST(hits AS DOUBLE) / total DESC, plang) AS rk
       |           FROM hits h JOIN tot ON h.doc_id = tot.doc_id)
       |         WHERE rk = 1)
       |SELECT d.lang, COALESCE(best.plang, 'unknown') AS predicted,
       |  COUNT(*) AS n_docs
       |FROM documents d LEFT JOIN best ON d.doc_id = best.doc_id
       |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_quality_classifier — trained classifier-based filtering
  // ---------------------------------------------------------------

  /** Hashed-feature dimensionality of the quality classifier; dims
    * [[ClfDims]]..[[ClfDims]]+2 are the engineered length / stopword
    * / bias features. */
  val ClfDims = 16
  /** GD iterations / learning rate / hash salt — shared by the Spark
    * trainer and the SQL oracle replay (the [[TextAnalytics]]
    * named-constant convention). eta=4, T=12 reaches ~0.84 train
    * accuracy vs the ~0.59 majority baseline at every tested SF
    * (higher rates oscillate — full-batch logistic GD diverges past
    * eta ≈ 4/L). */
  val ClfIters = 12
  val ClfEta = 4.0
  val ClfSalt = 7
  /** Curation-pipeline decision margin: keep docs the model scores at
    * z >= 0.85 (p >= 0.7) — the high-confidence cut real classifier
    * filters apply, not the 0.5 argmax (which, trained on labels the
    * Gopher gate subsumes, would pass every gate survivor). */
  val ClfDecisionZ = 0.85

  /** Classifier-based quality filtering, the GPT-3/LLaMA recipe: a
    * logistic-regression model over hashed bag-of-words features
    * (`md5 % 16`) plus engineered length / stopword-count features
    * and a bias, trained by FULL-BATCH gradient descent against a
    * rule-derived label (≥ 30 words ∧ ≥ 2 function-word markers),
    * [[ClfIters]] synchronous iterations at rate [[ClfEta]] — enough
    * to separate from the majority-class baseline on its own labels
    * (spec-enforced). Output is the trained weight vector, one row
    * per dimension — the artifact a serving-side filter ships.
    *
    * Determinism across engines: features are exact count ratios,
    * weights are ROUNDED TO 6 dp after every update (the PageRank
    * per-iteration idiom), so the sigmoid/exp float noise cannot
    * accumulate across iterations; the oracle replays the training
    * loop as chained CTEs.
    *
    * Scale posture (100 TB): the sparse `(doc, dim, x)` features
    * pivot ONCE into a wide per-document row (one doc-keyed
    * aggregate, cached), so each GD iteration is a single
    * partial+final 1-ROW aggregate over the cached frame — the dot
    * product and the per-dim gradient sums are all per-row codegen'd
    * arithmetic, no joins, no per-iteration doc shuffle. The driver
    * holds ONLY the weight vector, the bounded-coordinator shape of
    * [[Clustering]] k-means and the BPE trainer.
    */
  def qualityClassifierOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    trainedWeights(documents).zipWithIndex
      .map { case (wt, d) => (d.toLong, wt) }
      .toSeq.toDF("dim", "weight").orderBy($"dim")
  }

  /** One GD training run per (session, corpus): the 12-iteration loop
    * is 12 sequential driver jobs, so when both classifier-backed
    * queries ([[qualityClassifierOf]] and [[curationPipelineOf]]) run
    * in one session the second must reuse the first's weights, not
    * pay the loop again. Keyed by the wide frame's semantic hash —
    * the same key discipline as [[cached]]; the value is 19 doubles,
    * so the memo is bounded-coordinator by construction. */
  private val weightCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Double]]

  private[graft] def trainedWeights(documents: DataFrame): Array[Double] = {
    import documents.sparkSession.implicits._
    val dims = ClfDims + 3
    val wide = cached("clfWide", clfWideOf(documents))
    val key = (System.identityHashCode(documents.sparkSession),
      wide.queryExecution.analyzed.semanticHash())
    weightCache.getOrElseUpdate(key, {
      val nDocs = wide.count().toDouble
      // an upstream filter can leave nothing trainable (every doc
      // empty-text): the zero model is the defined answer, and the
      // gradient aggregate below would otherwise return nulls. The
      // branch is the thunk's VALUE (no non-local return — that would
      // escape getOrElseUpdate via NonLocalReturnControl and silently
      // skip memoizing the zero model).
      if (nDocs == 0.0) Array.fill(dims)(0.0)
      else {
        var w = Array.fill(dims)(0.0)
        for (_ <- 1 to ClfIters) {
          val z = (0 until dims).map(d => col(s"x$d") * lit(w(d))).reduce(_ + _)
          val err = lit(1.0) / (lit(1.0) + exp(-z)) - $"y"
          val grads = wide.withColumn("err", err)
            .agg(sum($"err" * col("x0")).as("g0"),
              (1 until dims).map(d => sum($"err" * col(s"x$d")).as(s"g$d")): _*)
            .head()
          w = w.indices.map(d =>
            BigDecimal(w(d) - ClfEta * grads.getDouble(d) / nDocs)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
        }
        w
      }
    })
  }

  /** Wide per-document training frame `(doc_id, y, x0..x18)`: the
    * sparse hashed features pivoted to columns in ONE doc-keyed
    * aggregate so the GD loop never shuffles on the doc key again. */
  private def clfWideOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val dims = ClfDims + 3
    val base = documents
      .select($"doc_id", tokens($"text").as("ts"))
      .withColumn("n", size($"ts").cast("long"))
      .filter($"n" > 0)
      .withColumn("sh",
        size(array_intersect(array_distinct($"ts"),
          array(allMarkers.map(lit): _*))).cast("long"))
    val labels = base.select($"doc_id",
      when($"n" >= 30L && $"sh" >= 2L, 1.0).otherwise(0.0).as("y"))
    clfFeaturesOf(base)
      .groupBy($"doc_id")
      .agg(sum(when($"dim" === 0L, $"x").otherwise(0.0)).as("x0"),
        (1 until dims).map(d =>
          sum(when($"dim" === d.toLong, $"x").otherwise(0.0)).as(s"x$d")): _*)
      .join(labels, "doc_id")
  }

  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame =
    qualityClassifierOf(docs(spark, sfDir))

  /** Feature frame `(doc_id, dim, x)` over a `(doc_id, ts, n, sh)`
    * base: [[ClfDims]] normalized hashed-count dims, then capped
    * length (dim 16), capped stopword hits (dim 17), bias (dim 18).
    * Shared by the trainer and the serving-side scorer. */
  private def clfFeaturesOf(base: DataFrame): DataFrame = {
    import base.sparkSession.implicits._
    val hashed = base
      .select($"doc_id", $"n", explode($"ts").as("term"))
      .select($"doc_id", $"n",
        (graft.functions.Hashing.md5i32($"term", ClfSalt) % ClfDims).as("dim"))
      .groupBy($"doc_id", $"n", $"dim")
      .agg(count(lit(1)).as("cnt"))
      .select($"doc_id", $"dim", ($"cnt".cast("double") / $"n").as("x"))
    val engineered = base.select($"doc_id",
      explode(array(
        struct(lit(ClfDims.toLong).as("dim"),
          (least($"n", lit(100L)).cast("double") / 100.0).as("x")),
        struct(lit(ClfDims + 1L).as("dim"),
          (least($"sh", lit(10L)).cast("double") / 10.0).as("x")),
        struct(lit(ClfDims + 2L).as("dim"), lit(1.0).as("x")))).as("f"))
      .select($"doc_id", $"f.dim", $"f.x")
    hashed.union(engineered)
  }

  /** Score a corpus with a trained weight vector — the serving-side
    * filter (spec fodder: trained weights must beat the majority
    * class on their own training labels). */
  private[graft] def classifierScores(documents: DataFrame,
                                      w: Array[Double]): DataFrame = {
    import documents.sparkSession.implicits._
    val base = documents
      .select($"doc_id", tokens($"text").as("ts"))
      .withColumn("n", size($"ts").cast("long"))
      .filter($"n" > 0)
      .withColumn("sh",
        size(array_intersect(array_distinct($"ts"),
          array(allMarkers.map(lit): _*))).cast("long"))
    val wArr = array(w.map(lit): _*)
    clfFeaturesOf(base)
      .withColumn("c", $"x" * element_at(wArr, $"dim".cast("int") + 1))
      .groupBy($"doc_id").agg(sum($"c").as("z"))
      .select($"doc_id", $"z",
        (lit(1.0) / (lit(1.0) + exp(-$"z"))).as("p"))
  }

  // ---------------------------------------------------------------
  // llm_curation_pipeline — model-in-the-loop curation chain
  // ---------------------------------------------------------------

  /** Model-in-the-loop curation: raw corpus → Gopher rule gate →
    * TRAINED-classifier filter (the [[qualityClassifierOf]] weights,
    * decision `z ≥ 0`), reported as per-(stage, lang) survivorship —
    * the audit shape of [[Pipeline.pipelineOf]] with a learned model
    * as a stage. The classifier trains on the FULL corpus (the
    * standard recipe: the model is fit once, then gates) and filters
    * at the HIGH-CONFIDENCE margin `round(z, 6) ≥ [[ClfDecisionZ]]`
    * (p ≥ 0.7) — rounding first so cross-engine sum-order noise in
    * the dot product cannot flip a borderline doc.
    *
    * Scale: the gates are per-row predicates over one cached feature
    * pass; training is the bounded-coordinator loop documented at
    * [[qualityClassifierOf]]; stage accounting is a 3×langs
    * aggregate.
    */
  def curationPipelineOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val ts = tokens($"text")
    val base = documents.select($"doc_id", $"lang",
      size(ts).cast("long").as("n_words"),
      length(regexp_replace(lower($"text"), "[^\\p{L}\\p{N}_]+", ""))
        .cast("long").as("word_chars"),
      size(filter(ts, t => t.rlike("\\p{L}"))).cast("long").as("alpha_words"),
      size(filter(ts, t => t.rlike("^\\p{N}+$"))).cast("long").as("digit_words"),
      size(array_intersect(array_distinct(ts),
        array(allMarkers.map(lit): _*))).cast("long").as("stop_hits"))
      .filter($"n_words" > 0)
    val gopherPass =
      $"n_words" >= GopherMinWords.toLong &&
        $"n_words" <= GopherMaxWords.toLong &&
        $"word_chars" >= $"n_words" * GopherMinMwl.toLong &&
        $"word_chars" <= $"n_words" * GopherMaxMwl.toLong &&
        $"alpha_words" * 5L >= $"n_words" * 4L &&
        $"digit_words" * 10L <= $"n_words" * 3L &&
        $"stop_hits" >= GopherMinStop.toLong
    val weights = trainedWeights(documents)
    // the three census stages below reference this frame once each,
    // but they live in ONE union plan: Catalyst's ReusedExchange
    // dedups the identical join subplan across the branches, so no
    // explicit materialization is needed (a localCheckpoint here
    // measured SLOWER at sf1 — it only added a round-trip)
    val scored = base
      .withColumn("g_pass", gopherPass)
      .join(classifierScores(documents, weights)
        .select($"doc_id",
          (round($"z", 6) >= ClfDecisionZ).as("m_pass")),
        "doc_id")
    def stage(name: String, keep: org.apache.spark.sql.Column) =
      scored.filter(keep).groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_words").as("n_tokens"))
        .select(lit(name).as("stage"), $"lang", $"n_docs", $"n_tokens")
    stage("s0_raw", lit(true))
      .unionByName(stage("s1_gopher", $"g_pass"))
      .unionByName(stage("s2_classifier", $"g_pass" && $"m_pass"))
      .orderBy($"stage", $"lang")
  }

  def curationPipeline(spark: SparkSession, sfDir: String): DataFrame =
    curationPipelineOf(docs(spark, sfDir))

  def curationPipelineSql: String =
    s"""WITH $clfTrainCtes,
       |zz AS (SELECT f.doc_id, SUM(f.x * w.w) AS z
       |       FROM feats f JOIN w$ClfIters w ON f.dim = w.dim
       |       GROUP BY f.doc_id),
       |flags AS (SELECT b.doc_id, b.lang, b.n AS n_words,
       |    (b.n >= $GopherMinWords AND b.n <= $GopherMaxWords AND
       |     b.word_chars >= b.n * $GopherMinMwl AND
       |     b.word_chars <= b.n * $GopherMaxMwl AND
       |     b.alpha_words * 5 >= b.n * 4 AND
       |     b.digit_words * 10 <= b.n * 3 AND
       |     b.sh >= $GopherMinStop) AS g_pass,
       |    (round(zz.z, 6) >= $ClfDecisionZ) AS m_pass
       |  FROM b JOIN zz ON b.doc_id = zz.doc_id)
       |SELECT stage, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS n_tokens
       |FROM (
       |  SELECT 's0_raw' AS stage, lang, n_words FROM flags
       |  UNION ALL SELECT 's1_gopher', lang, n_words FROM flags WHERE g_pass
       |  UNION ALL SELECT 's2_classifier', lang, n_words FROM flags
       |    WHERE g_pass AND m_pass)
       |GROUP BY stage, lang ORDER BY stage, lang""".stripMargin

  // ---------------------------------------------------------------
  // llm_threshold_sweep — classifier gate sensitivity report
  // ---------------------------------------------------------------

  /** The decision-margin grid the sweep evaluates, in z (log-odds)
    * space; includes the production gate [[ClfDecisionZ]]. */
  val SweepThresholds: Seq[Double] = Seq(-1.0, -0.5, 0.0, 0.5, 0.85, 1.5)

  /** Gate-sensitivity sweep for the trained quality classifier: the
    * corpus survivorship at each candidate decision threshold — the
    * one-query answer to "how much data does each gate setting cost",
    * which a curation team reads BEFORE picking [[ClfDecisionZ]]
    * (FineWeb-Edu-style threshold ablation, applied to retention).
    *
    * One scored pass (weights come from the per-session
    * [[trainedWeights]] memo — the sweep trains nothing), one
    * explode(grid) × conditional-count aggregate; thresholds compare
    * on `round(z, 6)` so engine float noise cannot flip a boundary
    * doc. Scale: grid×corpus rows, a constant 6× the scored frame,
    * partial+final aggregated — nothing driver-side but the grid.
    */
  def thresholdSweepOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    classifierScores(documents, trainedWeights(documents))
      .select(round($"z", 6).as("rz"),
        explode(array(SweepThresholds.map(lit): _*)).as("thr"))
      .groupBy($"thr")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"rz" >= $"thr", 1L).otherwise(0L)).as("n_pass"))
      .select($"thr".as("z_threshold"), $"n_pass",
        ($"n_pass".cast("double") / $"n_docs").as("pass_rate"))
      .orderBy($"z_threshold")
  }

  def thresholdSweep(spark: SparkSession, sfDir: String): DataFrame =
    thresholdSweepOf(docs(spark, sfDir))

  def thresholdSweepSql: String = {
    val grid = SweepThresholds.mkString(", ")
    s"""WITH $clfTrainCtes,
       |zz AS (SELECT f.doc_id, SUM(f.x * w.w) AS z
       |       FROM feats f JOIN w$ClfIters w ON f.dim = w.dim
       |       GROUP BY f.doc_id),
       |rz AS (SELECT round(z, 6) AS rz FROM zz),
       |grid AS (SELECT CAST(unnest([$grid]) AS DOUBLE) AS thr)
       |SELECT thr AS z_threshold,
       |  CAST(SUM(CASE WHEN rz >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CAST(SUM(CASE WHEN rz >= thr THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS pass_rate
       |FROM rz CROSS JOIN grid
       |GROUP BY thr ORDER BY z_threshold""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_epoch_allocation — data-constrained epoch/budget allocator
  // ---------------------------------------------------------------

  /** Training-token budget as a multiple of the corpus, the per-source
    * epoch cap, and the epoch-decay scale (value of the e-th epoch
    * decays like exp(−(e−1)/R) — the data-constrained-scaling shape
    * of Muennighoff et al. 2023, arXiv 2305.16264). */
  val EpochBudgetX = 3
  val EpochCap = 16.0
  val EpochDecayR = 15.0

  /** Epoch allocation under a fixed training-token budget: the budget
    * ([[EpochBudgetX]] × total corpus tokens) is split EQUALLY across
    * sources (the uniform-mixing baseline), so small sources get
    * repeated for many epochs and large ones train partially — the
    * report gives each source's allocation, implied epochs (capped at
    * [[EpochCap]]), and the effective unique-token value
    * `U·R·(1−exp(−E/R))` after repeated-epoch decay, the number that
    * says when repeating stops buying anything.
    *
    * Determinism: token counts are exact longs; the budget split is
    * integer division; epochs and effective tokens are single double
    * expressions over those exact inputs, rounded at emission.
    * Scale: one token-count aggregate by source (partial+final) and
    * a 1-row total broadcast-joined back — no global window, no
    * driver loop.
    */
  def epochAllocationOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val perSource = documents
      .select($"source", size(tokens($"text")).cast("long").as("n"))
      .groupBy($"source").agg(sum($"n").as("unique_tokens"))
    val totals = perSource.agg(
      sum($"unique_tokens").as("total"),
      count(lit(1)).as("n_sources"))
    // epochs = alloc/unique is an exact integer rational — scale-floor
    // it in integer space (the skew-report lesson: round(x, 4) on
    // exact rationals is engine-divergent at half-grid points); the
    // floored value feeds BOTH the report and the decay formula
    val capScaled = (EpochCap * 10000).toLong
    perSource
      .join(broadcast(totals))
      .withColumn("alloc_tokens",
        expr(s"CAST(($EpochBudgetX * total) DIV n_sources AS BIGINT)"))
      .withColumn("epochs",
        least(expr("(alloc_tokens * 10000) DIV greatest(unique_tokens, 1)"),
          lit(capScaled)).cast("double") / 10000.0)
      .select($"source", $"unique_tokens", $"alloc_tokens", $"epochs",
        round($"unique_tokens" * lit(EpochDecayR) *
          (lit(1.0) - exp(-$"epochs" / lit(EpochDecayR))), 2)
          .as("eff_tokens"))
      .orderBy($"source")
  }

  def epochAllocation(spark: SparkSession, sfDir: String): DataFrame =
    epochAllocationOf(docs(spark, sfDir))

  def epochAllocationSql: String =
    s"""WITH ps AS (
       |  SELECT source, CAST(SUM(len($tokensSql)) AS BIGINT) AS unique_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(SUM(unique_tokens) AS BIGINT) AS total,
       |               COUNT(*) AS n_sources FROM ps),
       |a AS (
       |  SELECT source, unique_tokens,
       |    ($EpochBudgetX * total) // n_sources AS alloc_tokens
       |  FROM ps CROSS JOIN tot),
       |e AS (
       |  SELECT source, unique_tokens, alloc_tokens,
       |    CAST(least((alloc_tokens * 10000) // greatest(unique_tokens, 1),
       |               ${(EpochCap * 10000).toLong}) AS DOUBLE) / 10000.0
       |      AS epochs
       |  FROM a)
       |SELECT source, unique_tokens, CAST(alloc_tokens AS BIGINT)
       |    AS alloc_tokens,
       |  epochs,
       |  round(unique_tokens * $EpochDecayR *
       |        (1.0 - exp(-epochs / $EpochDecayR)), 2) AS eff_tokens
       |FROM e ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // llm_context_len_fit — context-window budget card
  // ---------------------------------------------------------------

  /** The candidate context windows (tokens) the fit card evaluates. */
  val CtxWindows: Seq[Int] = Seq(64, 256, 1024)

  /** Context-window budget card: for each candidate window, how many
    * documents fit whole, what fraction of the corpus token mass
    * survives truncate-to-fit, and how many tokens truncation burns —
    * the numbers that decide between "train at 1k ctx and truncate"
    * and "chunk first" ([[Graft.docChunk]]'s sibling decision). All
    * integer arithmetic (min/max against the window) except the final
    * kept-fraction ratio.
    *
    * Scale: one token-count scan, a 3× explode, one partial+final
    * aggregate — the [[thresholdSweepOf]] shape. */
  def contextLenFitOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents
      .select(size(tokens($"text")).cast("long").as("n"))
      .select($"n", explode(array(CtxWindows.map(lit): _*)).as("ctx"))
      .groupBy($"ctx")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n" <= $"ctx", 1L).otherwise(0L)).as("n_fit"),
        sum($"n").as("total_tokens"),
        sum(least($"n", $"ctx".cast("long"))).as("kept_tokens"))
      .select($"ctx".cast("bigint").as("ctx"), $"n_fit",
        ($"total_tokens" - $"kept_tokens").as("trunc_tokens"),
        ($"kept_tokens".cast("double") / greatest($"total_tokens", lit(1L)))
          .as("kept_frac"))
      .orderBy($"ctx")
  }

  def contextLenFit(spark: SparkSession, sfDir: String): DataFrame =
    contextLenFitOf(docs(spark, sfDir))

  def contextLenFitSql: String = {
    val grid = CtxWindows.mkString(", ")
    s"""WITH d AS (SELECT len($tokensSql) AS n FROM documents),
       |g AS (SELECT n, unnest([$grid]) AS ctx FROM d)
       |SELECT CAST(ctx AS BIGINT) AS ctx,
       |  CAST(SUM(CASE WHEN n <= ctx THEN 1 ELSE 0 END) AS BIGINT) AS n_fit,
       |  CAST(SUM(n) - SUM(least(n, ctx)) AS BIGINT) AS trunc_tokens,
       |  CAST(SUM(least(n, ctx)) AS DOUBLE) / greatest(SUM(n), 1) AS kept_frac
       |FROM g GROUP BY ctx ORDER BY ctx""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_mixture_temperature — temperature-scaled source sampling
  // ---------------------------------------------------------------

  /** The sampling temperatures the mixing card evaluates: τ=1 is
    * proportional sampling, τ→0 approaches uniform — the XLM-R /
    * mT5 knob for keeping low-resource sources visible. */
  val MixTaus: Seq[Double] = Seq(0.3, 0.7, 1.0)

  /** Temperature-scaled mixture weights per source: `w_s ∝ p_s^τ`
    * over the token-mass shares, reported for each τ in [[MixTaus]].
    * This is the sampling-weight table a multilingual/multi-source
    * training loader consumes (Conneau et al. 2020 §3.1) — read next
    * to [[epochAllocationOf]]: temperature picks the MIX, epochs say
    * what the mix COSTS in repetition.
    *
    * Scale: one token-mass aggregate by source, a 1-row total, a
    * |sources|×|τ| frame — the per-τ normalization is a window over
    * a bounded-cardinality frame, never the corpus. */
  def mixtureTemperatureOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val ps = documents
      .select($"source", size(tokens($"text")).cast("long").as("n"))
      .groupBy($"source").agg(sum($"n").as("n_tokens"))
    val tot = ps.agg(sum($"n_tokens").cast("double").as("t"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"tau")
    ps.join(broadcast(tot))
      .select($"source", $"n_tokens", $"t",
        explode(array(MixTaus.map(lit): _*)).as("tau"))
      .withColumn("wr", pow($"n_tokens" / $"t", $"tau"))
      .select($"tau", $"source", $"n_tokens",
        round($"wr" / sum($"wr").over(w), 6).as("weight"))
      .orderBy($"tau", $"source")
  }

  def mixtureTemperature(spark: SparkSession, sfDir: String): DataFrame =
    mixtureTemperatureOf(docs(spark, sfDir))

  def mixtureTemperatureSql: String = {
    val grid = MixTaus.mkString(", ")
    s"""WITH ps AS (
       |  SELECT source, CAST(SUM(len($tokensSql)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM ps),
       |g AS (SELECT CAST(unnest([$grid]) AS DOUBLE) AS tau),
       |r AS (SELECT tau, source, n_tokens, pow(n_tokens / t, tau) AS wr
       |      FROM ps CROSS JOIN tot CROSS JOIN g)
       |SELECT tau, source, n_tokens,
       |  round(wr / SUM(wr) OVER (PARTITION BY tau), 6) AS weight
       |FROM r ORDER BY tau, source""".stripMargin
  }

  // ---------------------------------------------------------------
  // llm_rolling_hash_chunks — content-defined chunking + chunk dedup
  // ---------------------------------------------------------------

  /** Content-defined chunk boundary rate: a boundary falls AFTER any
    * token whose salted hash is ≡ 0 (mod [[CdcBoundaryMod]]), giving
    * ~[[CdcBoundaryMod]]-token expected chunks. */
  val CdcBoundaryMod = 32
  val CdcSalt = 41

  /** Content-defined chunking (the rsync/LBFS rolling-boundary idea
    * applied to token streams): chunk boundaries are decided by token
    * CONTENT (`md5(token) % m == 0`), not position, so a one-token
    * insertion shifts every byte offset but leaves all other chunk
    * identities intact — which makes CHUNK-level dedup robust to the
    * small edits that defeat whole-document hashing. The report is
    * per-source chunk accounting: chunks produced, distinct chunk
    * fingerprints, and the duplicated-chunk fraction — sub-document
    * redundancy that pair-level near-dup never itemizes.
    *
    * Scale: posexplode → per-token boundary bit → per-doc running
    * boundary count (window partitioned by doc, never global) →
    * chunk-keyed aggregate. Every step is keyed on doc or chunk;
    * state per row is one bit and one counter. */
  def rollingHashChunksOf(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val toks = documents
      .select($"doc_id", $"source", posexplode(tokens($"text")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val chunks = toks
      .withColumn("boundary",
        when(graft.functions.Hashing.md5i32($"tok", CdcSalt)
          % CdcBoundaryMod === 0L, 1L).otherwise(0L))
      .withColumn("chunk_id", coalesce(sum($"boundary").over(w), lit(0L)))
      .groupBy($"doc_id", $"source", $"chunk_id")
      // collect_list order is NOT the window order under shuffle —
      // sort the (pos, tok) structs before joining the chunk text
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct($"pos", $"tok"))),
          x => x("tok"))).as("chunk_text"))
    chunks
      .groupBy($"source")
      .agg(count(lit(1)).as("n_chunks"),
        count_distinct(md5($"chunk_text")).as("distinct_chunks"))
      .select($"source", $"n_chunks", $"distinct_chunks",
        (($"n_chunks" - $"distinct_chunks").cast("double") / $"n_chunks")
          .as("dup_chunk_frac"))
      .orderBy($"source")
  }

  def rollingHashChunks(spark: SparkSession, sfDir: String): DataFrame =
    rollingHashChunksOf(docs(spark, sfDir))

  def rollingHashChunksSql: String = {
    val h = md5i32Sql("tok", CdcSalt)
    s"""WITH t AS (SELECT doc_id, source, $tokensSql AS ts FROM documents),
       |p AS (SELECT doc_id, source,
       |        generate_subscripts(ts, 1) - 1 AS pos, unnest(ts) AS tok
       |      FROM t),
       |b AS (SELECT doc_id, source, pos, tok,
       |        CASE WHEN $h % $CdcBoundaryMod = 0 THEN 1 ELSE 0 END
       |          AS boundary
       |      FROM p),
       |c AS (SELECT doc_id, source, tok,
       |        COALESCE(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS chunk_id, pos
       |      FROM b),
       |ch AS (SELECT doc_id, source, chunk_id,
       |         md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
       |       FROM c GROUP BY doc_id, source, chunk_id)
       |SELECT source, COUNT(*) AS n_chunks,
       |  COUNT(DISTINCT fp) AS distinct_chunks,
       |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*)
       |    AS dup_chunk_frac
       |FROM ch GROUP BY source ORDER BY source""".stripMargin
  }

  /** The training CTE chain (tokenize → label → features → GD
    * iterations, final weights in `w${ClfIters}`) — the WITH body
    * shared by [[qualityClassifierSql]] and the curation pipeline's
    * oracle. `b` also carries `lang` and the Gopher feature columns
    * so downstream CTEs can gate on them. */
  private def clfTrainCtes: String = {
    val markers = allMarkers.map(m => s"'$m'").mkString(", ")
    val d = ClfDims
    def iter(prev: String, cur: String): String =
      s"""z$cur AS (SELECT f.doc_id, SUM(f.x * w.w) AS z
         |          FROM feats f JOIN $prev w ON f.dim = w.dim
         |          GROUP BY f.doc_id),
         |e$cur AS (SELECT z$cur.doc_id, 1.0/(1.0 + exp(-z)) - y AS err
         |          FROM z$cur JOIN lab ON z$cur.doc_id = lab.doc_id),
         |g$cur AS (SELECT f.dim, SUM(e$cur.err * f.x) / (SELECT nd FROM nd) AS g
         |          FROM feats f JOIN e$cur ON f.doc_id = e$cur.doc_id
         |          GROUP BY f.dim),
         |$cur AS MATERIALIZED (
         |         SELECT w.dim, round(w.w - $ClfEta * COALESCE(g$cur.g, 0.0), 6) AS w
         |         FROM $prev w LEFT JOIN g$cur ON w.dim = g$cur.dim)""".stripMargin
    s"""t AS (SELECT doc_id, lang, $tokensSql AS ts FROM documents),
       |b AS MATERIALIZED (SELECT doc_id, lang, ts, len(ts) AS n,
       |        len(list_intersect(list_distinct(ts), [$markers])) AS sh,
       |        length(regexp_replace(lower(array_to_string(ts, ' ')),
       |                              '[^\\p{L}\\p{N}_]+', '', 'g')) AS word_chars,
       |        len(list_filter(ts, x -> regexp_matches(x, '\\p{L}'))) AS alpha_words,
       |        len(list_filter(ts, x -> regexp_matches(x, '^\\p{N}+$$'))) AS digit_words
       |      FROM t WHERE len(ts) > 0),
       |lab AS MATERIALIZED (SELECT doc_id,
       |  CASE WHEN n >= 30 AND sh >= 2 THEN 1.0 ELSE 0.0 END AS y FROM b),
       |tok AS (SELECT doc_id, n, unnest(ts) AS term FROM b),
       |hashed AS (SELECT doc_id, ${md5i32Sql("term", ClfSalt)} % $d AS dim,
       |             COUNT(*)::DOUBLE / n AS x
       |           FROM tok GROUP BY doc_id, n, ${md5i32Sql("term", ClfSalt)} % $d),
       |feats AS MATERIALIZED (SELECT * FROM hashed
       |          UNION ALL SELECT doc_id, $d AS dim,
       |            CAST(least(n, 100) AS DOUBLE) / 100.0 AS x FROM b
       |          UNION ALL SELECT doc_id, ${d + 1} AS dim,
       |            CAST(least(sh, 10) AS DOUBLE) / 10.0 AS x FROM b
       |          UNION ALL SELECT doc_id, ${d + 2} AS dim, 1.0 AS x FROM b),
       |nd AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS nd FROM b),
       |w0 AS (SELECT unnest(range(0, ${d + 3})) AS dim, 0.0 AS w),
       |${(1 to ClfIters).map(i => iter(s"w${i - 1}", s"w$i")).mkString(",\n")}""".stripMargin
  }

  def qualityClassifierSql: String =
    s"""WITH $clfTrainCtes
       |SELECT dim, w AS weight FROM w$ClfIters ORDER BY dim""".stripMargin

  // ---------------------------------------------------------------
  // llm_split_leakage — near-dup contamination across splits
  // ---------------------------------------------------------------

  /** Cross-split leakage audit: after the content-hash train/val/test
    * assignment (same salt-17 rule as
    * [[TextAnalytics.corpusSplitOf]]), find document pairs in
    * DIFFERENT splits that share ≥ `minShared` distinct 3-grams —
    * exact duplicates can't straddle the boundary (the split is
    * content-keyed) but near-duplicates can, and each one leaks
    * training text into eval. Reports pair counts and the worst
    * overlap per split pair.
    *
    * Scale: the df-capped inverted-index shape of [[Dedup]] — a
    * shingle with document frequency > `dfCap` is too common to
    * signal near-duplication and is dropped BEFORE the posting-list
    * self-join, so no hot shingle can go quadratic.
    */
  def splitLeakageOf(documents: DataFrame, n: Int = 3, dfCap: Int = 16,
                     minShared: Long = 2L, trainPct: Int = 80,
                     valPct: Int = 10): DataFrame = {
    import documents.sparkSession.implicits._
    val h = pmod(graft.functions.Hashing.md5i32($"text", 17), lit(100))
    val d = documents.withColumn("split",
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test"))
    // postings keyed on the gram's (md5-A, md5-B) LONG pair, not the
    // gram string — the df-cap aggregate and the pair self-join then
    // shuffle 16 fixed bytes per posting instead of a variable
    // ~25-byte string (the [[Dedup]] compact-key rule). The oracle
    // replays the identical hash family, so a 128-bit collision
    // (~n²/2¹²⁸) is engine-identical and the check is unaffected.
    val g = cached("leakageGrams",
      d.select($"doc_id", $"split",
          explode(array_distinct(shingles(tokens($"text"), n))).as("sh"))
        .withColumn("p", graft.functions.Hashing.md5Pair($"sh"))
        .select($"doc_id", $"split",
          $"p.a".as("ha"), $"p.b".bitwiseOR(lit(1L)).as("hb")))
    val capped = g.groupBy($"ha", $"hb")
      .agg(count(lit(1)).as("df"))
      .filter($"df" >= 2 && $"df" <= dfCap)
      .select($"ha", $"hb")
    val posts = g.join(capped, Seq("ha", "hb"))
    val pairs = posts.as("a").join(posts.as("b"),
        $"a.ha" === $"b.ha" && $"a.hb" === $"b.hb" &&
          $"a.doc_id" < $"b.doc_id" && $"a.split" =!= $"b.split")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        least($"a.split", $"b.split").as("split_lo"),
        greatest($"a.split", $"b.split").as("split_hi"))
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= minShared)
    pairs.groupBy($"split_lo", $"split_hi")
      .agg(count(lit(1)).as("n_pairs"),
        max($"shared").as("max_shared"))
      .orderBy($"split_lo", $"split_hi")
  }

  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame =
    splitLeakageOf(docs(spark, sfDir))

  def splitLeakageSql(n: Int = 3, dfCap: Int = 16, minShared: Long = 2L,
                      trainPct: Int = 80, valPct: Int = 10): String =
    s"""WITH d AS (SELECT doc_id, $tokensSql AS ts,
       |    CASE WHEN ${md5i32Sql("text", 17)} % 100 < $trainPct THEN 'train'
       |         WHEN ${md5i32Sql("text", 17)} % 100 < ${trainPct + valPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |g AS (SELECT doc_id, split,
       |        ${graft.functions.Hashing.md5PairASql} AS ha,
       |        ${graft.functions.Hashing.md5PairBSql} AS hb
       |      FROM (SELECT doc_id, split,
       |              unnest(list_distinct(${shinglesNSql("ts", n)})) AS sh
       |            FROM d)),
       |capped AS (SELECT ha, hb
       |           FROM (SELECT ha, hb, COUNT(*) AS df FROM g GROUP BY ha, hb)
       |           WHERE df >= 2 AND df <= $dfCap),
       |posts AS (SELECT doc_id, split, ha, hb FROM g JOIN capped USING (ha, hb)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         least(a.split, b.split) AS split_lo,
       |         greatest(a.split, b.split) AS split_hi,
       |         COUNT(*) AS shared
       |  FROM posts a JOIN posts b
       |    ON a.ha = b.ha AND a.hb = b.hb
       |   AND a.doc_id < b.doc_id AND a.split <> b.split
       |  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= $minShared)
       |SELECT split_lo, split_hi, COUNT(*) AS n_pairs,
       |  MAX(shared) AS max_shared
       |FROM pairs GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin

  // ---------------------------------------------------------------
  // llm_blocklist_filter — denylist screen with per-term attribution
  // ---------------------------------------------------------------

  /** The compliance denylist — ONE definition feeding the operator,
    * the oracle, and the spec.
    *
    * Terms are constrained to the tokenizer's own output alphabet
    * (lowercase `[\p{L}\p{N}_]+`): the match is membership in the
    * [[tokens]] stream, so a term with uppercase, punctuation, or a
    * quote could NEVER match a token — and a quote would additionally
    * break the interpolated `'$t'` literal in the oracle SQL and the
    * derived `h_$t` column names. Fail loudly at class-load instead
    * of silently matching nothing (round-11 advice). */
  val BlocklistTerms: Seq[String] = Seq("big", "slow", "stream", "vector")
  require(BlocklistTerms.forall(_.matches("[\\p{Ll}\\p{N}_]+")),
    s"blocklist terms must be lowercase [\\p{L}\\p{N}_]+ tokens: $BlocklistTerms")

  /** Denylist screen over the corpus — the compliance/NSFW-wordlist
    * stage every production curation pipeline runs before anything
    * model-based: per blocked term, how many documents contain it as
    * a WHOLE word, plus the `__any__` row (documents hitting at
    * least one term — what a remove-on-any policy would drop; its
    * complement is the survivor count). Per-term attribution is the
    * part naive filters skip and reviewers always ask for: which
    * term is doing the blocking.
    *
    * Word-boundary matching is membership in the shared [[tokens]]
    * stream (the library-wide tokenizer every text operator uses), so
    * a denylist term adjacent to punctuation or a line break
    * (`"big,"`, `"big.\n"`) counts — the round-10 advice caught that
    * the earlier space-padded containment silently missed those.
    * `array_contains` in Spark, `list_contains` in DuckDB, over the
    * IDENTICAL regex token stream — no engine divergence. Shares are
    * scaled-integer floor division ([[Relational.dataSkewReport]]
    * precedent).
    *
    * Scale: ONE corpus pass — all flags evaluate per-row over one
    * shared tokenize, one partial+final aggregate; the result frame
    * is |terms|+1 rows. The term list lives in the closure (a literal
    * per term), the at-scale form for lists up to ~thousands; beyond
    * that it becomes a broadcast join against an exploded token
    * stream. */
  def blocklistFilterOf(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // tokenize ONCE per row; each term flag is an array probe over
    // the shared stream
    val flags = BlocklistTerms.map(t =>
      array_contains($"ts", t).cast("long").as(s"h_$t"))
    val flagged = documents.select(tokens($"text").as("ts")).select(flags: _*)
    val aggCols = BlocklistTerms.map(t => sum(col(s"h_$t")).as(s"n_$t")) ++
      Seq(sum(greatest(BlocklistTerms.map(t => col(s"h_$t")): _*)).as("n_any"),
        count(lit(1)).as("n"))
    val a = flagged.agg(aggCols.head, aggCols.tail: _*)
    val rows = BlocklistTerms.map(t =>
      struct(lit(t).as("term"), col(s"n_$t").as("n_hit"))) :+
      struct(lit("__any__").as("term"), $"n_any".as("n_hit"))
    a.select($"n", explode(array(rows: _*)).as("r"))
      .select($"r.term".as("term"), $"r.n_hit".as("n_hit"),
        (expr("CAST((r.n_hit * 1000000) DIV n AS BIGINT)")
          .cast("double") / 1000000.0).as("share"))
      .orderBy($"term")
  }

  def blocklistFilter(spark: SparkSession, sfDir: String): DataFrame =
    blocklistFilterOf(docs(spark, sfDir))

  def blocklistFilterSql(): String = {
    val flagCols = BlocklistTerms.map(t =>
      s"CASE WHEN list_contains(ts, '$t') THEN 1 ELSE 0 END AS h_$t")
      .mkString(",\n|    ")
    val sums = BlocklistTerms.map(t =>
      s"CAST(SUM(h_$t) AS BIGINT) AS n_$t").mkString(",\n|    ")
    val anyExpr = BlocklistTerms.map(t => s"h_$t").mkString("GREATEST(", ", ", ")")
    val branches = (BlocklistTerms.map(t =>
      s"SELECT '$t' AS term, n_$t AS n_hit, n FROM a") :+
      s"SELECT '__any__' AS term, n_any AS n_hit, n FROM a")
      .mkString("\n|  UNION ALL ")
    s"""WITH f AS (
       |  SELECT
       |    $flagCols
       |  FROM (SELECT $tokensSql AS ts FROM documents)),
       |a AS (
       |  SELECT
       |    $sums,
       |    CAST(SUM($anyExpr) AS BIGINT) AS n_any,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM f)
       |SELECT term, n_hit,
       |  CAST((n_hit * 1000000) // n AS DOUBLE) / 1000000.0 AS share
       |FROM (
       |  $branches)
       |ORDER BY term""".stripMargin
  }
}
