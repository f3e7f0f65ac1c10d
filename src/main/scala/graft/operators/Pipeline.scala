package graft.operators

import graft.functions.Hashing._
import graft.functions.TextAnalysis._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed end-to-end preprocessing pipeline — the chain a
  * training-data run actually executes, built from the standalone
  * stage operators this library already ships:
  *
  *   corpus → quality filter (Gopher-style gate, [[TextAnalytics
  *   .qualityFilter]] rules) → exact dedup (min-id survivor per
  *   content hash, [[Dedup.exactDedupGroups]] rule) → MinHash near
  *   dedup (banded LSH candidates + exact-Jaccard verify,
  *   [[Dedup.minHashNearDupsOf]]; every verified pair's higher id is
  *   dropped) → decontamination (any shared word-5-gram with the
  *   hash-ranked benchmark set, [[TextAnalytics.decontaminate]] rule;
  *   benchmark docs themselves leave the training set) → temperature
  *   mix weights (p ∝ tokens^α, [[TextAnalytics.mixWeights]]) +
  *   sequence-pack accounting (ctx-token bins per lang × shard
  *   stream, [[TextAnalytics.seqPack]] arithmetic).
  *
  * Output: one row per (stage, lang) with the survivor/token
  * accounting after that stage — the survivorship report a curation
  * run is judged by — plus a final `mix_pack` row per language
  * carrying the sampling weight and packed-bin/padding accounting
  * over the surviving corpus.
  *
  * The reference has no pipeline at all (its whole data path is CSV →
  * ETS → two queries, `Code/master.erl:137-354`); this is the
  * composition the extension operators exist for.
  *
  * Scale posture (100 TB): each stage is exactly its standalone
  * operator's shape — per-doc hash aggregates (quality), one shuffle
  * on the content hash (exact), banded LSH bucket joins (near),
  * broadcast benchmark grams (decontam), per-lang partial+final
  * aggregates (mix/pack). Stage survivor frames are session-cached
  * here; a production run materializes each as a parquet snapshot
  * (the S5 discipline) so stages restart independently and the
  * accounting doubles as the run's audit log. Nothing
  * corpus-proportional ever reaches the driver.
  */
object Pipeline {

  // every stage runs at its standalone operator's default tuning —
  // the constants are REFERENCES, not re-typed literals, so a change
  // at the operator propagates to the chain (both Scala and SQL)
  val MinHashThreshold = 0.8 // Dedup.minHashNearDupsOf default
  val BenchK: Int = TextAnalytics.DecontamBenchK
  val DecontamN: Int = TextAnalytics.DecontamNgram
  val MixAlpha: Double = TextAnalytics.MixAlphaDefault
  val PackCtx: Int = TextAnalytics.PackCtxDefault
  val PackShards: Int = TextAnalytics.PackShardsDefault

  private val frameCache = new graft.util.FrameCache()

  // localCheckpoint, NOT cache(): stage s4's logical plan embeds s3's,
  // which embeds the MinHash chain referencing the shingle-set frame
  // 8× (4 band branches × 2 join sides), which embeds s2's plan … —
  // with plain cache() the COMPOSED plan tree is exponential in stage
  // depth (~10^5 printed nodes) and every evaluation pays ~20 s of
  // driver-side analysis/canonicalization before a single task runs
  // (measured; execution itself is ~2 s warm). Checkpointing cuts each
  // stage to a leaf, which is also the production posture: a real run
  // materializes every stage as a parquet snapshot (S5) so stages
  // restart independently.
  private def cached(stage: String, df: DataFrame): DataFrame =
    frameCache.getOrElseUpdate(df.sparkSession,
      graft.util.FrameCache.key(stage, df),
      unpersistOnEvict = false)(df.localCheckpoint())

  /** The stage survivor frames, each `(doc_id, lang, text, n_tokens)`
    * — exposed for the reconciliation spec, which pins every stage to
    * its standalone operator. */
  private[graft] final case class Stages(
    d0: DataFrame, s1: DataFrame, s2: DataFrame, s3: DataFrame,
    s4: DataFrame, benchIds: DataFrame, contamIds: DataFrame)

  private[graft] def stagesOf(documents: DataFrame): Stages = {
    val spark = documents.sparkSession
    import spark.implicits._
    val d0 = cached("pipe-d0", documents
      .select($"doc_id", $"lang", $"text",
        size(tokens($"text")).cast("long").as("n_tokens")))
    val surv = Seq($"doc_id", $"lang", $"text", $"n_tokens")

    // stage 1 — quality gate: the SAME stats projection and keep
    // predicate qualityFilter uses (shared helper, zero divergence;
    // the spec additionally reconciles per-lang counts). The survivor
    // columns ride through qualityStats, so the stage is one
    // projection + filter — no stats joins.
    val t = d0.select($"doc_id", $"lang", $"text", $"n_tokens",
      tokens($"text").as("ts"))
    val s1 = cached("pipe-s1", TextAnalytics.qualityStats(t)
      .filter(TextAnalytics.qualityKeepCond).select(surv: _*))

    // stage 2 — exact dedup among survivors: min-id per content hash
    val ex = s1.groupBy(md5($"text").as("ch"))
      .agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val s2 = cached("pipe-s2", s1.join(ex, Seq("doc_id"), "left_semi"))

    // stage 3 — MinHash near-dedup: the greedy LSH drop rule (every
    // verified pair already has doc_a < doc_b; all doc_b drop)
    val pairs = Dedup.minHashNearDupsOf(
      s2.select($"doc_id", $"text"), MinHashThreshold)
    val drops = pairs.select($"doc_b".as("doc_id")).distinct()
    val s3 = cached("pipe-s3", s2.join(drops, Seq("doc_id"), "left_anti"))

    // stage 4 — decontamination: benchmark = hash-ranked sample of
    // the FULL corpus (the eval suite exists before curation);
    // survivors sharing any distinct 5-gram with it leave, and the
    // benchmark docs themselves never train
    // checkpointed like the stage frames: three consumers below
    // (benchGrams, contamIds, s4) would otherwise each pay the
    // corpus-wide hash-rank for the same 25 ids
    val benchIds = cached("pipe-bench", d0
      .withColumn("h", md5i32($"text", TextAnalytics.DecontamSalt))
      .orderBy($"h", $"doc_id")
      .limit(BenchK)
      .select($"doc_id".as("bench_id")))
    val benchGrams = d0
      .join(broadcast(benchIds), $"doc_id" === $"bench_id")
      .select(explode(array_distinct(
        shingles(tokens($"text"), DecontamN))).as("g"))
      .distinct()
    val contamIds = cached("pipe-contam", s3
      .join(broadcast(benchIds), $"doc_id" === $"bench_id", "left_anti")
      .select($"doc_id", explode(array_distinct(
        shingles(tokens($"text"), DecontamN))).as("g"))
      .join(broadcast(benchGrams), "g")
      .select($"doc_id").distinct())
    val s4 = cached("pipe-s4", s3
      .join(broadcast(benchIds), $"doc_id" === $"bench_id", "left_anti")
      .join(contamIds, Seq("doc_id"), "left_anti")
      .select(surv: _*))

    Stages(d0, s1, s2, s3, s4, benchIds, contamIds)
  }

  /** The catalog query: per-stage per-language survivorship report. */
  def pipeline(spark: SparkSession, sfDir: String): DataFrame =
    pipelineOf(Tables.documents(spark, sfDir))

  /** [[pipeline]] over any `(doc_id, lang, text)` frame. */
  def pipelineOf(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val st = stagesOf(documents)

    def acct(stage: Int, name: String, df: DataFrame): DataFrame =
      df.groupBy($"lang")
        .agg(count(lit(1)).as("nd"), sum($"n_tokens").as("tk"))
        .select(lit(stage.toLong).as("stage"), lit(name).as("stage_name"),
          $"lang", $"nd".cast("long").as("n_docs"),
          $"tk".cast("long").as("n_tokens"),
          lit(null).cast("double").as("weight"),
          lit(null).cast("long").as("n_bins"),
          lit(null).cast("long").as("pad_tokens"))

    // stage 5 — mix weights + pack accounting over the final corpus.
    // bins/padding need only per-(lang, shard) token totals (the
    // boundary-crossing census of llm_seq_pack needs the window; the
    // pipeline report does not), so this is two tiny aggregates.
    val perLang = st.s4.groupBy($"lang")
      .agg(count(lit(1)).as("nd"), sum($"n_tokens").as("tk"))
    val z = perLang.agg(sum(pow($"tk", MixAlpha)).as("z"))
    val packPerShard = st.s4
      .select($"lang", pmod($"doc_id", lit(PackShards.toLong)).as("shard"),
        $"n_tokens")
      .groupBy($"lang", $"shard").agg(sum($"n_tokens").as("toks"))
    val bins = floor(($"toks" - 1) / PackCtx) + 1
    val pack = packPerShard.groupBy($"lang").agg(
      sum(when($"toks" > 0, bins).otherwise(0L)).cast("long").as("n_bins"),
      sum(when($"toks" > 0, bins * PackCtx - $"toks").otherwise(0L))
        .cast("long").as("pad_tokens"))
    val a5 = perLang.crossJoin(z).join(pack, "lang")
      .select(lit(5L).as("stage"), lit("mix_pack").as("stage_name"),
        $"lang", $"nd".cast("long").as("n_docs"),
        $"tk".cast("long").as("n_tokens"),
        round(pow($"tk", MixAlpha) / $"z", 6).as("weight"),
        $"n_bins", $"pad_tokens")

    acct(0, "corpus", st.d0)
      .unionByName(acct(1, "quality", st.s1))
      .unionByName(acct(2, "exact_dedup", st.s2))
      .unionByName(acct(3, "near_dedup", st.s3))
      .unionByName(acct(4, "decontaminated", st.s4))
      .unionByName(a5)
      .orderBy($"stage", $"lang")
  }

  /** The pipeline's ARTIFACT view: the surviving training corpus
    * after every drop stage, as a `(doc_id, lang, n_tokens)` manifest
    * in id order — what a run actually hands to tokenization/packing
    * (the accounting report is [[pipeline]]; this is the data). Costs
    * nothing extra in-session: it reads the same checkpointed stage-4
    * frame. */
  def pipelineSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    stagesOf(Tables.documents(spark, sfDir)).s4
      .select($"doc_id".cast("long").as("doc_id"), $"lang", $"n_tokens")
      .orderBy($"doc_id")
  }

  def pipelineSurvivorsSql: String =
    s"""WITH ${chainCtes()}
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |  CAST(n_tokens AS BIGINT) AS n_tokens
       |FROM s4 ORDER BY doc_id""".stripMargin

  /** Oracle: the full chain replayed as CTEs — quality gate, content-
    * hash dedup, the shared MinHash pair chain over the survivor
    * subset, gram-overlap decontamination, then the accounting. */
  /** The drop-stage CTE chain through `s4`, shared by both oracles. */
  private def chainCtes(): String = {
    val pipeSets =
      s"""SELECT doc_id, list_distinct(${shingles3Sql("ts")}) AS shs
         |FROM tq WHERE doc_id IN (SELECT doc_id FROM s2)
         |  AND len(ts) >= 3""".stripMargin
    s"""d0 AS MATERIALIZED (SELECT doc_id, lang, text,
       |  CAST(len($tokensSql) AS BIGINT) AS n_tokens FROM documents),
       |tq AS MATERIALIZED (SELECT doc_id, $tokensSql AS ts FROM documents),
       |${TextAnalytics.qualityStatsCtesSql("tq")},
       |keepids AS MATERIALIZED (
       |  SELECT tq.doc_id FROM tq JOIN w USING (doc_id)
       |  LEFT JOIN sh3 USING (doc_id)
       |  WHERE ${TextAnalytics.qualityKeepWhereSql}),
       |s1 AS MATERIALIZED (SELECT * FROM d0 WHERE doc_id IN (SELECT doc_id FROM keepids)),
       |ex AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
       |s2 AS MATERIALIZED (SELECT * FROM s1 WHERE doc_id IN (SELECT doc_id FROM ex)),
       |${Dedup.minHashPairsCtes(pipeSets)},
       |drops AS (SELECT DISTINCT b AS doc_id FROM verified
       |          WHERE jaccard >= $MinHashThreshold),
       |s3 AS MATERIALIZED (SELECT * FROM s2
       |       WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
       |bench AS MATERIALIZED (${TextAnalytics.benchIdsSubSql(BenchK)}),
       |bg AS (SELECT DISTINCT g FROM (
       |  SELECT unnest(list_distinct(${shinglesNSql("ts", DecontamN)})) AS g
       |  FROM tq WHERE doc_id IN (SELECT doc_id FROM bench))),
       |contam AS MATERIALIZED (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id,
       |      unnest(list_distinct(${shinglesNSql("ts", DecontamN)})) AS g
       |    FROM tq WHERE doc_id IN (SELECT doc_id FROM s3)
       |      AND doc_id NOT IN (SELECT doc_id FROM bench))
       |  WHERE g IN (SELECT g FROM bg)),
       |s4 AS MATERIALIZED (SELECT * FROM s3
       |       WHERE doc_id NOT IN (SELECT doc_id FROM bench)
       |         AND doc_id NOT IN (SELECT doc_id FROM contam))""".stripMargin
  }

  def pipelineSql: String = {
    def acctSql(stage: Int, name: String, src: String): String =
      s"""a$stage AS (SELECT CAST($stage AS BIGINT) AS stage,
         |  '$name' AS stage_name, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(NULL AS DOUBLE) AS weight,
         |  CAST(NULL AS BIGINT) AS n_bins,
         |  CAST(NULL AS BIGINT) AS pad_tokens
         |  FROM $src GROUP BY lang)""".stripMargin
    s"""WITH ${chainCtes()},
       |${acctSql(0, "corpus", "d0")},
       |${acctSql(1, "quality", "s1")},
       |${acctSql(2, "exact_dedup", "s2")},
       |${acctSql(3, "near_dedup", "s3")},
       |${acctSql(4, "decontaminated", "s4")},
       |mix AS (SELECT lang, COUNT(*) AS n_docs,
       |        CAST(SUM(n_tokens) AS BIGINT) AS tk FROM s4 GROUP BY lang),
       |z AS (SELECT SUM(pow(tk, ${MixAlpha}e0)) AS z FROM mix),
       |shardtoks AS (SELECT lang, doc_id % $PackShards AS shard,
       |              CAST(SUM(n_tokens) AS BIGINT) AS toks
       |              FROM s4 GROUP BY 1, 2),
       |pack AS (SELECT lang,
       |  CAST(SUM(CASE WHEN toks > 0 THEN (toks - 1) // $PackCtx + 1
       |                ELSE 0 END) AS BIGINT) AS n_bins,
       |  CAST(SUM(CASE WHEN toks > 0
       |                THEN ((toks - 1) // $PackCtx + 1) * $PackCtx - toks
       |                ELSE 0 END) AS BIGINT) AS pad_tokens
       |  FROM shardtoks GROUP BY lang),
       |a5 AS (SELECT CAST(5 AS BIGINT) AS stage, 'mix_pack' AS stage_name,
       |  m.lang, m.n_docs, m.tk AS n_tokens,
       |  ROUND(pow(m.tk, ${MixAlpha}e0) / z.z, 6) AS weight,
       |  p.n_bins, p.pad_tokens
       |  FROM mix m CROSS JOIN z JOIN pack p ON m.lang = p.lang)
       |SELECT * FROM (
       |  SELECT * FROM a0 UNION ALL SELECT * FROM a1
       |  UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3
       |  UNION ALL SELECT * FROM a4 UNION ALL SELECT * FROM a5)
       |ORDER BY stage, lang""".stripMargin
  }
}
