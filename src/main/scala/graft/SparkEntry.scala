package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Clustering, Dedup, Graph, Multimodal, ReferenceQueries, Relational, Similarity, TextAnalytics, TimeSeries}
import graft.sources.Ingest

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a named entry in
  * [[queries]]; [[oracleSql]] carries the DuckDB-equivalent ANSI SQL
  * for the driver's differential check (hash compare at sf0.01).
  * Column names and types are aligned pairwise (bigint counts, string
  * names) because the compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's Title query (`Code/mapReduce.erl:21-30`): movies
    * sharing cast with "order-1", bucketed by overlap size.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.titleLevels(spark, "/root/testdata/sf0.001", "order-1")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY §2.2-2.5, §3.1-3.2) —
    "ref_title_levels" -> ((s, d) => ReferenceQueries.titleLevels(s, d, "order-1")),
    "ref_title_missing" -> ((s, d) => ReferenceQueries.titleLevels(s, d, "order-no-such")),
    "ref_actor_coactors" -> ((s, d) => ReferenceQueries.actorCoactors(s, d, "7")),
    "ref_level_histogram" -> ((s, d) => ReferenceQueries.levelHistogram(s, d, "order-1")),
    "ref_title_levels_bucketed" -> ((s, d) => ReferenceQueries.titleLevelsBucketed(s, d, "order-1")),
    "ref_title_dup_probe" -> (ReferenceQueries.titleDupProbe _),
    // — sources / sinks / ETL (SURVEY §2.1, §3.3) —
    "src_csv_roundtrip" -> ((s, d) => Ingest.csvRoundTrip(s, d)),
    "src_parquet_roundtrip" -> ((s, d) => Ingest.parquetRoundTrip(s, d)),
    "src_ingest_limit" -> ((s, d) => Ingest.ingestLimit(s, d)),
    "src_ingest_limit_file" -> ((s, d) => Ingest.ingestLimitFileOrder(s, d)),
    "src_repartition" -> ((s, d) => Ingest.repartitionBalance(s, d)),
    "src_json_roundtrip" -> (Ingest.jsonRoundTrip _),
    "src_orc_roundtrip" -> (Ingest.orcRoundTrip _),
    "src_partitioned_snapshot" -> ((s, d) => Ingest.partitionedSnapshot(s, d)),
    "src_zorder_snapshot" -> ((s, d) => Ingest.zorderSnapshot(s, d)),
    // — relational capability surface (SURVEY §2.3/§2.5 gaps, §7 phase 3) —
    "rel_pricing_summary" -> (Relational.pricingSummary _),
    "rel_join_revenue_segment" -> (Relational.joinRevenueBySegment _),
    "rel_join_broadcast_nation" -> (Relational.joinBroadcastNation _),
    "rel_join_left_outer_hist" -> (Relational.joinLeftOuterHistogram _),
    "rel_join_semi" -> (Relational.joinSemi _),
    "rel_join_anti" -> (Relational.joinAnti _),
    "rel_join_full_outer" -> (Relational.joinFullOuter _),
    "rel_window_top_per_segment" -> (Relational.windowTopPerSegment _),
    "rel_topk_per_key_native" -> ((s, d) => Relational.topKPerKeyNative(s, d)),
    "rel_window_lag_prev_order" -> (Relational.windowLagPrevOrder _),
    "rel_window_running_sum" -> (Relational.windowRunningSum _),
    "rel_window_range_trailing" -> (Relational.windowRangeTrailing _),
    "rel_agg_rollup" -> (Relational.aggRollup _),
    "rel_agg_cube" -> (Relational.aggCube _),
    "rel_agg_grouping_sets" -> (Relational.aggGroupingSets _),
    "rel_set_intersect" -> (Relational.setIntersect _),
    "rel_set_except" -> (Relational.setExcept _),
    "rel_union_branches" -> (Relational.unionBranches _),
    "rel_topk_orders" -> ((s, d) => Relational.topKOrders(s, d)),
    "rel_distinct_pairs" -> (Relational.distinctPairs _),
    "rel_string_functions" -> (Relational.stringFunctions _),
    "rel_math_functions" -> (Relational.mathFunctions _),
    "rel_date_trunc_monthly" -> (Relational.dateTruncMonthly _),
    "rel_json_extract_events" -> (Relational.jsonExtractEvents _),
    "rel_events_tumbling_hourly" -> (Relational.eventsTumblingHourly _),
    "rel_quantiles" -> (Relational.quantiles _),
    "rel_salted_agg" -> ((s, d) => Relational.saltedAggregate(s, d)),
    "rel_salted_join" -> ((s, d) => Relational.saltedJoin(s, d)),
    "rel_asof_join" -> (Relational.asofJoin _),
    "rel_events_gapfill" -> ((s, d) => TimeSeries.gapFillDaily(s, d)),
    "rel_range_join_weekly" -> (TimeSeries.rangeJoinWeekly _),
    "rel_quantile_bound" -> (Relational.approxQuantileBound _),
    "rel_merge_upsert" -> (Relational.mergeUpsert _),
    "rel_pagerank_actors" -> ((s, d) => Graph.pagerankActors(s, d)),
    "rel_pivot" -> (Relational.pivotReturnFlag _),
    "rel_sql_subqueries" -> (Relational.sqlSubqueries _),
    "rel_unpivot" -> (Relational.unpivotNationStats _),
    "rel_array_functions" -> (Relational.arrayFunctions _),
    "llm_knn_ivf" -> ((s, d) => Similarity.knnIvf(s, d)),
    "llm_hash_sample" -> ((s, d) => Relational.hashSample(s, d)),
    "rel_events_sliding" -> (graft.streaming.EventStreams.eventsSliding _),
    "rel_events_session" -> (graft.streaming.EventStreams.eventsSession _),
    "rel_events_attribution" -> (graft.streaming.EventStreams.eventsAttribution _),
    // — LLM-pipeline: text analysis over documents (round-2 north star) —
    "llm_text_stats" -> (TextAnalytics.textStats _),
    "llm_top_terms" -> ((s, d) => TextAnalytics.topTerms(s, d)),
    "llm_lang_id" -> (TextAnalytics.langId _),
    "llm_pii_redact" -> (TextAnalytics.piiRedact _),
    "llm_quality_score" -> (TextAnalytics.qualityScore _),
    "llm_token_count" -> (TextAnalytics.tokenCount _),
    "llm_fingerprint" -> (TextAnalytics.fingerprint _),
    "llm_winnow_fingerprint" -> ((s, d) => TextAnalytics.winnowFingerprint(s, d)),
    "llm_heavy_hitters_bound" -> ((s, d) => TextAnalytics.heavyHittersBound(s, d)),
    // HLL sketch is engine-specific → no SQL oracle, rows-only check
    "llm_approx_distinct" -> ((s, d) => TextAnalytics.approxDistinct(s, d)),
    // driver-witnessed HLL error bound: oracle = exact counts + TRUE
    "llm_approx_distinct_bound" -> ((s, d) => TextAnalytics.approxDistinctBound(s, d)),
    // — LLM-pipeline: deduplication over documents —
    "llm_dedup_exact" -> (Dedup.dedupExact _),
    "llm_dedup_minhash" -> ((s, d) => Dedup.minHashNearDups(s, d)),
    "llm_dedup_simhash" -> ((s, d) => Dedup.simHashNearDups(s, d)),
    "llm_dedup_ngram" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "llm_dedup_cluster" -> (Dedup.nearDupClusters _),
    "llm_dedup_incremental" -> ((s, d) => Dedup.incrementalNearDups(s, d)),
    "llm_data_quality" -> (TextAnalytics.dataQuality _),
    "llm_repetition" -> ((s, d) => TextAnalytics.repetitionSignals(s, d)),
    "llm_unigram_logprob" -> (TextAnalytics.unigramLogprob _),
    "llm_source_cap" -> ((s, d) => TextAnalytics.sourceCap(s, d)),
    "llm_decontaminate" -> ((s, d) => TextAnalytics.decontaminate(s, d)),
    // bloom-prefiltered variant: same result (exact confirm join),
    // bitset-broadcast scale shape; shares the exact oracle
    "llm_decontaminate_bloom" -> ((s, d) => TextAnalytics.decontaminateBloom(s, d)),
    "llm_bpe_pairs" -> ((s, d) => TextAnalytics.bpePairStats(s, d)),
    "llm_tfidf" -> ((s, d) => TextAnalytics.tfidf(s, d)),
    "llm_stratified_sample" -> ((s, d) => TextAnalytics.stratifiedSample(s, d)),
    "llm_dedup_apply" -> ((s, d) => Dedup.dedupApply(s, d)),
    // — LLM-pipeline: similarity search over embeddings —
    "llm_knn_exact" -> ((s, d) => Similarity.knnExact(s, d)),
    "llm_knn_lsh" -> ((s, d) => Similarity.knnLsh(s, d)),
    "llm_embed_neardup" -> ((s, d) => Similarity.embedNearDups(s, d)),
    // — LLM-pipeline: clustering (trained k-means + consumers) —
    "llm_kmeans" -> (Clustering.kmeans _),
    "llm_knn_ivf_kmeans" -> ((s, d) => Similarity.knnIvfKmeans(s, d)),
    "llm_semdedup" -> ((s, d) => Clustering.semDedup(s, d)),
    // capacity-knob witness: same operator with k scaled to 64 cells
    // (the "k grows with the corpus" posture, driver-checked)
    "llm_semdedup_k64" -> ((s, d) => Clustering.semDedup(s, d, k = 64)),
    // — LLM-pipeline: multimodal binary columns —
    "llm_multimodal_meta" -> (Multimodal.assetMeta _),
    // binary codec pipeline isn't SQL-expressible → no SQL oracle,
    // rows-only check; decoded values are pinned exactly by spec
    "llm_multimodal_decode" -> (Multimodal.decodeStats _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ref_title_levels" -> ReferenceQueries.titleLevelsSql("order-1"),
    "ref_title_missing" -> ReferenceQueries.titleLevelsSql("order-no-such"),
    "ref_actor_coactors" -> ReferenceQueries.actorCoactorsSql("7"),
    "ref_level_histogram" -> ReferenceQueries.levelHistogramSql("order-1"),
    "ref_title_levels_bucketed" -> ReferenceQueries.titleLevelsSql("order-1"),
    "ref_title_dup_probe" -> ReferenceQueries.titleDupProbeSql,
    "src_csv_roundtrip" -> Ingest.csvRoundTripSql,
    "src_parquet_roundtrip" -> Ingest.parquetRoundTripSql,
    "src_ingest_limit" -> Ingest.ingestLimitSql(),
    "src_ingest_limit_file" -> Ingest.ingestLimitFileOrderSql(),
    "src_repartition" -> Ingest.repartitionBalanceSql,
    "src_json_roundtrip" -> Ingest.jsonRoundTripSql,
    "src_orc_roundtrip" -> Ingest.orcRoundTripSql,
    "src_partitioned_snapshot" -> Ingest.partitionedSnapshotSql(),
    "src_zorder_snapshot" -> Ingest.zorderSnapshotSql(),
    "rel_pricing_summary" -> Relational.pricingSummarySql,
    "rel_join_revenue_segment" -> Relational.joinRevenueBySegmentSql,
    "rel_join_broadcast_nation" -> Relational.joinBroadcastNationSql,
    "rel_join_left_outer_hist" -> Relational.joinLeftOuterHistogramSql,
    "rel_join_semi" -> Relational.joinSemiSql,
    "rel_join_anti" -> Relational.joinAntiSql,
    "rel_join_full_outer" -> Relational.joinFullOuterSql,
    "rel_window_top_per_segment" -> Relational.windowTopPerSegmentSql,
    "rel_topk_per_key_native" -> Relational.windowTopPerSegmentSql,
    "rel_window_lag_prev_order" -> Relational.windowLagPrevOrderSql,
    "rel_window_running_sum" -> Relational.windowRunningSumSql,
    "rel_window_range_trailing" -> Relational.windowRangeTrailingSql,
    "rel_agg_rollup" -> Relational.aggRollupSql,
    "rel_agg_cube" -> Relational.aggCubeSql,
    "rel_agg_grouping_sets" -> Relational.aggGroupingSetsSql,
    "rel_set_intersect" -> Relational.setIntersectSql,
    "rel_set_except" -> Relational.setExceptSql,
    "rel_union_branches" -> Relational.unionBranchesSql,
    "rel_topk_orders" -> Relational.topKOrdersSql(),
    "rel_distinct_pairs" -> Relational.distinctPairsSql,
    "rel_string_functions" -> Relational.stringFunctionsSql,
    "rel_math_functions" -> Relational.mathFunctionsSql,
    "rel_date_trunc_monthly" -> Relational.dateTruncMonthlySql,
    "rel_json_extract_events" -> Relational.jsonExtractEventsSql,
    "rel_events_tumbling_hourly" -> Relational.eventsTumblingHourlySql,
    "rel_quantiles" -> Relational.quantilesSql,
    "rel_salted_agg" -> Relational.saltedAggregateSql(),
    "rel_salted_join" -> Relational.saltedJoinSql,
    "rel_asof_join" -> Relational.asofJoinSql,
    "rel_events_gapfill" -> TimeSeries.gapFillDailySql,
    "rel_range_join_weekly" -> TimeSeries.rangeJoinWeeklySql,
    "rel_quantile_bound" -> Relational.approxQuantileBoundSql,
    "rel_merge_upsert" -> Relational.mergeUpsertSql,
    "rel_pagerank_actors" -> Graph.pagerankActorsSql(),
    "rel_pivot" -> Relational.pivotReturnFlagSql,
    "rel_sql_subqueries" -> Relational.sqlSubqueriesSql,
    "rel_unpivot" -> Relational.unpivotNationStatsSql,
    "rel_array_functions" -> Relational.arrayFunctionsSql,
    "llm_knn_ivf" -> Similarity.knnIvfSql(),
    "llm_hash_sample" -> Relational.hashSampleSql(),
    "rel_events_sliding" -> graft.streaming.EventStreams.eventsSlidingSql,
    "rel_events_session" -> graft.streaming.EventStreams.eventsSessionSql,
    "rel_events_attribution" -> graft.streaming.EventStreams.eventsAttributionSql,
    "llm_text_stats" -> TextAnalytics.textStatsSql,
    "llm_top_terms" -> TextAnalytics.topTermsSql(),
    "llm_lang_id" -> TextAnalytics.langIdSql,
    "llm_pii_redact" -> TextAnalytics.piiRedactSql,
    "llm_quality_score" -> TextAnalytics.qualityScoreSql,
    "llm_token_count" -> TextAnalytics.tokenCountSql,
    "llm_fingerprint" -> TextAnalytics.fingerprintSql,
    "llm_winnow_fingerprint" -> TextAnalytics.winnowFingerprintSql(),
    "llm_heavy_hitters_bound" -> TextAnalytics.heavyHittersBoundSql(),
    "llm_dedup_exact" -> Dedup.dedupExactSql,
    "llm_dedup_minhash" -> Dedup.minHashNearDupsSql(),
    "llm_dedup_simhash" -> Dedup.simHashNearDupsSql(),
    "llm_dedup_ngram" -> Dedup.ngramJaccardPairsSql(),
    "llm_dedup_cluster" -> Dedup.nearDupClustersSql(),
    "llm_dedup_incremental" -> Dedup.incrementalNearDupsSql(),
    "llm_data_quality" -> TextAnalytics.dataQualitySql,
    "llm_repetition" -> TextAnalytics.repetitionSignalsSql(),
    "llm_unigram_logprob" -> TextAnalytics.unigramLogprobSql,
    "llm_source_cap" -> TextAnalytics.sourceCapSql(),
    "llm_decontaminate" -> TextAnalytics.decontaminateSql(),
    "llm_decontaminate_bloom" -> TextAnalytics.decontaminateSql(),
    "llm_bpe_pairs" -> TextAnalytics.bpePairStatsSql(),
    "llm_approx_distinct_bound" -> TextAnalytics.approxDistinctBoundSql(),
    "llm_tfidf" -> TextAnalytics.tfidfSql(),
    "llm_stratified_sample" -> TextAnalytics.stratifiedSampleSql(),
    "llm_dedup_apply" -> Dedup.dedupApplySql(),
    "llm_knn_exact" -> Similarity.knnExactSql(),
    "llm_knn_lsh" -> Similarity.knnLshSql(),
    "llm_embed_neardup" -> Similarity.embedNearDupsSql(),
    "llm_kmeans" -> Clustering.kmeansSql(),
    "llm_knn_ivf_kmeans" -> Similarity.knnIvfKmeansSql(),
    "llm_semdedup" -> Clustering.semDedupSql(),
    "llm_semdedup_k64" -> Clustering.semDedupSql(k = 64),
    "llm_multimodal_meta" -> Multimodal.assetMetaSql,
  )
}
