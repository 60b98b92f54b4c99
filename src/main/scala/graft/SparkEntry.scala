package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Tables => T}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * Each `queries` key is one operator from the SURVEY.md §2 inventory;
  * `oracleSql` holds the DuckDB-equivalent SQL over the same parquet
  * tables (omitted only for non-SQL-expressible ops → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full silver transform — the reference's core
    * capability: stats, keep-first dedup, imputation, clamping. */
  def entry(spark: SparkSession): DataFrame =
    etl.EtlQueries.silverPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bronze_ingest" -> (etl.EtlQueries.bronzeIngest _),
    "dq_report" -> (etl.EtlQueries.dqReport _),
    "medians_modes" -> (etl.EtlQueries.mediansModes _),
    "silver_dedup" -> (etl.EtlQueries.silverDedup _),
    "silver_pipeline" -> (etl.EtlQueries.silverPipeline _),
    "incremental_upsert" -> (etl.EtlQueries.incrementalUpsert _),
    "load_report" -> (etl.EtlQueries.loadReport _),
    "q1_agg" -> (analytics.Queries.q1Agg _),
    "q3_join" -> (analytics.Queries.q3Join _),
    "top_k" -> (analytics.Queries.topK _),
    "distinct_count" -> (analytics.Queries.distinctCount _),
    "conditional_pivot" -> (analytics.Queries.conditionalPivot _),
    "time_series" -> (analytics.Queries.timeSeries _),
    "window_running" -> (analytics.Queries.windowRunning _),
    "percentiles" -> (analytics.Queries.percentiles _),
    "corr_stats" -> (analytics.Queries.corrStats _),
    "histogram" -> (analytics.Queries.histogram _),
    "semi_anti_join" -> (analytics.Queries.semiAntiJoin _),
    "set_ops" -> (analytics.Queries.setOps _),
    "rollup_agg" -> (analytics.Queries.rollupAgg _),
    "text_tokens" -> (text.TextQueries.textTokens _),
    "text_quality" -> (text.TextQueries.textQuality _),
    "text_langid" -> (text.TextQueries.textLangid _),
    "text_fingerprint" -> (text.TextQueries.textFingerprint _),
    "dedup_exact" -> ((s, d) => dedup.Dedup.exactDedup(T.documents(s, d))),
    "dedup_minhash" -> ((s, d) => dedup.Dedup.minhashPairs(T.documents(s, d))),
    "dedup_simhash" -> ((s, d) => dedup.Dedup.simhashPairs(T.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => dedup.Dedup.ngramJaccardPairs(T.documents(s, d))),
    "dedup_embed_cosine" -> ((s, d) => ann.Ann.embedCosinePairs(T.embeddings(s, d))),
    "ann_topk" -> ((s, d) => ann.Ann.bruteForceTopK(T.embeddings(s, d))),
    "ann_lsh" -> ((s, d) => ann.Ann.lshTopK(T.embeddings(s, d))),
    "ann_ivf" -> ((s, d) => ann.Ivf.ivfTopK(T.embeddings(s, d))),
    "mm_features" -> (multimodal.Multimodal.mmFeatures _),
    "mm_frames" -> (multimodal.Multimodal.mmFrames _),
    "events_window_agg" -> (streaming.Streaming.eventsWindowAgg _),
    "sessionize" -> (streaming.Streaming.sessionize _),
    "sample_stratified" -> (pipeline.Pipeline.sampleStratified _),
    "pack_sequences" -> (pipeline.Pipeline.packSequences _),
    "dedup_clusters" -> ((s, d) => pipeline.Pipeline.dedupClusters(s, d)),
    "dedup_clusters_star" -> ((s, d) => pipeline.Pipeline.dedupClustersStar(s, d)),
    "asof_join" -> (analytics.Queries.asofJoin _),
    "asof_join_native" -> (analytics.Queries.asofJoinNative _),
    "q5_join" -> (analytics.Queries.q5Join _),
    "above_customer_avg" -> (analytics.Queries.aboveCustomerAvg _),
    "scalar_funcs" -> (analytics.Queries.scalarFuncs _),
    "kmv_distinct" -> (analytics.Queries.kmvDistinct _),
    "json_extract" -> (analytics.Queries.jsonExtract _),
    "word_count" -> (analytics.Queries.wordCount _),
    "outer_join_nulls" -> (analytics.Queries.outerJoinNulls _),
    "grouping_sets" -> (analytics.Queries.groupingSets _),
    "sliding_window" -> (analytics.Queries.slidingWindow _),
    "corpus_filter" -> (pipeline.Pipeline.corpusFilter _),
    "dedup_crossmodal" -> (pipeline.Pipeline.dedupCrossmodal _),
    "ntile_bins" -> (analytics.Queries.ntileBins _),
    "ts_delta" -> (analytics.Queries.tsDelta _),
    "collect_sorted" -> (analytics.Queries.collectSorted _),
    "regression" -> (analytics.Queries.regression _),
    "repetition_score" -> (text.TextQueries.repetitionScore _),
    "pii_scrub" -> (text.TextQueries.piiScrub _),
    "decontaminate" -> ((s, d) => pipeline.Contamination.decontaminate(T.documents(s, d))),
    "corpus_mix" -> (pipeline.Pipeline.corpusMix _)
  )

  /** DuckDB oracle SQL, same column aliases as the Spark queries. */
  def oracleSql: Map[String, String] = Map(
    "bronze_ingest" -> etl.EtlQueries.bronzeIngestSql,
    "dq_report" -> etl.EtlQueries.dqReportSql,
    "medians_modes" -> etl.EtlQueries.mediansModesSql,
    "silver_dedup" -> etl.EtlQueries.silverDedupSql,
    "silver_pipeline" -> etl.EtlQueries.silverPipelineSql,
    "incremental_upsert" -> etl.EtlQueries.incrementalUpsertSql,
    "load_report" -> etl.EtlQueries.loadReportSql,
    "q1_agg" -> analytics.Queries.q1AggSql,
    "q3_join" -> analytics.Queries.q3JoinSql,
    "top_k" -> analytics.Queries.topKSql,
    "distinct_count" -> analytics.Queries.distinctCountSql,
    "conditional_pivot" -> analytics.Queries.conditionalPivotSql,
    "time_series" -> analytics.Queries.timeSeriesSql,
    "window_running" -> analytics.Queries.windowRunningSql,
    "percentiles" -> analytics.Queries.percentilesSql,
    "corr_stats" -> analytics.Queries.corrStatsSql,
    "histogram" -> analytics.Queries.histogramSql,
    "semi_anti_join" -> analytics.Queries.semiAntiJoinSql,
    "set_ops" -> analytics.Queries.setOpsSql,
    "rollup_agg" -> analytics.Queries.rollupAggSql,
    "text_tokens" -> text.TextQueries.textTokensSql,
    "text_quality" -> text.TextQueries.textQualitySql,
    "text_langid" -> text.TextQueries.textLangidSql,
    "text_fingerprint" -> text.TextQueries.textFingerprintSql,
    "dedup_exact" -> dedup.Dedup.exactDedupSql,
    "dedup_minhash" -> dedup.Dedup.minhashPairsSql(),
    "dedup_simhash" -> dedup.Dedup.simhashPairsSql(),
    "dedup_ngram_jaccard" -> dedup.Dedup.ngramJaccardPairsSql(),
    "dedup_embed_cosine" -> ann.Ann.embedCosinePairsSql(),
    "ann_topk" -> ann.Ann.bruteForceTopKSql(),
    "ann_lsh" -> ann.Ann.lshTopKSql(),
    "ann_ivf" -> ann.Ivf.ivfTopKSql(),
    "mm_features" -> multimodal.Multimodal.mmFeaturesSql,
    "mm_frames" -> multimodal.Multimodal.mmFramesSql,
    "events_window_agg" -> streaming.Streaming.eventsWindowAggSql,
    "sessionize" -> streaming.Streaming.sessionizeSql,
    "sample_stratified" -> pipeline.Pipeline.sampleStratifiedSql,
    "pack_sequences" -> pipeline.Pipeline.packSequencesSql,
    "dedup_clusters" -> pipeline.Pipeline.dedupClustersSql,
    "dedup_clusters_star" -> pipeline.Pipeline.dedupClustersSql,
    "asof_join" -> analytics.Queries.asofJoinSql,
    "asof_join_native" -> analytics.Queries.asofJoinSql,
    "q5_join" -> analytics.Queries.q5JoinSql,
    "above_customer_avg" -> analytics.Queries.aboveCustomerAvgSql,
    "scalar_funcs" -> analytics.Queries.scalarFuncsSql,
    "kmv_distinct" -> analytics.Queries.kmvDistinctSql,
    "json_extract" -> analytics.Queries.jsonExtractSql,
    "word_count" -> analytics.Queries.wordCountSql,
    "outer_join_nulls" -> analytics.Queries.outerJoinNullsSql,
    "grouping_sets" -> analytics.Queries.groupingSetsSql,
    "sliding_window" -> analytics.Queries.slidingWindowSql,
    "corpus_filter" -> pipeline.Pipeline.corpusFilterSql,
    "dedup_crossmodal" -> pipeline.Pipeline.dedupCrossmodalSql,
    "ntile_bins" -> analytics.Queries.ntileBinsSql,
    "ts_delta" -> analytics.Queries.tsDeltaSql,
    "collect_sorted" -> analytics.Queries.collectSortedSql,
    "regression" -> analytics.Queries.regressionSql,
    "repetition_score" -> text.TextQueries.repetitionScoreSql,
    "pii_scrub" -> text.TextQueries.piiScrubSql,
    "decontaminate" -> pipeline.Contamination.decontaminateSql,
    "corpus_mix" -> pipeline.Pipeline.corpusMixSql
  )
}
