package graft

import graft.queries.{CoreQueries, ExtQueries, OpsQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a named entry in
  * [[queries]]; SQL-expressible ones carry a DuckDB oracle in
  * [[oracleSql]] (column names aliased identically on both sides — the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (J1, the reference's gold join shape) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.j1CustomersOrdersJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_select_star"          -> (CoreQueries.p1SelectStar _),
    "p2_projection_alias"     -> (CoreQueries.p2ProjectionAlias _),
    "p4_nonempty_guard"       -> (CoreQueries.p4NonEmptyGuard _),
    "p_filter_pushdown"       -> (CoreQueries.pFilterPushdown _),
    "p5_sql_transformer"      -> (CoreQueries.p5SqlTransformer _),
    "j1_customers_orders_join" -> (CoreQueries.j1CustomersOrdersJoin _),
    "j_left_join_agg"         -> (CoreQueries.jLeftJoinAgg _),
    "j_semi_join"             -> (CoreQueries.jSemiJoin _),
    "j_anti_join"             -> (CoreQueries.jAntiJoin _),
    "j_full_outer"            -> (CoreQueries.jFullOuterJoin _),
    "w_running_total"         -> (CoreQueries.wRunningTotal _),
    "a1_distinct_sort_limit"  -> (CoreQueries.a1DistinctSortLimit _),
    "a2_count"                -> (CoreQueries.a2Count _),
    "a3_minmax"               -> (CoreQueries.a3Max _),
    "q1_agg"                  -> (CoreQueries.q1Agg _),
    "a_rollup"                -> (CoreQueries.aRollup _),
    "a_collect_agg"           -> (CoreQueries.aCollectAgg _),
    "a_pivot"                 -> (CoreQueries.aPivot _),
    "o_topk_revenue"          -> (CoreQueries.oTopkRevenue _),
    "q5_multijoin"            -> (CoreQueries.q5MultiJoin _),
    "w_window_rank"           -> (CoreQueries.wWindowRank _),
    "set_intersect"           -> (CoreQueries.setIntersect _),
    "set_except"              -> (CoreQueries.setExcept _),
    "set_union"               -> (CoreQueries.setUnion _),
    "f2_datetime"             -> (CoreQueries.f2Datetime _),
    "f6_json"                 -> (CoreQueries.f6Json _),
    "s2_incremental_read"     -> (CoreQueries.s2IncrementalRead _),
    "s3_upsert_merge"         -> (CoreQueries.s3UpsertMerge _),
    "dedup_exact"             -> (ExtQueries.dedupExact _),
    "dedup_ngram_jaccard"     -> (ExtQueries.dedupNgramJaccard _),
    "dedup_containment"       -> (ExtQueries.dedupContainment _),
    "dedup_prefix_jaccard"    -> (ExtQueries.dedupPrefixJaccard _),
    "dedup_edit_pairs"        -> (ExtQueries.dedupEditPairs _),
    "dedup_clusters"          -> (ExtQueries.dedupClusters _),
    "dedup_keep_best"         -> (ExtQueries.dedupKeepBest _),
    "curation_pipeline"       -> (ExtQueries.curationPipeline _),
    "curation_full"           -> (ExtQueries.curationFull _),
    "dedup_minhash_lsh"       -> (ExtQueries.dedupMinhashLsh _),
    "dedup_minhash_pairs"     -> (ExtQueries.dedupMinhashPairs _),
    "dedup_minhash_incr"      -> (ExtQueries.dedupMinhashIncremental _),
    "dedup_simhash"           -> (ExtQueries.dedupSimhash _),
    "dedup_simhash_pairs"     -> (ExtQueries.dedupSimhashPairs _),
    "sim_cosine_topk"         -> (ExtQueries.simCosineTopk _),
    "sim_hard_negatives"      -> (ExtQueries.simHardNegatives _),
    "sim_lsh_topk"            -> (ExtQueries.simLshTopk _),
    "sim_lsh_topk_raw"        -> (ExtQueries.simLshTopkRaw _),
    "sim_ivf_topk"            -> (ExtQueries.simIvfTopk _),
    "sim_ivf_topk_raw"        -> (ExtQueries.simIvfTopkRaw _),
    "sim_q8_topk"             -> (ExtQueries.simQ8Topk _),
    "sim_q8_topk_raw"         -> (ExtQueries.simQ8TopkRaw _),
    "sim_ivf_q8_topk"         -> (ExtQueries.simIvfQ8Topk _),
    "sim_pq_topk"             -> (ExtQueries.simPqTopk _),
    "sim_pq_topk_raw"         -> (ExtQueries.simPqTopkRaw _),
    "sim_ivf_pq_topk"         -> (ExtQueries.simIvfPqTopk _),
    "sim_vector_dim_stats"    -> (ExtQueries.simVectorDimStats _),
    "sim_rproj"               -> (ExtQueries.simRproj _),
    "sim_rproj_topk"          -> (ExtQueries.simRprojTopk _),
    "sim_cluster_balanced"    -> (ExtQueries.simClusterBalanced _),
    "sim_pca"                 -> (ExtQueries.simPca _),
    "sim_cosine_neardup"      -> (ExtQueries.simCosineNeardup _),
    "sim_neardup_pairs"       -> (ExtQueries.simNeardupPairs _),
    "sample_stratified"       -> (ExtQueries.sampleStratified _),
    "sample_split"            -> (ExtQueries.sampleSplit _),
    "sample_quota"            -> (ExtQueries.sampleQuota _),
    "sample_rates"            -> (ExtQueries.sampleRates _),
    "sample_temperature"      -> (ExtQueries.sampleTemperature _),
    "sample_epochs"           -> (ExtQueries.sampleEpochs _),
    "sim_semdedup"            -> (ExtQueries.simSemdedup _),
    "sim_ivf_append"          -> (ExtQueries.simIvfAppend _),
    "sim_knn_graph"           -> (ExtQueries.simKnnGraph _),
    "graph_pagerank"          -> (ExtQueries.graphPagerank _),
    "pack_sequences"          -> (ExtQueries.packSequences _),
    "pack_length_batches"     -> (ExtQueries.packLengthBatches _),
    "text_bpe"                -> (ExtQueries.textBpe _),
    "pack_chunks"             -> (ExtQueries.packChunks _),
    "pack_shards"             -> (ExtQueries.packShards _),
    "mixture_pipeline"        -> (ExtQueries.mixturePipeline _),
    "domains_profile"         -> (ExtQueries.domainsProfile _),
    "domains_filter"          -> (ExtQueries.domainsFilter _),
    "domains_bands"           -> (ExtQueries.domainsBands _),
    "dedup_spans"             -> (ExtQueries.dedupSpans _),
    "dedup_strip_spans"       -> (ExtQueries.dedupStripSpans _),
    "text_classifier"         -> (ExtQueries.textClassifier _),
    "sample_shuffle"          -> (ExtQueries.sampleShuffle _),
    "sample_exact_n"          -> (ExtQueries.sampleExactN _),
    "sample_leakage_safe"     -> (ExtQueries.sampleLeakageSafe _),
    "sample_weighted"         -> (ExtQueries.sampleWeighted _),
    "dedup_lines"             -> (ExtQueries.dedupLines _),
    "dedup_strip_lines"       -> (ExtQueries.dedupStripLines _),
    "dq_expectations"         -> (ExtQueries.dqExpectations _),
    "dq_profile"              -> (ExtQueries.dqProfile _),
    "dq_outliers"             -> (ExtQueries.dqOutliers _),
    "text_stats"              -> (ExtQueries.textStats _),
    "text_quality"            -> (ExtQueries.textQuality _),
    "text_token_counts"       -> (ExtQueries.textTokenCounts _),
    "text_winnow"             -> (ExtQueries.textWinnow _),
    "text_c4_clean"           -> (ExtQueries.textC4Clean _),
    "text_lm_backoff"         -> (ExtQueries.textLmBackoff _),
    "dedup_winnow_pairs"      -> (ExtQueries.dedupWinnowPairs _),
    "text_fingerprint"        -> (ExtQueries.textFingerprint _),
    "text_fingerprint_raw"    -> (ExtQueries.textFingerprintRaw _),
    "text_langid"             -> (ExtQueries.textLangid _),
    "text_lm_score"           -> (ExtQueries.textLmScore _),
    "quality_mixture"         -> (ExtQueries.qualityMixture _),
    "text_tfidf"              -> (ExtQueries.textTfidf _),
    "text_vocab"              -> (ExtQueries.textVocab _),
    "text_repetition"         -> (ExtQueries.textRepetition _),
    "pii_redact"              -> (ExtQueries.piiRedact _),
    "decontam_overlap"        -> (ExtQueries.decontamOverlap _),
    "multimodal_stats"        -> (ExtQueries.multimodalStats _),
    "multimodal_features"     -> (ExtQueries.multimodalFeatures _),
    "multimodal_features_raw" -> (ExtQueries.multimodalFeaturesRaw _),
    "multimodal_frames"       -> (ExtQueries.multimodalFrames _),
    "multimodal_resize"       -> (ExtQueries.multimodalResize _),
    "multimodal_bmp_stats"    -> (ExtQueries.multimodalBmpStats _),
    "multimodal_bmp_resize"   -> (ExtQueries.multimodalBmpResize _),
    "multimodal_wav_stats"    -> (ExtQueries.multimodalWavStats _),
    "events_tumbling"         -> (ExtQueries.eventsTumbling _),
    "events_sliding"          -> (ExtQueries.eventsSliding _),
    "events_sessions"         -> (ExtQueries.eventsSessions _),
    "events_funnel"           -> (ExtQueries.eventsFunnel _),
    "events_rolling"          -> (ExtQueries.eventsRolling _),
    "events_transitions"      -> (ExtQueries.eventsTransitions _),
    "stream_rolling_replay"   -> (ExtQueries.streamRollingReplay _),
    "stream_rolling_composite_replay" -> (ExtQueries.streamRollingCompositeReplay _),
    "stream_transitions_replay" -> (ExtQueries.streamTransitionsReplay _),
    "stream_gapfill_replay"   -> (ExtQueries.streamGapfillReplay _),
    "stream_funnel_replay"    -> (ExtQueries.streamFunnelReplay _),
    "stream_retention_replay" -> (ExtQueries.streamRetentionReplay _),
    "stream_asof_replay"      -> (ExtQueries.streamAsofReplay _),
    "stream_asof_tolerance_replay" -> (ExtQueries.streamAsofToleranceReplay _),
    "stream_asof_composite_replay" -> (ExtQueries.streamAsofCompositeReplay _),
    "stream_transitions_composite_replay" -> (ExtQueries.streamTransitionsCompositeReplay _),
    "stream_funnel_composite_replay" -> (ExtQueries.streamFunnelCompositeReplay _),
    "stream_retention_composite_replay" -> (ExtQueries.streamRetentionCompositeReplay _),
    "stream_gapfill_composite_replay" -> (ExtQueries.streamGapfillCompositeReplay _),
    "stream_feature_store_replay" -> (ExtQueries.streamFeatureStoreReplay _),
    "stream_dedup_replay"     -> (ExtQueries.streamDedupReplay _),
    "stream_sessions_replay"  -> (ExtQueries.streamSessionsReplay _),
    "stream_tumbling_replay"  -> (ExtQueries.streamTumblingReplay _),
    "stream_sliding_replay"   -> (ExtQueries.streamSlidingReplay _),
    "events_gapfill"          -> (ExtQueries.eventsGapfill _),
    "text_bm25"               -> (ExtQueries.textBm25 _),
    "text_retrieval_eval"     -> (ExtQueries.textRetrievalEval _),
    "labels_vote"             -> (ExtQueries.labelsVote _),
    "labels_kappa"            -> (ExtQueries.labelsKappa _),
    "sim_mmr_rerank"          -> (ExtQueries.simMmrRerank _),
    "eval_auc"                -> (ExtQueries.evalAuc _),
    "eval_auc_by"             -> (ExtQueries.evalAucBy _),
    "eval_auc_bootstrap"      -> (ExtQueries.evalAucBootstrap _),
    "eval_avg_precision"      -> (ExtQueries.evalAvgPrecision _),
    "eval_ap_by"              -> (ExtQueries.evalApBy _),
    "eval_roc_curve_by"       -> (ExtQueries.evalRocCurveBy _),
    "eval_confusion"          -> (ExtQueries.evalConfusion _),
    "eval_calibration"        -> (ExtQueries.evalCalibration _),
    "eval_ece"                -> (ExtQueries.evalEce _),
    "eval_calibration_by"     -> (ExtQueries.evalCalibrationBy _),
    "eval_ece_by"             -> (ExtQueries.evalEceBy _),
    "eval_isotonic"           -> (ExtQueries.evalIsotonic _),
    "eval_calibrated"         -> (ExtQueries.evalCalibrated _),
    "eval_calibrated_by"      -> (ExtQueries.evalCalibratedBy _),
    "eval_roc_curve"          -> (ExtQueries.evalRocCurve _),
    "eval_confusion_by"       -> (ExtQueries.evalConfusionBy _),
    "dq_group_quantiles"      -> (ExtQueries.dqGroupQuantiles _),
    "dq_outliers_approx"      -> (ExtQueries.dqOutliersApprox _),
    "dq_group_quantiles_approx" -> (ExtQueries.dqGroupQuantilesApprox _),
    "sample_kfold"            -> (ExtQueries.sampleKfold _),
    "events_retention"        -> (ExtQueries.eventsRetention _),
    "s1_snapshot_roundtrip"   -> (OpsQueries.s1SnapshotRoundtrip _),
    "o5_clustered_write"      -> (OpsQueries.o5ClusteredWrite _),
    "o6_stats_pruned_read"    -> (OpsQueries.o6StatsPrunedRead _),
    "o7_zorder_pruned_read"   -> (OpsQueries.o7ZorderPrunedRead _),
    "o11_hilbert_pruned_read" -> (OpsQueries.o11HilbertPrunedRead _),
    "o8_bucketed_join"        -> (OpsQueries.o8BucketedJoin _),
    "i1_pipeline_roundtrip"   -> (OpsQueries.i1PipelineRoundtrip _),
    "f3_generators"           -> (OpsQueries.f3Generators _),
    "f5_regex_search"         -> (OpsQueries.f5RegexSearch _),
    "j_asof_join"             -> (OpsQueries.jAsofJoin _),
    "j_asof_tolerance"        -> (OpsQueries.jAsofTolerance _),
    "j_salted_join"           -> (OpsQueries.jSaltedJoin _),
    "j_range_join"            -> (OpsQueries.jRangeJoin _),
    "a_salted_agg"            -> (OpsQueries.aSaltedAgg _),
    "s4_inmemory_source"      -> (OpsQueries.s4InMemorySource _),
    "s_csv_roundtrip"         -> (OpsQueries.sCsvRoundtrip _),
    "s_json_roundtrip"        -> (OpsQueries.sJsonRoundtrip _),
    "s_orc_roundtrip"         -> (OpsQueries.sOrcRoundtrip _),
    "s_delete_keys"           -> (OpsQueries.sDeleteKeys _),
    "s_delete_where"          -> (OpsQueries.sDeleteWhere _),
    "s_update_where"          -> (OpsQueries.sUpdateWhere _),
    "s_apply_changes"         -> (OpsQueries.sApplyChanges _),
    "s5_generator"            -> (OpsQueries.s5Generator _),
    "s9_mor_snapshot"         -> (OpsQueries.s9MorSnapshot _),
    "s9_mor_pruned_read"      -> (OpsQueries.s9MorPrunedRead _),
    "s10_savepoint_restore"   -> (OpsQueries.s10SavepointRestore _),
    "s_timeline"              -> (OpsQueries.sTimeline _),
    "s_archived_timeline"     -> (OpsQueries.sArchivedTimeline _),
    "s_inline_compact"        -> (OpsQueries.sInlineCompact _),
    "s_storage_audit"         -> (OpsQueries.sStorageAudit _),
    "s_table_diff"            -> (OpsQueries.sTableDiff _),
    "s_stats_view"            -> (OpsQueries.sStatsView _),
    "o9_key_lookup"           -> (OpsQueries.o9KeyLookup _),
    "o10_secondary_lookup"    -> (OpsQueries.o10SecondaryLookup _),
    "j_interval_overlap"      -> (OpsQueries.jIntervalOverlap _),
    "s_insert_overwrite"      -> (OpsQueries.sInsertOverwrite _),
    "s_delete_partition"      -> (OpsQueries.sDeletePartition _),
    "s_cdc_batch"             -> (OpsQueries.sCdcBatch _),
    "s_schema_evolution"      -> (OpsQueries.sSchemaEvolution _),
    "s_schema_rename"         -> (OpsQueries.sSchemaRename _),
    "s_schema_drop"           -> (OpsQueries.sSchemaDrop _),
    "s_time_travel"           -> (OpsQueries.sTimeTravel _),
    "s_soft_delete"           -> (OpsQueries.sSoftDelete _),
    "s_partial_update"        -> (OpsQueries.sPartialUpdate _),
    "s_insert_nodedup"        -> (OpsQueries.sInsertNoDedup _),
    "s_files_view"            -> (OpsQueries.sFilesView _),
    "s_bootstrap"             -> (OpsQueries.sBootstrap _),
    "sql_catalog_read"        -> (OpsQueries.sqlCatalogRead _),
    "sql_insert_write"        -> (OpsQueries.sqlInsertWrite _),
    "sql_merge_write"         -> (OpsQueries.sqlMergeWrite _),
    "sql_update_delete_write" -> (OpsQueries.sqlUpdateDeleteWrite _),
    "sql_alter_write"         -> (OpsQueries.sqlAlterWrite _),
    "a_approx_agg"            -> (OpsQueries.aApproxAgg _),
    "a_approx_agg_raw"        -> (OpsQueries.aApproxAggRaw _),
    "a_heavy_hitters"         -> (OpsQueries.aHeavyHitters _),
    "j_bloom_prune"           -> (OpsQueries.jBloomPrune _),
    "a_countmin"              -> (OpsQueries.aCountMin _),
    "a_kmv_overlap"           -> (OpsQueries.aKmvOverlap _),
    "s_scd2"                  -> (OpsQueries.sScd2 _),
    "dq_drift"                -> (ExtQueries.dqDrift _),
    "text_hybrid_rrf"         -> (ExtQueries.textHybridRrf _),
    "i_incremental_agg"       -> (OpsQueries.iIncrementalAgg _),
    "i_incremental_distinct"  -> (OpsQueries.iIncrementalDistinct _),
    "i_incremental_auc"       -> (OpsQueries.iIncrementalAuc _),
    "i_incremental_auc_by"    -> (OpsQueries.iIncrementalAucBy _),
    "i_incremental_ece"       -> (OpsQueries.iIncrementalEce _),
    "i_incremental_ece_by"    -> (OpsQueries.iIncrementalEceBy _),
    "i_incremental_calibration_by" -> (OpsQueries.iIncrementalCalibrationBy _),
    "i_incremental_isotonic"  -> (OpsQueries.iIncrementalIsotonic _),
    "i_incremental_ap_by"     -> (OpsQueries.iIncrementalApBy _),
    "i_incremental_roc_curve" -> (OpsQueries.iIncrementalRocCurve _),
    "i_incremental_drift"     -> (OpsQueries.iIncrementalDrift _),
    "stream_drift_replay"     -> (OpsQueries.streamDriftReplay _),
    "dq_drift_by"             -> (ExtQueries.dqDriftBy _),
    "i_incremental_drift_by"  -> (OpsQueries.iIncrementalDriftBy _),
    "stream_drift_by_replay"  -> (OpsQueries.streamDriftByReplay _),
    "eval_isotonic_by"        -> (ExtQueries.evalIsotonicBy _),
    "stream_monitoring_replay" -> (OpsQueries.streamMonitoringReplay _),
    "stream_topk_replay"      -> (OpsQueries.streamTopkReplay _),
    "stream_sink_retention_replay" -> (OpsQueries.streamSinkRetentionReplay _),
    "stream_async_services_replay" -> (OpsQueries.streamAsyncServicesReplay _),
    "stream_schema_rename_replay" -> (OpsQueries.streamSchemaRenameReplay _),
    "stream_sql_read_replay"  -> (OpsQueries.streamSqlReadReplay _),
    "i_incremental_isotonic_by" -> (OpsQueries.iIncrementalIsotonicBy _),
    "i_incremental_ap"        -> (OpsQueries.iIncrementalAp _),
  )

  /** Headline bench set (graft.Bench): the analytically-representative
    * queries — scans, the shuffle-heavy joins/aggregates, window
    * functions, and every extension family — excluding the scratch-dir
    * lifecycle roundtrips (they measure tmpfs writes, not operator
    * throughput; their correctness is covered by Verify + ScalaTest).
    * Exception: `s9_mor_snapshot` IS on the board (r7 verdict #7) so
    * the MOR real-time-view merge cost — the one read path whose cost
    * grows with live deltas between compactions — is tracked round
    * over round, not just correctness-gated.
    */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "j1_customers_orders_join", "q5_multijoin", "o_topk_revenue",
    "j_left_join_agg", "j_semi_join", "j_anti_join", "j_full_outer",
    "w_window_rank", "w_running_total",
    "a1_distinct_sort_limit", "set_intersect", "p_filter_pushdown",
    "p2_projection_alias", "f2_datetime", "f6_json", "s2_incremental_read",
    "s3_upsert_merge", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_clusters", "curation_pipeline", "curation_full",
    "dedup_minhash_pairs",
    "dedup_minhash_incr", "dedup_simhash_pairs", "sim_cosine_topk",
    "sim_lsh_topk_raw", "sim_ivf_topk_raw", "sim_q8_topk_raw",
    "sim_neardup_pairs", "sample_stratified", "sample_split",
    "sample_quota", "sample_rates", "sample_temperature",
    "sim_semdedup", "pack_sequences", "pack_chunks",
    "pack_shards", "mixture_pipeline",
    "domains_profile", "domains_filter", "domains_bands",
    "dedup_spans", "dedup_strip_spans", "dedup_strip_lines",
    "dq_expectations",
    "dq_profile",
    "text_stats", "text_quality", "text_token_counts",
    "text_fingerprint_raw", "text_langid", "text_lm_score",
    "quality_mixture", "text_tfidf", "text_vocab", "text_repetition",
    "pii_redact", "decontam_overlap", "multimodal_stats",
    "multimodal_features_raw", "events_tumbling", "events_sliding",
    "events_sessions", "j_asof_join", "j_salted_join", "j_range_join",
    "a_salted_agg", "a_approx_agg_raw", "s9_mor_snapshot",
    "sample_shuffle", "o9_key_lookup", "text_classifier", "sim_rproj",
    "sim_rproj_topk", "sim_pca", "text_bpe", "pack_length_batches",
    "sim_cluster_balanced", "sample_epochs", "text_winnow",
    "dedup_winnow_pairs", "sim_pq_topk_raw", "text_c4_clean",
    "text_lm_backoff", "dq_outliers", "dedup_prefix_jaccard",
    "sim_hard_negatives", "sample_exact_n", "a_heavy_hitters",
    "j_bloom_prune", "a_countmin", "sample_leakage_safe",
    "sample_weighted", "sim_knn_graph", "i_incremental_agg",
    "text_bm25", "dedup_edit_pairs", "graph_pagerank",
    "dedup_containment", "a_kmv_overlap", "dq_drift", "text_hybrid_rrf",
    "o10_secondary_lookup", "j_interval_overlap",
    "text_retrieval_eval", "labels_vote", "labels_kappa",
    "sim_mmr_rerank", "eval_auc", "eval_auc_by", "events_rolling",
    "events_gapfill", "events_transitions", "o11_hilbert_pruned_read",
    "eval_ece_by", "eval_isotonic", "eval_roc_curve", "eval_confusion_by",
    // streaming replays on the recurring board: a regression in the
    // FMGWS state path must move a round-over-round number, not wait
    // for the next one-off SCALE.md re-measure
    "stream_rolling_replay", "stream_gapfill_replay",
    "stream_asof_replay", "eval_calibrated_by", "i_incremental_ece_by",
    "stream_feature_store_replay", "stream_dedup_replay",
    // r12: composite-key streaming faces + feed-latency drift
    "stream_asof_composite_replay", "stream_drift_replay",
    "stream_rolling_composite_replay",
    "stream_gapfill_composite_replay",
    "stream_transitions_composite_replay", "dq_drift_by",
    "stream_funnel_composite_replay", "stream_retention_composite_replay",
    // r12 lifecycle additions: the live-writer retention sink and the
    // streaming frequency face (both stream-shaped board rows); the
    // archival/inline-compact timeline queries stay off the board —
    // scratch-dir metadata lifecycles, correctness-gated like their
    // s_timeline sibling
    "stream_topk_replay", "stream_sink_retention_replay",
    // r13: real-BMP decode surface (codegen-free mapPartitions shape —
    // a decoder/row-materialization regression should move a board
    // number); the schema-surgery lifecycle queries stay off the
    // board, correctness-gated like their s_timeline sibling
    "multimodal_bmp_stats",
    // r14: async services racing the live MOR writer (stream-shaped
    // board row — a lock-contention or compaction regression moves it)
    "stream_async_services_replay",
    // r15: the SQL write surface (INSERT upsert, MERGE change-capture,
    // UPDATE+DELETE predicate DML — each a physical commit pipeline a
    // regression should move), the catalog CDC stream face, and the
    // percentile_approx scale paths of the dq quantile family
    "sql_insert_write", "sql_merge_write", "sql_update_delete_write",
    "sql_alter_write", "stream_sql_read_replay", "dq_outliers_approx",
    "dq_group_quantiles_approx")

  /** Shared DuckDB oracle fragments — one source of truth for the
    * shapes several oracles verify against (exact 3-gram Jaccard
    * pairs, connected components, langid scoring, quality scoring),
    * so the independent re-computations can't drift apart.
    */
  private def ngramExCte(src: String): String =
    raw"""tok AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM $src),
         | sh AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
         |  FROM tok, UNNEST(range(1, len(w)-1)) AS u(i)),
         | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         | inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         | ex AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |  WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5)""".stripMargin

  /** BM25 ranking CTE chain ending in `bmrk(query_id, doc_id, score_r,
    * rank)` — postings/df/dl + the identical double weight
    * construction (per-term contributions through DECIMAL(28,9) so the
    * score sum is order-independent; rank over the rounded score) —
    * shared by `text_bm25` and the `text_hybrid_rrf` fusion so the
    * retrieval arithmetic lives in ONE place.
    */
  private def bm25RankCte: String =
    raw"""tok AS (
        |  SELECT doc_id,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        | post AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        | dlen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        | st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dlen),
        | dft AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
        | qt AS (SELECT doc_id AS query_id,
        |   unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+')))
        |     AS term
        |  FROM documents WHERE doc_id < 5),
        | j AS (SELECT q.query_id, p.doc_id,
        |   CAST(ln(1 + (CAST(st.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
        |    * ((CAST(p.tf AS DOUBLE) * (1.2 + 1))
        |       / (CAST(p.tf AS DOUBLE) + 1.2 * (0.25
        |          + (0.75 * CAST(dlen.dl AS DOUBLE))
        |            / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))
        |    AS DECIMAL(28,9)) AS c
        |  FROM qt q JOIN dft d USING (term) JOIN post p USING (term)
        |  JOIN dlen ON dlen.doc_id = p.doc_id CROSS JOIN st
        |  WHERE d.df <= st.n_docs * 1.0),
        | sc AS (SELECT query_id, doc_id,
        |   round(CAST(sum(c) AS DOUBLE), 6) AS score_r FROM j GROUP BY 1, 2),
        | bmrk AS (SELECT query_id, doc_id, score_r,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY score_r DESC, doc_id ASC) AS rank FROM sc)""".stripMargin

  /** Fixed-point rank-weight table for `text_retrieval_eval` — the
    * SAME driver-baked integers the Spark plan embeds
    * ([[graft.ext.RetrievalEval]] weight tables: DCG gain, MRR
    * reciprocal, IDCG prefix per rank 1..10), rendered as a VALUES
    * CTE so the oracle's sums are bit-identical by construction.
    */
  private def retrievalWeightsCte: String = {
    val wd = graft.ext.RetrievalEval.dcgWeightsU(10)
    val wm = graft.ext.RetrievalEval.mrrWeightsU(10)
    val wp = graft.ext.RetrievalEval.idcgPrefixU(10)
    val rows = (1 to 10).map(r =>
      s"(${r}, ${wd(r - 1)}, ${wm(r - 1)}, ${wp(r - 1)})").mkString(", ")
    s"w(rnk, wd, wm, wp) AS (VALUES $rows)"
  }

  /** Unrolled greedy MMR oracle for `sim_mmr_rerank`: stage r's
    * argmax CTE scores every not-yet-selected candidate as
    * `λ·rel − (1−λ)·max cos(item, selected)` against the union of
    * stages 1..r−1 — the same recurrence the Spark loop runs, with
    * the SAME double constants (the Scala rendering of 1−λ, ulp
    * included) and the same item-id tie-break. Rank-only output: the
    * cosine ORDERING is the bit-stable cross-engine surface (the
    * sim_cosine_topk posture); no score column is emitted. Every CTE
    * is MATERIALIZED: the u-chain references each prior stage twice
    * (join + NOT EXISTS), and DuckDB's default inlining re-derives
    * the whole recurrence per reference — 278 s at sf0.01 inlined,
    * 0.5 s materialized.
    */
  private def mmrOracleSql(k: Int, c: Int, nq: Int, lambda: Double): String = {
    val lam = lambda.toString
    val oneM = (1.0 - lambda).toString
    val head =
      s"""WITH cand AS MATERIALIZED (
         |  SELECT query_id, item_id, rel FROM (
         |   SELECT q.vec_id AS query_id, c.vec_id AS item_id,
         |    list_cosine_similarity(q.embedding, c.embedding) AS rel,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
         |               c.vec_id ASC) AS rank
         |   FROM embeddings q CROSS JOIN embeddings c
         |   WHERE q.vec_id < $nq AND q.vec_id <> c.vec_id)
         |  WHERE rank <= $c),
         | sel1 AS MATERIALIZED (
         |  SELECT query_id, item_id, 1 AS mmr_rank FROM (
         |   SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |     ORDER BY rel DESC, item_id ASC) AS rn FROM cand)
         |  WHERE rn = 1)""".stripMargin
    val stages = (2 to k).map { r =>
      val prevU = if (r == 2) "SELECT * FROM sel1"
        else s"SELECT * FROM u${r - 2} UNION ALL SELECT * FROM sel${r - 1}"
      s""" u${r - 1} AS MATERIALIZED ($prevU),
         | sc$r AS MATERIALIZED (
         |  SELECT cd.query_id, cd.item_id, cd.rel,
         |   max(list_cosine_similarity(ei.embedding, es.embedding)) AS maxsim
         |  FROM cand cd
         |  JOIN u${r - 1} s ON s.query_id = cd.query_id
         |  JOIN embeddings ei ON ei.vec_id = cd.item_id
         |  JOIN embeddings es ON es.vec_id = s.item_id
         |  WHERE NOT EXISTS (SELECT 1 FROM u${r - 1} x
         |    WHERE x.query_id = cd.query_id AND x.item_id = cd.item_id)
         |  GROUP BY 1, 2, 3),
         | sel$r AS MATERIALIZED (
         |  SELECT query_id, item_id, $r AS mmr_rank FROM (
         |   SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |     ORDER BY $lam * rel - $oneM * maxsim DESC, item_id ASC) AS rn
         |   FROM sc$r) WHERE rn = 1)""".stripMargin
    }
    val finalU = s" uF AS (SELECT * FROM u${k - 1} UNION ALL SELECT * FROM sel$k)"
    (head +: stages).mkString(",\n") + ",\n" + finalU +
      "\n SELECT query_id, item_id AS neighbor_id, mmr_rank FROM uF" +
      "\n ORDER BY query_id, mmr_rank"
  }

  /** Winnowing selection CTE chain ending in `wsel(doc_id, pos, fp)` —
    * word 3-grams, window 4, the (hash, −pos) aligned-frame minima —
    * shared by `text_winnow` and `dedup_winnow_pairs` so the selection
    * arithmetic lives in ONE place.
    */
  private def winnowCte(src: String): String =
    s"""wtok AS (
       |  SELECT doc_id,
       |   string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM $src),
       | wg AS (
       |  SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
       |   array_to_string(tk[t.i + 1 : t.i + 3], ' ') AS gram
       |  FROM wtok, LATERAL (SELECT unnest(generate_series(0,
       |    len(tk) - 3)) AS i) t
       |  WHERE len(tk) >= 3),
       | wkd AS (
       |  SELECT doc_id, pos, ${h60Sql("wfp", 42, "gram")} AS fp,
       |   CAST(-pos AS BIGINT) AS np
       |  FROM wg),
       | wm AS (
       |  SELECT doc_id, pos, fp, {'h': fp, 'np': np} AS key,
       |   min({'h': fp, 'np': np}) OVER (PARTITION BY doc_id ORDER BY pos
       |     ROWS BETWEEN 0 PRECEDING AND 3 FOLLOWING) AS m0,
       |   min({'h': fp, 'np': np}) OVER (PARTITION BY doc_id ORDER BY pos
       |     ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS m1,
       |   min({'h': fp, 'np': np}) OVER (PARTITION BY doc_id ORDER BY pos
       |     ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS m2,
       |   min({'h': fp, 'np': np}) OVER (PARTITION BY doc_id ORDER BY pos
       |     ROWS BETWEEN 3 PRECEDING AND 0 FOLLOWING) AS m3
       |  FROM wkd),
       | wsel AS (
       |  SELECT doc_id, pos, fp FROM wm
       |  WHERE key = m0 OR key = m1 OR key = m2 OR key = m3)""".stripMargin

  /** Reachability components over `ex` (requires WITH RECURSIVE). */
  private val edgesReachCte: String =
    """edges AS (
      |  SELECT id_a AS a, id_b AS b FROM ex
      |  UNION ALL SELECT id_b, id_a FROM ex),
      | reach AS (
      |  SELECT DISTINCT a AS id, a AS comp FROM edges
      |  UNION
      |  SELECT e.a, r.comp FROM edges e JOIN reach r ON r.id = e.b)""".stripMargin

  /** Domain-gate CTE chain ending in `gated(doc_id, source, text)` —
    * stats gates + blocklist, shared by `domains_filter` and
    * `mixture_pipeline` so the thresholds live in ONE place.
    */
  private def domainGateCte(src: String): String =
    raw"""gprof AS (
         |  SELECT source, count(*) AS n_docs,
         |   sum(len(string_split_regex(trim(lower(text)), '\s+')))
         |     AS sum_tokens,
         |   count(DISTINCT lower(trim(text))) AS n_distinct_texts
         |  FROM $src GROUP BY source),
         | gkept AS (SELECT source FROM gprof
         |  WHERE n_docs >= 10
         |   AND CAST(sum_tokens AS DOUBLE) / n_docs >= 53.0
         |   AND 1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs <= 0.5),
         | gated AS (SELECT doc_id, source, text FROM $src
         |  WHERE source IN (SELECT source FROM gkept)
         |   AND source NOT IN ('src1', 'src11'))""".stripMargin

  /** α=0.5 temperature-cut CTE chain over `$src` ending in
    * `tcut(source, cut)` — shared by `sample_temperature` and
    * `mixture_pipeline` (one source of truth for the cut rule).
    */
  private def tempCutCte(src: String): String =
    raw"""tc0 AS (SELECT source, count(*) AS n_docs
         |  FROM $src GROUP BY source),
         | tm AS (SELECT min(n_docs) AS mn FROM tc0),
         | tcut AS (SELECT source,
         |   CAST(round(sqrt(CAST(mn AS DOUBLE) / CAST(n_docs AS DOUBLE))
         |     * 1000000) AS BIGINT) AS cut
         |  FROM tc0, tm)""".stripMargin

  /** CTE chain ending in `lm(doc_id, lm_score, n_bigrams)` — the
    * Laplace-smoothed corpus-bigram log-likelihood per doc (shared by
    * `text_lm_score` and `quality_mixture`, one source of truth).
    */
  private def lmCte(src: String): String =
    raw"""ltok AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM $src),
         | lbg AS (
         |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
         |  FROM ltok, UNNEST(range(1, len(w))) AS u(i)
         |  WHERE len(w) >= 2),
         | luni AS (
         |  SELECT tk, count(*) AS n1
         |  FROM (SELECT unnest(w) AS tk FROM ltok) GROUP BY tk),
         | lv AS (SELECT count(*) AS vs FROM luni),
         | lbi AS (SELECT w1, w2, count(*) AS n2 FROM lbg GROUP BY w1, w2),
         | lm AS (
         |  SELECT doc_id,
         |   round(avg(ln((n2 + 0.4) / (n1 + 0.4 * vs))), 6) AS lm_score,
         |   count(*) AS n_bigrams
         |  FROM lbg
         |  JOIN lbi USING (w1, w2)
         |  JOIN luni ON luni.tk = lbg.w1
         |  CROSS JOIN lv
         |  GROUP BY doc_id)""".stripMargin

  /** Marker-count language scoring ranked per doc: `ranked(doc_id,
    * lang, rn)` with rn = 1 at the (score, lang)-max — replicates
    * [[graft.ext.TextStats.languageId]] verbatim.
    */
  private def langidRankedCte(src: String): String = {
    def score(markers: Seq[String]): String = markers.map { m =>
      s"CASE WHEN strpos(s, '$m') > 0 THEN (length(s) - length(replace(s, '$m', ''))) / ${m.length} ELSE 0 END"
    }.mkString("(", "\n   + ", ")")
    val langs = Seq(
      "en" -> Seq(" the ", " and ", " of ", " is ", " to "),
      "de" -> Seq(" der ", " und ", " die ", " ist ", " das "),
      "fr" -> Seq(" le ", " la ", " et ", " est ", " les "),
      "es" -> Seq(" el ", " los ", " es ", " y ", " las "),
      "zh" -> Seq("的", "是", "了", "在", "不"))
    val scoreCols = langs
      .map { case (l, ms) => s"  ${score(ms)} AS sc_$l" }.mkString(",\n")
    s"""p AS (
       |  SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM $src),
       | lsc AS (SELECT doc_id,
       |$scoreCols
       |  FROM p),
       | ranked AS (
       |  SELECT doc_id, lang, sc,
       |   row_number() OVER (PARTITION BY doc_id
       |     ORDER BY sc DESC, lang DESC) AS rn
       |  FROM (SELECT doc_id,
       |         unnest([${langs.map(l => s"'${l._1}'").mkString(",")}]) AS lang,
       |         unnest([${langs.map(l => s"sc_${l._1}").mkString(", ")}]) AS sc
       |        FROM lsc))""".stripMargin
  }

  /** md5-60-bit field hash of the synthetic generator — replicates
    * [[graft.pipeline.SeedTables]]'s `h60(tag, seed, i)` digit for
    * digit (`i` must be an unambiguous column reference at the call
    * site).
    */
  private def h60Sql(tag: String, seed: Long, i: String): String =
    s"""list_reduce(list_transform(string_split(substr(md5('$tag:$seed:' || CAST($i AS VARCHAR)), 1, 15), ''),
       |     c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
       |   (acc, d) -> acc * 16 + d)""".stripMargin

  /** `java.util.UUID(hi, lo).toString` in SQL — replicates
    * [[graft.pipeline.SeedTables]]'s `uuidCol`/`uuidOf`.
    */
  private def uuidSql(hi: String, lo: String): String = {
    val h = s"lpad(lower(hex($hi)),16,'0')"
    val l = s"lpad(lower(hex($lo)),16,'0')"
    s"concat(substr($h,1,8),'-',substr($h,9,4),'-',substr($h,13,4)," +
      s"'-',substr($l,1,4),'-',substr($l,5,12))"
  }

  /** Quality scoring per doc: `qual(doc_id, quality)` — replicates
    * [[graft.ext.TextStats.qualityScore]] verbatim.
    */
  private def qualityCte(src: String): String =
    raw"""qtok AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM $src),
         | qual AS (
         |  SELECT doc_id, round(
         |   least(1.0, CAST(len(w) AS DOUBLE) / 64.0) * 0.4
         |   + (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.4
         |   + least(1.0, (CAST(len(list_filter(w, t -> t IN ('the','a','an',
         |       'and','or','of','to','in','is','it','for','on','with','as',
         |       'at','by'))) AS DOUBLE) / len(w)) * 4.0) * 0.2, 6) AS quality
         |  FROM qtok)""".stripMargin

  /** Formal waivers for the `queries` entries that CANNOT carry a
    * DuckDB value oracle — the driver records these as rows-only; each
    * entry states why no SQL oracle can exist and names the value-level
    * check that covers the family instead. Every waived surface is
    * additionally invariant-checked in-query where a per-row exactness
    * property exists (the ANN raws fail loudly on any non-exact
    * cosine — `ExtQueries.requireExactCosines`). Dumped by [[Verify]]
    * as `waivers.json`; `tools/oracle_check.py` reports waived vs
    * unexplained rows-only separately.
    */
  def rowsOnlyWaivers: Map[String, String] = Map(
    "sim_lsh_topk_raw" ->
      ("row SET depends on seeded random hyperplanes (sign-LSH bucketing) " +
        "not expressible in SQL; every emitted cosine is invariant-checked " +
        "in-query against exact recomputation from the base vectors on " +
        "every correctness run (skipped only inside Bench's timed loop), " +
        "and the family's recall gate sim_lsh_topk is DuckDB value-oracled. " +
        "r11 graduation check: the sim_q8 portable-hash argument does NOT " +
        "extend — q8 graduated because quantization collapses scores to " +
        "exact INTEGER dot products (ordering is integer-arithmetic-" +
        "portable), while LSH bucket membership is the SIGN of a 64-term " +
        "IEEE double dot against Gaussian literals; DuckDB's " +
        "list_inner_product association/FMA behavior is not contractual, " +
        "and ONE boundary flip changes the emitted row SET, so a SQL " +
        "replay would be float-boundary-fragile (the exact local-green/" +
        "driver-red class the r10 dtype audit closed). Waiver retained " +
        "deliberately."),
    "sim_ivf_topk_raw" ->
      ("row SET depends on Lloyd-trained centroids (IVF shard probe) not " +
        "expressible in SQL; every emitted cosine is invariant-checked " +
        "in-query against exact recomputation from the base vectors on " +
        "every correctness run (skipped only inside Bench's timed loop), " +
        "and the family's recall gate sim_ivf_topk is DuckDB value-oracled. " +
        "r11 graduation check: strictly harder than the LSH case — the " +
        "probe set depends on iterated Lloyd MEANS (corpus-wide float " +
        "sums whose grouping changes per iteration), so cross-engine " +
        "bit-parity of the trained centroids has no portable-arithmetic " +
        "argument at all. Waiver retained deliberately."),
    "sim_pq_topk_raw" ->
      ("row SET depends on Lloyd-trained product-quantization codebooks " +
        "(per-subspace k-means) not expressible in SQL; every emitted " +
        "cosine is invariant-checked in-query against exact recomputation " +
        "from the base vectors on every correctness run (skipped only " +
        "inside Bench's timed loop), and the family's recall gate " +
        "sim_pq_topk is DuckDB value-oracled"),
    "a_approx_agg_raw" ->
      ("HLL++/percentile_approx sketch outputs are implementation-defined; " +
        "DuckDB's approx_count_distinct/approx_quantile use different " +
        "sketches, so no SQL reproduces the values cell-exact; the " +
        "error-bound gate a_approx_agg (|approx-exact| within 10%/5%) is " +
        "DuckDB value-oracled"))

  private val evalIsotonicSql =
    raw"""WITH tok AS (
       |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
       |  FROM documents),
       | sr AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
       |     'of','to','in','is','it','for','on','with','as','at','by')))
       |     AS DOUBLE) / len(w) AS s
       |  FROM tok),
       | b AS (SELECT CAST(least(9, greatest(0,
       |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
       |    AS INT) AS bin, y
       |  FROM sr WHERE s IS NOT NULL),
       | counts AS (SELECT bin, count(*) AS n,
       |   CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY bin),
       | cum AS (SELECT bin, n, n_pos,
       |   CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
       |   CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp
       |  FROM counts),
       | pairs AS (SELECT li.bin AS i, rj.bin AS j,
       |   CAST(rj.cp - (li.cp - li.n_pos) AS DOUBLE) /
       |     (rj.cn - (li.cn - li.n)) AS a
       |  FROM cum li JOIN cum rj ON li.bin <= rj.bin),
       | sm AS (SELECT i, j AS bin, min(a) OVER (PARTITION BY i
       |   ORDER BY j DESC
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
       |  FROM pairs),
       | fit AS (SELECT bin, max(sm) AS iso_rate FROM sm GROUP BY bin)
       | SELECT c.bin, c.n, c.n_pos,
       |  CAST(c.n_pos AS DOUBLE) / c.n AS pos_rate, iso_rate
       | FROM counts c JOIN fit USING (bin) ORDER BY bin""".stripMargin

  private val eventsSessionsSql =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |   CASE WHEN lag(ts) OVER w IS NULL
      |     OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      | s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |   ROWS UNBOUNDED PRECEDING) AS sid FROM o)
      | SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      | FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  private val eventsTumblingSql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val eventsSlidingSql =
    """WITH e AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b,
      |   event_type FROM events),
      | x AS (SELECT b AS ws, event_type FROM e
      |  UNION ALL SELECT b - INTERVAL '30 minutes', event_type FROM e)
      | SELECT CAST(ws AS TIMESTAMP) AS window_start, event_type,
      |  count(*) AS n
      | FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val dqDriftSql =
    """WITH r AS (
      |  SELECT least(15, greatest(0,
      |    CAST(floor(CAST(length(text) AS DOUBLE) / 256.0) AS INT)))
      |    AS bin
      |  FROM documents WHERE doc_id % 2 = 0),
      | c AS (
      |  SELECT least(15, greatest(0,
      |    CAST(floor(CAST(length(text) AS DOUBLE) / 256.0) AS INT)))
      |    AS bin
      |  FROM documents WHERE doc_id % 2 = 1),
      | rb AS (SELECT bin, count(*) AS n_ref FROM r GROUP BY bin),
      | cb AS (SELECT bin, count(*) AS n_cur FROM c GROUP BY bin),
      | tots AS (SELECT (SELECT count(*) FROM r) AS tr,
      |   (SELECT count(*) FROM c) AS tc),
      | bn AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS bin),
      | f AS (
      |  SELECT bn.bin,
      |   CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
      |   CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur, tr, tc
      |  FROM bn LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin)
      |  CROSS JOIN tots)
      | SELECT bin, n_ref, n_cur,
      |  round((greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
      |      - greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6))
      |    * ln(greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
      |      / greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)), 9)
      |    AS psi_term_r
      | FROM f ORDER BY bin""".stripMargin

  // Per-source isotonic FIT: shared by the batch report and its
  // incremental twin — the per-group minimax closed form replayed in
  // SQL (each interval average ONE division of exact BIGINTs).
  private val evalIsotonicBySql =
    raw"""WITH tok AS (
       |  SELECT source, lang,
       |   string_split_regex(trim(lower(text)), '\s+') AS w
       |  FROM documents),
       | sr AS (SELECT source,
       |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
       |     'of','to','in','is','it','for','on','with','as','at','by')))
       |     AS DOUBLE) / len(w) AS s
       |  FROM tok),
       | b AS (SELECT source, CAST(least(9, greatest(0,
       |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
       |    AS INT) AS bin, y
       |  FROM sr WHERE s IS NOT NULL AND source IS NOT NULL),
       | counts AS MATERIALIZED (SELECT source, bin, count(*) AS n,
       |   CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1, 2),
       | cum AS MATERIALIZED (SELECT source, bin, n, n_pos,
       |   CAST(sum(n) OVER (PARTITION BY source ORDER BY bin)
       |     AS BIGINT) AS cn,
       |   CAST(sum(n_pos) OVER (PARTITION BY source ORDER BY bin)
       |     AS BIGINT) AS cp
       |  FROM counts),
       | pairs AS (SELECT li.source, li.bin AS i, rj.bin AS j,
       |   CAST(rj.cp - (li.cp - li.n_pos) AS DOUBLE) /
       |     (rj.cn - (li.cn - li.n)) AS a
       |  FROM cum li JOIN cum rj
       |   ON li.source = rj.source AND li.bin <= rj.bin),
       | sm AS (SELECT source, i, j AS bin, min(a) OVER (
       |   PARTITION BY source, i ORDER BY j DESC
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
       |  FROM pairs),
       | fit AS (SELECT source, bin, max(sm) AS iso_rate
       |  FROM sm GROUP BY 1, 2)
       | SELECT c.source, c.bin, c.n, c.n_pos,
       |  CAST(c.n_pos AS DOUBLE) / c.n AS pos_rate, iso_rate
       | FROM counts c JOIN fit USING (source, bin)
       | ORDER BY c.source, c.bin""".stripMargin

  private val incAucStopwordSql =
    raw"""WITH tok AS (
       |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
       |  FROM documents),
       | sr AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
       |     'of','to','in','is','it','for','on','with','as','at','by')))
       |     AS DOUBLE) / len(w) AS s
       |  FROM tok),
       | g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos_g,
       |   count(*) AS tot_g FROM sr WHERE s IS NOT NULL GROUP BY s),
       | c AS (SELECT s, pos_g, tot_g - pos_g AS neg_g,
       |   coalesce(sum(tot_g - pos_g) OVER (ORDER BY s
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |     AS cnb
       |  FROM g),
       | cells AS (SELECT CAST(sum(pos_g) AS BIGINT) AS n_pos,
       |   CAST(sum(neg_g) AS BIGINT) AS n_neg,
       |   CAST(sum(CAST(pos_g AS DECIMAL(18,0)) *
       |     CAST(2 * cnb + neg_g AS DECIMAL(19,0)))
       |     AS DECIMAL(38,0)) AS u2
       |  FROM c)
       | SELECT n_pos, n_neg, CAST(u2 AS BIGINT) AS u2,
       |  CASE WHEN n_pos > 0 AND n_neg > 0
       |   THEN CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg) END AS auc
       | FROM cells""".stripMargin

  // Per-slice ECE: shared by the batch query and its incremental
  // twin (the full-corpus recompute IS the incremental ≡ full proof).
  private val evalEceBySql =
    raw"""WITH tok AS (
       |  SELECT source, lang,
       |   string_split_regex(trim(lower(text)), '\s+') AS w
       |  FROM documents),
       | sr AS (SELECT source,
       |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
       |     'of','to','in','is','it','for','on','with','as','at','by')))
       |     AS DOUBLE) / len(w) AS s
       |  FROM tok),
       | b AS (SELECT source, CAST(least(9, greatest(0,
       |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
       |    AS INT) AS bin, y, s
       |  FROM sr WHERE s IS NOT NULL AND source IS NOT NULL),
       | counts AS (SELECT source, bin, count(*) AS n,
       |   CAST(sum(y) AS BIGINT) AS n_pos,
       |   sum(CAST(s AS DECIMAL(28,9))) AS sum_s FROM b GROUP BY 1, 2),
       | tot AS (SELECT source, bin, n, n_pos, sum_s,
       |   CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS ntot
       |  FROM counts),
       | t AS (SELECT source, ntot, CAST(round((CAST(n AS DOUBLE) / ntot)
       |     * abs(CAST(n_pos AS DOUBLE) / n - CAST(sum_s AS DOUBLE) / n),
       |     9) AS DECIMAL(28,9)) AS term
       |  FROM tot)
       | SELECT source, ntot AS n, round(CAST(sum(term) AS DOUBLE), 6)
       |   AS ece
       | FROM t GROUP BY 1, 2 ORDER BY source""".stripMargin

  private val evalCalibrationBySql =
    raw"""WITH tok AS (
       |  SELECT source, lang,
       |   string_split_regex(trim(lower(text)), '\s+') AS w
       |  FROM documents),
       | sr AS (SELECT source,
       |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
       |     'of','to','in','is','it','for','on','with','as','at','by')))
       |     AS DOUBLE) / len(w) AS s
       |  FROM tok),
       | b AS (SELECT source, CAST(least(9, greatest(0,
       |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
       |    AS INT) AS bin, y
       |  FROM sr WHERE s IS NOT NULL AND source IS NOT NULL),
       | counts AS (SELECT source, bin, count(*) AS n,
       |   CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1, 2),
       | spine AS (SELECT DISTINCT source FROM counts)
       | SELECT spine.source, CAST(r.range AS INT) AS bin,
       |  coalesce(n, 0) AS n, coalesce(n_pos, 0) AS n_pos,
       |  CASE WHEN coalesce(n, 0) > 0
       |   THEN CAST(n_pos AS DOUBLE) / n END AS pos_rate
       | FROM spine CROSS JOIN range(0, 10) r
       | LEFT JOIN counts
       |  ON counts.source = spine.source AND counts.bin = r.range
       | ORDER BY 1, 2""".stripMargin

  // As-of enrichment: shared by the batch queries and their streaming
  // replays (the finalize-on-watermark contract makes the streamed
  // pairs row-equal to the batch operator — same oracle, literally).
  private val asofJoinSql =
    """SELECT p.event_id, p.user_id, v.event_id AS view_event_id
      | FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      | ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND v.ts <= p.ts
      | ORDER BY p.event_id""".stripMargin

  // Tolerance = the same ASOF match (greatest rt <= lt) with stale
  // matches nulled AFTER — exactly the engine's match-then-null
  // plan, so the replay is structural, not a reformulation.
  private val asofToleranceSql =
    """SELECT event_id, user_id,
      | CASE WHEN vts >= ts - INTERVAL '30 minutes'
      |  THEN view_event_id END AS view_event_id
      | FROM (
      |  SELECT p.event_id, p.user_id, p.ts, v.ts AS vts,
      |   v.event_id AS view_event_id
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |   ON p.user_id = v.user_id AND v.ts <= p.ts)
      | ORDER BY event_id""".stripMargin

  private val eventsRollingSql =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS roll_cnt,
      |  CAST(sum(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
      |    AS roll_sum
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      | ORDER BY event_id""".stripMargin

  // Markov transitions: lead over a (ts, event_id) total order per
  // user; p = n / row total, both exact counts (window sum cast back
  // from DuckDB's HUGEINT).
  private val eventsTransitionsSql =
    """WITH seq AS (SELECT user_id, event_type AS from_state,
      |   lead(event_type) OVER (PARTITION BY user_id
      |     ORDER BY ts, event_id) AS to_state
      |  FROM events),
      | c AS (SELECT from_state, to_state, count(*) AS n
      |  FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2)
      | SELECT from_state, to_state, n,
      |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_state)
      |    AS BIGINT) AS p
      | FROM c ORDER BY from_state, to_state""".stripMargin

  // Gap-fill replay: integer floor slots, explicit (ts, value) DESC
  // rank for the within-slot representative, generate_series spine
  // (END-INCLUSIVE), IGNORE NULLS last_value for the LOCF.
  private val eventsGapfillSql =
    """WITH base AS (SELECT user_id AS k,
      |   epoch_us(ts) - epoch_us(ts) % 86400000000 AS slot, ts, value
      |  FROM events),
      | rep AS (SELECT k, slot, value FROM (
      |   SELECT k, slot, value, row_number() OVER (PARTITION BY k, slot
      |     ORDER BY ts DESC, value DESC) AS rn FROM base) WHERE rn = 1),
      | spine AS (SELECT k, unnest(generate_series(lo, hi, 86400000000))
      |    AS slot
      |  FROM (SELECT k, min(slot) AS lo, max(slot) AS hi
      |   FROM base GROUP BY k)),
      | j AS (SELECT s.k, s.slot, rep.value AS v
      |  FROM spine s LEFT JOIN rep ON rep.k = s.k AND rep.slot = s.slot)
      | SELECT k AS user_id, make_timestamp(slot) AS slot_ts,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY slot
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      |  v IS NOT NULL AS is_observed
      | FROM j ORDER BY user_id, slot_ts""".stripMargin

  // Per-source slice drift: the dqDriftSql arithmetic per source, the
  // group universe a union of both sides, each group its own dense
  // spine and totals; a group missing an entire side reports counts
  // with a NULL term (one-sided proportion is 0/0).
  private val dqDriftBySql =
    """WITH r AS (
      |  SELECT source, least(15, greatest(0,
      |    CAST(floor(CAST(length(text) AS DOUBLE) / 256.0) AS INT)))
      |    AS bin
      |  FROM documents WHERE doc_id % 2 = 0 AND source IS NOT NULL),
      | c AS (
      |  SELECT source, least(15, greatest(0,
      |    CAST(floor(CAST(length(text) AS DOUBLE) / 256.0) AS INT)))
      |    AS bin
      |  FROM documents WHERE doc_id % 2 = 1 AND source IS NOT NULL),
      | rb AS (SELECT source, bin, count(*) AS n_ref FROM r GROUP BY 1, 2),
      | cb AS (SELECT source, bin, count(*) AS n_cur FROM c GROUP BY 1, 2),
      | tr AS (SELECT source, count(*) AS tr FROM r GROUP BY 1),
      | tc AS (SELECT source, count(*) AS tc FROM c GROUP BY 1),
      | gs AS (SELECT DISTINCT source FROM
      |   (SELECT source FROM r UNION ALL SELECT source FROM c)),
      | spine AS (SELECT gs.source, CAST(b.range AS INT) AS bin
      |  FROM gs CROSS JOIN range(0, 16) b),
      | f AS (SELECT spine.source, spine.bin,
      |   CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
      |   CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur, tr.tr, tc.tc
      |  FROM spine
      |  LEFT JOIN rb ON rb.source = spine.source AND rb.bin = spine.bin
      |  LEFT JOIN cb ON cb.source = spine.source AND cb.bin = spine.bin
      |  LEFT JOIN tr ON tr.source = spine.source
      |  LEFT JOIN tc ON tc.source = spine.source)
      | SELECT source, bin, n_ref, n_cur,
      |  CASE WHEN tr IS NOT NULL AND tc IS NOT NULL THEN
      |   round((greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
      |       - greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6))
      |     * ln(greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
      |       / greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)), 9)
      |  END AS psi_term_r
      | FROM f ORDER BY source, bin""".stripMargin

  private val eventsFunnelSql =
    """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |   WHERE event_type = 'signup' GROUP BY user_id),
      | t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |   JOIN t1 ON e.user_id = t1.user_id
      |   WHERE e.event_type = 'view' AND e.ts > t1.t1
      |   GROUP BY e.user_id),
      | t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |   JOIN t2 ON e.user_id = t2.user_id
      |   WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |   GROUP BY e.user_id)
      | SELECT 'funnel' AS family,
      |  (SELECT count(*) FROM t1) AS n_stage1,
      |  (SELECT count(*) FROM t2) AS n_stage2,
      |  (SELECT count(*) FROM t3) AS n_stage3""".stripMargin

  // Retention: integer epoch-week arithmetic on both sides (the
  // fractional seconds DuckDB's epoch() keeps cannot move a
  // 604800-second bucket).
  private val eventsRetentionSql =
    """WITH f AS (SELECT user_id,
      |   CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
      |  FROM events GROUP BY user_id)
      | SELECT f.cohort_week,
      |  CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week
      |    AS week_offset,
      |  count(DISTINCT e.user_id) AS n_active
      | FROM events e JOIN f ON e.user_id = f.user_id
      | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ECE: per-bin terms (n_b/N)·|pos_rate − mean score| with the bin
  // score sum through DECIMAL(28,9); each term round(…,9) then a
  // decimal fold (the BM25 posture) so the bins-sized sum is
  // order-independent.
  private val evalEceSql =
    raw"""WITH tok AS (
       |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
       |  FROM documents),
       | sr AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
       |     'of','to','in','is','it','for','on','with','as','at','by')))
       |     AS DOUBLE) / len(w) AS s
       |  FROM tok),
       | b AS (SELECT CAST(least(9, greatest(0,
       |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
       |    AS INT) AS bin, y, s
       |  FROM sr WHERE s IS NOT NULL),
       | counts AS (SELECT bin, count(*) AS n,
       |   CAST(sum(y) AS BIGINT) AS n_pos,
       |   sum(CAST(s AS DECIMAL(28,9))) AS sum_s FROM b GROUP BY bin),
       | tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM counts),
       | t AS (SELECT ntot, CAST(round((CAST(n AS DOUBLE) / ntot)
       |     * abs(CAST(n_pos AS DOUBLE) / n - CAST(sum_s AS DOUBLE) / n),
       |     9) AS DECIMAL(28,9)) AS term
       |  FROM counts CROSS JOIN tot)
       | SELECT ntot AS n, round(CAST(sum(term) AS DOUBLE), 6) AS ece
       | FROM t GROUP BY ntot""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "p1_select_star" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "p2_projection_alias" ->
      """SELECT o_orderkey, o_custkey, o_totalprice AS order_value,
        | o_orderpriority AS priority FROM orders ORDER BY o_orderkey""".stripMargin,
    "p4_nonempty_guard" ->
      "SELECT count(*) > 0 AS non_empty FROM orders",
    "p_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        | FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'
        | ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p5_sql_transformer" ->
      """SELECT o_orderpriority AS priority, count(*) AS n
        | FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin,
    "j1_customers_orders_join" ->
      """SELECT c_custkey AS customer_id, c_name AS customer_name,
        | c_mktsegment AS segment, o_orderkey AS order_id,
        | o_orderpriority AS order_priority, o_totalprice AS order_value
        | FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | ORDER BY order_id""".stripMargin,
    "j_left_join_agg" ->
      """SELECT c_custkey AS customer_id, count(o_orderkey) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        | FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        | GROUP BY c_custkey ORDER BY customer_id""".stripMargin,
    "o8_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        | FROM customer JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        | ORDER BY c_custkey""".stripMargin,
    "j_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        | ORDER BY c_custkey""".stripMargin,
    "j_full_outer" ->
      """SELECT k, c_name, n_orders, orphan_order, customer_without_orders
        | FROM (
        |  SELECT coalesce(c.c_custkey, o.k) AS k, c.c_name,
        |   coalesce(o.n_orders, 0) AS n_orders,
        |   c.c_name IS NULL AS orphan_order,
        |   o.n_orders IS NULL AS customer_without_orders
        |  FROM customer c FULL OUTER JOIN
        |   (SELECT o_custkey AS k, count(*) AS n_orders
        |    FROM orders GROUP BY 1) o
        |   ON c.c_custkey = o.k) ORDER BY k""".stripMargin,
    "w_running_total" ->
      """SELECT o_custkey AS customer_id, o_orderkey AS order_id,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |   - lag(CAST(o_totalprice AS DECIMAL(18,2)))
        |     OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
        |   AS DOUBLE) AS delta_prev
        | FROM orders ORDER BY customer_id, order_id""".stripMargin,
    "a1_distinct_sort_limit" ->
      """SELECT DISTINCT o_orderdate AS commit_time FROM orders
        | ORDER BY commit_time ASC LIMIT 50""".stripMargin,
    "a2_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "a3_minmax" ->
      """SELECT max(o_orderdate) AS last_commit,
        | min(o_orderdate) AS first_commit FROM orders""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        | FROM lineitem GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a_collect_agg" ->
      """SELECT event_type,
        | string_agg(DISTINCT CAST(user_id % 7 AS VARCHAR), ','
        |   ORDER BY CAST(user_id % 7 AS VARCHAR)) AS users,
        | count(DISTINCT user_id % 7) AS n_users
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n,
        | CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
        | CAST(grouping(l_linestatus) AS TINYINT) AS g_ls
        | FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        | ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
        |  l_linestatus NULLS FIRST""".stripMargin,
    "a_pivot" ->
      """SELECT l_returnflag,
        | sum(l_quantity) FILTER (l_linestatus = 'F') AS qty_f,
        | sum(l_quantity) FILTER (l_linestatus = 'O') AS qty_o
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "o_topk_revenue" ->
      """SELECT l_orderkey AS order_id,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY l_orderkey ORDER BY revenue DESC, order_id ASC LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name AS nation, r_name AS region,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY n_name, r_name ORDER BY nation, region""".stripMargin,
    "w_window_rank" ->
      """SELECT customer_id, order_id, rn FROM (
        |  SELECT o_custkey AS customer_id, o_orderkey AS order_id,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY customer_id, rn""".stripMargin,
    "set_intersect" ->
      """SELECT c_custkey AS key FROM customer
        | INTERSECT SELECT o_custkey AS key FROM orders ORDER BY key""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS key FROM customer
        | EXCEPT SELECT o_custkey AS key FROM orders ORDER BY key""".stripMargin,
    "set_union" ->
      """SELECT DISTINCT key FROM (
        |  SELECT c_nationkey AS key FROM customer
        |  UNION ALL SELECT s_nationkey AS key FROM supplier)
        | ORDER BY key""".stripMargin,
    "f2_datetime" ->
      """SELECT o_orderkey,
        | CAST(extract(year FROM o_orderdate) AS INT) AS y,
        | CAST(extract(month FROM o_orderdate) AS INT) AS m,
        | CAST(extract(day FROM o_orderdate) AS INT) AS d,
        | date_trunc('month', o_orderdate) AS month_start,
        | CAST(o_orderdate AS DATE) AS order_day,
        | CASE WHEN o_orderpriority = '1-URGENT' THEN 'URGENT'
        |      ELSE 'NORMAL' END AS urgency
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    "f6_json" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        | count(*) AS n
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s2_incremental_read" ->
      """SELECT event_id, user_id, event_type, value FROM events
        | WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
        | ORDER BY event_id""".stripMargin,
    "s3_upsert_merge" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |   row_number() OVER (PARTITION BY l_orderkey
        |     ORDER BY l_linenumber DESC, l_partkey DESC, l_quantity DESC) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS representative_id, count(*) AS n_dups
        | FROM documents GROUP BY lower(trim(text))
        | ORDER BY representative_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM tok, UNNEST(range(1, len(w)-1)) AS u(i)),
        | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        | inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        | SELECT id_a, id_b,
        |  CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
        | FROM inter
        | JOIN sz sa ON sa.doc_id = id_a
        | JOIN sz sb ON sb.doc_id = id_b
        | WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
        | ORDER BY id_a, id_b""".stripMargin,
    // Containment: same trigram inverted-index recompute, asymmetric
    // formula — integer counts until the two final divisions, so the
    // doubles are bit-exact.
    "dedup_containment" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM tok, UNNEST(range(1, len(w)-1)) AS u(i)),
        | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        | inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        | sc AS (
        |  SELECT id_a, id_b,
        |   CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS cont_a,
        |   CAST(i AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS cont_b
        |  FROM inter
        |  JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b)
        | SELECT id_a, id_b, cont_a, cont_b,
        |  greatest(cont_a, cont_b) AS containment
        | FROM sc WHERE greatest(cont_a, cont_b) >= 0.6
        | ORDER BY id_a, id_b""".stripMargin,
    // Ed-Join: recall 1.0 means the prefix-filtered plan must equal
    // the brute-force levenshtein join — the oracle IS that brute
    // force over the distinct name set.
    "dedup_edit_pairs" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        | SELECT a.p_name AS s_a, b.p_name AS s_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        | FROM n a JOIN n b ON a.p_name < b.p_name
        | WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        | ORDER BY s_a, s_b""".stripMargin,
    // PageRank: 3 unrolled rounds over the symmetric supplier
    // co-occurrence graph (no dangling mass by construction), in
    // FIXED-POINT BIGINT micro-rank units (Graph.FixedScale = 1e12):
    // every operation is exact integer arithmetic (`//` = Spark `div`;
    // all values non-negative), so both engines compute the identical
    // BIGINT — no float op anywhere until the final rank_u/1e12
    // rendering, which divides the same integer by the same power of
    // ten on both sides. DuckDB's sum(BIGINT) widens to HUGEINT →
    // cast back before the scalar arithmetic (the r7 pack_shards
    // lesson).
    "graph_pagerank" -> {
      val scale = graft.ext.Graph.FixedScale
      val teleport = 15L * scale / 100L
      def round(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT e.t AS node,
           |   CAST($teleport AS BIGINT) // (SELECT n FROM nn)
           |   + (85 * CAST(sum(r.rank // d.od) AS BIGINT)) // 100 AS rank
           |  FROM e JOIN $prev r ON e.s = r.node
           |  JOIN deg d ON d.s = e.s GROUP BY e.t)""".stripMargin
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem),
         | e AS (
         |  SELECT DISTINCT a.sk AS s, b.sk AS t
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk <> b.sk),
         | nodes AS (SELECT DISTINCT s AS node FROM e),
         | deg AS (SELECT s, count(*) AS od FROM e GROUP BY s),
         | nn AS (SELECT count(*) AS n FROM nodes),
         | r0 AS (
         |  SELECT node, CAST($scale AS BIGINT) // (SELECT n FROM nn) AS rank
         |  FROM nodes),
         | ${round("r0", "r1")},
         | ${round("r1", "r2")},
         | ${round("r2", "r3")}
         | SELECT node AS l_suppkey, rank AS rank_u,
         |  CAST(rank AS DOUBLE) / $scale.0 AS rank
         | FROM r3 ORDER BY l_suppkey""".stripMargin
    },
    // Same exact-Jaccard recompute at θ=0.4: the PPJoin prefix index
    // must be output-invisible (recall 1.0 + exact verify), so the
    // oracle is the UNPRUNED join, not a replay of the pruning.
    "dedup_prefix_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM tok, UNNEST(range(1, len(w)-1)) AS u(i)),
        | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        | inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        | SELECT id_a, id_b,
        |  CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
        | FROM inter
        | JOIN sz sa ON sa.doc_id = id_a
        | JOIN sz sb ON sb.doc_id = id_b
        | WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.4
        | ORDER BY id_a, id_b""".stripMargin,
    "curation_pipeline" ->
      s"""WITH RECURSIVE ${langidRankedCte("documents")},
        | lang AS (SELECT doc_id FROM ranked WHERE rn = 1 AND lang = 'en'),
        | ${qualityCte("documents")},
        | kept AS (
        |  SELECT d.doc_id, d.text FROM documents d
        |  JOIN lang USING (doc_id) JOIN qual USING (doc_id)
        |  WHERE qual.quality >= 0.5),
        | ${ngramExCte("kept")},
        | $edgesReachCte,
        | losers AS (
        |  SELECT id FROM (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |  WHERE id <> comp)
        | SELECT (SELECT count(*) FROM documents) AS n_docs,
        |  (SELECT count(*) FROM lang) AS n_en,
        |  (SELECT count(*) FROM kept) AS n_kept,
        |  (SELECT count(*) FROM kept) - (SELECT count(*) FROM losers) AS n_final""".stripMargin,
    // The FULL funnel, every stage independently recomputed: language
    // + quality (shared CTE helpers), repetition (raw unrounded
    // fractions — the filter compares kernel doubles; the dup-line
    // gate is omitted because single-line docs score 0.0 ≤ any
    // threshold), 8-gram decontamination vs the benchmark slice,
    // exact-Jaccard reachability pruning, and a PII-free audit of the
    // survivors.
    "curation_full" ->
      s"""WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        | ${langidRankedCte("corpus")},
        | lang AS (SELECT doc_id FROM ranked WHERE rn = 1 AND lang = 'en'),
        | ${qualityCte("corpus")},
        | keptq AS (
        |  SELECT c.doc_id, c.text FROM corpus c
        |  JOIN lang USING (doc_id) JOIN qual USING (doc_id)
        |  WHERE qual.quality >= 0.5),
        | rtok AS (SELECT doc_id,
        |   string_split_regex(trim(lower(text)), '\\s+') AS w FROM keptq),
        | rg2 AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
        |  FROM rtok, UNNEST(range(1, len(w))) AS u(i)),
        | rc2 AS (SELECT doc_id, g, count(*) AS c FROM rg2 GROUP BY 1, 2),
        | rf2 AS (SELECT doc_id, CAST(max(c) AS DOUBLE)
        |   / CAST(sum(c) AS DOUBLE) AS t2 FROM rc2 GROUP BY 1),
        | rg3 AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM rtok, UNNEST(range(1, len(w)-1)) AS u(i)),
        | rc3 AS (SELECT doc_id, g, count(*) AS c FROM rg3 GROUP BY 1, 2),
        | rf3 AS (SELECT doc_id, CAST(max(c) AS DOUBLE)
        |   / CAST(sum(c) AS DOUBLE) AS t3 FROM rc3 GROUP BY 1),
        | keptr AS (
        |  SELECT k.doc_id, k.text FROM keptq k
        |  LEFT JOIN rf2 USING (doc_id) LEFT JOIN rf3 USING (doc_id)
        |  WHERE coalesce(t2, 0) <= 0.10 AND coalesce(t3, 0) <= 0.08),
        | dtok AS (SELECT doc_id,
        |   string_split_regex(trim(lower(text)), '\\s+') AS w FROM keptr),
        | dsh AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |   SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |     || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
        |     || ' ' || w[i+7] AS g
        |   FROM dtok, UNNEST(range(1, len(w) - 6)) AS u(i)
        |   WHERE len(w) >= 8
        |   UNION ALL
        |   SELECT doc_id, array_to_string(w, ' ') FROM dtok
        |   WHERE len(w) < 8)),
        | btok AS (SELECT doc_id,
        |   string_split_regex(trim(lower(text)), '\\s+') AS w
        |  FROM documents WHERE doc_id % 10 = 0),
        | bsh AS (
        |  SELECT DISTINCT g FROM (
        |   SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |     || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
        |     || ' ' || w[i+7] AS g
        |   FROM btok, UNNEST(range(1, len(w) - 6)) AS u(i)
        |   WHERE len(w) >= 8
        |   UNION ALL
        |   SELECT array_to_string(w, ' ') FROM btok WHERE len(w) < 8)),
        | flagged AS (SELECT DISTINCT d.doc_id FROM dsh d JOIN bsh USING (g)),
        | clean AS (SELECT doc_id, text FROM keptr
        |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
        | ${ngramExCte("clean")},
        | $edgesReachCte,
        | losers AS (
        |  SELECT id FROM (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |  WHERE id <> comp),
        | fin AS (SELECT doc_id, text FROM clean
        |  WHERE doc_id NOT IN (SELECT id FROM losers))
        | SELECT (SELECT count(*) FROM corpus) AS n_corpus,
        |  (SELECT count(*) FROM lang) AS n_en,
        |  (SELECT count(*) FROM keptq) AS n_quality,
        |  (SELECT count(*) FROM keptr) AS n_repetition,
        |  (SELECT count(*) FROM clean) AS n_decontam,
        |  (SELECT count(*) FROM fin) AS n_final,
        |  (SELECT count(*) FROM fin WHERE
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |     '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'),
        |     '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PHONE]', 'g'),
        |     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g')
        |    = text) AS n_pii_clean""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE ${ngramExCte("documents")},
        | $edgesReachCte
        | SELECT id AS doc_id, min(comp) AS cluster_rep
        | FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // Keep-best-per-cluster: same reachability components, then each
    // component keeps its longest member (n_chars desc, id asc).
    "dedup_keep_best" ->
      s"""WITH RECURSIVE ${ngramExCte("documents")},
        | $edgesReachCte,
        | comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
        | scored AS (SELECT c.id, c.comp, d.n_chars FROM comps c
        |  JOIN documents d ON d.doc_id = c.id),
        | win AS (SELECT id, row_number() OVER (PARTITION BY comp
        |   ORDER BY n_chars DESC, id ASC) AS rn FROM scored),
        | losers AS (SELECT id FROM win WHERE rn <> 1)
        | SELECT doc_id, n_chars FROM documents
        | WHERE doc_id NOT IN (SELECT id FROM losers)
        | ORDER BY doc_id""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH ${ngramExCte("documents")}
        | SELECT 'minhash_lsh' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass, true AS precision_pass""".stripMargin,
    // The verified-LSH surface emits TRUE Jaccard values and, at this
    // corpus, banding recall is 1.0 (seed-deterministic) while FPs are
    // impossible by construction — so the exact pair recomputation IS
    // the value-level oracle.
    "dedup_minhash_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM tok, UNNEST(range(1, len(w)-1)) AS u(i)),
        | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        | inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        | SELECT id_a, id_b,
        |  CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
        | FROM inter
        | JOIN sz sa ON sa.doc_id = id_a
        | JOIN sz sb ON sb.doc_id = id_b
        | WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
        | ORDER BY id_a, id_b""".stripMargin,
    // Incremental near-dup = exact pairs with at least one side in the
    // new batch; id_b is the pair max, so "id_b >= cutoff" is exactly
    // "touches the batch". The cutoff mirrors the query's integer
    // arithmetic ((max_id+1)*4//5 — 400 at sf0.01) so the two can't
    // diverge across scale factors.
    "dedup_minhash_incr" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM tok, UNNEST(range(1, len(w)-1)) AS u(i)),
        | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        | inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        | SELECT id_a, id_b,
        |  CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
        | FROM inter
        | JOIN sz sa ON sa.doc_id = id_a
        | JOIN sz sb ON sb.doc_id = id_b
        | WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
        |  AND id_b >= (SELECT (max(doc_id) + 1) * 4 // 5 FROM documents)
        | ORDER BY id_a, id_b""".stripMargin,
    // Digit-for-digit DuckDB replica of Dedup.simhash (md5-based 60-bit
    // token hash, sign-sum bits) + brute-force hamming ≤ 3 — equals the
    // pigeonhole-banded Spark output because banding emits the EXACT
    // hamming ball.
    "dedup_simhash_pairs" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        | th AS (
        |  SELECT doc_id,
        |   list_reduce(
        |     list_transform(string_split(substr(md5(tok), 1, 15), ''),
        |       c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |     (acc, d) -> acc * 16 + d) AS h
        |  FROM tok),
        | bits AS (
        |  SELECT doc_id, i, sum(((h >> i) & 1) * 2 - 1) AS bitsum
        |  FROM th, range(0, 60) AS r(i)
        |  GROUP BY doc_id, i),
        | simh AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN bitsum > 0
        |    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id)
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        | FROM simh a JOIN simh b ON a.doc_id < b.doc_id
        | WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        | ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash" ->
      s"""WITH ${ngramExCte("documents")}
        | SELECT 'simhash' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass, true AS precision_pass""".stripMargin,
    "sim_lsh_topk" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'lsh_topk' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    // PCA: the eigensolve has no SQL form — in-query invariant gates
    // (orthonormality, eigenvalue order, variance share, projected-
    // column variance == eigenvalue) verify it; the oracle pins the
    // corpus size and the expected gate outcomes.
    "sim_pca" ->
      """SELECT 'pca' AS family, count(*) AS n_vecs,
        | true AS orthonormal_pass, true AS eigs_sorted_pass,
        | true AS var_explained_pass, true AS proj_var_pass
        | FROM embeddings""".stripMargin,
    "sim_rproj_topk" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'rproj_topk' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    "sim_ivf_topk" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'ivf_topk' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    // Same exact-side recompute as the ivf_topk gate — the appended
    // index must reach the same brute-force reference over the FULL
    // corpus (append-after-train retrievability).
    "sim_ivf_append" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'ivf_append' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    // kNN graph: the oracle recomputes the exact all-nodes top-5 edge
    // count; recall is seed-deterministic, gate stated.
    "sim_knn_graph" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 100 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'knn_graph' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    "sim_cosine_neardup" ->
      """WITH ex AS (
        | SELECT q.vec_id AS id_a, c.vec_id AS id_b
        | FROM embeddings q CROSS JOIN embeddings c
        | WHERE q.vec_id < c.vec_id
        |  AND list_cosine_similarity(q.embedding, c.embedding) >= 0.35)
        | SELECT 'cosine_neardup' AS family,
        |  (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass, true AS precision_pass""".stripMargin,
    // LSH near-dup at the verification-scale operating point has
    // measured recall 1.0 (seed-deterministic) and zero FPs by
    // construction (true-cosine scoring) — so the exact pair
    // recomputation IS the value-level oracle. Threshold safety: the
    // nearest corpus pair sits 2.9e-5 from 0.35 while cross-engine
    // cosine deviation is ≤ 2.4e-7.
    "sim_neardup_pairs" ->
      """SELECT q.vec_id AS id_a, c.vec_id AS id_b
        | FROM embeddings q CROSS JOIN embeddings c
        | WHERE q.vec_id < c.vec_id
        |  AND list_cosine_similarity(q.embedding, c.embedding) >= 0.35
        | ORDER BY id_a, id_b""".stripMargin,
    "sample_stratified" ->
      """SELECT label, CAST(ceil(0.1 * count(*)) AS BIGINT) AS n_sampled
        | FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "sample_split" ->
      """SELECT 'hash_split' AS family, count(*) AS n_total,
        | true AS coverage_pass, true AS train_pass, true AS val_pass,
        | true AS test_pass
        | FROM documents""".stripMargin,
    // Seeded shuffle-to-shards: the oracle recomputes the md5-60 draw
    // (shared h60 fragment) and the per-shard rank exactly.
    "sample_shuffle" ->
      s"""WITH h AS (
        |  SELECT doc_id, ${h60Sql("shuffle", 42, "doc_id")} AS hh
        |  FROM documents)
        | SELECT doc_id, CAST(hh % 16 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY hh % 16
        |    ORDER BY hh, doc_id) - 1 AS INT) AS pos
        | FROM h ORDER BY shard, pos""".stripMargin,
    // Exactly-n seeded sample: the oracle replays the portable draw
    // and the top-100 cut literally — ORDER BY draw LIMIT n IS the
    // operator's contract.
    "sample_exact_n" ->
      s"""SELECT doc_id, draw FROM (
        |  SELECT doc_id, ${h60Sql("exactn", 42, "doc_id")} AS draw
        |  FROM documents ORDER BY draw, doc_id LIMIT 100)
        | ORDER BY doc_id""".stripMargin,
    // Leakage-safe split: clusters recomputed via the shared exact-
    // Jaccard reachability CTEs, then the identical md5-60 draw on the
    // cluster representative — every assignment replayed value-level.
    "sample_leakage_safe" ->
      s"""WITH RECURSIVE ${ngramExCte("documents")},
        | $edgesReachCte,
        | comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
        | k AS (SELECT doc_id, coalesce(c.comp, doc_id) AS split_key
        |  FROM documents LEFT JOIN comps c ON c.id = doc_id)
        | SELECT doc_id, split_key,
        |  CASE WHEN ${h60Sql("lsplit", 42, "split_key")} % 1000000 < 800000
        |   THEN 'train' ELSE 'test' END AS split
        | FROM k ORDER BY doc_id""".stripMargin,
    // Weighted sample: the oracle replays the Efraimidis–Spirakis
    // −ln(u)/w key from the identical portable draw (u's 2^60 scaling
    // is a power of two — exact; ln agrees to ≤1 ulp, far from any
    // selection cutoff).
    "sample_weighted" ->
      s"""SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0
        |  ORDER BY -ln((CAST(${h60Sql("wsample", 42, "doc_id")} AS DOUBLE) + 1)
        |    / 1152921504606846976.0) / CAST(n_chars AS DOUBLE), doc_id
        |  LIMIT 100)
        | ORDER BY doc_id""".stripMargin,
    // Classifier filter: the in-query gates (monotone training loss,
    // holdout accuracy >= 0.85 on the weak long-doc label) are
    // computed by the engine; the oracle pins the corpus size and the
    // gates' expected values.
    "text_classifier" ->
      """SELECT 'text_classifier' AS family, count(*) AS n_docs,
        | true AS loss_monotone, true AS holdout_acc_pass
        | FROM documents""".stripMargin,
    // Expectation gate: per-rule conditional sums (NULL predicate =
    // violation) + the FK orphan count, all recomputed.
    "dq_expectations" ->
      """SELECT rule, n_rows, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'qty_range' AS rule, count(*) AS n_rows,
        |   CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
        |     AS BIGINT) AS n_violations FROM lineitem
        |  UNION ALL
        |  SELECT 'qty_under_25', count(*),
        |   CAST(sum(CASE WHEN l_quantity <= 25 THEN 0 ELSE 1 END) AS BIGINT)
        |   FROM lineitem
        |  UNION ALL
        |  SELECT 'price_positive', count(*),
        |   CAST(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END)
        |     AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'returnflag_domain', count(*),
        |   CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
        |     AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'fk_orders', (SELECT count(*) FROM lineitem),
        |   (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL))
        | ORDER BY rule""".stripMargin,
    // Column profile: every cell (null/distinct/min/max-as-string)
    // recomputed per column. Both engines render BIGINT and DOUBLE
    // casts with shortest-roundtrip decimal below 1e7, so the string
    // forms agree.
    // IQR outliers: rank-exact quartiles (value at ceil(p*n) of the
    // ascending per-group sort — real data values, no interpolation)
    // so fences and flags are bit-identical across engines; the fence
    // arithmetic runs the same IEEE op sequence on both sides.
    "dq_outliers" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice) AS rn,
        |   count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        | q AS (
        |  SELECT l_returnflag,
        |   max(CASE WHEN rn = ceil(n * 0.25) THEN v END) AS q1,
        |   max(CASE WHEN rn = ceil(n * 0.75) THEN v END) AS q3
        |  FROM r GROUP BY l_returnflag),
        | f AS (
        |  SELECT l_returnflag, q1, q3,
        |   q1 - 1.5 * (q3 - q1) AS lo_fence,
        |   q3 + 1.5 * (q3 - q1) AS hi_fence FROM q)
        | SELECT r.l_returnflag, count(*) AS n_rows, q1, q3,
        |  lo_fence, hi_fence,
        |  count(*) FILTER (WHERE v < lo_fence OR v > hi_fence)
        |    AS n_outliers
        | FROM r JOIN f USING (l_returnflag)
        | GROUP BY r.l_returnflag, q1, q3, lo_fence, hi_fence
        | ORDER BY l_returnflag""".stripMargin,
    "dq_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
        |   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_nulls,
        |   count(DISTINCT o_orderkey) AS n_distinct,
        |   CAST(min(o_orderkey) AS VARCHAR) AS min_value,
        |   CAST(max(o_orderkey) AS VARCHAR) AS max_value FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |   CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |   count(DISTINCT o_custkey),
        |   CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*),
        |   CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
        |     AS BIGINT),
        |   count(DISTINCT o_orderpriority),
        |   CAST(min(o_orderpriority) AS VARCHAR),
        |   CAST(max(o_orderpriority) AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |   CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |     AS BIGINT),
        |   count(DISTINCT o_totalprice),
        |   CAST(min(o_totalprice) AS VARCHAR),
        |   CAST(max(o_totalprice) AS VARCHAR) FROM orders)
        | ORDER BY "column"""".stripMargin,
    "sample_quota" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_orderkey""".stripMargin,
    // Deterministic rate sampling: the identical md5-60 draw and rate
    // CASE, so the kept set matches row for row.
    "sample_rates" ->
      s"""SELECT vec_id, label FROM embeddings
        | WHERE (${h60Sql("rate", 42, "vec_id")} % 1000000) <
        |  CASE label WHEN 0 THEN 1000000 WHEN 1 THEN 750000
        |   WHEN 2 THEN 500000 WHEN 3 THEN 250000 WHEN 4 THEN 100000
        |   ELSE 50000 END
        | ORDER BY vec_id""".stripMargin,
    // Temperature mixture at alpha=0.5: cut = round(sqrt(n_min/n)*1e6)
    // is bit-exact cross-engine (division and sqrt are IEEE-correctly-
    // rounded), and the draw is the identical md5-60 arithmetic. The
    // cut join is NULL-SAFE, mirroring temperatureSample's `<=>`.
    // Epoch upsampling: the same integer base/cut literals the engine
    // baked driver-side (floor(w), round(frac(w)*1e6)) + the identical
    // md5-60 lottery; generate_series replays the copy fan-out.
    "sample_epochs" ->
      s"""WITH w AS (
        |  SELECT doc_id, lang,
        |   CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1 WHEN 'es' THEN 2
        |     WHEN 'fr' THEN 3 WHEN 'zh' THEN 2 ELSE 1 END AS base,
        |   CASE lang WHEN 'en' THEN 800000 WHEN 'de' THEN 500000
        |     WHEN 'es' THEN 250000 WHEN 'fr' THEN 0 WHEN 'zh' THEN 500000
        |     ELSE 0 END AS cut
        |  FROM documents),
        | n AS (
        |  SELECT doc_id, lang, base + CASE
        |    WHEN (${h60Sql("epoch", 42, "doc_id")} % 1000000) < cut
        |    THEN 1 ELSE 0 END AS ne
        |  FROM w)
        | SELECT doc_id, lang, CAST(t.e AS BIGINT) AS epoch
        | FROM n, LATERAL (SELECT unnest(generate_series(0,
        |   CAST(ne AS BIGINT) - 1)) AS e) t
        | WHERE ne > 0 ORDER BY doc_id, epoch""".stripMargin,
    "sample_temperature" ->
      s"""WITH ${tempCutCte("documents")}
        | SELECT d.doc_id, d.source, tcut.cut
        | FROM documents d
        | JOIN tcut ON d.source IS NOT DISTINCT FROM tcut.source
        | WHERE (${h60Sql("temp", 7, "doc_id")} % 1000000) < tcut.cut
        | ORDER BY doc_id""".stripMargin,
    // SemDeDup verdict: brute-force exact pairs at the recall-1.0
    // operating point, recursive reachability, min-id canonicals,
    // singletons via left join.
    "sim_semdedup" ->
      s"""WITH RECURSIVE ex AS (
        |  SELECT q.vec_id AS id_a, c.vec_id AS id_b
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < c.vec_id
        |   AND list_cosine_similarity(q.embedding, c.embedding) >= 0.35),
        | $edgesReachCte,
        | lab AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        | SELECT e.vec_id AS id,
        |  coalesce(l.comp, e.vec_id) AS cluster,
        |  coalesce(l.comp, e.vec_id) = e.vec_id AS is_canonical
        | FROM embeddings e LEFT JOIN lab l ON l.id = e.vec_id
        | ORDER BY id""".stripMargin,
    // Concat-then-chunk packing: same hash bucket, same (bucket, id)
    // layout order, same start-offset chunk assignment via window
    // cumsum.
    "pack_sequences" ->
      s"""WITH tc AS (
        |  SELECT doc_id,
        |   CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
        |     AS BIGINT) AS n_tokens,
        |   CAST(${h60Sql("pack", 42, "doc_id")} % 8 AS INT) AS bucket
        |  FROM documents),
        | c AS (SELECT doc_id, bucket, n_tokens,
        |   sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |     ROWS UNBOUNDED PRECEDING) - n_tokens AS prev FROM tc)
        | SELECT doc_id, bucket, CAST(prev // 256 AS BIGINT) AS seq_id,
        |  n_tokens
        | FROM c ORDER BY doc_id""".stripMargin,
    // Length-bucketed batching: bucket = CASE-sum over the boundary
    // list, shard = portable hash mod 4, rank/batch/batch-max windows
    // recomputed with identical arithmetic.
    "pack_length_batches" ->
      s"""WITH tc AS (
        |  SELECT doc_id,
        |   CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
        |     AS BIGINT) AS n_tokens,
        |   CAST(${h60Sql("lenbatch", 42, "doc_id")} % 4 AS INT) AS shard
        |  FROM documents),
        | b AS (SELECT doc_id, n_tokens,
        |   (CASE WHEN n_tokens >= 16 THEN 1 ELSE 0 END
        |    + CASE WHEN n_tokens >= 32 THEN 1 ELSE 0 END
        |    + CASE WHEN n_tokens >= 64 THEN 1 ELSE 0 END
        |    + CASE WHEN n_tokens >= 128 THEN 1 ELSE 0 END) AS bucket,
        |   shard FROM tc),
        | r AS (SELECT doc_id, n_tokens, bucket, shard,
        |   CAST((row_number() OVER (PARTITION BY bucket, shard
        |     ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch_id FROM b)
        | SELECT doc_id, n_tokens, bucket, shard, batch_id,
        |  max(n_tokens) OVER (PARTITION BY bucket, shard, batch_id)
        |    AS batch_max,
        |  max(n_tokens) OVER (PARTITION BY bucket, shard, batch_id)
        |    - n_tokens AS pad_waste
        | FROM r ORDER BY doc_id""".stripMargin,
    // BPE training summary: n_words and the FIRST merge are
    // SQL-expressible (distinct-word histogram; adjacent-char-pair
    // argmax with the same (count desc, pair asc) tiebreak); the
    // merge-count monotonicity and cross-path symbol-conservation
    // gates are computed in-query and pinned true here.
    "text_bpe" ->
      raw"""WITH words AS (
        |  SELECT w AS word, count(*) AS cnt
        |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |          AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        | pairs AS (
        |  SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
        |   CAST(sum(cnt) AS BIGINT) AS c
        |  FROM words, LATERAL (SELECT unnest(generate_series(1,
        |    length(word) - 1)) AS i) t
        |  GROUP BY 1, 2)
        | SELECT 'text_bpe' AS family,
        |  (SELECT count(*) FROM words) AS n_words,
        |  24 AS n_merges,
        |  (SELECT l || ' ' || r FROM pairs ORDER BY c DESC, l, r LIMIT 1)
        |    AS first_pair,
        |  true AS merges_nonincreasing, true AS conservation_ok""".stripMargin,
    // Sliding-window chunking (window 32, step 24): integer boundary
    // arithmetic and the chunk text itself recomputed exactly.
    "pack_chunks" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | ch AS (
        |  SELECT doc_id, w, len(w) AS n,
        |   CASE WHEN len(w) <= 32 THEN 1
        |        ELSE CAST((len(w) - 32 + 23) // 24 AS INT) + 1 END AS nc
        |  FROM tok)
        | SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |  CAST(i * 24 AS INT) AS tok_start,
        |  CAST(least(i * 24 + 32, n) AS INT) AS tok_end,
        |  array_to_string(
        |    list_slice(w, i * 24 + 1, least(i * 24 + 32, n)), ' ')
        |    AS chunk_text
        | FROM ch, UNNEST(range(0, nc)) AS u(i)
        | ORDER BY doc_id, chunk_id""".stripMargin,
    // Global token-budget shard layout: ONE window cumsum over the
    // (md5-60 hash, doc_id) total order — the oracle is allowed the
    // global sort the Spark side decomposes into two phases.
    "pack_shards" ->
      raw"""WITH tc AS (
        |  SELECT doc_id,
        |   CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |     AS BIGINT) AS n_tokens,
        |   ${h60Sql("shard", 42, "doc_id")} AS ord
        |  FROM documents),
        | c AS (SELECT doc_id, n_tokens,
        |   CAST(sum(n_tokens) OVER (ORDER BY ord, doc_id
        |     ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
        |     AS tok_start FROM tc)
        | SELECT doc_id, n_tokens, tok_start,
        |  CAST(tok_start // 512 AS BIGINT) AS shard_id
        | FROM c ORDER BY doc_id""".stripMargin,
    "domains_profile" ->
      raw"""SELECT source AS domain, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |    AS BIGINT) AS sum_tokens,
        |  count(DISTINCT lower(trim(text))) AS n_distinct_texts,
        |  count(DISTINCT lang) AS n_langs
        | FROM documents GROUP BY source ORDER BY domain""".stripMargin,
    "domains_filter" ->
      s"""WITH ${domainGateCte("documents")}
        | SELECT doc_id, source FROM gated
        | ORDER BY doc_id""".stripMargin,
    // The whole mix-building funnel recomputed stage by stage: domain
    // gates → min-id exact-dedup representatives → α=0.5 temperature
    // cuts over the SURVIVING corpus → global token cumsum in the
    // epoch-shuffle order → 512-token shards.
    "mixture_pipeline" ->
      s"""WITH ${domainGateCte("documents")},
        | reps AS (SELECT min(doc_id) AS doc_id FROM gated
        |  GROUP BY lower(trim(text))),
        | dd AS (SELECT g.doc_id, g.source, g.text FROM gated g
        |  JOIN reps USING (doc_id)),
        | ${tempCutCte("dd")},
        | mixed AS (SELECT dd.doc_id, dd.text FROM dd
        |  JOIN tcut ON dd.source IS NOT DISTINCT FROM tcut.source
        |  WHERE (${h60Sql("temp", 7, "doc_id")} % 1000000) < tcut.cut),
        | tc AS (SELECT doc_id,
        |   CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
        |     AS BIGINT) AS n_tokens,
        |   ${h60Sql("shard", 42, "doc_id")} AS ord FROM mixed),
        | cum AS (SELECT doc_id, n_tokens,
        |   CAST(sum(n_tokens) OVER (ORDER BY ord, doc_id
        |     ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
        |     AS tok_start FROM tc)
        | SELECT doc_id, n_tokens, tok_start,
        |  CAST(tok_start // 512 AS BIGINT) AS shard_id
        | FROM cum ORDER BY doc_id""".stripMargin,
    // Quartile banding: integer scores + quarter fractions ⇒ the
    // type-7 interpolation (pos = p·(n−1)) is exact binary arithmetic
    // in both engines; round(…, 6) on the cuts is then a no-op guard.
    "domains_bands" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, source,
        |   len(string_split_regex(trim(lower(text)), '\s+')) AS ws_tokens
        |  FROM documents),
        | b AS (
        |  SELECT source,
        |   quantile_cont(ws_tokens, [0.25, 0.5, 0.75]) AS cuts
        |  FROM tok GROUP BY source)
        | SELECT t.doc_id, t.source, t.ws_tokens,
        |  ((CASE WHEN t.ws_tokens > round(cuts[1], 6) THEN 1 ELSE 0 END)
        |  + (CASE WHEN t.ws_tokens > round(cuts[2], 6) THEN 1 ELSE 0 END)
        |  + (CASE WHEN t.ws_tokens > round(cuts[3], 6) THEN 1 ELSE 0 END))
        |    AS band
        | FROM tok t JOIN b ON t.source IS NOT DISTINCT FROM b.source
        | ORDER BY doc_id""".stripMargin,
    // Duplicated spans (window 15, df>=2): rolling windows -> df
    // semi-join -> per-doc gaps-and-islands; the oracle keys windows
    // by their TEXT (collision-free) where the Spark side uses the
    // md5-60 hash — ExtSpec asserts both modes identical here.
    "dedup_spans" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | pos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i,
        |   array_to_string(list_slice(w, CAST(i + 1 AS INT),
        |     CAST(i + 15 AS INT)), ' ') AS k
        |  FROM tok, UNNEST(range(0, len(w) - 15 + 1)) AS u(i)
        |  WHERE len(w) >= 15),
        | hit AS (SELECT doc_id, i FROM pos
        |  WHERE k IN (SELECT k FROM pos GROUP BY k HAVING count(*) >= 2)),
        | isl AS (
        |  SELECT doc_id, i, CASE WHEN
        |    max(i + 15) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |    OR i > max(i + 15) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |   THEN 1 ELSE 0 END AS nw FROM hit),
        | grp AS (SELECT doc_id, i, sum(nw) OVER (PARTITION BY doc_id
        |   ORDER BY i ROWS UNBOUNDED PRECEDING) AS g FROM isl)
        | SELECT doc_id, min(i) AS span_start, max(i) + 15 AS span_end,
        |  count(*) AS n_windows
        | FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin,
    // Span-dedup applied: same window/df machinery, per-occurrence
    // keep = non-duplicated OR global-first owner; a token is dropped
    // iff covered by a redundant island and no kept island.
    "dedup_strip_spans" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | pos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i,
        |   array_to_string(list_slice(w, CAST(i + 1 AS INT),
        |     CAST(i + 15 AS INT)), ' ') AS k
        |  FROM tok, UNNEST(range(0, len(w) - 15 + 1)) AS u(i)
        |  WHERE len(w) >= 15),
        | st AS (
        |  SELECT doc_id, i,
        |   (count(*) OVER (PARTITION BY k) < 2 OR
        |    row_number() OVER (PARTITION BY k ORDER BY doc_id, i) = 1)
        |     AS keep
        |  FROM pos),
        | isl AS (
        |  SELECT doc_id, i, keep, CASE WHEN
        |    max(i + 15) OVER (PARTITION BY doc_id, keep ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |    OR i > max(i + 15) OVER (PARTITION BY doc_id, keep ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |   THEN 1 ELSE 0 END AS nw FROM st),
        | grp AS (SELECT doc_id, i, keep, sum(nw) OVER (
        |   PARTITION BY doc_id, keep ORDER BY i
        |   ROWS UNBOUNDED PRECEDING) AS g FROM isl),
        | iv AS (SELECT doc_id, keep, min(i) AS s, max(i) + 15 AS e
        |  FROM grp GROUP BY doc_id, keep, g),
        | tj AS (SELECT doc_id, w, CAST(j AS BIGINT) - 1 AS j,
        |   w[CAST(j AS INT)] AS tokw
        |  FROM tok, UNNEST(range(1, len(w) + 1)) AS u(j)),
        | kt AS (
        |  SELECT t.doc_id, t.j, t.tokw,
        |   NOT (EXISTS (SELECT 1 FROM iv r WHERE NOT r.keep
        |         AND r.doc_id = t.doc_id AND t.j >= r.s AND t.j < r.e)
        |    AND NOT EXISTS (SELECT 1 FROM iv p WHERE p.keep
        |         AND p.doc_id = t.doc_id AND t.j >= p.s AND t.j < p.e))
        |    AS kp
        |  FROM tj t)
        | SELECT doc_id,
        |  coalesce(string_agg(tokw, ' ' ORDER BY j)
        |    FILTER (WHERE kp), '') AS text,
        |  count(*) - count(*) FILTER (WHERE kp) AS n_tokens_removed
        | FROM kt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Line-level dedup inventory over the 10-token line wrap: trimmed
    // lines >=5 chars in >=2 distinct docs, with doc and occurrence
    // counts.
    "dedup_lines" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | lines AS (
        |  SELECT doc_id,
        |   trim(array_to_string(w[(i*10+1):(i*10+10)], ' ')) AS line
        |  FROM tok, UNNEST(range(0, (len(w) - 1) // 10 + 1)) AS u(i))
        | SELECT line, count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_occurrences
        | FROM lines WHERE length(line) >= 5
        | GROUP BY line HAVING count(DISTINCT doc_id) >= 2
        | ORDER BY line""".stripMargin,
    // Line-dedup applied: EVERY occurrence of a duplicated line
    // removed (boilerplate semantics), docs rebuilt from survivors in
    // order; short lines never count and never drop.
    "dedup_strip_lines" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | lines AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |   array_to_string(w[(i*10+1):(i*10+10)], ' ') AS line
        |  FROM tok, UNNEST(range(0, (len(w) - 1) // 10 + 1)) AS u(i)),
        | dup AS (
        |  SELECT trim(line) AS tl FROM lines
        |  WHERE length(trim(line)) >= 5
        |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
        | kept AS (
        |  SELECT l.doc_id, l.pos, l.line FROM lines l
        |  LEFT JOIN dup d ON length(trim(l.line)) >= 5
        |    AND trim(l.line) = d.tl
        |  WHERE d.tl IS NULL),
        | tot AS (SELECT doc_id, count(*) AS n_lines FROM lines
        |  GROUP BY doc_id),
        | reb AS (SELECT doc_id,
        |   string_agg(line, chr(10) ORDER BY pos) AS text,
        |   count(*) AS n_kept FROM kept GROUP BY doc_id)
        | SELECT t.doc_id, coalesce(r.text, '') AS text,
        |  t.n_lines - coalesce(r.n_kept, 0) AS n_lines_removed
        | FROM tot t LEFT JOIN reb r USING (doc_id)
        | ORDER BY t.doc_id""".stripMargin,
    // Winnowing: the oracle rebuilds the word 3-gram hash sequence and
    // replays the same four aligned-frame (hash, -pos) minima — a row
    // Stupid backoff (Brants 2007), trained on the even doc_ids,
    // scored over all docs: trigram stage c3/c12, else 0.4*c23/c2,
    // else 0.16*(c3+0.5)/(N+0.5) — operand order mirrors the Scala
    // expression exactly so the doubles agree to the 6-decimal round.
    "text_lm_backoff" ->
      raw"""WITH tokall AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | tr AS (SELECT w FROM tokall WHERE doc_id % 2 = 0),
        | tri AS (
        |  SELECT w[i] AS g0, w[i+1] AS g1, w[i+2] AS g2, count(*) AS n3
        |  FROM tr, UNNEST(range(1, len(w)-1)) AS u(i) GROUP BY 1, 2, 3),
        | bi AS (
        |  SELECT w[i] AS g0, w[i+1] AS g1, count(*) AS n2
        |  FROM tr, UNNEST(range(1, len(w))) AS u(i) GROUP BY 1, 2),
        | uni AS (
        |  SELECT tk, count(*) AS n1 FROM tr, UNNEST(w) AS t(tk)
        |  GROUP BY 1),
        | tot AS (SELECT sum(n1) AS nn FROM uni),
        | tg AS (
        |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
        |  FROM tokall, UNNEST(range(1, len(w)-1)) AS u(i)),
        | sc AS (
        |  SELECT tg.doc_id,
        |   CASE WHEN tri.n3 IS NOT NULL
        |        THEN ln(CAST(tri.n3 AS DOUBLE) / b12.n2)
        |        WHEN b23.n2 IS NOT NULL THEN ln(0.4 * b23.n2 / u2.n1)
        |        ELSE ln(0.16000000000000003 * (COALESCE(u3.n1, 0) + 0.5)
        |                / (tot.nn + 0.5)) END AS s,
        |   tri.n3 IS NULL AS bo, u3.n1 IS NULL AS oov
        |  FROM tg
        |  LEFT JOIN tri ON tri.g0 = w1 AND tri.g1 = w2 AND tri.g2 = w3
        |  LEFT JOIN bi b12 ON b12.g0 = w1 AND b12.g1 = w2
        |  LEFT JOIN bi b23 ON b23.g0 = w2 AND b23.g1 = w3
        |  LEFT JOIN uni u2 ON u2.tk = w2
        |  LEFT JOIN uni u3 ON u3.tk = w3
        |  CROSS JOIN tot)
        | SELECT doc_id, round(avg(s), 6) AS lm_score,
        |  count(*) AS n_trigrams,
        |  count(*) FILTER (WHERE bo) AS n_backoff,
        |  count(*) FILTER (WHERE oov) AS n_oov
        | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // C4 heuristic cleaning over the SAME 10-token wrap as the
    // line-dedup oracles: line gate (>= 6 words, no banned substring),
    // doc gate (no lorem-ipsum/brace in the lined text, >= 3 surviving
    // lines), clean_text rebuilt from the surviving lines in order.
    // count(*) FILTER keeps n_kept BIGINT (a sum(CASE) would widen to
    // HUGEINT — the pack_shards typing lesson).
    "text_c4_clean" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | lines AS (
        |  SELECT doc_id, i,
        |   trim(array_to_string(w[(i*10+1):(i*10+10)], ' ')) AS line
        |  FROM tok, UNNEST(range(0, (len(w) - 1) // 10 + 1)) AS u(i)),
        | flag AS (
        |  SELECT doc_id, i, line,
        |   (len(string_split_regex(line, '\s+')) >= 6
        |    AND length(line) > 0
        |    AND NOT contains(lower(line), 'javascript')
        |    AND NOT contains(lower(line), 'spark')) AS ok
        |  FROM lines),
        | agg AS (
        |  SELECT doc_id, count(*) AS n_lines,
        |   count(*) FILTER (WHERE ok) AS n_kept,
        |   string_agg(line, chr(10) ORDER BY i) AS full_text,
        |   string_agg(CASE WHEN ok THEN line END, chr(10) ORDER BY i)
        |     AS clean_text
        |  FROM flag GROUP BY doc_id)
        | SELECT doc_id, n_lines, n_kept, clean_text FROM agg
        | WHERE NOT contains(lower(full_text), 'lorem ipsum')
        |  AND NOT contains(lower(full_text), '{') AND n_kept >= 3
        | ORDER BY doc_id""".stripMargin,
    // is selected iff it is the rightmost minimum of SOME 4-window.
    "text_winnow" ->
      s"""WITH ${winnowCte("documents")}
        | SELECT doc_id, pos, fp FROM wsel
        | ORDER BY doc_id, pos""".stripMargin,
    // MOSS match step: distinct selected fingerprints per doc, the
    // same df>1000 hot-fingerprint drop, inverted-index self-join,
    // pairs sharing >= 2 fingerprints.
    "dedup_winnow_pairs" ->
      s"""WITH ${winnowCte("documents")},
        | wfp AS (SELECT DISTINCT doc_id, fp FROM wsel),
        | whot AS (SELECT fp FROM wfp GROUP BY fp HAVING count(*) > 1000),
        | wk AS (SELECT doc_id, fp FROM wfp
        |   WHERE fp NOT IN (SELECT fp FROM whot))
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS shared_fps
        | FROM wk a JOIN wk b ON a.fp = b.fp AND a.doc_id < b.doc_id
        | GROUP BY 1, 2 HAVING count(*) >= 2
        | ORDER BY id_a, id_b""".stripMargin,
    "text_fingerprint" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents)
        | SELECT 'fingerprint' AS family,
        |  (SELECT count(*) FROM d) AS n_docs,
        |  (SELECT count(DISTINCT w) FROM d) AS n_groups,
        |  true AS injective_pass, true AS consistent_pass""".stripMargin,
    // Karp-Rabin fold replicated exactly: per-token md5-60-bit hash mod
    // p, then acc = (acc*31 + th) mod p left-to-right (list_prepend
    // seeds the fold with 0, matching Spark's aggregate initial value).
    "text_fingerprint_raw" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents)
        | SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(w, t ->
        |        list_reduce(
        |          list_transform(string_split(substr(md5(t), 1, 15), ''),
        |            c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |          (acc, d) -> acc * 16 + d) % 2147483647)),
        |    (acc, th) -> (acc * 31 + th) % 2147483647) AS fingerprint
        | FROM tok ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""WITH ${langidRankedCte("documents")}
        | SELECT doc_id, lang AS predicted_lang FROM ranked
        | WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // Bigram-LM recomputation: identical token split, exact counts,
    // same Laplace smoothing (α=0.4); round(…,6) absorbs ln() ulp and
    // summation-order drift between engines.
    "text_lm_score" ->
      s"""WITH ${lmCte("documents")}
        | SELECT doc_id, lm_score, n_bigrams FROM lm
        | ORDER BY doc_id""".stripMargin,
    // CCNet end-to-end: LM score → per-language quartile RANK bands
    // (integer ntile under the (score, doc_id) total order — no float
    // quantile interpolation anywhere, bit-exact on any corpus) →
    // band-rate thinning.
    "quality_mixture" ->
      s"""WITH ${lmCte("documents")},
        | d AS (SELECT lm.doc_id, doc.lang, lm.lm_score
        |  FROM lm JOIN documents doc ON doc.doc_id = lm.doc_id),
        | bd AS (SELECT doc_id, lang, lm_score,
        |   ntile(4) OVER (PARTITION BY lang
        |     ORDER BY lm_score ASC, doc_id ASC) - 1 AS band
        |  FROM d)
        | SELECT doc_id, lang, lm_score, band FROM bd
        | WHERE (${h60Sql("rate", 11, "doc_id")} % 1000000) <
        |  CASE band WHEN 3 THEN 1000000 WHEN 2 THEN 500000
        |   WHEN 1 THEN 200000 ELSE 100000 END
        | ORDER BY doc_id""".stripMargin,
    // TF-IDF keywords: rank over the ROUNDED score with term tiebreak
    // (cross-engine deterministic despite ln's libm ulp drift).
    "text_tfidf" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | tf AS (
        |  SELECT doc_id, tk AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(w) AS tk FROM tok)
        |  GROUP BY doc_id, tk),
        | dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
        | n AS (SELECT count(*) AS n_docs FROM documents),
        | sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfq.df_docs,
        |   round(tf.tf * ln(CAST(n_docs AS DOUBLE) /
        |     CAST(df_docs AS DOUBLE)), 6) AS tfidf
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        | rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term ASC) AS kw_rank FROM sc)
        | SELECT doc_id, kw_rank, term, tf, df_docs, tfidf FROM rk
        | WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""".stripMargin,
    // Vocabulary head: top-20 terms by count; the cumulative share is
    // an exact-integer cumsum over the 20 selected rows divided by the
    // exact total (IEEE division + round 6 — bit-stable cross-engine).
    "text_vocab" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | tc AS (
        |  SELECT tk AS term, count(*) AS n_tokens
        |  FROM (SELECT unnest(w) AS tk FROM tok) GROUP BY tk),
        | tot AS (SELECT sum(n_tokens) AS total FROM tc),
        | top AS (SELECT term, n_tokens FROM tc
        |  ORDER BY n_tokens DESC, term ASC LIMIT 20)
        | SELECT
        |  row_number() OVER (ORDER BY n_tokens DESC, term ASC)
        |    AS vocab_rank,
        |  term, n_tokens,
        |  round(CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, term ASC
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(total AS DOUBLE),
        |    6) AS cum_share
        | FROM top CROSS JOIN tot ORDER BY vocab_rank""".stripMargin,
    // Gopher repetition signals recomputed the explode/group way (the
    // Spark side is a one-pass kernel): top-n-gram occupancy with
    // multiplicity, char-weighted duplicate-line fraction over the
    // line-ified view, duplicate-token fraction.
    "text_repetition" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | g2 AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
        |  FROM tok, UNNEST(range(1, len(w))) AS u(i)),
        | c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        | f2 AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE)
        |   / CAST(sum(c) AS DOUBLE), 6) AS top2gram_frac
        |  FROM c2 GROUP BY 1),
        | g3 AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM tok, UNNEST(range(1, len(w)-1)) AS u(i)),
        | c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        | f3 AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE)
        |   / CAST(sum(c) AS DOUBLE), 6) AS top3gram_frac
        |  FROM c3 GROUP BY 1),
        | ln AS (SELECT doc_id,
        |   unnest(string_split(replace(text, ' table ', chr(10)), chr(10)))
        |     AS line
        |  FROM documents),
        | lc AS (SELECT doc_id, line, count(*) AS c FROM ln GROUP BY 1, 2),
        | lf AS (SELECT doc_id,
        |   round(CAST(sum(CASE WHEN c > 1 THEN length(line) * c ELSE 0 END)
        |     AS DOUBLE) / CAST(sum(length(line) * c) AS DOUBLE), 6)
        |     AS dup_line_frac
        |  FROM lc GROUP BY 1),
        | tf AS (SELECT doc_id, round(CAST(len(w) - len(list_distinct(w))
        |   AS DOUBLE) / len(w), 6) AS dup_token_frac FROM tok)
        | SELECT doc_id, top2gram_frac, top3gram_frac, dup_line_frac,
        |  dup_token_frac
        | FROM f2 JOIN f3 USING (doc_id) JOIN lf USING (doc_id)
        |  JOIN tf USING (doc_id)
        | ORDER BY doc_id""".stripMargin,
    // PII scrub: same deterministic salting, same portable-regex
    // patterns (Java regex and RE2 agree on this restricted core),
    // every count and the redacted text recomputed.
    "pii_redact" ->
      raw"""WITH salted AS (
        |  SELECT doc_id, text ||
        |   CASE WHEN doc_id % 4 = 0
        |     THEN ' contact user' || doc_id || '@example.com'
        |    WHEN doc_id % 4 = 1
        |     THEN ' call 555-867-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
        |    WHEN doc_id % 4 = 2
        |     THEN ' host 10.0.' || (doc_id % 256) || '.7 up'
        |    ELSE '' END AS text
        |  FROM documents),
        | counted AS (
        |  SELECT doc_id,
        |   CAST(len(regexp_extract_all(text,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |     AS n_email,
        |   CAST(len(regexp_extract_all(text,
        |     '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
        |   CAST(len(regexp_extract_all(text,
        |     '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INT) AS n_phone,
        |   CAST(len(regexp_extract_all(text,
        |     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
        |   regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |     '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |     '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
        |     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')
        |     AS text_redacted
        |  FROM salted)
        | SELECT doc_id, n_email, n_ssn, n_phone, n_ipv4, text_redacted,
        |  (n_email > 0 OR n_ssn > 0 OR n_phone > 0 OR n_ipv4 > 0) AS has_pii
        | FROM counted ORDER BY doc_id""".stripMargin,
    // Benchmark decontamination: string-level 8-gram overlap between
    // the corpus (doc_id % 10 <> 0) and the benchmark slice
    // (doc_id % 10 = 0), whole-doc gram for sub-8-token docs (the
    // shingle-kernel convention).
    "decontam_overlap" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        | sh AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |   SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |     || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
        |     || ' ' || w[i+7] AS g
        |   FROM tok, UNNEST(range(1, len(w) - 6)) AS u(i)
        |   WHERE len(w) >= 8
        |   UNION ALL
        |   SELECT doc_id, array_to_string(w, ' ') FROM tok
        |   WHERE len(w) < 8)),
        | bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0)
        | SELECT s.doc_id, count(*) AS n_hits
        | FROM sh s JOIN bench b USING (g)
        | WHERE s.doc_id % 10 <> 0
        | GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "sim_vector_dim_stats" ->
      """SELECT label, i - 1 AS dim,
        | round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_v,
        | round(max(CAST(embedding[i] AS DOUBLE)), 6) AS max_v,
        | count(*) AS n
        | FROM embeddings, range(1, 9) AS t(i)
        | GROUP BY label, i ORDER BY label, dim""".stripMargin,
    "sim_cosine_topk" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id)
        | WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // The same exact scorer restricted to the sub-0.5 cosine band:
    // hard negatives are the top of what's left BELOW the positive
    // threshold. Both engines fold the dot product in ascending index
    // order over doubles, so the band membership test is bit-stable
    // (the established posture of sim_neardup_pairs' threshold).
    "sim_hard_negatives" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
        |    AND list_cosine_similarity(q.embedding, c.embedding) < 0.5)
        | WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // Seeded JL random projection: the oracle reconstructs the SAME
    // Achlioptas matrix (md5-60 of the flat index r*64+j, mod 6 →
    // +1/0/−1) and refolds the SAME ascending-j double sum
    // (list_sum over an ORDER BY j list ≡ the kernel's loop), scaled
    // by sqrt(3/k); round(…,6) absorbs the last-ulp divergence class.
    // Cluster-balanced sampling: the oracle rebuilds the 8-row JL
    // matrix, refolds the same ascending-j double sums, derives the
    // sign-bit cluster, and replays the per-cluster portable-hash
    // lottery — every kept row value-exact.
    "sim_cluster_balanced" ->
      s"""WITH rmat AS (
        |  SELECT tk.k AS k, tj.j AS j,
        |   CASE (${h60Sql("rproj", 42, "tk.k*64 + tj.j")}) % 6
        |     WHEN 0 THEN 1 WHEN 5 THEN -1 ELSE 0 END AS r
        |  FROM generate_series(0,3) tk(k), generate_series(0,63) tj(j)),
        | ex AS (
        |  SELECT vec_id,
        |   unnest(list_zip(embedding, range(0, len(embedding), 1))) AS z
        |  FROM embeddings),
        | ej AS (SELECT vec_id, z[1] AS e, z[2] AS j FROM ex),
        | pr AS (
        |  SELECT vec_id, k,
        |   list_sum(list(CAST(ej.e AS DOUBLE) * rmat.r ORDER BY ej.j)) AS s
        |  FROM ej JOIN rmat USING (j) GROUP BY vec_id, k),
        | cl AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN s >= 0 THEN (1 << k) ELSE 0 END)
        |    AS INTEGER) AS cluster
        |  FROM pr GROUP BY vec_id),
        | rk AS (
        |  SELECT vec_id, cluster,
        |   CAST(row_number() OVER (PARTITION BY cluster
        |     ORDER BY ${h60Sql("cbal", 42, "vec_id")}, vec_id)
        |    AS INTEGER) AS c_rank
        |  FROM cl)
        | SELECT vec_id, cluster, c_rank FROM rk WHERE c_rank <= 12
        | ORDER BY vec_id""".stripMargin,
    "sim_rproj" ->
      s"""WITH rmat AS (
        |  SELECT tk.k AS k, tj.j AS j,
        |   CASE (${h60Sql("rproj", 42, "tk.k*64 + tj.j")}) % 6
        |     WHEN 0 THEN 1 WHEN 5 THEN -1 ELSE 0 END AS r
        |  FROM generate_series(0,15) tk(k), generate_series(0,63) tj(j)),
        | ex AS (
        |  SELECT vec_id,
        |   unnest(list_zip(embedding, range(0, len(embedding), 1))) AS z
        |  FROM embeddings),
        | ej AS (SELECT vec_id, z[1] AS e, z[2] AS j FROM ex)
        | SELECT vec_id, CAST(k AS INTEGER) AS k,
        |  ROUND(list_sum(list(CAST(ej.e AS DOUBLE) * rmat.r ORDER BY ej.j))
        |    * sqrt(3.0/16), 6) AS val
        | FROM ej JOIN rmat USING (j)
        | GROUP BY vec_id, k ORDER BY vec_id, k""".stripMargin,
    "sim_ivf_q8_topk" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'ivf_q8_topk' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    "sim_pq_topk" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'pq_topk' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    "sim_ivf_pq_topk" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'ivf_pq_topk' AS family, (SELECT count(*) FROM ex)
        |  AS n_exact, true AS recall_pass""".stripMargin,
    "sim_q8_topk" ->
      """WITH ex AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) WHERE rank <= 5)
        | SELECT 'q8_topk' AS family, (SELECT count(*) FROM ex) AS n_exact,
        |  true AS recall_pass""".stripMargin,
    // The rerank stage emits EXACT cosines and coarse recall at sf0.01
    // is 1.0 (deterministic — SQ8 has no seeds), so the quantized
    // surface carries the same exact-top-k oracle as sim_cosine_topk.
    "sim_q8_topk_raw" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id)
        | WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "text_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents)
        | SELECT doc_id, length(text) AS n_chars, len(w) AS n_tokens,
        |  len(list_distinct(w)) AS n_uniq_tokens,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or','of',
        |    'to','in','is','it','for','on','with','as','at','by'))) AS DOUBLE)
        |    / len(w) AS stopword_ratio,
        |  CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS mean_token_len,
        |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |    AS n_punct
        | FROM tok ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH ${qualityCte("documents")}
        | SELECT doc_id, quality FROM qual ORDER BY doc_id""".stripMargin,
    "text_token_counts" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))
        |    AS bpeish_tokens,
        |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS INT)
        |    AS est_tokens_4cpt
        | FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_stats" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
        |  CAST((doc_id % 4 * 256 + 256) * (doc_id % 3 * 256 + 256) AS BIGINT)
        |    AS n_pixels
        | FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """WITH m AS (SELECT doc_id,
        |   CAST(doc_id % 4 * 256 + 256 AS INT) AS width,
        |   CAST(doc_id % 3 * 256 + 256 AS INT) AS height
        |  FROM documents)
        | SELECT doc_id, width, height,
        |  CAST(floor(width * least(1.0, 512.0 / greatest(width, height)))
        |    AS INT) AS out_width,
        |  CAST(floor(height * least(1.0, 512.0 / greatest(width, height)))
        |    AS INT) AS out_height
        | FROM m ORDER BY doc_id""".stripMargin,
    // Real-BMP decode parity: the engine synthesizes physical BMP
    // bytes per document and decodes them back; the oracle recomputes
    // the same pixel aggregates from the closed-form generator —
    // padding, BGR order and bottom-up rows all sit in between, and
    // the position-weighted green sum pins row/column order.
    "multimodal_bmp_stats" ->
      """WITH d AS (SELECT doc_id, CAST(4 + doc_id % 4 AS INT) AS w,
        |   CAST(3 + doc_id % 3 AS INT) AS h FROM documents),
        | px AS (SELECT d.doc_id, d.w, d.h, gx.x, gy.y
        |  FROM d
        |  CROSS JOIN generate_series(0, 7) gx(x)
        |  CROSS JOIN generate_series(0, 5) gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        | SELECT doc_id,
        |  CAST(54 + (w*3 + (4 - (w*3) % 4) % 4) * h AS BIGINT)
        |    AS bmp_bytes,
        |  w AS bmp_w, h AS bmp_h,
        |  CAST(SUM((doc_id*31 + x*7 + y*13) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((x + y*w) * ((doc_id*31 + x*7 + y*13 + 85) % 256))
        |    AS BIGINT) AS wsum_g,
        |  CAST((doc_id*31 + 170) % 256 AS BIGINT) AS corner_b
        | FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "multimodal_bmp_resize" ->
      """WITH d AS (SELECT doc_id, CAST(4 + doc_id % 4 AS INT) AS w,
        |   CAST(3 + doc_id % 3 AS INT) AS h FROM documents),
        | dims AS (SELECT doc_id, w, h,
        |   GREATEST(1, (w*3) // GREATEST(w, h)) AS ow,
        |   GREATEST(1, (h*3) // GREATEST(w, h)) AS oh FROM d),
        | px AS (SELECT m.doc_id, m.w, m.h, m.ow, m.oh, gx.x, gy.y
        |  FROM dims m
        |  CROSS JOIN generate_series(0, 2) gx(x)
        |  CROSS JOIN generate_series(0, 2) gy(y)
        |  WHERE gx.x < m.ow AND gy.y < m.oh)
        | SELECT doc_id, CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
        |  CAST(SUM((doc_id*31 + ((x*w) // ow)*7 + ((y*h) // oh)*13) % 256)
        |    AS BIGINT) AS sum_r
        | FROM px GROUP BY doc_id, ow, oh ORDER BY doc_id""".stripMargin,
    // Real-WAV decode parity: same posture as multimodal_bmp_stats —
    // the closed-form int16 waveform is recomputed in SQL; the
    // position-weighted sum pins sample order, sumsq the energy, and
    // wav_bytes the canonical 44-byte-header container arithmetic.
    "multimodal_wav_stats" ->
      """WITH d AS (SELECT doc_id, CAST(16 + doc_id % 16 AS INT) AS n
        |  FROM documents),
        | sm AS (SELECT d.doc_id, d.n, g.i,
        |   (doc_id*37 + g.i*101) % 4001 - 2000 AS v
        |  FROM d CROSS JOIN generate_series(0, 31) g(i)
        |  WHERE g.i < d.n)
        | SELECT doc_id,
        |  CAST(44 + n*2 AS BIGINT) AS wav_bytes,
        |  CAST(8000 + doc_id % 3 * 4000 AS INT) AS sample_rate,
        |  n AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sum_s,
        |  CAST(SUM(i*v) AS BIGINT) AS wsum_s,
        |  CAST(SUM(v*v) AS BIGINT) AS sumsq_s
        | FROM sm GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "events_tumbling" -> eventsTumblingSql,
    "stream_tumbling_replay" -> eventsTumblingSql,
    // Time-RANGE rolling window: both engines order on integer epoch
    // micros with an inclusive [ts − 1h, ts] range frame (tie-safe by
    // range semantics); the sum folds through DECIMAL(25,6) — the
    // events_tumbling posture.
    "events_rolling" -> eventsRollingSql,
    // the streaming replays are row-equal to their batch twins by the
    // finalize-on-watermark contract — same oracle, literally
    "stream_rolling_replay" -> eventsRollingSql,
    // composite key: per-(user, region) Markov chains — the same lead
    // with the derived region in the PARTITION BY, report per region
    "stream_transitions_composite_replay" ->
      """WITH seq AS (SELECT user_id,
        |   CAST(event_id % 3 AS BIGINT) AS region,
        |   event_type AS from_state,
        |   lead(event_type) OVER (PARTITION BY user_id, event_id % 3
        |     ORDER BY ts, event_id) AS to_state
        |  FROM events),
        | c AS (SELECT region, from_state, to_state, count(*) AS n
        |  FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2, 3)
        | SELECT region, from_state, to_state, n,
        |  CAST(n AS DOUBLE) /
        |   CAST(sum(n) OVER (PARTITION BY region, from_state) AS BIGINT)
        |   AS p
        | FROM c ORDER BY region, from_state, to_state""".stripMargin,
    // composite key: the greedy-earliest chain per (user, region) —
    // a region reports only if some key reached stage 1 there, which
    // both sides share (stage1 ⊇ stage2 ⊇ stage3)
    "stream_funnel_composite_replay" ->
      """WITH e AS (SELECT user_id,
        |   CAST(event_id % 3 AS BIGINT) AS region, ts, event_type
        |  FROM events),
        | t1 AS (SELECT user_id, region, min(ts) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1, 2),
        | t2 AS (SELECT e.user_id, e.region, min(e.ts) AS t2 FROM e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.region = t1.region
        |  WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY 1, 2),
        | t3 AS (SELECT e.user_id, e.region, min(e.ts) AS t3 FROM e
        |  JOIN t2 ON e.user_id = t2.user_id AND e.region = t2.region
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        |  GROUP BY 1, 2),
        | c1 AS (SELECT region, count(*) AS n_stage1 FROM t1 GROUP BY 1),
        | c2 AS (SELECT region, count(*) AS n_stage2 FROM t2 GROUP BY 1),
        | c3 AS (SELECT region, count(*) AS n_stage3 FROM t3 GROUP BY 1)
        | SELECT c1.region, n_stage1,
        |  CAST(coalesce(n_stage2, 0) AS BIGINT) AS n_stage2,
        |  CAST(coalesce(n_stage3, 0) AS BIGINT) AS n_stage3
        | FROM c1 LEFT JOIN c2 USING (region) LEFT JOIN c3 USING (region)
        | ORDER BY region""".stripMargin,
    // composite key: per-(user, region) cohorts — the cohort is the
    // KEY's first event, so one user contributes to up to 3 regions'
    // triangles independently
    "stream_retention_composite_replay" ->
      """WITH ev AS (SELECT user_id,
        |   CAST(event_id % 3 AS BIGINT) AS region, ts FROM events),
        | f AS (SELECT user_id, region,
        |   CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
        |  FROM ev GROUP BY user_id, region)
        | SELECT e.region, f.cohort_week,
        |  CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS n_active
        | FROM ev e JOIN f ON e.user_id = f.user_id
        |  AND e.region = f.region
        | GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // composite key: the same daily LOCF spine with the derived region
    // in every partition/spine CTE — one region's value never fills
    // another region's gap
    "stream_gapfill_composite_replay" ->
      """WITH base AS (SELECT user_id AS k,
        |   CAST(event_id % 3 AS BIGINT) AS region,
        |   epoch_us(ts) - epoch_us(ts) % 86400000000 AS slot, ts, value
        |  FROM events),
        | rep AS (SELECT k, region, slot, value FROM (
        |   SELECT k, region, slot, value, row_number()
        |     OVER (PARTITION BY k, region, slot
        |       ORDER BY ts DESC, value DESC) AS rn FROM base)
        |  WHERE rn = 1),
        | spine AS (SELECT k, region,
        |   unnest(generate_series(lo, hi, 86400000000)) AS slot
        |  FROM (SELECT k, region, min(slot) AS lo, max(slot) AS hi
        |   FROM base GROUP BY k, region)),
        | j AS (SELECT s.k, s.region, s.slot, rep.value AS v
        |  FROM spine s LEFT JOIN rep ON rep.k = s.k
        |   AND rep.region = s.region AND rep.slot = s.slot)
        | SELECT k AS user_id, region, make_timestamp(slot) AS slot_ts,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k, region
        |    ORDER BY slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  v IS NOT NULL AS is_observed
        | FROM j ORDER BY user_id, region, slot_ts""".stripMargin,
    // composite key: the same trailing window with the derived region
    // in the PARTITION BY — per-(user, region) windows never mix
    "stream_rolling_composite_replay" ->
      """SELECT event_id, user_id,
        |  CAST(event_id % 3 AS BIGINT) AS region,
        |  count(*) OVER w AS roll_cnt,
        |  CAST(sum(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
        |    AS roll_sum
        | FROM events
        | WINDOW w AS (PARTITION BY user_id, event_id % 3
        |   ORDER BY epoch_us(ts)
        |   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        | ORDER BY event_id""".stripMargin,
    // …and the feature-store landing (foreachBatch exactly-once upsert
    // -> snapshot) preserves that row-equality end to end
    "stream_feature_store_replay" -> eventsRollingSql,
    // ingestion dedup: the twice-delivered stream deduplicates back to
    // the once-delivered projection (exact duplicates -> first-wins is
    // deterministic); µs epoch is the cross-engine ts surface
    "stream_dedup_replay" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        | FROM events ORDER BY event_id""".stripMargin,
    "stream_transitions_replay" -> eventsTransitionsSql,
    "events_transitions" -> eventsTransitionsSql,
    "events_gapfill" -> eventsGapfillSql,
    "stream_gapfill_replay" -> eventsGapfillSql,
    "events_sliding" -> eventsSlidingSql,
    "stream_sliding_replay" -> eventsSlidingSql,
    // Group quantiles: the same rank-exact replay as dq_outliers —
    // quantile p is the value at ceil(n·p) in the group sort order.
    "dq_group_quantiles" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice) AS rn,
        |   count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        | SELECT g AS l_returnflag, count(*) AS n_rows,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN v END) AS p50,
        |  max(CASE WHEN rn = ceil(n * 0.9) THEN v END) AS p90,
        |  max(CASE WHEN rn = ceil(n * 0.99) THEN v END) AS p99
        | FROM r GROUP BY g ORDER BY g""".stripMargin,
    // Approx quartiles (percentile_approx sketch — the scale path of
    // dq_outliers): sketch outputs are implementation-defined, so the
    // gate booleans compare against the in-query rank-exact recompute
    // (the a_approx_agg posture); the oracle pins group sizes.
    "dq_outliers_approx" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | true AS q1_pass, true AS q3_pass, true AS outliers_pass
        | FROM lineitem WHERE l_extendedprice IS NOT NULL
        | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "dq_group_quantiles_approx" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | true AS p50_pass, true AS p90_pass, true AS p99_pass
        | FROM lineitem WHERE l_extendedprice IS NOT NULL
        | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // k-fold: the identical portable draw mod k.
    "sample_kfold" ->
      s"""SELECT doc_id, ${h60Sql("kfold", 42, "doc_id")} % 5 AS fold
        | FROM documents ORDER BY doc_id""".stripMargin,
    // BM25: the oracle recomputes the whole pipeline — postings, df,
    // doc lengths, the (1.2+1)/0.25/0.75 constant constructions kept
    // IDENTICAL to the Scala side so both engines fold the same
    // doubles, per-term contributions through DECIMAL(28,9) (order-
    // independent sums), rank over the rounded score.
    "text_bm25" ->
      s"""WITH $bm25RankCte
        | SELECT query_id, doc_id, score_r, rank FROM bmrk WHERE rank <= 10
        | ORDER BY query_id, rank""".stripMargin,
    // Retrieval eval: the shared BM25 run + deterministic (source,
    // lang)-cell qrels; every metric cell replays through the SAME
    // baked integer weight table the Spark plan embeds — the only
    // double is the final ratio of two exact < 2^53 integers.
    "text_retrieval_eval" ->
      s"""WITH $bm25RankCte,
        | $retrievalWeightsCte,
        | qr AS (
        |  SELECT q.doc_id AS query_id, d.doc_id AS doc_id
        |  FROM documents q JOIN documents d
        |    ON d.source = q.source AND d.lang = q.lang
        |     AND d.doc_id <> q.doc_id
        |  WHERE q.doc_id < 5),
        | rel AS (SELECT query_id, count(*) AS n_rel FROM qr GROUP BY 1),
        | topk AS (SELECT query_id, doc_id, CAST(rank AS INT) AS rnk
        |   FROM bmrk WHERE rank <= 10),
        | mk AS (
        |  SELECT t.query_id, t.rnk,
        |   CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS r
        |  FROM topk t LEFT JOIN qr q
        |    ON q.query_id = t.query_id AND q.doc_id = t.doc_id),
        | pq AS (
        |  SELECT m.query_id, count(*) AS n_ret,
        |   CAST(sum(m.r) AS BIGINT) AS n_hit,
        |   coalesce(min(CASE WHEN m.r = 1 THEN m.rnk END), 0)
        |     AS first_rel_rank,
        |   CAST(coalesce(sum(CASE WHEN m.r = 1 THEN w.wd END), 0) AS BIGINT)
        |     AS dcg_u
        |  FROM mk m JOIN w ON w.rnk = m.rnk
        |  GROUP BY 1),
        | j2 AS (
        |  SELECT coalesce(p.query_id, rel.query_id) AS query_id,
        |   coalesce(rel.n_rel, 0) AS n_rel,
        |   coalesce(p.n_ret, 0) AS n_ret, coalesce(p.n_hit, 0) AS n_hit,
        |   coalesce(p.first_rel_rank, 0) AS first_rel_rank,
        |   coalesce(p.dcg_u, 0) AS dcg_u
        |  FROM pq p FULL JOIN rel ON rel.query_id = p.query_id)
        | SELECT j2.query_id, j2.n_rel, j2.n_ret, j2.n_hit,
        |  j2.first_rel_rank,
        |  CAST(coalesce(wm.wm, 0) AS BIGINT) AS mrr_u,
        |  j2.dcg_u,
        |  CAST(coalesce(wi.wp, 0) AS BIGINT) AS idcg_u,
        |  CASE WHEN coalesce(wi.wp, 0) > 0
        |    THEN round(CAST(j2.dcg_u AS DOUBLE) / CAST(wi.wp AS DOUBLE), 9)
        |    ELSE 0.0 END AS ndcg_r
        | FROM j2
        | LEFT JOIN w wm ON wm.rnk = j2.first_rel_rank
        | LEFT JOIN w wi ON wi.rnk = least(j2.n_rel, 10)
        | ORDER BY query_id""".stripMargin,
    "sim_mmr_rerank" -> mmrOracleSql(k = 8, c = 20, nq = 8, lambda = 0.7),
    // ROC-AUC via the tie-corrected Mann–Whitney identity over
    // distinct-score groups: 2U = Σ_g pos_g·(2·cnb_g + neg_g). The
    // oracle folds the summand through DECIMAL((18|19),0) operands
    // (DuckDB's multiply adds operand widths and binds only ≤ 38,
    // so a 38,0×38,0 product is a binder error there; Spark caps at
    // 38) — the VALUES are exact integers either way, and the final
    // u2 lands as DECIMAL(38,0) on both engines.
    "eval_auc" ->
      s"""WITH ${lmCte("documents")},
         | lab AS (SELECT lm.doc_id, lm_score AS s,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM lm JOIN documents USING (doc_id)),
         | g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM lab GROUP BY s),
         | c AS (SELECT s, pos_g, tot_g - pos_g AS neg_g,
         |   coalesce(sum(tot_g - pos_g) OVER (ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS cnb
         |  FROM g),
         | cells AS (SELECT CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |   CAST(sum(neg_g) AS BIGINT) AS n_neg,
         |   CAST(sum(CAST(pos_g AS DECIMAL(18,0)) *
         |     CAST(2 * cnb + neg_g AS DECIMAL(19,0)))
         |     AS DECIMAL(38,0)) AS u2
         |  FROM c)
         | SELECT n_pos, n_neg, CAST(u2 AS BIGINT) AS u2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |   THEN CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg) END AS auc
         | FROM cells""".stripMargin,
    // ROC curve points: descending at-or-above prefixes as
    // total − strictly-below (the engine's derivation), downsample
    // rule replayed verbatim (every step-th ascending rank + the top
    // score; step = ⌈G/64⌉ via integer division).
    "eval_roc_curve" ->
      s"""WITH ${lmCte("documents")},
         | lab AS (SELECT lm.doc_id, lm_score AS s,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM lm JOIN documents USING (doc_id)),
         | g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM lab GROUP BY s),
         | tot AS (SELECT CAST(sum(pos_g) AS BIGINT) AS npos,
         |   CAST(sum(tot_g) AS BIGINT) AS ntot,
         |   count(*) AS gcnt FROM g),
         | c AS (SELECT s, row_number() OVER (ORDER BY s) AS i,
         |   CAST(coalesce(sum(pos_g) OVER (ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS BIGINT) AS pos_below,
         |   CAST(coalesce(sum(tot_g) OVER (ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS BIGINT) AS tot_below
         |  FROM g)
         | SELECT s AS thr, ntot - tot_below AS n_at_or_above,
         |  CASE WHEN ntot - npos > 0
         |   THEN CAST((ntot - tot_below) - (npos - pos_below) AS DOUBLE)
         |     / (ntot - npos) END AS fpr,
         |  CASE WHEN npos > 0
         |   THEN CAST(npos - pos_below AS DOUBLE) / npos END AS tpr
         | FROM c CROSS JOIN tot
         | WHERE i % greatest(1, (gcnt + 63) // 64) = 0 OR i = gcnt
         | ORDER BY thr""".stripMargin,
    // Per-source ROC curve: the pooled curve SQL with every window,
    // total, rank, and downsample step partitioned by source (each
    // slice keeps every step_g-th of ITS OWN distinct scores + its top)
    "eval_roc_curve_by" ->
      s"""WITH ${lmCte("documents")},
         | lab AS (SELECT lm.doc_id, source, lm_score AS s,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM lm JOIN documents USING (doc_id)),
         | g AS (SELECT source, s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM lab GROUP BY 1, 2),
         | tot AS (SELECT source, CAST(sum(pos_g) AS BIGINT) AS npos,
         |   CAST(sum(tot_g) AS BIGINT) AS ntot,
         |   count(*) AS gcnt FROM g GROUP BY 1),
         | c AS (SELECT source, s,
         |   row_number() OVER (PARTITION BY source ORDER BY s) AS i,
         |   CAST(coalesce(sum(pos_g) OVER (PARTITION BY source ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS BIGINT) AS pos_below,
         |   CAST(coalesce(sum(tot_g) OVER (PARTITION BY source ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS BIGINT) AS tot_below
         |  FROM g)
         | SELECT c.source, s AS thr, ntot - tot_below AS n_at_or_above,
         |  CASE WHEN ntot - npos > 0
         |   THEN CAST((ntot - tot_below) - (npos - pos_below) AS DOUBLE)
         |     / (ntot - npos) END AS fpr,
         |  CASE WHEN npos > 0
         |   THEN CAST(npos - pos_below AS DOUBLE) / npos END AS tpr
         | FROM c JOIN tot USING (source)
         | WHERE i % greatest(1, (gcnt + 15) // 16) = 0 OR i = gcnt
         | ORDER BY c.source, thr""".stripMargin,
    "eval_auc_by" ->
      s"""WITH ${lmCte("documents")},
         | lab AS (SELECT lm.doc_id, source, lm_score AS s,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM lm JOIN documents USING (doc_id)),
         | g AS (SELECT source, s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM lab GROUP BY 1, 2),
         | c AS (SELECT source, pos_g, tot_g - pos_g AS neg_g,
         |   coalesce(sum(tot_g - pos_g) OVER (PARTITION BY source
         |     ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |     0) AS cnb
         |  FROM g),
         | cells AS (SELECT source, CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |   CAST(sum(neg_g) AS BIGINT) AS n_neg,
         |   CAST(sum(CAST(pos_g AS DECIMAL(18,0)) *
         |     CAST(2 * cnb + neg_g AS DECIMAL(19,0)))
         |     AS DECIMAL(38,0)) AS u2
         |  FROM c GROUP BY source)
         | SELECT source, n_pos, n_neg, CAST(u2 AS BIGINT) AS u2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |   THEN CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg) END AS auc
         | FROM cells ORDER BY source""".stripMargin,
    // Poisson-bootstrap AUC CI: the oracle replays the per-(doc,
    // replicate) md5-60 draw against the SAME baked 60-bit Poisson(1)
    // CDF thresholds (integer compares, no float), the weighted
    // Mann–Whitney per replicate, and the exact order statistics.
    "eval_auc_bootstrap" -> {
      val th = graft.ext.ModelEval.PoissonCdf60
      val wCase = th.zipWithIndex
        .map { case (t, k) => s"WHEN h < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 8 END")
      s"""WITH ${lmCte("documents")},
         | lab AS (SELECT lm.doc_id, lm_score AS s,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM lm JOIN documents USING (doc_id)),
         | reps AS (SELECT doc_id, s, y, r.range AS b
         |  FROM lab CROSS JOIN range(0, 16) r),
         | hw AS (SELECT b, s, y,
         |   ${h60Sql("boot", 7, "(doc_id * 16 + b)")} AS h FROM reps),
         | wts AS (SELECT b, s, y, $wCase AS w FROM hw),
         | g AS (SELECT b, s, CAST(sum(w * y) AS BIGINT) AS pos_g,
         |   CAST(sum(w) AS BIGINT) AS tot_g
         |  FROM wts WHERE w > 0 GROUP BY 1, 2),
         | c AS (SELECT b, pos_g, tot_g - pos_g AS neg_g,
         |   coalesce(sum(tot_g - pos_g) OVER (PARTITION BY b
         |     ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |     0) AS cnb
         |  FROM g),
         | cells AS (SELECT b, CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |   CAST(sum(neg_g) AS BIGINT) AS n_neg,
         |   CAST(sum(CAST(pos_g AS DECIMAL(18,0)) *
         |     CAST(2 * cnb + neg_g AS DECIMAL(19,0)))
         |     AS DECIMAL(38,0)) AS u2
         |  FROM c GROUP BY b),
         | aucs AS (SELECT CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg)
         |    AS auc
         |  FROM cells WHERE n_pos > 0 AND n_neg > 0),
         | ranked AS (SELECT auc, row_number() OVER (ORDER BY auc) AS r,
         |   count(*) OVER () AS nb FROM aucs)
         | SELECT CAST(max(nb) AS BIGINT) AS n_replicates,
         |  max(CASE WHEN r = greatest(1, CAST(ceil(0.025 * nb) AS BIGINT))
         |    THEN auc END) AS auc_lo,
         |  max(CASE WHEN r = greatest(1, CAST(ceil(0.5 * nb) AS BIGINT))
         |    THEN auc END) AS auc_med,
         |  max(CASE WHEN r = greatest(1, CAST(ceil(0.975 * nb) AS BIGINT))
         |    THEN auc END) AS auc_hi
         | FROM ranked""".stripMargin
    },
    // AP with thresholds at distinct scores DESC: the oracle's
    // inclusive descending prefixes equal the engine's (total − strictly-
    // below) derivation value-for-value; each term is the same
    // (pos/n_pos)·(cumPos/cumTot) three-op IEEE sequence, folded
    // through DECIMAL(28,9) (the BM25 posture).
    "eval_avg_precision" ->
      s"""WITH ${lmCte("documents")},
         | lab AS (SELECT lm_score AS s,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM lm JOIN documents USING (doc_id)),
         | g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM lab GROUP BY s),
         | np AS (SELECT CAST(sum(pos_g) AS BIGINT) AS n_pos FROM g),
         | c AS (SELECT pos_g, tot_g,
         |   CAST(sum(pos_g) OVER (ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS cpos,
         |   CAST(sum(tot_g) OVER (ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS ctot
         |  FROM g),
         | tm AS (SELECT pos_g, tot_g,
         |   CAST((CAST(pos_g AS DOUBLE) / CAST(n_pos AS DOUBLE))
         |     * (CAST(cpos AS DOUBLE) / CAST(ctot AS DOUBLE))
         |     AS DECIMAL(28,9)) AS contrib
         |  FROM c CROSS JOIN np)
         | SELECT CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |  CAST(sum(tot_g - pos_g) AS BIGINT) AS n_neg,
         |  round(CAST(sum(contrib) AS DOUBLE), 6) AS ap
         | FROM tm""".stripMargin,
    // Per-source AP: the pooled step-sum partitioned by source; the
    // per-term guard (no-positive slice -> null terms) mirrors the
    // engine's when(_np > 0) exactly, so both engines agree on null ap.
    "eval_ap_by" ->
      s"""WITH ${lmCte("documents")},
         | lab AS (SELECT source, lm_score AS s,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM lm JOIN documents USING (doc_id)),
         | g AS (SELECT source, s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM lab GROUP BY 1, 2),
         | np AS (SELECT source, CAST(sum(pos_g) AS BIGINT) AS gp
         |  FROM g GROUP BY 1),
         | c AS (SELECT source, pos_g, tot_g,
         |   CAST(sum(pos_g) OVER (PARTITION BY source ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS cpos,
         |   CAST(sum(tot_g) OVER (PARTITION BY source ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS ctot
         |  FROM g),
         | tm AS (SELECT c.source, pos_g, tot_g,
         |   CASE WHEN gp > 0 THEN
         |    CAST((CAST(pos_g AS DOUBLE) / CAST(gp AS DOUBLE))
         |     * (CAST(cpos AS DOUBLE) / CAST(ctot AS DOUBLE))
         |     AS DECIMAL(28,9)) END AS contrib
         |  FROM c JOIN np USING (source))
         | SELECT source, CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |  CAST(sum(tot_g - pos_g) AS BIGINT) AS n_neg,
         |  round(CAST(sum(contrib) AS DOUBLE), 6) AS ap
         | FROM tm GROUP BY source ORDER BY source""".stripMargin,
    "eval_ece" -> evalEceSql,
    // incremental ECE's oracle IS the full-corpus pooled ECE — the
    // driver compare is itself the incremental ≡ full proof
    "i_incremental_ece" -> evalEceSql,
    // incremental AP: full-corpus step-sum over the stopword score
    // incremental ROC curve: the full-corpus downsampled curve over
    // the stopword score (the SAME score state serves AUC + AP + curve)
    "i_incremental_roc_curve" ->
      raw"""WITH tok AS (
         |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM sr WHERE s IS NOT NULL GROUP BY s),
         | tot AS (SELECT CAST(sum(pos_g) AS BIGINT) AS npos,
         |   CAST(sum(tot_g) AS BIGINT) AS ntot,
         |   count(*) AS gcnt FROM g),
         | c AS (SELECT s, row_number() OVER (ORDER BY s) AS i,
         |   CAST(coalesce(sum(pos_g) OVER (ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS BIGINT) AS pos_below,
         |   CAST(coalesce(sum(tot_g) OVER (ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS BIGINT) AS tot_below
         |  FROM g)
         | SELECT s AS thr, ntot - tot_below AS n_at_or_above,
         |  CASE WHEN ntot - npos > 0
         |   THEN CAST((ntot - tot_below) - (npos - pos_below) AS DOUBLE)
         |     / (ntot - npos) END AS fpr,
         |  CASE WHEN npos > 0
         |   THEN CAST(npos - pos_below AS DOUBLE) / npos END AS tpr
         | FROM c CROSS JOIN tot
         | WHERE i % greatest(1, (gcnt + 63) // 64) = 0 OR i = gcnt
         | ORDER BY thr""".stripMargin,
    // incremental per-slice AP: the full-corpus per-source step-sum
    // over the stopword score (the SAME state serves the slice AUC)
    "i_incremental_ap_by" ->
      raw"""WITH tok AS (
         |  SELECT source, lang,
         |   string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT source,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | g AS (SELECT source, s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM sr
         |  WHERE s IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
         | np AS (SELECT source, CAST(sum(pos_g) AS BIGINT) AS gp
         |  FROM g GROUP BY 1),
         | c AS (SELECT source, pos_g, tot_g,
         |   CAST(sum(pos_g) OVER (PARTITION BY source ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS cpos,
         |   CAST(sum(tot_g) OVER (PARTITION BY source ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS ctot
         |  FROM g),
         | tm AS (SELECT c.source, pos_g, tot_g,
         |   CASE WHEN gp > 0 THEN
         |    CAST((CAST(pos_g AS DOUBLE) / CAST(gp AS DOUBLE))
         |     * (CAST(cpos AS DOUBLE) / CAST(ctot AS DOUBLE))
         |     AS DECIMAL(28,9)) END AS contrib
         |  FROM c JOIN np USING (source))
         | SELECT source, CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |  CAST(sum(tot_g - pos_g) AS BIGINT) AS n_neg,
         |  round(CAST(sum(contrib) AS DOUBLE), 6) AS ap
         | FROM tm GROUP BY source ORDER BY source""".stripMargin,
    "i_incremental_ap" ->
      raw"""WITH tok AS (
         |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g FROM sr WHERE s IS NOT NULL GROUP BY s),
         | np AS (SELECT CAST(sum(pos_g) AS BIGINT) AS n_pos FROM g),
         | c AS (SELECT pos_g, tot_g,
         |   CAST(sum(pos_g) OVER (ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS cpos,
         |   CAST(sum(tot_g) OVER (ORDER BY s DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |     AS BIGINT) AS ctot
         |  FROM g),
         | tm AS (SELECT pos_g, tot_g,
         |   CAST((CAST(pos_g AS DOUBLE) / CAST(n_pos AS DOUBLE))
         |     * (CAST(cpos AS DOUBLE) / CAST(ctot AS DOUBLE))
         |     AS DECIMAL(28,9)) AS contrib
         |  FROM c CROSS JOIN np)
         | SELECT CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |  CAST(sum(tot_g - pos_g) AS BIGINT) AS n_neg,
         |  round(CAST(sum(contrib) AS DOUBLE), 6) AS ap
         | FROM tm""".stripMargin,
    "eval_confusion" ->
      raw"""WITH tok AS (
         |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | cells AS (SELECT
         |   CAST(sum(CASE WHEN y = 1 AND s >= 0.0625 THEN 1 ELSE 0 END)
         |     AS BIGINT) AS tp,
         |   CAST(sum(CASE WHEN y = 0 AND s >= 0.0625 THEN 1 ELSE 0 END)
         |     AS BIGINT) AS fp,
         |   CAST(sum(CASE WHEN y = 1 AND NOT (s >= 0.0625) THEN 1 ELSE 0 END)
         |     AS BIGINT) AS fn,
         |   CAST(sum(CASE WHEN y = 0 AND NOT (s >= 0.0625) THEN 1 ELSE 0 END)
         |     AS BIGINT) AS tn
         |  FROM sr)
         | SELECT tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0
         |   THEN CAST(tp AS DOUBLE) / (tp + fp) END AS "precision",
         |  CASE WHEN tp + fn > 0
         |   THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
         |  CASE WHEN tp + fp + fn + tn > 0
         |   THEN CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) END AS accuracy,
         |  CASE WHEN 2 * tp + fp + fn > 0
         |   THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END AS f1
         | FROM cells""".stripMargin,
    "eval_confusion_by" ->
      raw"""WITH tok AS (
         |  SELECT source, lang,
         |   string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT source,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | cells AS (SELECT source,
         |   CAST(sum(CASE WHEN y = 1 AND s >= 0.0625 THEN 1 ELSE 0 END)
         |     AS BIGINT) AS tp,
         |   CAST(sum(CASE WHEN y = 0 AND s >= 0.0625 THEN 1 ELSE 0 END)
         |     AS BIGINT) AS fp,
         |   CAST(sum(CASE WHEN y = 1 AND NOT (s >= 0.0625) THEN 1 ELSE 0 END)
         |     AS BIGINT) AS fn,
         |   CAST(sum(CASE WHEN y = 0 AND NOT (s >= 0.0625) THEN 1 ELSE 0 END)
         |     AS BIGINT) AS tn
         |  FROM sr WHERE s IS NOT NULL AND source IS NOT NULL
         |  GROUP BY source)
         | SELECT source, tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0
         |   THEN CAST(tp AS DOUBLE) / (tp + fp) END AS "precision",
         |  CASE WHEN tp + fn > 0
         |   THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
         |  CASE WHEN tp + fp + fn + tn > 0
         |   THEN CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) END AS accuracy,
         |  CASE WHEN 2 * tp + fp + fn > 0
         |   THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END AS f1
         | FROM cells ORDER BY source""".stripMargin,
    "eval_calibration" ->
      raw"""WITH tok AS (
         |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | b AS (SELECT CAST(least(9, greatest(0,
         |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
         |    AS INT) AS bin, y
         |  FROM sr WHERE s IS NOT NULL),
         | counts AS (SELECT bin, count(*) AS n,
         |   CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY bin)
         | SELECT CAST(r.range AS INT) AS bin, coalesce(n, 0) AS n,
         |  coalesce(n_pos, 0) AS n_pos,
         |  CASE WHEN coalesce(n, 0) > 0
         |   THEN CAST(n_pos AS DOUBLE) / n END AS pos_rate
         | FROM range(0, 10) r LEFT JOIN counts ON counts.bin = r.range
         | ORDER BY bin""".stripMargin,
    // Per-source slice variants: same grid, same term arithmetic, with
    // source threaded through the group-bys. The per-source total is a
    // window sum — DuckDB widens windowed sum(BIGINT) to HUGEINT, so
    // it casts back (the pack_shards lesson).
    "eval_calibration_by" -> evalCalibrationBySql,
    // incremental == full: the state-recomputed per-source reliability
    // table must match the full-corpus calibrationBy recompute
    "i_incremental_calibration_by" -> evalCalibrationBySql,
    // Isotonic fit via the exact minimax closed form over observed
    // bins: fit_k = max_{i<=k} min_{j>=k} (Σ n_pos)/(Σ n) — each
    // interval average ONE division of two exact BIGINTs (prefix sums
    // cast back from DuckDB's HUGEINT), max/min of bit-identical
    // doubles.
    "eval_isotonic" -> evalIsotonicSql,
    "eval_isotonic_by" -> evalIsotonicBySql,
    // incremental == full: the state-refit per-slice calibrators must
    // match the full-corpus per-source minimax recompute
    "i_incremental_isotonic_by" -> evalIsotonicBySql,
    // incremental == full: the state-refit calibrator must match the
    // full-corpus isotonic recompute
    "i_incremental_isotonic" -> evalIsotonicSql,
    // Calibrate→apply: the isotonic fit CTEs + dense grid fill (LOCF
    // across unobserved bins, first observed value extended below),
    // then a per-document bin join. p_en is the fit value verbatim —
    // no arithmetic, bit-stable.
    "eval_calibrated" ->
      raw"""WITH tok AS (
         |  SELECT doc_id, lang,
         |   string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT doc_id,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | b AS (SELECT doc_id, CAST(least(9, greatest(0,
         |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
         |    AS INT) AS bin, y
         |  FROM sr WHERE s IS NOT NULL),
         | counts AS (SELECT bin, count(*) AS n,
         |   CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY bin),
         | cum AS (SELECT bin, n, n_pos,
         |   CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
         |   CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp
         |  FROM counts),
         | pairs AS (SELECT li.bin AS i, rj.bin AS j,
         |   CAST(rj.cp - (li.cp - li.n_pos) AS DOUBLE) /
         |     (rj.cn - (li.cn - li.n)) AS a
         |  FROM cum li JOIN cum rj ON li.bin <= rj.bin),
         | sm AS (SELECT i, j AS bin, min(a) OVER (PARTITION BY i
         |   ORDER BY j DESC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
         |  FROM pairs),
         | fit AS (SELECT bin, max(sm) AS iso_rate FROM sm GROUP BY bin),
         | dense AS (SELECT CAST(r.range AS INT) AS bin, coalesce(
         |   last_value(iso_rate IGNORE NULLS) OVER (ORDER BY r.range
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |   first_value(iso_rate IGNORE NULLS) OVER (ORDER BY r.range
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |   AS p_en
         |  FROM range(0, 10) r LEFT JOIN fit ON fit.bin = r.range)
         | SELECT sr2.doc_id, dense.p_en
         | FROM (SELECT doc_id, CASE WHEN s IS NULL THEN NULL ELSE
         |    CAST(least(9, greatest(0, CAST(floor((s - 0.0) /
         |      ${(0.25 - 0.0) / 10}) AS BIGINT))) AS INT) END AS bin
         |   FROM sr) sr2
         | LEFT JOIN dense ON dense.bin = sr2.bin
         | ORDER BY sr2.doc_id""".stripMargin,
    "eval_ece_by" -> evalEceBySql,
    // incremental ≡ full: the state-recomputed slice report must match
    // the full-corpus eceBy recompute cell-exact — same oracle
    "i_incremental_ece_by" -> evalEceBySql,
    // Per-source isotonic calibrate->apply: the oracle replays the
    // per-group minimax closed form (windows and the interval join
    // partitioned by source), densifies each group's step function
    // over the full grid, and maps every document through ITS
    // source's fit; docs with a null score or null source get NULL.
    // Multiply-referenced CTEs are MATERIALIZED (DuckDB inlines per
    // reference — the MMR lesson).
    "eval_calibrated_by" ->
      raw"""WITH tok AS (
         |  SELECT doc_id, lang, source,
         |   string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS MATERIALIZED (SELECT doc_id, source,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | b AS (SELECT source, CAST(least(9, greatest(0,
         |    CAST(floor((s - 0.0) / ${(0.25 - 0.0) / 10}) AS BIGINT)))
         |    AS INT) AS bin, y
         |  FROM sr WHERE s IS NOT NULL AND source IS NOT NULL),
         | counts AS (SELECT source, bin, count(*) AS n,
         |   CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1, 2),
         | cum AS MATERIALIZED (SELECT source, bin, n, n_pos,
         |   CAST(sum(n) OVER (PARTITION BY source ORDER BY bin)
         |     AS BIGINT) AS cn,
         |   CAST(sum(n_pos) OVER (PARTITION BY source ORDER BY bin)
         |     AS BIGINT) AS cp
         |  FROM counts),
         | pairs AS (SELECT li.source, li.bin AS i, rj.bin AS j,
         |   CAST(rj.cp - (li.cp - li.n_pos) AS DOUBLE) /
         |     (rj.cn - (li.cn - li.n)) AS a
         |  FROM cum li JOIN cum rj
         |   ON li.source = rj.source AND li.bin <= rj.bin),
         | sm AS (SELECT source, i, j AS bin, min(a) OVER (
         |   PARTITION BY source, i ORDER BY j DESC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
         |  FROM pairs),
         | fit AS MATERIALIZED (SELECT source, bin, max(sm) AS iso_rate
         |  FROM sm GROUP BY 1, 2),
         | dense AS (SELECT g.source, CAST(r.range AS INT) AS bin,
         |   coalesce(
         |    last_value(iso_rate IGNORE NULLS) OVER (PARTITION BY g.source
         |     ORDER BY r.range
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    first_value(iso_rate IGNORE NULLS) OVER (PARTITION BY g.source
         |     ORDER BY r.range
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |   AS p_en
         |  FROM (SELECT DISTINCT source FROM fit) g
         |  CROSS JOIN range(0, 10) r
         |  LEFT JOIN fit ON fit.source = g.source AND fit.bin = r.range)
         | SELECT sr2.doc_id, dense.p_en
         | FROM (SELECT doc_id, source, CASE WHEN s IS NULL THEN NULL ELSE
         |    CAST(least(9, greatest(0, CAST(floor((s - 0.0) /
         |      ${(0.25 - 0.0) / 10}) AS BIGINT))) AS INT) END AS bin
         |   FROM sr) sr2
         | LEFT JOIN dense
         |  ON dense.source = sr2.source AND dense.bin = sr2.bin
         | ORDER BY sr2.doc_id""".stripMargin,
    // Label aggregation: the oracle rebuilds the 3-annotator synthetic
    // labels via the identical md5-60 draw, then replays the collapse
    // (min label per annotator), the vote window, and the integer pair
    // arithmetic. `//` is exact (pair products are even).
    "labels_vote" ->
      s"""WITH ann AS (
        |  SELECT d.doc_id, a.a AS annot,
        |   CASE WHEN ${h60Sql("lab", 42, "d.doc_id * 3 + a.a")} % 10 < 8
        |        THEN d.lang ELSE 'zz' END AS label
        |  FROM documents d CROSS JOIN (VALUES (0), (1), (2)) a(a)),
        | pa AS (SELECT doc_id, annot, min(label) AS label
        |   FROM ann GROUP BY 1, 2),
        | v AS (SELECT doc_id, label, count(*) AS votes
        |   FROM pa GROUP BY 1, 2),
        | ag AS (SELECT doc_id, CAST(sum(votes) AS BIGINT) AS n_annot,
        |    CAST(sum(votes * (votes - 1) // 2) AS BIGINT) AS agree_pairs
        |   FROM v GROUP BY 1),
        | rk AS (SELECT doc_id, label, votes,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY votes DESC, label ASC) AS rn FROM v)
        | SELECT r.doc_id, r.label, r.votes, g.n_annot, g.agree_pairs,
        |  g.n_annot * (g.n_annot - 1) // 2 AS total_pairs,
        |  CASE WHEN g.n_annot >= 2 THEN
        |    round(CAST(g.agree_pairs AS DOUBLE) /
        |      CAST(g.n_annot * (g.n_annot - 1) // 2 AS DOUBLE), 9)
        |  ELSE 1.0 END AS agreement_r
        | FROM rk r JOIN ag g USING (doc_id) WHERE r.rn = 1
        | ORDER BY r.doc_id""".stripMargin,
    // Fleiss' kappa: per-item agreement and per-label chance terms go
    // through DECIMAL(28,9) (order-independent folds); the final cells
    // divide identical < 2^53 integers/decimals in the SAME operand
    // order as the Spark plan, rounded to 9.
    "labels_kappa" ->
      s"""WITH ann AS (
        |  SELECT d.doc_id, a.a AS annot,
        |   CASE WHEN ${h60Sql("lab", 42, "d.doc_id * 3 + a.a")} % 10 < 8
        |        THEN d.lang ELSE 'zz' END AS label
        |  FROM documents d CROSS JOIN (VALUES (0), (1), (2)) a(a)),
        | pa AS (SELECT doc_id, annot, min(label) AS label
        |   FROM ann GROUP BY 1, 2),
        | v AS (SELECT doc_id, label, count(*) AS votes
        |   FROM pa GROUP BY 1, 2),
        | it AS (SELECT doc_id, CAST(sum(votes) AS BIGINT) AS n,
        |    CAST(sum(votes * (votes - 1)) AS BIGINT) AS a2
        |   FROM v GROUP BY 1 HAVING CAST(sum(votes) AS BIGINT) >= 2),
        | poi AS (SELECT doc_id, CAST(CAST(a2 AS DOUBLE) /
        |     CAST(n * (n - 1) AS DOUBLE) AS DECIMAL(28,9)) AS po_i
        |   FROM it),
        | el AS (SELECT v.label, CAST(sum(v.votes) AS BIGINT) AS vj
        |   FROM v JOIN it USING (doc_id) GROUP BY 1),
        | tt AS (SELECT CAST(sum(vj) AS BIGINT) AS t,
        |    count(*) AS n_labels FROM el),
        | pos AS (SELECT count(*) AS n_items, sum(po_i) AS po_sum FROM poi),
        | pes AS (SELECT t2.n_labels, t2.t,
        |    sum(CAST((CAST(e.vj AS DOUBLE) / CAST(t2.t AS DOUBLE)) *
        |        (CAST(e.vj AS DOUBLE) / CAST(t2.t AS DOUBLE))
        |        AS DECIMAL(28,9))) AS pe
        |   FROM el e CROSS JOIN tt t2 GROUP BY 1, 2)
        | SELECT p.n_items, s.n_labels, s.t AS total_votes,
        |  round(CAST(p.po_sum AS DOUBLE) / CAST(p.n_items AS DOUBLE), 9)
        |    AS po_r,
        |  round(CAST(s.pe AS DOUBLE), 9) AS pe_r,
        |  CASE WHEN CAST(s.pe AS DOUBLE) < 1 THEN
        |    round((CAST(p.po_sum AS DOUBLE) / CAST(p.n_items AS DOUBLE)
        |      - CAST(s.pe AS DOUBLE)) / (1.0 - CAST(s.pe AS DOUBLE)), 9)
        |  ELSE 0.0 END AS kappa_r
        | FROM pos p CROSS JOIN pes s""".stripMargin,
    // Hybrid RRF: the oracle replays BOTH retrievers (the shared BM25
    // CTE + the established cosine-rank recompute) and the fixed-point
    // integer fusion — `//` ≡ Spark `div` on positives, sum cast back
    // from HUGEINT.
    "text_hybrid_rrf" ->
      s"""WITH $bm25RankCte,
        | ann AS (
        |  SELECT query_id, item_id, rank FROM (
        |   SELECT q.vec_id AS query_id, c.vec_id AS item_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |               c.vec_id ASC) AS rank
        |   FROM embeddings q CROSS JOIN embeddings c
        |   WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
        |  WHERE rank <= 10),
        | bml AS (SELECT query_id, doc_id AS item_id, rank FROM bmrk
        |   WHERE rank <= 10),
        | contrib AS (
        |  SELECT query_id, item_id, 1000000000000000 // (60 + rank) AS c
        |  FROM bml
        |  UNION ALL
        |  SELECT query_id, item_id, 1000000000000000 // (60 + rank) AS c
        |  FROM ann),
        | fused AS (
        |  SELECT query_id, item_id, CAST(sum(c) AS BIGINT) AS rrf_score_u,
        |   count(*) AS n_lists
        |  FROM contrib GROUP BY query_id, item_id),
        | frk AS (
        |  SELECT query_id, item_id, rrf_score_u, n_lists,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY rrf_score_u DESC, item_id ASC) AS rank
        |  FROM fused)
        | SELECT query_id, item_id, rrf_score_u, n_lists, rank
        | FROM frk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // PSI drift: exact per-bin counts; the term repeats the identical
    // double construction with round(…,9) absorbing the ≤1-ulp libm ln
    // divergence (the sim_rproj posture). Bin width 256 = 2^8 keeps
    // the floor-division IEEE-exact on both engines.
    "dq_drift" -> dqDriftSql,
    // incremental == full: the state-recomputed PSI report must match
    // the full-corpus drift recompute
    "i_incremental_drift" -> dqDriftSql,
    // stream → bin-count state → PSI ≡ the full-corpus drift report
    "stream_drift_replay" -> dqDriftSql,
    // per-source slice drift: same bin/term arithmetic per source;
    // the incremental twin's oracle is the SAME full recompute
    "dq_drift_by" -> dqDriftBySql,
    "i_incremental_drift_by" -> dqDriftBySql,
    "stream_drift_by_replay" -> dqDriftBySql,
    // Funnel: the oracle replays the greedy-earliest stage chain —
    // first signup, first view strictly after it, first purchase
    // strictly after that.
    "events_funnel" -> eventsFunnelSql,
    "stream_funnel_replay" -> eventsFunnelSql,
    "events_retention" -> eventsRetentionSql,
    "stream_retention_replay" -> eventsRetentionSql,
    "events_sessions" -> eventsSessionsSql,
    // streaming sessionization is row-equal to the batch operator once
    // the watermark closes every session — same oracle, literally
    "stream_sessions_replay" -> eventsSessionsSql,
    "s1_snapshot_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "o5_clustered_write" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        | FROM lineitem WHERE l_quantity >= 49
        | ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,
    // o6 returns the rows the pruned scan produced; the file-skipping
    // itself is gated inside the query (require on inputFiles) — the
    // oracle verifies the VALUES are exactly the unpruned filter.
    "o6_stats_pruned_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | WHERE o_totalprice >= 100000.0 AND o_totalprice < 120000.0
        | ORDER BY o_orderkey""".stripMargin,
    // o7: values = the plain filter; the z-order file skipping is
    // gated in-query (require on inputFiles after zorder compaction).
    "o7_zorder_pruned_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | WHERE o_custkey >= 100 AND o_custkey < 200
        | ORDER BY o_orderkey""".stripMargin,
    // the layout is output-invisible: the oracle is the plain filter,
    // the file-skipping is gated inside the query via inputFiles
    "o11_hilbert_pruned_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | WHERE o_custkey >= 100 AND o_custkey < 200
        | ORDER BY o_orderkey""".stripMargin,
    "f3_generators" ->
      """SELECT count(*) AS n_rows, count(*) AS n_uuid, count(*) AS n_mid
        | FROM documents""".stripMargin,
    // F5: the store's key set is derived from nation, so the regex
    // match list is recomputable exactly (RE2 and java.util.regex agree
    // on the digit-class + $-anchor core; both do substring search).
    "f5_regex_search" ->
      """SELECT 'etl_' || lower(n_name) || '.json' AS key FROM nation
        | WHERE regexp_matches('etl_' || lower(n_name) || '.json',
        |   '_1[0-9][.]json$')
        | ORDER BY key""".stripMargin,
    "j_asof_join" -> asofJoinSql,
    "j_asof_tolerance" -> asofToleranceSql,
    // the streaming as-of replays are row-equal to the batch operator
    // by the finalize-on-watermark contract — same oracles, literally
    "stream_asof_replay" -> asofJoinSql,
    "stream_asof_tolerance_replay" -> asofToleranceSql,
    // composite key: the same ASOF join with the derived region column
    // in the equality — neither key column alone determines the group
    "stream_asof_composite_replay" ->
      """SELECT p.event_id, p.user_id, p.region,
        |  v.event_id AS view_event_id
        | FROM (SELECT user_id, event_id, ts,
        |    CAST(event_id % 3 AS BIGINT) AS region
        |   FROM events WHERE event_type = 'purchase') p
        | ASOF LEFT JOIN (SELECT user_id, event_id, ts,
        |    CAST(event_id % 3 AS BIGINT) AS region
        |   FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.region = v.region
        |   AND v.ts <= p.ts
        | ORDER BY p.event_id""".stripMargin,
    // Salted join is row-identical to the plain join — the oracle IS
    // the plain join.
    "j_salted_join" ->
      """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
        | c_name AS customer_name, c_mktsegment AS segment,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS order_value
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        | ORDER BY order_id""".stripMargin,
    // Bucketed range join is semantics-identical to the plain non-equi
    // BETWEEN join — the oracle IS the non-equi join.
    "j_range_join" -> {
      val bands = ((0 until 10).map(i =>
        s"('b$i', ${i * 50000.0}, ${(i + 1) * 50000.0})") :+
        "('mid_market', 75000.0, 225000.0)").mkString(",\n        |  ")
      s"""WITH bands(band, lo, hi) AS (VALUES
        |  $bands)
        | SELECT o_orderkey AS order_id,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |    AS order_value,
        |  band
        | FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        | ORDER BY order_id, band""".stripMargin
    },
    // Interval overlap: the oracle is the plain non-equi join over the
    // same epoch-day integers — the grid decomposition and the
    // first-shared-bucket dedup must be output-invisible.
    "j_interval_overlap" -> {
      """WITH w AS (
        |  SELECT o_orderkey,
        |   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |     AS w_lo
        |  FROM orders WHERE o_orderkey % 50 = 0),
        | wi AS (SELECT o_orderkey, w_lo, w_lo + 14 AS w_hi FROM w),
        | m AS (
        |  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE)
        |    AS m FROM orders),
        | mi AS (
        |  SELECT strftime(m, '%Y-%m') AS month,
        |   CAST(m - DATE '1970-01-01' AS BIGINT) AS m_lo,
        |   CAST(CAST(m + INTERVAL 1 MONTH AS DATE) - DATE '1970-01-01'
        |     AS BIGINT) AS m_hi
        |  FROM m)
        | SELECT o_orderkey, month, w_lo, w_hi
        | FROM wi JOIN mi ON w_lo < m_hi AND m_lo < w_hi
        | ORDER BY o_orderkey, month""".stripMargin
    },
    // Two-phase salted aggregation merges to exactly the plain GROUP BY
    // (decimal partials — associative, order-insensitive).
    "a_salted_agg" ->
      """SELECT o_custkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_orders
        | FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "s_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "s_json_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "s_orc_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    // INDEPENDENT RECOMPUTATION of the end-to-end pipeline summary (not
    // a pinned literal): the hash-derived generator is regenerated in
    // SQL — 20 customer uuids, the 40-order batch indexing customers in
    // natural order (seed 42) and the 10-order batch indexing the
    // SORTED snapshot ids (seed 7), summed order values and distinct
    // customers over the union. The gold join preserves exactly these
    // 50 rows, so the numbers must agree.
    "i1_pipeline_roundtrip" ->
      s"""WITH cust AS (
        |  SELECT i AS k, ${uuidSql("42*1000003 + i", "i*2654435761")} AS cid
        |  FROM range(0, 20) t(i)),
        | csort AS (
        |  SELECT cid, row_number() OVER (ORDER BY cid) - 1 AS k FROM cust),
        | o1 AS (
        |  SELECT 10 + ${h60Sql("oval", 42, "i")} % 991 AS val,
        |         ${h60Sql("ocust", 42, "i")} % 20 AS hc
        |  FROM range(0, 40) t(i)),
        | o2 AS (
        |  SELECT 10 + ${h60Sql("oval", 7, "i")} % 991 AS val,
        |         ${h60Sql("ocust", 7, "i")} % 20 AS hc
        |  FROM range(0, 10) t(i)),
        | allo AS (
        |  SELECT val, cid AS cust FROM o1 JOIN cust ON cust.k = o1.hc
        |  UNION ALL
        |  SELECT val, cid AS cust FROM o2 JOIN csort ON csort.k = o2.hc)
        | SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT cust) AS BIGINT) AS n_customers,
        |  CAST(CAST(sum(val) AS DECIMAL(22,2)) AS VARCHAR) AS total_value,
        |  true AS checkpoint_advanced
        | FROM allo""".stripMargin,
    // Full regeneration of the synthetic customers table in SQL — every
    // summary column recomputed from the (tag, seed, i) hash algebra.
    "s5_generator" ->
      s"""WITH c AS (
        |  SELECT i, ${uuidSql("42*1000003 + i", "i*2654435761")} AS cid,
        |   (['CA','NY','TX','WA','FL','IL','MA','OR','CO','GA'])[
        |     CAST(${h60Sql("state", 42, "i")} % 10 AS INT) + 1] AS state
        |  FROM range(0, 50) t(i))
        | SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT cid) AS BIGINT) AS n_ids,
        |  CAST(count(DISTINCT state) AS BIGINT) AS n_states,
        |  min(cid) AS min_id, max(cid) AS max_id
        | FROM c""".stripMargin,
    // s9: the MOR real-time/compacted view is greatest-ver-per-key over
    // the base batch and the two delta batches (ver breaks every tie, so
    // the commit-ts tiebreak never fires and the SQL is exact).
    "s9_mor_snapshot" ->
      """WITH u AS (
        |  SELECT o_orderkey, 1 AS ver, o_totalprice, o_orderstatus
        |   FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, o_totalprice * 2, o_orderstatus
        |   FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, o_totalprice + 10, o_orderstatus
        |   FROM orders WHERE o_orderkey % 5 = 0),
        | r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY ver DESC) AS rn FROM u)
        | SELECT o_orderkey, ver, o_totalprice, o_orderstatus
        | FROM r WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    // s9b: merge-then-filter over base + one delta; the file-skipping
    // gate is in-query (require on inputFiles), the oracle checks values.
    "s9_mor_pruned_read" ->
      """WITH u AS (
        |  SELECT o_orderkey, 1 AS ver, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, o_totalprice * 2 FROM orders
        |   WHERE o_orderkey < 1000),
        | r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY ver DESC) AS rn FROM u)
        | SELECT o_orderkey, ver, o_totalprice FROM r
        | WHERE rn = 1 AND o_orderkey BETWEEN 500 AND 5000
        | ORDER BY o_orderkey""".stripMargin,
    // s10: final state after restore-to-savepoint = the commit-2 state
    // (batch 1 everywhere, batch 2 winning on %3 keys by greater ver);
    // the commit-3 %5 writes are rolled back and must NOT appear.
    "s10_savepoint_restore" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS ver,
        | CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    // Timeline: one row per commit in ts order. rows_written is the
    // stats-sidecar fold — full table on the first upsert, the %3
    // batch on the delta commit, the folded (whole, unpartitioned)
    // table on compaction, absent on the metadata-only restore.
    "s_timeline" ->
      """SELECT * FROM (
        |  SELECT 1 AS ordinal, 'upsert' AS action,
        |   (SELECT count(*) FROM orders) AS rows_written, 0 AS live_deltas
        |  UNION ALL SELECT 2, 'deltacommit',
        |   (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0), 1
        |  UNION ALL SELECT 3, 'compact',
        |   (SELECT count(*) FROM orders), 0
        |  UNION ALL SELECT 4, 'restore', CAST(NULL AS BIGINT), 0
        | ) ORDER BY ordinal""".stripMargin,
    // Archived timeline: the 2 cleaned instants (full upsert, %3
    // delta) survive as archived = TRUE rows with their recorded row
    // counts intact; the retained compaction + %5 delta stay active.
    "s_archived_timeline" ->
      """SELECT * FROM (
        |  SELECT 1 AS ordinal, 'upsert' AS action,
        |   (SELECT count(*) FROM orders) AS rows_written,
        |   0 AS live_deltas, TRUE AS archived
        |  UNION ALL SELECT 2, 'deltacommit',
        |   (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0), 1, TRUE
        |  UNION ALL SELECT 3, 'compact',
        |   (SELECT count(*) FROM orders), 0, FALSE
        |  UNION ALL SELECT 4, 'deltacommit',
        |   (SELECT count(*) FROM orders WHERE o_orderkey % 5 = 0), 1, FALSE
        | ) ORDER BY ordinal""".stripMargin,
    // Inline compaction policy (fire at 2 live deltas): the second
    // delta commit is followed by an automatic compact instant; the
    // third starts a fresh below-threshold delta run.
    "s_inline_compact" ->
      """SELECT * FROM (
        |  SELECT 1 AS ordinal, 'upsert' AS action,
        |   (SELECT count(*) FROM orders) AS rows_written, 0 AS live_deltas
        |  UNION ALL SELECT 2, 'deltacommit',
        |   (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0), 1
        |  UNION ALL SELECT 3, 'deltacommit',
        |   (SELECT count(*) FROM orders WHERE o_orderkey % 5 = 0), 2
        |  UNION ALL SELECT 4, 'compact',
        |   (SELECT count(*) FROM orders), 0
        |  UNION ALL SELECT 5, 'deltacommit',
        |   (SELECT count(*) FROM orders WHERE o_orderkey % 7 = 0), 1
        | ) ORDER BY ordinal""".stripMargin,
    // Stats view: base = the full first upsert, delta = the %3 MOR
    // batch — row sums and key ranges folded from the sidecars alone.
    "s_stats_view" ->
      """SELECT * FROM (
        |  SELECT 1 AS ordinal, 'base' AS role,
        |   (SELECT count(*) FROM orders) AS n_rows,
        |   (SELECT min(o_orderkey) FROM orders) AS min_key,
        |   (SELECT max(o_orderkey) FROM orders) AS max_key
        |  UNION ALL SELECT 2, 'delta',
        |   (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0),
        |   (SELECT min(o_orderkey) FROM orders WHERE o_orderkey % 3 = 0),
        |   (SELECT max(o_orderkey) FROM orders WHERE o_orderkey % 3 = 0)
        | ) ORDER BY ordinal""".stripMargin,
    // Net version diff c1 -> c3: odd multiples of 3 were never in c1
    // (insert, new payload), even multiples of 3 changed (update,
    // doubled price) unless deleted, multiples of 10 left (delete,
    // payload as of c1 — the intermediate c2 update of a later-deleted
    // key must not leak through).
    "s_table_diff" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 2 <> 0 THEN 'insert'
        |      WHEN o_orderkey % 10 = 0 THEN 'delete'
        |      ELSE 'update' END AS change,
        | CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 10 = 0 THEN 1
        |      ELSE 2 END AS ver,
        | CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 10 = 0
        |      THEN o_totalprice ELSE o_totalprice * 2
        |      END AS o_totalprice
        | FROM orders
        | WHERE (o_orderkey % 3 = 0 AND o_orderkey % 2 <> 0)
        |    OR (o_orderkey % 2 = 0 AND o_orderkey % 3 = 0
        |        AND o_orderkey % 10 <> 0)
        |    OR (o_orderkey % 2 = 0 AND o_orderkey % 10 = 0)
        | ORDER BY o_orderkey""".stripMargin,
    // Storage audit: healthy history reports nothing; the planted
    // 64-byte crash debris is the single deterministic orphan row
    // (clean-reclaims gate is in-query).
    "s_storage_audit" ->
      """SELECT 'data' AS root, '29990101000000000' AS commit_ts,
        | 'orphan' AS status, CAST(1 AS BIGINT) AS parquet_files,
        | CAST(64 AS BIGINT) AS bytes""".stripMargin,
    // Point lookup: rows of the probed keys (lowest key decile, every
    // 50th) — the file-skipping gate is in-query, the oracle checks
    // the values. Integer division: Scala Long `/` and DuckDB `//`
    // both truncate toward zero on the nonnegative cut.
    "o9_key_lookup" ->
      """WITH b AS (SELECT min(o_orderkey) +
        |  (max(o_orderkey) - min(o_orderkey)) // 10 AS cut FROM orders)
        | SELECT o_orderkey, o_custkey, o_totalprice FROM orders, b
        | WHERE o_orderkey <= cut AND o_orderkey % 50 = 0
        | ORDER BY o_orderkey""".stripMargin,
    // Secondary-index lookup: the index path must be output-invisible —
    // the result equals the plain filtered snapshot row-for-row.
    "o10_secondary_lookup" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | WHERE o_custkey % 100 = 0
        | ORDER BY o_orderkey""".stripMargin,
    // insert_overwrite: non-urgent partitions keep batch-1 state; the
    // urgent partition is exactly the refresh batch (even keys, ×2) —
    // odd urgent keys die with the replaced partition version.
    "s_insert_overwrite" ->
      """SELECT o_orderkey, 1 AS ver, o_orderpriority, o_totalprice
        | FROM orders WHERE o_orderpriority <> '1-URGENT'
        | UNION ALL
        | SELECT o_orderkey, 2, o_orderpriority, o_totalprice * 2
        | FROM orders
        | WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
        | ORDER BY o_orderkey""".stripMargin,
    // delete_partition survivors: the partitions the predicate spared.
    "s_delete_partition" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        | WHERE o_orderpriority >= '3'
        | ORDER BY o_orderkey""".stripMargin,
    // Batch CDC: every change record after the full load — the %3
    // update batch (ordinal 1) plus the %7 soft-delete tombstones
    // carrying their pre-delete values (ordinal 2); %21 keys appear in
    // BOTH (the un-collapsed history the incremental read would merge).
    "s_cdc_batch" ->
      """SELECT o_orderkey, 2 AS ver, o_totalprice * 2 AS o_totalprice,
        |  'upsert' AS "_change_type", 1 AS commit_ordinal
        | FROM orders WHERE o_orderkey % 3 = 0
        | UNION ALL
        | SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END,
        |  'delete', 2
        | FROM orders WHERE o_orderkey % 7 = 0
        | ORDER BY o_orderkey, commit_ordinal""".stripMargin,
    // Time travel: the table as of commit 2 — the %3 doubled batch
    // applied, the later %5 batch invisible (same expected state as
    // the s10 restore, reached read-only).
    "s_time_travel" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS ver,
        | CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    // Soft delete: the active view is the untombstoned complement.
    "s_soft_delete" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | WHERE o_orderkey % 7 <> 0
        | ORDER BY o_orderkey""".stripMargin,
    // Partial update: each column independently keeps its latest
    // NON-NULL version — the %15 keys prove batch 3's null price did
    // not erase batch 2's doubling.
    "s_partial_update" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 1000000
        |      ELSE o_custkey END AS o_custkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice,
        | CASE WHEN o_orderkey % 5 = 0 THEN 3
        |      WHEN o_orderkey % 3 = 0 THEN 2
        |      ELSE 1 END AS ver
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    // insert (no-dedup): base ∪ batch — the even urgent keys carry
    // BOTH their ver-1 and ver-2 rows (added, never merged).
    "s_insert_nodedup" ->
      """SELECT o_orderkey, 1 AS ver, o_orderpriority, o_totalprice
        | FROM orders
        | UNION ALL
        | SELECT o_orderkey, 2, o_orderpriority, o_totalprice * 2
        | FROM orders
        | WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
        | ORDER BY o_orderkey, ver""".stripMargin,
    // Bootstrap: adopted rows all ver 1; the tied upsert wins against
    // the null-stamped bootstrap rows, doubling the %3 prices.
    "s_bootstrap" ->
      """SELECT o_orderkey, 1 AS ver,
        | CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    // Files view: every status partition owned by the load commit
    // (ordinal 1) except the replaced 'O' partition (ordinal 2), plus
    // the live delta (ordinal 3, table-wide so rel '').
    "s_files_view" ->
      """SELECT * FROM (
        |  SELECT concat('o_orderstatus=', o_orderstatus) AS rel,
        |   CASE WHEN o_orderstatus = 'O' THEN 2 ELSE 1 END AS commit_ordinal,
        |   'base' AS role
        |  FROM (SELECT DISTINCT o_orderstatus FROM orders)
        |  UNION ALL SELECT '', 3, 'delta'
        | ) ORDER BY rel, commit_ordinal""".stripMargin,
    // Additive evolution: batch-2 rows carry the new column, batch-1
    // rows read back NULL-backfilled under the widened schema.
    "s_schema_evolution" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS ver,
        | o_totalprice,
        | CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey % 100
        |      ELSE NULL END AS bonus
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    "s_schema_rename" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS ver,
        | CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS total_price
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    "s_schema_drop" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS ver,
        | CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10
        |      ELSE o_totalprice END AS o_totalprice
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    // SQL-catalog read: the query body is pure spark.sql over
    // catalog.db.table; the oracle is the same aggregate on the raw
    // input (the upserted table holds exactly the source rows).
    "sql_catalog_read" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS total_price
        | FROM orders WHERE o_totalprice > 1000.0
        | GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Pure-SQL INSERT (= keyed upsert): the %3 keys move to ver 2
    // with doubled totals; ×2 is exponent arithmetic, bit-exact on
    // both engines.
    "sql_insert_write" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS ver,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    // Pure-SQL MERGE: same upsert-window expectation as
    // s3_upsert_merge (greatest precombine per key wins).
    "sql_merge_write" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |   row_number() OVER (PARTITION BY l_orderkey
        |     ORDER BY l_linenumber DESC, l_partkey DESC, l_quantity DESC) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    // Pure-SQL ALTER RENAME then INSERT under the new name: the %3
    // keys carry ver 2 and doubled values in column `total`.
    "sql_alter_write" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS ver,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS total
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    // Pure-SQL UPDATE then DELETE: doubled %3 totals, %5 keys gone.
    "sql_update_delete_write" ->
      """SELECT o_orderkey, 1 AS ver,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        | FROM orders WHERE o_orderkey % 5 <> 0
        | ORDER BY o_orderkey""".stripMargin,
    "a_approx_agg" ->
      """SELECT 'approx_agg' AS family,
        | count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts,
        | true AS orders_pass, true AS parts_pass, true AS median_pass
        | FROM lineitem""".stripMargin,
    // Heavy hitters: n_items / n_hot are exact recomputes of the same
    // skew-constructed stream; the gate booleans are the sketch's
    // order-independent guarantees (integer-exact threshold c·33 > N).
    "a_heavy_hitters" ->
      """WITH it AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'hot_' || event_type
        |   ELSE 'u' || CAST(user_id AS VARCHAR) || '_' || event_type END
        |   AS item FROM events),
        | c AS (SELECT item, count(*) AS c FROM it GROUP BY item),
        | t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c)
        | SELECT 'heavy_hitters' AS family, n AS n_items,
        |  (SELECT count(*) FROM c WHERE c * 33 > t.n) AS n_hot,
        |  true AS containment_pass, true AS error_pass, true AS size_pass
        | FROM t""".stripMargin,
    // Incremental aggregate: the maintained state must equal the full
    // GROUP BY over the union of all three source commits — i.e. the
    // whole orders table, which the oracle recomputes directly.
    "i_incremental_agg" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        | CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        | CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_v
        | FROM orders GROUP BY o_orderpriority
        | ORDER BY o_orderpriority""".stripMargin,
    // Incremental AUC: the oracle is the FULL-corpus tie-corrected
    // Mann–Whitney over the stopword score — the driver compare IS the
    // incremental ≡ full-recompute proof.
    "i_incremental_auc" -> incAucStopwordSql,
    // the LIVE-STREAM face of the same monitoring state: stream ->
    // foreachBatch exactly-once upsert+refresh -> AUC from state; the
    // full-corpus recompute is the oracle, so the green row proves the
    // whole feed-latency monitoring path end to end
    "stream_monitoring_replay" -> incAucStopwordSql,
    // Streaming top-k: per-item counts folded from the stream state
    // must equal the full-corpus top-10 (exact counts are additive —
    // the mergeable summary IS the count state); tie-break (cnt desc,
    // item asc) makes the cut deterministic on both sides.
    "stream_topk_replay" ->
      """SELECT item, cnt FROM (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'hot_' || event_type
        |              ELSE 'u' || user_id || '_' || event_type
        |         END AS item,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1
        | ) ORDER BY cnt DESC, item LIMIT 10""".stripMargin,
    // Live-writer retention: per-micro-batch archival cleaning holds
    // the sink's active timeline at 1 manifest; the visible rows must
    // still be every event exactly once (gates pin the metadata split
    // and the exactly-once registry; the oracle pins the data).
    "stream_sink_retention_replay" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        | FROM events ORDER BY event_id""".stripMargin,
    // Async services racing a live MOR writer: same visible-rows
    // contract — housekeeping must lose nothing and double nothing.
    "stream_async_services_replay" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        | FROM events ORDER BY event_id""".stripMargin,
    // CDC feed via readStream.table through the SQL catalog, with a
    // mid-run checkpoint restart: the accumulated feed is the three
    // commits' change rows, each exactly once.
    "stream_sql_read_replay" ->
      """SELECT o_orderkey, 1 AS ver, o_totalprice FROM orders
        | UNION ALL
        | SELECT o_orderkey, 2 AS ver, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0
        | UNION ALL
        | SELECT o_orderkey, 3 AS ver, o_totalprice * 3 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        | ORDER BY o_orderkey, ver""".stripMargin,
    // Rename mid-stream: the stale-schema consumer's accumulated feed
    // is the three batches' change rows under the OLD column name.
    "stream_schema_rename_replay" ->
      """SELECT o_orderkey, 1 AS ver, o_totalprice FROM orders
        | UNION ALL
        | SELECT o_orderkey, 2 AS ver, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0
        | UNION ALL
        | SELECT o_orderkey, 3 AS ver, o_totalprice * 3 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        | ORDER BY o_orderkey, ver""".stripMargin,
    "i_incremental_auc_by" ->
      raw"""WITH tok AS (
         |  SELECT source, lang,
         |   string_split_regex(trim(lower(text)), '\s+') AS w
         |  FROM documents),
         | sr AS (SELECT source,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST(len(list_filter(w, t -> t IN ('the','a','an','and','or',
         |     'of','to','in','is','it','for','on','with','as','at','by')))
         |     AS DOUBLE) / len(w) AS s
         |  FROM tok),
         | g AS (SELECT source, s, CAST(sum(y) AS BIGINT) AS pos_g,
         |   count(*) AS tot_g
         |  FROM sr WHERE s IS NOT NULL AND source IS NOT NULL
         |  GROUP BY 1, 2),
         | c AS (SELECT source, pos_g, tot_g - pos_g AS neg_g,
         |   coalesce(sum(tot_g - pos_g) OVER (PARTITION BY source
         |     ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |     0) AS cnb
         |  FROM g),
         | cells AS (SELECT source, CAST(sum(pos_g) AS BIGINT) AS n_pos,
         |   CAST(sum(neg_g) AS BIGINT) AS n_neg,
         |   CAST(sum(CAST(pos_g AS DECIMAL(18,0)) *
         |     CAST(2 * cnb + neg_g AS DECIMAL(19,0)))
         |     AS DECIMAL(38,0)) AS u2
         |  FROM c GROUP BY source)
         | SELECT source, n_pos, n_neg, CAST(u2 AS BIGINT) AS u2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |   THEN CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg) END AS auc
         | FROM cells ORDER BY source""".stripMargin,
    // Incremental distinct: per-group row counts are exact; the HLL
    // estimate is gated in-query (sketch registers are
    // implementation-defined, inexpressible here).
    "i_incremental_distinct" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        | true AS distinct_pass
        | FROM orders GROUP BY o_orderpriority
        | ORDER BY o_orderpriority""".stripMargin,
    // Count-Min: n_items/n_distinct are exact recomputes of the same
    // skew-constructed stream as a_heavy_hitters; gate booleans are
    // the sketch's order-independent contracts (grid cells are
    // xxhash64-placed and so inexpressible here).
    "a_countmin" ->
      """WITH it AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'hot_' || event_type
        |   ELSE 'u' || CAST(user_id AS VARCHAR) || '_' || event_type END
        |   AS item FROM events),
        | c AS (SELECT item, count(*) AS c FROM it GROUP BY item)
        | SELECT 'countmin' AS family,
        |  CAST(sum(c) AS BIGINT) AS n_items, count(*) AS n_distinct,
        |  true AS over_pass, true AS err_bound_pass, true AS mass_pass
        | FROM c""".stripMargin,
    // KMV overlap: n_a/n_b/inter/union are exact recomputes of the
    // custkey overlap; the gate booleans are the sketch's estimator
    // contracts (k-min xxhash64 values are inexpressible here).
    "a_kmv_overlap" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS v FROM orders),
        | b AS (SELECT DISTINCT c_custkey AS v FROM customer)
        | SELECT 'kmv_overlap' AS family,
        |  (SELECT count(*) FROM a) AS n_a,
        |  (SELECT count(*) FROM b) AS n_b,
        |  (SELECT count(*) FROM a JOIN b USING (v)) AS inter_exact,
        |  (SELECT count(*) FROM a) + (SELECT count(*) FROM b)
        |    - (SELECT count(*) FROM a JOIN b USING (v)) AS union_exact,
        |  true AS union_pass, true AS jaccard_pass, true AS inter_pass""".stripMargin,
    // SCD2: full window-SQL replay of the deterministic 4-commit write
    // sequence — same value-collapse rule (no-op updates open no
    // interval; a tombstone never collapses and closes the live
    // interval), same lead() interval close, same tombstone exclusion.
    "s_scd2" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        | v1 AS (SELECT k, 'created' AS status,
        |   CAST(1 AS BIGINT) AS ord, 'u' AS ct FROM o),
        | v2 AS (SELECT k, 'shipped' AS status,
        |   CAST(2 AS BIGINT) AS ord, 'u' AS ct FROM o WHERE k % 2 = 0),
        | v3 AS (SELECT k,
        |   CASE WHEN k % 2 = 0 THEN 'shipped' ELSE 'expedited' END AS status,
        |   CAST(3 AS BIGINT) AS ord, 'u' AS ct FROM o WHERE k % 3 = 0),
        | up AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |   UNION ALL SELECT * FROM v3),
        | last3 AS (
        |  SELECT k, status FROM (
        |   SELECT k, status,
        |    row_number() OVER (PARTITION BY k ORDER BY ord DESC) AS rn
        |   FROM up) WHERE rn = 1),
        | v4 AS (SELECT k, status, CAST(4 AS BIGINT) AS ord, 'd' AS ct
        |   FROM last3 WHERE k % 5 = 0),
        | allv AS (SELECT * FROM up UNION ALL SELECT * FROM v4),
        | coll AS (
        |  SELECT k, status, ord, ct,
        |   lag(status || '|' || ct) OVER (PARTITION BY k ORDER BY ord)
        |     AS prev
        |  FROM allv),
        | kept AS (
        |  SELECT k, status, ord, ct FROM coll
        |  WHERE prev IS NULL OR prev <> status || '|' || ct),
        | iv AS (
        |  SELECT k, status, ord AS valid_from_ord, ct,
        |   lead(ord) OVER (PARTITION BY k ORDER BY ord) AS valid_to_ord
        |  FROM kept)
        | SELECT k AS o_orderkey, status, valid_from_ord, valid_to_ord,
        |  valid_to_ord IS NULL AS is_current
        | FROM iv WHERE ct = 'u'
        | ORDER BY o_orderkey, valid_from_ord""".stripMargin,
    // Bloom prune: n_members/n_probes/n_true are exact recomputes of
    // the cohort split; the gate booleans are the filter's
    // order-independent contracts (no false negatives; FP count under
    // the sizing bound — the FP count itself is xxhash64-dependent and
    // so inexpressible here).
    "j_bloom_prune" ->
      """WITH m AS (SELECT DISTINCT o_custkey AS k FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1995-04-01')
        | SELECT 'bloom_prune' AS family,
        |  (SELECT count(*) FROM m) AS n_members,
        |  (SELECT count(*) FROM customer) AS n_probes,
        |  (SELECT count(*) FROM customer JOIN m ON c_custkey = m.k)
        |    AS n_true,
        |  true AS containment_pass, true AS fp_pass""".stripMargin,
    "multimodal_features" ->
      """SELECT 'media_features' AS family, count(*) AS n_rows,
        | true AS dims_pass, true AS range_pass FROM documents""".stripMargin,
    // The decode stub's feature values, recomputed: h = md5-60-bit of
    // the payload (= UTF-8 text bytes); f0 = ((h ^ K1) >>> 11) / 2^53
    // as float32. K1 = 0x9E3779B97F4A7C15 as signed; the arithmetic
    // shift + 53-bit mask equals the unsigned shift.
    "multimodal_features_raw" ->
      """WITH m AS (
        |  SELECT doc_id,
        |   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |     ELSE 'video' END AS media_type,
        |   CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
        |   list_reduce(
        |     list_transform(string_split(substr(md5(text), 1, 15), ''),
        |       c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |     (acc, d) -> acc * 16 + d) AS h
        |  FROM documents)
        | SELECT doc_id, media_type, payload_bytes,
        |  CAST(((xor(h, -7046029254386353131) >> 11)
        |      & ((CAST(1 AS BIGINT) << 53) - 1))
        |    / 9007199254740992.0 AS REAL) AS f0
        | FROM m ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
        | SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(least(64, len - i * 64) AS INT) AS frame_len
        | FROM m, UNNEST(range(0, CAST(ceil(len / 64.0) AS BIGINT), 2)) AS u(i)
        | ORDER BY doc_id, frame_idx""".stripMargin,
    "s_delete_keys" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        | WHERE o_orderpriority <> '1-URGENT'
        | ORDER BY o_orderkey""".stripMargin,
    // survivors = rows the predicate did NOT match; the IS NULL arm
    // mirrors delete-side three-valued logic (a null price is not >= X,
    // so it survives on both engines)
    "s_delete_where" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | WHERE o_totalprice < 4000.0 OR o_totalprice IS NULL
        | ORDER BY o_orderkey""".stripMargin,
    "s_update_where" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice >= 4000.0 THEN '9-DONE'
        |      ELSE o_orderpriority END AS o_orderpriority,
        | o_totalprice FROM orders
        | ORDER BY o_orderkey""".stripMargin,
    "s_apply_changes" ->
      """SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        | FROM orders WHERE o_orderpriority <> '1-URGENT'
        | ORDER BY o_orderkey""".stripMargin,
    "s4_inmemory_source" ->
      """SELECT id, state, CAST(amount AS DOUBLE) AS amount
        | FROM (VALUES (1, 'CA', 100.50), (2, 'NY', 250.25),
        | (3, 'TX', 75.00)) AS t(id, state, amount) ORDER BY id""".stripMargin,
  )
}
