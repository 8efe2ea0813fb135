from demo_otel_parquet_antalya_spark.plans.registry import QUERIES, QuerySpec

# importing the module registers its queries into QUERIES
from demo_otel_parquet_antalya_spark.plans import northstar as _northstar  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window curation (VERDICT.md r1, item 1).
#
# The correctness driver oracle-checks the FIRST 50 registered queries. The
# registration order below puts one representative of EVERY SURVEY.md §2
# family plus the north-star headliners (dedup/similarity/text/multimodal/
# corpus-prep/TPC-H/MERGE) inside that window; redundant variants of
# already-covered families (extra filters, extra set ops, extra TPC-H, the
# quadratic exact-dedup baselines, …) keep their oracles but sit past
# position 50, where the local pytest oracle suite (tests/
# test_queries_oracle.py) still verifies all of them every run.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW: tuple = (
    # --- round-6 curation (VERDICT r5 item 1): rotate IN the three late-r5
    # locally-green queries (graph_communities_neardup,
    # timeseries_ewma_smoothing, multimodal_audio_spectrum) plus the two
    # r6-new queries (multimodal_image_stats_mixed progressive-JPEG,
    # privacy_pii_scrub_logs) the same round they were built; rotate OUT
    # five CORRECTNESS_r05-green within-family redundants
    # (dedup_exact_substr_matches, tpch_q9_product_type_profit,
    # graph_hits_trade, multimodal_classify, privacy_pii_scan), which keep
    # their oracles at the head of the second window where
    # tests/test_queries_oracle.py re-proves them every run.
    # ---------------------------------------------------------------------
    # scans / filters / projection (§2.C rows 1-6)
    "scan_count",
    "filter_eq_count",  # predicate pushdown on the events table
    "log_template_mining",  # Drain-style masking chain, identical-regex oracle
    # joins (§2.C rows 7-12)
    "join_revenue_by_region",  # broadcast star
    "join_outer_order_counts",
    "join_anti_customers_without_orders",
    "join_theta_late_ship",
    "join_range_bucketed",
    "join_asof_grouped",
    # aggregation (§2.C rows 13-17 + pandas UDAF)
    "agg_multikey_counts",
    "agg_pricing_summary",
    "agg_pandas_udaf_iqr",  # PandasUDF GROUPED_AGG
    # windows / sessions / time buckets (§2.C rows 18-20)
    "window_first_order_per_customer",
    # sort / set / scalars (§2.C rows 21-28)
    "sort_topk_orders",
    "string_functions",
    "array_hof_norm",
    "map_priority_counts",
    "json_extract_group",
    # subqueries / CTE / pivot (§2.C rows 29-31)
    "exists_correlated",
    "cte_top_nation_revenue",
    # TPC-H + MERGE headliners
    "tpch_q3_shipping_priority",
    "merge_upsert_orders",
    # north-star: dedup tiers (exact-similarity, banded, CC, line-level,
    # asymmetric containment)
    "dedup_minhash_lsh",
    "dedup_clusters",
    # north-star: similarity / fingerprints / linkage
    "similarity_cosine_topk",
    "er_golden_records",  # r4-in: survivorship over linkage clusters
    # north-star: text quality / retrieval / selection
    "text_bm25_topk",  # r4-in: BM25 ranking
    "dsir_importance_topk",  # r4-in: DSIR importance weighting
    "select_token_budget",  # r4-in: token-budget selection (prefix sums)
    # north-star: drift / time-series / multimodal / corpus prep
    "drift_ks_value",  # r4-in: Kolmogorov-Smirnov on prefix sums
    "pipeline_training_prep",
    # r5-in (VERDICT r4 item 3): the round-4-new families
    "graph_pagerank_trade",  # r5-in: weighted damped PageRank, unrolled oracle
    "graph_triangles_neardup",  # r5-in: degree-ordered triangles on PPJoin pairs
    "dedup_exact_substr_spans",  # r5-in: ExactSubstr interval union (Lee et al.)
    "select_k_center_coreset",  # r5-in: greedy k-center (Gonzalez)
    "shard_token_balanced",  # r5-in: token-balanced contiguous sharding
    "tpch_q2_min_cost_supplier",  # r5-in: partsupp TPC-H representative
    # r5-in (late): the round-5-new codec chains, windowed the same round
    # they were built so no curation lag accrues (VERDICT r4 item "What's
    # wrong" #4) — each certifies a real pure-stdlib codec end-to-end
    "graph_kcore_trade",  # r5-in: fixed-round k-core peeling
    # r6-in (VERDICT r5 item 1): the three late-r5 locally-green queries
    "graph_communities_neardup",  # r6-in: label-propagation communities
    "timeseries_ewma_smoothing",  # r6-in: EWMA over pre-bucketed minutes
    "multimodal_audio_spectrum",  # r6-in: FFT spectral features, transform-free oracle
    # r6-in (built this round, windowed this round - no curation lag)
    "multimodal_image_stats_mixed",  # r6-in: progressive SOF2 + baseline JPEG mix
    "privacy_pii_scrub_logs",  # r6-in: PII scrub inside log_attributes JSON
    # r8-in (built this round, windowed this round — VERDICT r7 items 1+8):
    # the VP8L transform-bearing decode chain; rotates out
    # multimodal_image_stats, whose baseline-JPEG family stays represented
    # by multimodal_image_stats_mixed and re-proven locally every run.
    "multimodal_image_stats_webp",  # r8-in: VP8L all-14-predictor decode mix
    # r8-in: MJPEG + uncompressed-DIB mixed AVI (strictly supersedes the
    # MJPEG-only multimodal_video_frame_stats, rotated to the second
    # window — its demux+JPEG path is a subset of the mixed query).
    "multimodal_video_frame_stats_mixed",  # r8-in: intra-only video codings
    # r8-in (late): the IMAGE dedup tier (operators/image_dedup.py),
    # windowed the round it was built; rotates out dedup_line_level
    # (text-dedup family keeps 3 window reps) and privacy_pii_scrub
    # (privacy family keeps the richer privacy_pii_scrub_logs).
    "multimodal_dedup_exact_pixels",  # r8-in: cross-format exact image dedup
    "multimodal_dedup_phash_neardup",  # r8-in: dHash + pigeonhole hamming join
    # r9-in (built this round, windowed this round — standing window
    # discipline): the proportional-exact-quota stratified sampler;
    # rotates out dedup_jaccard_ppjoin (text-dedup keeps minhash_lsh +
    # clusters + exact_substr_spans), which stays oracle-proven in the
    # local suite every run.
    "sample_stratified_exact",  # r9-in: proportional exact quotas per stratum
    # r12-in (built this round, windowed this round — VERDICT r11 #1+#6):
    # the mixed-grain rollup serving query (fine span + _coarsen'd tail +
    # span_snapshots + 900 s re-bucket == direct bucketing); rotates out
    # multimodal_audio_features, whose WAV-PCM decode family stays
    # represented by multimodal_audio_spectrum (which decodes the same
    # PCM path and adds the FFT) and re-proven locally every run.
    "rollup_spanned_rebucket",  # r12-in: mixed-grain fine+coarse span read
    # r13-in (VERDICT r12 #3, the standing window rule applied to the
    # late-r12 M4 twin): the mixed-grain M4 downsample (hourly fine +
    # 4 h compacted tail re-merged to daily == direct daily M4 — the
    # downsample family's first window rep); rotates out
    # time_bucket_30s_series, whose 30 s bucketing shape is strictly
    # contained in rollup_spanned_rebucket's fine side (the r8
    # "supersedes" rule) and stays bench=True + locally oracle-proven
    # every run.
    "m4_spanned_rebucket",  # r13-in: mixed-grain M4 span + daily re-merge
)

# next-most-important — first in line if the driver window ever widens.
# The leading block is the r4 rotation: all CORRECTNESS_r03-green, oracles
# retained, re-proved locally by tests/test_queries_oracle.py every run.
_SECOND_WINDOW: tuple = (
    # r13 rotate-out (driver-green r1-r12; its 30 s bucketing is the fine
    # side of rollup_spanned_rebucket, and it stays in the bench suite)
    "time_bucket_30s_series",
    # r12 rotate-out (driver-green r5-r11; WAV-PCM audio decode stays
    # window-represented by multimodal_audio_spectrum)
    "multimodal_audio_features",
    # r9 rotate-out (driver-green r4-r8; text-dedup family still has three
    # window reps — see the r9-in note in _DRIVER_WINDOW)
    "dedup_jaccard_ppjoin",
    # r8 rotate-outs (driver-green r5-r7; every family still represented
    # in the window — image/video stats by their strictly-wider mixed
    # variants, text dedup by minhash/clusters/ppjoin, privacy by the
    # richer scrub_logs)
    "multimodal_image_stats",
    "multimodal_video_frame_stats",
    "dedup_line_level",
    "privacy_pii_scrub",
    # r6 rotate-outs (driver-green in r5; families still represented in
    # the driver window)
    "graph_hits_trade",
    "dedup_exact_substr_matches",
    "tpch_q9_product_type_profit",
    "multimodal_classify",
    "privacy_pii_scan",
    # r5 rotate-outs (driver-green in r4; families still represented in the
    # driver window or graded pass-local like prior rotations)
    "agg_rollup",
    "math_revenue_total",
    "multimodal_payload_bytes",
    "text_quality_metrics",
    "window_session_native",
    "fingerprint_overlap_pairs",
    "string_edit_join_deletions",
    "project_alias",
    "date_extract_year",
    "set_intersect_nations",
    "pivot_status_by_year",
    "dedup_containment_pairs",
    "record_linkage_scores",
    "quality_classifier_score",
    "drift_psi_event_mix",
    "timeseries_m4_downsample",
    # r4 rotate-outs (driver-green in r3)
    "agg_count_distinct",
    "agg_percentiles",
    "group_zscore_pandas",
    "scalar_subquery_above_avg",
    "window_frames",
    "json_variant_typed",
    "approx_top_events",
    "anomaly_rolling_zscore",
    "latest_event_per_user",
    "tpch_q10_returned_items",
    "dedup_exact_stats",
    "dedup_semantic_drops",
    "text_lang_id_counts",
    "string_edit_distance_join",
    # earlier rotations / second-tier variants
    "filter_range_conj",
    "embedding_normalize",
    "contamination_cross_split_neardup",
    "fingerprint_winnow_stats",
    "filter_in_like",
    "dedup_repeated_ngram_spans",
    "dedup_span_doc_stats",
    "similarity_int8_topk",
    "cte_recursive_order_chain",
    "text_unigram_logprob",
    "text_tfidf_keywords",
    "sample_weighted_es",
    "mixture_temperature_weights",
    "events_transition_matrix",
    "time_bucket_latency_percentiles",
    "dq_expectations_split",
    "privacy_pseudonymize_users",
    "privacy_forget_users",
    "agg_winsorized_means",
    "text_chunk_windows",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q21_suppliers_kept_waiting",
    "approx_count_distinct_custkey",  # rows-only by contract (t2-exempt sketch)
    "text_sentence_udtf",
    "unpivot_metrics",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "split_train_val_test",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "tpch_q18_large_orders",
    "join_salted_revenue",
    "join_bloom_prefiltered",
    "multimodal_resize",
    "contamination_ngram_check",
    "histogram_equidepth",
    "scd2_user_intervals",
)


def _curate(order: tuple) -> None:
    missing = [n for n in order if n not in QUERIES]
    if missing:
        raise RuntimeError(f"curated driver window names not registered: {missing}")
    dupes = [n for n in set(order) if list(order).count(n) > 1]
    if dupes:
        raise RuntimeError(f"duplicate names in curated driver window: {dupes}")
    curated = {n: QUERIES[n] for n in order}
    curated.update({n: s for n, s in QUERIES.items() if n not in curated})
    QUERIES.clear()
    QUERIES.update(curated)


_curate(_DRIVER_WINDOW + _SECOND_WINDOW)

__all__ = ["QUERIES", "QuerySpec"]
