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
    # scans / filters / projection (§2.C rows 1-6)
    "scan_count",
    "filter_eq_count",  # predicate pushdown on the events table
    # filter_range_conj rotated to the second window (third filter-family
    # variant) for the observability-native template miner
    "log_template_mining",  # Drain-style masking chain, identical-regex oracle
    "project_alias",
    # joins (§2.C rows 7-12)
    "join_revenue_by_region",  # broadcast star
    "join_outer_order_counts",
    "join_anti_customers_without_orders",
    "join_theta_late_ship",
    "join_range_bucketed",
    "join_asof_grouped",
    # aggregation (§2.C rows 13-17 + UDAF/pandas + approx)
    "agg_multikey_counts",
    "agg_pricing_summary",
    "agg_count_distinct",
    "agg_rollup",
    "agg_percentiles",
    "agg_pandas_udaf_iqr",  # PandasUDF GROUPED_AGG
    "group_zscore_pandas",  # applyInPandas
    # the approx sketch is rows-only by contract (no oracle) — it lives in the
    # second window so every driver-window row is oracle-checkable (VERDICT r2
    # item 4); scalar_subquery_above_avg takes its slot (r1-driver-green)
    "scalar_subquery_above_avg",
    # windows / sessions / time buckets (§2.C rows 18-20)
    "window_first_order_per_customer",
    "window_frames",
    "window_session_native",  # batch twin of streaming sessionize
    "time_bucket_30s_series",  # reference dashboard Q5 shape
    # sort / set / scalars (§2.C rows 21-28)
    "sort_topk_orders",
    "set_intersect_nations",
    "string_functions",
    "date_extract_year",
    "math_revenue_total",
    "array_hof_norm",
    "map_priority_counts",
    "json_extract_group",
    "json_variant_typed",
    # subqueries / CTE / pivot (§2.C rows 29-31)
    "exists_correlated",
    "cte_top_nation_revenue",
    "pivot_status_by_year",
    # batch twins of the stateful streaming extensions (VERDICT r1 item 8)
    "approx_top_events",  # heavy hitters
    "anomaly_rolling_zscore",  # EWMA/z-score anomaly
    "latest_event_per_user",  # streaming dedup / latest-state
    # TPC-H + MERGE headliners
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "merge_upsert_orders",
    # north-star: dedup / similarity / text / multimodal / corpus prep
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_semantic_drops",  # SemDeDup shape: cluster-bounded pair join
    "similarity_cosine_topk",
    "text_quality_metrics",
    "text_lang_id_counts",
    "multimodal_payload_bytes",
    # embedding_normalize rotated to the second window (simple map-side
    # transform; the embedding tier is already evidenced by cosine top-k)
    # for the new exact similarity-join tier's Ed-Join representative
    "string_edit_distance_join",  # prefix-filtered levenshtein join
    "pipeline_training_prep",
)

# next-most-important — first in line if the driver window ever widens
_SECOND_WINDOW: tuple = (
    "filter_range_conj",  # rotated out for log_template_mining
    "embedding_normalize",  # rotated out for string_edit_distance_join
    "contamination_cross_split_neardup",
    "dedup_jaccard_ppjoin",
    "fingerprint_overlap_pairs",
    "fingerprint_winnow_stats",
    "dsir_importance_topk",
    "filter_in_like",  # third filter-family variant, swapped out for semantic dedup
    "dedup_repeated_ngram_spans",
    "dedup_span_doc_stats",
    "similarity_int8_topk",
    "cte_recursive_order_chain",
    "text_bm25_topk",
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
