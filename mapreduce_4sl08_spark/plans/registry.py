"""Assembled query registry — the driver-facing operator inventory.

Every entry is one implemented operator/query from SURVEY §2 (reference
parity) or §7.2-7.3 (extended relational / streaming-twin / LLM-pipeline
surface). ``__spark_entry__`` exposes exactly this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    curation, events, extended, quality, relational, scale, text, vectors,
    warehouse,
)
from .base import QuerySpec

_MODULE_SPECS: list[QuerySpec] = [
    *text.SPECS,
    *relational.SPECS,
    *events.SPECS,
    *vectors.SPECS,
    *extended.SPECS,
    *scale.SPECS,
    *curation.SPECS,
    *warehouse.SPECS,
    *quality.SPECS,
]

# Driver CORRECTNESS coverage history (the driver checks ~50 rows per
# round, in registry order). Ordering policy:
#   1. _ROUND_PRIORITY — rows whose plan or oracle CHANGED this round and
#      must be re-proven first.
#   2. Never-driver-checked queries (new this round) — sort next.
#   3. Remaining queries by last-proven round, least recent first.
_ROUND_PRIORITY: tuple[str, ...] = (
    # round 7: plans changed (simhash filter-before-distinct + token
    # array_distinct; jaccard/minhash/winnowing/fingerprint via the
    # shuffle-free shingle index and the _bind_once lambda fix;
    # doc_fingerprint staged projections) — re-prove first.
    "simhash_dedup", "doc_fingerprint", "winnowing_fingerprints",
    "text_char_trigram_profile",
    # round 7 (ADVICE r6): dedup_ngram_jaccard's body was refactored in
    # r6 (candidate stage split into _jaccard_candidates, memo class
    # swap) but was missing from the r6 priority tuple — it and
    # dedup_minhash_lsh (shares _shingle_sets) were only exercised
    # indirectly through dedup_connected_components. Re-prove directly.
    "dedup_ngram_jaccard", "dedup_minhash_lsh",
    # round 7 late session: the jaccard candidate join switched to
    # size-canonical pairs with the asymmetric probe prefix — every
    # consumer of the verified pair set must be re-proven, not just
    # dedup_ngram_jaccard itself.
    "dedup_connected_components", "corpus_curation_pipeline",
    "span_dedup_report", "dedup_cluster_stats", "cluster_best_survivor",
    "decontamination_overlap",
)

# Round-1 pass (CORRECTNESS_r01.json): the first 50 registry entries.
_R1_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        "wordcount_documents", "corpus_curation_pipeline", "quality_rules_audit",
        "dedup_connected_components", "text_chunking_udtf", "text_token_positions",
        "text_token_stats", "text_repetition_stats", "text_quality_score",
        "text_language_id", "doc_fingerprint", "dedup_exact_documents",
        "dedup_ngram_jaccard", "dedup_minhash_lsh", "q1_pricing_summary",
        "q7_nation_volume", "q9_product_profit", "q14_promo_share",
        "join_right_order_customer", "latest_event_per_user",
        "window_trailing_30d_spend", "agg_percentiles", "q3_shipping_priority",
        "q5_local_supplier_volume", "q6_forecast_revenue", "join_left_order_counts",
        "join_semi_big_spenders", "join_anti_inactive", "join_full_nation_presence",
        "range_join_prompt_ship", "agg_rollup_lineitem", "agg_cube_orders",
        "agg_stats_by_flag", "topk_expensive_orders", "sort_customers_multi",
        "set_ops_nations", "window_topk_orders_per_customer", "window_running_spend",
        "window_lag_gap_days", "functions_showcase", "q10_returned_items",
        "q18_large_orders", "window_rank_family", "string_functions_showcase",
        "lineitem_unpivot_measures", "q19_disjunctive_revenue",
        "q13_order_count_histogram", "q11_important_stock",
        "q16_supplier_cnt_by_part", "q8_market_share",
    }
)

# Round-3 pass (CORRECTNESS_r03.json): all 50 rows green; r1 ∪ r2 ∪ r3
# covers all 115 round-3 names.
_R3_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        "agg_approx_distinct", "agg_percentiles", "bigram_surprisal_score",
        "bpe_pretokenize_counts", "cluster_best_survivor",
        "corpus_curation_pipeline", "dedup_connected_components",
        "dedup_exact_documents", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "doc_fingerprint", "embedding_quantization", "events_asof_cogroup",
        "events_session_window_native", "events_sliding_windows",
        "events_windowed_topk", "graph_pagerank_purchases", "ivf_ann",
        "join_anti_inactive", "join_full_nation_presence",
        "join_left_order_counts", "join_right_order_customer",
        "join_semi_big_spenders", "lateral_topk_orders", "latest_event_per_user",
        "mapinarrow_norms", "mixture_sampling_weights", "mixture_weighted_sample",
        "near_dup_containment", "q14_promo_share", "q1_pricing_summary",
        "q3_shipping_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
        "q7_nation_volume", "q9_product_profit", "quality_rules_audit",
        "range_join_prompt_ship", "sequence_packing_bins", "source_mix_report",
        "span_dedup_report", "text_chunking_udtf", "text_language_id",
        "text_quality_score", "text_repetition_stats", "text_token_positions",
        "text_token_stats", "token_budget_selection", "window_trailing_30d_spend",
        "zorder_layout_stats",
    }
)

# Round-2 pass (CORRECTNESS_r02.json); r1 ∪ r2 covers all 98 round-2 names.
_R2_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        "winnowing_fingerprints", "tfidf_top_terms", "unigram_rarity_score",
        "decontamination_overlap", "dedup_cluster_stats", "q21_waiting_suppliers",
        "q15_top_supplier", "q17_small_quantity_revenue", "q22_idle_rich_customers",
        "window_value_functions", "events_tumbling_hourly", "events_user_features",
        "events_sliding_windows", "events_sessionize", "events_json_extract",
        "events_variant_extract", "events_dedup_exact", "events_asof_last_view",
        "events_pivot_types", "events_retention_cohorts", "events_funnel_conversion",
        "knn_bruteforce_cosine", "multimodal_frame_sample", "lsh_bucket_ann",
        "ivf_ann", "embedding_norms", "multimodal_decode_stub", "q4_late_ship_orders",
        "agg_approx_distinct", "graph_pagerank_purchases", "map_functions_showcase",
        "regexp_extract_ids", "date_functions_showcase", "text_char_trigram_profile",
        "q2_min_balance_supplier", "in_subquery_customers", "grouping_sets_revenue",
        "array_functions_showcase", "simhash_dedup", "text_bigram_top20",
        "docs_with_embeddings", "embedding_near_dup", "pandas_udf_norms",
        "q12_priority_by_ship_delay", "q20_dominant_suppliers", "salted_hot_key_agg",
        "bucketed_join_zero_shuffle", "stratified_sample_documents",
        "wordcount_documents", "corpus_curation_pipeline",
    }
)

# Round-4 pass (CORRECTNESS_r04.json): all 50 rows green (2 changed +
# 10 new + 38 stalest r1-era); cumulative r1∪r2∪r3∪r4 covers all 125.
_R4_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        "agg_cube_orders", "agg_rollup_lineitem", "agg_stats_by_flag",
        "approx_percentile_check", "bigram_surprisal_score",
        "column_profile_orders", "copurchase_triangles",
        "daily_revenue_gapfill", "decontamination_overlap",
        "dedup_cluster_stats", "dq_constraint_report",
        "embedding_quantization", "events_asof_last_view",
        "events_dedup_exact", "events_json_extract",
        "events_rate_anomaly_mad", "events_sessionize",
        "events_tumbling_hourly", "events_user_features",
        "events_value_histogram", "events_variant_extract",
        "functions_showcase", "lineitem_unpivot_measures",
        "merge_upsert_orders", "q10_returned_items", "q11_important_stock",
        "q13_order_count_histogram", "q15_top_supplier",
        "q16_supplier_cnt_by_part", "q17_small_quantity_revenue",
        "q18_large_orders", "q19_disjunctive_revenue",
        "q21_waiting_suppliers", "q22_idle_rich_customers",
        "q8_market_share", "scd2_status_history", "set_ops_nations",
        "sort_customers_multi", "string_functions_showcase",
        "tfidf_top_terms", "topk_expensive_orders",
        "trade_reachability_recursive", "unigram_rarity_score",
        "window_lag_gap_days", "window_rank_family", "window_running_spend",
        "window_topk_orders_per_customer", "window_value_functions",
        "winnowing_fingerprints", "wordcount_documents",
    }
)

# Round-5 pass (CORRECTNESS_r05.json): all 50 rows green (7 changed +
# 1 new + 42 stalest r1/r2-era); cumulative r1∪…∪r5 covers all 126.
_R5_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        "array_functions_showcase", "bucketed_join_zero_shuffle",
        "cluster_best_survivor", "column_profile_lineitem",
        "column_profile_orders", "copurchase_triangles",
        "corpus_curation_pipeline", "date_functions_showcase",
        "dedup_cluster_stats", "dedup_connected_components",
        "dedup_exact_documents", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "doc_fingerprint", "docs_with_embeddings", "embedding_near_dup",
        "embedding_norms", "events_funnel_conversion", "events_pivot_types",
        "events_retention_cohorts", "graph_pagerank_purchases",
        "grouping_sets_revenue", "in_subquery_customers",
        "knn_bruteforce_cosine", "lsh_bucket_ann", "map_functions_showcase",
        "multimodal_decode_stub", "multimodal_frame_sample",
        "pandas_udf_norms", "q12_priority_by_ship_delay",
        "q1_pricing_summary", "q20_dominant_suppliers",
        "q2_min_balance_supplier", "q4_late_ship_orders", "q7_nation_volume",
        "q9_product_profit", "quality_rules_audit", "regexp_extract_ids",
        "salted_hot_key_agg", "simhash_dedup", "span_dedup_report",
        "stratified_sample_documents", "text_bigram_top20",
        "text_char_trigram_profile", "text_chunking_udtf",
        "text_language_id", "text_quality_score", "text_repetition_stats",
        "text_token_positions", "text_token_stats",
    }
)

# Round-6 pass (CORRECTNESS_r06.json): all 50 rows green (5 changed +
# 45 stalest r1/r3-era); cumulative r1∪…∪r6 covers all 126.
_R6_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        "agg_approx_distinct", "agg_cube_orders", "agg_percentiles",
        "agg_rollup_lineitem", "agg_stats_by_flag",
        "bigram_surprisal_score", "bpe_pretokenize_counts",
        "column_profile_lineitem", "column_profile_orders",
        "copurchase_triangles", "decontamination_overlap",
        "dedup_connected_components", "events_asof_cogroup",
        "events_session_window_native", "events_sliding_windows",
        "events_windowed_topk", "functions_showcase",
        "graph_pagerank_purchases", "ivf_ann", "join_anti_inactive",
        "join_full_nation_presence", "join_left_order_counts",
        "join_right_order_customer", "join_semi_big_spenders",
        "lateral_topk_orders", "latest_event_per_user", "mapinarrow_norms",
        "mixture_sampling_weights", "mixture_weighted_sample",
        "near_dup_containment", "q14_promo_share", "q3_shipping_priority",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "range_join_prompt_ship", "sequence_packing_bins",
        "set_ops_nations", "sort_customers_multi", "source_mix_report",
        "tfidf_top_terms", "token_budget_selection",
        "topk_expensive_orders", "unigram_rarity_score",
        "window_lag_gap_days", "window_running_spend",
        "window_topk_orders_per_customer", "window_trailing_30d_spend",
        "winnowing_fingerprints", "wordcount_documents",
        "zorder_layout_stats",
    }
)

_DRIVER_CHECKED: frozenset[str] = (
    _R1_DRIVER_CHECKED | _R2_DRIVER_CHECKED | _R3_DRIVER_CHECKED
    | _R4_DRIVER_CHECKED | _R5_DRIVER_CHECKED | _R6_DRIVER_CHECKED
)


def _order_key(s: QuerySpec) -> int:
    if s.name in _ROUND_PRIORITY:
        return 0  # changed this round — must be re-proven first
    if s.name not in _DRIVER_CHECKED:
        return 1  # never driver-checked (new this round)
    # Remaining: least-recently-proven first (LRU rotation). Round 7's
    # ~50-row budget lands on the rows last proven in r4 (the stalest
    # code state after the r6 sweep), then the r5-proven block.
    if s.name in _R6_DRIVER_CHECKED:
        return 7  # proven last round
    if s.name in _R5_DRIVER_CHECKED:
        return 6
    if s.name in _R4_DRIVER_CHECKED:
        return 5
    if s.name in _R3_DRIVER_CHECKED:
        return 4
    if s.name in _R2_DRIVER_CHECKED:
        return 3
    return 2      # round-1 only (none remain after the r4 sweep)


_ALL_SPECS: list[QuerySpec] = sorted(_MODULE_SPECS, key=_order_key)

QUERIES: dict[str, QuerySpec] = {s.name: s for s in _ALL_SPECS}
assert len(QUERIES) == len(_ALL_SPECS), "duplicate query name in registry"


def _with_engine_conf(
        fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Apply the dynamic engine confs (UTC session timezone, AQE, Arrow
    batch sizing) before building the plan — the driver may hand us a
    session that never went through ``entry()``/``get_session``, and the
    timezone in particular is correctness-relevant for every timestamp
    comparison against the DuckDB oracle."""
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..session import apply_engine_conf
        apply_engine_conf(spark)
        return fn(spark, sf_dir)
    return wrapped


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_engine_conf(spec.fn) for name, spec in QUERIES.items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
