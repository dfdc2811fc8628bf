"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship loan-ETL plan on sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's registry
(airflow_loan_etl_pipeline_spark/registry.py) for the DuckDB
differential-oracle gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airflow_loan_etl_pipeline_spark import registry
from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401  (registers queries)
from airflow_loan_etl_pipeline_spark import registry_stream  # noqa: F401  (registers queries)
from airflow_loan_etl_pipeline_spark import registry_rel  # noqa: F401  (registers queries)
from airflow_loan_etl_pipeline_spark import registry_mm  # noqa: F401  (registers queries)
from airflow_loan_etl_pipeline_spark import registry_sql  # noqa: F401  (registers queries)
from airflow_loan_etl_pipeline_spark import registry_stats  # noqa: F401  (registers queries)
from airflow_loan_etl_pipeline_spark.plans.loan_etl import run_loan_etl

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's whole analytic core (mode-impute →
    date split → multi-key agg → deterministic order) over sf0.001."""
    aggs = run_loan_etl(spark, SF0001)
    assert aggs is not None
    return aggs


# Queries whose implementation was REWIRED this round (round 5: the
# percentile family moved onto stats._by_value_frames — block-level
# counting sort + straddle-complete histogram). Front-loaded ahead of
# the never-sampled backlog so the external driver gate re-verifies the
# new code path once (ADVICE r4 item 4), at the cost of 3 backlog
# slots.
_REWIRED = [
    "lineitem_percentiles",
    "lineitem_equidepth_hist",
    "lineitem_2d_density_grid",
]

# Queries the round-4 driver gate sampled (CORRECTNESS_r04.json keys —
# all 50 green).
_R4_SAMPLED = {
    "acctbal_full_outer", "asset_dup_pairs", "brand_revenue_pipe_syntax",
    "customer_null_handling", "customers_exists_subquery",
    "documents_checksum", "embedding_elements", "events_autocorr_lag1",
    "events_key_skew", "events_trend_regression", "lateral_best_order",
    "lineitem_2d_density_grid", "lineitem_equidepth_hist",
    "multimodal_features", "nation_trade_balance", "orders_cohort_ltv",
    "orders_date_arith", "orders_filtered_aggs",
    "orders_salted_status_join", "orders_sla_breach_by_priority",
    "part_name_fuzzy_pairs", "part_pareto_frontier",
    "parts_single_sourced", "q10_returned_items", "q11_important_stock",
    "q13_customer_distribution", "q14_promo_share", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_predicate_bands", "q20_promotable_suppliers",
    "q21_last_shipper", "q22_idle_rich_customers",
    "q2_max_acctbal_supplier", "q3_shipping_priority",
    "q4_order_priority_waiting", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "region_cross_pairs", "region_nation_list",
    "returns_rate_by_brand", "salted_event_type_counts",
    "stateful_running_totals", "streaming_user_totals",
    "user_value_ewma",
}

# Queries the round-3 driver gate sampled (CORRECTNESS_r03.json keys —
# all 50 green).
_R3_SAMPLED = {
    "cluster_best_representative", "corpus_build_summary",
    "corpus_dedup_final", "corpus_token_budget_plan",
    "customer_regexp_funcs", "dedup_funnel_summary",
    "dedup_incremental_neardup", "docs_charset_stats", "docs_hapax_rate",
    "docs_oov_rate", "docs_pack_sequences",
    "docs_quality_importance_sample", "docs_rank_rbo",
    "docs_shingle_df_histogram", "docs_substring_cut", "dup_provenance",
    "embedding_centroid_drift", "embedding_cluster_purity",
    "embedding_vector_stats", "embeddings_array_funcs",
    "embeddings_ivf_trained_topk", "embeddings_pq_adc_topk",
    "embeddings_pq_codes", "embeddings_quantized_int8",
    "events_asof_next_purchase", "events_debounce", "events_mad_anomalies",
    "events_map_props", "events_props_variant_stats", "events_range_join",
    "events_user_value_anomalies", "kmeans_refine_step", "kmeans_train_k16",
    "label_centroids", "lineitem_percentiles", "lineitem_stats_aggs",
    "nation_extreme_customers", "orders_expectations",
    "orders_open_backlog", "orders_retention_cohorts",
    "orders_union_by_name", "orders_window_frames", "orders_window_nav",
    "part_price_unpivot", "pq_recall_at_10",
    "q12_priority_shipping_buckets", "quality_vs_dup_rate",
    "simhash_bit_balance", "status_multiset_ops",
    "text_embedding_dup_agreement",
}

# Queries the round-2 driver gate sampled (CORRECTNESS_r02.json keys).
# Disjoint from _R1_SAMPLED; union = cumulative driver coverage.
_R2_SAMPLED = {
    "corpus_build_summary", "corpus_dedup_final", "corpus_mix_sample",
    "corpus_quota_select", "corpus_shuffle_order", "corpus_split",
    "corpus_split_leakage_safe", "dedup_exact_normalized",
    "dedup_incremental_candidates", "docs_bigram_logprob",
    "docs_charset_stats", "docs_chunks", "docs_compressibility",
    "docs_decontaminate", "docs_dup_spans", "docs_feature_matrix",
    "docs_heavy_tokens", "docs_oov_rate", "docs_pack_sequences",
    "docs_pii_scrub", "docs_pmi_bigrams", "docs_readability",
    "docs_repetition", "docs_tfidf_top_terms", "docs_top_terms",
    "dup_pagerank", "dup_reach_3hop", "embedding_dim_correlations",
    "embedding_dim_stats", "embedding_dup_clusters",
    "embedding_hard_negatives", "embeddings_batch_topk",
    "embeddings_quantized_int8", "embeddings_standardized_norms",
    "events_funnel", "events_time_rollup", "kmeans_refine_step",
    "loan_payment_schedule", "loan_portfolio_runoff", "loan_vintage_status",
    "lsh_candidate_precision", "lsh_candidate_recall",
    "minhash_estimate_quality", "minhash_lsh_pairs_capped",
    "ngram_containment_pairs", "ngram_jaccard_pairs_capped",
    "ngram_jaccard_pairs_prefix", "simhash_pairs_capped",
    "source_kmv_similarity", "vocab_coverage_curve",
}

# Queries the round-1 driver gate sampled (CORRECTNESS_r01.json keys).
_R1_SAMPLED = {
    "loan_agg", "loan_agg_global", "mode_per_column", "date_split",
    "topk_segments", "q1_pricing_summary", "top_customers_by_revenue",
    "nation_revenue", "customers_without_orders", "customers_with_orders",
    "distinct_segments", "rollup_orders", "cube_lineitem_status",
    "window_topk_per_priority", "window_running_spend",
    "nation_keys_intersect", "nation_keys_except", "union_all_files",
    "events_json_extract", "events_tumbling_10min", "events_gapfill_10min",
    "docs_token_stats", "docs_quality", "docs_lang_id", "docs_fingerprint",
    "dedup_exact", "minhash_lsh_pairs", "ngram_jaccard_pairs",
    "docs_simhash", "simhash_pairs", "embeddings_cosine_topk",
    "embeddings_lsh_topk", "embeddings_ivf_topk", "embedding_dup_pairs",
    "corpus_filter", "dup_clusters", "embeddings_lsh_multiprobe_topk",
    "docs_bpe_token_estimate", "events_sliding_10m_5m", "events_session_5m",
    "orders_pivot_status", "event_type_stats", "event_type_stats_approx",
    "events_asof_click_view", "events_interval_join", "orders_having",
    "price_buckets", "customer_string_funcs", "orders_grouping_sets",
    "orders_above_customer_avg",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry, ordered for a prefix-sampling driver: (1) queries
    whose implementation was rewired this round (one round of external
    re-verification for the new code path), (2) never-driver-sampled
    oracle queries (so each round's 50-sample prefix retires ~47 more
    of the external-verification backlog), (3) already driver-green
    queries, (4) rows-only entries last (no oracle — a sample slot
    spent on one yields only the weak rows-check)."""
    covered = _R1_SAMPLED | _R2_SAMPLED | _R3_SAMPLED | _R4_SAMPLED
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in _REWIRED:
        if k in registry.QUERIES:
            ordered[k] = registry.QUERIES[k]
    for tier in (
        lambda k: k in registry.ORACLE and k not in covered,
        lambda k: k in registry.ORACLE,
        lambda k: True,
    ):
        for k, v in registry.QUERIES.items():
            if k not in ordered and tier(k):
                ordered[k] = v
    return ordered


def oracle_sql() -> dict[str, str]:
    ordered = queries()
    return {k: registry.ORACLE[k] for k in ordered if k in registry.ORACLE}
