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


# Queries whose implementation was REWIRED this round (round 9, late):
# the uncapped pair generators went exact-dedup-first
# (_exact_group_pairs — lossless, candidates over DISTINCT texts),
# hamming/simhash pairs moved to signature-dedup + 3-of-6 combo
# tables, and the near-dup graph analytics (components, triangles,
# PageRank, exact 3-hop reach) now iterate on the exact-text QUOTIENT
# graph. Every query whose physical plan changed is front-loaded so
# the external gate re-verifies the new code paths same-round; the
# earlier-round-9 rewires (capped dup_reach_3hop, partsupp Q11/16/20,
# frozen-merge BPE, NULL-safe audience overlap, top-2 q21) keep their
# slots right after.
_REWIRED = [
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs_prefix",
    "simhash_pairs",
    "asset_dup_pairs",
    "dup_clusters",
    "dup_pagerank",
    "dup_triangles",
    "dup_reach_3hop_exact",
    "corpus_dedup_final",
    "corpus_split_leakage_safe",
    "lsh_candidate_recall",
    "lsh_candidate_precision",
    "text_embedding_dup_agreement",
    "quality_vs_dup_rate",
    "docs_dup_rate_by_source",
    "dup_degree_histogram",
    "dedup_funnel_summary",
    "cluster_best_representative",
    "dup_provenance",
    "corpus_build_summary",
    "dup_reach_3hop",
    "q21_last_shipper",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_promotable_suppliers",
    "docs_bpe_tokens",
    "audience_overlap_matrix",
    "stateful_running_totals",
    "streaming_user_totals",
]

# Queries the round-7 driver gate sampled (CORRECTNESS_r07.json keys —
# all 50 green).
_R7_SAMPLED = {
    "asset_dup_pairs", "corpus_filter", "cube_lineitem_status",
    "customers_with_orders", "customers_without_orders", "date_split",
    "dedup_exact", "distinct_segments", "docs_bpe_token_estimate",
    "docs_fingerprint", "docs_lang_id", "docs_quality",
    "docs_simhash", "docs_token_stats", "dup_clusters",
    "embedding_centroid_drift", "embedding_cluster_purity",
    "embedding_dup_clusters", "embedding_dup_pairs",
    "embedding_hard_negatives", "embeddings_cosine_topk",
    "embeddings_ivf_topk", "embeddings_ivf_trained_topk",
    "embeddings_lsh_multiprobe_topk", "embeddings_lsh_topk",
    "embeddings_pq_adc_topk", "embeddings_pq_codes",
    "events_psi_drift", "kmeans_refine_step", "kmeans_train_k16",
    "loan_agg", "loan_agg_global", "minhash_lsh_pairs",
    "mode_per_column", "nation_keys_intersect", "nation_revenue",
    "ngram_jaccard_pairs", "orders_benford_digits", "pq_recall_at_10",
    "q1_pricing_summary", "rollup_orders", "simhash_pairs",
    "simhash_pairs_capped", "stateful_running_totals",
    "streaming_user_totals", "top_customers_by_revenue",
    "topk_segments", "union_all_files", "window_running_spend",
    "window_topk_per_priority",
}

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

# Queries the round-5 driver gate sampled (CORRECTNESS_r05.json keys —
# all 50 green).
_R5_SAMPLED = {
    "basket_brand_lift", "benchmark_contamination_report",
    "corpus_length_rebalance", "corpus_release_diff",
    "corpus_weighted_sample", "discount_elasticity_by_type",
    "docs_bm25_scores", "docs_dup_rate_by_source", "docs_lang_confusion",
    "docs_lang_source_chi2", "docs_length_pct_rank", "docs_novelty",
    "docs_rrf_fusion", "docs_source_divergence", "docs_source_entropy",
    "docs_unigram_logprob", "docs_zipf_fit", "dup_triangles",
    "events_ab_test", "events_active_users_7d", "events_changepoint",
    "events_crosscorr_lags", "events_dow_hour_heatmap",
    "events_funnel_windowed", "events_latest_state", "events_ohlc_hourly",
    "events_psi_drift", "events_seasonal_anomalies",
    "events_session_paths", "events_tier_temporal_join",
    "events_transition_matrix", "events_user_twap",
    "events_value_bands_daily", "events_winsorized_stats",
    "lineitem_2d_density_grid", "lineitem_equidepth_hist",
    "lineitem_percentiles", "loan_agg_incremental", "orders_abc_classes",
    "orders_benford_digits", "orders_bootstrap_ci", "orders_revenue_gini",
    "orders_rfm_segments", "orders_schema_profile",
    "referential_integrity_audit", "source_overlap_matrix",
    "supplier_lead_times", "user_interarrival_stats", "user_tier_scd2",
    "users_d7_retention",
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


# Queries the round-6 driver gate sampled (CORRECTNESS_r06.json keys —
# all 50 green). With this set the cumulative union covers all 261.
_R6_SAMPLED = {
    "audience_overlap_matrix", "audio_energy_windows", "basket_brand_lift",
    "corpus_shuffle_order", "dedup_funnel_summary", "docs_bigram_logprob",
    "docs_bpe_tokens", "docs_dup_spans", "docs_k_anonymity",
    "docs_lang_source_chi2", "docs_rank_rbo", "docs_source_divergence",
    "docs_substring_cut", "dup_degree_histogram", "embedding_hard_negatives",
    "embeddings_batch_topk", "events_ab_conversion", "events_ab_srm_check",
    "events_ab_test", "events_changepoint", "events_funnel",
    "events_funnel_windowed", "events_mad_anomalies",
    "events_metric_coverage", "events_psi_drift", "events_seasonal_anomalies",
    "events_seasonal_naive_backtest", "events_seasonality_r2",
    "events_session_conversion", "events_winsorized_stats",
    "lineitem_2d_density_grid", "lineitem_equidepth_hist",
    "lineitem_percentiles", "lineitem_percentiles_approx",
    "minhash_estimate_quality", "nation_priority_chi2", "orders_abc_classes",
    "orders_benford_digits", "orders_bootstrap_ci",
    "orders_median_bootstrap_ci", "orders_mom_growth",
    "orders_range_checksums", "orders_revenue_gini", "part_pareto_frontier",
    "supplier_revenue_hhi", "users_churn_risk",
    "users_pseudonymized_activity", "users_stickiness_monthly",
    "users_winback_monthly", "vocab_coverage_curve",
}


# Queries the round-8 driver gate sampled (CORRECTNESS_r08.json keys —
# 49/50 green; the one non-green is event_type_stats_approx, the
# deliberate rows-only HLL entry).
_R8_SAMPLED = {
    "audience_overlap_matrix", "corpus_build_summary", "corpus_mix_sample",
    "corpus_quota_select", "corpus_shuffle_order", "corpus_split",
    "corpus_split_leakage_safe", "customer_string_funcs",
    "dedup_incremental_neardup", "discount_elasticity_by_type",
    "docs_dup_spans", "docs_lang_source_chi2", "docs_length_pct_rank",
    "docs_pmi_bigrams", "docs_rrf_fusion", "docs_source_divergence",
    "dup_reach_3hop", "embedding_dim_correlations",
    "embedding_hard_negatives", "event_type_stats",
    "event_type_stats_approx", "events_asof_click_view",
    "events_autocorr_lag1", "events_crosscorr_lags", "events_funnel",
    "events_gapfill_10min", "events_interval_join", "events_json_extract",
    "events_psi_drift", "events_session_5m", "events_sliding_10m_5m",
    "events_tumbling_10min", "lineitem_percentiles", "lineitem_stats_aggs",
    "nation_keys_except", "nation_priority_chi2",
    "ngram_jaccard_pairs_prefix", "orders_above_customer_avg",
    "orders_grouping_sets", "orders_having", "orders_pivot_status",
    "orders_revenue_gini", "orders_salted_status_join",
    "part_pareto_frontier", "price_buckets", "referential_integrity_audit",
    "source_kmv_similarity", "stateful_running_totals",
    "streaming_user_totals", "text_embedding_dup_agreement",
}

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry, ordered for a prefix-sampling driver: (1) queries
    whose implementation was rewired this round (same-round external
    re-verification of the new code path), (2) never-driver-sampled
    queries — oracle-backed first, then the rows-only stragglers (the
    weak check is still the only external row these will ever get, and
    they are the last holes in the coverage ledger), (3) every other
    oracle query ordered by the LATEST round that sampled it (stalest
    first), (4) remaining rows-only entries last."""
    covered = (
        _R1_SAMPLED | _R2_SAMPLED | _R3_SAMPLED | _R4_SAMPLED
        | _R5_SAMPLED | _R6_SAMPLED | _R7_SAMPLED | _R8_SAMPLED
    )
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    def _take(names):
        for k in names:
            if k in registry.QUERIES and k not in ordered:
                ordered[k] = registry.QUERIES[k]

    _take(_REWIRED)
    _take(k for k in registry.QUERIES
          if k in registry.ORACLE and k not in covered)
    _take(k for k in registry.QUERIES if k not in covered)
    # Oldest-first re-check backlog: order every remaining query by the
    # LATEST round that externally sampled it (computed from the
    # per-round key sets above), alphabetical within a cohort — the
    # stalest driver rows get the remaining prefix slots.
    latest: dict[str, int] = {}
    for rnd, sampled in enumerate(
        (_R1_SAMPLED, _R2_SAMPLED, _R3_SAMPLED, _R4_SAMPLED,
         _R5_SAMPLED, _R6_SAMPLED, _R7_SAMPLED, _R8_SAMPLED),
        start=1,
    ):
        for k in sampled:
            latest[k] = rnd
    _take(sorted(
        (k for k in registry.QUERIES if k in registry.ORACLE),
        key=lambda k: (latest.get(k, 0), k),
    ))
    _take(registry.QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    ordered = queries()
    return {k: registry.ORACLE[k] for k in ordered if k in registry.ORACLE}
