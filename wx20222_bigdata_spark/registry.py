"""Query/oracle registry — the driver-facing contract.

Every operator from SURVEY.md §2 that the engine implements is declared here
as a named query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string over the same
tables. The driver hash-compares the two at sf0.01; ops without an oracle get
a rows-only check (seeded randomness, streaming, model UDFs — SURVEY.md §5).

Determinism rules for oracle-checked queries (SURVEY.md §7 "hard parts"):
- alias every computed column identically in Spark and SQL;
- no raw timestamps in output (format to string or epoch) — avoids tz drift;
- money/quantity sums go through DECIMAL(18,2|4) so the aggregate is exact and
  order-independent, then cast back to double;
- float-array math keeps elementwise order identical on both sides and rounds
  the final value to 6 decimals.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` marks a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver checks queries in registration order and may cap the number it
# verifies per round (round 1 recorded exactly the first 50 of 99). Names
# listed here are emitted FIRST so queries without a driver-green
# CORRECTNESS row yet — plus anything new/changed this round — get checked
# before already-driver-verified ones. See NOTES_r2.md.
_FRONT: list[str] = [
    # new in the round-2 session 5 (no driver row yet)
    "e25_incremental_dedup",
    "e26_quality_classifier",
    "z1_zorder_stats",
    "m4_incremental_agg",
    "x8_hll_sketch_union",
    "w10_rank_surface",
    "rrf1_hybrid_retrieval",
    "e27_bpe_apply",
    "a16_regression_stats",
    "t9_date_spine",
    "dq2_order_reconciliation",
    "s9f_stream_static_enrich",
    "e28_cluster_survivors",
    "f19_minmax_scale",
    "i3_label_propagation",
    "t5b_unpivot",
    "x9_cogroup_attribution",
    "e29_random_projection",
    "a17_winsorized_stats",
    "w11_cumulative_actives",
    "o12_consistent_sample",
    "dq3_distribution_drift",
    "m5_changefeed_apply",
    "e30_dataset_card",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "w12_range_frame",
    # new in the round-2 continuation session (no driver row yet)
    "e17_semantic_dedup",
    "e18_cdc_chunking",
    "e19_unigram_logprob",
    "w7_gap_fill",
    "t8_grouping_sets",
    "x7_bloom_decontaminate",
    "o11_weighted_sample",
    "w8_rolling_zscore",
    "s10_python_datasource",
    "w9_sessionization",
    "e20_chunk_dedup",
    "dq1_constraint_report",
    "e21_bpe_pair_counts",
    "e22_feature_hashing",
    "a15_value_histogram",
    "u3_bag_set_ops",
    "i2_pagerank_2iter",
    "e23_ffd_packing",
    "e24_length_bucketing",
    # new / materially changed in round 2
    "e9_dedup_clusters",
    "e9b_triangle_count",
    "e10_decontamination",
    "e11_repetition_filter",
    "e12_mixture_sampling",
    "e13_bm25_retrieval",
    "e15_pii_redaction",
    "e14_kmeans_assign",
    "q4_priority_check",
    "q6_forecast_revenue",
    "q12_priority_shipping",
    "q14_promo_effect",
    "m3_snapshot_diff",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q20_part_promotion_suppliers",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q19_discounted_revenue",
    "q21_sole_supplier_orders",
    "q22_global_sales_opportunity",
    "t6_funnel_conversion",
    "t7_cohort_retention",
    "prof1_table_profile",
    "w5_rolling_active_users",
    "o10_hash_split",
    "w6_top_n_per_group",
    "x6_map_in_arrow",
    "e16_tfidf_keywords",
    "f7_vocab_tokenize",
    "e5c_decode_features",
    "e6_sequence_packing",
    "s9d_windowed_dedup",
    "e7_curation_pipeline",
    "q10_returned_items",
    "q18_large_volume_customers",
    "s9e_interval_join",
    "e8_document_chunking",
    "x5_count_min_estimate",
    "a13b_approx_percentiles",
    "m2_scd2_history",
    # hash tier migrated to md5 (outputs changed -> need fresh driver rows)
    "e2b_minhash_lsh_pairs",
    "e2c_simhash",
    "e4e_doc_fingerprint",
    # round-1 registrants with no driver CORRECTNESS row (judge-verified only)
    "q17_small_quantity_revenue",
    "q3_shipping_priority",
    "sql_frontdoor_topn_customers",
    "j5_outer_join_family",
    "p1_flatten_concat",
    "p2_derive_drop",
    "p3_dict_encode",
    "p4_dict_decode",
    "p5_prefix_projection",
    "p7_substring_predicates",
    "p8_conditional_gates",
    "s1_json_roundtrip",
    "s4_csv_line_parse",
    "f_string_surface",
    "f16_datetime_json",
    "f_null_semantics",
    "f_conditional_fns",
    "o5_stratified_holdout",
    "o2_sample_restore_order",
    "o7_seeded_shuffle",
    "e3_cosine_topk",
    "e3b_lsh_bucket_ann",
    "e3c_ivf_probe_ann",
    "skew_salted_agg",
    "j1b_scalable_zip_index",
    "a13_percentiles",
    "a14_moments",
    "m1_upsert_merge",
    "s9_tumbling_window",
    "s9b_sliding_window",
    "s9c_session_windows",
    "t1_asof_join",
    "t2_range_join",
    "t3_time_rollup",
    "t4_cube",
    "t5_pivot",
    "e4_group_stats",
    "e4b_token_freq_topk",
    "e4c_language_id",
    "e4d_quality_score",
    "e4f_token_count",
    "w1_row_number_gap",
    "w2_step_schedule",
    "a9_ema_ordered_fold",
    "a10_swa_snapshot_avg",
    "w3_running_total",
    "o6_ntile_kfold",
    "w_sliding_avg",
]


def _front_loaded(mapping: dict) -> dict:
    front = {n: mapping[n] for n in _FRONT if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in front}
    return {**front, **rest}


def all_queries() -> dict[str, QueryFn]:
    # Import for side effect: operator modules self-register on import.
    from wx20222_bigdata_spark import operators  # noqa: F401

    return _front_loaded(QUERIES)


def all_oracles() -> dict[str, str]:
    from wx20222_bigdata_spark import operators  # noqa: F401

    return _front_loaded(ORACLES)
