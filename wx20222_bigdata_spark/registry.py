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
    # Round-5 rotation: queries ADDED THIS ROUND first (driver-green for
    # new ops in their own round — the norm since r3), then a refresh of
    # the oldest driver rows (r01 names, recorded three rounds ago).
    # Every registered name already has a driver row across r01–r04;
    # this is artifact ordering only.
    "e2k_salted_lsh_pairs",
    "e2m_char_lsh_production",
    "e7c_funnel_accounting",
    "e35_hyperplane_semdedup",
    "s6_compaction_manifest",
    # — r4 heads (kept near the front: newest correctness-critical ops) —
    "f7b_char_tokenize",
    "e2j_char_shingle_lsh_pairs",
    "e4g_char_ngram_stats",
    "e34_nospace_exact_dedup",
    "e27b_bpe_nospacing",
    # — the 45 never-driver-checked names (r3 verdict §coverage list) —
    "e31_dsir_importance",
    "e32_paragraph_dedup",
    "e33_ngram_novelty",
    "e5d_frame_sample",
    "f20_robust_scale",
    "f21_variant_json",
    "i4_bfs_levels",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q20_part_promotion_suppliers",
    "q21_sole_supplier_orders",
    "q22_global_sales_opportunity",
    "q3_shipping_priority",
    "q4_priority_check",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "s1_json_roundtrip",
    "s4_csv_line_parse",
    "s9_tumbling_window",
    "s9b_sliding_window",
    "s9c_session_windows",
    "s9d_windowed_dedup",
    "s9e_interval_join",
    "skew_salted_agg",
    "sql_frontdoor_topn_customers",
    "t1_asof_join",
    "t2_range_join",
    "t3_time_rollup",
    "t4_cube",
    "t5_pivot",
    "t6_funnel_conversion",
    "t7_cohort_retention",
    "w1_row_number_gap",
    "w2_step_schedule",
    "w3_running_total",
    "w5_rolling_active_users",
    "w6_top_n_per_group",
    "w_sliding_avg",
    "x5_count_min_estimate",
    "x6_map_in_arrow",
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
