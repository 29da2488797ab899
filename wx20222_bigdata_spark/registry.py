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
    # Round-6 rotation (r5 verdict items 2 and 8): first the seats ADDED
    # or REWRITTEN this round (f7c is brand new; o7 lost its
    # single-partition window; i1/e23/o5 were converted rows-only→oracle;
    # e4g shuffles hashed gram keys now; e3b got the literal-plane
    # signature + broadcast bucket join; e7c sits on the crash-safe state
    # swap), then the verdict's stale-rewritten list (q5 r01, a9 r03,
    # e17 r02, e31/e33/q17 r04), then the OLDEST remaining driver rows:
    # the r01 join/set names and the front of the r02 cohort.
    # Changed latest in-round (production LSH tiers got the frequent-
    # bucket cap after the sf10 curve): check these first.
    "e2g_minhash_lsh_production",
    "e2m_char_lsh_production",
    "e9c_verified_clusters",
    "f7c_wordpiece",
    "o7_seeded_shuffle",
    "i1_power_iteration",
    "e23_ffd_packing",
    "o5_stratified_holdout",
    "e4g_char_ngram_stats",
    "e3b_lsh_bucket_ann",
    "e7c_funnel_accounting",
    "q5_local_supplier_volume",
    "a9_ema_ordered_fold",
    "e17_semantic_dedup",
    "e31_dsir_importance",
    "e33_ngram_novelty",
    "q17_small_quantity_revenue",
    "j2_broadcast_dim_join",
    "j3_inner_join_revenue",
    "j3_anti_join_integrity",
    "j3_semi_join",
    "j1_positional_zip_join",
    "j4_file_key_join",
    "u1_union_all",
    "set_intersect_except",
    "o4_top_k_orders",
    "e25_incremental_dedup",
    "e9_dedup_clusters",
    "e9b_triangle_count",
    "e28_cluster_survivors",
    "e18_cdc_chunking",
    "e20_chunk_dedup",
    "e24_length_bucketing",
    "e30_dataset_card",
    "e10_decontamination",
    "x7_bloom_decontaminate",
    "f19_minmax_scale",
    "x9_cogroup_attribution",
    "i2_pagerank_2iter",
    "i3_label_propagation",
    "z1_zorder_stats",
    "u3_bag_set_ops",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "s10_python_datasource",
    "dq1_constraint_report",
    "e26_quality_classifier",
    "dq2_order_reconciliation",
    "dq3_distribution_drift",
    "rrf1_hybrid_retrieval",
    # (o11_weighted_sample / o12_consistent_sample / e29_random_projection
    # rotated out to keep the window at 50 after e2g/e2m/e9c entered —
    # front them in r7.)
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
