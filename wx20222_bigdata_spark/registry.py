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
    # Round-10 rotation (r9 verdict item 1): seats ADDED or CHANGED this
    # round first (e35d new auto tier; s6 rewritten with a driver-visible
    # shard-manifest oracle; flagship re-fronted after the explicit
    # broadcast hints on its one-row crossJoins), then the ENTIRE
    # 31-seat r05-stale cohort (drive-sim pre-verified green in r9 — 10
    # of them independently re-verified by the judge — driver rows still
    # wanted), then the oldest r06 seats in registration order to fill
    # the 50-seat window. After this round the staleness floor rises to
    # r06 (28 r06 seats remain for the r11 rotation).
    # --- NEW / CHANGED this round ---
    "e35d_semdedup_auto",
    "s6_compaction_manifest",
    "flagship_two_level_metrics",
    # --- r05-stale cohort (complete, minus s6 fronted above) ---
    "a11_distinct",
    "a12_approx_distinct",
    "e2_ngram_jaccard",
    "e2c_simhash",
    "e2e_cosine_neardup",
    "e2f_ml_minhash_lsh",
    "e2h_levenshtein_fuzzy",
    "e2j_char_shingle_lsh_pairs",
    "e2k_salted_lsh_pairs",
    "e34_nospace_exact_dedup",
    "e5_multimodal_manifest",
    "e5b_multimodal_join",
    "e5c_decode_features",
    "f10_mask_arithmetic",
    "f11_cosine_pairs",
    "f12_softmax_stats",
    "f14_batch_permutation",
    "f7b_char_tokenize",
    "f8_budget_cascade",
    "f_array_breadth",
    "o1_stride_sample",
    "o3_pad_to_length",
    "u2_sequence_concat",
    "w4_head_tail_truncate",
    "x1_pandas_udf_token_stats",
    "x2_apply_in_pandas_fold",
    "x3_python_udtf_shingles",
    "x4_map_in_pandas_scoring",
    "x4b_ensemble_scoring",
    "x4c_broadcast_weights_scoring",
    # --- oldest r06 seats in registration order (fill to 50) ---
    "e2g_minhash_lsh_production",
    "e2m_char_lsh_production",
    "e25_incremental_dedup",
    "e9_dedup_clusters",
    "e9b_triangle_count",
    "e28_cluster_survivors",
    "e9c_verified_clusters",
    "e18_cdc_chunking",
    "e20_chunk_dedup",
    "e23_ffd_packing",
    "e24_length_bucketing",
    "e7c_funnel_accounting",
    "e30_dataset_card",
    "e10_decontamination",
    "x7_bloom_decontaminate",
    "f19_minmax_scale",
    "x9_cogroup_attribution",
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
