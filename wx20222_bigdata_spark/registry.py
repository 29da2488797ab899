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
    # Round-5 rotation: the 5 queries ADDED THIS ROUND first (driver-green
    # for new ops in their own round — the norm since r3), the r4 CJK heads
    # next, then a refresh of the OLDEST driver rows (r01 names, recorded
    # four rounds ago; e5c_decode_features_stub mapped to its successor).
    # Every registered name already has a driver row across r01-r04; this
    # ordering decides which 50 get a FRESH row in r05.
    "e2k_salted_lsh_pairs",
    "e2m_char_lsh_production",
    "e7c_funnel_accounting",
    "e35_hyperplane_semdedup",
    "s6_compaction_manifest",
    "f7b_char_tokenize",
    "e2j_char_shingle_lsh_pairs",
    "e4g_char_ngram_stats",
    "e34_nospace_exact_dedup",
    "e27b_bpe_nospacing",
    "a5_masked_mean_pool",
    "a6_last4_mean",
    "a8_argmax",
    "a7_ensemble_argmax",
    "o1_stride_sample",
    "o3_pad_to_length",
    "w4_head_tail_truncate",
    "f11_cosine_pairs",
    "f12_softmax_stats",
    "u2_sequence_concat",
    "f10_mask_arithmetic",
    "f_array_breadth",
    "e1_exact_dedup",
    "e1b_dedup_survivors",
    "e2_ngram_jaccard",
    "e2b_minhash_lsh_pairs",
    "e2c_simhash",
    "e2g_minhash_lsh_production",
    "e2h_levenshtein_fuzzy",
    "f8_budget_cascade",
    "x1_pandas_udf_token_stats",
    "x2_apply_in_pandas_fold",
    "x4_map_in_pandas_scoring",
    "x4b_ensemble_scoring",
    "x4c_broadcast_weights_scoring",
    "i1_power_iteration",
    "flagship_two_level_metrics",
    "a1_per_class_f1",
    "a3_rollup_class_counts",
    "a11_distinct",
    "a12_approx_distinct",
    "f13_mlm_corruption",
    "f14_batch_permutation",
    "e2e_cosine_neardup",
    "e2f_ml_minhash_lsh",
    "x3_python_udtf_shingles",
    "e5_multimodal_manifest",
    "e5b_multimodal_join",
    "e5c_decode_features",
    "a4_pricing_summary",
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
