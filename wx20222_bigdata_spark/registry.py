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
    # Round-7 rotation (r6 verdict item 1): first the seats REWRITTEN
    # this round (e27/e27b converted rows-only→oracle via the pinned
    # merge table + recursive-CTE encode oracle; e3c converted
    # rows-only→oracle via the ordered-fold centroid mean; e5d's kernel
    # vectorized), then the ENTIRE r02-stale cohort — all 24 seats whose
    # last driver row is r02 plus e5c (r01) — leading with the ones whose
    # files were rewritten after their last driver check (w10 rewritten
    # commit 38d227c; m4/m5 in stats.py touched r6; e21 in tokenize.py
    # touched r6+r7; e11/e19/e22 in textstats.py touched r6; o11/o12/e29
    # rotated out of the r6 window), then the front of the r03 cohort's
    # oldest, biased toward files touched since (similarity/kmeans/
    # tokenize).
    "e27_bpe_apply",
    "e27b_bpe_nospacing",
    "e3c_ivf_probe_ann",
    "f13_mlm_corruption",
    "o2_sample_restore_order",
    "e5d_frame_sample",
    "q9_product_profit",
    # --- r02-stale cohort, rewritten-since-check first ---
    "w10_rank_surface",
    "m5_changefeed_apply",
    "m4_incremental_agg",
    "e21_bpe_pair_counts",
    "e11_repetition_filter",
    "e19_unigram_logprob",
    "e22_feature_hashing",
    "o11_weighted_sample",
    "o12_consistent_sample",
    "e29_random_projection",
    "w7_gap_fill",
    "w8_rolling_zscore",
    "w9_sessionization",
    "w11_cumulative_actives",
    "w12_range_frame",
    "a15_value_histogram",
    "a16_regression_stats",
    "a17_winsorized_stats",
    "x8_hll_sketch_union",
    "t5b_unpivot",
    "t8_grouping_sets",
    "t9_date_spine",
    "s9f_stream_static_enrich",
    # (the old e5c_decode_features_stub r01 row is a renamed seat;
    # e5c_decode_features itself is r05-fresh)
    "m3_snapshot_diff",
    # --- r03 cohort, touched-module and pipeline seats first ---
    "e3_cosine_topk",
    "e14_kmeans_assign",
    "f7_vocab_tokenize",
    "e7_curation_pipeline",
    "e6_sequence_packing",
    "e13_bm25_retrieval",
    "e15_pii_redaction",
    "e16_tfidf_keywords",
    "e12_mixture_sampling",
    "e8_document_chunking",
    "e4_group_stats",
    "e4b_token_freq_topk",
    "e4c_language_id",
    "e4d_quality_score",
    "e4e_doc_fingerprint",
    "e4f_token_count",
    "a13_percentiles",
    "a13b_approx_percentiles",
    "a14_moments",
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
