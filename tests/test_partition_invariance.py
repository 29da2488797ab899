"""Partition-invariance laws: operator results must not depend on the
physical partitioning of their input.

This is the distributed-correctness property that separates an operator
that HAPPENS to pass on one layout from one that is right at any scale:
at 100 TB the same table arrives as thousands of splits in arbitrary
order, after AQE coalescing, salting, or a rebalance
(catalog.rebalance_small_scan). Each law recomputes a representative
operator on an adversarial repartition (prime partition count → rows
scattered round-robin, none of the original co-location survives) and
asserts the result set is IDENTICAL to the plain run.

Operators chosen to cover the algebraic shapes: min-aggregate sketches
(MinHash band keys), min-struct winner election (paragraph dedup),
order-sensitive folds protected by explicit sorts (DSIR per-doc sums),
and the window-over-key rewrite (novelty df counts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wx20222_bigdata_spark.operators import dedup, quality, textstats

SF = "/root/testdata/sf0.001"


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def test_minhash_band_keys_partition_invariant(spark):
    corpus = dedup._corpus_with_mutants_spark(spark, SF)
    plain = dedup.minhash_band_keys(corpus)
    scattered = dedup.minhash_band_keys(corpus.repartition(7))
    assert _rows(plain) == _rows(scattered)


def test_e32_winner_election_partition_invariant(spark, tmp_path, monkeypatch):
    # Route the operator's own loader through an adversarial repartition.
    import wx20222_bigdata_spark.operators.dedup as d

    plain = _rows(d.e32_paragraph_dedup(spark, SF))
    orig = d.load_table
    monkeypatch.setattr(
        d, "load_table", lambda s, sf, n: orig(s, sf, n).repartition(7)
    )
    scattered = _rows(d.e32_paragraph_dedup(spark, SF))
    assert plain == scattered


def test_e31_sorted_fold_partition_invariant(spark, monkeypatch):
    # The per-doc float fold is ORDER-SENSITIVE; the explicit
    # array_sort(collect_list(...)) is what makes it partition-invariant.
    # This is the law that would break if the sort were ever dropped.
    import wx20222_bigdata_spark.operators.quality as q

    plain = _rows(q.e31_dsir_importance(spark, SF))
    orig = q.load_table
    monkeypatch.setattr(
        q, "load_table", lambda s, sf, n: orig(s, sf, n).repartition(7)
    )
    scattered = _rows(q.e31_dsir_importance(spark, SF))
    assert plain == scattered


def test_e33_window_df_partition_invariant(spark, monkeypatch):
    import wx20222_bigdata_spark.operators.textstats as t

    plain = _rows(t.e33_ngram_novelty(spark, SF))
    orig = t.load_table
    monkeypatch.setattr(
        t, "load_table", lambda s, sf, n: orig(s, sf, n).repartition(7)
    )
    scattered = _rows(t.e33_ngram_novelty(spark, SF))
    assert plain == scattered


def test_e36_span_windows_partition_invariant(spark, monkeypatch):
    # e36 chains TWO order-sensitive windows (count-over-gram, then
    # lag-over-positions within doc); both must be insensitive to input
    # layout — the lag window's orderBy("pos") is the guard.
    import wx20222_bigdata_spark.operators.substring as sub

    plain = _rows(sub.e36_substring_span_trim(spark, SF))
    orig = sub.load_table
    monkeypatch.setattr(
        sub, "load_table", lambda s, sf, n: orig(s, sf, n).repartition(7)
    )
    scattered = _rows(sub.e36_substring_span_trim(spark, SF))
    assert plain == scattered
