"""Funnel invariants of the composed curation pipeline (e7).

Cross-engine exactness is covered by the oracle-parity suite; these are the
semantic invariants any retention report must satisfy, checked at sf0.01.
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE
from wx20222_bigdata_spark.operators.packing import PACK_BUDGET
from wx20222_bigdata_spark.registry import all_queries


def test_curation_funnel_invariants(spark):
    rows = (
        all_queries()["e7_curation_pipeline"](spark, SF_ORACLE).toPandas()
    )
    assert len(rows) > 0
    for r in rows.itertuples():
        # the funnel only ever narrows
        assert r.n_raw >= r.n_quality >= r.n_kept >= 0
        if r.n_kept == 0:
            assert r.kept_tokens == 0 and r.n_bins == 0
            continue
        # every bin holds >= 1 doc; contiguous bin ids are bounded by the
        # token mass (bin of a doc = prev_cum // budget <= total // budget)
        assert 1 <= r.n_bins <= r.n_kept
        assert r.n_bins <= r.kept_tokens // PACK_BUDGET + 1
        # quality gate lower bound: every kept doc has >= 20 tokens
        assert r.kept_tokens >= 20 * r.n_kept


def test_curation_consistent_with_components(spark):
    """The funnel's per-source raw counts must equal the corpus; its kept
    set can never exceed the standalone exact-dedup survivor count."""
    q = all_queries()
    funnel = q["e7_curation_pipeline"](spark, SF_ORACLE).toPandas()
    e1 = q["e1_exact_dedup"](spark, SF_ORACLE).toPandas()
    raw_by_src = dict(zip(e1["source"], e1["n_docs"]))
    uniq_by_src = dict(zip(e1["source"], e1["n_unique"]))
    for r in funnel.itertuples():
        assert r.n_raw == raw_by_src[r.source]
        assert r.n_kept <= uniq_by_src[r.source]
