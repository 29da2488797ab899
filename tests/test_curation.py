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


def test_e7d_funnel_stage_accounting(spark):
    """Each stage's corpus-wide drop equals its seeded signal: quality
    drops exactly the 5-token stubs, exact drops exactly the verbatim
    copies, span drops exactly the ×3 self-repeats (within-doc
    repetition survives every doc-level dedup stage — the span gate is
    the only stage that can catch it); containment drops at least the
    snippets. Counts monotone per source."""
    import pandas as pd

    from wx20222_bigdata_spark.operators.curation import (
        E7D_COPY_MOD,
        E7D_REPEAT_MOD,
        E7D_SNIP_MOD,
        E7D_STUB_MOD,
        e7d_dedup_funnel,
    )

    sf = "/root/testdata/sf0.01"
    pdf = e7d_dedup_funnel(spark, sf).toPandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    n_stubs = int((docs.doc_id % E7D_STUB_MOD == 0).sum())
    n_copies = int((docs.doc_id % E7D_COPY_MOD == 0).sum())
    n_snips = int((docs.doc_id % E7D_SNIP_MOD == 0).sum())
    n_reps = int((docs.doc_id % E7D_REPEAT_MOD == 0).sum())
    t = pdf[["n_raw", "n_quality", "n_exact", "n_containment", "n_final"]].sum()
    # >= not ==: each seeded signal is a LOWER bound on its stage's drop.
    # Natural fixture docs can also trip a gate at other SFs (e.g. a
    # source doc with <= E7D_SNIP_LEN tokens makes its snippet a verbatim
    # copy, shifting that drop to the exact stage) — r8 ADVICE.
    assert t.n_raw - t.n_quality >= n_stubs
    assert t.n_quality - t.n_exact >= n_copies
    assert t.n_containment - t.n_final >= n_reps
    assert t.n_exact - t.n_containment >= n_snips
    # and the funnel's total drop is at least the sum of all seeds
    assert t.n_raw - t.n_final >= n_stubs + n_copies + n_reps + n_snips
    for _, r in pdf.iterrows():
        assert (
            r.n_raw >= r.n_quality >= r.n_exact >= r.n_containment >= r.n_final
        ), r
