"""m6 deletion-propagation laws (operators/stats.py). Cross-engine
exactness is covered by test_oracle_parity; these pin the repair
semantics against an independent pandas recomputation and assert every
group outcome the seeded corpus is designed to exhibit actually occurs.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from wx20222_bigdata_spark.operators.stats import (
    M6_COPY_MOD,
    M6_COPY_OFFSET,
    M6_DELETE_MOD,
    m6_deletion_propagation,
)

SF = "/root/testdata/sf0.001"


def _independent(sf: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    copies = docs[docs.doc_id % M6_COPY_MOD == 0].copy()
    copies["doc_id"] = copies["doc_id"] + M6_COPY_OFFSET
    corpus = pd.concat([docs, copies], ignore_index=True)
    corpus["content_key"] = corpus["text"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    corpus["deleted"] = corpus.doc_id % M6_DELETE_MOD == 0
    g = corpus.groupby("content_key")
    out = pd.DataFrame(
        {
            "old_keep_id": g.doc_id.min(),
            "new_keep_id": g.apply(
                lambda s: s.loc[~s.deleted, "doc_id"].min(), include_groups=False
            ),
            "n_copies_before": g.size(),
            "n_copies_after": g.deleted.apply(lambda s: int((~s).sum())),
        }
    )
    out["winner_changed"] = out.old_keep_id != out.new_keep_id.fillna(-1)
    return out


def test_m6_matches_independent_recomputation(spark):
    got = (
        m6_deletion_propagation(spark, SF)
        .toPandas()
        .set_index("content_key")
        .sort_index()
    )
    want = _independent(SF).sort_index()
    assert list(got.index) == list(want.index)
    for c in ["old_keep_id", "n_copies_before", "n_copies_after", "winner_changed"]:
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c
    # nullable winner column: compare with NaN-safe equality
    assert got.new_keep_id.fillna(-1).tolist() == want.new_keep_id.fillna(-1).tolist()


def test_m6_exhibits_all_group_outcomes(spark):
    pdf = m6_deletion_propagation(spark, SF).toPandas()
    # fallback: doc 0 is copied (0 % COPY_MOD == 0) and deleted
    # (0 % DELETE_MOD == 0) — its group's winner must fall back to the copy.
    fb = pdf[pdf.old_keep_id == 0]
    assert len(fb) == 1
    assert fb.iloc[0].new_keep_id == M6_COPY_OFFSET
    assert bool(fb.iloc[0].winner_changed)
    # fully-deleted singleton: NULL new winner, zero copies after.
    gone = pdf[pdf.n_copies_after == 0]
    assert len(gone) > 0
    assert gone.new_keep_id.isna().all()
    assert gone.winner_changed.all()
    # untouched groups: winner stable, counts equal.
    same = pdf[~pdf.winner_changed]
    assert len(same) > 0
    assert (same.old_keep_id == same.new_keep_id).all()
    # conservation: after = before - deletions, and a pair losing its COPY
    # keeps its winner (copy deleted when doc_id % DELETE_MOD == DELETE_MOD
    # - M6_COPY_OFFSET % DELETE_MOD).
    assert (pdf.n_copies_after <= pdf.n_copies_before).all()
    pair_copy_lost = pdf[
        (pdf.n_copies_before == 2)
        & (pdf.n_copies_after == 1)
        & (~pdf.winner_changed)
    ]
    assert len(pair_copy_lost) > 0
