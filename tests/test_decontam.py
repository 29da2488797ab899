"""Decontamination invariants (operators/decontam.py). Cross-engine
exactness is covered by test_oracle_parity; these pin the semantics."""

from __future__ import annotations

from wx20222_bigdata_spark.operators.decontam import (
    EVAL_MOD,
    MIN_HITS,
    e10_decontamination,
)

SF = "/root/testdata/sf0.01"


def test_e10_seeded_leaks_detected(spark):
    rows = e10_decontamination(spark, SF).collect()
    by_id = {r["doc_id"]: r for r in rows}
    full = [r for r in rows if 200000 <= r["doc_id"] < 300000]
    partial = [r for r in rows if r["doc_id"] >= 300000]
    # every seeded full leak appears with dominant overlap
    assert len(full) > 0 and all(r["contamination_ratio"] >= 0.5 for r in full)
    # partial leaks appear with intermediate, nonzero overlap
    assert len(partial) > 0
    assert all(0 < r["contamination_ratio"] < 0.5 for r in partial)
    # flag is exactly the threshold predicate
    for r in rows:
        assert r["is_contaminated"] == (r["n_contaminated"] >= MIN_HITS)
        assert 0 < r["n_contaminated"] <= r["n_shingles"]
    # eval docs themselves are never scored (they are not train members)
    assert all(
        not (d < 200000 and d % EVAL_MOD == 0) for d in by_id
    )
