"""Mixture-sampling invariants (operators/mixing.py). Cross-engine
exactness is covered by test_oracle_parity."""

from __future__ import annotations

from collections import Counter

from wx20222_bigdata_spark.operators.mixing import BUDGET, e12_mixture_sampling

SF = "/root/testdata/sf0.01"


def test_e12_apportionment_invariants(spark):
    rows = e12_mixture_sampling(spark, SF).collect()
    # the budget is met exactly (availability never binds at sf0.01:
    # max quota 203*20/210 = 19 < 25 per-source docs)
    assert len(rows) == BUDGET
    per_source = Counter(r["source"] for r in rows)
    # monotone in the weight units: src19 gets the most, src0 the least
    assert per_source["src19"] == max(per_source.values())
    assert per_source["src0"] == min(per_source.values())
    # Hamilton rounding: every source within 1 of its ideal share
    for src, got in per_source.items():
        units = int(src[3:]) + 1
        ideal = BUDGET * units / 210
        assert abs(got - ideal) < 1, (src, got, ideal)
    # selection respects the declared quota and rank contract
    for r in rows:
        assert 1 <= r["pick_rank"] <= r["quota"]
