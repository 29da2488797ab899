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


def test_e12b_sqrt_flattening_law(spark):
    """Temperature quota follows √n, not n: a 10000:100:1 availability
    skew (raw head share 99%) apportions 100:10:1 (head share 90%) —
    chosen so units [100, 10, 1] sum to exactly the budget 111 and the
    apportionment is remainder-free, making the law integer-exact."""
    from wx20222_bigdata_spark.operators.mixing import sqrt_temperature_quota

    avail = spark.createDataFrame(
        [("head", 10000), ("mid", 100), ("tail", 1)], "source string, n long"
    )
    q = {
        r["source"]: r["quota"]
        for r in sqrt_temperature_quota(avail, 111).collect()
    }
    assert q == {"head": 100, "mid": 10, "tail": 1}


def test_e12b_budget_and_cap_invariants(spark):
    from wx20222_bigdata_spark.operators.mixing import (
        B2,
        e12b_temperature_mixture,
    )

    rows = e12b_temperature_mixture(spark, SF).collect()
    # availability never binds at sf0.01 (25 docs/source, quota ≤ 8) —
    # the budget is met exactly
    assert len(rows) == B2
    for r in rows:
        assert 1 <= r["pick_rank"] <= r["quota"]
    # tail sources are never starved: every source with n ≥ 1 gets ≥ 1
    # (floor(sqrt)≥1 floor guarantees a nonzero unit)
    per_source = Counter(r["source"] for r in rows)
    assert len(per_source) == 20


def test_e12b_binding_availability_drops_excess(spark):
    """Availability-cap law (r8 ADVICE): when a source's availability
    binds, its clamped excess is DROPPED, not redistributed — so
    sum(quota) < budget by exactly the shortfall, every quota stays
    ≤ n, and the non-binding sources keep their unclamped shares."""
    from wx20222_bigdata_spark.operators.mixing import sqrt_temperature_quota

    # units = max(floor(sqrt(n)),1): 10 / 2 / 1 → tu = 13. budget 60:
    # a 600/13 → base 46 rem 2; b 120/13 → base 9 rem 3; c 60/13 →
    # base 4 rem 8; one leftover seat goes to c (largest remainder) →
    # unclamped 46/9/5. Availability binds for b (9>5) and c (5>3) →
    # clamped 46/5/3; the 6 dropped seats are NOT redistributed to a.
    avail = spark.createDataFrame(
        [("a", 100), ("b", 5), ("c", 3)], "source string, n long"
    )
    got = {
        r.source: r.quota for r in sqrt_temperature_quota(avail, 60).collect()
    }
    assert got == {"a": 46, "b": 5, "c": 3}
    assert sum(got.values()) == 60 - (9 - 5) - (5 - 3)  # under-budget by dropped excess
