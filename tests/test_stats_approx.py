"""a13b approx_percentile vs the exact a13 baseline: rows-only queries
still get checked — approx_percentile(accuracy=1000) guarantees a result
whose RANK is within n/1000 of the target rank, and it returns an actual
data value, so the check is in discrete rank space: the approx value must
lie between the sorted group values at ranks ⌊(frac−ε)·n⌋ and ⌈(frac+ε)·n⌉.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import all_queries


def test_approx_percentiles_within_rank_error(spark):
    approx = (
        all_queries()["a13b_approx_percentiles"](spark, SF_ORACLE)
        .toPandas()
        .set_index("event_type")
    )
    ev = load_table(spark, SF_ORACLE, "events")
    sorted_vals = {
        r["event_type"]: r["vals"]
        for r in ev.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .collect()
    }
    eps = 1.0 / 1000
    for q_name, frac in [("p50", 0.5), ("p90", 0.9)]:
        for etype, row in approx.iterrows():
            vals = sorted_vals[etype]
            n = len(vals)
            lo_i = max(math.floor((frac - eps) * n) - 1, 0)
            hi_i = min(math.ceil((frac + eps) * n) + 1, n - 1)
            lo, hi = vals[lo_i], vals[hi_i]
            # rounding slack: the query rounds to 6 decimals
            assert lo - 1e-6 <= row[q_name] <= hi + 1e-6, (
                f"{etype} {q_name}: approx {row[q_name]} outside sorted-rank "
                f"window [{lo}, {hi}] (ranks {lo_i}..{hi_i} of {n})"
            )


def test_x8_hll_union_matches_direct_sketch(spark):
    """HLL law: union of per-day shard sketches == one direct sketch over
    the same rows (register max-merge is deterministic), and the estimate
    is within 5% of the exact distinct count."""
    from wx20222_bigdata_spark.operators.stats import x8_hll_sketch_union

    merged = {
        r["event_type"]: r["est_users"]
        for r in x8_hll_sketch_union(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == direct
    for etype, est in merged.items():
        assert abs(est - exact[etype]) <= 0.05 * exact[etype], (etype, est, exact[etype])
