#!/usr/bin/env python
"""r8 verdict item 4: measure the bucketed co-located twin of q18 (the
steepest fact-fact rows of SCALING_CURVE.json are q9 x5.3 / q18 x4.9 per
x10 step — both dominated by orderkey exchanges) against the shuffled
registered seat, interleaved within one session per tier.

Reports, per SF tier:
- layout_sec: one-time bucketed-write cost (amortized across every
  subsequent orderkey join on a real deployment);
- bucketed_sec / shuffled_sec: interleaved medians (noop sink);
- plan check: the twin has no orderkey exchange.

Usage: python tools/bucketed_join_ab.py [sf_dir ...]
Default tiers: /tmp/sf1 /tmp/sf10
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
if "--driver-memory" not in _existing:
    os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory 48g {_existing}"

from wx20222_bigdata_spark.session import get_spark

N_RUNS = 3


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    tiers = sys.argv[1:] or ["/tmp/sf1", "/tmp/sf10"]
    spark = get_spark(
        app_name="bucketed-join-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.sources.bucketing import (
        layout_orderkey_buckets,
        q18_bucketed,
        q9_bucketed,
    )

    PAIRS = [
        ("q18", q18_bucketed, "q18_large_volume_customers"),
        ("q9", q9_bucketed, "q9_product_profit"),
    ]
    out: dict = {}
    for sf_dir in tiers:
        tier = sf_dir.rstrip("/").split("/")[-1]
        sfx = f"_{tier}"
        t0 = time.perf_counter()
        layout_orderkey_buckets(spark, sf_dir, n_buckets=32, suffix=sfx)
        layout_sec = time.perf_counter() - t0
        out[tier] = {"layout_sec": round(layout_sec, 2), "runs": N_RUNS}
        for label, twin_fn, seat_name in PAIRS:
            twin = twin_fn(spark, sf_dir, suffix=sfx)
            shuffled = all_queries()[seat_name](spark, sf_dir)
            plan = twin._jdf.queryExecution().executedPlan().toString()
            no_orderkey_exchange = (
                "hashpartitioning(l_orderkey" not in plan
                and "hashpartitioning(o_orderkey" not in plan
            )
            _noop(twin)  # warm
            _noop(shuffled)
            b, s = [], []
            for _ in range(N_RUNS):  # interleaved
                b.append(_noop(twin))
                s.append(_noop(shuffled))
            out[tier][label] = {
                "bucketed_sec": round(statistics.median(b), 3),
                "shuffled_sec": round(statistics.median(s), 3),
                "no_orderkey_exchange": no_orderkey_exchange,
            }
            print(f"{tier} {label}: {out[tier][label]}", flush=True)
        spark.sql(f"DROP TABLE IF EXISTS lineitem_obkt{sfx}")
        spark.sql(f"DROP TABLE IF EXISTS orders_obkt{sfx}")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
