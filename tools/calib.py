#!/usr/bin/env python
"""Shared machine-speed calibration probe for the scale ledgers
(r9 verdict "What's wrong" #2).

The per-round bench already scales its budget gate by a fixed
data-independent workload (bench.py ``_calibrate``); the SCALE ledgers
(SCALING_CURVE.json, SF100_PROBE.json) did NOT carry that context, so
ambient-load noise on this shared host produced rows that contradict
each other (e35 sf1 > sf10; o13b sf10 ≫ its ×1000 probe) with no way
for a reader to tell signal from load. Every row written from r10 on
is stamped with the SAME probe: the raw calibration median and its
ratio against bench_budgets.json's ``_calib_ref`` (1.0 = the machine
speed the budgets were pinned at; >1 = this window was slower).
"""

from __future__ import annotations

import json
import statistics
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def calib_median(spark, n: int = 3) -> float:
    """Median seconds of bench.py's calibration workload (codegen hash +
    one small shuffle across all cores) — data-independent machine
    speed for THIS window."""
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        (
            spark.range(0, 40_000_000)
            .selectExpr("xxhash64(id) % 1000 AS h", "xxhash64(id * 7) % 64 AS b")
            .groupBy("b")
            .agg({"h": "sum"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        out.append(time.perf_counter() - t0)
    return round(statistics.median(out), 3)


def calib_stamp(spark, n: int = 3) -> dict:
    """``{"sec": median, "ratio": median / _calib_ref}`` — the stamp the
    scale ledgers attach per measured row."""
    sec = calib_median(spark, n)
    # A null ratio makes the row unstamped-equivalent (a rumor, per
    # NOTES_r10) — say so loudly, once per cause (r11 ADVICE: the two
    # branches used to both fire on an unreadable file).
    try:
        ref = json.load(open(REPO_ROOT / "bench_budgets.json")).get("_calib_ref")
        if not ref:
            print("calib: WARNING no _calib_ref — stamping ratio=null")
    except (FileNotFoundError, json.JSONDecodeError) as e:
        print(f"calib: WARNING bench_budgets.json unreadable ({e!r}) — ratio=null")
        ref = None
    return {
        "sec": sec,
        "ratio": round(sec / ref, 3) if ref else None,
    }
