#!/usr/bin/env python
"""Scaling curve for EAGER seats — query functions that execute work at
call time (iterative operators that localCheckpoint each round, zip-index
two-pass seats). tools/scaling_curve.py times noop re-writes of the
returned DataFrame, which for these seats re-reads the final checkpoint
and UNDER-measures (the iterations don't re-run). Here each sample is a
fresh ``queries[name](spark, sf_dir)`` call PLUS the noop write, so the
whole algorithm is inside the timer.

Usage: python tools/eager_seat_curve.py seat1 [seat2 ...]
       [--runs N] [--tiers sf0.1,sf1,sf10]
Merges medians into SCALING_CURVE.json (same shape as scaling_curve.py
rows); tiers at /root/testdata/sf0.1, /tmp/sf1, /tmp/sf10 (built by
tools/make_sf1.py if absent).
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TIERS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/sf1"),
    ("sf10", "/tmp/sf10"),
]


def _ensure(dst: str, k: int, src: str) -> None:
    if Path(dst, "lineitem.parquet").exists():
        return
    spec = importlib.util.spec_from_file_location(
        "make_sf1", Path(REPO_ROOT) / "tools" / "make_sf1.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.replicate(Path(src), Path(dst), k)


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    tiers = TIERS
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    if "--tiers" in argv:
        i = argv.index("--tiers")
        wanted = set(argv[i + 1].split(","))
        tiers = [(t, d) for t, d in TIERS if t in wanted]
        del argv[i : i + 2]
    seats = argv
    assert seats, "pass seat names"

    existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
    if "--driver-memory" not in existing:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory 48g {existing}"

    _ensure("/tmp/sf1", 10, "/root/testdata/sf0.1")
    _ensure("/tmp/sf10", 10, "/tmp/sf1")

    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="eager-seat-curve",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    from tools.calib import calib_stamp

    out_path = Path(REPO_ROOT) / "SCALING_CURVE.json"
    curve = json.load(open(out_path)) if out_path.exists() else {}
    for name in seats:
        row = curve.get(name, {})
        for tier, sf_dir in tiers:
            # one unmeasured warm call so JVM/codegen warmup isn't in
            # sample 1, then `runs` fully-fresh measured calls
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            row[tier] = round(statistics.median(samples), 3)
            stamp = calib_stamp(spark)
            curve.setdefault("_calib", {}).setdefault(name, {})[tier] = stamp
            print(
                f"{tier:6s} {name:32s} {row[tier]:8.3f}s"
                f"  (calib {stamp['sec']}s ratio {stamp['ratio']})",
                flush=True,
            )
        curve[name] = row
        json.dump(curve, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"merged into {out_path}")


if __name__ == "__main__":
    main()
