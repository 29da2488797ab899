#!/usr/bin/env python
"""sf100 probe runner (r7 ran this ad-hoc; committed r8 and extended to
the de-hinted TPC-H seats per verdict item 5).

Runs named registered seats against the ×1000 fixture (/tmp/sf100 — a
16 GiB replica with a 600M-row lineitem built by stacking make_sf1.py)
to a noop sink, single cold run each, and merges wall-clocks into
SF100_PROBE.json. The point is completion shape (no OOM, no runaway
reducer), not throughput: a single box substitutes spill for the
parallelism a 1000-executor cluster would bring.

Usage: python tools/sf100_probe.py seat1 seat2 ... [--sf-dir DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
if "--driver-memory" not in _existing:
    os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory 48g {_existing}"

from wx20222_bigdata_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/tmp/sf100"
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    names = argv
    assert names, "pass seat names"
    spark = get_spark(
        app_name="sf100-probe",
        master="local[32]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "64")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wx20222_bigdata_spark.registry import all_queries

    from tools.calib import calib_stamp

    q = all_queries()
    out_path = REPO / "SF100_PROBE.json"
    probe = json.load(open(out_path)) if out_path.exists() else {}
    for name in names:
        t0 = time.perf_counter()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 1)
        probe[name] = sec
        stamp = calib_stamp(spark)
        probe.setdefault("_calib", {})[name] = stamp
        print(
            f"{name}: {sec}s (calib {stamp['sec']}s ratio {stamp['ratio']})",
            flush=True,
        )
        json.dump(probe, open(out_path, "w"), indent=1)
    print(json.dumps(probe, indent=1))


if __name__ == "__main__":
    main()
