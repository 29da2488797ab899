#!/usr/bin/env python
"""Re-pin bench budgets for the call-time-eager HEADLINE seats.

bench.py's r8 eager-timing fix (EAGER_QUERIES: timer starts BEFORE the
query call) makes e9c/e35's measured cost include the work that the old
timing missed (CC iterations, eager sketch materialization), so their
pinned budgets — recorded under the old timing — are ~10x too small and
would flag permanent false violations. Same pinning protocol as
`_pin_r7`/`_pin_r8`: median of N_RUNS=5 per session, three FRESH
sessions, budget = median of the three session medians; the JVM
calibration probe is recorded per session so the pin note states the
host window it was taken in.

Usage: python tools/pin_eager_budgets.py seat1 [seat2 ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

N_RUNS = 5
N_SESSIONS = 3
SF_DIR = "/root/testdata/sf0.1"


def _calibrate(spark) -> float:
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
    return time.perf_counter() - t0


def main() -> None:
    seats = sys.argv[1:]
    assert seats, "pass seat names"
    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    per_session: dict[str, list[float]] = {n: [] for n in seats}
    calibs = []
    for s in range(N_SESSIONS):
        spark = get_spark(
            app_name=f"pin-eager-{s}",
            master="local[32]",
            shuffle_partitions=32,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        queries = all_queries()
        calibs.append(round(_calibrate(spark), 3))
        for name in seats:
            # one unmeasured warmup (JVM/codegen), then N_RUNS eager samples
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                df = queries[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            med = round(statistics.median(samples), 3)
            per_session[name].append(med)
            print(f"session {s}: {name} {med:.3f}s", flush=True)
        spark.stop()

    budgets_path = Path(REPO_ROOT) / "bench_budgets.json"
    budgets = json.load(open(budgets_path))
    pins = {}
    for name in seats:
        pins[name] = round(statistics.median(per_session[name]), 3)
        budgets[name] = pins[name]
    note = (
        "Pinned under eager timing (bench.py EAGER_QUERIES: timer starts "
        "before the query call). Session medians: "
        + "; ".join(
            f"{n} {'/'.join(f'{v:.3f}' for v in per_session[n])}"
            for n in seats
        )
        + f"; calib window {min(calibs):.3f}-{max(calibs):.3f} (first "
        "sample is cold-JVM — the probe runs before the warmup call)."
    )
    # APPEND to any existing note — an overwrite silently discards the
    # previous pins' session medians (happened once in r8; restored by
    # hand).
    prior = budgets.get("_repin_r8")
    budgets["_repin_r8"] = f"{prior} || {note}" if prior else note
    json.dump(budgets, open(budgets_path, "w"), indent=1, sort_keys=True)
    print("pinned:", pins)
    print("calib window:", min(calibs), "-", max(calibs))


if __name__ == "__main__":
    main()
