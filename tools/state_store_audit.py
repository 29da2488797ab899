#!/usr/bin/env python
"""Streaming state-store growth audit (r6 verdict item 8).

STREAM_THROUGHPUT.json answers "how fast do the streaming jobs drain";
this tool answers the other 100 TB question: **is their state bounded?**
A stateful operator whose state grows linearly with input is a slow OOM
on a real cluster no matter how fast each micro-batch runs — the design
contract is that watermark advance EVICTS finalized state, so steady-
state rows track the live horizon (open windows / in-watermark keys /
key pool), never total input.

Method: synthesize N_EVENTS events whose timestamps advance
monotonically (1 event/second), written as K sequential parquet files so
``maxFilesPerTrigger=1`` replays them as K micro-batches with a
strictly advancing watermark. Each stateful job runs to a noop sink with
``availableNow``; per-batch ``stateOperators`` metrics (numRowsTotal,
numRowsUpdated, numRowsRemoved, memoryUsedBytes) come from
``query.recentProgress``. The recorded verdict per job compares state
rows at the midpoint vs the end of the run: a bounded design holds a
~1x ratio while input doubles; linear growth shows up as ~2x.

Expected shapes (all bounded, for different reasons):
- tumbling_counts: state = open (window, event_type) groups inside the
  watermark horizon — evicted as windows finalize.
- windowed_dedup (dropDuplicatesWithinWatermark): state = keys seen
  within the watermark — evicted as the watermark passes them.
- session_window_counts: state = open sessions — closed by gap+watermark.
- stateful_ema (applyInPandasWithState, NoTimeout): state = key pool
  (one row per user) — flat once every user has appeared; bounded by
  design of the key domain, not by eviction.

``--provider rocksdb`` switches the state store to the RocksDB provider —
the store a real 100 TB deployment runs, because HDFS-backed in-memory
state is bounded by executor heap while RocksDB spills to local disk and
snapshots incrementally. The audit verifies the SAME boundedness contract
holds (and records the throughput delta vs the default provider).

``--skew`` (r8 verdict item 6) routes ~50% of events to ONE hot user_id
(the rest keep the uniform mod-10k spread). The boundedness contract must
hold unchanged — a hot key updates one state row more often, it does not
create more rows (sessions: the hot key's events merge into one
ever-extending open session; EMA: one row per user regardless of
traffic). What skew CAN cost is a straggler task (every hot-key row
shuffles to one state partition), which shows up as a throughput drop vs
the uniform run — compare rows_per_sec between the two runs; the salted
mitigation, if ever needed, is the same two-level pattern as
skew_salted_agg (operators/skew.py).

Usage: python tools/state_store_audit.py [--events N] [--files K]
       [--provider hdfs|rocksdb] [--skew] [--jobs a,b,c] [--out FILE]

``--jobs`` (r11) filters the case list by name — the 25M-row-per-batch
scale step re-runs only the jobs under test (salted sessions vs plain,
incremental dedup) instead of paying the full matrix at 100M events.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

WORK = "/tmp/spark_graft_state_audit"


def main() -> None:
    argv = sys.argv[1:]
    n_events = 10_000_000
    n_files = 25
    out_file = None
    if "--events" in argv:
        n_events = int(argv[argv.index("--events") + 1])
    if "--files" in argv:
        n_files = int(argv[argv.index("--files") + 1])
    if "--out" in argv:
        out_file = argv[argv.index("--out") + 1]
    provider = "hdfs"
    if "--provider" in argv:
        provider = argv[argv.index("--provider") + 1]
    skew = "--skew" in argv

    from pyspark.sql import functions as F

    from wx20222_bigdata_spark.session import get_spark
    from wx20222_bigdata_spark.streaming import jobs

    extra = {
        "spark.ui.showConsoleProgress": "false",
        # recentProgress is ring-buffered (default 100): with more
        # micro-batches than that, the per-batch state series would
        # silently keep only the tail — a linearly growing store could
        # read as "bounded". Size the buffer to the run.
        "spark.sql.streaming.numRecentProgressUpdates": str(
            max(2 * n_files + 10, 200)
        ),
    }
    if provider == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="state_store_audit",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = f"{WORK}/events_in" + ("_skew" if skew else "")
    shutil.rmtree(src, ignore_errors=True)
    chunk = n_events // n_files
    n_events = chunk * n_files  # actual rows written (integer division)
    # uniform: user_id = id % 10k. skew: every even id -> hot user 0
    # (~50% of all events), odd ids keep the mod-10k spread.
    user_col = (
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 10_000)
        if skew
        else (F.col("id") % 10_000)
    )
    for i in range(n_files):
        # sequential single-file writes -> ascending mod-times -> the
        # file source replays them in time order, one per micro-batch
        (
            spark.range(i * chunk, (i + 1) * chunk)
            .select(
                F.col("id").alias("event_id"),
                F.col("id").cast("timestamp").alias("ts"),  # 1 event/sec
                user_col.cast("long").alias("user_id"),
                F.element_at(
                    F.array(F.lit("view"), F.lit("click"), F.lit("buy"), F.lit("scroll")),
                    (F.col("id") % 4 + 1).cast("int"),
                ).alias("event_type"),
                (F.col("id") % 97).cast("double").alias("value"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    cases = {
        "tumbling_counts": (lambda s: jobs.tumbling_counts(s), "update"),
        "windowed_dedup": (lambda s: jobs.windowed_dedup(s), "append"),
        "session_window_counts": (
            lambda s: jobs.session_window_counts(s),
            "append",
        ),
        "stateful_ema": (lambda s: jobs.stateful_ema(s), "update"),
        # r9: the salted two-level session stage-1 — state keys are
        # (user, 6h-time-salt), so a hot user's updates spread across
        # salt buckets instead of hammering one state row/partition.
        "salted_sub_sessions": (
            lambda s: jobs.salted_sub_sessions(s),
            "append",
        ),
    }
    all_cases = cases
    if skew:
        # the skew audit targets the user_id-keyed jobs (the window
        # jobs key on time, not user — a hot user doesn't skew them);
        # salted_sub_sessions is the mitigation under test: compare its
        # p95/p50 and throughput against session_window_counts
        cases = {
            k: cases[k]
            for k in (
                "session_window_counts",
                "stateful_ema",
                "salted_sub_sessions",
            )
        }
    if "--jobs" in argv:
        # r11 ADVICE: validate against the FULL (pre---skew) case set —
        # --skew plus a legitimate non-skew name used to crash with a
        # misleading 'unknown jobs' assert (silently skipped under -O).
        wanted = set(argv[argv.index("--jobs") + 1].split(","))
        unknown = wanted - set(all_cases)
        if unknown:
            raise SystemExit(
                f"unknown jobs {sorted(unknown)}; have {sorted(all_cases)}"
            )
        cases = {k: v for k, v in cases.items() if k in wanted}
        if not cases:
            raise SystemExit(
                f"requested jobs {sorted(wanted)} are all outside the --skew "
                "case set (session_window_counts, stateful_ema, "
                "salted_sub_sessions); drop --skew or pick from those"
            )

    results: dict[str, dict] = {}
    for name, (make, mode) in cases.items():
        ckpt = f"{WORK}/ckpt_{provider}_{name}"
        shutil.rmtree(ckpt, ignore_errors=True)
        stream = (
            spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = (
            make(stream)
            .writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0

        batches = []
        for p in q.recentProgress or []:
            if (p.get("numInputRows") or 0) == 0:
                continue
            ops = p.get("stateOperators") or []
            batches.append(
                {
                    "rows_in": p["numInputRows"],
                    "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                    "updated": sum(o.get("numRowsUpdated", 0) for o in ops),
                    "removed": sum(o.get("numRowsRemoved", 0) for o in ops),
                    "state_bytes": sum(o.get("memoryUsedBytes", 0) for o in ops),
                    "batch_ms": (p.get("durationMs") or {}).get(
                        "triggerExecution", 0
                    ),
                }
            )
        series = [b["state_rows"] for b in batches]
        mid = series[len(series) // 2] if series else 0
        fin = series[-1] if series else 0
        growth = round(fin / max(mid, 1), 3)
        durs = sorted(b["batch_ms"] for b in batches)
        results[name] = {
            "skew": skew,
            "batch_ms_p50": durs[len(durs) // 2] if durs else 0,
            "batch_ms_p95": durs[int(len(durs) * 0.95)] if durs else 0,
        }
        results[name] |= {
            "rows": n_events,
            "micro_batches": len(batches),
            "wall_sec": round(wall, 2),
            "rows_per_sec": int(n_events / wall),
            "state_rows_max": max(series, default=0),
            "state_rows_mid": mid,
            "state_rows_final": fin,
            "state_bytes_max": max((b["state_bytes"] for b in batches), default=0),
            "removed_total": sum(b["removed"] for b in batches),
            "mid_to_final_growth": growth,
            "bounded": growth < 1.5,
            "state_rows_series": series,
        }
        r = results[name]
        print(
            f"{name:24s} {len(batches):3d} batches  {wall:7.1f}s  "
            f"state max={r['state_rows_max']:>9,d} mid={mid:>9,d} "
            f"final={fin:>9,d}  growth(mid->final)=x{growth}  "
            f"removed={r['removed_total']:,d}  "
            f"{'BOUNDED' if r['bounded'] else 'GROWING'}",
            flush=True,
        )

    print()
    print("| job | batches | state max | state mid | state final | mid->final | verdict |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['micro_batches']} | {r['state_rows_max']:,} "
            f"| {r['state_rows_mid']:,} | {r['state_rows_final']:,} "
            f"| x{r['mid_to_final_growth']} "
            f"| {'bounded' if r['bounded'] else 'GROWING'} |"
        )
    if out_file:
        json.dump(results, open(out_file, "w"), indent=1, sort_keys=True)
        print(f"\nwrote {out_file}")
    spark.stop()


if __name__ == "__main__":
    main()
