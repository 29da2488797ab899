#!/usr/bin/env python
"""Structured Streaming throughput measurement.

tests/test_streaming.py pins stream==batch-twin CORRECTNESS; this tool
measures stream THROUGHPUT at sf1 volume (1M events) — the number that
says whether the streaming operators would keep up with a real queue.

Method: materialize the sf1 events table (via catalog.load_table, which
handles the TIMESTAMP(NANOS) fixture quirk) into an N-file parquet dir,
then drive each streaming job over it with trigger(availableNow) into a
noop sink and report end-to-end rows/s. ``--files`` controls micro-batch
granularity (with maxFilesPerTrigger=1 each file is one micro-batch, so
N = number of micro-batches — per-batch overhead is the measured cost at
small N... large N approximates a long-running stream's steady state).

Jobs measured:
- tumbling_counts: shuffle + watermark state (JVM aggregation state)
- windowed_dedup: dropDuplicates state (per-key eviction)
- stateful_running_totals: applyInPandasWithState (Python state path)

Usage: python tools/stream_throughput.py [--sf DIR] [--files N] [--out FILE]
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

WORK = "/tmp/spark_graft_stream_bench"


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/tmp/sf1"
    n_files = 20
    out_file = None
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--files" in argv:
        n_files = int(argv[argv.index("--files") + 1])
    if "--out" in argv:
        out_file = argv[argv.index("--out") + 1]

    from wx20222_bigdata_spark.catalog import load_table
    from wx20222_bigdata_spark.session import get_spark
    from wx20222_bigdata_spark.streaming import jobs

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="stream_throughput",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # recentProgress is a ring buffer (default 100): with more
            # micro-batches than that, the progress-derived batch count
            # silently truncates. Size the buffer to the run.
            "spark.sql.streaming.numRecentProgressUpdates": str(
                max(2 * n_files + 10, 200)
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = f"{WORK}/events_in"
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F_ts("ts"),
        "user_id",
        "event_type",
        "value",
    )
    n_rows = events.count()
    events.repartition(n_files).write.mode("overwrite").parquet(src)

    cases = {
        # JVM aggregation state behind a shuffle
        "tumbling_counts": (lambda s: jobs.tumbling_counts(s), "update"),
        # per-key dedup state with watermark eviction
        "windowed_dedup": (lambda s: jobs.windowed_dedup(s), "append"),
        # Python state path (applyInPandasWithState)
        "stateful_running_totals_classic": (
            lambda s: jobs.stateful_running_totals_classic(s),
            "update",
        ),
        # r9: session state keyed (user, time-salt) — the hot-key-safe tier
        "salted_sub_sessions": (
            lambda s: jobs.salted_sub_sessions(s),
            "append",
        ),
    }
    results: dict[str, dict] = {}
    for name, (make, mode) in cases.items():
        for variant, max_files in (("bulk", None), ("per_file", 1)):
            ckpt = f"{WORK}/ckpt_{name}_{variant}"
            shutil.rmtree(ckpt, ignore_errors=True)
            reader = spark.readStream.schema(
                jobs.EVENTS_STREAM_SCHEMA
            )
            if max_files is not None:
                reader = reader.option("maxFilesPerTrigger", max_files)
            out = make(reader.parquet(src))
            t0 = time.perf_counter()
            q = (
                out.writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            # micro-batch count from query progress, counting only batches
            # that moved rows — the offsets-dir glob also counts
            # availableNow's trailing no-data commit batch on some Spark
            # versions, inflating the recorded number.
            n_batches = sum(
                1
                for p in (q.recentProgress or [])
                if (p.get("numInputRows") or 0) > 0
            )
            if n_batches == 0:
                # recentProgress is ring-buffered; fall back to the offset
                # log if the buffer was evicted (very large --files runs).
                n_batches = len(list(Path(ckpt, "offsets").glob("[0-9]*")))
            key = f"{name}.{variant}"
            results[key] = {
                "rows": n_rows,
                "wall_sec": round(wall, 2),
                "rows_per_sec": int(n_rows / wall),
                "micro_batches": n_batches,
            }
            print(
                f"{key:42s} {n_rows} rows  {wall:6.2f}s  "
                f"{results[key]['rows_per_sec']:>9,d} rows/s  "
                f"{n_batches} micro-batches",
                flush=True,
            )
    if out_file:
        json.dump(results, open(out_file, "w"), indent=1, sort_keys=True)
        print(f"wrote {out_file}")
    spark.stop()


def F_ts(col: str):
    """ts column normalized to TimestampType for the stream schema."""
    from pyspark.sql import functions as F

    return F.col(col).cast("timestamp").alias("ts")


if __name__ == "__main__":
    main()
