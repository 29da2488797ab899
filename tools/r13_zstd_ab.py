#!/usr/bin/env python
"""r13 VERDICT item 7: shuffle codec lz4 vs zstd, measured at REAL volume
(sf10, where e9d/e7d exchanges are GiB-scale) instead of sf0.1's ~20 MiB.

``spark.io.compression.codec`` is a core conf frozen at JVM launch, so the
A/B alternates JVMs: invoke this script once per (codec, round); a wrapper
loop A,B,A,B gives pairwise rounds that cancel host drift. Each invocation
runs the seats once cold + once warm to a noop sink, records walls, the
calib stamp, and the app's total shuffle read/write bytes from the REST
status API, and appends a JSON line to --log.

Usage: python tools/r13_zstd_ab.py --codec lz4|zstd [--sf-dir /tmp/sf10]
       [--seats e9d_verified_clusters_capped,e7d_dedup_funnel]
       [--log /tmp/zstd_ab.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
if "--driver-memory" not in _existing:
    os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory 48g {_existing}"


def main() -> None:
    argv = sys.argv[1:]
    codec = argv[argv.index("--codec") + 1]
    sf_dir = "/tmp/sf10"
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]
    seats = ["e9d_verified_clusters_capped", "e7d_dedup_funnel"]
    if "--seats" in argv:
        seats = argv[argv.index("--seats") + 1].split(",")
    log = "/tmp/zstd_ab.jsonl"
    if "--log" in argv:
        log = argv[argv.index("--log") + 1]

    from tools.calib import calib_stamp
    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    spark = get_spark(
        app_name=f"r13-zstd-ab-{codec}",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.io.compression.codec": codec,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    q["j2_broadcast_dim_join"](spark, "/root/testdata/sf0.1").write.format(
        "noop"
    ).mode("overwrite").save()
    stamp_pre = calib_stamp(spark)

    def shuffle_totals() -> dict:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        return {
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        }

    row = {"codec": codec, "sf_dir": sf_dir, "calib_pre": stamp_pre, "seats": {}}
    base = shuffle_totals()
    for name in seats:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 1))
        after = shuffle_totals()
        row["seats"][name] = {
            "walls": walls,
            "shuffle_write_gib": round(
                (after["shuffle_write_bytes"] - base["shuffle_write_bytes"]) / 2**30, 3
            ),
            "shuffle_read_gib": round(
                (after["shuffle_read_bytes"] - base["shuffle_read_bytes"]) / 2**30, 3
            ),
        }
        base = after
        print(name, row["seats"][name], file=sys.stderr)
    row["calib_post"] = calib_stamp(spark)
    with open(log, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
