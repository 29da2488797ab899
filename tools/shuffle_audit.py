#!/usr/bin/env python
"""Shuffle-byte audit: measured exchange volume per headline query.

Plan tests (tests/test_plans.py) pin the *structure* of each plan —
broadcast vs shuffle join, no cartesian, no single-partition window.
This tool pins the *volume*: for each seat it runs the query to a noop
sink and reads the stage-level metrics from Spark's status REST API
(inputBytes, shuffleWriteBytes, shuffleReadBytes, task count), i.e. the
bytes that would actually cross the network on a real cluster.

The 100 TB reading of the numbers:
- shuffle_write << input  -> map-side combine / pre-aggregation works;
  the exchange ships summaries, not rows (a4, e1, e4*, w*, q*).
- shuffle_write ~ k x input (k small) -> the operator genuinely
  re-keys the corpus (LSH band keys, packing bins). The design bound is
  that k is a CONSTANT (bands, planes) -- never a function of N.
- shuffle_write >> input and growing with N^2 would be an all-pairs
  leak; the LSH/ANN family exists precisely to keep this impossible.

Usage: python tools/shuffle_audit.py [--sf DIR] [--out FILE] [--seats a,b,...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: Headline seats spanning every exchange shape in the engine: scan+agg,
#: shuffled join, broadcast join, window, LSH re-key, ANN bucket join,
#: Python-worker path, packing, streaming twin, funnel.
SEATS = [
    "a4_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "q9_product_profit",
    "e5d_frame_sample",
    "e1_exact_dedup",
    "e2b_minhash_lsh_pairs",
    "e2g_minhash_lsh_production",
    "e2k_salted_lsh_pairs",
    "e2m_char_lsh_production",
    "e35_hyperplane_semdedup",
    "e4g_char_ngram_stats",
    "e3_cosine_topk",
    "e3b_lsh_bucket_ann",
    "e6_sequence_packing",
    "e7_curation_pipeline",
    "x4_map_in_pandas_scoring",
    "f7c_wordpiece",
    "o7_seeded_shuffle",
    "s9_tumbling_window",
    "w6_top_n_per_group",
]


def _api(url: str):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def _stage_rows(base: str) -> list[dict]:
    # 'complete' only: skipped stages reused an exchange and moved no
    # new bytes; failed/active should not exist after a synchronous sink.
    return _api(f"{base}/stages?status=complete&details=false")


def _stage_rows_settled(base: str) -> list[dict]:
    # The AppStatusStore is fed by an async event queue, so a read taken
    # immediately after a synchronous sink can miss late-flushing stage
    # updates. Poll until two consecutive reads agree on the completed
    # stage set and its byte totals (bounded at ~5 s).
    def _key(rows: list[dict]):
        return sorted(
            (
                st["stageId"],
                st.get("numCompleteTasks", 0),
                st.get("inputBytes", 0),
                st.get("shuffleWriteBytes", 0),
                st.get("shuffleReadBytes", 0),
            )
            for st in rows
        )

    rows = _stage_rows(base)
    for _ in range(25):
        time.sleep(0.2)
        nxt = _stage_rows(base)
        if _key(nxt) == _key(rows):
            return nxt
        rows = nxt
    return rows


def _metrics_since(base: str, watermark: int) -> dict:
    total = {
        "input_bytes": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "tasks": 0,
        "stages": 0,
    }
    for st in _stage_rows_settled(base):
        if st["stageId"] <= watermark:
            continue
        total["input_bytes"] += st.get("inputBytes", 0)
        total["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
        total["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
        total["tasks"] += st.get("numCompleteTasks", 0)
        total["stages"] += 1
    return total


def _fmt(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n}"


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_file = None
    seats = SEATS
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--out" in argv:
        out_file = argv[argv.index("--out") + 1]
    if "--seats" in argv:
        seats = argv[argv.index("--seats") + 1].split(",")

    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="shuffle_audit",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI disabled; shuffle audit needs the status API")
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    queries = all_queries()
    results: dict[str, dict] = {}
    for name in seats:
        # watermark BEFORE building the DataFrame: some queries run eager
        # actions at build time (o7's range-partition offset pass, e35's
        # signature materialization) — that work belongs to the query.
        stages_before = _stage_rows_settled(base)
        watermark = max((s["stageId"] for s in stages_before), default=-1)
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        m = _metrics_since(base, watermark)
        m["wall_sec"] = round(wall, 3)
        m["shuffle_over_input"] = round(
            m["shuffle_write_bytes"] / max(m["input_bytes"], 1), 4
        )
        results[name] = m
        print(
            f"{name:32s} in={_fmt(m['input_bytes']):>10s} "
            f"shW={_fmt(m['shuffle_write_bytes']):>10s} "
            f"shR={_fmt(m['shuffle_read_bytes']):>10s} "
            f"ratio={m['shuffle_over_input']:>8.4f} "
            f"stages={m['stages']:>3d} tasks={m['tasks']:>5d} {wall:6.2f}s",
            flush=True,
        )

    print()
    print("| seat | input | shuffle write | shuffle/input | stages | tasks |")
    print("|---|---|---|---|---|---|")
    for name, m in results.items():
        print(
            f"| {name} | {_fmt(m['input_bytes'])} | "
            f"{_fmt(m['shuffle_write_bytes'])} | {m['shuffle_over_input']} "
            f"| {m['stages']} | {m['tasks']} |"
        )
    if out_file:
        json.dump(results, open(out_file, "w"), indent=1, sort_keys=True)
        print(f"\nwrote {out_file}")
    spark.stop()


if __name__ == "__main__":
    main()
