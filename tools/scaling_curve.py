#!/usr/bin/env python
"""Scaling-curve harness: run the scale-critical seats at sf0.1 / sf1 /
sf10 and report the wall-clock slope per 10x data step.

The per-round bench (bench.py) answers "is each query inside its pinned
budget at sf0.1"; this tool answers the 100 TB question directly — when
the data grows 10x, does the plan grow ~10x (linear scan/shuffle work),
~1x (broadcast/bounded), or worse (a hidden quadratic or a
single-partition choke)? Seats and expectations:

- scan+agg (a4, s9) and hash joins (q3, q5): ~linear, partial agg
  before every exchange.
- dedup/LSH family (e1, e2b, e2g, e2k, e2m, e35, e4g, e33, e31): the
  shuffled candidate volume is the design quantity — banded keys keep
  it linear in corpus size, never quadratic all-pairs.
- ANN (e3 brute force vs e3b LSH buckets): e3 is intentionally linear
  per query over the corpus (the per-bucket inner loop at scale); e3b
  must stay sublinear in compared pairs (bucket-bounded).
- Python-worker path (x4, f7c): Arrow batch throughput, ~linear.

Slopes are medians of N_RUNS noop-sink runs; sub-second timings at
sf0.1 are scheduler-noise-bound, so judge the sf1 -> sf10 step first.

Usage: python tools/scaling_curve.py [--runs N] [--out FILE]
Builds /tmp/sf1 and /tmp/sf10 via tools/make_sf1.py if absent.
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

SEATS = [
    "a4_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "s9_tumbling_window",
    "e1_exact_dedup",
    "e2b_minhash_lsh_pairs",
    "e2g_minhash_lsh_production",
    "e2k_salted_lsh_pairs",
    "e2m_char_lsh_production",
    "e35_hyperplane_semdedup",
    "e4g_char_ngram_stats",
    "e33_ngram_novelty",
    "e31_dsir_importance",
    "e3_cosine_topk",
    "e3b_lsh_bucket_ann",
    "x4_map_in_pandas_scoring",
    "f7c_wordpiece",
    "e7_curation_pipeline",
    # r7 additions (r6 verdict items 5+6): the iterative/graph seats —
    # where lineage blowup and per-iteration plan growth bite at scale —
    # and the join-heaviest TPC-H shapes missing from the curve; e5d for
    # the vectorized Arrow-kernel shape.
    "i1_power_iteration",
    "i2_pagerank_2iter",
    "i3_label_propagation",
    "i4_bfs_levels",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_sole_supplier_orders",
    "e5d_frame_sample",
]

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
    runs = 3
    out_file = None
    seats = SEATS
    tiers = TIERS
    argv = sys.argv[1:]
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])
    if "--out" in argv:
        out_file = argv[argv.index("--out") + 1]
    if "--seats" in argv:
        seats = argv[argv.index("--seats") + 1].split(",")
    if "--tiers" in argv:
        wanted = set(argv[argv.index("--tiers") + 1].split(","))
        tiers = [(t, d) for t, d in TIERS if t in wanted]

    existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
    if "--driver-memory" not in existing:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory 48g {existing}"

    _ensure("/tmp/sf1", 10, "/root/testdata/sf0.1")
    _ensure("/tmp/sf10", 10, "/tmp/sf1")

    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="scaling_curve",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    from tools.calib import calib_stamp

    results: dict[str, dict] = {n: {} for n in seats}
    for tier, sf_dir in tiers:
        tier_stamp = calib_stamp(spark)
        print(f"{tier}: calib {tier_stamp['sec']}s ratio {tier_stamp['ratio']}")
        results.setdefault("_calib", {})[tier] = tier_stamp
        for name in seats:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            med = round(statistics.median(samples), 3)
            results[name][tier] = med
            print(f"{tier:6s} {name:32s} {med:8.3f}s", flush=True)

    print()
    hdr = f"| {'seat':32s} | sf0.1 | sf1 | sf10 | x(0.1->1) | x(1->10) |"
    print(hdr)
    print("|" + "-" * 34 + "|---|---|---|---|---|")
    for name in seats:
        r = results[name]
        s01, s1, s10 = r.get("sf0.1"), r.get("sf1"), r.get("sf10")

        def _cell(v: float | None) -> str:
            return "n/a" if v is None else f"{v:.3f}"

        def _ratio(lo: float | None, hi: float | None) -> str:
            # A tier not run (--tiers filter) must read as "not measured",
            # not as a 0.000 timing and an s/1e-9 growth ratio.
            if lo is None or hi is None:
                return "n/a"
            return f"x{hi / max(lo, 1e-9):.1f}"

        print(
            f"| {name:32s} | {_cell(s01)} | {_cell(s1)} | {_cell(s10)} "
            f"| {_ratio(s01, s1)} | {_ratio(s1, s10)} |"
        )
    if out_file:
        json.dump(results, open(out_file, "w"), indent=1, sort_keys=True)
        print(f"\nwrote {out_file}")


if __name__ == "__main__":
    main()
