#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": <sf>}

Each query executes to completion through the noop sink (full plan runs,
nothing collected to the driver). One warmup action initializes the JVM/
codegen so measured times reflect steady-state execution.

``--sf1`` benches the 10× soak set instead (built on first use at
/tmp/sf1 via tools/make_sf1.py — see SCALE.md 'sf1 soak').

Noise control (r2 verdict item 4): each query runs N_RUNS=5 times and
reports the per-query MEDIAN (plus stdev in the same JSON line), so a
reported drift is a real plan change, not VM jitter. ``bench_budgets.json``
pins the r-baseline per-query medians; any query whose median exceeds
1.5× its budget is listed under ``budget_violations`` in the output (and
``--enforce`` turns violations into a nonzero exit for CI use).

Host-speed calibration (r4, symmetric since r5): the shared host
throttles invisibly (±35% same-day drift at guest load ~0), so a fixed
data-independent workload is timed before AND after the suite
(``calib_sec`` = pooled median) and every query median is divided by
``calib_sec / _calib_ref`` (the calibration recorded at pin time, stored
in bench_budgets.json) before comparing against its budget. The
normalization is SYMMETRIC — a fast host tightens budgets exactly as a
slow host loosens them — and bounded: a ratio > 2 triggers a calibration
re-run, then caps at 2 with ``calib_suspect`` set, and raw
(uncalibrated) violations are always recorded alongside.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

import pandas as pd  # module-level: pandas_udf type-hint resolution

N_RUNS = 5  #: runs per query; median reported (odd → true middle sample)
BUDGET_FILE = "bench_budgets.json"
BUDGET_FACTOR = 1.5  #: flag a query when median > factor × budget

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: Queries whose hot path is the Python worker (mapInPandas /
#: pandas_udf): budget-scaled by the Arrow calibration probe, not the
#: JVM-codegen one (r5 verdict item 3 — the JVM probe under-tracks
#: Python-worker/Arrow host drift).
ARROW_QUERIES = {
    "x4_map_in_pandas_scoring",
    "e5d_frame_sample",
    "f7b_char_tokenize",
    # etl_prepare_features was listed here from r5, a leftover of its
    # original pandas-UDF tokenizer; the current prepare_text_features is
    # pure JVM higher-order exprs (0 ArrowEvalPython/MapInPandas nodes in
    # the executed plan — verified r11), so its budget must scale with the
    # JVM probe. The misclassification was the whole r9→r10 "drift": raw
    # 0.500→0.676 s (×1.35) tracked the r10 JVM calib ratio (1.21–1.50)
    # while the clean Arrow ratio (1.006) left the budget unscaled.
}

#: Queries that execute work EAGERLY at call time (driver-loop iteration
#: with per-round localCheckpoint, eager sketch-table materialization):
#: for these the timer must start BEFORE the query call or the measured
#: cost is only the final checkpoint scan (the flaw found in the r8
#: eager-seat curve audit — SCALE.md "Eager-seat curve correction";
#: e9c's pre-correction pin of 0.109 s was really a ~10x larger
#: algorithm). Budgets for these were re-pinned under the corrected
#: timing (bench_budgets.json `_repin_r8`).
EAGER_QUERIES = {
    "e9c_verified_clusters",
    "e9d_verified_clusters_capped",  # r11: capped tier, same eager CC loop
    "e35_hyperplane_semdedup",
    "e35b_hyperplane_semdedup_production",
    "e35d_semdedup_auto",  # r10: sampled saturation probe runs at call time
    "e7d_dedup_funnel",  # r9: fused gram frame is an eager localCheckpoint
    # r12 optimization round: scored frame materialized so the per-doc
    # ordered fold runs once instead of once per branch — the seat's
    # algorithm now executes at call time, so the timer must start
    # before the call (same rule as the seats above; the old lazy
    # timing would cover only the final boundary-join stage).
    "e19_unigram_logprob",
}

#: Headline suite: one representative per operator family (SURVEY.md §2,
#: incl. the E6–E8 LLM-pipeline family added in round 2).
HEADLINE = [
    "a4_pricing_summary",         # scan + grouped decimal aggregates
    "q3_shipping_priority",       # 3-way join + group + top-k
    "flagship_two_level_metrics", # metric rollup (joins of small aggs)
    "a7_ensemble_argmax",         # explode + wide groupBy + window
    "a9_ema_ordered_fold",        # collect_list ordered fold per key
    "w3_running_total",           # partitioned running window
    "o6_ntile_kfold",             # stratified ntile
    "e1_exact_dedup",             # md5 dedup accounting
    "e2b_minhash_lsh_pairs",      # full MinHash-LSH pipeline (oracle-tier hash)
    "e2g_minhash_lsh_production", # same pipeline, JVM xxhash64 tier
    "e2c_simhash",                # simhash fingerprints
    "e3_cosine_topk",             # brute-force ANN baseline
    "e3b_lsh_bucket_ann",         # bucketed ANN
    "e4b_token_freq_topk",        # explode + count + top-k
    "e4d_quality_score",          # narrow text-feature pass
    "f8_budget_cascade",          # budgeted truncation cascade
    "e6_sequence_packing",        # shard-local token-budget packing
    "e7_curation_pipeline",       # composed quality→dedup→pack funnel
    "e8_document_chunking",       # overlapping context windows (no shuffle)
    "x4_map_in_pandas_scoring",   # Arrow-batched model inference
    "s9_tumbling_window",         # tumbling window agg
    "s9c_session_windows",        # session windows
    "q5_local_supplier_volume",   # 6-way star join
    "q17_small_quantity_revenue", # decorrelated aggregate filter
    "t1_asof_join",               # as-of join (union-and-window)
    "t3_time_rollup",             # grouping-sets time rollup
    "m1_upsert_merge",            # CDC merge
    # round-3 additions
    "e31_dsir_importance",        # DSIR importance weights (target vs raw LM)
    "e32_paragraph_dedup",        # segment-level dedup + doc reassembly
    "e33_ngram_novelty",          # per-doc trigram novelty / contamination
    "e5d_frame_sample",           # binary frame sampling via mapInPandas
    "f20_robust_scale",           # exact disc-quantile robust scaling
    # round-4 additions (CJK / no-whitespace mode)
    "f7b_char_tokenize",          # char-mode broadcast-vocab tokenizer
    "e2j_char_shingle_lsh_pairs", # char-shingle MinHash-LSH (CJK near-dup)
    "e4g_char_ngram_stats",       # char-trigram freq/df top-k
    # round-5 additions
    "e2k_salted_lsh_pairs",       # grid-salted LSH pair join (skew tier)
    "e2m_char_lsh_production",    # production-hash CJK LSH (real CJK dedup cost)
    "e35_hyperplane_semdedup",    # centroid-free embedding near-dup
    # round-7 additions (oracle-upgraded seats now perf-gated too)
    "e27_bpe_apply",              # pinned-merge-table BPE encode
    "f13_mlm_corruption",         # salted-hash MLM 80/10/10 corruption
    # round-8 addition: the numpy signature tier next to its oracle twin
    "e35b_hyperplane_semdedup_production",
    "e9c_verified_clusters",      # >=2-band verified connected components
    # round-8 additions (broadcast-sweep + shared-partitioning seats)
    "q16_supplier_part_counts",   # swept seat: AQE-governed part/supplier joins
    "e19_unigram_logprob",        # shared-partitioning vocab join (no broadcast)
    # round-8 continuation: exact-substring span trim (Lee et al. pass)
    "e36_substring_span_trim",    # one-exchange k-gram occurrence window
    # round-9 addition: the fused dedup-family funnel (capstone seat)
    "e7d_dedup_funnel",           # one gram pass feeds containment + span gates
    # round-10 addition: the semantic-dedup auto tier (probe + chosen tier)
    "e35d_semdedup_auto",         # sampled saturation probe -> e35b/e35c
    # round-11 addition: the capped cluster tier (the e9c scale fix)
    "e9d_verified_clusters_capped",
]


def _ensure_sf1() -> str:
    """Build the 10× replicated soak set at /tmp/sf1 if absent (SCALE.md
    'sf1 soak'); idempotent — reuses an existing build."""
    dst = Path("/tmp/sf1")
    if not (dst / "lineitem.parquet").exists():
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "make_sf1", Path(REPO_ROOT) / "tools" / "make_sf1.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.replicate(Path("/root/testdata/sf0.1"), dst, 10)
    return str(dst)


def main() -> None:
    if "--sf1" in sys.argv[1:]:
        # local-mode executors share the driver JVM; the 10× soak needs a
        # real heap (default ~1g OOMs in the first text-heavy query), and
        # spark.driver.memory must be set before the gateway JVM launches.
        # BENCH_DRIVER_MEM overrides the size for smaller hosts; an
        # existing PYSPARK_SUBMIT_ARGS is prepended to, not discarded.
        mem = os.environ.get("BENCH_DRIVER_MEM", "24g")
        existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
        if "--driver-memory" not in existing:
            os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} {existing}"
        sf_dir = _ensure_sf1()
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    spark = get_spark(
        app_name="wx20222-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warmup: initialize codegen/arrow paths outside the measurement
    queries["j2_broadcast_dim_join"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Machine-speed calibration: a fixed, data-independent workload
    # (codegen hash + one small shuffle across all cores) whose median
    # measures THIS run's effective machine speed. The shared host this
    # bench runs on throttles invisibly (guest load ~0 while wall times
    # drift ±35% across same-day runs — measured in round 4), so raw
    # per-query budgets misfire in slow windows. The budget gate scales
    # budgets by calib_sec/_calib_ref (the calibration median recorded
    # when budgets were pinned), floored at 1.0 so a fast window never
    # loosens the gate the other way.
    def _calibrate(n: int = 3) -> list[float]:
        out = []
        for _ in range(n):
            t0 = time.perf_counter()
            (
                spark.range(0, 40_000_000)
                .selectExpr(
                    "xxhash64(id) % 1000 AS h", "xxhash64(id * 7) % 64 AS b"
                )
                .groupBy("b")
                .agg({"h": "sum"})
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            out.append(time.perf_counter() - t0)
        return out

    # Second probe (r5 verdict item 3): the JVM-codegen probe above does
    # not track the Python-worker path — fork/reuse of the pyspark daemon,
    # Arrow serialization, pandas kernel dispatch — which is exactly what
    # the Arrow-shaped queries (mapInPandas/pandas_udf) spend their time
    # in. Measured while bisecting the r4→r5 s9/x4/e7 "regressions":
    # identical code from both rounds, run side-by-side in one host
    # window, timed the same — the recorded deltas were host drift that
    # calib_ratio (1.189 vs 1.211) did not reflect. Arrow-shaped queries
    # are therefore budget-scaled by THIS probe's ratio instead.
    def _calibrate_arrow(n: int = 3) -> list[float]:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _probe(x: pd.Series) -> pd.Series:
            return x * 1.0000001 + x.map(lambda v: v % 97)

        out = []
        for _ in range(n):
            t0 = time.perf_counter()
            (
                spark.range(0, 2_000_000)
                .select(_probe(F.col("id").cast("double")).alias("p"))
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            out.append(time.perf_counter() - t0)
        return out

    from pyspark.sql import functions as F

    calib_samples = _calibrate()
    calib_arrow_samples = _calibrate_arrow()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        # steady-state: median of N_RUNS; the plan is rebuilt per run so
        # Spark cannot reuse shuffle files across runs (skipped stages
        # would understate real execution cost).
        samples = []
        for _ in range(N_RUNS):
            if name in EAGER_QUERIES:
                # call-time-eager seat: the algorithm runs inside the
                # query call — time call + write together
                t0 = time.perf_counter()
                df = queries[name](spark, sf_dir)
            else:
                df = queries[name](spark, sf_dir)
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spreads[name] = round(statistics.stdev(samples), 3)

    # ETL throughput: the reference's §3.1-step-2 pipeline (flatten →
    # budget cascade → tokenize → pad/mask) over annotation-shaped rows
    # synthesized from documents (BASELINE.md 'ETL throughput' row).
    from pyspark.sql import functions as F

    from wx20222_bigdata_spark.catalog import load_table, rebalance_small_scan
    from wx20222_bigdata_spark.operators.etl import prepare_text_features

    # CPU-heavy narrow pipeline: rebalance a row-group-starved scan first
    # (catalog.rebalance_small_scan — no-op when the input is big or
    # already scan-parallel; measured 1.53s -> 1.02s at sf0.1).
    docs = rebalance_small_scan(
        load_table(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    )
    anns = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 10)).alias("title"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 11, 20)).alias("asr"),
        F.array(
            F.struct(
                F.concat_ws(" ", F.expr("slice(split(text, ' '), 31, 1000)")).alias(
                    "text"
                )
            )
        ).alias("ocr"),
    )
    samples = []
    for _ in range(N_RUNS):  # same median-of-N policy as the suite
        t0 = time.perf_counter()
        prepare_text_features(anns, budget=256).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(time.perf_counter() - t0)
    timings["etl_prepare_features"] = round(statistics.median(samples), 3)
    spreads["etl_prepare_features"] = round(statistics.stdev(samples), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # Post-suite calibration sample: a throttle window that starts mid-run
    # slows the queries but not a pre-suite-only calibration; pooling
    # before+after samples keeps calib_sec representative of the window
    # the queries actually ran in.
    calib_samples += _calibrate()
    calib_sec = round(statistics.median(calib_samples), 3)
    calib_arrow_samples += _calibrate_arrow()
    calib_arrow_sec = round(statistics.median(calib_arrow_samples), 3)

    # Budget gate (fully calibrated units, r4 verdict item 5): each
    # query's median is divided by calib_ratio = calib_sec/_calib_ref —
    # SYMMETRIC, so a fast host tightens exactly as a slow host loosens
    # and a regression cannot hide behind host drift in either direction.
    # A calibrated median > BUDGET_FACTOR × its pinned budget is a real
    # regression. Sanity bound (r4 advice): a calib_ratio > 2 means the
    # calibration itself is suspect (shared infra regression would slow
    # calibration AND queries alike, silently loosening every budget) —
    # calibration is re-run once; if still >2 the ratio is capped at 2,
    # the run is marked calib_suspect, and UNCALIBRATED violations are
    # always recorded alongside so the raw comparison stays auditable.
    violations: dict[str, dict[str, float]] = {}
    raw_violations: dict[str, dict[str, float]] = {}
    calib_ratio = 1.0
    calib_arrow_ratio = 1.0
    calib_suspect = False
    timings_calibrated: dict[str, float] = {}
    budget_path = Path(REPO_ROOT) / BUDGET_FILE
    if budget_path.exists() and os.path.basename(sf_dir) == "sf0.1":
        budgets = json.loads(budget_path.read_text())
        calib_ref = budgets.get("_calib_ref")
        if calib_ref:
            calib_ratio = round(calib_sec / calib_ref, 3)
            if calib_ratio > 2.0:
                print(
                    f"CALIB SUSPECT: ratio {calib_ratio} > 2, re-running "
                    "calibration",
                    file=sys.stderr,
                )
                calib_samples += _calibrate()
                calib_sec = round(statistics.median(calib_samples), 3)
                calib_ratio = round(calib_sec / calib_ref, 3)
                if calib_ratio > 2.0:
                    calib_suspect = True
                    calib_ratio = 2.0
        calib_arrow_ref = budgets.get("_calib_arrow_ref")
        if calib_arrow_ref:
            calib_arrow_ratio = round(calib_arrow_sec / calib_arrow_ref, 3)
            if calib_arrow_ratio > 2.0:
                calib_arrow_samples += _calibrate_arrow()
                calib_arrow_sec = round(statistics.median(calib_arrow_samples), 3)
                calib_arrow_ratio = min(
                    round(calib_arrow_sec / calib_arrow_ref, 3), 2.0
                )
        for name, med in timings.items():
            ratio = calib_arrow_ratio if name in ARROW_QUERIES else calib_ratio
            cal = round(med / ratio, 3)
            timings_calibrated[name] = cal
            b = budgets.get(name)
            if b is None:
                continue
            if cal > BUDGET_FACTOR * b:
                violations[name] = {
                    "median": med,
                    "calibrated": cal,
                    "budget": b,
                    "calib_ratio": ratio,
                }
                print(
                    f"BUDGET VIOLATION {name}: calibrated median {cal}s "
                    f"(raw {med}s / calib {calib_ratio}) > "
                    f"{BUDGET_FACTOR}x budget {b}s",
                    file=sys.stderr,
                )
            if med > BUDGET_FACTOR * b:
                raw_violations[name] = {"median": med, "budget": b}

    # Two-tier output (r3 verdict item 1): the driver keeps only the LAST
    # ~2000 chars of stdout, and r3's single fat line (medians + stdevs +
    # budget detail) got truncated past parseability — the round recorded
    # no headline number. The FINAL line is now compact (headline value +
    # per-query medians only, separators tightened); stdevs/stat/budget
    # detail go to BENCH_DETAIL.json on disk and an earlier stdout line.
    detail = {
        "metric": "headline_suite_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_calibrated": timings_calibrated,
        "stdev": spreads,
        "stat": f"median_of_{N_RUNS}",
        "budget_violations": violations,
        "uncalibrated_violations": raw_violations,
        "calib_sec": calib_sec,
        "calib_ratio": calib_ratio,
        "calib_arrow_sec": calib_arrow_sec,
        "calib_arrow_ratio": calib_arrow_ratio,
        "calib_suspect": calib_suspect,
        "sf": sf_val,
    }
    detail_name = "BENCH_DETAIL.json" if sf_val == 0.1 else f"BENCH_DETAIL_sf{sf}.json"
    (Path(REPO_ROOT) / detail_name).write_text(json.dumps(detail, indent=1) + "\n")
    print("DETAIL " + json.dumps(detail, separators=(",", ":")))
    result = {
        "metric": "headline_suite_wall_clock",
        "value": detail["value"],
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "calib_sec": calib_sec,
        "budget_violations": sorted(violations),
    }
    line = json.dumps(result, separators=(",", ":"))
    if len(line) >= 1800:  # never let the headline line outgrow the tail
        result["queries"] = {"see": detail_name}
        line = json.dumps(result, separators=(",", ":"))
    print(line)
    spark.stop()
    if violations and "--enforce" in sys.argv[1:]:
        sys.exit(1)


if __name__ == "__main__":
    main()
