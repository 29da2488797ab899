#!/usr/bin/env python
"""Exactly-once curation-funnel audit at the 25M-rows-per-batch step
(r11 verdict item 7: the state-store audit covered sessions/dedup at
25M rows/batch; this runs the streaming curation funnel —
streaming/jobs.streaming_curation_funnel, the three-commit-point
exactly-once pipeline — at the same step and checks its idempotent-sink
commit path there).

Corpus: N rows in 4 sequential files (one micro-batch each via
maxFilesPerTrigger=1), text a deterministic function of
``content_id = id % n_distinct`` so duplication is BY CONSTRUCTION:
with N=100M and n_distinct=20M, batch 0 admits 20M first-occurrences
and re-sees 5M in-batch dups, batches 2-3 are 100% cross-batch dups —
the index anti-join runs 25M rows against a ~16M-key persistent index.
Every 5th content fails the punct-ratio quality gate (a 25-period run
pushes punct/char to ~0.15), so the gate's drop accounting is exercised
too. ``source`` is a function of the content (content_id % 8), so the
min-doc-id twin and first-arrival admission agree per source exactly
(the test_streaming precondition, made true by construction).

Checks:
 1. final accounting state == the declarative twin computed from the
    distinct (content_key, source, n_tok) set — exact, per source;
 2. admitted row count == distinct quality contents; index matches;
 3. fully-committed replay of the last batch is a marker short-circuit
    (state mtime-identical, no new writes);
 4. markerless replay of the last batch (crash window: all three
    commits landed, marker lost) leaves state and admitted set
    unchanged — the guarded index read + state lineage guard at the
    full 25M/16M-key scale.

Usage: python tools/funnel_audit.py [--rows N] [--files K]
Writes the result row + note into STATE_STORE_AUDIT.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

_existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
if "--driver-memory" not in _existing:
    os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory 48g {_existing}"

WORK = "/tmp/funnel_audit"


def main() -> None:
    argv = sys.argv[1:]
    n_rows = 100_000_000
    n_files = 4
    if "--rows" in argv:
        n_rows = int(argv[argv.index("--rows") + 1])
    if "--files" in argv:
        n_files = int(argv[argv.index("--files") + 1])
    n_distinct = n_rows // 5

    from pyspark.sql import functions as F

    from wx20222_bigdata_spark.session import get_spark
    from wx20222_bigdata_spark.streaming.jobs import (
        make_curation_funnel_batch,
        streaming_curation_funnel,
    )
    from tools.calib import calib_stamp

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="funnel_audit",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(WORK, ignore_errors=True)
    src = f"{WORK}/docs_in"

    # deterministic text from content_id: one word carries the FULL
    # content id (texts distinct per content — a %-vocab-only derivation
    # collapses contents mod the vocab size and breaks the
    # source-is-a-function-of-content invariant; found by the smoke
    # run), 23 shared-vocab words for realistic token statistics, and
    # every 5th content a 25-period token (punct/char ~0.15 -> gate FAIL)
    content = F.col("id") % n_distinct
    words = [F.concat(F.lit("c"), content.cast("string"))] + [
        F.concat(F.lit(f"w{i}v"), ((content * (i + 7)) % 997).cast("string"))
        for i in range(23)
    ]
    text = F.concat_ws(" ", *words)
    text = F.when(content % 5 == 0, F.concat(text, F.lit(" " + "." * 25))).otherwise(
        text
    )
    chunk = n_rows // n_files
    n_rows = chunk * n_files
    t_gen = time.perf_counter()
    for i in range(n_files):
        (
            spark.range(i * chunk, (i + 1) * chunk)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("s"), (content % 8).cast("string")).alias("source"),
                text.alias("text"),
            )
            .coalesce(8)
            .write.mode("append")
            .parquet(src)
        )
    gen_sec = round(time.perf_counter() - t_gen, 1)
    print(f"generated {n_rows:,} docs ({n_distinct:,} distinct) in {gen_sec}s")

    index_dir = f"{WORK}/index"
    out_dir = f"{WORK}/admitted"
    state_dir = f"{WORK}/state"
    ckpt = f"{WORK}/ckpt"
    pre = calib_stamp(spark)

    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 8)  # 8 part-files per gen batch
        .parquet(src)
    )
    t0 = time.perf_counter()
    q = streaming_curation_funnel(stream, index_dir, out_dir, state_dir, ckpt).start()
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 1)
    prog = [
        (p.batchId, p.numInputRows, p.batchDuration)
        for p in q.recentProgress
        if p.numInputRows > 0
    ]
    post = calib_stamp(spark)
    durs = [d / 1000 for _, _, d in prog]
    print(f"stream done: {wall}s, batches {prog}")

    # --- twin: distinct (content_key, source, n_tok) of quality rows ---
    from wx20222_bigdata_spark.operators.curation import (
        quality_features,
        quality_gate,
    )

    docs = spark.read.parquet(src)
    feats = quality_features(docs)
    quality = quality_gate(feats)
    raw = feats.groupBy("source").agg(F.count("*").alias("n_raw"))
    qc = quality.groupBy("source").agg(F.count("*").alias("n_quality"))
    adm = (
        quality.select("content_key", "source", "n_tok")
        .distinct()
        .groupBy("source")
        .agg(
            F.count("*").alias("n_admitted"),
            F.sum("n_tok").cast("bigint").alias("admitted_tokens"),
        )
    )
    want = {
        r["source"]: (
            r["n_raw"],
            r["n_quality"],
            r["n_admitted"] or 0,
            r["admitted_tokens"] or 0,
        )
        for r in raw.join(qc, "source", "left").join(adm, "source", "left").collect()
    }
    got = {
        r["source"]: (
            r["n_raw"],
            r["n_quality"],
            r["n_admitted"],
            r["admitted_tokens"],
        )
        for r in spark.read.parquet(f"{state_dir}/current").collect()
    }
    assert got == want, {
        k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)
    }
    n_admitted_total = sum(v[2] for v in want.values())
    admitted_count = spark.read.parquet(f"{out_dir}/batch_id=*").count()
    index_count = spark.read.parquet(f"{index_dir}/keys").count()
    assert admitted_count == n_admitted_total, (admitted_count, n_admitted_total)
    assert index_count == n_admitted_total, (index_count, n_admitted_total)
    print(f"state == twin for {len(want)} sources; admitted {n_admitted_total:,}")

    # --- replay checks on the last batch ---
    last_batch = max(b for b, _, _ in prog)
    last_df = spark.read.parquet(src).filter(
        F.col("doc_id") >= (n_files - 1) * chunk
    )
    funnel = make_curation_funnel_batch(index_dir, out_dir, state_dir, ckpt)

    def state_fingerprint() -> tuple:
        rows = tuple(
            sorted(map(tuple, spark.read.parquet(f"{state_dir}/current").collect()))
        )
        return rows, admitted_count

    fp0 = state_fingerprint()
    t0 = time.perf_counter()
    funnel(last_df, last_batch)  # marker present -> must short-circuit
    marker_replay_sec = round(time.perf_counter() - t0, 3)
    assert state_fingerprint() == fp0, "marker replay mutated state"
    assert marker_replay_sec < 5, f"marker replay did work: {marker_replay_sec}s"

    os.remove(os.path.join(out_dir, f"_applied_{last_batch}"))
    t0 = time.perf_counter()
    funnel(last_df, last_batch)  # crash window: full recompute, no double count
    markerless_replay_sec = round(time.perf_counter() - t0, 1)
    assert state_fingerprint() == fp0, "markerless replay changed state/output"
    assert spark.read.parquet(f"{out_dir}/batch_id=*").count() == n_admitted_total
    assert spark.read.parquet(f"{index_dir}/keys").count() == n_admitted_total
    print(
        f"replays OK: marker {marker_replay_sec}s, markerless "
        f"{markerless_replay_sec}s (state + admitted set unchanged)"
    )

    row = {
        "rows": n_rows,
        "distinct_contents": n_distinct,
        "batches": len(prog),
        "rows_per_batch": chunk,
        "wall_sec": wall,
        "rows_per_sec": int(n_rows / wall),
        "batch_sec_median": round(statistics.median(durs), 1) if durs else None,
        "batch_sec_max": round(max(durs), 1) if durs else None,
        "admitted": n_admitted_total,
        "index_keys": index_count,
        "state_matches_twin": True,
        "marker_replay_sec": marker_replay_sec,
        "markerless_replay_sec": markerless_replay_sec,
        "calib_pre": pre,
        "calib_post": post,
    }
    out_path = REPO_ROOT / "STATE_STORE_AUDIT.json"
    audit = json.load(open(out_path))
    audit["funnel_25m"] = row
    json.dump(audit, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps(row, indent=1))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
