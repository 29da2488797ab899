#!/usr/bin/env python
"""×1000 probe for e35's SQL signature pass alone (r9 verdict item 6).

e35's FULL plan at ×1000 would die in the uncapped banded pair join —
the same 4.6 B-pair explosion that killed e35b (SF100_PROBE.json), and
exactly why e35c/e35d exist. What still needs scale evidence is the
r9 CODEGEN FIX itself: the two-projection (plane-dot array → sign/pack)
signature form that replaced the interpreted ~7k-node expression. This
probe times ONLY that: corpus → two projections → materialize (the
eager localCheckpoint every e35 call performs) over the 2.1 M-row
replica corpus, and records the wall + calibration stamp under
``e35_sql_signature_pass`` in SF100_PROBE.json.

Usage: python tools/e35_sig_probe.py [--sf-dir /tmp/sf100]
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


def main() -> None:
    sf_dir = "/tmp/sf100"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]

    from pyspark.sql import functions as F

    from tools.calib import calib_stamp
    from wx20222_bigdata_spark.functions.vector import norm
    from wx20222_bigdata_spark.operators.semdedup import (
        HP_BANDS,
        HP_PLANES,
        _emb_corpus_with_mutants,
        _hp_band_from_planes,
        _hp_plane_dot_spark,
    )
    from wx20222_bigdata_spark.plans.caching import materialize
    from wx20222_bigdata_spark.session import get_spark

    spark = get_spark(
        app_name="e35-sig-probe",
        master="local[32]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "64")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _emb_corpus_with_mutants(spark, sf_dir)
    t0 = time.perf_counter()
    planes = corpus.select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        F.array(*[F.expr(_hp_plane_dot_spark(j)) for j in range(HP_PLANES)]).alias(
            "pl"
        ),
    )
    sig = materialize(
        planes.select(
            "vec_id",
            "embedding",
            "nrm",
            *[
                F.expr(_hp_band_from_planes(b)).cast("int").alias(f"band{b}")
                for b in range(HP_BANDS)
            ],
        )
    )
    n = sig.count()
    sec = round(time.perf_counter() - t0, 1)
    stamp = calib_stamp(spark)
    print(f"e35 SQL signature pass at {sf_dir}: {n} rows in {sec}s "
          f"(calib {stamp['sec']}s ratio {stamp['ratio']})")

    out_path = REPO / "SF100_PROBE.json"
    probe = json.load(open(out_path)) if out_path.exists() else {}
    probe["e35_sql_signature_pass"] = sec
    probe.setdefault("_calib", {})["e35_sql_signature_pass"] = stamp
    probe.setdefault("_notes", {})["e35_sql_signature_pass"] = (
        "signature-only probe (tools/e35_sig_probe.py): corpus -> plane-dot"
        " array projection -> sign/pack projection -> materialize, the r9"
        " codegen-fix surface; e35's full plan at x1000 would die in the"
        " same uncapped pair join that killed e35b - the capped/auto tiers"
        " (e35c/e35d) are the production path on this corpus."
    )
    json.dump(probe, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
