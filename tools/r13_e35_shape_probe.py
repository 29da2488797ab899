#!/usr/bin/env python
"""r13: diagnose + A/B the e35 flat-SQL signature pass (VERDICT r12 item 3).

Modes:
  diag  — row counts, executed plan of the signature projection (is there
          a WholeStageCodegen span? does CODEGEN_ONLY factory mode throw?),
          per-stage timing split (plane-dot projection alone vs + packing)
  ab    — interleaved A/B/.. of candidate signature shapes at sf0.1,
          each timed as corpus -> shape -> noop (no checkpoint, so the
          timed region is exactly the projection work)
  full  — interleaved A/B of the FULL e35 seat (current vs adopted shape)

Shapes:
  A  current: Project[pl = array(64 plane dots)] -> Project[4 band packs]
  B  struct-packed: Project[8 structs x 8 dot fields] -> Project[4 packs]
  C  one-shot: single Project computing the 4 band keys with dots inlined
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from wx20222_bigdata_spark.functions.vector import norm  # noqa: E402
from wx20222_bigdata_spark.operators.semdedup import (  # noqa: E402
    HP_BANDS,
    HP_BITS,
    HP_PLANES,
    _emb_corpus_with_mutants,
    _hp_band_from_planes,
    _hp_plane_dot_spark,
)
from wx20222_bigdata_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N = 7


def _session(extra=None):
    conf = {"spark.ui.showConsoleProgress": "false"}
    conf.update(extra or {})
    spark = get_spark(
        app_name="r13-e35-shape",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf=conf,
    )
    return spark


def shape_a(corpus):
    planes = corpus.select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        F.array(
            *[F.expr(_hp_plane_dot_spark(j)) for j in range(HP_PLANES)]
        ).alias("pl"),
    )
    return planes.select(
        "vec_id",
        "embedding",
        "nrm",
        *[
            F.expr(_hp_band_from_planes(b)).cast("int").alias(f"band{b}")
            for b in range(HP_BANDS)
        ],
    )


def shape_b(corpus):
    structs = corpus.select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        *[
            F.struct(
                *[
                    F.expr(_hp_plane_dot_spark(s * 8 + f)).alias(f"p{f}")
                    for f in range(8)
                ]
            ).alias(f"pl{s}")
            for s in range(HP_PLANES // 8)
        ],
    )

    def band_from_structs(b: int) -> str:
        terms = []
        for bit in range(HP_BITS):
            j = b * HP_BITS + bit
            terms.append(
                f"CASE WHEN pl{j // 8}.p{j % 8} > 0 THEN {2 ** bit} ELSE 0 END"
            )
        return "(" + " + ".join(terms) + ")"

    return structs.select(
        "vec_id",
        "embedding",
        "nrm",
        *[
            F.expr(band_from_structs(b)).cast("int").alias(f"band{b}")
            for b in range(HP_BANDS)
        ],
    )


def shape_c(corpus):
    def band_inline(b: int) -> str:
        terms = []
        for bit in range(HP_BITS):
            j = b * HP_BITS + bit
            terms.append(
                f"CASE WHEN ({_hp_plane_dot_spark(j)}) > 0"
                f" THEN {2 ** bit} ELSE 0 END"
            )
        return "(" + " + ".join(terms) + ")"

    return corpus.select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        *[
            F.expr(band_inline(b)).cast("int").alias(f"band{b}")
            for b in range(HP_BANDS)
        ],
    )


SHAPES = {"A": shape_a, "B": shape_b, "C": shape_c}


def diag() -> None:
    spark = _session()
    spark.sparkContext.setLogLevel("WARN")
    corpus = _emb_corpus_with_mutants(spark, SF_DIR)
    n = corpus.count()
    print(f"corpus rows: {n}")
    sig = shape_a(corpus)
    sig.write.format("noop").mode("overwrite").save()
    plan = sig._jdf.queryExecution().executedPlan().toString()
    print("=== executed plan (shape A, first 80 lines) ===")
    print("\n".join(plan.splitlines()[:80]))
    print("WholeStageCodegen spans:", plan.count("WholeStageCodegen"))
    # timing split: norm-only, planes-only, planes+pack
    for label, df in [
        ("norm only", corpus.select("vec_id", norm("embedding").alias("nrm"))),
        (
            "planes array",
            corpus.select(
                "vec_id",
                F.array(
                    *[F.expr(_hp_plane_dot_spark(j)) for j in range(HP_PLANES)]
                ).alias("pl"),
            ),
        ),
        ("full sig (A)", sig),
    ]:
        s = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            s.append(time.perf_counter() - t0)
        print(f"{label}: median {statistics.median(s):.3f}s {[round(x,3) for x in s]}")
    spark.stop()
    # CODEGEN_ONLY probe in a fresh session: does the projection compile?
    spark = _session({"spark.sql.codegen.factoryMode": "CODEGEN_ONLY"})
    spark.sparkContext.setLogLevel("WARN")
    try:
        shape_a(_emb_corpus_with_mutants(spark, SF_DIR)).write.format(
            "noop"
        ).mode("overwrite").save()
        print("CODEGEN_ONLY: shape A executed fine (codegen compiles)")
    except Exception as exc:  # noqa: BLE001
        print(f"CODEGEN_ONLY: FAILED -> {type(exc).__name__}: {str(exc)[:400]}")
    spark.stop()


def ab() -> None:
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _emb_corpus_with_mutants(spark, SF_DIR)
    corpus.count()  # warm scan

    def timed(shape) -> float:
        t0 = time.perf_counter()
        shape(corpus).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    names = sys.argv[2:] or list(SHAPES)
    for nm in names:
        timed(SHAPES[nm])  # warm codegen per shape
    samples = {nm: [] for nm in names}
    for _ in range(N):
        for nm in names:
            samples[nm].append(timed(SHAPES[nm]))
    out = {
        nm: {
            "median": round(statistics.median(s), 3),
            "samples": [round(x, 3) for x in s],
        }
        for nm, s in samples.items()
    }
    # equality of band keys across shapes (sorted collect compare)
    base = None
    for nm in names:
        pdf = (
            SHAPES[nm](corpus)
            .select("vec_id", *[f"band{b}" for b in range(HP_BANDS)])
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        if base is None:
            base = pdf
        else:
            assert base.equals(pdf), f"shape {nm} band keys differ!"
    out["band_keys_identical"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    {"diag": diag, "ab": ab}[sys.argv[1]]()
