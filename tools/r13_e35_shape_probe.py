#!/usr/bin/env python
"""r13: diagnose + A/B the e35 flat-SQL signature pass (VERDICT r12 item 3).

Diagnosis (mode diag, findings recorded in OPTIMIZATION_r13.md):
  - the plane-dot projection is EXCLUDED from WholeStageCodegen because it
    carries the HOF ``norm`` (CodegenFallback), and its standalone
    UnsafeProjection compile of ~3.6k flat nodes is janino-hostile (a
    flat-only variant OOMs the compiler's buildLocalVariableMap on a 1 g
    heap) — so the 64x~57-term dot pass evaluates INTERPRETED per row.

Shapes (mode ab; all bitwise-identical per-plane arithmetic):
  A  current: one Project [norm + pl = array(64 plane dots)] -> pack
  S  stacked: Project[norm] -> 8 x Project[pl_k = array(8 dots)] -> pack
     (each 8-dot array is referenced 8x by the pack, so CollapseProject
     keeps the stack; each projection is a small codegen unit)
  B  struct-packed: one Project [norm + 8 structs x 8 dot fields] -> pack
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
GROUP = 8  #: planes per stacked projection


def _session(extra=None):
    conf = {"spark.ui.showConsoleProgress": "false"}
    conf.update(extra or {})
    return get_spark(
        app_name="r13-e35-shape",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf=conf,
    )


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


def shape_s(corpus):
    df = corpus.select("vec_id", "embedding", norm("embedding").alias("nrm"))
    n_groups = HP_PLANES // GROUP
    for g in range(n_groups):
        df = df.select(
            "*",
            F.array(
                *[
                    F.expr(_hp_plane_dot_spark(g * GROUP + i))
                    for i in range(GROUP)
                ]
            ).alias(f"pl{g}"),
        )

    def band_from_groups(b: int) -> str:
        terms = []
        for bit in range(HP_BITS):
            j = b * HP_BITS + bit
            terms.append(
                f"CASE WHEN pl{j // GROUP}[{j % GROUP}] > 0"
                f" THEN {2 ** bit} ELSE 0 END"
            )
        return "(" + " + ".join(terms) + ")"

    return df.select(
        "vec_id",
        "embedding",
        "nrm",
        *[
            F.expr(band_from_groups(b)).cast("int").alias(f"band{b}")
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
                    F.expr(_hp_plane_dot_spark(s * GROUP + f)).alias(f"p{f}")
                    for f in range(GROUP)
                ]
            ).alias(f"pl{s}")
            for s in range(HP_PLANES // GROUP)
        ],
    )

    def band_from_structs(b: int) -> str:
        terms = []
        for bit in range(HP_BITS):
            j = b * HP_BITS + bit
            terms.append(
                f"CASE WHEN pl{j // GROUP}.p{j % GROUP} > 0"
                f" THEN {2 ** bit} ELSE 0 END"
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


SHAPES = {"A": shape_a, "S": shape_s, "B": shape_b}


def diag() -> None:
    spark = _session()
    spark.sparkContext.setLogLevel("WARN")
    corpus = _emb_corpus_with_mutants(spark, SF_DIR)
    print(f"corpus rows: {corpus.count()}")
    for nm in sys.argv[2:] or list(SHAPES):
        sig = SHAPES[nm](corpus)
        t0 = time.perf_counter()
        sig.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        plan = sig._jdf.queryExecution().executedPlan().toString()
        starred = sum(
            1 for ln in plan.splitlines() if ln.lstrip(" :+-").startswith("*(")
        )
        import re

        stars = sorted(set(re.findall(r"\*\((\d+)\)", plan)))
        print(
            f"shape {nm}: first write {sec:.3f}s, plan lines {len(plan.splitlines())},"
            f" starred ops {starred}, codegen ids {stars}"
        )
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
    # equality of band keys + nrm across shapes (sorted collect compare)
    base = None
    for nm in names:
        pdf = (
            SHAPES[nm](corpus)
            .select("vec_id", "nrm", *[f"band{b}" for b in range(HP_BANDS)])
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        if base is None:
            base = pdf
        else:
            assert base.equals(pdf), f"shape {nm} band keys/nrm differ!"
    out["keys_identical"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    {"diag": diag, "ab": ab}[sys.argv[1]]()
