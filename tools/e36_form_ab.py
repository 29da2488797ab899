#!/usr/bin/env python
"""e36 duplicate-test form A/B: window vs semi-join (SCALE.md "e36
duplicate-test form A/B").

Does the e16/e19 "one-exchange window beats groupBy+join-back" finding
hold for e36's occurrence stream (much larger than a distinct-gram
table)? Both forms are built from the same md5-keyed occurrence stream
and the same coverage/span tail; value-equality is asserted by exceptAll
in both directions before any timing is reported.

Usage: python tools/e36_form_ab.py [--runs N] [--tiers sf1,sf10]
Prints one JSON object; numbers get copied into SCALE.md.
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

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from wx20222_bigdata_spark.catalog import load_table  # noqa: E402
from wx20222_bigdata_spark.functions.hashing import spark_md5_hash  # noqa: E402
from wx20222_bigdata_spark.operators.substring import K  # noqa: E402
from wx20222_bigdata_spark.session import get_spark  # noqa: E402

TIERS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/sf1", "sf10": "/tmp/sf10"}


def main() -> None:
    runs = 3
    tiers = ["sf1", "sf10"]
    argv = sys.argv[1:]
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])
    if "--tiers" in argv:
        tiers = argv[argv.index("--tiers") + 1].split(",")

    spark = get_spark(
        app_name="e36-form-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def occ(sf):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        words = docs.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> length(x) > 0)").alias("ws"),
        )
        return (
            words.filter(F.expr(f"size(ws) >= {K}"))
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(ws) - {K - 1}),"
                        f" j -> struct(j AS j, concat_ws(' ', slice(ws, j, {K})) AS g))"
                    )
                ).alias("o"),
            )
            .select("doc_id", "o.j", F.expr(spark_md5_hash("o.g")).alias("gh"))
        )

    def tail_from_dup(dup, sf):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        words = docs.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> length(x) > 0)").alias("ws"),
        )
        cov = dup.select(
            "doc_id", F.explode(F.expr(f"sequence(j, j + {K - 1})")).alias("pos")
        ).distinct()
        runs_ = cov.withColumn(
            "run_start",
            F.when(
                F.lag("pos").over(Window.partitionBy("doc_id").orderBy("pos"))
                == F.col("pos") - 1,
                0,
            ).otherwise(1),
        )
        cagg = runs_.groupBy("doc_id").agg(
            F.count("*").alias("n_dup_tokens"), F.sum("run_start").alias("n_spans")
        )
        base = words.select("doc_id", F.size("ws").alias("n_tokens"))
        return base.join(cagg, "doc_id", "left").select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).alias("n_dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )

    def window_form(sf):
        o = occ(sf)
        dup = (
            o.withColumn("cnt", F.count("*").over(Window.partitionBy("gh")))
            .filter(F.col("cnt") >= 2)
            .select("doc_id", "j")
        )
        return tail_from_dup(dup, sf)

    def join_form(sf):
        o = occ(sf)
        counts = o.groupBy("gh").agg(F.count("*").alias("cnt")).filter(
            F.col("cnt") >= 2
        )
        dup = o.join(counts.select("gh"), "gh", "left_semi").select("doc_id", "j")
        return tail_from_dup(dup, sf)

    out: dict[str, dict] = {}
    for tier in tiers:
        sf = TIERS[tier]
        a, b = window_form(sf), join_form(sf)
        equal = a.exceptAll(b).count() + b.exceptAll(a).count() == 0
        row: dict[str, float | bool] = {"value_equal": equal}
        assert equal, f"{tier}: forms disagree — no timing reported"
        for name, fn in [("window_sec", window_form), ("join_sec", join_form)]:
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(sf).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            row[name] = round(sorted(ts)[len(ts) // 2], 2)
        out[tier] = row
        print(tier, row, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
