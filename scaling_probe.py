#!/usr/bin/env python
"""Scaling probe: replicate sf0.1 lineitem/orders ×K (keys shifted so
cardinalities scale too) and measure headline relational queries at each
multiple. Near-linear wall-clock growth = shuffle/agg structure is
volume-bound, not blowing up — the local[N] proxy for cluster scaling.

Writes nothing outside /tmp; results go into SCALE.md by hand.
Usage: python scaling_probe.py [max_multiple]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_scaling"


def replicate(df, key_cols: list[str], k: int, stride: int):
    """Union k copies with key columns shifted by i*stride per copy."""
    parts = []
    for i in range(k):
        part = df
        for c in key_cols:
            part = part.withColumn(c, F.col(c) + F.lit(i * stride))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    max_k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(
        app_name="scaling-probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, BASE, "lineitem")
    orders = load_table(spark, BASE, "orders")
    # warmup: JIT/codegen/shuffle infrastructure out of the measurement
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    orders.join(li, li.l_orderkey == orders.o_orderkey).count()
    results = {}
    k = 1
    while k <= max_k:
        li_k = f"{WORK}/lineitem_x{k}"
        o_k = f"{WORK}/orders_x{k}"
        replicate(li, ["l_orderkey"], k, 10_000_000).write.mode("overwrite").parquet(li_k)
        replicate(orders, ["o_orderkey"], k, 10_000_000).write.mode("overwrite").parquet(o_k)

        lik = spark.read.parquet(li_k)
        ok = spark.read.parquet(o_k)
        dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731

        t0 = time.perf_counter()
        lik.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(dec("l_quantity")).alias("sq"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("sd"),
            F.count("*").alias("n"),
        ).write.format("noop").mode("overwrite").save()
        t_agg = time.perf_counter() - t0

        t0 = time.perf_counter()
        ok.join(lik, lik.l_orderkey == ok.o_orderkey).groupBy("o_orderpriority").agg(
            F.sum(dec("l_extendedprice")).alias("rev"), F.count("*").alias("n")
        ).write.format("noop").mode("overwrite").save()
        t_join = time.perf_counter() - t0

        results[f"x{k}"] = {
            "lineitem_rows": lik.count(),
            "agg_sec": round(t_agg, 2),
            "join_agg_sec": round(t_join, 2),
        }
        k *= 2
    print(json.dumps(results, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
