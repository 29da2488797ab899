#!/usr/bin/env python
"""r8 verdict item 1 evidence: interleaved A/B of the q9-rule broadcast
sweep on the three heaviest de-hinted seats (q14/q16/q19).

A = shipped form (no hint; AQE governs the part/supplier join strategy).
B = the pre-r8 form (hint-forced F.broadcast of the SF-scaled side).

Runs A/B/A/B within ONE session per SF tier (the host throttles 3-5x
between windows — only interleaved runs are valid evidence; see
SCALE.md round-6/7 sections). At sf0.1 also records whether AQE's FINAL
plan for A contains a BroadcastHashJoin (the "no small-SF regression"
half of the claim: removing the hint must not cost anything where a
broadcast is right).

Usage: python tools/broadcast_sweep_ab.py [sf_dir ...]
Default tiers: /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# single-JVM local mode: the "executor" heap is the driver heap (same
# sizing rationale as tools/scaling_curve.py)
_existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
if "--driver-memory" not in _existing:
    os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory 48g {_existing}"

from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.session import get_spark

N_RUNS = 3


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def q14_variant(spark, sf_dir, hinted: bool):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    if hinted:
        p = F.broadcast(p)
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return li.join(p, p.p_partkey == li.l_partkey).agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )


def q16_variant(spark, sf_dir, hinted: bool):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    if hinted:
        p, bad = F.broadcast(p), F.broadcast(bad)
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", F.expr("p_size div 10").alias("size_band"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q19_variant(spark, sf_dir, hinted: bool):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    if hinted:
        p = F.broadcast(p)
    j = li.join(p, p.p_partkey == li.l_partkey)
    env = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    return j.filter(env).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


SEATS = {"q14": q14_variant, "q16": q16_variant, "q19": q19_variant}


def main() -> None:
    tiers = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
    spark = get_spark(
        app_name="broadcast-sweep-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for sf_dir in tiers:
        tier = sf_dir.rstrip("/").split("/")[-1]
        for name, fn in SEATS.items():
            a_df = fn(spark, sf_dir, hinted=False)
            b_df = fn(spark, sf_dir, hinted=True)
            rec: dict = {"runs": N_RUNS}
            try:
                _noop(a_df)  # warm both scan caches before timing
                _noop(b_df)
                a_times, b_times, c_times = [], [], []
                for _ in range(N_RUNS):  # interleaved A/B/C
                    a_times.append(_noop(a_df))
                    b_times.append(_noop(b_df))
                    # C: un-hinted with the broadcast threshold sized to
                    # the executor (256m) — the deployment-config way to
                    # get the broadcast WITHOUT hardcoding it: when the
                    # dim outgrows the threshold the plan falls back to a
                    # shuffle join instead of OOMing (this harness's
                    # first run at the default 1g heap DID OOM on the
                    # forced variant — that cliff is the bug).
                    spark.conf.set(
                        "spark.sql.autoBroadcastJoinThreshold", "268435456"
                    )
                    try:
                        c_times.append(_noop(fn(spark, sf_dir, hinted=False)))
                    finally:
                        spark.conf.set(
                            "spark.sql.autoBroadcastJoinThreshold", "10485760"
                        )
                rec["aqe_governed_sec"] = round(statistics.median(a_times), 3)
                rec["hint_forced_sec"] = round(statistics.median(b_times), 3)
                rec["aqe_256m_threshold_sec"] = round(
                    statistics.median(c_times), 3
                )
            except Exception as e:  # the forced broadcast CAN OOM — that
                # IS the result being measured, record it and move on
                rec["error"] = str(e).splitlines()[0][:200]
            if tier == "sf0.1":
                # AQE final plan: did the un-hinted form still broadcast?
                final = a_df._jdf.queryExecution().executedPlan().toString()
                rec["aqe_final_has_broadcast"] = "BroadcastHashJoin" in final
            out.setdefault(tier, {})[name] = rec
            print(f"{tier} {name}: {rec}", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
