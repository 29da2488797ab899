#!/usr/bin/env python
"""r8 verdict item 7: growth audit of the vocabulary-sized tables that
the retrieval/text-stats family builds and (pre-r8) hint-broadcast.

Three distinct cases:

1. e13/rrf1 BM25 ``df`` table — NOT vocab-sized: tf is pre-filtered by
   the broadcast QUERY_TERMS join, so df has at most |QUERY_TERMS| rows
   regardless of SF. Bounded by construction; the hint is safe.
2. e16 TF-IDF ``df`` table — one row per distinct corpus token.
3. e19 unigram ``freq`` table — same key domain as (2).

(2) and (3) grow with the corpus (Heaps' law: V ~ k*N^beta, sublinear
but UNBOUNDED — a web-scale corpus has 10^8-10^9 distinct tokens, far
past any broadcast threshold). This tool measures |vocab| rows and
serialized bytes per SF tier, and runs an interleaved A/B (broadcast
hint vs AQE-governed) for e16/e19 to show de-hinting costs nothing at
test scale.

Usage: python tools/df_table_audit.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

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


def _toks(docs):
    return docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("tok"),
    )


def e16_variant(spark, sf_dir, hinted: bool):
    """hinted=True is the pre-r8 form (broadcast hint on the vocab-sized
    df); hinted=False is the shipped r8 shared-partitioning form (tf
    repartitioned once on tok; the df aggregate and the join reuse it)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(docs)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    if hinted:
        df = F.broadcast(
            tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
        )
        probe = tf
    else:
        probe = tf.repartition("tok")
        df = probe.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        probe.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias("tfidf"),
        )
    )


def e19_variant(spark, sf_dir, hinted: bool):
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(docs)
    pairs = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("k"))
    if hinted:
        freq = F.broadcast(toks.groupBy("tok").agg(F.count("*").alias("cnt")))
        probe = pairs
    else:
        probe = pairs.repartition("tok")
        freq = probe.groupBy("tok").agg(F.sum("k").alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("total"))
    return (
        probe.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id", "tok", "k",
            F.log(F.col("cnt").cast("double") / F.col("total")).alias("lp"),
        )
    )


def main() -> None:
    tiers = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
    spark = get_spark(
        app_name="df-table-audit",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for sf_dir in tiers:
        tier = sf_dir.rstrip("/").split("/")[-1]
        docs = load_table(spark, sf_dir, "documents")
        toks = _toks(docs)
        # vocab growth: rows + bytes (token chars + 8B count per row)
        vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
        stats = vocab.agg(
            F.count("*").alias("rows"),
            (F.sum(F.length("tok")) + F.count("*") * 8).alias("approx_bytes"),
        ).collect()[0]
        n_docs = docs.count()
        # BM25 df-table bound check: rows after the QUERY_TERMS filter
        from wx20222_bigdata_spark.operators.retrieval import QUERY_TERMS

        bm25_df_rows = (
            toks.filter(F.col("tok").isin(*QUERY_TERMS))
            .select("tok")
            .distinct()
            .count()
        )
        rec = {
            "n_docs": n_docs,
            "vocab_rows": stats["rows"],
            "vocab_approx_bytes": int(stats["approx_bytes"]),
            "bm25_df_rows": bm25_df_rows,
            "query_terms": len(QUERY_TERMS),
        }
        # interleaved A/B on the de-hinted seats
        for name, fn in [("e16", e16_variant), ("e19", e19_variant)]:
            a_df = fn(spark, sf_dir, hinted=False)
            b_df = fn(spark, sf_dir, hinted=True)
            _noop(a_df)
            _noop(b_df)
            a, b = [], []
            for _ in range(N_RUNS):
                a.append(_noop(a_df))
                b.append(_noop(b_df))
            final = a_df._jdf.queryExecution().executedPlan().toString()
            rec[name] = {
                "aqe_governed_sec": round(statistics.median(a), 3),
                "hint_forced_sec": round(statistics.median(b), 3),
                "aqe_final_has_broadcast": "BroadcastHashJoin" in final,
            }
        out[tier] = rec
        print(f"{tier}: {rec}", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
