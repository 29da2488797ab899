#!/usr/bin/env python
"""r12 optimization A/B: does materializing the shared intermediate
(the e35 'write the sketch table' pattern) beat Catalyst's duplicated
subtree execution for (a) e19's scored frame, (b) the LSH band frame?

Interleaved A,B,A,B,... in ONE JVM so host-window drift cancels; both
variants timed call+write (call is plan-build-only for A, so charging it
to A too keeps the comparison conservative). Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from wx20222_bigdata_spark.plans.caching import materialize  # noqa: E402
from wx20222_bigdata_spark.registry import all_queries  # noqa: E402
from wx20222_bigdata_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N = 5


def timed(fn) -> float:
    t0 = time.perf_counter()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def e19_materialized(spark):
    """e19 with scored localCheckpointed before the percentile branch."""
    from wx20222_bigdata_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> length(x) > 0)")).alias(
            "tok"
        ),
    )
    pairs = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("k"))
    w_tok = Window.partitionBy("tok")
    tot = pairs.agg(F.sum("k").alias("total"))
    lp = (
        pairs.withColumn("cnt", F.sum("k").over(w_tok))
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "tok",
            "k",
            F.log(F.col("cnt").cast("double") / F.col("total")).alias("lp"),
        )
    )
    agg = lp.groupBy("doc_id").agg(
        F.sum("k").alias("n_tok"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(tok, lp, k))), 0D,"
            " (a, s) -> aggregate(sequence(1, int(s.k)), a, (b, i) -> b + s.lp))"
        ).alias("slp"),
    )
    scored = materialize(
        agg.select(
            "doc_id", "n_tok", (F.col("slp") / F.col("n_tok")).alias("avg_raw")
        )
    )
    bands = scored.agg(
        F.expr("percentile(avg_raw, 1.0/3)").alias("b1"),
        F.expr("percentile(avg_raw, 2.0/3)").alias("b2"),
    )
    return scored.crossJoin(F.broadcast(bands)).select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.round("avg_raw", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("avg_raw")), 6).alias("perplexity"),
        F.when(F.round("avg_raw", 6) <= F.round("b1", 6), "low")
        .when(F.round("avg_raw", 6) <= F.round("b2", 6), "mid")
        .otherwise("high")
        .alias("ppl_band"),
    )


def e2b_materialized(spark):
    from wx20222_bigdata_spark.operators.dedup import (
        _corpus_with_mutants_spark,
        count_shared_bands,
        lsh_candidate_pairs,
        minhash_band_keys,
    )

    corpus = _corpus_with_mutants_spark(spark, SF_DIR)
    bands = materialize(minhash_band_keys(corpus))
    return lsh_candidate_pairs(bands).transform(count_shared_bands)


def e2j_materialized(spark):
    from wx20222_bigdata_spark.operators.dedup import (
        _corpus_with_mutants_spark,
        count_shared_bands,
        lsh_candidate_pairs,
        minhash_band_keys,
    )

    corpus = _corpus_with_mutants_spark(spark, SF_DIR, rebalance=True)
    bands = materialize(minhash_band_keys(corpus, whitespace=False))
    return lsh_candidate_pairs(bands).transform(count_shared_bands)


def main() -> None:
    spark = get_spark(
        app_name="r12-ab-materialize",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    # warmup
    q["j2_broadcast_dim_join"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    cases = {
        "e19": (
            lambda: q["e19_unigram_logprob"](spark, SF_DIR),
            lambda: e19_materialized(spark),
        ),
        "e2b": (
            lambda: q["e2b_minhash_lsh_pairs"](spark, SF_DIR),
            lambda: e2b_materialized(spark),
        ),
        "e2j": (
            lambda: q["e2j_char_shingle_lsh_pairs"](spark, SF_DIR),
            lambda: e2j_materialized(spark),
        ),
    }
    out = {}
    for name, (fa, fb) in cases.items():
        sa, sb = [], []
        for _ in range(N):
            sa.append(timed(fa))
            sb.append(timed(fb))
        out[name] = {
            "A_current_median": round(statistics.median(sa), 3),
            "B_materialized_median": round(statistics.median(sb), 3),
            "A_samples": [round(x, 3) for x in sa],
            "B_samples": [round(x, 3) for x in sb],
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
