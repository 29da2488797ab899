#!/usr/bin/env python
"""r13 optimization A/B: collapse e7d's driver-side DSL construction into
four spark.sql() blocks (one Catalyst analysis of the fat staged-corpus
union instead of ~17 eager per-op analyses, and far fewer py4j round
trips) — VERDICT r12 item 1.

Modes:
  check   — row-exact equality of the SQL form vs the current DSL form
            at sf0.001/sf0.01/sf0.1 (collect + sorted compare)
  ab      — interleaved A,B,A,B in ONE JVM (call+write timed; both seats
            are call-time-eager so the call IS the work)
  profile — py4j round-trip + wall profile of one warm call per variant

The candidate implementation lives here until proven; on adoption it
moves into operators/curation.py verbatim.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from wx20222_bigdata_spark.catalog import load_table  # noqa: E402
from wx20222_bigdata_spark.operators.curation import (  # noqa: E402
    E7D_COPY_MOD,
    E7D_COPY_OFFSET,
    E7D_MIN_TOKENS,
    E7D_REPEAT_LEN,
    E7D_REPEAT_MOD,
    E7D_REPEAT_OFFSET,
    E7D_SNIP_LEN,
    E7D_SNIP_MOD,
    E7D_SNIP_OFFSET,
    E7D_SPAN_MAX,
    E7D_STUB_LEN,
    E7D_STUB_MOD,
    E7D_STUB_OFFSET,
    e7d_dedup_funnel,
)
from wx20222_bigdata_spark.registry import all_queries  # noqa: E402
from wx20222_bigdata_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N = 7


def e7d_dsl_r12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 DSL form (pre-adoption), preserved verbatim so the A/B
    stays reproducible after operators/curation.py adopted the SQL form."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from wx20222_bigdata_spark.operators.substring import C_DF_CAP, C_THRESHOLD, K

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    copies = docs.filter(F.col("doc_id") % E7D_COPY_MOD == 0).select(
        (F.col("doc_id") + E7D_COPY_OFFSET).alias("doc_id"), "source", "text"
    )
    snippets = docs.filter(F.col("doc_id") % E7D_SNIP_MOD == 0).select(
        (F.col("doc_id") + E7D_SNIP_OFFSET).alias("doc_id"),
        "source",
        F.expr(
            "concat_ws(' ', slice(filter(split(lower(text), ' '),"
            f" x -> length(x) > 0), 1, {E7D_SNIP_LEN}))"
        ).alias("text"),
    )
    stubs = docs.filter(F.col("doc_id") % E7D_STUB_MOD == 0).select(
        (F.col("doc_id") + E7D_STUB_OFFSET).alias("doc_id"),
        "source",
        F.expr(
            "concat_ws(' ', slice(filter(split(lower(text), ' '),"
            f" x -> length(x) > 0), 1, {E7D_STUB_LEN}))"
        ).alias("text"),
    )
    repeats = docs.filter(F.col("doc_id") % E7D_REPEAT_MOD == 0).select(
        (F.col("doc_id") + E7D_REPEAT_OFFSET).alias("doc_id"),
        "source",
        F.expr(
            "concat_ws(' ', flatten(array_repeat("
            "slice(filter(split(lower(text), ' '), x -> length(x) > 0),"
            f" 1, {E7D_REPEAT_LEN}), 3)))"
        ).alias("text"),
    )
    raw = (
        docs.unionByName(copies)
        .unionByName(snippets)
        .unionByName(stubs)
        .unionByName(repeats)
    )
    tok = (
        raw.select(
            "doc_id",
            "source",
            "text",
            F.expr(
                "filter(split(lower(text), ' '), x -> length(x) > 0)"
            ).alias("ws"),
        )
        .select(
            "doc_id",
            "source",
            "text",
            "ws",
            F.size("ws").alias("n_tokens"),
            (F.size("ws") >= E7D_MIN_TOKENS).alias("pass_q"),
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "pass_q",
            F.row_number()
            .over(
                Window.partitionBy(F.md5("text")).orderBy(
                    F.col("pass_q").desc(), "doc_id"
                )
            )
            .alias("rn"),
            "ws",
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "pass_q",
            (F.col("pass_q") & (F.col("rn") == 1)).alias("is_winner"),
            F.when(
                F.col("pass_q") & (F.col("rn") == 1), F.col("ws")
            ).alias("ws"),
        )
        .localCheckpoint(eager=True)
    )
    occ = (
        tok.filter(F.col("is_winner") & (F.col("n_tokens") >= K))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {K - 1}),"
                    f" j -> struct(j AS j, concat_ws(' ', slice(ws, j, {K})) AS g))"
                )
            ).alias("o"),
        )
        .select("doc_id", "o.j", "o.g")
        .localCheckpoint(eager=True)
    )
    grams = occ.select("doc_id", "g").distinct()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    rare = grams.withColumn(
        "df", F.count("*").over(Window.partitionBy("g"))
    ).filter((F.col("df") >= 2) & (F.col("df") <= C_DF_CAP))
    cpairs = (
        rare.select(F.col("doc_id").alias("id_a"), "g")
        .join(rare.select(F.col("doc_id").alias("id_b"), "g"), "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    cq = (
        cpairs.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("n_b")),
            "id_b",
        )
        .filter(F.col("n_shared") / F.least("n_a", "n_b") >= C_THRESHOLD)
    )
    drops = (
        cq.select(
            F.when(F.col("n_a") < F.col("n_b"), F.col("id_a"))
            .when(F.col("n_b") < F.col("n_a"), F.col("id_b"))
            .otherwise(F.greatest("id_a", "id_b"))
            .alias("doc_id")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    occ_c1 = occ.join(drops, "doc_id", "left_anti")
    dup = occ_c1.withColumn(
        "cnt", F.count("*").over(Window.partitionBy("g"))
    ).filter(F.col("cnt") >= 2)
    cov = dup.select(
        "doc_id", F.explode(F.expr(f"sequence(j, j + {K - 1})")).alias("pos")
    ).distinct()
    covagg = cov.groupBy("doc_id").agg(F.count("*").alias("ndup"))
    winners = (
        tok.filter("is_winner")
        .select("doc_id", "source", "n_tokens")
        .join(drops.withColumn("dropped", F.lit(True)), "doc_id", "left")
        .join(covagg, "doc_id", "left")
        .withColumn(
            "st",
            F.when(F.col("dropped"), F.lit(2))
            .when(
                F.round(
                    F.coalesce("ndup", F.lit(0)) / F.col("n_tokens"), 6
                )
                >= E7D_SPAN_MAX,
                F.lit(3),
            )
            .otherwise(F.lit(4)),
        )
        .select("source", "st")
    )
    losers = tok.filter(~F.col("is_winner")).select(
        "source",
        F.when(F.col("pass_q"), F.lit(1)).otherwise(F.lit(0)).alias("st"),
    )
    return (
        winners.unionByName(losers)
        .groupBy("source")
        .agg(
            *[
                F.count(F.when(F.col("st") >= i, 1))
                .cast("bigint")
                .alias(name)
                for i, name in enumerate(
                    ["n_raw", "n_quality", "n_exact", "n_containment", "n_final"]
                )
            ]
        )
    )


def e7d_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adopted into operators/curation.py (r13); B side calls the seat."""
    return e7d_dedup_funnel(spark, sf_dir)


def _session():
    spark = get_spark(
        app_name="r13-e7d-sql-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def check() -> None:
    spark = _session()
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        sf_dir = f"/root/testdata/{sf}"
        a = e7d_dsl_r12(spark, sf_dir).toPandas()
        b = e7d_sql(spark, sf_dir).toPandas()
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        import pandas as pd

        assert list(a.columns) == list(b.columns), (sf, list(b.columns))
        assert [str(t) for t in a.dtypes] == [str(t) for t in b.dtypes], (
            sf,
            a.dtypes,
            b.dtypes,
        )
        pd.testing.assert_frame_equal(a, b, check_exact=True)
        print(f"{sf}: identical ({len(a)} rows)")
    spark.stop()


def ab() -> None:
    spark = _session()
    q = all_queries()
    q["j2_broadcast_dim_join"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # one throwaway pair to warm both code paths
    timed(e7d_dsl_r12)
    timed(e7d_sql)
    sa, sb, wins = [], [], 0
    for _ in range(N):
        sa.append(timed(e7d_dsl_r12))
        sb.append(timed(e7d_sql))
        if sb[-1] < sa[-1]:
            wins += 1
        print(f"A {sa[-1]:.3f}  B {sb[-1]:.3f}", file=sys.stderr)
    out = {
        "A_dsl_median": round(statistics.median(sa), 3),
        "B_sql_median": round(statistics.median(sb), 3),
        "B_pairwise_wins": wins,
        "n_pairs": N,
        "A_samples": [round(x, 3) for x in sa],
        "B_samples": [round(x, 3) for x in sb],
    }
    print(json.dumps(out))
    spark.stop()


def profile() -> None:
    import cProfile
    import pstats

    spark = _session()
    # warm both paths
    e7d_dsl_r12(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    e7d_sql(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for label, fn in [("A_dsl", e7d_dsl_r12), ("B_sql", e7d_sql)]:
        pr = cProfile.Profile()
        pr.enable()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        pr.disable()
        st = pstats.Stats(pr)
        total = st.total_tt
        send = [
            (k, v)
            for k, v in st.stats.items()
            if "send_command" in k[2] or "get_return_value" in k[2]
        ]
        ncalls = sum(v[0] for k, v in send if "send_command" in k[2])
        print(f"{label}: wall {total:.2f}s, py4j send_command calls {ncalls}")
    spark.stop()


if __name__ == "__main__":
    {"check": check, "ab": ab, "profile": profile}[sys.argv[1]]()
