"""Skew mitigation: salted two-phase aggregation and the scalable zip index
(SURVEY.md §7 hard-part (a); SCALE.md 'known trade-offs').

Salting splits a hot grouping key across ``n_salts`` sub-keys so no single
reducer owns the whole key: phase 1 aggregates (key, salt) partials, phase
2 merges per key. The final result is identical to the plain groupBy for
any associative aggregate — which is exactly what the DuckDB oracle (a
plain GROUP BY) verifies.

The zip index replaces the global-window ``row_number`` (one-partition
serialization) with per-partition counting + driver-side offset
composition: two narrow passes, no global sort, no single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


def salted_sum(
    df: DataFrame, key: str, value_col, n_salts: int = 16, out_col: str = "total"
) -> DataFrame:
    """Two-phase salted sum: groupBy(key, salt) → groupBy(key).

    Use when one key dominates AND the aggregate is not map-side
    combinable (collect_list/collect_set, exact percentile, UDAF state):
    the hot key's rows spread over ``n_salts`` reducers in phase 1;
    phase 2 merges ``n_salts`` partials per key — bounded, tiny.

    Measured caveat (perf_experiments.py, 4M rows 90% one key): for
    ALGEBRAIC aggregates (sum/count/min/max) plain groupBy WINS (0.40s vs
    0.53s) — partial aggregation already reduces the hot key to one row
    per map partition before the shuffle, so salting only adds a second
    exchange. Reach for salting on non-combinable aggregates and skewed
    joins (where AQE's skew-join split is the first resort)."""
    salted = df.withColumn("_salt", (F.rand(7) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value_col).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(out_col))


@query(
    "skew_salted_agg",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over the (low-cardinality → maximally skewed)
    event_type key. The oracle is the PLAIN group-by: salting must be a
    physical-only transformation. Decimal partials keep the two-phase sum
    exact, so the equality is bitwise."""
    ev = load_table(spark, sf_dir, "events")
    n_salts = 16
    salted = ev.withColumn("_salt", (F.rand(7) * n_salts).cast("int"))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_psum"),
        F.count("*").alias("_pn"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_psum").cast("double").alias("total"),
        F.sum("_pn").alias("n"),
    )


def zip_with_global_index(df: DataFrame, *order_cols) -> DataFrame:
    """Scalable global zip index: 0-based dense index in ``order_cols``
    order WITHOUT a global window. Accepts column names or sort-order
    expressions (``F.desc("spend")``) — multi-column orderings included.

    1. range-partition by the order column (parallel sort),
    2. count rows per partition (tiny driver-side list),
    3. per-partition local row number + cumulative partition offset.

    Two passes over the data, no single-partition bottleneck — the 100 TB
    replacement for ``row_number().over(Window.orderBy(...))`` (J1). The
    ordering column must be totally ordered (ties broken deterministically
    upstream).

    The range-partitioned frame MUST be persisted: repartitionByRange
    derives its boundaries from a random sample *per execution*, so the
    counts job and the output job would otherwise see different
    partitionings and the offsets would be wrong (observed at sf0.1 —
    invisible at smaller scale). Persisting pins one partitioning for
    both passes; at cluster scale use MEMORY_AND_DISK or write the
    partitioned data out once instead."""
    from pyspark import StorageLevel

    parts = df.repartitionByRange(
        df.sparkSession.sparkContext.defaultParallelism, *order_cols
    ).persist(StorageLevel.MEMORY_AND_DISK)
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    # tiny: one row per partition
    counts = dict(
        (r["_pid"], r["n"])
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    from pyspark.sql.window import Window

    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        with_pid.withColumn("_local", F.row_number().over(local_w) - 1)
        .join(F.broadcast(offset_df), "_pid")
        .withColumn("zip_index", (F.col("_local") + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_local", "_offset")
    )
    # materialize the result eagerly so the pinned range-partitioned input
    # can be released here instead of leaking for the session lifetime; the
    # checkpointed blocks are GC'd with the returned DataFrame by the
    # ContextCleaner.
    from wx20222_bigdata_spark.plans.caching import materialize

    out = materialize(out)
    parts.unpersist()
    return out


@query(
    "j1b_scalable_zip_index",
    oracle="""
SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS zip_index
FROM documents
""",
)
def j1b_scalable_zip_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 at scale: the per-partition-offset zip index must equal the
    global-window row number (the oracle) while never materializing a
    single-partition sort."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return zip_with_global_index(docs, "doc_id").select("doc_id", "zip_index")
