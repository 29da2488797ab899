"""Statistical aggregates + upsert/merge (coverage beyond SURVEY §2's
'absent' rows: percentiles, moments, correlation; CDC-style merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


@query(
    "a13_percentiles",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(MIN(value), 6) AS vmin,
       ROUND(MAX(value), 6) AS vmax
FROM events
GROUP BY event_type
""",
)
def a13_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark ``percentile``
    (exact, sort-based) == DuckDB ``quantile_cont``. At 100 TB swap to
    ``approx_percentile`` (t-digest, one pass, no sort) — engine-specific
    sketch, hence the exact form is the oracle-checked one."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


@query(
    "a14_moments",
    oracle="""
SELECT event_type,
       ROUND(stddev_samp(value), 6) AS sd,
       ROUND(var_samp(value), 6) AS variance,
       ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_user,
       ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_user
FROM events
GROUP BY event_type
""",
)
def a14_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (stddev/variance/corr/covar) — same
    sample-variance definitions on both engines; rounded to 6 because the
    accumulation order differs (values agree to ~1e-12 relative)."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("variance"),
        F.round(F.corr(F.col("value"), u), 6).alias("corr_user"),
        F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_user"),
    )


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """CDC-style MERGE: updates win on key collision, unmatched base rows
    survive, brand-new keys insert. Implemented as updates ∪ (base
    left-anti updates) — one shuffle on the key, the lakehouse merge
    shape without a table format. Idempotent by construction."""
    return updates.unionByName(base.join(updates.select(key), key, "left_anti"))


@query(
    "m1_upsert_merge",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, 'RE-PRICED' AS o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT 90000000 + r.range AS o_orderkey, 1 AS o_custkey, 'N' AS o_orderstatus,
         555.0 AS o_totalprice, TIMESTAMP '2000-01-01 00:00:00' AS o_orderdate,
         'NEW' AS o_orderpriority
  FROM range(5) r
),
merged AS (
  SELECT * FROM updates
  UNION ALL
  SELECT * FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM merged
GROUP BY o_orderpriority
""",
)
def m1_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics verified end to end: re-price every 100th
    order (update), insert 5 new orders, keep the rest — summarized per
    priority so the update/insert/keep classes are all visible in the
    checked output."""
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        F.lit("RE-PRICED").alias("o_orderpriority"),
    )
    new_rows = spark.range(5).select(
        (F.col("id") + 90000000).alias("o_orderkey"),
        F.lit(1).cast("bigint").alias("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(555.0).alias("o_totalprice"),
        F.lit("2000-01-01 00:00:00").cast("timestamp_ntz").alias("o_orderdate"),
        F.lit("NEW").alias("o_orderpriority"),
    )
    merged = upsert(orders, updates.unionByName(new_rows), "o_orderkey")
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )
