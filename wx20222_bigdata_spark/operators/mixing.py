"""Data-mixture sampling — apportion a document budget across sources to
hit target mixture weights, then pick documents deterministically
(SURVEY.md §2.11 curation family; the "data mixing" step of every LLM
pretraining recipe: per-domain quotas, reproducible selection).

Apportionment is Hamilton largest-remainder over **integer weight
units** (source k gets k+1 units): quota_k = budget*units_k // total,
leftovers to the largest remainders. All-integer — no float weight ever
touches the allocation, so both engines agree bit-for-bit by
construction. Selection within a source orders by the cross-engine md5
hash of doc_id — an unbiased, reproducible pseudo-random pick (the same
"deterministic hash order" trick as the seeded corpora; see
functions/hashing.py).

Scale shape: the apportionment table is one row per SOURCE (bounded,
tiny — its ranking window is source-cardinality-bounded, pinned exempt
in test_plans), broadcast to the corpus; the per-source pick is a window
partitioned on source. At extreme per-source skew, swap the exact
row_number pick for hash-threshold sampling (keep doc where
hash/MOD < quota/avail) — approximate quota, zero window state; the
docstring trade-off is the point: exact pick here, threshold pick at
100 TB if a single source outweighs a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.functions.hashing import duck_md5_hash, spark_md5_hash
from wx20222_bigdata_spark.registry import query

BUDGET = 203        # docs to select (prime → nonzero remainders everywhere)
TOTAL_UNITS = 210   # sum of units k+1 for src0..src19


@query(
    "e12_mixture_sampling",
    oracle=f"""
WITH avail AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
q AS (
  SELECT source, n, CAST(substring(source, 4) AS INT) + 1 AS units FROM avail
),
qq AS (
  SELECT source, n,
         ({BUDGET} * units) // {TOTAL_UNITS} AS base,
         ({BUDGET} * units) % {TOTAL_UNITS} AS rem
  FROM q
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
         SUM(base) OVER () AS total_base
  FROM qq
),
quota AS (
  SELECT source,
         CAST(LEAST(base + CASE WHEN rr <= {BUDGET} - total_base
                                THEN 1 ELSE 0 END, n) AS BIGINT) AS quota
  FROM ranked
),
sel AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {duck_md5_hash("CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS pick_rank
  FROM documents
)
SELECT doc_id, s.source, pick_rank, quota
FROM sel s JOIN quota USING (source)
WHERE pick_rank <= quota
""",
)
def e12_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select BUDGET documents with per-source quotas proportional to the
    source's weight units, largest-remainder rounded, capped at
    availability; deterministic hash-ordered pick within each source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    avail = docs.groupBy("source").agg(F.count("*").alias("n"))
    q = avail.select(
        "source",
        "n",
        (F.expr("CAST(substring(source, 4) AS INT)") + 1).alias("units"),
    )
    qq = q.select(
        "source",
        "n",
        F.expr(f"({BUDGET} * units) div {TOTAL_UNITS}").alias("base"),
        (F.lit(BUDGET) * F.col("units") % TOTAL_UNITS).alias("rem"),
    )
    # bounded: one row per source — the single-partition window here ranks
    # the apportionment table, never row data (exempt in test_plans).
    ranked = qq.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "source"))
        .alias("rr"),
        F.sum("base").over(Window.partitionBy()).alias("total_base"),
    )
    quota = ranked.select(
        "source",
        F.least(
            F.col("base")
            + F.when(F.col("rr") <= BUDGET - F.col("total_base"), 1).otherwise(0),
            F.col("n"),
        )
        .cast("bigint")
        .alias("quota"),
    )
    sel = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.expr(spark_md5_hash("CAST(doc_id AS STRING)")), "doc_id"
            )
        )
        .alias("pick_rank"),
    )
    return (
        sel.join(F.broadcast(quota), "source")
        .filter(F.col("pick_rank") <= F.col("quota"))
        .select(
            "doc_id",
            "source",
            F.col("pick_rank").cast("bigint").alias("pick_rank"),
            "quota",
        )
    )
