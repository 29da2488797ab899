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


# --- e12b: temperature-flattened mixture --------------------------------
B2 = 151  #: e12b budget (prime, like e12's — nonzero remainders everywhere)


@query(
    "e12b_temperature_mixture",
    oracle=f"""
WITH avail AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
u AS (
  SELECT source, n,
         GREATEST(CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT), 1) AS units
  FROM avail
),
w AS (SELECT *, SUM(units) OVER () AS tu FROM u),
qq AS (
  SELECT source, n,
         ({B2} * units) // tu AS base,
         ({B2} * units) % tu AS rem
  FROM w
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
         SUM(base) OVER () AS total_base
  FROM qq
),
quota AS (
  SELECT source,
         CAST(LEAST(base + CASE WHEN rr <= {B2} - total_base
                                THEN 1 ELSE 0 END, n) AS BIGINT) AS quota
  FROM ranked
),
sel AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {{pick}}, doc_id
         ) AS pick_rank
  FROM documents
)
SELECT doc_id, s.source, pick_rank, quota
FROM sel s JOIN quota USING (source)
WHERE pick_rank <= quota
""".format(pick=duck_md5_hash("CAST(doc_id AS VARCHAR)")),
)
def e12b_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12b temperature-flattened mixture — e12's apportionment with
    weights ∝ n_k^(1/2) instead of fixed priority units: the α=0.5
    "temperature" rebalancing every multilingual / multi-domain
    pretraining recipe applies (Conneau & Lample 2019 §3.1; the
    p_i^α / Σ p_j^α upsampling of low-resource sources) so head domains
    stop drowning out tail domains without letting any tail dominate.

    Determinism across engines without float weights: the weight unit is
    ``floor(sqrt(n_k))`` — IEEE-754 sqrt is correctly rounded, so Spark
    and DuckDB compute the identical double for any BIGINT count, and
    the floor makes the apportionment all-integer from there (the same
    largest-remainder machinery as e12, with the unit total now a
    data-dependent window sum over the bounded per-source table).

    Scale shape: identical to e12 — the apportionment table is one row
    per source (bounded; its windows are exempt-class), broadcast to the
    corpus; the pick is the md5-ordered row_number per source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    avail = docs.groupBy("source").agg(F.count("*").alias("n"))
    quota = sqrt_temperature_quota(avail, B2)
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


def sqrt_temperature_quota(avail: DataFrame, budget: int) -> DataFrame:
    """Largest-remainder apportionment of ``budget`` over ``(source, n)``
    with weight units ``max(floor(sqrt(n)), 1)`` — e12b's core, split out
    so the flattening law (quota ratios follow √n ratios on a skewed
    availability table) is testable on hand-built frames.

    Availability-cap semantics (r8 ADVICE): each quota is clamped to its
    source's availability AFTER apportionment (``LEAST(base+extra, n)``),
    and the excess a binding source cannot absorb is DROPPED, not
    redistributed — so when any source binds, ``sum(quota) < budget``
    (under-budget by exactly the clamped excess; law-pinned in
    tests/test_mixing.py). This is deliberate: redistribution would be
    iterative (clamping a source changes everyone else's share — the
    water-filling fixpoint), data-dependent in depth, and would break
    the single-pass all-integer plan; a caller that needs the full
    budget re-runs with the bound sources excluded (one extra pass,
    caller-controlled) — the standard two-call idiom for capped
    apportionment."""
    u = avail.select(
        "source",
        "n",
        F.greatest(
            F.expr("CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)"), F.lit(1)
        ).alias("units"),
    )
    # bounded: one row per source (exempt single-partition windows).
    w = u.select("*", F.sum("units").over(Window.partitionBy()).alias("tu"))
    qq = w.select(
        "source",
        "n",
        F.expr(f"({budget} * units) div tu").alias("base"),
        F.expr(f"({budget} * units) % tu").alias("rem"),
    )
    ranked = qq.select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("rem"), "source")).alias("rr"),
        F.sum("base").over(Window.partitionBy()).alias("total_base"),
    )
    return ranked.select(
        "source",
        F.least(
            F.col("base")
            + F.when(F.col("rr") <= budget - F.col("total_base"), 1).otherwise(0),
            F.col("n"),
        )
        .cast("bigint")
        .alias("quota"),
    )
