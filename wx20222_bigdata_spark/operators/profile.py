"""Table profiling — per-column statistics collection in one scan
(SURVEY.md §2 engine surface: the ANALYZE/statistics pass a cost-based
optimizer and any data-quality monitor runs before everything else).

One aggregate computes every column's null count, exact distinct count
and numeric min/max in a single pass (Catalyst expands the multi-distinct
into the grouping-id plan); the wide one-row result is then unpivoted
with ``stack`` into one row per column. Non-numeric columns carry NULL
min/max — the schema stays uniform so the profile of any table is
union-compatible. TIMESTAMP_NTZ columns are deliberately excluded from
the numeric slots (no tz-dependent epoch conversion in outputs — the
documented determinism rule). At 100 TB the same plan holds (profile cost
≈ one table scan); swap exact COUNT(DISTINCT) for approx_count_distinct
(the a12 tier) when the distinct expansion dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

#: (column, numeric?) — profile targets on orders
_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _duck_branch(col: str, numeric: bool) -> str:
    mn = f"CAST(MIN({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    mx = f"CAST(MAX({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    return f"""
SELECT '{col}' AS col_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {col}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num
FROM orders"""


@query(
    "prof1_table_profile",
    oracle="\nUNION ALL".join(_duck_branch(c, num) for c, num in _COLS),
)
def prof1_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-per-column profile of orders: rows, nulls, exact distinct,
    numeric min/max."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c, numeric in _COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if numeric:
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    wide = o.agg(*aggs)
    branches = []
    for c, numeric in _COLS:
        mn = f"mn_{c}" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{c}" if numeric else "CAST(NULL AS DOUBLE)"
        branches.append(f"'{c}', n_rows, nn_{c}, nd_{c}, {mn}, {mx}")
    return wide.select(
        F.expr(
            f"stack({len(_COLS)}, {', '.join(branches)})"
            " AS (col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
        )
    )
