"""Data-quality constraint suite — the declarative validation gate a
production pipeline runs before promoting a snapshot (the Deequ/
dbt-test shape, expressed as plain aggregates so Catalyst fuses the
whole rule set into one scan).

The reference validates inputs ad hoc (assert-style checks scattered in
``data_helper.py``); a 100 TB pipeline wants every rule computed in the
SAME pass: each row-level rule is a conditional SUM over one scan of the
fact table, unpivoted to one row per rule; only referential integrity
needs a second input (broadcast anti-join on the dimension key). Adding
a rule adds a column to the scan projection, not a pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

#: Closed domain for o_orderstatus (FIXTURES.md §B).
ORDER_STATUS_DOMAIN = ("F", "O", "P")


@query(
    "dq1_constraint_report",
    oracle=f"""
WITH scan AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
         SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price,
         SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS bad_status,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                    OR o_orderdate >= TIMESTAMP '2031-01-01 00:00:00'
                  THEN 1 ELSE 0 END) AS stale_date
  FROM orders
),
fk AS (
  SELECT COUNT(*) AS orphans
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_custkey IS NULL
),
rules AS (
  SELECT 'o_orderkey_unique' AS rule, CAST(dup_keys AS BIGINT) AS n_violations FROM scan
  UNION ALL SELECT 'o_custkey_not_null', CAST(null_cust AS BIGINT) FROM scan
  UNION ALL SELECT 'o_totalprice_nonnegative', CAST(neg_price AS BIGINT) FROM scan
  UNION ALL SELECT 'o_orderstatus_in_domain', CAST(bad_status AS BIGINT) FROM scan
  UNION ALL SELECT 'o_orderdate_in_bounds', CAST(stale_date AS BIGINT) FROM scan
  UNION ALL SELECT 'o_custkey_fk_customer', CAST(orphans AS BIGINT) FROM fk
)
SELECT rule, n_violations, n_violations = 0 AS passed
FROM rules
""",
)
def dq1_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass constraint report over ``orders``: uniqueness, null,
    range, domain, and date-bound rules fused into a single scan's
    conditional aggregates (one row per rule via ``stack``), plus the
    customer FK checked by a broadcast left-anti join. The report shape
    (rule, n_violations, passed) is the contract a promotion gate
    consumes; a failed row carries its violation count for triage.

    The single-partition exchange under the one-row wide aggregate is
    the documented bounded pattern (one partial row per scan task)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    zero = F.lit(0)
    scan = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(zero)).alias(
            "null_cust"
        ),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(zero)).alias(
            "neg_price"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*ORDER_STATUS_DOMAIN), 1).otherwise(
                zero
            )
        ).alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp_ntz"))
                | (F.col("o_orderdate") >= F.lit("2031-01-01").cast("timestamp_ntz")),
                1,
            ).otherwise(zero)
        ).alias("stale_date"),
    )
    orphans = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("orphans"))
    )
    row_rules = scan.select(
        F.expr(
            "stack(5,"
            " 'o_orderkey_unique', dup_keys,"
            " 'o_custkey_not_null', null_cust,"
            " 'o_totalprice_nonnegative', neg_price,"
            " 'o_orderstatus_in_domain', bad_status,"
            " 'o_orderdate_in_bounds', stale_date) AS (rule, n_violations)"
        )
    )
    fk_rule = orphans.select(
        F.lit("o_custkey_fk_customer").alias("rule"),
        F.col("orphans").alias("n_violations"),
    )
    return row_rules.unionByName(fk_rule).select(
        "rule",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
