#!/usr/bin/env python
"""CBO / statistics A/B for join ordering (round-5 verdict item 4).

q5/q3/q17 are hand-ordered in operators/relational.py because Catalyst
WITHOUT statistics will not reorder inner joins — the docstrings claim
it, this script measures it. It registers the TPC-H-shaped tables as
EXTERNAL catalog tables over the same parquet, computes full column
statistics (``ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS``),
turns on the cost-based optimizer (``spark.sql.cbo.enabled`` +
``joinReorder.enabled``), and runs the NAIVE spec-order SQL of Q5 under
four configurations:

  naive_no_cbo    — joins exactly in FROM-clause order, stats ignored
  naive_cbo       — same SQL, CBO + column stats + join reorder on
  hand_no_cbo     — the engine's hand-ordered q5 (early region prune)
  hand_cbo        — hand-ordered query with CBO enabled (regression
                    guard: stats must never make the good plan worse)

It prints one JSON blob with wall-clock medians, result checksums (all
four must agree), and two plan facts per variant: the join order
actually chosen (sequence of leaf relations) and whether the fact table
is ever shuffled for a join. The summary lives in EXPLAINS.md §CBO; the
plan-shape regression (hand order keeps its all-broadcast shape with
CBO on) is pinned in tests/test_plans.py.

Run: python tools/cbo_experiment.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import re
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TPCH_TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]

#: Q5 in naive spec order — FROM clause lists facts first, dims last, the
#: worst legal inner-join order. Catalyst without CBO joins left-to-right.
NAIVE_Q5 = """
SELECT n_name AS nation_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


_PREFIX_TO_TABLE = {
    "l_": "lineitem",
    "o_": "orders",
    "c_": "customer",
    "s_": "supplier",
    "n_": "nation",
    "r_": "region",
    "p_": "part",
}


#: Q3 in naive spec order — lineitem first again.
NAIVE_Q3 = """
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


#: Q9 in naive spec order — the join-heaviest shape in the registry
#: (lineitem x orders fact-fact join plus three dims). The FROM order
#: deliberately joins supplier/nation BEFORE the selective part LIKE
#: filter, so a left-to-right plan carries unfiltered rows through two
#: extra joins; a stats-driven reorder (or the hand-ordered engine query)
#: applies the part prune first.
NAIVE_Q9 = """
SELECT sn.n_name AS supp_nation,
       CAST(year(o.o_orderdate) AS INT) AS order_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(p.p_retailprice * 0.6 AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%e%'
GROUP BY sn.n_name, year(o.o_orderdate)
"""


def _join_order(plan: str) -> list[str]:
    """Leaf relation order as the executed plan scans them. Catalog scans
    carry the table name; path scans are identified by their column
    prefix (TPC-H columns are table-prefixed)."""
    out = []
    for m in re.finditer(r"FileScan parquet (\S*?)\[(\w+)", plan):
        name, first_col = m.groups()
        tbl = name.rsplit(".", 1)[-1] if name else None
        out.append(tbl or _PREFIX_TO_TABLE.get(first_col[:2], first_col))
    return out


def _noop_time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from wx20222_bigdata_spark.operators.relational import q5_local_supplier_volume
    from wx20222_bigdata_spark.session import get_spark

    spark = get_spark(
        app_name="cbo-experiment",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_ab")
    spark.sql("USE cbo_ab")
    for t in TPCH_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(
            f"CREATE TABLE {t} USING parquet LOCATION '{sf_dir}/{t}.parquet'"
        )
        # Spark 4.1 bug (documented in EXPLAINS.md §CBO): FilterEstimation
        # has no case for TimestampNTZType — a predicate over an NTZ column
        # WITH column stats crashes the optimizer with a MatchError
        # (FilterEstimation.scala:281). The TPC-H date columns read back as
        # NTZ here, so stats are computed for every column EXCEPT NTZ ones;
        # missing-stats columns fall back to default selectivity, which is
        # all the reorderer needs from a date filter anyway.
        cols = [
            f.name
            for f in spark.table(t).schema.fields
            if f.dataType.simpleString() != "timestamp_ntz"
        ]
        spark.sql(
            f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR COLUMNS {', '.join(cols)}"
        )

    def set_cbo(on: bool) -> None:
        v = "true" if on else "false"
        spark.conf.set("spark.sql.cbo.enabled", v)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", v)

    results: dict = {}
    checksums = {}
    for label, cbo in [("naive_no_cbo", False), ("naive_cbo", True)]:
        set_cbo(cbo)
        df = spark.sql(NAIVE_Q5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        times = [_noop_time(spark.sql(NAIVE_Q5)) for _ in range(5)]
        checksums[label] = sorted(
            (r["nation_name"], round(r["revenue"], 2)) for r in df.collect()
        )
        results[label] = {
            "median_sec": round(statistics.median(times), 3),
            "join_order": _join_order(plan),
            "fact_shuffled_for_join": "Exchange hashpartitioning(l_orderkey" in plan
            or "Exchange hashpartitioning(o_orderkey" in plan,
        }
    # Q3: does the reorderer pull the selective customer dim below the
    # fact-fact join when the SQL lists lineitem first?
    q3_checks = {}
    for label, cbo in [("q3_naive_no_cbo", False), ("q3_naive_cbo", True)]:
        set_cbo(cbo)
        df = spark.sql(NAIVE_Q3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        times = [_noop_time(spark.sql(NAIVE_Q3)) for _ in range(5)]
        q3_checks[label] = [tuple(r) for r in df.collect()]
        results[label] = {
            "median_sec": round(statistics.median(times), 3),
            "join_order": _join_order(plan),
        }
    assert q3_checks["q3_naive_no_cbo"] == q3_checks["q3_naive_cbo"]
    # Q9 (r6 verdict item 6): the join-heaviest registry shape — does the
    # stats-driven reorder reproduce the hand-written order (part prune
    # before the wide joins, dims broadcast)?
    from wx20222_bigdata_spark.operators.relational import q9_product_profit

    q9_checks = {}
    for label, cbo, fn in [
        # explicit booleans: "..._no_cbo".endswith("_cbo") is True, so a
        # suffix test would silently run every variant with CBO on
        ("q9_naive_no_cbo", False, lambda: spark.sql(NAIVE_Q9)),
        ("q9_naive_cbo", True, lambda: spark.sql(NAIVE_Q9)),
        ("q9_hand_no_cbo", False, lambda: q9_product_profit(spark, sf_dir)),
        ("q9_hand_cbo", True, lambda: q9_product_profit(spark, sf_dir)),
    ]:
        set_cbo(cbo)
        df = fn()
        plan = df._jdf.queryExecution().executedPlan().toString()
        times = [_noop_time(fn()) for _ in range(5)]
        q9_checks[label] = sorted(
            (r["supp_nation"], r["order_year"], round(r["profit"], 2))
            for r in df.collect()
        )
        results[label] = {
            "median_sec": round(statistics.median(times), 3),
            "join_order": _join_order(plan),
            "n_broadcast_joins": plan.count("BroadcastHashJoin"),
            "n_shuffle_joins": plan.count("SortMergeJoin")
            + plan.count("ShuffledHashJoin"),
        }
    q9_vals = list(q9_checks.values())
    assert all(v == q9_vals[0] for v in q9_vals), "a q9 variant changed the result!"
    for label, cbo in [("hand_no_cbo", False), ("hand_cbo", True)]:
        set_cbo(cbo)
        df = q5_local_supplier_volume(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        times = [
            _noop_time(q5_local_supplier_volume(spark, sf_dir)) for _ in range(5)
        ]
        checksums[label] = sorted(
            (r["nation_name"], round(r["revenue"], 2)) for r in df.collect()
        )
        results[label] = {
            "median_sec": round(statistics.median(times), 3),
            "join_order": _join_order(plan),
            "fact_shuffled_for_join": "Exchange hashpartitioning(l_orderkey" in plan
            or "Exchange hashpartitioning(o_orderkey" in plan,
        }
    set_cbo(False)

    vals = list(checksums.values())
    assert all(v == vals[0] for v in vals), "a variant changed the result!"
    results["results_identical"] = True
    print(json.dumps(results, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
