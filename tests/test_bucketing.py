"""Co-located bucketed join: the pay-the-shuffle-once layout must produce a
join plan with NO exchange on either bucketed side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from wx20222_bigdata_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from wx20222_bigdata_spark.catalog import load_table
    from wx20222_bigdata_spark.sources.bucketing import write_bucketed_table

    orders = load_table(spark, SF_ORACLE, "orders")
    customer = load_table(spark, SF_ORACLE, "customer")
    write_bucketed_table(orders, "orders_bkt", "o_custkey", n_buckets=8)
    write_bucketed_table(customer, "customer_bkt", "c_custkey", n_buckets=8)
    yield "orders_bkt", "customer_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    from wx20222_bigdata_spark.sources.bucketing import cojoin_bucketed

    lt, rt = bucketed_tables
    # forbid broadcast so the join must pick sort-merge; bucketing should
    # then remove both exchanges.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cojoin_bucketed(spark, lt, rt, "o_custkey", "c_custkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange hashpartitioning" not in plan, plan[:2500]
        # correctness: same result as the plain join
        expected = spark.table(lt).join(
            spark.table(rt),
            spark.table(lt)["o_custkey"] == spark.table(rt)["c_custkey"],
        )
        assert joined.count() == expected.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_q18_bucketed_twin_no_orderkey_exchange(spark):
    """r8 verdict item 4: the bucketed twins must (a) return exactly the
    registered seats' rows and (b) carry NO exchange on the order key —
    q18: neither for the lineitem HAVING aggregate nor the big⋈orders
    join; q9 (same layout, amortization proof): not for the fact-fact
    lineitem⋈orders join."""
    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.sources.bucketing import (
        layout_orderkey_buckets,
        q18_bucketed,
        q9_bucketed,
    )

    layout_orderkey_buckets(spark, SF_ORACLE, n_buckets=8, suffix="_t")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for twin_fn, seat_name in [
            (q18_bucketed, "q18_large_volume_customers"),
            (q9_bucketed, "q9_product_profit"),
        ]:
            twin = twin_fn(spark, SF_ORACLE, suffix="_t")
            plan = formatted_plan(twin)
            assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:3000]
            assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:3000]
            seat = all_queries()[seat_name](spark, SF_ORACLE)
            cols = twin.columns
            assert sorted(map(tuple, twin.collect())) == sorted(
                map(tuple, seat.select(cols).collect())
            ), seat_name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS lineitem_obkt_t")
        spark.sql("DROP TABLE IF EXISTS orders_obkt_t")


def test_bucket_pruning_scan(spark, bucketed_tables):
    # filtering on the bucket key scans only the matching bucket files.
    # The planner's auto-bucketed-scan heuristic turns bucketed reading off
    # for filter-only plans (no operator needs the distribution), so force
    # it on to observe the pruning.
    lt, _ = bucketed_tables
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(lt).filter(F.col("o_custkey") == 42)
        plan = formatted_plan(df)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:2500]
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
