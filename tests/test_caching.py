"""Caching policy: prove cache() actually prevents recomputation (the
precompute-once contract) using an accumulator-counting UDF."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def test_cached_block_computes_once(spark):
    from wx20222_bigdata_spark.plans.caching import cached

    acc = spark.sparkContext.accumulator(0)

    def counting(x):
        acc.add(1)
        return x

    count_udf = F.udf(counting, LongType())
    expensive = spark.range(100).select(count_udf("id").alias("v"))

    with cached(expensive) as df:
        df.count()  # materializes the cache (all columns): 100 evaluations
        first = acc.value
        df.agg(F.sum("v")).collect()  # served from cache: no new evals
        second = acc.value
    assert first == 100
    assert second == 100, f"cache did not prevent recomputation ({second})"
    # after the block the cache is released: an action that NEEDS the UDF
    # column recomputes (count() would prune the deterministic UDF away)
    expensive.agg(F.sum("v")).collect()
    assert acc.value == 200


def test_materialize_cuts_lineage(spark):
    from wx20222_bigdata_spark.plans.caching import materialize

    df = spark.range(10)
    for _ in range(3):
        df = materialize(df.withColumn("id", F.col("id") + 1))
    # lineage is truncated: the plan no longer references the range source
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "Range" not in plan
    assert [r.id for r in df.orderBy("id").collect()] == list(range(3, 13))
