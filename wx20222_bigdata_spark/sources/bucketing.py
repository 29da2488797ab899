"""Bucketed-table layout for co-located joins (SURVEY.md brief: "bucketing
for co-located joins").

Bucketing pre-shuffles a table ONCE at write time: rows are hash-assigned
to a fixed number of buckets on the join key and each bucket is a sorted
file set. Two tables bucketed on the same key with the same bucket count
join with NO exchange on either side — at 100 TB this converts every
recurring fact-fact join from a full shuffle into a local merge.

Trade-offs (documented, not hidden): bucket count is fixed at write time
(pick ≈ max expected parallelism), bucketed tables live in the catalog
(``saveAsTable``), and writers must avoid tiny-bucket explosion
(``repartition(n_buckets, key)`` before writing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table."""
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table)


def cojoin_bucketed(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — shuffle-free
    when bucket specs line up (asserted in tests/test_bucketing.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
