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


def layout_orderkey_buckets(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 32,
    suffix: str = "",
) -> tuple[str, str]:
    """One-time layout for the recurring orderkey fact-fact joins (q9/q18
    are the steepest rows of SCALING_CURVE.json — ×5.3 / ×4.9 per ×10
    step, both dominated by the lineitem⋈orders exchange): write lineitem
    and orders bucketed + sorted on the order key. Pay the shuffle once at
    ingest; every subsequent orderkey join and lineitem-per-order
    aggregate is exchange-free. The reference stages the same idea as its
    22-shard pre-split (``split_pretrain_data.py:28-35``) — layout chosen
    for the downstream access pattern."""
    from wx20222_bigdata_spark.catalog import load_table

    li_t, o_t = f"lineitem_obkt{suffix}", f"orders_obkt{suffix}"
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem"), li_t, "l_orderkey", n_buckets
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "orders"), o_t, "o_orderkey", n_buckets
    )
    return li_t, o_t


def q18_bucketed(spark: SparkSession, sf_dir: str, suffix: str = "") -> DataFrame:
    """q18_large_volume_customers over the bucketed orderkey layout
    (library twin of operators/relational.py::q18_large_volume_customers
    — column-identical output). With lineitem bucketed on l_orderkey the
    HAVING aggregate needs NO exchange (partial+final collapse into one
    in-bucket aggregate), and with orders bucketed on o_orderkey the
    big⋈orders join needs NO exchange on either side — the only shuffle
    left in the whole query is the customer join, which AQE broadcasts.
    Plan-asserted in tests/test_bucketing.py; measured vs the shuffled
    registered seat in tools/bucketed_join_ab.py (SCALE.md r8)."""
    from pyspark.sql import functions as F

    from wx20222_bigdata_spark.catalog import load_table

    li = spark.table(f"lineitem_obkt{suffix}")
    o = spark.table(f"orders_obkt{suffix}")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 150)
        .select("l_orderkey", F.col("_qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


def q9_bucketed(spark: SparkSession, sf_dir: str, suffix: str = "") -> DataFrame:
    """q9_product_profit over the SAME orderkey layout q18_bucketed uses
    (column-identical output to the registered seat) — the amortization
    proof: one layout, every recurring orderkey join paid for. The
    lineitem⋈orders fact-fact join (the ×5.3-per-×10-step term of q9's
    scaling curve) runs with NO exchange on either side; the part and
    supplier joins behave exactly as in the registered seat (AQE-governed
    — they key on partkey/suppkey, which no single layout can co-locate
    simultaneously with orderkey; at a real deployment the second layout
    axis would be a partsupp-side bucket, the classic two-table-layout
    trade)."""
    from pyspark.sql import functions as F

    from wx20222_bigdata_spark.catalog import load_table

    l = spark.table(f"lineitem_obkt{suffix}")
    o = spark.table(f"orders_obkt{suffix}")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    s = load_table(spark, sf_dir, "supplier")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    profit_term = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "l_quantity"
    ) * (F.col("p_retailprice") * 0.6).cast("decimal(18,2)")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(p, p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.sum(profit_term).cast("double").alias("profit"))
    )
