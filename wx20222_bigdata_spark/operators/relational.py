"""Relational core — scans, joins, unions, sorts, limits (SURVEY.md §2.1-2.3,
§2.6-2.7).

Scale notes baked into each query:
- small dimensions are joined with an explicit ``broadcast()`` hint (J2 —
  the 200-row category dict of ``category_id_map.py:29-30``); Catalyst would
  auto-broadcast under the threshold, the hint documents intent;
- fact-fact joins shuffle on the join key; filters are applied *before* the
  join so pushdown shrinks the shuffle;
- money aggregates go through DECIMAL so the result is exact and
  order-independent (safe under any partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


@query(
    "a4_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def a4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the A4 scalar-mean family
    (``main.py:137``) generalized to grouped sums/averages. The shipdate
    filter is pushed into the parquet scan; the groupBy has map-side partial
    aggregation, so the shuffle carries |groups| rows per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(dec("l_discount")).cast("double") / F.count("*"), 6
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "j2_broadcast_dim_join",
    oracle="""
SELECT r.r_name AS region_name, COUNT(*) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def j2_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 small-dimension equi-join, the Spark form of the reference's
    200-entry category-dict lookup (``category_id_map.py:29-30,39-46``):
    explicit broadcast hash join — zero shuffle of the fact side."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count("*").alias("n_nations"))
    )


@query(
    "j3_inner_join_revenue",
    oracle="""
SELECT n.n_name AS nation_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
""",
)
def j3_inner_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 hash inner join (``evaluate.py:12-22``'s pred⋈truth) as
    orders⋈customer⋈nation revenue rollup. The status filter is applied
    before the join (pushdown shrinks the shuffle); nation is broadcast."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "j3_anti_join_integrity",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def j3_anti_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/P6 anti-join integrity check (``evaluate.py:16-17``'s 'unknown vid'
    guard): customers with no orders via LEFT ANTI — the dangling-key set."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j3_semi_join",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi complement of the anti check: customers having at least one
    urgent order. Semi joins never duplicate the left side — the idiomatic
    EXISTS plan, cheaper than join+distinct at scale."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@query(
    "j1_positional_zip_join",
    oracle="""
WITH d AS (
  SELECT doc_id, n_chars, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM documents
),
e AS (
  SELECT vec_id, label, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM embeddings
)
SELECT d.rn AS pos, d.doc_id, e.vec_id, d.n_chars, e.label
FROM d JOIN e ON d.rn = e.rn
""",
)
def j1_positional_zip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 positional (zip) join — the reference aligns annotations[i] with
    visual_feats[i] by list index (``data_helper.py:29-30``). Spark rows are
    unordered, so the position must be *synthesized* from an explicit sort
    key over a documented ordering and joined on. This is the engine's
    contract for zip semantics: never rely on physical order.

    The position is built with :func:`~wx20222_bigdata_spark.operators.skew.
    zip_with_global_index` (range-partition + per-partition offsets) — the
    declared query carries NO global single-partition window, so the same
    plan survives a 1000-executor scale-up. The oracle stays the semantic
    contract (``row_number() OVER (ORDER BY ...)``); equality of the two is
    exactly what makes the scalable index a physical-only substitution."""
    from wx20222_bigdata_spark.operators.skew import zip_with_global_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    d = zip_with_global_index(docs, "doc_id")
    e = zip_with_global_index(emb, "vec_id").withColumnRenamed("zip_index", "zi")
    return d.join(e, d.zip_index == e.zi).select(
        (F.col("zip_index") + 1).cast("bigint").alias("pos"),
        "doc_id",
        "vec_id",
        "n_chars",
        "label",
    )


@query(
    "j4_file_key_join",
    oracle="""
WITH paths AS (
  SELECT CONCAT('/features/', CAST(doc_id AS VARCHAR), '.npy') AS path, n_chars
  FROM documents
)
SELECT CAST(regexp_extract(path, '([0-9]+)\\.npy', 1) AS BIGINT) AS file_key,
       e.label,
       p.n_chars
FROM paths p
JOIN embeddings e ON CAST(regexp_extract(p.path, '([0-9]+)\\.npy', 1) AS BIGINT) = e.vec_id
""",
)
def j4_file_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 file-key join: the reference looks features up by path
    ``{dir}/{id}.npy`` (``split_pretrain_data.py:31-33``). Spark form:
    derive the key from the file path (in production
    ``input_file_name()``; here a synthesized path column) with
    ``regexp_extract`` and equi-join."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("/features/"), F.col("doc_id").cast("string"), F.lit(".npy")).alias(
            "path"
        ),
        "n_chars",
    )
    emb = load_table(spark, sf_dir, "embeddings")
    key = F.regexp_extract(F.col("path"), r"([0-9]+)\.npy", 1).cast("bigint")
    return (
        docs.withColumn("file_key", key)
        .join(emb, F.col("file_key") == emb.vec_id)
        .select("file_key", "label", "n_chars")
    )


@query(
    "u1_union_all",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM (
  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice >= 150000
  UNION ALL
  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice < 150000
)
GROUP BY o_orderstatus
""",
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union-all by name (``np.concatenate`` of annotation lists,
    ``pretrained_model.py:295-297``): split orders on a predicate, reunite
    with ``unionByName``, verify nothing lost via the grouped totals."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") >= 150000).select(
        "o_orderstatus", "o_totalprice"
    )
    lo = orders.filter(F.col("o_totalprice") < 150000).select(
        "o_orderstatus", "o_totalprice"
    )
    return (
        hi.unionByName(lo)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "set_intersect_except",
    oracle="""
SELECT n_nationkey AS nationkey, 'both' AS side
FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT n_nationkey AS nationkey, 'customer_only' AS side
FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier)
""",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops beyond the reference's anti-join (SURVEY §2.7 'absent' row):
    nations with both customers and suppliers (INTERSECT) and
    customer-only nations (EXCEPT)."""
    cust_nations = (
        load_table(spark, sf_dir, "customer").select(F.col("c_nationkey")).distinct()
    )
    supp_nations = (
        load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey")).distinct()
    )
    both = cust_nations.intersect(
        supp_nations.withColumnRenamed("s_nationkey", "c_nationkey")
    ).select(F.col("c_nationkey").alias("nationkey"), F.lit("both").alias("side"))
    only = cust_nations.exceptAll(
        supp_nations.withColumnRenamed("s_nationkey", "c_nationkey")
    ).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer_only").alias("side")
    )
    return both.unionByName(only)


@query(
    "o4_top_k_orders",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def o4_top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O8 global sort + limit. Spark executes this as TakeOrderedAndProject
    — a per-partition top-k then a driver merge, never a full global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).limit(25)


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join: region-filtered star join with the
    'local supplier' same-nation constraint. The region→nation dim
    chain collapses to a broadcast 'asian nations' table joined to
    customer FIRST, so non-region customers die before the fact joins —
    every downstream shuffle (the c⋈o join output, the o⋈li output
    feeding the supplier join) shrinks by the region selectivity
    instead of carrying rows the final dim join would discard (Catalyst
    does not reorder inner joins without CBO, so the early prune must
    be written explicitly; measured 1.54 → 1.24 s at sf0.1). The
    fact-fact orders⋈lineitem shuffle carries only date-filtered rows;
    the supplier join adds a non-equi conjunct (same-nation) on top of
    the equi key — Catalyst keeps the equi part as the hash key and
    applies the rest as a post-filter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c_asia = c.join(F.broadcast(asian), F.col("n_nationkey") == c.c_nationkey)
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    return (
        c_asia.join(o, o.o_custkey == F.col("c_custkey"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey)
            & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey,
         ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
  FROM lineitem
  GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < 0.5 * a.avg_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated-aggregate filter: lines under half the
    part's average quantity. Decorrelation order matters: the brand
    semi-join (AQE-governed — the one-brand part slice is SF-scaled)
    runs FIRST, so the per-part average is computed only
    over the surviving parts' lines (identical value — a part's average
    is over all ITS lines, which the part-key join preserves — but the
    aggregate's input shrinks by the brand selectivity, ~the number of
    brands). The average then comes from a window over l_partkey on the
    filtered lines instead of a groupBy joined back: one exchange
    replaces an aggregate plus a join, and the partition is bounded by
    lines-per-part (~30 in TPC-H shape), so no skew exposure. Measured
    1.16 → 0.51 s at sf0.1, 1.18 → 0.79 s at sf1 (noop sink),
    bit-exact. avg compared, never output: the inequality predicate is
    robust to last-ulp differences the way an emitted float would not
    be."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # one-brand slice of part is still SF-scaled (~1/N of the corpus's
    # parts) → AQE-governed, not hint-forced (q9 rule)
    li_b = li.join(p.select("p_partkey"), p.p_partkey == li.l_partkey)
    w = Window.partitionBy("l_partkey")
    # decimal-exact sum / count, rounded: the filter compares against this
    # value, so it must be bit-identical cross-engine or boundary rows flip.
    avg_qty = F.round(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("*").over(w),
        6,
    )
    return (
        li_b.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join + grouped revenue + top-k: the composite
    shape of the reference's scoring pipeline (join, aggregate, rank). All
    three filters sit below the joins (scan-level pushdown); the
    customer side is small after its segment filter, so AQE converts that
    join to broadcast at runtime."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "sql_frontdoor_topn_customers",
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY lifetime_value DESC, c.c_custkey ASC
LIMIT 15
""",
)
def sql_frontdoor_topn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: tables registered as views
    (``catalog.register_views``) and the query expressed as plain
    ``spark.sql`` — same Catalyst plan as the DataFrame API, proving the
    two surfaces are interchangeable."""
    from wx20222_bigdata_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey,
               c.c_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY lifetime_value DESC, c.c_custkey ASC
        LIMIT 15
        """
    )


@query(
    "j5_outer_join_family",
    oracle="""
SELECT n.n_name AS nation_name,
       CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(s.s_suppkey) AS BIGINT) AS n_suppliers,
       (COUNT(c.c_custkey) = 0) AS customer_desert,
       (COUNT(s.s_suppkey) = 0) AS supplier_desert
FROM nation n
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def j5_outer_join_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join coverage: LEFT joins preserving every nation, with
    COUNT(col)'s null-skipping turning unmatched sides into zero counts —
    the dimension-completeness report shape (every nation appears even
    with no customers/suppliers)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.count("s_suppkey").alias("n_suppliers"),
            (F.count("c_custkey") == 0).alias("customer_desert"),
            (F.count("s_suppkey") == 0).alias("supplier_desert"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       c.c_acctbal
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top 20 customers by revenue
    lost to returns in a half-year window. The return-flag and date
    predicates push into both fact scans before the orders⋈lineitem
    shuffle; nation broadcasts; the top-k compiles to
    TakeOrderedAndProject (per-partition heads merged on the driver —
    never a global sort). Revenue is decimal-exact so the top-20 cutoff
    is deterministic; c_custkey breaks revenue ties identically on both
    engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            "c_acctbal",
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "nation_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, big.total_qty
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume-order report: orders whose total
    quantity exceeds a threshold, with their customers. The HAVING
    aggregate runs FIRST — the fact table collapses to qualifying order
    keys (partial aggregation map-side) before any join touches orders or
    customer, so join input is the small filtered set, not the fact
    table. Quantity sums are decimal-exact: the >150 cutoff admits the
    same orders on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty_dec")
        )
        .filter(F.col("_qty_dec") > 150)
        .select("l_orderkey", F.col("_qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


@query(
    "q4_priority_check",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
""",
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS aggregation: orders in a date window having
    at least one returned line, counted by priority. The EXISTS compiles
    to a LEFT SEMI shuffle-hash join on orderkey — the filtered lineitem
    side carries only ('R') rows, and the aggregate runs on the order
    grain, never the line grain."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped single-scan aggregate: every predicate (date range,
    discount band, quantity cap) pushes into the parquet scan, the sum is
    decimal-exact, and the whole query is one narrow stage plus the final
    one-row reduce — the canonical pushdown showcase."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q12_priority_shipping",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped conditional pivot aggregate: lines shipped in a
    window, split per linestatus into high/low order-priority counts.
    The CASE pivot folds into the partial aggregate — one shuffle on the
    join key, one on the (tiny) group key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
    )


@query(
    "q14_promo_effect",
    oracle="""
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo revenue share: conditional decimal sums over
    a date-windowed part join, emitted as a rounded percentage. Both sums
    are decimal-exact; only the final ratio is floating, rounded to 6.
    part is SF-scaled, so the join strategy is AQE-governed (no forced
    broadcast — the q9 rule, NOTES_r7 item 6): AQE converts to broadcast
    at small SF and keeps a shuffled hash join at scale. Only the two
    part columns the query reads are projected into the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped cross-nation volume: revenue flowing between a
    fixed nation pair, per direction per ship year. The two nation dims
    broadcast twice under different aliases; the pair disjunction prunes
    after the dim joins; year() is the only date function, emitted as
    INT so no timestamp ever reaches the output."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("volume")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped argmax join: per-supplier windowed revenue, keep
    the supplier(s) achieving the maximum. The scalar MAX is a one-row
    aggregate joined back by *equality* on the decimal-exact revenue —
    an equi broadcast join, not a nested loop (the one-row side keeps
    its hint: provably bounded); ties (multiple max suppliers) surface
    as multiple rows, exactly as in the spec. supplier is SF-scaled so
    its join is AQE-governed (q9 rule) — after the max-filter the rev
    side is ~1 row and AQE broadcasts THAT side at runtime."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_rev)
        .join(s.select("s_suppkey", "s_name"), s.s_suppkey == rev.l_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand,
       CAST(p.p_size // 10 AS BIGINT) AS size_band,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p.p_brand, p.p_size // 10
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped distinct-supplier census: suppliers per
    (brand, size band) over shipped lines, excluding negative-balance
    suppliers via NOT IN — an anti join against the filtered supplier
    scan. COUNT(DISTINCT) expands to the two-level aggregate; the anti
    join runs before the expansion so excluded rows never shuffle.
    Both the excluded-supplier set and part are SF-scaled, so both join
    strategies are AQE-governed (q9 rule, NOTES_r7 item 6) — AQE
    broadcasts them at small SF and falls back to shuffled hash joins
    when they outgrow the threshold; a forced hint would OOM the
    executors at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", F.expr("p_size div 10").alias("size_band"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_discounted_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped OR-of-ANDs predicate join: three brand/size/
    quantity envelopes unioned by OR over a part join. The disjunction
    can't push into either scan whole, but its common support (the join
    itself) stays a single hash join with the residual OR applied
    post-join — one fact-table pass. part is SF-scaled, so the strategy
    is AQE-governed (q9 rule): broadcast at small SF, shuffled hash
    join at scale; only the three part columns the envelopes read are
    projected into the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(p, p.p_partkey == li.l_partkey)
    env = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    return j.filter(env).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q21_sole_supplier_orders",
    oracle="""
WITH sole AS (
  SELECT l1.l_suppkey, l1.l_orderkey
  FROM lineitem l1
  JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
  WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
)
SELECT s.s_name, COUNT(DISTINCT sole.l_orderkey) AS numwait
FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
""",
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped semi/anti chain: for finished orders, lines whose
    supplier is the *only* supplier on the order (the NOT EXISTS self
    anti-join on orderkey with a supplier-inequality residual), counted
    per supplier, top 10. The anti join hashes on the equi key
    (orderkey) and applies the inequality as residual; the top-k is
    TakeOrderedAndProject. supplier is SF-scaled, so its join is
    AQE-governed (q9 rule) rather than hint-forced."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.select(
        F.col("l_suppkey").alias("k1"), F.col("l_orderkey").alias("ok1")
    )
    l2 = li.select(
        F.col("l_suppkey").alias("k2"), F.col("l_orderkey").alias("ok2")
    )
    sole = (
        l1.join(o, o.o_orderkey == l1.ok1, "left_semi")
        .join(
            l2,
            (F.col("ok2") == F.col("ok1")) & (F.col("k2") != F.col("k1")),
            "left_anti",
        )
    )
    return (
        sole.join(s, s.s_suppkey == sole.k1)
        .groupBy("s_name")
        .agg(F.countDistinct("ok1").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
WITH pos_avg AS (
  SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
CROSS JOIN pos_avg
WHERE c.c_acctbal > pos_avg.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c.c_nationkey
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped dormant-customer census: customers above the
    positive-balance average with no *recent* orders (none since
    1998-01-01 — at this density every customer has some order, so the
    windowed anti join is what keeps the result non-trivial), counted
    per nation.
    The scalar average is a one-row broadcast (benign constant-size
    nested loop, same pattern as the BM25 corpus stats); the NOT EXISTS
    is a shuffle anti join on custkey. avg is compared, never emitted,
    and rounded identically on both engines so the boundary can't
    flip."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("1998-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    pos_avg = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "q8_market_share",
    oracle="""
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
)
SELECT order_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share,
       COUNT(*) AS n_lines
FROM base
GROUP BY order_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: among purchases by ASIA-region
    customers, the fraction supplied by NATION_5, per order year. Both
    the numerator and denominator are decimal-exact conditional sums of
    the same joined stream — one aggregate, the ratio rounded to 6. All
    dims broadcast; the only wide shuffles are orders⋈lineitem and the
    year aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    base = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("cn_reg"))
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            rev.alias("rev"),
            "supp_nation",
        )
    )
    return base.groupBy("order_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("rev")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("mkt_share"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT sn.n_name AS supp_nation,
       CAST(year(o.o_orderdate) AS INT) AS order_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(p.p_retailprice * 0.6 AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%e%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
GROUP BY sn.n_name, year(o.o_orderdate)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit rollup: revenue minus synthesized supply
    cost (0.6 × retail price — the schema has no partsupp, so the cost
    basis derives from part; same join topology as the spec), per
    supplier nation per order year, over name-filtered parts. The cost
    product is decimal×decimal so the profit sum stays exact; the LIKE
    filter prunes part before any join.

    Join hints (r7 scaling-curve audit): nation is broadcast (fixed 25
    rows at every SF); part is deliberately NOT hinted — it scales with
    the corpus, and at sf10 a forced broadcast of the 1.37M filtered
    part rows measured 23.7–27.4 s vs 8.9 s letting AQE decide (AQE
    broadcasts part at fixture SFs and switches the part join to
    sort-merge once it outgrows the threshold — exactly the 100 TB
    behavior; a hardcoded hint would OOM the build side there)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
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


@query(
    "q13_customer_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped count-of-counts histogram: orders per customer
    (left join keeps zero-order customers; the priority predicate lives
    in the JOIN condition, not a WHERE — the classic outer-join trap),
    then the distribution of those counts. Two keyed aggregates; the
    second groups on a tiny domain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q20_part_promotion_suppliers",
    oracle="""
WITH hot_parts AS (
  SELECT l_partkey, l_suppkey
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM hot_parts hp
  JOIN part p ON p.p_partkey = hp.l_partkey AND p.p_brand = 'Brand#2'
  WHERE hp.l_suppkey = s.s_suppkey
)
""",
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped nested-semi chain: suppliers who moved more than
    a threshold quantity of a target brand's parts in a year. The inner
    HAVING aggregate collapses lineitem to (part, supplier) totals
    FIRST, the brand filter joins against it (AQE-governed — the
    one-brand part slice is SF-scaled, q9 rule), and the outer EXISTS
    is a semi join — the fact table is aggregated before any join
    touches it, so no supplier row ever fans out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    s = load_table(spark, sf_dir, "supplier")
    hot = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 30)
    )
    qualified = hot.join(p.select("p_partkey"), p.p_partkey == hot.l_partkey).select(
        "l_suppkey"
    )
    return s.join(
        qualified, s.s_suppkey == qualified.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "u3_bag_set_ops",
    oracle="""
SELECT o_custkey AS custkey, 'excess_orders' AS side, COUNT(*) AS n
FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY o_custkey
UNION ALL
SELECT o_custkey AS custkey, 'matched_pairs' AS side, COUNT(*) AS n
FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY o_custkey
""",
)
def u3_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 bag-semantics set ops (``exceptAll`` / ``intersectAll``) —
    multiplicity-preserving EXCEPT/INTERSECT, the §2.7 surface the
    DISTINCT forms (set_intersect_except) cannot express: per customer,
    how many open orders exceed their finished orders (excess) and how
    many pair off (matched). Spark plans both as a single aggregate
    computing per-key multiplicities plus a generate — one shuffle each,
    no join. The output aggregates to (customer, side, count) so the
    multiset semantics are value-checked, not just row counts."""
    orders = load_table(spark, sf_dir, "orders")
    open_o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_o = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    excess = (
        open_o.exceptAll(fin_o)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.lit("excess_orders").alias("side"),
            "n",
        )
    )
    matched = (
        open_o.intersectAll(fin_o)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.lit("matched_pairs").alias("side"),
            "n",
        )
    )
    return excess.unionByName(matched)


#: Deterministic synthesized partsupp (the one TPC-H table the driver's
#: testdata lacks): 4 suppliers per part, modular key spread, integer-cent
#: costs — identical CTE text on both engines, so q2/q11 are fully
#: oracle-checked. At a real deployment this is the ingested table; the
#: synthesis stands in for the scan only.
PARTSUPP_DUCK = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + j * 13) % 100 AS ps_suppkey,
         ((p_partkey * 31 + ((p_partkey * 7 + j * 13) % 100) * 17) % 10000) / 100.0
           AS ps_supplycost,
         (p_partkey + (p_partkey * 7 + j * 13) % 100) % 1000 + 1 AS ps_availqty
  FROM part, (SELECT unnest(range(0, 4)) AS j)
)"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    j = spark.range(4).select(F.col("id").alias("j"))
    ps = part.select("p_partkey").crossJoin(F.broadcast(j))
    suppkey = (F.col("p_partkey") * 7 + F.col("j") * 13) % 100
    return ps.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.alias("ps_suppkey"),
        (((F.col("p_partkey") * 31 + suppkey * 17) % 10000) / 100.0).alias(
            "ps_supplycost"
        ),
        ((F.col("p_partkey") + suppkey) % 1000 + 1).alias("ps_availqty"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
WITH {PARTSUPP_DUCK[1:]},
europe_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
),
costs AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost
  FROM partsupp JOIN europe_supp ON s_suppkey = ps_suppkey
),
mins AS (
  SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
  FROM costs GROUP BY ps_partkey
)
SELECT p.p_partkey, p.p_brand, es.s_name,
       ROUND(es.s_acctbal, 2) AS s_acctbal,
       ROUND(c.ps_supplycost, 2) AS supplycost
FROM part p
JOIN mins m ON m.ps_partkey = p.p_partkey
JOIN costs c ON c.ps_partkey = p.p_partkey AND c.ps_supplycost = m.min_cost
JOIN europe_supp es ON es.s_suppkey = c.ps_suppkey
WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
ORDER BY s_acctbal DESC, p.p_partkey, es.s_name
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 topology (minimum-cost supplier): for each qualifying
    part, the EUROPE supplier offering the minimum supply cost — the
    classic correlated-subquery-decorrelated-to-a-join shape: a grouped
    MIN over the region-filtered cost table re-joined on (part,
    min_cost). With q2/q11 over the synthesized partsupp, every TPC-H
    query topology the schema admits is now declared (q1 ≙ a4,
    q3-q10/q12-q22 registered; q2/q11 were blocked only by the missing
    table). The fixed-cardinality dims (nation/region) keep broadcast
    hints; the one-region supplier slice is SF-scaled so its join into
    partsupp is AQE-governed (q9 rule). The only fact-scale shuffles
    are the cost groupBy and its re-join, both keyed on ps_partkey
    (co-partitioned). Ties on min cost are
    real and kept (both suppliers emitted — the TPC-H contract), so
    ordering is made total by (acctbal desc, partkey, s_name)."""
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    europe_supp = (
        supplier.join(
            F.broadcast(nation),
            nation.n_nationkey == supplier.s_nationkey,
        )
        .join(F.broadcast(region), region.r_regionkey == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = _partsupp(spark, sf_dir).join(
        europe_supp, F.col("s_suppkey") == F.col("ps_suppkey")
    )
    mins = costs.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    ).withColumnRenamed("ps_partkey", "mk")
    cost_rows = costs.select(
        F.col("ps_partkey").alias("ck"), "ps_supplycost", "s_name", "s_acctbal"
    )
    return (
        part.filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .join(mins, mins.mk == part.p_partkey)
        .join(cost_rows, F.col("ck") == F.col("p_partkey"))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle=f"""
WITH {PARTSUPP_DUCK[1:]},
vals AS (
  SELECT ps_partkey,
         CAST(SUM(((ps_partkey * 31 + ps_suppkey * 17) % 10000) * ps_availqty)
              AS BIGINT) AS value_cents
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_0', 'NATION_5', 'NATION_10')
  GROUP BY ps_partkey
),
tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM vals)
SELECT ps_partkey, value_cents
FROM vals CROSS JOIN tot
WHERE value_cents * 10000 > total_cents
ORDER BY value_cents DESC, ps_partkey
LIMIT 100
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 topology (important stock identification): per-part
    inventory value within a nation group, kept only where it exceeds a
    fraction (1/10000) of the GLOBAL value — the scalar-subquery-
    threshold shape: a one-row total crossJoined into the per-part
    aggregate (the documented benign constant-size pattern; Spark plans
    it as a broadcast). All value arithmetic in integer cents
    (supplycost × 100 is exact by construction of the synthesized
    partsupp), so the threshold comparison is integer — no float
    boundary. The two aggregates share the same shuffle key
    (ps_partkey → none), and the top-k is TakeOrderedAndProject."""
    # supplier is SF-scaled → AQE-governed join (q9 rule); nation is the
    # fixed-cardinality dim and keeps its broadcast hint.
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    ps = _partsupp(spark, sf_dir)
    vals = (
        ps.join(supplier, supplier.s_suppkey == ps.ps_suppkey)
        .join(F.broadcast(nation), nation.n_nationkey == F.col("s_nationkey"))
        .filter(F.col("n_name").isin("NATION_0", "NATION_5", "NATION_10"))
        .groupBy("ps_partkey")
        .agg(
            # exact integer cents re-derived from the synthesis formula —
            # CAST(double*100 AS BIGINT) truncates in Spark but rounds in
            # DuckDB, so the float is never the source of the integer
            F.sum(
                ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 10000)
                * F.col("ps_availqty")
            )
            .cast("bigint")
            .alias("value_cents")
        )
    )
    tot = vals.agg(F.sum("value_cents").cast("bigint").alias("total_cents"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
        .limit(100)
    )
