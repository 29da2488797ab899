"""Table catalog for the synthetic star schema (TESTDATA.md / FIXTURES.md §B).

The reference pipeline has no schema system — records are mutated dicts
(``data_helper.py:27-39`` in /root/reference). Here every table has an explicit
``StructType`` and production reads never rely on inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Declared schemas (mirrors FIXTURES.md §B; validated against parquet footers).
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet scans get column pruning + predicate pushdown
    from Catalyst for free — callers should filter/select eagerly and let the
    optimizer push it into the scan.

    ``events.ts`` has shipped in two physical layouts across testdata
    generations: parquet TIMESTAMP(NANOS) (unmapped by Spark — read as raw
    nanos via ``nanosAsLong`` and floor-convert to microseconds, the same
    truncation DuckDB applies) and plain TIMESTAMP(MICROS)
    (isAdjustedToUTC=false → TIMESTAMP_NTZ). Both normalize to a session-tz
    microsecond timestamp; the session tz is pinned UTC (session.py), so the
    NTZ→TZ cast is epoch-preserving and oracle comparisons agree either way.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):  # legacy nanos layout
            df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:  # micros layout: NTZ wall-clock == UTC epoch under UTC session tz
            df = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _validate_schema(name, df)
    return df


def _validate_schema(name: str, df: DataFrame) -> None:
    """Fail fast if a scan's schema drifts from the declared contract —
    the catalog boundary is where a regenerated/malformed fixture should
    break, not three operators downstream. Metadata-only (no data read).

    Note the declared truth matches parquet reality: the testdata's
    orderdate/shipdate columns are TIMESTAMP(isAdjustedToUTC=false) and
    read as TIMESTAMP_NTZ; only events.ts (converted from raw nanos) is a
    session-tz timestamp."""
    expected = [(f.name, f.dataType.simpleString()) for f in SCHEMAS[name].fields]
    actual = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    if expected != actual:
        raise ValueError(
            f"schema drift in table {name!r}: expected {expected}, got {actual}"
        )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can use ``spark.sql``."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
