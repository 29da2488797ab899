"""Cross-engine parity of the token-hash primitives (functions/hashing.py).

The oracle-checked dedup/LSH/fingerprint pipelines rest entirely on Spark
and DuckDB computing the SAME token hash. The oracle-parity suite proves
this end-to-end; this file proves it at the primitive level over an
adversarial token set (empty string, multibyte, whitespace, long), so a
hash regression is diagnosed here and not as a bucket-key mismatch three
operators downstream.
"""

from __future__ import annotations

import pytest

from wx20222_bigdata_spark.functions.hashing import (
    MOD,
    duck_char_hash,
    duck_md5_hash,
    spark_char_hash,
    spark_md5_hash,
)

TOKENS = [
    "",
    "a",
    "hello",
    "naïve café",
    "日本語テスト",
    "x" * 500,
    "tok-123",
    " leading",
    "trailing ",
    "two words",
]


def _spark_vals(spark, expr: str) -> list[int]:
    df = spark.createDataFrame([(t,) for t in TOKENS], "tok string")
    return [r.h for r in df.selectExpr(f"{expr} AS h").collect()]


def _duck_vals(duck, expr: str) -> list[int]:
    return [
        duck.execute(f"SELECT {expr} FROM (SELECT ? AS tok)", [t]).fetchone()[0]
        for t in TOKENS
    ]


@pytest.mark.parametrize(
    "spark_expr, duck_expr",
    [
        (spark_md5_hash("tok"), duck_md5_hash("tok")),
        (spark_md5_hash("tok", mod=MOD), duck_md5_hash("tok", mod=MOD)),
        (spark_char_hash("tok"), duck_char_hash("tok")),
    ],
    ids=["md5_60bit", "md5_mod", "char_hash"],
)
def test_hash_cross_engine_parity(spark, duck, spark_expr, duck_expr):
    assert _spark_vals(spark, spark_expr) == _duck_vals(duck, duck_expr)


def test_md5_hash_range(spark):
    """60-bit prefix: always non-negative, below 2**60; mod tier below MOD."""
    full = _spark_vals(spark, spark_md5_hash("tok"))
    assert all(0 <= v < 1 << 60 for v in full)
    reduced = _spark_vals(spark, spark_md5_hash("tok", mod=MOD))
    assert all(0 <= v < MOD for v in reduced)
