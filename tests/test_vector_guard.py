"""dot_fixed NULL/error-semantics laws (r9 ADVICE #1).

The advisor flagged that a malformed embedding inside the pair loops
would yield a NULL cosine that silently drops out of ``F.max`` — these
laws pin what ACTUALLY happens at each boundary so it is a documented
contract rather than a surprise:

- a SHORT array fails loudly under ANSI mode (the Spark 4 default and
  what the driver's plain session runs) — not latent at all;
- a NULL ELEMENT in a full-length array is the genuinely latent case:
  NULL dot, silently dropped from max aggregates, in both ANSI modes;
- ``dot_fixed_strict`` raises a labeled error on short arrays and
  agrees bit-for-bit with the fast path on well-formed rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wx20222_bigdata_spark.functions.vector import dot_fixed, dot_fixed_strict

DIM = 4


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def test_dot_fixed_short_array_fails_loudly_under_ansi(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = _frame(spark, [(1, [1.0, 2.0], [1.0, 1.0, 1.0, 1.0])])
    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
        df.select(dot_fixed("a", "b", DIM).alias("d")).collect()


def test_dot_fixed_null_element_yields_null_and_drops_from_max(spark):
    df = _frame(
        spark,
        [
            (1, [1.0, 2.0, 3.0, 4.0], [1.0, 1.0, 1.0, 1.0]),  # dot = 10
            (2, [1.0, None, 3.0, 4.0], [1.0, 1.0, 1.0, 1.0]),  # NULL elem
        ],
    )
    got = df.select(dot_fixed("a", "b", DIM).alias("d")).collect()
    assert {r.d for r in got} == {10.0, None}
    # the NULL vanishes from a max aggregate — the kept/unique trap the
    # advisor flagged; validate elements at ingest if that matters
    mx = df.agg(F.max(dot_fixed("a", "b", DIM)).alias("m")).first()
    assert mx.m == 10.0


def test_dot_fixed_strict_agrees_on_well_formed_rows(spark):
    df = _frame(
        spark,
        [
            (1, [1.0, 2.0, 3.0, 4.0], [4.0, 3.0, 2.0, 1.0]),
            (2, [0.5, 0.0, -1.0, 2.0], [1.0, 1.0, 1.0, 1.0]),
        ],
    )
    both = df.select(
        dot_fixed("a", "b", DIM).alias("fast"),
        dot_fixed_strict("a", "b", DIM).alias("strict"),
    ).collect()
    for r in both:
        assert r.fast == r.strict


def test_dot_fixed_strict_raises_labeled_on_short_array(spark):
    df = _frame(spark, [(1, [1.0, 2.0], [1.0, 1.0, 1.0, 1.0])])
    with pytest.raises(Exception, match="dot_fixed_strict"):
        df.select(dot_fixed_strict("a", "b", DIM).alias("d")).collect()
