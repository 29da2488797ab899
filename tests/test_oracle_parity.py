"""Driver-mirroring correctness gate: every registered query with an oracle
is executed on Spark (sf0.01) and in DuckDB, then compared on row count,
column names, and order-insensitive values — the same contract the driver's
CORRECTNESS check applies (``__spark_entry__`` docstring).

Comparison is *exact* for non-float columns and exact-after-canonical-
rounding for floats: queries are required to round/decimal-cast their own
float outputs so that both engines produce bit-identical values. A looser
np.isclose fallback reports near-misses distinctly, so a drifting query
fails loudly with a diagnosis rather than a bare hash mismatch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_ORACLE


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all columns —
    an order-insensitive canonical form (what a value-hash would see)."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_extension_array_dtype(s.dtype):
            s = s.astype(object)
        if pd.api.types.is_integer_dtype(s.dtype):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s.dtype):
            s = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s.dtype):
            s = s.astype("bool")
        out[c] = s
    df = pd.DataFrame(out)
    key = df.apply(
        lambda row: tuple(
            "<null>" if (v is None or (isinstance(v, float) and math.isnan(v))) else str(v)
            for v in row
        ),
        axis=1,
    )
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    # dtype parity: a strict driver may compare physical types too.
    mismatched_dtypes = {
        c: (str(spark_pdf[c].dtype), str(duck_pdf[c].dtype))
        for c in spark_pdf.columns
        if str(spark_pdf[c].dtype) != str(duck_pdf[c].dtype)
    }
    assert not mismatched_dtypes, f"{name}: dtype mismatches {mismatched_dtypes}"
    s = _canonical(spark_pdf)
    d = _canonical(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv.dtype) and pd.api.types.is_float_dtype(dv.dtype):
            a, b = sv.to_numpy(), dv.to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            exact = np.array_equal(
                np.nan_to_num(a, nan=0.0), np.nan_to_num(b, nan=0.0)
            ) and np.array_equal(np.isnan(a), np.isnan(b))
            if exact:
                continue
            close = np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            if close.all():
                worst = np.nanmax(np.abs(np.where(both_nan, 0, a - b)))
                pytest.fail(
                    f"{name}.{c}: values are close but NOT bit-identical "
                    f"(max abs diff {worst:.3e}) — a value-hash would MISMATCH; "
                    f"round or decimal-cast this column in both engines"
                )
            bad = int((~close).sum())
            pytest.fail(f"{name}.{c}: {bad} rows differ beyond tolerance")
        else:
            mism = ~(
                (sv.astype(object).where(pd.notna(sv), None))
                == (dv.astype(object).where(pd.notna(dv), None))
            )
            both_null = pd.isna(sv) & pd.isna(dv)
            mism = mism & ~both_null
            if mism.any():
                i = int(np.argmax(mism.to_numpy()))
                pytest.fail(
                    f"{name}.{c}: {int(mism.sum())} rows differ; first at row {i}: "
                    f"spark={sv.iloc[i]!r} duckdb={dv.iloc[i]!r}"
                )


def _query_names():
    from wx20222_bigdata_spark.registry import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    return sorted(q), o


NAMES, _ORACLES = _query_names()


@pytest.mark.parametrize("name", NAMES)
def test_query_parity(spark, duck, name):
    from wx20222_bigdata_spark.registry import all_oracles, all_queries

    fn = all_queries()[name]
    sdf = fn(spark, SF_ORACLE)
    spark_pdf = sdf.toPandas()
    oracle = all_oracles().get(name)
    if oracle is None:
        # rows-only check (driver's weaker gate): must run and be stable.
        assert len(spark_pdf) >= 0
        again = fn(spark, SF_ORACLE).toPandas()
        assert len(again) == len(spark_pdf), f"{name}: nondeterministic row count"
        return
    duck_pdf = duck.execute(oracle).fetchdf()
    compare_frames(name, spark_pdf, duck_pdf)


def test_production_lsh_recalls_mutants(spark):
    """The xxhash64 LSH tier must recover the same seeded near-dups as the
    oracle-checked char-hash tier."""
    from wx20222_bigdata_spark.registry import all_queries

    pairs = all_queries()["e2g_minhash_lsh_production"](spark, SF_ORACLE).toPandas()
    mutants = pairs[pairs.id_b == pairs.id_a + 100000]
    # one seeded mutant per doc_id % 50 == 0 — count from the corpus so the
    # assertion holds at ANY scale (sf0.01: 10, sf1: 1000). LSH recall is
    # probabilistic (a mutant whose ' extra' suffix perturbs all 4 bands is
    # missed); measured: 10/10 at sf0.01, 995/1000 at sf1 — assert a 95%
    # floor, not perfection.
    from wx20222_bigdata_spark.catalog import load_table
    from pyspark.sql import functions as F

    expected = (
        load_table(spark, SF_ORACLE, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .count()
    )
    assert len(mutants) >= 0.95 * expected, (len(mutants), expected)
