"""asof_join unit semantics on constructed data, including the NULL-payload
case the events-table oracle can't exercise (events.value has no NULLs)."""

from __future__ import annotations


def test_asof_null_payload_is_latest_row_not_skipped(spark, duck):
    """A right row with a NULL value IS the latest match — it must be
    returned (NULL), not forward-filled past (regression for the
    last(ignorenulls) bug class)."""
    from wx20222_bigdata_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 10)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 5, 5.0), (1, 20, None), (2, 50, 9.0)], "k int, t int, v double"
    )
    got = {
        (r.k, r.t): r.asof_v
        for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()
    }
    assert got[(1, 10)] == 5.0          # only t=5 precedes
    assert got[(1, 25)] is None         # latest is t=20 whose v IS NULL
    assert got[(2, 10)] is None         # no right row precedes at all
    # cross-check the whole table against DuckDB's native ASOF
    expected = dict(
        (tuple(r[:2]), r[2])
        for r in duck.execute(
            """WITH l(k, t) AS (VALUES (1, 10), (1, 25), (2, 10)),
                    r(k, t, v) AS (VALUES (1, 5, 5.0), (1, 20, NULL), (2, 50, 9.0))
               SELECT l.k, l.t, r.v FROM l ASOF LEFT JOIN r
               ON l.k = r.k AND l.t >= r.t"""
        ).fetchall()
    )
    assert got == expected


def test_asof_multi_value_cols_same_row(spark):
    """Multiple value columns must come from the SAME right row."""
    from wx20222_bigdata_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 30)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, 1.0, "a"), (1, 20, None, "b")], "k int, t int, v double, s string"
    )
    row = asof_join(left, right, "k", "t", "t", ["v", "s"]).collect()[0]
    assert row.asof_v is None and row.asof_s == "b"  # both from the t=20 row


def test_t10_weight_table_is_exact_dyadic():
    """The decay CASE table must be EXACTLY 0.5^a as a decimal literal —
    integer-derived (5^a shifted a places), never float-formatted."""
    from decimal import Decimal

    from wx20222_bigdata_spark.operators.temporal import T10_HORIZON, _T10_W

    assert set(_T10_W) == set(range(T10_HORIZON + 1))
    for a, s in _T10_W.items():
        assert Decimal(s) == Decimal(1) / (Decimal(2) ** a), (a, s)


def test_t10_decay_laws(spark):
    """Horizon + ordering laws on the fixture: decayed <= raw always
    (weights <= 1), zero-age events contribute at full weight, and every
    user-type cell matches an independent pandas recomputation."""
    import pandas as pd

    from wx20222_bigdata_spark.operators.temporal import (
        T10_HORIZON,
        t10_decay_weighted_value,
    )

    sf = "/root/testdata/sf0.001"
    got = t10_decay_weighted_value(spark, sf).toPandas()
    assert (got.decayed_value <= got.raw_value + 1e-9).all()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    # normalize both physical ts layouts (nanos int64 / micros datetime64)
    day = (
        ev.ts.astype("datetime64[ns]").astype("int64") // 10**9 // 86400
    ).astype("int64")
    ref = day.max()
    age = ref - day
    keep = age <= T10_HORIZON
    w = 0.5 ** age[keep]
    dec = (
        pd.DataFrame(
            {
                "user_id": ev.user_id[keep],
                "event_type": ev.event_type[keep],
                "d": (ev.value[keep].round(6) * w),
            }
        )
        .groupby(["user_id", "event_type"])
        .d.sum()
        .round(5)  # pandas floats: compare at 1e-5, the exact path is Spark's
    )
    merged = got.set_index(["user_id", "event_type"]).join(dec, how="outer")
    assert not merged.decayed_value.isna().any()
    assert not merged.d.isna().any()
    assert (abs(merged.decayed_value.round(5) - merged.d) <= 2e-5).all()
