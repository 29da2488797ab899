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
