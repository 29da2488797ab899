"""Batch-mode forms of the streaming window aggregates (SURVEY.md §2.9).

Structured Streaming's windowed aggregations use the exact same
``window()`` / ``session_window()`` expressions in batch mode — these
queries oracle-check the window semantics in DuckDB (date_trunc for
tumbling, a shifted-start unnest for sliding, gap+cumsum for sessions);
the true streaming forms (streaming/jobs.py) are covered by micro-batch
tests against these same results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


@query(
    "s9_tumbling_window",
    oracle="""
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
)
def s9_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch twin of
    ``streaming.jobs.tumbling_counts`` (same ``window()`` expression)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.unix_timestamp("w.start").cast("bigint").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


@query(
    "s9b_sliding_window",
    oracle="""
WITH assigned AS (
  SELECT unnest([
           date_trunc('hour', ts) - INTERVAL 1 HOUR,
           date_trunc('hour', ts)
         ]) AS wstart,
         value
  FROM events
)
SELECT CAST(floor(epoch(wstart)) AS BIGINT) AS window_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 1000000 AS BIGINT) // COUNT(*) AS value_avg_micros
FROM assigned
GROUP BY 1
""",
)
def s9b_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h window aggregate: every event lands in two windows —
    Spark's ``window(ts, '2 hours', '1 hour')`` materializes exactly the
    two shifted hour-starts the oracle unnests. The mean is emitted in
    integer micro-units: a decimal sum that lands exactly on a half-micro
    tie rounds differently in Spark (BigDecimal HALF_UP on the shortest
    decimal repr) vs DuckDB (binary-double nearest) — floor-div on exact
    integers sidesteps rounding entirely."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 1000000 AS BIGINT) div COUNT(*)"
            ).alias("value_avg_micros"),
        )
        .select(
            F.unix_timestamp("w.start").cast("bigint").alias("window_start"),
            "n",
            "value_avg_micros",
        )
    )


#: Shared by s9c (direct session_window) and s9g (salted two-level) —
#: both must equal the classic lag-gap-cumsum sessionization exactly.
_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  -- the cumsum MUST tiebreak on event_id like the lag above: with
  -- duplicate timestamps a ts-only ROWS frame is free to order ties
  -- either side of the new_session flag row and split the session
  -- differently than session_window() (seen at sf1, 10x-replicated ts)
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM sessions
GROUP BY user_id, session_id
"""


@query("s9c_session_windows", oracle=_SESSION_ORACLE)
def s9c_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) in batch — ``session_window()``
    merges events closer than the gap; the oracle derives identical
    sessions with the classic lag-gap-cumsum construction, which doubles
    as proof of the window semantics.

    Boundary semantics verified empirically: Spark MERGES two events
    exactly gap apart (session end = last_ts + gap is inclusive of an
    event AT that instant), so the oracle's break condition is strict
    ``>`` — do not "fix" it to >=."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_timestamp("w.start").cast("bigint").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


@query("s9g_salted_sessions", oracle=_SESSION_ORACLE)
def s9g_salted_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9g salted (two-level) session windows — the hot-key mitigation
    for sessionization (r8 verdict item 5), batch twin. Stage 1
    sessionizes per (user_id, 6-hour time salt) so a skewed user's
    state work spreads across salt buckets; stage 2 stitches the
    sub-session summaries back into exact sessions (inclusive-gap merge
    via lag→cumsum over O(sessions) rows). Registered against the SAME
    oracle as s9c: the salted decomposition must be EXACTLY equal to
    direct ``session_window`` output — sessions, counts, and decimal
    sums bit-for-bit — which is the strongest statement of the
    pattern's correctness (see streaming/jobs.py
    ``salted_sub_sessions``/``merge_sub_sessions`` for why a time salt,
    not a hash salt, makes exact reassembly possible). The streaming
    form runs stage 1 as the stateful op (audited under a 50%-hot key
    in STATE_STORE_AUDIT.json) and stage 2 as the batch compaction over
    closed sub-sessions; stream==batch law in tests/test_streaming.py."""
    from wx20222_bigdata_spark.streaming.jobs import (
        merge_sub_sessions,
        salted_sub_sessions,
    )

    ev = load_table(spark, sf_dir, "events")
    return merge_sub_sessions(salted_sub_sessions(ev, watermark=None))


@query(
    "s9d_windowed_dedup",
    oracle="""
WITH ranked AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
         user_id, event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY date_trunc('hour', ts), user_id, event_type
           ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (
           PARTITION BY date_trunc('hour', ts), user_id, event_type) AS n_arrivals
  FROM events
)
SELECT window_start, user_id, event_type,
       CAST(event_id AS BIGINT) AS first_event,
       CAST(n_arrivals AS BIGINT) AS n_arrivals
FROM ranked WHERE rn = 1
""",
)
def s9d_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup, batch twin of ``streaming.jobs.windowed_dedup``:
    first arrival per (hour window, user_id, event_type) plus the arrival
    count it absorbed. The streaming form holds O(live keys) state under a
    watermark; this batch form is one partitioned window — both are the
    keep-first contract of the E1 family applied per time bucket."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    win = F.window("ts", "1 hour").alias("w")
    keyed = ev.select(win, "user_id", "event_type", "event_id", "ts")
    spec = W.partitionBy("w", "user_id", "event_type")
    return (
        keyed.withColumn("rn", F.row_number().over(spec.orderBy("ts", "event_id")))
        .withColumn("n_arrivals", F.count("*").over(spec))
        .filter(F.col("rn") == 1)
        .select(
            F.unix_timestamp("w.start").cast("bigint").alias("window_start"),
            "user_id",
            "event_type",
            F.col("event_id").cast("bigint").alias("first_event"),
            F.col("n_arrivals").cast("bigint").alias("n_arrivals"),
        )
    )


@query(
    "s9e_interval_join",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
)
SELECT a.event_id AS click_id, b.event_id AS purchase_id,
       a.user_id, b.sec - a.sec AS gap_s
FROM e a JOIN e b
  ON b.user_id = a.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.sec >= a.sec AND b.sec <= a.sec + 1800
""",
)
def s9e_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (event-time range) join in batch — the twin of the
    stream-stream attribution join ``streaming.jobs.interval_join``:
    clicks matched to the same user's purchases within 30 minutes.

    The twin defines the gap at whole-second granularity on BOTH engines
    (``unix_timestamp`` ≙ ``floor(epoch(ts))``) because events.ts is
    nanos-precision parquet truncated differently by each reader — the
    second-floor is the proven cross-engine idiom (w1/s9c). The join
    itself is an equi-join on user_id with the range as a post-condition:
    per-user event counts are bounded, so the equi key carries the
    shuffle and the range never degenerates to a cross join. The true
    streaming form keeps micro-precision event time (its range condition
    doubles as the state-eviction bound) and is tested against this same
    function run in batch mode."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
    )
    a = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("user_id"),
        F.col("sec").alias("a_sec"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user"),
        F.col("sec").alias("b_sec"),
    )
    return (
        a.join(b, (F.col("user_id") == F.col("b_user")))
        .filter(
            (F.col("b_sec") >= F.col("a_sec"))
            & (F.col("b_sec") <= F.col("a_sec") + 1800)
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.col("b_sec") - F.col("a_sec")).alias("gap_s"),
        )
    )


@query(
    "s9f_stream_static_enrich",
    oracle="""
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
       CASE event_type
         WHEN 'click' THEN 'engagement'
         WHEN 'view' THEN 'engagement'
         WHEN 'signup' THEN 'growth'
         WHEN 'purchase' THEN 'commerce'
         WHEN 'error' THEN 'ops'
       END AS category,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
)
def s9f_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.jobs.stream_static_enrich`` — the
    stream-static dimension-enrichment join (broadcast dim, stateless)
    followed by the tumbling category rollup. Runs the SAME function in
    batch mode: Structured Streaming's unified API means the twin is
    the identical plan minus the watermark, which is exactly what the
    oracle checks. The micro-batch equivalence test lives in
    tests/test_streaming.py."""
    from wx20222_bigdata_spark.streaming.jobs import stream_static_enrich

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return stream_static_enrich(ev)
