"""Temporal / multi-dimensional operators beyond the reference's surface:
as-of join, range (theta) join, multi-granularity time rollup, cube, pivot
(SURVEY.md §2.3 'absent' row and §2.4 'absent' row — supplied by the
engine because a training-data pipeline needs them; brief: as-of join,
range join, hypertable rollup).

As-of join is implemented with the union-and-window technique — the
scalable formulation: tag both sides, union, one window pass per key
carrying the last right-side value forward. One shuffle on (key), no
nested-loop, no per-row probe. DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Union-and-window: right rows become carriers, left rows become probes;
    a per-key window ordered by (ts, side) forward-fills the last carrier
    values onto each probe. Cost: one shuffle on ``on`` + one sort per
    partition — independent of how many right rows precede each left row
    (a nested-loop/backward-scan would be O(n·m) per key)."""
    # the carried payload is ONE struct of all value columns: last(...,
    # ignorenulls) then skips only left rows (whose struct is NULL), never
    # a right row that happens to carry NULL values — so the "latest right
    # row" contract holds even for NULL payloads, and multi-column values
    # always come from the same right row.
    rv_struct = F.struct(*[F.col(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        "*",
        null_struct.alias("_rv"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        rv_struct.alias("_rv"),
    )
    unioned = l_tag.unionByName(r_tag)
    # carriers sort before probes at equal ts (side 0 < 1) → ties are
    # matched (right_ts == left_ts counts as "already happened").
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_rv_last", F.last("_rv", ignorenulls=True).over(w))
    keep = [f.name for f in left.schema.fields] + [
        F.col(f"_rv_last.{c}").alias(f"asof_{c}") for c in value_cols
    ]
    return filled.filter(F.col("_side") == 1).select(*keep)


@query(
    "t1_asof_join",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.event_id, ROUND(p.value, 6) AS asof_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def t1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's latest preceding purchase
    value (NULL if none yet). Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return joined.select(
        "user_id", "event_id", F.round("asof_value", 6).alias("asof_value")
    )


@query(
    "t2_range_join",
    oracle="""
WITH tiers(tier, lo, hi) AS (
  VALUES ('low', 0.0, 5.0), ('mid', 5.0, 20.0), ('high', 20.0, 1e9)
)
SELECT t.tier, COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier
""",
)
def t2_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: events banded into value tiers via interval
    containment. The tier table is tiny → broadcast nested loop with the
    range predicate — the correct physical plan; a shuffled theta join
    would be the scale bug."""
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@query(
    "t3_time_rollup",
    oracle="""
SELECT CAST(CASE WHEN GROUPING(strftime(ts, '%Y-%m-%d')) = 0 THEN strftime(ts, '%Y-%m-%d') END AS VARCHAR) AS day,
       CAST(CASE WHEN GROUPING(strftime(ts, '%Y-%m-%d %H')) = 0 THEN strftime(ts, '%Y-%m-%d %H') END AS VARCHAR) AS hour,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events
GROUP BY GROUPING SETS ((strftime(ts, '%Y-%m-%d')), (strftime(ts, '%Y-%m-%d'), strftime(ts, '%Y-%m-%d %H')), ())
""",
)
def t3_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: one pass produces the
    grand total, per-day, and per-(day, hour) aggregates via GROUPING SETS
    — the continuous-aggregate shape, computed with a single shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        "value",
    )
    return ev.rollup("day", "hour").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "t4_cube",
    oracle="""
SELECT CAST(CASE WHEN GROUPING(o_orderstatus) = 0 THEN o_orderstatus END AS VARCHAR) AS o_orderstatus,
       CAST(CASE WHEN GROUPING(o_orderpriority) = 0 THEN o_orderpriority END AS VARCHAR) AS o_orderpriority,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def t4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping combinations in one
    pass (SURVEY §2.4 'absent — free in Spark' row, made explicit)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )


@query(
    "t5_pivot",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS error
FROM events
GROUP BY user_id
""",
)
def t5_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → per-user counts with an explicit value list
    (explicit values keep the schema static — at scale an inferred pivot
    does an extra distinct pass and produces unstable schemas)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(c, F.lit(0)).alias(c) for c in ["click", "view", "purchase", "signup", "error"]],
    )


@query(
    "t6_funnel_conversion",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
),
v AS (
  SELECT user_id, MIN(sec) AS t_view FROM e
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.sec) AS t_click
  FROM e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.sec > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.sec) AS t_purchase
  FROM e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.sec > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            ELSE 1 END AS stage_reached
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = c.user_id
""",
)
def t6_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: per user, the first view, the first click
    strictly after that view, and the first purchase strictly after that
    click — the classic product-analytics conversion funnel as three
    chained min-aggregates (each stage's threshold joins into the next
    stage's filter; no self-join explosion, no window over the event
    stream). Event time is floored to whole seconds on both engines (the
    proven nanos-vs-micros cross-reader idiom). All three shuffles key on
    user_id, so at 100 TB the chain co-partitions and AQE folds the three
    aggregates onto one exchange."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v.select(F.col("user_id").alias("vu"), "t_view"),
              F.col("user_id") == F.col("vu"))
        .filter(F.col("sec") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c.select(F.col("user_id").alias("cu"), "t_click"),
              F.col("user_id") == F.col("cu"))
        .filter(F.col("sec") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .alias("stage_reached"),
        )
    )


@query(
    "t7_cohort_retention",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx
  FROM events
),
cohort AS (SELECT user_id, MIN(day_idx) AS cohort_day FROM e GROUP BY user_id)
SELECT c.cohort_day // 7 AS cohort_week,
       e.day_idx - c.cohort_day AS offset_day,
       COUNT(DISTINCT e.user_id) AS n_active_users
FROM e JOIN cohort c ON c.user_id = e.user_id
GROUP BY c.cohort_day // 7, e.day_idx - c.cohort_day
""",
)
def t7_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, counted
    on each subsequent activity day — the standard retention triangle
    (day offsets keep the curve informative on this dense corpus).
    Day/week arithmetic is pure integer on UTC epoch days (no calendar
    functions, no tz), so the buckets are cross-engine exact by
    construction. Shuffles: one user_id aggregate for cohorts, a
    co-partitioned join back, one (cohort, offset) aggregate with
    map-side distinct expansion."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 86400").alias("day_idx"),
    )
    cohort = e.groupBy("user_id").agg(F.min("day_idx").alias("cohort_day"))
    return (
        e.join(cohort, "user_id")
        .groupBy(
            F.expr("cohort_day div 7").alias("cohort_week"),
            (F.col("day_idx") - F.col("cohort_day")).alias("offset_day"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@query(
    "t8_grouping_sets",
    oracle="""
SELECT CAST(CASE WHEN GROUPING(o_orderstatus) = 0 THEN o_orderstatus END AS VARCHAR) AS o_orderstatus,
       CAST(CASE WHEN GROUPING(o_orderpriority) = 0 THEN o_orderpriority END AS VARCHAR) AS o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
)
def t8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the asymmetric aggregation lattice CUBE
    (t4) and ROLLUP (a3) can't express: detail, one marginal, and the
    grand total in a single pass, with ``grouping_id`` disambiguating
    NULL-as-group-all from NULL-as-value. One shuffle total; the
    alternative (three groupBys + union) scans the fact table three
    times. Revenue goes through DECIMAL so the sum is order-exact."""
    from wx20222_bigdata_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(CASE WHEN grouping(o_orderstatus) = 0 THEN o_orderstatus END AS STRING) AS o_orderstatus,
               CAST(CASE WHEN grouping(o_orderpriority) = 0 THEN o_orderpriority END AS STRING) AS o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "t9_date_spine",
    oracle="""
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                     INTERVAL 1 DAY)) AS DATE) AS d
),
cal AS (
  SELECT strftime(d, '%Y-%m-%d') AS day,
         CAST((date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1 AS BIGINT) AS dow_iso,
         strftime(d, '%Y-%m') AS month,
         (date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1 >= 6 AS is_weekend
  FROM spine
),
daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1
)
SELECT cal.day, dow_iso, month, is_weekend,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(total_value, 0.0) AS total_value
FROM cal LEFT JOIN daily ON cal.day = daily.day
""",
)
def t9_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 calendar-spine generation — a date dimension produced
    DECLARATIVELY (``sequence()`` + explode; no source table, no driver
    loop) and left-joined to per-day event aggregates so that zero-event
    days appear explicitly: the dimensional complement of w7's gap fill
    (w7 interpolates an existing series; t9 manufactures the axis). The
    day-of-week is computed from raw epoch-day arithmetic ((days+3)%7+1,
    ISO Monday=1) rather than each engine's dayofweek builtin — Spark
    and DuckDB disagree on week-start conventions, epoch arithmetic is
    convention-free (the cross-engine datetime analog of the md5-hash
    rule). At scale the spine is O(days) — trivially broadcast against
    any fact table; this is the standard dbt date-spine pattern.

    (No session-conf mutation here: a per-query ``conf.set`` would make
    sibling queries order-dependent in the driver's shared session; the
    repo-wide contract is that the driver environment is UTC, which
    every events query already relies on.)"""
    spine = spark.range(1).select(
        F.explode(
            F.expr("sequence(to_date('2024-01-01'), to_date('2024-01-31'))")
        ).alias("d")
    )
    epoch_days = F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01")))
    cal = spine.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        ((epoch_days + 3) % 7 + 1).cast("bigint").alias("dow_iso"),
        F.date_format("d", "yyyy-MM").alias("month"),
        (((epoch_days + 3) % 7 + 1) >= 6).alias("is_weekend"),
    )
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    return cal.join(daily, "day", "left").select(
        "day",
        "dow_iso",
        "month",
        "is_weekend",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@query(
    "t5b_unpivot",
    oracle="""
WITH wide AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
         COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
         COUNT(*) FILTER (WHERE event_type = 'error')    AS error
  FROM events
  GROUP BY user_id
)
SELECT user_id, event_type, CAST(n AS BIGINT) AS n
FROM wide
UNPIVOT (n FOR event_type IN (click, view, purchase, signup, error))
WHERE n > 0
""",
)
def t5b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5b unpivot — ``stack()`` melts t5's pivoted wide table back to
    long form, proving pivot/unpivot are inverses (zero-count cells,
    manufactured by the pivot, are dropped on the way back; what
    remains is exactly the direct groupBy). Wide→long is the shape
    metric stores and ML feature logs ingest at scale; stack() is a
    generator expression (no shuffle of its own — the only exchange
    here belongs to the upstream pivot aggregate), so melting N metric
    columns costs a projection, not N scans. Oracle uses DuckDB's
    native UNPIVOT against Spark's stack() — two independent
    implementations of the same relational operator."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .select(
            "user_id",
            *[F.coalesce(t, F.lit(0)).alias(t) for t in types],
        )
    )
    stack_args = ", ".join(f"'{t}', {t}" for t in types)
    return (
        wide.select(
            "user_id",
            F.expr(f"stack({len(types)}, {stack_args}) AS (event_type, n)"),
        )
        .select("user_id", "event_type", F.col("n").cast("bigint").alias("n"))
        .filter(F.col("n") > 0)
    )


# --- t10: half-life decay-weighted engagement ----------------------------
T10_HORIZON = 14  #: days; weight 0.5^age, age > horizon excluded

#: exact dyadic decimal literals 0.5^a for a = 0..HORIZON — 5^a zero-padded
#: to a decimal places is exactly 0.5^a, so the weight table is
#: integer-derived and bit-identical on any engine that parses decimal
#: literals (no float pow anywhere).
_T10_W = {0: "1"} | {
    a: "0." + f"{5 ** a:0{a}d}" for a in range(1, T10_HORIZON + 1)
}
_T10_CASE = (
    "CASE age "
    + " ".join(
        f"WHEN {a} THEN CAST('{w}' AS DECIMAL(16,14))" for a, w in _T10_W.items()
    )
    + " END"
)


@query(
    "t10_decay_weighted_value",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx
  FROM events
),
ref AS (SELECT MAX(day_idx) AS ref_day FROM e),
aged AS (
  SELECT user_id, event_type,
         CAST(value AS DECIMAL(18,6)) AS v,
         ref_day - day_idx AS age
  FROM e, ref
  WHERE ref_day - day_idx <= {T10_HORIZON}
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events_recent,
       CAST(ROUND(SUM(v * ({_T10_CASE})), 6) AS DOUBLE) AS decayed_value,
       CAST(ROUND(SUM(v), 6) AS DOUBLE) AS raw_value
FROM aged
GROUP BY user_id, event_type
""",
)
def t10_decay_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 half-life decay-weighted engagement — per (user, event_type),
    the sum of event values weighted by 0.5^age_days against the
    corpus's most recent day, over a {T10_HORIZON}-day horizon: the
    standard recency weighting of feed ranking / training-data freshness
    scoring, with the decay curve chosen so determinism is free.

    Cross-engine exactness without float powers: 0.5^a is the decimal
    literal 5^a shifted a places (0.5, 0.25, 0.125, …) — a bounded CASE
    table of exact DECIMAL(16,14) constants, multiplied into
    DECIMAL(18,6)-cast values and summed as decimals (order-independent,
    no float accumulation), cast to double and rounded only at the very
    end. Age is pure integer UTC epoch-day arithmetic (t7 idiom).

    Plan: one narrow scan; the reference day is a one-row global MAX
    broadcast back via cross join (bounded — the documented one-row-
    aggregate pattern); one hash exchange for the (user, type) aggregate
    with map-side partial decimal sums. Linear at any corpus size; the
    horizon filter prunes ancient history before the shuffle."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 86400").alias("day_idx"),
    )
    ref = e.agg(F.max("day_idx").alias("ref_day"))
    aged = (
        e.crossJoin(F.broadcast(ref))
        .withColumn("age", F.col("ref_day") - F.col("day_idx"))
        .filter(F.col("age") <= T10_HORIZON)
        .select(
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("v"),
            "age",
        )
    )
    return aged.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_events_recent"),
        # round in DECIMAL space (half-up, exact — a dyadic sum can tie at
        # the 7th decimal and double-rounding loses it), THEN cast
        F.round(F.sum(F.col("v") * F.expr(_T10_CASE)), 6)
        .cast("double")
        .alias("decayed_value"),
        F.round(F.sum("v"), 6).cast("double").alias("raw_value"),
    )
