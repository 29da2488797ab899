"""Window / ordered operators (SURVEY.md §2.5, §2.4 A9-A10, §2.6 O6).

The reference's ordered computations — step schedules (``main.py:204,215``),
EMA state (``main.py:95-103``), SWA snapshot averages (``main.py:166-208``),
k-fold assignment (``data_helper.py:104-112``) — map to Spark ``Window``
functions and per-group ordered folds.

Scale notes: every window here is ``partitionBy(user_id | label)`` — state
is bounded per key and the shuffle is a single hash exchange on the
partition key. Nothing uses a global (unpartitioned) window except where the
result is provably tiny. EMA is a per-key ordered fold: 100 TB of events
still folds locally per user after one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


@query(
    "w1_row_number_gap",
    oracle="""
SELECT event_id,
       user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       CAST(COALESCE(floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))), -1) AS BIGINT) AS gap_s
FROM events
""",
)
def w1_row_number_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 row numbering + lag delta: per-user event sequencing (the implicit
    list index of ``data_helper.py:29-30``) with the inter-event gap in
    whole seconds; first event gets -1."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    prev_epoch = F.unix_timestamp(F.lag("ts").over(w))
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.coalesce(epoch - prev_epoch, F.lit(-1)).cast("bigint").alias("gap_s"),
    )


@query(
    "w2_step_schedule",
    oracle="""
WITH seq AS (
  SELECT event_id, user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step
  FROM events
)
SELECT event_id, user_id, step,
       (step % 5 = 0) AS is_print_step,
       (step > 10 AND (step - 10) % 3 = 0) AS is_swa_step
FROM seq
WHERE step % 5 = 0 OR (step > 10 AND (step - 10) % 3 = 0)
""",
)
def w2_step_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 step-based schedules — ``step % print_steps == 0`` and the SWA
    gate ``step > swa_start and (step-swa_start) % gap == 0``
    (``main.py:204,215``) as modulo predicates over an ordered window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_id", "user_id", F.row_number().over(w).cast("bigint").alias("step")
    )
    is_print = F.col("step") % 5 == 0
    is_swa = (F.col("step") > 10) & ((F.col("step") - 10) % 3 == 0)
    return seq.filter(is_print | is_swa).select(
        "event_id",
        "user_id",
        "step",
        is_print.alias("is_print_step"),
        is_swa.alias("is_swa_step"),
    )


@query(
    "a9_ema_ordered_fold",
    oracle="""
SELECT user_id,
       ROUND(list_reduce(list(value ORDER BY ts, event_id), (a, x) -> 0.9 * a + 0.1 * x), 6) AS ema,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def a9_ema_ordered_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 exponential moving average — ``e = d*e + (1-d)*m`` per step
    (``main.py:95-103``, decay 0.9 here) as a per-key ORDERED FOLD:
    collect the per-user sequence in (ts, event_id) order, seed the
    accumulator with the first element, fold the rest. SURVEY §2.4 marks
    EMA ✗-SQL *as recursion*; per-group it is exactly
    ``aggregate(slice(...), init, step)`` — deterministic, no UDF.

    At scale: one shuffle on user_id, fold is local; per-user sequences are
    assumed memory-bounded (same contract as any sessionization)."""
    ev = load_table(spark, sf_dir, "events")
    grouped = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq"),
        F.count("*").alias("n_events"),
    )
    ema = F.expr(
        """aggregate(
             slice(transform(seq, x -> x.value), 2, size(seq) - 1),
             double(transform(seq, x -> x.value)[0]),
             (a, x) -> 0.9 * a + 0.1 * x)"""
    )
    return grouped.select(
        "user_id", F.round(ema, 6).alias("ema"), "n_events"
    )


@query(
    "a10_swa_snapshot_avg",
    oracle="""
WITH seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_snapshots,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS swa_avg
FROM seq
WHERE step % 5 = 0
GROUP BY user_id
""",
)
def a10_swa_snapshot_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 SWA — average of every gap-th snapshot (``main.py:166-208``):
    ordered step number, modulo filter, grouped mean (decimal-exact)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "value", F.row_number().over(w).alias("step"))
    return (
        seq.filter(F.col("step") % 5 == 0)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_snapshots"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("*"),
                6,
            ).alias("swa_avg"),
        )
    )


@query(
    "w3_running_total",
    oracle="""
SELECT event_id,
       user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM events
""",
)
def w3_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 running aggregate over an ordered frame (the cumulative-state
    shape EMA generalizes — ``rowsBetween(unboundedPreceding, currentRow)``).
    Decimal-cast so the running sum is exact under any frame evaluation
    strategy (Spark accumulates; DuckDB may use a segment tree)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_total"
        ),
    )


@query(
    "o6_ntile_kfold",
    oracle="""
WITH folds AS (
  SELECT label,
         NTILE(10) OVER (PARTITION BY label ORDER BY vec_id) AS fold
  FROM embeddings
)
SELECT label, fold, COUNT(*) AS n
FROM folds
GROUP BY label, fold
""",
)
def o6_ntile_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 stratified k-fold — ``StratifiedKFold(n_splits=10)``
    (``data_helper.py:104-112``): ntile(10) within each label over a
    deterministic ordering; fold f's validation set is ``fold == f``."""
    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    return (
        emb.select("label", F.ntile(10).over(w).cast("bigint").alias("fold"))
        .groupBy("label", "fold")
        .agg(F.count("*").alias("n"))
    )


@query(
    "w_sliding_avg",
    oracle="""
SELECT event_id,
       user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
FROM events
""",
)
def w_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row mean per user — the bounded-frame complement of
    W3's unbounded frame (and the batch shape of the streaming sliding
    window, §2.9)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count("*").over(w),
            6,
        ).alias("avg3"),
    )


@query(
    "w5_rolling_active_users",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx, user_id
  FROM events
),
days AS (SELECT DISTINCT day_idx FROM pairs),
contrib AS (
  SELECT unnest(range(day_idx, day_idx + 7)) AS window_day, user_id
  FROM pairs
),
rolling AS (
  SELECT window_day, COUNT(DISTINCT user_id) AS rolling_7d_users
  FROM contrib GROUP BY window_day
),
daily AS (
  SELECT day_idx, COUNT(DISTINCT user_id) AS daily_users
  FROM pairs GROUP BY day_idx
)
SELECT d.day_idx, daily.daily_users, r.rolling_7d_users
FROM days d
JOIN daily   ON daily.day_idx = d.day_idx
JOIN rolling r ON r.window_day = d.day_idx
""",
)
def w5_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the window-distinct
    metric a plain sliding window cannot express (COUNT(DISTINCT) is not
    frame-decomposable). Scalable formulation: each (day, user) pair is
    exploded to the 7 window-days it contributes to, turning the range
    join into an equi groupBy — shuffle ∝ 7× the daily-distinct pairs,
    no nested loop, no per-window state. Day arithmetic is integer epoch
    days (cross-engine exact); trailing phantom windows are dropped by
    the join back onto observed days."""
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 86400").alias("day_idx"),
        "user_id",
    ).distinct()
    days = pairs.select("day_idx").distinct()
    contrib = pairs.select(
        F.explode(
            F.sequence(F.col("day_idx"), F.col("day_idx") + 6)
        ).alias("window_day"),
        "user_id",
    )
    rolling = contrib.groupBy("window_day").agg(
        F.countDistinct("user_id").alias("rolling_7d_users")
    )
    daily = pairs.groupBy("day_idx").agg(
        F.countDistinct("user_id").alias("daily_users")
    )
    return (
        days.join(daily, "day_idx")
        .join(rolling, rolling.window_day == days.day_idx)
        .select("day_idx", "daily_users", "rolling_7d_users")
    )


@query(
    "w6_top_n_per_group",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                 ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT) AS rnk
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
WHERE rnk <= 3
""",
)
def w6_top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — the partitioned-window complement of the global
    top-k (o4/e4b): the 3 largest orders per market segment. The window
    partitions on the group key, so unlike a global sort every partition
    ranks independently; at 100 TB Catalyst inserts a WindowGroupLimit
    (rank pushdown) so each task keeps only N rows per group before the
    shuffle — assert-worthy plan behavior, pinned in test_plans."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.join(c, c.c_custkey == o.o_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "w7_gap_fill",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS cnt
  FROM events WHERE user_id % 97 = 0
  GROUP BY user_id, date_trunc('day', ts)
),
span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
cal AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
),
j AS (
  SELECT c.user_id, c.day, d.cnt
  FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
),
f AS (
  SELECT user_id, day, cnt,
         last_value(cnt IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
  FROM j
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(COALESCE(cnt, 0) AS BIGINT) AS n_events,
       cnt IS NULL AS is_gap,
       CAST(ff AS BIGINT) AS ffill_events
FROM f
""",
)
def w7_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 time-series gap filling — the resample step every monitoring /
    feature pipeline needs before windowed models see the data: each
    sampled user's sparse daily activity is densified onto their own
    min→max calendar (``sequence`` + explode — rows materialize lazily,
    never on the driver), missing days zero-filled AND forward-filled
    (``last(..., ignorenulls)``), with the gap flag kept explicit.

    Plan: one grouped count, a per-user span aggregate whose calendar
    explode is narrow, one equi left join back, and a window partitioned
    by user — nothing global, so the plan is indifferent to user count.
    All-integer outputs (counts, not float sums) keep it bit-exact
    cross-engine; dates leave as formatted strings (registry rule)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 97 == 0)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("cnt"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    j = cal.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_events"),
        F.col("cnt").isNull().alias("is_gap"),
        F.last("cnt", ignorenulls=True).over(w).cast("bigint").alias("ffill_events"),
    )


@query(
    "w8_rolling_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt
  FROM events
  GROUP BY event_type, date_trunc('day', ts)
),
rolled AS (
  SELECT event_type, day, cnt,
         COUNT(*)            OVER w AS n,
         SUM(cnt)            OVER w AS s1,
         SUM(cnt * cnt)      OVER w AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(cnt AS BIGINT) AS n_events,
       CASE WHEN n >= 3 AND n * s2 > s1 * s1 THEN
         ROUND((cnt - CAST(s1 AS DOUBLE) / n)
               / sqrt((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
                      / (n * (n - 1.0))), 6)
       END AS zscore,
       COALESCE(
         CASE WHEN n >= 3 AND n * s2 > s1 * s1 THEN
           abs((cnt - CAST(s1 AS DOUBLE) / n)
               / sqrt((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
                      / (n * (n - 1.0)))) > 2.0
         END, FALSE) AS is_anomaly
FROM rolled
""",
)
def w8_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 rolling z-score anomaly flags over the per-type daily event
    series — the monitoring primitive every ingestion pipeline runs over
    its own volume counts. The trailing-7-day mean/std are derived from
    INTEGER window sums (n, Σx, Σx²), so the float math is a fixed
    expression over exact integers — cross-engine bit-identical with no
    ordered-fold machinery (the trick that makes windowed variance
    oracle-checkable; compare a14's rounded-only moments). Degenerate
    frames (n < 3, zero variance) yield NULL scores, flags default FALSE.

    Plan: one grouped count, then a single window partitioned by
    event_type — bounded partitions (one row per day), no global state.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    rolled = daily.select(
        "event_type",
        "day",
        "cnt",
        F.count("*").over(w).alias("n"),
        F.sum("cnt").over(w).alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("s2"),
    )
    var = (
        F.col("n") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1")
    ) / (F.col("n") * (F.col("n") - F.lit(1.0)))
    z = (F.col("cnt") - F.col("s1").cast("double") / F.col("n")) / F.sqrt(var)
    ok = (F.col("n") >= 3) & (F.col("n") * F.col("s2") > F.col("s1") * F.col("s1"))
    return rolled.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cnt").cast("bigint").alias("n_events"),
        F.when(ok, F.round(z, 6)).alias("zscore"),
        F.coalesce(F.when(ok, F.abs(z) > 2.0), F.lit(False)).alias("is_anomaly"),
    )


SESSION_GAP_S = 1800  #: inactivity gap (30 min) that closes a session


@query(
    "w9_sessionization",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
),
flagged AS (
  SELECT user_id, event_id, sec,
         CASE WHEN sec - lag(sec) OVER w > {SESSION_GAP_S}
              OR lag(sec) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
sess AS (
  SELECT user_id, sec,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       CAST(sid AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(sec) AS start_sec,
       MAX(sec) AS end_sec,
       MAX(sec) - MIN(sec) AS duration_sec
FROM sess
GROUP BY user_id, sid
""",
)
def w9_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 batch sessionization — the gap-rule dual of the streaming
    session windows (s9c): an event opens a new session when it follows
    the user's previous event by more than SESSION_GAP_S seconds; the
    session id is the running count of such openings. The lag-flag →
    running-sum pattern is THE general sessionizer: any custom gap rule
    (per-user gaps, event-type resets) drops into the CASE without
    touching the plan.

    The window order is TOTAL — (sec, event_id) — because two window
    evaluations over the same non-total ORDER BY may sort ties
    differently even within one engine: an unflagged duplicate-timestamp
    row re-sorted ahead of its group's flagged row would take running
    sum 0 and mint a phantom session 0 (observed at sf1; landmine).

    Plan: two windows and one aggregate, all partitioned by user_id —
    sessionizing 100 TB of events is embarrassingly parallel in the user
    dimension (the same reason the streaming version keys state by
    user). Event times floor to whole epoch seconds (the t6 idiom), so
    everything downstream is exact integer arithmetic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").cast("bigint").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > SESSION_GAP_S)
            | F.lag("sec").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("sec", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        F.min("sec").alias("start_sec"),
        F.max("sec").alias("end_sec"),
        (F.max("sec") - F.min("sec")).alias("duration_sec"),
    ).select(
        "user_id",
        F.col("sid").cast("bigint").alias("session_id"),
        "n_events",
        "start_sec",
        "end_sec",
        "duration_sec",
    )


@query(
    "w10_rank_surface",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, spend,
         CAST(RANK() OVER w AS BIGINT) AS rnk,
         CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk,
         ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
         ROUND(CUME_DIST() OVER w, 6) AS cume,
         CAST(NTILE(10) OVER w AS BIGINT) AS decile
  FROM spend
  WINDOW w AS (ORDER BY spend DESC, o_custkey)
)
SELECT * FROM ranked WHERE rnk <= 100
""",
)
def w10_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 ranking-function surface — rank / dense_rank / percent_rank /
    cume_dist / ntile over one shared total ordering (customer lifetime
    spend desc, then key), the full SQL ranking toolkit. Ranks are
    computed over ALL customers, then the output is cut to the top 100 —
    so percent_rank/cume_dist keep their full-population denominators
    (filtering first would change the semantics).

    Scale shape (r2 de-weak): NO global ORDER BY window anywhere. The
    ordering key (spend desc, o_custkey) is TOTAL — o_custkey is unique —
    so every ranking function is pure arithmetic over the scalable
    two-stage zip index (range partition → per-partition row_number +
    partition offsets, ``skew.py:zip_with_global_index``):
    rank == dense_rank == row_number (no full-key ties),
    percent_rank = (rn-1)/(N-1), cume_dist = rn/N, and ntile(k) follows
    the SQL bucket law (first N%k buckets get ceil(N/k) rows, the rest
    floor(N/k)). N is a scalar read off the materialized index (the zip
    index is an eager localCheckpoint, so the count is a metadata-cheap
    second action, not a SinglePartition exchange in the declared plan) —
    the whole op is two narrow passes over |customers| with no global
    window and no nested loop; survives unbounded |customers| at 100×."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    from wx20222_bigdata_spark.operators.skew import zip_with_global_index

    idx = zip_with_global_index(spend, F.desc("spend"), F.asc("o_custkey"))
    n_total = idx.count()  # cheap: idx is an eager localCheckpoint
    rn = F.col("zip_index") + F.lit(1)
    k = 10
    small = n_total // k  # floor(N/k): size of the late buckets
    n_big = n_total % k  # first N%k buckets hold small+1 rows
    big = small + 1
    decile = F.when(
        rn <= n_big * big, F.ceil(rn / F.lit(big))
    ).otherwise(n_big + F.ceil((rn - n_big * big) / F.lit(max(small, 1))))
    return (
        idx.select(
            "o_custkey",
            "spend",
            rn.cast("bigint").alias("rnk"),
            rn.cast("bigint").alias("dense_rnk"),
            F.round(
                (rn - 1) / F.lit(n_total - 1) if n_total > 1 else F.lit(0.0), 6
            ).alias("pct_rank"),
            F.round(rn / F.lit(n_total), 6).alias("cume"),
            decile.cast("bigint").alias("decile"),
        )
        .filter(F.col("rnk") <= 100)
    )


@query(
    "w11_cumulative_actives",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
  FROM events GROUP BY user_id
),
new_per_day AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY day
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM new_per_day
""",
)
def w11_cumulative_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 cumulative distinct users over time — the running-COUNT(
    DISTINCT) every growth dashboard wants, in its only scalable form:
    a windowed ``collect_set`` would carry every id in every frame
    (state O(users × days)); instead each user contributes once at
    their FIRST-SEEN day (one groupBy on user), days aggregate new
    arrivals (one groupBy on day), and a running sum over the tiny
    per-day series finishes the job. The global window orders O(days)
    aggregate rows, never user rows — same bounded-input justification
    as w10. The same first-seen trick is how t7's cohort matrix and
    w5's rolling actives stay linear."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("day")
    )
    new_per_day = first_seen.groupBy("day").agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return new_per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@query(
    "w12_range_frame",
    oracle="""
WITH e AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id, sec,
       CAST(SUM(v_cents) OVER w AS BIGINT) AS hour_sum_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS hour_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
)
def w12_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 RANGE window frame — the VALUE-based frame the W-family
    lacked: each purchase carries the trailing-hour sum/count for its
    user, bounded by event-TIME distance (RANGE BETWEEN 3600 PRECEDING),
    not row count (w3's ROWS frames) and not bucket alignment (s9b's
    sliding windows) — three genuinely different windowing semantics,
    now all declared. RANGE frames are how "rate over the last hour"
    limits and trailing-exposure features are computed per entity.

    Exactness: the frame key is integer epoch seconds and the measure
    integer cents, so frame membership AND the aggregate are exact on
    both engines (a raw-timestamp RANGE frame would hit the tz landmine;
    a float measure would hit ordering drift). Partitioned by user —
    no global window; per-partition state is one frame's rows."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "event_id",
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("sec"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "sec",
        F.sum("v_cents").over(w).cast("bigint").alias("hour_sum_cents"),
        F.count("*").over(w).cast("bigint").alias("hour_n"),
    )
