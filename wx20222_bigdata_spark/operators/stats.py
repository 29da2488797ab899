"""Statistical aggregates + upsert/merge (coverage beyond SURVEY §2's
'absent' rows: percentiles, moments, correlation; CDC-style merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.functions.hashing import duck_md5_hash
from wx20222_bigdata_spark.registry import query


@query(
    "a13_percentiles",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(MIN(value), 6) AS vmin,
       ROUND(MAX(value), 6) AS vmax
FROM events
GROUP BY event_type
""",
)
def a13_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark ``percentile``
    (exact, sort-based) == DuckDB ``quantile_cont``. At 100 TB swap to
    ``approx_percentile`` (t-digest, one pass, no sort) — engine-specific
    sketch, hence the exact form is the oracle-checked one."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


@query("a13b_approx_percentiles")
def a13b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB tier of a13: ``approx_percentile`` (GK/t-digest family,
    one streaming pass, mergeable partials, no global sort). Rows-only by
    design — the sketch is engine-specific so no DuckDB oracle exists —
    but NOT unchecked: tests/test_stats_approx.py pins every approx value
    within the accuracy bound of the exact a13 baseline, the same
    baseline-vs-scale-path pattern as e3 vs e3b/e3c recall."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 1000)"), 6).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.9, 1000)"), 6).alias("p90"),
        F.count("*").alias("n"),
    )


@query(
    "a14_moments",
    oracle="""
SELECT event_type,
       ROUND(stddev_samp(value), 6) AS sd,
       ROUND(var_samp(value), 6) AS variance,
       ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_user,
       ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_user
FROM events
GROUP BY event_type
""",
)
def a14_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (stddev/variance/corr/covar) — same
    sample-variance definitions on both engines; rounded to 6 because the
    accumulation order differs (values agree to ~1e-12 relative)."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("variance"),
        F.round(F.corr(F.col("value"), u), 6).alias("corr_user"),
        F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_user"),
    )


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """CDC-style MERGE: updates win on key collision, unmatched base rows
    survive, brand-new keys insert. Implemented as updates ∪ (base
    left-anti updates) — one shuffle on the key, the lakehouse merge
    shape without a table format. Idempotent by construction."""
    return updates.unionByName(base.join(updates.select(key), key, "left_anti"))


@query(
    "m1_upsert_merge",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, 'RE-PRICED' AS o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT 90000000 + r.range AS o_orderkey, 1 AS o_custkey, 'N' AS o_orderstatus,
         555.0 AS o_totalprice, TIMESTAMP '2000-01-01 00:00:00' AS o_orderdate,
         'NEW' AS o_orderpriority
  FROM range(5) r
),
merged AS (
  SELECT * FROM updates
  UNION ALL
  SELECT * FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM merged
GROUP BY o_orderpriority
""",
)
def m1_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics verified end to end: re-price every 100th
    order (update), insert 5 new orders, keep the rest — summarized per
    priority so the update/insert/keep classes are all visible in the
    checked output."""
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        F.lit("RE-PRICED").alias("o_orderpriority"),
    )
    new_rows = spark.range(5).select(
        (F.col("id") + 90000000).alias("o_orderkey"),
        F.lit(1).cast("bigint").alias("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(555.0).alias("o_totalprice"),
        F.lit("2000-01-01 00:00:00").cast("timestamp_ntz").alias("o_orderdate"),
        F.lit("NEW").alias("o_orderpriority"),
    )
    merged = upsert(orders, updates.unionByName(new_rows), "o_orderkey")
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


CM_DEPTH = 4  #: count-min rows (independent hash functions)
CM_WIDTH = 256  #: buckets per row


@query(
    "x5_count_min_estimate",
    oracle=f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS tok
  FROM documents
),
true_counts AS (
  SELECT tok, COUNT(*) AS true_n FROM toks GROUP BY tok
  ORDER BY true_n DESC, tok ASC LIMIT 20
),
cells AS (
  SELECT seed,
         {duck_md5_hash("concat(tok, '#', seed)", mod=CM_WIDTH)} AS bucket,
         COUNT(*) AS cell_n
  FROM toks, (SELECT unnest(range(0, {CM_DEPTH})) AS seed)
  GROUP BY 1, 2
),
est AS (
  SELECT t.tok, t.true_n, MIN(c.cell_n) AS cm_est
  FROM true_counts t
  JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS seed) s ON TRUE
  JOIN cells c
    ON c.seed = s.seed
   AND c.bucket = {duck_md5_hash("concat(t.tok, '#', s.seed)", mod=CM_WIDTH)}
  GROUP BY t.tok, t.true_n
)
SELECT tok, true_n, cm_est, (cm_est >= true_n) AS never_undercounts
FROM est
""",
)
def x5_count_min_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan '05) expressed as a
    declarative plan — the second sketch beside the A12 HLL, and unlike
    library sketches it is fully ORACLE-CHECKABLE because the row hashes
    are the cross-engine md5 hash: depth=4 seeded hash rows × width=256
    buckets, estimate = min over rows of the bucket count, checked
    against true counts for the top-20 tokens (the never-undercount law
    is part of the output).

    Scale shape: the sketch build is ONE groupBy on (seed, bucket) —
    cardinality ≤ depth × width regardless of corpus size, partial
    aggregation does the per-partition sketching map-side, and the merge
    IS the shuffle (counter addition — exactly how distributed count-min
    merges). The token explode amplifies rows ×depth before the map-side
    collapse; at 100 TB that trade (4× narrow rows for a 1 KB-bounded
    shuffle) is the right one."""
    from wx20222_bigdata_spark.functions.hashing import spark_md5_hash

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("tok")
    )
    true_top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("tok").asc())
        .limit(20)
    )
    seeded = toks.select(
        "tok",
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("seed"),
    )
    bucket = F.expr(spark_md5_hash("concat(tok, '#', seed)", mod=CM_WIDTH))
    cells = (
        seeded.select("seed", bucket.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cell_n"))
    )
    probes = true_top.select(
        "tok",
        "true_n",
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("seed"),
    ).select("tok", "true_n", "seed", bucket.alias("bucket"))
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("tok", "true_n")
        .agg(F.min("cell_n").alias("cm_est"))
        .select(
            "tok",
            "true_n",
            "cm_est",
            (F.col("cm_est") >= F.col("true_n")).alias("never_undercounts"),
        )
    )


@query(
    "m2_scd2_history",
    oracle="""
WITH versioned AS (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
         LEAD(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS valid_to
  FROM orders
)
SELECT o_custkey, o_orderkey, o_orderstatus, valid_from,
       COALESCE(valid_to, '9999-12-31 00:00:00') AS valid_to,
       (valid_to IS NULL) AS is_current
FROM versioned
""",
)
def m2_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build — the companion to the m1 MERGE: a change
    feed (here each order as a customer-state change) becomes versioned
    rows with [valid_from, valid_to) ranges via LEAD over the per-key
    timeline; the open-ended current row gets the sentinel end and an
    ``is_current`` flag. One partitioned window keyed by the dimension
    key — never a global sort — so history rebuild scales with the
    change feed. Validity bounds are tz-independent formatted strings
    (the q3 precedent for TIMESTAMP_NTZ; they order lexicographically),
    and (o_orderdate, o_orderkey) makes the ordering total under
    same-timestamp changes."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    fmt = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead(fmt).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        fmt.alias("valid_from"),
        F.coalesce(nxt, F.lit("9999-12-31 00:00:00")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "m3_snapshot_diff",
    oracle="""
WITH snap1 AS (
  SELECT o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 7 <> 0
),
snap2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'deleted'
            ELSE 'updated' END AS action,
       a.price AS old_price,
       b.price AS new_price
FROM snap1 a FULL OUTER JOIN snap2 b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.price <> b.price
""",
)
def m3_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff — classify rows as added / deleted / updated
    between two keyed table versions (the batch complement of the m1
    MERGE and m2 SCD2 builds: given *full* snapshots instead of a change
    feed, derive the change feed). One full outer shuffle join on the
    key; unchanged rows are filtered before the exchange output. The two
    snapshots are deterministic slices of orders (key % 7 / % 5) with a
    +10.0 price bump on every third key — exact double arithmetic, no
    float drift. At 100 TB both sides bucket on the key and the join is
    co-partitioned; the anti/semi splits come out of the same single
    join pass."""
    o = load_table(spark, sf_dir, "orders")
    snap1 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    snap2 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 10.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    a = snap1.select(
        F.col("o_orderkey").alias("key_a"), F.col("price").alias("old_price")
    )
    b = snap2.select(
        F.col("o_orderkey").alias("key_b"), F.col("price").alias("new_price")
    )
    joined = a.join(b, a.key_a == b.key_b, "full_outer")
    return joined.filter(
        F.col("key_a").isNull()
        | F.col("key_b").isNull()
        | (F.col("old_price") != F.col("new_price"))
    ).select(
        F.coalesce("key_a", "key_b").alias("o_orderkey"),
        F.when(F.col("key_a").isNull(), "added")
        .when(F.col("key_b").isNull(), "deleted")
        .otherwise("updated")
        .alias("action"),
        "old_price",
        "new_price",
    )


HIST_LO = 0.0    #: histogram domain lower bound (events.value ∈ [0, 100))
HIST_HI = 100.0  #: upper bound
HIST_BUCKETS = 10


@query(
    "a15_value_histogram",
    oracle=f"""
SELECT event_type,
       CAST(least(greatest(floor((value - {HIST_LO}) / (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS})), 0), {HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM events
GROUP BY event_type,
         CAST(least(greatest(floor((value - {HIST_LO}) / (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS})), 0), {HIST_BUCKETS - 1}) AS BIGINT)
""",
)
def a15_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 fixed-width histogram per event type — the profiling companion
    to a13's percentiles: 10 equal buckets over the value domain with
    edge clamping. Bucketing is a pure projection (floor of one double
    expression — identical IEEE ops on both engines, no interpolation,
    so no quantile-drift landmine), and the count is one
    map-side-combinable groupBy whose shuffle carries
    |event_type|×|buckets| rows. At 100 TB this is THE cheap
    distribution sketch: one pass, fixed output size."""
    ev = load_table(spark, sf_dir, "events")
    step = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = F.least(
        F.greatest(F.floor((F.col("value") - HIST_LO) / step), F.lit(0)),
        F.lit(HIST_BUCKETS - 1),
    ).cast("bigint")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


M4_CUTOFF = "2024-01-20"  #: base/delta boundary for the incremental merge


@query(
    "m4_incremental_agg",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def m4_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 incremental aggregate maintenance — the materialized-view
    refresh pattern: a BASE aggregate (events before the cutoff,
    pre-aggregated to (day, event_type) partials) is merged with a DELTA
    batch (raw events on/after the cutoff) WITHOUT touching base fact
    rows: union the base partials with the delta's partials and re-reduce.
    Works because sum/count are algebraic (mergeable); avg is derived
    from the merged (sum, count) at the very end — never averaged across
    partials. At 100 TB this is the difference between an O(day) nightly
    refresh and an O(corpus) recompute; the same merge tree is how Spark
    itself does partial aggregation, applied here across TIME instead of
    across partitions. The oracle IS the full recompute — the driver
    check proves merge == recompute. DECIMAL(18,2) sums keep the merge
    order-free and bit-exact (registry determinism rules).

    The m-family: m1 MERGE upsert, m2 SCD2, m3 snapshot diff, m4
    incremental aggregate maintenance."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.col("ts"),
    )
    cutoff = F.lit(M4_CUTOFF).cast("timestamp")
    partial = (
        lambda df: df.groupBy("day", "event_type").agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("v").alias("sum_v"),
        )
    )
    base = partial(ev.filter(F.col("ts") < cutoff))     # stored MV partials
    delta = partial(ev.filter(F.col("ts") >= cutoff))   # tonight's batch
    merged = (
        base.unionAll(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_v").alias("sum_v"),
        )
    )
    return merged.select(
        "day",
        "event_type",
        "n_events",
        F.col("sum_v").cast("double").alias("total_value"),
        F.round(F.col("sum_v").cast("double") / F.col("n_events"), 6).alias(
            "avg_value"
        ),
    )


@query("x8_hll_sketch_union")
def x8_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 mergeable HLL sketches — the pre-aggregation pattern that makes
    COUNT(DISTINCT) feasible at 100 TB: each shard (here: day) builds a
    DataSketches HLL sketch of its user ids (``hll_sketch_agg``, one
    narrow pass, fixed ~KB state per group), and the corpus-level
    distinct count is the ``hll_union_agg`` of the shard sketches — no
    re-scan, no exact-distinct shuffle of raw ids. This is how a
    materialized rollup serves "unique users per type, any date range"
    from stored per-day sketches. a12 is the one-shot approx tier; THIS
    is the mergeable/storable tier.

    Rows-only by design (sketch internals aren't ANSI SQL); the laws —
    union-of-shard-sketches == direct sketch (register max-merge is
    deterministic) and estimate within 5% of exact — are pinned in
    tests/test_stats_approx.py."""
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        per_day.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
            F.count("*").cast("bigint").alias("n_shards"),
        )
        .select("event_type", "est_users", "n_shards")
    )


@query(
    "a16_regression_stats",
    oracle="""
WITH pts AS (
  SELECT event_type,
         CAST(hour(ts) AS BIGINT) AS x,
         CAST(value AS DECIMAL(18,2)) AS y
  FROM events
),
sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr
FROM sums
""",
)
def a16_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 regression/correlation aggregates — least-squares slope,
    intercept, and Pearson r of event value vs hour-of-day, per event
    type. The built-in ``regr_slope``/``corr`` aggregates are NOT used:
    their streaming float accumulation is engine-order-dependent, so the
    cross-engine contract is instead derived from EXACT sufficient
    statistics — x is an integer, y a DECIMAL(18,2), so n, Σx, Σy, Σxy,
    Σx², Σy² are all exact and order-free; the regression formulas then
    run as ONE identical double expression on both engines (registry
    float-determinism rule (c): derive floats from exact sums at the
    end). Distributed shape: one map-side-combinable groupBy carrying
    six numbers per group — the same "sufficient statistics, not rows"
    pattern x8 uses for sketches and m4 uses for merge trees.

    Reference parity: offline metric fits over per-fold scores
    (src/util.py:148-154 aggregates scalar metric series)."""
    pts = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr"),
    )


WINSOR_Q = 0.99  #: winsorization quantile (p99 clip)


@query(
    "a17_winsorized_stats",
    oracle=f"""
WITH cents AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
),
cut AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         (list_sort(list(v)))[CAST(ceil({WINSOR_Q} * COUNT(*)) AS BIGINT)] AS p99_cents
  FROM cents GROUP BY event_type
)
SELECT c.event_type,
       cut.n,
       cut.p99_cents,
       CAST(SUM(LEAST(c.v, cut.p99_cents)) AS BIGINT) AS winsor_sum_cents,
       CAST(SUM(CASE WHEN c.v > cut.p99_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM cents c JOIN cut ON c.event_type = cut.event_type
GROUP BY c.event_type, cut.n, cut.p99_cents
""",
)
def a17_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 winsorized (clipped) aggregates — robust statistics for
    heavy-tailed metrics: values above the per-group p99 are clipped to
    it before summing, the standard guard against a single whale row
    dominating a mean (revenue metrics, token counts, session lengths
    all need this at 100 TB). The quantile is the DISCRETE rank
    statistic — element ceil(q·n) of the sorted integer-cents list —
    never the interpolated percentile (landmine 19: interpolation
    formulas differ across engines; a discrete order statistic of
    integers is bit-exact). All arithmetic in integer cents.

    Scale shape: the per-group sorted-list quantile shown here is the
    oracle-checkable form (group = 5 event types, bounded); at corpus
    scale the cut row swaps to approx_percentile (a13b's tier) and the
    clip pass is unchanged — clip-and-sum stays one broadcast join +
    one map-side-combinable aggregate."""
    cents = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    )
    cut = cents.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(
            f"element_at(array_sort(collect_list(v)), "
            f"CAST(ceil({WINSOR_Q} * count(*)) AS INT))"
        ).alias("p99_cents"),
    )
    return (
        cents.join(F.broadcast(cut), "event_type")
        .groupBy("event_type", "n", "p99_cents")
        .agg(
            F.sum(F.least(F.col("v"), F.col("p99_cents")))
            .cast("bigint")
            .alias("winsor_sum_cents"),
            F.sum(F.when(F.col("v") > F.col("p99_cents"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped"),
        )
        .select("event_type", "n", "p99_cents", "winsor_sum_cents", "n_clipped")
    )


@query(
    "m5_changefeed_apply",
    oracle="""
WITH feed AS (
  SELECT o_orderkey % 1000 AS key,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 11 = 0 THEN 'delete'
              WHEN o_orderkey % 3 = 0 THEN 'update'
              ELSE 'insert' END AS op,
         CAST(o_totalprice AS DECIMAL(18,2)) AS payload
  FROM orders
),
latest AS (
  SELECT key, seq, op, payload
  FROM feed
  QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) = 1
)
SELECT key, CAST(seq AS BIGINT) AS last_seq, op AS last_op,
       CAST(payload AS DOUBLE) AS price
FROM latest
WHERE op <> 'delete'
""",
)
def m5_changefeed_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 ordered change-feed application — the m-family's multi-change
    member: a CDC feed carries MANY operations per key (insert/update/
    delete, ordered by a sequence number); applying it means keeping
    each key's LATEST operation and dropping keys whose last op is a
    delete — last-writer-wins compaction, the exact semantics of a
    Kafka-compacted topic replay or a Debezium snapshot apply (m1
    handles the one-change-per-key upsert batch; real feeds aren't that
    polite). The feed is synthesized deterministically from orders
    (key = orderkey % 1000 → ~15 changes per key at sf0.01).

    Plan: ONE window partitioned by key ordered by seq desc — the
    shuffle is on the key (co-partitionable with the target table), and
    per-partition state is a key's change history, never the feed. At
    100 TB the same plan runs per ingest bucket; the window is the
    standard replacement for a per-key reduce loop."""
    o = load_table(spark, sf_dir, "orders")
    feed = o.select(
        (F.col("o_orderkey") % 1000).alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 11 == 0, "delete")
        .when(F.col("o_orderkey") % 3 == 0, "update")
        .otherwise("insert")
        .alias("op"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("payload"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("key").orderBy(F.desc("seq"))
    )
    return (
        feed.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("op") != "delete"))
        .select(
            "key",
            F.col("seq").cast("bigint").alias("last_seq"),
            F.col("op").alias("last_op"),
            F.col("payload").cast("double").alias("price"),
        )
    )


# --- m6: right-to-be-forgotten deletion propagation ---------------------
#: m6 deterministic corpus augmentation + deletion rule. Every COPY_MOD-th
#: document gets a verbatim copy (doc_id + COPY_OFFSET) — the seeded-
#: duplicate idiom of decontam.py — so survivor groups with >1 member
#: exist even on an all-unique fixture; the deletion list is every
#: DELETE_MOD-th doc_id of the AUGMENTED corpus. COPY_OFFSET % DELETE_MOD
#: == 1, so an original and its copy are never both deleted — the
#: "fallback winner" case is always observable.
M6_COPY_MOD = 13
M6_DELETE_MOD = 7
M6_COPY_OFFSET = 1_000_000


@query(
    "m6_deletion_propagation",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {M6_COPY_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % {M6_COPY_MOD} = 0
),
g AS (
  SELECT md5(text) AS content_key, doc_id,
         (doc_id % {M6_DELETE_MOD} = 0) AS deleted
  FROM corpus
)
SELECT content_key,
       MIN(doc_id) AS old_keep_id,
       MIN(CASE WHEN NOT deleted THEN doc_id END) AS new_keep_id,
       COUNT(*) AS n_copies_before,
       CAST(SUM(CASE WHEN deleted THEN 0 ELSE 1 END) AS BIGINT)
         AS n_copies_after,
       (MIN(doc_id) <> COALESCE(
          MIN(CASE WHEN NOT deleted THEN doc_id END), -1)) AS winner_changed
FROM g
GROUP BY content_key
""",
)
def m6_deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 deletion propagation — the right-to-be-forgotten pass over a
    deduplicated corpus: applying a deletion list to the RAW corpus must
    also repair every DERIVED table, and the exact-dedup survivor set
    (e1b) is the canonical derived table. For each content group: the
    winner before deletion (min doc_id, e1b's keep policy), the winner
    AFTER (min over surviving members — a deleted winner falls back to
    the next copy; NULL when the whole group is deleted), copy counts
    before/after, and whether the canonical document changed (a changed
    winner means downstream artifacts keyed on keep_id must be
    recomputed — the propagation signal a GDPR pipeline acts on).

    The fixture corpus is all-unique, so multi-member groups are seeded
    deterministically (every {M6_COPY_MOD}th doc gets a verbatim copy at
    doc_id + {M6_COPY_OFFSET}); all four group outcomes occur: untouched
    singleton, fully-deleted singleton (new_keep_id NULL), pair with
    surviving winner, pair whose winner is deleted (fallback).

    Plan: the augmentation is a union of two scans of the same parquet
    (no shuffle); the whole repair is ONE hash exchange on the content
    key with every aggregate map-side combinable — at 100 TB this is a
    linear pass, and the deletion list would arrive as a broadcast-able
    keyset instead of a modulus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionAll(
        docs.filter(F.col("doc_id") % M6_COPY_MOD == 0).select(
            (F.col("doc_id") + M6_COPY_OFFSET).alias("doc_id"), "text"
        )
    )
    g = corpus.select(
        F.md5("text").alias("content_key"),
        "doc_id",
        (F.col("doc_id") % M6_DELETE_MOD == 0).alias("deleted"),
    )
    agg = g.groupBy("content_key").agg(
        F.min("doc_id").alias("old_keep_id"),
        F.min(F.when(~F.col("deleted"), F.col("doc_id"))).alias("new_keep_id"),
        F.count("*").alias("n_copies_before"),
        F.sum(F.when(F.col("deleted"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_copies_after"),
    )
    return agg.select(
        "content_key",
        "old_keep_id",
        "new_keep_id",
        "n_copies_before",
        "n_copies_after",
        (
            F.col("old_keep_id")
            != F.coalesce(F.col("new_keep_id"), F.lit(-1))
        ).alias("winner_changed"),
    )
