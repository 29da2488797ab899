"""The reference's signature ETL: multi-field text combination under a token
budget (SURVEY.md §2.8 F8, §3.1 step 2 — ``data_helper.py:41-86``).

``combine_text`` concatenates title + asr + ocr into one fixed-budget token
sequence: the budget cascades field-to-field (title first, then asr, then
ocr gets what remains), and any field over its cap is truncated
*head+tail* — keep the first ⌈k/2⌉ and last ⌊k/2⌋ tokens, drop the middle
(``cut_min``, ``data_helper.py:44-50``).

Implemented as pure array expressions (slice/concat with computed bounds) —
one narrow pass, no UDF, no shuffle. The oracle mirrors the same cascade in
DuckDB list functions, so every branch of the gnarly when-ladder is
hash-checked (SURVEY §7 hard-part (d): highest test density here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

BUDGET = 40  #: total token budget (reference: 256, config.py:53)


def head_tail_spark(arr: str, cap: str) -> str:
    """Spark SQL: keep first ⌈cap/2⌉ + last ⌊cap/2⌋ of ``arr`` when over
    ``cap``; identity when within budget; empty when cap <= 0."""
    return f"""
    CASE
      WHEN size({arr}) <= ({cap}) THEN {arr}
      WHEN ({cap}) <= 0 THEN array()
      ELSE concat(
        slice({arr}, 1, cast(ceil(({cap}) / 2.0) as int)),
        CASE WHEN cast(floor(({cap}) / 2.0) as int) > 0
             THEN slice({arr}, -cast(floor(({cap}) / 2.0) as int), cast(floor(({cap}) / 2.0) as int))
             ELSE array() END)
    END"""


def head_tail_duck(arr: str, cap: str) -> str:
    return f"""
    CASE
      WHEN len({arr}) <= ({cap}) THEN {arr}
      WHEN ({cap}) <= 0 THEN []
      ELSE list_concat(
        list_slice({arr}, 1, cast(ceil(({cap}) / 2.0) as int)),
        CASE WHEN cast(floor(({cap}) / 2.0) as int) > 0
             THEN list_slice({arr}, -cast(floor(({cap}) / 2.0) as int), -1)
             ELSE [] END)
    END"""


#: Field split: synthesize (title, asr, ocr) from the document token stream
#: — title = tokens 1..10, asr = 11..30, ocr = rest (stand-ins for the A1
#: annotation fields).
_SPARK_FIELDS = {
    "title": "slice(toks, 1, 10)",
    "asr": "slice(toks, 11, 20)",
    "ocr": "CASE WHEN size(toks) > 30 THEN slice(toks, 31, size(toks) - 30) ELSE array() END",
}
_DUCK_FIELDS = {
    "title": "list_slice(toks, 1, 10)",
    "asr": "list_slice(toks, 11, 30)",
    "ocr": "CASE WHEN len(toks) > 30 THEN list_slice(toks, 31, len(toks)) ELSE [] END",
}


def _cascade_sql(fields: dict[str, str], head_tail, size_fn: str, b: int) -> dict[str, str]:
    """Build the cascade expressions: caps and kept arrays per field."""
    t, a, o = fields["title"], fields["asr"], fields["ocr"]
    cap_t = f"least({size_fn}({t}), {b})"
    cap_a = f"least({size_fn}({a}), {b} - ({cap_t}))"
    cap_o = f"least({size_fn}({o}), {b} - ({cap_t}) - ({cap_a}))"
    return {
        "keep_t": head_tail(t, cap_t),
        "keep_a": head_tail(a, cap_a),
        "keep_o": head_tail(o, cap_o),
    }


@query(
    "f8_budget_cascade",
    oracle=f"""
WITH toksrc AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
  FROM documents
),
kept AS (
  SELECT doc_id,
         {_cascade_sql(_DUCK_FIELDS, head_tail_duck, 'len', BUDGET)['keep_t']} AS keep_t,
         {_cascade_sql(_DUCK_FIELDS, head_tail_duck, 'len', BUDGET)['keep_a']} AS keep_a,
         {_cascade_sql(_DUCK_FIELDS, head_tail_duck, 'len', BUDGET)['keep_o']} AS keep_o
  FROM toksrc
)
SELECT doc_id,
       len(keep_t) AS n_title,
       len(keep_a) AS n_asr,
       len(keep_o) AS n_ocr,
       len(keep_t) + len(keep_a) + len(keep_o) AS n_total,
       array_to_string(list_concat(list_concat(keep_t, keep_a), keep_o), ' ') AS combined
FROM kept
""",
)
def f8_budget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 budgeted truncation cascade (``data_helper.py:41-70``): title
    keeps up to the full budget, asr gets what title left, ocr the rest;
    each field head+tail-truncated to its cap. ``n_total <= BUDGET``
    always — the invariant the reference asserts (``data_helper.py:76-78``)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> length(x) > 0)").alias("toks"),
    )
    c = _cascade_sql(_SPARK_FIELDS, head_tail_spark, "size", BUDGET)
    kept = toks.select(
        "doc_id",
        F.expr(c["keep_t"]).alias("keep_t"),
        F.expr(c["keep_a"]).alias("keep_a"),
        F.expr(c["keep_o"]).alias("keep_o"),
    )
    return kept.select(
        "doc_id",
        F.size("keep_t").cast("bigint").alias("n_title"),
        F.size("keep_a").cast("bigint").alias("n_asr"),
        F.size("keep_o").cast("bigint").alias("n_ocr"),
        (F.size("keep_t") + F.size("keep_a") + F.size("keep_o"))
        .cast("bigint")
        .alias("n_total"),
        F.concat_ws(" ", F.concat(F.concat("keep_t", "keep_a"), "keep_o")).alias(
            "combined"
        ),
    )


def prepare_text_features(
    annotations: DataFrame, budget: int = 256, vocab_mod: int = 30522
) -> DataFrame:
    """The full §3.1-step-2 ETL DAG on real annotation-shaped input
    (A1 schema: id, title, asr, ocr array<struct<text>>, category_id):

    ocr flatten (P1) → per-field tokenization → budget cascade (F8) →
    hash-token ids (F7 simplified) → pad to ``budget`` with mask (F9/O3).

    Returns columns: id, input_ids array<int>, attention_mask array<int>,
    n_tokens. Used by tests/test_etl.py on reference-shaped fixtures; the
    cascade core is oracle-checked via ``f8_budget_cascade``."""
    flat_ocr = F.concat_ws(" ", F.expr("transform(ocr, x -> x.text)"))
    toks = lambda c: F.expr(  # noqa: E731
        f"filter(split({c}, ' '), x -> length(x) > 0)"
    )
    fields = {
        "title": "filter(split(title, ' '), x -> length(x) > 0)",
        "asr": "filter(split(asr, ' '), x -> length(x) > 0)",
        "ocr": "filter(split(ocr_flat, ' '), x -> length(x) > 0)",
    }
    c = _cascade_sql(fields, head_tail_spark, "size", budget)
    combined = f"concat(concat({c['keep_t']}, {c['keep_a']}), {c['keep_o']})"
    token_ids = (
        f"transform({combined}, t -> cast(aggregate(transform(sequence(1, length(t)), "
        f"i -> ascii(substring(t, i, 1))), 0L, (a, ch) -> (a * 31 + ch) % {vocab_mod}) as int))"
    )
    padded = (
        f"concat({token_ids}, array_repeat(0, {budget} - size({combined})))"
    )
    mask = (
        f"concat(array_repeat(1, size({combined})), "
        f"array_repeat(0, {budget} - size({combined})))"
    )
    return annotations.withColumn("ocr_flat", flat_ocr).select(
        "id",
        F.expr(padded).alias("input_ids"),
        F.expr(mask).alias("attention_mask"),
        F.expr(f"size({combined})").cast("int").alias("n_tokens"),
    )


@query(
    "f19_minmax_scale",
    oracle="""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
  FROM events
),
stats AS (
  SELECT event_type,
         MIN(v_cents) AS min_c, MAX(v_cents) AS max_c
  FROM cents GROUP BY event_type
)
SELECT event_id, cents.event_type,
       CAST(floor((v_cents - min_c) * 10000.0 / (max_c - min_c)) AS BIGINT)
         AS scaled_bp
FROM cents JOIN stats ON cents.event_type = stats.event_type
""",
)
def f19_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 min-max feature scaling — per-group normalization of a metric
    into [0, 10000] basis points, the standard feature-engineering
    rescale before model input (the batch analog of the reference's
    per-feature normalization inside its torch models). Exactness
    physics: values become integer CENTS first (DECIMAL(18,2) × 100 —
    exact), min/max are integer aggregates, and the scale is ONE
    identical IEEE division floor()'d to integer basis points — the
    same float-emission rule e26 uses (round-6 would sit on decimal .5
    boundaries).

    Plan: one map-side-combinable stats aggregate (2 numbers per group),
    broadcast back onto the stream — the fact table is scanned once and
    never shuffled (AQE broadcasts the 5-row stats side)."""
    cents = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v_cents"),
    )
    stats = cents.groupBy("event_type").agg(
        F.min("v_cents").alias("min_c"), F.max("v_cents").alias("max_c")
    )
    return cents.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.floor(
            (F.col("v_cents") - F.col("min_c"))
            * 10000.0
            / (F.col("max_c") - F.col("min_c"))
        )
        .cast("bigint")
        .alias("scaled_bp"),
    )


@query(
    "f20_robust_scale",
    oracle="""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
  FROM events
),
hist AS (
  SELECT event_type, v_cents, COUNT(*) AS cnt
  FROM cents GROUP BY event_type, v_cents
),
cum AS (
  SELECT event_type, v_cents, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c
  FROM hist
),
grp AS (SELECT event_type, SUM(cnt) AS n FROM hist GROUP BY event_type),
stats AS (
  SELECT cum.event_type,
         MIN(CASE WHEN c >= (n - 1) // 4 + 1     THEN v_cents END) AS p25,
         MIN(CASE WHEN c >= (n - 1) // 2 + 1     THEN v_cents END) AS med,
         MIN(CASE WHEN c >= (n - 1) * 3 // 4 + 1 THEN v_cents END) AS p75
  FROM cum JOIN grp USING (event_type)
  GROUP BY cum.event_type
)
SELECT event_id, cents.event_type,
       CAST(CASE WHEN p75 = p25 THEN 0
                 ELSE floor((v_cents - med) * 10000.0 / (p75 - p25)) END
            AS BIGINT) AS robust_bp
FROM cents JOIN stats ON cents.event_type = stats.event_type
""",
)
def f20_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 robust feature scaling — (value − median) / IQR per group,
    the outlier-resistant sibling of f19's min-max (sklearn
    RobustScaler). Exactness physics: values become integer CENTS, the
    three quartiles are DISCRETE order statistics (the element at
    1-based rank floor((n−1)·q)+1 — integers, no interpolation, so no
    cross-engine 1-ulp drift), and the output is ONE identical IEEE
    division floor()'d to basis points (f19's emission rule). IQR=0
    groups emit 0.

    Scale shape: the quantiles come from the per-group VALUE HISTOGRAM
    — groupBy (group, cents) is map-side combinable and its size is
    bounded by the value domain, not the row count; the running-count
    window runs over that bounded histogram (never the fact table), and
    the 3-number stats row per group broadcasts back onto a single fact
    scan. This is how exact quantiles survive 100 TB: reduce to the
    value domain first (a15's histogram discipline), sort only that."""
    from pyspark.sql.window import Window

    cents = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v_cents"),
    )
    hist = cents.groupBy("event_type", "v_cents").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("v_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("c", F.sum("cnt").over(w))
    grp = hist.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    stats = (
        cum.join(F.broadcast(grp), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("c") >= F.floor((F.col("n") - 1) / 4) + 1, F.col("v_cents")
                )
            ).alias("p25"),
            F.min(
                F.when(
                    F.col("c") >= F.floor((F.col("n") - 1) / 2) + 1, F.col("v_cents")
                )
            ).alias("med"),
            F.min(
                F.when(
                    F.col("c") >= F.floor((F.col("n") - 1) * 3 / 4) + 1,
                    F.col("v_cents"),
                )
            ).alias("p75"),
        )
    )
    return cents.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.when(F.col("p75") == F.col("p25"), F.lit(0))
        .otherwise(
            F.floor(
                (F.col("v_cents") - F.col("med"))
                * 10000.0
                / (F.col("p75") - F.col("p25"))
            )
        )
        .cast("bigint")
        .alias("robust_bp"),
    )
