"""Projections, predicates, and the scalar function surface
(SURVEY.md §2.2, §2.8) — all pure, narrow transformations: no shuffle, fully
pipelined inside whole-stage codegen, filters eligible for parquet pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


@query(
    "p1_flatten_concat",
    oracle="""
SELECT doc_id,
       array_to_string(list_transform(string_split(text, ' '), x -> upper(x)), ' ') AS flat_text,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
""",
)
def p1_flatten_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 flatten-concat of a nested text collection — the ocr[]->text merge
    (``data_helper.py:31-35``): split to array, per-element transform,
    concat back. Higher-order functions run JVM-side in codegen, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.concat_ws(" ", F.transform(toks, lambda x: F.upper(x))).alias("flat_text"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )


@query(
    "p2_derive_drop",
    oracle="""
SELECT doc_id,
       lang,
       n_chars,
       len(string_split(text, ' ')) AS n_words,
       n_chars >= 200 AS is_long
FROM documents
""",
)
def p2_derive_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 derive-and-drop (``data_helper.py:27-39`` pops ``category_id``,
    attaches derived columns): add ``n_words``/``is_long``, drop
    ``text``/``source`` — Catalyst prunes the dropped columns out of the
    scan entirely."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_words", F.size(F.split(F.col("text"), " ")).cast("bigint"))
        .withColumn("is_long", F.col("n_chars") >= 200)
        .drop("text", "source")
    )


@query(
    "p3_dict_encode",
    oracle="""
WITH dim(label, code) AS (
  VALUES (0,'C00'),(1,'C01'),(2,'C02'),(3,'C03'),(4,'C04'),
         (5,'C05'),(6,'C06'),(7,'C07'),(8,'C08'),(9,'C09')
)
SELECT e.vec_id, d.code
FROM embeddings e JOIN dim d ON e.label = d.label
""",
)
def p3_dict_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 dictionary encode (``category_id_map.py:39-41``): broadcast join
    against an in-memory dimension — the Spark-native form of a dict lookup.
    At 100 TB the dim is broadcast once per executor, never shuffled."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = spark.createDataFrame(
        [(i, f"C{i:02d}") for i in range(10)], "label int, code string"
    )
    return emb.join(F.broadcast(dim), "label").select("vec_id", "code")


@query(
    "p4_dict_decode",
    oracle="""
WITH dim(label, code) AS (
  VALUES (0,'C00'),(1,'C01'),(2,'C02'),(3,'C03'),(4,'C04'),
         (5,'C05'),(6,'C06'),(7,'C07'),(8,'C08'),(9,'C09')
),
encoded AS (
  SELECT e.vec_id, d.code FROM embeddings e JOIN dim d ON e.label = d.label
)
SELECT enc.vec_id, d.label AS decoded_label
FROM encoded enc JOIN dim d ON enc.code = d.code
""",
)
def p4_dict_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 dictionary decode (``category_id_map.py:44-46``, used at
    ``inference.py:52``): the inverse broadcast join — encode then decode
    round-trips the label."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = spark.createDataFrame(
        [(i, f"C{i:02d}") for i in range(10)], "label int, code string"
    )
    encoded = emb.join(F.broadcast(dim), "label").select("vec_id", "code")
    return encoded.join(F.broadcast(dim), "code").select(
        "vec_id", F.col("label").alias("decoded_label")
    )


@query(
    "p5_prefix_projection",
    oracle="""
SELECT substring(o_orderpriority, 1, 1) AS priority_code,
       CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_num,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2
""",
)
def p5_prefix_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 prefix projection — ``int(category_id[0:2])``
    (``category_id_map.py:34-36``) as substring+cast, here on the
    '1-URGENT'-style priority code."""
    orders = load_table(spark, sf_dir, "orders")
    code = F.substring("o_orderpriority", 1, 1)
    return orders.groupBy(
        code.alias("priority_code"), code.cast("int").alias("priority_num")
    ).agg(F.count("*").alias("n"))


@query(
    "p7_substring_predicates",
    oracle="""
SELECT p_partkey, p_type, p_brand
FROM part
WHERE contains(p_type, 'BRASS') AND NOT contains(p_name, 'green') AND p_size >= 10
""",
)
def p7_substring_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 substring-containment predicates with negation + conjunction —
    the parameter-name partition of ``util.py:34-48`` ('bias' in n, layer
    match, negation) as relational filters."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").contains("BRASS")
        & ~F.col("p_name").contains("green")
        & (F.col("p_size") >= 10)
    ).select("p_partkey", "p_type", "p_brand")


@query(
    "p8_conditional_gates",
    oracle="""
SELECT doc_id,
       n_chars,
       CASE
         WHEN n_chars > 400 THEN 'truncate_both'
         WHEN n_chars > 250 THEN 'truncate_tail'
         WHEN n_chars > 100 THEN 'keep'
         ELSE 'pad'
       END AS budget_action,
       CASE WHEN n_chars > 400 THEN n_chars - 400 ELSE 0 END AS overflow
FROM documents
""",
)
def p8_conditional_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 conditional length gates — the budgeted-truncation decision
    cascade of ``data_helper.py:63-70`` (`need_cut > 0 and l2 > min_asr_len`)
    as a when/otherwise ladder."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "n_chars",
        F.when(F.col("n_chars") > 400, "truncate_both")
        .when(F.col("n_chars") > 250, "truncate_tail")
        .when(F.col("n_chars") > 100, "keep")
        .otherwise("pad")
        .alias("budget_action"),
        F.when(F.col("n_chars") > 400, F.col("n_chars") - 400)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("overflow"),
    )


@query(
    "s1_json_roundtrip",
    oracle="""
SELECT event_id,
       event_type,
       CAST(json_extract(props, '$.k') AS INT) AS prop_k
FROM events
""",
)
def s1_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 JSON scan semantics (``json.load`` at ``data_helper.py:89-90``)
    without touching disk: serialize each row to a JSON document with
    ``to_json``, re-parse with ``from_json`` under an explicit schema
    (production JSON reads always declare schemas — SURVEY §1.2), and
    extract a nested field from the embedded ``props`` JSON."""
    events = load_table(spark, sf_dir, "events")
    doc_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("props", T.StringType()),
        ]
    )
    as_json = events.select(
        F.to_json(F.struct("event_id", "event_type", "props")).alias("js")
    )
    parsed = as_json.select(F.from_json("js", doc_schema).alias("r")).select("r.*")
    return parsed.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@query(
    "s4_csv_line_parse",
    oracle="""
WITH lines AS (
  SELECT CONCAT(CAST(vec_id AS VARCHAR), ',', CAST(label AS VARCHAR)) AS line
  FROM embeddings
)
SELECT CAST(string_split(trim(line), ',')[1] AS BIGINT) AS vid,
       CAST(string_split(trim(line), ',')[2] AS INT) AS category_id
FROM lines
""",
)
def s4_csv_line_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5 CSV line semantics: the reference writes ``f'{vid},{cat}'``
    lines (``inference.py:49-53``) and parses them with
    ``line.strip().split(',')`` (``evaluate.py:8-10``). Round-trip both
    directions in-plan; the file-backed csv source lives in
    ``sources/csv_source.py`` (tested in tests/)."""
    emb = load_table(spark, sf_dir, "embeddings")
    lines = emb.select(
        F.concat_ws(",", F.col("vec_id").cast("string"), F.col("label").cast("string")).alias(
            "line"
        )
    )
    parts = F.split(F.trim(F.col("line")), ",")
    return lines.select(
        parts.getItem(0).cast("bigint").alias("vid"),
        parts.getItem(1).cast("int").alias("category_id"),
    )


@query(
    "f_string_surface",
    oracle="""
SELECT doc_id,
       upper(substring(text, 1, 10)) AS head10,
       length(text) AS text_len,
       length(replace(text, ' ', '')) AS len_no_spaces,
       trim(CONCAT('  ', lang, '  ')) AS lang_trimmed,
       CONCAT(lang, ':', source) AS lang_source
FROM documents
""",
)
def f_string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6 string scalar surface in one projection: concat, substring,
    replace (``data_helper.py:194-196``), trim/strip (``evaluate.py:9``),
    length, case."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.length("text").cast("bigint").alias("text_len"),
        F.length(F.regexp_replace("text", " ", "")).cast("bigint").alias("len_no_spaces"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trimmed"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
    )


@query(
    "f16_datetime_json",
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS event_date,
       CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour,
       CAST(EXTRACT(dow FROM ts) AS INT) AS day_of_week,
       CAST(json_extract(props, '$.k') AS INT) AS prop_k,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM events
""",
)
def f16_datetime_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 date/time + JSON scalars (``time.strftime`` at ``main.py:216-218``;
    fixture ``props`` JSON): formatting, field extraction, epoch conversion.
    Output is strings/ints only — timestamps never cross the oracle boundary
    raw (tz-safety, SURVEY §7)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.hour("ts").cast("int").alias("event_hour"),
        (F.dayofweek("ts") - 1).cast("int").alias("day_of_week"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.unix_timestamp("ts").cast("bigint").alias("epoch_s"),
    )


@query(
    "f_null_semantics",
    oracle="""
WITH e AS (
  SELECT event_id,
         NULLIF(event_type, 'error') AS et_nullable,
         CASE WHEN value < 1.0 THEN NULL ELSE value END AS v_nullable
  FROM events
)
SELECT COUNT(*) AS n_rows,
       COUNT(et_nullable) AS n_et_nonnull,
       COUNT(v_nullable) AS n_v_nonnull,
       CAST(SUM(CASE WHEN et_nullable IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null,
       ROUND(CAST(SUM(CAST(COALESCE(v_nullable, 0.0) AS DECIMAL(18,2))) AS DOUBLE), 2) AS v_sum_coalesced
FROM e
""",
)
def f_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL discipline in one query: NULLIF introduction, COUNT(col)'s
    null-skipping vs COUNT(*), null-safe equality (<=> / IS NOT DISTINCT
    FROM), and COALESCE defaulting — semantics every ETL depends on and
    both engines must agree on exactly."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("et_nullable"),
        F.when(F.col("value") < 1.0, F.lit(None)).otherwise(F.col("value")).alias(
            "v_nullable"
        ),
    )
    return e.agg(
        F.count("*").alias("n_rows"),
        F.count("et_nullable").alias("n_et_nonnull"),
        F.count("v_nullable").alias("n_v_nonnull"),
        F.sum(
            F.when(F.col("et_nullable").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).alias("n_nullsafe_null"),
        F.round(
            F.sum(F.coalesce("v_nullable", F.lit(0.0)).cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ).alias("v_sum_coalesced"),
    )


@query(
    "f_conditional_fns",
    oracle="""
SELECT event_id,
       COALESCE(NULLIF(event_type, 'error'), 'suppressed') AS et_defaulted,
       CASE WHEN NULLIF(event_type, 'error') IS NULL THEN 'was_error' ELSE 'kept' END AS nvl2_style,
       GREATEST(value, 10.0) AS floored_value,
       LEAST(value, 50.0) AS capped_value,
       ROUND(GREATEST(LEAST(value, 50.0), 10.0), 2) AS clamped
FROM events
""",
)
def f_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: nullif/coalesce defaulting, nvl2-style
    branching, greatest/least clamping — the guard expressions the budget
    cascade (P8/F8) is built from, isolated for coverage."""
    ev = load_table(spark, sf_dir, "events")
    et_nullable = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        F.coalesce(et_nullable, F.lit("suppressed")).alias("et_defaulted"),
        F.when(et_nullable.isNull(), "was_error").otherwise("kept").alias("nvl2_style"),
        F.greatest("value", F.lit(10.0)).alias("floored_value"),
        F.least("value", F.lit(50.0)).alias("capped_value"),
        F.round(F.greatest(F.least("value", F.lit(50.0)), F.lit(10.0)), 2).alias(
            "clamped"
        ),
    )


@query(
    "s10_python_datasource",
    oracle="""
SELECT i AS doc_id,
       md5(CAST(i AS VARCHAR)) AS content_md5,
       CAST(concat('0x', substring(md5(CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
FROM range(0, 2000) t(i)
""",
)
def s10_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 custom Python data source (Spark 4 Python Data Source API):
    ``spark.read.format("docgen")`` backed by
    :mod:`wx20222_bigdata_spark.sources.pyds` — a planned, partitioned
    source implemented entirely in Python (8 InputPartitions → 8 scan
    tasks). Because the generated content is md5-derived from the row id,
    the DuckDB oracle regenerates the identical rows from ``range()`` —
    a custom SOURCE with a value-level correctness gate, not just a
    smoke test. ``sf_dir`` is unused: the source IS the data."""
    from wx20222_bigdata_spark.sources.pyds import register_docgen

    register_docgen(spark)
    return (
        spark.read.format("docgen")
        .option("n_rows", 2000)
        .option("n_partitions", 8)
        .load()
    )


@query(
    "f21_variant_json",
    oracle="""
WITH cents AS (
  SELECT event_id, event_type, user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_high,
       CAST(SUM(v_cents) AS BIGINT) AS cents_sum,
       CAST(MAX(user_id) AS BIGINT) AS max_user
FROM cents
WHERE v_cents > 5000
GROUP BY event_type
""",
)
def f21_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 semi-structured VARIANT ingestion (Spark 4 VariantType) — the
    open-schema JSON path every event pipeline needs: rows are serialized
    to JSON documents (standing in for a raw JSON/Kafka feed), parsed
    with ``parse_json`` into a VARIANT column (binary-encoded, NOT
    re-parsed per access — the Spark 4 upgrade over f16's
    ``from_json``-with-declared-schema), and fields are extracted with
    typed ``variant_get`` JSON-path accessors, filtered, and aggregated.
    The oracle computes the same aggregate straight from the typed
    columns, so the ENTIRE serialize→parse→extract round-trip is
    value-checked (a formatting or type-coercion bug anywhere in the
    variant path breaks the hash).

    Scale shape: parse_json + variant_get are JVM expressions inside
    whole-stage codegen (no Python); the aggregate is map-side
    combinable on integer cents. Variant's binary encoding is the
    100 TB answer to schema drift: one parse at ingest, cheap typed
    access after, no schema migration to add a field."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v_cents"),
    )
    raw = ev.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("type"),
                F.struct(
                    F.col("user_id").alias("uid"),
                    F.col("v_cents").alias("cents"),
                ).alias("meta"),
            )
        ).alias("doc")
    )
    v = raw.select(F.parse_json("doc").alias("v"))
    extracted = v.select(
        F.variant_get("v", "$.type", "string").alias("event_type"),
        F.variant_get("v", "$.meta.uid", "bigint").alias("user_id"),
        F.variant_get("v", "$.meta.cents", "bigint").alias("v_cents"),
    )
    return (
        extracted.filter(F.col("v_cents") > 5000)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_high"),
            F.sum("v_cents").cast("bigint").alias("cents_sum"),
            F.max("user_id").cast("bigint").alias("max_user"),
        )
    )
