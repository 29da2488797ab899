"""End-to-end corpus curation pipeline (LLM-pipeline north star).

The reference's data prep runs as a sequence of standalone steps (text
assembly + budgeting ``data_helper.py:41-70``, tokenize/pad ``:55-57,94``
before training); the
large-scale equivalent is ONE declarative funnel the optimizer can see
whole: quality gate → exact dedup (deterministic keep policy) → shard-local
sequence packing → per-source retention accounting. Composing the stages in
a single plan matters at 100 TB: Catalyst pushes the quality predicates
into the parquet scan (docs failing the gate are never hashed, deduped, or
packed), the dedup window and the packing window reuse the same
quality-filtered intermediate, and nothing materializes between stages.

Stage physics (each documented at its home operator):
- quality gate (textstats.e4d): narrow, no shuffle, scan-pushed;
- exact dedup (dedup.e1b): one shuffle on the md5 content key,
  keep-min-doc_id via a partitioned window (bounded partitions — a
  content key's group is the duplicate count, never the corpus);
- packing (packing.e6): one partitioned window per source shard;
- accounting: partial-aggregated groupBy on source.

All-integer outputs → bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.operators.packing import PACK_BUDGET
from wx20222_bigdata_spark.registry import query


def quality_features(docs: DataFrame) -> DataFrame:
    """The funnel's stage-1 features over (doc_id, source, text) rows:
    md5 content key + the quality-gate signals (token/char/punct counts).
    Narrow, no shuffle — shared by the batch funnel (e7), its
    accounting-only twin (e7c), and the streaming funnel
    (streaming/jobs.make_curation_funnel_batch), so all three gates are
    the same expressions by construction."""
    words = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    return docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("content_key"),
        F.size(words).cast("bigint").alias("n_tok"),
        F.length("text").alias("n_char"),
        (
            F.length("text")
            - F.length(
                F.regexp_replace(
                    F.regexp_replace(F.regexp_replace("text", r"\.", ""), ",", ""),
                    "!",
                    "",
                )
            )
        ).alias("n_punct"),
    )


def quality_gate(feats: DataFrame) -> DataFrame:
    """Stage-2 quality predicate (Gopher/C4-style length + punct-ratio
    heuristics, same gate as e4d)."""
    return feats.filter(
        (F.col("n_tok") >= 20)
        & (F.col("n_tok") <= 1000)
        & (F.col("n_punct").cast("double") / F.col("n_char") < 0.1)
    )


@query(
    "e7_curation_pipeline",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, source, md5(text) AS content_key,
         len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_tok,
         length(text) AS n_char,
         length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', '')) AS n_punct
  FROM documents
),
quality AS (
  SELECT * FROM feats
  WHERE n_tok >= 20 AND n_tok <= 1000
    AND CAST(n_punct AS DOUBLE) / n_char < 0.1
),
survivors AS (
  SELECT doc_id, source, n_tok
  FROM (
    SELECT doc_id, source, n_tok,
           ROW_NUMBER() OVER (PARTITION BY content_key ORDER BY doc_id) AS rn
    FROM quality
  )
  WHERE rn = 1
),
packed AS (
  SELECT source, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {PACK_BUDGET} AS bin_id
  FROM survivors
),
raw AS (
  SELECT source, COUNT(*) AS n_raw FROM feats GROUP BY source
),
kept AS (
  SELECT source,
         COUNT(*) AS n_kept,
         CAST(SUM(n_tok) AS BIGINT) AS kept_tokens,
         COUNT(DISTINCT bin_id) AS n_bins
  FROM packed GROUP BY source
),
qcount AS (
  SELECT source, COUNT(*) AS n_quality FROM quality GROUP BY source
)
SELECT raw.source, n_raw,
       COALESCE(n_quality, 0) AS n_quality,
       COALESCE(n_kept, 0) AS n_kept,
       COALESCE(kept_tokens, 0) AS kept_tokens,
       COALESCE(n_bins, 0) AS n_bins
FROM raw LEFT JOIN qcount ON raw.source = qcount.source
         LEFT JOIN kept ON raw.source = kept.source
""",
)
def e7_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 curation funnel per source: raw docs → quality-gated (Gopher/C4
    heuristics, same gate as e4d) → exact-deduped (md5 content key,
    min-doc_id keep policy, same as e1b) → packed into PACK_BUDGET-token
    bins (same contiguous shard-local packing as e6). Output is the
    retention accounting every curation run reports: n_raw -> n_quality ->
    n_kept, plus kept token mass and bin count."""
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs)
    quality = quality_gate(feats)
    dedup_w = Window.partitionBy("content_key").orderBy("doc_id")
    survivors = (
        quality.withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tok")
    )
    pack_w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = survivors.withColumn(
        "_prev_cum", F.coalesce(F.sum("n_tok").over(pack_w), F.lit(0))
    ).select(
        "source",
        "n_tok",
        F.expr(f"_prev_cum div {PACK_BUDGET}").cast("bigint").alias("bin_id"),
    )
    raw = feats.groupBy("source").agg(F.count("*").alias("n_raw"))
    qcount = quality.groupBy("source").agg(F.count("*").alias("n_quality"))
    kept = packed.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("kept_tokens"),
        F.countDistinct("bin_id").alias("n_bins"),
    )
    # LEFT joins: a source whose docs are all gated out still reports its
    # funnel row (n_quality = n_kept = 0) — retention reports must show
    # what vanished, not drop the row.
    return (
        raw.join(qcount, "source", "left")
        .join(kept, "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            F.coalesce("n_bins", F.lit(0)).alias("n_bins"),
        )
    )


@query(
    "e7c_funnel_accounting",
    oracle="""
WITH feats AS (
  SELECT doc_id, source, md5(text) AS content_key,
         len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_tok,
         length(text) AS n_char,
         length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', '')) AS n_punct
  FROM documents
),
quality AS (
  SELECT * FROM feats
  WHERE n_tok >= 20 AND n_tok <= 1000
    AND CAST(n_punct AS DOUBLE) / n_char < 0.1
),
admitted AS (
  SELECT source, n_tok
  FROM (
    SELECT source, n_tok,
           ROW_NUMBER() OVER (PARTITION BY content_key ORDER BY doc_id) AS rn
    FROM quality
  )
  WHERE rn = 1
),
raw AS (SELECT source, COUNT(*) AS n_raw FROM feats GROUP BY source),
qc AS (SELECT source, COUNT(*) AS n_quality FROM quality GROUP BY source),
adm AS (
  SELECT source, COUNT(*) AS n_admitted,
         CAST(SUM(n_tok) AS BIGINT) AS admitted_tokens
  FROM admitted GROUP BY source
)
SELECT raw.source, n_raw,
       COALESCE(n_quality, 0) AS n_quality,
       COALESCE(n_admitted, 0) AS n_admitted,
       COALESCE(admitted_tokens, 0) AS admitted_tokens
FROM raw LEFT JOIN qc ON raw.source = qc.source
         LEFT JOIN adm ON raw.source = adm.source
""",
)
def e7c_funnel_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7c — the BATCH TWIN of the streaming curation funnel
    (streaming/jobs.make_curation_funnel_batch): per-source retention
    accounting of quality gate → first-occurrence admission, computed
    declaratively over the whole corpus. The streaming funnel's
    persistent accounting state after an ordered availableNow pass must
    equal this exactly (law: tests/test_streaming.py — admission by
    first ARRIVAL equals admission by min doc_id when batches arrive in
    doc_id order). Same stage helpers (quality_features/quality_gate)
    feed both paths, so the gates cannot drift apart."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs)
    quality = quality_gate(feats)
    w = W.partitionBy("content_key").orderBy("doc_id")
    admitted = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "n_tok")
    )
    raw = feats.groupBy("source").agg(F.count("*").alias("n_raw"))
    qc = quality.groupBy("source").agg(F.count("*").alias("n_quality"))
    adm = admitted.groupBy("source").agg(
        F.count("*").alias("n_admitted"),
        F.sum("n_tok").cast("bigint").alias("admitted_tokens"),
    )
    return (
        raw.join(qc, "source", "left")
        .join(adm, "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_admitted", F.lit(0)).alias("n_admitted"),
            F.coalesce("admitted_tokens", F.lit(0)).alias("admitted_tokens"),
        )
    )


@query(
    "e30_dataset_card",
    oracle="""
WITH feats AS (
  SELECT doc_id, source, lang, md5(text) AS content_key,
         len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_tok
  FROM documents
),
card AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         CAST(COUNT(DISTINCT content_key) AS BIGINT) AS n_unique_docs,
         (list_sort(list(n_tok)))[CAST(ceil(0.5 * COUNT(*)) AS BIGINT)] AS p50_tokens,
         CAST(SUM(CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_length_band
  FROM feats
)
SELECT n_docs, n_sources, n_langs, total_tokens, n_unique_docs,
       CAST(floor((n_docs - n_unique_docs) * 10000.0 / n_docs) AS BIGINT) AS dup_rate_bp,
       p50_tokens, n_in_length_band
FROM card
""",
)
def e30_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E30 dataset card — the one-row corpus summary a curation run
    publishes with its output (HuggingFace dataset-card / Datasheets
    shape): volume, source/language diversity, token mass, exact-dup
    rate, median document length, and the length-band population the
    quality gate (e7) will keep. ONE scan computes every number — each
    statistic is a column of the same wide aggregate, so adding a card
    field costs a projection, not a pass (dq1's rule-fusion discipline
    applied to reporting). Dup rate is emitted in floor()'d basis
    points (landmine 22) and the median is the discrete order statistic
    (landmine 19). The one-row output is the documented bounded
    SinglePartition shape; at 100 TB the sorted-list median swaps to
    approx_percentile exactly as a17 documents."""
    feats = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.md5("text").alias("content_key"),
        F.size(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).cast("bigint").alias("n_tok"),
    )
    card = feats.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.countDistinct("content_key").cast("bigint").alias("n_unique_docs"),
        F.expr(
            "element_at(array_sort(collect_list(n_tok)), "
            "CAST(ceil(0.5 * count(*)) AS INT))"
        ).alias("p50_tokens"),
        F.sum(F.when(F.col("n_tok").between(20, 1000), 1).otherwise(0))
        .cast("bigint")
        .alias("n_in_length_band"),
    )
    return card.select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_tokens",
        "n_unique_docs",
        F.floor(
            (F.col("n_docs") - F.col("n_unique_docs"))
            * 10000.0
            / F.col("n_docs")
        )
        .cast("bigint")
        .alias("dup_rate_bp"),
        "p50_tokens",
        "n_in_length_band",
    )
