"""Exact-substring span dedup — corpus-level duplicated-span detection and
trim accounting (SURVEY.md §2.11 curation family; the ExactSubstr pass of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better": any token window that occurs more than once ANYWHERE in the
corpus marks its covered positions as duplicated, and training keeps only
the un-covered remainder).

This is the span-granular sibling of the existing shingle seats: e33
scores per-doc DISTINCT-trigram novelty (a ratio, no positions), e32
dedups whole paragraphs, e10 tests n-grams against an EXTERNAL eval set.
Here every k-gram OCCURRENCE keeps its start offset, so the output is
positional: how many token positions of each document are covered by some
corpus-duplicated window, and how many maximal contiguous spans that
coverage forms — exactly the numbers a trim pass needs.

Scale shape (100 TB): one occurrence row per (doc, start) — linear in
corpus tokens; the duplicate test is a count-over-partition window on the
gram key (ONE hash exchange of the occurrence stream, the same
one-exchange window form that beat the groupBy+join-back at sf10 for
e16/e19 — DF_TABLE_AUDIT.json); coverage explode is bounded by K × the
duplicated occurrences only (the `cnt >= 2` filter runs before the
explode); the per-doc span count reuses the (doc, pos) partitioning laid
down by the distinct. At web scale the gram key would be the 60-bit md5
prefix (functions/hashing.py, cf. e2's production tiers) — the literal
text key here keeps the oracle readable at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

K = 5  #: token-window width; Lee et al. use 50 BPE tokens — 5 fits fixture docs


@query(
    "e36_substring_span_trim",
    oracle=f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS ws
  FROM documents
),
occ AS (
  SELECT doc_id, j, array_to_string(ws[j:j + {K - 1}], ' ') AS g
  FROM words, LATERAL (SELECT unnest(range(1, len(ws) - {K - 2})) AS j)
  WHERE len(ws) >= {K}
),
dup AS (
  SELECT doc_id, j FROM (
    SELECT doc_id, j, COUNT(*) OVER (PARTITION BY g) AS cnt FROM occ
  ) WHERE cnt >= 2
),
cov AS (
  SELECT DISTINCT doc_id, j + d AS pos
  FROM dup, LATERAL (SELECT unnest(range(0, {K})) AS d)
),
runs AS (
  SELECT doc_id,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = pos - 1
              THEN 0 ELSE 1 END AS run_start
  FROM cov
),
cagg AS (
  SELECT doc_id, COUNT(*) AS n_dup_tokens, SUM(run_start) AS n_spans
  FROM runs GROUP BY doc_id
),
base AS (SELECT doc_id, len(ws) AS n_tokens FROM words)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       CAST(COALESCE(c.n_spans, 0) AS BIGINT) AS n_spans,
       CASE WHEN b.n_tokens > 0
            THEN ROUND(COALESCE(c.n_dup_tokens, 0) * 1.0 / b.n_tokens, 6)
       END AS dup_fraction
FROM base b LEFT JOIN cagg c USING (doc_id)
""",
)
def e36_substring_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E36 exact-substring span trim — per document: total token count,
    how many token positions are covered by a word K-gram (K=5) that
    occurs ≥2 times corpus-wide (self-overlap counts — two occurrences
    inside one doc are still a duplicated substring, per Lee et al.),
    the number of maximal contiguous covered spans, and the covered
    fraction. ``n_tokens - n_dup_tokens`` is the post-trim length; the
    integer ratio rounds cross-engine exact (e33 precedent)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return span_trim(docs)


def span_trim(docs: DataFrame) -> DataFrame:
    """Core of e36 over an arbitrary ``(doc_id, text)`` frame — split out
    so the span laws (full coverage of a seeded verbatim run, overlapping
    grams merging into one span, sub-K docs emitting nothing) are testable
    on hand-built corpora (tests/test_substring.py)."""
    words = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> length(x) > 0)").alias("ws"),
    )
    # guard size < K: sequence(1, size-K+1) DESCENDS for short docs
    # (the e33/e2 landmine) — emit no occurrences, matching range().
    occ = (
        words.filter(F.expr(f"size(ws) >= {K}"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {K - 1}),"
                    f" j -> struct(j AS j, concat_ws(' ', slice(ws, j, {K})) AS g))"
                )
            ).alias("o"),
        )
        .select("doc_id", "o.j", "o.g")
    )
    dup = occ.withColumn(
        "cnt", F.count("*").over(Window.partitionBy("g"))
    ).filter(F.col("cnt") >= 2)
    cov = dup.select(
        "doc_id", F.explode(F.expr(f"sequence(j, j + {K - 1})")).alias("pos")
    ).distinct()
    runs = cov.withColumn(
        "run_start",
        F.when(
            F.lag("pos").over(Window.partitionBy("doc_id").orderBy("pos"))
            == F.col("pos") - 1,
            0,
        ).otherwise(1),
    )
    cagg = runs.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_tokens"),
        F.sum("run_start").alias("n_spans"),
    )
    base = words.select("doc_id", F.size("ws").alias("n_tokens"))
    return base.join(cagg, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce("n_dup_tokens", F.lit(0)).cast("bigint").alias("n_dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce("n_dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ),
        ).alias("dup_fraction"),
    )
