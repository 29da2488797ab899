"""Train/eval decontamination — benchmark-overlap detection via n-gram
hash intersection (SURVEY.md §2.11 text-curation family; the standard
LLM-pretraining hygiene pass: any training document sharing long token
n-grams with an evaluation set is flagged and dropped).

Shape at 100 TB: the eval set is tiny (benchmarks are MBs, training data
is TBs), so its distinct 8-gram hash set is **broadcast** and the train
side is scanned exactly once with a broadcast hash join — no shuffle of
the corpus at all; the only exchange is the final per-doc aggregate,
which is partial-aggregated map-side. The 8-gram hash is the cross-engine
md5 prefix (functions/hashing.py), so the whole detection — shingling,
hashing, intersection, ratios — is oracle-exact in DuckDB.

The synthetic corpus has no natural 8-gram overlap (all-distinct word
salad), so contamination is seeded deterministically, mirroring the
dedup mutant-corpus idiom: every 29th document is the "eval set"; the
train side is the remaining documents plus (a) full leaks — eval text
verbatim behind a marker prefix, id+200000 — and (b) partial leaks — a
neighbouring train doc with the eval doc's first 24 tokens appended,
id+300000. Full leaks score contamination_ratio ≈ 1, partial leaks an
intermediate ratio, clean docs never appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.functions.hashing import (
    MOD,
    duck_md5_hash,
    spark_md5_hash,
)
from wx20222_bigdata_spark.registry import query

EVAL_MOD = 29          # doc_id % 29 == 0 -> eval split
NGRAM = 8              # token n-gram length for overlap detection
MIN_HITS = 5           # flag threshold: >=5 distinct overlapping 8-grams

_SPARK_TOKS = "filter(split(text, ' '), x -> length(x) > 0)"
_SPARK_NGRAMS = f"""
CASE WHEN size(toks) >= {NGRAM}
     THEN transform(sequence(1, size(toks) - {NGRAM - 1}),
                    i -> concat_ws(' ', slice(toks, i, {NGRAM})))
     ELSE array(concat_ws(' ', toks)) END
"""

_DUCK_NGRAMS = f"""
CASE WHEN len(t) >= {NGRAM}
     THEN [array_to_string(t[i:i + {NGRAM - 1}], ' ')
           for i in range(1, len(t) - {NGRAM - 2})]
     ELSE [array_to_string(t, ' ')] END
"""


def _splits_spark(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(train, eval) corpora with seeded full + partial leaks in train."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    clean = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    full_leaks = ev.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("leak marker "), F.col("text")).alias("text"),
    )
    ev_head = ev.select(
        F.col("doc_id").alias("ev_id"),
        F.concat_ws(" ", F.slice(F.expr(_SPARK_TOKS), 1, 24)).alias("head"),
    )
    partial_leaks = (
        clean.join(ev_head, clean["doc_id"] == ev_head["ev_id"] + 1)
        .select(
            (F.col("ev_id") + 300000).alias("doc_id"),
            F.concat_ws(" ", "text", "head").alias("text"),
        )
    )
    train = clean.unionByName(full_leaks).unionByName(partial_leaks)
    return train, ev


_SPLITS_DUCK = f"""
ev AS (SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_MOD} = 0),
clean AS (SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_MOD} <> 0),
train AS (
  SELECT doc_id, text FROM clean
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, 'leak marker ' || text AS text FROM ev
  UNION ALL
  SELECT e.doc_id + 300000 AS doc_id,
         c.text || ' ' ||
         array_to_string((list_filter(string_split(e.text, ' '),
                                      x -> length(x) > 0))[1:24], ' ') AS text
  FROM ev e JOIN clean c ON c.doc_id = e.doc_id + 1
)
"""


@query(
    "e10_decontamination",
    oracle=f"""
WITH {_SPLITS_DUCK},
tr_toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM train
),
tr_sh AS (
  SELECT DISTINCT doc_id, {duck_md5_hash('g', mod=MOD)} AS h
  FROM (SELECT doc_id, unnest({_DUCK_NGRAMS}) AS g FROM tr_toks)
),
ev_toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM ev
),
ev_sh AS (
  SELECT DISTINCT {duck_md5_hash('g', mod=MOD)} AS h
  FROM (SELECT doc_id, unnest({_DUCK_NGRAMS}) AS g FROM ev_toks)
),
totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr_sh GROUP BY doc_id),
hits AS (
  SELECT tr_sh.doc_id, COUNT(*) AS n_contaminated
  FROM tr_sh JOIN ev_sh USING (h)
  GROUP BY tr_sh.doc_id
)
SELECT t.doc_id, n_contaminated, n_shingles,
       ROUND(n_contaminated / CAST(n_shingles AS DOUBLE), 6) AS contamination_ratio,
       n_contaminated >= {MIN_HITS} AS is_contaminated
FROM totals t JOIN hits USING (doc_id)
""",
)
def e10_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents sharing 8-token n-grams with the eval
    split. Broadcast the eval n-gram hash set; single scan of the train
    corpus; per-doc hit counts and contamination ratio. Only contaminated
    docs (>=1 shared n-gram) are emitted."""
    train, ev = _splits_spark(spark, sf_dir)

    def shingle_hashes(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
        grams = toks.select(
            "doc_id", F.explode(F.expr(_SPARK_NGRAMS)).alias("g")
        )
        return grams.select(
            "doc_id", F.expr(spark_md5_hash("g", mod=MOD)).alias("h")
        ).distinct()

    tr_sh = shingle_hashes(train)
    ev_h = shingle_hashes(ev).select("h").distinct()
    totals = tr_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        tr_sh.join(F.broadcast(ev_h), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return totals.join(hits, "doc_id").select(
        "doc_id",
        "n_contaminated",
        "n_shingles",
        F.round(
            F.col("n_contaminated") / F.col("n_shingles").cast("double"), 6
        ).alias("contamination_ratio"),
        (F.col("n_contaminated") >= MIN_HITS).alias("is_contaminated"),
    )


BLOOM_BITS = 8192      # m: bloom bitset size (fits in one broadcast packet)
BLOOM_HASHES = 3       # k: salted md5-prefix hash functions


@query(
    "x7_bloom_decontaminate",
    oracle=f"""
WITH {_SPLITS_DUCK},
tr_toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM train
),
tr_gr AS (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest({_DUCK_NGRAMS}) AS g FROM tr_toks)
),
ev_toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM ev
),
ev_gr AS (
  SELECT DISTINCT g
  FROM (SELECT doc_id, unnest({_DUCK_NGRAMS}) AS g FROM ev_toks)
),
salts AS (SELECT unnest(range(0, {BLOOM_HASHES})) AS j),
ev_bits AS (
  SELECT DISTINCT {duck_md5_hash("(g || '|' || CAST(j AS VARCHAR))", mod=BLOOM_BITS)} AS bit
  FROM ev_gr, salts
),
tr_bits AS (
  SELECT doc_id, g, {duck_md5_hash("(g || '|' || CAST(j AS VARCHAR))", mod=BLOOM_BITS)} AS bit
  FROM tr_gr, salts
),
gram_hits AS (
  SELECT doc_id, g
  FROM tr_bits JOIN ev_bits USING (bit)
  GROUP BY doc_id, g
  HAVING COUNT(*) = {BLOOM_HASHES}
),
exact_hits AS (SELECT doc_id, g FROM tr_gr JOIN ev_gr USING (g)),
per_doc AS (
  SELECT tg.doc_id,
         COUNT(*) AS n_grams,
         COUNT(gh.g) AS n_bloom_hits,
         COUNT(eh.g) AS n_exact_hits
  FROM tr_gr tg
  LEFT JOIN gram_hits gh ON gh.doc_id = tg.doc_id AND gh.g = tg.g
  LEFT JOIN exact_hits eh ON eh.doc_id = tg.doc_id AND eh.g = tg.g
  GROUP BY tg.doc_id
)
SELECT doc_id, n_grams, n_bloom_hits, n_exact_hits,
       n_bloom_hits - n_exact_hits AS n_false_pos
FROM per_doc
WHERE n_bloom_hits > 0
""",
)
def x7_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 Bloom-filter decontamination — e10's broadcast side shrunk from
    the eval set's full n-gram hash set to an m-bit Bloom bitset
    (m={BLOOM_BITS}, k={BLOOM_HASHES} salted md5-prefix hashes). At 100 TB
    this is the difference between broadcasting a 100M-entry benchmark
    hash set and broadcasting kilobytes: Bloom admits false POSITIVES
    (over-flagging is safe for hygiene filters — a flagged doc is
    re-checked or dropped) but never false negatives, so no leaked doc
    escapes. The filter is built declaratively (eval grams × k salts →
    distinct set bits) so the whole thing — including the false-positive
    count vs the exact e10 membership — is oracle-checkable; Spark's
    native runtime bloom (perf_experiments §4) applies the same idea
    below the plan.

    Plan: the bit table (≤ m rows) is broadcast; the corpus is scanned
    once; a gram is bloom-positive iff all k salted bits hit (HAVING
    COUNT = k). No shuffle touches the corpus until the per-doc
    aggregate, which partial-aggregates map-side.
    """
    train, ev = _splits_spark(spark, sf_dir)

    def grams(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
        return toks.select(
            "doc_id", F.explode(F.expr(_SPARK_NGRAMS)).alias("g")
        ).distinct()

    salted = spark_md5_hash("concat(g, '|', cast(j as string))", mod=BLOOM_BITS)
    tr_gr = grams(train)
    ev_gr = grams(ev).select("g").distinct()
    salts = F.explode(F.expr(f"sequence(0, {BLOOM_HASHES - 1})")).alias("j")
    ev_bits = ev_gr.select("g", salts).select(F.expr(salted).alias("bit")).distinct()
    tr_bits = tr_gr.select("doc_id", "g", salts).select(
        "doc_id", "g", F.expr(salted).alias("bit")
    )
    gram_hits = (
        tr_bits.join(F.broadcast(ev_bits), "bit")
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") == BLOOM_HASHES)
        .select(F.col("doc_id").alias("gd"), F.col("g").alias("gh"))
    )
    exact_hits = tr_gr.join(F.broadcast(ev_gr), "g").select(
        F.col("doc_id").alias("ed"), F.col("g").alias("eh")
    )
    per_doc = (
        tr_gr.join(
            gram_hits,
            (F.col("doc_id") == F.col("gd")) & (F.col("g") == F.col("gh")),
            "left",
        )
        .join(
            exact_hits,
            (F.col("doc_id") == F.col("ed")) & (F.col("g") == F.col("eh")),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("gh").alias("n_bloom_hits"),
            F.count("eh").alias("n_exact_hits"),
        )
    )
    return per_doc.filter(F.col("n_bloom_hits") > 0).select(
        "doc_id",
        "n_grams",
        "n_bloom_hits",
        "n_exact_hits",
        (F.col("n_bloom_hits") - F.col("n_exact_hits")).alias("n_false_pos"),
    )
