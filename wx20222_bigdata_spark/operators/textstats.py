"""Text analysis operators for corpus curation (SURVEY.md §2.11 E4;
north-star: language-ID, quality scoring, token counting, fingerprinting).

All pure column expressions — the full suite runs as one narrow pass over
the corpus plus one grouped aggregate where noted. At 100 TB these are
scan-bound; nothing here shuffles except the explicit groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table, rebalance_small_scan
from wx20222_bigdata_spark.functions.hashing import duck_md5_hash, spark_md5_hash
from wx20222_bigdata_spark.registry import query

#: Marker stopwords per language for the n-gram/lexicon heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ein"],
    "fr": ["le", "et", "la", "les", "un"],
}


@query(
    "e4_group_stats",
    oracle="""
SELECT lang,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
""",
)
def e4_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 corpus composition: per (lang, source) doc counts and char-length
    distribution — the first table any curation run produces."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "e4b_token_freq_topk",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
)
SELECT tok, COUNT(*) AS freq
FROM toks
WHERE length(tok) > 0
GROUP BY tok
ORDER BY freq DESC, tok ASC
LIMIT 20
""",
)
def e4b_token_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/X3 token frequency top-k: explode(split()) → count → top 20.
    The explode is the UDTF shape (ocr segments, ``data_helper.py:32-34``);
    the count is map-side combinable so the shuffle carries |vocab| rows.
    The orderBy+limit compiles to ``TakeOrderedAndProject`` — per-partition
    partial top-k merged on the driver, never a global sort — which IS the
    two-stage top-k at scale (plan pinned in tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(20)
    )


@query(
    "e4g_char_ngram_stats",
    oracle=r"""
WITH src AS (
  SELECT doc_id, regexp_replace(lower(text), '\s+', '', 'g') AS ctext
  FROM documents
),
grams AS (
  SELECT doc_id, unnest([substring(ctext, i, 3) for i in range(1, length(ctext) - 1)]) AS g
  FROM src WHERE length(ctext) >= 3
)
SELECT g, CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM grams
GROUP BY g
ORDER BY freq DESC, g ASC
LIMIT 20
""",
)
def e4g_char_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 char-mode (``whitespace=False``) n-gram statistics — e4b's
    frequency table for scripts with no word boundaries (the reference's
    Chinese titles/asr/ocr, ``data_helper.py:55``): character trigrams of
    the space-stripped lowercased text, with corpus frequency and
    document frequency per gram, top-20. Same scale shape as e4b: the
    count is map-side combinable (shuffle carries the bounded gram
    vocabulary, |alphabet|^3 worst case), and the top-k compiles to
    TakeOrderedAndProject. All-integer, bit-exact."""
    docs = rebalance_small_scan(
        load_table(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    )
    grams = (
        docs.select(
            "doc_id",
            F.regexp_replace(F.lower("text"), r"\s+", "").alias("ctext"),
        )
        .filter(F.length("ctext") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(ctext) - 2),"
                    " i -> substring(ctext, i, 3))"
                )
            ).alias("g"),
        )
    )
    # Group on xxhash64(g), not g (VERDICT r5 item 7, the LSH tiers'
    # discipline): countDistinct's pre-aggregation shuffles one row per
    # DISTINCT (gram, doc) pair, and at 100× those string keys dominate
    # the exchange — the int64 hash carries the same key in 8 bytes.
    # min(g) rides only in the aggregation buffer (one string per
    # distinct gram per map partition, the same volume a plain
    # groupBy(g) would shuffle) and recovers the gram + the oracle's
    # lexicographic tiebreak exactly; the hash is bijective here in
    # practice (trigram space ≪ 2^64; the sf0.01 oracle cross-checks).
    return (
        grams.select("doc_id", "g", F.xxhash64("g").alias("gh"))
        .groupBy("gh")
        .agg(
            F.min("g").alias("g"),
            F.count("*").cast("bigint").alias("freq"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
        .select("g", "freq", "df")
        .orderBy(F.col("freq").desc(), F.col("g").asc())
        .limit(20)
    )


def _lang_score_spark(markers: list[str]):
    arr = F.array([F.lit(m) for m in markers])
    return F.size(F.array_intersect(F.array_distinct(F.split(F.lower("text"), " ")), arr))


@query(
    "e4c_language_id",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')), ['the','and','of','to','a'])) AS s_en,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')), ['der','und','die','das','ein'])) AS s_de,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')), ['le','et','la','les','un'])) AS s_fr
  FROM documents
),
pred AS (
  SELECT doc_id, lang,
         CASE
           WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
           WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
           WHEN s_fr > 0 THEN 'fr'
           ELSE 'und'
         END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, COUNT(*) AS n
FROM pred
GROUP BY lang, pred_lang
""",
)
def e4c_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 language identification — lexicon/n-gram heuristic: score each
    language by marker-stopword hits in the distinct token set, argmax with
    a fixed precedence (en > de > fr), 'und' when no marker fires. Output
    is the (actual, predicted) confusion table."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        _lang_score_spark(LANG_MARKERS["en"]).alias("s_en"),
        _lang_score_spark(LANG_MARKERS["de"]).alias("s_de"),
        _lang_score_spark(LANG_MARKERS["fr"]).alias("s_fr"),
    )
    pred = scored.select(
        "lang",
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") > 0),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") > 0), "de")
        .when(F.col("s_fr") > 0, "fr")
        .otherwise("und")
        .alias("pred_lang"),
    )
    return pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))


@query(
    "e4d_quality_score",
    oracle="""
WITH feats AS (
  SELECT doc_id,
         length(text) AS n_char,
         len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_words,
         length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', '')) AS n_punct,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')),
             ['the','and','of','to','a','der','und','le','et'])) AS n_stop
  FROM documents
)
SELECT doc_id,
       n_words,
       ROUND(CAST(n_char AS DOUBLE) / n_words, 6) AS avg_word_len,
       ROUND(CAST(n_punct AS DOUBLE) / n_char, 6) AS punct_ratio,
       ROUND(CAST(n_stop AS DOUBLE) / n_words, 6) AS stop_density,
       (n_words >= 20 AND n_words <= 1000
        AND CAST(n_punct AS DOUBLE) / n_char < 0.1) AS passes_quality
FROM feats
""",
)
def e4d_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 quality scoring — Gopher/C4-style heuristic features (length
    bounds, punctuation ratio, stopword density, mean word length) and a
    boolean keep/drop gate. One narrow pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    stop_arr = F.array(
        [F.lit(m) for m in ["the", "and", "of", "to", "a", "der", "und", "le", "et"]]
    )
    feats = docs.select(
        "doc_id",
        F.length("text").alias("n_char"),
        F.size(words).cast("bigint").alias("n_words"),
        (
            F.length("text")
            - F.length(
                F.regexp_replace(F.regexp_replace(F.regexp_replace("text", r"\.", ""), ",", ""), "!", "")
            )
        ).alias("n_punct"),
        F.size(
            F.array_intersect(F.array_distinct(F.split(F.lower("text"), " ")), stop_arr)
        ).alias("n_stop"),
    )
    return feats.select(
        "doc_id",
        "n_words",
        F.round(F.col("n_char").cast("double") / F.col("n_words"), 6).alias(
            "avg_word_len"
        ),
        F.round(F.col("n_punct").cast("double") / F.col("n_char"), 6).alias(
            "punct_ratio"
        ),
        F.round(F.col("n_stop").cast("double") / F.col("n_words"), 6).alias(
            "stop_density"
        ),
        (
            (F.col("n_words") >= 20)
            & (F.col("n_words") <= 1000)
            & (F.col("n_punct").cast("double") / F.col("n_char") < 0.1)
        ).alias("passes_quality"),
    )


@query(
    "e4e_doc_fingerprint",
    oracle=f"""
SELECT doc_id,
       CAST({duck_md5_hash("lower(text)")} AS BIGINT) AS fingerprint,
       length(text) AS n_char
FROM documents
""",
)
def e4e_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 document fingerprint — a 60-bit content hash of the normalized
    text (cross-engine ``md5_hash``), the cheap content id used by
    incremental pipelines to skip unchanged docs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(spark_md5_hash("lower(text)")).alias("fingerprint"),
        F.length("text").cast("bigint").alias("n_char"),
    )


@query(
    "e4f_token_count",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS ws_tokens,
       len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> length(x) > 0)) AS word_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
FROM documents
""",
)
def e4f_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 token counting three ways: whitespace tokens, regex word tokens
    (the BPE-ish pre-tokenization split), and the chars/4 BPE
    approximation used for budget estimates."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    words = F.filter(F.split("text", "[^a-zA-Z0-9]+"), lambda x: F.length(x) > 0)
    return docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("ws_tokens"),
        F.size(words).cast("bigint").alias("word_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("approx_bpe_tokens"),
    )


@query(
    "e11_repetition_filter",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
grams AS (
  SELECT doc_id, len(t) AS n_tokens,
         CASE WHEN len(t) >= 2
              THEN [t[i] || ' ' || t[i + 1] for i in range(1, len(t))]
              ELSE [] END AS g2,
         CASE WHEN len(t) >= 3
              THEN [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
                    for i in range(1, len(t) - 1)]
              ELSE [] END AS g3,
         list_max(list_transform(list_distinct(t),
                                 u -> len(list_filter(t, x -> x = u)))) AS topc
  FROM toks
),
m AS (
  SELECT doc_id, n_tokens,
         CASE WHEN len(g2) = 0 THEN 0.0
              ELSE ROUND(1 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE), 6)
         END AS dup_2gram_frac,
         CASE WHEN len(g3) = 0 THEN 0.0
              ELSE ROUND(1 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE), 6)
         END AS dup_3gram_frac,
         ROUND(topc / CAST(n_tokens AS DOUBLE), 6) AS top_token_frac
  FROM grams
)
SELECT doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac, top_token_frac,
       dup_2gram_frac <= 0.05 AND top_token_frac <= 0.15 AS keep
FROM m
""",
)
def e11_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/Gopher-style intra-document repetition quality gate (Rae et al.
    2021 repetition rules): duplicate-2gram/3gram fractions and the
    most-frequent-token share, with a keep flag on fixed thresholds.

    Pure higher-order-function projection — nested lambda capture
    (``filter(toks, x -> x = u)`` inside ``transform``) keeps the token
    histogram per-row inside codegen; zero shuffles, scan-bound at 100 TB.
    The flag compares the ROUNDED ratios on both engines so the boundary
    is cross-engine stable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> length(x) > 0)").alias("t"),
    )
    grams = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.expr(
            "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            " ELSE array() END"
        ).alias("g2"),
        F.expr(
            "CASE WHEN size(t) >= 3 THEN transform(sequence(1, size(t) - 2),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1), ' ',"
            " element_at(t, i + 2))) ELSE array() END"
        ).alias("g3"),
        F.expr(
            "array_max(transform(array_distinct(t),"
            " u -> size(filter(t, x -> x = u))))"
        ).alias("topc"),
    )
    m = grams.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr(
            "CASE WHEN size(g2) = 0 THEN 0.0 ELSE"
            " round(1 - size(array_distinct(g2)) / CAST(size(g2) AS DOUBLE), 6)"
            " END"
        ).alias("dup_2gram_frac"),
        F.expr(
            "CASE WHEN size(g3) = 0 THEN 0.0 ELSE"
            " round(1 - size(array_distinct(g3)) / CAST(size(g3) AS DOUBLE), 6)"
            " END"
        ).alias("dup_3gram_frac"),
        F.round(F.col("topc") / F.col("n_tokens").cast("double"), 6).alias(
            "top_token_frac"
        ),
    )
    return m.select(
        "*",
        (
            (F.col("dup_2gram_frac") <= 0.05) & (F.col("top_token_frac") <= 0.15)
        ).alias("keep"),
    )


@query(
    "e15_pii_redaction",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 13 = 0 THEN ' contact bob@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 17 = 0 THEN ' call 555-123-4567 today'
                 ELSE '' END AS text
  FROM documents
),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[a-z]+@[a-z]+\\.[a-z]+')) AS n_emails,
         len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
         regexp_replace(
           regexp_replace(text, '[a-z]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'),
           '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
  FROM seeded
)
SELECT doc_id, n_emails, n_phones,
       length(redacted) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM red
WHERE n_emails > 0 OR n_phones > 0
""",
)
def e15_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the standard pretraining governance pass: detect
    and redact email/phone patterns, report per-doc counts and the md5 of
    the redacted text (the hash pins the REDACTED CONTENT cross-engine,
    not just the counts). The corpus is clean, so PII is seeded
    deterministically on every 13th/17th doc. Pure regexp projection —
    narrow, scan-bound, no shuffle; the patterns are chosen within the
    common Java-regex/RE2 subset so both engines match identically. Only
    affected docs are emitted."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 13 == 0, " contact bob@example.com now"
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 17 == 0, " call 555-123-4567 today"
            ).otherwise(""),
        ).alias("text"),
    )
    email = r"[a-z]+@[a-z]+\.[a-z]+"
    phone = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
    red = seeded.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{email}', 0)"))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(text, '{phone}', 0)"))
        .cast("bigint")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
    )
    return red.filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0)).select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.length("redacted").cast("bigint").alias("redacted_len"),
        F.md5("redacted").alias("redacted_md5"),
    )


@query(
    "e19_unigram_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> length(x) > 0)) AS tok
  FROM documents
),
freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT COUNT(*) AS total FROM toks),
lp AS (
  SELECT doc_id, tok, ln(CAST(cnt AS DOUBLE) / total) AS lp
  FROM toks JOIN freq USING (tok) CROSS JOIN tot
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tok, list_sum(list(lp ORDER BY tok)) AS slp
  FROM lp GROUP BY doc_id
),
scored AS (SELECT doc_id, n_tok, slp / n_tok AS avg_raw FROM agg),
bands AS (
  SELECT quantile_cont(avg_raw, 1.0/3) AS b1, quantile_cont(avg_raw, 2.0/3) AS b2
  FROM scored
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       ROUND(avg_raw, 6) AS avg_logprob,
       ROUND(exp(-avg_raw), 6) AS perplexity,
       CASE WHEN ROUND(avg_raw, 6) <= ROUND(b1, 6) THEN 'low'
            WHEN ROUND(avg_raw, 6) <= ROUND(b2, 6) THEN 'mid'
            ELSE 'high' END AS ppl_band
FROM scored CROSS JOIN bands
""",
)
def e19_unigram_logprob(
    spark: SparkSession, sf_dir: str, materialize_scored: bool = True
) -> DataFrame:
    """E19 language-model quality score — the CCNet/RedPajama perplexity
    filter with the LM reduced to its oracle-checkable core: each document
    scored by the mean log-probability of its tokens under the corpus's
    own unigram MLE model, then binned into perplexity terciles (CCNet
    keeps the middle band: 'low' ppl ≈ boilerplate, 'high' ≈ noise). A
    production pipeline swaps the unigram table for KenLM scores via a
    pandas UDF — the surrounding plan (score → corpus quantiles →
    band gate) is unchanged.

    The band compares ROUND-6 score vs ROUND-6 boundary: interpolated
    percentiles differ across engines by 1 ulp (lo+(hi-lo)*f vs
    lo*(1-f)+hi*f), and at sf1 nine replicated docs sat inside that ulp
    gap — comparing at the printed precision removes the edge (and makes
    the band consistent with the emitted avg_logprob).

    Plan (r8 window form): ONE token explode collapses to the DISTINCT
    (doc, token) pair table with repeat count k (map-side combinable —
    the per-doc exchange carries |distinct pairs| rows, not |token
    instances|, the e31 compression); the per-token instance count is
    then Σk over a tok WINDOW of that table — no frequency table is
    ever materialized, joined, or broadcast (q9 rule: the vocab is
    unbounded; it was hint-broadcast pre-r8, an OOM at web-scale
    vocab). The corpus total is Σk over all pairs (one-row aggregate,
    integer-exact), not a third token pass. The tercile
    boundaries are a one-row aggregate crossJoined in (documented benign
    pattern). Float discipline: per-doc sums fold in sorted token order
    (landmine 16) with the k copies of an equal token added SEQUENTIALLY
    (`aggregate(sequence(1, k), …)` — adjacent in the oracle's sorted
    fold, so addition-for-addition identical; a k*lp multiply would
    round differently), making every avg cross-engine bit-exact BEFORE
    the band comparison; band boundaries use exact interpolated
    percentiles (a13 parity) on those exact avgs.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("tok"),
    )
    pairs = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("k"))
    # freq is vocab-sized (unbounded — Heaps' law), so it must never be
    # hint-broadcast (q9 rule; r8 df-table audit, SCALE.md "df-table
    # growth"). It is not materialized at all: the per-token instance
    # count is Σk over a tok window of the pairs table (instance-exact,
    # pairs carries every instance as k), and the corpus total is Σk
    # over all pairs — one tok exchange, no join, no separate frequency
    # table, nothing unbounded broadcasts. Measured at sf10: window
    # 2.38 s vs 2.97 shared-partitioning join vs ~2.6 pre-r8 hint
    # (SCALE.md). The one-row total keeps its benign hint.
    w_tok = Window.partitionBy("tok")
    tot = pairs.agg(F.sum("k").alias("total"))
    lp = (
        pairs.withColumn("cnt", F.sum("k").over(w_tok))
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "tok",
            "k",
            F.log(F.col("cnt").cast("double") / F.col("total")).alias("lp"),
        )
    )
    agg = lp.groupBy("doc_id").agg(
        F.sum("k").alias("n_tok"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(tok, lp, k))), 0D,"
            " (a, s) -> aggregate(sequence(1, int(s.k)), a, (b, i) -> b + s.lp))"
        ).alias("slp"),
    )
    # scored feeds BOTH the output projection and the tercile-boundary
    # aggregate. Left lazy, AQE stage reuse shares everything below the
    # doc_id exchange, but the per-doc ordered FOLD (array_sort +
    # nested aggregate — the seat's dominant CPU) sits ABOVE it and ran
    # twice, once per branch (r12 runtime-plan audit). Materializing the
    # narrow (doc_id, n_tok, avg_raw) frame runs the fold once; the
    # boundary aggregate reads the checkpoint (measured interleaved
    # median-of-9 at sf0.1: 1.54 → 1.37 s). Same "score once, then
    # aggregate the sketch" layout as e35's signature table; the seat is
    # call-time-eager now (bench.py EAGER_QUERIES).
    # ``materialize_scored=False`` keeps the whole plan lazy so the
    # window-form plan law (tests/test_plans.py) can assert the tok
    # window / no-vocab-join shape across the FULL lineage, which a
    # checkpoint would otherwise hide.
    from wx20222_bigdata_spark.plans.caching import materialize

    scored = agg.select(
        "doc_id", "n_tok", (F.col("slp") / F.col("n_tok")).alias("avg_raw")
    )
    if materialize_scored:
        scored = materialize(scored)
    bands = scored.agg(
        F.expr("percentile(avg_raw, 1.0/3)").alias("b1"),
        F.expr("percentile(avg_raw, 2.0/3)").alias("b2"),
    )
    return scored.crossJoin(F.broadcast(bands)).select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.round("avg_raw", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("avg_raw")), 6).alias("perplexity"),
        F.when(F.round("avg_raw", 6) <= F.round("b1", 6), "low")
        .when(F.round("avg_raw", 6) <= F.round("b2", 6), "mid")
        .otherwise("high")
        .alias("ppl_band"),
    )


HASH_DIM = 64  #: feature-hashing output dimensionality


@query(
    "e22_feature_hashing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> length(x) > 0)) AS tok
  FROM documents
),
hashed AS (
  SELECT doc_id,
         {duck_md5_hash("tok")} % {HASH_DIM} AS bucket,
         CASE WHEN ({duck_md5_hash("tok")} // {HASH_DIM}) % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM toks
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(SUM(sgn) AS BIGINT) AS weight
FROM hashed
GROUP BY doc_id, bucket
HAVING SUM(sgn) <> 0
""",
)
def e22_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 feature hashing (the 'hashing trick', Weinberger et al. 2009)
    — the vocabulary-free text vectorizer: each token maps to one of
    HASH_DIM buckets by content-stable md5, with a second hash bit
    choosing ±1 so collisions cancel in expectation. Emitted in sparse
    (doc_id, bucket, weight) form with zeros dropped — the input shape
    for linear models and MinHash-free similarity at corpus scale, with
    NO dictionary to build, broadcast, or version (contrast f7's
    vocab-broadcast tokenizer; this is what production uses when the
    vocabulary is open).

    Plan: one narrow projection over the token explode, one
    map-side-combinable groupBy on (doc_id, bucket). All-integer."""
    docs = load_table(spark, sf_dir, "documents")
    h = spark_md5_hash("tok")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("tok"),
    )
    hashed = toks.select(
        "doc_id",
        F.expr(f"pmod({h}, {HASH_DIM})").alias("bucket"),
        F.when(F.expr(f"({h} div {HASH_DIM}) % 2") == 0, 1)
        .otherwise(-1)
        .alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("weight"))
        .filter(F.col("weight") != 0)
        .select(
            "doc_id",
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("weight").cast("bigint").alias("weight"),
        )
    )


@query(
    "e33_ngram_novelty",
    oracle="""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         ws[j] || ' ' || ws[j + 1] || ' ' || ws[j + 2] AS g
  FROM words, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS j)
),
df AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       ROUND(AVG(CASE WHEN df.df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty,
       CAST(MAX(df.df) AS BIGINT) AS max_df
FROM grams g JOIN df USING (g)
GROUP BY g.doc_id
""",
)
def e33_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E33 cross-corpus n-gram novelty — per document, the fraction of
    its DISTINCT word trigrams that occur in no other document
    (document frequency 1). Low novelty flags boilerplate/template text
    that e32's segment dedup would shred; max_df surfaces how viral the
    doc's most common trigram is. This is the contamination/novelty
    signal RedPajama-style audits compute corpus-wide, and the
    shingle-level dual of e10's decontamination (which tests n-grams
    against an EXTERNAL eval set; here the corpus is tested against
    itself).

    Scale shape: trigram explode → per-doc DISTINCT (map-side
    combinable) → ONE hash exchange on the gram key where a
    count-over-partition window attaches each gram's document frequency
    → per-doc mean. The window replaces the former groupBy(g) + equi-
    join-back pair: both shapes hash-partition the full distinct gram
    stream by g (same skew exposure on a viral gram — WindowExec spills
    via UnsafeExternalSorter exactly where the merge join would buffer),
    but the window does it in one exchange and one pass (measured with
    the noop sink — a count() sink lets Catalyst prune the window and
    overstates the win — 1.51 s → 1.21 s at sf0.1, bit-equal). Novelty is an integer ratio (count of
    df==1 over count), so round-6 is cross-engine exact. At 100 TB the
    gram key would be md5(g) (cf. e2's hash tiers); text keys keep the
    oracle readable."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            F.expr(
                "filter(split(lower(text), ' '), x -> length(x) > 0)"
            ).alias("ws"),
        )
        .select(
            "doc_id",
            # guard size(ws) < 3: sequence(1, size-2) DESCENDS for short
            # docs (negative indices → null grams under permissive mode,
            # runtime error under ANSI); emit no trigrams instead, matching
            # the oracle's range() semantics (r3 ADVICE)
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 3 THEN"
                    " transform(sequence(1, size(ws) - 2),"
                    " j -> concat(ws[j - 1], ' ', ws[j], ' ', ws[j + 1]))"
                    " ELSE array() END"
                )
            ).alias("g"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    withdf = grams.withColumn(
        "df", F.count("*").over(Window.partitionBy("g"))
    )
    return (
        withdf
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_ngrams"),
            F.round(
                F.avg(F.when(F.col("df") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
            F.max("df").cast("bigint").alias("max_df"),
        )
    )
