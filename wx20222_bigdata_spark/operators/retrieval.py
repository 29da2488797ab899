"""Lexical retrieval — BM25 scoring and top-k search over the document
corpus (SURVEY.md §2.11 similarity-search family: the term-based
complement to the e3 vector ANN ladder; real curation pipelines rank by
BM25 for targeted corpus slicing and hard-negative mining).

Okapi BM25 (k1=1.2, b=0.75, Lucene +1 idf smoothing):

    score(d, Q) = Σ_{t∈Q} ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                  · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))

Plan shape: explode tokens once, broadcast-join the (tiny) query-term
table, aggregate tf per (doc, term) and df per term — every join on the
corpus side is a broadcast hash join, the only wide exchanges are the
two bounded aggregates, and the final top-k compiles to
TakeOrderedAndProject (per-partition heads merged on the driver — no
global sort of the scored set). The corpus statistics (N, avgdl) are
one-row aggregates crossJoined in (the documented benign constant-size
pattern). At 100 TB, df/idf would be precomputed once per corpus
snapshot and broadcast — the same plan with the term-stats join swapped
for a dictionary lookup.

Float discipline: idf uses ln() on both engines (IEEE doubles agree to
the ulp for these magnitudes) and the final score is round(6) before
the top-k ordering, with doc_id as tiebreak — ordering is decided on
the rounded values, so both engines rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

K1 = 1.2
B = 0.75
TOP_K = 15
QUERY_TERMS = ["spark", "join", "window", "stream"]


@query(
    "e13_bm25_retrieval",
    oracle=f"""
WITH terms AS (
  SELECT unnest(['{"','".join(QUERY_TERMS)}']) AS term
),
toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> length(x) > 0)) AS tok
  FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM toks JOIN terms ON tok = term
  GROUP BY doc_id, tok
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(
           ln(1 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * ({K1} + 1)
           / (tf + {K1} * (1 - {B} + {B} * dl.dl / avgdl))
         ) AS raw
  FROM tf
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(raw, 6) AS bm25_score
FROM scored
ORDER BY bm25_score DESC, doc_id
LIMIT {TOP_K}
""",
)
def e13_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} documents for a fixed keyword query under BM25."""
    docs = load_table(spark, sf_dir, "documents")
    terms = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(t,) for t in QUERY_TERMS], ["term"]
        )
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.join(terms, toks["tok"] == terms["term"])
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # df is NOT vocab-sized here: tf is pre-filtered by the QUERY_TERMS
    # join, so df has at most |QUERY_TERMS| rows at ANY corpus size —
    # bounded by construction, the hint is safe (r8 df-table audit).
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf")
                * (K1 + 1)
                / (
                    F.col("tf")
                    + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("raw")
        )
    )
    return (
        scored.select("doc_id", F.round("raw", 6).alias("bm25_score"))
        .orderBy(F.desc("bm25_score"), "doc_id")
        .limit(TOP_K)
    )


@query(
    "e16_tfidf_keywords",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> length(x) > 0)) AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df USING (tok) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, tok, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, tok) AS BIGINT) AS rnk
  FROM scored
)
SELECT doc_id, tok, rnk, tfidf FROM ranked WHERE rnk <= 3
""",
)
def e16_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractive keyword mining: top-3 TF-IDF tokens per document — the
    per-doc feature-extraction dual of the corpus-level BM25 ranker
    (shared df/idf machinery; here the window partitions on doc_id, so
    ranking is embarrassingly parallel). The corpus size N is a one-row
    broadcast (documented benign pattern). Scores are rounded to 6
    BEFORE ranking, with the token as tiebreak, so both engines rank
    identically."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # df IS vocab-sized (one row per distinct corpus token) — sublinear
    # by Heaps' law but unbounded (10^8+ rows web-scale), so it must
    # never be hint-broadcast (q9 rule). It is not materialized as a
    # table at all: tf has exactly one row per (doc, tok), so
    # count(*) over a tok window IS the document frequency — one
    # exchange on tok, no join, no second aggregate, and nothing
    # unbounded ever broadcasts. Measured vs the alternatives at sf10
    # (SCALE.md "df-table growth"): window 2.06 s, shared-partitioning
    # join 3.82 s, pre-r8 broadcast hint ~4.1 s — the window form beats
    # even the hint, and its skew profile equals the join's (both hash-
    # partition on tok; WindowExec spills per group, and a hot-token
    # group lands on one reducer under either plan).
    w_df = Window.partitionBy("tok")
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(w_df))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "rnk", "tfidf")
    )


RRF_K = 60        #: reciprocal-rank-fusion constant (Cormack et al. 2009)
RRF_DEPTH = 50    #: per-modality rank-list depth fed into the fusion
RRF_TOP = 20      #: fused results returned


@query(
    "rrf1_hybrid_retrieval",
    oracle=f"""
WITH terms AS (
  SELECT unnest(['{"','".join(QUERY_TERMS)}']) AS term
),
toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> length(x) > 0)) AS tok
  FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM toks JOIN terms ON tok = term
  GROUP BY doc_id, tok
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
bm25 AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * ({K1} + 1)
           / (tf + {K1} * (1 - {B} + {B} * dl.dl / avgdl))
         ), 6) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
  FROM bm25
  QUALIFY lex_rank <= {RRF_DEPTH}
),
qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cos AS (
  SELECT vec_id AS doc_id,
         ROUND(
           list_sum([CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])
           / (sqrt(list_sum([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) for i in range(1, 65)]))
              * sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]))),
           6) AS score
  FROM embeddings CROSS JOIN qv
  WHERE vec_id <> 0
),
sem AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS sem_rank
  FROM cos
  QUALIFY sem_rank <= {RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         CAST(lex.lex_rank AS BIGINT) AS lex_rank,
         CAST(sem.sem_rank AS BIGINT) AS sem_rank,
         ROUND(COALESCE(1.0 / ({RRF_K} + lex.lex_rank), 0)
               + COALESCE(1.0 / ({RRF_K} + sem.sem_rank), 0), 6) AS rrf_score
  FROM lex FULL OUTER JOIN sem USING (doc_id)
)
SELECT doc_id, lex_rank, sem_rank, rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT {RRF_TOP}
""",
)
def rrf1_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF1 hybrid retrieval — reciprocal-rank fusion (Cormack et al.
    2009) of the two retrieval modalities the engine already ships:
    BM25 lexical ranks (e13's scorer) and cosine vector ranks (e3's
    scorer, query = vec 0), fused as Σ 1/({RRF_K}+rank) over each
    modality's top-{RRF_DEPTH}. This is the standard first-stage ranker
    of a modern RAG / hard-negative-mining pipeline — rank fusion needs
    no score calibration across modalities, which is exactly why RRF is
    the default in production hybrid search.

    Determinism: each modality ranks on round-6 scores with doc_id
    tiebreak (the repo float-ordering rule), so ranks are integers and
    identical cross-engine; the fused score is a 2-term sum of exact
    reciprocals, rounded once. Scale: both rank lists are
    TakeOrderedAndProject-bounded ({RRF_DEPTH} rows), the fusion is a
    {RRF_DEPTH}x{RRF_DEPTH}-bounded full outer join — costless beside
    the modality scans; the vector side swaps to e3b/e3c ANN at corpus
    scale without touching the fusion."""
    from wx20222_bigdata_spark.functions.vector import dot as _dot
    from wx20222_bigdata_spark.functions.vector import norm as _norm

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    terms = F.broadcast(
        docs.sparkSession.createDataFrame([(t,) for t in QUERY_TERMS], ["term"])
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> length(x) > 0)")).alias(
            "tok"
        ),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.join(terms, toks["tok"] == terms["term"])
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # df bounded at |QUERY_TERMS| rows (tf is query-term-filtered), same
    # as e13 — safe hint (r8 df-table audit)
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    bm25 = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log(
                        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    )
                    * F.col("tf")
                    * (K1 + 1)
                    / (
                        F.col("tf")
                        + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("score")
        )
    )
    # Bound FIRST (TakeOrderedAndProject: per-partition heads merged on
    # the driver), THEN rank — the global row_number window only ever
    # sees the {RRF_DEPTH}-row list, never the full scored set.
    lex = (
        bm25.orderBy(F.desc("score"), "doc_id")
        .limit(RRF_DEPTH)
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "lex_rank")
    )
    # qv is one row by construction (vec_id == 0) — a safe broadcast the
    # plan can't prove; allowlisted in the forced-broadcast guard test
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    cos = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                _dot("qe", "embedding") / (_norm("qe") * _norm("embedding")), 6
            ).alias("score"),
        )
    )
    sem = (
        cos.orderBy(F.desc("score"), "doc_id")
        .limit(RRF_DEPTH)
        .withColumn(
            "sem_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "sem_rank")
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("sem_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOP)
    )
    return fused
