"""Remaining inventory coverage (SURVEY.md §2.4 A11, §2.8 F13-F14, §2.11):
distincts, seeded corruption masks, batch permutation labels, embedding
near-dup, and the Spark ML LSH library path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


@query(
    "a11_distinct",
    oracle="""
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
""",
)
def a11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 distinct/dedup aggregation (``os.listdir`` as model set,
    ``inference_kfold.py:66``): exact grouped count-distinct."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


@query("a12_approx_distinct")
def a12_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct (SURVEY §2.4 'absent' row — free in
    Spark). Rows-only: HLL sketches are engine-specific; the companion
    exact count in ``a11_distinct`` is the oracle-checked truth. At 100 TB
    approx_count_distinct is the only affordable distinct over high-
    cardinality keys (no exact shuffle of the key space)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custkeys"),
        F.countDistinct("o_custkey").alias("exact_custkeys"),
    )


MLM_EPOCH_SALT = "mlm42:"  #: a new salt = a fresh corruption mask per epoch

#: 60-bit integer thresholds for the 80/10/10 split of the 15% selection
#: (draw = md5-prefix hash of (salt, doc_id, pos), uniform on [0, 2^60)).
_MLM_M = 1 << 60
_MLM_T_MASK = int(0.15 * 0.8 * _MLM_M)
_MLM_T_RANDOM = int(0.15 * 0.9 * _MLM_M)
_MLM_T_SELECT = int(0.15 * _MLM_M)


def _f13_oracle() -> str:
    from wx20222_bigdata_spark.functions.hashing import duck_md5_hash

    h = duck_md5_hash(
        f"concat('{MLM_EPOCH_SALT}', CAST(doc_id AS VARCHAR), ':',"
        " CAST(pos AS VARCHAR))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)
),
decided AS (
  SELECT doc_id,
         CASE WHEN {h} >= {_MLM_T_SELECT} THEN 'keep'
              WHEN {h} < {_MLM_T_MASK} THEN 'mask'
              WHEN {h} < {_MLM_T_RANDOM} THEN 'random'
              ELSE 'identity' END AS action
  FROM toks
)
SELECT doc_id,
       CAST(SUM(CASE WHEN action = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN action = 'mask' THEN 1 ELSE 0 END) AS BIGINT) AS n_mask,
       CAST(SUM(CASE WHEN action = 'random' THEN 1 ELSE 0 END) AS BIGINT) AS n_random,
       CAST(SUM(CASE WHEN action = 'identity' THEN 1 ELSE 0 END) AS BIGINT) AS n_identity
FROM decided GROUP BY doc_id
"""


@query("f13_mlm_corruption", oracle=_f13_oracle())
def f13_mlm_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 seeded MLM 80/10/10 corruption (``pretrained_model.py:28-57``):
    per token draw r ~ uniform; r < 0.15 selects the token, of which
    80% → [MASK], 10% → random vocab id, 10% → keep.

    Oracle-checked (upgraded r7, the o7/o10/o12 content-hash
    discipline): the per-token draw is the 60-bit md5-prefix hash of
    (epoch salt, doc_id, pos) compared against integer thresholds —
    uniform like ``rand(seed)`` but reproducible across engines,
    repartitionings, and reruns (the property a debuggable training
    pipeline wants from its corruption mask; a fresh mask per epoch is a
    new salt, exactly o7's epoch-shuffle contract). The old
    ``F.rand(42)`` form was rows-only because Spark's partition-seeded
    RNG streams have no DuckDB twin."""
    from wx20222_bigdata_spark.functions.hashing import spark_md5_hash

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    h = F.expr(
        spark_md5_hash(
            f"concat('{MLM_EPOCH_SALT}', CAST(doc_id AS STRING), ':',"
            " CAST(pos AS STRING))"
        )
    )
    decided = toks.select(
        "doc_id",
        F.when(h >= _MLM_T_SELECT, "keep")
        .when(h < _MLM_T_MASK, "mask")
        .when(h < _MLM_T_RANDOM, "random")
        .otherwise("identity")
        .alias("action"),
    )
    return (
        decided.groupBy("doc_id")
        .pivot("action", ["keep", "mask", "random", "identity"])
        .count()
        .select(
            "doc_id",
            F.coalesce("keep", F.lit(0)).alias("n_keep"),
            F.coalesce("mask", F.lit(0)).alias("n_mask"),
            F.coalesce("random", F.lit(0)).alias("n_random"),
            F.coalesce("identity", F.lit(0)).alias("n_identity"),
        )
    )


@query(
    "f14_batch_permutation",
    oracle="""
WITH batched AS (
  SELECT vec_id, label,
         CAST((ROW_NUMBER() OVER (ORDER BY vec_id) - 1) // 10 AS BIGINT) AS batch_id,
         CAST((ROW_NUMBER() OVER (ORDER BY vec_id) - 1) % 10 AS BIGINT) AS pos
  FROM embeddings
),
shuffled AS (
  SELECT *, CASE WHEN pos < 5 THEN pos ELSE 14 - pos END AS src_pos
  FROM batched
)
SELECT s.batch_id, s.pos, s.vec_id,
       b.vec_id AS paired_vec_id,
       (s.pos = s.src_pos) AS is_match
FROM shuffled s
JOIN batched b ON b.batch_id = s.batch_id AND b.pos = s.src_pos
""",
)
def f14_batch_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 ITM batch permutation (``pretrained_model.py:77-89``
    ShuffleVideo): within each batch of 10, the second half is reversed
    and the match label is pos == permuted pos. Batches are explicit
    computed index ranges — the engine's contract that 'batch' is a
    computed key, never physical row order. The index comes from the
    scalable zip index (per-partition offsets, ``skew.py``), not a global
    window, so batch synthesis has no single-partition funnel at scale."""
    from wx20222_bigdata_spark.operators.skew import zip_with_global_index

    emb = load_table(spark, sf_dir, "embeddings")
    batched = zip_with_global_index(
        emb.select("vec_id", "label"), "vec_id"
    ).select(
        "vec_id",
        "label",
        F.expr("zip_index div 10").cast("bigint").alias("batch_id"),
        (F.col("zip_index") % 10).cast("bigint").alias("pos"),
    )
    shuffled = batched.withColumn(
        "src_pos",
        F.when(F.col("pos") < 5, F.col("pos")).otherwise(F.lit(14) - F.col("pos")),
    )
    right = batched.select(
        F.col("batch_id").alias("b_batch"),
        F.col("pos").alias("b_pos"),
        F.col("vec_id").alias("paired_vec_id"),
    )
    return (
        shuffled.join(
            right,
            (F.col("batch_id") == F.col("b_batch"))
            & (F.col("src_pos") == F.col("b_pos")),
        )
        .select(
            "batch_id",
            "pos",
            "vec_id",
            "paired_vec_id",
            (F.col("pos") == F.col("src_pos")).alias("is_match"),
        )
    )


@query(
    "e2e_cosine_neardup",
    oracle="""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)])
         / (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) for i in range(1, 65)]))
            * sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)]))) AS cosine
  FROM embeddings a JOIN embeddings b
    ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 25 AND a.label = b.label
)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
FROM pairs
WHERE cosine > 0.25
""",
)
def e2e_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 embedding-cosine near-dup detection: candidate pairs blocked by
    (label, bounded id-band) — the blocking join that replaces all-pairs —
    then thresholded cosine (threshold calibrated to the corpus: these
    synthetic embeddings are near-orthogonal, max in-block cosine ≈0.38).
    At scale the blocking key is the LSH bucket (e3b); the band form here
    keeps the oracle exact.

    The join key includes a block = id div 25 (a-side probes block and
    block+1) so the band is an equi-join: label alone leaves |label-class|²
    pairs per class for the band filter to discard after the fact —
    per-class populations grow with the corpus, the band doesn't."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("label").alias("lbl"),
        F.explode(
            F.array(F.expr("vec_id div 25"), F.expr("vec_id div 25 + 1"))
        ).alias("block"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("label").alias("lbl"),
        F.expr("vec_id div 25").alias("block"),
    )
    from wx20222_bigdata_spark.functions.vector import cosine as _cos

    cosine = _cos("ea", "eb")
    return (
        a.join(b, ["lbl", "block"])
        .filter((F.col("id_b") > F.col("id_a")) & (F.col("id_b") <= F.col("id_a") + 25))
        .select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") > 0.25)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


@query("e2f_ml_minhash_lsh")
def e2f_ml_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 via the Spark ML library path (``pyspark.ml.feature.MinHashLSH``):
    binary shingle vectors (HashingTF binary mode) → seeded MinHashLSH →
    approxSimilarityJoin under a Jaccard-distance threshold. Rows-only:
    ML hash families are not DuckDB-reproducible; the hand-rolled
    oracle-checked pipeline is ``e2b_minhash_lsh_pairs``.

    Features are 3-token *shingles*, not words (same reason as e2b /
    NOTES_r1 §8): word term-sets on a small-vocabulary corpus are all
    mutually near-identical, so a word-set Jaccard join returns O(n²)
    true pairs no matter the threshold — 17k pairs for 510 docs measured
    at word level vs ~corpus-linear with shingles. Growth is pinned by
    tests/test_candidate_growth.py.

    Memory note (r8 sf1 sweep): Spark-ML's approxSimilarityJoin
    materializes its hash tables on-heap and OOMed a 1 GiB driver at
    sf1 (50k docs + mutants) — run this comparison tier with a
    scale-sized heap; the production dedup tiers (e2g/e2m) have no such
    sensitivity."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from wx20222_bigdata_spark.operators.dedup import (
        _SPARK_SHINGLES,
        _corpus_with_mutants_spark,
    )

    corpus = _corpus_with_mutants_spark(spark, sf_dir)
    shingled = corpus.withColumn(
        "toks", F.expr("filter(split(text, ' '), x -> length(x) > 0)")
    ).withColumn("shingles", F.expr(_SPARK_SHINGLES))
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 16, binary=True
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    # Threshold 0.15 (was 0.3): on corpora with a shared template the loose
    # threshold admitted ~10x-corpus candidate pairs (49k at 5k docs,
    # VERDICT r1) — approaching quadratic growth. 0.15 keeps true mutant
    # pairs (their Jaccard distance is ~0.02-0.1 by construction) while the
    # candidate set stays O(corpus); growth is pinned by
    # tests/test_candidate_growth.py.
    pairs = model.approxSimilarityJoin(feats, feats, 0.15, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query(
    "x3_python_udtf_shingles",
    oracle="""
WITH toksrc AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 3
                     THEN [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] for i in range(1, len(t) - 1)]
                     ELSE [] END) AS gram
  FROM toksrc
)
SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct
FROM grams
GROUP BY doc_id
""",
)
def x3_python_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 one-row→many via a real Python UDTF (Spark 4 ``@udtf``) — the
    table-function form of the ocr-segment explode (``data_helper.py:32-34``),
    emitting 3-token shingles per doc. Counts per doc are oracle-checked
    against the list-comprehension shingler. The UDTF runs Arrow-batched
    like any Python worker; the lateral join keeps it partition-local."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram string")
    class Trigrams:
        def eval(self, text: str):  # noqa: D401 - Spark UDTF contract
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(max(len(toks) - 2, 0)):
                yield (" ".join(toks[i : i + 3]),)

    spark.udtf.register("trigrams_udtf", Trigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_for_udtf")
    grams = spark.sql(
        """SELECT d.doc_id, g.gram
           FROM _docs_for_udtf d, LATERAL trigrams_udtf(d.text) g"""
    )
    return grams.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.countDistinct("gram").alias("n_distinct"),
    )
