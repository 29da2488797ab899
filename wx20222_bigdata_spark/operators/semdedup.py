"""Semantic deduplication over the embedding corpus (SURVEY.md §2.11 E2
family — the embedding-space counterpart of MinHash near-dup: SemDeDup,
Abbas et al. 2023, arXiv:2303.09540).

The reference deduplicates nothing (its corpus is pre-curated), but a
100 TB pretraining pipeline prunes semantically-duplicate documents whose
*text* differs while their embeddings nearly coincide. The published
recipe is exactly what this operator expresses declaratively:

  1. k-means the embeddings (here: the repo's deterministic two-Lloyd
     assignment, :func:`~wx20222_bigdata_spark.operators.kmeans.lloyd2_assignment`,
     shared oracle CTE :data:`~wx20222_bigdata_spark.operators.kmeans.LLOYD2_CTES`);
  2. compute pairwise cosine ONLY within a cluster — O(Σ cᵢ²) ≪ O(n²);
  3. prune every vector that has a lower-id cluster-mate above the
     similarity threshold (min-id survivor, the repo-wide dedup keep rule).

Plan shape: the pair join shuffles both sides on the cluster id once; the
per-vector norm is computed in the scan projection (never per pair); the
prune is a map-side-combinable ``max`` aggregate plus one broadcast-size
left join back. At 100 TB you raise K so clusters stay O(10³)-sized
(SemDeDup uses K≈100k for LAION-scale corpora) and let AQE split hot
clusters; the threshold comes from the recall curve, not from taste.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.functions.vector import dot, norm
from wx20222_bigdata_spark.operators.kmeans import DIM, LLOYD2_CTES, lloyd2_assignment
from wx20222_bigdata_spark.registry import query

#: Cosine similarity above which the higher-id cluster-mate is pruned.
#: Calibrated to the synthetic corpus: within-cluster cosines top out
#: ≈0.47 with a 99th percentile ≈0.30, so 0.3 prunes a real tail without
#: emptying any cluster.
TAU = 0.3

_DOT_AB = (
    f"list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    f" for i in range(1, {DIM + 1})])"
)


@query(
    "e17_semantic_dedup",
    oracle=f"""
WITH {LLOYD2_CTES},
mem AS (
  SELECT a2.vec_id, a2.k, e.embedding,
         sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
                        for i in range(1, {DIM + 1})])) AS nrm
  FROM a2 JOIN embeddings e ON e.vec_id = a2.vec_id
),
lower_max AS (
  SELECT a.vec_id, MAX({_DOT_AB} / (a.nrm * b.nrm)) AS mc
  FROM mem a JOIN mem b ON b.k = a.k AND b.vec_id < a.vec_id
  GROUP BY a.vec_id
)
SELECT m.vec_id, CAST(m.k AS BIGINT) AS cluster,
       ROUND(COALESCE(l.mc, -1.0), 6) AS max_lower_cosine,
       COALESCE(l.mc, -1.0) < {TAU} AS is_kept
FROM mem m LEFT JOIN lower_max l ON l.vec_id = m.vec_id
""",
)
def e17_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup prune decision per vector: its cluster, the max cosine to
    any lower-id cluster-mate (−1 for the cluster's min member), and the
    keep flag. ``is_kept`` compares the UNROUNDED max so the boundary
    agrees bit-for-bit with the oracle (ordered folds make every pair
    cosine cross-engine identical)."""
    a2 = lloyd2_assignment(spark, sf_dir)
    mem = a2.select("vec_id", "k", "embedding").withColumn("nrm", norm("embedding"))
    a = mem.select(
        F.col("vec_id").alias("ia"),
        "k",
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = mem.select(
        F.col("vec_id").alias("ib"),
        "k",
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot("ea", "eb") / (F.col("na") * F.col("nb"))
    lower_max = (
        a.join(b, "k")
        .filter(F.col("ib") < F.col("ia"))
        .groupBy("ia")
        .agg(F.max(cos).alias("mc"))
    )
    mc = F.coalesce("mc", F.lit(-1.0))
    return mem.join(lower_max, mem.vec_id == lower_max.ia, "left").select(
        "vec_id",
        F.col("k").cast("bigint").alias("cluster"),
        F.round(mc, 6).alias("max_lower_cosine"),
        (mc < F.lit(TAU)).alias("is_kept"),
    )


# --- Centroid-free tier: random-hyperplane banding (no trained quantizer) ---

#: 16 deterministic hyperplanes banded 4×4: a pair collides when any band's
#: 4 sign bits all agree. For the near-identical regime this tier targets
#: (cosine ≥ TAU_HP = 0.9, angle ≤ 26°), per-plane agreement is
#: 1 − θ/π ≥ 0.86, so P(miss all 4 bands) ≤ (1 − 0.86⁴)² ·… ≈ 2%; at
#: cosine 0.99 it is < 10⁻⁴. Below the near-dup regime recall decays fast —
#: by design: this is a DEDUP filter, not a recall-oriented ANN index
#: (e3b/e3c/ivf_kmeans_topk own that trade-off).
HP_PLANES = 16
HP_BANDS = 4
HP_BITS = HP_PLANES // HP_BANDS
TAU_HP = 0.9

#: same deterministic plane family as similarity.py (w_j[i] = ((j·64+i) mod 13) − 6)
_HP_PLANE = "((({j} * 64 + i) % 13) - 6)"


def _hp_band_spark(band: int) -> str:
    """SQL expr: 4-bit sign pattern of planes [4·band, 4·band+4) over the
    double-cast ``embedding`` column."""
    terms = []
    for b in range(HP_BITS):
        j = band * HP_BITS + b
        plane = _HP_PLANE.format(j=j)
        dot_j = (
            f"aggregate(zip_with(embedding, transform(sequence(0, {DIM - 1}),"
            f" i -> {plane}), (x, w) -> x * w), 0D, (a, v) -> a + v)"
        )
        terms.append(f"CASE WHEN ({dot_j}) > 0 THEN {2 ** b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _hp_band_duck(band: int, col: str = "embedding") -> str:
    terms = []
    for b in range(HP_BITS):
        j = band * HP_BITS + b
        plane = _HP_PLANE.format(j=j)
        dot_j = f"list_sum([{col}[i + 1] * {plane} for i in range(0, {DIM})])"
        terms.append(f"CASE WHEN ({dot_j}) > 0 THEN {2 ** b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


#: every 20th vector gets a near-identical mutant (vec_id + 100000):
#: elementwise double cast plus a tiny deterministic perturbation
#: ((i·7 + vec_id mod 11) mod 5 − 2) · 0.01 — cosine ≈ 0.999 to its
#: source, so true semantic near-dups exist and are recovered. All-double
#: arithmetic, identical expression order cross-engine → bit-exact.
_CORPUS_DUCK_EMB = f"""
  SELECT vec_id,
         [CAST(embedding[i + 1] AS DOUBLE) for i in range(0, {DIM})] AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         [CAST(embedding[i + 1] AS DOUBLE)
          + ((i * 7 + vec_id % 11) % 5 - 2) * 0.01 for i in range(0, {DIM})] AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
"""


def _emb_corpus_with_mutants(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.expr("transform(embedding, x -> double(x))").alias("embedding")
    )
    mutants = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) ->"
            " double(x) + ((i * 7 + vec_id % 11) % 5 - 2) * 0.01)"
        ).alias("embedding"),
    )
    return base.unionByName(mutants)


@query(
    "e35_hyperplane_semdedup",
    oracle=f"""
WITH corpus AS ({_CORPUS_DUCK_EMB}),
sig AS (
  SELECT vec_id, embedding,
         sqrt(list_sum([embedding[i] * embedding[i] for i in range(1, {DIM + 1})])) AS nrm,
         {', '.join(f'CAST({_hp_band_duck(b)} AS INT) AS band{b}' for b in range(HP_BANDS))}
  FROM corpus
),
bands AS (
  {' UNION ALL '.join(f'SELECT vec_id, embedding, nrm, {b} AS band, band{b} AS bkey FROM sig' for b in range(HP_BANDS))}
),
pairs AS (
  SELECT a.vec_id AS ia,
         list_sum([a.embedding[i] * b.embedding[i] for i in range(1, {DIM + 1})])
           / (a.nrm * b.nrm) AS cosine
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                            AND b.vec_id < a.vec_id
),
lower_max AS (SELECT ia, MAX(cosine) AS mc FROM pairs GROUP BY ia)
SELECT s.vec_id,
       ROUND(COALESCE(l.mc, -1.0), 6) AS max_lower_cosine,
       COALESCE(l.mc, -1.0) < {TAU_HP} AS is_kept
FROM sig s LEFT JOIN lower_max l ON l.ia = s.vec_id
""",
)
def e35_hyperplane_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E35 CENTROID-FREE semantic dedup: e17's prune decision without a
    trained quantizer — candidate pairs come from random-hyperplane sign
    bands (e2c's signed-projection fingerprint generalized to float
    vectors; Charikar '02) instead of k-means cluster membership, so the
    tier needs no training pass at all: one narrow signature projection,
    one self-equi-join on (band, band_key), one max-aggregate.

    At 100 TB this is the bootstrap dedup you can run on day one — no
    sample, no centroid fit, no broadcast model; band keys are 4-bit ints
    so bucket sizes stay collision-bounded, and the skew/cap machinery of
    the text LSH tier (lsh_candidate_pairs_salted / max_bucket_size)
    composes on the same (band, key) shape if a direction is degenerate.

    Duplicate pairs colliding in several bands need no dedup step — the
    downstream aggregate is MAX, which is duplicate-insensitive (the same
    trick e2b cannot use because it counts bands). Seeded near-identical
    mutants (cosine ≈ 0.999) make the prune observable; recall vs the
    exact e3-style all-pairs truth is floor-asserted in
    tests/test_similarity_recall.py."""
    corpus = _emb_corpus_with_mutants(spark, sf_dir)
    sig = corpus.select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        *[
            F.expr(_hp_band_spark(b)).cast("int").alias(f"band{b}")
            for b in range(HP_BANDS)
        ],
    )
    bands = sig.select(
        "vec_id",
        "embedding",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"band{b}").alias("bkey")
                    )
                    for b in range(HP_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "embedding", "nrm", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a = bands.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
        "band",
        "bkey",
    )
    b = bands.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
    )
    cos = dot("ea", "eb") / (F.col("na") * F.col("nb"))
    lower_max = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("ib") < F.col("ia")),
        )
        .groupBy("ia")
        .agg(F.max(cos).alias("mc"))
    )
    mc = F.coalesce("mc", F.lit(-1.0))
    return sig.join(lower_max, sig.vec_id == lower_max.ia, "left").select(
        "vec_id",
        F.round(mc, 6).alias("max_lower_cosine"),
        (mc < F.lit(TAU_HP)).alias("is_kept"),
    )
