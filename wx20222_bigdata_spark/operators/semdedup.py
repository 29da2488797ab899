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
