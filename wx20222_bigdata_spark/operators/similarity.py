"""Embedding similarity search (SURVEY.md §2.11 E3; north-star ANN surface).

Three tiers:

- **Brute-force cosine top-k** — exact baseline. Query side is broadcast
  (it is small by construction); candidates stream. At 100 TB of vectors
  this is the per-bucket inner loop, never the global plan.
- **Random-hyperplane LSH (SimHash-for-vectors)** — deterministic planes
  bucket vectors by sign pattern; search only joins equal buckets. The
  bucket join is an equi-join: shuffle on bucket id, skew handled by AQE.
- **IVF (inverted-file) probe** — coarse-quantize to centroids, search the
  nearest partitions only (rows-only: float centroid means are not
  bit-reproducible across engines).

**Production ANN default: :func:`ivf_kmeans_topk`** — IVF whose coarse
quantizer is trained FROM THE DATA (Lloyd iterations, deterministic init),
not taken from a pre-existing label column. This is the route a 100 TB
deployment runs: k-means||-style training on a sample, broadcast centroid
table, map-side list assignment, probe the ``n_probe`` nearest lists.
Recall is corpus-dependent and therefore MEASURED, not assumed: on
clustered corpora (the case IVF exists for) 2 probes of 10 lists clear
recall@10 ≥ 0.8; on the synthetic isotropic testdata embeddings recall
approaches n_probe/n_lists, so hitting 0.8 needs ~8/10 probes — both
curves are recorded in SCALE.md and floor-asserted in
tests/test_similarity_recall.py at sf0.01 and (SCALE.md) sf1.

Dot products use the ``zip_with``/``aggregate`` fold (F11) — element order
fixed, math in double, cosine rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

N_QUERIES = 10  #: queries are vec_id < N_QUERIES
TOP_K = 5
N_PLANES = 8

#: deterministic hyperplane weights: w_j[i] = ((j*64 + i) % 13) - 6
_PLANE = "((({j} * 64 + i) % 13) - 6)"


from wx20222_bigdata_spark.functions.vector import dot as _dot
from wx20222_bigdata_spark.functions.vector import norm as _norm


@query(
    "e3_cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS cand_id, embedding AS ce FROM embeddings
),
scored AS (
  SELECT query_id, cand_id,
         list_sum([CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) for i in range(1, 65)])
         / (sqrt(list_sum([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) for i in range(1, 65)]))
            * sqrt(list_sum([CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) for i in range(1, 65)]))) AS cosine
  FROM q, c
  WHERE query_id <> cand_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, CAST(rnk AS BIGINT) AS rnk, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rnk <= {TOP_K}
""",
)
def e3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 brute-force cosine top-k: broadcast the query set against the
    candidate stream, rank per query. The exact-search baseline every ANN
    variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    # the broadcast hint on q is safe: vec_id < N_QUERIES bounds it to a
    # constant <=10-row probe set regardless of SF (allowlisted in
    # test_no_forced_broadcast_of_sf_scaled_table — the plan can't see
    # this bound)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    cosine = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "rnk", F.round("cosine", 6).alias("cosine"))
    )


def _bucket_expr_spark() -> F.Column:
    """LSH bucket id: 8-bit sign pattern of dot(embedding, plane_j).

    The plane weights are LITERAL arrays, not the per-row
    ``transform(sequence(0, 63), i -> ...)`` construction: the literal
    form constant-folds into the plan and saves rebuilding the weight
    array per row (r6 A/B at sf0.1, 9 interleaved reps: literal 0.337 s
    vs transform 0.378 s vs flat 64-term arithmetic chain 0.99 s vs
    13-residue factorization 0.531 s — the giant flat expression loses
    codegen locality, so the fold stays). Fold order is unchanged, so
    buckets agree bit-for-bit with the DuckDB oracle's ``list_sum``
    (cross-checked: 0 mismatches over sf0.1)."""
    terms = []
    for j in range(N_PLANES):
        w = [((j * 64 + i) % 13) - 6 for i in range(64)]
        arr = "array(" + ",".join(f"{v}D" for v in w) + ")"
        dot_j = (
            f"aggregate(zip_with(embedding, {arr},"
            f" (x, w) -> double(x) * w), 0D, (a, v) -> a + v)"
        )
        terms.append(f"CASE WHEN ({dot_j}) > 0 THEN {2 ** j} ELSE 0 END")
    return F.expr(" + ".join(terms)).cast("bigint")


def _bucket_expr_duck(col: str) -> str:
    terms = []
    for j in range(N_PLANES):
        plane = _PLANE.format(j=j)
        dot_j = (
            f"list_sum([CAST({col}[i + 1] AS DOUBLE) * {plane} for i in range(0, 64)])"
        )
        terms.append(f"CASE WHEN ({dot_j}) > 0 THEN {2 ** j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


@query(
    "e3b_lsh_bucket_ann",
    oracle=f"""
WITH sig AS (
  SELECT vec_id, embedding, CAST({_bucket_expr_duck('embedding')} AS BIGINT) AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM sig WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS cand_id, embedding AS ce, bucket FROM sig),
cand AS (
  SELECT query_id, cand_id, q.bucket,
         list_sum([CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) for i in range(1, 65)])
         / (sqrt(list_sum([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) for i in range(1, 65)]))
            * sqrt(list_sum([CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) for i in range(1, 65)]))) AS cosine
  FROM q JOIN c USING (bucket)
  WHERE query_id <> cand_id
),
ranked AS (
  SELECT query_id, cand_id, bucket, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM cand
)
SELECT query_id, cand_id, bucket, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rnk = 1
""",
)
def e3b_lsh_bucket_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 LSH-bucketed ANN — random-hyperplane signatures with fixed
    deterministic planes; candidates restricted to the query's bucket, so
    the search is an equi-join on bucket id (the 100 TB-scale path: no
    cross join anywhere). Returns each query's best in-bucket neighbor;
    queries whose bucket has no other member legitimately return nothing
    (probe-multiple-buckets is the standard recall fix)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sig = emb.select("vec_id", "embedding", _bucket_expr_spark().alias("bucket"))
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "bucket"
    )
    c = sig.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), "bucket"
    )
    cosine = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    # The query side is N_QUERIES rows by construction: broadcast it so
    # the bucket join never shuffles the candidate corpus (at 100 TB the
    # corpus-side exchange would otherwise dominate the query). The plan
    # can't see the vec_id bound, so the seat is allowlisted in
    # test_no_forced_broadcast_of_sf_scaled_table.
    cand = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "bucket", cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("query_id", "cand_id", "bucket", F.round("cosine", 6).alias("cosine"))
    )


_E3C_N_PROBE = 2  #: inverted lists probed per query


@query(
    "e3c_ivf_probe_ann",
    oracle=f"""
WITH dims AS (
  SELECT vec_id, label, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
),
perdim AS (
  SELECT label, dim, list_sum(list(v ORDER BY vec_id)) / COUNT(*) AS cv
  FROM dims GROUP BY label, dim
),
cent AS (
  SELECT label AS list_id, list(cv ORDER BY dim) AS centroid
  FROM perdim GROUP BY label
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
probe_scored AS (
  SELECT query_id, qe, list_id,
         list_sum([(CAST(qe[i] AS DOUBLE) - centroid[i])
                   * (CAST(qe[i] AS DOUBLE) - centroid[i])
                   for i in range(1, 65)]) AS d2
  FROM q, cent
),
probes AS (
  SELECT query_id, qe, list_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY d2 ASC, list_id ASC) AS pr
        FROM probe_scored)
  WHERE pr <= {_E3C_N_PROBE}
),
cand AS (
  SELECT p.query_id, e.vec_id AS cand_id, p.list_id,
         list_sum([CAST(p.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
                   for i in range(1, 65)])
         / (sqrt(list_sum([CAST(p.qe[i] AS DOUBLE) * CAST(p.qe[i] AS DOUBLE)
                           for i in range(1, 65)]))
            * sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE)
                             * CAST(e.embedding[i] AS DOUBLE)
                             for i in range(1, 65)]))) AS cosine
  FROM probes p JOIN embeddings e ON e.label = p.list_id
  WHERE p.query_id <> e.vec_id
),
ranked AS (
  SELECT query_id, cand_id, list_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM cand
)
SELECT query_id, cand_id, list_id, CAST(rnk AS BIGINT) AS rnk,
       ROUND(cosine, 6) AS cosine
FROM ranked WHERE rnk <= {TOP_K}
""",
)
def e3c_ivf_probe_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 IVF-style probe: coarse centroids = per-label mean vectors;
    each query probes its {_E3C_N_PROBE} nearest centroids and searches
    only those inverted lists. The scale shape: centroids tiny →
    broadcast; candidate search shuffles on list id only.

    Oracle-checked (upgraded r7, the e14 trick): the centroid mean folds
    members in ascending vec_id order — ``aggregate`` over the
    ``array_sort(collect_list(struct(vec_id, v)))`` here, DuckDB
    ``list_sum(list(v ORDER BY vec_id))`` there — so the double sums are
    order-deterministic and bit-identical cross-engine (float means
    were the old rows-only blocker; kmeans.py:73-81 solved it first)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # centroids: per-label elementwise mean, folded in vec_id order so
    # the double sum is reproducible (kmeans._update pattern).
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    )
    cent = (
        dims.groupBy("label", "dim")
        .agg(
            (
                F.expr(
                    "aggregate(transform(array_sort(collect_list(struct(vec_id, v))),"
                    " s -> double(s.v)), 0D, (a, x) -> a + x)"
                )
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("pairs"))
        .select(
            F.col("label").alias("list_id"),
            F.expr("transform(pairs, p -> p.cv)").alias("centroid"),
        )
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = q.crossJoin(F.broadcast(cent))
    d2 = F.expr(
        "aggregate(zip_with(qe, centroid, (x, c) -> (double(x) - c) * (double(x) - c)), 0D, (a, v) -> a + v)"
    )
    w = Window.partitionBy("query_id").orderBy(d2.asc(), F.col("list_id").asc())
    probes = qc.withColumn("probe_rank", F.row_number().over(w)).filter(
        F.col("probe_rank") <= _E3C_N_PROBE
    ).select("query_id", "qe", "list_id")
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("list_id"),
    )
    cosine = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    cand = (
        probes.join(c, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "list_id", cosine.alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "list_id", "rnk", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Parametric search helpers (recall measurement, VERDICT r1 item 4).
#
# The declared queries above fix their parameters for oracle stability; these
# helpers expose k / probe-width / table-count so tests can measure recall@k
# against the exact baseline and SCALE.md can record the tuning curve. The
# multi-table form is the production LSH design: L independent small hash
# tables, candidates = union of same-bucket hits — P(candidate) =
# 1-(1-p^b)^L, tunable to any recall target without touching the plan shape
# (each table is just another shuffle key).
# ---------------------------------------------------------------------------


def exact_topk(emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Brute-force cosine top-k (query_id, cand_id, rnk) — ground truth."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    cosine = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk")
    )


def _table_bucket_exprs(n_tables: int, n_planes: int) -> list[str]:
    """Per-table bucket ids from deterministic hyperplanes
    w[l,j,i] = (((l*31 + j)*64 + i) % 13) - 6."""
    exprs = []
    for l in range(n_tables):
        terms = []
        for j in range(n_planes):
            plane = f"(((({l} * 31 + {j}) * 64 + i) % 13) - 6)"
            dot_j = (
                f"aggregate(zip_with(embedding, transform(sequence(0, 63), i -> {plane}),"
                f" (x, w) -> double(x) * w), 0D, (a, v) -> a + v)"
            )
            terms.append(f"CASE WHEN ({dot_j}) > 0 THEN {2 ** j} ELSE 0 END")
        exprs.append("(" + " + ".join(terms) + ")")
    return exprs


def lsh_multitable_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_tables: int = 12,
    n_planes: int = 4,
) -> DataFrame:
    """Multi-table LSH ANN: candidates = union over L tables of same-bucket
    vectors, then exact cosine rank within candidates. Plan shape: one
    narrow signature pass, equi-join on (table, bucket), dedup, rank —
    no cross join; shuffle volume = L x corpus."""
    buckets = F.array(*[F.expr(e).cast("bigint") for e in _table_bucket_exprs(n_tables, n_planes)])
    sig = emb.select("vec_id", "embedding", F.posexplode(buckets).alias("table", "bucket"))
    q = sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "table", "bucket"
    )
    c = sig.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), "table", "bucket"
    )
    cand = (
        q.join(c, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    cosine = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        cand.select("query_id", "cand_id", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk")
    )


def ivf_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K, n_probe: int = 2
) -> DataFrame:
    """IVF probe with tunable probe width (e3c generalized). On clustered
    corpora recall concentrates in the first probes; on isotropic data it
    approaches n_probe/n_lists — the measured curve lives in SCALE.md."""
    dims = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("v").alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("pairs"))
        .select(
            F.col("label").alias("list_id"),
            F.expr("transform(pairs, p -> p.cv)").alias("centroid"),
        )
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = q.crossJoin(F.broadcast(cent))
    d2 = F.expr(
        "aggregate(zip_with(qe, centroid, (x, c) -> (double(x) - c) * (double(x) - c)), 0D, (a, v) -> a + v)"
    )
    w = Window.partitionBy("query_id").orderBy(d2.asc(), F.col("list_id").asc())
    probes = (
        qc.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "qe", "list_id")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("list_id"),
    )
    cosine = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    cand = (
        probes.join(c, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine.alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk")
    )


def train_ivf_centroids(
    emb: DataFrame, n_lists: int, n_iters: int = 3
) -> DataFrame:
    """Train an IVF coarse quantizer from the corpus itself: ``n_iters``
    Lloyd iterations from a deterministic init (the ``n_lists`` lowest
    vec_ids). Returns (list_id, centroid array<double>).

    Scale shape: each iteration is one broadcast of the K-row centroid
    table (map-side nearest-centroid assignment — no shuffle of vectors)
    plus one (k, dim) aggregation shuffle for the update; K·D is tiny.
    At 100 TB you train on a sample (quantizer quality needs only
    O(K·reps) vectors) and this exact plan runs on ``emb.sample(...)``;
    kmeans.py's ordered-fold variant exists where bit-reproducibility
    against an external oracle is required — this production path uses
    plain float means."""
    v = emb.select("vec_id", F.expr("transform(embedding, x -> double(x))").alias("ve"))
    cent = (
        v.orderBy("vec_id")
        .limit(n_lists)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("list_id"),
            F.col("ve").alias("centroid"),
        )
    )
    d2 = F.expr(
        "aggregate(zip_with(ve, centroid, (x, c) -> (x - c) * (x - c)), 0D, (a, s) -> a + s)"
    )
    for _ in range(n_iters):
        scored = v.crossJoin(F.broadcast(cent)).select(
            "vec_id", "ve", "list_id", d2.alias("d")
        )
        w = Window.partitionBy("vec_id").orderBy("d", "list_id")
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "ve", "list_id")
        )
        cent = (
            assigned.select("list_id", F.posexplode("ve").alias("i", "x"))
            .groupBy("list_id", "i")
            .agg(F.avg("x").alias("c"))
            .groupBy("list_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, c))), s -> s.c)"
                ).alias("centroid")
            )
        )
    return cent


def ivf_kmeans_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_lists: int = 10,
    n_probe: int = 2,
    n_iters: int = 3,
) -> DataFrame:
    """**Production ANN default**: IVF search over a coarse quantizer
    trained from the data (:func:`train_ivf_centroids`) — no reliance on
    a pre-existing label column. Corpus vectors are assigned to their
    nearest centroid once (map-side, broadcast centroids); each query
    probes its ``n_probe`` nearest lists and ranks exact cosine within
    the probed candidates. Work per query = n_probe/n_lists of the
    corpus; the candidate join is an equi-join on list_id."""
    cent = F.broadcast(train_ivf_centroids(emb, n_lists, n_iters))
    v = emb.select(
        "vec_id",
        "embedding",
        F.expr("transform(embedding, x -> double(x))").alias("ve"),
    )
    d2 = F.expr(
        "aggregate(zip_with(ve, centroid, (x, c) -> (x - c) * (x - c)), 0D, (a, s) -> a + s)"
    )
    w = Window.partitionBy("vec_id").orderBy("d", "list_id")
    assigned = (
        v.crossJoin(cent)
        .select("vec_id", "embedding", "ve", "list_id", d2.alias("d"))
        .withColumn("rn", F.row_number().over(w))
    )
    lists = assigned.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        "list_id",
    )
    probes = (
        assigned.filter(F.col("vec_id") < n_queries)
        .filter(F.col("rn") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            "list_id",
        )
    )
    cosine = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    cand = (
        probes.join(lists, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine.alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk")
    )


def recall_at_k(ann: DataFrame, exact: DataFrame) -> float:
    """Mean per-query |ann ∩ exact| / |exact| over the exact result's
    query set (queries the ANN missed entirely count as 0)."""
    e = exact.groupBy("query_id").agg(F.collect_set("cand_id").alias("truth"))
    a = ann.groupBy("query_id").agg(F.collect_set("cand_id").alias("got"))
    joined = e.join(a, "query_id", "left").select(
        (
            F.size(F.array_intersect("truth", F.coalesce("got", F.array())))
            / F.size("truth")
        ).alias("r")
    )
    return float(joined.agg(F.avg("r")).collect()[0][0])


RP_OUT_DIMS = 16  #: JL random-projection target dimensionality (64 → 16)


def _rp_matrix() -> list[list[float]]:
    """Deterministic dense random-projection matrix R[64][16], entries in
    [-1, 1] milli-units derived from md5 of the cell coordinates — both
    engines receive R as the SAME literal, so no data-dependent or
    engine-dependent randomness exists anywhere."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"rp-{i}-{j}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
            / 1000.0
            for j in range(RP_OUT_DIMS)
        ]
        for i in range(64)
    ]


def _rp_oracle() -> str:
    R = _rp_matrix()
    cols = []
    for j in range(RP_OUT_DIMS):
        terms = f"[CAST(embedding[i + 1] AS DOUBLE) * ([{','.join(repr(R[i][j]) for i in range(64))}])[i + 1] for i in range(0, 64)]"
        cols.append(f"ROUND(list_sum({terms}), 6) AS d{j}")
    inner = ",\n       ".join(cols)
    return f"""
WITH proj AS (
  SELECT vec_id,
       {inner}
  FROM embeddings
)
SELECT vec_id, {", ".join(f"d{j}" for j in range(RP_OUT_DIMS))}
FROM proj
"""


@query("e29_random_projection", oracle=_rp_oracle())
def e29_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E29 Johnson–Lindenstrauss random projection — 64-d embeddings
    densely projected to {RP_OUT_DIMS}-d with a deterministic md5-derived
    matrix: THE preprocessing step that makes 100 TB-scale ANN tractable
    (shrink vectors before e3b/e3c bucketing; JL guarantees pairwise
    distances survive within ε). Pure narrow projection — zero shuffle,
    whole-stage codegen, the matrix rides into every task as plan
    literals (at 768-d+ you'd broadcast it and use a pandas UDF — x4c's
    shape — but the declarative form is exact and oracle-checkable).

    Exactness: each output dim is ONE fixed-order sequential fold of 64
    multiply-adds (landmine 16: Spark aggregate(zip_with(...)) ==
    DuckDB list_sum comprehension, bit-for-bit), rounded once at emit.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    R = _rp_matrix()
    cols = []
    for j in range(RP_OUT_DIMS):
        arr = f"array({','.join(repr(R[i][j]) for i in range(64))})"
        cols.append(
            F.round(
                F.expr(
                    f"aggregate(zip_with(embedding, {arr}, "
                    f"(x, w) -> double(x) * w), 0D, (a, v) -> a + v)"
                ),
                6,
            ).alias(f"d{j}")
        )
    return emb.select("vec_id", *cols)
