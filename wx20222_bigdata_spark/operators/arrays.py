"""Array/sequence operators — the reference's signature ETL layer
(SURVEY.md §2.4 A5-A8, §2.5 W4, §2.6 O1/O3, §2.8 F9-F12, §2.7 U2).

Everything here is a *narrow* transformation on array columns using Spark's
higher-order functions (``transform``/``zip_with``/``aggregate``/``slice``)
— JVM-side, codegen'd, zero shuffle, linear scans. This is deliberately NOT
a pandas-UDF layer: at 100 TB the difference between a codegen'd
``aggregate()`` and an Arrow round-trip per row-batch is the whole game.

Float determinism: element order is identical on both engines (array order),
math is promoted to double before any reduction, and final scalars are
rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


@query(
    "a5_masked_mean_pool",
    oracle="""
SELECT vec_id,
       ROUND(
         list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN CAST(x AS DOUBLE) ELSE 0.0 END))
         / list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END)),
         6) AS pooled
FROM embeddings
WHERE list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END)) > 0
""",
)
def a5_masked_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 masked weighted mean-pool — ``(hidden*mask).sum()/mask.sum()``
    (``model.py:48-49``) with the mask derived as x>0, computed entirely
    with higher-order functions."""
    emb = load_table(spark, sf_dir, "embeddings")
    weighted = F.expr(
        "aggregate(embedding, 0D, (a, x) -> a + CASE WHEN x > 0 THEN double(x) ELSE 0D END)"
    )
    mask_sum = F.expr(
        "aggregate(embedding, 0D, (a, x) -> a + CASE WHEN x > 0 THEN 1D ELSE 0D END)"
    )
    return (
        emb.select("vec_id", weighted.alias("wsum"), mask_sum.alias("msum"))
        .filter(F.col("msum") > 0)
        .select("vec_id", F.round(F.col("wsum") / F.col("msum"), 6).alias("pooled"))
    )


@query(
    "a6_last4_mean",
    oracle="""
SELECT vec_id,
       ROUND(list_sum(list_transform(list_slice(embedding, -4, -1), x -> CAST(x AS DOUBLE))) / 4, 6) AS last4_mean
FROM embeddings
""",
)
def a6_last4_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 mean of the last four states (``model.py:53-54`` averages the last
    4 hidden snapshots): tail slice + fold."""
    emb = load_table(spark, sf_dir, "embeddings")
    tail_sum = F.expr("aggregate(slice(embedding, -4, 4), 0D, (a, x) -> a + double(x))")
    return emb.select(
        "vec_id", F.round(tail_sum / 4, 6).alias("last4_mean")
    )


@query(
    "a8_argmax",
    oracle="""
SELECT vec_id,
       CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_pos,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_score
FROM embeddings
""",
)
def a8_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 argmax over a score vector (``torch.argmax`` at ``inference.py:45``):
    first position of the max, 1-based on both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.array_position(F.col("embedding"), F.array_max("embedding"))
        .cast("int")
        .alias("argmax_pos"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_score"),
    )


@query(
    "a7_ensemble_argmax",
    oracle="""
WITH idx AS (
  SELECT vec_id, i,
         CAST(embedding[i] AS DOUBLE) AS v,
         CAST(embedding[65 - i] AS DOUBLE) AS rv
  FROM embeddings, unnest(range(1, 65)) AS t(i)
),
scores AS (
  SELECT vec_id, i, (v + rv) + (-0.5 * v) AS score FROM idx
),
ranked AS (
  SELECT vec_id, i AS best_pos, score,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, i ASC) AS rn
  FROM scores
)
SELECT vec_id, CAST(best_pos AS INT) AS best_pos, ROUND(score, 6) AS best_score
FROM ranked WHERE rn = 1
""",
)
def a7_ensemble_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 ensemble sum-reduce + A8 argmax — ``pred_all += pred_label_id``
    over K models then argmax (``inference_kfold.py:83-90``).

    Three deterministic 'model' score vectors per row (identity, reversed,
    -0.5×) are exploded to (vec_id, pos, score), summed by (vec_id, pos) —
    the distributed ensemble shape: each model's scores arrive as separate
    rows, the combine is a grouped sum, NOT a per-row zip — then the argmax
    is a window top-1 per vec_id."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    # one scan: the 3 model score vectors are generated per row and
    # exploded together (a union of 3 selects would read the table 3x).
    models = emb.select(
        "vec_id",
        F.explode(
            F.array(
                F.expr("transform(embedding, x -> double(x))"),
                F.expr("transform(reverse(embedding), x -> double(x))"),
                F.expr("transform(embedding, x -> -0.5 * double(x))"),
            )
        ).alias("s"),
    )
    long = models.select("vec_id", F.posexplode("s").alias("pos0", "score")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "score"
    )
    summed = long.groupBy("vec_id", "pos").agg(F.sum("score").alias("score"))
    w = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), F.col("pos").asc())
    return (
        summed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("best_pos"),
            F.round("score", 6).alias("best_score"),
        )
    )


@query(
    "o1_stride_sample",
    oracle="""
SELECT vec_id,
       len(list_select(embedding, [x for x in range(1, 65) if (x - 1) % 4 = 0])) AS n_sampled,
       ROUND(list_sum(list_transform(
         list_select(embedding, [x for x in range(1, 65) if (x - 1) % 4 = 0]),
         x -> CAST(x AS DOUBLE))), 6) AS sampled_sum
FROM embeddings
""",
)
def o1_stride_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 uniform stride sampling — every step-th frame, deterministic
    (``data_helper.py:168-172``): index-aware ``filter`` higher-order fn."""
    emb = load_table(spark, sf_dir, "embeddings")
    sampled = F.expr("filter(embedding, (x, i) -> i % 4 = 0)")
    return emb.select(
        "vec_id",
        F.size(sampled).cast("bigint").alias("n_sampled"),
        F.round(
            F.expr(
                "aggregate(filter(embedding, (x, i) -> i % 4 = 0), 0D, (a, x) -> a + double(x))"
            ),
            6,
        ).alias("sampled_sum"),
    )


@query(
    "o3_pad_to_length",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
fixed AS (
  SELECT doc_id,
         len(t) AS orig_len,
         CASE WHEN len(t) >= 32 THEN t[1:32]
              ELSE list_concat(t, ['<pad>' for i in range(1, 33 - len(t))]) END AS padded
  FROM toks
)
SELECT doc_id,
       orig_len,
       len(padded) AS padded_len,
       CAST(list_sum(list_transform(padded, x -> CASE WHEN x = '<pad>' THEN 0 ELSE 1 END)) AS INT) AS attention_len,
       array_to_string(list_slice(padded, -3, -1), ' ') AS tail3
FROM fixed
""",
)
def o3_pad_to_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/F9 truncate-or-pad to a fixed length with an attention mask —
    the 256-token pad of ``data_helper.py:72-75`` (``input_ids + [0]*pad``),
    on word tokens with a '<pad>' sentinel. The mask length equals the
    un-padded prefix, exactly like ``attention_mask``."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    padded = F.when(F.size(toks) >= 32, F.slice(toks, 1, 32)).otherwise(
        F.concat(
            toks, F.array_repeat(F.lit("<pad>"), 32 - F.size(toks))
        )
    )
    # attention_len folds over the SAME padded Column (one definition of
    # the truncate-or-pad logic; a duplicated expression string would
    # silently desynchronize if the budget/sentinel changed).
    attention_len = F.aggregate(
        padded,
        F.lit(0),
        lambda a, x: a + F.when(x == "<pad>", 0).otherwise(1),
    ).cast("int")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("orig_len"),
        F.size(padded).cast("bigint").alias("padded_len"),
        attention_len.alias("attention_len"),
        F.concat_ws(" ", F.slice(padded, -3, 3)).alias("tail3"),
    )


@query(
    "w4_head_tail_truncate",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id,
       len(t) AS orig_len,
       array_to_string(
         CASE WHEN len(t) <= 16 THEN t
              ELSE list_concat(t[1:8], list_slice(t, -8, -1)) END, ' ') AS head_tail_text,
       len(CASE WHEN len(t) <= 16 THEN t
            ELSE list_concat(t[1:8], list_slice(t, -8, -1)) END) AS new_len
FROM toks
""",
)
def w4_head_tail_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/F8 head+tail truncation — drop the middle, keep first-mid and
    last-mid (``data_helper.py:44-50``'s ``cut_min``): budget 16, keep 8+8."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    truncated = F.when(F.size(toks) <= 16, toks).otherwise(
        F.concat(F.slice(toks, 1, 8), F.slice(toks, -8, 8))
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("orig_len"),
        F.concat_ws(" ", truncated).alias("head_tail_text"),
        F.size(truncated).cast("bigint").alias("new_len"),
    )


@query(
    "f11_cosine_pairs",
    oracle="""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
)
SELECT id_a, id_b,
       ROUND(
         list_sum(list_transform(list_zip(ea, eb), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(ea, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(eb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         6) AS cosine
FROM pairs
""",
)
def f11_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 vector dot product / cosine (``torch.mm`` similarity logits,
    ``pretrained_model.py:255-275``) between consecutive ids: ``zip_with``
    product + ``aggregate`` fold, all codegen'd."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    from wx20222_bigdata_spark.functions.vector import cosine

    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select("id_a", "id_b", F.round(cosine("ea", "eb"), 6).alias("cosine"))
    )


@query(
    "f12_softmax_stats",
    oracle="""
WITH logits AS (
  SELECT vec_id, list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)) AS l
  FROM embeddings
),
sm AS (
  SELECT vec_id, l,
         list_max(l) AS m,
         list_sum(list_transform(l, x -> exp(x - list_max(l)))) AS z
  FROM logits
)
SELECT vec_id,
       ROUND(exp(list_max(l) - m) / z, 6) AS max_prob,
       ROUND(list_sum(list_transform(l, x -> exp(x - m) / z)), 6) AS prob_sum
FROM sm
""",
)
def f12_softmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 numerically-stable softmax (``torch.softmax``, ``model.py:201``)
    over the first 8 logits: subtract-max trick, then the max probability
    and the (≈1.0) probability mass as scalar checks."""
    emb = load_table(spark, sf_dir, "embeddings")
    logits = emb.select(
        "vec_id", F.expr("transform(slice(embedding, 1, 8), x -> double(x))").alias("l")
    )
    m = F.array_max("l")
    z = F.expr("aggregate(transform(l, x -> exp(x - array_max(l))), 0D, (a, x) -> a + x)")
    return logits.select(
        "vec_id",
        F.round(F.exp(m - m) / z, 6).alias("max_prob"),
        F.round(
            F.expr(
                """aggregate(
                     transform(l, x -> exp(x - array_max(l)) /
                       aggregate(transform(l, y -> exp(y - array_max(l))), 0D, (a, v) -> a + v)),
                     0D, (a, x) -> a + x)"""
            ),
            6,
        ).alias("prob_sum"),
    )


@query(
    "u2_sequence_concat",
    oracle="""
SELECT vec_id,
       len(list_concat(embedding[1:8], list_slice(embedding, 2, 9))) AS seq_len,
       ROUND(list_sum(list_transform(
         list_concat(embedding[1:8], list_slice(embedding, 2, 9)),
         x -> CAST(x AS DOUBLE))), 6) AS seq_sum
FROM embeddings
""",
)
def u2_sequence_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 sequence-axis concat — ``s1 + s2[1:]`` token-seq merge
    (``data_helper.py:72``): head slice ++ CLS-trimmed slice."""
    emb = load_table(spark, sf_dir, "embeddings")
    merged = F.concat(F.slice("embedding", 1, 8), F.slice("embedding", 2, 8))
    return emb.select(
        "vec_id",
        F.size(merged).cast("bigint").alias("seq_len"),
        F.round(
            F.expr(
                "aggregate(concat(slice(embedding, 1, 8), slice(embedding, 2, 8)), 0D, (a, x) -> a + double(x))"
            ),
            6,
        ).alias("seq_sum"),
    )


@query(
    "f10_mask_arithmetic",
    oracle="""
WITH m AS (
  SELECT vec_id,
         list_transform(embedding, x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END) AS mask
  FROM embeddings
)
SELECT vec_id,
       CAST(list_sum(mask) AS INT) AS n_active,
       ROUND(list_sum(list_transform(mask, x -> (1.0 - x) * -10000.0)), 6) AS additive_mask_sum
FROM m
""",
)
def f10_mask_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 elementwise mask arithmetic — the attention-bias trick
    ``(1-mask)*-10000`` (``model.py:136-139``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    mask = F.expr("transform(embedding, x -> CASE WHEN x > 0 THEN 1D ELSE 0D END)")
    return emb.select(
        "vec_id",
        F.expr(
            "CAST(aggregate(transform(embedding, x -> CASE WHEN x > 0 THEN 1D ELSE 0D END), 0D, (a, x) -> a + x) AS INT)"
        ).alias("n_active"),
        F.round(
            F.expr(
                "aggregate(transform(embedding, x -> CASE WHEN x > 0 THEN 1D ELSE 0D END), 0D, (a, x) -> a + (1D - x) * -10000D)"
            ),
            6,
        ).alias("additive_mask_sum"),
    )


@query(
    "f_array_breadth",
    oracle="""
WITH a AS (
  SELECT vec_id, embedding[1:8] AS e FROM embeddings
)
SELECT vec_id,
       ROUND(CAST(list_sort(list_transform(e, x -> CAST(x AS DOUBLE)))[1] AS DOUBLE), 6) AS sorted_first,
       len(list_filter(e, x -> x > 0)) AS n_positive,
       list_sum(list_transform(e, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)) > 0 AS any_positive,
       len(list_filter(e, x -> x > 0)) = len(e) AS all_positive,
       len(flatten([e, e])) AS doubled_len,
       [x for x in range(1, 4)] = [1, 2, 3] AS seq_check
FROM a
""",
)
def f_array_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth in one projection: sort, filter,
    exists/forall quantifiers, flatten, sequence — the remaining builtin
    surface the ETL layer leans on (all codegen, no shuffle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.slice("embedding", 1, 8)
    return emb.select(
        "vec_id",
        F.round(
            F.expr("sort_array(transform(slice(embedding, 1, 8), x -> double(x)))")[0],
            6,
        ).alias("sorted_first"),
        F.size(F.filter(e, lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.exists(e, lambda x: x > 0).alias("any_positive"),
        F.forall(e, lambda x: x > 0).alias("all_positive"),
        F.size(F.flatten(F.array(e, e))).cast("bigint").alias("doubled_len"),
        (F.sequence(F.lit(1), F.lit(3)) == F.array(F.lit(1), F.lit(2), F.lit(3))).alias(
            "seq_check"
        ),
    )
