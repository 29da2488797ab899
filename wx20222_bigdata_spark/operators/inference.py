"""UDF surface + batch model inference (SURVEY.md §2.10 X1-X4, §3.2).

The reference's hot Python loop — DataLoader batches through a torch model
(``inference_kfold.py:68-90``) — maps to Arrow-batched pandas UDFs:

- X1 scalar ``pandas_udf``: vectorized per-row kernels (the tokenizer seat).
- X2 ``applyInPandas``: per-group stateful kernels (the EMA/UDAF seat).
- X4 ``mapInPandas``: per-partition batch scoring with model weights
  broadcast — the canonical Spark batch-inference idiom. Arrow batch ≙
  DataLoader batch (``data_helper.py:118-123``).

The stand-in "model" is a fixed linear scorer (10 classes × 64 dims,
weights ``W[c,i] = ((c*64+i) % 7) - 3``) so scoring is deterministic and
DuckDB-mirrorable. The kernels accumulate over dims in explicit sequential
order — BLAS matmul would reorder float additions and break bit-parity
with the oracle (numerics note: at production scale swap in ``np.dot`` and
drop the exactness constraint)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

N_CLASSES = 10
N_DIMS = 64


def _token_stats_udf():
    """Built lazily: pandas_udf DDL parsing needs an active session."""

    @pandas_udf("n_tokens bigint, n_unique bigint, total_chars bigint")
    def _token_stats(text: pd.Series) -> pd.DataFrame:
        toks = text.str.split(" ").map(lambda ts: [t for t in ts if t])
        return pd.DataFrame(
            {
                "n_tokens": toks.map(len),
                "n_unique": toks.map(lambda ts: len(set(ts))),
                "total_chars": toks.map(lambda ts: sum(len(t) for t in ts)),
            }
        ).astype("int64")

    return _token_stats


@query(
    "x1_pandas_udf_token_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
)
SELECT doc_id,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_unique,
       CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS total_chars
FROM toks
""",
)
def x1_pandas_udf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 vectorized scalar pandas UDF (the tokenizer seat,
    ``data_helper.py:55-57``): Arrow-batched struct-returning UDF, fully
    mirrored by list functions in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _token_stats_udf()("text").alias("s")).select(
        "doc_id", "s.n_tokens", "s.n_unique", "s.total_chars"
    )


@query(
    "x2_apply_in_pandas_fold",
    oracle="""
WITH pooled AS (
  SELECT label, vec_id,
         list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / 64 AS pooled
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n,
       ROUND(list_reduce(list(pooled ORDER BY vec_id), (a, x) -> 0.8 * a + 0.2 * x), 6) AS folded
FROM pooled
GROUP BY label
""",
)
def x2_apply_in_pandas_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 grouped stateful kernel via ``applyInPandas`` — the UDAF seat
    (EMA fold ``main.py:95-103``, here over per-label pooled values in
    vec_id order). Python state is explicit and per-group; the oracle is
    the same fold via ``list_reduce``."""
    emb = load_table(spark, sf_dir, "embeddings")
    pooled = emb.select(
        "label",
        "vec_id",
        (
            F.expr("aggregate(embedding, 0D, (a, x) -> a + double(x))") / N_DIMS
        ).alias("pooled"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        acc = None
        for v in pdf["pooled"]:
            acc = v if acc is None else 0.8 * acc + 0.2 * v
        return pd.DataFrame(
            {"label": [pdf["label"].iloc[0]], "n": [len(pdf)], "folded": [round(acc, 6)]}
        )

    return (
        pooled.groupBy("label")
        .applyInPandas(fold, "label int, n bigint, folded double")
    )


def _make_linear_scorer(n_classes: int, n_dims: int):
    """Self-contained scoring closure for executor-side pickling.

    mapInPandas kernels are shipped to Python workers by cloudpickle;
    a kernel referencing module-level helpers serializes by *reference*
    and breaks when the driver ran from outside the repo (the engine's
    package is not on executors' sys.path). Everything the kernel needs
    is therefore closed over by value here.

    Scores accumulate dim-by-dim in sequential order so float addition
    matches the oracle's left-to-right list_sum (BLAS matmul would
    reorder additions and break bit-parity)."""

    def scores_for(emb_series):
        import numpy as np

        mat = np.stack(emb_series.to_numpy()).astype("float64")  # (n, dims)
        n = mat.shape[0]
        scores = np.zeros((n, n_classes), dtype="float64")
        for c in range(n_classes):
            acc = np.zeros(n, dtype="float64")
            for i in range(n_dims):
                w = float(((c * n_dims + i) % 7) - 3)
                acc = acc + mat[:, i] * w
            scores[:, c] = acc
        return scores

    return scores_for


def _duck_scores(col: str, c: int) -> str:
    return (
        f"list_sum([CAST({col}[i + 1] AS DOUBLE) * (((({c} * 64 + i) % 7)) - 3) "
        f"for i in range(0, 64)])"
    )


@query(
    "x4_map_in_pandas_scoring",
    oracle=f"""
WITH scored AS (
  SELECT vec_id, label,
         [{','.join(_duck_scores('embedding', c) for c in range(N_CLASSES))}] AS scores
  FROM embeddings
)
SELECT vec_id, label,
       CAST(list_position(scores, list_max(scores)) - 1 AS INT) AS pred,
       ROUND(list_max(scores), 6) AS best_score
FROM scored
""",
)
def x4_map_in_pandas_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 batch inference via ``mapInPandas`` — the ``model(batch)`` loop of
    ``inference.py:37-45`` with the weight matrix closed over (broadcast to
    executors by task serialization): per Arrow batch, score 10 classes,
    argmax → prediction."""
    emb = load_table(spark, sf_dir, "embeddings")
    scores_for = _make_linear_scorer(N_CLASSES, N_DIMS)

    def score_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            scores = scores_for(pdf["embedding"])
            pred = scores.argmax(axis=1).astype("int32")
            best = np.round(scores.max(axis=1), 6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "pred": pred,
                    "best_score": best,
                }
            )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("label", T.IntegerType()),
            T.StructField("pred", T.IntegerType()),
            T.StructField("best_score", T.DoubleType()),
        ]
    )
    return emb.mapInPandas(score_batches, schema)


@query(
    "x4b_ensemble_scoring",
    oracle=f"""
WITH m1 AS (
  SELECT vec_id, label,
         [{','.join(_duck_scores('embedding', c) for c in range(N_CLASSES))}] AS s
  FROM embeddings
),
summed AS (
  SELECT vec_id, label,
         [s[c + 1] * 1.0 + s[c + 1] * 0.5 + s[((c + 1) % 10) + 1] * 0.25 for c in range(0, 10)] AS scores
  FROM m1
)
SELECT vec_id,
       CAST(list_position(scores, list_max(scores)) - 1 AS INT) AS pred,
       ROUND(list_max(scores), 6) AS ensemble_score
FROM summed
""",
)
def x4b_ensemble_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+A7 K-model ensemble — ``pred_all += pred`` over checkpoints
    (``inference_kfold.py:83-90``): three deterministic 'checkpoints'
    (identity, 0.5×, 0.25× class-rotated), logits summed per class inside
    the kernel, then argmax."""
    emb = load_table(spark, sf_dir, "embeddings")
    scores_for = _make_linear_scorer(N_CLASSES, N_DIMS)

    def score_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            s = scores_for(pdf["embedding"])
            total = s * 1.0 + s * 0.5 + np.roll(s, -1, axis=1) * 0.25
            pred = total.argmax(axis=1).astype("int32")
            best = np.round(total.max(axis=1), 6)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "pred": pred, "ensemble_score": best}
            )

    schema = "vec_id bigint, pred int, ensemble_score double"
    return emb.mapInPandas(score_batches, schema)


@query(
    "x4c_broadcast_weights_scoring",
    oracle=f"""
WITH scored AS (
  SELECT vec_id, label,
         [{','.join(_duck_scores('embedding', c) for c in range(N_CLASSES))}] AS scores
  FROM embeddings
)
SELECT vec_id, label,
       CAST(list_position(scores, list_max(scores)) - 1 AS INT) AS pred,
       ROUND(list_max(scores), 6) AS best_score
FROM scored
""",
)
def x4c_broadcast_weights_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 with the production weight-distribution pattern: the weight
    matrix travels as a ``SparkContext.broadcast`` variable (one copy per
    executor, not per task) and the kernel closes over only the broadcast
    handle. Same scores/oracle as ``x4_map_in_pandas_scoring`` — this
    variant exists to keep the broadcast idiom exercised end to end."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    w = np.array(
        [[float(((c * N_DIMS + i) % 7) - 3) for i in range(N_DIMS)] for c in range(N_CLASSES)],
        dtype="float64",
    )
    bw = spark.sparkContext.broadcast(w)
    n_classes, n_dims = N_CLASSES, N_DIMS

    def score_batches(batches):
        import numpy as np
        import pandas as pd

        weights = bw.value  # (classes, dims), fetched once per executor
        for pdf in batches:
            mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            scores = np.zeros((len(pdf), n_classes), dtype="float64")
            for c in range(n_classes):
                acc = np.zeros(len(pdf), dtype="float64")
                for i in range(n_dims):
                    acc = acc + mat[:, i] * weights[c, i]
                scores[:, c] = acc
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "pred": scores.argmax(axis=1).astype("int32"),
                    "best_score": np.round(scores.max(axis=1), 6),
                }
            )

    return emb.mapInPandas(
        score_batches, "vec_id bigint, label int, pred int, best_score double"
    )


@query(
    "x6_map_in_arrow",
    oracle="""
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
""",
)
def x6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-family completion: ``mapInArrow`` — the zero-copy Arrow
    RecordBatch iterator API (Spark 4), one level below mapInPandas (no
    pandas materialization at all; the kernel sees Arrow buffers). The
    kernel is a self-contained closure (imports inside — the cloudpickle
    module-reference gotcha, SKILL.md) doing vectorized money→cents
    integerization via pyarrow.compute. Arrow's round is half-to-even
    vs Spark/DuckDB half-away, but 2-dp money ×100 never lands on .5,
    so all three engines agree exactly — asserted by the oracle."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    def to_cents(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            cents = pc.cast(
                pc.round(pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("o_orderkey"), cents], ["o_orderkey", "price_cents"]
            )

    return o.mapInArrow(to_cents, "o_orderkey bigint, price_cents bigint")


ATTRIB_WINDOW_S = 30 * 60  #: click→purchase attribution window (s9e's rule)


@query(
    "x9_cogroup_attribution",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events WHERE event_type = 'purchase'
),
users AS (
  SELECT user_id FROM c UNION SELECT user_id FROM p
),
attributed AS (
  SELECT DISTINCT p.user_id, p.event_id
  FROM p JOIN c ON c.user_id = p.user_id
   AND p.sec >= c.sec AND p.sec <= c.sec + {ATTRIB_WINDOW_S}
)
SELECT u.user_id,
       CAST(COALESCE(cc.n, 0) AS BIGINT) AS n_clicks,
       CAST(COALESCE(pc.n, 0) AS BIGINT) AS n_purchases,
       CAST(COALESCE(ac.n, 0) AS BIGINT) AS n_attributed,
       CAST(cc.first_sec AS BIGINT) AS first_click_sec,
       CAST(pc.first_sec AS BIGINT) AS first_purchase_sec
FROM users u
LEFT JOIN (SELECT user_id, COUNT(*) AS n, MIN(sec) AS first_sec FROM c GROUP BY user_id) cc USING (user_id)
LEFT JOIN (SELECT user_id, COUNT(*) AS n, MIN(sec) AS first_sec FROM p GROUP BY user_id) pc USING (user_id)
LEFT JOIN (SELECT user_id, COUNT(*) AS n FROM attributed GROUP BY user_id) ac USING (user_id)
""",
)
def x9_cogroup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 cogrouped ``applyInPandas`` — the last member of the Python
    boundary family (X1 scalar UDF, X2 grouped UDAF, X3 UDTF, X4
    mapInPandas, X6 mapInArrow): clicks and purchases are COGROUPED by
    user and a single Arrow-batched kernel sees both sides of one key
    at once — the shape for per-entity algorithms that need two aligned
    inputs (sessionized attribution, feature/label alignment, per-user
    diff). The kernel here recomputes s9e's 30-minute click→purchase
    attribution per user plus side counts — deliberately SQL-expressible
    so the cogroup path itself is ORACLE-CHECKED (the declarative twin
    is the oracle; most cogroup kernels in the wild have no such check).

    Scale shape: cogroup shuffles each side ONCE on user_id (same
    exchange a join would need); kernel state is one user's rows, never
    the corpus. Kernel is a nested closure over plain ints (pickle by
    value — the repo-wide driver-import rule). Second-granularity ints
    in, ints out: nothing float crosses the boundary."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts")).cast("bigint").alias("sec")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", sec)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", sec
    )
    window_s = ATTRIB_WINDOW_S

    def attribute(key, cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        (uid,) = key
        n_attr = 0
        if len(cdf) and len(pdf):
            csecs = cdf["sec"].to_numpy()
            for ps in pdf["sec"].to_numpy():
                if ((ps >= csecs) & (ps <= csecs + window_s)).any():
                    n_attr += 1
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_clicks": [len(cdf)],
                "n_purchases": [len(pdf)],
                "n_attributed": [n_attr],
                "first_click_sec": [cdf["sec"].min() if len(cdf) else None],
                "first_purchase_sec": [pdf["sec"].min() if len(pdf) else None],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            attribute,
            schema=(
                "user_id bigint, n_clicks bigint, n_purchases bigint, "
                "n_attributed bigint, first_click_sec bigint, "
                "first_purchase_sec bigint"
            ),
        )
    )
