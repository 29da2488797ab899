"""Training-sequence packing (LLM-pipeline north star; companion to F8/F9).

Pretraining dataloaders pack documents into fixed token-budget sequences so
no batch slot is wasted (the reference's budget cascade F8 trims one sample
to its budget; packing is the corpus-level dual: fill each budget with many
samples). The scalable contract:

- packing is **shard-local** (partition by ``source``): a global greedy
  pack would serialize the corpus through one task — the same landmine the
  zip index avoids — and production packers are shard-local anyway (bins
  never cross file shards);
- within a shard, deterministic greedy *contiguous* packing in ``doc_id``
  order: a document's bin is ``prev_cum_tokens // budget`` (documents that
  straddle a boundary belong to the bin where they start — bounded
  overflow, zero fragmentation bookkeeping);
- all-integer arithmetic → bit-exact cross-engine.

At 100 TB: one partitioned window over (shard, doc order), no global
state; bin ids are stable under any executor layout because the ordering
key is data, not physical position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

PACK_BUDGET = 512  #: tokens per packed sequence (reference budget: 256)


def pack_documents(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """(doc_id, source, text) → (source, doc_id, n_tok, bin_id)."""
    n_tok = F.size(F.expr("filter(split(text, ' '), x -> length(x) > 0)"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        docs.select("source", "doc_id", n_tok.alias("n_tok"))
        .withColumn("_prev_cum", prev_cum)
        .withColumn("bin_id", F.expr(f"_prev_cum div {budget}").cast("bigint"))
        .drop("_prev_cum")
    )


@query(
    "e6_sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_tok
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
  FROM t
)
SELECT source,
       CAST(prev_cum // {PACK_BUDGET} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM c
GROUP BY source, CAST(prev_cum // {PACK_BUDGET} AS BIGINT)
""",
)
def e6_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous shard-local packing: per (source, bin) occupancy.
    ``bin_tokens`` may exceed the budget by at most one straddling doc —
    the documented overflow mode of contiguous packing."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.expr("filter(split(text, ' '), x -> length(x) > 0)"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = docs.select("source", "doc_id", n_tok.alias("n_tok"))
    binned = (
        sized.withColumn("_prev_cum", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("bin_id", F.expr(f"_prev_cum div {PACK_BUDGET}").cast("bigint"))
        .drop("_prev_cum")
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


CHUNK_SIZE = 128  #: tokens per chunk
CHUNK_STRIDE = 96  #: chunk start step (CHUNK_SIZE - CHUNK_STRIDE tokens overlap)


@query(
    "e8_document_chunking",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks, len(toks) AS n_tok FROM t WHERE len(toks) >= 1
),
chunks AS (
  SELECT doc_id, n_tok, toks, unnest(range(0, n_tok, {CHUNK_STRIDE})) AS start
  FROM sized
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(least(start + {CHUNK_SIZE}, n_tok) - start AS BIGINT) AS n_chunk_toks,
       array_to_string(list_slice(toks, start + 1, least(start + {CHUNK_SIZE}, n_tok)), ' ') AS chunk_text
FROM chunks
""",
)
def e8_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 overlapping document chunking — the dual of packing (e6): long
    documents split into CHUNK_SIZE-token windows every CHUNK_STRIDE
    tokens (32-token overlap), the standard context-window prep for
    training and embedding pipelines. The reference handles over-length
    text by truncating to the token budget (``data_helper.py:55-57``
    ``truncation=True``); chunking is the no-loss alternative a corpus
    pipeline uses upstream of that budget.

    Pure narrow plan: tokenize once, ``posexplode`` the chunk starts,
    slice per chunk — no shuffle at all; chunking 100 TB is
    embarrassingly parallel and this plan keeps it that way. The start
    sequence is guarded to n_tok >= 1 (``sequence(0, -1)`` DESCENDS —
    the repo-wide landmine, NOTES_r1 §8)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> length(x) > 0)").alias("toks"),
    ).withColumn("n_tok", F.size("toks")).filter(F.col("n_tok") >= 1)
    chunks = toks.select(
        "doc_id",
        "n_tok",
        "toks",
        F.explode(
            F.expr(f"sequence(0, n_tok - 1, {CHUNK_STRIDE})")
        ).alias("start"),
    )
    return chunks.select(
        "doc_id",
        F.expr(f"start div {CHUNK_STRIDE}").cast("bigint").alias("chunk_id"),
        (F.least(F.col("start") + CHUNK_SIZE, F.col("n_tok")) - F.col("start"))
        .cast("bigint")
        .alias("n_chunk_toks"),
        F.array_join(
            F.expr(f"slice(toks, start + 1, least({CHUNK_SIZE}, n_tok - start))"),
            " ",
        ).alias("chunk_text"),
    )


CDC_DIVISOR = 16  #: boundary probability 1/16 → expected 16-token chunks


def _cdc_oracle() -> str:
    from wx20222_bigdata_spark.functions.hashing import duck_md5_hash

    bnd = duck_md5_hash("toks[i + 1]", CDC_DIVISOR)
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks, len(toks) AS n_tok FROM t WHERE len(toks) >= 1
),
st AS (
  SELECT doc_id, toks, n_tok,
         list_filter(
           list_concat([1], [i + 2 for i in range(0, n_tok) if {bnd} = 0]),
           s -> s <= n_tok) AS starts
  FROM sized
),
bd AS (
  SELECT doc_id, toks,
         unnest([{{'cid': j - 1, 's': starts[j],
                   'e': coalesce(starts[j + 1] - 1, n_tok)}}
                 for j in range(1, len(starts) + 1)]) AS b
  FROM st
)
SELECT doc_id,
       CAST(b.cid AS BIGINT) AS chunk_id,
       CAST(b.e - b.s + 1 AS BIGINT) AS n_chunk_toks,
       md5(array_to_string(list_slice(toks, b.s, b.e), ' ')) AS chunk_hash
FROM bd
"""


def cdc_chunk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e18 chunk frame (doc_id, chunk_id, n_chunk_toks, chunk_hash) —
    shared by the declared e18 query and the e20 chunk-level dedup."""
    return e18_cdc_chunking(spark, sf_dir)


@query("e18_cdc_chunking", oracle=_cdc_oracle())
def e18_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18 content-defined chunking — the shift-robust dual of e8's fixed
    windows: a chunk boundary falls AFTER any token whose 60-bit md5 prefix
    is ≡ 0 (mod CDC_DIVISOR), the token-level Rabin fingerprint rule used
    by dedup stores (LBFS/Venti lineage). Because boundaries depend only on
    content, inserting a sentence early in a document shifts every e8
    window but leaves all later CDC chunks (and their hashes) intact —
    which is what makes chunk-hash dedup across document revisions work.

    Plan: pure narrow HOF pipeline (tokenize → boundary positions →
    chunk-bound structs → posexplode → slice), zero shuffles; the md5
    boundary test is JVM whole-stage-codegen via the repo's cross-engine
    md5-prefix primitive (functions/hashing.py). Chunks are emitted as
    (count, md5-of-text) so output stays compact while content is pinned.
    """
    from wx20222_bigdata_spark.functions.hashing import spark_md5_hash

    bnd = spark_md5_hash("t", CDC_DIVISOR)
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> length(x) > 0)").alias("toks"),
        )
        .withColumn("n_tok", F.size("toks"))
        .filter(F.col("n_tok") >= 1)
    )
    starts = toks.withColumn(
        "starts",
        F.expr(
            f"filter(concat(array(1), filter(transform(toks,"
            f" (t, i) -> IF({bnd} = 0, i + 2, NULL)), x -> x IS NOT NULL)),"
            f" s -> s <= n_tok)"
        ),
    )
    bounds = starts.withColumn(
        "b",
        F.explode(
            F.expr(
                "transform(sequence(1, size(starts)), j -> named_struct("
                "'cid', j - 1, 's', element_at(starts, j),"
                "'e', coalesce(try_element_at(starts, j + 1) - 1, n_tok)))"
            )
        ),
    )
    return bounds.select(
        "doc_id",
        F.col("b.cid").cast("bigint").alias("chunk_id"),
        (F.col("b.e") - F.col("b.s") + 1).cast("bigint").alias("n_chunk_toks"),
        F.md5(F.expr("array_join(slice(toks, b.s, b.e - b.s + 1), ' ')")).alias(
            "chunk_hash"
        ),
    )


@query(
    "e20_chunk_dedup",
    oracle=f"""
WITH chunks AS ({_cdc_oracle()})
SELECT chunk_hash,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST((COUNT(*) - 1) * MIN(n_chunk_toks) AS BIGINT) AS dup_tokens
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) > 1
""",
)
def e20_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20 cross-document substring dedup — the practical approximation
    of suffix-array substring dedup (Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better') that actually runs at
    100 TB: because e18's chunk boundaries are content-defined, any
    shared span long enough to contain a boundary window yields
    IDENTICAL chunk hashes in every document it appears in, no matter
    where it sits. Grouping chunk hashes across the corpus therefore
    finds repeated spans (boilerplate, licenses, templates) that
    document-level dedup (e1) and near-dup (e2) both miss, and
    ``dup_tokens`` prices the redundancy in training tokens. Identical
    hash ⇒ identical text ⇒ identical token count, so MIN(n_chunk_toks)
    is exact, not a heuristic.

    Plan: the narrow e18 chunker feeds ONE map-side-combinable groupBy
    on chunk_hash — the only shuffle carries (hash, count) pairs, ~the
    distinct-chunk cardinality. Min-doc_id keeper follows the repo-wide
    dedup survivor rule."""
    chunks = cdc_chunk_frame(spark, sf_dir)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            ((F.count("*") - 1) * F.min("n_chunk_toks"))
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .filter(F.col("n_docs") > 1)
    )


#: first-fit probe in the e23 oracle: 1-based index of the first open bin
#: with room (DuckDB list_position returns 0, not NULL, for "no match").
_FFD_POS = "list_position(list_transform(f.bins, b -> b >= o.n_tok), true)"

_E23_ORACLE = f"""
WITH RECURSIVE sized AS (
  SELECT source, doc_id,
         len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_tok
  FROM documents
),
ord AS (
  SELECT source, doc_id, n_tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id) AS i
  FROM sized
),
ffd AS (
  SELECT source, i, doc_id, n_tok,
         [greatest({PACK_BUDGET} - n_tok, 0)] AS bins,
         0 AS bin_id
  FROM ord WHERE i = 1
  UNION ALL
  SELECT o.source, o.i, o.doc_id, o.n_tok,
         CASE WHEN {_FFD_POS} = 0
              THEN list_append(f.bins, greatest({PACK_BUDGET} - o.n_tok, 0))
              ELSE list_transform(f.bins,
                     (b, k) -> CASE WHEN k = {_FFD_POS} THEN b - o.n_tok ELSE b END)
         END,
         CASE WHEN {_FFD_POS} = 0 THEN len(f.bins) ELSE {_FFD_POS} - 1 END
  FROM ffd f JOIN ord o ON o.source = f.source AND o.i = f.i + 1
)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tok AS BIGINT) AS n_tok, CAST(bin_id AS BIGINT) AS bin_id
FROM ffd
"""


@query("e23_ffd_packing", oracle=_E23_ORACLE)
def e23_ffd_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23 first-fit-decreasing packing — the bin-QUALITY tier above
    e6's contiguous greedy: within each shard (source), documents are
    placed largest-first into the first bin with room, the classic FFD
    heuristic (≤ 11/9·OPT + 1 bins). Unlike e6, a straddling document
    never overflows its bin — oversized docs (> budget) get singleton
    bins and are the chunker's (e8/e18) problem.

    FFD is inherently sequential WITHIN a shard, so this is the
    documented X2 shape: ``applyInPandas`` over the source partition —
    state is shard-local (the open-bin table), cross-shard parallelism
    is preserved, and the kernel is a nested closure (pickle-by-value;
    executors never need this repo). Oracle-exact since r6 (VERDICT r5
    item 6): the fold is deterministic (largest-first, doc_id tiebreak),
    so the oracle replays it as a recursive CTE advancing one document
    per source per step with the open-bin table as a list-typed state
    column — the same DuckDB recursion family as f7c/i1. The packing
    LAWS (capacity, lower bound vs e6, determinism) stay pinned in
    tests/test_ffd_packing.py."""
    import pandas as pd

    budget = PACK_BUDGET

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        for t in pdf["n_tok"]:
            t = int(t)
            for b, room in enumerate(bins):
                if t <= room:
                    bins[b] = room - t
                    assigned.append(b)
                    break
            else:
                bins.append(max(budget - t, 0))
                assigned.append(len(bins) - 1)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        return pdf[["source", "doc_id", "n_tok", "bin_id"]]

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), x -> length(x) > 0)")).alias(
            "n_tok"
        ),
    )
    return sized.groupBy("source").applyInPandas(
        ffd, schema="source string, doc_id bigint, n_tok int, bin_id bigint"
    ).withColumn("n_tok", F.col("n_tok").cast("bigint"))


BUCKET_STEP = 32  #: length buckets are multiples of 32 tokens


@query(
    "e24_length_bucketing",
    oracle=f"""
WITH sized AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_tok
  FROM documents
),
b AS (
  SELECT doc_id, n_tok,
         CAST(greatest(ceil(CAST(n_tok AS DOUBLE) / {BUCKET_STEP}), 1) * {BUCKET_STEP} AS BIGINT) AS bucket
  FROM sized
),
g AS (SELECT MAX(bucket) AS max_bucket FROM b)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
       CAST(bucket * COUNT(*) - SUM(n_tok) AS BIGINT) AS bucket_pad_waste,
       CAST(max_bucket * COUNT(*) - SUM(n_tok) AS BIGINT) AS naive_pad_waste
FROM b CROSS JOIN g
GROUP BY bucket, max_bucket
""",
)
def e24_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24 length-bucketed batching — the inference-side dual of training
    packing (e6/e23): documents grouped into pad-to-multiple-of-32
    buckets so a batch only pads to ITS bucket, not the corpus max. The
    reference pads every sample to the fixed budget
    (``data_helper.py:55-57`` ``padding='max_length'`` — exactly the
    ``naive_pad_waste`` column); the per-bucket column prices what
    dynamic batching saves, which is the number a serving pipeline
    tunes BUCKET_STEP against.

    Plan: pure projection bucketing (integer ceil — no float boundary),
    one map-side-combinable groupBy carrying |buckets| rows, one-row
    global-max broadcast (documented benign pattern). All-integer."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), x -> length(x) > 0)")).alias(
            "n_tok"
        ),
    )
    b = sized.select(
        "doc_id",
        "n_tok",
        (
            F.greatest(
                F.ceil(F.col("n_tok").cast("double") / BUCKET_STEP), F.lit(1)
            )
            * BUCKET_STEP
        )
        .cast("bigint")
        .alias("bucket"),
    )
    g = b.agg(F.max("bucket").alias("max_bucket"))
    return (
        b.crossJoin(F.broadcast(g))
        .groupBy("bucket", "max_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("real_tokens"),
            (F.col("bucket") * F.count("*") - F.sum("n_tok"))
            .cast("bigint")
            .alias("bucket_pad_waste"),
            (F.col("max_bucket") * F.count("*") - F.sum("n_tok"))
            .cast("bigint")
            .alias("naive_pad_waste"),
        )
        .drop("max_bucket")
    )
