"""Data-quality constraint suite — the declarative validation gate a
production pipeline runs before promoting a snapshot (the Deequ/
dbt-test shape, expressed as plain aggregates so Catalyst fuses the
whole rule set into one scan).

The reference validates inputs ad hoc (assert-style checks scattered in
``data_helper.py``); a 100 TB pipeline wants every rule computed in the
SAME pass: each row-level rule is a conditional SUM over one scan of the
fact table, unpivoted to one row per rule; only referential integrity
needs a second input (broadcast anti-join on the dimension key). Adding
a rule adds a column to the scan projection, not a pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table, rebalance_small_scan
from wx20222_bigdata_spark.registry import query

#: Closed domain for o_orderstatus (FIXTURES.md §B).
ORDER_STATUS_DOMAIN = ("F", "O", "P")


@query(
    "dq1_constraint_report",
    oracle=f"""
WITH scan AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
         SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price,
         SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS bad_status,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                    OR o_orderdate >= TIMESTAMP '2031-01-01 00:00:00'
                  THEN 1 ELSE 0 END) AS stale_date
  FROM orders
),
fk AS (
  SELECT COUNT(*) AS orphans
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_custkey IS NULL
),
rules AS (
  SELECT 'o_orderkey_unique' AS rule, CAST(dup_keys AS BIGINT) AS n_violations FROM scan
  UNION ALL SELECT 'o_custkey_not_null', CAST(null_cust AS BIGINT) FROM scan
  UNION ALL SELECT 'o_totalprice_nonnegative', CAST(neg_price AS BIGINT) FROM scan
  UNION ALL SELECT 'o_orderstatus_in_domain', CAST(bad_status AS BIGINT) FROM scan
  UNION ALL SELECT 'o_orderdate_in_bounds', CAST(stale_date AS BIGINT) FROM scan
  UNION ALL SELECT 'o_custkey_fk_customer', CAST(orphans AS BIGINT) FROM fk
)
SELECT rule, n_violations, n_violations = 0 AS passed
FROM rules
""",
)
def dq1_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass constraint report over ``orders``: uniqueness, null,
    range, domain, and date-bound rules fused into a single scan's
    conditional aggregates (one row per rule via ``stack``), plus the
    customer FK checked by an AQE-governed left-anti join. The report shape
    (rule, n_violations, passed) is the contract a promotion gate
    consumes; a failed row carries its violation count for triage.

    The single-partition exchange under the one-row wide aggregate is
    the documented bounded pattern (one partial row per scan task)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    zero = F.lit(0)
    scan = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(zero)).alias(
            "null_cust"
        ),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(zero)).alias(
            "neg_price"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*ORDER_STATUS_DOMAIN), 1).otherwise(
                zero
            )
        ).alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp_ntz"))
                | (F.col("o_orderdate") >= F.lit("2031-01-01").cast("timestamp_ntz")),
                1,
            ).otherwise(zero)
        ).alias("stale_date"),
    )
    # the customer keyset is SF-scaled (grows with the corpus), so the
    # FK anti join is AQE-governed rather than hint-forced (q9 rule,
    # NOTES_r7 item 6): a forced broadcast of every customer key is an
    # executor OOM at 100 TB.
    orphans = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("orphans"))
    )
    row_rules = scan.select(
        F.expr(
            "stack(5,"
            " 'o_orderkey_unique', dup_keys,"
            " 'o_custkey_not_null', null_cust,"
            " 'o_totalprice_nonnegative', neg_price,"
            " 'o_orderstatus_in_domain', bad_status,"
            " 'o_orderdate_in_bounds', stale_date) AS (rule, n_violations)"
        )
    )
    fk_rule = orphans.select(
        F.lit("o_custkey_fk_customer").alias("rule"),
        F.col("orphans").alias("n_violations"),
    )
    return row_rules.unionByName(fk_rule).select(
        "rule",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


N_BUCKETS = 4096   #: feature-hashing space for the linear classifier
W_RANGE = 2001     #: integer weight domain [-1000, 1000] (milli-units)


@query(
    "e26_quality_classifier",
    oracle=f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(w) AS tok FROM words
  UNION ALL
  SELECT doc_id, unnest([w[i] || '_' || w[i + 1] for i in range(1, len(w))]) AS tok
  FROM words
),
buckets AS (
  SELECT DISTINCT doc_id,
         (CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT)
          % {N_BUCKETS}) AS bucket
  FROM toks
),
scored AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_feat,
         CAST(SUM((CAST(concat('0x', substring(md5(concat('w', CAST(bucket AS VARCHAR))), 1, 15)) AS BIGINT)
                   % {W_RANGE}) - {(W_RANGE - 1) // 2}) AS BIGINT) AS score_raw
  FROM buckets GROUP BY doc_id
)
SELECT doc_id, n_feat, score_raw,
       CAST(floor(score_raw * 1000.0 / n_feat) AS BIGINT) AS logit_micro,
       score_raw > 0 AS keep
FROM scored
""",
)
def e26_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E26 hashed linear quality classifier — fastText-style model
    inference as a PURE declarative plan: unigram+bigram features, the
    hashing trick into a fixed bucket space (Weinberger et al. 2009),
    and a linear scoring layer whose weights are DERIVED by hashing the
    bucket id — so scoring needs no broadcast weight table at all, and
    the whole "model" runs inside whole-stage codegen with zero Python.
    This is the quality-filter shape CCNet/Gopher pipelines run over
    every document of a 100 TB crawl (the learned-weights variant is
    x4c, broadcast weights + pandas UDF; THIS tier is the declarative
    plumbing proof with a deterministic stand-in model).

    Exactness physics: weights live in integer milli-units
    ([-1000, 1000] from a 60-bit md5 prefix mod {W_RANGE}), so the
    per-document score is an order-free BIGINT sum — bit-exact across
    engines; the mean logit is emitted in floor()'d integer micro-units
    (round-6 sits on the decimal .5 boundary for denominators like
    32000 — landmine 19). The keep decision compares the INTEGER sum to
    zero (never compare floats to a threshold across engines).

    Plan: split → explode → distinct (doc_id, bucket) groupBy → one
    aggregation; the feature space is bounded ({N_BUCKETS}), so the
    shuffle carries at most n_docs × min(n_tokens, {N_BUCKETS}) rows.
    Reference parity: the reference scores every document with a torch
    classifier head (src/model.py:74-90, src/inference.py:30-45); this
    is the same per-document scoring dataflow with hashing-trick
    features (src/data_helper.py:55-57 tokenize → ids analog).
    """
    from wx20222_bigdata_spark.functions.hashing import spark_md5_hash

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> length(x) > 0)").alias("w"),
    )
    unis = words.select("doc_id", F.explode("w").alias("tok"))
    bis = words.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(element_at(w, i + 1), '_', element_at(w, i + 2)))"
            )
        ).alias("tok"),
    )
    toks = unis.unionAll(bis)
    buckets = toks.select(
        "doc_id",
        F.expr(spark_md5_hash("tok", mod=N_BUCKETS)).alias("bucket"),
    ).distinct()
    half = (W_RANGE - 1) // 2
    w_int = (
        F.expr(
            spark_md5_hash("concat('w', CAST(bucket AS STRING))", mod=W_RANGE)
        )
        - F.lit(half)
    )
    scored = buckets.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_feat"),
        F.sum(w_int).cast("bigint").alias("score_raw"),
    )
    return scored.select(
        "doc_id",
        "n_feat",
        "score_raw",
        # micro-logit in INTEGER units: score_raw*1000.0 is exact in a
        # double, the division is the identical IEEE op on both engines,
        # and floor() of equal doubles is equal — unlike round-6, which
        # hits the decimal .5 boundary (sf1 exposed 5 such docs:
        # 2002/32000 = 0.0625625 rounds differently per engine).
        F.floor(F.col("score_raw") * 1000.0 / F.col("n_feat"))
        .cast("bigint")
        .alias("logit_micro"),
        (F.col("score_raw") > 0).alias("keep"),
    )


@query(
    "dq2_order_reconciliation",
    oracle="""
WITH item_rev AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS items_rev
  FROM lineitem GROUP BY l_orderkey
),
recon AS (
  SELECT o.o_orderstatus,
         CASE WHEN i.l_orderkey IS NULL THEN 'no_items'
              WHEN abs(CAST(o.o_totalprice AS DECIMAL(18,2)) - i.items_rev) <= 0.01
                   THEN 'reconciled'
              ELSE 'price_mismatch' END AS status,
         CASE WHEN i.l_orderkey IS NULL THEN CAST(0 AS DECIMAL(38,4))
              ELSE abs(CAST(o.o_totalprice AS DECIMAL(18,2)) - i.items_rev)
         END AS abs_delta
  FROM orders o LEFT JOIN item_rev i ON o.o_orderkey = i.l_orderkey
)
SELECT o_orderstatus, status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(abs_delta) AS DOUBLE) AS total_abs_delta
FROM recon
GROUP BY o_orderstatus, status
""",
)
def dq2_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ2 cross-table reconciliation — the two-table complement of
    dq1's single-scan rule set: every order is classified as
    reconciled / price_mismatch / no_items against the revenue
    recomputed from its line items, with the absolute money delta
    aggregated per (order status, reconcile status). This is the
    financial-close audit every warehouse runs nightly; on this
    synthetic data o_totalprice is generated independently of lineitem,
    so the report (truthfully) shows zero reconciled orders and 257
    no-items orders at sf0.01 — the op's value is the LEDGER, not a
    green checkmark. All money math in DECIMAL (exact, order-free),
    cast to double only at the output boundary.

    Scale shape: one map-side-combinable groupBy on lineitem collapses
    the fact table to |orders| rows before the join; the join key is
    the orders primary key (co-partitionable / bucketable), and the
    final aggregate is over a handful of (status, status) cells."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    item_rev = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("items_rev")
    )
    joined = o.join(item_rev, o.o_orderkey == item_rev.l_orderkey, "left")
    delta = F.abs(
        F.col("o_totalprice").cast("decimal(18,2)") - F.col("items_rev")
    )
    recon = joined.select(
        "o_orderstatus",
        F.when(F.col("l_orderkey").isNull(), "no_items")
        .when(delta <= 0.01, "reconciled")
        .otherwise("price_mismatch")
        .alias("status"),
        F.when(F.col("l_orderkey").isNull(), F.lit(0).cast("decimal(38,4)"))
        .otherwise(delta)
        .alias("abs_delta"),
    )
    return recon.groupBy("o_orderstatus", "status").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("abs_delta").cast("double").alias("total_abs_delta"),
    )


@query(
    "dq3_distribution_drift",
    oracle="""
WITH toks AS (
  SELECT doc_id % 2 AS side,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> length(x) > 0)) AS w
  FROM documents
),
counts AS (
  SELECT w,
         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM toks GROUP BY w
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM counts
),
terms AS (
  SELECT w,
         (ca + 1.0) / (na + v) AS p,
         (cb + 1.0) / (nb + v) AS q,
         na, nb, v
  FROM counts CROSS JOIN tot
)
SELECT MAX(na) AS n_tokens_a,
       MAX(nb) AS n_tokens_b,
       MAX(v) AS vocab_size,
       ROUND(list_sum(list(p * ln(p / q) ORDER BY w)), 6) AS kl_ab,
       ROUND(list_sum(list(q * ln(q / p) ORDER BY w)), 6) AS kl_ba
FROM terms
""",
)
def dq3_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ3 corpus distribution drift — smoothed KL divergence between
    the unigram distributions of two corpus slices (even vs odd doc
    ids, standing in for yesterday's vs today's snapshot): the
    data-quality gate that catches a scraper change, an encoding bug,
    or a source mix shift BEFORE a model trains on it (the dq-family's
    distributional member: dq1 checks rows, dq2 checks ledgers, dq3
    checks distributions). Add-1 smoothing over the union vocabulary
    keeps every term finite.

    Float discipline: both KL sums fold in sorted-word order — Spark's
    sorted-collect_list sequential aggregate == DuckDB's
    list_sum(list(... ORDER BY w)) bit-for-bit (landmine 16); the
    division and ln() are per-term identical IEEE ops. Scale: the fold
    runs over the |vocab| count table, not the corpus; the corpus
    contributes one map-side-combinable conditional-count groupBy. The
    one-row output is the documented bounded SinglePartition shape."""
    toks = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> length(x) > 0)")
        ).alias("w"),
    )
    counts = toks.groupBy("w").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("bigint").alias("ca"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("bigint").alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count("*").cast("bigint").alias("v"),
    )
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "w",
        ((F.col("ca") + 1.0) / (F.col("na") + F.col("v"))).alias("p"),
        ((F.col("cb") + 1.0) / (F.col("nb") + F.col("v"))).alias("q"),
        "na",
        "nb",
        "v",
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(w, {t}))),"
        " s -> s.{t}), 0D, (a, x) -> a + x)"
    )
    return terms.select(
        "w",
        "na",
        "nb",
        "v",
        (F.col("p") * F.log(F.col("p") / F.col("q"))).alias("t_ab"),
        (F.col("q") * F.log(F.col("q") / F.col("p"))).alias("t_ba"),
    ).agg(
        F.max("na").alias("n_tokens_a"),
        F.max("nb").alias("n_tokens_b"),
        F.max("v").alias("vocab_size"),
        F.round(F.expr(fold.format(t="t_ab")), 6).alias("kl_ab"),
        F.round(F.expr(fold.format(t="t_ba")), 6).alias("kl_ba"),
    )


@query(
    "e31_dsir_importance",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '),
                                          x -> length(x) > 0)) AS tok
  FROM documents
),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
tgt AS (
  SELECT tok, COUNT(*) AS cnt_t FROM toks WHERE lang = 'en' GROUP BY tok
),
raw AS (SELECT tok, COUNT(*) AS cnt_r FROM toks GROUP BY tok),
tots AS (
  SELECT (SELECT COUNT(*) FROM toks WHERE lang = 'en') AS tt,
         (SELECT COUNT(*) FROM toks) AS tr,
         (SELECT v FROM vocab) AS v
),
w AS (
  SELECT raw.tok,
         ln((COALESCE(tgt.cnt_t, 0) + 1.0) / (tots.tt + tots.v))
           - ln((raw.cnt_r + 1.0) / (tots.tr + tots.v)) AS w
  FROM raw LEFT JOIN tgt USING (tok) CROSS JOIN tots
),
agg AS (
  SELECT t.doc_id, ANY_VALUE(t.lang) AS lang, COUNT(*) AS n_tok,
         list_sum(list(w.w ORDER BY t.tok)) AS sw
  FROM toks t JOIN w USING (tok)
  GROUP BY t.doc_id
)
SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
       ROUND(sw / n_tok, 6) AS dsir_score,
       CAST(CASE WHEN ROUND(sw / n_tok, 6) > 0 THEN 1 ELSE 0 END AS INT)
         AS keep
FROM agg
""",
)
def e31_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E31 DSIR-style importance weighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by the mean per-token log-likelihood ratio between a
    TARGET distribution (here the lang='en' slice — in production, a
    trusted high-quality corpus) and the RAW corpus, both as add-1-
    smoothed unigram models over a shared vocabulary. keep=1 marks
    documents that look more target-like than raw-like — the importance-
    resampling admission gate of a pretraining curation funnel. DSIR
    proper hashes n-grams into buckets first; the hashing variant is the
    composition of this op with e22's feature hashing and changes only
    the token→feature map, not the plan.

    Scale shape: the token stream is consumed exactly TWICE — once by a
    single fused groupBy(tok) that yields both the raw and the target
    counts (a conditional sum replaces a second filtered aggregate), and
    once reduced to DISTINCT (doc, token) pairs with a repeat count k —
    the fold join and per-doc sort then carry |distinct pairs| rows,
    not |token instances| (measured 5.24 → 1.65 s at sf1, noop sink).
    Totals (target tokens, raw tokens, vocab size) are a one-row
    aggregate over the |vocab|-row count table — NOT over the token
    stream — since tt = Σ cnt_t, tr = Σ cnt_r and v = |rows| exactly
    (integers, so the derivation is bit-exact). The weight table is
    |vocab| rows broadcast back onto the pairs; the one-row totals use
    the documented benign crossJoin pattern (cf. e19).

    Bit-exactness of the compressed fold (landmine 16): the oracle folds
    w in sorted TOKEN order, where the k copies of an equal token are
    ADJACENT — so adding w k times sequentially inside each sorted
    (tok, w, k) struct (`aggregate(sequence(1, k), …)`) reproduces the
    instance-level fold addition-for-addition. A `k * w` multiply would
    NOT (one rounding vs k-1 roundings); repeated addition is the only
    compression that stays bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("tok"),
    )
    pairs = toks.groupBy("doc_id", "tok").agg(
        F.first("lang").alias("lang"), F.count("*").alias("k")
    )
    counts = toks.groupBy("tok").agg(
        F.count("*").alias("cnt_r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("cnt_t"),
    )
    tots = counts.agg(
        F.sum("cnt_t").alias("tt"),
        F.sum("cnt_r").alias("tr"),
        F.count("*").alias("v"),
    )
    w = (
        counts.crossJoin(F.broadcast(tots))
        .select(
            "tok",
            (
                F.log(
                    (F.coalesce("cnt_t", F.lit(0)) + F.lit(1.0))
                    / (F.col("tt") + F.col("v"))
                )
                - F.log((F.col("cnt_r") + F.lit(1.0)) / (F.col("tr") + F.col("v")))
            ).alias("w"),
        )
    )
    agg = (
        pairs.join(w, "tok")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.sum("k").alias("n_tok"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(tok, w, k))), 0D,"
                " (a, s) -> aggregate(sequence(1, int(s.k)), a, (b, i) -> b + s.w))"
            ).alias("sw"),
        )
    )
    score = F.round(F.col("sw") / F.col("n_tok"), 6)
    return agg.select(
        "doc_id",
        "lang",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        score.alias("dsir_score"),
        F.when(score > 0, 1).otherwise(0).cast("int").alias("keep"),
    )
