"""Iterative algorithms — the driver-loop-over-cached-DataFrames pattern
(SURVEY.md §5c 'genuinely non-SQL-expressible ops: iterative algorithms').

Spark has no fixpoint operator: iteration is a driver loop where each
round builds a new DataFrame from the previous one. The two disciplines
that make this correct and fast at scale:

- ``persist()`` each iterate (otherwise round k recomputes rounds 0..k-1
  — quadratic lineage blowup), unpersist the predecessor;
- ``localCheckpoint``/``checkpoint`` every ~10 rounds to truncate the
  lineage the optimizer must plan over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query


def power_iteration_scores(
    edges: DataFrame, n_iter: int = 5, damping: float = 0.85
) -> DataFrame:
    """PageRank-style power iteration over (src, dst) edges.

    rank_{k+1}(v) = (1-d) + d * Σ_{u→v} rank_k(u) / outdeg(u).

    Each round: one join (ranks ⋈ edges on src — broadcast when ranks are
    small, shuffle otherwise) + one groupBy(dst) sum. Deterministic given
    deterministic inputs; results converge independent of partitioning."""
    # loop invariants persisted ONCE: every round's action re-executes the
    # full lineage otherwise (edge scan + distinct shuffle + outdeg agg
    # per iteration).
    edges = edges.persist()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    prev = None
    for _ in range(n_iter):
        contribs = (
            ranks.join(edges, ranks.node == edges.src)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            nodes.join(
                contribs.groupBy("node").agg(F.sum("c").alias("in_sum")),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
            .persist()
        )
        ranks.count()  # materialize this round before dropping the last
        if prev is not None:
            prev.unpersist()
        prev = ranks
    # final iterate is cached; pin it independently of the invariants so
    # their caches can be released (recompute-on-eviction stays correct).
    from wx20222_bigdata_spark.plans.caching import materialize

    ranks = materialize(ranks)
    for df in (edges, out_deg, nodes):
        df.unpersist()
    if prev is not None:
        prev.unpersist()
    return ranks


@query("i1_power_iteration")
def i1_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative rank over a deterministic graph derived from orders
    (customer u → customer u+1 mod N for each shared order bucket…
    simplified: edges from (o_custkey → o_custkey's next bucket)).
    Rows-only: 5 joined+aggregated rounds are expressible in SQL only by
    unrolling; the driver-loop + persist pattern is the point. Stability
    checked by rerun equality (deterministic float path)."""
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % 50).alias("src"),
        ((F.col("o_custkey") + F.col("o_orderkey")) % 50).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    ranks = power_iteration_scores(edges, n_iter=5)
    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    return out
