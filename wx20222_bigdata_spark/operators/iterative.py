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
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    exact_fold: bool = False,
) -> DataFrame:
    """PageRank-style power iteration over (src, dst) edges.

    rank_{k+1}(v) = (1-d) + d * Σ_{u→v} w(u,v) · rank_k(u) / outdeg(u).

    Multi-edges are collapsed to (src, dst, w) ONCE up front — at scale
    this shrinks every round's join input from |edges| to |distinct
    pairs| and is also what makes a deterministic fold possible (one
    contribution per (src, dst)). Each round: one join (ranks ⋈ weighted
    edges — broadcast when ranks are small, shuffle otherwise) + one
    groupBy(dst) reduction. ``exact_fold=True`` replaces the float
    ``sum`` with the a9/e14 ordered-fold discipline (contributions
    reduced in ascending-src order), making every iterate BIT-exact
    across engines/partitionings — the mode the DuckDB oracle checks;
    the default keeps the map-side-combinable plain sum (the 100 TB hot
    path, where collect_list per destination would be the wrong shape)."""
    # loop invariants persisted ONCE: every round's action re-executes the
    # full lineage otherwise (edge scan + distinct shuffle + outdeg agg
    # per iteration).
    ew = edges.groupBy("src", "dst").agg(F.count("*").alias("w")).persist()
    out_deg = ew.groupBy("src").agg(F.sum("w").cast("bigint").alias("outdeg")).persist()
    nodes = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    prev = None
    for _ in range(n_iter):
        contribs = (
            ranks.join(ew, ranks.node == ew.src)
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                "src",
                (F.col("rank") * F.col("w") / F.col("outdeg")).alias("c"),
            )
        )
        if exact_fold:
            in_sum = contribs.groupBy("node").agg(
                F.expr(
                    "aggregate(transform(array_sort(collect_list(struct(src, c))),"
                    " s -> s.c), 0D, (a, x) -> a + x)"
                ).alias("in_sum")
            )
        else:
            in_sum = contribs.groupBy("node").agg(F.sum("c").alias("in_sum"))
        ranks = (
            nodes.join(in_sum, "node", "left")
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
    for df in (ew, out_deg, nodes):
        df.unpersist()
    if prev is not None:
        prev.unpersist()
    return ranks


PR_DAMPING = 0.85
PR_NODES = 50  #: deterministic graph size (i1's edge rule)

_PR_EDGES_DUCK = f"""
edges AS (
  SELECT o_custkey % {PR_NODES} AS src,
         (o_custkey + o_orderkey) % {PR_NODES} AS dst
  FROM orders
  WHERE o_custkey % {PR_NODES} <> (o_custkey + o_orderkey) % {PR_NODES}
),
ew AS (SELECT src, dst, COUNT(*) AS w FROM edges GROUP BY src, dst),
outdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS od FROM ew GROUP BY src),
nodes AS (
  SELECT DISTINCT n FROM (
    SELECT src AS n FROM ew UNION ALL SELECT dst FROM ew
  )
)"""


def _pr_iter_duck(prev: str, out: str) -> str:
    """One DuckDB PageRank round: ordered in-contribution fold per dst."""
    return f"""
{out}_c AS (
  SELECT ew.dst AS n, ew.src, r.rank * ew.w / outdeg.od AS c
  FROM {prev} r JOIN ew ON ew.src = r.n JOIN outdeg ON outdeg.src = ew.src
),
{out} AS (
  SELECT nodes.n,
         {1 - PR_DAMPING} + {PR_DAMPING} * COALESCE(s.insum, 0.0) AS rank
  FROM nodes LEFT JOIN (
    SELECT n, list_sum(list(c ORDER BY src)) AS insum FROM {out}_c GROUP BY n
  ) s ON s.n = nodes.n
)"""


def _i1_oracle(n_iter: int = 5) -> str:
    """i1's oracle: the SAME recurrence with the iteration count unrolled
    into chained CTEs (VERDICT r5 item 6) — each round reuses the i2
    ordered-fold round template, so the driver-loop iterates must match
    bit-for-bit at every round, not just in the aggregate."""
    rounds = ",".join(
        _pr_iter_duck(f"r{k}", f"r{k + 1}")[1:] for k in range(n_iter)
    )
    return f"""
WITH {_PR_EDGES_DUCK},
r0 AS (SELECT n, 1.0 AS rank FROM nodes),
{rounds}
SELECT n AS node, ROUND(rank, 6) AS rank FROM r{n_iter}
"""


@query("i1_power_iteration", oracle=_i1_oracle())
def i1_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative rank over a deterministic graph derived from orders —
    the driver-loop + persist/materialize pattern (no fixpoint operator
    in Spark). Oracle-exact since r6: the loop runs in ``exact_fold``
    mode (ordered contribution fold, the a9 discipline) and the oracle
    unrolls the same 5 rounds as chained CTEs — float parity holds
    because both engines reduce each destination's contributions in the
    same total order."""
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % PR_NODES).alias("src"),
        ((F.col("o_custkey") + F.col("o_orderkey")) % PR_NODES).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    ranks = power_iteration_scores(edges, n_iter=5, exact_fold=True)
    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    return out


@query(
    "i2_pagerank_2iter",
    oracle=f"""
WITH {_PR_EDGES_DUCK},
r0 AS (SELECT n, 1.0 AS rank FROM nodes),
{_pr_iter_duck("r0", "r1")[1:]},
{_pr_iter_duck("r1", "r2")[1:]}
SELECT r2.n AS node, ROUND(r2.rank, 6) AS rank,
       CAST(COALESCE(ind.ind, 0) AS BIGINT) AS in_degree
FROM r2 LEFT JOIN (SELECT dst, SUM(w) AS ind FROM ew GROUP BY dst) ind
  ON ind.dst = r2.n
""",
)
def i2_pagerank_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two PageRank rounds UNROLLED into one declarative DAG with
    bit-exact oracle parity — the checked twin of i1's driver-loop form
    (same graph, same recurrence): multi-edges collapse to (src, dst,
    weight) first so each destination folds ONE contribution per source
    in ascending src order (the e14 ordered-fold discipline — float
    parity needs a total fold order, and multi-edge duplicates would
    break per-src sorting).

    Per round: one broadcast-size join (ranks ⋈ weighted edges) + one
    grouped ordered fold; the unrolled form is how you'd express a FIXED
    small iteration count (2-4 rounds of label refinement); i1's
    persist/localCheckpoint loop takes over for run-to-convergence."""
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % PR_NODES).alias("src"),
        ((F.col("o_custkey") + F.col("o_orderkey")) % PR_NODES).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    ew = edges.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outdeg = ew.groupBy("src").agg(F.sum("w").cast("bigint").alias("od"))
    nodes = (
        ew.select(F.col("src").alias("n"))
        .unionByName(ew.select(F.col("dst").alias("n")))
        .distinct()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(2):
        contribs = (
            ranks.join(ew, ranks.n == ew.src)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("cn"),
                "src",
                (F.col("rank") * F.col("w") / F.col("od")).alias("c"),
            )
        )
        insum = contribs.groupBy("cn").agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(src, c))),"
                " s -> s.c), 0D, (a, x) -> a + x)"
            ).alias("insum")
        )
        ranks = nodes.join(insum, nodes.n == insum.cn, "left").select(
            "n",
            (
                F.lit(1 - PR_DAMPING)
                + F.lit(PR_DAMPING) * F.coalesce("insum", F.lit(0.0))
            ).alias("rank"),
        )
    ind = ew.groupBy("dst").agg(F.sum("w").alias("ind"))
    return ranks.join(ind, ranks.n == ind.dst, "left").select(
        F.col("n").alias("node"),
        F.round("rank", 6).alias("rank"),
        F.coalesce("ind", F.lit(0)).cast("bigint").alias("in_degree"),
    )


def _lp_round_duck(prev: str, out: str) -> str:
    """One synchronous majority-label round as DuckDB CTEs: count
    neighbor labels, keep the most frequent (ties → smallest label),
    isolated nodes keep their own."""
    return f"""
cnt_{out} AS (
  SELECT s.u, p.label AS vlabel, COUNT(*) AS c
  FROM sym s JOIN {prev} p ON s.v = p.n
  GROUP BY s.u, p.label
),
pick_{out} AS (
  SELECT u, vlabel
  FROM cnt_{out}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, vlabel) = 1
),
{out} AS (
  SELECT p.n, COALESCE(k.vlabel, p.label) AS label
  FROM {prev} p LEFT JOIN pick_{out} k ON k.u = p.n
)"""


@query(
    "i3_label_propagation",
    oracle=f"""
WITH edges AS (
  SELECT o_custkey % {PR_NODES} AS src,
         (o_custkey + o_orderkey) % {PR_NODES} AS dst
  FROM orders
  WHERE o_custkey % {PR_NODES} <> (o_custkey + o_orderkey) % {PR_NODES}
),
sym AS (
  SELECT DISTINCT src AS u, dst AS v FROM edges
  UNION
  SELECT DISTINCT dst AS u, src AS v FROM edges
),
nodes AS (SELECT DISTINCT u AS n FROM sym),
l0 AS (SELECT n, n AS label FROM nodes),
{_lp_round_duck("l0", "l1")[1:]},
{_lp_round_duck("l1", "l2")[1:]}
SELECT CAST(l2.n AS BIGINT) AS node,
       CAST(l2.label AS BIGINT) AS label,
       CAST(COUNT(*) OVER (PARTITION BY l2.label) AS BIGINT) AS community_size
FROM l2
""",
)
def i3_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 community detection by synchronous label propagation (Raghavan
    et al. 2007), two rounds UNROLLED — the graph family's third member:
    e9 finds exact components, i2 ranks nodes, i3 finds dense
    communities inside a component. Each node adopts its neighborhood's
    majority label (ties → smallest), an ALL-INTEGER recurrence — so
    unlike PageRank there is no float discipline needed at all, and the
    argmax is expressed shuffle-free as ``max(struct(count, -label))``
    per node (no per-node window).

    Per round: one join (labels ⋈ symmetric edges, both partitioned on
    node) + one grouped argmax — the same O(E) shuffle bound as i2; at
    100 TB the hub-node skew answer is AQE skew split on the join (the
    perf_experiments §5 shape). The run-to-convergence form follows
    i1's persist/localCheckpoint loop discipline."""
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % PR_NODES).alias("src"),
        ((F.col("o_custkey") + F.col("o_orderkey")) % PR_NODES).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )
    nodes = sym.select(F.col("u").alias("n")).distinct()
    labels = nodes.select("n", F.col("n").alias("label"))
    for _ in range(2):
        counts = (
            sym.join(
                labels.select(F.col("n").alias("v"), F.col("label").alias("vlabel")),
                "v",
            )
            .groupBy("u", "vlabel")
            .agg(F.count("*").alias("c"))
        )
        pick = counts.groupBy("u").agg(
            F.max(F.struct(F.col("c"), (-F.col("vlabel")).alias("neg"))).alias("m")
        ).select("u", (-F.col("m.neg")).alias("vlabel"))
        labels = labels.join(pick, labels.n == pick.u, "left").select(
            "n", F.coalesce("vlabel", "label").alias("label")
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("community_size"))
    return labels.join(sizes, "label").select(
        F.col("n").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("label"),
        F.col("community_size").cast("bigint").alias("community_size"),
    )


BFS_NODES = 5_000  #: sparser node space than PR_NODES → multi-level frontiers
BFS_ROUNDS = 3
_BFS_EDGES_DUCK = f"""
bedges AS (
  SELECT DISTINCT o_custkey % {BFS_NODES} AS src,
         (o_custkey * 31 + o_orderkey) % {BFS_NODES} AS dst
  FROM orders
  WHERE o_custkey % {BFS_NODES} <> (o_custkey * 31 + o_orderkey) % {BFS_NODES}
),
l0 AS (
  SELECT DISTINCT src AS node, 0 AS level FROM bedges
  WHERE src % 1000 = 0
)"""


def _bfs_round_duck(prev: str, cur: str) -> str:
    return f""",
{cur} AS (
  SELECT node, MIN(level) AS level FROM (
    SELECT node, level FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.level + 1 AS level
    FROM {prev} p JOIN bedges e ON e.src = p.node
  ) GROUP BY node
)"""


@query(
    "i4_bfs_levels",
    oracle=f"""
WITH {_BFS_EDGES_DUCK}{_bfs_round_duck("l0", "l1")}{_bfs_round_duck("l1", "l2")}{_bfs_round_duck("l2", "l3")}
SELECT CAST(node AS BIGINT) AS node, CAST(level AS BIGINT) AS level
FROM l3
""",
)
def i4_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4 multi-source BFS — {BFS_ROUNDS} rounds of frontier relaxation
    from a seed set (node %% 1000 == 0) over a deterministic sparse
    digraph (~3 edges/node), the remaining iterative-graph pattern the
    engine lacked: min-hop levels via min-plus relaxation
    level_{{k+1}}(v) = min(level_k(v), min over u→v of level_k(u)+1) —
    Bellman-Ford with unit weights, which is exactly how distributed BFS
    runs on Spark (no mutable frontier set; each round is one equi-join
    edges ⋈ current-levels + one min groupBy). All-integer → bit-exact.

    Scale shape: per round one shuffle on dst for the grouped MIN (the
    join broadcasts the level table while it is small; at web scale both
    sides shuffle-partition on the node key and stay co-partitioned
    round to round). Unreached nodes never enter the level table — state
    is O(reached), not O(nodes). Run-to-convergence uses the i1/e9
    persist + localCheckpoint loop discipline; the unrolled {BFS_ROUNDS}
    rounds keep the oracle declarative (e9's recursive-CTE alternative)."""
    orders = load_table(spark, sf_dir, "orders")
    edges = (
        orders.select(
            (F.col("o_custkey") % BFS_NODES).alias("src"),
            ((F.col("o_custkey") * 31 + F.col("o_orderkey")) % BFS_NODES).alias(
                "dst"
            ),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    levels = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") % 1000 == 0)
        .distinct()
        .withColumn("level", F.lit(0))
    )
    for _ in range(BFS_ROUNDS):
        relaxed = levels.join(edges, levels.node == edges.src).select(
            F.col("dst").alias("node"), (F.col("level") + 1).alias("level")
        )
        levels = (
            levels.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("level").alias("level"))
        )
    return levels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("level").cast("bigint").alias("level"),
    )
