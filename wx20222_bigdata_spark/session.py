"""SparkSession factory with scale-ready defaults.

The reference pipeline hand-tunes physical execution (shard compaction,
out-of-core eviction, micro-batching — SURVEY.md §4). On Spark all of that is
configuration: AQE re-plans at runtime (partition coalescing, skew-join
splitting), Arrow makes the pandas-UDF boundary columnar, and sane shuffle
partition counts keep partitions memory-sized at large SF.

These settings are chosen for a real cluster: they are safe on ``local[N]``
and correct at 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied at session build time. Values are strings per Spark convention.
DEFAULT_CONF: dict[str, str] = {
    # Adaptive query execution: runtime re-planning is the single most
    # important knob at 100 TB — coalesces small shuffle partitions,
    # splits skewed ones, and converts sort-merge joins to broadcast
    # when runtime stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-accelerated pandas interchange: the pandas-UDF path (tokenizer,
    # EMA, model scoring) moves data in columnar batches, not rows.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamp semantics (testdata is naive/UTC).
    "spark.sql.session.timeZone": "UTC",
    # Partition sizing: 128 MiB input splits keep scan tasks balanced.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Join strategy: allow shuffled-hash join where its size conditions
    # hold instead of always preferring sort-merge (guide §3.1/§9). The
    # engine's heaviest plans are pair-producing self-equi-joins over
    # fingerprint/band frames; SHJ skips both per-side sorts. Two paths
    # pick SHJ, with different guards (r12 ADVICE): the AQE rewrite is
    # runtime-safe (fires only when every post-shuffle partition ≤ the
    # 64 MiB threshold below, measured sizes — oversized partitions fall
    # back to sort-merge automatically), but the STATIC planner can also
    # pick SHJ from plan-stat ESTIMATES (canBuildLocalHashMap), and
    # stats on HOF/explode-heavy intermediates can be badly wrong — a
    # mis-estimated build side has no sort-merge fallback and can OOM an
    # executor at cluster scale. Acceptable here because the engine's
    # shuffle-join build sides are bounded by construction (band/gram
    # buckets are df-capped, per-doc frames are SF-linear narrow rows);
    # a deployment with unbounded build-side skew should leave
    # preferSortMergeJoin=true and rely on the AQE threshold alone.
    # Measured r12 (two interleaved A/B rounds, 36 pairs across
    # e7d/e9d/e35/e35b): SHJ side won 27/36 pairwise, medians −3–20% —
    # small but consistent, and the sort removal is the structural win
    # at 100 TB.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
    # Scan-split floor. Spark sizes file splits as
    #   max(openCostInBytes, min(maxPartitionBytes, bytes/minPartitionNum))
    # and the 4 MiB default floor serializes CPU-heavy text pipelines over
    # small-but-dense inputs: a 16 MiB compressed documents table becomes
    # 4 scan tasks (measured: the sf1 char-shingle stage ran 4-way on 32
    # cores; the sf0.1 table is ONE task) even though the post-scan work —
    # explode ×300 shingles + md5 per shingle — is ~100× the scan bytes.
    # 256 KiB lets small inputs split down to bytes/defaultParallelism;
    # large inputs are unaffected (min() is then governed by
    # maxPartitionBytes long before the floor matters), so the setting is
    # cluster-safe. The cost: tiny files pack less densely per task —
    # irrelevant here because sources are compacted parquet (S6).
    "spark.sql.files.openCostInBytes": "262144",
}


def get_spark(
    app_name: str = "wx20222-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``shuffle_partitions`` defaults to ``SPARK_GRAFT_CPUS`` (or 32): on a
    real cluster this should be ~2-3x total cores; AQE coalescing makes
    over-provisioning cheap, under-provisioning is what hurts.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
