"""S6/S7 sinks: sharded parquet compaction + JSON run manifest.

S6 is the reference's 1.125M-records → 22 packed shards compaction
(``split_pretrain_data.py:28-35``): on Spark, ``repartition(n)`` fixes the
shard count and ``maxRecordsPerFile`` caps rows per file — both forms of
the small-files fix. AQE's partition coalescing handles the read side.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def write_sharded_parquet(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    out = df
    if n_shards is not None:
        out = out.repartition(n_shards)
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json_manifest(manifest: dict, path: str) -> None:
    """S7 run manifest (``json.dump(args)``, ``main.py:288-289``) — plain
    driver-side JSON; tiny by contract."""
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    n_shards: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Format-parametric sink: the same compaction/partitioning contract
    as :func:`write_sharded_parquet` over any Spark-native columnar or
    line format (``parquet``, ``orc``, ``json``, ``csv``). ORC matters
    for interop with Hive-era warehouses; JSON/CSV for export surfaces —
    one writer path, so shard sizing and layout policy stay uniform."""
    out = df.repartition(n_shards) if n_shards is not None else df
    writer = out.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
