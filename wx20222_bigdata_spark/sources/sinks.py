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
