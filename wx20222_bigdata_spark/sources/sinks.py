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


def write_compacted_parquet(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 << 20,
    est_row_bytes: float | None = None,
    sample_rows: int = 10_000,
    row_group_bytes: int | None = None,
    shard_key: str | None = None,
) -> dict:
    """Target-FILE-SIZE compaction — the write-side dual of
    catalog.rebalance_small_scan: instead of a caller-guessed
    ``n_shards``, size the shard count from measured bytes-per-row so
    output files land near ``target_file_bytes`` (the ~100 MB-file /
    many-row-group layout real lakehouse compactors — Delta OPTIMIZE,
    Iceberg rewriteDataFiles — converge on, and the layout
    rebalance_small_scan's footer gate wants to see on the read side).

    Mechanics: one ``count()`` pass for the row total (production
    compactors read this from table stats), a bounded ``limit(sample_
    rows)`` write to a scratch dir to measure ENCODED bytes/row (raw
    column sizes overestimate parquet's encoded size badly — dictionary
    + RLE routinely compress 5-20×), then
    ``repartition(ceil(rows × bpr / target))`` and a single write with
    ``maxRecordsPerFile`` as the hard per-file cap. Pass
    ``est_row_bytes`` explicitly to skip the sample write (non-local
    filesystems, or when stats are already known). Returns the sizing
    decision (rows, est_row_bytes, n_shards) for manifests/audit.

    The sample is written through the SAME parquet codec as the real
    write, so the estimate tracks encoding; small files still end up
    within ~2× of target because parquet metadata overhead dominates
    only below a few MiB (tested)."""
    import math
    import os
    import shutil
    import tempfile

    n_rows = df.count()
    if n_rows == 0:
        df.write.mode("overwrite").parquet(path)
        return {"rows": 0, "est_row_bytes": 0.0, "n_shards": 0}
    if est_row_bytes is None:
        k = min(sample_rows, n_rows)
        scratch = tempfile.mkdtemp(prefix="compact_sample_")
        try:
            sample_path = os.path.join(scratch, "sample.parquet")
            df.limit(k).coalesce(1).write.mode("overwrite").parquet(sample_path)
            sampled = sum(
                os.path.getsize(os.path.join(sample_path, f))
                for f in os.listdir(sample_path)
                if f.endswith(".parquet")
            )
            est_row_bytes = sampled / k
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    if est_row_bytes <= 0:
        # The sample directory can legitimately yield no visible .parquet
        # bytes on a non-local cluster (executors write to the cluster FS
        # while the driver lists a local tempdir), and a caller may pass 0.
        # Sizing is impossible without an estimate — fall back to a plain
        # write rather than divide by zero.
        df.write.mode("overwrite").parquet(path)
        return {"rows": n_rows, "est_row_bytes": 0.0, "n_shards": 0}
    n_shards = max(1, math.ceil(n_rows * est_row_bytes / target_file_bytes))
    cap_rows = max(1, int(target_file_bytes / est_row_bytes))
    if shard_key is not None:
        # Deterministic layout: rows land in shard dirs keyed by an
        # md5-mod of ``shard_key`` (cross-engine reproducible — the s6
        # manifest oracle predicts per-shard rows AND file counts from
        # it), and the hash repartition colocates each shard value in
        # one task so per-shard file count is exactly
        # ceil(shard_rows / cap_rows) under maxRecordsPerFile.
        from pyspark.sql import functions as F

        from wx20222_bigdata_spark.functions.hashing import spark_md5_hash

        out = df.withColumn(
            "shard",
            F.expr(spark_md5_hash(f"CAST({shard_key} AS STRING)", n_shards)),
        ).repartition(n_shards, "shard")
        writer = out.write.mode("overwrite").partitionBy("shard")
    else:
        out = df.repartition(n_shards)
        writer = out.write.mode("overwrite")
    writer = writer.option("maxRecordsPerFile", cap_rows)
    # Row-group geometry: the default parquet block size equals a whole
    # target-sized file (one row group per file = one scan task per file
    # — the read-side pathology rebalance_small_scan guards against).
    # Default to 8 groups per file so scans can parallelize within files.
    writer = writer.option(
        "parquet.block.size",
        row_group_bytes if row_group_bytes is not None else target_file_bytes // 8,
    )
    writer.parquet(path)
    return {
        "rows": n_rows,
        "est_row_bytes": round(est_row_bytes, 2),
        "n_shards": n_shards,
        "cap_rows": cap_rows,
    }


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
