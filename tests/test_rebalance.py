"""Gated small-scan rebalance (catalog.rebalance_small_scan).

A narrow CPU-amplifying stage (shingle explode, per-token hashing) runs
inside the scan stage, so its parallelism is capped by the input's
row-group count — NOT by Spark's byte-range splits (a split containing
no row-group start is an empty task). The helper adds one round-robin
shuffle only when (a) the input is small enough that the shuffle is
trivially cheap and (b) the footers prove the scan cannot parallelize.
These tests pin the gate on real parquet files:

- a small single-row-group file IS rebalanced, to defaultParallelism;
- a file with >= cores row groups is returned UNTOUCHED (the exact
  no-op object, no added Exchange) — the real-scale behaviour;
- an oversized input is untouched even with one row group (the bytes
  gate fires first, so no driver-side footer reads happen at scale);
- unreadable/missing paths are a conservative no-op;
- rows are preserved bit-exactly (round-robin moves, never drops).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wx20222_bigdata_spark.catalog import rebalance_small_scan


def _write(path, n_rows: int, row_group_size: int) -> None:
    t = pa.table({"doc_id": list(range(n_rows)), "text": ["x"] * n_rows})
    pq.write_table(t, path, row_group_size=row_group_size)


def test_single_row_group_small_file_rebalances(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _write(p, 1000, row_group_size=1000)  # one row group
    df = spark.read.parquet(p)
    out = rebalance_small_scan(df, p)
    assert out is not df
    par = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == par
    assert out.count() == 1000
    assert {r.doc_id for r in out.collect()} == set(range(1000))


def test_many_row_groups_is_exact_noop(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "docs.parquet")
    _write(p, 10 * par, row_group_size=10)  # par row groups
    df = spark.read.parquet(p)
    out = rebalance_small_scan(df, p)
    assert out is df  # identical object: zero plan change at real scale


def test_oversized_input_skips_before_footer_reads(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "docs.parquet")
    _write(p, 1000, row_group_size=1000)
    df = spark.read.parquet(p)
    # Pretend the file is huge: the bytes gate must refuse before any
    # footer inspection (at 100 TB the driver never opens footers).
    import os

    real_getsize = os.path.getsize
    monkeypatch.setattr(
        "os.path.getsize", lambda f: 10**15 if f == p else real_getsize(f)
    )

    def boom(*a, **k):  # footer read would be a scale bug
        raise AssertionError("footer read past the bytes gate")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    assert rebalance_small_scan(df, p) is df


def test_missing_path_is_noop(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _write(p, 100, row_group_size=100)
    df = spark.read.parquet(p)
    assert rebalance_small_scan(df, str(tmp_path / "nope.parquet")) is df


def test_byte_suffixed_max_partition_bytes(spark, tmp_path):
    """A byte-suffixed maxPartitionBytes ('128m' is valid Spark conf) must
    parse — the gate still fires for a small single-row-group file."""
    from wx20222_bigdata_spark.catalog import _parse_byte_conf

    assert _parse_byte_conf("128m") == 128 << 20
    assert _parse_byte_conf("134217728") == 128 << 20
    p = str(tmp_path / "docs.parquet")
    _write(p, 1000, row_group_size=1000)
    df = spark.read.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        out = rebalance_small_scan(df, p)
        assert out is not df  # suffixed conf no longer disables the gate
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
