"""Z-order layout laws (operators/layout.py):

1. **Locality** — after z-ordering, each z-range "file" covers a bounded
   box in (x, y); the summed box area is far below files × full-domain
   area (a single-column sort would give each file the FULL span of the
   other dimension).
2. **Pruning** — written to parquet with small row groups, a 2-D box
   predicate overlaps far fewer row-group min/max footers in the z-sorted
   layout than in a linear (event_id-sorted) layout of the same rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_ORACLE
from wx20222_bigdata_spark.operators.layout import Z_BITS, z1_zorder_stats


@pytest.fixture(scope="module")
def zed(spark):
    """(x, y, zval) for every sf0.01 event, via the declared query's CTE."""
    from wx20222_bigdata_spark.catalog import load_table
    from wx20222_bigdata_spark.operators.layout import _interleave_terms

    load_table(spark, SF_ORACLE, "events").createOrReplaceTempView("events")
    x = f"(user_id % {1 << Z_BITS})"
    y = f"least(CAST(floor(value) AS BIGINT), {(1 << Z_BITS) - 1})"
    z = _interleave_terms(x, y, Z_BITS, "div")
    return spark.sql(
        f"SELECT event_id, CAST({x} AS BIGINT) AS x, CAST({y} AS BIGINT) AS y, "
        f"CAST({z} AS BIGINT) AS zval FROM events"
    ).toPandas()


def test_zorder_locality_boxes(spark):
    out = z1_zorder_stats(spark, SF_ORACLE).toPandas()
    assert (out["n_rows"] > 0).all() and out["n_rows"].sum() == 10_000
    # z-ranges partition the key space: file boxes must not overlap in z.
    out = out.sort_values("file_id").reset_index(drop=True)
    assert (out["z_min"].iloc[1:].values > out["z_max"].iloc[:-1].values).all()
    # Locality: total box area << files × full-domain area. For Morton
    # order each 2^(2k)-aligned z-range is a 2^k × 2^k tile, so the summed
    # area is ~n_files × tile² regardless of data skew.
    domain_x = out["x_max"].max() - out["x_min"].min() + 1
    domain_y = out["y_max"].max() - out["y_min"].min() + 1
    area = (
        (out["x_max"] - out["x_min"] + 1) * (out["y_max"] - out["y_min"] + 1)
    ).sum()
    assert area < 0.5 * len(out) * domain_x * domain_y


def _overlapping_row_groups(path: str, box: tuple[int, int, int, int]) -> int:
    """Row groups whose (x, y) min/max stats intersect the box — what a
    parquet reader's predicate pushdown would have to read."""
    x_lo, x_hi, y_lo, y_hi = box
    md = pq.ParquetFile(path).metadata
    cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
    hit = 0
    for rg in range(md.num_row_groups):
        sx = md.row_group(rg).column(cols["x"]).statistics
        sy = md.row_group(rg).column(cols["y"]).statistics
        if sx.max >= x_lo and sx.min <= x_hi and sy.max >= y_lo and sy.min <= y_hi:
            hit += 1
    return hit


def test_zorder_prunes_more_row_groups(zed, tmp_path):
    z_path = str(tmp_path / "z.parquet")
    lin_path = str(tmp_path / "linear.parquet")
    pq.write_table(
        pa.Table.from_pandas(zed.sort_values("zval"), preserve_index=False),
        z_path,
        row_group_size=250,
    )
    pq.write_table(
        pa.Table.from_pandas(zed.sort_values("event_id"), preserve_index=False),
        lin_path,
        row_group_size=250,
    )
    n_groups = pq.ParquetFile(z_path).metadata.num_row_groups
    assert n_groups == 40
    boxes = [(10, 20, 50, 80), (100, 120, 0, 30), (40, 60, 200, 300)]
    z_hits = sum(_overlapping_row_groups(z_path, b) for b in boxes)
    lin_hits = sum(_overlapping_row_groups(lin_path, b) for b in boxes)
    # The linear layout is sorted on a key independent of (x, y): nearly
    # every row group spans the full domain and matches every box. The
    # z-sorted layout must read strictly less than half of that.
    assert z_hits < 0.5 * lin_hits, (z_hits, lin_hits)


def test_s11_schema_evolution_merges_generations(spark):
    """s11: the merged read reconciles both shard generations — pre-1998
    rows surface with NULL priority (grouped under the sentinel), the
    totals reconcile exactly against the unsplit table, and the sentinel
    group is non-empty (the evolution actually happened on disk)."""
    from pyspark.sql import functions as F

    from wx20222_bigdata_spark.operators.layout import s11_schema_evolution

    sf = "/root/testdata/sf0.001"
    rows = {r.priority: r for r in s11_schema_evolution(spark, sf).collect()}
    assert "<pre-evolution>" in rows
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    n_pre = orders.filter(F.col("o_orderdate") < cutoff).count()
    assert rows["<pre-evolution>"].n_orders == n_pre
    assert sum(r.n_orders for r in rows.values()) == orders.count()
    total = float(
        orders.agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        ).first()[0]
    )
    assert abs(sum(r.total_price for r in rows.values()) - total) < 1e-6
    # post-evolution groups are the real priority values, none NULL
    post = [p for p in rows if p != "<pre-evolution>"]
    assert post and all(p is not None for p in post)


def test_s6_oracle_parity_cross_sf(spark):
    """s6 cross-sf regression (r10 ADVICE, medium): the rounding
    divergence — DuckDB CAST rounding the oracle's row cap to 71 while
    Spark's int() truncates to 70 — was invisible at the sf0.01 parity
    gate (hot shard 78 rows: ceil(78/70) == ceil(78/71)) and fired only
    at sf0.1 (a real 71-row shard: 2 files written, 1 predicted). Run
    the full seat-vs-oracle comparison at sf0.1 so any future cap or
    bytes/row drift is caught at a scale where shard populations
    actually straddle the cap."""
    import duckdb

    from tests.test_oracle_parity import compare_frames
    from wx20222_bigdata_spark.registry import all_oracles, all_queries

    sf_dir = "/root/testdata/sf0.1"
    spark_pdf = all_queries()["s6_compaction_manifest"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        duck_pdf = con.execute(
            all_oracles()["s6_compaction_manifest"]
        ).fetchdf()
    finally:
        con.close()
    # the scale must actually exercise the cap: at least one shard rolls
    # a second file (otherwise this test degrades to the sf0.01 gate)
    assert (spark_pdf["shard_files"] > 1).any()
    compare_frames("s6_compaction_manifest@sf0.1", spark_pdf, duck_pdf)
