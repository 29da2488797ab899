"""Python Data Source API: the docgen source plans real partitions,
yields deterministic content, and its scan parallelism matches the
requested partitioning."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_docgen_partitions_and_determinism(spark):
    from wx20222_bigdata_spark.sources.pyds import register_docgen

    register_docgen(spark)
    df = (
        spark.read.format("docgen")
        .option("n_rows", 500)
        .option("n_partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = sorted((r.doc_id, r.content_md5, r.bucket) for r in df.collect())
    assert len(rows) == 500
    assert [r[0] for r in rows] == list(range(500))
    import hashlib

    h7 = hashlib.md5(b"7").hexdigest()
    assert rows[7][1] == h7
    assert rows[7][2] == int(h7[:15], 16) % 100
    again = sorted((r.doc_id, r.content_md5, r.bucket) for r in df.collect())
    assert rows == again


def test_docgen_filter_and_projection(spark):
    """The source composes with Catalyst: downstream projection/filter
    run as normal plan nodes over the Python scan."""
    from wx20222_bigdata_spark.sources.pyds import register_docgen

    register_docgen(spark)
    df = (
        spark.read.format("docgen")
        .option("n_rows", 1000)
        .option("n_partitions", 3)
        .load()
        .filter("bucket < 10")
        .select("doc_id", "bucket")
    )
    out = df.collect()
    assert all(r.bucket < 10 for r in out)
    assert 0 < len(out) < 1000
