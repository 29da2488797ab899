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


def test_docgen_stream_reader(spark, tmp_path):
    """The same Python source read as a STREAM: micro-batches walk the
    id space via the replayable offset dict; an availableNow pass drains
    exactly the configured row range, each row exactly once."""
    from wx20222_bigdata_spark.sources.pyds import register_docgen

    register_docgen(spark)
    stream = (
        spark.readStream.format("docgen")
        .option("n_rows", 100)
        .option("batch_size", 30)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("docgen_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    # a SimpleDataSourceStreamReader prefetches one batch per trigger, so
    # drain with a running micro-batch trigger and stop once the finite id
    # space is exhausted.
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT COUNT(*) c FROM docgen_stream").first().c >= 100:
            break
        time.sleep(1)
    q.stop()
    got = spark.sql("SELECT * FROM docgen_stream").collect()
    assert sorted(r.doc_id for r in got) == list(range(100))
    import hashlib

    by_id = {r.doc_id: r for r in got}
    h42 = hashlib.md5(b"42").hexdigest()
    assert by_id[42].content_md5 == h42
    assert by_id[42].bucket == int(h42[:15], 16) % 100


def test_jsonl_sink_commit_protocol(spark, tmp_path):
    """Python DataSourceWriter: every task publishes a private shard via
    its commit message, the driver's commit() writes the _MANIFEST, and
    the manifest-honoring reader returns exactly the written rows —
    including an uncommitted stray file that must be ignored."""
    import json
    import os

    from wx20222_bigdata_spark.sources.pyds import (
        read_jsonl_manifest,
        register_docgen,
        register_jsonl_sink,
    )

    register_docgen(spark)
    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    df = (
        spark.read.format("docgen")
        .option("n_rows", 500)
        .option("n_partitions", 4)
        .load()
    )
    df.write.format("jsonlsink").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["n_rows"] == 500
    assert len(manifest["shards"]) == 4  # one shard per input partition

    # a stray uncommitted task file must not be visible through the reader
    with open(os.path.join(out, "part-deadbeef.jsonl"), "w") as f:
        f.write('{"doc_id": 999999, "content_md5": "x", "bucket": 0}\n')

    back = read_jsonl_manifest(spark, out)
    assert back.count() == 500
    assert back.filter("doc_id = 999999").count() == 0
    got = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert got == set(range(500))
