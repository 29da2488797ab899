"""Custom Python DataSource (Spark 4 Python Data Source API) — the
engine's demonstration that its source surface is *extensible from
Python*: a deterministic synthetic-document generator registered as a
first-class ``spark.read.format("docgen")`` source with explicit input
partitions, exactly how a user would wrap an in-house record service or
proprietary file format without touching the JVM.

The reference's equivalent seat is its ad-hoc corpus loaders
(``data_helper.py`` builds record dicts in a Python loop); here the same
row generation becomes a *planned* source: Spark asks the reader for its
partition list, schedules one task per partition, and each task yields
Arrow-batched rows — so a Python-defined source still scales out across
executors and its scan parallelism is visible to the optimizer.

Content is md5-derived from the row id, so the emitted rows are
bit-reproducible on any engine — the registered query
``s10_python_datasource`` is oracle-checked against DuckDB *generating
the same rows from scratch* (the o10/o11 content-stable-hash
discipline applied to a source).

Pickle discipline (the repo-wide UDF rule): every class is defined
inside the factory function so cloudpickle serializes them by VALUE —
executors never need this repo on ``sys.path``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DOCGEN_SCHEMA = "doc_id bigint, content_md5 string, bucket bigint"


def register_docgen(spark: SparkSession) -> None:
    """Register the ``docgen`` Python data source on this session.

    Options: ``n_rows`` (default 1000), ``n_partitions`` (default 8),
    ``batch_size`` (streaming, default 100). Emits ``doc_id`` ∈
    [0, n_rows), its md5 hex digest, and the o10-style 0-99 hash bucket —
    one InputPartition per contiguous id range in batch, and the same id
    space walked by a replayable offset dict under ``readStream`` (the
    SimpleDataSourceStreamReader protocol; checkpoint recovery re-reads
    identical rows because the generator is deterministic).
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class _DocGenReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 1000))
            self.n_partitions = int(options.get("n_partitions", 8))

        def partitions(self):
            step = -(-self.n_rows // self.n_partitions)  # ceil div
            return [
                _RangePartition(lo, min(lo + step, self.n_rows))
                for lo in range(0, self.n_rows, step)
            ]

        def read(self, partition):
            import hashlib

            for i in range(partition.start, partition.end):
                h = hashlib.md5(str(i).encode("utf-8")).hexdigest()
                yield (i, h, int(h[:15], 16) % 100)

    class _DocGenStreamReader(SimpleDataSourceStreamReader):
        """Micro-batch reader over the same deterministic id space: each
        batch covers [offset, offset + batch_size) up to n_rows; the
        offset dict is the replayable stream position, so recovery from
        a checkpoint re-reads identical rows (exactly-once with a
        deterministic generator)."""

        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 1000))
            self.batch_size = int(options.get("batch_size", 100))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            import hashlib

            lo = int(start["i"])
            hi = min(lo + self.batch_size, self.n_rows)
            rows = []
            for i in range(lo, hi):
                h = hashlib.md5(str(i).encode("utf-8")).hexdigest()
                rows.append((i, h, int(h[:15], 16) % 100))
            return iter(rows), {"i": hi}

        def commit(self, end):
            pass

    class DocGenSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "docgen"

        def schema(self) -> str:
            return DOCGEN_SCHEMA

        def reader(self, schema):
            return _DocGenReader(self.options)

        def simpleStreamReader(self, schema):
            return _DocGenStreamReader(self.options)

    spark.dataSource.register(DocGenSource)


JSONL_SINK_FORMAT = "jsonlsink"


def register_jsonl_sink(spark: SparkSession) -> None:
    """Register the ``jsonlsink`` Python data source WRITER — the other
    half of the Python Data Source API (the docgen source demonstrates
    batch + streaming READ; this demonstrates WRITE with the two-phase
    commit protocol a distributed sink needs):

    - each write task serializes its partition to a private
      ``part-<uuid>.jsonl`` file and returns a commit message naming it;
    - ``commit()`` runs ONCE on the driver with every task's message and
      publishes the atomic ``_MANIFEST`` (the list of committed shards —
      readers that honor the manifest never see partial/abandoned task
      output, the idempotent_parquet_sink discipline at task granularity);
    - ``abort()`` leaves no manifest, so a failed job publishes nothing.

    Options: ``path`` (target directory, required). Classes are defined
    inside the factory (pickle-by-value; executors never import this
    repo)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _ShardCommit(WriterCommitMessage):
        def __init__(self, filename: str, n_rows: int):
            self.filename = filename
            self.n_rows = n_rows

    class _JsonlWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, rows):
            import json as _json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, name), "w") as f:
                for row in rows:
                    f.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return _ShardCommit(name, n)

        def commit(self, messages):
            import json as _json
            import os

            manifest = {
                "shards": sorted(m.filename for m in messages),
                "n_rows": sum(m.n_rows for m in messages),
            }
            tmp = os.path.join(self.path, "._MANIFEST.tmp")
            with open(tmp, "w") as f:
                f.write(_json.dumps(manifest))
            os.replace(tmp, os.path.join(self.path, "_MANIFEST"))

        def abort(self, messages):
            import os

            for m in messages:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass

    class JsonlSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return JSONL_SINK_FORMAT

        def writer(self, schema, overwrite: bool):
            return _JsonlWriter(self.options)

    spark.dataSource.register(JsonlSink)


def read_jsonl_manifest(spark: SparkSession, path: str):
    """Reader half of the jsonlsink commit protocol: load ONLY the
    shards the _MANIFEST published (uncommitted task files are ignored,
    mirroring read_committed for the streaming sink)."""
    import json as _json
    import os

    with open(os.path.join(path, "_MANIFEST")) as f:
        manifest = _json.load(f)
    paths = [os.path.join(path, s) for s in manifest["shards"]]
    if not paths:
        return spark.createDataFrame([], "doc_id bigint")
    return spark.read.json(paths)
