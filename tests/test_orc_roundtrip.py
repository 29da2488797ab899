"""ORC (and JSON) roundtrip through the format-parametric sink: schema
and values survive, shard count is honoured."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.sources.sinks import write_table


def test_orc_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "docs_orc")
    write_table(docs, path, fmt="orc", n_shards=4)
    back = spark.read.orc(path)
    assert back.schema == docs.schema
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
    files = [f for f in __import__("os").listdir(path) if f.endswith(".orc")]
    assert len(files) == 4


def test_orc_predicate_pushdown(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    path = str(tmp_path / "docs_orc_pd")
    write_table(docs, path, fmt="orc")
    back = spark.read.orc(path).filter(F.col("lang") == "en").select("doc_id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan


def test_json_roundtrip_values(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "docs_json")
    write_table(docs, path, fmt="json", n_shards=2)
    back = spark.read.schema("doc_id bigint, n_chars bigint").json(path)
    assert back.count() == docs.count()
    assert back.agg(F.sum("n_chars")).first()[0] == docs.agg(F.sum("n_chars")).first()[0]
