"""Degenerate-document edge cases (r3 ADVICE, low): Spark's
``sequence(start, stop)`` DESCENDS when ``stop < start``, so empty /
whitespace-only / sub-n-gram documents used to emit phantom segments (e32)
or null trigrams (e33). The guards must make both queries agree with their
DuckDB oracles on a fixture that actually contains such documents — the
synthetic testdata never does, which is why the driver gate can't catch it.
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def edge_docs_dir(spark, tmp_path_factory):
    """A documents table (full catalog schema) with degenerate rows."""
    d = tmp_path_factory.mktemp("edge") / "docs"
    d.mkdir()
    rows = [
        (1, "", "en", "web", 0),                    # empty text
        (2, "   ", "en", "web", 3),                 # whitespace-only
        (3, "one", "en", "web", 3),                 # 1 word (< trigram)
        (4, "two words", "en", "web", 9),           # 2 words (< trigram)
        (5, "alpha beta gamma delta epsilon", "en", "web", 30),
        (6, "alpha beta gamma delta epsilon", "en", "web", 30),  # exact dup
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _run_both(spark, edge_docs_dir, name):
    from tests.test_oracle_parity import compare_frames
    from wx20222_bigdata_spark.registry import all_oracles, all_queries

    spark_pdf = all_queries()[name](spark, edge_docs_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_docs_dir}/documents.parquet/*.parquet')"
    )
    duck_pdf = con.execute(all_oracles()[name]).fetchdf()
    con.close()
    compare_frames(name, spark_pdf, duck_pdf)
    return spark_pdf


def test_e32_paragraph_dedup_empty_docs_emit_no_segments(spark, edge_docs_dir):
    pdf = _run_both(spark, edge_docs_dir, "e32_paragraph_dedup")
    # empty/whitespace docs must NOT appear (no segments), not appear with
    # phantom '' segments from the descending sequence
    assert set(pdf["doc_id"]) == {3, 4, 5, 6}


def test_e33_ngram_novelty_short_docs_emit_no_trigrams(spark, edge_docs_dir):
    pdf = _run_both(spark, edge_docs_dir, "e33_ngram_novelty")
    # docs with < 3 words have no trigrams → absent from output, and no
    # null-index grams leak into the df table
    assert set(pdf["doc_id"]) == {5, 6}
    # the duplicated doc's trigrams have df=2 → novelty 0 for both
    assert (pdf["novelty"] == 0.0).all()
