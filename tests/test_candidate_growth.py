"""E2f candidate-growth guard (VERDICT r1 item 6): the ML-LSH
approxSimilarityJoin must emit O(corpus) candidate pairs, not O(n²), while
still recovering the seeded mutant near-dups."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from wx20222_bigdata_spark.registry import all_queries

    return all_queries()[name]


def test_e2f_candidate_pairs_stay_linear(spark):
    from wx20222_bigdata_spark.operators.dedup import _corpus_with_mutants_spark

    corpus_n = _corpus_with_mutants_spark(spark, SF_ORACLE).count()
    pairs = _q("e2f_ml_minhash_lsh")(spark, SF_ORACLE).cache()
    n_pairs = pairs.count()
    assert n_pairs <= 5 * corpus_n, (
        f"candidate blowup: {n_pairs} pairs for {corpus_n} docs (cap {5 * corpus_n})"
    )
    # the threshold tightening must not lose the true near-dups: every
    # seeded mutant (id + 100000, ' extra' appended) pairs with its source
    mutant_pairs = pairs.filter(F.col("id_b") == F.col("id_a") + 100000).count()
    expected_mutants = (
        _corpus_with_mutants_spark(spark, SF_ORACLE)
        .filter(F.col("doc_id") >= 100000)
        .count()
    )
    assert mutant_pairs == expected_mutants, (mutant_pairs, expected_mutants)
    pairs.unpersist()
