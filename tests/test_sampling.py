"""Pin the seeded sampling operators' exact behavior (rows-only queries —
no DuckDB oracle, so unit tests carry the correctness burden;
SURVEY.md §5c)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from wx20222_bigdata_spark.registry import all_queries

    return all_queries()[name]


def test_stratified_holdout_fractions_and_partition(spark):
    out = _q("o5_stratified_holdout")(spark, SF_ORACLE).toPandas()
    assert len(out) == 10  # one row per label
    total = out.n_train + out.n_holdout
    # per-label totals must equal the true label counts (split is a partition)
    from wx20222_bigdata_spark.catalog import load_table

    truth = (
        load_table(spark, SF_ORACLE, "embeddings")
        .groupBy("label")
        .count()
        .toPandas()
        .set_index("label")["count"]
    )
    for _, row in out.iterrows():
        assert row.n_train + row.n_holdout == truth[row.label]
        # Bernoulli(0.9) per class: loose but real bounds
        assert 0.7 <= row.n_train / truth[row.label] <= 1.0


def test_holdout_is_disjoint_complement(spark):
    from wx20222_bigdata_spark.catalog import load_table
    from wx20222_bigdata_spark.operators.sampling import (
        HOLDOUT_FRACTION,
        HOLDOUT_SEED,
        stratified_split,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    train, holdout = stratified_split(emb, "label", HOLDOUT_FRACTION, HOLDOUT_SEED)
    n_train, n_hold, n_all = train.count(), holdout.count(), emb.count()
    assert n_train + n_hold == n_all
    assert train.join(holdout, "vec_id", "inner").count() == 0


def test_sample_restore_order(spark):
    out = _q("o2_sample_restore_order")(spark, SF_ORACLE).toPandas()
    assert len(out) == 50
    # order restored: vec_id ascending after the random draw
    assert (out.vec_id.to_numpy() == sorted(out.vec_id)).all()
    # deterministic within a session
    again = _q("o2_sample_restore_order")(spark, SF_ORACLE).toPandas()
    assert out.equals(again)


def test_seeded_shuffle_is_permutation(spark):
    out = _q("o7_seeded_shuffle")(spark, SF_ORACLE).toPandas()
    assert sorted(out.shuffle_rank) == list(range(1, len(out) + 1))
    assert len(set(out.doc_id)) == len(out)
    # a real shuffle: rank order differs from id order
    assert (out.sort_values("shuffle_rank").doc_id.to_numpy()
            != out.sort_values("doc_id").doc_id.to_numpy()).any()


def test_stratified_split_high_cardinality_guard(spark):
    """VERDICT r1 item 10: stratifying on an unbounded-cardinality column
    must fail fast instead of collecting every distinct value."""
    import pytest

    from wx20222_bigdata_spark.operators.sampling import stratified_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="distinct values"):
        # doc_id is unique per row -> cardinality 500 > max_labels=50
        stratified_split(docs, "doc_id", 0.9, 42, key_col="doc_id", max_labels=50)
    # bounded domain still works under the same cap
    train, hold = stratified_split(docs, "lang", 0.9, 42, key_col="doc_id", max_labels=50)
    assert train.count() + hold.count() == docs.count()


def test_o15_epoch_schedule_laws(spark):
    """Data-constrained repeat schedule: the budget identity is exact
    (Σ n_repeats == 2·|corpus| + 401 — uncapped largest remainder), and
    within a source repeats differ by AT MOST one epoch (full epochs for
    all, one extra for the hash-ranked remainder)."""
    from wx20222_bigdata_spark.operators.sampling import (
        o15_epoch_repeat_schedule,
    )

    pdf = o15_epoch_repeat_schedule(spark, "/root/testdata/sf0.01").toPandas()
    assert pdf.n_repeats.sum() == 2 * len(pdf) + 401
    spread = pdf.groupby("source").n_repeats.agg(["min", "max"])
    assert ((spread["max"] - spread["min"]) <= 1).all()
    # priority monotonicity: total epochs follow the unit table
    per_src = pdf.groupby("source").n_repeats.sum()
    assert per_src["src19"] == per_src.max()
    assert per_src["src0"] == per_src.min()
