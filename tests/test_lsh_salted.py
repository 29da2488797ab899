"""Law tests for the grid-salted LSH pair join (skew tier).

The contract: ``lsh_candidate_pairs_salted`` is a PHYSICAL-only
transformation — its pair set is bit-equal to the plain
``lsh_candidate_pairs`` for any input — while a hot bucket's pair
production provably spreads across many reducers instead of one.
"""

import pytest
from pyspark.sql import functions as F

from wx20222_bigdata_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_candidate_pairs_salted,
    minhash_band_keys,
)


@pytest.fixture(scope="module")
def hot_corpus(spark):
    """300 docs, 200 of which share identical text — they sketch
    identically and collide in EVERY band, forming 4 hot buckets of 200
    (the legitimate-but-hot case below any sane drop cap of 500)."""
    rows = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(200)]
    rows += [
        (1000 + i, f"unique document number {i} with words {i * 7} and {i * 13} tail")
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_sorted(df):
    return sorted(tuple(r) for r in df.select("id_a", "id_b", "band").collect())


def test_salted_pairs_bit_equal_on_hot_fixture(spark, hot_corpus):
    bands = minhash_band_keys(hot_corpus)
    plain = _pairs_sorted(lsh_candidate_pairs(bands))
    salted = _pairs_sorted(lsh_candidate_pairs_salted(bands, n_cells=4, hot_threshold=8))
    assert len(plain) >= 4 * (200 * 199) // 2  # the hot bucket really is hot
    assert salted == plain


def test_salted_pairs_bit_equal_all_cold(spark, hot_corpus):
    """hot_threshold above every bucket size → pure cold path (single
    (0,0) cell, zero replication) must still equal the plain join."""
    bands = minhash_band_keys(hot_corpus)
    plain = _pairs_sorted(lsh_candidate_pairs(bands))
    salted = _pairs_sorted(
        lsh_candidate_pairs_salted(bands, n_cells=8, hot_threshold=10**6)
    )
    assert salted == plain


def test_salted_composes_with_bucket_cap(spark, hot_corpus):
    """max_bucket_size composes: both tiers drop the same buckets."""
    bands = minhash_band_keys(hot_corpus)
    plain = _pairs_sorted(lsh_candidate_pairs(bands, max_bucket_size=50))
    salted = _pairs_sorted(
        lsh_candidate_pairs_salted(bands, n_cells=4, hot_threshold=8, max_bucket_size=50)
    )
    assert salted == plain


def test_hot_bucket_output_spreads_across_reducers(spark, hot_corpus):
    """The scale claim itself: with one dominant bucket per band, the
    plain join lands each band's ~19,900 pairs under ONE join key (one
    reducer owns them all); the grid decomposition bounds every join
    key's output at ~b²/n² pairs. Asserted two ways: (a) max pairs per
    JOIN KEY — partition-layout-independent, the true reducer-load bound
    at any scale; (b) the realized partition histogram with AQE
    coalescing off (at test scale AQE merges the tiny shuffle back to
    one partition, which is correct for 60 KB and irrelevant at 100 TB)."""
    bands = minhash_band_keys(hot_corpus)
    n = 8
    plain = lsh_candidate_pairs(bands)
    salted = lsh_candidate_pairs_salted(bands, n_cells=n, hot_threshold=8)

    # (a) per-key load: plain keys on (band, bucket); the hot bucket's
    # whole b(b-1)/2 burden sits under one key per band.
    plain_key_max = (
        plain.groupBy("band").count().agg(F.max("count")).first()[0]
    )
    assert plain_key_max >= (200 * 199) // 2
    # salted keys additionally carry the grid cell; reconstruct the cell
    # of each output pair from the deterministic group hash.
    g_a = F.pmod(F.xxhash64("id_a"), F.lit(n))
    g_b = F.pmod(F.xxhash64("id_b"), F.lit(n))
    salted_key_max = (
        salted.groupBy(
            "band", F.least(g_a, g_b).alias("p"), F.greatest(g_a, g_b).alias("q")
        )
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert salted_key_max < plain_key_max / 5

    # (b) physical histogram, forced into the 100 TB plan shape: no
    # auto-broadcast (a TB-sized bands table shuffles both sides on the
    # join key) and no AQE partition coalescing (a 60 KB test shuffle
    # legitimately merges to one partition; a 100 TB one never would).
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def max_partition_rows(pairs):
            hist = (
                pairs.withColumn("_pid", F.spark_partition_id())
                .groupBy("_pid")
                .count()
                .collect()
            )
            return max(r["count"] for r in hist)

        plain_max = max_partition_rows(lsh_candidate_pairs(bands))
        salted_max = max_partition_rows(
            lsh_candidate_pairs_salted(bands, n_cells=n, hot_threshold=8)
        )
        assert plain_max >= (200 * 199) // 2
        # looser than the per-key bound: with only 32 shuffle partitions
        # several of the 144 hot cells co-hash onto one reducer, and the
        # group hash over 200 doc_ids is itself uneven — the per-key
        # assertion above is the scale-exact bound, this one checks the
        # split is physically realized at all.
        assert salted_max < plain_max / 2
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_partition_invariance_of_salted_pairs(spark, hot_corpus):
    """Pair set independent of input partitioning (adversarial prime
    repartition) — the law the rest of the dedup family carries."""
    bands = minhash_band_keys(hot_corpus)
    base = _pairs_sorted(lsh_candidate_pairs_salted(bands, n_cells=4, hot_threshold=8))
    reparted = _pairs_sorted(
        lsh_candidate_pairs_salted(bands.repartition(13), n_cells=4, hot_threshold=8)
    )
    assert reparted == base


# --- pure-python property fuzz of the grid decomposition ---------------
# The Spark tests above pin the end-to-end law on fixed fixtures; this
# fuzzes the combinatorial core over random bucket populations and grid
# widths: EVERY unordered pair {x,y} of a bucket is produced in EXACTLY
# one grid cell (no loss, no duplicates), for any group assignment —
# including adversarial ones (all docs one group, alternating, etc.).

from hypothesis import given, settings
from hypothesis import strategies as st


def _grid_pairs(ids_and_groups, n_cells):
    """Reference simulation of lsh_candidate_pairs_salted's cell rule."""
    side_a = {}  # (p, q) -> ids
    side_b = {}
    for doc, g in ids_and_groups:
        for q in range(g, n_cells):
            side_a.setdefault((g, q), []).append(doc)
        for p in range(0, g + 1):
            side_b.setdefault((p, g), []).append(doc)
    out = []
    for cell, a_ids in side_a.items():
        p, q = cell
        for x in a_ids:
            for y in side_b.get(cell, []):
                if p == q and not (x < y):
                    continue  # diagonal keeps one ordering
                if x == y:
                    continue
                out.append((min(x, y), max(x, y)))
    return out


@given(
    st.lists(st.integers(0, 10**6), min_size=2, max_size=60, unique=True),
    st.integers(min_value=1, max_value=9),
    st.randoms(use_true_random=False),
)
@settings(deadline=None, max_examples=200)
def test_grid_decomposition_exactly_once(ids, n_cells, rnd):
    groups = [(i, rnd.randrange(n_cells)) for i in ids]
    produced = _grid_pairs(groups, n_cells)
    want = {(min(x, y), max(x, y)) for x in ids for y in ids if x != y}
    assert sorted(produced) == sorted(want)  # set equality AND no dupes
