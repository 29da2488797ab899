"""Connected-components cluster resolution (operators/clusters.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wx20222_bigdata_spark.operators.clusters import (
    connected_components,
    e9_dedup_clusters,
)

SF = "/root/testdata/sf0.001"


def test_connected_components_hand_graph(spark):
    # Two components: a 4-node chain 1-2-3-4 (diameter 3, exercises
    # multi-round propagation) and a triangle 10-11-12; node 20 isolated
    # by an edge to itself is not representable — singletons never enter.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        ["src", "dst"],
    )
    got = {
        (r["node"], r["label"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10)}


def test_connected_components_single_edge(spark):
    edges = spark.createDataFrame([(7, 3)], ["src", "dst"])
    got = {(r["node"], r["label"]) for r in connected_components(edges).collect()}
    assert got == {(3, 3), (7, 3)}


def test_e9_cluster_invariants(spark):
    df = e9_dedup_clusters(spark, SF).collect()
    assert len(df) > 0
    by_cluster: dict[int, list] = {}
    for r in df:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        ids = [r["doc_id"] for r in rows]
        # cluster id is the minimum member and exactly one canonical row
        assert cid == min(ids)
        assert sum(r["is_canonical"] for r in rows) == 1
        assert all(r["cluster_size"] == len(rows) for r in rows)
        # every cluster from the pair graph has >= 2 members
        assert len(rows) >= 2
    # seeded mutants (doc_id + 100000) must land in their source's cluster
    mutant_rows = [r for r in df if r["doc_id"] >= 100000]
    assert mutant_rows, "seeded mutants should appear in the pair graph"
    doc_cluster = {r["doc_id"]: r["cluster_id"] for r in df}
    recovered = sum(
        1
        for r in mutant_rows
        if doc_cluster.get(r["doc_id"] - 100000) == r["cluster_id"]
    )
    assert recovered == len(mutant_rows)


def test_e9c_verified_closure_laws(spark):
    """e9c (verify-before-closure): every cluster doc pair traces back to
    a candidate pair sharing >=2 bands; seeded mutants stay clustered
    with their source (near-identical docs share >=2 of 4 bands); and
    e9c's edge set is a subset of e9's raw candidates, so no e9c cluster
    can span docs e9 would not have connected."""
    from wx20222_bigdata_spark.operators.clusters import (
        e9_dedup_clusters,
        e9c_verified_clusters,
    )

    raw = {(r.doc_id, r.cluster_id) for r in e9_dedup_clusters(spark, SF).collect()}
    ver = e9c_verified_clusters(spark, SF).collect()
    assert ver, "verified clustering must be non-empty on the mutant fixture"
    # mutants (doc_id >= 100000) must remain clustered with their source
    # (components may legitimately also contain other sources that are
    # near-dups of each other, so compare cluster membership, not ids)
    cluster_of = {r.doc_id: r.cluster_id for r in ver}
    mutants = [r for r in ver if r.doc_id >= 100000]
    assert mutants
    for r in mutants:
        src = r.doc_id - 100000
        assert src in cluster_of and cluster_of[src] == r.cluster_id
        assert r.cluster_size >= 2
    # verified docs are a subset of raw-clustered docs (dropping edges
    # can only shrink/split components, never add members)
    raw_docs = {d for (d, _) in raw}
    assert {r.doc_id for r in ver} <= raw_docs
    # canonical flag is consistent with min-id convention
    for r in ver:
        assert r.is_canonical == (r.doc_id == r.cluster_id)


def test_o13_cluster_aware_split_laws(spark):
    """o13 (leakage-safe split): every doc in the corpus gets exactly one
    row; no cluster straddles splits (THE property the seat exists for);
    seeded mutants inherit their source's split; singleton docs match the
    o10-style md5 bucket of their own id."""
    from wx20222_bigdata_spark.operators.clusters import (
        e9c_verified_clusters,
        o13_cluster_aware_split,
    )

    rows = o13_cluster_aware_split(spark, SF).collect()
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    n_mutants = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 50 == 0)
        .count()
    )
    assert len(rows) == n_docs + n_mutants  # full corpus, one row per doc
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # no cluster straddles splits
    by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    # mutants inherit the source's split (they share a verified cluster)
    split_of = {r.doc_id: r.split for r in rows}
    mutant_ids = [r.doc_id for r in rows if r.doc_id >= 100000]
    assert mutant_ids
    for m in mutant_ids:
        assert split_of[m] == split_of[m - 100000]
    # clustered docs carry the e9c component id; all other docs are
    # singletons keyed by their own id
    comp = {
        r.doc_id: r.cluster_id
        for r in e9c_verified_clusters(spark, SF).collect()
    }
    for r in rows:
        assert r.cluster_id == comp.get(r.doc_id, r.doc_id)


def test_o13b_production_split_laws(spark):
    """o13b (production tier, rows-only seat): the compensating laws —
    full coverage, no cluster straddles splits, mutants inherit their
    source's split under the xxhash64+capped pair tier too."""
    from wx20222_bigdata_spark.operators.clusters import (
        o13b_cluster_split_production,
    )

    rows = o13b_cluster_split_production(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_mutants = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 50 == 0)
        .count()
    )
    assert len(rows) == n_docs + n_mutants
    assert len({r.doc_id for r in rows}) == len(rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    split_of = {r.doc_id: r.split for r in rows}
    cluster_of = {r.doc_id: r.cluster_id for r in rows}
    mutant_ids = [r.doc_id for r in rows if r.doc_id >= 100000]
    assert mutant_ids
    for m in mutant_ids:
        # the production hash must still cluster the mutant with its
        # source (e2g's recall law, end to end) — hence same split
        assert cluster_of[m] == cluster_of[m - 100000]
        assert split_of[m] == split_of[m - 100000]


def test_e9d_cap_inactive_equality(spark):
    """e9d (capped verify-before-closure) must be ROW-IDENTICAL to e9c on
    any corpus whose (band, bucket) populations all sit below
    PROD_MAX_BUCKET_SIZE — the fixtures are, by a wide margin, so the cap
    is provably inactive here and the tiers must agree bit-for-bit (the
    law that lets e9d share e9c's semantics everywhere except degenerate
    boilerplate buckets). Also assert the precondition itself, so a
    fixture change that saturates a bucket fails loudly rather than
    silently voiding the equality."""
    from wx20222_bigdata_spark.operators.clusters import (
        e9c_verified_clusters,
        e9d_verified_clusters_capped,
    )
    from wx20222_bigdata_spark.operators.dedup import (
        PROD_MAX_BUCKET_SIZE,
        _corpus_with_mutants_spark,
        minhash_band_keys,
    )

    max_bucket = (
        minhash_band_keys(_corpus_with_mutants_spark(spark, SF))
        .groupBy("band", "bucket_key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_bucket <= PROD_MAX_BUCKET_SIZE, (
        f"fixture bucket {max_bucket} saturates the cap — equality law void"
    )
    cols = ["doc_id", "cluster_id", "cluster_size", "is_canonical"]
    capped = {tuple(r) for r in e9d_verified_clusters_capped(spark, SF).select(cols).collect()}
    uncapped = {tuple(r) for r in e9c_verified_clusters(spark, SF).select(cols).collect()}
    assert capped == uncapped
