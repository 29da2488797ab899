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
