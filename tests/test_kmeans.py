"""k-means invariants (operators/kmeans.py). Cross-engine exactness is
covered by test_oracle_parity."""

from __future__ import annotations

from wx20222_bigdata_spark.operators.kmeans import K, e14_kmeans_assign

SF = "/root/testdata/sf0.01"


def test_e14_assignment_invariants(spark):
    rows = e14_kmeans_assign(spark, SF).collect()
    assert len(rows) == 500  # one assignment per embedding
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(K))
    assert len(clusters) >= 2  # no degenerate single-cluster collapse
    sizes = {}
    for r in rows:
        assert r["sqdist"] >= 0
        sizes.setdefault(r["cluster"], 0)
        sizes[r["cluster"]] += 1
    for r in rows:
        assert r["cluster_size"] == sizes[r["cluster"]]
    assert sum(sizes.values()) == 500
