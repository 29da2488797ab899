"""FFD packing laws: capacity is never exceeded (except singleton
oversize bins), bin count sits between the token lower bound and the
FFD approximation guarantee, and the assignment is deterministic."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE


def _q(name):
    from wx20222_bigdata_spark.registry import all_queries

    return all_queries()[name]


def test_ffd_laws(spark):
    from wx20222_bigdata_spark.operators.packing import PACK_BUDGET

    pdf = _q("e23_ffd_packing")(spark, SF_ORACLE).toPandas()
    occ = pdf.groupby(["source", "bin_id"]).agg(
        toks=("n_tok", "sum"), docs=("doc_id", "count")
    )
    # capacity law: a bin over budget must be a singleton oversized doc
    over = occ[occ.toks > PACK_BUDGET]
    assert (over.docs == 1).all(), over
    # bin-count laws per shard: the token lower bound and the FFD
    # approximation guarantee (FFD <= 11/9*OPT + 1, OPT >= lower bound).
    # NOTE e6's contiguous greedy is NOT an upper bound: it lets a
    # straddling doc overflow its bin, so it can report FEWER bins than
    # any capacity-respecting packer.
    for source, grp in pdf.groupby("source"):
        n_bins = grp["bin_id"].nunique()
        n_oversized = int((grp["n_tok"] > PACK_BUDGET).sum())
        fit_toks = int(grp.loc[grp["n_tok"] <= PACK_BUDGET, "n_tok"].sum())
        lower = n_oversized + math.ceil(fit_toks / PACK_BUDGET)
        upper = math.ceil(11 * lower / 9) + 1
        assert lower <= n_bins <= upper, (source, lower, n_bins, upper)


def test_ffd_deterministic(spark):
    a = _q("e23_ffd_packing")(spark, SF_ORACLE).toPandas()
    b = _q("e23_ffd_packing")(spark, SF_ORACLE).toPandas()
    key = ["source", "doc_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
