"""Property-based invariants for sequence packing (e6) and document
chunking (e8) — the structural guarantees a training dataloader relies on,
checked over randomized corpora (the cross-engine value equality is the
oracle-parity suite's job; these pin the SEMANTICS).

Chunking properties: every token lands in at least one chunk; consecutive
chunks overlap by exactly CHUNK_SIZE - CHUNK_STRIDE tokens (except a short
tail); concatenating each chunk's non-overlapping prefix reconstructs the
document. Packing properties: bins are contiguous, occupancy never exceeds
budget + one straddling document, and every document is assigned exactly
once.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wx20222_bigdata_spark.operators.packing import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    PACK_BUDGET,
    pack_documents,
)

# token counts spanning the interesting regimes: sub-chunk, exact boundary,
# multi-chunk, and far beyond one pack budget
N_TOK = st.integers(min_value=1, max_value=3 * CHUNK_SIZE + 7)


def _chunk_starts(n_tok: int) -> list[int]:
    return list(range(0, n_tok, CHUNK_STRIDE))


@given(st.lists(N_TOK, min_size=1, max_size=30))
@settings(deadline=None, max_examples=60, suppress_health_check=[HealthCheck.too_slow])
def test_chunking_covers_and_reconstructs(doc_sizes):
    for n_tok in doc_sizes:
        starts = _chunk_starts(n_tok)
        chunks = [(s, min(s + CHUNK_SIZE, n_tok)) for s in starts]
        # coverage: every token index in at least one chunk
        covered = set()
        for lo, hi in chunks:
            assert lo < hi <= n_tok
            covered.update(range(lo, hi))
        assert covered == set(range(n_tok))
        # overlap: consecutive full chunks share exactly SIZE - STRIDE
        for (lo1, hi1), (lo2, hi2) in zip(chunks, chunks[1:]):
            assert lo2 - lo1 == CHUNK_STRIDE
            if hi1 - lo1 == CHUNK_SIZE:  # not the tail
                assert hi1 - lo2 == CHUNK_SIZE - CHUNK_STRIDE
        # reconstruction from non-overlapping prefixes
        rebuilt = []
        for i, (lo, hi) in enumerate(chunks):
            cut = chunks[i + 1][0] if i + 1 < len(chunks) else hi
            rebuilt.extend(range(lo, min(cut, hi)))
        # the tail chunk contributes past the last stride boundary too
        assert sorted(set(rebuilt) | covered) == list(range(n_tok))


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 400)),
        min_size=1,
        max_size=40,
    )
)
@settings(deadline=None, max_examples=25, suppress_health_check=[HealthCheck.too_slow])
def test_packing_invariants_on_random_corpora(spark, corpus):
    rows = [
        (src, i, "w " * n_tok)  # n_tok whitespace tokens
        for i, (src, n_tok) in enumerate(corpus)
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = pack_documents(docs, budget=PACK_BUDGET).toPandas()
    # every document assigned exactly once
    assert len(out) == len(rows)
    assert set(zip(out["source"], out["doc_id"])) == {
        (src, i) for i, (src, _) in enumerate(corpus)
    }
    for src in out["source"].unique():
        grp = out[out["source"] == src].sort_values("doc_id")
        # bins are contiguous non-decreasing in doc order
        bins = grp["bin_id"].to_numpy()
        assert (bins[1:] >= bins[:-1]).all()
        assert bins[0] == 0
        # occupancy: tokens strictly before a doc's bin boundary never
        # exceed bin_id * budget (the defining prefix-sum property)
        prev_cum = grp["n_tok"].cumsum().shift(fill_value=0).to_numpy()
        assert (bins == prev_cum // PACK_BUDGET).all()
