"""BPE train+apply laws (operators/tokenize.py e27):

- training parity with an independently-written counting trainer;
- apply parity with an independently-written encoder (same lowest-rank-
  first spec, different implementation style);
- reconstruction: pieces concatenate back to the word;
- provenance: every piece is a single char or a product of the learned
  merges;
- compression: subword encoding never exceeds character-level cost.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from tests.conftest import SF_ORACLE
from wx20222_bigdata_spark.operators.tokenize import (
    BPE_CHAR_CHUNK,
    BPE_MERGES,
    BPE_MERGES_CHAR,
    N_MERGES,
    apply_bpe,
    bpe_train_apply,
    corpus_word_freq,
    e27_bpe_apply,
    train_bpe,
)


def _word_freq() -> dict[str, int]:
    rows = duckdb.sql(
        "SELECT w, COUNT(*) AS f FROM ("
        "  SELECT unnest(list_filter(string_split(lower(text), ' '), "
        "                x -> length(x) > 0)) AS w "
        f" FROM read_parquet('{SF_ORACLE}/documents.parquet')) GROUP BY w"
    ).fetchall()
    return dict(rows)


def _independent_train(wf: dict[str, int], n: int) -> list[tuple[str, str]]:
    """Counter-based trainer written independently of train_bpe."""
    segs = {w: list(w) for w in wf if len(w) >= 2}
    out = []
    for _ in range(n):
        c: Counter = Counter()
        for w, sym in segs.items():
            for pair in zip(sym, sym[1:]):
                c[pair] += wf[w]
        if not c:
            break
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        out.append(best)
        for w, sym in segs.items():
            new, i = [], 0
            while i < len(sym):
                if sym[i : i + 2] == list(best):
                    new.append(best[0] + best[1])
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            segs[w] = new
    return out


def _independent_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Recursive lowest-rank-first encoder (different style from apply_bpe)."""
    ranks = {p: i for i, p in enumerate(merges)}

    def step(sym: list[str]) -> list[str]:
        cands = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not cands:
            return sym
        _, i = min(cands)
        return step(sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2 :])

    return step(list(word))


def test_bpe_training_parity():
    wf = _word_freq()
    assert train_bpe(wf, N_MERGES) == _independent_train(wf, N_MERGES)


def test_pinned_merge_tables_fresh(spark):
    """Pin freshness: retraining on the sf0.01 fixture with the committed
    procedure must reproduce the committed BPE_MERGES / BPE_MERGES_CHAR
    literals exactly — the oracle is only honest while this holds."""
    from wx20222_bigdata_spark.catalog import load_table
    from wx20222_bigdata_spark.operators.tokenize import BPE_VOCAB_CAP

    from pyspark.sql import functions as F

    docs = load_table(spark, SF_ORACLE, "documents")
    for whitespace, pinned in ((True, BPE_MERGES), (False, BPE_MERGES_CHAR)):
        # the committed procedure's exact selection: (freq desc, w asc)
        # tie-break before the cap — freq alone would pick arbitrary rows
        # when ties span the cap boundary
        wf_rows = (
            corpus_word_freq(docs, whitespace=whitespace)
            .orderBy(F.desc("freq"), F.asc("w"))
            .limit(BPE_VOCAB_CAP)
            .collect()
        )
        wf = {r["w"]: r["freq"] for r in wf_rows}
        assert train_bpe(wf, N_MERGES) == pinned, f"whitespace={whitespace}"


def test_e27_seat_equals_prod_tier_at_pin_corpus(spark):
    """The declared e27 seat (pinned table) and the prod tier (in-query
    training) must agree on the corpus the pin was trained on."""
    from wx20222_bigdata_spark.catalog import load_table

    docs_wf = corpus_word_freq(
        load_table(spark, SF_ORACLE, "documents"), whitespace=True
    )
    prod = {r["w"]: r for r in bpe_train_apply(spark, docs_wf).collect()}
    seat = {r["w"]: r for r in e27_bpe_apply(spark, SF_ORACLE).collect()}
    assert set(prod) == set(seat)
    for w in prod:
        assert prod[w]["pieces_str"] == seat[w]["pieces_str"], w


def test_bpe_apply_laws(spark):
    wf = _word_freq()
    merges = train_bpe(wf, N_MERGES)
    products = {a + b for a, b in merges}
    out = {r["w"]: r for r in e27_bpe_apply(spark, SF_ORACLE).collect()}
    assert set(out) == set(wf)
    for w, row in out.items():
        pieces = row["pieces_str"].split(" ")
        assert "".join(pieces) == w
        assert all(len(p) == 1 or p in products for p in pieces), (w, pieces)
        assert pieces == _independent_apply(w, merges), (w, pieces)
        assert pieces == apply_bpe(w, {p: i for i, p in enumerate(merges)})
        assert row["n_pieces"] == len(pieces)
        assert row["corpus_pieces"] == len(pieces) * wf[w]
    # compression: total corpus pieces strictly below character-level cost
    total_chars = sum(len(w) * f for w, f in wf.items())
    assert sum(r["corpus_pieces"] for r in out.values()) < total_chars


def test_bpe_vocab_cap_bounds_driver_collect(spark, tmp_path, monkeypatch):
    """Adversarially wide vocabulary (|vocab| >> BPE_VOCAB_CAP): training
    must only ever see the top-K words by frequency — the driver transfer
    is O(K) under any corpus — while APPLY still covers every distinct
    word (that stage is fully distributed). With the cap forced below the
    vocab size, the learned merges must equal training on exactly the
    top-K subset, deterministically."""
    from wx20222_bigdata_spark.operators import tokenize as tk

    # 5000 distinct junk words, each once; 50 hot words dominating.
    hot = [f"ab{c}" for c in "cdefghijklmnopqrstuvwxyz"[:10]]
    docs = [(" ".join(hot) + " ") * 5] * 20 + [
        " ".join(f"junkword{i:05d}" for i in range(j * 50, (j + 1) * 50))
        for j in range(100)
    ]
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": "en",
            "source": "synth",
            "n_chars": [len(d) for d in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    monkeypatch.setattr(tk, "BPE_VOCAB_CAP", 60)

    from wx20222_bigdata_spark.catalog import load_table

    wf_df = tk.corpus_word_freq(
        load_table(spark, str(tmp_path), "documents"), whitespace=True
    )
    out = {r["w"]: r for r in tk.bpe_train_apply(spark, wf_df).collect()}
    # apply stage is distributed: ALL distinct words come back, not top-K
    assert len(out) == 10 + 5000
    # merges must equal training on the exact top-60-by-(freq desc, w asc)
    wf = Counter()
    for d in docs:
        wf.update(w for w in d.lower().split(" ") if w)
    top = dict(sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:60])
    merges = train_bpe(top, N_MERGES)
    products = {a + b for a, b in merges}
    for w, row in out.items():
        pieces = row["pieces_str"].split(" ")
        assert "".join(pieces) == w
        assert all(len(p) == 1 or p in products for p in pieces)
    # hot words compress under the capped trainer; junk words must not
    # have influenced the merge table (their pairs are all cold)
    assert all(out[w]["n_pieces"] < len(w) for w in hot)


# ---------------------------------------------------------------------------
# Property-based laws for the pinned-table encode path (round 7): for ANY
# word and ANY merge table, apply_bpe (the spec used by the e27 seats' Spark
# kernel and mirrored by the recursive-CTE oracle) must reconstruct, derive
# every multi-char piece from the table, and agree with the independent
# recursive encoder.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_alpha = st.text(alphabet="abcd", min_size=0, max_size=12)


@st.composite
def _merge_tables(draw):
    n = draw(st.integers(min_value=0, max_value=8))
    merges, symbols = [], ["a", "b", "c", "d"]
    for _ in range(n):
        a = draw(st.sampled_from(symbols))
        b = draw(st.sampled_from(symbols))
        if (a, b) not in merges:
            merges.append((a, b))
            symbols.append(a + b)
    return merges


@given(word=_alpha, merges=_merge_tables())
@settings(max_examples=200, deadline=None)
def test_bpe_apply_properties(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    pieces = apply_bpe(word, ranks)
    assert "".join(pieces) == word
    products = {a + b for a, b in merges}
    assert all(len(p) == 1 or p in products for p in pieces)
    assert pieces == _independent_apply(word, merges)
    # fixpoint: no adjacent pair of the result is still mergeable
    assert all((x, y) not in ranks for x, y in zip(pieces, pieces[1:]))
