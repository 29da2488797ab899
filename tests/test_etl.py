"""Reference-parity tests for the signature ETL (SURVEY.md §3.1 step 2):
ocr flatten + budget cascade + tokenize + pad/mask on A1-shaped fixtures.

Mirrors the semantics of /root/reference/src/data_helper.py:27-86 without
porting its code: a pure-Python reimplementation of the cascade serves as
the executable spec, and the Spark DAG must match it row for row.
"""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from tests.test_sources import FIXTURE_ANNS

BUDGET = 16
VOCAB = 30522


def py_head_tail(toks: list[str], cap: int) -> list[str]:
    if len(toks) <= cap:
        return toks
    if cap <= 0:
        return []
    head = math.ceil(cap / 2)
    tail = cap - head
    return toks[:head] + (toks[-tail:] if tail else [])


def py_cascade(title: str, asr: str, ocr_flat: str, budget: int):
    t = [x for x in title.split(" ") if x]
    a = [x for x in asr.split(" ") if x]
    o = [x for x in ocr_flat.split(" ") if x]
    cap_t = min(len(t), budget)
    cap_a = min(len(a), budget - cap_t)
    cap_o = min(len(o), budget - cap_t - cap_a)
    return py_head_tail(t, cap_t) + py_head_tail(a, cap_a) + py_head_tail(o, cap_o)


def py_char_hash(tok: str, mod: int) -> int:
    h = 0
    for ch in tok:
        h = (h * 31 + ord(ch)) % mod
    return h


@pytest.fixture(scope="module")
def anns_df(spark, tmp_path_factory):
    from wx20222_bigdata_spark.sources import read_annotations_json

    p = tmp_path_factory.mktemp("etl") / "anns.json"
    p.write_text(json.dumps(FIXTURE_ANNS, ensure_ascii=False))
    return read_annotations_json(spark, str(p))


def test_prepare_text_features_matches_spec(anns_df):
    from wx20222_bigdata_spark.operators.etl import prepare_text_features

    out = prepare_text_features(anns_df, budget=BUDGET, vocab_mod=VOCAB)
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == len(FIXTURE_ANNS)
    for rec in FIXTURE_ANNS:
        ocr_flat = " ".join(o["text"] for o in rec["ocr"])
        expect_toks = py_cascade(rec["title"], rec["asr"], ocr_flat, BUDGET)
        expect_ids = [py_char_hash(t, VOCAB) for t in expect_toks]
        expect_ids += [0] * (BUDGET - len(expect_ids))
        expect_mask = [1] * len(expect_toks) + [0] * (BUDGET - len(expect_toks))
        got = rows[rec["id"]]
        assert got.n_tokens == len(expect_toks), rec["id"]
        assert list(got.input_ids) == expect_ids, rec["id"]
        assert list(got.attention_mask) == expect_mask, rec["id"]


def test_budget_invariant(anns_df):
    from wx20222_bigdata_spark.operators.etl import prepare_text_features

    out = prepare_text_features(anns_df, budget=BUDGET, vocab_mod=VOCAB)
    bad = out.filter(
        (F.size("input_ids") != BUDGET)
        | (F.size("attention_mask") != BUDGET)
        | (F.col("n_tokens") > BUDGET)
    )
    assert bad.count() == 0
