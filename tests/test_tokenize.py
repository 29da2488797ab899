"""F7 vocab-broadcast tokenizer: Spark output vs the pure-Python spec,
vocab-file loading, and the encode contract's edge shapes
(SURVEY.md §2.8 F7; reference ``data_helper.py:55-57,94``)."""

import pandas as pd
import pytest

from wx20222_bigdata_spark.operators.tokenize import (
    CLS_ID,
    MAX_LEN,
    PAD_ID,
    SEP_ID,
    SPECIAL_TOKENS,
    UNK_ID,
    VOCAB_WORDS,
    encode_py,
    load_vocab,
    tokenize_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def test_encode_py_contract():
    vocab = load_vocab()
    # short text: pad path
    ids, mask, n_unk = encode_py("key agg zzz", vocab, MAX_LEN)
    assert len(ids) == MAX_LEN and len(mask) == MAX_LEN
    assert ids[0] == CLS_ID and ids[4] == SEP_ID
    assert ids[1] == vocab["key"] and ids[2] == vocab["agg"] and ids[3] == UNK_ID
    assert ids[5:] == [PAD_ID] * (MAX_LEN - 5)
    assert mask == [1] * 5 + [0] * (MAX_LEN - 5)
    assert n_unk == 1
    # long text: truncation path keeps first max_len-2 tokens
    long = " ".join(["key"] * 100)
    ids, mask, n_unk = encode_py(long, vocab, MAX_LEN)
    assert len(ids) == MAX_LEN
    assert ids[-1] == SEP_ID and PAD_ID not in ids[1:-1]
    assert mask == [1] * MAX_LEN and n_unk == 0
    # empty text: CLS+SEP only
    ids, mask, n_unk = encode_py("", vocab, MAX_LEN)
    assert ids[:2] == [CLS_ID, SEP_ID] and sum(mask) == 2 and n_unk == 0


def test_load_vocab_from_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(SPECIAL_TOKENS + ["alpha", "beta"]) + "\n")
    v = load_vocab(str(p))
    assert v["[PAD]"] == 0 and v["[UNK]"] == 1
    assert v["alpha"] == 4 and v["beta"] == 5
    # default vocab: specials first, line number = id
    d = load_vocab()
    assert d["[CLS]"] == CLS_ID and d[VOCAB_WORDS[0]] == 4
    assert len(d) == len(SPECIAL_TOKENS) + len(VOCAB_WORDS)


def test_spark_matches_python_spec(spark):
    """Every row of the Spark broadcast-tokenize output equals the
    pure-Python reimplementation applied to the same text."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    vocab = load_vocab()
    got = (
        tokenize_documents(docs, vocab, MAX_LEN)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    src = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(src) and len(got) > 0
    for i in range(len(src)):
        ids, mask, n_unk = encode_py(src["text"][i], vocab, MAX_LEN)
        assert list(got["input_ids"][i]) == ids, f"row {i} ids"
        assert list(got["attention_mask"][i]) == mask, f"row {i} mask"
        assert int(got["n_unk"][i]) == n_unk, f"row {i} n_unk"


def test_wordpiece_spec_contract():
    """wordpiece_encode_py on hand-checked fixtures: greedy longest match,
    ## continuation, whole-word UNK fallback, CJK char isolation, long-word
    cap, punctuation isolation, truncation + framing."""
    from wx20222_bigdata_spark.operators.tokenize import (
        WP_MAX_WORD,
        load_wordpiece_vocab,
        wordpiece_encode_py,
        wordpiece_pretokenize,
        wordpiece_word_ids,
    )

    v = load_wordpiece_vocab()
    # basic tokenizer: lowercase, punctuation isolated, CJK chars isolated
    assert wordpiece_pretokenize("Big-Data, 大数据!") == [
        "big", "-", "data", ",", "大", "数", "据", "!",
    ]
    # greedy longest match prefers 'data' over 'd','##a','##t','##a'
    assert wordpiece_word_ids("data", v) == [v["data"]]
    # continuation pieces: datas -> data + ##s
    assert wordpiece_word_ids("datas", v) == [v["data"], v["##s"]]
    # longest-match at continuation position: streaming -> stream + ##ing
    assert wordpiece_word_ids("streaming", v) == [v["stream"], v["##ing"]]
    # no start piece for 'q...' beyond 'query' forms -> whole-word fail
    assert wordpiece_word_ids("zebra", v) is None  # no 'z' start piece
    assert wordpiece_word_ids("dab", v) is None  # no ##b continuation
    # long-word cap
    assert wordpiece_word_ids("a" * (WP_MAX_WORD + 1), v) is None
    # full encode: framing, UNK accounting, truncation
    ids, mask, n_unk = wordpiece_encode_py("datas zebra 大", v, MAX_LEN)
    body = [v["data"], v["##s"], UNK_ID, v["大"]]
    assert ids[: len(body) + 2] == [CLS_ID] + body + [SEP_ID]
    assert n_unk == 1 and sum(mask) == len(body) + 2
    long_ids, long_mask, _ = wordpiece_encode_py(
        " ".join(["data"] * 100), v, MAX_LEN
    )
    assert len(long_ids) == MAX_LEN and sum(long_mask) == MAX_LEN


def test_wordpiece_spark_matches_python_spec(spark):
    """f7c parity on MIXED CJK/latin fixtures (the reference's corpus
    shape — Chinese titles with embedded latin/digits) plus the real
    sf0.001 table: every Spark row equals the pure-Python spec."""
    from wx20222_bigdata_spark.operators.tokenize import (
        load_wordpiece_vocab,
        wordpiece_encode_py,
        wordpiece_tokenize_udf,
    )
    from pyspark.sql import functions as F

    vocab = load_wordpiece_vocab()
    fixtures = [
        (0, "Spark joins the data stream"),
        (1, "大数据 query: batched re-ordering"),
        (2, "数据大 streaming merger, overfilters"),
        (3, ""),
        (4, "zzz qqq 999"),
        (5, "preordered parts 大大大 un-merged"),
        (6, "x" * 40),
    ]
    real = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    )
    rows = fixtures + [(1000 + r["doc_id"], r["text"]) for r in real]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bc = spark.sparkContext.broadcast(vocab)
    enc = wordpiece_tokenize_udf(bc, MAX_LEN)
    got = (
        df.select("doc_id", enc("text").alias("e"))
        .select("doc_id", "e.input_ids", "e.attention_mask", "e.n_unk")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = {i: wordpiece_encode_py(t, vocab, MAX_LEN) for i, t in rows}
    for i in range(len(got)):
        ids, mask, n_unk = want[int(got["doc_id"][i])]
        assert list(got["input_ids"][i]) == ids, f"row {got['doc_id'][i]}"
        assert list(got["attention_mask"][i]) == mask
        assert int(got["n_unk"][i]) == n_unk


def test_unk_path_hit_on_real_data(spark):
    """The held-out words (customer/dup/...) must actually produce UNKs on
    the driver corpus — otherwise the OOV branch is untested in prod."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = tokenize_documents(docs, load_vocab(), MAX_LEN)
    total_unk = out.agg({"n_unk": "sum"}).collect()[0][0]
    assert total_unk > 0
