"""CJK / no-whitespace mode (r3 verdict item 4): the reference corpus is
Chinese titles/asr/ocr with NO word boundaries (``data_helper.py:55``
chinese-roberta — a char-level tokenizer). Every whitespace-split operator
degenerates on such text, so f7/e2b/e4b/e27 grew a ``whitespace=False``
path. These tests drive those paths on genuinely no-space CJK fixture
strings — the shape the sf* testdata never exercises.
"""

from __future__ import annotations

from pyspark.sql import functions as F


CJK_A = "深度学习模型需要大规模高质量训练数据"          # base doc
CJK_A_NEAR = "深度学习模型需要大规模高质量训练数据集"    # near-dup (one char appended)
CJK_B = "分布式计算引擎按列剪枝并下推谓词"              # unrelated doc
CJK_A_SPACED = "深度 学习 模型 需要 大规模 高质量 训练 数据"  # re-spaced copy of A


def test_encode_py_char_mode_is_per_character():
    from wx20222_bigdata_spark.operators.tokenize import (
        CLS_ID,
        SEP_ID,
        UNK_ID,
        encode_py,
        load_char_vocab,
    )

    vocab = load_char_vocab()
    ids, mask, n_unk = encode_py(CJK_A, vocab, max_len=32, whitespace=False)
    # one token per character: 18 chars + CLS + SEP real positions
    assert sum(mask) == len(CJK_A) + 2
    assert ids[0] == CLS_ID and ids[sum(mask) - 1] == SEP_ID
    # no CJK chars in the stand-in vocab → every body token is UNK
    assert n_unk == len(CJK_A)
    assert all(i == UNK_ID for i in ids[1 : sum(mask) - 1])
    # whitespace mode on the same string sees ONE giant token — the
    # degeneration the char mode exists to fix
    _, mask_ws, _ = encode_py(CJK_A, vocab, max_len=32, whitespace=True)
    assert sum(mask_ws) == 1 + 2


def test_tokenize_documents_char_mode_on_cjk(spark):
    from wx20222_bigdata_spark.operators.tokenize import (
        load_char_vocab,
        tokenize_documents,
    )

    docs = spark.createDataFrame(
        [(1, CJK_A), (2, "data" + CJK_B)], "doc_id bigint, text string"
    )
    out = tokenize_documents(
        docs, load_char_vocab(), max_len=32, whitespace=False
    ).orderBy("doc_id").collect()
    assert sum(out[0]["attention_mask"]) == len(CJK_A) + 2
    # doc 2: latin chars d/a/t/a ARE in the char vocab, CJK chars are UNK
    assert out[1]["n_unk"] == len(CJK_B)
    vocab = load_char_vocab()
    assert out[1]["input_ids"][1] == vocab["d"]
    assert out[1]["input_ids"][2] == vocab["a"]


def test_char_shingle_lsh_recovers_cjk_near_dup(spark):
    """Char-shingle band keys must collide for the near-dup CJK pair and
    NOT for the unrelated doc — on no-space text where word shingles
    cannot discriminate at all (one shingle per doc)."""
    from wx20222_bigdata_spark.operators.dedup import minhash_band_keys

    corpus = spark.createDataFrame(
        [(1, CJK_A), (2, CJK_A_NEAR), (3, CJK_B)], "doc_id bigint, text string"
    )
    bands = minhash_band_keys(corpus, whitespace=False)
    a = bands.select("doc_id", "band", "bucket_key")
    pairs = (
        a.alias("x")
        .join(
            a.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket_key") == F.col("y.bucket_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("ia"), F.col("y.doc_id").alias("ib"))
        .distinct()
        .collect()
    )
    got = {(r["ia"], r["ib"]) for r in pairs}
    assert (1, 2) in got          # near-dup recovered
    assert (1, 3) not in got and (2, 3) not in got  # unrelated stays apart


def test_e34_catches_respaced_copy(spark):
    from wx20222_bigdata_spark.operators.dedup import e34_nospace_exact_dedup  # noqa: F401

    docs = spark.createDataFrame(
        [(1, CJK_A), (2, CJK_A_SPACED), (3, CJK_B)], "doc_id bigint, text string"
    )
    keyed = docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", "")).alias("k"),
    )
    groups = keyed.groupBy("k").agg(
        F.min("doc_id").alias("keep"), F.count("*").alias("n")
    ).collect()
    by_n = sorted((r["n"], r["keep"]) for r in groups)
    assert by_n == [(1, 3), (2, 1)]  # A and its re-spaced copy collapse


def test_bpe_char_mode_reconstruction_law(spark):
    """e27b law: concat(pieces) == the segment, for every distinct
    fixed-width chunk of no-space text — and the chunks reassemble the
    stripped corpus text."""
    from wx20222_bigdata_spark.operators.tokenize import (
        BPE_CHAR_CHUNK,
        bpe_train_apply,
        corpus_word_freq,
    )

    docs = spark.createDataFrame(
        [(1, CJK_A * 3), (2, CJK_B * 2), (3, CJK_A_NEAR)],
        "doc_id bigint, text string",
    )
    wf = corpus_word_freq(docs, whitespace=False)
    rows = wf.collect()
    assert all(1 <= len(r["w"]) <= BPE_CHAR_CHUNK for r in rows)
    out = bpe_train_apply(spark, wf).collect()
    for r in out:
        assert "".join(r["pieces_str"].split(" ")) == r["w"]
        assert r["corpus_pieces"] == r["n_pieces"] * r["freq"]
