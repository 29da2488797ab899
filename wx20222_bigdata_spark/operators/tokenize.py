"""Vocab-file broadcast tokenizer (SURVEY.md §2.8 F7 — the real-vocab seat).

The reference tokenizes with a pretrained vocabulary loaded once and shared
by every worker (``data_helper.py:55-57`` builds the tokenizer,
``data_helper.py:94`` encodes with truncation + padding + attention mask).
The Spark-first equivalent:

- the vocab is a plain token→id dict loaded from a one-token-per-line file
  (:func:`load_vocab`; a built-in word list stands in for the pretrained
  vocab file, which is not shippable here);
- the dict is **broadcast** once per job — every executor gets one copy,
  not one per task (the 100 TB shape: a 50k-entry vocab is ~2 MB, far
  under the broadcast threshold);
- encoding runs in an Arrow-batched ``pandas_udf`` (X1 path) whose kernel
  is a self-contained closure over the broadcast handle — no module-level
  references, so the driver can import this from any cwd;
- semantics mirror ``encode_plus(truncation=True, padding='max_length')``:
  ``[CLS] + ids[:max_len-2] + [SEP] + [PAD]…``, attention mask 1 on real
  positions, unknown tokens → ``[UNK]``.

The hash tokenizer (``inference.py``) remains the oracle-checkable twin for
arbitrary open vocabularies; this seat is the *closed-vocab* form, and its
oracle is an exact DuckDB ``MAP`` literal lookup generated from the same
vocab, so the id sequences are compared end to end.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from wx20222_bigdata_spark.catalog import load_table
from wx20222_bigdata_spark.registry import query

PAD_ID, UNK_ID, CLS_ID, SEP_ID = 0, 1, 2, 3
SPECIAL_TOKENS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]

#: Stand-in for the pretrained vocab file (one token per line, id = line
#: number). Deliberately NOT the full corpus vocabulary — `customer`,
#: `dup`, `small`, `stream`, `vector` are absent so the [UNK] path is
#: exercised on real data at every sf.
VOCAB_WORDS = [
    "a", "agg", "batch", "big", "column", "data", "fast", "filter",
    "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "sort", "spark", "table", "the",
    "value", "window",
]

MAX_LEN = 32  #: fixed encode length (reference: 256, config.py:53)

#: Char-mode vocab stand-in (the CJK seat — the reference corpus is Chinese
#: titles/asr/ocr with NO whitespace, tokenized by a char-level pretrained
#: model, ``data_helper.py:55``). Deliberately missing letters/digits so the
#: [UNK] path is exercised; on real CJK data this would be the vocab.txt
#: character inventory.
VOCAB_CHARS = list("etaoinsrhldcumwfg")


def load_vocab(path: str | None = None) -> dict[str, int]:
    """token → id from a one-token-per-line vocab file; built-in default.

    Line number IS the id (the standard WordPiece vocab.txt layout). The
    first four lines must be the special tokens."""
    if path is None:
        lines = SPECIAL_TOKENS + VOCAB_WORDS
    else:
        with open(path, encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
    return {tok: i for i, tok in enumerate(lines)}


def load_char_vocab() -> dict[str, int]:
    """Char-mode (whitespace=False) vocab: one id per character."""
    return {tok: i for i, tok in enumerate(SPECIAL_TOKENS + VOCAB_CHARS)}


def _pretokenize(text: str, whitespace: bool) -> list[str]:
    """The single split rule shared by every encode path: whitespace mode
    splits on ' '; char mode (CJK / no-whitespace scripts) emits one token
    per non-space character — the chinese-roberta contract, where the
    vocabulary is (mostly) the character inventory."""
    if whitespace:
        return [t for t in (text or "").split(" ") if t]
    return [c for c in (text or "") if c != " "]


def encode_py(
    text: str, vocab: dict[str, int], max_len: int, whitespace: bool = True
) -> tuple[list[int], list[int], int]:
    """Pure-Python encode spec (the testable single-row contract):
    returns (input_ids, attention_mask, n_unk)."""
    toks = _pretokenize(text, whitespace)
    body = [vocab.get(t, UNK_ID) for t in toks[: max_len - 2]]
    pad_n = max_len - 2 - len(body)
    input_ids = [CLS_ID] + body + [SEP_ID] + [PAD_ID] * pad_n
    attention_mask = [1] * (len(body) + 2) + [0] * pad_n
    return input_ids, attention_mask, sum(1 for i in body if i == UNK_ID)


def vocab_tokenize_udf(vocab_bc, max_len: int, whitespace: bool = True):
    """Arrow-batched encoder over a broadcast vocab. Built lazily (DDL
    parsing needs a session); the kernel closes over only the broadcast
    handle and plain scalars — cloudpickle ships it by value."""
    pad_id, unk_id, cls_id, sep_id = PAD_ID, UNK_ID, CLS_ID, SEP_ID
    ws = whitespace

    @pandas_udf("input_ids array<int>, attention_mask array<int>, n_unk int")
    def _encode(text: pd.Series) -> pd.DataFrame:
        vocab = vocab_bc.value

        def enc(s):
            if ws:
                toks = [t for t in (s or "").split(" ") if t]
            else:
                toks = [c for c in (s or "") if c != " "]
            body = [vocab.get(t, unk_id) for t in toks[: max_len - 2]]
            pad_n = max_len - 2 - len(body)
            return (
                [cls_id] + body + [sep_id] + [pad_id] * pad_n,
                [1] * (len(body) + 2) + [0] * pad_n,
                sum(1 for i in body if i == unk_id),
            )

        encoded = text.map(enc)
        return pd.DataFrame(
            {
                "input_ids": encoded.map(lambda t: t[0]),
                "attention_mask": encoded.map(lambda t: t[1]),
                "n_unk": encoded.map(lambda t: t[2]).astype("int32"),
            }
        )

    return _encode


def tokenize_documents(
    docs: DataFrame,
    vocab: dict[str, int],
    max_len: int = MAX_LEN,
    whitespace: bool = True,
) -> DataFrame:
    """F7: (doc_id, text) → (doc_id, input_ids, attention_mask, n_unk).

    ``whitespace=False`` selects the char-level pretokenizer (one token
    per non-space character) — the CJK/no-whitespace path matching the
    reference's char-level Chinese tokenizer (``data_helper.py:55``)."""
    bc = docs.sparkSession.sparkContext.broadcast(vocab)
    enc = vocab_tokenize_udf(bc, max_len, whitespace=whitespace)
    return docs.select("doc_id", enc("text").alias("enc")).select(
        "doc_id",
        F.col("enc.input_ids").alias("input_ids"),
        F.col("enc.attention_mask").alias("attention_mask"),
        F.col("enc.n_unk").alias("n_unk"),
    )


def _map_literal(vocab: dict[str, int] | None = None) -> str:
    if vocab is None:
        vocab = load_vocab()
    entries = ", ".join(f"'{tok}': {i}" for tok, i in vocab.items())
    return "MAP {" + entries + "}"


_BODY_CAP = MAX_LEN - 2

_F7_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
enc AS (
  SELECT doc_id,
         list_transform(list_slice(t, 1, {_BODY_CAP}),
                        x -> COALESCE(map_extract({_map_literal()}, x)[1], {UNK_ID})) AS body
  FROM toks
)
SELECT doc_id,
       array_to_string(
         list_concat(list_concat(list_concat([{CLS_ID}], body), [{SEP_ID}]),
                     [{PAD_ID} for i in range(greatest(0, {_BODY_CAP} - len(body)))]),
         ' ') AS input_ids_str,
       CAST(len(body) + 2 AS BIGINT) AS n_real,
       CAST(len(list_filter(body, x -> x = {UNK_ID})) AS BIGINT) AS n_unk
FROM enc
"""


@query("f7_vocab_tokenize", oracle=_F7_ORACLE)
def f7_vocab_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 real-vocab tokenizer (``data_helper.py:55-57,94``): broadcast
    closed-vocab encode with CLS/SEP/PAD + attention mask. Output reduces
    the arrays to a space-joined id string + mask sum (full-fidelity, and
    scalar-only like every oracle-checked query)."""
    docs = load_table(spark, sf_dir, "documents")
    out = tokenize_documents(docs, load_vocab(), MAX_LEN)
    return out.select(
        "doc_id",
        F.concat_ws(" ", F.col("input_ids")).alias("input_ids_str"),
        F.aggregate("attention_mask", F.lit(0), lambda a, x: a + x)
        .cast("bigint")
        .alias("n_real"),
        F.col("n_unk").cast("bigint").alias("n_unk"),
    )


def _f7b_oracle() -> str:
    char_map = _map_literal(load_char_vocab())
    return f"""
WITH chars AS (
  SELECT doc_id,
         list_filter(list_transform(range(1, length(text) + 1),
                                    i -> text[i]),
                     c -> c <> ' ') AS t
  FROM documents
),
enc AS (
  SELECT doc_id,
         list_transform(list_slice(t, 1, {_BODY_CAP}),
                        x -> COALESCE(map_extract({char_map}, x)[1], {UNK_ID})) AS body
  FROM chars
)
SELECT doc_id,
       array_to_string(
         list_concat(list_concat(list_concat([{CLS_ID}], body), [{SEP_ID}]),
                     [{PAD_ID} for i in range(greatest(0, {_BODY_CAP} - len(body)))]),
         ' ') AS input_ids_str,
       CAST(len(body) + 2 AS BIGINT) AS n_real,
       CAST(len(list_filter(body, x -> x = {UNK_ID})) AS BIGINT) AS n_unk
FROM enc
"""


@query("f7b_char_tokenize", oracle=_f7b_oracle())
def f7b_char_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 char-mode (``whitespace=False``) tokenizer — the CJK seat: the
    reference corpus is Chinese titles/asr/ocr with NO word boundaries,
    encoded by a char-level pretrained vocab (``data_helper.py:55``
    chinese-roberta). Word-splitting degenerates there (one token per
    document); this path emits one token per non-space character against
    a character vocab, same CLS/SEP/PAD + attention-mask framing as f7.
    The oracle mirrors the per-char lookup with a DuckDB MAP literal, so
    id sequences compare end to end."""
    docs = load_table(spark, sf_dir, "documents")
    out = tokenize_documents(docs, load_char_vocab(), MAX_LEN, whitespace=False)
    return out.select(
        "doc_id",
        F.concat_ws(" ", F.col("input_ids")).alias("input_ids_str"),
        F.aggregate("attention_mask", F.lit(0), lambda a, x: a + x)
        .cast("bigint")
        .alias("n_real"),
        F.col("n_unk").cast("bigint").alias("n_unk"),
    )


# --------------------------------------------------------------------------
# F7c — WordPiece (##-continuation greedy longest-match), the reference's
# actual tokenizer algorithm (chinese-roberta via data_helper.py:55-57,94).
# --------------------------------------------------------------------------

#: Stand-in WordPiece vocab (vocab.txt layout: specials first, then pieces;
#: id = line number). Deliberately NOT closed over the corpus alphabet —
#: j/k/q/x/z have no start piece and b/f/v/w/y no ##-continuation, digits
#: have none at all — so the whole-word [UNK] fallback (HF semantics: ANY
#: unmatchable position fails the WHOLE word) is exercised on real data.
WP_PIECES = [
    # whole words / stems
    "the", "a", "an", "and", "of", "to", "in",
    "data", "spark", "query", "table", "row", "join", "group",
    "filter", "order", "part", "merge", "batch", "stream",
    # word-start prefixes
    "un", "re", "pre", "over",
    # start single chars
    *list("abcdefghilmnoprstuvwy"),
    # continuation pieces
    "##ing", "##ed", "##er", "##ion", "##able", "##ment", "##s",
    # continuation single chars
    *[f"##{c}" for c in "acdeghilmnoprstu"],
    # punctuation + CJK chars (the basic tokenizer isolates each)
    ".", ",", "-", "数", "据", "大",
]

#: HF max_input_chars_per_word (100 in BERT); 16 here so the recursive
#: oracle's depth is bounded and the long-word → [UNK] path has coverage.
WP_MAX_WORD = 16


def load_wordpiece_vocab() -> dict[str, int]:
    """piece → id, vocab.txt layout (specials first, line number = id)."""
    return {tok: i for i, tok in enumerate(SPECIAL_TOKENS + WP_PIECES)}


def wordpiece_pretokenize(text: str) -> list[str]:
    """BERT BasicTokenizer contract (lowercase mode): lowercase, then
    isolate every non-[a-z0-9] character as its own token — which both
    splits punctuation AND spaces out each CJK char (chinese-roberta's
    per-character behavior falls out of this single rule)."""
    import re

    pre = re.sub(r"([^a-z0-9 ])", r" \1 ", (text or "").lower())
    return [t for t in pre.split(" ") if t]


def wordpiece_word_ids(w: str, vocab: dict[str, int]) -> list[int] | None:
    """Greedy longest-match WordPiece encode of ONE word: at each position
    take the longest vocab piece (``##``-prefixed past position 0); if any
    position has no match — or the word exceeds WP_MAX_WORD chars — the
    WHOLE word is unencodable (``None`` → caller emits [UNK]). This is
    HF WordpieceTokenizer.tokenize verbatim semantics."""
    if len(w) > WP_MAX_WORD:
        return None
    ids, pos = [], 0
    while pos < len(w):
        end, match = len(w), None
        while end > pos:
            key = w[pos:end] if pos == 0 else "##" + w[pos:end]
            if key in vocab:
                match = (vocab[key], end)
                break
            end -= 1
        if match is None:
            return None
        ids.append(match[0])
        pos = match[1]
    return ids


def wordpiece_encode_py(
    text: str, vocab: dict[str, int], max_len: int = MAX_LEN
) -> tuple[list[int], list[int], int]:
    """Pure-Python WordPiece encode spec (single-row contract, the parity
    target for both the Spark kernel and the DuckDB oracle): basic
    tokenize → per-word greedy pieces → truncate to max_len-2 pieces →
    CLS/SEP/PAD + attention mask. Returns (input_ids, mask, n_unk)."""
    body: list[int] = []
    for w in wordpiece_pretokenize(text):
        ids = wordpiece_word_ids(w, vocab)
        body.extend([UNK_ID] if ids is None else ids)
    body = body[: max_len - 2]
    pad_n = max_len - 2 - len(body)
    input_ids = [CLS_ID] + body + [SEP_ID] + [PAD_ID] * pad_n
    attention_mask = [1] * (len(body) + 2) + [0] * pad_n
    return input_ids, attention_mask, sum(1 for i in body if i == UNK_ID)


def wordpiece_tokenize_udf(vocab_bc, max_len: int):
    """Arrow-batched WordPiece encoder over a broadcast vocab. The kernel
    is a self-contained closure (broadcast handle + scalars only) so the
    driver can import this module from any cwd."""
    pad_id, unk_id, cls_id, sep_id = PAD_ID, UNK_ID, CLS_ID, SEP_ID
    max_word = WP_MAX_WORD

    @pandas_udf("input_ids array<int>, attention_mask array<int>, n_unk int")
    def _encode(text: pd.Series) -> pd.DataFrame:
        import re

        vocab = vocab_bc.value

        def word_ids(w):
            if len(w) > max_word:
                return None
            ids, pos = [], 0
            while pos < len(w):
                end, match = len(w), None
                while end > pos:
                    key = w[pos:end] if pos == 0 else "##" + w[pos:end]
                    if key in vocab:
                        match = (vocab[key], end)
                        break
                    end -= 1
                if match is None:
                    return None
                ids.append(match[0])
                pos = match[1]
            return ids

        def enc(s):
            pre = re.sub(r"([^a-z0-9 ])", r" \1 ", (s or "").lower())
            body = []
            for w in (t for t in pre.split(" ") if t):
                ids = word_ids(w)
                body.extend([unk_id] if ids is None else ids)
            body = body[: max_len - 2]
            pad_n = max_len - 2 - len(body)
            return (
                [cls_id] + body + [sep_id] + [pad_id] * pad_n,
                [1] * (len(body) + 2) + [0] * pad_n,
                sum(1 for i in body if i == unk_id),
            )

        encoded = text.map(enc)
        return pd.DataFrame(
            {
                "input_ids": encoded.map(lambda t: t[0]),
                "attention_mask": encoded.map(lambda t: t[1]),
                "n_unk": encoded.map(lambda t: t[2]).astype("int32"),
            }
        )

    return _encode


def _wp_case_exprs(vocab: dict[str, int]) -> tuple[str, str]:
    """Generate the (best-id, best-length) CASE chains for the oracle:
    the vocab is a compile-time literal, so greedy longest-match at
    (word, pos) is just a WHEN chain ordered by piece length DESC —
    start pieces when pos = 1, stripped ##-pieces otherwise."""
    starts = sorted(
        (
            (t, i)
            for t, i in vocab.items()
            if not t.startswith("##") and t not in SPECIAL_TOKENS
        ),
        key=lambda kv: (-len(kv[0]), kv[0]),
    )
    conts = sorted(
        ((t[2:], i) for t, i in vocab.items() if t.startswith("##")),
        key=lambda kv: (-len(kv[0]), kv[0]),
    )

    def chain(entries, out):
        whens = " ".join(
            f"WHEN substring(w, pos, {len(p)}) = '{p}' "
            f"THEN {i if out == 'id' else len(p)}"
            for p, i in entries
        )
        return f"CASE {whens} END"

    bid = (
        f"(CASE WHEN pos = 1 THEN {chain(starts, 'id')} "
        f"ELSE {chain(conts, 'id')} END)"
    )
    blen = (
        f"(CASE WHEN pos = 1 THEN {chain(starts, 'len')} "
        f"ELSE {chain(conts, 'len')} END)"
    )
    return bid, blen


def _f7c_oracle() -> str:
    """Recursive-CTE WordPiece oracle: greedy longest-match is a per-word
    fold, expressed as a DuckDB recursive CTE whose step advances each
    in-flight word by its best piece (the generated CASE chain); a word
    with no match at any position — or longer than WP_MAX_WORD — fails
    whole (wids → [UNK]). Terminal states (pos > length) are assembled
    per document in word order, truncated, and framed exactly like f7."""
    bid, blen = _wp_case_exprs(load_wordpiece_vocab())
    return f"""
WITH RECURSIVE pretok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text),
                     '([^a-z0-9 ])', ' \\1 ', 'g'), ' '),
                     x -> length(x) > 0) AS toks
  FROM documents
),
words AS (
  SELECT doc_id, i AS wpos, toks[i] AS w
  FROM pretok, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)
),
enc AS (
  SELECT doc_id, wpos, w,
         CASE WHEN length(w) > {WP_MAX_WORD} THEN length(w) + 1 ELSE 1 END AS pos,
         '' AS ids_str,
         length(w) > {WP_MAX_WORD} AS failed
  FROM words
  UNION ALL
  SELECT doc_id, wpos, w,
         CASE WHEN {bid} IS NULL THEN length(w) + 1 ELSE pos + {blen} END,
         CASE WHEN {bid} IS NULL THEN ids_str
              WHEN ids_str = '' THEN CAST({bid} AS VARCHAR)
              ELSE ids_str || ' ' || CAST({bid} AS VARCHAR) END,
         failed OR {bid} IS NULL
  FROM enc
  WHERE pos <= length(w) AND NOT failed
),
final AS (
  SELECT doc_id, wpos,
         CASE WHEN failed THEN '{UNK_ID}' ELSE ids_str END AS wids
  FROM enc WHERE pos > length(w)
),
perdoc AS (
  SELECT doc_id,
         list_slice(string_split(string_agg(wids, ' ' ORDER BY wpos), ' '),
                    1, {_BODY_CAP}) AS body
  FROM final GROUP BY doc_id
),
alldocs AS (
  SELECT d.doc_id, COALESCE(p.body, CAST([] AS VARCHAR[])) AS body
  FROM documents d LEFT JOIN perdoc p USING (doc_id)
)
SELECT doc_id,
       array_to_string(
         list_concat(list_concat(list_concat(['{CLS_ID}'], body), ['{SEP_ID}']),
                     ['{PAD_ID}' for i in range(greatest(0, {_BODY_CAP} - len(body)))]),
         ' ') AS input_ids_str,
       CAST(len(body) + 2 AS BIGINT) AS n_real,
       CAST(len(list_filter(body, x -> x = '{UNK_ID}')) AS BIGINT) AS n_unk
FROM alldocs
"""


@query("f7c_wordpiece", oracle=_f7c_oracle())
def f7c_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7c WordPiece — the reference's ACTUAL tokenizer algorithm
    (chinese-roberta WordPiece, ``data_helper.py:55-57,94``; r5 verdict's
    one named fidelity gap): BERT basic-tokenize (lowercase, punctuation
    + CJK chars isolated) then greedy longest-match subword encode with
    ``##`` continuations, whole-word [UNK] fallback, CLS/SEP/PAD framing.

    Spark shape is identical to f7 (broadcast vocab dict → Arrow-batched
    ``pandas_udf``, no shuffle); the oracle runs the same greedy fold as
    a recursive CTE over a compile-time CASE chain of the vocab, so id
    sequences are compared end-to-end across engines."""
    docs = load_table(spark, sf_dir, "documents")
    bc = spark.sparkContext.broadcast(load_wordpiece_vocab())
    enc = wordpiece_tokenize_udf(bc, MAX_LEN)
    out = docs.select("doc_id", enc("text").alias("enc")).select(
        "doc_id",
        F.col("enc.input_ids").alias("input_ids"),
        F.col("enc.attention_mask").alias("attention_mask"),
        F.col("enc.n_unk").alias("n_unk"),
    )
    return out.select(
        "doc_id",
        F.concat_ws(" ", F.col("input_ids")).alias("input_ids_str"),
        F.aggregate("attention_mask", F.lit(0), lambda a, x: a + x)
        .cast("bigint")
        .alias("n_real"),
        F.col("n_unk").cast("bigint").alias("n_unk"),
    )


BPE_TOP_K = 20  #: merge candidates reported per BPE iteration


@query(
    "e21_bpe_pair_counts",
    oracle=f"""
WITH words AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '),
                            x -> length(x) > 0)) AS w
  FROM documents
),
wf AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
pairs AS (
  SELECT substring(w, i, 2) AS pair, freq
  FROM wf, LATERAL (SELECT unnest(range(1, length(w))) AS i)
  WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT {BPE_TOP_K}
""",
)
def e21_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21 BPE merge statistics — ONE iteration of byte-pair-encoding
    tokenizer training (Sennrich et al. 2016) as a declarative plan: the
    corpus's word-frequency table weights every adjacent character pair,
    and the top pair IS the next merge rule. The reference consumes a
    pretrained vocab (``data_helper.py:55-57``); this is the operator
    that BUILDS one, and iterating it (re-segment with the merged symbol,
    recount) is a driver loop over this exact plan — the iterative.py
    persist/checkpoint discipline applies unchanged.

    Scale shape: pair counting runs over the DISTINCT-WORD table, not
    the corpus (wf aggregation collapses 100 TB of text to |vocab| rows
    first — the classic BPE-training trick), pair explosion is narrow
    over that bounded table, and the top-k is TakeOrderedAndProject.
    All-integer, bit-exact."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> length(x) > 0)")
        ).alias("w")
    )
    wf = words.groupBy("w").agg(F.count("*").alias("freq"))
    pairs = wf.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(BPE_TOP_K)
    )


N_MERGES = 12  #: BPE merge rules learned by e27 (reference vocab: 21128 entries)

#: Hard cap on the distinct-word table collected for BPE training. Heaps'
#: law says |vocab| grows ~O(corpus^0.5) — unbounded at 100 TB (10^8+ rows,
#: driver OOM). Production BPE trainers train on the TOP-K words by
#: frequency (the tail contributes negligible pair mass); the cap keeps
#: the driver working set O(K) regardless of corpus size. The *apply*
#: stage stays fully distributed over the complete word table.
BPE_VOCAB_CAP = 50_000


def train_bpe(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Standard BPE training (Sennrich et al. 2016, alg. 1): repeatedly
    merge the most frequent adjacent symbol pair in the frequency-weighted
    vocabulary. Ties break lexicographically — fully deterministic.

    Runs on the DRIVER over the distinct-word table — the classic BPE
    trick: 100 TB of text collapses to |vocab| rows before any Python
    sees it, so this loop is O(|vocab| · n_merges), not O(corpus)."""
    segs: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in word_freq.items() if len(w) >= 2
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, freq in segs.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        for sym, freq in segs.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + freq
        segs = merged
    return merges


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE encode: repeatedly merge the lowest-rank adjacent
    pair present in the word (the tokenizers-library apply order)."""
    sym = list(word)
    while len(sym) >= 2:
        pairs = [(ranks.get((a, b), 1 << 30), i) for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        rank, i = min(pairs)
        if rank >= 1 << 30:
            break
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


#: Char-mode BPE pre-segmentation width: with no word boundaries (CJK),
#: the distinct-"word" table is built from fixed-width chunks of the
#: space-stripped text. SentencePiece solves this by treating whole
#: sentences as sequences; fixed chunks are the declarative equivalent
#: that keeps the distinct-segment table bounded (|alphabet|^width worst
#: case, corpus-sublinear in practice) so BPE training stays O(K).
BPE_CHAR_CHUNK = 8


def corpus_word_freq(docs: DataFrame, whitespace: bool = True) -> DataFrame:
    """(w, freq) — the frequency-weighted segment table BPE trains on.
    Whitespace mode: words by ``split(' ')``. Char mode (CJK): fixed
    {BPE_CHAR_CHUNK}-char chunks of the space-stripped text."""
    if whitespace:
        words = docs.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> length(x) > 0)")
            ).alias("w")
        )
    else:
        words = (
            docs.select(
                F.expr("replace(lower(text), ' ', '')").alias("ctext")
            )
            .filter(F.length("ctext") > 0)
            .select(
                F.explode(
                    F.expr(
                        f"transform(sequence(0, int(ceil(length(ctext) / {BPE_CHAR_CHUNK}.0)) - 1),"
                        f" j -> substring(ctext, j * {BPE_CHAR_CHUNK} + 1, {BPE_CHAR_CHUNK}))"
                    )
                ).alias("w")
            )
        )
    return words.groupBy("w").agg(F.count("*").cast("bigint").alias("freq"))


#: Pinned BPE merge tables — ``train_bpe`` output over the sf0.01 fixture
#: corpus (whitespace words / {BPE_CHAR_CHUNK}-char chunks respectively),
#: committed as literals so the ENCODE stage is oracle-checkable in pure
#: SQL (the f7c pinned-vocab pattern; r6 verdict item 3). A production
#: deployment re-trains via ``bpe_train_apply`` (the prod tier, kept
#: below); pin freshness is law-tested in tests/test_bpe.py — retraining
#: on the fixture must reproduce these exact tables.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"),
]
BPE_MERGES_CHAR: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("a", "t"), ("a", "l"), ("a", "r"), ("m", "er"), ("p", "ar"),
    ("a", "s"), ("e", "c"),
]

_BPE_NO_RANK = 1 << 30  #: rank for "pair not in the merge table"


def bpe_encode_segments(
    spark: SparkSession, wf: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode every distinct segment of ``wf`` (w, freq) with the given
    merge table: broadcast the rank dict, apply canonical lowest-rank-
    first (leftmost on tie) merging in an Arrow-batched pandas_udf, and
    price the corpus cost by the per-segment frequency. Fully
    distributed — the only driver-side object is the O(n_merges) rank
    table."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    @pandas_udf("array<string>")
    def encode(w: pd.Series) -> pd.Series:
        rk = bc.value
        big = 1 << 30

        def enc(word):
            sym = list(word)
            while len(sym) >= 2:
                pairs = [
                    (rk.get((a, b), big), i)
                    for i, (a, b) in enumerate(zip(sym, sym[1:]))
                ]
                rank, i = min(pairs)
                if rank >= big:
                    break
                sym[i : i + 2] = [sym[i] + sym[i + 1]]
            return sym

        return w.map(enc)

    return (
        wf.select("w", "freq", encode("w").alias("pieces"))
        .select(
            "w",
            "freq",
            F.concat_ws(" ", "pieces").alias("pieces_str"),
            F.size("pieces").cast("bigint").alias("n_pieces"),
            (F.size("pieces") * F.col("freq")).cast("bigint").alias("corpus_pieces"),
        )
    )


def bpe_train_apply(spark: SparkSession, wf: DataFrame) -> DataFrame:
    """PRODUCTION TIER — train {N_MERGES} merges in-query on the
    top-{BPE_VOCAB_CAP} segments (TakeOrderedAndProject caps the driver
    transfer at O(K) — the r2 Heaps'-law fix), then encode every distinct
    segment with the trained table. The declared e27/e27b seats pin the
    trained table as a committed literal instead so the encode is
    SQL-oracle-checkable; a real deployment calls this and re-trains.
    Train/apply laws live in tests/test_bpe.py."""
    word_freq = {
        r["w"]: r["freq"]
        for r in wf.orderBy(F.desc("freq"), F.asc("w"))
        .limit(BPE_VOCAB_CAP)
        .collect()
    }
    merges = train_bpe(word_freq, N_MERGES)
    return bpe_encode_segments(spark, wf, merges)


def _bpe_rank_case(merges: list[tuple[str, str]]) -> str:
    """DuckDB CASE expression giving the merge rank of the adjacent
    symbol pair (sym[i], sym[i+1]) under the pinned table."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    arms = " ".join(
        f"WHEN sym[i] = '{q(a)}' AND sym[i+1] = '{q(b)}' THEN {r}"
        for r, (a, b) in enumerate(merges)
    )
    return f"CASE {arms} ELSE {_BPE_NO_RANK} END"


def _e27_oracle(merges: list[tuple[str, str]], wf_sql: str) -> str:
    """Recursive-CTE BPE-encode oracle: each step merges the lowest-rank
    (leftmost on tie — list_position returns the FIRST minimum) adjacent
    pair, exactly the canonical tokenizers-library apply order; a segment
    is terminal when no adjacent pair is in the pinned table. ``wf_sql``
    supplies the (w, freq) segment table for the mode."""
    rc = _bpe_rank_case(merges)
    rl = f"list_transform(range(1, len(sym)), i -> {rc})"
    big = _BPE_NO_RANK
    return f"""
WITH RECURSIVE wf AS ({wf_sql}),
enc AS (
  SELECT w, string_split(w, '') AS sym FROM wf
  UNION ALL
  SELECT w, list_concat(list_concat(sym[1:bi-1], [sym[bi] || sym[bi+1]]),
                        sym[bi+2:]) AS sym
  FROM (
    SELECT w, sym,
           list_position({rl}, list_aggregate({rl}, 'min')) AS bi,
           coalesce(list_aggregate({rl}, 'min'), {big}) AS mn
    FROM enc WHERE len(sym) >= 2
  ) WHERE mn < {big}
),
final AS (
  SELECT w, sym FROM enc
  WHERE len(sym) < 2
     OR coalesce(list_aggregate({rl}, 'min'), {big}) >= {big}
)
SELECT f.w, wf.freq, array_to_string(f.sym, ' ') AS pieces_str,
       CAST(len(f.sym) AS BIGINT) AS n_pieces,
       CAST(len(f.sym) * wf.freq AS BIGINT) AS corpus_pieces
FROM final f JOIN wf USING (w)
"""


_E27_WF_SQL = """
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              x -> length(x) > 0)) AS w
    FROM documents) GROUP BY w
"""

_E27B_WF_SQL = f"""
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(list_transform(
             range(0, CAST(ceil(length(ctext) / {BPE_CHAR_CHUNK}.0) AS BIGINT)),
             j -> substring(ctext, CAST(j * {BPE_CHAR_CHUNK} + 1 AS INT),
                            {BPE_CHAR_CHUNK}))) AS w
    FROM (SELECT replace(lower(text), ' ', '') AS ctext FROM documents)
    WHERE length(ctext) > 0) GROUP BY w
"""


@query("e27b_bpe_nospacing", oracle=_e27_oracle(BPE_MERGES_CHAR, _E27B_WF_SQL))
def e27b_bpe_nospacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E27 BPE in char mode (``whitespace=False``) — subword encoding for
    no-whitespace scripts (the reference's Chinese corpus,
    ``data_helper.py:55``): segments are fixed {BPE_CHAR_CHUNK}-char
    chunks of the space-stripped text (the declarative stand-in for
    SentencePiece's whole-sequence treatment), encoded with the pinned
    {BPE_MERGES_CHAR} table under the identical broadcast/apply pipeline
    as e27. Oracle: the same recursive-CTE merge fixpoint; training stays
    available via ``bpe_train_apply`` and its laws in tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_segments(
        spark, corpus_word_freq(docs, whitespace=False), BPE_MERGES_CHAR
    )


@query("e27_bpe_apply", oracle=_e27_oracle(BPE_MERGES, _E27_WF_SQL))
def e27_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E27 BPE subword tokenization — closes the loop e21 opens: e21
    computes one iteration of merge statistics; this op encodes every
    distinct word with a trained merge table under the canonical
    lowest-rank-first merge order (what the reference's pretrained
    WordPiece/BPE vocab was built with upstream of
    ``data_helper.py:55-57``). Corpus token cost is priced by joining
    the per-word piece count back to word frequencies.

    The declared seat applies the PINNED table ({BPE_MERGES}, trained by
    ``train_bpe`` on the sf0.01 fixture and committed — the f7c pinned-
    vocab pattern), which makes the iterative in-word merge fixpoint
    oracle-checkable as a DuckDB recursive CTE. In-query training is the
    prod tier (``bpe_train_apply``: driver loop over the top-
    {BPE_VOCAB_CAP} words by frequency — TakeOrderedAndProject caps the
    driver transfer at O(K) under Heaps' law; BPE training is O(K),
    never O(corpus)). The laws — reconstruction (concat(pieces) == word),
    piece provenance, parity with an independently-written encoder,
    pin freshness (retraining on the fixture reproduces the literal),
    and cross-run determinism — are pinned in tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_segments(
        spark, corpus_word_freq(docs, whitespace=True), BPE_MERGES
    )
