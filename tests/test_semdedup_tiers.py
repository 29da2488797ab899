"""e35 (flat-SQL signature) vs e35b (numpy-kernel signature) tier laws.

The production tier moves ONLY the sign-bit computation into an
Arrow-batched matmul; banding, pair join, cosine and keep tail are the
shared ``_hp_prune_from_sig``. These laws pin the claim that the move is
value-preserving: band keys agree bit-for-bit on the fixture corpus
(numpy's accumulation order could in principle flip a sign only when
|dot| is within ~1e-13 of zero — if a future fixture ever lands there,
THIS test fails loudly before a driver round sees it), and the two
seats' outputs are row-identical.
"""

from __future__ import annotations

import numpy as np


SF = "/root/testdata/sf0.001"


def test_band_keys_agree_duckdb_vs_numpy():
    """The SQL-semantics side is evaluated in DuckDB (the oracle's own
    ``_hp_band_duck`` expressions — interpreted, no Spark codegen: the
    flat-SQL form's giant generated method OOMs a default test heap,
    which is the very pathology the numpy tier removes)."""
    import duckdb

    from wx20222_bigdata_spark.operators.semdedup import (
        _CORPUS_DUCK_EMB,
        _HP_W,
        HP_BANDS,
        HP_BITS,
        _hp_band_duck,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS"
        f" SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    keys = ", ".join(
        f"CAST({_hp_band_duck(b)} AS INT) AS band{b}" for b in range(HP_BANDS)
    )
    rows = con.execute(
        f"WITH corpus AS ({_CORPUS_DUCK_EMB})"
        f" SELECT vec_id, embedding, {keys} FROM corpus"
    ).fetchall()
    assert rows
    w_t = np.array(_HP_W, dtype=np.float64).T
    pow2 = 1 << np.arange(HP_BITS, dtype=np.int64)
    for vec_id, emb, *sql_keys in rows:
        signs = (np.array(emb, dtype=np.float64) @ w_t) > 0
        for b in range(HP_BANDS):
            np_key = int(signs[b * HP_BITS : (b + 1) * HP_BITS] @ pow2)
            assert np_key == sql_keys[b], (
                f"vec {vec_id} band {b}: numpy {np_key} != sql {sql_keys[b]}"
            )


def test_e35_tiers_outputs_identical(spark):
    from wx20222_bigdata_spark.operators.semdedup import (
        e35_hyperplane_semdedup,
        e35b_hyperplane_semdedup_production,
    )

    a = e35_hyperplane_semdedup(spark, SF)
    b = e35b_hyperplane_semdedup_production(spark, SF)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
