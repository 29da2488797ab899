"""Deterministic cross-engine hashing primitives.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` use different
algorithms, so oracle-checked dedup/LSH needs a hash both engines compute
identically. Two primitives:

- ``md5(col)`` — identical hex string in Spark and DuckDB (UTF-8 bytes);
  used for exact dedup keys.
- ``char_hash`` — a 31-ary polynomial rolling hash over code points, mod a
  prime. Expressible as a higher-order fold on BOTH engines (verified
  bit-identical incl. multibyte chars); used as the token hash underlying
  MinHash and SimHash so the whole LSH pipeline is oracle-checkable.

MinHash permutations follow the standard universal-hash family
``h_j(t) = (a_j * h(t) + b_j) mod p`` (Broder '97 resemblance sketches)
with fixed odd multipliers — deterministic everywhere.
"""

from __future__ import annotations

MOD = 1_000_003  #: prime modulus for the rolling hash

#: MinHash family parameters: a_j odd, b_j spread; j in 0..n_hashes-1.
MINHASH_A = [2 * j + 1 for j in range(64)]
MINHASH_B = [7919 * j for j in range(64)]


def spark_char_hash(col_expr: str) -> str:
    """Spark SQL expression: polynomial char hash of a string expression.

    Empty/null-safe: Spark's ``sequence(1, 0)`` DESCENDS to ``[1, 0]``
    (the repo-wide sequence landmine), which would fold ``ascii('') = 0``
    twice — numerically 0, but only by accident and different from
    DuckDB's empty ``range(1, 1)``. Guard it explicitly so both engines
    return 0 for '' by construction, not coincidence.
    """
    return (
        f"CASE WHEN length({col_expr}) >= 1 THEN "
        f"aggregate(transform(sequence(1, length({col_expr})), "
        f"i -> ascii(substring({col_expr}, i, 1))), 0L, "
        f"(a, c) -> (a * 31 + c) % {MOD}) ELSE 0L END"
    )


def duck_char_hash(col_expr: str) -> str:
    """DuckDB SQL expression computing the identical hash."""
    return (
        f"list_reduce(list_prepend(0, [ascii(substring({col_expr}, i, 1)) "
        f"for i in range(1, length({col_expr}) + 1)]), "
        f"(a, c) -> (a * 31 + c) % {MOD})"
    )

