"""Deterministic cross-engine hashing primitives.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` use different
algorithms, so oracle-checked dedup/LSH needs a hash both engines compute
identically. Two primitives:

- ``md5(col)`` — identical hex string in Spark and DuckDB (UTF-8 bytes);
  used for exact dedup keys.
- ``md5_hash`` — the first 15 hex digits of md5 as a 60-bit integer
  (optionally reduced mod a caller-chosen modulus). md5 is JVM-native in
  Spark (one whole-stage-codegen call per token) and DuckDB casts
  ``'0x…'`` hex strings to BIGINT, so the SAME value is computed on both
  engines at native speed — this is the default token hash under the
  oracle-checked MinHash / SimHash / fingerprint pipelines. Verified
  bit-identical incl. multibyte and empty strings (md5('') is well
  defined — no sequence landmine).
- ``char_hash`` — a 31-ary polynomial rolling hash over code points, mod a
  prime. Expressible as a higher-order fold on BOTH engines (verified
  bit-identical incl. multibyte chars); kept as the portable fallback for
  engines without a hex cast, and as the HOF cross-engine parity
  demonstration. ~3× slower than ``md5_hash`` (per-char array fold).

MinHash permutations follow the standard universal-hash family
``h_j(t) = (a_j * h(t) + b_j) mod p`` (Broder '97 resemblance sketches)
with fixed odd multipliers — deterministic everywhere.
"""

from __future__ import annotations

MOD = 1_000_003  #: prime modulus for the rolling hash

#: MinHash family parameters: a_j odd, b_j spread; j in 0..n_hashes-1.
MINHASH_A = [2 * j + 1 for j in range(64)]
MINHASH_B = [7919 * j for j in range(64)]


def spark_md5_hash(col_expr: str, mod: int | None = None) -> str:
    """Spark SQL expression: 60-bit md5-prefix hash of a string expression.

    ``conv`` parses the 15-hex-digit prefix (60 bits, always positive —
    no sign landmine) and returns a decimal string; the cast makes it a
    BIGINT. With ``mod`` the value is reduced so downstream universal-hash
    permutations ``(a*h + b) % p`` cannot overflow int64."""
    h = f"CAST(conv(substring(md5({col_expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"pmod({h}, {mod})" if mod is not None else h


def duck_md5_hash(col_expr: str, mod: int | None = None) -> str:
    """DuckDB SQL expression computing the identical md5-prefix hash.

    DuckDB casts ``'0x…'`` hex strings to BIGINT directly. The value is
    positive, so plain ``%`` agrees with Spark's ``pmod``."""
    h = f"CAST(concat('0x', substring(md5({col_expr}), 1, 15)) AS BIGINT)"
    return f"({h} % {mod})" if mod is not None else h


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

