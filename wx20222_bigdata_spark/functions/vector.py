"""Vector math on array columns — THE canonical dot/norm/cosine used by
every similarity operator (similarity search, cosine pairs, near-dup).

Single source of truth on purpose: these folds fix the float promotion
(per-element to double) and the accumulation order (array order,
left-to-right), which is what makes cosine values bit-identical to the
DuckDB oracles. A second implementation with a different fold order would
silently desynchronize.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a_col: str, b_col: str) -> Column:
    """Σ a[i]·b[i] in array order, double precision."""
    return F.expr(
        f"aggregate(zip_with({a_col}, {b_col}, (x, y) -> double(x) * double(y)), 0D, (a, x) -> a + x)"
    )


def norm(col: str) -> Column:
    """L2 norm, same fold discipline as :func:`dot`."""
    return F.sqrt(F.expr(f"aggregate({col}, 0D, (a, x) -> a + double(x) * double(x))"))


def cosine(a_col: str, b_col: str) -> Column:
    return dot(a_col, b_col) / (norm(a_col) * norm(b_col))


def dot_fixed(a_col: str, b_col: str, dim: int) -> Column:
    """Σ a[i]·b[i] for KNOWN fixed-width arrays, as a flat
    left-associated chain instead of :func:`dot`'s HOF fold: lambda
    folds are interpreted per element (CODEGEN_AUDIT ``hof-lambda``
    rows), flat arithmetic whole-stage-codegens — the difference is the
    hot-pair-loop cost in the banded self-joins (e35 tail). Bitwise
    identical to the fold for the same element order (IEEE ``0.0 + x``
    is exact; the only divergence is a ±0.0 total from an all-zero
    product chain, impossible for the float corpora this serves).

    NULL/error semantics (r9 ADVICE #1), stated loudly and pinned in
    tests/test_vector_guard.py: under ANSI mode (the Spark 4 default,
    incl. the driver's plain session) a SHORTER-than-``dim`` array
    fails the whole job with INVALID_ARRAY_INDEX — loud, not latent;
    only a non-ANSI session turns it into a NULL dot. A NULL ELEMENT
    inside a full-length array, however, yields a NULL dot in BOTH
    modes, and a NULL cosine silently DROPS OUT of ``F.max`` pair
    aggregates — a malformed vector would be reported unique/kept
    rather than failing. Latent-only for the fixed-DIM corpora these
    seats construct themselves; a pipeline ingesting UNTRUSTED
    embeddings should use :func:`dot_fixed_strict`, which raises a
    labeled error per row on short arrays in either ANSI mode (NULL
    elements cannot be guarded without a per-element scan — validate
    those at ingest). Keeping the guard in a separate function leaves
    this fast path's codegen shape untouched for every hot seat."""
    chain = " + ".join(
        f"CAST({a_col}[{i}] AS DOUBLE) * CAST({b_col}[{i}] AS DOUBLE)"
        for i in range(dim)
    )
    return F.expr(chain)


def dot_fixed_strict(a_col: str, b_col: str, dim: int) -> Column:
    """:func:`dot_fixed` with a loud size guard: raises (via
    ``raise_error``, with the offending sizes in the message) on any
    row where either array has fewer than ``dim`` elements — in BOTH
    ANSI modes, instead of ANSI's bare INVALID_ARRAY_INDEX or
    non-ANSI's silent NULL-drop. One extra ``size()`` comparison per
    pair — use at trust boundaries, not in the
    self-constructed-corpus hot loops."""
    chain = " + ".join(
        f"CAST({a_col}[{i}] AS DOUBLE) * CAST({b_col}[{i}] AS DOUBLE)"
        for i in range(dim)
    )
    return F.expr(
        f"CASE WHEN size({a_col}) >= {dim} AND size({b_col}) >= {dim}"
        f" THEN {chain}"
        f" ELSE raise_error(concat('dot_fixed_strict: embedding shorter"
        f" than {dim}: sizes ', size({a_col}), ', ', size({b_col})))"
        f" END"
    )
