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
    Out-of-range indexing returns NULL, so callers must guarantee both
    arrays have ≥ ``dim`` elements."""
    return F.expr(
        " + ".join(
            f"CAST({a_col}[{i}] AS DOUBLE) * CAST({b_col}[{i}] AS DOUBLE)"
            for i in range(dim)
        )
    )
