"""Query/oracle registry — the driver-facing contract.

Every operator from SURVEY.md §2 that the engine implements is declared here
as a named query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string over the same
tables. The driver hash-compares the two at sf0.01; ops without an oracle get
a rows-only check (seeded randomness, streaming, model UDFs — SURVEY.md §5).

Determinism rules for oracle-checked queries (SURVEY.md §7 "hard parts"):
- alias every computed column identically in Spark and SQL;
- no raw timestamps in output (format to string or epoch) — avoids tz drift;
- money/quantity sums go through DECIMAL(18,2|4) so the aggregate is exact and
  order-independent, then cast back to double;
- float-array math keeps elementwise order identical on both sides and rounds
  the final value to 6 decimals.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` marks a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    # Import for side effect: operator modules self-register on import.
    from wx20222_bigdata_spark import operators  # noqa: F401

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    from wx20222_bigdata_spark import operators  # noqa: F401

    return dict(ORACLES)
