"""Explicit caching policy — the engine API for the reference's
precompute-once pattern (SURVEY.md §4: tokenize-before-epochs at
``data_helper.py:93-95`` is manual common-subexpression hoisting; Catalyst
does NOT auto-cache across actions, so placement is an explicit API here).

Rules of thumb encoded by these helpers:

- cache exactly the frontier that multiple actions will re-read (the
  tokenized corpus before an epochs loop; the range-partitioned input of a
  two-pass algorithm) — never "cache everything";
- always pair persist with a release path (leaked caches evict useful
  blocks at scale — see the zip-index leak fixed in round 1);
- for iterates, ``materialize`` (eager localCheckpoint) truncates lineage
  AND lets upstream caches release immediately.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def cached(df: DataFrame, storage_level: str = "MEMORY_AND_DISK"):
    """``with cached(expensive_df) as d:`` — persist for the block, always
    unpersist on exit. The with-block is the epochs loop."""
    from pyspark import StorageLevel

    level = getattr(StorageLevel, storage_level)
    df = df.persist(level)
    try:
        yield df
    finally:
        # blocking: the release is part of the contract — an async
        # unpersist can leave blocks serving (or evicting others) long
        # after the with-block ends.
        df.unpersist(blocking=True)


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute ``df`` and cut its lineage (localCheckpoint).
    Use for loop iterates and two-pass outputs: the result is pinned,
    everything upstream can be released, and re-planning cost stops
    growing with iteration count."""
    return df.localCheckpoint(eager=True)
