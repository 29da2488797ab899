"""Registry hygiene — the driver-facing contract file itself.

The _FRONT rotation is hand-edited every round (50 names, exact); a typo
silently burns a driver-verification slot (the name is skipped by
``_front_loaded``'s ``if n in mapping`` guard rather than failing). Pin
the invariants so rotation edits fail loudly in CI instead.
"""

from __future__ import annotations

from wx20222_bigdata_spark.registry import _FRONT, all_oracles, all_queries


def test_front_names_are_registered_and_exact():
    q = all_queries()
    missing = [n for n in _FRONT if n not in q]
    assert not missing, f"_FRONT names not in registry: {missing}"
    assert len(_FRONT) == len(set(_FRONT)), "duplicate names in _FRONT"
    assert len(_FRONT) == 50, (
        f"_FRONT must hold exactly 50 names (driver window), got {len(_FRONT)}"
    )


def test_every_oracle_has_a_query():
    q, o = all_queries(), all_oracles()
    orphans = set(o) - set(q)
    assert not orphans, f"oracles without a registered query: {orphans}"


def test_front_loading_preserves_registry():
    """Front-loading reorders, never drops or duplicates."""
    q = all_queries()
    assert len(q) == len(set(q))
    assert list(q)[: len([n for n in _FRONT if n in q])] == [
        n for n in _FRONT if n in q
    ]
