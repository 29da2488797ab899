#!/usr/bin/env python
"""Dump .explain('formatted') for a set of queries to plans/r13/<name>_<tag>.txt.

Usage: python tools/dump_plans_r13.py <tag> [name ...]
With no names, dumps the full bench HEADLINE list. Plan-only (no execution)
except for call-time-eager seats, whose plan capture necessarily runs their
eager prefix; their dumped plan is the final (post-checkpoint) stage, with a
note prepended.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import bench  # noqa: E402  (HEADLINE list)
from wx20222_bigdata_spark.registry import all_queries  # noqa: E402
from wx20222_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(bench.HEADLINE)
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="dump-plans-r13", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO_ROOT / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plan = f"ERROR during plan capture: {exc}\n"
        note = ""
        if name in bench.EAGER_QUERIES:
            note = (
                "NOTE: call-time-eager seat — upstream stages run at query\n"
                "call (localCheckpoint); this is the plan of the final stage\n"
                "over the checkpointed intermediates.\n\n"
            )
        (out_dir / f"{name}_{tag}.txt").write_text(note + plan)
        print(f"dumped {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
