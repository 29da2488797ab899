#!/usr/bin/env python
"""Registry-wide codegen audit — hunt for silent interpreted hot paths.

The e35 finding (late r8): whole-stage code generation can DECLINE a
stage outright (giant expression trees), and the fallback is silent —
the executed plan simply carries no WholeStageCodegen span, and the
stage evaluates the expression tree interpreted, per row, at 10-100x
the cost. This tool executes every registered seat at a small SF and
records, from the EXECUTED plan (post-AQE — the pre-execution explain
can still show codegen that later declines): the number of
WholeStageCodegen spans, total plan nodes, and whether any
Project/Filter/HashAggregate sits OUTSIDE every codegen span (the
smoking gun; scans, exchanges, sorts and Python/Arrow operators live
outside legitimately).

Caveats recorded rather than hidden: call-time-eager seats (e9c, e35*,
o13, j1b/o7, s6/s11…) return a checkpoint/aggregate whose plan no
longer shows the interesting stages — their audit rows cover only the
read-back plan; the eager stages are separately measured by
tools/eager_seat_curve.py.

Usage: python tools/codegen_audit.py [--sf-dir DIR] [--out FILE]
Writes CODEGEN_AUDIT.json {seat: {wsc_spans, flagged_ops, err}}.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: operators that SHOULD be inside a codegen span when they appear
_CODEGEN_ELIGIBLE = ("Project", "Filter", "HashAggregate")
#: operators that legitimately live outside codegen
_EXEMPT_PREFIXES = (
    "Scan", "Exchange", "AQEShuffleRead", "Sort", "Window",
    "ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
    "Generate", "BroadcastExchange", "InMemoryTableScan", "ObjectHashAggregate",
    "SortAggregate", "Expand", "RowToColumnar", "ColumnarToRow", "PythonMapInArrow",
)


def _audit_plan(plan: str) -> dict:
    # AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    # the initial section has no codegen markers and must not be
    # audited (it false-flags every operator as interpreted).
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    # AQE empty-relation propagation replaces an empty result's subtree
    # with EmptyRelation + a LogicalQueryStage printout of the LOGICAL
    # plan — those lines are not physical operators (nothing executes)
    # and must not be audited.
    if "EmptyRelation" in plan:
        out_lines = []
        skip_depth = None
        for line in plan.splitlines():
            indent = len(line) - len(line.lstrip(" :+-"))
            if skip_depth is not None and indent > skip_depth:
                continue
            skip_depth = None
            if "LogicalQueryStage" in line or "EmptyRelation" in line:
                skip_depth = indent
                continue
            out_lines.append(line)
        plan = "\n".join(out_lines)
    wsc = plan.count("*(")  # codegen'd operators print with a *(id) prefix
    spans = len(set(re.findall(r"\*\((\d+)\)", plan)))
    flagged = []
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-")
        if stripped.startswith("*("):
            continue
        op = re.match(r"([A-Za-z]+)", stripped)
        if not op:
            continue
        name = op.group(1)
        if any(name.startswith(e) for e in (
            "Project", "Filter", "HashAggregate"
        )):
            # classify the KNOWN non-codegen-able classes so the report
            # separates "by-design" from "unexplained" (an e35-class
            # cliff would show up as unexplained flat arithmetic)
            if "lambdafunction" in stripped:
                cause = "hof-lambda"  # HOFs exclude the op from WSC
            elif "pythonUDF" in stripped:
                cause = "python-udf-ref"
            elif any(f in stripped for f in (
                "pivotfirst", "percentile", "approx_count_distinct",
                "hll", "collect_list", "collect_set", "first(", "last(",
            )):
                cause = "imperative-aggregate"
            elif "from_json" in stripped or "to_json" in stripped:
                cause = "json-codec"  # JsonToStructs is CodegenFallback
            else:
                cause = "UNEXPLAINED"
            flagged.append({"cause": cause, "op": stripped[:160]})
    return {"wsc_ops": wsc, "wsc_spans": spans, "interpreted_ops": flagged}


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    out_file = Path(REPO_ROOT) / "CODEGEN_AUDIT.json"
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
    if "--out" in argv:
        i = argv.index("--out")
        out_file = Path(argv[i + 1])

    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    spark = get_spark(
        app_name="codegen-audit",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    report: dict[str, dict] = {}
    n_flagged = 0
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            # IMPORTANT: finalize THIS DataFrame's QueryExecution — a
            # noop write runs through a separate QE, leaving this plan
            # un-finalized (AQE isFinalPlan=false, no codegen markers
            # → every operator false-flags as interpreted).
            df.tail(1)
            plan = df._jdf.queryExecution().executedPlan().toString()
            row = _audit_plan(plan)
            row["err"] = None
        except Exception as e:  # noqa: BLE001
            row = {"wsc_ops": None, "wsc_spans": None,
                   "interpreted_ops": [], "err": f"{type(e).__name__}: {e}"[:200]}
        report[name] = row
        unexplained = [
            o for o in row["interpreted_ops"] if o["cause"] == "UNEXPLAINED"
        ]
        if unexplained:
            n_flagged += 1
            print(f"FLAG {name}: {len(unexplained)} UNEXPLAINED interpreted"
                  f" op(s) — first: {unexplained[0]['op'][:110]}", flush=True)
    json.dump(report, open(out_file, "w"), indent=1, sort_keys=True)
    n_any = sum(1 for r in report.values() if r.get("interpreted_ops"))
    print(f"\n{len(report)} seats audited; {n_any} with interpreted ops "
          f"(known classes: hof-lambda / imperative-aggregate / "
          f"python-udf-ref), {n_flagged} with UNEXPLAINED interpreted "
          f"Project/Filter/HashAggregate → {out_file}")


if __name__ == "__main__":
    main()
