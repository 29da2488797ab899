"""Codegen-decline regression guard (the e35 cliff class).

tools/codegen_audit.py sweeps all 210 seats per round (~9 min); this
test locks the rule cheaply in CI on a representative fast subset:
whole-stage-codegen-eligible operators (Project/Filter/HashAggregate
built from flat arithmetic) must sit INSIDE a WholeStageCodegen span of
the FINALIZED plan. A giant generated projection silently declining
codegen — milliseconds of math becoming tens of interpreted seconds —
shows up here as an UNEXPLAINED interpreted operator.

The audit classifier treats HOF lambdas, imperative aggregates,
python-udf-ref projects and json codecs as known-by-design classes
(they have no codegen path); everything else flags.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "codegen_audit", REPO_ROOT / "tools" / "codegen_audit.py"
)
_audit_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_audit_mod)

SF = "/root/testdata/sf0.001"

#: fast, codegen-eligible representatives: scan+agg, star join, narrow
#: text-feature pass, hashing-trick classifier, group-stats join-back,
#: and the two seats whose giant-expression risk motivated the audit
#: family (e26 builds a wide literal expression; f19 joins stats back)
SEATS = [
    "a4_pricing_summary",
    "q3_shipping_priority",
    "e4d_quality_score",
    "e26_quality_classifier",
    "f19_minmax_scale",
    "o10_hash_split",
]


@pytest.mark.parametrize("name", SEATS)
def test_no_unexplained_interpreted_operators(spark, name):
    from wx20222_bigdata_spark.registry import all_queries

    df = all_queries()[name](spark, SF)
    df.tail(1)  # finalize THIS QueryExecution (see tool docstring)
    plan = df._jdf.queryExecution().executedPlan().toString()
    row = _audit_mod._audit_plan(plan)
    unexplained = [
        o for o in row["interpreted_ops"] if o["cause"] == "UNEXPLAINED"
    ]
    assert not unexplained, (
        f"{name}: codegen-declined operator(s) outside every "
        f"WholeStageCodegen span: {unexplained}"
    )
