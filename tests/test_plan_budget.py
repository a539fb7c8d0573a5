"""Unit tests for tools/plan_budget.py's parser (r11) — the node
counter the standing plan-shape invariant rests on.  Pure string
tests, no Spark session."""

from __future__ import annotations

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "plan_budget", os.path.join(ROOT, "tools", "plan_budget.py")
)
plan_budget = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plan_budget)

FAKE_PLAN = """\
== Physical Plan ==
AdaptiveSparkPlan (13)
+- HashAggregate (12)
   +- Exchange (11)
      ...

(1) Scan parquet
Output [2]: [a, b]

(2) Exchange
Arguments: hashpartitioning(a, 32)

(3) Sort
Arguments: [a ASC]

(4) SortMergeJoin
Join condition: None

(5) Exchange
Arguments: hashpartitioning(b, 32)

(6) ArrowEvalPython
Arguments: [udf(a)]

(7) BroadcastExchange
Arguments: HashedRelationBroadcastMode

(8) BroadcastHashJoin
Join type: LeftAnti

(9) Window
Arguments: [row_number()]

(10) WindowGroupLimit
Arguments: [rank]

(11) Generate
Arguments: explode(xs)

(12) HashAggregate
Keys: [a]

(13) AdaptiveSparkPlan
"""


def test_plan_counts_parses_node_list_not_tree_header():
    got = plan_budget.plan_counts(FAKE_PLAN)
    # Two shuffle exchanges — the tree-header "Exchange (11)" line must
    # NOT be double-counted, and BroadcastExchange is a separate key.
    assert got["shuffles"] == 2
    assert got["sorts"] == 1
    assert got["smj"] == 1
    assert got["py_arrow"] == 1
    assert got["bcast"] == 1
    assert got["bhj"] == 1
    assert got["window"] == 1
    assert got["wgl"] == 1
    assert got["generate"] == 1
    # Absent node classes are omitted, not zero-filled.
    assert "cartesian" not in got and "py_map" not in got


def test_committed_budget_is_loadable_and_covers_registry():
    """The committed sidecar parses and is not silently empty — the
    --check invariant is only as good as the committed baseline."""
    with open(os.path.join(ROOT, "PLAN_BUDGET.json")) as f:
        data = json.load(f)
    assert len(data["queries"]) >= 200
    # Every budget entry only uses known keys.
    known = set(plan_budget.CRITICAL.values()) | set(plan_budget.INFO.values())
    for name, counts in data["queries"].items():
        assert set(counts) <= known, (name, counts)
