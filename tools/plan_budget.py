"""Mechanical plan budget for the whole registry (r11).

Pins the PHYSICAL-PLAN SHAPE of every batch query to a committed
sidecar (``PLAN_BUDGET.json``): per query, the count of the node
types that dominate cost at scale — shuffle exchanges, sorts,
sort-merge joins, Python nodes (Arrow-batched or grouped-map),
nested-loop/cartesian joins — plus the cheap ones worth watching
(broadcast exchanges, windows, generates).  ``--check`` re-derives
the counts from the working tree and fails on any query whose
SCALE-CRITICAL counts grew, so a refactor can never silently add a
shuffle, a sort, a Python stage, or a nested-loop join to any of the
207 queries: the committed sidecar diff IS the review artifact, the
same contract BENCH_QUERIES.json provides for wall time and
CORRECTNESS_r*.json for values.  Improvements (counts shrinking) are
reported but pass — refresh the sidecar with ``--write`` to bank
them.

Determinism: plans are derived cold — ``spark.catalog.clearCache()``
before every query — because the CacheManager substitutes
InMemoryRelation into later plans, which would make counts depend on
registry iteration order.  Counts come from the formatted explain's
node list (the ``(N) NodeName`` lines), i.e. the static plan; AQE
runtime re-plans (SMJ→BHJ conversion, coalescing) are deliberately
NOT reflected — the budget pins what the planner is ASKED to do, the
invariant the code controls.  The budget is tied to one SF (default
sf0.01, same as the oracle gate): stats-based broadcast decisions are
size-dependent, so counts at other SFs may legitimately differ.

Usage:
    python tools/plan_budget.py --write   # (re)generate the sidecar
    python tools/plan_budget.py --check   # diff working tree vs sidecar
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.plans.inspect import formatted_plan

# Node-name -> budget key.  SCALE-CRITICAL keys (checked for growth)
# first; the rest are informational (recorded, reported, never fatal).
CRITICAL = {
    "Exchange": "shuffles",
    "Sort": "sorts",
    "SortMergeJoin": "smj",
    "CartesianProduct": "cartesian",
    "BroadcastNestedLoopJoin": "bnlj",
    "ArrowEvalPython": "py_arrow",
    "MapInPandas": "py_map",
    "FlatMapGroupsInPandas": "py_grouped",
    "FlatMapGroupsInPandasWithState": "py_stateful",
    # Expand multiplies every input row by its projection count —
    # the multi-distinct rewrite's silent 2-3x shuffle-volume cost
    # (the reason q55/q80 pre-collapse instead of multi-countDistinct).
    "Expand": "expand",
}
INFO = {
    "BroadcastExchange": "bcast",
    "BroadcastHashJoin": "bhj",
    "Window": "window",
    "WindowGroupLimit": "wgl",
    "Generate": "generate",
    "InMemoryTableScan": "cache_scan",
}
_NODE = re.compile(r"^\(\d+\) (\w+)", re.MULTILINE)


def plan_counts(plan: str) -> dict[str, int]:
    raw: dict[str, int] = {}
    for name in _NODE.findall(plan):
        raw[name] = raw.get(name, 0) + 1
    out: dict[str, int] = {}
    for node, key in {**CRITICAL, **INFO}.items():
        n = raw.get(node, 0)
        if node == "Window":  # don't double-count WindowGroupLimit
            n = raw.get("Window", 0)
        if n:
            out[key] = out.get(key, 0) + n
    return out


def derive(sf_dir: str) -> tuple[dict[str, dict[str, int]], list[str]]:
    from flink_s3_read_write_spark.queries import registry
    from flink_s3_read_write_spark.session import build_session

    spark = build_session("plan-budget")
    spark.sparkContext.setLogLevel("ERROR")
    budgets: dict[str, dict[str, int]] = {}
    errors: list[str] = []
    for name, q in sorted(registry().items()):
        spark.catalog.clearCache()
        try:
            df = q.fn(spark, sf_dir)
            if df.isStreaming:
                continue
            budgets[name] = plan_counts(formatted_plan(df))
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: {type(e).__name__}: {e}")
    return budgets, errors


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sidecar = os.path.join(root, "PLAN_BUDGET.json")

    # --check against a missing sidecar is an error, not an implicit
    # --write: silently regenerating would make the check vacuously
    # pass in a tree where the committed budget was deleted/renamed.
    if args.check and not os.path.exists(sidecar):
        print(f"plan_budget: --check but {sidecar} is missing; "
              "run --write (and commit the sidecar) first",
              file=sys.stderr)
        return 1

    budgets, errors = derive(args.sf)
    for e in errors:
        print(f"plan_budget: DERIVE FAILED {e}", file=sys.stderr)

    if args.write or not os.path.exists(sidecar):
        with open(sidecar, "w") as f:
            json.dump({"sf": args.sf, "queries": budgets}, f,
                      indent=1, sort_keys=True)
            f.write("\n")
        print(f"plan_budget: wrote {len(budgets)} budgets to {sidecar}")
        return 1 if errors else 0

    with open(sidecar) as f:
        committed = json.load(f)["queries"]
    crit_keys = set(CRITICAL.values())
    regressions, improvements, new = [], [], []
    for name, now in sorted(budgets.items()):
        old = committed.get(name)
        if old is None:
            new.append(name)
            continue
        for k in crit_keys:
            a, b = old.get(k, 0), now.get(k, 0)
            if b > a:
                regressions.append(f"{name}: {k} {a} -> {b}")
            elif b < a:
                improvements.append(f"{name}: {k} {a} -> {b}")
    for line in improvements:
        print(f"plan_budget: improved (run --write to bank): {line}")
    for n in new:
        print(f"plan_budget: new query not in sidecar: {n}")
    for line in regressions:
        print(f"plan_budget: REGRESSION {line}", file=sys.stderr)
    ok = not regressions and not errors
    print(f"plan_budget: {len(budgets)} queries checked, "
          f"{len(regressions)} regressions, {len(improvements)} improvements")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
