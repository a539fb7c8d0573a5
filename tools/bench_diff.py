"""Bench regression guard: compare the current BENCH_QUERIES.json
sidecar against a previous one (default: the committed copy at HEAD —
meaningful when the on-disk sidecar is dirty from a fresh bench run;
pass --base HEAD~ right after committing a refresh) and flag
per-query regressions.

Usage:
    python tools/bench_diff.py                 # vs HEAD's committed sidecar
    python tools/bench_diff.py --base <rev>    # vs a git revision
    python tools/bench_diff.py --base <file>   # vs a JSON file
    python tools/bench_diff.py --threshold 1.3 # regression factor

A query regresses when new >= threshold * old AND the absolute
slowdown exceeds --min-delta seconds (sub-second jitter on a warm
local[32] JVM is noise, not signal).  Exit code 1 on any regression —
wire into a pre-commit or run after every bench refresh so the
"no slowest-N regression" property the per-round audit checks by hand
is a command, not a diff-reading exercise.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIDECAR = os.path.join(ROOT, "BENCH_QUERIES.json")


def _load_base(base: str) -> dict:
    if os.path.exists(base):
        with open(base) as fh:
            return json.load(fh)
    # treat as a git rev
    blob = subprocess.check_output(
        ["git", "-C", ROOT, "show", f"{base}:BENCH_QUERIES.json"]
    )
    return json.loads(blob)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="HEAD",
                    help="git rev or JSON file to compare against (default HEAD)")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="regression factor (default 1.3 = +30%%)")
    ap.add_argument("--min-delta", type=float, default=0.5,
                    help="ignore absolute slowdowns below this many seconds")
    args = ap.parse_args()

    with open(SIDECAR) as fh:
        cur = json.load(fh)
    old = _load_base(args.base)
    cq, oq = cur["queries"], old["queries"]

    shared = sorted(set(cq) & set(oq))
    added = sorted(set(cq) - set(oq))
    removed = sorted(set(oq) - set(cq))
    regressions, improvements = [], []
    for name in shared:
        o, c = oq[name], cq[name]
        if c >= args.threshold * o and (c - o) >= args.min_delta:
            regressions.append((name, o, c))
        elif o >= args.threshold * c and (o - c) >= args.min_delta:
            improvements.append((name, o, c))

    tot_shared_old = sum(oq[n] for n in shared)
    tot_shared_new = sum(cq[n] for n in shared)
    if not shared or tot_shared_old == 0:
        # An empty shared set means the baseline was clobbered or swapped
        # (the exact failure mode this guard exists for) — fail loudly
        # instead of reporting a vacuous pass.
        print(
            f"ERROR: no shared queries with base "
            f"(added {len(added)} | removed {len(removed)}) — "
            f"the committed baseline sidecar is missing or was pruned; "
            f"restore the full BENCH_QUERIES.json before trusting this diff",
            file=sys.stderr,
        )
        return 2
    print(
        f"shared {len(shared)}: {tot_shared_old:.1f}s -> {tot_shared_new:.1f}s "
        f"({(tot_shared_new / tot_shared_old - 1) * 100:+.1f}%) | "
        f"added {len(added)} ({sum(cq[n] for n in added):.1f}s) | "
        f"removed {len(removed)}"
    )
    for name, o, c in sorted(improvements, key=lambda t: t[1] - t[2], reverse=True):
        print(f"  faster  {o:6.2f}s -> {c:6.2f}s  {name}")
    for name, o, c in sorted(regressions, key=lambda t: t[2] - t[1], reverse=True):
        print(f"  SLOWER  {o:6.2f}s -> {c:6.2f}s  {name}")
    if regressions:
        print(f"{len(regressions)} regression(s) past "
              f"{args.threshold:.2f}x/+{args.min_delta}s")
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
