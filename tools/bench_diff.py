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

--driver <BENCH_rNN.json> switches to the DRIVER-BAND rule (r14,
VERDICT r13 item 7): the driver session carries a measured ~1.15x
constant over local fresh-process runs (r13: identical code, driver
invocation shape, 163.8 s local vs 187.6 s driver), and the committed
BENCH_QUERIES.json baseline is the median of a fresh-process band
with ±8% spread.  Re-litigating that box noise every round is waste,
so a driver sidecar is flagged ONLY when
  * driver_total / committed_total > 1.25 (past session factor +
    band), or
  * a single query is > 2.0x its committed time AND slower by >= 1 s
    — and even then the verdict should require a plan delta
    (plan_budget --check) before calling it a regression rather than
    redistribution noise.
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
    ap.add_argument("--driver", default=None, metavar="BENCH_rNN.json",
                    help="apply the driver-band rule to a driver bench "
                         "sidecar: flag only total > 1.25x the committed "
                         "baseline or a query > 2.0x and >= 1 s slower "
                         "(see module docstring)")
    args = ap.parse_args()

    if args.driver:
        # Driver-band semantics override the fine-grained knobs: the
        # ~1.15x session factor and the ±8% fresh-process band are
        # measured constants (SCALE.md r13), not regressions.
        args.threshold, args.min_delta = 2.0, 1.0

    with open(args.driver if args.driver else SIDECAR) as fh:
        cur = json.load(fh)
    if "queries" not in cur and "parsed" in cur:
        # driver BENCH_rNN.json wraps the bench line under "parsed"
        cur = cur["parsed"]
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
    if args.driver:
        # The driver line carries only the slowest-15 per-query times,
        # but its "value" is the full-sweep total — compare THAT to the
        # committed baseline's full total, not the shared subset.
        # A sidecar without "value" must fail loudly (ADVICE r14): the
        # slowest-15 subset sum vs the full-sweep committed total would
        # make the 1.25 band pass vacuously.
        if "value" not in cur:
            print(
                "ERROR: driver sidecar has no 'value' full-sweep total — "
                "cannot run the driver-band check against the committed "
                "full total (the slowest-15 subset sum is not comparable); "
                "re-run bench.py or drop --driver",
                file=sys.stderr,
            )
            return 2
        drv_total = cur["value"]
        base_total = sum(oq.values())
        ratio = drv_total / base_total
        print(f"driver-band: total {drv_total:.1f}s vs committed "
              f"{base_total:.1f}s -> ratio {ratio:.3f} "
              f"(session-factor ceiling 1.25)")
        bad = ratio > 1.25
        if regressions:
            print(f"{len(regressions)} query(ies) past 2.0x/+1s — "
                  f"correlate with `plan_budget --check` before calling "
                  f"them regressions (redistribution noise is the prior)")
            bad = True
        if not bad:
            print("inside the driver band — no action")
        return 1 if bad else 0
    if regressions:
        print(f"{len(regressions)} regression(s) past "
              f"{args.threshold:.2f}x/+{args.min_delta}s")
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
