"""Rotation-state report (r11): the driver re-confirms ~50 queries
per round, and the registry's tier ordering drains the oldest-green
cohort first.  This prints the state the round protocol tracks by
hand — latest-driver-row distribution by round, the current oldest
cohort (what the next window should lead with), and any error or
never-checked entries (tier 0/1, which preempt everything).

Usage: python tools/rotation_report.py
No Spark session — reads the committed CORRECTNESS_r*.json sidecars
through the same code path the registry ordering uses.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.queries import (
    _TOUCHED_SINCE_ROUND,
    _TOUCHED_THIS_ROUND,
    _driver_rows,
    registry,
    stale_touched,
)


def main() -> int:
    reg = registry()
    rows = _driver_rows()
    dist: Counter[int] = Counter()
    never, failing = [], []
    oldest_round, oldest = None, []
    for name in reg:
        row = rows.get(name)
        if row is None:
            never.append(name)
            continue
        rnd, ok = row
        if not ok:
            failing.append(f"{name} (r{rnd})")
            continue
        dist[rnd] += 1
        if oldest_round is None or rnd < oldest_round:
            oldest_round, oldest = rnd, [name]
        elif rnd == oldest_round:
            oldest.append(name)

    print(f"registry: {len(reg)} queries; building round r{_TOUCHED_SINCE_ROUND}")
    print("latest-green distribution:",
          ", ".join(f"r{r}:{n}" for r, n in sorted(dist.items(), reverse=True)))
    if never:
        print(f"NEVER DRIVER-CHECKED ({len(never)}):", never)
    if failing:
        print(f"LATEST ROW NOT GREEN ({len(failing)}):", failing)
    print(f"oldest green cohort (r{oldest_round}, {len(oldest)} — "
          f"leads the next window after touched):")
    for n in oldest:
        print(f"  {n}")
    stale = stale_touched()
    print(f"touched this round: {len(_TOUCHED_THIS_ROUND)} "
          f"({', '.join(_TOUCHED_THIS_ROUND) or 'none'})")
    if stale:
        print(f"STALE touched entries (delete them): {stale}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
