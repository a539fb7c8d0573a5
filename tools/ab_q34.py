"""One-off A/B sampler for q34's SimHash vote aggregate (r09).

Round 8 replaced the 60-column per-bit vote sums with SWAR-packed
counters (4 bit-counters per long in 14-bit lanes), claiming a 4x
narrower aggregate — but the r08 driver window showed q34 going
2.87 -> 3.51 s, so the claim needed a committed measurement.  This
script times the CURRENT simhash_near_pairs against the PRE-SWAR
implementation (extracted from git history into a scratch module)
on the same session, interleaved A/B/A/B with a cache clear between
samples, and prints min/median per variant.

Usage:
    git show <pre-swar-rev>:flink_s3_read_write_spark/operators/dedup.py \
        > /root/repo/.ab_old_dedup.py
    python tools/ab_q34.py [--sf /root/testdata/sf0.1] [--samples 3]

The result is pinned in SCALE.md; the scratch module is untracked.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.session import build_session
from flink_s3_read_write_spark.sources.io import load_table
from flink_s3_read_write_spark.operators import dedup as new_dedup


def _load_old(path: str):
    spec = importlib.util.spec_from_file_location("ab_old_dedup", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--old", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".ab_old_dedup.py"))
    args = ap.parse_args()

    old_dedup = _load_old(args.old)
    spark = build_session("ab-q34")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf, "documents")
    docs.count()  # warm the scan/page cache once, outside both variants

    variants = {
        "new_swar": lambda: new_dedup.simhash_near_pairs(docs, hash_src="md5"),
        "old_per_bit": lambda: old_dedup.simhash_near_pairs(docs, hash_src="md5"),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}
    for i in range(args.samples):
        for name, make in variants.items():
            spark.catalog.clearCache()
            t0 = time.time()
            counts[name] = make().count()
            times[name].append(time.time() - t0)
    assert counts["new_swar"] == counts["old_per_bit"], counts
    for name, ts in times.items():
        ts_s = sorted(ts)
        print(f"{name}: min={ts_s[0]:.2f}s median={ts_s[len(ts_s)//2]:.2f}s "
              f"samples={[round(t, 2) for t in ts]} rows={counts[name]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
