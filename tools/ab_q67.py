"""One-off interleaved sampler for the q67 IVF drift watch (r11).

The r8→r10 driver sidecars show q67_ann_ivf_topk moving
2.03 → 2.30 → 2.97 s — three same-direction samples on code whose only
change in that window was memoizing (r9) then freezing (r10) the
centroid matrix, both of which should make it FASTER or neutral.  The
VERDICT r10 watch asks for interleaved A/B evidence under the driver
policy: if the sample spread straddles the r8 number, close as
redistribution noise; if ~3 s reproduces, profile the probe join.

Two interleaved arms, N samples each, same session (bench-style
session-persistent cache, tables pre-warmed exactly like bench.py):

  memo_cold — ``_IVF_CENTROIDS.clear()`` before each sample, so every
              run pays the training sample collect + driver k-means
              (the state of the FIRST bench pass each round);
  memo_warm — memo left hot (the state of bench's second min-of-2
              pass).

Prints all samples plus min/median per arm.  Result is pinned in
SCALE.md; this script stays for future watches.

Usage: python tools/ab_q67.py [--sf /root/testdata/sf0.1] [--samples 4]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.operators import similarity as S
from flink_s3_read_write_spark.session import build_session
from flink_s3_read_write_spark.sources.io import load_table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--samples", type=int, default=4)
    args = ap.parse_args()

    from flink_s3_read_write_spark.queries import registry

    q67 = registry()["q67_ann_ivf_topk"].fn
    spark = build_session("ab-q67")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm like bench.py: table scan + python-worker spawn.
    load_table(spark, args.sf, "embeddings").write.format("noop").mode(
        "overwrite").save()
    q67(spark, args.sf).write.format("noop").mode("overwrite").save()  # warm-up

    def sample(clear_memo: bool) -> float:
        if clear_memo:
            S._IVF_CENTROIDS.clear()
        t0 = time.time()
        q67(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results: dict[str, list[float]] = {"memo_cold": [], "memo_warm": []}
    for i in range(args.samples):
        results["memo_cold"].append(sample(clear_memo=True))
        results["memo_warm"].append(sample(clear_memo=False))

    for arm, ts in results.items():
        print(f"{arm}: samples={[round(t, 2) for t in ts]} "
              f"min={min(ts):.2f} median={statistics.median(ts):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
