"""Dump formatted plans for the r16-touched queries to plans/r16/.

Usage: python tools/dump_r16_plans.py <suffix> [names...]

Pairs with the committed *_before.txt evidence: same sf0.1 corpus,
same formatted_plan() renderer.  Keep-list queries execute their CC
rounds eagerly inside fn(), so the dumped plan is the FINAL label-join
stage — identical framing before and after.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.plans.inspect import formatted_plan
from flink_s3_read_write_spark.queries import registry
from flink_s3_read_write_spark.session import build_session

DEFAULT = [
    "q33_minhash_dedup_pairs",
    "q34_simhash_near_pairs",
    "q54_dedup_keep_list",
    "q208_minhash_ring_overcap",
    "q209_simhash_ring_overcap",
    "q210_keep_list_ring",
    "q211_minhash_star2_overcap",
    "q212_keep_list_star2",
]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-r16-plans")
    reg = registry()
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        # Materialize once so cached shared builders resolve to
        # InMemoryRelations in the dumped plan (the bench's steady
        # state) and AQE final plans are available.
        df.write.format("noop").mode("overwrite").save()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(formatted_plan(reg[name].fn(spark, sf_dir)))
        print(f"dumped {name}_{suffix}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
