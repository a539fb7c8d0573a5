"""Dump formatted plans for the r17-touched queries to plans/r17/.

Usage: python tools/dump_r17_plans.py <suffix> name...

Pairs with the committed *_before.txt evidence: same sf0.1 corpus,
same formatted_plan() renderer as the r16 evidence files.  Queries
that execute eager sub-jobs inside fn() (keep-list CC rounds) dump
the FINAL stage's plan — identical framing before and after.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.plans.inspect import formatted_plan
from flink_s3_read_write_spark.queries import registry
from flink_s3_read_write_spark.session import build_session


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-r17-plans")
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
