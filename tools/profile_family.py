"""Profile a set of registry queries in ONE bench-like session.

Usage: python tools/profile_family.py [--plans-dir plans/r16 --suffix _before] name...

Runs each named query through the noop sink in order (session-persistent
cache, exactly like bench.py's policy), prints per-query wall seconds,
and optionally dumps `.explain("formatted")` text per query.  Evidence
tool for OPTIMIZATION_r16.md — not part of the driver contract.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.queries import registry
from flink_s3_read_write_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = build_session("profile_family")
    reg = registry()
    # Same warm-up as bench.py: first query untimed + table touch +
    # python worker pre-spawn, so numbers are comparable.
    from flink_s3_read_write_spark.sources.io import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, args.sf, t).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _warm(s):
            return s * 1.0

        spark.range(256).repartition(32).select(
            _warm(F.col("id").cast("double"))).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    for r in range(args.repeat):
        for name in args.names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = reg[name].fn(spark, args.sf)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            t_all = time.time() - t0
            print(f"PROF pass={r} {name}: total={t_all:.3f}s build={t_build:.3f}s", flush=True)
            if args.plans_dir and r == 0:
                os.makedirs(args.plans_dir, exist_ok=True)
                p = os.path.join(args.plans_dir, f"{name}{args.suffix}.txt")
                with open(p, "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
