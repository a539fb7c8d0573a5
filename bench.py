"""Benchmark harness: times every registry query at sf0.1.

Usage: ``python bench.py [names...]``.  Respects
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and
``$SPARK_GRAFT_CPUS`` (default all cores).  Prints exactly ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query executes end-to-end through the noop sink — the full plan
runs (scan → shuffle → ... → sink) but nothing is collected to the
driver, so timings measure the engine, not result serialization.  One
warm-up query runs first so JVM/codegen startup isn't charged to the
first measured query.

Queries at or above ``$SPARK_GRAFT_BENCH_REPEAT_SEC`` (default 1.5 s)
on their first run are re-run once IN A SECOND PASS AFTER THE FULL
SWEEP and the MINIMUM is recorded: single-shot numbers are dominated
by first-use JIT/codegen of heavy operators (observed 8 s vs 0.75 s
on an unchanged rollup query round-over-round), and a back-to-back
repeat shares the same early-session compilation storm, so the second
sample must come after the JVM has fully warmed.  min-of-2 is the
stable statistic; sub-threshold queries are not repeated so the extra
wall cost stays bounded by the slow tail.

Cache policy (changed round 8, per the r07 audit directive): the SQL
storage cache PERSISTS across queries and passes — the bench measures
a steady-state analytics session in which Spark's plan-keyed
CacheManager materializes each shared builder (``queries_graph
.customer_parts`` / ``basket_po`` / ``basket_pairs`` /
``purchase_edges``) once and substitutes the InMemoryRelation into
every later consumer, exactly as a real long-lived session (or, at
100 TB, a pipeline maintaining those as persisted bucketed tables)
would.  Consequences, stated so nobody mistakes them: (a) a shared
cache fill is charged to the FIRST query that triggers it, so
per-query numbers are order-dependent; (b) second-pass re-runs of
cache-backed queries run warm, so min-of-2 reflects the steady state,
not a cold rebuild; (c) round-over-round per-query diffs across the
r07→r08 boundary compare different policies — the session TOTAL
remains the honest end-to-end statistic (it is real wall time doing
real work; repeated identical materialization was the artifact).
Correctness runs (tools/check.py, the driver's oracle gate) still
clear the cache per query so a warm cache can never mask a wrong
plan.  ``SPARK_GRAFT_BENCH_ISOLATED=1`` restores the old
clear-per-query policy for an apples-to-apples cold comparison (the
sidecar then records ``cache_policy: isolated``).

Scaling contract (r17): the output additionally records the RESOLVED
parallelism (master, ``sc.defaultParallelism``, shuffle partitions)
and the wall time of an untimed fixed-work CPU probe, so a run at a
different ``$SPARK_GRAFT_CPUS`` proves it actually ran on fewer
cores; such runs write their per-query sidecar to
``BENCH_QUERIES.c<N>.json`` instead of the canonical baseline file.
Neither addition changes what or how queries are timed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_s3_read_write_spark.queries import registry
from flink_s3_read_write_spark.session import build_session


def run_one(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    if df.isStreaming:
        return float("nan")
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("bench")
    reg = registry()
    names = sys.argv[1:] or sorted(reg)

    # Resolved-parallelism facts (r17): the r16 PERF review could not
    # distinguish "sf0.1 queries are fixed-overhead-bound" from "the
    # bench ignores $SPARK_GRAFT_CPUS" because nothing in the output
    # PROVED what parallelism the session resolved.  Emit it — plus a
    # core-sensitive CPU probe below — so low-vs-high core runs are
    # self-describing.  Queries/timing methodology unchanged.
    parallelism = {
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
        "cpus_env": os.environ.get("SPARK_GRAFT_CPUS"),
        "os_cpus": os.cpu_count(),
    }

    # Warm-up: JVM classloading + first-parquet-footer costs land here.
    try:
        run_one(reg[names[0]].fn, spark, sf_dir)
    except Exception:
        pass
    # Touch every table once (footer reads, codec init, page-cache fill)
    # so first-scan costs aren't charged to whichever query happens to
    # read a table first — per-query timings stay attributable.
    from flink_s3_read_write_spark.sources.io import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    # Pre-spawn Python workers (Arrow + numpy/pandas imports, ~8 s once
    # per session) so the first pandas_udf query isn't charged for them.
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _warm(s):
            return s * 1.0

        spark.range(256).repartition(int(spark.conf.get(
            "spark.sql.shuffle.partitions"))).select(
            _warm(F.col("id").cast("double"))).write.format("noop").mode(
            "overwrite").save()
    except Exception:
        pass
    # CPU scaling probe (r17, untimed relative to the queries): a
    # fixed-work, embarrassingly-parallel JVM job — 512M rows through a
    # 32-deep xxhash64 chain in 256 partitions, no shuffle — whose wall
    # time scales ~1/cores (measured 4.6 s on local[32] vs 14.2 s on
    # local[8], ratio 3.1x for a 4x core cut; smaller workloads drown
    # in per-task overhead).  Recorded in the sidecar + stdout so a
    # low-core driver run demonstrably resolves fewer cores (the probe
    # slows ~linearly) even when the sf0.1 per-query numbers are flat
    # with fixed per-stage overhead.  Runs AFTER the JVM warm-ups so it
    # is not polluted by codegen/classloading storms; its time is NOT
    # added to any query nor to the reported total.
    cpu_probe_sec = None
    try:
        from pyspark.sql import functions as F

        spark.sparkContext.setJobDescription("cpu_scaling_probe")
        h = F.col("id")
        for _ in range(32):
            h = F.xxhash64(h)
        t0 = time.time()
        # max(), not sum(): summing 512M xxhash64 longs overflows under
        # ANSI mode and would silently null the probe.
        spark.range(0, 512_000_000, 1, 256).select(h.alias("h")).agg(
            F.max("h")).write.format("noop").mode("overwrite").save()
        cpu_probe_sec = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    except Exception:
        pass

    # Crashed queries go to `failed`, never into the timing map — a
    # -1.0 sentinel there would silently poison any consumer that sums
    # or diffs timings round-over-round.
    repeat_sec = float(os.environ.get("SPARK_GRAFT_BENCH_REPEAT_SEC", "1.5"))
    isolated = os.environ.get("SPARK_GRAFT_BENCH_ISOLATED", "") == "1"
    times: dict[str, float] = {}
    failed: list[str] = []
    for name in names:
        try:
            times[name] = round(run_one(reg[name].fn, spark, sf_dir), 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            failed.append(name)
        finally:
            # Default: cache persists across queries — steady-state
            # session policy (module docstring); check.py always keeps
            # per-query isolation.  ISOLATED=1 restores cold runs.
            if isolated:
                spark.catalog.clearCache()
    # Second pass for slow queries, AFTER the full sweep: a back-to-back
    # min-of-2 shares whatever transient hurt the first run (early-
    # session C2/JIT compilation storms hit the alphabetically-first
    # queries, and both consecutive runs land inside the storm — seen
    # as q100/q101 at 8 s both-runs-slow while the same queries warm-
    # rerun at ~1.2 s).  Re-running at sweep end decorrelates the two
    # samples; min is the recorded statistic.  Sub-threshold queries
    # are not repeated so the extra wall cost stays bounded — EXCEPT
    # when a query blows >=2x past its committed sidecar time (+0.3 s):
    # sub-threshold queries get only one sample, so a GC/compilation
    # hiccup on a 0.4 s query records as a phantom 3x "regression"
    # that tools/bench_diff.py then flags round-over-round.
    prev: dict[str, float] = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_QUERIES.json")) as f:
            prev = json.load(f).get("queries", {})
    except (OSError, ValueError):
        pass

    def _suspicious(name: str, t: float) -> bool:
        p = prev.get(name)
        return p is not None and p > 0 and t >= 2 * p and t - p >= 0.3

    for name, t in list(times.items()):
        if t == t and (t >= repeat_sec or _suspicious(name, t)):
            try:
                times[name] = round(min(t, run_one(reg[name].fn, spark, sf_dir)), 3)
            except Exception:
                pass
            finally:
                if isolated:
                    spark.catalog.clearCache()
    # Third sample for entries STILL >=2x their committed time after
    # min-of-2 (r11): the noise on this box is heavy-tailed (same-code
    # single-query swings of 2-4x are documented in SCALE.md), and a
    # phantom two-sample "regression" costs a cross-round watch cycle
    # (q148 r9, q67 r10, q104 r11 — all closed as noise).  One more
    # decorrelated draw collapses most false flags; a real regression
    # survives all three samples.
    for name, t in list(times.items()):
        if t == t and _suspicious(name, t):
            try:
                times[name] = round(min(t, run_one(reg[name].fn, spark, sf_dir)), 3)
            except Exception:
                pass
            finally:
                if isolated:
                    spark.catalog.clearCache()
    total = round(sum(t for t in times.values() if t > 0), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")

    # Full per-query map goes to a sidecar file; the single stdout JSON
    # line stays short (slowest 15 only) so the driver's line capture
    # never truncates it (round 1 lost the tail of a 115-entry line).
    # Partial (name-filtered) runs go to a SEPARATE file so they can
    # never clobber the canonical full-corpus baseline that
    # tools/bench_diff.py and the round protocol diff against (the r07
    # incident: a 6-query re-bench replaced the committed 207-entry
    # sidecar).
    # Non-default-CPU runs additionally divert to their own sidecar
    # (r17, VERDICT r16 #4): the driver's low-core scaling pass used to
    # clobber the canonical full-core baseline in the working tree,
    # silently invalidating every cross-round per-query diff.
    cpus = parallelism["default_parallelism"]
    if sys.argv[1:]:
        sidecar_name = "BENCH_QUERIES.partial.json"
    elif isolated:
        sidecar_name = "BENCH_QUERIES.isolated.json"  # never the baseline
    elif cpus != (os.cpu_count() or cpus):
        sidecar_name = f"BENCH_QUERIES.c{cpus}.json"  # never the baseline
    else:
        sidecar_name = "BENCH_QUERIES.json"
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), sidecar_name)
    with open(sidecar, "w") as f:
        json.dump(
            {"sf": sf, "n_queries": len(times), "failed": failed,
             "cache_policy": "isolated" if isolated else "session-persistent (r08+)",
             "cpus": cpus, "parallelism": parallelism,
             "cpu_probe_sec": cpu_probe_sec,
             "queries": times},
            f, indent=1, sort_keys=True,
        )
        f.write("\n")
    slowest = dict(sorted(
        ((n, t) for n, t in times.items() if t == t),  # drop NaN streaming entries
        key=lambda kv: -kv[1])[:15])
    print(json.dumps({
        "metric": "total_wall_sec_all_queries",
        "value": total,
        "unit": "sec",
        "n_queries": len(times),
        "failed": failed,
        "queries": slowest,
        "queries_detail_file": sidecar_name,
        "parallelism": parallelism,
        "cpu_probe_sec": cpu_probe_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
