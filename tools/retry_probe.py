"""Task-retry determinism probe: engine results must be IDENTICAL
when tasks fail transiently and are retried.

At 1000 executors task retries are routine (spot loss, OOM kill,
shuffle fetch failure).  A stage whose output depends on attempt
number, partition-iteration order, or non-reproducible per-task state
silently corrupts results under retry — the classic cluster-only bug
class a local suite never sees, because plain ``local[N]`` runs with
maxFailures=1: any task failure fails the whole job, so the retry
path never executes.  This probe runs under ``local[4, 4]`` (up to 4
attempts per task) and injects ONE transient failure at a chosen plan
point via a pass-through mapInPandas stage that raises on
(partition 0, attempt 0).  Injection is evidenced by a marker file
written before the raise (accumulator updates from FAILED tasks are
dropped by design, so a side-channel is the reliable witness in
local mode's shared filesystem).

Probed pipelines (one per retry-sensitive plan shape):
  * flaky scan -> MinHash-LSH verified pairs: retry UPSTREAM of the
    banded shuffle — the md5 signature path must be attempt-invariant;
  * flaky scan -> keyed DECIMAL agg: retry upstream of a hash
    aggregate — partial-agg state rebuilt from a re-read partition;
  * agg -> flaky -> re-agg: retry DOWNSTREAM of a shuffle — the
    retried task re-fetches shuffle blocks and must see the same rows.

Each pipeline runs clean and injected; sorted collected rows must
match exactly AND at least one injection must have fired (else the
probe is vacuous).

Usage: python tools/retry_probe.py [--sf /root/testdata/sf0.001]
Prints ONE JSON line; exit 0 iff every pipeline is deterministic
under retry and every injection fired.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flaky(df, marker_dir: str):
    """Pass-through mapInPandas stage that fails (partition 0,
    attempt 0) once — AFTER emitting its first batch, so the failed
    attempt leaves partial output behind.  That is the harder half of
    the retry-corruption class: downstream state / shuffle map output
    fed by the doomed attempt must be fully discarded, not merged with
    the retry's.  A marker file witnesses the injection (accumulator
    updates from failed tasks are dropped by design)."""

    def gen(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            for b in batches:
                yield b  # partial output from the attempt that dies
                break
            open(os.path.join(marker_dir,
                              f"p{tc.partitionId()}_a{tc.attemptNumber()}"),
                 "w").close()
            raise RuntimeError("injected transient failure (retry probe)")
        yield from batches

    return df.mapInPandas(gen, df.schema)


def rows_key(df) -> list[str]:
    return sorted("\x01".join(map(repr, r)) for r in df.collect())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # NOT build_session: retries need the ``local[cores, maxFailures]``
    # master form, and the probe should hold otherwise-default configs
    # (plus the same Arrow/TZ the engine assumes).
    spark = (
        SparkSession.builder.appName("retry_probe")
        .master("local[4, 4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from flink_s3_read_write_spark.functions.numeric import dsum
    from flink_s3_read_write_spark.operators import dedup as D
    from flink_s3_read_write_spark.sources.io import load_table

    docs = load_table(spark, args.sf, "documents")
    li = load_table(spark, args.sf, "lineitem")

    def minhash_pipeline(src):
        return D.minhash_dedup_pairs_verified(
            src, threshold=0.5, hash_src="md5", shingle_k=3)

    def keyed_agg_pipeline(src):
        return src.groupBy("l_returnflag").agg(
            dsum("l_extendedprice").alias("rev"),
            F.count("*").alias("n"))

    agg_once = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(dsum("l_extendedprice").alias("rev"), F.count("*").alias("n"))
    )

    results: dict[str, dict] = {}
    ok = True
    cases = [
        # (name, source df, pipeline over flaky source)
        ("minhash_pairs_upstream", docs, minhash_pipeline),
        ("keyed_agg_upstream", li, keyed_agg_pipeline),
        # Downstream-of-shuffle: flaky sits AFTER the first aggregate,
        # so its retry re-fetches shuffle output; re-agg proves the
        # refetched rows are identical.
        ("post_shuffle_downstream", agg_once,
         lambda src: src.groupBy("l_returnflag").agg(
             dsum("rev").alias("rev"), F.sum("n").alias("n"))),
    ]
    for name, src, pipe in cases:
        clean = rows_key(pipe(src))
        marker = tempfile.mkdtemp(prefix=f"retry_probe_{name}_")
        try:
            injected = rows_key(pipe(flaky(src, marker)))
            fired = len(os.listdir(marker))
        finally:
            shutil.rmtree(marker, ignore_errors=True)
        results[name] = {
            "rows": len(clean),
            "injections": fired,
            "equal": clean == injected,
        }
        ok = ok and fired >= 1 and clean == injected

    print(json.dumps({"master": "local[4, 4]", "sf": args.sf,
                      "pipelines": results, "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
