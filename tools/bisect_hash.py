"""Bisect driver-vs-local hash divergence for specific queries.

Runs each named query under a PRISTINE SparkSession (no build_session
configs — driver-like: default shuffle partitions, no Arrow/Kryo) and
its DuckDB oracle, then hashes EACH COLUMN independently to isolate
the diverging column.  Usage:

    python tools/bisect_hash.py [--sf DIR] [--tz ZONE] names...
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from flink_s3_read_write_spark.queries import registry
from flink_s3_read_write_spark.sources.io import TABLES


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def col_hashes(cols: list[str], rows: list[tuple]) -> dict[str, str]:
    out = {}
    for i, c in enumerate(cols):
        lines = sorted(_norm_cell(r[i]) for r in rows)
        out[c] = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:12]
    return out


def full_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default="UTC")
    ap.add_argument("--threads", type=int, default=None, help="duckdb threads")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bisect")
        .config("spark.sql.session.timeZone", args.tz)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    if args.threads:
        con.sql(f"SET threads={args.threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    reg = registry()
    bad = 0
    for name in args.names:
        q = reg[name]
        sdf = q.fn(spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        res = con.sql(q.oracle)
        ocols = list(res.columns)
        orows = res.fetchall()
        sh, oh = full_hash(scols, srows), full_hash(ocols, orows)
        if sh == oh:
            print(f"OK    {name}: {len(srows)} rows hash={sh}")
            continue
        bad += 1
        print(f"FAIL  {name}: spark={len(srows)}r {sh}  oracle={len(orows)}r {oh}")
        shc, ohc = col_hashes(scols, srows), col_hashes(ocols, orows)
        for c in sorted(set(shc) | set(ohc)):
            mark = "  " if shc.get(c) == ohc.get(c) else "->"
            print(f"   {mark} {c}: spark={shc.get(c)} oracle={ohc.get(c)}")
        # show first diverging rows on the diverging columns
        div = [c for c in sorted(set(shc) | set(ohc)) if shc.get(c) != ohc.get(c)]
        if div:
            si = {c: i for i, c in enumerate(scols)}
            oi = {c: i for i, c in enumerate(ocols)}
            for c in div[:2]:
                if c not in si or c not in oi:
                    print(f"      {c}: present on only one side")
                    continue
                sset = sorted(_norm_cell(r[si[c]]) for r in srows)
                oset = sorted(_norm_cell(r[oi[c]]) for r in orows)
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                for a, b in diffs:
                    print(f"      {c}: spark={a[:80]!r} oracle={b[:80]!r}")
    print(f"\n{len(args.names)-bad}/{len(args.names)} ok")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
