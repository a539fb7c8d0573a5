"""Local driver-mimic: run every registry query on Spark AND its
DuckDB oracle, compare row count + column names + order-insensitive
value hash.  Usage:

    python tools/check.py [--sf /root/testdata/sf0.01] [names...]

Exits non-zero on any mismatch.  This is the pre-flight for the
driver's CORRECTNESS_r{N}.json gate.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flink_s3_read_write_spark.queries import registry, stale_touched
from flink_s3_read_write_spark.session import build_session
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


def frame_summary(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), h


class LossyColumns(Exception):
    """A side of the comparison emits columns the driver's
    dataframe-based fetch path coerces lossily (see the messages in
    compare_query) — the pair cannot be trusted end-to-end even if the
    Python-object values happen to match."""


class EngineError(Exception):
    """One engine half of the comparison raised.  ``engine`` is
    "spark" or "duckdb" so a failure in a full-registry sweep is
    attributable to a side without re-running (ADVICE r12)."""

    def __init__(self, engine: str, exc: Exception):
        self.engine = engine
        super().__init__(f"{engine}: {type(exc).__name__}: {exc}")


def bind_oracle_views(con, sf_dir: str) -> None:
    """(Re-)bind the table views on ``con`` to ``sf_dir``'s parquet.
    CREATE OR REPLACE so a connection can be re-pointed safely."""
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'")


def connect_oracle(sf_dir: str):
    """The ONE way an oracle session is configured — main() and
    tests/test_fuzz_differential.py both use it (ADVICE r12), so the
    spill guards and view binding cannot drift between the CLI gate
    and the suite.  An in-memory DuckDB connection cannot spill, so a
    heavy oracle (e.g. a brute-force witness run against a
    scale_stress replica) would OOM-kill the whole sweep instead of
    degrading to disk: cap well under the box and give it a temp dir —
    no-ops at gate SF, survival at stress tiers.

    The cap is min(32 GB, ~70% of physical RAM) so that on a smaller
    host than the known CLI box the limit still sits under physical
    memory and actually protects (ADVICE r13); override with
    SPARK_GRAFT_ORACLE_MEM_GB."""
    mem_gb = os.environ.get("SPARK_GRAFT_ORACLE_MEM_GB")
    if not mem_gb:
        try:
            phys = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            mem_gb = str(min(32, max(1, int(phys * 0.7 / 2**30))))
        except (AttributeError, ValueError, OSError):
            mem_gb = "32"
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{mem_gb}GB'")
    con.sql("SET temp_directory='/tmp/spark_graft_duckdb_tmp'")
    bind_oracle_views(con, sf_dir)
    return con


def compare_query(spark, con, q, sf_dir: str, pandas: bool = False):
    """Run one registry query on Spark AND its DuckDB oracle and
    return ``(spark_summary, oracle_summary, srows, orows)`` where
    each summary is ``frame_summary``'s (count, sorted_cols, hash) and
    ``oracle_summary`` is None for rows-only queries.

    The ONE source of truth for the comparison protocol — main() and
    tests/test_fuzz_differential.py both go through it, so a guard or
    normalization change cannot silently diverge between the CLI gate
    and the pinned suite test.  Raises LossyColumns for pandas-lossy
    column types on either side; engine errors surface as EngineError
    tagged with the side that raised.
    """
    # Both engines MUST read the same corpus: re-bind the oracle views
    # to sf_dir here rather than trusting the caller's binding — a
    # mismatched caller would diff two different corpora and report
    # real-looking failures (ADVICE r12).
    bind_oracle_views(con, sf_dir)
    # Per-query .cache() fills must not leak across queries: a warm
    # cached table from query N would mask a missing-cache or
    # wrong-plan regression in query N+1 (and grows storage memory
    # across a full registry sweep).
    spark.catalog.clearCache()
    # Only the engine calls live inside the try blocks — the dtype
    # inspection between them is harness-local code, and wrapping it
    # too would mis-attribute a comparator bug (e.g. the decimal
    # precision parse on an unexpected dtype string) as
    # EngineError('spark') (ADVICE r13).
    try:
        sdf = q.fn(spark, sf_dir)
        sdtypes = sdf.dtypes
    except Exception as e:  # noqa: BLE001
        raise EngineError("spark", e) from e
    # array/struct/map top-level columns crash the DRIVER's pandas
    # canonicalizer ("unhashable type: 'list'") even though our
    # own hash JSON-serializes them — reject locally so local
    # green means driver green (q175 r05 lesson).
    wide_dec = [f"{c}:{t}" for c, t in sdtypes
                if t == "date"
                or t.startswith(("array<", "struct<", "map<"))
                or (t.startswith("decimal(") and int(t[8:].split(",")[0]) > 18)]
    if wide_dec:
        raise LossyColumns(
            f"pandas-lossy/unhashable Spark column(s): {wide_dec} "
            f"(cast to bigint/double/string, array_join arrays, "
            f"before returning)")
    try:
        if pandas:
            srows = [tuple(r) for r in sdf.toPandas().itertuples(index=False)]
        else:
            srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        raise EngineError("spark", e) from e
    s = frame_summary(sdf.columns, srows)
    if q.oracle is None:
        return s, None, srows, []
    try:
        res = con.sql(q.oracle)
        ocols = list(res.columns)
        otypes = [str(t) for t in res.types]
    except Exception as e:  # noqa: BLE001
        raise EngineError("duckdb", e) from e
    # Types that pandas-based comparators coerce to lossy float64
    # on the DuckDB side only (int64 Spark vs "6.0" oracle): any
    # sum(BIGINT) left as HUGEINT, or wide decimals.  The driver
    # fetches via dataframes, so these fail there even when the
    # Python-object values match — make that a LOCAL failure.
    # DATE is also fetch-path-dependent: object date vs midnight
    # datetime64 ("1995-01-01" vs "1995-01-01 00:00:00") — no
    # driver-green query has ever emitted one; use ISO strings.
    # (Harness-local inspection, deliberately OUTSIDE the engine try.)
    risky = [
        f"{c}:{t}"
        for c, t in zip(ocols, otypes)
        if "HUGEINT" in t or "UBIGINT" in t or t == "DATE"
        or "[]" in t or "STRUCT" in t or "MAP(" in t
        or (t.startswith("DECIMAL") and int(t.split("(")[1].split(",")[0]) > 18)
    ]
    if risky:
        raise LossyColumns(
            f"pandas-lossy oracle column(s): {risky} "
            f"(CAST to BIGINT/DOUBLE/VARCHAR in the oracle SQL)")
    try:
        if pandas:
            orows = [tuple(r) for r in res.df().itertuples(index=False)]
        else:
            orows = res.fetchall()
    except Exception as e:  # noqa: BLE001
        raise EngineError("duckdb", e) from e
    return s, frame_summary(ocols, orows), srows, orows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--pandas", action="store_true",
        help="fetch Spark via toPandas() and DuckDB via .df() — the "
             "dataframe path external comparators use (catches lossy "
             "type coercions fetchall() hides)",
    )
    ap.add_argument(
        "--witness-above", type=int, default=0, metavar="N",
        help="two-tier sweep protocol (r16): when the corpus has more "
             "than N documents rows, verify the expensive text-family "
             "entries (witness_oracle.WITNESS_SUBSTITUTE) with their "
             "corpus-independent witness invariants instead of the "
             "full O(docs x shingles x perms) DuckDB replay — makes "
             "the sf0.1 full-registry sweep routine (q212's replay "
             "alone is ~280 s there).  0 (default) = always full "
             "replay.  False negatives stay covered by the full "
             "replay at <= sf0.01 and the replica witness tiers.",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    stale = stale_touched()
    if stale:
        print(
            "WARN  stale _TOUCHED_THIS_ROUND entries (already confirmed "
            f"green by a post-touch sidecar — delete from queries.py): {stale}"
        )
    # Invariant (ADVICE r07): _TOUCHED_SINCE_ROUND must be the round
    # being built, i.e. its sidecar must not exist yet.  If it does, a
    # query edited NOW would be "confirmed" by a pre-edit green row.
    from flink_s3_read_write_spark import queries as _q
    _since = _q._TOUCHED_SINCE_ROUND
    if os.path.exists(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"CORRECTNESS_r{_since:02d}.json")):
        print(
            f"WARN  CORRECTNESS_r{_since:02d}.json already exists — "
            f"_TOUCHED_SINCE_ROUND={_since} is stale; bump it to the "
            f"current round BEFORE editing any query (queries.py)"
        )

    spark = build_session("check")
    con = connect_oracle(args.sf)

    witness_set: set = set()
    if args.witness_above:
        n_docs = con.sql(
            f"SELECT COUNT(*) FROM '{args.sf}/documents.parquet'"
        ).fetchone()[0]
        if n_docs > args.witness_above:
            sys.path.insert(
                0, os.path.dirname(os.path.abspath(__file__)))
            from witness_oracle import (  # noqa: PLC0415
                WITNESS_SUBSTITUTE, substitute_check)
            witness_set = set(WITNESS_SUBSTITUTE)
            print(f"witness tier active: {n_docs} docs > "
                  f"{args.witness_above} — {len(witness_set)} entries "
                  f"verified by invariants instead of full replay")

    reg = registry()
    names = args.names or sorted(reg)
    failures = 0
    for name in names:
        q = reg[name]
        t0 = time.time()
        if name in witness_set:
            spark.catalog.clearCache()
            try:
                rec = substitute_check(spark, con, q.fn, name, args.sf)
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name}: witness error: "
                      f"{type(e).__name__}: {e}")
                failures += 1
                continue
            if rec["pass"]:
                print(f"WIT   {name}: witness-substitute pass "
                      f"[{time.time()-t0:.1f}s]")
            else:
                failures += 1
                import json as _json
                print(f"FAIL  {name}: witness-substitute: "
                      f"{_json.dumps(rec, default=str)[:400]}")
            continue
        try:
            s, o, srows, orows = compare_query(
                spark, con, q, args.sf, pandas=args.pandas)
        except (LossyColumns, EngineError) as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {type(e).__name__}: {e}")
            failures += 1
            continue
        scount, scols, shash = s
        if o is None:
            print(f"rows  {name}: {scount} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        ocount, ocols_s, ohash = o
        if s == o:
            print(f"OK    {name}: {scount} rows hash={shash} [{time.time()-t0:.1f}s]")
        else:
            failures += 1
            print(f"FAIL  {name}: spark=({scount},{scols},{shash}) oracle=({ocount},{ocols_s},{ohash})")
            if scols == ocols_s and scount and ocount:
                sset = {"\x01".join(_norm_cell(v) for v in r) for r in (tuple(x) for x in srows)}
                oset = {"\x01".join(_norm_cell(v) for v in r) for r in orows}
                for d in list(sset - oset)[:3]:
                    print(f"      spark-only: {d[:200]}")
                for d in list(oset - sset)[:3]:
                    print(f"      oracle-only: {d[:200]}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
