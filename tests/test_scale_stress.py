"""Replica-builder invariants for tools/scale_stress.py (DuckDB only —
no Spark session, so this runs in milliseconds and never perturbs
timing runs).  The scaling-curve harness is only evidence if the N×
replica is actually the same workload at N× data: FKs must stay
valid, dims must stay fixed, and the document copies must be
near-duplicates with consistent metadata."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from scale_stress import DEFAULT_QUERIES, DIMS, build_replica

SRC = "/root/testdata/sf0.001"
MULT = 3


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfx"))
    build_replica(SRC, dst, MULT)
    return dst


def _count(path: str, table: str) -> int:
    return duckdb.sql(
        f"SELECT COUNT(*) FROM '{path}/{table}.parquet'"
    ).fetchone()[0]


def test_facts_scale_dims_fixed(replica):
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        assert _count(replica, t) == MULT * _count(SRC, t), t
    for t in DIMS:
        assert _count(replica, t) == _count(SRC, t), t


def test_keys_unique_and_fks_valid(replica):
    # Offset keys must not collide across copies...
    for t, k in (("orders", "o_orderkey"), ("events", "event_id"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")):
        n, d = duckdb.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT {k}) FROM '{replica}/{t}.parquet'"
        ).fetchone()
        assert n == d, t
    # ...and every lineitem must still join to an order (consistent
    # offset), every order to an (unchanged) customer.
    orphans = duckdb.sql(f"""
        SELECT COUNT(*) FROM '{replica}/lineitem.parquet' l
        WHERE NOT EXISTS (SELECT 1 FROM '{replica}/orders.parquet' o
                          WHERE o.o_orderkey = l.l_orderkey)
    """).fetchone()[0]
    assert orphans == 0
    bad_cust = duckdb.sql(f"""
        SELECT COUNT(*) FROM '{replica}/orders.parquet' o
        WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
            SELECT 1 FROM '{replica}/customer.parquet' c
            WHERE c.c_custkey = o.o_custkey)
    """).fetchone()[0]
    base_bad = duckdb.sql(f"""
        SELECT COUNT(*) FROM '{SRC}/orders.parquet' o
        WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
            SELECT 1 FROM '{SRC}/customer.parquet' c
            WHERE c.c_custkey = o.o_custkey)
    """).fetchone()[0]
    # the replica must not INTRODUCE orphans (the generator may ship some)
    assert bad_cust == MULT * base_bad


def test_document_copies_are_near_duplicates(replica):
    # copy 0 byte-identical to source; copies i>0 differ by exactly the
    # ' zc<i>' suffix, with n_chars recomputed to match.
    rows = duckdb.sql(f"""
        WITH src AS (SELECT doc_id, text FROM '{SRC}/documents.parquet'),
        rep AS (SELECT doc_id, text, n_chars FROM '{replica}/documents.parquet')
        SELECT
          SUM(CASE WHEN rep.text <> src.text || ' zc' ||
                        CAST(rep.doc_id // (SELECT MAX(doc_id)+1 FROM src)
                             AS VARCHAR)
                    AND rep.doc_id <> src.doc_id THEN 1 ELSE 0 END),
          SUM(CASE WHEN length(rep.text) <> rep.n_chars THEN 1 ELSE 0 END)
        FROM rep JOIN src
          ON rep.doc_id % (SELECT MAX(doc_id)+1 FROM src) = src.doc_id
    """).fetchone()
    assert rows == (0, 0)


def test_default_queries_registered():
    from flink_s3_read_write_spark.queries import registry

    assert set(DEFAULT_QUERIES) <= set(registry())


def test_classify_shuffle_regimes():
    """Pin the three byte-growth regimes against the values the first
    100x --shuffle-metrics run actually produced (SCALE.md r12)."""
    from scale_stress import classify_shuffle

    # q5-shaped: base shuffled 921 bytes (auto-broadcast) and 1.24 GB
    # at 100x — an SMJ whose column-pruned scan read only 33 MB
    # ENCODED (the replica's repeated values dictionary-compress ~37x)
    # — plan transition within the 64x decode-expansion envelope.
    r = {"shuffle_write_base": 921, "shuffle_write_big": 1_239_941_033,
         "rows_base": 5, "rows_big": 5, "input_bytes_big": 33_034_816}
    classify_shuffle(r, 100, 1.6)
    assert r.get("shuffle_transition") and not r.get("shuffle_superlinear")

    # q135-shaped: transition with a fact-scale OUTPUT (60M join rows)
    # — the 256 B/row output envelope covers the 4.6 GB shuffle.
    r = {"shuffle_write_base": 171, "shuffle_write_big": 4_586_709_165,
         "rows_base": 600_000, "rows_big": 60_000_000,
         "input_bytes_big": 33_034_816}
    classify_shuffle(r, 100, 1.6)
    assert r.get("shuffle_transition") and not r.get("shuffle_superlinear")

    # Runaway hidden behind a tiny base: 50 KB -> 500 GB on a 1.2 GB
    # read with no output growth exceeds every envelope term — the
    # transition label must NOT suppress the flag.
    r = {"shuffle_write_base": 50_000, "shuffle_write_big": 500_000_000_000,
         "rows_base": 5, "rows_big": 5, "input_bytes_big": 1_200_000_000}
    classify_shuffle(r, 100, 1.6)
    assert r.get("shuffle_transition") and r.get("shuffle_superlinear")

    # q34-shaped: bytes grew 321x but OUTPUT grew 29,240x — bytes
    # follow output, below the output-normalized bar.
    r = {"shuffle_write_base": 2_199_114, "shuffle_write_big": 706_445_766,
         "rows_base": 512, "rows_big": 14_971_469}
    classify_shuffle(r, 100, 1.6)
    assert not r.get("shuffle_transition")
    assert not r.get("shuffle_superlinear")

    # q54-shaped: bytes grew 2487x against 100x corpus and 100x output
    # — over the bar, reported for disposition.
    r = {"shuffle_write_base": 173_028, "shuffle_write_big": 430_290_738,
         "rows_base": 5000, "rows_big": 500_000}
    classify_shuffle(r, 100, 1.6)
    assert r.get("shuffle_superlinear")

    # Linear-in-corpus: well under the bar, no marks.
    r = {"shuffle_write_base": 2_860_392, "shuffle_write_big": 372_715_647,
         "rows_base": 31, "rows_big": 99}
    classify_shuffle(r, 100, 1.6)
    assert not r.get("shuffle_superlinear") and not r.get("shuffle_transition")


def test_rest_timestamp_parse():
    """The shuffle-metrics tier filters stages by submission time; the
    REST API renders GMT-suffixed millis, which must round-trip to the
    same epoch ms that time.time()*1000 produces on this (UTC) box."""
    from scale_stress import rest_ts_ms

    assert rest_ts_ms("1970-01-01T00:00:00.000GMT") == 0.0
    assert rest_ts_ms("1970-01-01T00:00:01.500GMT") == 1500.0
    # A real-shaped stamp: strictly increasing with the millis field.
    assert (rest_ts_ms("2026-08-16T01:33:40.124GMT")
            - rest_ts_ms("2026-08-16T01:33:40.123GMT")) == 1.0
