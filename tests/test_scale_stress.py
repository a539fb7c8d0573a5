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
