"""Property tests for the exact-rational rounding helpers (r16).

`round9_exact` (Spark) and `round9_exact_sql` (DuckDB) must BOTH equal
the ground-truth HALF_UP (away from zero) rounding of the exact
rational num/den at the 1e-9 grid — including on the probed
engine-divergent boundary family u/(2^10*5^k) where the raw
round(double, 9) forms disagree, and including negatives, zero
numerators, and den=0 (which must reproduce the raw IEEE behavior,
NaN/±inf, not an engine error).
"""

from __future__ import annotations

import math
import random
from fractions import Fraction

import duckdb
import pytest

from flink_s3_read_write_spark.functions.numeric import (
    round9_exact,
    round9_exact_sql,
)


def _truth(n: int, d: int):
    if d == 0:
        return None  # helper contract: NULL (raw form RAISED under ANSI)
    q = Fraction(abs(n) * 10**9, d)
    m = (2 * q.numerator + q.denominator) // (2 * q.denominator)
    return (-m if n < 0 else m) / 1e9


def _cases() -> list[tuple[int, int]]:
    rng = random.Random(9)
    cases = []
    # the probed divergent boundary family: u/(2^10*5^k), u odd
    for k in (1, 2):
        den = 1024 * 5**k
        cases += [(u, den) for u in
                  (41, 169, 323, 333, 343, 163841, 163861)]
        cases += [(-u, den) for u in (41, 163841)]
    # dyadic boundaries (engines agree raw — exact must too)
    cases += [(25585, 1024), (-25585, 1024), (46171, 4096)]
    # random rationals, mixed signs and magnitudes
    for _ in range(60):
        cases.append((rng.randint(-10**12, 10**12),
                      rng.randint(1, 10**9)))
    # wide products (the DECIMAL(38,0)/HUGEINT path: num beyond int64
    # after the *2e9 scaling)
    cases += [(123456789012345678, 99998300000000000),
              (-987654321098765432, 77777777777777777)]
    # zero numerator and den=0 IEEE reproduction
    cases += [(0, 7), (0, 5120)]
    return cases


def test_round9_exact_matches_rational_truth(spark):
    cases = _cases()
    rows = spark.createDataFrame(cases, "n long, d long").select(
        round9_exact("n", "d").alias("r")).collect()
    for (n, d), row in zip(cases, rows):
        assert row.r == _truth(n, d), (n, d, row.r, _truth(n, d))

    con = duckdb.connect()
    expr = round9_exact_sql("n", "d")
    for n, d in cases:
        got = con.sql(
            f"SELECT {expr} FROM (SELECT CAST({n} AS BIGINT) n, "
            f"CAST({d} AS BIGINT) d)").fetchone()[0]
        assert got == _truth(n, d), (n, d, got, _truth(n, d))


def test_round9_exact_den_zero_is_null_not_error(spark):
    """den=0 must be a defined NULL on both engines, not an engine
    error (the raw double form RAISED DIVIDE_BY_ZERO under Spark's
    ANSI default — the helper is strictly more defined)."""
    rows = spark.createDataFrame(
        [(5, 0), (-5, 0), (0, 0)], "n long, d long").select(
        round9_exact("n", "d").alias("r")).collect()
    assert [r.r for r in rows] == [None, None, None]
    con = duckdb.connect()
    expr = round9_exact_sql("n", "d")
    vals = [con.sql(f"SELECT {expr} FROM (SELECT CAST({n} AS BIGINT) n, "
                    f"CAST(0 AS BIGINT) d)").fetchone()[0]
            for n in (5, -5, 0)]
    assert vals == [None, None, None]


def test_raw_round_still_diverges_on_boundary(spark):
    """Non-vacuity anchor: the raw round(double, 9) forms must still
    disagree across engines on the probed boundary — if they ever
    converge, the helper's reason-for-being has moved and the pins
    should be revisited (same sentinel as the snap-groups test)."""
    s = spark.sql(
        "SELECT round(CAST(41 AS DOUBLE)/5120, 9)").collect()[0][0]
    d = duckdb.sql(
        "SELECT round(CAST(41 AS DOUBLE)/5120, 9)").fetchone()[0]
    assert s != d, "raw round paths now agree at 41/5120 — re-probe"
    assert _truth(41, 5120) == s  # Spark's HALF_UP is the exact one here
