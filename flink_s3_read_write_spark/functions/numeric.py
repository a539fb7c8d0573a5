"""Numeric expression helpers shared by the query surface.

Cross-engine determinism: a plain ``SUM(double)`` is
accumulation-order-dependent, so a Spark partial/final hash aggregate
and a single-threaded oracle can differ in the last ulp.  ``dsum``
routes the sum through ``DECIMAL(30,6)`` — exact, order-independent —
then casts the total back to ``double``, giving bit-identical results
on any partitioning/engine.  The same trick keeps our own results
stable between local[32] and a 1000-executor cluster, which matters
for reproducible pipelines, not just for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6 comfortably covers the synthetic data's 2-decimal money
# values; precision 30 leaves headroom for 100 TB row counts
# (10^24 units) before overflow→null.
_DEC = "decimal(30,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent double sum: SUM(CAST(x AS DECIMAL)) → double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum, then one double divide.

    (Decimal division is avoided on purpose: result precision/scale
    rules differ across engines; double division of two deterministic
    operands is itself deterministic.)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def round9_exact(num: str, den: str) -> Column:
    """``round(num/den, 9)`` with HALF_UP (away from zero) computed in
    EXACT integer arithmetic — the cross-engine-safe form of a rounded
    rational (r16).

    Why: ``round(double, 9)`` diverges between Spark (HALF_UP on the
    double's shortest decimal repr) and DuckDB (binary-double scaling)
    whenever the TRUE quotient's decimal expansion terminates at digit
    10 with a 5 and the value is not a dyadic rational — probed and
    measured (1092 divergent boundaries among the u/(2^10*5^k)
    fraction family alone; the q183/q88 class).  Any rounded output
    that IS a rational of two in-scope integers therefore rounds the
    integers, not the double:

        sign(num) * ((2*|num|*10^9 + den) DIV (2*den)) / 1e9

    ``num``/``den`` are SQL expression strings over INTEGER-VALUED
    columns (pre-scale decimals: cents, micros).  Arithmetic runs in
    DECIMAL(38,0) (Spark) so products like marginal*marginal never
    overflow int64; the oracle twin (``round9_exact_sql``) uses
    HUGEINT.  Width guard (documented, same class as q183's
    rev_micros): the QUOTIENT |num/den|*1e9 must fit int64, i.e.
    |value| < 9.2e9 — true for every fraction/ratio/expectation in
    the registry at any tested SF; Spark's decimal ``div`` narrows to
    long WITHOUT an ANSI error, so a site whose rounded value could
    exceed 9.2e9 must not use this helper.  den = 0 yields NULL on
    both engines — an IMPROVEMENT on the raw form, which raised
    DIVIDE_BY_ZERO under Spark's ANSI default; no registry site can
    reach it (denominators are GROUP BY counts >= 1 or NOT-NULL
    guarded), so this branch is defensive, not semantic.
    """
    return roundn_exact(num, den, 9)


def roundn_exact(num: str, den: str, dp: int) -> Column:
    """:func:`round9_exact` at an arbitrary decimal grid ``dp``
    (q3_formatted's reference-faithful 2-dp money mean uses dp=2)."""
    g = 10 ** dp
    return F.expr(
        f"CASE WHEN ({den}) = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END * "
        f"((CAST(2 AS DECIMAL(38,0)) * abs(CAST(({num}) AS DECIMAL(38,0))) "
        f"  * {g} + CAST(({den}) AS DECIMAL(38,0))) "
        f" div (CAST(2 AS DECIMAL(38,0)) * CAST(({den}) AS DECIMAL(38,0)))) "
        f"AS DOUBLE) / {float(g)!r} END"
    )


def round9_exact_sql(num: str, den: str) -> str:
    """DuckDB twin of :func:`round9_exact` — substitute into oracle
    SQL strings.  HUGEINT arithmetic; the intermediate never escapes
    (cast back to BIGINT then DOUBLE), so the pandas-lossy HUGEINT
    guard in tools/check.py is not tripped."""
    return roundn_exact_sql(num, den, 9)


def roundn_exact_sql(num: str, den: str, dp: int) -> str:
    """DuckDB twin of :func:`roundn_exact`."""
    g = 10 ** dp
    return (
        f"CASE WHEN ({den}) = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END * "
        f"CAST(((CAST(2 AS HUGEINT) * abs(CAST(({num}) AS HUGEINT)) "
        f"  * {g} + CAST(({den}) AS HUGEINT)) "
        f" // (CAST(2 AS HUGEINT) * CAST(({den}) AS HUGEINT))) AS BIGINT) "
        f"AS DOUBLE) / {float(g)!r} END"
    )


def strict_double(col: Column | str, alias: str | None = None) -> Column:
    """Fail-fast numeric cast.

    The reference's ``Double.parseDouble`` throws on malformed input
    (``S3FlinkAverageSalaryByCity.java:71``) where Spark's ``cast``
    yields NULL.  ``raise_error`` inside ``when`` reproduces the
    fail-fast contract declaratively (SURVEY.md §2.3.4).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast (NULL on malformed) + explicit raise: identical behavior
    # whether or not spark.sql.ansi.enabled — plain cast would throw its
    # own error under ANSI and mask ours.
    casted = c.try_cast("double")
    out = F.when(c.isNotNull() & casted.isNull(),
                 F.raise_error(F.concat(F.lit("strict_double: malformed numeric: "), c))
                 ).otherwise(casted)
    return out.alias(alias) if alias else out
