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
