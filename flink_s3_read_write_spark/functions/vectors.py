"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

Higher-order functions (``zip_with`` + ``aggregate``) keep the dot
product JVM-side and codegen-friendly: no Python serialization, no
UDF.  At 100 TB this is the difference between a scan-bound job and a
Python-bound one.  Elements are cast to double before multiply so the
accumulation is IEEE-double and element-ordered — deterministic for a
fixed vector, independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i, left-to-right accumulation in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot / (|a| |b|); a zero-norm side yields 0.0, NOT NaN.

    Double 0.0/0.0 is IEEE NaN (ANSI's divide-by-zero error covers
    int/decimal only), and Spark sorts NaN ABOVE every real number —
    an unguarded zero vector would rank as the #1 neighbor of every
    query in a cosine-DESC top-k.  Defining zero-norm similarity as
    0.0 keeps degenerate vectors at the bottom where they belong.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
