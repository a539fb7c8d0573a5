"""As-of (temporal) join — an operator Spark lacks natively.

Implemented as a composition of built-in ops (union + window), NOT a
per-group Pandas ``merge_asof``: the union approach is a single sort
per key partition, fully JVM-side, and never materializes a group in
one worker's memory — so a hot key (one user with 10^9 events) still
streams through the window operator, where a pandas group would OOM.

Semantics (matching DuckDB/QuestDB ASOF JOIN LEFT):
for each left row, attach the payload of the latest right row with
``right.ts <= left.ts`` and equal keys; NULLs when no such row.

Mechanics: stamp right rows 0 / left rows 1, union, then over a
window partitioned by key and ordered by (ts, side) take
``last(payload_struct, ignorenulls)`` — right rows at the same
timestamp sort before left rows, giving inclusive <= semantics.

The payloads ride in ONE struct per right row (left rows carry a NULL
struct): ``ignorenulls`` then skips exactly the left rows.  Carrying
each payload column independently would be wrong twice over — a right
row whose payload value is genuinely NULL would be skipped in favor of
an older row's value, and different payload columns could be taken
from different right rows, producing a combination no single right row
ever contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join; returns all left columns + ``asof_<payload>``."""
    l_cols = left.columns
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rhs = right.select(
        *on,
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ats"),
        F.struct(*[F.col(p).alias(p) for p in payload]).alias("_p"),
    )
    lhs_full = lhs.select(
        *l_cols, "_side", "_ats",
        F.lit(None).cast(rhs.schema["_p"].dataType).alias("_p"),
    )
    rhs_full = rhs.select(
        *[F.lit(None).cast(lhs_full.schema[c].dataType).alias(c) for c in l_cols if c not in on],
        *on, "_side", "_ats", "_p",
    ).select(*lhs_full.columns)

    unioned = lhs_full.unionByName(rhs_full)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *l_cols, "_side",
        F.last("_p", ignorenulls=True).over(w).alias("_asof"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *l_cols, *[F.col(f"_asof.{p}").alias(f"asof_{p}") for p in payload]
    )
