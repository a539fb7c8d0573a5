"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in the session factory) handles
most runtime skew; these operators are for the cases AQE can't fix:

- ``salted_aggregate`` — a groupBy whose *aggregation state* is what
  skews (e.g. collect_set/exact-distinct on a hot key): one reducer
  would own the whole hot key.  Two phases: aggregate on
  (key, salt) — hot key's load spreads over ``buckets`` reducers —
  then merge the partials per key.  Works for any algebraic aggregate
  (sum/count/min/max shown; mergeable by construction).
- ``salted_join`` — fact⋈dim where one fact key is hot and the dim is
  too big to broadcast: replicate each dim row ``buckets`` times with
  an explicit salt, salt the fact side randomly-but-deterministically
  (hash of a row id), join on (key, salt).  The hot key's rows land
  on ``buckets`` different reducers instead of one.

Both trade ``buckets``× more partial state / dim replication for an
even load — the standard deal at 100 TB where a single hot reducer
otherwise runs for hours.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_src: Column, buckets: int, col: str = "_salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, buckets) derived from a
    row-identifying column — reproducible across retries (a random()
    salt breaks task-retry idempotence)."""
    return df.withColumn(col, F.pmod(F.xxhash64(salt_src), F.lit(buckets)))


def salted_aggregate(
    df: DataFrame,
    key: str,
    salt_src: Column,
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}.  Phase 1 groups by (key, salt); phase 2
    merges per key (count merges with sum).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = with_salt(df, salt_src, buckets)
    p1 = salted.groupBy(key, "_salt").agg(
        *[phase1_fns[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return p1.groupBy(key).agg(
        *[mergers[fn](out).alias(out) for out, (_c, fn) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_salt_src: Column,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim replicated ``buckets``×, fact salted
    deterministically; join on (key, salt) spreads each hot key over
    ``buckets`` reducers.  Use only when the dim side is too large to
    broadcast — broadcast is strictly better when it fits.

    Only inner/left joins are allowed: an outer join that preserves
    the replicated dim side would emit ``buckets`` null-padded copies
    of every unmatched dim row.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: outer "
            "joins preserving the replicated dim side would duplicate "
            "unmatched dim rows buckets x"
        )
    salted_fact = with_salt(fact, fact_salt_src, buckets)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")
