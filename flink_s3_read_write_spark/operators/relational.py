"""Tier B core relational operators (SURVEY.md §2.2): joins, window
functions, grouped/rollup/cube aggregation, set ops, top-k.

The reference has none of these (its only shuffle is one keyBy,
``S3FlinkAverageSalaryByCity.java:34``); they are mandated by the
driver's north star as the engine's general query surface.  Every
function is declarative DataFrame composition — Catalyst handles
pushdown, pruning, join strategy selection and AQE re-planning.

Scale notes per operator are in the docstrings; the recurring themes:
- dimension tables (region/nation/part/supplier at TPC-H ratios) are
  broadcast so fact-table joins need no shuffle of the big side;
- fact⋈fact (orders⋈lineitem) is a sort-merge join on the join key —
  at 100 TB both sides shuffle once on l_orderkey; pre-bucketing both
  tables on orderkey would remove even that (documented, not forced);
- top-k per group uses row_number + filter, which Spark executes as a
  partial top-k within partitions before the shuffle (WindowGroupLimit
  pushdown in Spark 3.5+/4.x) — no full sort of 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.numeric import davg, dsum


def revenue() -> Column:
    """l_extendedprice * (1 - l_discount) — per-row IEEE-deterministic."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate with a pushed filter.

    The shipdate predicate reaches the parquet scan (PushedFilters);
    partial aggregation runs map-side so the single shuffle carries
    |groups| x |partitions| rows only.
    """
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(revenue(), "sum_disc_price"),
        dsum(revenue() * (F.lit(1.0) + F.col("l_tax")), "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def revenue_by_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Fact⋈fact equi-join (sort-merge at scale) + re-aggregation.

    Only o_orderkey/o_orderpriority and l_orderkey/price/discount are
    read (column pruning); the join shuffles both sides once on
    orderkey, then a second small shuffle aggregates by priority.
    """
    li = lineitem.select("l_orderkey", revenue().alias("rev"))
    return (
        orders.select("o_orderkey", "o_orderpriority")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum("rev", "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def qty_by_brand(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint: part is tiny at TPC-H
    ratio (1/30 of lineitem rows, and bounded), so the join is a
    map-side hash probe — the 100 TB side never shuffles."""
    return (
        lineitem.select("l_partkey", "l_quantity")
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_items"))
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """3-hop star join: lineitem⋈orders (fact-fact) then dim hops to
    customer and nation, both broadcast.  Catalyst/AQE reorders so the
    big join happens once and dims probe map-side."""
    return (
        lineitem.select("l_orderkey", revenue().alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum("rev", "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def customers_with_big_orders(
    customer: DataFrame, orders: DataFrame, min_total: float, *, anti: bool = False
) -> DataFrame:
    """Left-semi / left-anti join (EXISTS / NOT EXISTS).

    Semi/anti ship only the join key of the probe side; the orders
    side is pre-filtered and pre-distinct'd so at scale the build side
    is as small as possible (AQE will still broadcast it if it fits).
    """
    big = orders.filter(F.col("o_totalprice") > min_total).select("o_custkey")
    how = "left_anti" if anti else "left_semi"
    joined = customer.join(big, F.col("c_custkey") == F.col("o_custkey"), how)
    return joined.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_customers"))


def topk_per_group(
    df: DataFrame, part_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number.

    Spark 3.5+/4 inserts WindowGroupLimit: each input partition keeps
    only its local top-k before the shuffle, so this is safe on 100 TB
    (never materializes a full per-group sort).  ``order_cols`` must
    be a total order (include a unique tiebreaker) for deterministic
    output.
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def running_total(
    df: DataFrame, part_cols: list[str], order_cols: list[Column], value: Column, alias: str
) -> DataFrame:
    """Running (cumulative) aggregate — frame UNBOUNDED PRECEDING..CURRENT.

    Sequential in-order accumulation is deterministic given a total
    order; partitions are independent so it scales with key count.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def diff_tables(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation: key-level diff of two table versions.

    Emits (key_cols..., status) for every key that is NOT identical
    across versions: 'added' (only in right), 'removed' (only in
    left), 'changed' (present in both, any compare column differs).
    Identical rows produce nothing, so the output is delta-sized.

    Content equality is one md5 digest over the null-tagged string
    forms of ``compare_cols`` — the full-outer join then carries ONE
    shuffle of (key, digest) pairs per side, never the full rows; at
    100 TB both sides collapse to key+digest projections before the
    join (co-located if the snapshots share bucketing).
    """
    def digest(df: DataFrame) -> Column:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in compare_cols
        ]
        return F.md5(F.concat_ws("\x01", *parts))

    l = left.select(*key_cols, digest(left).alias("_ld"))
    r = right.select(*key_cols, digest(right).alias("_rd"))
    j = l.join(r, key_cols, "full_outer")
    status = (
        F.when(F.col("_ld").isNull(), "added")
        .when(F.col("_rd").isNull(), "removed")
        .when(F.col("_ld") != F.col("_rd"), "changed")
    )
    return j.select(*key_cols, status.alias("status")).filter(F.col("status").isNotNull())
