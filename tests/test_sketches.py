"""Sketch aggregates (q55) vs their exact twins: approximate answers
must land within documented error bounds, and bucketed tables must
co-locate joins (zero-shuffle at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.plans import inspect as P
from flink_s3_read_write_spark.sources.io import load_table


def test_approx_count_distinct_within_hll_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    approx = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.01).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        # rsd is a standard deviation, not a bound — assert 5 sigma
        assert approx[k] == pytest.approx(n, rel=0.05)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()[0]
    assert row["approx"] == pytest.approx(row["exact"], rel=0.01)


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both fact tables on the join key removes the join
    shuffle entirely — the 100 TB answer for repeated orders⋈lineitem
    joins (SURVEY.md relational notes).  Spark reads bucket files
    already co-partitioned; the plan must contain a SortMergeJoin with
    ZERO shuffle exchanges.  (Warehouse dir is a static conf, set to a
    temp dir in conftest's session factory.)"""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders").hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        plan = P.formatted_plan(joined)
        assert P.has(plan, "SortMergeJoin"), plan
        assert P.shuffle_exchanges(plan) == 0, plan
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
