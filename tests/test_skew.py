"""Skew operators (operators/skew.py): salted results must be
identical to the unsalted formulation, and the salted plans must
actually spread the keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators import skew
from flink_s3_read_write_spark.plans import inspect as P
from flink_s3_read_write_spark.sources.io import load_table


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_salted_aggregate_matches_plain(li):
    plain = {
        r["l_returnflag"]: (r["n"], r["s"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("l_quantity").alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("s"),
             F.max("l_quantity").alias("mx"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], float(r["s"]), r["mx"])
        for r in skew.salted_aggregate(
            li.withColumn("qd", F.col("l_quantity").cast("decimal(30,6)")),
            "l_returnflag",
            F.col("l_orderkey"),
            {"n": ("l_quantity", "count"), "s": ("qd", "sum"), "mx": ("l_quantity", "max")},
            buckets=8,
        ).collect()
    }
    assert {k: (v[0], v[2]) for k, v in plain.items()} == {
        k: (v[0], v[2]) for k, v in salted.items()
    }
    for k in plain:
        assert salted[k][1] == pytest.approx(plain[k][1])


def test_salted_aggregate_two_exchanges(li):
    df = skew.salted_aggregate(
        li, "l_returnflag", F.col("l_orderkey"), {"n": ("l_quantity", "count")}, buckets=8
    )
    plan = P.formatted_plan(df)
    # phase 1 on (key, salt), phase 2 on key — exactly two shuffles,
    # both with partial aggregation before them
    assert P.shuffle_exchanges(plan) == 2
    assert P.has(plan, "partial_count")


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    fact = li.withColumnRenamed("l_orderkey", "o_orderkey")
    plain = fact.join(orders, "o_orderkey").groupBy("o_custkey").count()
    salted = (
        skew.salted_join(fact, orders, "o_orderkey", F.col("l_quantity"), buckets=4)
        .groupBy("o_custkey")
        .count()
    )
    a = {r["o_custkey"]: r["count"] for r in plain.collect()}
    b = {r["o_custkey"]: r["count"] for r in salted.collect()}
    assert a == b


def test_salt_is_deterministic(spark):
    df = spark.range(1000)
    a = skew.with_salt(df, F.col("id"), 16).groupBy("_salt").count().collect()
    b = skew.with_salt(df, F.col("id"), 16).groupBy("_salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 16  # all buckets hit
