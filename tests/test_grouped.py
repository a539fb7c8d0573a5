"""Grouped-map + scalar Pandas-UDF operators (operators/grouped.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators import grouped as G
from flink_s3_read_write_spark.sources.io import load_table


def test_pandas_zscore_matches_catalyst(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    a = {r["event_id"]: r["zscore"] for r in G.zscore_catalyst(ev, "event_type", "value").collect()}
    b = {r["event_id"]: r["zscore"] for r in G.zscore_pandas(ev, "event_type", "value").collect()}
    assert set(a) == set(b)
    for k in a:
        assert b[k] == pytest.approx(a[k], rel=1e-9, abs=1e-12)


def test_zscore_degenerate_group(spark):
    df = spark.createDataFrame([(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0)],
                               "event_id long, event_type string, value double")
    out = {r["event_id"]: r["zscore"] for r in G.zscore_catalyst(df, "event_type", "value").collect()}
    assert out[1] == 0.0 and out[2] == 0.0   # zero variance -> 0, not NaN
    assert out[3] == 0.0                     # singleton group


def test_sigmoid_pandas_udf(spark):
    df = spark.createDataFrame([(0.0,), (2.0,), (-2.0,)], "x double")
    got = {r["x"]: r["s"] for r in df.select("x", G.sigmoid_udf()(F.col("x")).alias("s")).collect()}
    for x, s in got.items():
        assert s == pytest.approx(1.0 / (1.0 + math.exp(-x)), rel=1e-12)


def test_geometric_mean_grouped_agg(spark, sf_dir):
    import math

    from flink_s3_read_write_spark.operators.grouped import geometric_mean_udf
    from flink_s3_read_write_spark.sources.io import load_table

    geo = geometric_mean_udf()
    o = load_table(spark, sf_dir, "orders")
    got = {
        r.o_orderpriority: r.g
        for r in o.groupBy("o_orderpriority").agg(geo("o_totalprice").alias("g")).collect()
    }
    # native log-sum twin (the partial-aggregatable rewrite for hot keys)
    ref = {
        r.o_orderpriority: r.g
        for r in o.filter(F.col("o_totalprice") > 0)
        .groupBy("o_orderpriority")
        .agg(F.exp(F.avg(F.log("o_totalprice"))).alias("g"))
        .collect()
    }
    assert set(got) == set(ref)
    for k in ref:
        assert math.isfinite(got[k]) and abs(got[k] - ref[k]) / ref[k] < 1e-9
