"""Runtime Bloom-filter join pruning (AQE runtime filters).

At 100 TB the highest-leverage join optimization after broadcasting is
a runtime filter: when one join side is selectively filtered, Spark
builds a Bloom filter over its join keys and pushes a might_contain()
predicate into the other side's scan, discarding non-matching rows
before the shuffle.  The feature is on by default
(spark.sql.optimizer.runtime.bloomFilter.enabled) but only injects
when the probe side scan exceeds
``applicationSideScanSizeThreshold`` (10 GB default) — these tests
lower the thresholds to prove the engine's plans take the filter when
the size conditions hold, which is exactly the regime the real
cluster runs in.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.sources.io import load_table

_CONFS = {
    # Make injection possible at test scale.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # Force a shuffle join: a broadcast join needs no runtime filter
    # (the small side's keys ride along with the broadcast anyway).
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {}
    for k, v in _CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_on_selective_join(spark, sf_dir, bloom_conf):
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 500000
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, plan[:2000]
    # The filter must sit on the fact (application) side scan branch.
    assert "bloom_filter_agg" in plan
    # And the query still answers correctly with the filter in place.
    rows = {r.o_orderpriority: r.n for r in joined.collect()}
    expected = {
        r.o_orderpriority: r.n
        for r in li.join(
            load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 500000).hint("broadcast"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == expected


def test_no_bloom_filter_when_probe_side_small(spark, sf_dir):
    # Default thresholds: at sf0.001 nothing clears the 10 GB probe-side
    # bar, so no filter is injected — the optimization must not fire
    # where the extra aggregate would cost more than it saves.
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 500000
    )
    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "might_contain" not in plan
