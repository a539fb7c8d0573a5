"""Observability + input-quality guards (operators/quality.py) and
source backpressure (maxFilesPerTrigger)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators import quality as Q
from flink_s3_read_write_spark.streaming import jobs


def test_observe_counts_rows_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id long, s string"
    )
    observed, obs = Q.observed(df, "m", ["s"])
    assert observed.count() == 4  # the action that populates the observation
    assert obs.get == {"rows": 4, "nulls_s": 2}


def test_permissive_csv_quarantines_bad_rows(spark):
    lines = ["1,alpha,10.5", "2,beta,not_a_number", "3,gamma,7.25"]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = Q.parse_csv_permissive(df, "id int, name string, score double")
    good = Q.good_rows(parsed).collect()
    bad = Q.quarantined_rows(parsed).collect()
    assert {(r["id"], r["name"], r["score"]) for r in good} == {
        (1, "alpha", 10.5), (3, "gamma", 7.25),
    }
    assert [r["raw_line"] for r in bad] == ["2,beta,not_a_number"]


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    src = str(tmp_path / "bp")
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    t0 = datetime(2024, 1, 1)
    for i in range(3):  # three separate files
        spark.createDataFrame([(i, t0, 1, "x", 1.0, "{}")], schema) \
            .coalesce(1).write.mode("append").parquet(src)
    stream = jobs.events_stream(spark, src, max_files_per_trigger=1)
    counts = stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
    q = counts.writeStream.format("memory").queryName("t_bp").outputMode("complete").start()
    try:
        q.processAllAvailable()
        progress = q.recentProgress
        input_rows = [p["numInputRows"] for p in progress if p["numInputRows"] > 0]
        # 3 files, 1 per trigger -> at least 3 non-empty batches of 1 row
        assert len(input_rows) >= 3
        assert all(n == 1 for n in input_rows)
        assert spark.table("t_bp").collect()[0]["n"] == 3
    finally:
        q.stop()
