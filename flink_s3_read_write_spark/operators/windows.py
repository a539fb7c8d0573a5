"""Event-time window aggregation operators (SURVEY.md §2.2 streaming
row): tumbling, sliding (hopping) and session windows over the
``events`` table.

The reference has no event-time windowing at all (processing-time
only, no ``assignTimestampsAndWatermarks`` — SURVEY.md §2.2); these
are driver-mandated extensions.  Each operator is expressed with
Spark's built-in ``F.window`` / ``F.session_window``, which work
identically over batch DataFrames and streaming DataFrames — the
streaming twins in ``streaming/jobs.py`` reuse these functions
verbatim and just add a watermark.  Batch execution gives the DuckDB
oracle something exact to check; streaming semantics (late-data drop,
update/append modes) are asserted in tests/test_streaming.py.

Scale: window aggregation shuffles once on (window, key) — same cost
profile as any groupBy; session windows additionally sort within the
key partition.  Skewed keys are handled by AQE skew-join/aggregation
settings in the session factory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.numeric import dsum


def tumbling_agg(
    events: DataFrame, width: str = "6 hours", ts_col: str = "ts", key: str = "event_type"
) -> DataFrame:
    """Fixed (tumbling) windows: each event in exactly one bucket.

    Output: (w_start, w_end, key, n_events, sum_value) — window struct
    flattened so cross-engine comparison sees plain timestamp columns.
    """
    w = F.window(F.col(ts_col), width)
    return (
        events.groupBy(w.alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    width: str = "1 day",
    slide: str = "6 hours",
    ts_col: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in width/slide
    overlapping buckets.  Spark expands the event into its windows
    before the aggregate — at scale the fan-out factor IS width/slide,
    so keep the ratio small (here 4) or use tumbling + rollup."""
    w = F.window(F.col(ts_col), width, slide)
    return (
        events.groupBy(w.alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts", key: str = "user_id"
) -> DataFrame:
    """Session windows: per key, events merge while the gap between
    consecutive events is < ``gap``; the session ends ``gap`` after
    its last event (Spark ``session_window`` semantics — equivalently
    the SQL gaps-and-islands pattern, which is what the oracle runs).
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


def json_props_agg(events: DataFrame) -> DataFrame:
    """Semi-structured path: parse the JSON ``props`` column
    (``get_json_object`` — JVM-side Jackson, no UDF) and aggregate on
    an extracted field.  Stands for the JSON-functions category the
    reference lacks entirely."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
