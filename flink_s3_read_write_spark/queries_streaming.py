"""Event-time window queries (SURVEY.md §7.2 step 5) — tumbling /
sliding / session windows + JSON extraction over ``events``.

These run the exact operator functions the streaming twins use
(``operators/windows.py`` — ``F.window`` / ``F.session_window`` are
batch/streaming-unified), executed in batch so DuckDB can verify the
values exactly.  Streaming-only semantics (watermark late-drop,
update/append emission) are asserted in tests/test_streaming.py.

Oracle notes: window starts are computed epoch-free
(``TIMESTAMP '1970-01-01' + (seconds // width) * width``) to avoid
DuckDB's timezone-dependent ``to_timestamp``; Spark's default window
alignment is the same epoch-0 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_s3_read_write_spark.operators import windows as W
from flink_s3_read_write_spark.queries import register
from flink_s3_read_write_spark.sources.io import load_table

_DSUM = "CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)"
_SECS = "date_diff('second', TIMESTAMP '1970-01-01', ts)"


@register(
    "q50_tumbling_window",
    oracle=f"""
    SELECT TIMESTAMP '1970-01-01' + ({_SECS} // 21600) * 21600 * INTERVAL 1 SECOND AS w_start,
           TIMESTAMP '1970-01-01' + (({_SECS} // 21600) * 21600 + 21600) * INTERVAL 1 SECOND AS w_end,
           event_type,
           COUNT(*) AS n_events,
           {_DSUM} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Tumbling 6h event-time windows per event_type (F.window).",
)
def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_agg(load_table(spark, sf_dir, "events"), width="6 hours")


@register(
    "q51_sliding_window",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value, {_SECS} AS es FROM events),
    x AS (
      SELECT event_type, value, (es // 21600 - k.k) * 21600 AS ws
      FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) k)
    SELECT TIMESTAMP '1970-01-01' + ws * INTERVAL 1 SECOND AS w_start,
           TIMESTAMP '1970-01-01' + (ws + 86400) * INTERVAL 1 SECOND AS w_end,
           event_type,
           COUNT(*) AS n_events,
           {_DSUM} AS sum_value
    FROM x
    GROUP BY 1, 2, 3
    """,
    doc=(
        "Sliding 1d/6h windows per event_type: every event lands in 4 "
        "overlapping buckets (fan-out = width/slide, the scale knob)."
    ),
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sliding_agg(
        load_table(spark, sf_dir, "events"), width="1 day", slide="6 hours"
    )


@register(
    "q52_session_window",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL 4 HOUR
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    y AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM x)
    SELECT MIN(ts) AS s_start,
           MAX(ts) + INTERVAL 4 HOUR AS s_end,
           user_id,
           COUNT(*) AS n_events,
           {_DSUM} AS sum_value
    FROM y
    GROUP BY user_id, sid
    """,
    doc=(
        "Session windows, 4h inactivity gap, per user "
        "(F.session_window; oracle = SQL gaps-and-islands). Session "
        "end = last event + gap, matching Spark's struct end."
    ),
)
def q52_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.session_agg(load_table(spark, sf_dir, "events"), gap="4 hours")


@register(
    "q53_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction (get_json_object, JVM-side) + aggregate.",
)
def q53_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.json_props_agg(load_table(spark, sf_dir, "events"))
