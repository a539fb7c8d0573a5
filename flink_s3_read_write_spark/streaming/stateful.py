"""Custom stateful streaming operators (SURVEY.md §2.2 UDF row —
beyond built-in streaming aggregates).

``applyInPandasWithState`` is the Spark-native escape hatch when the
built-in windowed/unwindowed aggregates can't express the per-key
state machine — the structural equivalent of Flink's
``KeyedProcessFunction`` + ``ValueState`` (the reference's own keyed
state usage is just a running reduce, ``S3FlinkAverageSalaryByCity
.java:75-80``, which Spark covers with groupBy().agg(); these
operators exist for the semantics that genuinely need custom state).

State is per key in the state store (RocksDB/HDFS-backed on a
cluster), Arrow-batched in and out of Python — so the Python cost is
per key-batch, not per record.  Keys are hash-partitioned; state
never leaves its partition: scales horizontally with key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "n bigint, total double, peak double"


def running_stats_fn(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key running (count, sum, max) that survives micro-batches —
    emits the updated totals once per batch in which the key appears
    (the Flink rolling-reduce emission pattern, batched)."""
    n, total, peak = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            peak = max(peak, float(pdf["value"].max()))
    state.update((n, total, peak))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "total": [total], "peak": [peak]}
    )


def running_stats_stream(events: DataFrame, key: str = "event_type") -> DataFrame:
    """Custom per-key state machine over an unbounded stream.

    Run with ``outputMode("update")``; each micro-batch emits one row
    per active key with state accumulated since stream start.  The
    output schema's key field takes its type from the grouped column
    (a hardcoded string type would break on bigint keys like user_id).
    """
    key_type = events.schema[key].dataType.simpleString()
    out_schema = f"key {key_type}, n_events bigint, total double, peak double"
    return (
        events.select(events[key].alias("key"), "value")
        .groupBy("key")
        .applyInPandasWithState(
            running_stats_fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(events: DataFrame, keys: list[str], delay: str = "10 minutes") -> DataFrame:
    """Exact dedup at ingest: first occurrence of each key survives,
    re-deliveries are dropped.

    ``dropDuplicatesWithinWatermark`` bounds the state: a key is
    remembered only while it can still legally re-arrive (watermark
    delay), so state size tracks the ingest window, not stream
    history — the only formulation that survives unbounded streams.
    """
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)


class RunningStatsProcessor:
    """``transformWithStateInPandas`` twin of ``running_stats_fn`` —
    the Spark 4 successor API (SPARK-49564): explicit typed state
    handles (ValueState here; ListState/MapState/timers available)
    instead of a single state tuple, same per-key state-store
    semantics and Arrow batching."""

    def init(self, handle) -> None:
        self._stats = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        prev = self._stats.get() if self._stats.exists() else None
        n, total, peak = prev if prev is not None else (0, 0.0, float("-inf"))
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                peak = max(peak, float(pdf["value"].max()))
        self._stats.update((n, total, peak))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total": [total], "peak": [peak]}
        )

    def close(self) -> None:
        pass


def running_stats_stream_tws(events: DataFrame, key: str = "event_type") -> DataFrame:
    """`running_stats_stream` on the transformWithStateInPandas API.

    Same emission pattern (one row per active key per micro-batch,
    ``update`` mode); state lives in a named ValueState handle the
    processor declares in ``init``, which is what makes multi-state
    operators (e.g. dedup set + aggregate + timer) expressible where
    applyInPandasWithState's single tuple gets awkward.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # Subclass dynamically so module import works even if a future
    # pyspark relocates the ABC (the methods are duck-typed anyway).
    proc = type(
        "RunningStatsProcessorTWS", (StatefulProcessor,), dict(RunningStatsProcessor.__dict__)
    )()
    key_type = events.schema[key].dataType.simpleString()
    out_schema = f"key {key_type}, n_events bigint, total double, peak double"
    return (
        events.select(events[key].alias("key"), "value")
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def streaming_ingest_dedup(
    new_docs: DataFrame,
    existing_digests: DataFrame,
    text_col: str = "text",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the q144 batch incremental dedup: a document
    stream is deduped against a *persisted* digest index AND within
    itself.

    Two stages, mirroring the batch semantics exactly:

    1. stream-static LEFT ANTI join on the md5 content digest — docs
       already in the corpus never enter the stream state (the static
       side is the dedup index; at 100 TB it is a bucketed digest
       table and the join is broadcast or co-located, re-read per
       micro-batch so index refreshes are picked up);
    2. ``dropDuplicatesWithinWatermark`` on the digest — first
       occurrence within a batch (and across batches inside the
       watermark) wins, bounding state by the watermark window
       instead of stream history.

    ``new_docs`` needs an event-time column ``ts`` for the watermark;
    ``existing_digests`` is a static 1-column (d) DataFrame.
    """
    from flink_s3_read_write_spark.operators.dedup import normalize_text

    digest = F.md5(normalize_text(F.col(text_col)))
    keyed = new_docs.withColumn("d", digest)
    fresh = keyed.join(existing_digests, "d", "left_anti")
    return fresh.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["d"])


_CLAMP_STATE = "s bigint, peak bigint, clamps bigint"


def clamped_stock_fn(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key clamped running stock s = max(0, s + delta) that
    survives micro-batches — the streaming twin of batch q205's
    applyInPandas fold, with the SAME O(1)-per-key state (level,
    peak, clamp count) carried in the state store."""
    s, peak, clamps = state.get if state.exists else (0, 0, 0)
    rows = [pdf for pdf in pdf_iter if len(pdf)]
    if rows:
        batch = pd.concat(rows).sort_values(["ts", "event_id"])
        for d in batch["delta"]:
            s += int(d)
            if s < 0:
                s = 0
                clamps += 1
            if s > peak:
                peak = s
    state.update((s, peak, clamps))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "final_stock_cents": [s],
            "peak_stock_cents": [peak],
            "n_clamps": [clamps],
        }
    )


def clamped_stock_stream(deltas: DataFrame) -> DataFrame:
    """Streaming clamped inventory over an unbounded
    (user_id, ts, event_id, delta) stream.

    Ordering contract: the clamp recurrence is order-sensitive, so
    this operator processes each key's records in ARRIVAL order
    (sorted by event time within each micro-batch) — exactly the
    contract of a Flink ``KeyedProcessFunction``, whose state loop
    also sees records as they arrive.  A source that can deliver
    late/out-of-order data needs an event-time buffer (watermark +
    sort) upstream; file sources that roll forward in time satisfy
    the contract as-is.  Run with ``outputMode("update")``: each
    micro-batch re-emits the state row for every key it touched."""
    return deltas.groupBy("user_id").applyInPandasWithState(
        clamped_stock_fn,
        outputStructType=(
            "user_id bigint, final_stock_cents bigint, "
            "peak_stock_cents bigint, n_clamps bigint"
        ),
        stateStructType=_CLAMP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
