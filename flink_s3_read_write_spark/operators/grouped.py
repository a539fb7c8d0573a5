"""Grouped-map and scalar Pandas-UDF operators.

Completes the engine's Python-extension surface (SURVEY.md §2.2 UDF
row): ``mapInPandas`` (multimodal.py), ``applyInPandasWithState``
(streaming/stateful.py), and here the batch grouped-map
(``applyInPandas``) and vectorized scalar (``@pandas_udf``) shapes.

Rule of thumb encoded in this module: if Catalyst can express it,
Catalyst wins — ``zscore_catalyst`` is the production path (JVM,
oracle-checkable, exact); ``zscore_pandas`` exists for semantics that
genuinely need per-group ndarray work (sklearn transforms, per-group
model scoring) and is tested equivalent within float tolerance.

Grouped-map caveat at scale: ``applyInPandas`` materializes EACH GROUP
in one worker's memory — safe for bounded groups (entities, buckets),
wrong for unbounded hot keys (use window functions or
applyInPandasWithState instead).  That constraint is why the z-score
default is the window-function formulation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def zscore_catalyst(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group z-score via window functions — no Python, exact,
    hot-key safe (a windowed agg never materializes the group).

    Moments are decimal-routed (sum and sum-of-squares as
    DECIMAL(30,6)) so the result is identical under any partitioning
    and engine — a plain ``stddev_samp`` is a float accumulation whose
    last ulp depends on aggregation order (functions/numeric.py).
    """
    w = Window.partitionBy(key)
    v = F.col(value)
    # Bind each window aggregate to a column FIRST: window expressions
    # get no common-subexpression elimination, so reusing the s1/s2/n
    # Column objects textually would make the Window operator compute
    # 13 running aggregates instead of 3 (observed in the physical
    # plan before this projection was introduced).
    bound = df.select(
        "*",
        F.sum(v.cast("decimal(30,6)")).over(w).cast("double").alias("_s1"),
        F.sum((v * v).cast("decimal(30,6)")).over(w).cast("double").alias("_s2"),
        F.count(v).over(w).cast("double").alias("_n"),
    )
    s1, s2, n = F.col("_s1"), F.col("_s2"), F.col("_n")
    # greatest(0, ·): decimal quantization of the moments can push the
    # computed variance epsilon-negative, and sqrt(<0) is NaN — which
    # Spark orders ABOVE every number, so a bare `std > 0` guard would
    # pass and emit NaN zscores.  Clamping makes the guard sound.
    var = F.greatest((s2 - s1 * s1 / n) / (n - F.lit(1.0)), F.lit(0.0))
    std = F.sqrt(var)
    mean = s1 / n
    return bound.withColumn(
        "zscore",
        F.when((n > 1) & (std > 0), (v - mean) / std).otherwise(F.lit(0.0)),
    ).drop("_s1", "_s2", "_n")


def zscore_pandas(df: DataFrame, key: str, value: str) -> DataFrame:
    """Grouped-map twin: each group arrives as one pandas DataFrame.
    Stand-in for genuinely-pandas per-group logic; asserted equivalent
    to the Catalyst path in tests/test_grouped.py.

    (Output schema is built as a NEW StructType — ``df.schema.add``
    mutates the DataFrame's cached schema in place, desyncing it from
    the analyzed plan.)"""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField("zscore", DoubleType())])

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value].std(ddof=1)
        if pd.isna(std) or std == 0:
            pdf["zscore"] = 0.0
        else:
            pdf["zscore"] = (pdf[value] - pdf[value].mean()) / std
        return pdf

    return df.groupBy(key).applyInPandas(norm, schema)


def sigmoid_udf():
    """Vectorized scalar Pandas UDF (Arrow batches, ~10-100× faster
    than a row-at-a-time Python UDF).  Built lazily — the decorator
    resolves its return type through the active session, and the
    registry must be importable without one."""

    @pandas_udf("double")
    def sigmoid(v: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-v))

    return sigmoid


def geometric_mean_udf():
    """Grouped-AGG pandas UDF (the third vectorized shape next to
    scalar and grouped-map): usable inside ``groupBy().agg()`` and as
    a window function. Geometric mean is a real example of an
    aggregate Spark lacks natively; Arrow ships each group's column
    once, NumPy reduces it.

    Scale note: grouped-agg UDFs receive the WHOLE group like
    applyInPandas does — fine for bounded groups; unbounded hot keys
    want a log-sum rewrite on native exp(avg(ln(x))) instead (exact
    same math, partial-aggregatable).
    """
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:  # scalar return = GROUPED_AGG
        x = v.to_numpy(dtype="float64")
        x = x[x > 0]
        if len(x) == 0:
            return float("nan")
        return float(np.exp(np.log(x).mean()))

    return geo_mean


def clamped_running_stock_window(ev: DataFrame) -> DataFrame:
    """Floor-at-zero running total per key — as pure window functions.

    ``s_i = max(0, s_{i-1} + delta_i)`` looks like it defeats window
    frames (every prefix depends on every earlier clamp decision), but
    the zero-floor case has a closed form over prefix sums
    ``P_i = Σ_{j≤i} delta_j``:

        s_i = P_i − min(0, min_{j≤i} P_j)

    (each clamp resets the baseline to the running-minimum prefix; a
    two-sided clamp [lo, hi] has no such form and genuinely needs the
    sequential fold below).  Clamp events are exactly the steps where
    ``P_i − min(0, min_{j<i} P_j) < 0``.  Everything is one shuffle by
    key + one sort — whole-stage-codegen window frames, no Python, and
    the same plan shape the naive fold's shuffle would need anyway.

    ``ev`` needs columns (user_id, ts, event_id, delta:bigint); output
    is (user_id, final_stock_cents, peak_stock_cents, n_clamps), all
    bigint.  Proven equivalent to the sequential pandas fold in
    tests/test_query_extras.py.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    zero = F.lit(0).cast("bigint")
    staged = ev.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum("delta").over(wcur).alias("p"),
        F.least(zero, F.min(F.sum("delta").over(wcur)).over(wcur)).alias("m"),
        F.least(
            zero, F.coalesce(F.min(F.sum("delta").over(wcur)).over(wprev), zero)
        ).alias("mp"),
    )
    return staged.groupBy("user_id").agg(
        F.max_by(F.col("p") - F.col("m"), F.col("rn")).alias("final_stock_cents"),
        F.max(F.col("p") - F.col("m")).alias("peak_stock_cents"),
        F.sum(F.when(F.col("p") - F.col("mp") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_clamps"),
    )


def clamped_running_stock_pandas(ev: DataFrame) -> DataFrame:
    """The same clamped fold as an Arrow-batched ``applyInPandas``
    keyed scan — the escape-hatch shape for recurrences that have NO
    prefix-sum identity (two-sided clamps, state machines): sequential
    per key exactly like a Flink keyed process function, parallel
    across keys, O(1) state per group.  Kept as the documented twin of
    ``clamped_running_stock_window``; deliberately kept as the LITERAL
    sequential definition (per-row fold, not the prefix-sum identity)
    so the equivalence test is a genuinely independent witness."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = peak = clamps = 0
        for d in pdf["delta"]:
            s += int(d)
            if s < 0:
                s = 0
                clamps += 1
            if s > peak:
                peak = s
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "final_stock_cents": [s],
                "peak_stock_cents": [peak],
                "n_clamps": [clamps],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        fold,
        "user_id bigint, final_stock_cents bigint, "
        "peak_stock_cents bigint, n_clamps bigint",
    )
