"""Pipeline observability and input-quality guards.

At 100 TB you cannot re-scan to answer "how many rows/nulls did that
job actually see" — metrics must ride along with the job.  Spark's
``observe`` API attaches accumulator-backed aggregates to a plan node:
zero extra passes, exact values, works in batch and streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, cols: list[str]) -> tuple[DataFrame, Observation]:
    """Attach row/null-count metrics to the plan.

    Returns (df, observation); after any action on ``df``,
    ``observation.get`` yields ``{"rows": n, "nulls_<col>": n, ...}``
    collected during that same pass.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}") for c in cols
    ]
    return df.observe(obs, *metrics), obs


def parse_csv_permissive(
    df: DataFrame, schema: str, col: str = "value", corrupt_col: str = "_corrupt_record"
) -> DataFrame:
    """Schema-checked CSV parse of raw lines that QUARANTINES bad rows
    instead of killing the job (the scale-grade alternative to the
    reference's parse-and-crash, ``S3FlinkAverageSalaryByCity.java:71``).

    ``from_csv`` in PERMISSIVE mode nulls unparsable fields and keeps
    the raw line in ``corrupt_col``; downstream splits good rows from
    the quarantine with one filter each.
    """
    full_schema = f"{schema}, {corrupt_col} string"
    parsed = df.withColumn(
        "_parsed",
        F.from_csv(
            F.col(col),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ),
    )
    return parsed.select(F.col(col).alias("_raw"), F.col("_parsed.*"))


def good_rows(parsed: DataFrame, corrupt_col: str = "_corrupt_record") -> DataFrame:
    return parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col, "_raw")


def quarantined_rows(parsed: DataFrame, corrupt_col: str = "_corrupt_record") -> DataFrame:
    """The rejects, with their raw line — write these to a side sink
    for reprocessing rather than losing them."""
    return parsed.filter(F.col(corrupt_col).isNotNull()).select(
        F.col("_raw").alias("raw_line")
    )
