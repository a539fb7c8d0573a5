"""Tier A faithful operators: the reference's entire record-at-a-time
surface re-expressed as Catalyst column expressions (SURVEY.md §2.1).

Every function here is a pure ``DataFrame -> DataFrame`` transform on
a raw-text frame (single ``value: string`` column, as produced by
``sources.read_text_lines``).  The Flink originals are per-record Java
callbacks; these lower onto whole-stage-codegen'd projections, so the
chain scan→parse→filter→project fuses into one stage with zero
shuffles — same shape as Flink's operator chaining, but vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.numeric import davg, strict_double

# Column positions in the reference's salary fixture
# (header ID,Name,Age,City,Salary — salary.csv:1; positional access at
# S3FlinkAverageSalaryByCity.java:64,71).
CITY_IDX = 3
SALARY_IDX = 4


def uppercase_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """A3 — ``.map(String::toUpperCase)`` (S3ReadWriteExample.java:26)."""
    return df.select(F.upper(F.col(col)).alias(col))


def tokenize_csv(df: DataFrame, col: str = "value", out: str = "fields") -> DataFrame:
    """A4 — naive ``value.split(",")``, no quoting/escaping
    (S3FlinkFilterJacksonville.java:58-63).

    Note: Java ``String.split`` drops trailing empty fields, Spark
    ``split`` keeps them (SURVEY.md §2.3.3); ``-1``-limit split is
    Spark's default and we document rather than emulate the Java quirk
    (no fixture exercises it).
    """
    return df.select(F.split(F.col(col), ",").alias(out))


def filter_excluding_city(
    df: DataFrame, city: str = "Jacksonville", *, drop_header: bool = False, fields: str = "fields"
) -> DataFrame:
    """A5/A6 — keep rows with >=4 fields whose city != ``city``
    (S3FlinkFilterJacksonville.java:66-71).

    With ``drop_header=False`` the CSV header row intentionally
    *passes* ("City" != "Jacksonville") — the reference's Q2 output
    retains the header (SURVEY.md §2.3.2).  ``drop_header=True`` adds
    the header conjunct of S3FlinkAverageSalaryByCity.java:64.
    """
    c = F.col(fields)
    pred: Column = (F.size(c) > CITY_IDX) & (c.getItem(CITY_IDX) != city)
    if drop_header:
        pred = pred & (c.getItem(CITY_IDX) != "City")
    return df.filter(pred)


def rejoin_csv(df: DataFrame, fields: str = "fields", out: str = "value") -> DataFrame:
    """A7 — ``String.join(",", fields)`` (S3FlinkFilterJacksonville.java:74-79)."""
    return df.select(F.array_join(F.col(fields), ",").alias(out))


def extract_city_salary(df: DataFrame, fields: str = "fields") -> DataFrame:
    """A8 — positional extract + strict double cast
    (S3FlinkAverageSalaryByCity.java:68-73).  ``strict_double``
    reproduces Double.parseDouble's fail-fast on malformed input."""
    c = F.col(fields)
    return df.select(
        c.getItem(CITY_IDX).alias("city"),
        strict_double(c.getItem(SALARY_IDX), "salary"),
    )


def avg_salary_by_city(df: DataFrame) -> DataFrame:
    """A9+A10+A11 final state — groupBy(city).agg(avg, count)
    (S3FlinkAverageSalaryByCity.java:34-35,75-88).

    Catalyst's partial+final HashAggregate subsumes the reference's
    manual (sum, count) Tuple3 and is strictly better at scale: Flink
    ships every record across the keyBy network shuffle raw, Spark
    pre-aggregates map-side so the exchange carries one row per
    (partition, city).  Per-record emission (Flink unwindowed rolling
    reduce) is reproduced by the streaming twin in
    ``streaming.jobs.avg_by_key_update_stream`` (SURVEY.md §2.3.1).
    """
    return df.groupBy("city").agg(
        davg("salary", "avg_salary"),
        F.count(F.lit(1)).alias("cnt"),
    )


def format_avg_output(df: DataFrame) -> DataFrame:
    """A11 output shape — ``"%s,%.2f,%d"`` (HALF_UP two decimals,
    S3FlinkAverageSalaryByCity.java:86).  ``format_string`` delegates
    to the same JVM String.format, so parity is exact."""
    return df.select(
        F.format_string("%s,%.2f,%d", "city", "avg_salary", "cnt").alias("value")
    )
