"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 for the driver's DuckDB-oracle correctness gate.
All real logic lives in the ``flink_s3_read_write_spark`` package;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_s3_read_write_spark.queries import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (avg-by-group, the reference's job 3 analogue)."""
    return registry()["q3_avg_by_group"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
