"""SQL interface: the engine's tables as temp views + ``spark.sql``.

The reference has no SQL layer at all (SURVEY.md §3 — its three jobs
are hand-built DataStream graphs); exposing Spark SQL is the
Spark-native way to provide the same capabilities declaratively.
Queries entered here go through exactly the same Catalyst pipeline as
the DataFrame surface — both are checked by the same DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_s3_read_write_spark.sources.io import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every synthetic table as a temp view for spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
