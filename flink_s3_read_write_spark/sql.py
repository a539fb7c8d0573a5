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
    """Expose every synthetic table as a temp view for spark.sql.

    Registration is skipped when this session's views already point at
    ``sf_dir`` (r16): every SQL-text query calls this, and re-running
    ten catalog registrations per call is pure per-query driver
    overhead.  A different ``sf_dir`` re-registers (the views must
    follow the corpus), and ``session.reset_plan_memos`` clears the
    marker along with the other plan memos."""
    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = None
    if app is not None and _VIEWS_REGISTERED.get(app) == sf_dir:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    if app is not None:
        _VIEWS_REGISTERED[app] = sf_dir


# applicationId -> sf_dir whose tables the session's views expose.
_VIEWS_REGISTERED: dict[str, str] = {}


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ``query`` against the engine tables as temp views.

    CONSTRAINT (ADVICE r16): while the registration memo is warm,
    externally dropping or replacing a temp view named in ``TABLES``
    (``dropTempView`` / ``createOrReplaceTempView``) leaves this
    function reading a stale or missing view until
    ``session.reset_plan_memos`` — the views are engine-owned names.
    Memo keying shares the single-SparkSession-per-app assumption
    documented at ``sources.io._TABLE_MEMO``."""
    register_views(spark, sf_dir)
    return spark.sql(query)
