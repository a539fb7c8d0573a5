"""flink_s3_read_write_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ``AshwinCloud/flink-s3-read-write``
(three Flink DataStream jobs: S3 text uppercase, CSV city-filter,
keyed running average — see SURVEY.md §2 Tier A), built idiomatically
on the Spark DataFrame / SQL / Structured Streaming stack, plus the
large-scale LLM-data-pipeline extension surface (dedup, similarity
search, text analysis, multimodal columns — SURVEY.md §2.2 Tier B).

Design principles (SURVEY.md §7.0):
- every operator is a pure ``DataFrame -> DataFrame`` function built
  from Catalyst expressions; no Python row loops in hot paths;
- Pandas UDFs (Arrow-batched) only where built-ins cannot express the
  semantics (simhash bit-packing, multimodal decode);
- batch-first with streaming twins in ``streaming/``.
"""

__version__ = "0.1.0"

from flink_s3_read_write_spark.session import build_session  # noqa: F401
