from flink_s3_read_write_spark.sources.io import (  # noqa: F401
    load_table,
    read_text_lines,
    read_raw_csv_lines,
    write_text,
    write_parquet,
)
