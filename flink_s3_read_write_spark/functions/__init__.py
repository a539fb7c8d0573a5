from flink_s3_read_write_spark.functions.numeric import (  # noqa: F401
    dsum,
    davg,
    strict_double,
)
from flink_s3_read_write_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
