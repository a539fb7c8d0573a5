"""Count-min sketch primitives shared by the batch query (q162) and
its Structured Streaming twin.

The CMS (Cormode & Muthukrishnan 2005) is a depth×width counter grid;
cell(r, h_r(x)) accumulates the count of every x hashing there, and a
point query reads min over the depth rows (one-sided overestimate).
Two properties make it the right streaming/scale citizen:

- **Additive**: building from per-token partial counts gives byte-
  identical counters to streaming one token at a time, so the batch
  build (one token-count shuffle, then a 2048-cell aggregate) and the
  update-mode streaming build below are the *same* operator at two
  trigger granularities — asserted by an equivalence test.
- **Bounded state**: the streaming aggregate's state is depth×width
  cells regardless of input volume — the fixed-size summary you
  persist per partition/day at 100 TB and merge by cell-wise add.

Hashes are md5-derived 60-bit ints mod width (``dedup._md5_h60``), so
a DuckDB oracle replays the whole sketch bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators.dedup import _md5_h60

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(r: Column, tok: Column, width: int = CMS_WIDTH) -> Column:
    """Row-r hash bucket of ``tok``: md5-60-bit of "r|tok" mod width."""
    return _md5_h60(F.md5(F.concat(r.cast("string"), F.lit("|"), tok))) % width


def _with_rows(df: DataFrame, tok_col: str, depth: int, width: int) -> DataFrame:
    rows_ = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    return df.select("*", rows_).select(
        df.columns + [F.col("r"), cms_bucket(F.col("r"), F.col(tok_col), width).alias("bucket")]
    )


def cms_cells_from_counts(
    token_counts: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(r, bucket, cell) grid from a ``(tok, exact_cnt)`` partial
    aggregate — the batch build: corpus-sized work is only the count
    shuffle feeding this."""
    return (
        _with_rows(token_counts, "tok", depth, width)
        .groupBy("r", "bucket")
        .agg(F.sum("exact_cnt").alias("cell"))
    )


def cms_cells_from_tokens(
    tokens: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(r, bucket, cell) grid straight from a token stream — valid on
    a STREAMING frame (update/complete mode): an unwindowed groupBy
    over depth×width keys, i.e. bounded state.  On a batch frame it
    equals :func:`cms_cells_from_counts` of the exact counts (CMS
    additivity), which the equivalence test pins."""
    return (
        _with_rows(tokens, "tok", depth, width)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def cms_point_query(
    items: DataFrame, cells: DataFrame, tok_col: str = "tok",
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimate counts for ``items``: probe the (broadcast — it is
    ≤ depth×width rows by construction) cell grid on (r, bucket) and
    take min over rows.  Adds ``cms_est`` to the item columns."""
    probes = _with_rows(items, tok_col, depth, width)
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy(*items.columns)
        .agg(F.min("cell").cast("bigint").alias("cms_est"))
    )
