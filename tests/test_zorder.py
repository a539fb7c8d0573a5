"""Z-order clustering: prove, from the parquet footers themselves, that
a Morton-sorted write serves selective filters on BOTH interleaved
dimensions from a fraction of the files, while a single-column sort
only helps its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.zorder import zorder2
from flink_s3_read_write_spark.sources.io import load_table


def _overlap_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] stats overlap [lo, hi] —
    exactly what a stats-pruning reader would have to fetch."""
    total = overlapping = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            total += 1
            st = col.statistics
            if st is None or st.min is None:
                overlapping += 1  # no stats = must read
            elif not (st.max < lo or st.min > hi):
                overlapping += 1
    assert total >= 8, f"want enough row groups to make pruning measurable, got {total}"
    return overlapping / total


def test_zorder2_bit_interleaving_exact(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", zorder2(F.col("a"), F.col("b"))).collect()
    }

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b, z)


def test_zorder_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    stats = ev.agg(
        F.min("ts_us").alias("t0"), F.max("ts_us").alias("t1"),
        F.max("user_id").alias("u1"),
    ).first()
    t0, t1, u1 = stats["t0"], stats["t1"], stats["u1"]
    lo_u, hi_u = 0, max(1, u1 // 8)  # ~12% slice of the user range
    t_span = max(t1 - t0, 1)
    mid_lo = t0 + t_span * 45 // 100
    mid_hi = t0 + t_span * 55 // 100

    u16 = (F.col("user_id") * 65535 / F.lit(int(u1))).cast("long")
    t16 = ((F.col("ts_us") - F.lit(t0)) * 65535 / F.lit(int(t_span))).cast("long")

    z_path = str(tmp_path / "zordered")
    (
        ev.withColumn("z", zorder2(u16, t16))
        .repartition(1)
        .sortWithinPartitions("z")
        .write.option("maxRecordsPerFile", 64)
        .parquet(z_path)
    )
    lin_path = str(tmp_path / "ts_sorted")
    (
        ev.repartition(1)
        .sortWithinPartitions("ts_us")
        .write.option("maxRecordsPerFile", 64)
        .parquet(lin_path)
    )

    # ts-sorted layout: perfect on ts, useless on user_id
    assert _overlap_fraction(lin_path, "ts_us", mid_lo, mid_hi) <= 0.31
    assert _overlap_fraction(lin_path, "user_id", lo_u, hi_u) >= 0.9
    # z-ordered layout: BOTH selective filters skip most row groups
    z_user = _overlap_fraction(z_path, "user_id", lo_u, hi_u)
    z_ts = _overlap_fraction(z_path, "ts_us", mid_lo, mid_hi)
    assert z_user <= 0.5, z_user
    assert z_ts <= 0.75, z_ts


def test_zorder2_property_random(spark):
    """Morton-code property check on random 16-bit pairs: exact bit
    interleave, and locality (equal high bits of inputs => equal high
    bits of the code)."""
    from hypothesis import given, settings, strategies as st

    u16 = st.integers(min_value=0, max_value=65535)

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(u16, u16), min_size=1, max_size=16))
    def check(pairs):
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {
            (r["a"], r["b"]): r["z"]
            for r in df.withColumn("z", zorder2(F.col("a"), F.col("b"))).collect()
        }
        for (a, b), z in got.items():
            assert z == morton(a, b)
            # locality: the top 2 bits of each input occupy the top 4
            # bits of the code (z31=b15, z30=a15, z29=b14, z28=a14)
            expect_hi = (
                ((b >> 15) & 1) << 3 | ((a >> 15) & 1) << 2
                | ((b >> 14) & 1) << 1 | ((a >> 14) & 1)
            )
            assert (z >> 28) == expect_hi

    check()
