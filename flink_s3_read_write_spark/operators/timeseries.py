"""Time-series mining: SAX symbolization + motif discovery.

SAX (Symbolic Aggregate approXimation, Lin et al. 2003 — public
algorithm) turns sliding windows of a numeric series into short
symbol words: piecewise aggregate segments, then per-segment
discretization against breakpoints.  Equal words = similar shapes,
so motif discovery (recurring patterns) becomes a plain groupBy over
words — the trick that turns a quadratic subsequence-similarity scan
into one shuffle, and the standard pre-index for distributed
similarity search over streams.

Exactness contract (the repo-wide determinism rules): values are
quantized to integers (floor(x·100 + 0.5) — identical IEEE double
ops in Spark and DuckDB), PAA keeps segment SUMS instead of means
(integer-exact, no division), and breakpoints are fixed integers, so
every word is bit-replayable in SQL.

Scale: the windowing is one keyed sort (partition by series key);
window arrays are w·8 bytes; word extraction is a projection; motif
counting is one partial-aggregated shuffle on the word.  Nothing is
quadratic and nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sax_words(
    df: DataFrame,
    key: str = "user_id",
    order: tuple[str, str] = ("ts", "event_id"),
    value: str = "value",
    window: int = 8,
    segments: int = 4,
    breakpoints: tuple[int, ...] = (3000, 7000, 14000),
) -> DataFrame:
    """(key, word) per complete sliding window of ``window`` points.

    ``breakpoints`` discretize the per-segment integer SUM of
    quantized values (scale 100) into len(breakpoints)+1 symbols.
    """
    if window % segments:
        raise ValueError("window must divide evenly into segments")
    per = window // segments
    q = df.select(
        F.col(key),
        *[F.col(c) for c in order],
        F.floor(F.col(value) * 100 + 0.5).cast("bigint").alias("_vi"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.currentRow, window - 1)
    )
    arr = q.select(F.col(key), F.collect_list("_vi").over(w).alias("_a")).filter(
        F.size("_a") == window
    )

    def seg_sum(j: int) -> Column:
        s = F.lit(0).cast("bigint")
        for i in range(per):
            s = s + F.element_at("_a", j * per + i + 1)
        return s

    def sym(c: Column) -> Column:
        out = F.lit(chr(ord("a") + len(breakpoints)))
        for i in range(len(breakpoints) - 1, -1, -1):
            out = F.when(c < F.lit(breakpoints[i]), chr(ord("a") + i)).otherwise(out)
        return out

    word = F.concat(*[sym(seg_sum(j)) for j in range(segments)])
    return arr.select(F.col(key), word.alias("word"))


def sax_windows(
    df: DataFrame,
    key: str = "user_id",
    order: tuple[str, str] = ("ts", "event_id"),
    value: str = "value",
    window: int = 8,
    segments: int = 4,
    breakpoints: tuple[int, ...] = (3000, 7000, 14000),
) -> DataFrame:
    """Like :func:`sax_words` but keeps the window identity and the
    integer PAA segment sums: (key, pos, word, s1..s{segments}).

    ``pos`` is the order column value at the window start (unique per
    key by contract), so a window is addressable; the segment sums
    are what an exact verify stage computes distances on.
    """
    if window % segments:
        raise ValueError("window must divide evenly into segments")
    per = window // segments
    q = df.select(
        F.col(key),
        *[F.col(c) for c in order],
        F.floor(F.col(value) * 100 + 0.5).cast("bigint").alias("_vi"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.currentRow, window - 1)
    )
    arr = q.select(
        F.col(key),
        F.col(order[1]).alias("pos"),
        F.collect_list("_vi").over(w).alias("_a"),
    ).filter(F.size("_a") == window)

    def seg_sum(j: int) -> Column:
        s = F.lit(0).cast("bigint")
        for i in range(per):
            s = s + F.element_at("_a", j * per + i + 1)
        return s

    def sym(c: Column) -> Column:
        out = F.lit(chr(ord("a") + len(breakpoints)))
        for i in range(len(breakpoints) - 1, -1, -1):
            out = F.when(c < F.lit(breakpoints[i]), chr(ord("a") + i)).otherwise(out)
        return out

    segs = [seg_sum(j).alias(f"s{j + 1}") for j in range(segments)]
    word = F.concat(*[sym(seg_sum(j)) for j in range(segments)])
    return arr.select(F.col(key), "pos", word.alias("word"), *segs)


def sax_similarity_probe(
    windows: DataFrame, query: DataFrame, segments: int = 4, k: int = 10
) -> DataFrame:
    """Similarity search over the SAX index: candidates share the
    query window's WORD (equi-join on the symbol word — the index
    prune that replaces a full scan), then an exact integer PAA
    distance ranks them; top-k under a total order.

    ``query`` is a 1-row (word, s1..sN) DataFrame; broadcast, so the
    probe is one shuffle-free pass over the word-pruned bucket.  At
    scale the word is the partition key, so the probe reads one
    partition; finer alphabets/multi-resolution words shrink buckets
    further (REPOSE-style trie pruning).
    """
    qcols = [F.col(f"s{j + 1}").alias(f"q{j + 1}") for j in range(segments)]
    b = F.broadcast(
        query.select(
            "word", F.col("user_id").alias("_qu"), F.col("pos").alias("_qp"), *qcols
        )
    )
    dist = None
    for j in range(1, segments + 1):
        d = F.col(f"s{j}") - F.col(f"q{j}")
        dist = d * d if dist is None else dist + d * d
    cand = (
        windows.join(b, "word")
        .filter((windows["user_id"] != F.col("_qu")) | (F.col("pos") != F.col("_qp")))
        .select(windows["user_id"], "pos", dist.alias("dist2"))
    )
    # sort+limit first (TakeOrderedAndProject), then number the k
    # survivors — never a global single-partition window over the
    # whole candidate bucket.
    topk = cand.orderBy("dist2", "user_id", "pos").limit(k)
    w = Window.orderBy("dist2", "user_id", "pos")
    return topk.withColumn("rn", F.row_number().over(w)).select(
        "user_id", "pos", "dist2", "rn"
    )


def sax_motifs(words: DataFrame, key: str = "user_id", min_count: int = 5) -> DataFrame:
    """Recurring shapes: words with >= min_count windows, plus how many
    distinct series exhibit them."""
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.countDistinct(key).alias("n_users"),
        )
        .filter(F.col("n_windows") >= min_count)
    )
