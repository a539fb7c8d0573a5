"""Document chunking — fixed-size token windows with overlap, the
standard step that turns documents into training/context-window-sized
records.

Two implementations with identical semantics:

- ``chunk_documents`` — pure Catalyst (sequence → slice → array_join):
  JVM-side, zero-shuffle projection, DuckDB-oracle-checkable; the
  production path at 100 TB.
- ``ChunkTextUDTF`` — the same logic as a Spark 4 Python UDTF
  (lateral-join table function).  Exists to cover the UDTF extension
  surface; asserted row-identical to the Catalyst path in
  tests/test_chunking.py.

Chunk i starts at token i·(chunk − overlap); trailing windows may be
shorter than ``chunk`` (standard sliding-window semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output: (id, chunk_id, chunk_text, n_chunk_tokens).  Tokens are
    whitespace-split from the trimmed raw text (chunking must not
    normalize — the chunks ARE the payload).
    """
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    step = chunk - overlap
    toked = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_tok")
    )
    n = F.size(F.col("_tok"))
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_id"),
            F.array_join(F.slice(F.col("_tok"), s, chunk), " ").alias("chunk_text"),
            F.size(F.slice(F.col("_tok"), s, chunk)).alias("n_chunk_tokens"),
        ),
    )
    return (
        toked.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_id", "c.chunk_text", "c.n_chunk_tokens")
    )


def chunk_oracle_sql(chunk: int = 64, overlap: int = 8) -> str:
    """The DuckDB twin of ``chunk_documents`` over ``documents``."""
    step = chunk - overlap
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(1, len(t) - {overlap}) + 1, {step}),
               s -> struct_pack(
                 cid := (s - 1) // {step},
                 ctext := array_to_string(list_slice(t, s, s + {chunk} - 1), ' '),
                 ntok := len(list_slice(t, s, s + {chunk} - 1))))) AS c
      FROM toks)
    SELECT doc_id,
           CAST(c.cid AS INT) AS chunk_id,
           c.ctext AS chunk_text,
           CAST(c.ntok AS INT) AS n_chunk_tokens
    FROM chunks
    """


def make_chunk_udtf(chunk: int = 64, overlap: int = 8):
    """Spark 4 Python UDTF twin (lateral table function)."""
    from pyspark.sql.functions import udtf

    step = chunk - overlap

    @udtf(returnType="chunk_id int, chunk_text string, n_chunk_tokens int")
    class ChunkText:
        def eval(self, text: str):
            toks = (text or "").strip().split()
            if not toks:
                toks = [""]
            n = len(toks)
            cid = 0
            for start in range(0, max(1, n - overlap), step):
                window = toks[start: start + chunk]
                yield cid, " ".join(window), len(window)
                cid += 1

    return ChunkText


def pack_chunks(
    chunks: DataFrame,
    budget: int = 256,
    id_col: str = "doc_id",
    shards: int = 16,
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget packs.

    Distributed-friendly *offset packing*: documents are sharded by
    ``doc_id % shards`` (plain modulo — deterministic in any engine);
    within a shard, chunks are laid out in (doc_id, chunk_id) order
    and a chunk belongs to the pack containing its start offset.
    Equivalent to concatenating each shard and cutting it every
    ``budget`` tokens.

    The shard is what makes this scale: a single global ordering would
    be a one-partition window (a serial bottleneck over the whole
    corpus); per-shard windows run in parallel, and ``shards`` should
    be sized ~ cluster parallelism.  Greedy close-on-overflow packing
    is inherently serial even per shard and buys little — a pack here
    exceeds ``budget`` by at most one chunk tail, which the downstream
    tokenizer truncates.

    Output pack key is (shard, pack_id).
    """
    from pyspark.sql import Window

    sh = (F.col(id_col) % shards).cast("int")
    laid = chunks.withColumn("shard", sh)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chunk_tokens").over(w)
    start = cum - F.col("n_chunk_tokens")
    return laid.select(
        id_col, "chunk_id", "chunk_text", "n_chunk_tokens", "shard",
        F.floor(start / budget).cast("long").alias("pack_id"),
    )


def cdc_chunks(
    df: DataFrame,
    modulus: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: a token ends at a chunk boundary when
    its md5-derived 60-bit hash ≡ 0 (mod ``modulus``), giving expected
    chunk length ``modulus`` tokens.  Because boundaries depend on
    token CONTENT, not position, a prefix insertion shifts only the
    chunks it touches — shared runs between near-identical documents
    still produce identical chunk texts (the property fixed-size
    windows lack, and why storage dedup systems chunk this way).

    md5-based on both sides → a DuckDB oracle replays boundaries,
    chunk texts and hashes exactly (q140).

    Output: (doc_id, chunk_id, ctext, n_tokens, chunk_hash).  Plan:
    posexplode → per-doc running-sum window (partitioned by doc, so
    it parallelizes across docs) → one hash aggregate.
    """
    from pyspark.sql import Window

    from flink_s3_read_write_spark.operators import dedup as D

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(D.tokens(F.col(text_col))).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    boundary = (D._md5_h60(F.md5(F.col("tok"))) % modulus == 0).cast("long")
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    numbered = tok.withColumn("chunk_id", F.sum(boundary).over(w))
    return numbered.groupBy("doc_id", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("ctext"),
        F.count(F.lit(1)).alias("n_tokens"),
    ).withColumn("chunk_hash", F.md5(F.col("ctext")))


def cdc_duplicate_chunks(df: DataFrame, modulus: int = 16) -> DataFrame:
    """Cross-corpus chunk-level dedup over ``cdc_chunks`` output:
    chunks whose text occurs more than once, with copy counts."""
    return (
        cdc_chunks(df, modulus=modulus)
        .groupBy(F.col("chunk_hash"))
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_copies") >= 2)
    )
