"""Chunking operator (operators/chunking.py): Catalyst path vs UDTF
twin, hand-computed goldens, edge cases."""

from __future__ import annotations

from flink_s3_read_write_spark.operators.chunking import chunk_documents, make_chunk_udtf
from flink_s3_read_write_spark.sources.io import load_table


def test_chunk_golden(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, ""), (3, "single")], "doc_id long, text string")
    rows = chunk_documents(df, chunk=4, overlap=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = (r["chunk_text"], r["n_chunk_tokens"])
    # doc 1: starts at tokens 0,3,6 (step 3) within first 9, then 9
    assert by_doc[1][0] == ("w0 w1 w2 w3", 4)
    assert by_doc[1][1] == ("w3 w4 w5 w6", 4)
    assert by_doc[1][2] == ("w6 w7 w8 w9", 4)
    assert len(by_doc[1]) == 3
    assert by_doc[2][0] == ("", 1)        # empty doc -> one empty chunk
    assert by_doc[3][0] == ("single", 1)


def test_udtf_twin_row_identical(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(80)
    a = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
         for r in chunk_documents(docs, chunk=16, overlap=4).collect()}
    spark.udtf.register("chunk_text_udtf", make_chunk_udtf(16, 4))
    docs.createOrReplaceTempView("_chunk_in")
    b = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
         for r in spark.sql(
             "SELECT d.doc_id, c.* FROM _chunk_in d, LATERAL chunk_text_udtf(d.text) c"
         ).collect()}
    assert a == b


def test_chunks_cover_document(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = chunk_documents(docs, chunk=32, overlap=8)
    got = {}
    for r in chunks.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for r in docs.collect():
        toks = r["text"].strip().split()
        if not toks:
            continue
        reassembled = []
        for cid, ctext in sorted(got[r["doc_id"]]):
            ws = ctext.split(" ") if ctext else [""]
            reassembled.extend(ws if cid == 0 else ws[8:])  # drop overlap
        assert reassembled[: len(toks)] == toks  # full coverage, in order


def test_pack_chunks_budget_and_contiguity(spark, sf_dir):
    from flink_s3_read_write_spark.operators.chunking import pack_chunks

    docs = load_table(spark, sf_dir, "documents").limit(100)
    chunks = chunk_documents(docs, chunk=16, overlap=4)
    packed = pack_chunks(chunks, budget=64, shards=4).collect()
    max_chunk = max(r["n_chunk_tokens"] for r in packed)
    by_shard = {}
    for r in packed:
        assert r["shard"] == r["doc_id"] % 4
        by_shard.setdefault(r["shard"], []).append(r)
    per_pack = {}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r["doc_id"], r["chunk_id"]))
        pids = [r["pack_id"] for r in rows]
        # per shard: pack ids start at 0 and are non-decreasing
        assert pids[0] == 0 and all(a <= b for a, b in zip(pids, pids[1:]))
        offset = 0
        for r in rows:
            assert r["pack_id"] == offset // 64     # offset packing exactly
            offset += r["n_chunk_tokens"]
            key = (shard, r["pack_id"])
            per_pack[key] = per_pack.get(key, 0) + r["n_chunk_tokens"]
    # every pack's tokens <= budget + one chunk tail
    assert all(v <= 64 + max_chunk for v in per_pack.values())


def test_cdc_chunks_survive_prefix_insertion(spark):
    """The defining CDC property: inserting tokens at the FRONT of a
    document shifts every token position, yet chunks from the shared
    suffix still hash identically — fixed-size windows would realign
    everything.  Also: chunk texts reassemble the document in order."""
    from flink_s3_read_write_spark.operators.chunking import cdc_chunks

    base = " ".join(f"tok{i}" for i in range(400))
    shifted = "xyz1 xyz2 xyz3 " + base
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    chunks = cdc_chunks(docs, modulus=16).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # reassembly: concatenating chunks in chunk_id order restores the doc
    for doc_id, text in ((1, base), (2, shifted)):
        ordered = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        assert " ".join(r["ctext"] for r in ordered) == text
        assert sum(r["n_tokens"] for r in ordered) == len(text.split())
    # shared-suffix chunks re-sync after the insertion: most of doc 1's
    # chunk hashes reappear in doc 2 (all but the first boundary-spanning
    # chunk; the 3 inserted tokens contain no boundary with this corpus)
    h1 = {r["chunk_hash"] for r in by_doc[1]}
    h2 = {r["chunk_hash"] for r in by_doc[2]}
    shared = h1 & h2
    assert len(shared) >= len(h1) - 2, (len(shared), len(h1))


def test_cdc_duplicate_chunks_finds_planted_dup(spark):
    from flink_s3_read_write_spark.operators.chunking import cdc_duplicate_chunks

    common = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [
            (1, common),
            (2, "unrelated prefix words " + common),
            (3, "totally different " + " ".join(f"z{i}" for i in range(50))),
        ],
        "doc_id long, text string",
    )
    dups = cdc_duplicate_chunks(docs, modulus=16).collect()
    assert dups, "shared chunk run must be detected"
    for r in dups:
        assert r["n_copies"] >= 2
        assert r["first_doc"] == 1


def test_cdc_chunks_match_python_twin(spark):
    """Spark cdc_chunks == the pure-python twin used by the hypothesis
    properties (tests/test_properties.py) on an already-normalized doc."""
    from flink_s3_read_write_spark.operators.chunking import cdc_chunks
    from tests.test_properties import py_cdc_chunks

    words = [f"w{(i * 7919) % 301}" for i in range(500)]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(cdc_chunks(docs, modulus=16).collect(), key=lambda r: r["chunk_id"])
    got = [r["ctext"].split(" ") for r in rows]
    assert got == py_cdc_chunks(words, modulus=16)
