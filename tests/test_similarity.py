"""Similarity-search tests: brute-force top-k vs a NumPy oracle, and
LSH-ANN structural + recall checks (operators/similarity.py)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators import similarity as S
from flink_s3_read_write_spark.sources.io import load_table

DIM = 16
N = 80


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(N, DIM).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def numpy_topk(vecs: np.ndarray, q: int, k: int) -> list[int]:
    v = vecs.astype(np.float64)
    sims = v @ v[q] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[q]))
    order = sorted((-(sims[i]), i) for i in range(len(v)) if i != q)
    return [i for _, i in order[:k]]


def test_brute_force_topk_matches_numpy(emb):
    df, vecs = emb
    out = S.brute_force_topk(df, df.filter(F.col("vec_id") < 4), k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["q_id"], []).append((r["rn"], r["n_id"], r["cosine"]))
    for q in range(4):
        ids = [n for _, n, _ in sorted(got[q])]
        assert ids == numpy_topk(vecs, q, 5)
        for rn, n, c in got[q]:
            v = vecs.astype(np.float64)
            expect = v[n] @ v[q] / (np.linalg.norm(v[n]) * np.linalg.norm(v[q]))
            assert c == pytest.approx(expect, rel=1e-9)


def test_ann_results_share_some_table_bucket_and_are_exact_cosines(emb):
    df, vecs = emb
    out = S.ann_lsh_topk(df, df.filter(F.col("vec_id") < 8), k=5, dim=DIM, bits=4, tables=4)
    rows = out.collect()
    assert len(rows) > 0
    buckets = {
        r["vec_id"]: [r[f"b{t}"] for t in range(4)]
        for r in df.select(
            "vec_id",
            *[S.lsh_bucket(F.col("embedding"), DIM, 4, t).alias(f"b{t}") for t in range(4)],
        ).collect()
    }
    v = vecs.astype(np.float64)
    for r in rows:
        # candidate collided with the query in at least one hash table
        assert any(
            bq == bn for bq, bn in zip(buckets[r["q_id"]], buckets[r["n_id"]])
        )
        expect = v[r["n_id"]] @ v[r["q_id"]] / (
            np.linalg.norm(v[r["n_id"]]) * np.linalg.norm(v[r["q_id"]])
        )
        assert r["cosine"] == pytest.approx(expect, rel=1e-9)


def test_ann_recall_on_driver_embeddings(spark, sf_dir):
    """Recall@5 of multi-table LSH ANN vs brute force on the real
    embeddings table; must clear a floor random bucketing could not."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = S.brute_force_topk(emb, q, k=5).collect()
    approx = S.ann_lsh_topk(emb, q, k=5, dim=64, bits=4, tables=8).collect()
    exact_set = {(r["q_id"], r["n_id"]) for r in exact}
    approx_set = {(r["q_id"], r["n_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall {recall}"


def test_pandas_topk_matches_hof_topk(emb):
    """The matmul-based variant must return the same neighbors as the
    higher-order-function baseline (cosines equal to float tolerance)."""
    df, _ = emb
    q = df.filter(F.col("vec_id") < 4)
    hof = {(r["q_id"], r["rn"]): (r["n_id"], r["cosine"])
           for r in S.brute_force_topk(df, q, k=5).collect()}
    pdk = {(r["q_id"], r["rn"]): (r["n_id"], r["cosine"])
           for r in S.brute_force_topk_pandas(df, q, k=5).collect()}
    assert set(hof) == set(pdk)
    for key, (nid, cos) in hof.items():
        assert pdk[key][0] == nid
        assert pdk[key][1] == pytest.approx(cos, rel=1e-9)


def test_ivf_recall_and_exactness(spark, sf_dir):
    """IVF candidates come from probed cells only; cosines are exact;
    recall@5 with 4/16 cells probed must clear a floor."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = S.brute_force_topk(emb, q, k=5).collect()
    ivf = S.ann_ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4).collect()
    exact_map = {(r["q_id"], r["n_id"]): r["cosine"] for r in exact}
    hits = 0
    for r in ivf:
        if (r["q_id"], r["n_id"]) in exact_map:
            hits += 1
            assert r["cosine"] == pytest.approx(exact_map[(r["q_id"], r["n_id"])], rel=1e-9)
    recall = hits / len(exact_map)
    assert recall >= 0.4, f"recall {recall}"


def test_ivf_recall_contract_fails_on_zero_result_query(spark):
    """q67's self-check must fail all_have_k when a query has ZERO rows
    on one side of the full-outer pair join (ADVICE r11): sum() over no
    rows is NULL and F.min skips NULLs, so without the coalesce-to-0 a
    dropped query would silently pass the k-results contract."""
    from flink_s3_read_write_spark.queries_llmdata import ivf_recall_contract

    k = 2
    # q1: full agreement on both sides; q2: exact rows but NO ivf rows.
    exact = spark.createDataFrame(
        [(1, 10, 0.9, 1), (1, 11, 0.8, 1), (2, 10, 0.7, 1), (2, 12, 0.6, 1)],
        "q_id int, n_id int, cosine double, ex int",
    )
    ivf_full = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 1), (2, 10, 1), (2, 12, 1)],
        "q_id int, n_id int, hit int",
    )
    ok = ivf_recall_contract(exact, ivf_full, k).collect()[0]
    assert ok["all_have_k"] and ok["recall_ok"] and ok["n_queries"] == 2

    ivf_missing_q2 = ivf_full.filter("q_id <> 2")
    bad = ivf_recall_contract(exact, ivf_missing_q2, k).collect()[0]
    assert bad["n_queries"] == 2
    assert not bad["all_have_k"], (
        "zero-IVF query must fail the k-results contract explicitly"
    )


def test_zero_norm_vector_never_ranks_first(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    for fn in (S.brute_force_topk, S.brute_force_topk_pandas):
        out = sorted(fn(df, q, k=3).collect(), key=lambda r: r["rn"])
        assert [r["n_id"] for r in out][0] == 1          # real neighbor first
        assert out[-1]["n_id"] == 2 and out[-1]["cosine"] == 0.0  # zero vec last


def test_pandas_topk_empty_queries(spark):
    df = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    out = S.brute_force_topk_pandas(df, df.filter(F.col("vec_id") < 0), k=3)
    assert out.count() == 0


def test_semdedup_planted_duplicates(spark):
    # 3 base vectors, each duplicated exactly (and one with tiny noise);
    # exact/near copies must be dropped, the min-id representative kept.
    rng = np.random.RandomState(11)
    base = rng.randn(3, DIM).astype(np.float64)
    rows = []
    for i in range(3):
        v = [float(x) for x in base[i]]
        rows.append((i * 10, v))          # representative candidate
        rows.append((i * 10 + 1, v))      # exact duplicate
    noisy = base[0] + 1e-3 * rng.randn(DIM)
    rows.append((100, [float(x) for x in noisy]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in S.semdedup_keep_list(
        df, dim=DIM, bits=2, threshold=0.95).collect()}
    assert len(out) == len(rows)
    for i in range(3):
        rep, dup = out[i * 10], out[i * 10 + 1]
        # same vector -> same bucket; duplicate scores cosine ~1 to its rep
        assert dup.bucket == rep.bucket
        assert not dup.keep and dup.cosine_to_rep > 0.999
    # every bucket's representative is kept and is its own rep
    for r in out.values():
        if r.vec_id == r.rep_id:
            assert r.keep
    # near-duplicate of base[0] shares that bucket and is dropped too
    assert not out[100].keep


def test_semdedup_random_corpus_keeps_everything(spark):
    # Random gaussian vectors have pairwise cosine ~0: nothing should
    # be dropped at a 0.9 threshold except by astronomical accident.
    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(DIM)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.semdedup_keep_list(df, dim=DIM, bits=3, threshold=0.9).collect()
    assert len(out) == 60 and all(r.keep for r in out)


def test_md5_ann_recall_on_driver_embeddings(spark, sf_dir):
    """q36's md5-seeded hyperplane engine must clear the same recall@5
    floor as the xxhash64 engine — the oracle upgrade must not have
    degraded the hyperplane family."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = S.brute_force_topk(emb, q, k=5).collect()
    approx = S.ann_lsh_topk(
        emb, q, k=5, dim=64, bits=4, tables=8, hash_src="md5"
    ).collect()
    exact_set = {(r["q_id"], r["n_id"]) for r in exact}
    approx_set = {(r["q_id"], r["n_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall {recall}"
    # cosines are exact re-ranks, not approximations
    exact_all = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in S.brute_force_topk(emb, q, k=2000).collect()
    }
    for r in approx:
        assert r["cosine"] == pytest.approx(
            exact_all[(r["q_id"], r["n_id"])], rel=1e-12
        )


def test_md5_semdedup_matches_xxhash_semantics(spark, sf_dir):
    """Same keep-rule invariants on the md5 bucket engine: exactly one
    representative per bucket, reps keep themselves, drops exceed the
    cosine threshold."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = S.semdedup_keep_list(
        emb, dim=64, bits=5, threshold=0.9, hash_src="md5"
    ).collect()
    assert len(rows) == emb.count()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, members in by_bucket.items():
        reps = {r["rep_id"] for r in members}
        assert len(reps) == 1
        rep_id = reps.pop()
        assert rep_id == min(r["vec_id"] for r in members)
        for r in members:
            if r["vec_id"] == rep_id:
                assert r["keep"]
            elif not r["keep"]:
                assert r["cosine_to_rep"] > 0.9


def test_pq_adc_matches_numpy_replay(spark, sf_dir):
    """Independent NumPy re-implementation of the full PQ pipeline
    (md5 codebook → lexicographic argmin encode → ADC sum) must
    reproduce Spark's adc values to decimal(30,6) rounding."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    out = S.pq_adc_topk(emb, q, k=5).collect()
    assert len(out) == 4 * 5
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    cb = np.zeros((8, 16, 8))
    for s, c, cv in S.md5_pq_codebook(8, 8, 16):
        cb[s, c] = cv
    codes = {
        vid: [
            int(np.argmin(((v[s * 8:(s + 1) * 8] - cb[s]) ** 2).sum(1)))
            for s in range(8)
        ]
        for vid, v in vecs.items()
    }
    for r in out:
        qv = vecs[r["q_id"]]
        adc = sum(
            round(((qv[s * 8:(s + 1) * 8] - cb[s, codes[r["n_id"]][s]]) ** 2).sum(), 6)
            for s in range(8)
        )
        assert r["adc"] == pytest.approx(adc, abs=1e-5)


def test_pq_encoding_one_code_per_subspace(spark, sf_dir):
    """Every (vector, subspace) maps to exactly one code in [0, 16)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.pq_adc_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    rows = out.collect()
    assert all(r["adc"] >= 0.0 for r in rows)
    assert all(1 <= r["rn"] <= 3 for r in rows)


def test_hard_negatives_label_disjoint_and_maximal(spark, sf_dir):
    """Every mined pair crosses labels, cosines equal the brute-force
    values, and no skipped different-label vector has higher cosine
    than the mined top-k floor."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    out = S.hard_negative_topk(emb, q, k=5).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    all_cos = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in S.brute_force_topk(emb, q, k=2000).collect()
    }
    by_q: dict = {}
    for r in out:
        assert labels[r["n_id"]] != labels[r["q_id"]]
        assert r["n_label"] == labels[r["n_id"]]
        assert r["cosine"] == pytest.approx(all_cos[(r["q_id"], r["n_id"])], rel=1e-12)
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rows in by_q.items():
        assert len(rows) == 5
        floor = min(r["cosine"] for r in rows)
        mined = {r["n_id"] for r in rows}
        for (qq, nn), cos in all_cos.items():
            if qq == q_id and nn not in mined and labels[nn] != labels[q_id]:
                assert cos <= floor + 1e-12


def test_lsh_index_partition_pruned_probe(spark, tmp_path):
    """The ANN scale claim (SCALE.md similarity row), proven on the
    plan: persisting the exploded sign-LSH index PARTITIONED BY
    (t, b) makes a probe a partition-pruned scan — the literal bucket
    predicate must reach the parquet scan as PartitionFilters and the
    probe must read strictly fewer files than the index holds — and
    the pruned probe must return EXACTLY what the in-session
    ann_lsh_topk computes over the same corpus/queries/params."""
    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = corpus.filter(F.col("vec_id") < 3)
    dim, bits, tables = 64, 4, 2
    path = str(tmp_path / "lshidx")
    S.write_lsh_bucket_index(corpus, path, dim=dim, bits=bits, tables=tables)

    # layout: one directory per (t, b)
    idx = spark.read.parquet(path)
    n_parts = idx.select("t", "b").distinct().count()
    assert n_parts > 4  # bucketing actually spread the corpus

    probed = S.lsh_index_probe_topk(
        spark, path, queries, dim=dim, bits=bits, tables=tables, k=5)

    # plan proof: the bucket literals reach the scan as PartitionFilters
    # (the test_io.py partitioned-scan pattern, on the ANN layout the
    # similarity docstrings promise).
    from flink_s3_read_write_spark.plans import inspect as P

    plan = P.formatted_plan(probed)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "b#" in pf or "b =" in pf  # bucket literals pushed to listing

    # value proof: pruned probe == in-session ANN, bit for bit
    expect = S.ann_lsh_topk(corpus, queries, k=5, dim=dim, bits=bits, tables=tables)
    want = {tuple(r) for r in expect.collect()}
    assert {tuple(r) for r in probed.collect()} == want and len(want) > 0

    # physical proof that pruning SKIPS non-matching directories (not
    # a post-scan filter): plant a corrupt parquet file in a bucket
    # the probe does not touch.  A full scan must fail on it; the
    # pruned probe must keep working because its listing never
    # surfaces that directory.
    probe_buckets = {
        (r["t"], r["b"])
        for r in queries.select(
            F.explode(
                S._table_buckets(F.col("embedding"), dim, bits, tables)
            ).alias("tb")
        ).select("tb.t", "tb.b").distinct().collect()
    }
    all_buckets = {(r["t"], r["b"]) for r in idx.select("t", "b").distinct().collect()}
    spare = sorted(all_buckets - probe_buckets)
    assert spare, "every bucket probed — widen bits for a sparser probe"
    t0, b0 = spare[0]
    victim_dir = os.path.join(path, f"t={t0}", f"b={b0}")
    with open(os.path.join(victim_dir, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"this is not a parquet file")
    with pytest.raises(Exception):
        spark.read.parquet(path).select(F.sum("n_id")).collect()
    reprobe = S.lsh_index_probe_topk(
        spark, path, queries, dim=dim, bits=bits, tables=tables, k=5)
    assert {tuple(r) for r in reprobe.collect()} == want


def test_ivf_index_partition_pruned_probe(spark, tmp_path):
    """The IVF half of the ANN scale claim: cell id as a partition
    column.  Same proof structure as the LSH test — PartitionFilters
    carrying the literal probed cells, bit-for-bit equality with the
    in-session ann_ivf_topk (the index trains IDENTICAL centroids via
    ivf_train_centroids), and a corrupt file planted in a non-probed
    cell that breaks a full scan but not the pruned probe."""
    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = corpus.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivfidx")
    S.write_ivf_cell_index(corpus, path, n_centroids=16)

    probed = S.ivf_index_probe_topk(spark, path, queries, n_probe=4, k=5)

    from flink_s3_read_write_spark.plans import inspect as P

    plan = P.formatted_plan(probed)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "cell" in pf  # probed cell literals pushed to the listing

    expect = S.ann_ivf_topk(corpus, queries, k=5, n_centroids=16, n_probe=4)
    want = {tuple(r) for r in expect.collect()}
    assert {tuple(r) for r in probed.collect()} == want and len(want) > 0

    # physical pruning proof: a non-probed cell's directory is never
    # opened by the probe, so corrupting it kills only the full scan.
    idx = spark.read.parquet(f"{path}/data")
    all_cells = {r["cell"] for r in idx.select("cell").distinct().collect()}
    probed_cells = set()
    import numpy as np
    cent = spark.read.parquet(f"{path}/centroids").collect()
    centroids = np.zeros((len(cent), len(cent[0]["centroid"])))
    for r in cent:
        centroids[r["cell"]] = np.asarray(r["centroid"])
    for r in queries.collect():
        d = ((np.asarray(r["embedding"], dtype=np.float64)[None, :] - centroids) ** 2).sum(-1)
        probed_cells.update(int(c) for c in np.argsort(d)[:4])
    spare = sorted(all_cells - probed_cells)
    assert spare, "every cell probed — raise n_centroids for a sparser probe"
    victim = os.path.join(path, "data", f"cell={spare[0]}")
    with open(os.path.join(victim, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"this is not a parquet file")
    with pytest.raises(Exception):
        spark.read.parquet(f"{path}/data").select(F.sum("n_id")).collect()
    reprobe = S.ivf_index_probe_topk(spark, path, queries, n_probe=4, k=5)
    assert {tuple(r) for r in reprobe.collect()} == want


def test_matmul_topk_arrow_input_width_pinned(spark):
    """brute_force_topk_pandas's matmul partial must ship exactly
    (vec_id, embedding) into Arrow — extra corpus columns must stop at
    the boundary (mapInPandas blocks Catalyst column pruning)."""
    from tests.conftest import arrow_input_cols

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0], "fat"), (1, [0.9, 0.1], "fat")],
        "vec_id long, embedding array<float>, fat string",
    )
    q = corpus.select("vec_id", "embedding").filter("vec_id = 0")
    cols = arrow_input_cols(S.brute_force_topk_pandas(corpus, q, k=1))
    assert cols == {"vec_id", "embedding"}, cols
