"""Embedding similarity search over ``array<float>`` columns.

Two tiers (driver north star):
- brute-force top-k cosine — the exact baseline.  Queries are
  broadcast, so the corpus side streams through one scan with no
  shuffle of the embeddings; per-pair math is higher-order-function
  Catalyst (zip_with/aggregate), never Python.
- LSH-bucketed ANN (random hyperplane signs) — the scale path: the
  corpus is hashed once into 2^bits sign-buckets; a query only joins
  its own bucket (plus optional multi-probe flips), cutting the
  candidate set by ~2^bits at a recall cost measured in
  tests/test_similarity.py.

Deterministic hyperplanes, two engines: component r[j][d] derived
from xxhash64(j, d) mapped to [-1, 1) — generated inside the
expression, no RNG state, no broadcast matrix — or, with
``hash_src="md5"``, md5-seeded constants shipped as a broadcast
`tables`-row table that a DuckDB oracle re-derives bit-for-bit
(see ``md5_hyperplane_tables``), which puts the ANN/SemDeDup
candidate pipelines under the full hash-checked correctness gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.vectors import cosine_similarity
from flink_s3_read_write_spark.sources.io import fan_out


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Output: (q_id, n_id, cosine) — ranking key is (cosine DESC, n_id)
    so results are totally ordered and reproducible.  Self-matches are
    excluded.  Plan shape: broadcast(queries) nested-loop against the
    corpus scan → per-partition WindowGroupLimit top-k → final top-k;
    the corpus is read exactly once.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    # The per-pair cosine runs on the corpus side's partitioning:
    # fan out when the scan under-splits (no-op at scale).
    c = fan_out(corpus).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    pairs = c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id", "n_id", cosine_similarity(F.col("q_vec"), F.col("n_vec")).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cosine", "rn")
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine via Arrow-batched NumPy matmul.

    Same semantics as ``brute_force_topk`` (ranking key (cosine DESC,
    n_id), self-matches excluded); different physical strategy: the
    query matrix is shipped in the task closure (queries are small by
    definition) and every corpus Arrow batch does ONE BLAS matmul
    against it, emitting only the per-batch top-k — so the rows
    entering the final shuffle are O(batches·queries·k), never the
    full pair cross product.  This is the CPU-optimal variant when
    dim is large: a matmul touches each float once with SIMD, where
    the higher-order-function form pays interpreted per-element cost.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        schema = "q_id long, n_id long, cosine double, rn int"
        return corpus.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def batches(it):
        for pdf in it:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(c_mat) == 0:
                continue
            # zero-norm guard: define cosine as 0.0 (matches the
            # Catalyst path; unguarded 0/0 NaNs would sort unstably)
            denom = np.linalg.norm(c_mat, axis=1)[:, None] * q_norm[None, :]
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = np.where(denom > 0, (c_mat @ q_mat.T) / denom, 0.0)
            out = {"q_id": [], "n_id": [], "cosine": []}
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = c_ids != q_ids[qi]
                order = np.lexsort((c_ids[mask], -col[mask]))[:k]
                sel = np.flatnonzero(mask)[order]
                out["q_id"].extend([q_ids[qi]] * len(sel))
                out["n_id"].extend(c_ids[sel])
                out["cosine"].extend(col[sel])
            yield pd.DataFrame(out)

    # Arrow batches inherit the scan's split count: one split means
    # one Python worker does every matmul.  Fan out first (no-op at
    # scale).
    partial = fan_out(corpus).select(id_col, vec_col).mapInPandas(
        batches, "q_id long, n_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cosine", "rn")
    )


def ivf_train_centroids(corpus: DataFrame, n_centroids: int = 16,
                        vec_col: str = "embedding"):
    """Deterministic IVF centroid training (k-means++ seed + 10 Lloyd
    rounds) on a bounded sample — extracted so the in-session search
    (``ann_ivf_topk``) and the persisted cell index
    (``write_ivf_cell_index``) train BIT-IDENTICAL centroids.

    The sample is count-free and position-independent: order by a
    uniform hash of the vector and take the global top-``target``
    (Catalyst plans TakeOrderedAndProject — per-partition top-k, one
    corpus pass, no full sort, no prior .count() job; a bare limit()
    would take a one-region prefix and bias clustered data).  At
    100 TB swap the top-k for a catalog-stats-derived sample fraction;
    training never k-means the full corpus (standard IVF practice —
    a distributed KMeans buys ~10 barrier jobs of overhead for
    nothing).  Exactly one driver round-trip — and the whole function
    is DETERMINISTIC (hash-ordered sample, seeded k-means++), so the
    result memoizes per (session, corpus plan, params): repeated
    searches in one session skip the sample job entirely.  Like the
    fan_out memo (sources/io.py), the answer-preservation claim is
    scoped to sources immutable within the session: the plan hash
    does not fingerprint data, so if files under the same path are
    rewritten mid-session the memo serves centroids trained on the
    old bytes (still a valid IVF index — recall only, never wrong
    rows — but call ``reset_plan_memos()`` after an in-place
    rewrite).  The cached array is returned read-only
    (``writeable=False``) so no caller can mutate the memo in place
    (ADVICE r09).
    """
    import numpy as np

    try:
        memo_key = (
            corpus.sparkSession.sparkContext.applicationId,
            corpus._jdf.queryExecution().analyzed().semanticHash(),
            n_centroids, vec_col,
        )
    except Exception:  # non-JVM backends: train unconditionally
        memo_key = None
    if memo_key is not None and memo_key in _IVF_CENTROIDS:
        return _IVF_CENTROIDS[memo_key]

    target = max(2000, 50 * n_centroids)
    train_rows = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.xxhash64(F.col(vec_col)))
        .limit(target)
        .collect()
    )
    x = np.asarray([r.v for r in train_rows], dtype=np.float64)
    rng = np.random.RandomState(42)
    # k-means++ seeding, then Lloyd's.
    cents = [x[rng.randint(len(x))]]
    for _ in range(1, n_centroids):
        d2 = np.min(
            ((x[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(-1), axis=1
        )
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(x[rng.choice(len(x), p=p)])
    centroids = np.asarray(cents)
    for _ in range(10):
        lab = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(-1).argmin(1)
        for c in range(n_centroids):
            m = lab == c
            if m.any():
                centroids[c] = x[m].mean(0)
    # Freeze before memoizing: downstream consumers only read the
    # matrix, and a read-only view makes accidental in-place mutation
    # (which would silently poison every later hit) an immediate
    # ValueError instead.
    centroids.flags.writeable = False
    if memo_key is not None:
        if len(_IVF_CENTROIDS) >= 256:  # bound a pathological session
            _IVF_CENTROIDS.clear()
        _IVF_CENTROIDS[memo_key] = centroids
    return centroids


# (applicationId, corpus-plan semanticHash, n_centroids, vec_col) ->
# trained centroid matrix; deterministic, so purely a perf memo.
_IVF_CENTROIDS: dict = {}


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF (inverted file): k-means cells +
    multi-probe + exact cosine re-rank.

    The classic ANN alternative to LSH: partition the corpus into
    ``n_centroids`` Voronoi cells (seeded Lloyd's → deterministic),
    store each vector under its cell id, and have a query search only
    its ``n_probe`` nearest cells — candidates ≈ n_probe/n_centroids
    of the corpus.  At 100 TB the cell id is a partition column:
    training runs on a sample, cell assignment is one scan, and a
    query is a partition-pruned read.

    Plan shape: training is DRIVER-SIDE NumPy on a bounded seeded
    sample (standard IVF practice — you never k-means the full
    corpus, so a distributed KMeans buys ~10 barrier jobs of overhead
    for nothing); the only full-data pass is cell assignment, an
    Arrow-batched pandas_udf argmin against the broadcast centroid
    matrix.  Query→cell probe lists are computed inside the plan (a
    vectorized UDF over the query DataFrame, exploded to n_probe rows
    per query) and broadcast; candidates equi-join on cell id, then
    the same re-rank as every other similarity path.  Total driver
    round-trips: exactly one (the bounded training sample).
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    centroids = ivf_train_centroids(corpus, n_centroids, vec_col)

    @pandas_udf("int")
    def assign_cell(vs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if len(m) == 0:
            return pd.Series([], dtype="int32")
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        return pd.Series(d.argmin(1).astype("int32"))

    # Cell assignment (Arrow argmin) is bounded by the scan's split
    # count; fan out AFTER training so the bounded training sample's
    # plan stays untouched (no-op at scale).
    assigned = fan_out(corpus).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        assign_cell(F.col(vec_col)).alias("cell"),
    )

    # Probe lists are computed INSIDE the plan (vectorized UDF against
    # the broadcast centroid matrix), not by collecting the queries to
    # the driver: queries stay a DataFrame end-to-end, so the whole
    # search is one job — sample/train, then scan+join.  Each query row
    # explodes into its n_probe nearest cells with q_vec carried along,
    # which also folds the old probe⋈query second broadcast join away.
    @pandas_udf("array<int>")
    def probe_cells(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    probe_df = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    cand = (
        assigned.join(F.broadcast(probe_df), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
    )
    scored = cand.select(
        "q_id", "n_id", cosine_similarity(F.col("q_vec"), F.col("n_vec")).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cosine", "rn")
    )


def lsh_bucket(vec: Column, dim: int, bits: int = 8, table: int = 0) -> Column:
    """Random-hyperplane signature: ``bits`` sign bits packed into a long.

    Hyperplane component (j, d) of hash table ``table`` is generated
    *at runtime* inside the lambda — xxhash64((table·1024 + j)·dim + d)
    scaled to [-1, 1) — rather than as literal arrays: with
    tables × bits × dim literals the expression tree hits tens of
    thousands of nodes and analysis/codegen time dwarfs execution.
    Runtime generation keeps the tree O(1) at a cost of dim·bits cheap
    JVM hashes per row.  Deterministic: no RNG state anywhere.
    """
    def dot_j(j: Column) -> Column:
        hyper = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.xxhash64((F.lit(table * 1024) + j) * F.lit(dim) + d)
            / F.lit(float(1 << 63)),
        )
        return F.aggregate(
            F.zip_with(vec, hyper, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc * 2 + F.when(dot_j(j) >= 0, 1).otherwise(0),
    )


def md5_hyperplane_tables(
    dim: int, bits: int, tables: int
) -> list[tuple[int, list[list[float]]]]:
    """Engine-independent sign-LSH hyperplanes, md5-seeded: component
    (t, j, d) = int(md5('hp-{t*1024+j}-{d}') first 15 hex) / 2^59 - 1.
    A DuckDB oracle re-derives the identical doubles in SQL (same md5
    hex → BIGINT → same IEEE division), so bucket assignments — and
    hence the ANN candidate set — replay exactly.  Values are returned
    driver-side (tables × bits × dim floats, trivially small) and
    shipped as a broadcast table, keeping per-row bucketing shuffle-
    free while avoiding the giant-literal expression tree the
    xxhash64-at-runtime engine was built to dodge."""
    import hashlib

    out = []
    for t in range(tables):
        hs = []
        for j in range(bits):
            tj = t * 1024 + j
            hs.append(
                [
                    int(hashlib.md5(f"hp-{tj}-{d}".encode()).hexdigest()[:15], 16)
                    / float(1 << 59)
                    - 1.0
                    for d in range(dim)
                ]
            )
        out.append((t, hs))
    return out


def _md5_table_buckets(
    df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str,
    dim: int, bits: int, tables: int,
) -> DataFrame:
    """(out_id, vec, t, b) — one row per (vector, hash table), bucket
    computed against the broadcast md5-seeded hyperplanes.  Same
    zero-shuffle shape as the xxhash64 engine's explode: the hyper
    table is ``tables`` rows, broadcast, so the corpus is scanned once
    and never shuffled for bucketing."""
    spark = df.sparkSession
    hyper = spark.createDataFrame(
        md5_hyperplane_tables(dim, bits, tables), "t int, hs array<array<double>>"
    )
    vec = F.col(vec_col)

    def dot(h: Column) -> Column:
        return F.aggregate(
            F.zip_with(vec, h, lambda x, hh: x.cast("double") * hh),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bucket = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc * 2
        + F.when(dot(F.element_at(F.col("hs"), j + 1)) >= 0, 1).otherwise(0),
    )
    return (
        df.crossJoin(F.broadcast(hyper))
        .select(
            F.col(id_col).alias(out_id),
            vec.alias(out_vec),
            "t",
            bucket.alias("b"),
        )
    )


def _table_buckets(vec: Column, dim: int, bits: int, tables: int) -> Column:
    """array<struct<t,b>> — one sign-bucket per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("t"), lsh_bucket(vec, dim, bits, t).alias("b")
            )
            for t in range(tables)
        ]
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_src: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH + exact re-rank.

    Classic LSH: a neighbor at angle θ shares one table's full bucket
    with probability (1 − θ/π)^bits, so recall of a single table decays
    fast; with L independent tables recall is 1 − (1 − p^bits)^L while
    the candidate set stays ~L/2^bits of the corpus.  bits/tables are
    the precision/recall dials.

    Plan shape: corpus hashed once (array of per-table buckets,
    exploded), candidates found by equi-join against the broadcast
    query buckets, per-pair duplicate hits collapsed by a max-cosine
    aggregate keyed on (q_id, n_id) — ids + one double through the
    shuffle, never vectors — then WindowGroupLimit top-k.  At 100 TB
    the exploded (table, bucket) corpus would be precomputed and
    bucket-partitioned, turning each query into a partition-pruned
    scan of ~tables/2^bits of the data.
    """
    if hash_src == "md5":
        # ``hash_src="md5"``: hyperplanes are md5-seeded constants the
        # DuckDB oracle re-derives exactly (see md5_hyperplane_tables),
        # joined in via a broadcast `tables`-row table instead of
        # generated per-row with xxhash64 — same zero-shuffle bucketing,
        # fully hash-checkable candidate set.
        c = _md5_table_buckets(fan_out(corpus), id_col, vec_col, "n_id", "n_vec",
                               dim, bits, tables)
        q = _md5_table_buckets(queries, id_col, vec_col, "q_id", "q_vec",
                               dim, bits, tables)
        pairs = c.join(F.broadcast(q), ["t", "b"]).filter(
            F.col("n_id") != F.col("q_id")
        )
    else:
        c = fan_out(corpus).select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            F.explode(_table_buckets(F.col(vec_col), dim, bits, tables)).alias("tb"),
        )
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(_table_buckets(F.col(vec_col), dim, bits, tables)).alias("tb"),
        )
        pairs = c.join(F.broadcast(q), "tb").filter(F.col("n_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id", "n_id", cosine_similarity(F.col("q_vec"), F.col("n_vec")).alias("cosine")
    )
    dedup = scored.groupBy("q_id", "n_id").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cosine", "rn")
    )


def md5_pq_codebook(
    n_sub: int, dsub: int, n_codes: int
) -> list[tuple[int, int, list[float]]]:
    """Engine-independent product-quantization codebook, md5-seeded:
    component (s, c, d) = int(md5('pq-{s}-{c}-{d}') first 15 hex)
    / 2^59 - 1, i.e. uniform [-1, 1) — the same derivation as
    ``md5_hyperplane_tables`` so a DuckDB oracle re-creates the exact
    IEEE doubles.  At 100 TB the codebook would be k-means-trained on
    a bounded sample (like q67's IVF centroids); the md5 codebook
    trades quantization quality for a fully replayable pipeline while
    keeping every other moving part (encode, ADC, re-rank) identical.
    """
    import hashlib

    out = []
    for s in range(n_sub):
        for c in range(n_codes):
            out.append(
                (
                    s,
                    c,
                    [
                        int(
                            hashlib.md5(f"pq-{s}-{c}-{d}".encode()).hexdigest()[:15],
                            16,
                        )
                        / float(1 << 59)
                        - 1.0
                        for d in range(dsub)
                    ],
                )
            )
    return out


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    dsub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN: encode the corpus to ``n_sub`` code
    ids (one 4-bit code per 8-dim subspace → 8 bytes/vector instead
    of 256), then answer queries with asymmetric distance computation
    (ADC): approx_dist(q, x) = Σ_s dist²(q_sub[s], C[s][code_s(x)]).

    This is the memory-bound scale path FAISS/ScaNN use: at 100 TB the
    codes table is ~32× smaller than the raw vectors, fits executor
    memory where the vectors never would, and the query-side lookup
    table (n_sub × n_codes distances) is broadcast-tiny.  Plan shape:
    one broadcast crossJoin against the 128-row codebook + a partial-
    aggregated argmin shuffle keyed (vec_id, s) to encode — at scale
    you encode ONCE and persist the codes — then ADC is a broadcast
    equi-join on (s, code) and a decimal-exact 8-term sum; no vector
    ever moves through a shuffle.

    The argmin tie-break is lexicographic (dist, code), so encoding
    is deterministic; the ADC sum routes through DECIMAL(30,6)
    (see functions.numeric) so the result is accumulation-order-
    independent and bit-identical across engines and partitionings.

    Output: (q_id, n_id, adc, rn) — ascending approx distance top-k.
    """
    spark = corpus.sparkSession
    cb = spark.createDataFrame(
        md5_pq_codebook(n_sub, dsub, n_codes), "s int, c int, cvec array<double>"
    )

    def sub_dist2(vec: Column) -> Column:
        sub = F.slice(vec, F.col("s") * dsub + 1, dsub)
        return F.aggregate(
            F.zip_with(
                sub,
                F.col("cvec"),
                lambda x, h: (x.cast("double") - h) * (x.cast("double") - h),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def dists(df: DataFrame, out_id: str) -> DataFrame:
        return df.crossJoin(F.broadcast(cb)).select(
            F.col(id_col).alias(out_id),
            "s",
            "c",
            sub_dist2(F.col(vec_col)).alias("dist"),
        )

    # Encoding (128-row codebook crossJoin + HOF subspace distances)
    # is the corpus-wide CPU stage; fan out first (no-op at scale).
    codes = dists(fan_out(corpus), "n_id").groupBy("n_id", "s").agg(
        F.min_by("c", F.array(F.col("dist"), F.col("c").cast("double"))).alias("code")
    )
    qdist = dists(queries, "q_id")
    adc = (
        codes.join(
            F.broadcast(qdist),
            (qdist["s"] == codes["s"]) & (qdist["c"] == codes["code"]),
        )
        .filter(F.col("n_id") != F.col("q_id"))
        .groupBy("q_id", "n_id")
        .agg(F.sum(F.col("dist").cast("decimal(30,6)")).cast("double").alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("n_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "adc", "rn")
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-k most-similar corpus vectors with a DIFFERENT label —
    the examples a contrastive loss learns most from (highest-cosine
    wrong-class neighbors).

    Same physical shape as ``brute_force_topk`` (broadcast queries ×
    one corpus scan → per-partition WindowGroupLimit), with the label
    inequality folded into the join predicate so mismatched pairs are
    dropped before the cosine is computed.  Output: (q_id, n_id,
    n_label, cosine, rn), ranking key (cosine DESC, n_id).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.col(label_col).alias("n_label"),
    )
    pairs = c.join(F.broadcast(q), F.col("n_label") != F.col("q_label"))
    scored = pairs.select(
        "q_id",
        "n_id",
        "n_label",
        cosine_similarity(F.col("q_vec"), F.col("n_vec")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "n_label", "cosine", "rn")
    )


def semdedup_keep_list(
    corpus: DataFrame,
    dim: int = 64,
    bits: int = 5,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_src: str = "xxhash64",
) -> DataFrame:
    """SemDeDup-style semantic dedup: bucket embeddings, keep one
    representative per bucket, drop members whose cosine to the
    representative exceeds ``threshold``.

    SemDeDup (Abbas et al., 2023) clusters embeddings with k-means and
    removes within-cluster near-duplicates.  This implementation keeps
    the same decision rule but forms clusters with the deterministic
    sign-LSH bucket (``lsh_bucket``) so the whole pass is Catalyst
    expressions — no training step, no RNG, reproducible across runs
    and cluster sizes.  The q67 IVF cells are the drop-in k-means
    alternative when trained centroids are worth the extra pass.

    Representative = min ``id_col`` per bucket (stable under
    re-partitioning).  Plan shape: one hash shuffle on the bucket to
    pick representatives (tiny aggregate, 2^bits rows), a second
    co-partitioned join to pair every member with its representative's
    vector, then per-row cosine — O(n) comparisons total, never the
    O(n^2) within-cluster pairwise of the paper (star-vs-rep is the
    standard scale relaxation; chained near-dups beyond the rep's
    radius survive one pass and are caught by re-running with a fresh
    table id, same trade as q33's banding).

    Output: (vec_id, bucket, rep_id, cosine_to_rep, keep).
    """
    if hash_src == "md5":
        # Single-table md5-seeded buckets (engine-independent — the
        # DuckDB oracle replays them; see md5_hyperplane_tables).
        b = _md5_table_buckets(
            fan_out(corpus), id_col, vec_col, "vec_id", "vec", dim, bits, 1
        ).select("vec_id", "vec", F.col("b").alias("bucket"))
    else:
        b = fan_out(corpus).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            lsh_bucket(F.col(vec_col), dim, bits).alias("bucket"),
        )
    # The bucketed table feeds THREE consumers (representative ids,
    # representative vectors, the member pairing) — uncached, the
    # per-row hyperplane bucket projection executes once per consumer
    # (the q195 r09 per-side audit pattern).  At 100 TB this is the
    # persisted bucket-partitioned table SemDeDup maintains anyway.
    b = b.cache()
    rep_ids = b.groupBy("bucket").agg(F.min("vec_id").alias("rep_id"))
    rep_vecs = (
        b.withColumnRenamed("vec_id", "rep_id")
        .withColumnRenamed("vec", "rep_vec")
        .join(F.broadcast(rep_ids), ["bucket", "rep_id"])
    )
    paired = b.join(F.broadcast(rep_ids), "bucket").join(
        rep_vecs, ["bucket", "rep_id"]
    )
    cos = cosine_similarity(F.col("vec"), F.col("rep_vec"))
    return paired.select(
        "vec_id",
        "bucket",
        "rep_id",
        cos.alias("cosine_to_rep"),
        ((F.col("vec_id") == F.col("rep_id")) | (cos <= F.lit(threshold))).alias(
            "keep"
        ),
    )


def write_lsh_bucket_index(
    corpus: DataFrame,
    path: str,
    *,
    dim: int,
    bits: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the exploded sign-LSH corpus index PARTITIONED BY
    (table, bucket) — the 100 TB layout ``ann_lsh_topk``'s in-session
    plan stands in for.

    Each corpus vector lands once per hash table under
    ``t=<table>/b=<bucket>/``, so a probe for a query's buckets is a
    partition-pruned scan of ~``tables/2^bits`` of the data: the
    filesystem listing itself skips every other bucket directory —
    no scan, no shuffle, no per-row hash recompute at query time.
    ``tests/test_similarity.py::test_lsh_index_partition_pruned_probe``
    asserts the pruning mechanically (PartitionFilters + file count)
    and that probe results equal the in-session ``ann_lsh_topk``.
    """
    idx = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.explode(_table_buckets(F.col(vec_col), dim, bits, tables)).alias("tb"),
    ).select("n_id", "n_vec", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    idx.write.partitionBy("t", "b").mode("overwrite").parquet(path)


def lsh_index_probe_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    dim: int,
    bits: int = 8,
    tables: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k probe against a ``write_lsh_bucket_index`` layout via
    PARTITION-PRUNED candidate reads.

    The queries' (table, bucket) pairs are computed engine-side and
    collected to literal partition predicates — bounded by
    ``n_queries × tables`` rows, the same small-by-contract side
    ``ann_lsh_topk`` broadcasts, so the collect is a few hundred ints,
    never corpus-sized.  The literal disjunction reaches the scan as
    ``PartitionFilters``, which is the whole point: candidate
    generation costs a directory listing plus ~``tables/2^bits`` of
    the index bytes.  Candidates then re-rank exactly like
    ``ann_lsh_topk`` (broadcast queries, max-cosine dedup across
    tables, WindowGroupLimit top-k).
    """
    import functools
    import operator

    qb = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(_table_buckets(F.col(vec_col), dim, bits, tables)).alias("tb"),
    ).select("q_id", "q_vec", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    buckets = {(r["t"], r["b"]) for r in qb.select("t", "b").distinct().collect()}
    pred = functools.reduce(
        operator.or_,
        [(F.col("t") == t) & (F.col("b") == b) for t, b in sorted(buckets)],
    )
    cand = spark.read.parquet(path).filter(pred)
    pairs = cand.join(F.broadcast(qb), ["t", "b"]).filter(F.col("n_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id", "n_id", cosine_similarity(F.col("q_vec"), F.col("n_vec")).alias("cosine")
    )
    dedup = scored.groupBy("q_id", "n_id").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cosine", "rn")
    )


def write_ivf_cell_index(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: corpus PARTITIONED BY its Voronoi cell
    id, centroids alongside — the 100 TB layout ``ann_ivf_topk``'s
    in-session plan stands in for (its docstring: "at 100 TB the cell
    id is a partition column").

    Training is the same deterministic bounded-sample routine as the
    in-session search (``ivf_train_centroids``), so probe results
    against this index are bit-identical to ``ann_ivf_topk`` over the
    same corpus.  Layout: ``<path>/data/cell=<c>/...`` holds
    (n_id, n_vec); ``<path>/centroids`` holds (cell, centroid) —
    n_centroids rows, the probe's broadcast-sized side.
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    centroids = ivf_train_centroids(corpus, n_centroids, vec_col)

    @pandas_udf("int")
    def assign_cell(vs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if len(m) == 0:
            return pd.Series([], dtype="int32")
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        return pd.Series(d.argmin(1).astype("int32"))

    corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        assign_cell(F.col(vec_col)).alias("cell"),
    ).write.partitionBy("cell").mode("overwrite").parquet(f"{path}/data")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(c), [float(x) for x in centroids[c]]) for c in range(len(centroids))],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_probe_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    n_probe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k probe against a ``write_ivf_cell_index`` layout via
    PARTITION-PRUNED candidate reads.

    The centroid table (n_centroids rows) loads driver-side; each
    query's ``n_probe`` nearest cells come from the same vectorized
    argmin as the in-session search, and the DISTINCT probed cell ids
    — bounded by ``n_queries × n_probe`` — become a literal ``IN``
    predicate on the partition column, so candidate generation reads
    ~``n_probe/n_centroids`` of the index bytes off a pruned
    directory listing.  Candidates then re-rank exactly like
    ``ann_ivf_topk`` (broadcast exploded query-probe rows, cosine,
    WindowGroupLimit top-k).
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        centroids[r["cell"]] = np.asarray(r["centroid"], dtype=np.float64)

    @pandas_udf("array<int>")
    def probe_cells(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    probe_df = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    cells = sorted({r["cell"] for r in probe_df.select("cell").distinct().collect()})
    cand = (
        spark.read.parquet(f"{path}/data")
        .filter(F.col("cell").isin(cells))
        .join(F.broadcast(probe_df), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
    )
    scored = cand.select(
        "q_id", "n_id", cosine_similarity(F.col("q_vec"), F.col("n_vec")).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cosine", "rn")
    )
