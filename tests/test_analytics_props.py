"""Brute-force cross-checks for the round-5 analytics families
(triangles, skyline, sweep-line, CMS, sorted-neighborhood): the
registry oracles prove Spark==DuckDB on driver data; these prove the
ALGORITHMS against their quadratic/naive definitions on adversarial
synthetic inputs (duplicates, ties, hubs) that the driver corpus may
not contain."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F


def _triangles_brute(edges: set[tuple[int, int]]) -> int:
    nodes = sorted({n for e in edges for n in e})
    und = {frozenset(e) for e in edges}
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if frozenset((a, b)) in und and frozenset((b, c)) in und and frozenset((a, c)) in und
    )


def test_triangle_orientation_matches_brute_force(spark):
    rng = random.Random(7)
    nodes = list(range(30))
    edges = set()
    # hub node 0 touches everything — the skew case degree-ordering exists for
    for n in nodes[1:]:
        edges.add((0, n))
    for _ in range(120):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "a int, b int")
    deg = (
        df.select(F.col("a").alias("node")).unionByName(df.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oe = (
        df.join(da, "a").join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    e1 = oe.select("u", F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    e2 = oe.select("u", F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    ordd = (F.col("dv1") < F.col("dv2")) | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    closing = oe.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    got = e1.join(e2, "u").filter(ordd).join(closing, ["v1", "v2"]).count()
    assert got == _triangles_brute(edges)


def test_skyline_window_rewrite_matches_dominance_def(spark):
    rng = random.Random(11)
    # duplicate (price, size) points and same-price ties included
    pts = [(i, rng.choice([1.0, 2.0, 3.0, 4.0]), rng.randint(1, 6)) for i in range(80)]
    df = spark.createDataFrame(pts, "id int, price double, size int")

    from pyspark.sql import Window

    g = df.groupBy("price").agg(F.max("size").alias("gmax"))
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    g2 = g.select("price", "gmax", F.max("gmax").over(w).alias("cheaper_max"))
    got = {
        r["id"]
        for r in df.join(g2, "price")
        .filter(
            (F.col("cheaper_max").isNull() | (F.col("cheaper_max") < F.col("size")))
            & (F.col("gmax") <= F.col("size"))
        )
        .collect()
    }
    want = {
        i
        for i, p, s in pts
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for _, p2, s2 in pts
        )
    }
    assert got == want


def test_sweepline_concurrency_matches_interval_stabbing(spark):
    rng = random.Random(13)
    iv = [(rng.randint(0, 40), 0) for _ in range(60)]
    iv = [(s, s + rng.randint(0, 10)) for s, _ in iv]
    df = spark.createDataFrame(iv, "s int, e int")
    deltas = df.select(F.col("s").alias("x"), F.lit(1).alias("d")).unionByName(
        df.select((F.col("e") + 1).alias("x"), F.lit(-1).alias("d"))
    )
    from pyspark.sql import Window

    daily = deltas.groupBy("x").agg(F.sum("d").alias("d"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = {
        r["x"]: r["c"]
        for r in daily.select("x", F.sum("d").over(w).alias("c")).collect()
    }
    for x in range(0, 55):
        want = sum(1 for s, e in iv if s <= x <= e)
        # sweep value at x = value at the greatest boundary <= x
        keys = [k for k in got if k <= x]
        have = got[max(keys)] if keys else 0
        assert have == want, (x, have, want)


def test_cms_estimate_one_sided_and_tight_without_collisions(spark):
    # CMS invariant: min-over-rows estimate >= exact count, always.
    items = [(f"tok{i}", (i % 7) + 1) for i in range(50)]
    rows = [(t,) for t, n in items for _ in range(n)]
    df = spark.createDataFrame(rows, "tok string")
    from flink_s3_read_write_spark.operators.dedup import _md5_h60

    cnt = df.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    r = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("r")

    def bucket(rc, tc):
        return _md5_h60(F.md5(F.concat(rc.cast("string"), F.lit("|"), tc))) % 512

    cells = (
        cnt.select("tok", "c", r)
        .select("r", bucket(F.col("r"), F.col("tok")).alias("b"), "c")
        .groupBy("r", "b").agg(F.sum("c").alias("cell"))
    )
    probes = cnt.select("tok", "c", r).select(
        "tok", "c", "r", bucket(F.col("r"), F.col("tok")).alias("b")
    )
    est = (
        probes.join(cells, ["r", "b"])
        .groupBy("tok", "c").agg(F.min("cell").alias("est"))
        .collect()
    )
    assert len(est) == 50
    for row in est:
        assert row["est"] >= row["c"]


def test_snm_identical_docs_in_same_block_are_candidates(spark):
    # Identical normalized text ⇒ same block and adjacent sort ranks ⇒
    # the pair MUST surface with jaccard 1.0.
    docs = [(1, "the quick brown fox"), (2, "the quick brown fox"),
            (3, "a completely different doc"), (4, "zzz unrelated text")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from pyspark.sql import Window

    from flink_s3_read_write_spark.operators import dedup as D

    nt = D.normalize_text(F.col("text"))
    base = df.select("doc_id", "text", nt.alias("ntext"), F.substring(nt, 1, 8).alias("blk"))
    w = Window.partitionBy("blk").orderBy("ntext", "doc_id")
    rdf = base.select("doc_id", "text", "blk", F.row_number().over(w).alias("rn"))
    a = rdf.select("blk", F.col("rn").alias("ra"), F.col("doc_id").alias("id_a"),
                   F.col("text").alias("ta"))
    b = rdf.select("blk", F.col("rn").alias("rb"), F.col("doc_id").alias("id_b"),
                   F.col("text").alias("tb"))
    pairs = (
        a.join(b, "blk")
        .filter((F.col("rb") - F.col("ra")).between(1, 3))
        .select("id_a", "id_b", D.jaccard_tokens(F.col("ta"), F.col("tb")).alias("j"))
        .collect()
    )
    got = {(r["id_a"], r["id_b"]): r["j"] for r in pairs}
    assert got[(1, 2)] == 1.0
