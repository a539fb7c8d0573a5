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


def test_prefix_filter_ssjoin_no_false_negatives(spark):
    """The prefix-filter guarantee: on adversarial random set data,
    EVERY pair with Jaccard >= t shares a token in its
    (n - ceil(t*n) + 1)-prefix under the global-frequency order —
    candidates ⊇ true pairs, and the verified output EQUALS the brute
    force. (q195's algorithm, threshold 0.8, distilled to sets.)"""
    import itertools
    import random

    from pyspark.sql import Window

    rng = random.Random(13)
    vocab = [f"s{i}" for i in range(40)]
    docs = {}
    for d in range(60):
        base = rng.sample(vocab, rng.randint(5, 12))
        docs[d] = set(base)
    # plant near-dup pairs: copy with small edits
    for d in range(60, 75):
        src = docs[rng.randrange(60)]
        dup = set(src)
        if rng.random() < 0.7 and len(dup) > 5:
            dup.discard(next(iter(dup)))
        docs[d] = dup

    brute = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        i = len(docs[a] & docs[b])
        na, nb = len(docs[a]), len(docs[b])
        if 9 * i >= 4 * (na + nb):  # jaccard >= 0.8, integer form
            brute[(a, b)] = i

    rows = [(d, t) for d, toks in docs.items() for t in toks]
    tok = spark.createDataFrame(rows, "doc_id int, tok string")
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        tok.join(freq, "tok").join(sz, "doc_id")
        .select("doc_id", "tok", "n",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("f", "tok")).alias("rn"))
    )
    pref = ranked.filter(
        F.col("rn") <= F.col("n") - F.expr("(4 * n + 4) div 5") + 1
    ).select("doc_id", "tok")
    a = pref.select(F.col("doc_id").alias("da"), "tok")
    b = pref.select(F.col("doc_id").alias("db"), "tok")
    cand = (a.join(b, "tok").filter(F.col("da") < F.col("db"))
            .select("da", "db").distinct())
    cand_set = {(r["da"], r["db"]) for r in cand.collect()}
    assert set(brute) <= cand_set, "prefix filter dropped a true pair"

    ta = tok.select(F.col("doc_id").alias("da"), "tok")
    tb = tok.select(F.col("doc_id").alias("db"), "tok")
    inter = (cand.join(ta, "da").join(tb, ["db", "tok"])
             .groupBy("da", "db").agg(F.count(F.lit(1)).alias("i")))
    sa = sz.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    got = {
        (r["da"], r["db"]): r["i"]
        for r in inter.join(sa, "da").join(sb, "db")
        .filter(F.lit(9) * F.col("i") >= F.lit(4) * (F.col("na") + F.col("nb")))
        .collect()
    }
    assert got == brute
    assert len(brute) >= 10  # non-vacuous: the planted dups exist


def test_linear_interpolation_matches_numpy(spark):
    """q191's bracketing windows against np.interp on random irregular
    series (with a duplicate-timestamp tie to pin the tie order)."""
    import numpy as np

    from flink_s3_read_write_spark.queries import registry  # noqa: F401  (import side effects)

    rng = np.random.RandomState(5)
    ts = np.sort(rng.choice(np.arange(0, 500_000, 7), size=40, replace=False))
    vals = np.round(rng.randn(40) * 10, 6)
    step = 10_000
    rows = [(int(t), float(v), i) for i, (t, v) in enumerate(zip(ts, vals))]
    obs = spark.createDataFrame(rows, "t_us long, v double, event_id long")

    from pyspark.sql import Window

    grid_ts = np.arange(
        ((int(ts.min()) + step - 1) // step) * step,
        (int(ts.max()) // step) * step + 1,
        step,
    )
    grid = spark.createDataFrame([(int(t),) for t in grid_ts], "t_us long").select(
        "t_us",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("g"),
    )
    u = obs.select("t_us", "event_id", "v", F.lit(0).alias("g")).unionByName(grid)
    fwd = [F.col("t_us"), F.col("g"), F.col("event_id").asc_nulls_last()]
    rev = [F.col("t_us").desc(), F.col("g").desc(), F.col("event_id").desc_nulls_first()]
    wp = Window.orderBy(*fwd).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.orderBy(*rev).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t_obs = F.when(F.col("v").isNotNull(), F.col("t_us"))
    f = u.select(
        "t_us", "g",
        F.last("v", True).over(wp).alias("vp"),
        F.last(t_obs, True).over(wp).alias("tp"),
        F.last("v", True).over(wn).alias("vn"),
        F.last(t_obs, True).over(wn).alias("tn"),
    ).filter((F.col("g") == 1) & F.col("vp").isNotNull() & F.col("vn").isNotNull())
    frac = (F.col("t_us") - F.col("tp")).cast("double") / (
        F.col("tn") - F.col("tp")).cast("double")
    got = {
        r["t_us"]: r["iv"]
        for r in f.select(
            "t_us",
            F.when(F.col("tn") == F.col("tp"), F.col("vp"))
            .otherwise(F.col("vp") + (F.col("vn") - F.col("vp")) * frac)
            .alias("iv"),
        ).collect()
    }
    want = np.interp(grid_ts.astype(float), ts.astype(float), vals)
    assert set(got) == set(int(t) for t in grid_ts)
    for t, w in zip(grid_ts, want):
        assert abs(got[int(t)] - w) < 1e-9, (t, got[int(t)], w)


def test_fuzzy_join_blocking_complete_for_block_local_pairs(spark):
    """q190's contract: within a block, verified output equals brute-
    force levenshtein<=1 over all pairs (blocking loses only pairs in
    different blocks, by design)."""
    import itertools

    names = [f"Customer#0000{i:05d}" for i in range(150)]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)], "k int, nm string")
    blk = df.select("k", "nm", F.substring("nm", 1, 16).alias("blk"))
    a = blk.select(F.col("k").alias("ka"), F.col("nm").alias("na"), "blk")
    b = blk.select(F.col("k").alias("kb"), F.col("nm").alias("nb"), "blk")
    got = {
        (r["ka"], r["kb"])
        for r in a.join(b, "blk").filter(F.col("ka") < F.col("kb"))
        .filter(F.levenshtein("na", "nb") <= 1).collect()
    }

    def lev_le1(x, y):  # same length here: count substitutions
        return sum(c != d for c, d in zip(x, y)) <= 1

    want = {
        (i, j)
        for i, j in itertools.combinations(range(len(names)), 2)
        if names[i][:16] == names[j][:16] and lev_le1(names[i], names[j])
    }
    assert got == want and len(want) > 100


def test_pps_pointer_algebra_matches_naive_pointer_walk(spark):
    """q198's closed form floor((2k*cum+W-1)/2W), differenced at the
    interval ends, must hand each of the k pointers p_j=(2j+1)W/2k to
    exactly one row — cross-checked against literally walking the
    pointers over the cumulative line, on random weights including
    1-cent rows, heavy rows (> W/k, multi-draw), and W not divisible
    by k."""
    from fractions import Fraction

    rng = random.Random(13)
    # crafted boundary ties (pointer exactly on a cumulative edge must
    # go to the row STARTING there), then random fuzz
    crafted = [(1, [1, 1]), (2, [1, 1, 1, 1]), (5, [2] * 5), (4, [3, 1, 3, 1])]
    for trial in range(-len(crafted), 25):
        if trial < 0:
            k, ws = crafted[trial]
            n = len(ws)
        else:
            n = rng.randint(1, 40)
            k = rng.choice([1, 3, 7, 10, 50])
            ws = [rng.choice([1, 2, 5, rng.randint(1, 10_000)]) for _ in range(n)]
        W = sum(ws)
        # naive: assign each pointer to the row whose [cum_lo, cum_hi)
        # interval contains it (exact rational arithmetic)
        cums, c = [], 0
        for w in ws:
            cums.append((c, c + w))
            c += w
        naive = [0] * n
        for j in range(k):
            p = Fraction((2 * j + 1) * W, 2 * k)
            for i, (lo, hi) in enumerate(cums):
                if lo <= p < hi:
                    naive[i] += 1
                    break
        # closed form (the Spark/DuckDB expression)
        def g(x: int) -> int:
            return (2 * k * x + W - 1) // (2 * W)

        closed = [g(hi) - g(lo) for lo, hi in cums]
        assert closed == naive, (trial, n, k, ws)
        assert sum(closed) == k


def test_skipgram_pairs_match_python_window_walk(spark):
    """q202's HOF pair generation must equal the literal window walk:
    for every position i, contexts at i±1, i±2 inside bounds, with
    the adjacent subcount — checked on synthetic docs with repeats,
    short docs (0/1/2 tokens), and punctuation normalization."""
    from collections import Counter

    from flink_s3_read_write_spark.queries import registry
    import flink_s3_read_write_spark.queries_llmdata  # noqa: F401
    import re
    import tempfile, os

    texts = [
        "a b a b a b c",
        "x",
        "",
        "a a a a a a a a a a a a",
        "Hello, World! hello world",
        "p q r s t u v w p q r s",
    ] * 4  # repeat so counts can clear the n>=10 floor
    want_n: Counter = Counter()
    want_adj: Counter = Counter()
    for t in texts:
        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        w = [tok for tok in norm.split(" ")]
        for i, c in enumerate(w):
            if c == "":
                continue
            for o in (-2, -1, 1, 2):
                j = i + o
                if 0 <= j < len(w) and w[j] != "":
                    want_n[(c, w[j])] += 1
                    if abs(o) == 1:
                        want_adj[(c, w[j])] += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "synth", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        got = registry()["q202_skipgram_cooccurrence"].fn(spark, d).collect()
    for r in got:
        key = (r["center"], r["context"])
        assert r["n"] == want_n[key], key
        assert r["n_adjacent"] == want_adj[key], key
    expect = {k for k, v in want_n.items() if v >= 10}
    assert {(r["center"], r["context"]) for r in got} == expect


def test_point_in_polygon_integer_raycast_matches_float_pnpoly(spark):
    """q204's cross-multiplied integer crossing test must agree with
    the textbook float-division pnpoly on every lattice point of a
    coarse sweep over all three polygons — including the concave
    5-gon's notch — and on hand-placed inside/outside witnesses."""
    from flink_s3_read_write_spark.queries import registry  # noqa: F401
    from flink_s3_read_write_spark.queries_sql import _Q204_POLYS

    def pnpoly_float(poly, x, y):
        inside = False
        n = len(poly)
        for i in range(n):
            xi, yi = poly[i]
            xj, yj = poly[(i + 1) % n]
            if (yi > y) != (yj > y):
                t = xi + (xj - xi) * (y - yi) / (yj - yi)
                if x < t:
                    inside = not inside
        return inside

    def raycast_int(poly, px, py):
        crossings = 0
        n = len(poly)
        for i in range(n):
            xi, yi = poly[i]
            xj, yj = poly[(i + 1) % n]
            dy = yj - yi
            if (yi > py) != (yj > py):
                num = (px - xi) * dy - (xj - xi) * (py - yi)
                if (dy > 0 and num < 0) or (dy < 0 and num > 0):
                    crossings += 1
        return crossings % 2 == 1

    for poly in _Q204_POLYS.values():
        for x in range(0, 1_000_001, 37_000):
            for y in range(0, 1_000_001, 41_000):
                assert raycast_int(poly, x, y) == pnpoly_float(poly, x, y), (
                    poly, x, y,
                )
    # concave witnesses: the notch between the 5-gon's two prongs is
    # OUTSIDE although inside the bounding box; prong interiors are in
    notch = _Q204_POLYS[3]
    assert not raycast_int(notch, 250_000, 750_000)  # inside bbox, in the notch
    assert raycast_int(notch, 120_000, 630_000)      # upper prong interior
    assert raycast_int(notch, 150_000, 820_000)      # lower prong interior
    assert not raycast_int(notch, 900_000, 700_000)  # far outside


def test_kcore_peel_matches_python_on_synthetic_graph(spark):
    """q207's per-round peel (degree filter + endpoint semi-joins)
    must equal a literal python peel on a graph with a clique (never
    peeled), a chain (peeled immediately), and a star (hub survives
    round 1 only until its leaves vanish)."""
    from pyspark.sql import functions as F

    edges = set()
    clique = [0, 1, 2, 3, 4]
    for i in clique:
        for j in clique:
            if i < j:
                edges.add((i, j))
    edges |= {(10, 11), (11, 12), (12, 13)}          # chain: all deg <= 2
    edges |= {(20, x) for x in (21, 22, 23, 24)}     # star: hub deg 4, leaves 1
    edges.add((0, 20))                               # tie star hub to clique

    def peel_py(es, k=3):
        es = set(es)
        while True:
            deg = {}
            for u, v in es:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            ne = {(u, v) for u, v in es if u in keep and v in keep}
            if ne == es:
                return keep, es
            es = ne

    df = spark.createDataFrame(sorted(edges), "a bigint, b bigint")
    und = df.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")

    cur = und
    for _ in range(4):  # to fixpoint on this tiny graph
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= 3).select("u")
        cur = (
            cur.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
        )
    got_nodes = {r["u"] for r in cur.select("u").distinct().collect()}
    want_nodes, want_edges = peel_py(edges)
    assert got_nodes == want_nodes == set(clique)  # only the clique is a 3-core
    assert cur.count() == 2 * len(want_edges)
