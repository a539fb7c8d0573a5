"""Graph & market-basket arc: the purchase graph (customers x parts
via orders x lineitem) and basket (order/part co-occurrence) analytics
— PageRank, BFS, Weisfeiler-Lehman fingerprints, triangles, k-core,
co-purchase lift, item-item CF, association rules, shortest paths.

Split out of ``queries_sql`` (round 7) purely for file size; the
registry is keyed by name and ``QUERIES.md`` sorts by query number, so
the move is invisible to the driver.

All iterative algorithms here are integer-exact and unrolled so a
DuckDB oracle replays them bit-for-bit (see operators/graph.py).  The
bipartite purchase graph uses an INTEGER node encoding — ``2*custkey``
for customers, ``2*partkey + 1`` for parts — so every per-round edge
join and message aggregate hashes/compares 8-byte longs instead of
'c123'-style strings (measurably less shuffle CPU at 1.2M edges, and
the honest choice at 100 TB where the edge table is a persisted
bucketed long pair); display decoding back to 'c…'/'p…' happens once
on the final node-sized (or top-k-sized) result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators.dedup import (
    DIGEST_LANE2_KEY, DIGEST_P1, DIGEST_P2,
)
from flink_s3_read_write_spark.functions.numeric import (
    round9_exact,
)
from flink_s3_read_write_spark.functions.numeric import (
    round9_exact_sql as _R9,
)
from flink_s3_read_write_spark.queries import register
from flink_s3_read_write_spark.sources.io import load_table, shared_builder

# Shared bipartite purchase-graph edge build (both directions, int
# node ids).  The oracle twin of this CTE prefix is _E_SQL below.
_E_SQL = """
    e0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    e AS (
      SELECT 2 * c AS u, 2 * p + 1 AS v FROM e0
      UNION ALL
      SELECT 2 * p + 1, 2 * c FROM e0)"""

# Decode an int node id back to the display form ('c123' / 'p456').
_DECODE_SQL = "CASE WHEN {col} % 2 = 0 THEN 'c' ELSE 'p' END || CAST({col} // 2 AS VARCHAR)"


def _decode_node(col: str) -> Column:
    return F.concat(
        F.when(F.col(col) % 2 == 0, F.lit("c")).otherwise(F.lit("p")),
        F.expr(f"CAST({col} div 2 AS STRING)"),
    )


# ---------------------------------------------------------------------------
# Shared cached builders (round 8).  The whole graph/basket arc hangs
# off three materializations — the customer-part purchase set, the
# order-part basket set, and the support-pruned co-purchase pair table
# — and before this round every query rebuilt its own copy (the r07
# audit measured ~5x repeated heavy work across q147/q159/q164/q206/
# q207).  Each builder constructs the IDENTICAL analyzed plan on every
# call, so Spark's plan-keyed CacheManager materializes it once per
# session and substitutes the InMemoryRelation for every later
# consumer, across queries.  At 100 TB these are persisted bucketed
# tables maintained by the pipeline; the session cache is the exact
# in-memory analogue.
# ---------------------------------------------------------------------------


# Mechanical whale-basket cap (the dedup.py max_bucket rule, r09): a
# single degenerate basket of n items fans C(n,2) pairs out of ONE
# key — 10k items is ~50M pairs from one order/customer.  Every
# within-group pair self-join in this family filters groups larger
# than MAX_BASKET first; each consumer's DuckDB oracle mirrors the
# same HAVING COUNT(*) <= cap, so the semantics are identical on both
# engines (the q124 informative-shingle pattern).  Support/degree
# counts stay GLOBAL (uncapped) — the cap guards only the quadratic
# expansion, not the linear statistics.
MAX_BASKET = 200


def cap_baskets(df: DataFrame, key: str, max_basket: int = MAX_BASKET) -> DataFrame:
    """Drop groups with more than ``max_basket`` members before a
    within-group pair self-join.

    Whale keys are few by definition (the cap exists because they are
    outliers), so the key list broadcasts and the filter is a map-side
    anti join — no shuffle of the big side, O(|df|) either way.
    """
    whales = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_basket)
        .select(key)
    )
    return df.join(F.broadcast(whales), key, "left_anti")


@shared_builder
def customer_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (c=custkey, p=partkey) purchase set, cached.

    The orders x lineitem join + distinct is the expensive common
    prefix of the whole graph family: purchase_edges (q146/q148/q158)
    encodes it into bipartite node ids, q164 self-joins it on the
    customer.  Built once per session.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .cache()
    )


@shared_builder
def basket_po(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (o=orderkey, p=partkey) basket table, cached.

    The basket grain feeds the pair self-join plus the per-part
    support counts and the basket count in q147/q159/q206/q207.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .cache()
    )


@shared_builder
def basket_pairs(
    spark: SparkSession, sf_dir: str, max_basket: int = MAX_BASKET
) -> DataFrame:
    """Support>=2 co-purchase pair table (pa < pb, n_ab), cached.

    The A-priori 2-itemset step — the single most expensive shared
    stage of the basket arc (within-order self-join + pair aggregate,
    C(basket,2) fan-out bounded by basket size).  Baskets larger than
    ``max_basket`` are dropped MECHANICALLY before the self-join
    (``cap_baskets``; mirrored in every consumer's oracle), so no
    single degenerate order can fan out quadratically.  q147 attaches
    lift, q159 counts triangles on it, q206 directs it into rules,
    q207 peels its k-core — all from this one materialization.
    """
    # Cache the capped table: BOTH self-join sides read it, and an
    # uncached derived table executes its whale agg + anti join once
    # per side (the q195 r09 plan-audit pattern).
    po = cap_baskets(basket_po(spark, sf_dir), "o", max_basket).cache()
    a = po.select("o", F.col("p").alias("pa"))
    b = po.select("o", F.col("p").alias("pb"))
    return (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
        .cache()
    )


@shared_builder
def purchase_edges(spark: SparkSession, sf_dir: str, partition_by_u: bool = True) -> DataFrame:
    """Both-direction (u, v) bigint edge table of the purchase graph.

    One pass over the cached orders x lineitem distinct
    (customer_parts; explode of the two orientations — a 2-branch
    union would read the cache twice), optionally hash-partitioned by
    u THEN cached so every iterative consumer (degree seed, per-round
    message joins) reuses one edge shuffle and only node-sized state
    moves per round.  At 100 TB this is a persisted u-bucketed
    long-pair table; the orders side is a genuine fact, so no
    broadcast hint — the planner picks the join strategy per scale.
    """
    e0 = customer_parts(spark, sf_dir)
    # cast BEFORE multiplying: int32 keys above 2^30 would wrap silently
    # under non-ANSI multiply-then-widen, while the DuckDB oracle's
    # `2 * c` promotes — widen-then-multiply mirrors the oracle at any
    # key width (ADVICE r07).
    cu = F.col("c").cast("bigint") * 2
    pu = F.col("p").cast("bigint") * 2 + 1
    edges = (
        e0.select(
            F.explode(
                F.array(
                    F.struct(cu.alias("u"), pu.alias("v")),
                    F.struct(pu.alias("u"), cu.alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
    )
    if partition_by_u:
        edges = edges.repartition("u")
    return edges.cache()

@register(
    "q146_pagerank_bipartite",
    oracle=f"""
    WITH {_E_SQL},
    deg AS (SELECT u, COUNT(*) AS deg FROM e GROUP BY u),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (
      SELECT u, deg,
             (1000000000000000 // n) AS r,
             ((15 * (1000000000000000 // n)) // 100) AS base
      FROM deg, nn),
    i1 AS (
      SELECT d.u, d.deg, d.base,
             d.base + (85 * COALESCE(s.infl, 0)) // 100 AS r
      FROM r0 d LEFT JOIN (
        SELECT e.v AS u, SUM(c.r // c.deg) AS infl
        FROM e JOIN r0 c ON c.u = e.u GROUP BY e.v) s USING (u)),
    i2 AS (
      SELECT d.u, d.deg, d.base,
             d.base + (85 * COALESCE(s.infl, 0)) // 100 AS r
      FROM i1 d LEFT JOIN (
        SELECT e.v AS u, SUM(c.r // c.deg) AS infl
        FROM e JOIN i1 c ON c.u = e.u GROUP BY e.v) s USING (u)),
    i3 AS (
      SELECT d.u, d.deg, d.base,
             d.base + (85 * COALESCE(s.infl, 0)) // 100 AS r
      FROM i2 d LEFT JOIN (
        SELECT e.v AS u, SUM(c.r // c.deg) AS infl
        FROM e JOIN i2 c ON c.u = e.u GROUP BY e.v) s USING (u))
    SELECT {_DECODE_SQL.format(col="node")} AS node, rank_int, rn FROM (
      SELECT u AS node, CAST(r AS BIGINT) AS rank_int,
             ROW_NUMBER() OVER (ORDER BY r DESC, u) AS rn
      FROM i3) t
    WHERE rn <= 20
    """,
    doc=(
        "PageRank, 3 unrolled Pregel-style rounds (operators/graph.py) "
        "over the bipartite customer-part purchase graph "
        "(orders x lineitem, both directions, INT-encoded nodes — "
        "2*custkey / 2*partkey+1, so per-round joins hash longs, not "
        "strings): per round one edges-joins-ranks shuffle + one "
        "inflow aggregate. Ranks are integer-quantized at scale 10^15 "
        "with explicit floor divisions (Spark `div` = DuckDB `//` on "
        "non-negatives), so the inherently iterative algorithm is "
        "bit-for-bit SQL-replayable - no float summation order, no "
        "libm. Top-20 via a total-order row_number window; node ids "
        "decode to 'c…'/'p…' display form only on the 20 survivors. "
        "At 100 TB each round is edge-partitioned and checkpointed "
        "(dedup.py CC pattern); node state is N-sized, never "
        "driver-side."
    ),
)
def q146_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_s3_read_write_spark.operators import graph as G

    edges = purchase_edges(spark, sf_dir)
    ranks = G.pagerank_quantized(edges, iters=3)
    return G.top_ranked(ranks, k=20).withColumn("node", _decode_node("node"))


@register(
    "q147_copurchase_pairs",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    -- whale-basket cap, mirrors cap_baskets(max_basket=200)
    pow AS (
      SELECT po.o, po.p FROM po
      JOIN (SELECT o FROM po GROUP BY o HAVING COUNT(*) <= 200) k USING (o)),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM pow a JOIN pow b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2),
    pc AS (SELECT p, COUNT(*) AS n FROM po GROUP BY p),
    nn AS (SELECT COUNT(DISTINCT o) AS n_orders FROM po)
    SELECT part_a, part_b, n_ab,
           CAST(nn.n_orders * n_ab AS DOUBLE) / CAST(ca.n * cb.n AS DOUBLE) AS lift
    FROM pairs
    JOIN pc ca ON ca.p = pairs.part_a
    JOIN pc cb ON cb.p = pairs.part_b, nn
    WHERE n_ab >= 2
    """,
    doc=(
        "Market-basket mining, the A-priori 2-itemset step: parts "
        "co-purchased in the same order with support >= 2 and exact "
        "lift N*n_ab/(n_a*n_b). The within-order self-join is the "
        "classic bounded fan-out formulation - pair expansion is "
        "C(basket,2) per order (baskets are small by construction, "
        "and whale baskets > MAX_BASKET are dropped mechanically by "
        "cap_baskets, mirrored in the oracle's HAVING <= 200 - the "
        "q124 rule), never an all-pairs part x part join. Per-part counts "
        "broadcast back; lift is one double division of exact "
        "integers, bit-identical cross-engine."
    ),
)
def q147_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    po = basket_po(spark, sf_dir)  # shared cache: pairs + counts + order count
    pairs = basket_pairs(spark, sf_dir).select(
        F.col("pa").alias("part_a"), F.col("pb").alias("part_b"), "n_ab"
    )
    pc = po.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    nn = F.broadcast(po.agg(F.countDistinct("o").alias("n_orders")))
    # per-part counts attach WITHOUT a forced broadcast: parts are a
    # genuine dimension (billions at 100 TB), so the planner picks
    # broadcast at small SF and shuffle join at scale; only the 1-row
    # order count is hint-broadcast.
    return (
        pairs.join(pc.withColumnRenamed("p", "part_a").withColumnRenamed("n", "n_a"), "part_a")
        .join(pc.withColumnRenamed("p", "part_b").withColumnRenamed("n", "n_b"), "part_b")
        .crossJoin(nn)
        .select(
            "part_a", "part_b", "n_ab",
            ((F.col("n_orders") * F.col("n_ab")).cast("double")
             / (F.col("n_a") * F.col("n_b")).cast("double")).alias("lift"),
        )
    )


@register(
    "q148_bfs_hops",
    oracle=f"""
    WITH {_E_SQL},
    d0 AS (SELECT CAST(2 AS BIGINT) AS u, CAST(0 AS INTEGER) AS dist),
    d1 AS (
      SELECT u, CAST(MIN(dist) AS INTEGER) AS dist FROM (
        SELECT u, dist FROM d0
        UNION ALL
        SELECT e.v AS u, d.dist + 1 FROM e JOIN d0 d ON d.u = e.u) t
      GROUP BY u),
    d2 AS (
      SELECT u, CAST(MIN(dist) AS INTEGER) AS dist FROM (
        SELECT u, dist FROM d1
        UNION ALL
        SELECT e.v AS u, d.dist + 1 FROM e JOIN d1 d ON d.u = e.u) t
      GROUP BY u),
    d3 AS (
      SELECT u, CAST(MIN(dist) AS INTEGER) AS dist FROM (
        SELECT u, dist FROM d2
        UNION ALL
        SELECT e.v AS u, d.dist + 1 FROM e JOIN d2 d ON d.u = e.u) t
      GROUP BY u)
    SELECT {_DECODE_SQL.format(col="u")} AS node, dist FROM d3
    """,
    doc=(
        "BFS hop distance (<= 3 hops) from customer c1 over the "
        "bipartite purchase graph (INT-encoded nodes, decoded to "
        "'c…'/'p…' on the final result): per round one "
        "edges-joins-reached join + a MIN aggregate (operators/"
        "graph.py bfs_levels) - the relational frontier-expansion "
        "step of connected-component / reachability jobs. "
        "Integer-exact, SQL-replayable. At 100 TB expansion joins "
        "only the NEW frontier per round and checkpoints between "
        "rounds (dedup.py CC pattern)."
    ),
)
def q148_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_s3_read_write_spark.operators import graph as G

    # Frontier is broadcast per round (bfs_levels), so edges need no
    # particular partitioning — skip the repartition shuffle.
    edges = purchase_edges(spark, sf_dir, partition_by_u=False)
    seeds = edges.sparkSession.createDataFrame([(2,)], "u bigint")
    return G.bfs_levels(edges, seeds, rounds=3).select(
        _decode_node("u").alias("node"), "dist"
    )


@register(
    "q158_wl_graph_fingerprint",
    oracle=f"""
    WITH {_E_SQL},
    lab0 AS (
      SELECT u, CAST(COUNT(*) AS VARCHAR) AS lb FROM e GROUP BY u),
    nb1 AS (
      SELECT e.v AS u,
             CAST(SUM(CAST(('0x' || substr(md5(c.lb), 1, 15)) AS BIGINT)
                      % {DIGEST_P1}) AS BIGINT) AS s1,
             CAST(SUM(CAST(('0x' || substr(md5('{DIGEST_LANE2_KEY}' || c.lb), 1, 15)) AS BIGINT)
                      % {DIGEST_P2}) AS BIGINT) AS s2,
             COUNT(*) AS d
      FROM e JOIN lab0 c ON c.u = e.u GROUP BY e.v),
    lab1 AS (
      SELECT l.u, substr(md5(l.lb || '|'
               || COALESCE(CAST(n.s1 AS VARCHAR), '') || '|'
               || COALESCE(CAST(n.s2 AS VARCHAR), '') || '|'
               || COALESCE(CAST(n.d AS VARCHAR), '')), 1, 16) AS lb
      FROM lab0 l LEFT JOIN nb1 n USING (u)),
    nb2 AS (
      SELECT e.v AS u,
             CAST(SUM(CAST(('0x' || substr(md5(c.lb), 1, 15)) AS BIGINT)
                      % {DIGEST_P1}) AS BIGINT) AS s1,
             CAST(SUM(CAST(('0x' || substr(md5('{DIGEST_LANE2_KEY}' || c.lb), 1, 15)) AS BIGINT)
                      % {DIGEST_P2}) AS BIGINT) AS s2,
             COUNT(*) AS d
      FROM e JOIN lab1 c ON c.u = e.u GROUP BY e.v),
    lab2 AS (
      SELECT l.u, substr(md5(l.lb || '|'
               || COALESCE(CAST(n.s1 AS VARCHAR), '') || '|'
               || COALESCE(CAST(n.s2 AS VARCHAR), '') || '|'
               || COALESCE(CAST(n.d AS VARCHAR), '')), 1, 16) AS lb
      FROM lab1 l LEFT JOIN nb2 n USING (u)),
    classes AS (SELECT lb, COUNT(*) AS n FROM lab2 GROUP BY lb)
    SELECT CAST(SUM(n) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
           CAST(MAX(n) AS BIGINT) AS max_class_size
    FROM classes
    """,
    doc=(
        "Weisfeiler-Lehman structural fingerprinting (operators/"
        "graph.py wl_refine): 2 rounds of colour refinement over the "
        "purchase graph (INT-encoded nodes) - per round one co-located "
        "edges-joins-labels join + an ADDITIVE neighbour-multiset "
        "hash (two independent per-label 60-bit-md5 sums mod distinct "
        "31-bit primes, plus count: ~2^-62 per-pair collision - r09: "
        "mergeable scalar SUMs instead of a hub-degree-sized "
        "collect_list group state), relabelled by substr(md5, 16) "
        "(64-bit collision space vs ~35k labels; half the per-round "
        "shuffle payload of full md5), so the inherently iterative "
        "isomorphism refinement is bit-replayable in SQL. Output is "
        "the one-row structure-class profile (classes / singletons / "
        "largest class) - the WL-kernel primitive behind graph-level "
        "dedup and similarity."
    ),
)
def q158_wl_graph_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_s3_read_write_spark.operators import graph as G

    # u-partitioned + cached: the degree seed and BOTH refinement
    # rounds join on u, so they all reuse one edge shuffle and only
    # the node-sized label table moves per round.
    edges = purchase_edges(spark, sf_dir)
    return G.wl_class_summary(G.wl_refine(edges, rounds=2))


@register(
    "q159_triangle_count",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    -- whale-basket cap, mirrors cap_baskets(max_basket=200)
    pow AS (
      SELECT po.o, po.p FROM po
      JOIN (SELECT o FROM po GROUP BY o HAVING COUNT(*) <= 200) k USING (o)),
    edges AS (
      SELECT a.p AS a, b.p AS b
      FROM pow a JOIN pow b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges) t
      GROUP BY node),
    oe AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.a ELSE e.b END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.b ELSE e.a END AS v,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN db.d ELSE da.d END AS dv
      FROM edges e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM oe e1
      JOIN oe e2 ON e2.u = e1.u
                AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
      JOIN oe e3 ON e3.u = e1.v AND e3.v = e2.v),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT agg.n_nodes, ne.n_edges, agg.n_wedges, tri.n_triangles,
           CASE WHEN agg.n_wedges = 0 THEN 0.0
                ELSE CAST(3 * tri.n_triangles AS DOUBLE) / CAST(agg.n_wedges AS DOUBLE)
           END AS global_cc
    FROM agg, ne, tri
    """,
    doc=(
        "Triangle counting + global clustering coefficient over the "
        "support->=2 co-purchase part graph (q147's edge set). Uses the "
        "canonical degree-ordered orientation: every edge points from "
        "its lower-(deg,id) endpoint to the higher one, so each "
        "triangle is counted exactly once at its lowest-order apex and "
        "the wedge join fans out only over OUT-degrees, which the "
        "orientation bounds by O(sqrt(m)) on any graph - the trick "
        "that makes relational triangle counting survive power-law "
        "degree skew at 100 TB (an id-only orientation would square "
        "the hottest hub instead). Three self-joins on the oriented "
        "edge list, all key-partitioned; clustering coefficient is one "
        "double division of exact BIGINTs, bit-identical cross-engine."
    ),
)
def q159_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared support>=2 pair cache feeds degrees + orientation + the
    # closing-edge probe (and q147/q206/q207 in the same session)
    edges = basket_pairs(spark, sf_dir).select(
        F.col("pa").alias("a"), F.col("pb").alias("b")
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oe = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
        # probed three times (wedge e1⋈e2 on u, closing probe); hash-
        # partition by u before caching so the wedge self-join reads
        # both sides co-located with zero extra exchange
        .repartition("u")
        .cache()
    )
    e1 = oe.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    e2 = oe.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedge_ord = (F.col("dv1") < F.col("dv2")) | (
        (F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2"))
    )
    closing = oe.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = (
        e1.join(e2, "u")
        .filter(wedge_ord)
        .join(closing, ["v1", "v2"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # integer wedge count: d*(d-1) is even, shiftright keeps the whole
        # pipeline in BIGINT (double '/' is exact only below 2^53, which a
        # power-law hub's degree can exceed at scale).
        F.sum(F.shiftright(F.col("d") * (F.col("d") - F.lit(1)), 1)).alias("n_wedges"),
    )
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        F.broadcast(summary)
        .crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges").cast("double")
            )
            .alias("global_cc"),
        )
    )


@register(
    "q164_item_item_cf",
    oracle="""
    WITH up AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    -- whale-customer cap, mirrors cap_baskets(max_basket=200);
    -- per-item counts (ic) stay global
    upw AS (
      SELECT up.u, up.i FROM up
      JOIN (SELECT u FROM up GROUP BY u HAVING COUNT(*) <= 200) k USING (u)),
    co AS (
      SELECT a.i AS item_a, b.i AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM upw a JOIN upw b ON b.u = a.u AND a.i < b.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM up GROUP BY i),
    sim AS (
      SELECT item_a, item_b, n_ab,
             CAST(n_ab AS DOUBLE) / sqrt(CAST(ca.n * cb.n AS DOUBLE)) AS cosine
      FROM co
      JOIN ic ca ON ca.i = co.item_a
      JOIN ic cb ON cb.i = co.item_b),
    sym AS (
      SELECT item_a AS item, item_b AS nbr, n_ab, cosine FROM sim
      UNION ALL
      SELECT item_b, item_a, n_ab, cosine FROM sim),
    rk AS (
      SELECT item, nbr, n_ab, cosine,
             row_number() OVER (PARTITION BY item
                                ORDER BY cosine DESC, n_ab DESC, nbr) AS rank
      FROM sym)
    SELECT item, nbr, n_ab, cosine, CAST(rank AS INTEGER) AS rank
    FROM rk WHERE rank <= 3
    """,
    doc=(
        "Item-item collaborative filtering: parts bought by the same "
        "customer co-occur; similarity is co-occurrence cosine "
        "n_ab/sqrt(n_a*n_b) and each item keeps its top-3 neighbors. "
        "Same bounded per-basket fan-out as q147 (C(basket,2) per "
        "customer; whale customers > MAX_BASKET dropped mechanically "
        "by cap_baskets, oracle-mirrored), support >= 3 "
        "prunes the pair table BEFORE the similarity join, per-item "
        "degree counts attach by planner choice (genuine dimension), "
        "and the top-3 is a rank window partitioned BY ITEM - "
        "WindowGroupLimit pushes the limit into the shuffle, never a "
        "global sort. Tie order (cosine DESC, n_ab DESC, nbr) is "
        "total; cosine is one double op over exact BIGINTs - "
        "bit-identical cross-engine."
    ),
)
def q164_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # shared orders x lineitem distinct (customer_parts, also the
    # purchase-graph prefix for q146/q148/q158); feeds the pair
    # self-join (both sides on u) + per-item counts — partition by u
    # first so the self-join reads both sides co-located.  Whale
    # customers (> MAX_BASKET distinct items) are dropped MECHANICALLY
    # before the quadratic self-join (cap_baskets, mirrored in the
    # oracle); per-item degree counts stay global.
    base = customer_parts(spark, sf_dir)
    up = cap_baskets(base, "c").select(
        F.col("c").alias("u"), F.col("p").alias("i")
    )
    up = up.repartition("u").cache()
    a = up.select("u", F.col("i").alias("item_a"))
    b = up.select("u", F.col("i").alias("item_b"))
    co = (
        a.join(b, "u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    # per-item degree counts are GLOBAL (from the uncapped shared
    # cache): the cap guards only the quadratic pair expansion
    ic = base.groupBy(F.col("p").alias("i")).agg(F.count(F.lit(1)).alias("n"))
    sim = (
        co.join(ic.select(F.col("i").alias("item_a"), F.col("n").alias("n_a")), "item_a")
        .join(ic.select(F.col("i").alias("item_b"), F.col("n").alias("n_b")), "item_b")
        .select(
            "item_a", "item_b", "n_ab",
            (
                F.col("n_ab").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
        )
    )
    # symmetric expansion in ONE pass: explode both orientations per
    # row (a 2-branch union would either recompute the whole
    # pair+degree pipeline twice or force a cache materialization)
    sym = sim.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("item"), F.col("item_b").alias("nbr"),
                    F.col("n_ab"), F.col("cosine"),
                ),
                F.struct(
                    F.col("item_b").alias("item"), F.col("item_a").alias("nbr"),
                    F.col("n_ab"), F.col("cosine"),
                ),
            )
        ).alias("e")
    ).select("e.item", "e.nbr", "e.n_ab", "e.cosine")
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), F.desc("n_ab"), "nbr")
    return (
        sym.select("item", "nbr", "n_ab", "cosine", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
        .select("item", "nbr", "n_ab", "cosine", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "q197_min_cost_paths",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS u, l_partkey AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    em AS (SELECT u, v, MIN(w) AS w FROM e GROUP BY u, v),
    und AS (
      SELECT u, v, w FROM em UNION ALL SELECT v, u, w FROM em),
    d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost),
    d1 AS (
      SELECT node, MIN(cost) AS cost FROM (
        SELECT node, cost FROM d0
        UNION ALL
        SELECT e.v AS node, d.cost + e.w FROM und e JOIN d0 d ON d.node = e.u) t
      GROUP BY node),
    d2 AS (
      SELECT node, MIN(cost) AS cost FROM (
        SELECT node, cost FROM d1
        UNION ALL
        SELECT e.v AS node, d.cost + e.w FROM und e JOIN d1 d ON d.node = e.u) t
      GROUP BY node)
    SELECT node, cost FROM d2
    """,
    doc=(
        "Weighted min-cost paths (<= 2 hops) from supplier 1 over the "
        "supplier-part supply graph: Bellman-Ford / min-plus semiring "
        "rounds - each round one edges-joins-costs join + a MIN "
        "aggregate, the WEIGHTED generalization of q148's BFS (hop "
        "count = min-plus with w=1). Edge weight = min quantity per "
        "(supplier, part) pair, pure BIGINT addition/min - exact and "
        "mergeable, so rounds are SQL-replayable. Same scale shape "
        "as every graph op here: frontier-sized state, edge "
        "partitioning by u, checkpoint between rounds at 100 TB. "
        "broadcast_frontier=False (r10) degrades the distance-table "
        "probe to a shuffled co-located join for small-world graphs "
        "where 2 hops reach node-scale - the bfs_levels escape hatch."
    ),
)
def q197_min_cost_paths(
    spark: SparkSession, sf_dir: str, *, broadcast_frontier: bool = True
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    em = (
        li.select(
            F.col("l_suppkey").alias("u"),
            F.col("l_partkey").alias("v"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .distinct()
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    und = em.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v"), F.col("w")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")),
            )
        ).alias("e")
    ).select("e.u", "e.v", "e.w").cache()
    d = em.sparkSession.createDataFrame([(1, 0)], "node bigint, cost bigint")
    for _ in range(2):
        # broadcast_frontier=True ships the node-sized distance table
        # to the edges so they are never shuffled; on a small-world
        # 100 TB graph whose 2-hop reachable set is node-scale, pass
        # False — the probe then shuffles and co-locates on und's u
        # partitioning instead (same contract as bfs_levels,
        # operators/graph.py).
        probe = F.broadcast(d) if broadcast_frontier else d
        relax = (
            und.join(probe, und.u == d.node)
            .select(F.col("v").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        d = (
            d.unionByName(relax)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .cache()
        )
    return d


@register(
    "q206_association_rules",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets FROM po),
    sup AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS s FROM po GROUP BY p),
    -- whale-basket cap, mirrors cap_baskets(max_basket=200)
    pow AS (
      SELECT po.o, po.p FROM po
      JOIN (SELECT o FROM po GROUP BY o HAVING COUNT(*) <= 200) k USING (o)),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS s_ab
      FROM pow a JOIN pow b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    directed AS (
      SELECT pa AS antecedent, pb AS consequent, s_ab FROM pairs
      UNION ALL
      SELECT pb, pa, s_ab FROM pairs),
    rules AS (
      SELECT d.antecedent, d.consequent, d.s_ab,
             sa.s AS s_a, sc.s AS s_c, n.n_baskets
      FROM directed d
      JOIN sup sa ON sa.p = d.antecedent
      JOIN sup sc ON sc.p = d.consequent
      CROSS JOIN n
      WHERE 10 * d.s_ab >= sa.s)
    SELECT antecedent, consequent, s_ab, s_a, s_c,
           {a} AS confidence,
           {b} AS lift
    FROM rules
    """.format(a=_R9('s_ab', 's_a'),
               b=_R9('CAST(s_ab AS HUGEINT) * n_baskets',
                     'CAST(s_a AS HUGEINT) * s_c')),
    doc=(
        "Association-rule mining (market-basket support / confidence "
        "/ lift) over order baskets - the classic retail co-purchase "
        "operator, composing q147's support-pruned pair counts into "
        "DIRECTED rules: one distinct collapse to the basket grain, "
        "the self-join on basket id with p<p ordering (support >= 2 "
        "prunes BEFORE any expansion), both rule directions from one "
        "pass over the pair table (explode, not a 2-branch re-join), "
        "and item supports attached by broadcast (Zipf-tiny). The "
        "confidence gate is the integer cross-multiplication "
        "10*s_ab >= s_a (conf >= 0.1) - exact on both engines; "
        "confidence/lift emit as single IEEE divisions of exact "
        "integers (correctly rounded, engine-identical - the ln-free "
        "rule again; rank by lift client-side, ln is monotone). At "
        "100 TB the basket self-join partitions by basket id and the "
        "frequent-pair table is always orders of magnitude smaller "
        "than the fact - the a-priori property in plan form."
    ),
)
def q206_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    po = basket_po(spark, sf_dir)
    n = F.broadcast(po.agg(F.countDistinct("o").alias("n_baskets")))
    sup = po.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    pairs = basket_pairs(spark, sf_dir).withColumnRenamed("n_ab", "s_ab")
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("antecedent"),
                    F.col("pb").alias("consequent"),
                    F.col("s_ab"),
                ),
                F.struct(
                    F.col("pb").alias("antecedent"),
                    F.col("pa").alias("consequent"),
                    F.col("s_ab"),
                ),
            )
        ).alias("r")
    ).select("r.antecedent", "r.consequent", "r.s_ab")
    sa = sup.select(F.col("p").alias("antecedent"), F.col("s").alias("s_a"))
    sc = sup.select(F.col("p").alias("consequent"), F.col("s").alias("s_c"))
    return (
        directed.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(n)
        .filter(F.lit(10) * F.col("s_ab") >= F.col("s_a"))
        .select(
            "antecedent", "consequent", "s_ab", "s_a", "s_c",
            # exact rational rounding (r16, the q88/q183 class)
            round9_exact("s_ab", "s_a").alias("confidence"),
            round9_exact("CAST(s_ab AS DECIMAL(38,0)) * n_baskets",
                         "CAST(s_a AS DECIMAL(38,0)) * s_c").alias("lift"),
        )
    )


@register(
    "q207_kcore_peeling",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    -- whale-basket cap, mirrors cap_baskets(max_basket=200)
    pow AS (
      SELECT po.o, po.p FROM po
      JOIN (SELECT o FROM po GROUP BY o HAVING COUNT(*) <= 200) k USING (o)),
    pairs2 AS (SELECT a.p AS a, b.p AS b, COUNT(*) AS c
               FROM pow a JOIN pow b ON a.o = b.o AND a.p < b.p
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    und AS (SELECT a AS u, v FROM (
              SELECT a, b AS v FROM pairs2
              UNION ALL SELECT b AS a, a AS v FROM pairs2) t),
    d1 AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
    k1 AS (SELECT u FROM d1 WHERE d >= 3),
    e1 AS (SELECT und.u, und.v FROM und
           JOIN k1 a ON a.u = und.u JOIN k1 b ON b.u = und.v),
    d2 AS (SELECT u, COUNT(*) AS d FROM e1 GROUP BY u),
    k2 AS (SELECT u FROM d2 WHERE d >= 3),
    e2 AS (SELECT e1.u, e1.v FROM e1
           JOIN k2 a ON a.u = e1.u JOIN k2 b ON b.u = e1.v)
    SELECT 1 AS round,
           CAST((SELECT COUNT(*) FROM k1) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e1) / 2 AS BIGINT) AS n_edges
    UNION ALL
    SELECT 2,
           CAST((SELECT COUNT(*) FROM k2) AS BIGINT),
           CAST((SELECT COUNT(*) FROM e2) / 2 AS BIGINT)
    """,
    doc=(
        "k-core decomposition (k=3, two peel rounds) over the "
        "support>=2 co-purchase part graph - the degree-based "
        "community-density operator completing the graph family "
        "(PageRank q146, BFS q148, CC q54, triangles q159, WL q158): "
        "each round drops nodes below degree k and the edges they "
        "carried, reporting the surviving (nodes, edges) per round. "
        "Bounded-round unrolling keeps it SQL-replayable exactly "
        "like PageRank's quantized rounds; full peeling iterates "
        "until fixpoint with the same per-round plan (degree "
        "aggregate + two semi-joins on the cached u-partitioned edge "
        "list - frontier-sized state, one edge shuffle reused, "
        "checkpoint between rounds at 100 TB). The survivor set is "
        "NODE-scale (peeling trims only the low-degree tail), so the "
        "endpoint joins carry the bfs_levels/q197 escape hatch: "
        "broadcast_keep=False degrades the u-side to a shuffled join "
        "the cached edge partitioning absorbs (r10, equivalence-"
        "tested). All counts integer; the directed/2 edge count is "
        "exact (explode emits both orientations, always even)."
    ),
)
def q207_kcore_peeling(
    spark: SparkSession, sf_dir: str, broadcast_keep: bool = True
) -> DataFrame:
    pairs = basket_pairs(spark, sf_dir)
    und = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("pa").alias("u"), F.col("pb").alias("v")),
                    F.struct(F.col("pb").alias("u"), F.col("pa").alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .repartition("u")
        .cache()
    )

    def peel(edges):
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= 3).select("u")
        # The survivor set is NODE-scale (peeling drops only the
        # low-degree tail each round), so the broadcast endpoint
        # filters carry the bfs_levels/q197 escape hatch: with
        # broadcast_keep=False the u-side join degrades to a shuffled
        # join that the cached repartition("u") edge partitioning
        # absorbs (the v-side pays the one unavoidable shuffle).
        ku = F.broadcast(keep) if broadcast_keep else keep
        kv = keep.select(F.col("u").alias("v"))
        kv = F.broadcast(kv) if broadcast_keep else kv
        kept = (
            edges.join(ku, "u")
            .join(kv, "v")
            .select("u", "v")
            .cache()
        )
        return keep, kept

    k1, e1 = peel(und)
    k2, e2 = peel(e1)
    r1 = (
        k1.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(e1.agg((F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges")))
        .select(F.lit(1).alias("round"), "n_nodes", "n_edges")
    )
    r2 = (
        k2.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(e2.agg((F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges")))
        .select(F.lit(2).alias("round"), "n_nodes", "n_edges")
    )
    return r1.unionByName(r2)
