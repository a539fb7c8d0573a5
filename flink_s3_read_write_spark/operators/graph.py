"""Iterative graph analytics as unrolled relational rounds.

PageRank (public algorithm, Brin & Page 1998) is the canonical
Pregel-style workload: per iteration every node divides its rank
among its neighbours (one join edges⋈ranks) and sums what flows in
(one aggregate).  Spark expresses each iteration as a join + groupBy;
the driver never sees per-node state.

Cross-engine exactness: ranks are carried as *integers* at a fixed
scale S (rank_real = rank_int / S) and every division is an explicit
integer floor division (`div` in Spark, `//` in DuckDB — identical
on non-negative operands).  The recurrence

    contrib(u) = r(u) div deg(u)
    r'(v)      = (15·(S div N)) div 100  +  (85·Σ inflow(v)) div 100

is then a pure integer program: no float summation order, no libm —
a SQL oracle replays it bit-for-bit, which is how an inherently
iterative algorithm gets a full hash-checked correctness gate.
The floored mass leak (≤ deg(u) ulps per node per round) is the
price of determinism and is identical on both engines.

Scale: each iteration shuffles the edge table once (join on u) and
the node table once (groupBy v).  At 100 TB the edge table is
partitioned by u and the per-iteration result is checkpointed
(lineage truncation, same pattern as dedup.py's connected
components); here iterations are unrolled in one lazy plan with a
vocabulary-sized cache per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000_000  # 10^15: 85·S < 2^63, ample rank resolution


def degree_table(edges: DataFrame) -> DataFrame:
    """(u, deg) out-degrees. ``edges`` must already contain both
    directions if the graph is undirected."""
    return edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))


def pagerank_quantized(
    edges: DataFrame, iters: int = 3, scale: int = PR_SCALE
) -> DataFrame:
    """Integer-quantized PageRank over directed ``edges (u, v)``.

    Returns (u, deg, r) after ``iters`` rounds; r is the scaled
    integer rank.  Nodes = every u with at least one out-edge (in a
    both-directions undirected encoding that is every node).
    """
    deg = degree_table(edges).cache()
    n_nodes = F.broadcast(deg.agg(F.count(F.lit(1)).alias("_n")))
    # base = (15·(S div N)) div 100, a per-graph constant carried as a
    # column so no driver-side collect is needed.
    r = deg.crossJoin(n_nodes).select(
        "u",
        "deg",
        F.expr(f"{scale} div _n").alias("r"),
        F.expr(f"(15 * ({scale} div _n)) div 100").alias("base"),
    ).cache()
    for _ in range(iters):
        contrib = r.select("u", F.expr("r div deg").alias("c"))
        inflow = (
            edges.join(contrib, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(F.sum("c").alias("infl"))
        )
        r = (
            r.select("u", "deg", "base")
            .join(inflow, "u", "left")
            .select(
                "u",
                "deg",
                (
                    F.col("base")
                    + F.expr("(85 * coalesce(infl, 0L)) div 100")
                ).alias("r"),
                "base",
            )
            .cache()
        )
    return r.select("u", "deg", "r")


def bfs_levels(
    edges: DataFrame, seeds: DataFrame, rounds: int = 3,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Hop distance from a seed set by unrolled frontier expansion.

    ``seeds`` is a 1-column (u) DataFrame at distance 0.  Each round
    is one edges⋈reached join + a min-aggregate — the relational BFS
    step; after k rounds the result holds min(dist) ≤ k for every
    reachable node.  Pure integer arithmetic, so a SQL oracle replays
    it exactly.

    ``broadcast_frontier=True`` ships the node-sized reached set to
    the (much larger) edge table so edges are never shuffled — the
    right plan while |nodes| ≪ |edges| fits the broadcast budget.  At
    the scale where even the frontier outgrows broadcast, pass False
    and pre-partition edges by u (the joins then co-locate), expand
    only the NEW frontier per round, and checkpoint between rounds
    (dedup.py CC pattern).
    """
    reached = seeds.select("u", F.lit(0).cast("int").alias("dist"))
    for _ in range(rounds):
        probe = F.broadcast(reached) if broadcast_frontier else reached
        nxt = (
            edges.join(probe, "u")
            .select(F.col("v").alias("u"), (F.col("dist") + 1).alias("dist"))
        )
        # reached feeds BOTH the probe and the union — uncached, round
        # k would recompute round k-1 twice (2^k blow-up), same issue
        # as bpe.py's per-round vocabularies.  Node-sized; cache.
        reached = (
            reached.unionByName(nxt).groupBy("u").agg(F.min("dist").alias("dist"))
        ).cache()
    return reached


def wl_refine(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Weisfeiler-Lehman label refinement (public algorithm — the 1-WL
    colour refinement behind graph-isomorphism tests and WL kernels).

    Nodes start labelled by degree; each round relabels
    ``substr(md5(own || '|' || neighbour-multiset hash), 1, 16)`` —
    after k rounds two nodes share a label only if their k-hop
    neighbourhood trees agree, so the labels are structural
    fingerprints (graph dedup / similarity at the structure level).
    The 16-hex-char (64-bit) truncation halves the per-round label
    payload through the message shuffle; collision odds across ~n²/2
    pairs stay ≪ 1e-9 for n up to millions of distinct labels.

    The neighbour multiset enters the relabel hash as an ADDITIVE
    multiset hash (r09): TWO independent sums over neighbours — the
    60-bit md5 of the label reduced mod two distinct 31-bit primes,
    with independent key prefixes — plus the neighbour count.  Equal
    multisets give equal (s1, s2, count) exactly; unequal ones
    collide only when BOTH lanes collide, ~2^-62 per pair, restoring
    the sorted-list digest's collision budget (one 31-bit lane alone
    would give expected collisions at millions of labels).  This
    replaces the canonical ``array_sort(collect_list(...))``
    aggregate, which held a HUB node's entire degree-sized label list
    as one group's aggregation state — the additive form is plain
    mergeable SUMs/COUNT with map-side partials (the q192
    posting-digest rule).  Exact int64: each term < 2^31, so degrees
    into the billions stay below 2^63.

    Relational per round: one edges⋈labels join + one scalar
    aggregate, engine-independent and SQL-replayable.  Per-round
    caching bounds lineage (bpe.py rule); at 100 TB rounds checkpoint
    and the join co-locates on the edge partitioning.
    """
    from flink_s3_read_write_spark.operators.dedup import (
        DIGEST_LANE2_KEY, DIGEST_P1, DIGEST_P2,
    )

    lab = degree_table(edges).select("u", F.col("deg").cast("string").alias("lb"))
    lab = lab.cache()
    for _ in range(rounds):
        h1 = F.conv(F.substring(F.md5("lb"), 1, 15), 16, 10).cast("long") % DIGEST_P1
        h2 = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(DIGEST_LANE2_KEY), F.col("lb"))), 1, 15),
                16, 10,
            ).cast("long") % DIGEST_P2
        )
        nb = (
            edges.join(lab, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(
                F.sum(h1).alias("_s1"),
                F.sum(h2).alias("_s2"),
                F.count(F.lit(1)).alias("_d"),
            )
        )
        lab = (
            lab.join(nb, "u", "left")
            .select(
                "u",
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("lb"),
                            F.coalesce(F.col("_s1").cast("string"), F.lit("")),
                            F.coalesce(F.col("_s2").cast("string"), F.lit("")),
                            F.coalesce(F.col("_d").cast("string"), F.lit("")),
                        )
                    ),
                    1,
                    16,
                ).alias("lb"),
            )
            .cache()
        )
    return lab


def wl_class_summary(labels: DataFrame) -> DataFrame:
    """Structure-class statistics over WL fingerprints: how many
    distinct structural classes, how many are singletons, the largest
    class — the one-row profile of a graph's local-structure variety."""
    classes = labels.groupBy("lb").agg(F.count(F.lit(1)).alias("n"))
    return classes.agg(
        F.sum("n").alias("n_nodes"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_singletons"),
        F.max("n").alias("max_class_size"),
    )


def top_ranked(ranks: DataFrame, k: int = 20) -> DataFrame:
    """Top-k nodes by (rank DESC, node ASC) with their position.

    Sort+limit first (TakeOrderedAndProject — never a global-window
    single-partition sort of the full node table), then number the k
    survivors; the order is total so positions are engine-independent.
    """
    topk = ranks.orderBy(F.desc("r"), "u").limit(k)
    w = Window.orderBy(F.desc("r"), "u")
    return (
        topk.withColumn("rn", F.row_number().over(w))
        .select(F.col("u").alias("node"), F.col("r").alias("rank_int"), "rn")
    )
