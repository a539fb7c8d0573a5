"""Randomized differential gate (tools/fuzz_corpus.py).

The driver corpora are deterministic and tie-free on the axes where
tie-break bugs live; the fuzz corpus is adversarial there by
construction (duplicate order totals, 1-second-grid event timestamps,
planted exact/near-duplicate documents and vectors, whale users,
boundary discounts/balances) while keeping schemas, FK validity and
categorical domains faithful so query preconditions hold.  A
representative query per family must match its DuckDB oracle
bit-for-bit on that corpus, through tools/check.py's own
compare_query (one comparison protocol — the CLI gate and this test
cannot drift apart).  The full 207-query sweep per seed runs as a
tool (`python tools/check.py --sf <fuzz dir>`, recorded in SCALE.md);
this test pins the fast cross-family subset into the suite.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check import compare_query, connect_oracle  # noqa: E402
from fuzz_corpus import build  # noqa: E402

# One representative per family, biased toward tie-sensitive shapes:
# top-k over snapped totals, mode/median over colliding values,
# sessions over gridded timestamps, dedup over planted duplicates.
SUBSET = [
    "q4_pricing_summary",
    "q5_revenue_by_priority",
    "q10_topk_orders_per_priority",
    "q11_running_total_per_customer",
    "q20_top10_orders",
    "q28_percentiles",
    "q30_dedup_exact",
    "q33_minhash_dedup_pairs",
    "q35_topk_cosine",
    "q42_embedding_dedup_pairs",
    "q53_json_props",
    "q129_event_sequences",
    "q142_groupwise_regression",
    "q143_gaps_islands_sessions",
    "q172_dq_constraint_suite",
    "q186_weighted_median",
    "q194_mode_per_group",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz") / "s7")
    build(d, seed=7)
    return d


def test_fuzz_subset_matches_oracle(spark, fuzz_dir):
    from flink_s3_read_write_spark.queries import registry

    reg = registry()
    # connect_oracle is main()'s own session setup (guards + views) —
    # shared so the oracle-session protocol cannot drift (ADVICE r12).
    con = connect_oracle(fuzz_dir)

    bad = []
    for name in SUBSET:
        s, o, _, _ = compare_query(spark, con, reg[name], fuzz_dir)
        if s != o:
            bad.append(f"{name}: spark={s} oracle={o}")
    assert not bad, "\n".join(bad)


@pytest.fixture(scope="module")
def degen60_dir(tmp_path_factory):
    """Corpus with a 60-doc identical cluster: MinHash band buckets of
    60 blow past the PRODUCTION cap (max_bucket=50), so q33/q54's
    default ring+star policy and its window-lead oracle replay
    actually execute — at gate SF those branches are inert (largest
    bucket: 4)."""
    d = str(tmp_path_factory.mktemp("fuzz") / "degen60")
    build(d, seed=14, degen_cluster=60)
    return d


@pytest.fixture(scope="module")
def degen1010_dir(tmp_path_factory):
    """Corpus with a 1010-doc identical cluster: SimHash band buckets
    blow past q34's production cap (max_bucket=1000), exercising its
    oracle's ring branches (payload-threaded Hamming verify).  q54 is
    deliberately NOT run here — its brute-force oracle's transitive
    closure is O(cluster^2) edges and the recursive CTE would chew
    through ~1e9 intermediate rows on a 1010-complete graph."""
    d = str(tmp_path_factory.mktemp("fuzz") / "degen1010")
    build(d, seed=15, degen_cluster=1010)
    return d


def test_ring_oracle_branches_execute_at_production_caps(
        spark, degen60_dir, degen1010_dir):
    """r14 (VERDICT items 2/4): over_cap="ring" is the production
    default, and q33/q34's oracles replay it with window leads +
    first_value.  Those SQL branches emit ZERO rows at gate SF, so a
    bug in them would ship silently — force over-cap buckets at the
    PRODUCTION knobs and demand exact hash equality, end-to-end
    through the keep-list composite (q54, whose exact-closure oracle
    only stays matched because ring keeps the degenerate cluster
    connected; the old drop default shatters it into 60 singletons)."""
    from flink_s3_read_write_spark.queries import registry

    reg = registry()
    bad = []
    con = connect_oracle(degen60_dir)
    for name in ("q33_minhash_dedup_pairs", "q54_dedup_keep_list",
                 "q210_keep_list_ring"):
        s, o, _, _ = compare_query(spark, con, reg[name], degen60_dir)
        if s != o:
            bad.append(f"{name}@degen60: spark={s} oracle={o}")
    # The cluster really is over-cap: its pairs exist (ring recall),
    # and the keep list collapses the 60 clones to ONE keeper.
    srows = [tuple(r) for r in reg["q54_dedup_keep_list"]
             .fn(spark, degen60_dir).collect()]
    clone_ids = set(range(120, 180))
    keepers = {r[0] for r in srows if r[2] and r[0] in clone_ids}
    assert len(keepers) == 1, f"expected 1 keeper in the clone cluster, got {keepers}"

    con2 = connect_oracle(degen1010_dir)
    for name in ("q33_minhash_dedup_pairs", "q34_simhash_near_pairs"):
        s, o, _, _ = compare_query(spark, con2, reg[name], degen1010_dir)
        if s != o:
            bad.append(f"{name}@degen1010: spark={s} oracle={o}")
    assert not bad, "\n".join(bad)


def test_ring_tie_axis_scattered_ids(spark, tmp_path_factory):
    """VERDICT r13 item 6: `_ring_pairs` orders by id_col, and every
    corpus so far handed it CONTIGUOUS clone ids in a tail block.
    This corpus makes the id axis adversarial — gappy doc_ids (random
    1..996 increments), clones interleaved with normal docs (one
    clustered positional run + scattered singles), SimHash payload
    ties riding the window — and demands exact hash equality against
    the window-lead oracle replay for the pair miners AND both
    keep-list composites."""
    from flink_s3_read_write_spark.queries import registry

    d = str(tmp_path_factory.mktemp("fuzz") / "scatter60")
    build(d, seed=16, degen_cluster=60, degen_scatter=True)
    reg = registry()
    con = connect_oracle(d)
    bad = []
    for name in ("q33_minhash_dedup_pairs", "q54_dedup_keep_list",
                 "q209_simhash_ring_overcap", "q210_keep_list_ring"):
        s, o, _, _ = compare_query(spark, con, reg[name], d)
        if s != o:
            bad.append(f"{name}@scatter60: spark={s} oracle={o}")
    assert not bad, "\n".join(bad)


def test_round_half_boundary_exact_division(spark, tmp_path_factory):
    """r15: fuzz seed 44 caught q183's ltv quotient landing EXACTLY on
    the 6-dp half boundary (33453.8015625 — reachable because the fuzz
    corpus snaps order totals to whole hundreds), where Spark's
    round(double, 6) (HALF_UP on the shortest decimal repr) and
    DuckDB's (binary-double arithmetic) disagree by one ulp of the
    grid.  The fix computes HALF_UP in exact integer arithmetic on
    both engines ((2*rev_micros + users) DIV (2*users)); this pins the
    triggering corpus so the class cannot regress silently."""
    from flink_s3_read_write_spark.queries import registry

    d = str(tmp_path_factory.mktemp("fuzz") / "s44")
    build(d, seed=44)
    con = connect_oracle(d)
    s, o, _, _ = compare_query(
        spark, con, registry()["q183_cohort_ltv_triangle"], d)
    assert s == o, f"q183@seed44: spark={s} oracle={o}"


def test_snap_groups_half_boundary_means(spark, tmp_path_factory):
    """r16 (VERDICT r15 item 3): the snap-groups corpus probes the
    round(double, 9) half-boundary bound AT its own boundary — groups
    engineered so exact means land on 10-digit-terminating decimals
    ending in 5, in BOTH sub-regimes:
    - dyadic (u/1024, flag 'A' / even-user stratum): binary-exact
      double, both engines round it the same way;
    - NON-dyadic (u/5120, flag 'R' / odd-user stratum): the double
      sits off the true boundary and the raw round paths genuinely
      diverge (verified below), which forced q88/q166's means into
      exact integer HALF_UP (the q183 fix class).
    Pins (a) exact Spark-vs-DuckDB hash equality for q88/q166 on the
    planted corpus, (b) the plant is non-vacuous: the raw
    round(double, 9) forms DISAGREE across engines on the planted
    non-dyadic quotient, so the exact-integer mean is load-bearing."""
    import duckdb

    from flink_s3_read_write_spark.queries import registry

    d = str(tmp_path_factory.mktemp("fuzz") / "snap51")
    build(d, seed=51, snap_groups=4096)
    reg = registry()
    con = connect_oracle(d)
    bad = []
    for name in ("q88_stats_aggregates", "q166_ab_test_ztest"):
        s, o, _, _ = compare_query(spark, con, reg[name], d)
        if s != o:
            bad.append(f"{name}@snap51: spark={s} oracle={o}")
    assert not bad, "\n".join(bad)

    # non-vacuity: the planted flag-'R' mean is a non-dyadic 9-dp
    # half boundary on which the RAW round forms diverge.
    n, s = duckdb.sql(
        f"SELECT COUNT(*), SUM(CAST(l_quantity AS DECIMAL(20,6))) "
        f"FROM '{d}/lineitem.parquet' WHERE l_returnflag = 'R'"
    ).fetchone()
    assert int(n) % 5120 == 0
    u = int(s) // (int(n) // 5120)
    assert u % 2 == 1 and u % 5 != 0 and int(s) * 5120 == u * int(n)
    raw_spark = spark.sql(
        f"SELECT round(CAST({int(s)} AS DOUBLE) / {int(n)}, 9)"
    ).collect()[0][0]
    raw_duck = duckdb.sql(
        f"SELECT round(CAST({int(s)} AS DOUBLE) / {int(n)}, 9)"
    ).fetchone()[0]
    assert raw_spark != raw_duck, (
        "the planted non-dyadic boundary no longer diverges between "
        "the raw round paths — the regime moved; re-probe "
        "fuzz_corpus._DIVERGENT_U")


def test_star2_two_family_bucket(spark, tmp_path_factory):
    """r15 (VERDICT r14 item 2): the star_k=2 nth_value branch, gated
    on a corpus with TWO interleaved clone families deterministically
    sharing an over-cap LSH bucket (fuzz_corpus two_family — family B
    shares family A's first 4 words, so their shingle minima co-bucket
    on bands 5/13 of the md5 affine family; ids interleave A B A A B).
    Demands (a) exact hash equality Spark-vs-DuckDB for q211 (raw
    star-2 topology) and q212 (keep-list composite) on that corpus,
    (b) the branch is LIVE here: star_k=2 emits cross-family edges
    from B's lowest clone that neither ring nor star-1 produce, and
    (c) the verify stage keeps the families apart: one keeper each,
    two distinct clusters (cross-family token Jaccard 0.2 < 1/2)."""
    from flink_s3_read_write_spark.operators import dedup as D
    from flink_s3_read_write_spark.queries import registry
    from flink_s3_read_write_spark.queries_llmdata import (
        STAR2_KW, doc_shingle_sets)
    from flink_s3_read_write_spark.sources.io import load_table

    d = str(tmp_path_factory.mktemp("fuzz") / "twofam")
    build(d, seed=21, two_family=True)
    reg = registry()
    con = connect_oracle(d)
    bad = []
    for name in ("q211_minhash_star2_overcap", "q212_keep_list_star2"):
        s, o, _, _ = compare_query(spark, con, reg[name], d)
        if s != o:
            bad.append(f"{name}@twofam: spark={s} oracle={o}")
    assert not bad, "\n".join(bad)

    # the 11-doc planted tail: A clones at 120,122,123,125,126,128,129
    # and B clones at 121,124,127,130 (B = every 3rd position).
    a_ids = {120, 122, 123, 125, 126, 128, 129}
    b_ids = {121, 124, 127, 130}
    docs = load_table(spark, d, "documents")
    sh = doc_shingle_sets(spark, d)
    kw1 = dict(STAR2_KW)
    kw1["star_k"] = 1
    p2 = {tuple(r) for r in
          D.minhash_lsh_pairs(docs, **STAR2_KW, shingle_sets=sh).collect()}
    p1 = {tuple(r) for r in
          D.minhash_lsh_pairs(docs, **kw1, shingle_sets=sh).collect()}
    cross2 = {p for p in p2 - p1
              if p[0] in b_ids and p[1] in a_ids}
    assert cross2, ("expected star-2-only cross-family edges from B's "
                    "lowest clone (the 2nd-smallest id of the shared "
                    "bucket); the nth_value branch emitted nothing new")

    rows = {r[0]: (r[1], r[2]) for r in reg["q212_keep_list_star2"]
            .fn(spark, d).collect()}
    assert {rows[i][0] for i in a_ids} == {120}, "family A must be ONE cluster"
    assert {rows[i][0] for i in b_ids} == {121}, "family B must be ONE cluster"
    assert [i for i in sorted(a_ids | b_ids) if rows[i][1]] == [120, 121], \
        "exactly one keeper per family (cross verify must fail at 1/2)"


def test_tie_grid_rank_boundary_family(spark, tmp_path_factory):
    """r16 (VERDICT r15 item 2): the r11 rotation tail is the
    rank/weight-boundary family (rank-exact percentiles, weighted
    medians, mode ties, KS steps, quintiles, PPS pointers) — and the
    only real bugs of r14-r15 came from aged-tail boundary regimes.
    The tie-grid corpus floods exact-tie plateaus across every rank
    boundary (13-value events grid, 80% snapped totals, 70% gridded
    timestamps).  Pins (a) the regime is live: the value domain
    collapses to the grid and at least one segment's total weight is
    even (the 2*cw == tw exact-half crossing is reachable), (b) the
    tail-family representatives match their oracles bit-for-bit on
    that corpus."""
    import duckdb

    from flink_s3_read_write_spark.queries import registry

    d = str(tmp_path_factory.mktemp("fuzz") / "tie52")
    build(d, seed=52, tie_grid=13)

    nv, even_tw = duckdb.sql(f"""
        SELECT (SELECT COUNT(DISTINCT value)
                FROM '{d}/events.parquet'),
               (SELECT COUNT(*) FROM (
                  SELECT c.c_mktsegment,
                         SUM((SELECT COUNT(*)
                              FROM '{d}/lineitem.parquet' l
                              WHERE l.l_orderkey = o.o_orderkey)) AS tw
                  FROM '{d}/orders.parquet' o
                  JOIN '{d}/customer.parquet' c
                    ON c.c_custkey = o.o_custkey
                  GROUP BY 1) t WHERE tw % 2 = 0)
    """).fetchone()
    assert nv == 13, nv
    assert even_tw >= 1, "no even-total-weight segment: exact-half " \
                         "crossing unreachable on this corpus"

    reg = registry()
    con = connect_oracle(d)
    bad = []
    for name in ("q175_quantile_normalize", "q185_interevent_latency",
                 "q186_weighted_median", "q188_ks_two_sample",
                 "q193_deterministic_sample", "q194_mode_per_group",
                 "q196_rfm_segmentation", "q198_pps_systematic_sample"):
        s, o, _, _ = compare_query(spark, con, reg[name], d)
        if s != o:
            bad.append(f"{name}@tie52: spark={s} oracle={o}")
    assert not bad, "\n".join(bad)


def test_all_adversarial_knobs_composed(spark, tmp_path_factory):
    """r15: every corpus-adversarial knob at once — 60 scattered
    clones on a gappy id axis PLUS the two interleaved clone families
    — exact hash equality for the whole dedup-family subset (pair
    miners, both forced-gate entries, all three keep-list
    composites).  The composition itself crashed the corpus builder
    on first construction (doc_ids/texts length mismatch), so this
    also pins that the knobs stay composable."""
    from flink_s3_read_write_spark.queries import registry

    d = str(tmp_path_factory.mktemp("fuzz") / "combo48")
    build(d, seed=48, degen_cluster=60, degen_scatter=True,
          two_family=True)
    reg = registry()
    con = connect_oracle(d)
    bad = []
    for name in ("q33_minhash_dedup_pairs", "q34_simhash_near_pairs",
                 "q208_minhash_ring_overcap", "q209_simhash_ring_overcap",
                 "q54_dedup_keep_list", "q210_keep_list_ring",
                 "q211_minhash_star2_overcap", "q212_keep_list_star2"):
        s, o, _, _ = compare_query(spark, con, reg[name], d)
        if s != o:
            bad.append(f"{name}@combo48: spark={s} oracle={o}")
    assert not bad, "\n".join(bad)


def test_engine_error_attributes_the_failing_side(spark, fuzz_dir):
    """compare_query tags engine failures with the side that raised
    (ADVICE r12): a broken Spark fn surfaces as EngineError('spark'),
    a broken oracle as EngineError('duckdb'), and the message carries
    the prefix main() prints during a full-registry sweep."""
    from check import EngineError, connect_oracle as _co

    from flink_s3_read_write_spark.queries import Query

    con = _co(fuzz_dir)

    def boom(spark, sf_dir):
        raise RuntimeError("spark side exploded")

    with pytest.raises(EngineError) as ei:
        compare_query(spark, con,
                      Query("t_spark_boom", boom, "SELECT 1 AS x"),
                      fuzz_dir)
    assert ei.value.engine == "spark" and str(ei.value).startswith("spark:")

    def ok(spark, sf_dir):
        return spark.range(1).selectExpr("CAST(id AS BIGINT) AS x")

    with pytest.raises(EngineError) as ei:
        compare_query(spark, con,
                      Query("t_duck_boom", ok, "SELECT no_such_col FROM documents"),
                      fuzz_dir)
    assert ei.value.engine == "duckdb" and str(ei.value).startswith("duckdb:")
