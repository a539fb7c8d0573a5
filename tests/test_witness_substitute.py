"""The witness tier of the two-tier sweep protocol (r16, VERDICT r15
item 4): `tools/check.py --witness-above N` substitutes
corpus-independent witness invariants for the expensive text-family
replay oracles above the full-replay tier.  These tests pin BOTH
directions:

- positive: `substitute_check` passes on real engine output for a
  representative of each family (pair miner, simhash, keep-list);
- negative (non-vacuity): each planted=False witness FAILS on
  hand-tampered output — a wrong jaccard, a below-threshold pair, a
  broken keep-list labeling, a missing zero-hamming clique pair — so
  a witness-tier "pass" is evidence, not ceremony.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check import connect_oracle  # noqa: E402
from witness_oracle import (  # noqa: E402
    WITNESS_SUBSTITUTE,
    substitute_check,
    witness,
    witness_keep_list,
    witness_simhash,
)

SF = "/root/testdata/sf0.001"


def test_substitute_check_passes_on_real_output(spark):
    from flink_s3_read_write_spark.queries import registry

    reg = registry()
    con = connect_oracle(SF)
    for name in ("q33_minhash_dedup_pairs", "q34_simhash_near_pairs",
                 "q54_dedup_keep_list"):
        assert name in WITNESS_SUBSTITUTE
        rec = substitute_check(spark, con, reg[name].fn, name, SF)
        assert rec["pass"], rec
        assert rec["tier"] == "witness-substitute"
    # q211 emits raw candidate topology (no verify filter): no
    # soundness invariant applies, so it must NOT be substitutable.
    assert "q211_minhash_star2_overcap" not in WITNESS_SUBSTITUTE


def _write(path, cols, schema):
    pq.write_table(pa.table(cols, schema=schema), str(path))


@pytest.fixture()
def tiny(tmp_path):
    """Two near-dup docs (token-J = 3/4) + one identical pair."""
    _write(tmp_path / "documents.parquet",
           {"doc_id": [1, 2, 3, 4],
            "text": ["alpha beta gamma delta", "alpha beta gamma echo",
                     "same text here please", "same text here please"]},
           pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
    return tmp_path


def test_w1_fails_on_tampered_jaccard(tiny):
    con = connect_oracle(SF)
    docs = str(tiny / "documents.parquet")
    # true token-J(1,2) = 3/5 — emit 0.9: W1 bit-exact check must trip
    _write(tiny / "pairs.parquet",
           {"id_a": [1], "id_b": [2], "jaccard": [0.9]},
           pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                      ("jaccard", pa.float64())]))
    rec = witness(con, str(tiny / "pairs.parquet"), docs, 0,
                  1, 2, planted=False)
    assert not rec["pass"]
    assert rec["w1_soundness"]["violations"] == 1

    # correct jaccard but below the claimed threshold: also a violation
    _write(tiny / "pairs2.parquet",
           {"id_a": [1], "id_b": [2], "jaccard": [0.6]},
           pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                      ("jaccard", pa.float64())]))
    ok = witness(con, str(tiny / "pairs2.parquet"), docs, 0,
                 1, 2, planted=False)
    assert ok["pass"], ok  # 3/5 = 0.6 >= 1/2, bit-exact
    strict = witness(con, str(tiny / "pairs2.parquet"), docs, 0,
                     9, 10, planted=False)
    assert not strict["pass"]  # 0.6 < 9/10


def test_keep_list_fails_on_broken_labeling(tiny):
    con = connect_oracle(SF)
    docs = str(tiny / "documents.parquet")
    schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64()),
                        ("keep", pa.bool_())])
    # label is not the cluster min (doc 3 labeled by 4): K1 trips
    _write(tiny / "keep_bad.parquet",
           {"doc_id": [1, 2, 3, 4], "cluster_id": [1, 2, 4, 4],
            "keep": [True, True, False, True]},
           schema)
    rec = witness_keep_list(con, str(tiny / "keep_bad.parquet"), docs,
                            0, "tokens", 1, 2, planted=False)
    assert not rec["pass"]
    assert rec["k1_structure"]["label_not_min"] == 1

    # keepers != distinct labels (two keepers in one cluster): K3 trips
    _write(tiny / "keep_bad2.parquet",
           {"doc_id": [1, 2, 3, 4], "cluster_id": [1, 2, 3, 3],
            "keep": [True, True, True, True]},
           schema)
    rec2 = witness_keep_list(con, str(tiny / "keep_bad2.parquet"), docs,
                             0, "tokens", 1, 2, planted=False)
    assert not rec2["pass"]
    # K1's bad_keep_flag catches keep=True off the label row too
    assert rec2["k1_structure"]["bad_keep_flag"] == 1

    # clean labeling passes (docs 3,4 identical -> one cluster)
    _write(tiny / "keep_ok.parquet",
           {"doc_id": [1, 2, 3, 4], "cluster_id": [1, 2, 3, 3],
            "keep": [True, True, True, False]},
           schema)
    rec3 = witness_keep_list(con, str(tiny / "keep_ok.parquet"), docs,
                             0, "tokens", 1, 2, planted=False)
    assert rec3["pass"], rec3


def test_k4_edge_growth_ceiling(tiny):
    """K4 (r16, VERDICT r15 item 5): verified-edge growth on a
    replica gates at base_docs*C(mult,2) + 2*edges_base*mult^2 — the
    mechanized form of the r15 q212 shuffle-growth attribution.  A
    content-driven growth (planted clusters multiplying true edges)
    stays under the ceiling; an n^2 blowup fails the gate."""
    con = connect_oracle(SF)
    docs = str(tiny / "documents.parquet")
    _write(tiny / "keep.parquet",
           {"doc_id": [1, 2, 3, 4], "cluster_id": [1, 2, 3, 3],
            "keep": [True, True, True, False]},
           pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64()),
                      ("keep", pa.bool_())]))
    # pretend mult=10 replica of a 0-base... use planted arithmetic
    # directly: 4 docs / mult 2 -> base_docs 2, within-ceiling
    # 2*C(2,2=1) + 2*edges_base*4.
    ok = witness_keep_list(con, str(tiny / "keep.parquet"), docs, 2,
                           "tokens", 1, 2, k2_gates=False,
                           edges_big=10, edges_base=1)
    # ceiling = 2*1 + 2*1*4 = 10 -> 10 <= 10 passes K4
    assert ok["k4_edge_growth"]["ok"] and ok["k4_edge_growth"]["ceiling"] == 10
    bad = witness_keep_list(con, str(tiny / "keep.parquet"), docs, 2,
                            "tokens", 1, 2, k2_gates=False,
                            edges_big=11, edges_base=1)
    assert not bad["k4_edge_growth"]["ok"] and not bad["pass"]


def test_keep_list_pair_stage_matches_composites(spark):
    """The K4 pair-stage mapping must mirror each composite's OWN
    verified edges: connected components over the mapped pair stage
    must reproduce the registry keep-list labels exactly (a knob
    drift between _keep_list_pair_stage and the composite would make
    K4 count a sibling entry's edges)."""
    from flink_s3_read_write_spark.operators.dedup import (
        connected_components)
    from flink_s3_read_write_spark.queries import registry
    from flink_s3_read_write_spark.sources.io import load_table
    from witness_oracle import _keep_list_pair_stage

    reg = registry()
    try:
        for name in ("q54_dedup_keep_list", "q210_keep_list_ring",
                     "q212_keep_list_star2"):
            pairs = _keep_list_pair_stage(name, spark, SF)
            clusters = connected_components(pairs)
            docs = load_table(spark, SF, "documents").select("doc_id")
            import pyspark.sql.functions as F
            labeled = (docs.join(clusters, docs.doc_id == clusters.id,
                                 "left")
                       .select("doc_id",
                               F.coalesce("cluster_id", "doc_id")
                               .alias("cluster_id")))
            got = {(r[0], r[1]) for r in labeled.collect()}
            want = {(r[0], r[1]) for r in
                    reg[name].fn(spark, SF).select(
                        "doc_id", "cluster_id").collect()}
            assert got == want, f"{name}: pair stage drifted"
    finally:
        spark.catalog.clearCache()


def test_simhash_fails_on_missing_clique_pair(tiny):
    con = connect_oracle(SF)
    docs = str(tiny / "documents.parquet")
    # docs 3 and 4 share identical text => identical simhash => all
    # band buckets shared; with the default cap their pair MUST be
    # emitted (W2s zero-hamming clique).  An empty output misses it.
    _write(tiny / "pairs_empty.parquet",
           {"id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "hamming": pa.array([], type=pa.int64())},
           pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                      ("hamming", pa.int64())]))
    rec = witness_simhash(con, str(tiny / "pairs_empty.parquet"), docs,
                          0, planted=False)
    assert not rec["pass"]
    assert rec["w2s_zero_hamming_clique"]["missing"] == 1

    # wrong hamming on the emitted pair: W1 trips
    _write(tiny / "pairs_bad.parquet",
           {"id_a": [3], "id_b": [4], "hamming": [2]},
           pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                      ("hamming", pa.int64())]))
    rec2 = witness_simhash(con, str(tiny / "pairs_bad.parquet"), docs,
                           0, planted=False)
    assert not rec2["pass"]
    assert rec2["w1_soundness"]["violations"] == 1

    # the true pair (hamming 0) passes
    _write(tiny / "pairs_ok.parquet",
           {"id_a": [3], "id_b": [4], "hamming": [0]},
           pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                      ("hamming", pa.int64())]))
    rec3 = witness_simhash(con, str(tiny / "pairs_ok.parquet"), docs,
                           0, planted=False)
    assert rec3["pass"], rec3
