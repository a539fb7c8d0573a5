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
