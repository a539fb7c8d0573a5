"""Query registry: every operator surface from SURVEY.md §2 as a
named (spark_fn, oracle_sql) pair, wired into ``__spark_entry__``.

Each spark_fn takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is the ANSI-SQL twin DuckDB runs on the same parquet tables.
Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).  ``oracle=None`` marks
ops whose semantics are not SQL-expressible (driver falls back to a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.numeric import davg, dsum
from flink_s3_read_write_spark.operators import raw_text
from flink_s3_read_write_spark.sources.io import load_table


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


# Driver-facing ordering.  The correctness driver consumes registry
# entries in iteration order with a bounded per-round budget (50 per
# round), so entries that still lack a hard driver correctness row —
# or whose code/oracle changed since their last row — must come
# first.  Tiers going into round 6 (union of CORRECTNESS_r01..r05:
# zero latest-row FAILs; the local 157/157 sweep is green, so the
# window leads with what the driver has never seen):
#   0 — brand-new this round (never driver-checked): the BPE rounds,
#       the graph family (quantized PageRank / BFS / co-purchase),
#       the SAX time-series pair, the four-tier sketch-index suite
#       (HLL / bitmap-exact / theta set algebra / KLL merge), MAD
#       robust outliers, incremental view maintenance, snapshot diff;
#   0b — the round-5 oracle upgrades whose first driver rows landed
#       in r05's window but are worth a re-confirm after this round's
#       shared-module churn (dedup/similarity/graph caches);
#   1 — events queries downstream of the NTZ read normalization;
#   2 — everything already green, in stable order.
_DRIVER_FIRST: tuple[str, ...] = (
    # tier -1: the r04 verdict's rotation directive — md5-oracle
    # upgrades whose last driver rows predate the rewrite (q33/q34/
    # q36/q67 stale since r01) plus the sketch/semdedup upgrades
    "q33_minhash_dedup_pairs", "q34_simhash_near_pairs",
    "q36_ann_lsh_topk", "q67_ann_ivf_topk",
    "q97_semdedup", "q55_approx_sketches",
    # tier 0: brand-new this round, never driver-checked
    "q145_bpe_merge_rounds", "q146_pagerank_bipartite",
    "q147_copurchase_pairs", "q148_bfs_hops", "q149_sax_motifs",
    "q150_sax_similarity_probe", "q151_hll_sketch_index", "q152_mad_outliers",
    "q153_bitmap_distinct_rollup", "q154_theta_overlap_matrix",
    "q155_kll_quantile_index", "q156_incremental_view_maintenance",
    "q157_snapshot_diff", "q158_wl_graph_fingerprint",
    "q159_triangle_count", "q160_open_order_concurrency",
    "q161_pareto_skyline", "q162_cms_heavy_hitters",
    "q163_sorted_neighborhood_pairs", "q164_item_item_cf",
    "q165_touch_attribution", "q166_ab_test_ztest",
    "q167_grid_spatial_join", "q168_ohlc_bars", "q169_twap",
    "q170_daily_streaks", "q171_benford_audit",
    "q172_dq_constraint_suite", "q173_zorder_rowgroup_stats",
    "q174_classifier_eval", "q175_quantile_normalize",
    "q176_rolling_zscore_anomalies", "q177_cusum_changepoint",
    "q178_autocorrelation", "q179_contingency_table",
    "q180_mom_revenue_growth", "q181_markov_transitions",
    "q182_top_user_journeys", "q183_cohort_ltv_triangle",
    "q184_fifo_allocation", "q185_interevent_latency",
    "q186_weighted_median", "q187_percent_of_parent",
    "q188_ks_two_sample", "q189_spearman_rank_corr",
    # tier 0b: remaining round-5 oracle upgrades worth a re-confirm
    "q144_incremental_dedup", "q135_salted_skew_join",
    "q136_stratified_split",
    # round-5 additions, never driver-checked: PQ-ANN, hard-negative
    # mining, corpus token stats, content-defined-chunking dedup
    "q137_pq_ann_topk", "q138_hard_negatives",
    "q139_corpus_token_stats", "q140_cdc_chunk_dedup",
    "q141_embedding_covariance",
    # 51+: conventional moment/window shapes with the lowest
    # divergence risk — first in line for the r06 window
    "q142_groupwise_regression", "q143_gaps_islands_sessions",
    # tier 1a: oracle text changed this round (token-cap mirror)
    "q32_ngram_jaccard_pairs", "q54_dedup_keep_list",
    "q68_boilerplate_ngrams", "q124_source_overlap",
    # tier 1b: events queries over the rewritten NTZ read path
    "q25_asof_join_events", "q93_timestamp_arithmetic",
    "q125_scd2_intervals", "q131_locf_gapfill",
    "q50_tumbling_window", "q51_sliding_window", "q52_session_window",
    "q127_funnel_steps", "q128_retention_cohorts", "q129_event_sequences",
    "q130_salted_hot_key_agg",
    # tier 2: green rows worth re-confirming (flagship families +
    # round-4 first-timers); the rest of the registry follows in
    # registration order
    "q116_min_cost_supplier", "q117_late_order_priority",
    "q118_forecast_revenue", "q119_late_line_priority", "q120_custdist",
    "q121_top_supplier", "q122_part_promotion_suppliers",
    "q123_temperature_mix", "q126_quality_keeper_dedup",
    "q132_ntile_deciles", "q133_grouping_id_labels",
    "q134_curate_mix_pipeline",
    "q26_exists_subquery", "q27_correlated_scalar_subquery",
    "q113_unigram_lm_score", "q115_int8_cosine_pairs",
    "q87_pretrain_pipeline",
)


def registry() -> dict[str, Query]:
    # Import side-effect modules that register queries.
    from flink_s3_read_write_spark import (  # noqa: F401
        queries_relational,
        queries_llmdata,
        queries_streaming,
        queries_sql,
        queries_tpch,
    )

    front = {n: _REGISTRY[n] for n in _DRIVER_FIRST if n in _REGISTRY}
    mid = {
        n: q for n, q in _REGISTRY.items()
        if n not in front and q.oracle is not None
    }
    back = {n: q for n, q in _REGISTRY.items() if n not in front and q.oracle is None}
    return {**front, **mid, **back}


# ---------------------------------------------------------------------------
# Tier A analogues on the driver's synthetic tables (SURVEY.md §2.1).
# The fixture-faithful raw-text versions run in tests/test_fixture_faithful.py;
# here the same operator chain runs over driver tables so the DuckDB oracle
# can check it at sf0.01.
# ---------------------------------------------------------------------------


@register(
    "q1_uppercase",
    oracle="SELECT doc_id, upper(text) AS text_upper FROM documents",
    doc="A1∘A3∘A12 (S3ReadWriteExample.java:22-40): text in, uppercase out.",
)
def q1_uppercase(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.upper("text").alias("text_upper"))


@register(
    "q2_filter_exclude_key",
    oracle="""
    WITH raw AS (
      SELECT concat_ws(',', c_custkey, c_name, c_nationkey, c_mktsegment) AS value
      FROM customer
    )
    SELECT value FROM raw
    WHERE len(string_split(value, ',')) > 3
      AND string_split(value, ',')[4] <> 'BUILDING'
    """,
    doc=(
        "A2∘A4∘A5∘A7∘A12 (S3FlinkFilterJacksonville.java:31-51): raw CSV "
        "line → split(',') → positional filter on field 3 → rejoin. Same "
        "tokenize/filter/rejoin chain as the reference, running on lines "
        "serialized from the customer table ('BUILDING' plays Jacksonville)."
    ),
)
def q2_filter_exclude_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    raw = cust.select(
        F.concat_ws(",", "c_custkey", "c_name", "c_nationkey", "c_mktsegment").alias("value")
    )
    toks = raw_text.tokenize_csv(raw)
    kept = raw_text.filter_excluding_city(toks, "BUILDING")
    return raw_text.rejoin_csv(kept)


@register(
    "q3_avg_by_group",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value,
           COUNT(*) AS cnt
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type
    """,
    doc=(
        "FLAGSHIP. A2∘A4∘A6∘A8∘A9∘A10∘A11 "
        "(S3FlinkAverageSalaryByCity.java:28-48): filter out one key, "
        "then keyed avg+count. Catalyst partial+final HashAggregate "
        "replaces the manual Tuple3 running reduce; decimal-routed sum "
        "makes the double deterministic under any partitioning."
    ),
)
def q3_avg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(davg("value", "avg_value"), F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q3_formatted",
    oracle="""
    SELECT event_type || ',' || format('{:.2f}',
             round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value), 2))
           || ',' || COUNT(*) AS value
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type
    """,
    doc=(
        "A11 output formatting — '%s,%.2f,%d' exactly as "
        "S3FlinkAverageSalaryByCity.java:86 (JVM String.format HALF_UP)."
    ),
)
def q3_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = q3_avg_by_group(spark, sf_dir)
    return agg.select(
        F.format_string("%s,%.2f,%d", "event_type", "avg_value", "cnt").alias("value")
    )
