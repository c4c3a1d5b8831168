"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``marketviz_spark``; this file only adapts
its registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marketviz_spark.registry import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the daily equal-weighted top-K index) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["index_daily"].fn(spark, "/root/testdata/sf0.001")


# The driver checks queries in dict insertion order and stops at a
# ~50-query budget. Round-9 rotation (staleness is computed against
# CORRECTNESS_r0{5..8}):
# first the 12 queries whose CODE is new or changed in round 9
# (the quality-classifier pair, the bigram-LM pair, winnowing;
# star connected components, trend-slope rounding
# unification, RI-audit join-strategy change), then the 8-query
# r05-stale overflow tail round 8 explicitly rolled forward, then
# the r06-stale set (44 queries) ordered join/window-complex first.
# 12 + 8 + 44 = 64 overflows a 50 budget by ~14, so the LAST
# positions are the lowest-risk overflow (map-only/aggregate
# curation-plan queries, unchanged since r06, green in multiple
# prior rounds) and roll to the r10 rotation.
_FIRST = [
    # NEW in round 9: hashed-linear quality classifier
    # (datapipe/quality_model.py), bigram-LM likelihood scorers
    # (datapipe/lm.py), and winnowing fingerprints (dedup.py) —
    # never driver-checked before, so these lead.
    "quality_classifier",
    "quality_keep_rate",
    "lm_doc_likelihood",
    "lm_heldout_score",
    "dedup_winnowing",
    # Changed round 9: large-star/small-star components
    # (dedup.py _star_components) behind these three cluster
    # queries; floor-half-up rounding unified across the trend-slope
    # twins and the sketch oracle; Catalyst-chosen join strategy in
    # the RI audit.
    "dedup_clusters",
    "dedup_clusters_multi",
    "dedup_apply",
    "agg_approx_sketches",
    "w_ticker_trend_slope",
    "w_trend_slope_closed",
    "dq_referential_integrity",
    # The r05-stale tail rolled from round 8's rotation — these must
    # green this round so no registry query's latest green row is
    # older than r06.
    "p2_filter_date",
    "p4_ticker_history",
    "p6_split_repair",
    "scalar_bundle",
    "set_ops",
    "json_props",
    "json_props_struct",
    "split_assign",
    # Latest green driver row is r06 — multi-join TPC-H, events, and
    # window/price operators first (highest regression surface).
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_revenue",
    "q11_part_value_share",
    "q12_priority_by_delay",
    "q14_promo_revenue_pct",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q18_large_order_customers",
    "q19_bracket_disjunction",
    "q20_promo_volume_suppliers",
    "q21_sole_late_supplier",
    "q22_idle_customer_balance",
    "grouping_sets_revenue",
    "events_retention_cohorts",
    "events_anomaly_days",
    "events_enrich_static",
    "events_asof_prev",
    "events_bars_incremental",
    "events_bars_gapfill",
    "events_top_paths",
    "events_hll_intersection",
    "ticker_mad_outliers",
    "price_equidepth_hist",
    "price_winsorize",
    "w_max_drawdown",
    "w_longest_up_streak",
    "cluster_split",
    "cluster_size_histogram",
    "chunk_index_dedup",
    "boilerplate_chunks",
    "doc_chunks",
    # Lowest-risk overflow tail — map-only/aggregate curation-plan
    # queries unchanged since r06: whatever the ~50 budget cuts
    # lands here and rolls to the r10 rotation.
    "corpus_drift",
    "curriculum_order",
    "sample_pps",
    "mixture_plan",
    "mixture_plan_weighted",
    "mixture_apply",
    "token_coverage_curve",
    "oov_rates",
    "bpe_merge_pairs",
]


def _ordered() -> list[str]:
    rest = [n for n in QUERIES if n not in _FIRST]
    return [n for n in _FIRST if n in QUERIES] + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted entries get rows-only checks."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered()
        if QUERIES[name].oracle is not None
    }
