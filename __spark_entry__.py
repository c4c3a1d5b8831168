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
# ~50-query budget. Round-13 rotation (VERDICT r12 item 3): the 3
# queries re-based onto operators/ranks.py in round 12 lead (their
# latest driver rows predate the plan change; judge + local ladder
# verified at sf0.01/sf1/empty/one/skew, but the driver row is the
# hard signal), followed by the complete 47-query r09-stale block —
# 50 entries, exactly one driver budget. After this run the oldest
# registry row is r10 and the full re-proof cycle is 4 rounds.
_FIRST = [
    # Plan-changed in r12 (ranks.py re-base) — driver rows predate it.
    "skew_report",
    "customer_rfm",
    "token_budget_prefix",
    # r09-stale block (47): oldest driver rows in the registry.
    "agg_approx_sketches",
    "dedup_apply",
    "dedup_clusters",
    "dedup_clusters_multi",
    "dedup_winnowing",
    "dq_referential_integrity",
    "events_anomaly_days",
    "events_asof_prev",
    "events_bars_gapfill",
    "events_bars_incremental",
    "events_enrich_static",
    "events_hll_intersection",
    "events_retention_cohorts",
    "events_top_paths",
    "grouping_sets_revenue",
    "json_props",
    "json_props_struct",
    "p4_ticker_history",
    "p6_split_repair",
    "price_equidepth_hist",
    "price_winsorize",
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
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_nation_profit",
    "quality_classifier",
    "quality_keep_rate",
    "scalar_bundle",
    "set_ops",
    "split_assign",
    "ticker_mad_outliers",
    "w_longest_up_streak",
    "w_max_drawdown",
    "w_ticker_trend_slope",
    "w_trend_slope_closed",
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
