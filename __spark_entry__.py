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
# ~50-query budget. Round-7 rotation (registry FROZEN at 148 this
# round): the 8 queries that have never had a driver row come first,
# then the 40 whose latest green row is r04 (two rounds stale), then
# the queries round 7's ADVICE fixes touch. 8 + 40 = 48 ≤ budget, so
# after the r7 run zero never-checked queries remain and no green row
# is older than r05.
_FIRST = [
    # Never driver-checked (past position 50 in the r6 order); they
    # are locally parity-green at sf0.001/sf0.01 but have no hard
    # driver signal yet — nothing outranks them.
    "dq_documents_gate",
    "langid_confusion",
    "jaccard_band_report",
    "pack_fill_report",
    "ts_corr_pairs",
    "ts_corr_pairs_sketched",
    "ts_corr_recall",
    "w_rolling_range_7d",
    # Latest green driver row is r04 (the r04 \ (r05 ∪ r06) set,
    # computed from CORRECTNESS_r0{1..6}.json by
    # tools/gen_coverage.py).
    "a4_a5_summary_metrics",
    "agg_distinct_percentile",
    "curation_funnel",
    "dedup_clusters",
    "dedup_clusters_multi",
    "dedup_embedding_pairs",
    "dedup_incremental",
    "dq_lineitem_gate",
    "emb_cosine_topk_blas",
    "emb_ivf_topk",
    "emb_quantize_int8",
    "events_bars_rollup",
    "events_hll_cascade",
    "having_big_orders",
    "j1_composition_market_cap",
    "j2_upsert",
    "j3_asof_walkback",
    "p3_point_lookup",
    "pack_sequences",
    "pii_scrub",
    "pii_stats",
    "pivot_order_status",
    "q13_order_histogram",
    "q3_shipping_priority",
    "q4_late_order_priority",
    "sample_stratified",
    "semi_anti_join",
    "skew_salted_agg",
    "text_decontaminate",
    "text_rarity",
    "text_repetition",
    "unpivot_prices",
    "vocab_topk",
    "w3_w4_returns",
    "w5_w6_composition_changes",
    "w7_latest_stats",
    "w8_latest_per_ticker",
    "w9_topk_per_date",
    "w_beta_corr",
    "w_moving_stats",
    # Touched by round-7 ADVICE fixes (all have fresh r06 green rows;
    # re-verify the changed code paths with the 2 spare budget slots,
    # overflow is harmless).
    "decontam_embedding",
    "stocks_snapshot_diff",
    "price_equidepth_hist",
    "price_winsorize",
    "ticker_mad_outliers",
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
