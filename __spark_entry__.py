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
# ~50-query budget. Round-8 rotation: the 11 queries whose CODE
# changed this round come first (their old green rows no longer
# vouch for the current source), then the r05-stale set (latest
# green row three rounds old, computed from
# CORRECTNESS_r0{1..7}.json). 11 + 47 = 58 overflows a 50 budget by
# 8, so the LAST 8 positions are explicitly the lowest-risk overflow
# (simple map-only scalar/filter/json queries, unchanged since r05,
# green in multiple prior rounds) and roll to r09's rotation.
_FIRST = [
    # Changed this round: plan reworks (w_share_of_day RATIO denom,
    # dq RI single-pass, agg_approx_sketches cents-histogram bounds),
    # the new closed-form slope, and the _fix_round6 order-fixed
    # cosine fixup in the dense block-scoring paths.
    "w_trend_slope_closed",
    "w_share_of_day",
    "dq_referential_integrity",
    "agg_approx_sketches",
    "emb_cosine_topk_blas",
    "emb_ivf_topk",
    "semdedup_prune",
    "decontam_embedding",
    "ann_recall",
    "emb_lsh_topk",
    "dedup_modality_agreement",
    # Latest green driver row is r05 (minus the ones above), complex
    # operators first — w_ticker_trend_slope is up top because the
    # new closed-form twin's golden test pins bit-equality against it.
    "w_ticker_trend_slope",
    "w1_split_adjust",
    "w_rank_family",
    "index_daily",
    "corpus_source_report",
    "cube_revenue",
    "curation_apply",
    "dedup_apply",
    "dedup_bucket_overflow",
    "dedup_exact",
    "dedup_levenshtein",
    "dedup_lsh_pairs",
    "dedup_minhash_estimate",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_shingle_overflow",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_substring_spans",
    "emb_cosine_topk",
    "events_click_error_pairs",
    "events_funnel_conversion",
    "events_range_join",
    "events_session_10m",
    "events_sliding_1h_30m",
    "events_transition_matrix",
    "events_tumbling_1h",
    "mm_frame_sample",
    "mm_payload_features",
    "o5_summary_tail30",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "rollup_orders",
    "skew_salted_join",
    "text_fingerprints",
    "text_langid",
    "text_stats",
    "text_token_bpe",
    # Lowest-risk overflow tail — the 8 simplest map-only
    # scalar/filter/json queries, unchanged since r05 with multiple
    # historical green rows: whatever the ~50 budget cuts lands
    # here and rolls to the r09 rotation.
    "p2_filter_date",
    "p4_ticker_history",
    "p6_split_repair",
    "scalar_bundle",
    "set_ops",
    "json_props",
    "json_props_struct",
    "split_assign",
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
