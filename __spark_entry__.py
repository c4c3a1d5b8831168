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


# The driver checks queries in dict insertion order and may stop at
# a count/time budget (50 of ~81 in recent rounds). Front-load the
# entries whose last driver row is stale (r02 — skipped by the r04
# budget) plus everything round 5 touches, so a budget cutoff can
# only ever skip queries with a fresh green row.
_FIRST = [
    # driver row last green in r02 (skipped by the r04 budget)
    "o5_summary_tail30",
    "q1_pricing_summary",
    "scalar_bundle",
    "set_ops",
    "skew_salted_join",
    "json_props",
    "json_props_struct",
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "events_session_10m",
    "text_stats",
    "text_token_bpe",
    "text_langid",
    "text_fingerprints",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_bucket_overflow",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "mm_payload_features",
    "dedup_levenshtein",
    "cube_revenue",
    "rollup_orders",
    "w_ticker_trend_slope",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "w_rank_family",
    # new or touched in round 5
    "dedup_substring_spans",
    "dedup_modality_agreement",
    "dedup_apply",
    "curation_apply",
    "split_assign",
    "mm_frame_sample",
    "events_funnel_conversion",
    "events_transition_matrix",
    "corpus_source_report",
    "dedup_shingle_overflow",
    "dedup_minhash_estimate",
    "dedup_lsh_pairs",
    "events_range_join",
    "events_click_error_pairs",
    "agg_approx_sketches",
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
