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
# ~50-query budget. Round-12 rotation (VERDICT r11 item 1): the 5
# round-11 queries that have never had a driver CORRECTNESS row lead
# (local parity harness passed 5/5 at sf0.01, judge-verified, but
# the driver row is the hard signal), followed by the complete
# 44-query r08-stale block — 49 entries, exactly one driver budget.
# Registry expansion is frozen this round (verdict item 2) so no new
# names are inserted ahead of this debt.
_FIRST = [
    # Never driver-checked (added late in round 11) — first-timers.
    "basket_triples",
    "dedup_sorted_neighborhood",
    "emb_dim_stats",
    "layout_bloom_audit",
    "text_collocations",
    # r08-stale block (44): core index/OLAP/windows first.
    "index_daily",
    "w1_split_adjust",
    "q1_pricing_summary",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_estimate",
    "dedup_lsh_pairs",
    "o5_summary_tail30",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "rollup_orders",
    "cube_revenue",
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "events_session_10m",
    "events_range_join",
    "skew_salted_join",
    "text_stats",
    "text_langid",
    "text_fingerprints",
    "text_token_bpe",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_substring_spans",
    "dedup_levenshtein",
    "dedup_bucket_overflow",
    "dedup_shingle_overflow",
    "dedup_modality_agreement",
    "emb_cosine_topk_blas",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "ann_recall",
    "semdedup_prune",
    "decontam_embedding",
    "mm_payload_features",
    "mm_frame_sample",
    "corpus_source_report",
    "curation_apply",
    "events_click_error_pairs",
    "events_funnel_conversion",
    "events_transition_matrix",
    "w_rank_family",
    "w_share_of_day",
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
