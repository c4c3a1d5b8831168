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
# ~50-query budget. Round-14 rotation (VERDICT r13 item 8, the
# standing cadence): the 50 oldest driver rows lead — the complete
# 47-query r10 block plus the 3 alphabetically-first r11 rows. This
# block happens to contain most of the r14 optimization targets
# (the PQ/IVF family, the pagerank pair, bpe, lm_heldout_score), so
# the plan-restructured queries get fresh driver rows this round.
# After this run the oldest registry row is r11 and the full
# re-proof cycle stays <= 4 rounds.
_FIRST = [
    # r10 block (47): oldest driver rows in the registry.
    "basket_pairs",
    "bm25_topk",
    "boilerplate_chunks",
    "bpe_apply_vocab",
    "bpe_merge_pairs",
    "bpe_train_merges",
    "chunk_index_dedup",
    "cluster_size_histogram",
    "cluster_split",
    "cms_heavy_hitters",
    "corpus_drift",
    "curriculum_order",
    "doc_chunks",
    "emb_cosine_topk",
    "emb_ivfpq_topk",
    "emb_mmr_topk",
    "emb_pq_codes",
    "emb_pq_rerank_topk",
    "emb_pq_topk",
    "events_cms_cells",
    "funnel_time_percentiles",
    "graph_pagerank",
    "graph_pagerank_weighted",
    "graph_triangles",
    "item_recommendations",
    "ivfpq_recall",
    "join_size_estimate",
    "layout_rle_audit",
    "layout_skipping_audit",
    "layout_zorder",
    "lm_doc_likelihood",
    "lm_heldout_score",
    "mixture_apply",
    "mixture_plan",
    "mixture_plan_temperature",
    "mixture_plan_weighted",
    "oov_rates",
    "phrase_match",
    "pq_recall",
    "pq_rerank_recall",
    "profile_lineitem",
    "quality_classifier_trained",
    "sample_pps",
    "scd2_composition",
    "token_coverage_curve",
    "w3_w4_returns",
    "w5_w6_composition_changes",
    # r11 rows (3): the next-oldest, completing one driver budget.
    "a4_a5_summary_metrics",
    "agg_distinct_percentile",
    "curation_funnel",
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
