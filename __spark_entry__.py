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
# ~50-query budget. Round-10 rotation: the 31 never-driver-checked
# queries lead (20 session-2 operator families, then the 11
# session-1 PQ/BPE/mixture/quality adds), then the two LM queries
# whose code changed this round, then the r06-stale tail (verdict
# item 2), then the oldest (r07) green rows ordered by regression
# surface. Whatever the ~50 budget cuts rolls to r11.
_FIRST = [
    # NEW in round 10, session 2 — never driver-checked, so they
    # lead: MMR diversified retrieval, integer PageRank, and the
    # Z-order layout pair.
    "emb_mmr_topk",
    "graph_pagerank",
    "layout_zorder",
    "layout_skipping_audit",
    "bm25_topk",
    "basket_pairs",
    "profile_lineitem",
    "cms_heavy_hitters",
    "events_cms_cells",
    "layout_rle_audit",
    "phrase_match",
    "skew_report",
    "join_size_estimate",
    "scd2_composition",
    "layout_compaction_plan",
    "graph_triangles",
    "graph_pagerank_weighted",
    "item_recommendations",
    "customer_rfm",
    "funnel_time_percentiles",
    # NEW in round 10: the trained-coefficient quality-classifier
    # path (datapipe/quality_model.py demo_trained_weights) — never
    # driver-checked before, so it leads.
    "quality_classifier_trained",
    "emb_pq_codes",
    "emb_pq_topk",
    "pq_recall",
    "emb_pq_rerank_topk",
    "pq_rerank_recall",
    "mixture_plan_temperature",
    "bpe_train_merges",
    "bpe_apply_vocab",
    "emb_ivfpq_topk",
    "ivfpq_recall",
    # Changed round 10: the LM per-doc sum was rebuilt order-free
    # (quantized decimal sum, no collect_list buffer) on BOTH the
    # Spark and oracle sides — re-prove parity first.
    "lm_doc_likelihood",
    "lm_heldout_score",
    # The r06-stale rotation tail (round-9 verdict item 2): these 14
    # queries' latest green row is three rounds old; clearing them
    # restores the no-row-older-than-two-rounds contract.
    "boilerplate_chunks",
    "bpe_merge_pairs",
    "chunk_index_dedup",
    "cluster_size_histogram",
    "cluster_split",
    "corpus_drift",
    "curriculum_order",
    "doc_chunks",
    "mixture_apply",
    "mixture_plan",
    "mixture_plan_weighted",
    "oov_rates",
    "sample_pps",
    "token_coverage_curve",
    # The r9 perf-weak row: code re-measured isolated at 0.97x this
    # round; a fresh green correctness row retires the weak mark.
    "emb_cosine_topk",
    # Oldest remaining green rows (r07) — windows/joins first
    # (highest regression surface), then curation/dedup, then the
    # OLAP tail; whatever the ~50 budget cuts rolls to r11.
    "w3_w4_returns",
    "w5_w6_composition_changes",
    "w7_latest_stats",
    "w8_latest_per_ticker",
    "w9_topk_per_date",
    "j1_composition_market_cap",
    "j2_upsert",
    "j3_asof_walkback",
    "a4_a5_summary_metrics",
    "skew_salted_agg",
    "dedup_embedding_pairs",
    "text_repetition",
    "text_decontaminate",
    "sample_stratified",
    "pack_sequences",
    "pii_stats",
    "pii_scrub",
    "vocab_topk",
    "curation_funnel",
    "dedup_incremental",
    "emb_quantize_int8",
    "text_rarity",
    "langid_confusion",
    "jaccard_band_report",
    "pack_fill_report",
    "agg_distinct_percentile",
    "semi_anti_join",
    "pivot_order_status",
    "w_moving_stats",
    "q3_shipping_priority",
    "p3_point_lookup",
    "having_big_orders",
    "unpivot_prices",
    "events_bars_rollup",
    "events_hll_cascade",
    "q4_late_order_priority",
    "q13_order_histogram",
    "w_beta_corr",
    "dq_lineitem_gate",
    "w_rolling_range_7d",
    "ts_corr_pairs",
    "ts_corr_pairs_sketched",
    "ts_corr_recall",
    "dq_documents_gate",
    "stocks_snapshot_diff",
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
