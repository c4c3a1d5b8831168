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
# ~50-query budget. Round-11 rotation (VERDICT r10 items 1+3): the
# two r10 hash-fails lead — both were DuckDB-oracle HUGEINT typing
# bugs, fixed by CAST(... AS BIGINT) in skewstats.py/layout.py — to
# re-prove at the driver. Then the full 43-query r07-stale tail
# (windows/joins first, highest regression surface, then curation/
# dedup, then the OLAP/timeseries tail), then the oldest r08 rows
# with the remaining budget; whatever the cut drops rolls to r12.
_FIRST = [
    # r10 hash-fails, oracle CASTs fixed this round — re-prove first.
    "skew_report",
    "layout_compaction_plan",
    # r07-stale block (43): windows/joins/aggregates.
    "w7_latest_stats",
    "w8_latest_per_ticker",
    "w9_topk_per_date",
    "w_moving_stats",
    "w_rolling_range_7d",
    "w_beta_corr",
    "j1_composition_market_cap",
    "j2_upsert",
    "j3_asof_walkback",
    "a4_a5_summary_metrics",
    "p3_point_lookup",
    "skew_salted_agg",
    "semi_anti_join",
    "agg_distinct_percentile",
    "having_big_orders",
    "pivot_order_status",
    "unpivot_prices",
    # r07-stale: curation/dedup/text.
    "dedup_embedding_pairs",
    "dedup_incremental",
    "jaccard_band_report",
    "text_repetition",
    "text_decontaminate",
    "text_rarity",
    "langid_confusion",
    "sample_stratified",
    "pack_sequences",
    "pack_fill_report",
    "pii_stats",
    "pii_scrub",
    "vocab_topk",
    "curation_funnel",
    "emb_quantize_int8",
    # r07-stale: OLAP / events / timeseries / DQ tail.
    "q3_shipping_priority",
    "q4_late_order_priority",
    "q13_order_histogram",
    "events_bars_rollup",
    "events_hll_cascade",
    "ts_corr_pairs",
    "ts_corr_pairs_sketched",
    "ts_corr_recall",
    "dq_lineitem_gate",
    "dq_documents_gate",
    "stocks_snapshot_diff",
    # NEW round 11 (never driver-checked) — after the stale tail so
    # the ~50 budget clears ALL 43 r07 rows first (verdict item 3);
    # whatever the cut drops from here rolls to the r12 lead.
    "source_domain_cap",
    "token_budget_prefix",
    "events_cusum_changepoint",
    "graph_kcore",
    "events_attribution_last_touch",
    "dedup_sorted_neighborhood",
    "layout_bloom_audit",
    "basket_triples",
    "text_collocations",
    "emb_dim_stats",
    # r08 block head (oldest after the r07 tail clears) — fills the
    # remaining ~5 driver budget; rest rolls to r12.
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
