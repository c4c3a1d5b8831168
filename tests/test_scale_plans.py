"""Physical-plan regression tests: the properties that make these
queries viable at 100 TB, asserted on the actual executed plans so a
refactor can't silently lose them (ARCHITECTURE.md documents why
each matters)."""

from __future__ import annotations

import os
import tempfile

import pytest

from marketviz_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _keyed_exchanges(plan: str) -> int:
    """Exchange count EXCLUDING round-robin fan-out exchanges: the
    r13 tables.fan_out guard widens a sub-parallelism local scan with
    a conditional repartition that vanishes at real scale (scan
    splits >= parallelism), so plan pins on shuffle structure count
    only keyed/single exchanges — the ones that exist at 100 TB."""
    return plan.count("Exchange") - plan.count(
        "Exchange RoundRobinPartitioning"
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(QUERIES["q1_pricing_summary"].fn(spark, SF_SMALL))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan
    # column pruning: never reads l_orderkey/l_suppkey/l_linenumber
    scan = next(l for l in plan.splitlines() if "Scan parquet" in l)
    assert "l_orderkey" not in scan and "l_linenumber" not in scan


def test_index_topk_below_shuffle(spark):
    """WindowGroupLimit must pre-filter top-K map-side (Partial) —
    the property that keeps the flagship's shuffle payload at K rows
    per date instead of the whole fact table."""
    plan = _plan(QUERIES["index_daily"].fn(spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    assert _keyed_exchanges(plan) <= 2  # derive-agg + date window/agg


def test_j1_broadcasts_composition(spark):
    plan = _plan(QUERIES["j1_composition_market_cap"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan


def test_partition_pruning_on_date_partitioned_table(spark):
    from marketviz_spark import tables
    from marketviz_spark.pipelines.upsert import write_partitioned

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "stocks_part")
        write_partitioned(
            tables.stocks(spark, SF_SMALL).filter(
                "date >= '1995-01-01' AND date <= '1995-01-10'"
            ),
            path,
        )
        df = spark.read.parquet(path).filter("date = '1995-01-03'")
        plan = _plan(df)
        # the date predicate must become a partition filter, not a
        # post-scan row filter
        assert "PartitionFilters" in plan
        assert "date = 1995-01-03" in plan.replace("'", "") or (
            "1995-01-03" in plan
        )


def test_bucketed_join_has_no_shuffle(spark):
    """bucketBy co-location: joining two tables bucketed on the same
    key must not exchange either side — the 100 TB co-located join
    story (SURVEY §4.2 / pyspark guide bucketing)."""
    from marketviz_spark import tables

    import shutil

    s = tables.stocks(spark, SF_SMALL).filter("date <= '1995-03-31'")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for name in ("b_left", "b_right"):
        # DROP only clears the in-memory catalog; the location from a
        # PREVIOUS session lingers on disk and blocks saveAsTable.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        (
            s.write.mode("overwrite")
            .bucketBy(8, "ticker")
            .sortBy("ticker")
            .format("parquet")
            .saveAsTable(name)
        )
    # force the sort-merge path: at test scale the planner would
    # broadcast (and skip bucketed scans entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.table("b_left")
        right = spark.table("b_right").select(
            "ticker", "date", "market_cap"
        )
        joined = left.join(right, ["ticker"])
        plan = _plan(joined)
        # bucket co-location: a sort-merge join with NO shuffle
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_query_uses_shuffle_not_broadcast(spark):
    """The skew bench query must exercise the salted SHUFFLE join
    path (a broadcast would make the salt a no-op)."""
    from marketviz_spark.registry import QUERIES

    df = QUERIES["skew_salted_join"].fn(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "_salt" in plan


def test_decontaminate_broadcasts_eval_shingles(spark):
    """The eval-shingle join must be a broadcast: at 100 TB the
    corpus-side shingles can never shuffle for this join (the eval
    split is small by definition)."""
    plan = _plan(QUERIES["text_decontaminate"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # the corpus shingle stream must not sort-merge against the
    # eval set
    assert "SortMergeJoin" not in plan, plan


def test_ngram_jaccard_hot_shingle_anti_join_broadcasts(spark):
    """The SHINGLE_DF_CAP anti-join must broadcast the (tiny, Zipf
    head) over-cap shingle list — shuffling the full shingle table
    to exclude a handful of boilerplate keys would defeat the cap's
    purpose at 100 TB. Inspect the shingle-index construction
    directly: inside dedup_ngram_jaccard it sits behind a
    localCheckpoint, which hides its subtree from the outer plan."""
    from marketviz_spark import tables
    from marketviz_spark.datapipe.dedup import _rare_shingles, shingles

    docs = tables.load(spark, SF_SMALL, "documents")
    plan = _plan(_rare_shingles(shingles(docs)))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_sample_stratified_zero_shuffle(spark):
    """Deterministic hash sampling is a pure map-only projection +
    filter: any Exchange here would be a scale bug."""
    plan = _plan(QUERIES["sample_stratified"].fn(spark, SF_SMALL))
    assert _keyed_exchanges(plan) == 0, plan


def test_split_assign_zero_shuffle(spark):
    """Train/val/test assignment is a map-only projection — same
    zero-shuffle contract as the sampler it must stay decorrelated
    from."""
    plan = _plan(QUERIES["split_assign"].fn(spark, SF_SMALL))
    assert _keyed_exchanges(plan) == 0, plan


def test_apply_queries_join_doc_keyed_no_cartesian(spark):
    """The two end-game materializers must join flag/label tables on
    doc_id (uniform keys) and never fall into a cartesian/nested-loop
    product."""
    for q in ("dedup_apply", "curation_apply"):
        plan = _plan(QUERIES[q].fn(spark, SF_SMALL))
        assert "CartesianProduct" not in plan, (q, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)


def test_repetition_shuffles_stay_doc_keyed(spark):
    """Every exchange in the repetition pipeline must embed doc_id in
    its partitioning key — the property that makes the key space at
    least as fine as the document space (uniform, no skew) — and the
    gram count must partially aggregate map-side before exchanging."""
    plan = _plan(QUERIES["text_repetition"].fn(spark, SF_SMALL))
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert exchanges  # the groupBys are real
    assert all("doc_id" in l for l in exchanges), plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_pack_sequences_single_bucket_exchange(spark):
    """Sequence packing must shuffle exactly once, on the bucket key
    (the parallelism knob) — the ordered window runs inside each
    bucket, never globally."""
    plan = _plan(QUERIES["pack_sequences"].fn(spark, SF_SMALL))
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 1 and "bucket" in exchanges[0], plan
    assert "Window" in plan


def test_pii_queries_map_only(spark):
    """PII detection and redaction are pure JVM regex projections:
    zero exchanges."""
    for name in ("pii_stats", "pii_scrub"):
        plan = _plan(QUERIES[name].fn(spark, SF_SMALL))
        assert _keyed_exchanges(plan) == 0, (name, plan)


def test_vocab_topk_is_takeordered(spark):
    """The global top-K must be TakeOrderedAndProject (per-partition
    heap + K-row driver merge), never a full sort, and all exchanges
    stay token-keyed (hot tokens collapse map-side first)."""
    plan = _plan(QUERIES["vocab_topk"].fn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan or "SortAggregate" in plan, plan
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert exchanges and all("token" in l for l in exchanges), plan


def test_quantize_map_only(spark):
    """int8 quantization is a pure higher-order-function projection:
    zero exchanges."""
    plan = _plan(QUERIES["emb_quantize_int8"].fn(spark, SF_SMALL))
    assert _keyed_exchanges(plan) == 0, plan


def test_incremental_dedup_fp_keyed(spark):
    """The existing-corpus index groupBy must exchange on the
    fingerprint (uniform md5 key); nothing may cross-join."""
    plan = _plan(QUERIES["dedup_incremental"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert any("fp" in l for l in exchanges), plan


def test_curation_funnel_broadcasts_eval(spark):
    """The funnel embeds decontamination: the eval-shingle join must
    stay a broadcast even inside the composed plan."""
    plan = _plan(QUERIES["curation_funnel"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join(spark):
    """The EXISTS must execute as a LEFT SEMI join — an inner join
    + distinct would shuffle lineitem's full multiplicity just to
    discard it."""
    plan = _plan(QUERIES["q4_late_order_priority"].fn(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan


def test_salted_agg_query_is_two_phase(spark):
    """The salted aggregation must show BOTH phases in the executed
    plan: a partial aggregate exchanged on (group, _salt), then a
    final aggregate exchanged on the group key alone."""
    from marketviz_spark.registry import QUERIES

    df = QUERIES["skew_salted_agg"].fn(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert any("_salt" in l for l in exchanges)
    assert any(
        "l_returnflag" in l and "_salt" not in l for l in exchanges
    )


def test_q17_subquery_decorrelated(spark):
    """The correlated scalar subqueries in q17 must decorrelate into
    aggregate-joins: the executed plan may contain NO subquery node
    (a per-row subplan would re-scan lineitem per probe row)."""
    plan = _plan(QUERIES["q17_small_qty_revenue"].fn(spark, SF_SMALL))
    assert "Subquery" not in plan
    # decorrelated = per-part aggregates joined back: >= 2 joins
    assert plan.count("Join") >= 2


def test_q7_all_dimension_joins_broadcast(spark):
    """q7's five joins (orders, customer, supplier, nation x2) must
    all run as broadcasts — the fact table shuffles only for the
    final 3-key aggregation, never for a join."""
    plan = _plan(QUERIES["q7_nation_volume"].fn(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_q2_argmin_uses_window_group_limit(spark):
    """The per-part rank=1 filter must push below the window sort as
    a WindowGroupLimit (map-side top-1 per part), and the dimension
    joins must broadcast."""
    plan = _plan(QUERIES["q2_min_cost_supplier"].fn(spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    assert plan.count("BroadcastHashJoin") == 2


def test_q8_all_dimension_joins_broadcast(spark):
    """q8's 7-way join: every dimension side (orders-filtered fact
    excluded) broadcasts; the fact table never sort-merge-joins."""
    plan = _plan(QUERIES["q8_market_share"].fn(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 7


def test_q16_not_in_is_broadcast_anti_join(spark):
    """The NOT-IN supplier exclusion must plan as a broadcast
    LeftAnti hash join (never a nested-loop or a shuffle), and the
    part predicates must push into the parquet scan."""
    plan = _plan(QUERIES["q16_supplier_variety"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters: [IsNotNull(p_brand)" in plan or (
        "Not(EqualTo(p_brand,Brand#5))" in plan
    )


def test_q19_disjunction_extracts_join_key(spark):
    """The OR-of-brackets predicate must still use the common
    p_partkey equi-join (hash join, not nested loop), with the
    quantity envelope pushed to the lineitem scan."""
    plan = _plan(QUERIES["q19_bracket_disjunction"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Catalyst derives l_quantity >= 1 AND <= 30 from the disjunction
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan


def test_q21_exists_become_semi_and_anti_joins(spark):
    """Both correlated subqueries must decorrelate: EXISTS -> one
    LeftSemi, NOT EXISTS -> one LeftAnti; no per-row subplan
    survives in the executed plan."""
    plan = _plan(QUERIES["q21_sole_late_supplier"].fn(spark, SF_SMALL))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "Subquery" not in plan


def test_q20_nested_in_becomes_semi_join_chain(spark):
    """Both INs must plan as hash semi-joins (part side broadcast);
    the ship-date range must push into the lineitem scan."""
    plan = _plan(QUERIES["q20_promo_volume_suppliers"].fn(spark, SF_SMALL))
    assert plan.count("LeftSemi") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q9_dimensions_broadcast_fact_single_agg_shuffle(spark):
    """part/supplier/nation broadcast; the only SortMergeJoin
    permitted is the fact-fact orderkey join."""
    plan = _plan(QUERIES["q9_nation_profit"].fn(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q11_global_scalar_not_per_group(spark):
    """The HAVING's global-revenue scalar must be computed once as a
    subquery result reused across groups — the plan may contain the
    scalar subquery exactly once, and exactly 2 lineitem scans (one
    per aggregate), never one per group."""
    plan = _plan(QUERIES["q11_part_value_share"].fn(spark, SF_SMALL))
    assert plan.count("Scan parquet") == 2


def test_coverage_curve_limits_before_window(spark):
    """token_coverage_curve's unpartitioned window is safe only
    because its input is pre-limited to K rows: the top-K must be a
    TakeOrderedAndProject, never a full vocabulary sort feeding the
    window."""
    plan = _plan(QUERIES["token_coverage_curve"].fn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan


def test_mixture_apply_window_partitioned_by_source(spark):
    """The budget cumsum must be a source-partitioned window (the
    budget's own unit) plus a broadcast of the 1-row bound — an
    unpartitioned window or a shuffled bound join would serialize
    the corpus through one task."""
    plan = _plan(QUERIES["mixture_apply"].fn(spark, SF_SMALL))
    assert "windowspecdefinition(source" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_boilerplate_join_broadcast_is_size_based_not_forced(spark):
    """The chunk-frequency flag-back join must not carry a broadcast
    HINT: the boilerplate fingerprint set grows with the corpus, so
    a forced broadcast would OOM the executors at 100 TB. Catalyst
    may still pick a broadcast from size STATS (it does at this sf —
    correct, and exactly the behavior that flips to a shuffle join
    when the stats grow), so assert the logical plan carries no
    ResolvedHint rather than asserting the physical strategy."""
    df = QUERIES["boilerplate_chunks"].fn(spark, SF_SMALL)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical, logical
    # and the rollup keys stay doc/md5-shaped (uniform), never a
    # cartesian product
    static = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in static, static


def test_retention_cohorts_three_keyed_shuffles(spark):
    """Retention's shuffles: distinct (user, day) with map-side
    partial agg, one user_id window, the days²-bounded rollup —
    and never a shuffle of the raw event stream (the distinct's
    partial aggregation is what collapses power users map-side)."""
    plan = _plan(QUERIES["events_retention_cohorts"].fn(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    # the distinct must be partial-aggregated (HashAggregate twice)
    assert "partial" in plan.lower() or plan.count("HashAggregate") >= 4


def test_anomaly_days_stats_broadcast_back(spark):
    """The per-type history stats (rows bounded by the calendar x
    types) must broadcast into the flag join — shuffling the daily
    table against a types-sized stats table would be a pointless
    exchange."""
    plan = _plan(QUERIES["events_anomaly_days"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan


def test_dq_documents_gate_single_scan_for_row_checks(spark):
    """All five row-level expectations must compile into ONE scan of
    documents (a single agg of conditional counts); the uniqueness
    probe adds the only other scan. More FileScans = the naive
    one-job-per-check shape this DSL exists to avoid."""
    plan = _plan(QUERIES["dq_documents_gate"].fn(spark, SF_SMALL))
    assert plan.count("Scan parquet") == 2, plan


def test_langid_confusion_no_text_shuffle(spark):
    """Language scoring is pure expression work; the only exchange
    is the langs²-bounded rollup — document text must never be a
    shuffle payload."""
    plan = _plan(QUERIES["langid_confusion"].fn(spark, SF_SMALL))
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 1, plan
    assert "text" not in exchanges[0], exchanges[0]


def test_asof_prev_event_plans_zero_joins(spark):
    """The as-of join's whole point: union + window, not an
    interval join — the executed plan must contain a Window over the
    user key and NO join operator of any kind."""
    plan = _plan(QUERIES["events_asof_prev"].fn(spark, SF_SMALL))
    assert "Window" in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "ShuffledHashJoin", "BroadcastNestedLoopJoin",
               "CartesianProduct"):
        assert op not in plan, op


def test_sample_pps_single_scalar_broadcast(spark):
    """PPS sampling is map-only + one 1-row scalar broadcast: the
    corpus side must not shuffle (only the scalar aggregate
    exchanges), and the scalar joins via broadcast."""
    plan = _plan(QUERIES["sample_pps"].fn(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan
    # exactly the scalar agg's single-partition exchange + its
    # broadcast — no corpus-keyed exchange
    assert _keyed_exchanges(plan) <= 2


def test_bpe_merge_pairs_takeordered_not_global_sort(spark):
    """Top-K merge candidates via TakeOrdered (per-partition heap),
    never a full global Sort of the pair counts."""
    plan = _plan(QUERIES["bpe_merge_pairs"].fn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_decontam_embedding_is_one_map_only_arrow_pass(spark):
    """The eval matrix rides inside the mapInPandas closure (model-
    sized, like IVF centroids), so the corpus side must plan as a
    single Arrow pass: no join operator, no exchange at all. (The
    round-6 broadcast-nested-loop form computed the same dots via
    interpreted lambdas — 56x wall in the r7 sf1 spot-run.)"""
    plan = _plan(QUERIES["decontam_embedding"].fn(spark, SF_SMALL))
    assert "MapInPandas" in plan
    assert "Join" not in plan
    # no KEYED exchange (the conditional fan-out round-robin is the
    # only one permitted; it vanishes at scale)
    assert _keyed_exchanges(plan) == 0, plan


def test_chunk_index_dedup_single_aggregate_no_window(spark):
    """Representative-inside-the-aggregate: one chunk_md5 exchange,
    no Window operator, partial aggregation present map-side."""
    plan = _plan(QUERIES["chunk_index_dedup"].fn(spark, SF_SMALL))
    assert "Window" not in plan
    assert "partial" in plan.lower()


def test_drawdown_and_streak_single_ticker_shuffle(spark):
    """Both analytics claim ONE ticker-keyed shuffle feeding every
    window/aggregate: at most 2 exchanges (scan-side + final rank/
    agg reuse the same hash partitioning) and no join operator."""
    for q in ("w_max_drawdown", "w_longest_up_streak"):
        plan = _plan(QUERIES[q].fn(spark, SF_SMALL))
        for op in ("SortMergeJoin", "BroadcastHashJoin",
                   "ShuffledHashJoin", "CartesianProduct"):
            assert op not in plan, (q, op)
        assert _keyed_exchanges(plan) <= 2, q


# (The r7 pins for w_share_of_day's unordered-window form and
# dq_referential_integrity's anti-join form were superseded by the
# r8 reworks; their replacements are
# test_share_of_day_has_no_window and
# test_dq_referential_integrity_single_scan_per_fact below.)


def test_lsh_topk_candidate_cap_compiles_to_group_limit(spark):
    """The LSH bucket-candidate cap (round-7 sf1 guard) must compile
    to WindowGroupLimit — the cap is applied map-side BEFORE the
    bucket exchange, so an over-full bucket never ships more than
    `cap` candidate rows. With the candidate side bounded at
    cap x 2^NUM_HYPERPLANES rows regardless of corpus size, the
    bucket join's build side stays broadcastable at any scale."""
    plan = _plan(QUERIES["emb_lsh_topk"].fn(spark, SF_SMALL))
    # one Partial (map-side) + one Final per windowed limit; the
    # candidate cap and the final top-k each contribute a pair
    assert plan.count("WindowGroupLimit") >= 3
    assert "CartesianProduct" not in plan


def test_click_error_pairs_join_carries_time_bucket(spark):
    """The same-user attribution join must be keyed on (user_id,
    bucket), never user_id alone — the round-7 sf1 hot-user regime
    measured 17.2x wall when a skewed user could cross-multiply a
    month of clicks against a month of errors."""
    plan = _plan(
        QUERIES["events_click_error_pairs"].fn(spark, SF_SMALL)
    )
    import re

    join_lines = [
        l for l in plan.splitlines()
        if re.search(r"(SortMergeJoin|ShuffledHashJoin|"
                     r"BroadcastHashJoin)", l)
    ]
    assert join_lines, plan
    assert all("bucket" in l for l in join_lines), join_lines


def test_range_join_aggregates_cells_before_pairing(spark):
    """The range COUNT must pre-aggregate clicks to second cells and
    union the full-cell and boundary contributions — never pair raw
    errors x raw clicks (19.9x in the sf1 burst regime). Shape: a
    Union of the two contribution streams, exactly two joins, and a
    partial aggregate feeding the cell side."""
    plan = _plan(QUERIES["events_range_join"].fn(spark, SF_SMALL))
    assert "Union" in plan
    assert "CartesianProduct" not in plan
    njoins = sum(
        plan.count(op)
        for op in ("SortMergeJoin", "ShuffledHashJoin join",
                   "BroadcastHashJoin")
    )
    assert njoins == 2, plan


def test_share_of_day_has_no_window(spark):
    """r8 rework: the RATIO_TO_REPORT denominator must be a
    partial-aggregating groupBy broadcast back, never a decimal
    full-partition window sum (buffers outside codegen, measured
    4.3x baseline and worsening with scale)."""
    plan = _plan(QUERIES["w_share_of_day"].fn(spark, SF_SMALL))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_dq_referential_integrity_single_scan_per_fact(spark):
    """r8 rework + r9 hint removal: ONE lineitem scan and ONE orders
    scan — all five audit counts ride conditional aggregates over PK
    left-joins, not repeated anti-join scans. The join STRATEGY is
    Catalyst's size-based choice (broadcast at test scale, shuffled
    when billion-key dims outgrow the threshold at 100 TB), so this
    test asserts the single-scan shape and accepts either join."""
    plan = _plan(
        QUERIES["dq_referential_integrity"].fn(spark, SF_SMALL)
    )
    assert (
        "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
        or "SortMergeJoin" in plan
    )
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    li = [l for l in scans if "lineitem" in l]
    orders = [l for l in scans if "orders" in l]
    assert len(li) == 1, plan[:1500]
    # orders appears twice by design: once as the o_orderkey
    # broadcast dim for the lineitem audit, once as the fact side of
    # the customer audit — each a single-column pruned scan.
    assert len(orders) == 2, plan[:1500]
    # column pruning: the one lineitem scan reads just the two FKs
    assert "l_extendedprice" not in li[0] and "l_quantity" not in li[0]


def test_trend_slope_closed_no_python(spark):
    """The closed-form slope is the JVM-only scale path: no Arrow
    exchange, no Python evaluation of any kind in its plan."""
    plan = _plan(QUERIES["w_trend_slope_closed"].fn(spark, SF_SMALL))
    for marker in ("FlatMapGroupsInPandas", "ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_winnowing_report_two_exchanges_distinct_before_fp(spark):
    """winnowing_shared_report's wide stages stay exactly: ONE
    per-doc_id shuffle (the window min) and ONE fp groupBy — the
    per-doc fingerprint distinct must ride the doc_id partitioning
    (keys=[doc_id, fp] aggregate with NO exchange of its own,
    BEFORE the fp exchange), so a hot boilerplate fingerprint never
    ships duplicate (doc, fp) rows into the fp shuffle. The explode
    (Generate) must sit BELOW the doc_id exchange: the
    char-position stream is map-side, never shuffled."""
    plan = _plan(QUERIES["dedup_winnowing"].fn(spark, SF_SMALL))
    assert _keyed_exchanges(plan) == 2, plan
    fp_ex = plan.index("Exchange hashpartitioning(fp")
    doc_ex = plan.index("Exchange hashpartitioning(doc_id")
    # top-down plan text: fp exchange above (consuming) the distinct,
    # which is above the doc_id exchange, which is above the explode
    distinct = plan.index("HashAggregate(keys=[doc_id")
    generate = plan.index("Generate explode")
    assert fp_ex < distinct < doc_ex < generate, plan
    # and the per-position stream never buffers: no Object aggregate
    assert "ObjectHashAggregate" not in plan


def test_lm_likelihood_no_per_doc_buffer(spark):
    """The per-document LM sum is an order-free exact decimal sum of
    1e15-quantized p — the round-9 sort_array(collect_list(...))
    fold buffered O(doc tokens) per group, a fat-row/OOM risk on
    book-length documents. Pin that no buffering aggregate is left
    in either LM query's plan."""
    for name in ("lm_doc_likelihood", "lm_heldout_score"):
        plan = _plan(QUERIES[name].fn(spark, SF_SMALL))
        for marker in ("collect_list", "sort_array", "ObjectHashAggregate"):
            assert marker not in plan, f"{name}: {marker}"
        assert "sum(cast(FLOOR(" in plan, name  # the quantized sum


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level filtering (Spark's injected bloom filter,
    the engine-native cousin of the semi-join prunes this repo
    builds by hand): a selective dim filter must inject a
    might_contain predicate into the FACT side of a shuffle join.
    At 100 TB this is what keeps a selective dim join from
    shuffling the whole fact table; the size thresholds are
    lowered here only because sf0.001 is below the production
    default (10 GB application side)."""
    from pyspark.sql import functions as F

    from marketviz_spark import tables

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter."
        "creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = tables.load(spark, SF_SMALL, "lineitem")
        orders = tables.load(spark, SF_SMALL, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderpriority")
            .count()
        )
        j.collect()
        plan = _plan(j)
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_exact_rank_paths_no_single_partition_window(spark):
    """r11 verdict item 4: skew_report's Gini rank, customer_rfm's
    quintile ranks, and token_budget_prefix's hot-source cumsum all
    run the shared two-phase range-partitioned rank
    (operators/ranks.py). Every window in their plans must be
    partitioned (by the range partition id, plus the group key for
    the budget cumsum) — an unpartitioned windowspec starts straight
    at the order spec (`col ASC/DESC ...`), which is the single-task
    funnel this path exists to remove. Phase 1's range exchange is
    pinned inside a lazy localCheckpoint (load-bearing — see
    ranks.py docstring), so downstream it shows as an ExistingRDD
    scan, which is asserted instead."""
    import re as _re

    for name in (
        "skew_report",
        "customer_rfm",
        "token_budget_prefix",
    ):
        plan = _plan(QUERIES[name].fn(spark, SF_SMALL))
        specs = _re.findall(r"windowspecdefinition\(([^)]*)", plan)
        assert specs, f"{name}: expected rank windows in plan"
        unpart = [
            s for s in specs if _re.match(r"\S+ (ASC|DESC)", s)
        ]
        assert not unpart, f"{name}: unpartitioned windows: {unpart}"
        assert "ExistingRDD" in plan, (
            f"{name}: missing the pinned phase-1 range materialization"
        )


def test_ivf_assignment_single_pass(spark):
    """r13 batch 8: the Arrow centroid assignment runs exactly ONCE
    over the corpus in emb_ivf_topk. The former cand/qry union
    rebuilt the scan+norm+assignment subtree per branch, and the
    optimizer cloned the UDF a third time by pushing the inferred
    size(probes)>0 filter below the fan-out exchange (the UDF is now
    nondeterministic, which forbids that). Pinned: one executed
    ArrowEvalPython, one parquet scan, and the home+probe entry
    Generate ABOVE the assignment (explode of the combined struct
    array, not of a re-assigned branch)."""
    plan = _plan(QUERIES["emb_ivf_topk"].fn(spark, SF_SMALL))
    assert plan.count("ArrowEvalPython") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    gen = plan.index("Generate explode")
    arrow = plan.index("ArrowEvalPython")
    assert gen < arrow, plan  # top-down text: explode consumes the UDF


def test_ivfpq_probe_assignment_query_sized(spark):
    """r14 contract (tightened per the r13 ADVICE — the old <= 4
    bound could mask a re-added corpus-scale duplicate): the ONLY
    Arrow eval in emb_ivfpq_topk is the fused home-assignment +
    PQ-encode pass over the ONE corpus scan; the probe list and the
    ADC lookup table are driver-computed LocalRelations (the nq
    queries and both models are driver-resident), so they appear as
    LocalTableScan — no probe-side Python eval at all, and a
    regression that re-adds any corpus-scale pass fails the exact
    counts below."""
    plan = _plan(QUERIES["emb_ivfpq_topk"].fn(spark, SF_SMALL))
    assert plan.count("ArrowEvalPython") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "Scan ExistingRDD" in plan, plan  # driver-built probe/LUT
    # the fused eval consumes the scan directly: no exchange may sit
    # between them (top-down text: ArrowEvalPython ... Scan parquet)
    arrow = plan.index("ArrowEvalPython")
    scan = plan.index("Scan parquet")
    assert arrow < scan, plan
