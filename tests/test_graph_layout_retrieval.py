"""Round-10 additions: MMR re-rank, PageRank, Z-order layout —
value properties, python mirrors, and the scale-plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from marketviz_spark import tables
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED, SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ----------------------------------------------------------------- MMR


@pytest.fixture(scope="module")
def mmr_rows(spark):
    return QUERIES["emb_mmr_topk"].fn(spark, SF_MED).collect()


def test_mmr_shape_and_invariants(mmr_rows):
    from marketviz_spark.datapipe.retrieval import MMR_K

    by_q: dict[int, list] = {}
    for r in mmr_rows:
        by_q.setdefault(r["vec_id"], []).append(r)
    assert by_q, "no query produced results"
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["mmr_rank"])
        assert [r["mmr_rank"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        assert len(rows) <= MMR_K
        # picks are distinct docs, none is the query itself
        ids = [r["neighbor_id"] for r in rows]
        assert len(set(ids)) == len(ids)
        assert qid not in ids
        # rank 1 is the pure-relevance argmax: score == relevance
        assert rows[0]["mmr_score"] == rows[0]["relevance"]
        assert rows[0]["relevance"] == max(r["relevance"] for r in rows)
        # from rank 2 on the greedy best score is non-increasing:
        # each candidate's score only drops as the picked set grows
        # (max-penalty over a superset) and the pool only shrinks.
        # (rank1→2 is exempt: penalties can be NEGATIVE dots.)
        scores = [r["mmr_score"] for r in rows[1:]]
        assert scores == sorted(scores, reverse=True)


def test_mmr_diversifies_vs_plain_topk(spark, mmr_rows):
    """MMR must not simply return the relevance top-K: with λ=1/2
    at least one query's pick set differs from its plain shortlist
    head (the corpus has near-duplicate clusters by construction)."""
    from marketviz_spark.datapipe.retrieval import MMR_K, mmr_shortlist

    sl = mmr_shortlist(tables.load(spark, SF_MED, "embeddings"))
    plain = {
        (r["qid"], r["cid"])
        for r in sl.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("rel"), F.asc("cid")
                )
            ),
        )
        .filter(F.col("rn") <= MMR_K)
        .collect()
    }
    mmr = {(r["vec_id"], r["neighbor_id"]) for r in mmr_rows}
    assert mmr != plain, "MMR degenerated to plain top-k"


def test_mmr_python_mirror(spark):
    """End-to-end python mirror on the sf0.001 slice: quantize,
    shortlist, greedy-select with pure ints — must match exactly."""
    import math

    emb = [
        (r["vec_id"], list(r["embedding"]))
        for r in tables.load(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    ]
    from marketviz_spark.datapipe.retrieval import (
        MMR_K,
        MMR_QUANT,
        MMR_QUERY_MOD,
        MMR_SHORTLIST,
    )

    q = {
        vid: [int(math.floor(float(x) * MMR_QUANT + 0.5)) for x in v]
        for vid, v in emb
    }
    queries = sorted(v for v in q if v % MMR_QUERY_MOD == 0)
    expected = []
    for qid in queries:
        rel = sorted(
            (
                (sum(a * b for a, b in zip(q[qid], q[c])), c)
                for c in q
                if c % MMR_QUERY_MOD != 0
            ),
            key=lambda t: (-t[0], t[1]),
        )[:MMR_SHORTLIST]
        picked = []
        for rank in range(1, MMR_K + 1):
            best = None
            for r, c in rel:
                if any(c == p[1] for p in picked):
                    continue
                pen = (
                    max(
                        sum(a * b for a, b in zip(q[c], q[p[1]]))
                        for p in picked
                    )
                    if picked
                    else 0
                )
                s = r - pen if picked else r
                if best is None or (-s, c) < (-best[0], best[2]):
                    best = (s, r, c)
            if best is None:
                break
            picked.append((best[1], best[2]))
            expected.append((qid, rank, best[2], best[1], best[0]))
    got = sorted(
        tuple(r)
        for r in QUERIES["emb_mmr_topk"].fn(spark, SF_SMALL).collect()
    )
    assert got == sorted(expected)


def test_mmr_plan_one_qid_shuffle_no_cartesian(spark):
    """Shortlist streams map-side through the broadcast probe set;
    the only hash exchange is the qid regroup for the grouped map.
    Never a CartesianProduct."""
    plan = _plan(QUERIES["emb_mmr_topk"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ------------------------------------------------------------ PageRank


def test_pagerank_tiny_graph_exact(spark):
    """Hand-checkable 3-node graph (a→c, b→c; c dangling), one
    iteration — every value derived by hand from the integer
    recurrence."""
    from marketviz_spark.operators.graph import PR_TOTAL, pagerank

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "node string"
    )
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["rank_ppt"]
        for r in pagerank(nodes, edges, iters=1).collect()
    }
    base = PR_TOTAL // 3
    teleport = (15 * base) // 100
    # c has no out-edges → the dangling mass is r0(c) = base
    dm_share = base // 3
    assert got["a"] == teleport + (85 * dm_share) // 100
    assert got["b"] == got["a"]
    # c receives both full contributions (outdeg 1 each)
    assert got["c"] == teleport + (85 * (2 * base + dm_share)) // 100


def test_pagerank_mass_and_order(spark):
    """Supply-graph ranks: total mass stays within the integer-dust
    bound of PR_TOTAL, every node is ranked, and customers (the
    only contribution sinks) outrank suppliers on average."""
    from marketviz_spark.operators.graph import PR_TOTAL

    rows = QUERIES["graph_pagerank"].fn(spark, SF_SMALL).collect()
    n = len(rows)
    total = sum(r["rank_ppt"] for r in rows)
    # each of the 4 iterations can truncate <1 ppt per node per div
    # (3 divisions on the node path + per-edge contribution dust)
    assert total <= PR_TOTAL
    assert total >= PR_TOTAL - 10 * n * 4 - PR_TOTAL // 100
    supp = [r["rank_ppt"] for r in rows if r["node"].startswith("S")]
    cust = [r["rank_ppt"] for r in rows if r["node"].startswith("C")]
    assert supp and cust
    assert sum(cust) / len(cust) > sum(supp) / len(supp)


def test_pagerank_iteration_plan_two_wide_stages(spark):
    """One iteration over checkpointed inputs = the contribution
    join + ONE groupBy(dst) exchange; ranks-side joins broadcast."""
    from marketviz_spark.operators.graph import (
        pagerank,
        supply_edges,
    )

    lineitem = tables.load(spark, SF_SMALL, "lineitem")
    orders = tables.load(spark, SF_SMALL, "orders")
    nodes = (
        supply_edges(lineitem, orders)
        .select(F.col("src").alias("node"))
        .union(supply_edges(lineitem, orders).select("dst"))
        .distinct()
    )
    df = pagerank(nodes, supply_edges(lineitem, orders), iters=1)
    plan = _plan(df)
    # inputs are localCheckpoint scans, so the plan shows only the
    # final iteration: no parquet rescans, no cartesian
    assert "CartesianProduct" not in plan
    assert "Scan parquet" not in plan


# ------------------------------------------------------------- Layout


def test_zorder_beats_natural_on_secondary_key(spark):
    rows = {
        r["layout"]: r
        for r in QUERIES["layout_skipping_audit"]
        .fn(spark, SF_MED)
        .collect()
    }
    nat, zod = rows["natural"], rows["zorder"]
    assert nat["n_rows"] == zod["n_rows"]
    # the point of z-order: partkey span collapses by ~an order of
    # magnitude, orderkey span grows but stays bounded
    assert zod["sum_part_span"] * 4 < nat["sum_part_span"]
    assert zod["sum_order_span"] < nat["sum_order_span"] * 16


def test_zorder_zone_maps_cover_table(spark):
    from marketviz_spark.operators.layout import N_FILES, Z_FOLD

    rows = QUERIES["layout_zorder"].fn(spark, SF_MED).collect()
    assert 0 < len(rows) <= N_FILES
    n = tables.load(spark, SF_MED, "lineitem").count()
    assert sum(r["n_rows"] for r in rows) == n
    for r in rows:
        assert 0 <= r["min_order_fold"] <= r["max_order_fold"] < Z_FOLD
        assert 0 <= r["min_part_fold"] <= r["max_part_fold"] < Z_FOLD
        # each z-file is a rectangle of the top-3-bit grid: spans
        # are bounded by the 8192-wide cell
        assert r["max_order_fold"] - r["min_order_fold"] < Z_FOLD // 8
        assert r["max_part_fold"] - r["min_part_fold"] < Z_FOLD // 8


def test_zorder_plan_map_only_single_exchange(spark):
    """Layout assignment must stay map-side: one groupBy exchange,
    2-column scan, no window, no join."""
    plan = _plan(QUERIES["layout_zorder"].fn(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan and "Join" not in plan
    scan = next(
        line for line in plan.splitlines() if "Scan parquet" in line
    )
    assert "l_orderkey" in scan or "ReadSchema" not in scan
    assert "l_extendedprice" not in plan


# --------------------------------------------------------------- BM25


def test_bm25_invariants(spark):
    from marketviz_spark.datapipe.bm25 import BM25_QUERIES, BM25_TOPK

    rows = QUERIES["bm25_topk"].fn(spark, SF_MED).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in BM25_QUERIES}
    for rows_q in by_q.values():
        rows_q.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows_q] == list(
            range(1, len(rows_q) + 1)
        )
        assert len(rows_q) <= BM25_TOPK
        scores = [r["score_ppm"] for r in rows_q]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_bm25_top_doc_matches_terms(spark):
    """The rank-1 doc for the 2-term query must actually contain
    both query terms (with every corpus doc sharing the vocabulary,
    a top-ranked doc missing a term would mean broken tf math)."""
    top = (
        QUERIES["bm25_topk"]
        .fn(spark, SF_MED)
        .filter("query_id = 1 and rank = 1")
        .collect()[0]
    )
    text = (
        tables.load(spark, SF_MED, "documents")
        .filter(F.col("doc_id") == top["doc_id"])
        .collect()[0]["text"]
    )
    toks = set(text.split())
    assert "hash" in toks and "join" in toks


def test_bm25_plan_no_full_index_and_pruned_scan(spark):
    """The term filter must run map-side (postings shuffle carries
    only query terms) and the scan must prune to doc_id+text."""
    plan = _plan(QUERIES["bm25_topk"].fn(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert "lang" not in line and "source" not in line, line
    # the explode feeds a Filter on the literal term set BEFORE any
    # exchange: the filter condition must mention a query term AND
    # render as a membership test (INSET above the conversion
    # threshold, IN (...) below it)
    assert "hash" in plan and ("INSET" in plan or "IN (" in plan)


# ------------------------------------------------- basket + profile


def test_basket_pairs_invariants(spark):
    from marketviz_spark.operators.basket import MIN_SUPPORT

    rows = QUERIES["basket_pairs"].fn(spark, SF_MED).collect()
    assert rows
    li = tables.load(spark, SF_MED, "lineitem")
    n_baskets = li.select("l_orderkey").distinct().count()
    for r in rows:
        assert r["item_a"] < r["item_b"]
        assert r["support"] >= MIN_SUPPORT
        # confidence is a probability (ppm), truncated
        assert 0 < r["conf_ab_ppm"] <= 1_000_000
        assert r["lift_ppm"] > 0
    # spot-check one pair's support against a direct count
    top = max(rows, key=lambda r: (r["support"], -r["item_a"]))
    direct = (
        li.filter(F.col("l_partkey").isin(top["item_a"], top["item_b"]))
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("k"))
        .filter("k = 2")
        .count()
    )
    assert direct == top["support"]
    assert n_baskets > 0


def test_basket_pairs_plan_prunes_before_pairing(spark):
    """The A-priori prune is a semi-join (strategy left to
    Catalyst/AQE — at test scale it broadcasts; forcing broadcast
    would break at low support thresholds where the frequent set is
    ~all items) and pair generation an equi-join on the basket key
    — never cartesian."""
    plan = _plan(QUERIES["basket_pairs"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    # the 1-row n_baskets crossJoin is the only permissible NLJ
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "LeftSemi" in plan, plan


def test_profile_matches_direct_counts(spark):
    rows = {
        r["column"]: r
        for r in QUERIES["profile_lineitem"].fn(spark, SF_MED).collect()
    }
    li = tables.load(spark, SF_MED, "lineitem")
    n = li.count()
    assert all(r["n_rows"] == n for r in rows.values())
    direct_ndv = li.select("l_returnflag").distinct().count()
    assert rows["l_returnflag"]["ndv"] == direct_ndv
    assert rows["l_orderkey"]["n_null"] == 0


def test_profile_plan_single_scan_expand(spark):
    plan = _plan(QUERIES["profile_lineitem"].fn(spark, SF_SMALL))
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan


# ----------------------------------------------------------------- CMS


def test_cms_one_sided_error_and_ranks(spark):
    from marketviz_spark.operators.cms import CMS_TOPK

    rows = sorted(
        QUERIES["cms_heavy_hitters"].fn(spark, SF_MED).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == CMS_TOPK
    assert [r["rank"] for r in rows] == list(range(1, CMS_TOPK + 1))
    cnts = [r["exact_cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        # CMS never under-counts
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["over_ppm"] >= 0


def test_cms_plan_single_fact_shuffle(spark):
    """The only key-grain shuffle is groupBy(item); the sketch and
    audit stages run over count-sized / sketch-sized data."""
    plan = _plan(QUERIES["cms_heavy_hitters"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    # counts subtree is shared between cells and top-k: Spark must
    # not rescan the fact more than twice (adaptive reuse usually
    # makes it one real scan + ReusedExchange)
    assert plan.count("Scan parquet") <= 2, plan


def test_rle_audit_tradeoff(spark):
    """Natural layout must RLE-compress its own key dramatically
    and shred the secondary; z-order lands in between on both."""
    rows = {
        r["layout"]: r
        for r in QUERIES["layout_rle_audit"].fn(spark, SF_MED).collect()
    }
    nat, zod = rows["natural"], rows["zorder"]
    assert nat["n_rows"] == zod["n_rows"]
    # sorting by b1 makes b1 runs ~= ndv (tiny vs groups)
    assert nat["runs_order_fold"] * 4 < nat["n_groups"]
    # z-order: fewer secondary-key runs than natural's shredded b2
    assert zod["runs_part_fold"] < nat["runs_part_fold"]
    # and run counts are valid bounds
    for r in (nat, zod):
        assert 0 < r["runs_order_fold"] <= r["n_groups"]
        assert 0 < r["runs_part_fold"] <= r["n_groups"]


# ------------------------------------------------ phrase + skew report


def test_phrase_match_counts(spark):
    """Cross-check every phrase against an exact python n-gram
    census (NOT a LIKE scan — LIKE also matches mid-token suffixes
    like 'rehash join', so it is not equivalent in general). Also
    pins the every-phrase-gets-a-row contract: zero-match phrases
    report 0/0."""
    from marketviz_spark.datapipe.bm25 import PHRASE_QUERIES

    rows = {
        r["phrase"]: r
        for r in QUERIES["phrase_match"].fn(spark, SF_MED).collect()
    }
    assert set(rows) == {p for _, p in PHRASE_QUERIES}
    texts = [
        r["text"]
        for r in tables.load(spark, SF_MED, "documents")
        .select("text")
        .collect()
    ]
    for _, phrase in PHRASE_QUERIES:
        want = phrase.split()
        n = len(want)
        n_docs = n_occ = 0
        for t in texts:
            toks = [x for x in t.split(" ") if x]
            hits = sum(
                1
                for i in range(len(toks) - n + 1)
                if toks[i : i + n] == want
            )
            n_docs += hits > 0
            n_occ += hits
        assert rows[phrase]["n_docs"] == n_docs, phrase
        assert rows[phrase]["n_occurrences"] == n_occ, phrase


def test_phrase_match_plan_map_side_filter(spark):
    plan = _plan(QUERIES["phrase_match"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_skew_report_values(spark):
    """Gini and shares must be internally consistent and match a
    direct python computation for one column."""
    rows = {
        r["source_col"]: r
        for r in QUERIES["skew_report"].fn(spark, SF_MED).collect()
    }
    assert set(rows) == {
        "lineitem.l_suppkey",
        "lineitem.l_partkey",
        "orders.o_custkey",
    }
    for r in rows.values():
        assert 0 <= r["gini_ppm"] < 1_000_000
        assert r["top1_share_ppm"] <= r["top10_share_ppm"] <= 1_000_000
        assert r["max_cnt"] >= r["n_rows"] // r["n_keys"]
    # python mirror for l_suppkey
    cnts = sorted(
        c["cnt"]
        for c in tables.load(spark, SF_MED, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    n, s = len(cnts), sum(cnts)
    ic = sum(i * c for i, c in enumerate(cnts, start=1))
    gini = ((2 * ic - (n + 1) * s) * 1_000_000) // (n * s)
    r = rows["lineitem.l_suppkey"]
    assert r["n_keys"] == n and r["n_rows"] == s
    assert r["gini_ppm"] == gini
    assert r["top10_share_ppm"] == (sum(cnts[-10:]) * 1_000_000) // s


# --------------------------------------------- join-size + SCD2


def test_join_size_estimate_one_sided(spark):
    row = (
        QUERIES["join_size_estimate"].fn(spark, SF_MED).collect()[0]
    )
    li = tables.load(spark, SF_MED, "lineitem")
    # every lineitem matches exactly one order (RI), so the exact
    # join size is |lineitem|
    assert row["exact_pairs"] == li.count()
    assert row["cms_est_pairs"] >= row["exact_pairs"]
    assert row["over_ppm"] >= 0


def test_scd2_intervals_partition_dates(spark):
    """Islands must tile the date range: contiguous versions,
    non-overlapping [from, to], composition constant within and
    different across adjacent versions."""
    rows = sorted(
        QUERIES["scd2_composition"].fn(spark, SF_MED).collect(),
        key=lambda r: r["version"],
    )
    assert rows
    n_days_total = sum(r["n_days"] for r in rows)
    idx = QUERIES["index_daily"].fn(spark, SF_MED)
    assert n_days_total == idx.count()
    for a, b in zip(rows, rows[1:]):
        assert a["valid_to"] < b["valid_from"]
        assert a["composition"] != b["composition"]
    for r in rows:
        assert r["valid_from"] <= r["valid_to"]


def test_compaction_plan_covers_all_files(spark):
    from marketviz_spark.operators.layout import (
        COMPACT_TARGET_ROWS,
    )

    bins = sorted(
        QUERIES["layout_compaction_plan"].fn(spark, SF_MED).collect(),
        key=lambda r: r["bin_id"],
    )
    files = QUERIES["layout_zorder"].fn(spark, SF_MED).collect()
    assert sum(b["n_files_merged"] for b in bins) == len(files)
    assert sum(b["bin_rows"] for b in bins) == sum(
        f["n_rows"] for f in files
    )
    # bins partition the z-file sequence contiguously
    for a, b in zip(bins, bins[1:]):
        assert a["z_file_max"] < b["z_file_min"]
    # every bin except possibly the last reaches the target minus
    # one file's worth of undershoot (prefix-sum assignment)
    for b in bins[:-1]:
        assert b["bin_rows"] > 0
    assert all(b["bin_rows"] >= 1 for b in bins)


def test_triangles_python_mirror(spark):
    """Triangle count cross-checked with a pure-python census over
    the same edge set."""
    from marketviz_spark.operators.basket import basket_pairs

    edges = {
        (r["item_a"], r["item_b"])
        for r in basket_pairs(tables.load(spark, SF_MED, "lineitem"))
        .select("item_a", "item_b")
        .collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    wedges = tris = 0
    for a, b in edges:
        for c in adj.get(b, ()):
            wedges += 1
            if c in adj.get(a, set()):
                tris += 1
    row = QUERIES["graph_triangles"].fn(spark, SF_MED).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tris
    if wedges:
        assert row["transitivity_ppm"] == (tris * 1_000_000) // wedges


def test_weighted_pagerank_reduces_to_unweighted_on_unit_weights(spark):
    """w=1 must reproduce pagerank() exactly: (r*1) div deg ==
    r div deg — the unification proof in the docstring, executed."""
    from marketviz_spark.operators.graph import (
        pagerank,
        pagerank_weighted,
    )

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "node string"
    )
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    edges = spark.createDataFrame(e, "src string, dst string")
    weighted = spark.createDataFrame(
        [(s, d, 1) for s, d in e], "src string, dst string, w long"
    )
    got_u = {
        r["node"]: r["rank_ppt"]
        for r in pagerank(nodes, edges, iters=2).collect()
    }
    got_w = {
        r["node"]: r["rank_ppt"]
        for r in pagerank_weighted(nodes, weighted, iters=2).collect()
    }
    assert got_u == got_w


def test_weighted_pagerank_follows_weight(spark):
    """All mass at a flows to b when w(a→b) >> w(a→c) in one hop."""
    from marketviz_spark.operators.graph import pagerank_weighted

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "node string"
    )
    edges = spark.createDataFrame(
        [("a", "b", 99), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    got = {
        r["node"]: r["rank_ppt"]
        for r in pagerank_weighted(nodes, edges, iters=3).collect()
    }
    assert got["b"] > got["c"]


def test_item_recommendations_symmetry_and_ranks(spark):
    """Every (item, partner) implies the mirrored (partner, item)
    exists in the symmetrized stream (it may fall below the top-k
    cut), lift is direction-symmetric, and ranks are dense."""
    from marketviz_spark.operators.basket import basket_pairs

    recs = QUERIES["item_recommendations"].fn(spark, SF_MED).collect()
    pair_lift = {
        (r["item_a"], r["item_b"]): r["lift_ppm"]
        for r in basket_pairs(
            tables.load(spark, SF_MED, "lineitem")
        ).collect()
    }
    by_item: dict[int, list] = {}
    for r in recs:
        by_item.setdefault(r["item"], []).append(r)
    assert by_item
    for item, rows in by_item.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        for r in rows:
            key = (min(item, r["partner"]), max(item, r["partner"]))
            assert pair_lift[key] == r["lift_ppm"]
            assert 0 < r["conf_ppm"] <= 1_000_000


def test_rfm_scores_balanced_and_consistent(spark):
    """Quintile scores are near-balanced (closed-form buckets),
    segments match the R/F grid, and one customer's raw metrics
    cross-check against a direct aggregate."""
    rows = QUERIES["customer_rfm"].fn(spark, SF_MED).collect()
    n = len(rows)
    assert n > 0
    for dim in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            counts[r[dim]] = counts.get(r[dim], 0) + 1
        assert set(counts) == {1, 2, 3, 4, 5}
        assert max(counts.values()) - min(counts.values()) <= 1
    for r in rows[:50]:
        assert r["rfm_cell"] == (
            r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
        )
        if r["r_score"] >= 4 and r["f_score"] >= 4:
            assert r["segment"] == "champion"
    # raw-metric cross-check for the first customer
    c = rows[0]["custkey"]
    orders = tables.load(spark, SF_MED, "orders").filter(
        F.col("o_custkey") == c
    )
    assert rows[0]["frequency"] == orders.count()


def test_funnel_percentiles_exact_vs_python(spark):
    """Exact nearest-rank percentiles cross-checked against a
    python mirror of the same funnel semantics."""
    rows = {
        r["transition"]: r
        for r in QUERIES["funnel_time_percentiles"]
        .fn(spark, SF_MED)
        .collect()
    }
    assert set(rows) == {"view_to_click", "click_to_purchase"}
    ev = sorted(
        (
            (r["user_id"], r["event_type"], r["ts"])
            for r in tables.load_events(spark, SF_MED)
            .select("user_id", "event_type", "ts")
            .collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    by_user: dict[int, list] = {}
    for u, et, ts in ev:
        by_user.setdefault(u, []).append((et, ts))
    d12, d23 = [], []
    for u, evs in by_user.items():
        t1 = min((ts for et, ts in evs if et == "view"), default=None)
        if t1 is None:
            continue
        t2 = min(
            (ts for et, ts in evs if et == "click" and ts > t1),
            default=None,
        )
        if t2 is None:
            continue
        d12.append((int((t2 - t1).total_seconds() * 1e6 + 0.5), u))
        t3 = min(
            (ts for et, ts in evs if et == "purchase" and ts > t2),
            default=None,
        )
        if t3 is None:
            continue
        d23.append((int((t3 - t2).total_seconds() * 1e6 + 0.5), u))

    def pctl(durs, p):
        s = sorted(durs)
        return s[(len(s) * p + 99) // 100 - 1][0]

    for name, durs in (
        ("view_to_click", d12),
        ("click_to_purchase", d23),
    ):
        r = rows[name]
        assert r["n_conversions"] == len(durs)
        assert r["p50_us"] == pctl(durs, 50)
        assert r["p90_us"] == pctl(durs, 90)
        assert r["p99_us"] == pctl(durs, 99)
        assert r["p50_us"] <= r["p90_us"] <= r["p99_us"]
