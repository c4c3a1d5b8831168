"""A-priori level-3 triples (operators/basket.py basket_triples):
hand-built basket mirror, downward-closure consistency against the
pair miner, and the plan pin."""

from __future__ import annotations

from itertools import combinations

from marketviz_spark.operators.basket import (
    MIN_SUPPORT,
    basket_pairs,
    basket_triples,
)
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def _li(spark, baskets):
    rows = [
        (bid, item)
        for bid, items in enumerate(baskets)
        for item in items
    ]
    return spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    )


def test_triples_known_baskets(spark):
    """{1,2,3} occurs twice, {1,2,4} once: only (1,2,3) is frequent
    at MIN_SUPPORT=2, with hand-checked support and lift3."""
    baskets = [
        [1, 2, 3],
        [1, 2, 3, 9],
        [1, 2, 4],
        [5, 6],
    ]
    out = basket_triples(_li(spark, baskets)).collect()
    rows = {(r["item_a"], r["item_b"], r["item_c"]): r for r in out}
    assert set(rows) == {(1, 2, 3)}
    r = rows[(1, 2, 3)]
    assert r["support"] == 2
    n = 4
    sup = {1: 3, 2: 3, 3: 2}
    expect = 2 * n * n * 1_000_000 // (sup[1] * sup[2] * sup[3])
    assert r["lift3_ppm"] == expect


def test_triples_downward_closure_vs_pairs(spark):
    """Every frequent triple's three sub-pairs must appear in the
    pair miner's output with support >= the triple's — the A-priori
    property, checked operator-against-operator on testdata."""
    from marketviz_spark import tables

    li = tables.load(spark, SF_MED, "lineitem")
    triples = basket_triples(li).collect()
    pairs = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in basket_pairs(li).collect()
    }
    assert triples, "sf0.01 lineitem must yield frequent triples"
    for t in triples:
        items = (t["item_a"], t["item_b"], t["item_c"])
        assert items == tuple(sorted(items))
        for a, b in combinations(items, 2):
            assert pairs.get((a, b), 0) >= t["support"] >= MIN_SUPPORT


def test_triples_plan_no_cartesian(spark):
    df = QUERIES["basket_triples"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # both self-joins are basket-keyed EQUI-joins (hash-joinable —
    # AQE picks broadcast at this sf, shuffle variants at scale);
    # the single NLJ is the broadcast 1-row n_baskets frame
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )
    assert plan.count("BroadcastNestedLoopJoin") <= 1
