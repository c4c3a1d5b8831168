"""Bigram collocations (datapipe/textstats.py collocations):
hand-built corpus mirror, lift ordering sanity, and the plan pin."""

from __future__ import annotations

from marketviz_spark.datapipe.textstats import collocations
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_collocations_hand_corpus(spark):
    """'new york' always co-occurs; 'the cat'/'the dog' share the
    hot 'the'. The exact lift of each surviving bigram matches the
    closed form c(ab)*N*1e6 // (c(a)*c(b))."""
    texts = [
        "new york is big the cat sat",
        "new york has the dog and the cat",
        "new york again the dog runs",
    ]
    rows = {
        (r["w1"], r["w2"]): r
        for r in collocations(_docs(spark, texts), min_support=2).collect()
    }
    n = sum(len(t.split()) for t in texts)
    ny = rows[("new", "york")]
    assert ny["c_ab"] == 3 and ny["c_a"] == 3 and ny["c_b"] == 3
    assert ny["lift_ppm"] == 3 * n * 1_000_000 // (3 * 3)
    tc = rows[("the", "cat")]
    assert tc["c_ab"] == 2 and tc["c_a"] == 4 and tc["c_b"] == 2
    assert tc["lift_ppm"] == 2 * n * 1_000_000 // (4 * 2)
    # perfect collocation ('new york') must out-score the
    # hot-token pair — the whole point of lift over raw counts
    assert ny["lift_ppm"] > tc["lift_ppm"]


def test_collocations_support_floor(spark):
    """A bigram below min_support never appears."""
    texts = ["alpha beta gamma", "alpha beta delta"]
    rows = collocations(_docs(spark, texts), min_support=2).collect()
    keys = {(r["w1"], r["w2"]) for r in rows}
    assert keys == {("alpha", "beta")}


def test_collocations_testdata_invariants(spark):
    rows = QUERIES["text_collocations"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r["c_ab"] >= 3
        assert r["c_a"] >= r["c_ab"] and r["c_b"] >= r["c_ab"]
        assert r["lift_ppm"] >= 0


def test_collocations_plan_no_cartesian(spark):
    df = QUERIES["text_collocations"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only NLJ is the broadcast 1-row token total
    assert plan.count("BroadcastNestedLoopJoin") <= 1
