"""Sorted-neighborhood dedup blocking (datapipe/snm.py): semantics
on a hand-built corpus (window bound, multi-pass recall, verifier
exactness), linearity invariant, and the scale-plan pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketviz_spark.datapipe.snm import (
    SNM_WINDOW,
    snm_candidate_pairs,
)
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_snm_finds_near_dup_neighbors(spark):
    """Two near-identical docs share head AND tail keys, land
    adjacent in both sorted orders, and verify as duplicates; an
    unrelated doc in a different block never pairs with them."""
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zetb",  # 1-char tail change
        "zzz completely different content here",
    ]
    rows = snm_candidate_pairs(_docs(spark, texts)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r["in_head_pass"]  # same 6-char head block
    assert r["is_dup"] and r["jaccard_ppm"] > 900_000
    assert not any(2 in p for p in pairs)


def test_snm_window_bound_and_linearity(spark):
    """A block of identical-prefix docs yields at most (W-1) pairs
    per doc per pass — candidates stay LINEAR in block size, the
    SNM guarantee that replaces LSH's bucket caps."""
    n = 40
    texts = [f"prefix shared by all docs {i:03d} tail{i:03d}" for i in range(n)]
    rows = snm_candidate_pairs(_docs(spark, texts)).collect()
    # per pass each doc pairs forward with <= W-1 neighbors
    assert len(rows) <= 2 * n * (SNM_WINDOW - 1)
    # every doc appears in a bounded number of pairs
    from collections import Counter

    cnt = Counter()
    for r in rows:
        cnt[r["doc_a"]] += 1
        cnt[r["doc_b"]] += 1
    assert max(cnt.values()) <= 2 * 2 * (SNM_WINDOW - 1)


def test_snm_tail_pass_catches_head_divergence(spark):
    """Docs that differ at the START (different head blocks) but
    share their tail are exactly what the second pass exists for."""
    texts = [
        "aaaa unique opening shared middle and ending text block",
        "zzzz other opening shared middle and ending text block",
    ]
    rows = snm_candidate_pairs(_docs(spark, texts)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (0, 1) in pairs
    assert pairs[(0, 1)]["in_tail_pass"]
    assert not pairs[(0, 1)]["in_head_pass"]


def test_snm_empty_and_short_texts(spark):
    """Sub-trigram keys verify as identical (1e6 ppm) rather than
    dividing by zero; the pipeline never errors on them."""
    texts = ["", "a", "ab", "", "x"]
    rows = snm_candidate_pairs(_docs(spark, texts)).collect()
    for r in rows:
        assert 0 <= r["jaccard_ppm"] <= 1_000_000


def test_snm_plan_equi_join_and_parallelism(spark):
    """The pairing is an equi-join (no BroadcastNestedLoop / range
    predicate fallback, no cartesian), and the single-split guard
    spreads the checkpointed base past the file-split count (the
    final tiny result may still AQE-coalesce to 1 partition — the
    gate is on the BASE, where all the work happens)."""
    from marketviz_spark import tables
    from marketviz_spark.datapipe.snm import _norm

    df = QUERIES["dedup_sorted_neighborhood"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the sf0.01 documents table reads as a single split (the exact
    # shape the guard exists for); and the guard itself must stay in
    # the source — removing it re-pins every stage to the split
    # count (measured 4.3x -> 2.2x at the 10x spot when added)
    docs = tables.load(spark, SF_MED, "documents")
    base = docs.select("doc_id", _norm(F.col("text")).alias("hn"))
    assert base.rdd.getNumPartitions() < 4
    import inspect

    from marketviz_spark.datapipe import snm as snm_mod

    src = inspect.getsource(snm_mod.snm_candidate_pairs)
    assert "defaultParallelism" in src and "repartition" in src
