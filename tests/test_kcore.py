"""k-core decomposition (operators/graph.py): exact mirror on a
hand-built graph, peeling invariants, and the convergence
certificate semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketviz_spark.operators.graph import kcore
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_kcore_known_graph(spark):
    """K4 (complete on a,b,c,d) plus a pendant path e-f hanging off
    a: the 3-core is exactly the K4, every core degree is 3, and
    the certificate proves convergence."""
    edges = _sym(
        spark,
        [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
            ("a", "e"), ("e", "f"),
        ],
    )
    rows = {r["node"]: r for r in kcore(edges, k=3, iters=4).collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    for r in rows.values():
        assert r["core_deg"] == 3
        assert r["n_core_nodes"] == 4
        assert r["min_core_deg"] == 3
        assert r["converged"]


def test_kcore_cycle_dissolves(spark):
    """A plain cycle is a 2-core; asking for k=3 must peel it to
    nothing (each peel drops every node at once)."""
    cyc = [("n%d" % i, "n%d" % ((i + 1) % 6)) for i in range(6)]
    assert kcore(_sym(spark, cyc), k=3, iters=2).count() == 0


def test_kcore_cascading_peel_needs_rounds(spark):
    """A chain hanging off a triangle peels one node per round from
    the tail — verifies iteration actually cascades: with k=2,
    round 1 drops only the chain END, not the whole chain."""
    edges = _sym(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"),  # triangle: 2-core
         ("c", "x1"), ("x1", "x2"), ("x2", "x3")],  # chain
    )
    # enough rounds: chain fully peels, triangle survives
    nodes = {
        r["node"] for r in kcore(edges, k=2, iters=4).collect()
    }
    assert nodes == {"a", "b", "c"}
    # one round only: x3 (deg 1) goes; x2's degree WAS 2 pre-peel
    one = {r["node"] for r in kcore(edges, k=2, iters=1).collect()}
    assert "x3" not in one and "x2" in one
    # and the certificate must report NOT converged after 1 round
    r0 = kcore(edges, k=2, iters=1).collect()[0]
    assert not r0["converged"]


def test_kcore_testdata_invariants(spark):
    from marketviz_spark.operators.graph import KCORE_K

    rows = QUERIES["graph_kcore"].fn(spark, SF_MED).collect()
    for r in rows:
        assert r["core_deg"] >= r["min_core_deg"]
        assert r["n_core_nodes"] == len(rows)
        # fixed-round peeling: certificate must hold on testdata
        assert r["converged"] and r["min_core_deg"] >= KCORE_K


def test_kcore_plan_no_cartesian(spark):
    df = QUERIES["graph_kcore"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only crossJoin is the broadcast 1-row certificate
    assert "CartesianProduct" not in plan
