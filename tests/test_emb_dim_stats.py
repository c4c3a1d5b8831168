"""Per-dimension embedding stats (datapipe/similarity.py
emb_dim_stats): numpy mirror on real data, sign-safety of the
emitted aggregates, and the plan pin."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from marketviz_spark.datapipe.similarity import EMB_DIM
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def test_dim_stats_numpy_mirror(spark):
    """Quantize-then-aggregate in numpy/python ints and compare
    every output cell — integer exactness, not approx."""
    rows = {
        r["dim"]: r
        for r in QUERIES["emb_dim_stats"].fn(spark, SF_MED).collect()
    }
    t = pq.read_table(f"{SF_MED}/embeddings.parquet")
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    assert set(rows) == set(range(1, EMB_DIM + 1))
    for d in range(1, EMB_DIM + 1):
        q = np.floor(E[:, d - 1] * 1_000_000.0 + 0.5).astype(np.int64)
        r = rows[d]
        assert r["n"] == len(q)
        assert r["sum_q6"] == int(q.sum())
        ssq = sum(int(x) * int(x) for x in q)  # python ints: no overflow
        assert r["mean_sq_q12"] == ssq // len(q)
        assert r["min_q6"] == int(q.min())
        assert r["max_q6"] == int(q.max())


def test_dim_stats_sign_safety(spark):
    """sum_q6 may be negative (emitted raw, never divided — Spark
    div truncates toward zero while DuckDB // floors on negatives);
    mean_sq_q12 is non-negative by construction."""
    rows = QUERIES["emb_dim_stats"].fn(spark, SF_MED).collect()
    assert any(r["sum_q6"] < 0 for r in rows) or all(
        r["min_q6"] >= 0 for r in rows
    )
    for r in rows:
        assert r["mean_sq_q12"] >= 0
        assert r["min_q6"] <= r["max_q6"]


def test_dim_stats_plan_map_side_combine(spark):
    """Explode + partial agg on the 64-value dim key: two
    HashAggregates (partial map-side, final), no joins at all."""
    df = QUERIES["emb_dim_stats"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
