"""CUSUM changepoint (operators/changepoint.py): exact mirror on a
hand-built series, invariants on testdata, and the scale-plan pin
(per-type partitioned windows over the pre-reduced daily frame)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marketviz_spark.operators.changepoint import cusum_changepoint
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cusum_known_shift(spark):
    """A clean level shift: 10 days at 5, then 10 days at 50. The
    CUSUM minimum (max |C|) sits exactly at the last low day —
    day 10 — and the scaled magnitude matches the closed form
    n*P_t - t*T computed by hand."""
    rows = [
        ("a", f"2024-01-{d:02d}", 5 if d <= 10 else 50)
        for d in range(1, 21)
    ]
    daily = spark.createDataFrame(
        rows, "event_type string, day string, n_events long"
    )
    out = cusum_changepoint(daily).collect()
    assert len(out) == 1
    r = out[0]
    n, tot = 20, 10 * 5 + 10 * 50
    assert r["n_days"] == n and r["total_events"] == tot
    assert r["cp_day"] == "2024-01-10"
    # C'_10 = n*P_10 - 10*T = 20*50 - 10*550
    expect = abs(n * 50 - 10 * tot)
    assert r["max_abs_cusum"] == expect
    assert (
        r["cusum_share_ppm"] == expect * 1_000_000 // (n * tot)
    )


def test_cusum_constant_series_zero(spark):
    """A flat series has C'_t = 0 everywhere; the tiebreak picks the
    earliest day and the magnitude is exactly zero."""
    rows = [("b", f"2024-02-{d:02d}", 7) for d in range(1, 11)]
    daily = spark.createDataFrame(
        rows, "event_type string, day string, n_events long"
    )
    r = cusum_changepoint(daily).collect()[0]
    assert r["max_abs_cusum"] == 0
    assert r["cusum_share_ppm"] == 0
    assert r["cp_day"] == "2024-02-01"


def test_cusum_invariants_on_testdata(spark):
    out = QUERIES["events_cusum_changepoint"].fn(spark, SF_MED).collect()
    assert out, "every event type present must yield one row"
    types = [r["event_type"] for r in out]
    assert len(types) == len(set(types))
    for r in out:
        assert r["n_days"] >= 1 and r["total_events"] >= 1
        assert 0 <= r["cusum_share_ppm"] <= 1_000_000
        assert r["max_abs_cusum"] >= 0
        # C'_n = 0 always, so a 1-day series peaks at 0
        if r["n_days"] == 1:
            assert r["max_abs_cusum"] == 0


def test_cusum_plan_partitioned_windows_no_cartesian(spark):
    """All windows partition by event_type (never a global sort of
    the daily frame) and the fact-table reduction is a hash
    aggregate below them; no cartesian product anywhere."""
    df = QUERIES["events_cusum_changepoint"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(event_type" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final daily
