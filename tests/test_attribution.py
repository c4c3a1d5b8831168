"""Last-touch attribution (operators/attribution.py): hand-built
journey mirror covering the strictness and lookback edges, testdata
invariants, and the plan pin (one user-keyed window, broadcast
total, no cartesian fact join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from marketviz_spark.operators.attribution import (
    LOOKBACK_US,
    last_touch_attribution,
)
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def _ev(spark, rows):
    """rows: (user_id, event_id, event_type, us, value)."""
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, "
        "us long, value double",
    )
    return df.select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_micros("us").alias("ts"),
        "value",
    )


def test_attribution_journeys(spark):
    """Four journeys pin the semantics:
    - u1: view then click then purchase -> credited to click (latest);
    - u2: touch exactly AT the purchase ts -> NOT counted (strict <),
      and no earlier touch -> organic;
    - u3: touch 8 days before purchase -> outside lookback -> organic;
    - u4: touch exactly lookback micros before -> inside (<=)."""
    day = 24 * 3600 * 1_000_000
    rows = [
        (1, 10, "view", 1 * day, 0.0),
        (1, 11, "click", 2 * day, 0.0),
        (1, 12, "purchase", 3 * day, 10.0),
        (2, 20, "view", 5 * day, 0.0),
        (2, 21, "purchase", 5 * day, 20.0),  # equal ts: strict
        (3, 30, "click", 1 * day, 0.0),
        (3, 31, "purchase", 9 * day + 1, 30.0),  # 8d+ gap
        (4, 40, "view", 2 * day, 0.0),
        (4, 41, "purchase", 2 * day + LOOKBACK_US, 40.0),  # == edge
    ]
    out = {
        r["attributed_type"]: r
        for r in last_touch_attribution(_ev(spark, rows)).collect()
    }
    assert out["click"]["n_purchases"] == 1  # u1
    assert out["click"]["revenue_cents"] == 1000
    assert out["organic"]["n_purchases"] == 2  # u2, u3
    assert out["organic"]["revenue_cents"] == 2000 + 3000
    assert out["view"]["n_purchases"] == 1  # u4 at the <= edge
    assert out["view"]["revenue_cents"] == 4000
    # shares partition the 4 purchases
    assert (
        sum(r["purchase_share_ppm"] for r in out.values())
        <= 1_000_000
    )
    assert out["organic"]["purchase_share_ppm"] == 500_000


def test_attribution_same_ts_touch_tiebreak(spark):
    """Two touches at the same us: event_id breaks the tie, the
    LATER event_id wins the last() carry."""
    rows = [
        (7, 70, "view", 100, 0.0),
        (7, 71, "click", 100, 0.0),
        (7, 72, "purchase", 200, 5.0),
    ]
    out = last_touch_attribution(_ev(spark, rows)).collect()
    assert len(out) == 1 and out[0]["attributed_type"] == "click"


def test_attribution_testdata_invariants(spark):
    rows = QUERIES["events_attribution_last_touch"].fn(
        spark, SF_MED
    ).collect()
    assert rows
    total = sum(r["n_purchases"] for r in rows)
    for r in rows:
        assert r["attributed_type"] in ("view", "click", "organic")
        assert 1 <= r["n_users"] <= r["n_purchases"]
        assert (
            r["purchase_share_ppm"]
            == r["n_purchases"] * 1_000_000 // total
        )


def test_attribution_plan_single_user_window(spark):
    df = QUERIES["events_attribution_last_touch"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(user_id" in plan
    # the only cross join is the broadcast 1-row total
    assert plan.count("BroadcastNestedLoopJoin") <= 1
