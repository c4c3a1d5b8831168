"""Live-network integration smoke for the S1-S3 sources
(reference stock_data_fetcher.py:50-62,106-118).

Gated on MARKETVIZ_LIVE=1 — this sandbox has no network, so the
default run skips every test here; an environment with egress runs
them with

    MARKETVIZ_LIVE=1 python -m pytest tests/test_live_sources.py -q

The residual risk these cover is upstream schema drift (NASDAQ
screener JSON shape, yfinance history frame), not engine logic —
the engine side is snapshot-tested in test_sources_snapshots.py.
"""

from __future__ import annotations

import os

import pytest

LIVE = os.environ.get("MARKETVIZ_LIVE") == "1"

pytestmark = pytest.mark.skipif(
    not LIVE,
    reason="live-network smoke: set MARKETVIZ_LIVE=1 to run "
    "(requires egress to nasdaq.com / yahoo.com)",
)


def test_nasdaq_universe_live_shape():
    """S1: the screener returns symbols and the '/'-normalization
    applies (reference stock_data_fetcher.py:106-118)."""
    pytest.importorskip("requests")
    from marketviz_spark.pipelines.ingest import fetch_nasdaq_universe

    symbols = fetch_nasdaq_universe(limit=25)
    assert 0 < len(symbols) <= 25
    assert all(isinstance(s, str) and s and "/" not in s for s in symbols)


def test_yfinance_history_live_shape():
    """S2+S3: one real ticker's history shapes into RAW_SCHEMA rows
    (reference stock_data_fetcher.py:50-62)."""
    pytest.importorskip("yfinance")
    from marketviz_spark.pipelines.ingest import YFinanceHistorySource

    pdf = YFinanceHistorySource(period="5d").fetch("AAPL")
    assert set(pdf.columns) == {
        "date",
        "close",
        "stock_splits",
        "shares_outstanding",
    }
    assert len(pdf) > 0
    assert (pdf["shares_outstanding"] > 0).all()
    # ISO date strings, like the reference's strftime('%Y-%m-%d')
    assert pdf["date"].str.match(r"\d{4}-\d{2}-\d{2}").all()


def test_live_universe_fanout_partial_results(spark):
    """S4 over the live source: a bad ticker becomes an error row,
    good tickers produce data rows (reference log-and-skip,
    stock_data_fetcher.py:127-128)."""
    pytest.importorskip("yfinance")
    from marketviz_spark.pipelines.ingest import (
        UniverseSource,
        YFinanceHistorySource,
        fetch_universe,
    )

    universe = UniverseSource(
        ["AAPL", "MSFT", "THISTICKERDOESNOTEXIST123"]
    ).to_df(spark)
    raw = fetch_universe(universe, YFinanceHistorySource(period="5d"))
    rows = raw.collect()
    good = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    assert {r["ticker"] for r in good} >= {"AAPL", "MSFT"}
    assert all(
        r["ticker"] == "THISTICKERDOESNOTEXIST123" for r in bad
    )
