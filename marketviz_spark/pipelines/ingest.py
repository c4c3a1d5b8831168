"""Entry point 1 — source-pluggable ingest (SURVEY §2.1 S1-S4).

The reference fetches a ticker universe from the NASDAQ screener and
per-ticker history from yfinance in a sequential driver loop
(stock_data_fetcher.py:106-128 — ~121 blocking HTTP calls, its
dominant wall-clock cost). Here sources are pluggable behind two
small interfaces, and the per-ticker fetch fans out ACROSS THE
CLUSTER with mapInPandas: each partition of tickers performs its own
fetches, bad tickers become error rows instead of killing the job
(the reference's log-and-skip semantics, :127-128).

For tests and the driver contract, `SyntheticHistorySource` derives
the same shape from the testdata parquet (no network in this
environment); `YFinanceHistorySource` contains the real fetch logic
behind an import guard.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import split_adjust

RAW_SCHEMA = (
    "ticker string, date string, close double, stock_splits double, "
    "shares_outstanding double, error string"
)


NASDAQ_API_URL = "https://api.nasdaq.com/api/screener/stocks"


def fetch_nasdaq_universe(limit: int = 120) -> list[str]:
    """S1 live path (reference stock_data_fetcher.py:106-118): one
    GET on the screener API, symbols with '/' normalized to '-'.
    Import-guarded (requests + network are absent in the sandbox);
    exercised by the MARKETVIZ_LIVE=1 integration test so the parse
    shape can't bit-rot unnoticed. Network failures surface as
    ConnectionError, matching the reference (:119-120)."""
    import requests  # guarded: not a hard dependency

    try:
        resp = requests.get(
            f"{NASDAQ_API_URL}?limit={limit}",
            headers={
                "User-Agent": "Mozilla/5.0",
                "Accept": "application/json",
            },
            timeout=30,
        )
        rows = resp.json()["data"]["table"]["rows"]
        return [row["symbol"].replace("/", "-") for row in rows]
    except Exception as e:  # noqa: BLE001 — reference behavior
        raise ConnectionError(
            f"Error fetching stock universe: {e}"
        ) from e


@dataclass
class UniverseSource:
    """S1: produces the ticker universe. The reference GETs the
    NASDAQ screener and normalizes '/' to '-'
    (stock_data_fetcher.py:106-118)."""

    tickers: list[str]

    def to_df(self, spark: SparkSession) -> DataFrame:
        df = spark.createDataFrame(
            [(t,) for t in self.tickers], "symbol string"
        )
        return df.select(
            F.regexp_replace("symbol", "/", "-").alias("ticker")
        )


class HistorySource:
    """S2+S3: per-ticker price history + shares outstanding."""

    def fetch(self, ticker: str) -> pd.DataFrame:  # pragma: no cover
        raise NotImplementedError


class YFinanceHistorySource(HistorySource):
    """The reference's yfinance fetch (stock_data_fetcher.py:50-62),
    kept behind an import guard — no network or yfinance in this
    environment. Raises on missing sharesOutstanding exactly like
    the reference (:61-62)."""

    def __init__(self, period: str = "1mo"):
        self.period = period

    @staticmethod
    def shape(
        hist: pd.DataFrame, shares, ticker: str
    ) -> pd.DataFrame:
        """Shape a yfinance-style history frame (DatetimeIndex named
        Date; Close / Stock Splits columns) into the flat RAW_SCHEMA
        rows the distributed pipeline consumes. Falsy shares raises,
        exactly like the reference (stock_data_fetcher.py:61-62 uses
        `if not shares_outstanding`, so 0 fails too). The reference's
        driver-side reverse + cumprod split adjustment
        (stock_data_fetcher.py:52-70) is NOT done here — split
        adjustment runs distributed in operators.windows.split_adjust,
        so the source emits raw per-day rows in any order."""
        if not shares:
            raise ValueError(f"no sharesOutstanding for {ticker}")
        hist = hist.reset_index()
        return pd.DataFrame(
            {
                "date": hist["Date"].dt.strftime("%Y-%m-%d"),
                "close": hist["Close"],
                "stock_splits": hist["Stock Splits"],
                "shares_outstanding": float(shares),
            }
        )

    def fetch(self, ticker: str) -> pd.DataFrame:  # pragma: no cover
        import yfinance as yf  # noqa: F401

        t = yf.Ticker(ticker)
        return self.shape(
            t.history(period=self.period),
            t.info.get("sharesOutstanding"),
            ticker,
        )


class SyntheticHistorySource(HistorySource):
    """Deterministic offline source with the same shape (used by
    tests; mirrors FIXTURES.md §1.3)."""

    def __init__(self, days: int = 5, base: str = "2024-01-0"):
        self.days = days
        self.base = base

    def fetch(self, ticker: str) -> pd.DataFrame:
        if ticker.endswith("!"):  # crafted failure case
            raise ValueError(f"bad ticker {ticker}")
        seed = sum(ticker.encode())
        return pd.DataFrame(
            {
                "date": [f"{self.base}{d + 1}" for d in range(self.days)],
                "close": [float(seed % 97) + d for d in range(self.days)],
                "stock_splits": [
                    2.0 if (seed + d) % 7 == 0 else 0.0
                    for d in range(self.days)
                ],
                "shares_outstanding": float(seed) * 100.0,
            }
        )


def fetch_universe(
    universe: DataFrame, source: HistorySource
) -> DataFrame:
    """S4: fan the per-ticker fetch out over the cluster. Errors are
    captured per ticker (partial results tolerated, like the
    reference's log-and-skip)."""

    def fetch_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for ticker in pdf["ticker"]:
                try:
                    h = source.fetch(ticker)
                    h = h.assign(ticker=ticker, error=None)
                except Exception as e:  # noqa: BLE001 — error channel
                    h = pd.DataFrame(
                        {
                            "ticker": [ticker],
                            "date": [None],
                            "close": [None],
                            "stock_splits": [None],
                            "shares_outstanding": [None],
                            "error": [str(e)],
                        }
                    )
                frames.append(
                    h[
                        [
                            "ticker",
                            "date",
                            "close",
                            "stock_splits",
                            "shares_outstanding",
                            "error",
                        ]
                    ]
                )
            if frames:  # a zero-row Arrow batch yields no frames
                yield pd.concat(frames, ignore_index=True)

    return universe.repartition("ticker").mapInPandas(
        fetch_partition, RAW_SCHEMA
    )


def ingest(
    universe: DataFrame, source: HistorySource
) -> tuple[DataFrame, DataFrame]:
    """Full ingest: fetch -> drop failed tickers -> split adjustment
    -> stocks schema. Returns (stocks, errors)."""
    raw = fetch_universe(universe, source)
    errors = raw.filter(F.col("error").isNotNull()).select(
        "ticker", "error"
    )
    good = raw.filter(F.col("error").isNull()).drop("error")
    stocks = split_adjust(good).select(
        "ticker",
        "date",
        "share_price",
        "market_cap",
        "effective_shares_outstanding",
    )
    return stocks, errors
