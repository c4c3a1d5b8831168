"""Entry point 2 — the equal-weighted top-K index.

The reference computes the index with a 30-iteration per-date loop of
point queries (app.py:22-23 -> equal_weight_index.py:9-54). Here it
is ONE set-oriented DataFrame job over every date: window-rank top-K
per date, then aggregate. Catalyst co-partitions the rank window and
the groupBy on `date`, so the whole thing is a single shuffle; with
WindowGroupLimit the per-date top-K is pre-filtered map-side before
that shuffle, which is what makes this viable on a 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import index_value, ordered_composition
from ..operators.windows import topk_per_group


def compute_index(stocks_df: DataFrame, k: int = 10) -> DataFrame:
    """stocks -> [date, index_value, composition].

    index_value = sum(top-k share_price)/k (A1); composition = CSV of
    tickers desc-by-market-cap, ticker tiebreak (A2, W9). Non-trading
    days simply produce no group (P7's empty-date guard is implicit
    in set-oriented form).
    """
    topk = topk_per_group(
        stocks_df,
        "date",
        [F.col("market_cap").desc(), F.col("ticker").asc()],
        k,
    )
    return topk.groupBy("date").agg(
        index_value(k), ordered_composition()
    )
