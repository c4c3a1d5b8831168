"""Aggregation operators (SURVEY §2.4, A1-A5).

The one hard part is A2 — deterministic ordered string-agg.
``collect_list`` ordering is partition-dependent, so the sort happens
INSIDE the aggregate via ``array_sort`` on a (-market_cap, ticker)
struct (SURVEY §7.3 hard part 1); the same ``ORDER BY market_cap
DESC, ticker`` is used in every oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_price_sum(col: str = "share_price") -> Column:
    """Order-independent sum of 2-decimal prices.

    Doubles summed in shuffle order are not reproducible; casting to
    DECIMAL(18,2) first makes the sum exact and therefore identical
    on any engine and any partitioning. Returns DOUBLE.
    """
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


def index_value(k: int, price_col: str = "share_price") -> Column:
    """A1: equal-weight index value = sum(top-k prices) / K.

    The reference divides by the constant K even when fewer than K
    constituents exist (src/index/equal_weight_index.py:46-47).
    """
    return (exact_price_sum(price_col) / F.lit(float(k))).alias("index_value")


def ordered_composition(
    cap_col: str = "market_cap", ticker_col: str = "ticker"
) -> Column:
    """A2: CSV of tickers in descending market-cap order, ticker-asc
    tiebreak (reference src/index/equal_weight_index.py:48 — Python
    sort stability made explicit here)."""
    sorted_structs = F.array_sort(
        F.collect_list(F.struct((-F.col(cap_col)).alias("negcap"), F.col(ticker_col).alias("t")))
    )
    return F.array_join(
        F.transform(sorted_structs, lambda s: s.getField("t")), ","
    ).alias("composition")


def composition_array(
    cap_col: str = "market_cap", ticker_col: str = "ticker"
) -> Column:
    """A2 (array form): same ordering, as array<string>."""
    sorted_structs = F.array_sort(
        F.collect_list(F.struct((-F.col(cap_col)).alias("negcap"), F.col(ticker_col).alias("t")))
    )
    return F.transform(sorted_structs, lambda s: s.getField("t")).alias(
        "composition_arr"
    )
