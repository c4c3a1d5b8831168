"""Window / analytic operators (SURVEY §2.5, W1-W9).

These are the semantic heart of the reference — per-ticker and
whole-index ordered-by-date computations, all expressed as native
Spark window functions so they stay inside whole-stage codegen.

Scale notes: every window here partitions by a high-cardinality key
(ticker or date), so the shuffle distributes evenly across executors.
The one intentionally-global window (`orderBy(date)` on the index
series) operates on the *index* table — one row per day, thousands of
rows at 100 TB of input — so a single-partition window is correct and
cheap there, never on the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """W9/W8: top-k rows per group via row_number.

    Replaces the reference's per-date Python ``sorted(...)[:K]``
    (src/index/equal_weight_index.py:43-44) and its N+1 per-ticker
    ``ORDER BY date DESC LIMIT 1`` loops
    (src/visualization/dashboard.py:98-115).

    Spark ≥3.3 rewrites rank-filters with WindowGroupLimit, pushing
    the top-k below the shuffle (partial top-k per map task), so this
    scales to arbitrarily many groups.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def latest_per_group(
    df: DataFrame, group_col: str, date_col: str = "date"
) -> DataFrame:
    """W8: latest row per group (classic top-1-per-group)."""
    return topk_per_group(
        df, group_col, [F.col(date_col).desc()], 1
    ).drop("rn")


def reverse_cum_split_factor(
    raw: DataFrame,
    ticker_col: str = "ticker",
    date_col: str = "date",
    splits_col: str = "stock_splits",
) -> DataFrame:
    """W1: reverse-chronological cumulative split factor.

    The reference reverses each ticker's history and takes a pandas
    ``cumprod`` of the split column with 0 repaired to 1
    (src/data/stock_data_fetcher.py:52,64-66): the factor at row r is
    the product of all split ratios from the most recent day down to
    and including r.

    Implemented without ``product()`` (not portable to every SQL
    oracle) as exact integer exponent arithmetic — split ratios are
    small integers, so
    ``factor = 2^count(splits==2 so far) * 3^count(splits==3 so far)``
    over the descending-date window is bit-exact in doubles and
    deterministic on every engine.
    """
    w = (
        Window.partitionBy(ticker_col)
        .orderBy(F.col(date_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    twos = F.count(F.when(F.col(splits_col) == 2.0, 1)).over(w)
    threes = F.count(F.when(F.col(splits_col) == 3.0, 1)).over(w)
    return raw.withColumn(
        "cum_split_factor", F.pow(F.lit(2.0), twos) * F.pow(F.lit(3.0), threes)
    )


def split_adjust(raw: DataFrame) -> DataFrame:
    """W1+W2: full split adjustment producing the stocks schema.

    effective_shares = shares_outstanding / cum_factor;
    market_cap = close * effective_shares
    (reference src/data/stock_data_fetcher.py:64-69).
    """
    adj = reverse_cum_split_factor(raw)
    return adj.select(
        "ticker",
        "date",
        F.col("close").alias("share_price"),
        "cum_split_factor",
        (F.col("shares_outstanding") / F.col("cum_split_factor")).alias(
            "effective_shares_outstanding"
        ),
        (
            F.col("close")
            * (F.col("shares_outstanding") / F.col("cum_split_factor"))
        ).alias("market_cap"),
    )


def daily_and_cumulative_returns(
    index_df: DataFrame,
    value_col: str = "index_value",
    date_col: str = "date",
) -> DataFrame:
    """W3+W4: daily return (lag) and cumulative return (vs first row).

    Reference: pandas ``shift(1)`` / ``iloc[0]`` arithmetic at
    src/visualization/dashboard.py:193-201. First row's daily return
    is NULL (pandas NaN).

    The window is global-by-design: it runs on the index series (one
    row per day), not the fact table.
    """
    w = Window.orderBy(date_col)
    prev = F.lag(value_col, 1).over(w)
    first = F.first(value_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col)
    return index_df.withColumn(
        "daily_return", (v - prev) / prev * 100.0
    ).withColumn("cumulative_return", (v - first) / first * 100.0)


def composition_changes(index_df: DataFrame) -> DataFrame:
    """W5+W6: composition change detection + added/removed labels.

    W5 uses SET comparison (reorder-only is NOT a change; reference
    src/visualization/dashboard.py:158-172). W6 labels each change as
    ``+(A, B) , -(C)`` against the previous date, ``-`` when
    unchanged (src/visualization/dashboard.py:174-190).
    """
    w = Window.orderBy("date")
    cur = F.split(F.col("composition"), ",")
    prev = F.lag(F.split(F.col("composition"), ","), 1).over(w)
    added = F.array_except(cur, prev)
    removed = F.array_except(prev, cur)
    changed = F.when(prev.isNull(), F.lit(False)).otherwise(
        (F.size(added) + F.size(removed)) > 0
    )
    label = F.when(~changed, F.lit("-")).otherwise(
        F.format_string(
            "+(%s) , -(%s)",
            F.array_join(added, ", "),
            F.array_join(removed, ", "),
        )
    )
    return (
        index_df.withColumn("composition_changed", changed)
        .withColumn("added", F.when(changed, added))
        .withColumn("removed", F.when(changed, removed))
        .withColumn("change_label", label)
    )


def latest_stats(
    index_df: DataFrame,
    value_col: str = "index_value",
    date_col: str = "date",
) -> DataFrame:
    """W7: latest value, absolute and percent change vs previous row.

    Reference: ``iloc[-1]`` / ``iloc[-2]`` at
    src/visualization/dashboard.py:146-156. Returns a single row.
    """
    w = Window.orderBy(F.col(date_col).desc())
    v = F.col(value_col)
    # The lag/lead must be computed BEFORE the rn filter: a window
    # evaluated after the filter would only see the surviving row.
    with_prev = index_df.select(
        F.col(date_col),
        v.alias("_v"),
        F.lead(value_col, 1).over(w).alias("_prev"),
        F.row_number().over(w).alias("_rn"),
    ).filter(F.col("_rn") == 1)
    return with_prev.select(
        F.col(date_col).alias("latest_date"),
        F.col("_v").alias("current_value"),
        (F.col("_v") - F.col("_prev")).alias("daily_change"),
        ((F.col("_v") - F.col("_prev")) / F.col("_prev") * 100.0).alias(
            "daily_change_pct"
        ),
    )
