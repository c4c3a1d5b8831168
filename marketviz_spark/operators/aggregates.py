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


def cents_quantile_bounds(df, cents_col, thresholds, group_cols=None):
    """Exact percentile_disc values over a cents-valued column,
    WITHOUT a buffering percentile aggregate — the shared machinery
    behind equidepth_hist / winsorize_prices / mad_outliers.

    `thresholds` maps output alias -> (num, den) for quantile
    q = num/den: the returned value is the smallest c with
    den*cum >= num*n — an integer-exact test (no float q*n),
    identical to Spark percentile_disc and DuckDB quantile_disc.

    Dataflow: per-(group, cents) histogram (tiny — the cents domain
    is bounded), a cumsum window over the bounded domain, then one
    min-when aggregate per threshold. With `group_cols=None` the
    result is a single row (broadcast it); with groups it is one row
    per group (join it back on the group key).
    """
    from pyspark.sql import Window  # local: avoid cycle

    gb = list(group_cols or [])
    # NULL cents must not enter _n or the cumsum: percentile_disc
    # (Spark) and quantile_disc (DuckDB) both ignore NULLs, and
    # NULLs sort first in the ascending window, which would shift
    # every boundary.
    hist = (
        df.filter(F.col(cents_col).isNotNull())
        .groupBy(*gb, F.col(cents_col).alias("_c"))
        .agg(F.count("*").alias("_k"))
    )
    wcum = (
        Window.partitionBy(*gb)
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*gb)
    cum = hist.select(
        *gb,
        "_c",
        F.sum("_k").over(wcum).alias("_cum"),
        F.sum("_k").over(wall).alias("_n"),
    )
    aggs = [
        F.min(
            F.when(
                den * F.col("_cum") >= num * F.col("_n"), F.col("_c")
            )
        ).alias(alias)
        for alias, (num, den) in thresholds.items()
    ]
    return cum.groupBy(*gb).agg(*aggs)


def equidepth_hist(stocks_df, price_col: str = "share_price"):
    """Equi-depth (quartile) histogram of a price column: exact
    ``percentile_disc`` boundaries, then per-bucket count/min/max
    and an order-free exact sum.

    Boundaries come from ``cents_quantile_bounds`` (see there: the
    bounded cents-domain cumsum, never a buffering percentile
    aggregate); the bucket pass is map-only over the broadcast
    1-row bounds.
    """
    cents = F.floor(F.col(price_col) * 100 + F.lit(0.5)).cast("long")
    bounds = cents_quantile_bounds(
        stocks_df.select(cents.alias("_c")),
        "_c",
        {"_b1": (1, 4), "_b2": (1, 2), "_b3": (3, 4)},
    )
    tagged = stocks_df.withColumn("_c", cents).crossJoin(
        F.broadcast(bounds)
    )
    bucket = (
        F.lit(1)
        + (F.col("_c") > F.col("_b1")).cast("int")
        + (F.col("_c") > F.col("_b2")).cast("int")
        + (F.col("_c") > F.col("_b3")).cast("int")
    )
    return (
        tagged.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            (F.min("_c") / 100.0).alias("min_price"),
            (F.max("_c") / 100.0).alias("max_price"),
            F.sum(F.col("_c").cast("decimal(28,2)"))
            .alias("_sum_cents"),
        )
        .select(
            "bucket",
            "n_rows",
            "min_price",
            "max_price",
            (F.col("_sum_cents") / 100).cast("double").alias("sum_price"),
        )
    )


def winsorize_prices(
    stocks_df,
    price_col: str = "share_price",
    lo_pct: int = 5,
    hi_pct: int = 95,
):
    """Winsorization: clamp a price column at exact percentile_disc
    bounds (default p05/p95) and flag the clamped rows — the robust-
    statistics pre-step before any mean/stddev that outliers would
    poison. Bounds from ``cents_quantile_bounds``; the clamp is one
    map-only pass over the broadcast 1-row bounds.
    """
    cents = F.floor(F.col(price_col) * 100 + F.lit(0.5)).cast("long")
    bounds = cents_quantile_bounds(
        stocks_df.select(cents.alias("_c")),
        "_c",
        {"_lo": (lo_pct, 100), "_hi": (hi_pct, 100)},
    )
    tagged = stocks_df.withColumn("_c", cents).crossJoin(
        F.broadcast(bounds)
    )
    wc = F.least(F.greatest(F.col("_c"), F.col("_lo")), F.col("_hi"))
    return tagged.select(
        "ticker",
        "date",
        (F.col("_c") / 100.0).alias("share_price"),
        (wc / 100.0).alias("winsorized_price"),
        (F.col("_c") < F.col("_lo")).alias("clamped_low"),
        (F.col("_c") > F.col("_hi")).alias("clamped_high"),
    )


def _group_median_cents(df, group_col: str, cents_col: str):
    """Exact per-group percentile_disc(0.5): one-threshold call into
    the shared ``cents_quantile_bounds`` machinery."""
    return cents_quantile_bounds(
        df, cents_col, {"_med": (1, 2)}, group_cols=[group_col]
    )


def mad_outliers(
    stocks_df, price_col: str = "share_price", k_mad: int = 5
):
    """Robust per-ticker outlier flags: a row is an outlier when its
    absolute deviation from the ticker's exact MEDIAN exceeds
    ``k_mad`` x the ticker's MAD (median absolute deviation) — the
    estimator a fat-tailed price series needs where mean/stddev
    would be dragged by the very outliers being hunted.

    Both medians are exact per-group percentile_disc values computed
    from bounded cents-domain histograms (see _group_median_cents) —
    never a buffering percentile aggregate — so the whole op is two
    histogram aggregate+window passes over tiny per-group domains
    plus two uniform ticker-keyed joins. All comparisons are integer
    cents; zero float boundaries.
    """
    cents = F.floor(F.col(price_col) * 100 + F.lit(0.5)).cast("long")
    base = stocks_df.select(
        "ticker", "date", cents.alias("_c")
    )
    med = _group_median_cents(base, "ticker", "_c")
    with_med = base.join(med, "ticker")
    resid = with_med.withColumn(
        "_r", F.abs(F.col("_c") - F.col("_med"))
    )
    mad = (
        _group_median_cents(
            resid.select("ticker", F.col("_r").alias("_c")),
            "ticker",
            "_c",
        )
    ).select("ticker", F.col("_med").alias("_mad"))
    return (
        resid.join(mad, "ticker")
        .select(
            "ticker",
            "date",
            (F.col("_c") / 100.0).alias("share_price"),
            (F.col("_med") / 100.0).alias("median_price"),
            (F.col("_mad") / 100.0).alias("mad_price"),
            (F.col("_r") > k_mad * F.col("_mad")).alias("is_outlier"),
        )
    )
