"""Golden-value unit tests for the operator layer on tiny hand-built
frames — pinning the reference semantics (split adjustment, change
detection, as-of walk-back, upsert) independent of the testdata."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_reverse_cum_split_factor(spark):
    """Hand-computed reverse cumprod (reference
    stock_data_fetcher.py:52,64-66): factors accumulate from the most
    recent date backwards."""
    from marketviz_spark.operators.windows import split_adjust

    rows = [
        # date, close, splits, shares
        ("T1", "2024-01-01", 10.0, 0.0, 1000.0),
        ("T1", "2024-01-02", 5.0, 2.0, 1000.0),  # 2:1 split on the 2nd
        ("T1", "2024-01-03", 5.5, 0.0, 1000.0),
    ]
    raw = spark.createDataFrame(
        rows, "ticker string, date string, close double, "
        "stock_splits double, shares_outstanding double"
    )
    out = {
        r["date"]: r
        for r in split_adjust(raw).collect()
    }
    # Most recent day: factor 1 -> effective = 1000
    assert out["2024-01-03"]["cum_split_factor"] == 1.0
    assert out["2024-01-03"]["effective_shares_outstanding"] == 1000.0
    # Split day itself includes its factor (cumprod includes current row)
    assert out["2024-01-02"]["cum_split_factor"] == 2.0
    assert out["2024-01-02"]["effective_shares_outstanding"] == 500.0
    # Before the split: still divided by 2
    assert out["2024-01-01"]["cum_split_factor"] == 2.0
    assert out["2024-01-01"]["market_cap"] == 10.0 * 500.0


def test_composition_changes_set_semantics(spark):
    """Reorder-only is NOT a change (dashboard.py:166-171); labels
    format as '+(A) , -(B)' (dashboard.py:180-186)."""
    from marketviz_spark.operators.windows import composition_changes

    idx = spark.createDataFrame(
        [
            ("2024-01-01", 1.0, "A,B,C"),
            ("2024-01-02", 1.0, "C,B,A"),  # reorder only
            ("2024-01-03", 1.0, "A,B,D"),  # C -> D
        ],
        "date string, index_value double, composition string",
    )
    out = {r["date"]: r for r in composition_changes(idx).collect()}
    assert out["2024-01-01"]["composition_changed"] is False
    assert out["2024-01-01"]["change_label"] == "-"
    assert out["2024-01-02"]["composition_changed"] is False
    assert out["2024-01-03"]["composition_changed"] is True
    assert out["2024-01-03"]["change_label"] == "+(D) , -(C)"


def test_asof_walkback_bounds(spark):
    """<=5-day walk-back (dashboard.py:328-343): hit within 5 days,
    NULL beyond."""
    from marketviz_spark.operators.joins import asof_walkback

    idx = spark.createDataFrame(
        [("2024-01-01", 100.0, "A,B")],
        "date string, index_value double, composition string",
    )
    spine = spark.createDataFrame(
        [("2024-01-03",), ("2024-01-09",)], "date string"
    )
    out = {r["date"]: r for r in asof_walkback(spine, idx).collect()}
    assert out["2024-01-03"]["matched_date"] == "2024-01-01"
    assert out["2024-01-03"]["index_value"] == 100.0
    assert out["2024-01-09"]["matched_date"] is None
    assert out["2024-01-09"]["index_value"] is None


def test_upsert_replaces_and_keeps(spark):
    from marketviz_spark.operators.joins import upsert

    existing = spark.createDataFrame(
        [("T1", "d1", 1.0), ("T1", "d2", 2.0)],
        "ticker string, date string, v double",
    )
    new = spark.createDataFrame(
        [("T1", "d2", 20.0), ("T2", "d1", 9.0)],
        "ticker string, date string, v double",
    )
    out = {
        (r["ticker"], r["date"]): r["v"]
        for r in upsert(existing, new, ["ticker", "date"]).collect()
    }
    assert out == {("T1", "d1"): 1.0, ("T1", "d2"): 20.0, ("T2", "d1"): 9.0}


def test_index_divides_by_constant_k(spark):
    """sum(top-K prices)/K even when fewer than K rows exist
    (equal_weight_index.py:46-47)."""
    from marketviz_spark.pipelines.index import compute_index

    stocks = spark.createDataFrame(
        [("T1", "2024-01-01", 10.0, 100.0, 1.0),
         ("T2", "2024-01-01", 30.0, 300.0, 1.0)],
        "ticker string, date string, share_price double, "
        "market_cap double, effective_shares_outstanding double",
    )
    row = compute_index(stocks, k=10).collect()[0]
    assert row["index_value"] == (10.0 + 30.0) / 10
    assert row["composition"] == "T2,T1"  # desc market cap


def test_salted_agg_matches_plain(spark):
    from marketviz_spark.operators.skew import salted_agg_sum

    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(100)]
        + [("cold", 1.0), ("cold", 2.0)],
        "k string, v double",
    )
    got = {
        r["k"]: r["sum_v"]
        for r in salted_agg_sum(df, "k", "v", n_salts=8).collect()
    }
    assert got == {"hot": sum(map(float, range(100))), "cold": 3.0}


def test_salted_join_matches_plain(spark):
    from marketviz_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", 99)], "k string, v long"
    )
    small = spark.createDataFrame(
        [("a", "A"), ("b", "B")], "k string, name string"
    )
    got = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(big, small, "k", n_salts=4).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["name"])
        for r in big.join(small, "k").collect()
    )
    assert got == want


def test_funnel_requires_strict_temporal_order(spark):
    """A purchase BEFORE the user's click must not count as step 4:
    the funnel is sequential, not set-membership. User 1 does the
    full ordered funnel (step 4); user 2 has all four event types
    but the purchase precedes the click (step 3); user 3 never
    views after signup (step 1)."""
    from marketviz_spark.registry import QUERIES
    import pyspark.sql.types as T
    import tempfile

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # user 1: full ordered funnel
        (1, s(0), 1, "signup", 0.0, None),
        (2, s(1), 1, "view", 0.0, None),
        (3, s(2), 1, "click", 0.0, None),
        (4, s(3), 1, "purchase", 0.0, None),
        # user 2: purchase BEFORE click -> furthest_step 3
        (5, s(0), 2, "signup", 0.0, None),
        (6, s(1), 2, "view", 0.0, None),
        (7, s(2), 2, "purchase", 0.0, None),
        (8, s(3), 2, "click", 0.0, None),
        # user 3: view precedes signup -> furthest_step 1
        (9, s(1), 3, "signup", 0.0, None),
        (10, s(0), 3, "view", 0.0, None),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/events.parquet")
        out = {
            r["user_id"]: r["furthest_step"]
            for r in QUERIES["events_funnel_conversion"].fn(spark, d).collect()
        }
    assert out == {1: 4, 2: 3, 3: 1}


def test_corr_pairs_golden(spark):
    """Three crafted series over 10 shared days: A and B move in
    lockstep (corr exactly 1.0), A and C move oppositely (corr
    -1.0), ranking puts the lockstep pair first; a 2-day series is
    dropped by the overlap floor."""
    from marketviz_spark.operators.timeseries import corr_pairs

    rows = []
    for d in range(10):
        date = f"2024-01-{d + 1:02d}"
        rows.append(("T00001", date, 10.0 + d, 1000.0, 100.0))
        rows.append(("T00002", date, 20.0 + 2 * d, 1000.0, 100.0))
        rows.append(("T00003", date, 30.0 - d, 1000.0, 100.0))
    rows += [("T00004", f"2024-01-0{d}", 5.0, 1.0, 1.0) for d in (1, 2)]
    stocks = spark.createDataFrame(
        rows,
        "ticker string, date string, share_price double,"
        " market_cap double, effective_shares_outstanding double",
    )
    out = corr_pairs(stocks, universe_max="T99999", min_overlap=8, k=10)
    got = {(r["ticker_a"], r["ticker_b"]): r for r in out.collect()}
    assert got[("T00001", "T00002")]["corr"] == 1.0
    assert got[("T00001", "T00003")]["corr"] == -1.0
    assert got[("T00002", "T00003")]["corr"] == -1.0
    assert got[("T00001", "T00002")]["rank"] == 1
    assert all(r["n_days"] == 10 for r in got.values())
    # T00004: only 2 shared days -> below the overlap floor
    assert not any("T00004" in k for pair in got for k in pair)


def test_corr_pairs_sketched_finds_lockstep_pair(spark):
    """The sketch tier must recover a lockstep pair: identical
    movement directions give identical quarter-band signatures, the
    pair becomes a candidate, and exact scoring yields corr 1.0.
    An anti-correlated series lands in a DIFFERENT bucket (inverted
    bits) and never pairs with them — the recall/efficiency trade
    the sketch makes by design."""
    from marketviz_spark.operators.timeseries import corr_pairs_sketched

    rows = []
    for d in range(30):
        date = f"2024-0{1 + d // 28}-{d % 28 + 1:02d}"
        up = 1 if d % 3 else -1  # varied but shared direction pattern
        rows.append(("T00001", date, 50.0 + up * (d % 7), 1.0, 1.0))
        rows.append(("T00002", date, 80.0 + 2 * up * (d % 7), 1.0, 1.0))
        rows.append(("T00003", date, 90.0 - up * (d % 7), 1.0, 1.0))
    stocks = spark.createDataFrame(
        rows,
        "ticker string, date string, share_price double,"
        " market_cap double, effective_shares_outstanding double",
    )
    out = corr_pairs_sketched(
        stocks, universe_max="T99999", min_overlap=3, k=10
    )
    got = {(r["ticker_a"], r["ticker_b"]): r["corr"] for r in out.collect()}
    assert got[("T00001", "T00002")] == 1.0
    assert ("T00001", "T00003") not in got  # inverted bits: no bucket


def test_rolling_range_frame_respects_calendar_gaps(spark):
    """A ticker trading on days 1, 2, then 10: the day-10 row's
    7-day RANGE window contains ONLY itself (the gap excludes the
    old rows), where a ROWS(-6,0) frame would wrongly reach back."""
    from marketviz_spark.registry import QUERIES, tables

    rows = [
        ("TGAP", "1995-01-01", 10.0, 1.0, 1.0),
        ("TGAP", "1995-01-02", 20.0, 1.0, 1.0),
        ("TGAP", "1995-01-10", 40.0, 1.0, 1.0),
    ]
    import unittest.mock as mock

    stocks = spark.createDataFrame(
        rows,
        "ticker string, date string, share_price double,"
        " market_cap double, effective_shares_outstanding double",
    )
    with mock.patch.object(tables, "stocks", return_value=stocks):
        out = {
            r["date"]: r
            for r in QUERIES["w_rolling_range_7d"].fn(spark, "ignored")
            .collect()
        }
    assert out["1995-01-01"]["n_in_window"] == 1
    assert out["1995-01-02"]["n_in_window"] == 2
    assert out["1995-01-02"]["avg_7d"] == 15.0
    assert out["1995-01-10"]["n_in_window"] == 1  # gap-aware
    assert out["1995-01-10"]["avg_7d"] == 40.0


def test_asof_prev_event_semantics(spark):
    """Generic timestamp as-of join: unbounded lookback, per-user
    isolation, NULL before the first right-side event, and the
    (ts, event_id) tie rule — a click sharing the error's exact
    timestamp counts as preceding iff its event_id is lower."""
    from marketviz_spark.operators.joins import asof_prev_event

    rows = [
        # event_id, ts, user_id, event_type, value
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:05:00", 1, "error", 0.0),   # prev=1.0
        (3, "2024-01-01 10:06:00", 1, "click", 2.0),
        (4, "2024-01-01 11:00:00", 1, "error", 0.0),   # prev=2.0 (unbounded)
        (5, "2024-01-01 09:00:00", 2, "error", 0.0),   # no click for u2
        (6, "2024-01-01 12:00:00", 3, "click", 7.0),   # same-ts tie:
        (7, "2024-01-01 12:00:00", 3, "error", 0.0),   # click id 6 < 7
        (8, "2024-01-01 13:00:00", 3, "view", 9.9),    # ignored type
        (9, "2024-01-01 14:00:00", 3, "error", 0.0),   # still prev=7.0
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, "
        "event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["left_id"]: r for r in asof_prev_event(ev).collect()
    }
    assert set(got) == {2, 4, 5, 7, 9}
    assert got[2]["prev_value"] == 1.0
    assert got[2]["gap_us"] == 300_000_000
    assert got[4]["prev_value"] == 2.0
    assert got[5]["prev_value"] is None
    assert got[5]["gap_us"] is None
    assert got[7]["prev_value"] == 7.0
    assert got[7]["gap_us"] == 0
    assert got[9]["prev_value"] == 7.0


def test_equidepth_hist_quartile_boundaries(spark):
    """percentile_disc boundaries off the cents cumsum: 8 uniform
    prices split 2/2/2/2, boundary values land in the LOWER bucket
    (b_q = smallest value with cume_dist >= q)."""
    from marketviz_spark.operators.aggregates import equidepth_hist

    rows = [(f"T{i}", f"2024-01-0{i}", i / 100.0) for i in range(1, 9)]
    df = spark.createDataFrame(
        rows, "ticker string, date string, share_price double"
    )
    got = {
        r["bucket"]: (r["n_rows"], r["min_price"], r["max_price"])
        for r in equidepth_hist(df).collect()
    }
    assert got == {
        1: (2, 0.01, 0.02),
        2: (2, 0.03, 0.04),
        3: (2, 0.05, 0.06),
        4: (2, 0.07, 0.08),
    }


def test_cents_quantile_bounds_ignore_nulls(spark):
    """NULL prices must not enter the quantile histogram: Spark
    percentile_disc and DuckDB quantile_disc both ignore NULLs, and
    NULLs sort first in the cumsum window, so counting them would
    shift every boundary down (ADVICE r6)."""
    from marketviz_spark.operators.aggregates import (
        cents_quantile_bounds,
    )

    vals = [10, 20, 30, 40, 50, 60, 70, 80]
    with_nulls = spark.createDataFrame(
        [(v,) for v in vals] + [(None,)] * 5, "c long"
    )
    clean = spark.createDataFrame([(v,) for v in vals], "c long")
    thresholds = {"q25": (1, 4), "q50": (1, 2), "q75": (3, 4)}
    got = cents_quantile_bounds(with_nulls, "c", thresholds).first()
    want = cents_quantile_bounds(clean, "c", thresholds).first()
    assert (got["q25"], got["q50"], got["q75"]) == (
        want["q25"],
        want["q50"],
        want["q75"],
    ) == (20, 40, 60)
    # grouped form: the NULL-carrying group matches its clean twin,
    # and the engine value equals Spark's own percentile_disc
    grouped = spark.createDataFrame(
        [("a", v) for v in vals]
        + [("a", None)] * 3
        + [("b", 5), ("b", None), ("b", 15)],
        "g string, c long",
    )
    med = {
        r["g"]: r["m"]
        for r in cents_quantile_bounds(
            grouped, "c", {"m": (1, 2)}, group_cols=["g"]
        ).collect()
    }
    ref = {
        r["g"]: r["m"]
        for r in grouped.groupBy("g")
        .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)").alias("m"))
        .collect()
    }
    assert med == ref == {"a": 40, "b": 5}


def test_table_diff_classifies_all_outcomes(spark):
    """Snapshot diff: added/removed/changed/unchanged each hit, with
    null-safe compare (NULL == NULL is unchanged; NULL vs value is
    changed)."""
    from marketviz_spark.operators.joins import table_diff

    v1 = spark.createDataFrame(
        [
            ("A", 1.0),          # unchanged
            ("B", 2.0),          # changed (value)
            ("C", 3.0),          # removed
            ("D", None),         # unchanged (NULL == NULL)
            ("E", None),         # changed (NULL -> value)
        ],
        "k string, v double",
    )
    v2 = spark.createDataFrame(
        [
            ("A", 1.0),
            ("B", 9.0),
            ("D", None),
            ("E", 5.0),
            ("F", 6.0),          # added
        ],
        "k string, v double",
    )
    got = {
        r["k"]: r["status"]
        for r in table_diff(v1, v2, ["k"], ["v"]).collect()
    }
    assert got == {
        "A": "unchanged",
        "B": "changed",
        "C": "removed",
        "D": "unchanged",
        "E": "changed",
        "F": "added",
    }


def test_bars_gapfill_zero_fill_and_locf(spark):
    """Gap-fill: an absent middle hour appears with n_events = 0,
    gap_filled = true, and carries the previous hour's max forward;
    spines are PER KEY (a key's range doesn't leak into another's)."""
    from marketviz_spark.registry import QUERIES  # noqa: F401
    from marketviz_spark import tables  # noqa: F401

    rows = [
        (1, "2024-01-01 10:15:00", 1, "click", 5.0),
        (2, "2024-01-01 12:30:00", 1, "click", 7.0),  # 11:00 missing
        (3, "2024-01-01 11:05:00", 2, "view", 1.0),   # view: 1 hour
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long,"
        " event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.createOrReplaceTempView("_gap_ev")

    import marketviz_spark.registry as reg

    # drive the registered implementation directly on the tiny frame
    bars_fn = reg.QUERIES["events_bars_gapfill"].fn

    # monkey-free: reuse the same dataflow by calling the module fn
    # with a loader shim
    from unittest import mock

    with mock.patch.object(
        reg.tables, "load_events", lambda _s, _d: ev
    ):
        out = bars_fn(spark, "unused")
        got = {
            (r["event_type"], r["window_start"]): (
                r["n_events"],
                r["gap_filled"],
                r["locf_max_value"],
            )
            for r in out.collect()
        }
    assert got[("click", "2024-01-01 10:00:00")] == (1, False, 5.0)
    assert got[("click", "2024-01-01 11:00:00")] == (0, True, 5.0)
    assert got[("click", "2024-01-01 12:00:00")] == (1, False, 7.0)
    assert got[("view", "2024-01-01 11:00:00")] == (1, False, 1.0)
    assert len(got) == 4  # view's spine is one hour, not click's 3


def test_mad_outliers_flags_spike_not_constant(spark):
    """MAD outliers: a 100x spike in an otherwise tight series is
    flagged; the tight rows are not; a CONSTANT series (MAD = 0)
    flags any deviating row but never the median rows themselves
    (r = 0 is not > 0)."""
    from marketviz_spark.operators.aggregates import mad_outliers

    rows = (
        # tight series around 10.00 with one spike
        [("A", f"d{i}", 10.0 + (i % 3) / 100.0) for i in range(9)]
        + [("A", "d9", 1000.0)]
        # constant series with one wiggle
        + [("B", f"d{i}", 5.0) for i in range(5)]
        + [("B", "d5", 5.01)]
    )
    df = spark.createDataFrame(
        rows, "ticker string, date string, share_price double"
    )
    got = {
        (r["ticker"], r["date"]): r
        for r in mad_outliers(df).collect()
    }
    assert got[("A", "d9")]["is_outlier"]
    assert not any(
        got[("A", f"d{i}")]["is_outlier"] for i in range(9)
    )
    assert got[("B", "d5")]["is_outlier"]  # MAD 0: any wiggle flags
    assert not got[("B", "d0")]["is_outlier"]
    assert got[("A", "d0")]["median_price"] == 10.01


def test_top_paths_sessionization_gap_rule(spark):
    """Batch sessionization: a gap of exactly 10 minutes does NOT
    cut a session (strict >); 10m01s does; paths truncate to the
    first three event types in (ts, event_id) order."""
    from unittest import mock

    import marketviz_spark.registry as reg

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 10:10:00", 1, "click", 0.0),  # gap == 10m
        (3, "2024-01-01 10:20:01", 1, "error", 0.0),  # gap 10m01s
        (4, "2024-01-01 10:20:02", 1, "view", 0.0),
        (5, "2024-01-01 10:20:03", 1, "click", 0.0),
        (6, "2024-01-01 10:20:04", 1, "view", 0.0),   # 4th: dropped
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long,"
        " event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    with mock.patch.object(
        reg.tables, "load_events", lambda _s, _d: ev
    ):
        out = reg.QUERIES["events_top_paths"].fn(spark, "unused")
        got = {
            r["path"]: r["n_sessions"] for r in out.collect()
        }
    assert got == {"view>click": 1, "error>view>click": 1}


def test_drawdown_and_streak_hand_computed(spark):
    """Hand-computed drawdown and streak on one series:
    prices 10, 12, 9, 11, 12, 13, 8 ->
    max drawdown = (13-8)/13 = 384615 ppm at the last date;
    longest up streak = 3 (9->11->12->13 is 11,12,13 = 3 up days)."""
    from unittest import mock

    import marketviz_spark.registry as reg

    rows = [
        ("A", f"2024-01-0{i+1}", p)
        for i, p in enumerate([10.0, 12.0, 9.0, 11.0, 12.0, 13.0, 8.0])
    ]
    df = spark.createDataFrame(
        rows, "ticker string, date string, share_price double"
    )
    with mock.patch.object(reg.tables, "stocks", lambda _s, _d: df):
        dd = reg.QUERIES["w_max_drawdown"].fn(spark, "x").collect()
        st = (
            reg.QUERIES["w_longest_up_streak"].fn(spark, "x").collect()
        )
    assert len(dd) == 1
    assert dd[0]["max_drawdown_ppm"] == 384615  # (1300-800)*1e6//1300
    assert dd[0]["trough_date"] == "2024-01-07"
    assert len(st) == 1
    assert st[0]["longest_up_streak"] == 3
    assert st[0]["end_date"] == "2024-01-06"


def test_window_family_single_row_series(spark):
    """One ticker, one date: every window analytic must return a
    defined row (lag-null returns, zero drawdown, streak 0, 100%
    share) rather than crashing or dropping the row."""
    from unittest import mock

    import marketviz_spark.registry as reg

    df = spark.createDataFrame(
        [("A", "2024-01-01", 10.0, 1000.0, 10000.0)],
        "ticker string, date string, share_price double,"
        " effective_shares_outstanding double, market_cap double",
    )
    with mock.patch.object(reg.tables, "stocks", lambda _s, _d: df):
        dd = reg.QUERIES["w_max_drawdown"].fn(spark, "x").collect()
        assert len(dd) == 1 and dd[0]["max_drawdown_ppm"] == 0
        st = reg.QUERIES["w_longest_up_streak"].fn(
            spark, "x"
        ).collect()
        assert len(st) == 1 and st[0]["longest_up_streak"] == 0
        sh = reg.QUERIES["w_share_of_day"].fn(spark, "x").collect()
        assert len(sh) == 1 and sh[0]["cap_share"] == 1.0
        mad = reg.QUERIES["ticker_mad_outliers"].fn(
            spark, "x"
        ).collect()
        assert len(mad) == 1 and not mad[0]["is_outlier"]
        hist = reg.QUERIES["price_equidepth_hist"].fn(
            spark, "x"
        ).collect()
        assert len(hist) == 1 and hist[0]["n_rows"] == 1
        win = reg.QUERIES["price_winsorize"].fn(spark, "x").collect()
        assert len(win) == 1 and not win[0]["clamped_low"]


def test_trend_slope_closed_form_bitequal_to_grouped_map(spark):
    """The closed-form trend_slope (operators/timeseries.py) is the
    scale path for the §2.10 grouped-map showcase: same moments, same
    fixed-tree final expression — the outputs must be BIT-equal, not
    approximately equal, on every group."""
    from marketviz_spark.registry import QUERIES
    from tests.conftest import SF_SMALL

    gm = {
        r["ticker"]: r
        for r in QUERIES["w_ticker_trend_slope"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    cf = {
        r["ticker"]: r
        for r in QUERIES["w_trend_slope_closed"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(gm) == set(cf) and gm
    import struct

    for t, r in gm.items():
        assert cf[t]["n_days"] == r["n_days"], t
        assert struct.pack("<d", cf[t]["trend_slope"]) == struct.pack(
            "<d", r["trend_slope"]
        ), (t, cf[t]["trend_slope"], r["trend_slope"])


def test_trend_slope_half_cent_rounding_unified(spark):
    """A price on an EXACT half-cent (0.125 -> 12.5 cents) must round
    the same way in all three engines. The rule is half-up via
    floor(x*100 + 0.5): cents 13, not the 12 that numpy's
    half-to-even rint produced before r9. Series (0.125, 0.375,
    0.875) -> cents (13, 38, 88) -> slope 0.375 exactly; the stale
    half-even cents (12, 38, 88) would give 0.38, so this test fails
    loudly if any engine drifts back."""
    import struct
    from unittest import mock

    import marketviz_spark.registry as reg

    df = spark.createDataFrame(
        [
            ("H", "2024-01-01", 0.125),
            ("H", "2024-01-02", 0.375),
            ("H", "2024-01-03", 0.875),
        ],
        "ticker string, date string, share_price double",
    )
    with mock.patch.object(reg.tables, "stocks", lambda _s, _d: df):
        gm = reg.QUERIES["w_ticker_trend_slope"].fn(spark, "x").collect()
        cf = reg.QUERIES["w_trend_slope_closed"].fn(spark, "x").collect()
    assert len(gm) == 1 and len(cf) == 1
    want = struct.pack("<d", 0.375)
    assert struct.pack("<d", gm[0]["trend_slope"]) == want, gm
    assert struct.pack("<d", cf[0]["trend_slope"]) == want, cf
    # and the oracle's SQL rounding primitive agrees with half-up
    import duckdb

    assert (
        duckdb.sql(
            "SELECT CAST(floor(0.125 * 100 + 0.5) AS BIGINT)"
        ).fetchone()[0]
        == 13
    )
