"""End-to-end pipeline test: synthetic source -> partitioned parquet
tables -> index -> analytics, plus upsert idempotence on disk."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from marketviz_spark.app import run_pipeline
from marketviz_spark.pipelines.ingest import (
    SyntheticHistorySource,
    UniverseSource,
)
from marketviz_spark.pipelines.upsert import upsert_by_date_partition


def test_pipeline_end_to_end(spark):
    universe = UniverseSource(["AAA", "BB/B", "CCC", "DDD", "BAD!"])
    with tempfile.TemporaryDirectory() as d:
        out = run_pipeline(
            spark,
            universe,
            SyntheticHistorySource(days=4),
            data_dir=os.path.join(d, "data"),
            k=3,
            export_dir=os.path.join(d, "exports"),
        )
        # '/' normalized to '-' (S1); failed ticker routed to errors
        tickers = {
            r["ticker"]
            for r in out["stocks"].select("ticker").distinct().collect()
        }
        assert "BB-B" in tickers and "BAD!" not in tickers
        assert out["errors"].count() == 1
        # one index row per day, composition has <= k entries
        idx = out["index_data"].collect()
        assert len(idx) == 4
        assert all(
            len(r["composition"].split(",")) <= 3 for r in idx
        )
        # analytics columns materialize
        a = out["analytics"].orderBy("date").collect()
        assert a[0]["daily_return"] is None
        assert a[1]["daily_return"] is not None
        # exports produced something
        assert os.listdir(os.path.join(d, "exports"))


def test_partition_upsert_idempotent_and_partial(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        base = spark.createDataFrame(
            [("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0)],
            "ticker string, date string, v double",
        )
        upsert_by_date_partition(spark, base, path)
        # overwrite only day 2; day 1 untouched
        patch = spark.createDataFrame(
            [("A", "2024-01-02", 20.0)],
            "ticker string, date string, v double",
        )
        upsert_by_date_partition(spark, patch, path)
        upsert_by_date_partition(spark, patch, path)  # idempotent
        got = {
            r["date"]: r["v"]
            for r in spark.read.parquet(path).collect()
        }
        assert got == {"2024-01-01": 1.0, "2024-01-02": 20.0}


def test_upsert_merge_unpartitioned(spark):
    import tempfile

    from marketviz_spark.pipelines.upsert import upsert_merge

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        base = spark.createDataFrame(
            [("A", "d1", 1.0), ("B", "d1", 2.0)],
            "ticker string, date string, v double",
        )
        upsert_merge(spark, base, path, ["ticker", "date"])
        patch = spark.createDataFrame(
            [("B", "d1", 20.0), ("C", "d1", 3.0)],
            "ticker string, date string, v double",
        )
        upsert_merge(spark, patch, path, ["ticker", "date"])
        got = {
            (r["ticker"], r["date"]): r["v"]
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            ("A", "d1"): 1.0,
            ("B", "d1"): 20.0,
            ("C", "d1"): 3.0,
        }


def test_upsert_keyed_backends_idempotent(spark):
    """J2 idempotence parametrized over the upsert backends (SURVEY
    §1.2 'Delta MERGE if available'): whichever backend `auto`
    dispatches to, plus the explicit antijoin path, must give the
    same INSERT-OR-REPLACE table state, and re-running the same
    batch must change nothing. The delta backend exercises a real
    MERGE when delta-spark is installed and is skipped (not faked)
    when it isn't."""
    import pytest
    import tempfile

    from marketviz_spark.pipelines.upsert import (
        delta_available,
        upsert_keyed,
    )

    backends = ["antijoin", "auto"]
    if delta_available(spark):
        backends.append("delta")
    else:
        with pytest.raises(ImportError):
            import delta  # noqa: F401  — probe matches reality
    base = spark.createDataFrame(
        [("A", "d1", 1.0), ("B", "d1", 2.0)],
        "ticker string, date string, v double",
    )
    patch = spark.createDataFrame(
        [("B", "d1", 20.0), ("C", "d1", 3.0)],
        "ticker string, date string, v double",
    )
    want = {("A", "d1"): 1.0, ("B", "d1"): 20.0, ("C", "d1"): 3.0}
    for backend in backends:
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t")
            used = upsert_keyed(spark, base, path, ["ticker", "date"], backend)
            assert used in ("antijoin", "delta")
            upsert_keyed(spark, patch, path, ["ticker", "date"], backend)
            # idempotent: same batch again -> same state
            used2 = upsert_keyed(
                spark, patch, path, ["ticker", "date"], backend
            )
            assert used2 == used
            reader = (
                spark.read.format("delta")
                if used == "delta"
                else spark.read
            )
            got = {
                (r["ticker"], r["date"]): r["v"]
                for r in reader.load(path).collect()
            } if used == "delta" else {
                (r["ticker"], r["date"]): r["v"]
                for r in spark.read.parquet(path).collect()
            }
            assert got == want, backend


def test_dashboard_data_facade(spark):
    from marketviz_spark import tables
    from marketviz_spark.pipelines.dashboard_data import DashboardData

    sf = "/root/testdata/sf0.001"
    dd = DashboardData(
        tables.index_data(spark, sf), tables.stocks(spark, sf)
    )
    try:
        stats = dd.headline_stats().collect()
        assert len(stats) == 1 and stats[0]["current_value"] > 0
        m = dd.metrics().collect()[0]
        assert m["constituent_count"] >= 1
        pie = dd.market_cap_pie(top_n=2).collect()
        # with k=10 constituents and top_n=2, the rest folds to OTHERS
        assert any(r["name"] == "OTHERS" for r in pie) or len(pie) <= 2
        assert all(r["market_cap_billions"] is not None for r in pie)
        comp = dd.composition_at("1997-03-18").collect()[0]
        assert comp["matched_date"] is not None
        assert dd.change_dates().count() > 0
        assert dd.summary_30().count() == 30
    finally:
        dd.unpersist()


def test_dashboard_facade_golden_all_accessors(spark):
    """All eight DashboardData accessors on one FIXTURES.md-style
    synthetic (K=3, a weekend gap, a reorder-only date, two real
    composition changes, a stale stocks row), every output asserted
    against hand-computed golden values — the end-to-end read-path
    contract in ONE test (reference dashboard.py:266-408)."""
    import pytest

    from marketviz_spark.pipelines.dashboard_data import DashboardData

    index_df = spark.createDataFrame(
        [
            ("2024-01-01", 10.0, "A,B,C"),
            ("2024-01-02", 11.0, "A,B,C"),
            ("2024-01-03", 12.1, "A,B,D"),   # +D , -C
            ("2024-01-05", 11.0, "B,A,D"),   # reorder only: no change
            ("2024-01-08", 12.0, "B,D,E"),   # +E , -A
        ],
        "date string, index_value double, composition string",
    )
    stocks_df = spark.createDataFrame(
        [
            ("B", "2024-01-08", 20.0, 2.0e9),
            ("B", "2024-01-05", 990.0, 99.0e9),  # stale: must lose
            ("D", "2024-01-08", 15.0, 1.5e9),
            ("E", "2024-01-08", 5.0, 0.5e9),
            ("A", "2024-01-08", 90.0, 9.0e9),    # not in latest comp
            ("C", "2024-01-03", 10.0, 1.0e9),    # not in latest comp
        ],
        "ticker string, date string, share_price double,"
        " market_cap double",
    )
    dd = DashboardData(index_df, stocks_df)
    try:
        # 1. headline_stats (W7)
        s = dd.headline_stats().collect()
        assert len(s) == 1
        assert s[0]["latest_date"] == "2024-01-08"
        assert s[0]["current_value"] == 12.0
        assert s[0]["daily_change"] == 1.0
        assert s[0]["daily_change_pct"] == pytest.approx(100.0 / 11.0)

        # 2. metrics (A4+A5): 3 constituents, 2 change dates (the
        # first row and the reorder-only date are NOT changes)
        m = dd.metrics().collect()
        assert len(m) == 1
        assert m[0]["constituent_count"] == 3
        assert m[0]["change_date_count"] == 2

        # 3. performance (W3-W6) keyed by date
        p = {r["date"]: r for r in dd.performance().collect()}
        assert p["2024-01-01"]["daily_return"] is None
        assert p["2024-01-02"]["daily_return"] == pytest.approx(10.0)
        assert p["2024-01-03"]["daily_return"] == pytest.approx(
            (12.1 - 11.0) / 11.0 * 100.0
        )
        assert p["2024-01-05"]["cumulative_return"] == pytest.approx(10.0)
        assert p["2024-01-08"]["cumulative_return"] == pytest.approx(20.0)
        assert p["2024-01-03"]["change_label"] == "+(D) , -(C)"
        assert p["2024-01-05"]["change_label"] == "-"
        assert p["2024-01-08"]["change_label"] == "+(E) , -(A)"

        # 4. market_cap_pie (J1+A3+O6): latest comp is B,D,E; top 2
        # by composition position stay named, E folds to OTHERS; B's
        # stale 99e9 row must lose to its latest 2e9 row; A and C are
        # not in the latest composition at all
        pie = {
            r["name"]: r["market_cap_billions"]
            for r in dd.market_cap_pie(top_n=2).collect()
        }
        assert pie == {"B": 2.0, "D": 1.5, "OTHERS": 0.5}

        # 5. composition_at (J3 walk-back): exact date, a 2-day
        # walk-back across the weekend gap, and a >5-day miss
        exact = dd.composition_at("2024-01-05").collect()[0]
        assert exact["matched_date"] == "2024-01-05"
        assert exact["composition"] == "B,A,D"
        back = dd.composition_at("2024-01-07").collect()[0]
        assert back["matched_date"] == "2024-01-05"
        assert back["index_value"] == 11.0
        miss = dd.composition_at("2024-01-20").collect()[0]
        assert miss["matched_date"] is None
        assert miss["index_value"] is None

        # 6. change_dates (W5+O4): newest first, labels exact
        cd = [
            (r["date"], r["change_label"])
            for r in dd.change_dates().collect()
        ]
        assert cd == [
            ("2024-01-08", "+(E) , -(A)"),
            ("2024-01-03", "+(D) , -(C)"),
        ]

        # 7. summary_30 (O5+O4+W6): all 5 rows, newest first
        t = dd.summary_30().collect()
        assert [r["date"] for r in t] == [
            "2024-01-08",
            "2024-01-05",
            "2024-01-03",
            "2024-01-02",
            "2024-01-01",
        ]
        assert t[0]["index_value"] == 12.0
        assert t[0]["change_label"] == "+(E) , -(A)"
        assert t[-1]["daily_return"] is None
        assert t[-1]["cumulative_return"] == 0.0
    finally:
        # 8. unpersist: the cached index frame releases cleanly
        dd.unpersist()
        assert not index_df.is_cached


def test_multi_format_round_trip(spark):
    import tempfile

    from marketviz_spark import schemas, tables
    from marketviz_spark.sources import read_table, write_table

    src = tables.stocks(spark, "/root/testdata/sf0.001").filter(
        "date <= '1995-01-31'"
    )
    cols = sorted(src.columns)
    want = sorted(map(str, src.select(*cols).collect()))
    schema = schemas.STOCKS
    with tempfile.TemporaryDirectory() as d:
        for fmt in ("parquet", "orc", "json", "csv"):
            path = os.path.join(d, fmt)
            write_table(src, path, fmt)
            got = read_table(spark, path, schema, fmt).select(*cols)
            # csv/json round floats through text: row-count only
            if fmt in ("csv", "json"):
                assert got.count() == src.count(), fmt
            else:
                assert sorted(map(str, got.collect())) == want, fmt


def test_jdbc_contract_shape(spark):
    """No JDBC driver in this environment: the call must fail at
    CONNECTION time (driver class), not in our option plumbing."""
    import pytest

    from marketviz_spark.sources import read_jdbc

    with pytest.raises(Exception) as e:
        read_jdbc(
            spark,
            "jdbc:postgresql://localhost:5432/x",
            "t",
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
        ).count()
    assert "driver" in str(e.value).lower() or "No suitable" in str(
        e.value
    )


def _yf_history(dates, closes, splits):
    """A canned yfinance-shaped frame: tz-aware DatetimeIndex named
    Date, extra OHLC columns the shaper must ignore."""
    import pandas as pd

    idx = pd.DatetimeIndex(
        pd.to_datetime(dates).tz_localize("America/New_York"), name="Date"
    )
    return pd.DataFrame(
        {
            "Open": [c - 1 for c in closes],
            "High": [c + 1 for c in closes],
            "Low": [c - 2 for c in closes],
            "Close": closes,
            "Volume": [1000] * len(closes),
            "Dividends": [0.0] * len(closes),
            "Stock Splits": splits,
        },
        index=idx,
    )


def test_yfinance_shape_canned_fixture():
    from marketviz_spark.pipelines.ingest import YFinanceHistorySource

    hist = _yf_history(
        ["2024-03-01", "2024-03-04", "2024-03-05"],
        [10.0, 20.0, 30.0],
        [0.0, 2.0, 0.0],
    )
    out = YFinanceHistorySource.shape(hist, 5000, "ZZZ")
    assert list(out["date"]) == ["2024-03-01", "2024-03-04", "2024-03-05"]
    assert list(out["close"]) == [10.0, 20.0, 30.0]
    assert list(out["stock_splits"]) == [0.0, 2.0, 0.0]
    assert set(out["shares_outstanding"]) == {5000.0}


def test_yfinance_shape_missing_shares_raises():
    import pytest as _pytest

    from marketviz_spark.pipelines.ingest import YFinanceHistorySource

    hist = _yf_history(["2024-03-01"], [10.0], [0.0])
    for bad in (None, 0):  # reference: `if not shares_outstanding`
        with _pytest.raises(ValueError, match="ZZZ"):
            YFinanceHistorySource.shape(hist, bad, "ZZZ")


def test_yfinance_shaped_source_through_ingest(spark):
    """End-to-end: a source emitting yfinance-shaped frames through
    the real shaper must reproduce the reference's reverse-cumprod
    split adjustment (stock_data_fetcher.py:64-70) when run through
    the distributed split_adjust path."""
    from marketviz_spark.pipelines.ingest import (
        HistorySource,
        UniverseSource,
        YFinanceHistorySource,
        ingest,
    )

    dates = ["2024-03-01", "2024-03-04", "2024-03-05", "2024-03-06"]
    closes = [10.0, 20.0, 30.0, 40.0]
    splits = [0.0, 2.0, 0.0, 3.0]
    shares = 6000.0

    class CannedYF(HistorySource):
        def fetch(self, ticker):
            return YFinanceHistorySource.shape(
                _yf_history(dates, closes, splits), shares, ticker
            )

    stocks, errors = ingest(
        UniverseSource(["ZZZ"]).to_df(spark), CannedYF()
    )
    assert errors.count() == 0
    got = {
        r["date"]: (r["effective_shares_outstanding"], r["market_cap"])
        for r in stocks.collect()
    }
    # reference algorithm: newest-first frame, cumprod of split
    # factors (0 -> 1) INCLUSIVE of each row's own split, effective
    # shares = shares / cumfactor, cap = close * effective
    inc = 1.0
    want = {}
    for d, c, s in reversed(list(zip(dates, closes, splits))):
        inc = inc * (s if s else 1.0)
        want[d] = (shares / inc, c * (shares / inc))
    for d in dates:
        eff, cap = got[d]
        weff, wcap = want[d]
        assert abs(eff - weff) < 1e-6, (d, eff, weff)
        assert abs(cap - wcap) < 1e-6, (d, cap, wcap)


def test_chart_specs_mirror_reference_figures(spark):
    """Chart-spec layer (reference dashboard.py:39-144): plotly
    figure dicts whose every number comes from the oracle-checked
    operator layer."""
    from marketviz_spark import tables
    from marketviz_spark.pipelines.charts import (
        index_chart_spec,
        market_cap_pie_spec,
    )
    from marketviz_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    idx = tables.index_data(spark, sf)
    spec = index_chart_spec(idx)
    line = spec["data"][0]
    assert line["mode"] == "lines" and line["line"]["color"] == "#ff0000"
    assert len(line["x"]) == len(line["y"]) == idx.count()
    assert line["x"] == sorted(line["x"])
    markers = spec["data"][1]
    assert markers["marker"]["symbol"] == "star-triangle-down"
    # marker points sit ON the line: same (date, value) pairs
    on_line = dict(zip(line["x"], line["y"]))
    assert all(on_line[d] == v for d, v in zip(markers["x"], markers["y"]))
    # marker dates == the engine's composition-change dates
    want = {
        r["date"]
        for r in QUERIES["w5_w6_composition_changes"]
        .fn(spark, sf)
        .collect()
        if r["composition_changed"]
    }
    assert set(markers["x"]) == want
    assert spec["layout"]["title"]["text"] == "MarketViz Index Performance"
    assert spec["layout"]["xaxis"]["title"]["text"] == "Date"

    # k=1 on the 2-constituent sf0.001 composition: one named slice
    # plus OTHERS, in composition-rank order
    pie = market_cap_pie_spec(idx, tables.stocks(spark, sf), k=1)
    slices = pie["data"][0]
    assert len(slices["labels"]) == len(slices["values"]) == 2
    assert slices["labels"][-1] == "OTHERS"
    from marketviz_spark.operators.joins import composition_market_caps

    want_pie = {
        r["name"]: r["market_cap_billions"]
        for r in composition_market_caps(
            idx, tables.stocks(spark, sf), 1
        ).collect()
    }
    assert dict(zip(slices["labels"], slices["values"])) == want_pie


def test_check_on_write_single_pass_matches_two_pass(spark, tmp_path):
    """The observed single-pass gate must produce the same violation
    counts as the two-pass check_table, while the write itself
    lands complete and readable."""
    from marketviz_spark.pipelines.quality import (
        accepted_range,
        check_on_write,
        check_table,
        not_null,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 99.0), (None, 1.0)],
        "id long, v double",
    )
    checks = [not_null("id"), not_null("v"), accepted_range("v", 0, 10)]
    out = str(tmp_path / "gated")
    got = check_on_write(df, out, checks)
    expect = {
        r["check"]: r["n_violations"]
        for r in check_table(df, checks=checks).collect()
    }
    assert got == expect == {
        "not_null(id)": 1,
        "not_null(v)": 1,
        "accepted_range(v,0,10)": 1,
    }
    assert spark.read.parquet(out).count() == 4


def test_datapipe_composition_end_to_end(spark):
    """Capstone: the training-data ops COMPOSE — documents are
    deduped to representatives, curated (filters + PII redaction),
    split leak-safely, and packed into training bins, with
    conservation holding at every stage boundary:
    reps ⊆ corpus (unique), curated ⊆ corpus, splits partition the
    curated set, and packing conserves every curated token."""
    from pyspark.sql import functions as F

    from marketviz_spark import tables
    from marketviz_spark.datapipe.curation import (
        curation_apply,
        pack_sequences,
        split_assign,
    )
    from marketviz_spark.datapipe.dedup import dedup_apply
    from tests.conftest import SF_SMALL

    docs = tables.load(spark, SF_SMALL, "documents")
    n_docs = docs.count()

    reps = dedup_apply(docs)
    rep_ids = [r["doc_id"] for r in reps.select("doc_id").collect()]
    assert len(rep_ids) == len(set(rep_ids)) <= n_docs

    deduped = docs.join(
        reps.select("doc_id"), "doc_id", "left_semi"
    )
    curated = curation_apply(deduped)
    cur_ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert cur_ids <= set(rep_ids)

    # splits partition the curated set
    splits = split_assign(
        docs.join(curated.select("doc_id"), "doc_id", "left_semi")
    )
    by_split = {
        r["doc_id"]: r["split"] for r in splits.collect()
    }
    assert set(by_split) == cur_ids
    assert set(by_split.values()) <= {"train", "val", "test"}

    # packing conserves every curated token exactly once
    curated_docs = docs.join(
        curated.select("doc_id"), "doc_id", "left_semi"
    )
    total_tokens = (
        curated_docs.select(
            F.size(
                F.filter(
                    F.split(F.col("text"), " "), lambda t: t != ""
                )
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    packed = pack_sequences(curated_docs)
    packed_tokens = (
        packed.agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert packed_tokens == total_tokens
