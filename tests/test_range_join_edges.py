"""Golden edge cases for the cells+boundaries range-count
decomposition (events_range_join): window-endpoint alignments are
where a cell/boundary split can double- or zero-count, and random
parity data hits them only by luck."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from marketviz_spark.registry import QUERIES


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, ts, 1, et, 1.0, "{}")
            for i, (ts, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


def test_range_count_window_endpoint_alignment(spark, tmp_path):
    """One error at an exact second boundary; clicks at a-gap
    (inclusive), a-gap-1us (out), a-1us (in), a (exclusive), and
    mid-window — count must be exactly 3."""
    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    gap = dt.timedelta(minutes=5)
    us = dt.timedelta(microseconds=1)
    rows = [
        (base, "error"),
        (base - gap, "click"),          # >= a-gap: IN
        (base - gap - us, "click"),     # out (before window)
        (base - us, "click"),           # < a: IN
        (base, "click"),                # == a: OUT (exclusive)
        (base - dt.timedelta(seconds=150), "click"),  # mid: IN
        (base + us, "click"),           # after: OUT
    ]
    ev = _events(spark, rows)
    out = str(tmp_path / "events.parquet")
    ev.write.parquet(out)
    got = {
        r["event_id"]: r["n_clicks_5m_before"]
        for r in QUERIES["events_range_join"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {0: 3}


def test_range_count_unaligned_error_and_no_clicks(spark, tmp_path):
    """An error at an unaligned microsecond offset still counts its
    boundary-second clicks exactly; an error with no clicks at all
    keeps its zero row (left semantics)."""
    a = dt.datetime(2024, 1, 10, 12, 0, 0, 123456)
    gap = dt.timedelta(minutes=5)
    rows = [
        (a, "error"),
        # same second as a-gap, one microsecond inside the window
        (a - gap + dt.timedelta(microseconds=1), "click"),
        # same second as a-gap, one microsecond outside
        (a - gap - dt.timedelta(microseconds=1), "click"),
        # same second as a, just below a
        (a - dt.timedelta(microseconds=1), "click"),
        # lonely error far away: no clicks within an hour
        (a + dt.timedelta(hours=2), "error"),
    ]
    ev = _events(spark, rows)
    ev.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: r["n_clicks_5m_before"]
        for r in QUERIES["events_range_join"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {0: 2, 4: 0}


def test_click_error_pairs_bucket_edges(spark, tmp_path):
    """The bucketed attribution join must emit each qualifying pair
    exactly once even when click and error fall in different 5-min
    buckets, and must drop the inclusive-lower / exclusive-upper
    endpoints correctly."""
    from marketviz_spark.streaming.joins import (
        click_error_pairs_batch,
    )

    a = dt.datetime(2024, 1, 10, 12, 2, 30)
    gap = dt.timedelta(minutes=5)
    rows = [
        (a, "error"),                               # id 0
        (a - gap, "click"),                         # id 1: IN (>=)
        (a - gap - dt.timedelta(microseconds=1), "click"),  # id 2
        (a - dt.timedelta(minutes=4), "click"),     # id 3: IN,
        # lands in the PREVIOUS 5-min bucket of the error
        (a, "click"),                               # id 4: OUT (==a)
    ]
    ev = _events(spark, rows)
    got = sorted(
        (r["error_id"], r["click_id"])
        for r in click_error_pairs_batch(ev).collect()
    )
    assert got == [(0, 1), (0, 3)]
    # exactly once each — no bucket-explode duplicates
    assert len(got) == len(set(got))
