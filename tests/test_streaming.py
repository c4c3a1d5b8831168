"""Streaming semantics: bounded replay through Structured Streaming
must agree with the batch operators (which are DuckDB-oracle-checked
in test_oracle_parity). This closes the loop: batch == oracle,
stream == batch => stream == oracle."""

from __future__ import annotations

import os
import tempfile

import pytest

from marketviz_spark.registry import QUERIES
from marketviz_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
    session_counts,
)
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture(scope="module")
def events_dir():
    """File-source needs a directory; symlink the testdata file in."""
    with tempfile.TemporaryDirectory() as d:
        os.symlink(
            f"{SF_SMALL}/events.parquet", os.path.join(d, "events.parquet")
        )
        yield d


def test_tumbling_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(tumbling_counts(stream), "t_tumbling", "complete")
    got = _rows(spark.sql("SELECT * FROM t_tumbling"))
    want = _rows(QUERIES["events_tumbling_1h"].fn(spark, SF_SMALL))
    assert got == want


def test_session_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(session_counts(stream), "t_session", "complete")
    got = _rows(spark.sql("SELECT * FROM t_session"))
    want = _rows(QUERIES["events_session_10m"].fn(spark, SF_SMALL))
    assert got == want


def test_watermark_drops_late_rows(spark, events_dir):
    """With a tiny watermark and per-file triggers, the aggregate
    state still produces complete-mode results for all windows seen;
    append-mode only emits closed windows. Assert append emits a
    subset of complete."""
    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        tumbling_counts(stream, watermark="1 minute"), "t_append", "append"
    )
    appended = spark.sql("SELECT count(*) AS n FROM t_append").collect()[0].n
    complete = (
        QUERIES["events_tumbling_1h"].fn(spark, SF_SMALL).count()
    )
    assert appended <= complete


def test_stateful_running_totals_equals_batch(spark, events_dir):
    """Custom stateful operator: after a bounded replay, the LAST
    emitted row per user equals the batch aggregate."""
    from pyspark.sql import functions as F

    from marketviz_spark.streaming.stateful import running_user_totals
    from marketviz_spark import tables

    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        running_user_totals(stream), "t_stateful", "update"
    )
    # update mode re-emits per batch; with one input file there is
    # exactly one batch -> one row per user
    got = {
        r["user_id"]: (r["n_events"], round(r["value_sum"], 6))
        for r in spark.sql("SELECT * FROM t_stateful").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in tables.load_events(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_sliding_stream_equals_batch(spark, events_dir):
    from pyspark.sql import functions as F

    from marketviz_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, events_dir)
    slid = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
    )
    run_to_memory(slid, "t_sliding", "complete")
    got = _rows(spark.sql("SELECT * FROM t_sliding"))
    want = _rows(
        QUERIES["events_sliding_1h_30m"]
        .fn(spark, SF_SMALL)
        .select("window_start", "n_events")
    )
    assert got == want


def test_foreachbatch_partitioned_sink(spark, events_dir):
    """foreachBatch + partition overwrite: the streamed tumbling
    aggregate lands in a parquet table equal to the batch result."""
    import tempfile

    from marketviz_spark.streaming.windows import (
        stream_to_partitioned_table,
        tumbling_counts,
    )

    with tempfile.TemporaryDirectory() as d:
        stream = read_events_stream(spark, events_dir)
        agg = tumbling_counts(stream)
        q = stream_to_partitioned_table(
            agg,
            os.path.join(d, "table"),
            os.path.join(d, "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = _rows(
            spark.read.parquet(os.path.join(d, "table")).select(
                "window_start", "event_type", "n_events", "sum_value"
            )
        )
        want = _rows(QUERIES["events_tumbling_1h"].fn(spark, SF_SMALL))
        assert got == want
