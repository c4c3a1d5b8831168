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
