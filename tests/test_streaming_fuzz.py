"""Streaming semantics on EDGE-CASE data: the stream==batch
equivalence tests in test_streaming.py replay the driver's
well-behaved events table, which has no NULL values, no NULL or
malformed JSON props, and no timestamp ties. The fuzz events table
(tools/fuzz_parity.gen_dataset) has all of those — 20 events on the
SAME microsecond, ~8% NULL `value`, NULL/`not json {`/empty props —
so this module closes the same gap for the streaming layer that
test_fuzz_parity.py closes for the batch registry: batch == oracle
(fuzz gate), stream == batch (here) => stream == oracle on edge
data too.

The replay is MULTI-batch on purpose: the events are split into
three ts-sorted files and fed one file per trigger, so the
same-microsecond tie run and the NULL-value sums must merge
correctly across micro-batch state, not just within one batch.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from marketviz_spark.registry import QUERIES
from marketviz_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_counts,
    tumbling_counts,
)
from tools.fuzz_parity import gen_dataset


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture(scope="module")
def fuzz_dirs(tmp_path_factory):
    """(full fuzz dataset dir, events-only stream dir with the
    events split into 3 ts-sorted files -> 3 micro-batches)."""
    root = tmp_path_factory.mktemp("fuzz_stream")
    data = str(root / "seed1")
    gen_dataset(1, data)
    stream_dir = str(root / "events_split")
    os.makedirs(stream_dir)
    t = pq.read_table(os.path.join(data, "events.parquet"))
    # already ts-sorted by construction; split into thirds so the
    # tie run (rows 50-69, one microsecond) may straddle a boundary
    n = t.num_rows
    for i, (lo, hi) in enumerate(
        ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n))
    ):
        pq.write_table(
            t.slice(lo, hi - lo),
            os.path.join(stream_dir, f"part-{i}.parquet"),
        )
    return data, stream_dir


def test_tumbling_stream_equals_batch_on_fuzz(spark, fuzz_dirs):
    data, stream_dir = fuzz_dirs
    stream = read_events_stream(spark, stream_dir)
    run_to_memory(tumbling_counts(stream), "fz_tumbling", "complete")
    got = _rows(spark.sql("SELECT * FROM fz_tumbling"))
    want = _rows(QUERIES["events_tumbling_1h"].fn(spark, data))
    assert got == want


def test_session_stream_equals_batch_on_fuzz(spark, fuzz_dirs):
    """Sessions around the same-microsecond run must merge across
    the micro-batch boundary exactly as the batch twin merges them."""
    data, stream_dir = fuzz_dirs
    stream = read_events_stream(spark, stream_dir)
    run_to_memory(session_counts(stream), "fz_session", "complete")
    got = _rows(spark.sql("SELECT * FROM fz_session"))
    want = _rows(QUERIES["events_session_10m"].fn(spark, data))
    assert got == want


def test_stream_stream_join_equals_batch_on_fuzz(spark, fuzz_dirs):
    """Stream-stream interval join over the NULL-laced, tie-heavy
    events: the streaming range join and the batch bucketed join
    are different FORMULATIONS of the same semantics, so the
    same-microsecond run (click_ts == error_ts pairs must be
    excluded by the strict < on both paths) is exactly where they
    could disagree."""
    from marketviz_spark.streaming.joins import (
        click_error_pairs_batch,
        click_error_pairs_stream,
    )
    from marketviz_spark import tables

    data, stream_dir = fuzz_dirs
    stream = read_events_stream(spark, stream_dir)
    run_to_memory(
        click_error_pairs_stream(stream), "fz_ss_join", "append"
    )
    got = _rows(spark.sql("SELECT * FROM fz_ss_join"))
    want = _rows(click_error_pairs_batch(tables.load_events(spark, data)))
    assert got == want


def test_stateful_totals_equal_batch_on_fuzz(spark, fuzz_dirs):
    """Running per-user totals over THREE micro-batches of NULL-laced
    events: the final emitted row per user must equal the batch
    F.count/F.sum aggregate — including user 7, whose values are ALL
    NULL, where sum must be NULL (a pandas all-NaN .sum() is 0.0;
    the operator tracks the non-null count to preserve NULL-ness).
    Sums are compared at 6dp: the stream adds in micro-batch order,
    the batch in partition order, and double addition is not
    associative."""
    from pyspark.sql import functions as F

    from marketviz_spark import tables
    from marketviz_spark.streaming.stateful import running_user_totals

    data, stream_dir = fuzz_dirs
    stream = read_events_stream(spark, stream_dir)
    run_to_memory(running_user_totals(stream), "fz_stateful", "update")
    rnd6 = lambda v: None if v is None else round(v, 6)  # noqa: E731
    # update mode emits once per touched micro-batch; keep the LAST
    # (highest batches) emission per user
    last = {}
    for r in spark.sql("SELECT * FROM fz_stateful").collect():
        if r["user_id"] not in last or r["batches"] > last[r["user_id"]][0]:
            last[r["user_id"]] = (
                r["batches"],
                r["n_events"],
                rnd6(r["value_sum"]),
            )
    got = {u: v[1:] for u, v in last.items()}
    want = {
        r["user_id"]: (r["n"], rnd6(r["s"]))
        for r in tables.load_events(spark, data)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
    assert want[7][1] is None, "fixture must include an all-NULL user"
