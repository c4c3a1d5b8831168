"""Round-7 streaming 10x spot-run: replay the 1M-row adversarial
sf1 events table (hot user + burst incident, tools/gen_sf1.py)
through the Structured Streaming paths as a MULTI-micro-batch file
stream and assert stream == batch at scale, timing each query.

The suite's stream==batch tests run at sf0.001 (one micro-batch);
this replays 8 parquet splits with maxFilesPerTrigger=2 (4+ batches)
so watermark advancement, session merging ACROSS batches, and
stream-stream join state eviction all carry real state at 1M rows.
Usage: python tools/spot_sf1_stream.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketviz_spark.registry import QUERIES
from marketviz_spark.session import get_spark
from marketviz_spark.streaming.joins import click_error_pairs_stream
from marketviz_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_counts,
    tumbling_counts,
)

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".sf1data",
)
STREAM_DIR = os.path.join(SF1, "events_stream")


def _rows(df):
    return sorted(map(str, df.collect()))


def main() -> int:
    spark = get_spark("spot_sf1_stream")
    if os.path.isdir(STREAM_DIR):
        shutil.rmtree(STREAM_DIR)
    # 8 splits -> 4 micro-batches at maxFilesPerTrigger=2; splits are
    # ts-ordered-ish (repartitionByRange) so watermarks actually
    # advance batch over batch instead of arriving all-late.
    ev = spark.read.parquet(os.path.join(SF1, "events.parquet"))
    ev.repartitionByRange(8, "ts").write.parquet(STREAM_DIR)
    # FileStreamSource orders by modification time, and all splits
    # land with the SAME mtime — ties make arrival order undefined,
    # and a later-range file processed first advances the watermark
    # a month ahead, silently dropping every earlier file as late
    # (measured: ~half the sessions vanished). Stamp an mtime
    # staircase in range order so replay arrival follows event time,
    # like a real staging directory filling over time.
    parts = sorted(
        f for f in os.listdir(STREAM_DIR) if f.endswith(".parquet")
    )
    t0 = time.time() - len(parts) - 60
    for i, f in enumerate(parts):
        os.utime(os.path.join(STREAM_DIR, f), (t0 + i, t0 + i))

    failures = []
    cases = [
        (
            "tumbling_1h",
            lambda s: tumbling_counts(s),
            "complete",
            lambda: _rows(QUERIES["events_tumbling_1h"].fn(spark, SF1)),
        ),
        (
            "session_10m",
            lambda s: session_counts(s),
            "complete",
            lambda: _rows(QUERIES["events_session_10m"].fn(spark, SF1)),
        ),
        (
            "click_error_join",
            lambda s: click_error_pairs_stream(s),
            "append",
            lambda: _rows(
                QUERIES["events_click_error_pairs"].fn(spark, SF1)
            ),
        ),
    ]
    for name, build, mode, batch_fn in cases:
        t0 = time.time()
        stream = read_events_stream(
            spark, STREAM_DIR, max_files_per_trigger=2
        )
        run_to_memory(build(stream), f"t_{name}", mode)
        got = _rows(spark.sql(f"SELECT * FROM t_{name}"))
        t_stream = time.time() - t0
        t0 = time.time()
        want = batch_fn()
        t_batch = time.time() - t0
        ok = got == want
        if not ok:
            failures.append(name)
        print(
            f"{name}: stream {t_stream:.1f}s batch {t_batch:.1f}s "
            f"rows {len(got)} match={ok}",
            flush=True,
        )
    shutil.rmtree(STREAM_DIR, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
