"""Structured Streaming variants of the event-window operators.

The reference has no streaming (its "daily update" is a batch loop,
SURVEY §2.9); these are the engine's scale extension on the `events`
stream: tumbling/sliding windows and session windows with a
watermark for late data, plus a stateful custom operator example.

The aggregation expressions are the same ones the batch registry
queries use (`F.window`, `F.session_window`), which is the point:
Spark's unified model means the batch DuckDB oracle validates the
streaming semantics on bounded replays (SURVEY §7.3 hard part 6).

Scale notes: event-time windows + watermark bound state size; state
is partitioned by (window, key) across executors. On a cluster the
source would be Kafka; here a file source replays the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# session-id -> DataType: how that Spark surfaces parquet
# TIMESTAMP(NANOS); one probe per session (driver-side, one row).
_NANOS_TS_TYPE_CACHE: dict = {}


def _probed_nanos_ts_type(spark: SparkSession):
    """The type THIS Spark decodes parquet TIMESTAMP(NANOS) as.

    Older Sparks honor spark.sql.legacy.parquet.nanosAsLong (-> long);
    Spark 4.1+ ignores it (-> timestamp_ntz). Rather than branch on a
    fuzzy version boundary, write a one-row nanos fixture with pyarrow
    and read it back — the answer is whatever the running session
    actually does, by construction. Falls back to TIMESTAMP_NTZ if
    pyarrow can't write nanos (it can on every pinned version here).
    """
    key = id(spark)
    if key not in _NANOS_TS_TYPE_CACHE:
        import os
        import shutil
        import tempfile

        from pyspark.sql import types as T

        d = tempfile.mkdtemp(prefix="mvz_nanos_probe_")
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table({"ts": pa.array([0], pa.timestamp("ns"))}),
                os.path.join(d, "probe.parquet"),
                version="2.6",
            )
            _NANOS_TS_TYPE_CACHE[key] = (
                spark.read.parquet(d).schema["ts"].dataType
            )
        except Exception:
            _NANOS_TS_TYPE_CACHE[key] = T.TimestampNTZType()
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return _NANOS_TS_TYPE_CACHE[key]


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source replay of the events table as a stream.

    `events_dir` must be a DIRECTORY containing events parquet files
    (the file source monitors directories; point it at a staging dir
    in production, or a symlink-dir of the testdata file in tests).

    The stream schema is probed from a one-off batch read of the same
    directory rather than hardcoded: the parquet stores
    TIMESTAMP(NANOS) and how Spark surfaces it (long vs
    timestamp_ntz) has drifted across releases, so the probe always
    matches what the running Spark actually decodes. The footer-only
    probe is driver-side metadata work, not a data scan. A staging
    directory that is still EMPTY (normal at stream start in
    production) has no footer to probe — fall back to the canonical
    EVENTS schema with `ts` typed by `_probed_nanos_ts_type` (a
    one-row pyarrow fixture read by THIS session: long on Sparks that
    honor nanosAsLong, timestamp_ntz on 4.1+), so files that arrive
    after an empty-dir start always match the declared stream schema;
    either way normalize_events_ts folds the result to one
    TimestampType path.
    """
    import copy

    from pyspark.sql import types as T
    from pyspark.sql.utils import AnalysisException

    from ..schemas import EVENTS
    from ..tables import normalize_events_ts

    try:
        schema = spark.read.parquet(events_dir).schema
    except AnalysisException:  # empty staging dir: nothing to probe
        schema = copy.deepcopy(EVENTS)
        schema.fields[schema.names.index("ts")] = T.StructField(
            "ts", _probed_nanos_ts_type(spark), False
        )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return normalize_events_ts(raw)


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window with watermark: late rows beyond
    the watermark are dropped; state for closed windows is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-merged) per user with watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drive a bounded streaming query to completion synchronously
    into an in-memory sink (for tests and local verification)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stream_to_partitioned_table(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_cols=("window_start", "event_type"),
):
    """Exactly-once streaming sink via foreachBatch + idempotent
    partition overwrite: each micro-batch rewrites only the
    partitions it touches, so a replayed batch (failure/restart)
    produces identical table state — the Delta-less exactly-once
    pattern (checkpoint tracks offsets, overwrite dedups output).

    `partition_cols` must cover the FULL grouping key of the
    aggregate. Update mode emits only the groups a micro-batch
    changed; if the sink were partitioned on a key prefix (e.g.
    window_start alone for a (window, event_type) aggregate), an
    overwrite would delete the partition's untouched groups written
    by earlier batches. Partitioning on the whole key makes each
    emitted group rewrite exactly its own partition, so replays and
    incremental updates are both idempotent and lossless.
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ..pipelines.upsert import upsert_by_date_partition

        upsert_by_date_partition(
            batch_df.sparkSession, batch_df, path, list(partition_cols)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def cms_cells(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming hourly count-min grid of user_id frequencies: the
    sketch is a plain windowed count over the (t, col) explode, so
    the built-in streaming agg maintains it with O(d·w) state per
    window — no custom stateful operator, and cell-wise addition
    across windows is the union sketch (operators/cms.py)."""
    from ..operators.cms import with_cms_cells

    return (
        with_cms_cells(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "t", "col")
        .agg(F.count("*").cast("long").alias("cell"))
        .select(
            F.date_format(
                "window.start", "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "t",
            "col",
            "cell",
        )
    )
