"""Stream-stream interval join: same-user click -> error attribution.

The batch twin (`events_click_error_pairs` in the registry, DuckDB
oracle-checked) joins errors to clicks of the SAME user in the 5
minutes before the error. The streaming variant is the identical
logical join run as a Structured Streaming stream-stream inner join:
both sides watermarked, the event-time range condition bounds how
long either side is buffered, and the user_id equality is the state
store's shard key.

Scale notes (SURVEY §2.9 extension):
- The equi-key matters: a pure time-range stream-stream join keeps
  every buffered row a candidate for every input row (per-batch
  cross product). Keyed by user_id, state and matching shard
  uniformly across executors.
- Watermark + range condition let Spark evict: a click older than
  (watermark - 5 minutes) can never match a future error, so its
  state is dropped; without the range condition state grows forever.
- Self-joining one source stream is supported; on a cluster the two
  sides would typically be separate Kafka topics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIB_GAP_US = 300_000_000  # 5 minutes


def click_error_pairs_batch(events: DataFrame) -> DataFrame:
    """Batch semantics: (error, click) pairs, same user, click in
    [error_ts - 5m, error_ts). Shared by the registry query and the
    stream==batch test.

    The join key is (user_id, 5-min bucket), not user_id alone: an
    in-range click lives in the error's bucket or the one before, so
    each qualifying pair matches exactly one of the error's two
    exploded bucket rows. A user_id-only join is per-user
    |errors|x|clicks| — the round-7 sf1 spot-run's hot user (5% of
    a 1M-event month) measured 17.2x wall for 10x data; bucketing
    bounds the work by pairs-per-window, the same quantity the
    OUTPUT is, at any user skew."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        (F.unix_micros("ts") / ATTRIB_GAP_US)
        .cast("long")
        .alias("bucket"),
    )
    b = (F.unix_micros("ts") / ATTRIB_GAP_US).cast("long")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        F.explode(F.array(b, b - 1)).alias("bucket"),
    )
    cond = (
        (F.unix_micros("click_ts")
         >= F.unix_micros("error_ts") - ATTRIB_GAP_US)
        & (F.unix_micros("click_ts") < F.unix_micros("error_ts"))
    )
    return (
        errors.join(clicks, ["user_id", "bucket"])
        .filter(cond)
        .select(
            "error_id",
            "click_id",
            "user_id",
            (
                F.unix_micros("error_ts") - F.unix_micros("click_ts")
            ).alias("gap_us"),
        )
    )


def click_error_pairs_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming variant: watermark both sides, join with the
    user_id equality plus the event-time range (state eviction
    contract)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    cond = (
        (F.col("c_user_id") == F.col("user_id"))
        & (
            F.col("click_ts")
            >= F.col("error_ts") - F.expr("INTERVAL 5 MINUTES")
        )
        & (F.col("click_ts") < F.col("error_ts"))
    )
    return errors.join(clicks, cond).select(
        "error_id",
        "click_id",
        "user_id",
        (
            F.unix_micros("error_ts") - F.unix_micros("click_ts")
        ).alias("gap_us"),
    )
