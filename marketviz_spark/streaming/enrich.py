"""Stream-static enrichment join: live events tagged with a
historical per-user profile.

The classic streaming-dimension pattern (SURVEY §2.9 extension): a
static profile table — each user's activity before a cutoff, bucketed
into a tier — joins onto the live stream. Structured Streaming plans
a stream-static join with NO state store at all: the static side is
just a batch relation (broadcast when small) probed per micro-batch,
so there is no watermark requirement and nothing to evict — the
cheapest possible enrichment at any scale. Left join keeps events
from users with no history ('new' tier).

The batch twin (`events_enrich_static` in the registry) runs the
identical logical plan over the bounded table and is DuckDB
oracle-checked; `tests/test_streaming.py` proves stream == batch on a
bounded replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENRICH_CUTOFF = "2024-01-16 00:00:00"
HEAVY_MIN = 40
MEDIUM_MIN = 20


def user_profile(events: DataFrame) -> DataFrame:
    """Static side: per-user event count and decimal-exact value sum
    BEFORE the cutoff, with an activity tier. One partial-aggregated
    shuffle on user_id; output is |users| rows — broadcastable."""
    pre = events.filter(F.col("ts") < ENRICH_CUTOFF)
    prof = pre.groupBy("user_id").agg(
        F.count("*").cast("long").alias("hist_events"),
        F.sum(F.col("value").cast("decimal(28,10)"))
        .cast("double")
        .alias("hist_value"),
    )
    tier = (
        F.when(F.col("hist_events") >= HEAVY_MIN, "heavy")
        .when(F.col("hist_events") >= MEDIUM_MIN, "medium")
        .otherwise("light")
    )
    return prof.select(
        F.col("user_id").alias("p_user_id"),
        "hist_events",
        "hist_value",
        tier.alias("tier"),
    )


def enrich(live: DataFrame, profile: DataFrame) -> DataFrame:
    """Shared by the streaming path and the batch twin: left-join the
    post-cutoff rows onto the broadcast profile; absent users tier as
    'new' with zero history."""
    out = live.filter(F.col("ts") >= ENRICH_CUTOFF).join(
        F.broadcast(profile),
        live["user_id"] == profile["p_user_id"],
        "left",
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(F.col("tier"), F.lit("new")).alias("tier"),
        F.coalesce(F.col("hist_events"), F.lit(0).cast("long")).alias(
            "hist_events"
        ),
    )


def enrich_stream(stream: DataFrame, events_batch: DataFrame) -> DataFrame:
    """Streaming variant: the profile is computed ONCE from the batch
    table (in production: a dimension table maintained elsewhere) and
    joined onto every micro-batch. Stateless — no watermark, no
    state store."""
    return enrich(stream, user_profile(events_batch))
