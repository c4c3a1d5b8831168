"""Streaming deduplication: the dedup family's streaming member.

Two shapes, both watermark-bounded so state can't grow forever:

- `stream_dedup_exact`: drop duplicate KEYS within the watermark
  horizon (dropDuplicatesWithinWatermark) — the streaming twin of
  exact dedup by primary key; late duplicates beyond the watermark
  are the documented residual (batch exact dedup downstream mops
  them up — the standard lambda-cleanup pattern).
- `stream_dedup_content`: same, keyed on a content fingerprint
  (md5 of the payload column) — the streaming twin of
  datapipe.exact_dedup_groups.

Scale notes: state is a per-key presence map partitioned across
executors, evicted as event time passes the watermark; the key is
a uniform hash/id, so no reducer skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_dedup_content(
    events: DataFrame,
    content_col: str = "props",
    watermark: str = "2 hours",
) -> DataFrame:
    # NULL gets a sentinel fingerprint distinct from every md5 (a
    # 32-hex-char space can't contain '<null>'), so a NULL payload
    # and an empty-string payload are different contents — coalesce
    # into the hash would silently drop one of them as a duplicate.
    fp = events.withColumn(
        "_fp",
        F.when(F.col(content_col).isNull(), F.lit("<null>")).otherwise(
            F.md5(F.col(content_col))
        ),
    )
    return (
        fp.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
