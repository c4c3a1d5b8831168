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


def stream_ingest_gate(
    stream_df: DataFrame,
    corpus_path: str,
    checkpoint_dir: str,
    content_col: str = "props",
):
    """Continuous-ingest dedup against a PERSISTED corpus — the
    streaming twin of datapipe.incremental_dedup, and the piece the
    watermark-bounded dedups above can't provide: duplicates are
    refused no matter how far apart they arrive (days, restarts),
    because the reference is the corpus on disk, not in-memory state.

    Each micro-batch, inside foreachBatch:
    1. fingerprint rows (md5 of the payload) and collapse the batch
       to one representative per fingerprint (min event_id —
       deterministic across replays);
    2. anti-join against the fingerprints already in the corpus
       table (the corpus IS the index: one row per fingerprint, so
       the read is column-pruned to `fp` at scan time — at 100 TB
       you'd bucket the table by fp for a co-located join);
    3. write survivors partitioned by (run, epoch) with dynamic
       partition OVERWRITE, where `run` is a fresh token per gate
       START. The anti-join excludes only the CURRENT (run, epoch)
       partition, which makes every failure mode idempotent:
       - an in-run task retry of epoch N recomputes the full
         survivor set and overwrites ITS OWN partition wholesale
         (anti-joining against its partial rows would shrink it);
       - a restart (same or fresh checkpoint) gets a NEW run token,
         so epoch numbers restarting from 0 can never alias an
         older run's partitions — nothing is deleted, prior rows
         stay visible to the anti-join, and only the complement is
         written. Epoch ids alone are NOT globally unique; keying
         the overwrite by them alone would let a fresh checkpoint
         silently replace an old run's partitions.
    """
    import uuid

    run_token = uuid.uuid4().hex

    def gate(batch_df: DataFrame, epoch_id: int) -> None:
        from ..pipelines.upsert import table_exists, upsert_by_date_partition

        spark = batch_df.sparkSession
        fp = F.when(
            F.col(content_col).isNull(), F.lit("<null>")
        ).otherwise(F.md5(F.col(content_col)))
        batch = (
            batch_df.withColumn("fp", fp)
            .groupBy("fp")
            .agg(F.min("event_id").alias("event_id"))
        )
        if table_exists(spark, corpus_path):
            # partition-pruned read: everything EXCEPT this batch's
            # own (run, epoch) partition
            seen = (
                spark.read.parquet(corpus_path)
                .filter(
                    ~(
                        (F.col("run") == run_token)
                        & (F.col("epoch") == int(epoch_id))
                    )
                )
                .select("fp")
            )
            batch = batch.join(seen, "fp", "left_anti")
        upsert_by_date_partition(
            spark,
            batch.withColumn("run", F.lit(run_token)).withColumn(
                "epoch", F.lit(int(epoch_id))
            ),
            corpus_path,
            ["run", "epoch"],
        )

    return (
        stream_df.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
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
