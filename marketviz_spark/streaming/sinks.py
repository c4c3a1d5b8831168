"""Streaming keyed-upsert sink: foreachBatch MERGE into a governed
table (SURVEY §1.2/§4.2's upsert, driven by a live stream).

Structured Streaming's file/delta sinks are append-only; an
INSERT-OR-REPLACE target needs `foreachBatch`, which hands every
micro-batch to batch code — here `pipelines.upsert.upsert_keyed`,
so the sink inherits the backend dispatch (a transactional Delta
MERGE when delta is available, anti-join + union rewrite otherwise)
and any batch-side improvement automatically.

Delivery semantics: foreachBatch is at-least-once — on recovery a
micro-batch can be REPLAYED with the same batch_id. The sink stays
effectively exactly-once because the write is idempotent BY KEY:
replaying a batch re-upserts the same (key -> row) mapping, and
within-batch duplicates collapse to one row per key first — latest
by `order_col`, with ties (and the no-order_col case) broken by the
FULL remaining row ordered by column name, so the winner is a pure
function of the batch's contents and a replay converges to the
identical table state.

Scale: per micro-batch the cost is the batch-sized dedupe shuffle
plus the upsert itself; with the delta backend only files touched
by the batch's keys rewrite, so sink cost tracks STREAM volume,
not table size. The parquet fallback rewrites the table per batch —
correct, but size the trigger interval accordingly (or land on
Delta) for big tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pipelines.upsert import upsert_keyed


def upsert_batch_fn(path: str, keys: list[str], order_col: str | None):
    """The foreachBatch callable: dedupe the micro-batch to one row
    per key, then keyed-upsert into `path`."""

    def _apply(bdf: DataFrame, batch_id: int) -> None:
        # Deterministic winner per key: order_col desc first (when
        # given), then EVERY remaining column ascending by name. The
        # full-row tiebreak is what makes a replayed batch pick the
        # SAME winner — ordering by the (constant-within-partition)
        # keys, or dropDuplicates, would leave ties to partition
        # order and break replay convergence. Requires orderable
        # column types (true for every schema this engine writes).
        rest = sorted(
            c
            for c in bdf.columns
            if c not in keys and c != order_col
        )
        order = (
            [F.desc(order_col)] if order_col is not None else []
        ) + [F.asc(c) for c in rest]
        w = Window.partitionBy(*keys).orderBy(*order)
        deduped = (
            bdf.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        upsert_keyed(bdf.sparkSession, deduped, path, keys)

    return _apply


def run_upsert_stream(
    stream: DataFrame,
    path: str,
    keys: list[str],
    checkpoint_dir: str,
    order_col: str | None = None,
) -> None:
    """Drain the (bounded) stream into a keyed table with
    availableNow and block until done — the replay/backfill entry;
    a live deployment calls ``writeStream.foreachBatch(
    upsert_batch_fn(...))`` with a processing-time trigger instead.
    """
    q = (
        stream.writeStream.foreachBatch(
            upsert_batch_fn(path, keys, order_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
