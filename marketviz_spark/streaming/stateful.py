"""Custom stateful streaming operator via applyInPandasWithState.

A running per-user anomaly counter: for each user, maintain
(event_count, value_sum) across micro-batches and emit the updated
running aggregate whenever new events arrive — the canonical shape
for custom state the built-in windowed aggregations can't express
(e.g. CUSUM drift detection, per-entity model state).

Scale notes: state is keyed by user_id — uniformly distributed,
sized O(active users), evictable via GroupStateTimeout. Batch
equivalence: with a single replay the final emitted row per user
must equal the batch groupBy aggregate (asserted in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, batches int"
)
STATE_SCHEMA = "n long, s double, b int"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, b = state.get if state.exists else (0, 0.0, 0)
    # ONE increment per invocation (= per micro-batch that touched
    # this group): the iterator yields multiple pandas chunks when a
    # group's batch data exceeds arrow.maxRecordsPerBatch, and
    # counting chunks would overcount batches.
    b += 1
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s, b))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [s],
            "batches": [b],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream -> running (count, sum) per user, one output
    row per user per micro-batch that touched it."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
