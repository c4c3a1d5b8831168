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

CHECKPOINT COMPATIBILITY: STATE_SCHEMA gained a fourth field
(``nn long``, the non-null value count) in round 7 to fix the
all-NULL-user sum. applyInPandasWithState state schemas are NOT
evolvable — a streaming checkpoint written with the 3-field schema
will fail (or misread state) under this code. Upgrading an
externally persisted query requires a FRESH checkpoint location;
there is no in-place migration. ``pin_state_schema`` enforces this
at startup: call it with the checkpoint location before
``writeStream.start()`` and a schema mismatch against what that
checkpoint was created with raises immediately with the remediation,
instead of surfacing as a mid-batch state deserialization failure
(or, worse, positionally-misread state).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, batches int"
)
STATE_SCHEMA = "n long, s double, b int, nn long"

# The 100 TB state-store setting: the default (HDFS-backed) provider
# keeps every partition's state in executor HEAP — a hard ceiling
# once keyed state (users, sessions, join buffers) outgrows memory.
# RocksDB spills to local disk with incremental checkpointing, which
# is what production stateful pipelines run. Set it at session build
# (spark.conf / --conf); results are provider-independent
# (test-asserted: the stateful replay is bit-identical under both).
ROCKSDB_STATE_STORE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, b, nn = state.get if state.exists else (0, 0.0, 0, 0)
    # ONE increment per invocation (= per micro-batch that touched
    # this group): the iterator yields multiple pandas chunks when a
    # group's batch data exceeds arrow.maxRecordsPerBatch, and
    # counting chunks would overcount batches.
    b += 1
    for pdf in pdfs:
        n += len(pdf)
        # pandas .sum() skips NaN (matching SQL sum's NULL-skip),
        # but returns 0.0 for an ALL-NaN chunk where SQL sum is
        # NULL — track the non-null count separately so a user who
        # has never produced a non-null value emits NULL, exactly
        # like the batch F.sum twin (r7 fuzz events: ~8% NULL
        # value, incl. one all-NULL user).
        s += float(pdf["value"].sum())
        nn += int(pdf["value"].count())
    state.update((n, s, b, nn))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            # nullable Float64 so the no-non-null case crosses
            # Arrow as a true NULL, not NaN
            "value_sum": pd.array(
                [s if nn else None], dtype="Float64"
            ),
            "batches": [b],
        }
    )


_SCHEMA_SIDECAR = "marketviz_state_schema.json"


def pin_state_schema(
    checkpoint_dir: str, state_schema: str, operator: str
) -> None:
    """Startup guard for the NON-EVOLVABLE applyInPandasWithState
    state schema (module docstring): records `state_schema` in a
    sidecar file inside the checkpoint location on first start, and
    on every restart refuses a code-side schema that differs from
    what the checkpoint's state rows were written with — loudly and
    before any micro-batch runs.

    Call it right before ``writeStream.start()`` with the same
    ``checkpointLocation``. One sidecar file PER OPERATOR
    (``marketviz_state_schema.<operator>.json``) so one checkpoint
    tree can host several stateful operators pinning concurrently —
    a shared dict would be a non-locked read-modify-write where the
    last writer silently drops the other's pin. Written via
    driver-local file I/O — for object-store checkpoint URIs, mirror
    the same path through your store's client (the guard is
    deliberately storage-agnostic: one small JSON file next to the
    checkpoint's own metadata).
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    safe_op = "".join(
        c if c.isalnum() or c in "-_" else "_" for c in operator
    )
    path = os.path.join(
        checkpoint_dir, f"marketviz_state_schema.{safe_op}.json"
    )
    prev: str | None = None
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh).get(operator)
    else:
        # Legacy shared sidecar (pre-round-13): honor an existing
        # pin so old checkpoints stay guarded, then migrate it to
        # the per-operator file below.
        legacy = os.path.join(checkpoint_dir, _SCHEMA_SIDECAR)
        if os.path.exists(legacy):
            with open(legacy) as fh:
                prev = json.load(fh).get(operator)
    if prev is not None and prev != state_schema:
        raise RuntimeError(
            f"state-schema mismatch for operator {operator!r}: "
            f"checkpoint {checkpoint_dir!r} was written with state "
            f"schema {prev!r} but the code now uses "
            f"{state_schema!r}. applyInPandasWithState state is not "
            "evolvable — restarting would fail mid-batch or misread "
            "state positionally. Remediation: start the upgraded "
            "query against a FRESH checkpoint location (replaying "
            "the source); there is no in-place migration."
        )
    if prev is None or not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {operator: state_schema if prev is None else prev},
                fh,
                indent=1,
                sort_keys=True,
            )
        os.replace(tmp, path)


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


# ---------------------------------------------------------------------------
# Streaming anomaly flags: the live twin of the batch
# events_anomaly_days rule, with per-type history in group state.
# ---------------------------------------------------------------------------

ANOMALY_OUTPUT_SCHEMA = (
    "event_type string, batch_count long, hist_batches long, is_anomaly int"
)
ANOMALY_STATE_SCHEMA = "n long, s long, q long"


def _anomaly_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, q = state.get if state.exists else (0, 0, 0)
    c = 0
    for pdf in pdfs:
        c += len(pdf)
    # Flag against PRIOR history only (the arriving batch must not
    # dilute its own baseline), with the same all-integer |z|>2
    # rewrite as the batch operator: (c*n - s)^2 > 4*(n*q - s^2).
    # Python ints are arbitrary-precision, so there is no overflow
    # cliff here at any history length. n == 0 (no history) never
    # flags; n == 1 flags ANY change (variance-0 warm-up — callers
    # gate on hist_batches if they want a longer burn-in).
    flag = int(n > 0 and (c * n - s) ** 2 > 4 * (n * q - s * s))
    state.update((n + 1, s + c, q + c * c))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "batch_count": [c],
            "hist_batches": [n],
            "is_anomaly": [flag],
        }
    )


def running_type_anomaly(events: DataFrame) -> DataFrame:
    """events stream -> per-micro-batch volume anomaly flags per
    event type. State is (n, s, q) over BATCH counts — O(types)
    rows, the smallest state any drift detector can carry. The
    DECISION ARITHMETIC is the same all-integer |z|>2 rewrite as
    events_anomaly_days, but the BASELINE deliberately differs: the
    live detector scores each batch against PRIOR history only (a
    spike must not dilute the baseline it is judged against),
    while the batch operator's stats include the flagged day
    itself. The two therefore legitimately disagree near the
    threshold — e.g. a 3x spike after two quiet batches flags live
    but not in a 3-day batch backfill, where the spike inflates its
    own sigma. Validate a replay against this operator's own rule
    (see the pure-Python mirror in test_streaming), not against
    the batch query."""
    return events.groupBy("event_type").applyInPandasWithState(
        _anomaly_update,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Idle-session flush: processing-time TIMEOUT state eviction — the
# GroupState feature the other two operators don't exercise. A user's
# running session (count, sum) is flushed as a FINAL row when no new
# events arrive within the timeout, and the state is removed — the
# live counterpart of session finalization, and the mechanism that
# BOUNDS state for abandoned keys (without it, every user ever seen
# stays in the store forever).
# ---------------------------------------------------------------------------

IDLE_OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, final int"
)
IDLE_STATE_SCHEMA = "n long, s double"


def _idle_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # no data for this key within the timeout: emit the final
        # session row and DROP the state
        n, s = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [s],
                "final": [1],
            }
        )
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    state.setTimeoutDuration(1000)  # 1s idle -> flush
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [s],
            "final": [0],
        }
    )


def idle_session_flush(events: DataFrame) -> DataFrame:
    """events stream -> running per-user totals with a FINAL row
    (and state eviction) once the user goes idle past the
    processing-time timeout."""
    return events.groupBy("user_id").applyInPandasWithState(
        _idle_update,
        outputStructType=IDLE_OUTPUT_SCHEMA,
        stateStructType=IDLE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
