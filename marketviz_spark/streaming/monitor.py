"""Streaming observability: a StreamingQueryListener that records
every micro-batch's progress (rows, durations, state size) — the
hook a deployment wires to its metrics system, and the only way to
see batch-level behavior WITHOUT touching the query itself (the
DQ-counter path, `quality.observe_checks`, rides inside the query;
this listener rides outside it).

Scale notes: progress events are driver-side, one per micro-batch
per query — metadata volume, not data volume. The recorder keeps a
bounded deque so a long-lived session cannot grow without limit;
a production subclass would emit to a metrics sink instead of
memory and need no bound.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Bounded in-memory recorder of per-batch progress facts."""

    def __init__(self, max_events: int = 1000) -> None:
        self.events: deque = deque(maxlen=max_events)
        # lifecycle logs share the bound — a session cycling many
        # short-lived queries must not grow these either
        self.started: deque = deque(maxlen=max_events)
        self.terminated: deque = deque(maxlen=max_events)

    # -- listener callbacks (driver thread) -------------------------
    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.events.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": (p.durationMs or {}).get(
                    "triggerExecution"
                ),
                "state_rows": sum(
                    (s.numRowsTotal or 0)
                    for s in (p.stateOperators or [])
                ),
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - noop
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    # -- convenience ------------------------------------------------
    def batches_for(self, query_id: str) -> list[dict]:
        return [
            e for e in self.events if e["query_id"] == str(query_id)
        ]


def attach(spark, max_events: int = 1000) -> ProgressRecorder:
    """Register a fresh recorder on the session; caller detaches
    with `spark.streams.removeListener(rec)`."""
    rec = ProgressRecorder(max_events)
    spark.streams.addListener(rec)
    return rec
