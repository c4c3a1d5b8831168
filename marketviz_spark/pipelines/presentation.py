"""Presentation-boundary collect guard.

Every driver-side ``collect()``/``toPandas()`` in the presentation
and maintenance layers routes through these helpers, which bound the
materialized row count BY CONSTRUCTION: the scan is ``limit(cap+1)``
*before* the collect, so even a contract-violating upstream frame
(say, a join that fans out at 100 TB) materializes at most ``cap+1``
rows at the driver and raises — it can never OOM the driver first
and explain itself later.

Caps are contracts, not tuning knobs:

- ``MAX_TABLE_ROWS`` (1,000) — summary tables, pie slices, scalar
  frames: the reference renders at most a few dozen rows.
- ``MAX_SERIES_POINTS`` (20,000) — the full index time series (one
  row per calendar date: ~2,500 over the TPC-H span, invariant in
  data volume; 20k ≈ 80 years of daily data, past any readable
  chart).
- ``MAX_PARTITION_LIST`` (65,536) — distinct partition values in
  maintenance jobs; a table partitioned finer than that is
  misconfigured long before the list is the problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_TABLE_ROWS = 1_000
MAX_SERIES_POINTS = 20_000
MAX_PARTITION_LIST = 65_536


class PresentationCapError(RuntimeError):
    """A presentation/maintenance frame exceeded its row-cap
    contract — the upstream query is no longer presentation-sized
    and must be aggregated or limited before the driver boundary."""


def _checked(rows, max_rows: int, what: str):
    if len(rows) > max_rows:
        raise PresentationCapError(
            f"{what}: more than {max_rows} rows reached the driver "
            "presentation boundary; aggregate or limit the frame "
            "distributed-side instead of collecting it"
        )
    return rows


def presentation_frame(
    df: DataFrame, max_rows: int = MAX_TABLE_ROWS, what: str = "frame"
) -> list:
    """``collect()`` with a hard cap: scans ``max_rows + 1`` rows at
    most (the limit is in the plan, not post-hoc), raises
    :class:`PresentationCapError` if the frame overflows. Preserves
    upstream ``orderBy`` ordering (LIMIT over a sorted frame is a
    top-k in Spark)."""
    return _checked(
        df.limit(max_rows + 1).collect(), max_rows, what
    )


def presentation_pandas(
    df: DataFrame, max_rows: int = MAX_TABLE_ROWS, what: str = "frame"
):
    """``toPandas()`` twin of :func:`presentation_frame`."""
    return _checked(
        df.limit(max_rows + 1).toPandas(), max_rows, what
    )
