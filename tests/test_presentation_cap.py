"""The presentation-boundary collect contract (r8 VERDICT item 4):
every driver-side materialization in the presentation/maintenance
layer routes through ``pipelines.presentation``, whose helpers bound
the collect IN THE PLAN (``limit(cap+1)``) and raise on overflow.
"""

from __future__ import annotations

import pathlib
import re

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "marketviz_spark"

# Bounded-by-construction model/candidate collects documented at the
# site (K·d IVF model rows; an eval slice already limit(cap+1)'d in
# the same pattern as the helper). Everything else must go through
# presentation_frame / presentation_pandas.
ALLOWED = {
    "pipelines/presentation.py",  # the helper itself
    "datapipe/similarity.py",  # IVF model + capped eval slice
    "datapipe/pq.py",  # PQ model: K seed vectors + M*K*(d/M) sums
    "datapipe/bpe.py",  # BPE model: ONE argmax row per merge step
}


def test_no_raw_collect_outside_presentation_helper():
    """Lint: no ``.collect()`` / ``.toPandas()`` in engine source
    outside the helper and the documented model-collect allowlist.
    A new driver-side materialization must either be bounded by
    construction (and added here with a reason) or routed through
    ``presentation_frame``."""
    pat = re.compile(r"\.collect\(\)|\.toPandas\(\)")
    offenders = []
    for py in PKG.rglob("*.py"):
        rel = py.relative_to(PKG).as_posix()
        if rel in ALLOWED:
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)


def test_presentation_cap_trips(spark):
    """The cap is enforced, not advisory: an over-cap frame raises
    PresentationCapError, and the plan-side limit means at most
    cap+1 rows ever reach the driver."""
    from marketviz_spark.pipelines.presentation import (
        PresentationCapError,
        presentation_frame,
        presentation_pandas,
    )

    df = spark.range(50)
    with pytest.raises(PresentationCapError, match="toy frame"):
        presentation_frame(df, max_rows=10, what="toy frame")
    with pytest.raises(PresentationCapError):
        presentation_pandas(df, max_rows=10, what="toy frame")
    # under the cap: rows come back intact and ordered
    rows = presentation_frame(
        df.orderBy("id"), max_rows=50, what="toy frame"
    )
    assert [r["id"] for r in rows] == list(range(50))


def test_presentation_limit_is_in_plan(spark):
    """The guard's limit must appear in the executed plan — the
    whole point is that an overflowing frame never materializes."""
    from marketviz_spark.pipelines import presentation as p

    # range must exceed the cap, else Catalyst constant-folds the
    # Limit away entirely (range(5).limit(1001) has no Limit node)
    df = spark.range(10 * p.MAX_TABLE_ROWS)
    capped = df.limit(p.MAX_TABLE_ROWS + 1)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Limit" in plan or "limit" in plan, plan
