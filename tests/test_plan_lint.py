"""Registry-wide physical-plan lint: every query's executed plan is
checked for the two antipatterns that are NEVER acceptable at scale,
regardless of operator:

- ``CartesianProduct`` — an unconstrained all-pairs product (a
  broadcast nested-loop against a 1-row bound is fine and common
  here; a true cartesian is always a bug);
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (the
  engine's contract is Arrow-vectorized Python only: mapInPandas /
  applyInPandas / pandas UDFs).

test_scale_plans pins ~40 queries' specific shapes; this sweep
covers the whole registry so a NEW query can't ship with either
antipattern unnoticed. Plans are built (not executed) at sf0.001 —
planning cost only.
"""

from __future__ import annotations

from marketviz_spark.registry import QUERIES
from tests.conftest import SF_SMALL

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_no_query_plans_cartesian_or_rowwise_python(spark):
    # Fanned over driver threads (r14, guide §2.6): most of this
    # test's wall is the iterative queries EXECUTING their training
    # jobs while the DataFrame is built, which overlap cleanly.
    # Same coverage and assertion as the sequential form.
    from concurrent.futures import ThreadPoolExecutor

    def lint(item):
        name, qd = item
        plan = (
            qd.fn(spark, SF_SMALL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        hits = [p for p in FORBIDDEN if p in plan]
        return (name, hits) if hits else None

    with ThreadPoolExecutor(max_workers=4) as ex:
        offenders = dict(
            r for r in ex.map(lint, sorted(QUERIES.items())) if r
        )
    assert not offenders, offenders


def test_approx_sketches_has_no_buffering_percentile(spark):
    """agg_approx_sketches' exact side must come from the bounded
    cents-domain histogram (cents_quantile_bounds), never the exact
    ``percentile(`` aggregate, which buffers every group value and
    dies at 100 TB. ``percentile_approx`` (the sketch under test) is
    allowed — match the exact aggregate's name precisely."""
    plan = (
        QUERIES["agg_approx_sketches"]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lowered = plan.lower()
    scrubbed = lowered.replace("percentile_approx", "").replace(
        "approx_percentile", ""
    )
    assert "percentile(" not in scrubbed, plan[:2000]
