"""Driver-mimicking parity test: every registry query vs its DuckDB
oracle at sf0.001 (fast). The driver runs the real gate at sf0.01;
run `python tests/run_parity.py /root/testdata/sf0.01` for that."""

from __future__ import annotations

import pytest

from marketviz_spark.registry import QUERIES
from tests.conftest import SF_SMALL
from tests.oracle_check import compare, duck_con, oracle_type_problems


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, con, name):
    qd = QUERIES[name]
    df = qd.fn(spark, SF_SMALL)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check
        return
    problems = compare(df, con, qd.oracle, name)
    assert not problems, "\n".join(problems)


def test_no_hugeint_oracle_columns(con):
    """r10 driver-fail class: DuckDB sum(BIGINT) is HUGEINT, fetched as
    float64, hash-mismatching Spark's long at the driver even when the
    local value compare passes. Scan every oracle's declared result
    types; this fails if the skewstats/layout CASTs are reverted or a
    new uncast sum() arithmetic lands."""
    bad = []
    for name, qd in sorted(QUERIES.items()):
        if qd.oracle is None:
            continue
        bad.extend(oracle_type_problems(con, qd.oracle, name))
    assert not bad, "\n".join(bad)


def test_blas_cosine_boundary_distance_sf001():
    """Loud-fail guard for the dgemm block-scoring paths (r8 VERDICT
    item): `_fix_round6` (datapipe/similarity.py) rescores
    near-boundary entries with numpy's order-fixed einsum, which
    makes parity robust to BLAS summation order — PROVIDED the
    order-fixed raw cosines themselves sit a safe distance from the
    floor-round grid. This scans the ENTIRE sf0.01 pair space (a
    superset of every pair any block path scores: all-pairs for
    emb_cosine_topk_blas, corpus x eval for decontam_embedding,
    cell-confined for semdedup_prune/emb_ivf_topk) and asserts the
    minimum distance from a rounding boundary, in grid units, at
    both grids in use (4dp top-k, 6dp dominance/decontam).

    Margin 1e-7 grid units: ~200x the few-ulp einsum drift a
    BLAS/FMA/platform change can introduce (~5e-10 grid at 1e6),
    and ~16x below the measured minimum on this data (1.6e-6), so
    the test is stable today and fails loudly — instead of the
    driver gate flaking — if regenerated testdata or a platform
    change ever parks a cosine on a boundary."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.sqrt(np.einsum("ij,ij->i", E, E))
    N = len(E)
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    mask = ii != jj
    ii, jj = ii[mask], jj[mask]
    # the same order-fixed reduction _fix_round6's rescore uses
    cos = np.einsum("ij,ij->i", E[ii], E[jj]) / (n[ii] * n[jj])
    for grid in (1e4, 1e6):
        frac = (cos * grid + 0.5) % 1.0
        dist = np.minimum(frac, 1.0 - frac)
        worst = int(dist.argmin())
        assert dist.min() > 1e-7, (
            f"cosine({ii[worst]},{jj[worst]}) = {cos[worst]!r} is "
            f"{dist.min():.2e} grid units from a floor-{grid:g} "
            "boundary — within cross-BLAS drift; 6dp parity of the "
            "block-scoring paths is no longer platform-safe"
        )
