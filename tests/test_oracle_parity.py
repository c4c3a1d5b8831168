"""Driver-mimicking parity test: every registry query vs its DuckDB
oracle at sf0.001 (fast). The driver runs the real gate at sf0.01;
run `python tests/run_parity.py /root/testdata/sf0.01` for that."""

from __future__ import annotations

import pytest

from marketviz_spark.registry import QUERIES
from tests.conftest import SF_SMALL
from tests.oracle_check import compare, duck_con


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
