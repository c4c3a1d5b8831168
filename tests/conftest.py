from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from marketviz_spark.session import get_spark

    s = get_spark("marketviz_tests", shuffle_partitions=8)
    yield s
