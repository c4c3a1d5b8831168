"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``marketviz_spark``; this file only adapts
its registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marketviz_spark.registry import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the daily equal-weighted top-K index) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["index_daily"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted entries get rows-only checks."""
    return {
        name: qd.oracle
        for name, qd in QUERIES.items()
        if qd.oracle is not None
    }
