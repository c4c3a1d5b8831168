"""Declarative data-quality gate: dbt/Great-Expectations-style
checks compiled into ONE aggregation pass over the table.

A training-data pipeline gates every ingest batch on expectations
(nulls, ranges, uniqueness, referential integrity). The naive form
runs one job per check; this compiles all row-level checks into a
single `agg()` of conditional counts (one scan, partial
aggregation), plus one groupBy for uniqueness and one broadcast
anti-join probe for referential integrity — the three plan shapes
any expectation reduces to.

`check_table` returns a (check, n_violations, passed) frame the
caller can alert on or hard-fail; `assert_table` raises on the
first failure with the counts in the message.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    # a Column predicate that is TRUE for VIOLATING rows
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def accepted_range(
    col: str, lo: float | None = None, hi: float | None = None
) -> Check:
    c = F.col(col)
    v = F.lit(False)
    if lo is not None:
        v = v | (c < lo)
    if hi is not None:
        v = v | (c > hi)
    return Check(f"accepted_range({col},{lo},{hi})", v & c.isNotNull())


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def expression(name: str, violation: Column) -> Check:
    """Escape hatch for cross-column expectations (e.g. a stored
    length column must equal the recomputed length). `violation` is
    TRUE for violating rows; it folds into the same single-scan agg
    as the built-in row-level checks."""
    return Check(f"expression({name})", violation)


def row_level(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All row-level checks in ONE scan: each check is a conditional
    count column of a single agg."""
    aggs = [
        F.sum(F.when(c.violation, 1).otherwise(0))
        .cast("long")
        .alias(c.name)
        for c in checks
    ]
    row = df.agg(*aggs)
    # backtick-quote: check names contain dots (float range bounds),
    # which a bare F.col would parse as struct-field access
    stacked = row.select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c.name) for c in checks]),
                F.array(*[F.col(f"`{c.name}`") for c in checks]),
            )
        ).alias("check", "n_violations")
    )
    return stacked.select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uniqueness: rows beyond the first per key are violations
    (groupBy on the key — uniform if the key is a real key)."""
    n_extra = (
        df.groupBy(*cols)
        .count()
        .agg(
            F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
            .cast("long")
            .alias("n")
        )
    )
    return n_extra.select(
        F.lit(f"unique({','.join(cols)})").alias("check"),
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def references(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Referential integrity: fact keys missing from the dimension.
    The dimension key set is broadcast — the fact side never
    shuffles for a DQ probe."""
    keys = dim.select(F.col(dim_col).alias(col)).distinct()
    n = (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .join(F.broadcast(keys), col, "left_anti")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return n.select(
        F.lit(f"references({col}->{dim_col})").alias("check"),
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def check_table(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[list[str]] | None = None,
    refs: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    out = row_level(df, checks) if checks else None
    for cols in unique_keys or []:
        u = unique(df, cols)
        out = u if out is None else out.unionByName(u)
    for col, dim, dim_col in refs or []:
        r = references(df, col, dim, dim_col)
        out = r if out is None else out.unionByName(r)
    if out is None:
        raise ValueError("no checks given")
    return out


def assert_table(df: DataFrame, **kwargs) -> None:
    from .presentation import presentation_frame

    failed = [
        (r["check"], r["n_violations"])
        for r in presentation_frame(
            check_table(df, **kwargs), what="data-quality checks"
        )
        if not r["passed"]
    ]
    if failed:
        raise AssertionError(f"data-quality failures: {failed}")


def check_on_write(
    df: DataFrame, path: str, checks: list[Check]
) -> dict[str, int]:
    """Gate-while-writing: materialize `df` to parquet AND collect
    every row-level violation count in the SAME single pass via the
    Observation API — the idiomatic Spark way to get ingest metrics
    for free on a production write. `check_table` costs one extra
    scan per gate; at 100 TB the write is the scan you already pay
    for, so the observed variant halves the I/O of a gated ingest.

    Returns {check_name: n_violations}. Accumulator-backed observe
    metrics are exact for foreach-style sinks and deterministic
    here because a parquet write runs each task once (speculative /
    retried tasks are the caveat the Spark docs put on observe —
    retries can double-count; on a retry-heavy cluster prefer the
    two-pass check_table for auditable numbers, or compare counts
    against it after the fact)."""
    from pyspark.sql import Observation

    obs = Observation("dq_gate")
    observed = df.observe(
        obs,
        *[
            F.sum(F.when(c.violation, 1).otherwise(0))
            .cast("long")
            .alias(c.name)
            for c in checks
        ],
    )
    observed.write.mode("overwrite").parquet(path)
    got = obs.get
    return {c.name: int(got[c.name]) for c in checks}


def observe_checks(
    df: DataFrame, checks: list[Check], name: str = "dq_gate"
) -> DataFrame:
    """Attach the row-level violation counters to a dataframe
    WITHOUT changing its rows — works on batch and STREAMING frames
    alike. On a stream the counts surface per micro-batch in
    StreamingQueryProgress.observedMetrics[name]: the continuous-
    ingest health signal (null spikes, range drift) with zero extra
    passes and zero state. Batch callers who also write should use
    check_on_write (same counters, plus the Observation handle)."""
    return df.observe(
        name,
        *[
            F.sum(F.when(c.violation, 1).otherwise(0))
            .cast("long")
            .alias(c.name)
            for c in checks
        ],
    )
