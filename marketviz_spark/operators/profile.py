"""ANALYZE-style column profiling: per-column row/null/NDV stats.

The stats layer every warehouse keeps (Spark's own ``ANALYZE TABLE
… COMPUTE STATISTICS FOR COLUMNS`` writes the same shape into the
catalog): row count, null count, and number of distinct values per
column — what the CBO uses for join ordering and what a data-quality
gate diffs between loads.

Exactness contract: NDV here is EXACT ``count(distinct)`` so the
DuckDB oracle hashes bit-for-bit. That is also the honest cost
statement: one pass with N distinct-aggregates Expands the scan N-way
(each row fans into one record per profiled column) — the plan you
accept for an offline stats job. The estimation path for 100 TB —
HLL sketches, mergeable and one-pass without the Expand — is
exercised by `agg_approx_sketches` / the events HLL family; this
operator is the exact tier the sketches are audited against.

Scale notes: the Expand output partial-aggregates before its single
shuffle (hash by the synthetic grouping), so the wide stage moves
only the partial distinct sets; stats land as |columns| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_COLUMNS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def profile_columns(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """(column, n_rows, n_null, ndv) per profiled column — one scan,
    one wide aggregate, |columns| output rows."""
    cols = columns or PROFILE_COLUMNS
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(
            # coalesce: sum over ZERO rows is NULL; the oracle's
            # count(*)-count(c) is 0 on an empty table
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            )
            .cast("long")
            .alias(f"null_{c}")
        )
        aggs.append(
            F.countDistinct(c).cast("long").alias(f"ndv_{c}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', null_{c}, ndv_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column, n_null, ndv)"
        ),
        "n_rows",
    ).select("column", "n_rows", "n_null", "ndv")


def profile_oracle_sql(
    table: str = "lineitem", columns: list[str] | None = None
) -> str:
    cols = columns or PROFILE_COLUMNS
    parts = [
        f"""SELECT '{c}' AS column,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS ndv
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)
