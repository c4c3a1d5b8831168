"""Schema evolution for long-lived parquet tables: old files keep
their written schema, new files add columns, and readers see ONE
stable schema with declared defaults backfilled.

Why this shape: a 100 TB table is never rewritten to add a column.
`mergeSchema` unions the per-file schemas at planning time (footer
metadata only — no data scan), rows from pre-evolution files surface
NULL for the new columns, and the declared defaults turn those NULLs
into the values the column would have had. Readers keep full column
pruning and predicate pushdown — the coalesce is a projection over
the scan, not a rewrite.

The reference app has no schema evolution (its sqlite tables are
CREATE'd once, database_manager.py); this is an engine extension for
the deployment target, where ingestion schemas drift monthly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolved(
    spark: SparkSession,
    path: str,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Read a parquet table whose files were written under multiple
    schema versions. `defaults` maps column name -> value used where
    pre-evolution files have no such column (NULL otherwise). A
    default for a column every file lacks raises in `select` —
    misspelled names fail loudly rather than silently adding a
    constant column.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, val in (defaults or {}).items():
        df = df.withColumn(
            col, F.coalesce(F.col(col), F.lit(val))
        )
    return df


def evolution_report(
    spark: SparkSession, path: str
) -> list[tuple[str, str]]:
    """Footer-only audit of which columns the merged schema carries
    beyond a representative file's schema (the file Spark samples
    when mergeSchema is off — NOT guaranteed to be the oldest, so
    treat 'evolved' as 'absent from at least the sampled file').
    The planning-time check an ingest job runs before declaring a
    new column 'live'. Returns (column, status) with status in
    {'base', 'evolved'}."""
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    base = spark.read.parquet(path)  # sampled-file schema
    base_cols = set(base.columns)
    return [
        (c, "base" if c in base_cols else "evolved")
        for c in merged.columns
    ]
