"""Schema evolution for long-lived parquet tables: old files keep
their written schema, new files add columns, and readers see ONE
stable schema with declared defaults backfilled.

Why this shape: a 100 TB table is never rewritten to add a column.
`mergeSchema` unions the per-file schemas at planning time (footer
metadata only — no data scan), rows from pre-evolution files surface
NULL for the new columns, and the declared defaults turn those NULLs
into the values the column would have had. Readers keep full column
pruning and predicate pushdown — the default is a projection over
the scan, not a rewrite.

Default semantics (strict mode, the default): a declared default
applies ONLY to rows from files that physically lack the column —
an explicitly-written NULL in a post-evolution file means "value
unknown" and is preserved, exactly like a SQL column DEFAULT. The
file set lacking each column comes from a footer scan (driver-side
metadata; a production deployment reads the same fact from its
catalog/manifest instead of listing footers), and rows are routed by
`input_file_name()` — a map-side expression, no extra data pass.
`strict=False` degrades to a plain coalesce (ALL NULLs filled,
including written ones) for when footers are unavailable.

The reference app has no schema evolution (its sqlite tables are
CREATE'd once, database_manager.py); this is an engine extension for
the deployment target, where ingestion schemas drift monthly.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _files_lacking_column(path: str, col: str) -> list[str]:
    """Absolute paths of parquet files under `path` whose footer
    schema has no column `col` (footer-only, no data read). Full
    paths, not basenames: two partition subdirectories can both
    contain a `part-00000-….parquet`."""
    import pyarrow.parquet as pq

    lacking = []
    for f in glob.glob(
        os.path.join(path, "**", "*.parquet"), recursive=True
    ):
        if col not in pq.read_schema(f).names:
            lacking.append(os.path.abspath(f))
    return lacking


def read_evolved(
    spark: SparkSession,
    path: str,
    defaults: dict[str, object] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Read a parquet table whose files were written under multiple
    schema versions, backfilling `defaults` for columns absent from
    pre-evolution files.

    strict=True (default): the default fills only rows from files
    that LACK the column; NULLs explicitly written by files that
    have it are preserved (SQL column-DEFAULT semantics).
    strict=False: plain coalesce — every NULL in the column is
    filled, including intentionally-written ones.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if not defaults:
        return df
    # input_file_name() yields a URI (file:///abs/path); strip the
    # scheme so it compares equal to the glob's absolute paths.
    # Spark part-file names contain no URI-escaped characters.
    fpath = F.regexp_replace(
        F.input_file_name(), r"^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", ""
    )
    for col, val in defaults.items():
        if col not in df.columns:
            # A default declared for a column no file carries:
            # F.col(col) would be unresolvable, and mergeSchema
            # never adds it — materialize the constant directly.
            df = df.withColumn(col, F.lit(val))
            continue
        if not strict:
            df = df.withColumn(
                col, F.coalesce(F.col(col), F.lit(val))
            )
            continue
        lacking = _files_lacking_column(path, col)
        df = df.withColumn(
            col,
            F.when(fpath.isin(lacking), F.lit(val)).otherwise(
                F.col(col)
            ),
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
