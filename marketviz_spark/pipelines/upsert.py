"""S5-S7: table lifecycle + INSERT OR REPLACE semantics on parquet.

The reference upserts row-at-a-time into SQLite PK tables
(database_manager.py:34-44). Parquet has no PK, so:

- `upsert_by_date_partition` — the scale path: storage partitioned
  by date; rewriting a date's partition IS the upsert because the
  reference always recomputes whole dates (app.py:22-23). Dynamic
  partition overwrite touches only incoming dates; the rest of 100
  TB is never read or written.
- `upsert_merge` — the general path for non-partition keys:
  anti-join old vs new key set, union, rewrite (Delta MERGE
  semantics without Delta).
- `upsert_keyed` — backend dispatcher (SURVEY §1.2/§4.2 "Delta
  MERGE if available"): a real Delta `MERGE` when the delta-spark
  package + JVM classes are present (transactional, no full-table
  rewrite), else the anti-join path. Same observable semantics.

All are idempotent: re-running the same batch yields identical
table state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.joins import upsert as upsert_df


def table_exists(spark: SparkSession, path: str) -> bool:
    """S12-equivalent existence check for path-backed tables (the
    reference introspects sqlite_master, equal_weight_index.py:26-31;
    for catalog tables use spark.catalog.tableExists)."""
    import os

    return os.path.isdir(path) and any(
        f.endswith(".parquet") or f == "_SUCCESS"
        for f in os.listdir(path)
    )


def _cols(partition_col) -> list:
    return (
        [partition_col]
        if isinstance(partition_col, str)
        else list(partition_col)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_col="date"
) -> None:
    df.write.mode("overwrite").partitionBy(*_cols(partition_col)).parquet(
        path
    )


def upsert_by_date_partition(
    spark: SparkSession,
    new: DataFrame,
    path: str,
    partition_col="date",
) -> None:
    """Dynamic partition overwrite: only partitions present in `new`
    are replaced. `partition_col` may be a single column or a list;
    the partitioning MUST cover the full logical key of a row — an
    overwrite of a partition that holds keys absent from `new` would
    silently drop them (see stream_to_partitioned_table)."""
    if not table_exists(spark, path):
        write_partitioned(new, path, partition_col)
        return
    (
        new.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*_cols(partition_col))
        .parquet(path)
    )


def upsert_merge(
    spark: SparkSession,
    new: DataFrame,
    path: str,
    keys: list[str],
) -> None:
    """Anti-join + union rewrite for keyed upserts on unpartitioned
    storage. Reads the old table, so prefer the partition path at
    scale."""
    if not table_exists(spark, path):
        new.write.mode("overwrite").parquet(path)
        return
    existing = spark.read.parquet(path)
    merged = upsert_df(existing, new, keys)
    # Materialize before overwriting the path we read from.
    staged = merged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").parquet(path)


def delta_available(spark: SparkSession) -> bool:
    """Capability probe for Delta Lake: the python package AND the
    JVM-side classes must both be present (the package alone is not
    enough — the session needs the delta-spark jars)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        jvm = spark._jvm
        getattr(jvm.io.delta.tables, "DeltaTable")
        return True
    except Exception:
        return False


def upsert_keyed(
    spark: SparkSession,
    new: DataFrame,
    path: str,
    keys: list[str],
    backend: str = "auto",
) -> str:
    """Keyed INSERT-OR-REPLACE with backend dispatch; returns the
    backend used ('delta' or 'antijoin').

    - `delta`: transactional `MERGE INTO` via DeltaTable — matched
      rows update, unmatched insert; only touched files rewrite, so
      at 100 TB the write cost scales with the BATCH, not the table.
    - `antijoin`: upsert_merge (anti-join + union + full rewrite) —
      correct everywhere parquet works, table-sized writes.
    - `auto`: delta when available, else antijoin — the SURVEY §1.2
      preference order.
    """
    if backend == "auto":
        backend = "delta" if delta_available(spark) else "antijoin"
    if backend == "antijoin":
        upsert_merge(spark, new, path, keys)
        return "antijoin"
    if backend != "delta":
        raise ValueError(f"unknown upsert backend: {backend!r}")
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, path):
        new.write.format("delta").mode("overwrite").save(path)
        return "delta"
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, path)
        .alias("t")
        .merge(new.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return "delta"
