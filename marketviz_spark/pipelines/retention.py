"""Write-path lifecycle operators a long-lived 100 TB table needs:
right-to-be-forgotten purge and small-file compaction.

Neither has a reference counterpart (the reference's store is an
in-memory SQLite rebuilt per run); both are engine extensions the
driver exercises through pytest (write paths have no SQL-oracle
form).

Scale design:
- `purge_users` never rewrites the whole table. One column-pruned
  scan of (partition_col, user_col) finds the partitions that
  contain any target row (with partition stats / bucketing this
  becomes metadata-only); only those partitions are re-filtered and
  dynamically overwritten. Partitions left with ZERO surviving rows
  are removed explicitly — dynamic overwrite cannot express "replace
  with empty" (it only touches partitions present in the written
  frame), which would silently retain the purged rows.
- `compact` sizes the output file count from the actual input bytes
  (target_bytes per file). `cluster=True` range-partitions on the
  sort columns before writing — one shuffle that buys real data
  clustering (per-file min/max zone maps -> scan pruning on those
  columns); `cluster=False` is a shuffle-free coalesce for pure
  file-count repair.
"""

from __future__ import annotations

import math
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _unescape_partition(name: str) -> str:
    """Invert Hive/Spark directory-name escaping (%XX for special
    chars like ':' '%' '#')."""
    out, i = [], 0
    while i < len(name):
        if name[i] == "%" and i + 2 < len(name) + 1:
            try:
                out.append(chr(int(name[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(name[i])
        i += 1
    return "".join(out)


def _partition_dirs(path: str, partition_col: str) -> dict[str, str]:
    """Map partition VALUE -> actual directory name, decoding the
    on-disk escaping. Never rebuild a directory name from a value:
    Spark escapes special characters ('day=a:1' is written as
    'day=a%3A1'), so a synthesized f\"{col}={value}\" path silently
    misses the real directory."""
    prefix = f"{partition_col}="
    return {
        _unescape_partition(d[len(prefix):]): d
        for d in os.listdir(path)
        if d.startswith(prefix)
    }


def purge_users(
    spark: SparkSession,
    path: str,
    user_ids: Sequence[int],
    partition_col: str = "day",
    user_col: str = "user_id",
) -> dict[str, int]:
    """Delete every row of `user_ids` from a `partition_col`-
    partitioned parquet table, rewriting only the partitions that
    contain them. Returns counts for the audit log a deletion
    pipeline must keep: partitions_scanned / rewritten / dropped,
    rows_deleted.

    Idempotent: a second run finds no affected partitions.
    """
    ids = [int(u) for u in user_ids]
    table = spark.read.parquet(path)
    all_parts = _partition_dirs(path, partition_col)
    hit = F.col(user_col).isin(ids)
    from .presentation import MAX_PARTITION_LIST, presentation_frame

    affected = [
        r[0]
        for r in presentation_frame(
            table.filter(hit).select(partition_col).distinct(),
            MAX_PARTITION_LIST,
            "retention: affected partition list",
        )
    ]
    if not affected:
        return {
            "partitions_scanned": len(all_parts),
            "partitions_rewritten": 0,
            "partitions_dropped": 0,
            "rows_deleted": 0,
        }
    in_affected = F.col(partition_col).isin(affected)
    rows_deleted = table.filter(in_affected & hit).count()
    survivors = table.filter(in_affected & ~hit)
    kept_parts = {
        str(r[0])
        for r in presentation_frame(
            survivors.select(partition_col).distinct(),
            MAX_PARTITION_LIST,
            "retention: surviving partition list",
        )
    }
    (
        survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    # Partitions whose every row was purged: dynamic overwrite never
    # saw them — drop their directories (metastore: DROP PARTITION).
    # Resolve via the on-disk listing (escaped names), and FAIL if a
    # fully-purged partition's directory cannot be found: returning
    # success while rows remain would falsify the audit log.
    dropped = 0
    for part in affected:
        if str(part) not in kept_parts and part is not None:
            d = all_parts.get(str(part))
            if d is None:
                raise RuntimeError(
                    f"purge_users: no directory found for fully-"
                    f"purged partition {partition_col}={part!r}"
                )
            shutil.rmtree(os.path.join(path, d))
            dropped += 1
    return {
        "partitions_scanned": len(all_parts),
        "partitions_rewritten": len(kept_parts),
        "partitions_dropped": dropped,
        "rows_deleted": rows_deleted,
    }


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet")
        ]
    return out


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] = (),
    cluster: bool = False,
) -> dict[str, int]:
    """Rewrite a parquet directory into ~target_bytes files,
    optionally range-clustered + sorted on `sort_cols`. Returns the
    before/after file counts."""
    files_before = _data_files(path)
    total = sum(os.path.getsize(f) for f in files_before)
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if cluster and sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols)
    else:
        df = df.coalesce(n_files)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    staged = df.localCheckpoint(eager=True)
    staged.write.mode("overwrite").parquet(path)
    return {
        "files_before": len(files_before),
        "files_after": len(_data_files(path)),
    }
