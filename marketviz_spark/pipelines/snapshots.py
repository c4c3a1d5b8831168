"""Manifest-based dataset snapshots: the reproducibility layer a
training pipeline needs (every run pins the EXACT file set it
trained on), built on plain parquet + JSON manifests — no table
format dependency.

Layout under a table root:

    root/versions/<N>/*.parquet      immutable data files
    root/manifests/<N>.json          {"version", "files", "n_rows"}
    root/LATEST                      text pointer, atomically renamed

Why manifests instead of directory listing: a snapshot read loads
ONLY the files its manifest names, so late-arriving files, partial
writes, or a concurrent writer's new version can never leak into an
old read (the core isolation idea of Iceberg/Delta, minus their
metadata trees). Version directories are immutable — a new write is
a NEW version + manifest + pointer flip, and `rollback` is just a
pointer flip back, leaving every version readable.

Scale notes: the manifest holds file paths (KB-scale for thousands
of files), read once on the driver; data files stream through
executors as any parquet scan. The pointer flip is an atomic rename
on posix/HDFS-like stores; object stores would use a conditional
put — the commit protocol is the swappable part, the manifest
contract is not.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "manifests")


def _latest_path(root: str) -> str:
    return os.path.join(root, "LATEST")


def list_versions(root: str) -> list[int]:
    md = _manifest_dir(root)
    if not os.path.isdir(md):
        return []
    return sorted(
        int(f.removesuffix(".json"))
        for f in os.listdir(md)
        if f.endswith(".json")
    )


def latest_version(root: str) -> int | None:
    p = _latest_path(root)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def _read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(root), f"{version}.json")) as fh:
        return json.load(fh)


def write_snapshot(df: DataFrame, root: str) -> int:
    """Write `df` as the next version and flip LATEST to it.
    Returns the new version number."""
    version = (max(list_versions(root), default=0)) + 1
    data_dir = os.path.join(root, "versions", str(version))
    df.write.mode("errorifexists").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    # row count from the parquet footers — metadata reads, not a
    # second full scan of data just written
    import pyarrow.parquet as pq

    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    os.makedirs(_manifest_dir(root), exist_ok=True)
    manifest = {"version": version, "files": files, "n_rows": n_rows}
    # manifest then pointer, both via atomic rename: a reader either
    # sees the complete new version or the old one, never a partial
    for payload, target in (
        (json.dumps(manifest, indent=1),
         os.path.join(_manifest_dir(root), f"{version}.json")),
        (str(version), _latest_path(root)),
    ):
        fd, tmp = tempfile.mkstemp(dir=root)
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        os.replace(tmp, target)
    return version


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (default: LATEST). Loads ONLY the files
    the manifest names — stray files in the directory are invisible
    by design."""
    if version is None:
        version = latest_version(root)
        if version is None:
            raise FileNotFoundError(f"no snapshots under {root}")
    m = _read_manifest(root, version)
    return spark.read.parquet(*m["files"])


def rollback(root: str, version: int) -> None:
    """Point LATEST back at an existing version (pure pointer flip;
    no data moves, every version stays readable)."""
    _read_manifest(root, version)  # must exist
    fd, tmp = tempfile.mkstemp(dir=root)
    with os.fdopen(fd, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, _latest_path(root))


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    keys: list[str],
) -> DataFrame:
    """Change-data-capture between two pinned versions: (keys...,
    change_type in added/removed/changed). Non-key columns compare
    via an md5 row hash (null-distinguishing separator), so the
    join carries keys + one hash per side — never the full row
    payload. Key-partitioned full outer join: uniform if `keys` is
    a real key.

    Schema evolution: each side hashes ITS OWN non-key columns,
    with the column NAME inside every fragment — so adding or
    dropping a column between versions marks surviving rows
    'changed' (every row did gain/lose a field) instead of crashing
    on the missing column or silently comparing a subset."""
    from pyspark.sql import functions as F

    a = read_snapshot(spark, root, v_old)
    b = read_snapshot(spark, root, v_new)

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        non_keys = sorted(c for c in df.columns if c not in keys)
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.concat(
                        F.lit(f"{c}="),
                        F.coalesce(
                            F.col(c).cast("string"), F.lit("\x00null")
                        ),
                    )
                    for c in non_keys
                ],
            )
        )
        return df.select(*keys, h.alias(f"_h_{tag}"))

    o, n = hashed(a, "o"), hashed(b, "n")
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_h_o").isNull(), F.lit("added"))
        .when(F.col("_h_n").isNull(), F.lit("removed"))
        .when(F.col("_h_o") != F.col("_h_n"), F.lit("changed"))
    )
    return (
        j.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
