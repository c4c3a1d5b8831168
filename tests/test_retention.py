"""Write-path lifecycle: right-to-be-forgotten purge (partition-
pruned rewrite) and small-file compaction."""

from __future__ import annotations

import os
import tempfile

import pytest

from marketviz_spark import tables
from marketviz_spark.pipelines.retention import (
    _data_files,
    compact,
    purge_users,
)
from tests.conftest import SF_SMALL

from pyspark.sql import functions as F


@pytest.fixture()
def events_table(spark):
    """events partitioned by day, rewritten so the victim users live
    ONLY in known partitions: user 7777 owns ALL of 2024-01-02 (the
    drop-empty-partition path) and user 8888 owns half of
    2024-01-03 (the partial-rewrite path)."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_part")
        ev = tables.load_events(spark, SF_SMALL).withColumn(
            "day", F.to_date("ts").cast("string")
        )
        # real user_ids span every day; shift them out of the victim
        # range first so the victims' partitions are fully known
        ev = ev.withColumn("user_id", F.col("user_id") + 10_000)
        ev = ev.withColumn(
            "user_id",
            F.when(F.col("day") == "2024-01-02", F.lit(7777))
            .when(
                (F.col("day") == "2024-01-03")
                & (F.col("event_id") % 2 == 0),
                F.lit(8888),
            )
            .otherwise(F.col("user_id")),
        )
        ev.write.partitionBy("day").parquet(path)
        yield spark, path, ev


def test_purge_users_partition_pruned(events_table):
    spark, path, ev = events_table
    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("day=")
    }
    victims = [7777, 8888]
    stats = purge_users(spark, path, victims, partition_col="day")
    after = spark.read.parquet(path)
    # every victim row is gone, everything else survives intact
    assert after.filter(F.col("user_id").isin(victims)).count() == 0
    want = ev.filter(~F.col("user_id").isin(victims))
    assert after.count() == want.count()
    assert stats["rows_deleted"] > 0
    # the all-victim partition was dropped entirely
    assert not os.path.isdir(os.path.join(path, "day=2024-01-02"))
    assert stats["partitions_dropped"] == 1
    # untouched partitions keep their exact files (no rewrite)
    touched = {"day=2024-01-02", "day=2024-01-03"}
    for d, files in before.items():
        if d not in touched and os.path.isdir(os.path.join(path, d)):
            assert (
                sorted(os.listdir(os.path.join(path, d))) == files
            ), d
    # idempotent: nothing left to purge
    again = purge_users(spark, path, victims, partition_col="day")
    assert again["rows_deleted"] == 0
    assert again["partitions_rewritten"] == 0


def test_compact_reduces_files_and_sorts(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "frag")
        ev = tables.load_events(spark, SF_SMALL)
        n = ev.count()
        ev.repartition(37).write.parquet(path)  # fragment it
        assert len(_data_files(path)) >= 37
        stats = compact(
            spark,
            path,
            target_bytes=64 * 1024 * 1024,
            sort_cols=("user_id", "ts"),
            cluster=True,
        )
        assert stats["files_after"] < stats["files_before"]
        after = spark.read.parquet(path)
        assert after.count() == n
        # each output file is internally sorted on the cluster key
        for f in _data_files(path):
            part = spark.read.parquet(f).select("user_id").collect()
            vals = [r[0] for r in part]
            assert vals == sorted(vals), f


def test_purge_users_escaped_partition_value(spark):
    """Partition values Spark escapes on disk ('a:1' -> 'day=a%3A1')
    must still purge and drop correctly — synthesizing the directory
    name from the value would silently retain the rows."""
    import tempfile as _tf

    with _tf.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        df = spark.createDataFrame(
            [(7777, "a:1", 1.0), (7777, "a:1", 2.0), (5, "b", 3.0)],
            "user_id long, day string, v double",
        )
        df.write.partitionBy("day").parquet(path)
        stats = purge_users(spark, path, [7777], partition_col="day")
        after = spark.read.parquet(path)
        assert after.filter("user_id = 7777").count() == 0
        assert after.count() == 1
        assert stats["rows_deleted"] == 2
        assert stats["partitions_dropped"] == 1
        assert not any(
            "a%3A1" in p or "a:1" in p for p in os.listdir(path)
        )
