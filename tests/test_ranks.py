"""operators/ranks.py — the shared two-phase range-partitioned
exact rank / prefix sum: bit-parity with the single-partition
window forms it replaces, including when a group is larger than a
partition and when the leading sort value is one giant tie."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from marketviz_spark.operators.ranks import (
    global_row_number,
    grouped_prefix_sum,
)


def _skewed_df(spark, n=5000):
    # 80% of rows share value 1 (one giant tie) — the shape that
    # breaks value-bucketed ranking; id is the unique tiebreak
    return spark.range(n).select(
        F.col("id").cast("long").alias("id"),
        F.when(F.col("id") % 5 < 4, F.lit(1))
        .otherwise(F.col("id") % 97)
        .cast("long")
        .alias("v"),
        (F.col("id") % 3).cast("long").alias("g"),
    )


def test_global_row_number_matches_window(spark):
    df = _skewed_df(spark)
    got = {
        r["id"]: r["rk"]
        for r in global_row_number(
            df, [F.asc("v"), F.asc("id")], "rk", num_partitions=7
        ).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.asc("v"), F.asc("id")))
            .cast("long")
            .alias("rk"),
        ).collect()
    }
    assert got == want


def test_global_row_number_desc_and_single_row(spark):
    df = _skewed_df(spark, n=1)
    [row] = global_row_number(
        df, [F.desc("v"), F.asc("id")], "rk"
    ).collect()
    assert row["rk"] == 1


def test_grouped_prefix_sum_matches_window(spark):
    df = _skewed_df(spark)
    # num_partitions=7 >> 3 groups: every group spans partitions,
    # exercising the cross-partition offset stitching
    got = {
        r["id"]: r["cum"]
        for r in grouped_prefix_sum(
            df,
            ["g"],
            [F.desc("v"), F.asc("id")],
            "v",
            "cum",
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy(F.desc("v"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: r["cum"]
        for r in df.select(
            "id", F.sum("v").over(w).cast("long").alias("cum")
        ).collect()
    }
    assert got == want


def test_grouped_prefix_sum_empty(spark):
    df = _skewed_df(spark).filter("id < 0")
    assert (
        grouped_prefix_sum(
            df, ["g"], [F.asc("id")], "v", "cum"
        ).count()
        == 0
    )


def test_grouped_row_number_matches_window(spark):
    from marketviz_spark.operators.ranks import grouped_row_number

    df = _skewed_df(spark)
    got = {
        r["id"]: r["rk"]
        for r in grouped_row_number(
            df,
            ["g"],
            [F.desc("v"), F.asc("id")],
            "rk",
            num_partitions=7,
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = {
        r["id"]: r["rk"]
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("rk")
        ).collect()
    }
    assert got == want


def test_high_cardinality_hint_degrades_to_shuffle_join(spark):
    """An n_groups_hint over the broadcast bound must flip the
    offset joins to Catalyst's own strategy (no forced broadcast —
    the driver-safety path for huge group columns) while keeping
    bit-parity with the windowed form."""
    from marketviz_spark.operators.ranks import (
        _BROADCAST_OFFSET_ROWS,
        grouped_prefix_sum,
        grouped_row_number,
    )

    df = _skewed_df(spark)
    big = _BROADCAST_OFFSET_ROWS  # hint*partitions > bound for any p>=1
    ranked = grouped_row_number(
        df,
        ["g"],
        [F.desc("v"), F.asc("id")],
        "rk",
        num_partitions=7,
        n_groups_hint=big,
    )
    # The guarantee is no FORCED broadcast (AQE may still choose one
    # for a genuinely tiny frame) — so assert the hint is absent from
    # the analyzed logical plan, not the physical strategy.
    logical = ranked._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical
    assert "broadcast" not in logical.lower(), (
        "degraded path must not attach a broadcast hint"
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = {
        r["id"]: r["rk"]
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("rk")
        ).collect()
    }
    got = {r["id"]: r["rk"] for r in ranked.collect()}
    assert got == want

    wsum = (
        Window.partitionBy("g")
        .orderBy(F.desc("v"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want_cum = {
        r["id"]: r["cum"]
        for r in df.select(
            "id", F.sum("v").over(wsum).cast("long").alias("cum")
        ).collect()
    }
    got_cum = {
        r["id"]: r["cum"]
        for r in grouped_prefix_sum(
            df,
            ["g"],
            [F.desc("v"), F.asc("id")],
            "v",
            "cum",
            num_partitions=7,
            n_groups_hint=big,
        ).collect()
    }
    assert got_cum == want_cum
