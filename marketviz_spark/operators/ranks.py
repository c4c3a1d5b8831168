"""Distributed exact rank / prefix sum — the shared
extreme-cardinality path promised by skew_report (Gini),
customer_rfm (quintiles), and token_budget_prefix (hot-source
cumsum), whose docstrings previously documented a single global
sort as the honest cost.

Two-phase range-partitioned rank:

1. ``repartitionByRange`` on the FULL composite sort key. The
   caller must supply a total order (include a unique tiebreak
   column): unique keys mean Spark's range sampler splits the data
   evenly even when the leading value is heavily tied — the classic
   skew failure of bucketing on the value alone (a billion rows
   with cnt=1 land in one bucket; with the tiebreak in the range
   key they spread across all of them). The partition count is
   passed explicitly so AQE never coalesces the exchange out from
   under the partition-id bookkeeping below.
2. Within each range partition: an ordinary window PARTITIONED by
   the physical partition id (parallel, never a single task), plus
   a broadcast exclusive-prefix offset table — one row per
   partition (or per group x partition), cumulated by a tiny
   triangle self-join, never an unpartitioned window.

Exactness: range boundaries respect the global sort order, so
within-partition rank + offset is bit-identical to the
single-partition ``row_number()`` it replaces — the DuckDB oracles
of all three consumers are unchanged.

The ranged frame is pinned with a lazy ``localCheckpoint`` before
it fans out to the rank and offset branches. This is load-bearing,
not an optimization: Spark's RangePartitioner reseeds its reservoir
sample on every evaluation of the exchange, so without the pin the
two branches can sample DIFFERENT partition boundaries and the
offsets no longer describe the partitions the ranks were computed
in (observed: ranks off by a partition-boundary's worth of rows).
Any single boundary set yields the exact global rank — the pin only
guarantees both branches see the same one. localCheckpoint fails
loudly if an executor holding blocks is lost (same semantics as the
pagerank/dedup-clusters lineage cuts; see their
``reliable_checkpoint`` note for real clusters).

Cost: one shuffle + one local materialization of the input (narrow
projections only — callers select the rank columns first), then a
key-table-sized hash shuffle for the partition-id window, which
exists because Catalyst cannot know the window's partition key
equals the physical layout. An RDD ``zipWithIndex`` would avoid
that second shuffle but leaves the DataFrame/Arrow path and AQE —
not worth it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _num_partitions(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


# Offset frames up to this many rows are force-broadcast; beyond it
# (extreme group cardinality x parallelism) the joins fall back to
# Catalyst's own strategy choice, trading a shuffle for driver
# safety. 4M rows of (group, _pid, long) is tens of MB — well inside
# a normal driver but a deliberate ceiling.
_BROADCAST_OFFSET_ROWS = 4_000_000


def _small(n_groups_hint: int | None, p: int) -> bool:
    return (
        n_groups_hint is None
        or n_groups_hint * p <= _BROADCAST_OFFSET_ROWS
    )


def _offsets(
    counts: DataFrame,
    group_cols: list[str],
    val: str,
    broadcast_ok: bool = True,
) -> DataFrame:
    """Exclusive prefix sum of `val` over `_pid` order (per group):
    a triangle self-join over the per-(group x partition) count
    frame — ``counts`` is one row per (group x partition), so the
    join is at most groups x partitions^2 pair rows (partitions^2
    when ungrouped). Broadcast both ways while the group cardinality
    bound holds (see _BROADCAST_OFFSET_ROWS), no window either way."""
    a, b = counts.alias("a"), counts.alias("b")
    cond = F.col("b._pid") < F.col("a._pid")
    for g in group_cols:
        cond = cond & (F.col(f"b.{g}") == F.col(f"a.{g}"))
    return (
        a.join(F.broadcast(b) if broadcast_ok else b, cond, "left")
        .groupBy(
            *[F.col(f"a.{g}").alias(g) for g in group_cols],
            F.col("a._pid").alias("_pid"),
        )
        .agg(
            F.coalesce(F.sum(f"b.{val}"), F.lit(0))
            .cast("long")
            .alias("_off")
        )
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    out: str,
    num_partitions: int | None = None,
    n_groups_hint: int | None = None,
) -> DataFrame:
    """`df` plus a BIGINT column `out` = the row_number within each
    `group_cols` group over `order_cols` (which must total-order the
    group), computed without funnelling any group through one task.
    One ranged pass ranks EVERY group — callers with several
    independent rank problems should melt them into one frame with a
    group column rather than invoke this per problem (one shuffle +
    one checkpoint instead of N; see skew_report / customer_rfm).

    The offset table is (groups x partitions) rows; it is broadcast
    only while that stays under _BROADCAST_OFFSET_ROWS. Pass
    `n_groups_hint` (an upper bound on group cardinality) when the
    group column can be huge so the plan degrades to a shuffle join
    instead of pressuring the driver."""
    p = num_partitions or _num_partitions(df)
    bcast = _small(n_groups_hint, p)
    ranged = (
        df.repartitionByRange(
            p, *[F.col(g) for g in group_cols], *order_cols
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # see module docstring
    )
    w = Window.partitionBy(*group_cols, "_pid").orderBy(*order_cols)
    within = ranged.withColumn("_r", F.row_number().over(w))
    counts = ranged.groupBy(*group_cols, "_pid").agg(
        F.count("*").cast("long").alias("_c")
    )
    offs = _offsets(counts, group_cols, "_c", broadcast_ok=bcast)
    return (
        within.join(F.broadcast(offs) if bcast else offs,
                    [*group_cols, "_pid"])
        .withColumn(out, (F.col("_off") + F.col("_r")).cast("long"))
        .drop("_pid", "_r", "_off")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """`df` plus a BIGINT column `out` = the global row_number over
    `order_cols` (which must form a total order), computed without a
    single-partition window."""
    return grouped_row_number(df, [], order_cols, out, num_partitions)


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    value_col: str,
    out: str,
    num_partitions: int | None = None,
    n_groups_hint: int | None = None,
) -> DataFrame:
    """`df` plus a BIGINT column `out` = the running sum of
    `value_col` within each `group_cols` group in `order_cols` order
    (inclusive of the current row), computed without funnelling a
    hot group through one task: the range key is (group, order...),
    so a group larger than one partition spans several contiguous
    partitions, each summed in parallel, stitched by the per
    (group, partition) offset table — broadcast only under the
    _BROADCAST_OFFSET_ROWS bound (see grouped_row_number on
    `n_groups_hint`; the per-source cumsum in token_budget_prefix is
    exactly the high-cardinality-group caller this protects)."""
    p = num_partitions or _num_partitions(df)
    bcast = _small(n_groups_hint, p)
    ranged = (
        df.repartitionByRange(
            p, *[F.col(g) for g in group_cols], *order_cols
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # see module docstring
    )
    w = (
        Window.partitionBy(*group_cols, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = ranged.withColumn(
        "_r", F.sum(value_col).over(w).cast("long")
    )
    counts = ranged.groupBy(*group_cols, "_pid").agg(
        F.sum(value_col).cast("long").alias("_c")
    )
    offs = _offsets(counts, group_cols, "_c", broadcast_ok=bcast)
    return (
        within.join(F.broadcast(offs) if bcast else offs,
                    [*group_cols, "_pid"])
        .withColumn(out, (F.col("_off") + F.col("_r")).cast("long"))
        .drop("_pid", "_r", "_off")
    )
