"""Skew diagnosis: per-join-key distribution report.

The operational question behind every salting/AQE decision in this
repo (`skew_salted_join`, `skew_salted_agg`, AQE skew-join): HOW
skewed is a key, measured — not guessed. For each audited key
column this emits the key count, the heaviest key and its share,
the top-10 share, and the Gini coefficient of the count
distribution, all integer-exact (ppm divisions):

    gini_ppm = ((2·Σ i·c_i − (n+1)·S) · 10⁶) div (n·S)

with counts ranked ascending (i = 1..n; rank ties between equal
counts cannot change Σ i·c_i, so the tiebreak only pins the
engines to the same top_key). 0 = uniform, → 10⁶ = one key owns
everything. A pipeline reads this BEFORE choosing a join strategy:
gini near 0 and top-1 share under a few percent → plain hash join;
high gini or a fat top key → salt it or broadcast the other side.

Scale: the per-key count table is the groupBy output (≪ data), and
the exact rank over it runs the shared two-phase range-partitioned
path (operators/ranks.py): range-split on the unique (cnt, key)
composite, rank within partitions, broadcast offsets — no
single-partition window even at extreme key cardinality, and the
result is bit-identical to the single-sort rank it replaced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ranks import grouped_row_number

# (output label, table, key column)
SKEW_COLUMNS: list[tuple[str, str, str]] = [
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
]


def _counts_one(df: DataFrame, label: str, key: str) -> DataFrame:
    # k cast to long up front: the union across audited columns needs
    # one key type (injective for integer keys, so counts/order keep).
    # Guard the injectivity assumption: a non-integer audit column
    # would cast to NULL and silently collapse every key into one
    # group — fail loudly instead.
    dtype = dict(df.dtypes)[key]
    if dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"skew_report audits integer keys only; {key} is {dtype}"
        )
    return df.groupBy(F.col(key).cast("long").alias("k")).agg(
        F.count("*").cast("long").alias("cnt")
    ).select(F.lit(label).alias("source_col"), "k", "cnt")


def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import tables

    # ONE ranked pass over the union of the per-key count tables —
    # the audited columns are groups of a single grouped rank, not
    # three separate rank jobs (one ranged shuffle + one lineage
    # pin instead of three).
    counts = None
    for label, table, key in SKEW_COLUMNS:
        one = _counts_one(tables.load(spark, sf_dir, table), label, key)
        counts = one if counts is None else counts.unionByName(one)
    n1 = counts.groupBy("source_col").agg(
        F.count("*").cast("long").alias("n_all")
    )
    ranked = grouped_row_number(
        counts, ["source_col"], [F.asc("cnt"), F.asc("k")], "i"
    ).join(F.broadcast(n1), "source_col")
    grouped = ranked.groupBy("source_col").agg(
        F.sum("cnt").cast("long").alias("s"),
        F.count("*").cast("long").alias("n"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.max(F.when(F.col("i") == F.col("n_all"), F.col("k")))
        .cast("long")
        .alias("top_key"),
        F.sum(F.col("i") * F.col("cnt")).cast("long").alias("ic"),
        F.sum(
            F.when(F.col("i") > F.col("n_all") - 10, F.col("cnt"))
        )
        .cast("long")
        .alias("top10"),
    )
    # A grouped aggregate emits no groups on empty input, but the
    # oracle is one scalar aggregate per audited column (UNION ALL
    # sides) and so emits one row per label even over empty facts:
    # NULL stats, except count(*) = 0. Left-join the grouped result
    # onto the static label frame to pin that shape (labels are
    # literals; the frame is 3 rows, broadcast both sides — trivial).
    labels = spark.createDataFrame(
        [(label,) for label, _, _ in SKEW_COLUMNS],
        "source_col string",
    )
    return labels.join(F.broadcast(grouped), "source_col", "left").select(
        "source_col",
        F.col("s").alias("n_rows"),
        # The oracle's scalar count(*) is 0 (not NULL) on empty input.
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_keys"),
        "max_cnt",
        "top_key",
        F.expr("(max_cnt * 1000000) div s").alias("top1_share_ppm"),
        F.expr("(top10 * 1000000) div s").alias("top10_share_ppm"),
        F.expr(
            "((2 * ic - (n + 1) * s) * 1000000) div (n * s)"
        ).alias("gini_ppm"),
    )


def skew_report_oracle_sql() -> str:
    def side(label: str, table: str, key: str) -> str:
        return f"""
    SELECT '{label}' AS source_col,
           CAST(s AS BIGINT) AS n_rows,
           CAST(n AS BIGINT) AS n_keys,
           CAST(max_cnt AS BIGINT) AS max_cnt,
           CAST(top_key AS BIGINT) AS top_key,
           CAST((max_cnt * 1000000) // s AS BIGINT) AS top1_share_ppm,
           CAST((top10 * 1000000) // s AS BIGINT) AS top10_share_ppm,
           CAST(((2 * ic - (n + 1) * s) * 1000000) // (n * s)
                AS BIGINT) AS gini_ppm
    FROM (
        SELECT sum(cnt) AS s, count(*) AS n, max(cnt) AS max_cnt,
               max(CASE WHEN i = n_all THEN k END) AS top_key,
               sum(i * cnt) AS ic,
               sum(CASE WHEN i > n_all - 10 THEN cnt END) AS top10
        FROM (
            SELECT k, cnt,
                   CAST(row_number() OVER (ORDER BY cnt, k) AS BIGINT)
                       AS i,
                   count(*) OVER () AS n_all
            FROM (SELECT {key} AS k,
                         CAST(count(*) AS BIGINT) AS cnt
                  FROM {table} GROUP BY {key})
        )
    )"""

    return "\nUNION ALL\n".join(
        side(label, table, key)
        for label, table, key in SKEW_COLUMNS
    )
