"""CUSUM changepoint detection over daily event volumes.

The classic offline CUSUM statistic for a level shift: with daily
counts x_1..x_n (per event type), mean m = T/n, the cumulative
deviation C_t = sum_{i<=t}(x_i - m) peaks at the most likely change
point. Multiplying through by n keeps everything integral:

    C'_t = n * P_t - t * T      (P_t prefix sum, T total)

which is n * C_t — the argmax is unchanged, and both engines hash
the identical integers. The reported magnitude is normalized to
ppm of the n*T scale bound, again by integer division.

Scale (100 TB): the heavy input is reduced FIRST by a map-side-
combinable (type, day) count — after that every window runs over
per-type series whose length is the number of calendar days, not
the number of events. Partitioning is by event_type, so parallelism
equals the type cardinality; a series of even a century of days is
a few-KB partition. Products are accumulated in DECIMAL(38,0)
(HUGEINT on the oracle side) so n*P_t cannot overflow int64 at
real-world totals; outputs are CAST back to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def cusum_changepoint(daily: DataFrame) -> DataFrame:
    """(event_type, day, n_events) -> one row per type: the CUSUM
    changepoint day, its scaled magnitude, and the ppm-normalized
    share (1e6 * max|C'| div (n*T))."""
    by_type = Window.partitionBy("event_type")
    ordered = by_type.orderBy("day")
    cum = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = F.col("n_events").cast(_DEC)
    scored = daily.select(
        "event_type",
        "day",
        F.row_number().over(ordered).cast(_DEC).alias("t"),
        F.sum(x).over(cum).alias("p"),
        F.count("*").over(by_type).cast(_DEC).alias("n"),
        F.sum(x).over(by_type).alias("tot"),
    ).withColumn(
        "c_abs",
        F.abs(F.col("n") * F.col("p") - F.col("t") * F.col("tot")),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("c_abs").desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("tot").cast("long").alias("total_events"),
            F.col("day").alias("cp_day"),
            F.col("c_abs").cast("long").alias("max_abs_cusum"),
            (F.col("c_abs") * F.lit(1_000_000).cast(_DEC))
            .cast(_DEC)
            .alias("_num"),
        )
        .withColumn(
            "cusum_share_ppm",
            F.expr(
                "CAST(_num div (CAST(n_days AS decimal(38,0))"
                " * CAST(total_events AS decimal(38,0))) AS BIGINT)"
            ),
        )
        .drop("_num")
        .orderBy("event_type")
    )


def cusum_oracle_sql() -> str:
    return """
WITH daily AS (
    SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
), scored AS (
    SELECT event_type, day,
           CAST(row_number() OVER w_ord AS HUGEINT) AS t,
           CAST(sum(n_events) OVER w_cum AS HUGEINT) AS p,
           CAST(count(*) OVER w_all AS HUGEINT) AS n,
           CAST(sum(n_events) OVER w_all AS HUGEINT) AS tot
    FROM daily
    WINDOW w_ord AS (PARTITION BY event_type ORDER BY day),
           w_cum AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW),
           w_all AS (PARTITION BY event_type)
), peaks AS (
    SELECT event_type, day, n, tot,
           abs(n * p - t * tot) AS c_abs,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(n * p - t * tot) DESC, day) AS rk
    FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(tot AS BIGINT) AS total_events,
       day AS cp_day,
       CAST(c_abs AS BIGINT) AS max_abs_cusum,
       CAST(c_abs * 1000000 // (n * tot) AS BIGINT)
           AS cusum_share_ppm
FROM peaks WHERE rk = 1"""
