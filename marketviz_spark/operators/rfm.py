"""Customer RFM segmentation — the classic warehouse scoring pass
(Recency / Frequency / Monetary, quintile-scored).

Exactness contract: everything integer. Recency is whole days from
the corpus max order date (1-row broadcast); frequency is a count;
monetary is exact cents (2-dp prices quantized with the numerics.rnd
floor trick). Quintiles are NOT ntile() — engines may disagree on
remainder placement — but the closed form

    score = ((rank − 1) · 5) div n + 1

over a TOTAL order (metric, then custkey), which is pure integer
and engine-proof. Score direction follows convention: 5 is best
(most recent / most frequent / highest spend).

Scale shape: one custkey groupBy over orders (the only data-sized
shuffle), then the three metric ranks as ONE grouped exact rank
over the melted (metric, value, custkey) customer table via the
shared two-phase range-partitioned path (operators/ranks.py) — a
single ranged shuffle and lineage pin ranks all three metrics, no
single-partition window even at extreme customer counts, and the
ranks are bit-identical to the single-sort row_numbers they
replaced. Customers with no orders are out of scope by definition
(RFM scores purchasers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranks import grouped_row_number

RFM_BUCKETS = 5

# The classic segment labels, derived from R/F scores only (the
# usual 2-D grid; M rides along in the cell id).
_SEGMENT_CASE = """CASE
    WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
    WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
    WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
    WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
    ELSE 'core'
END"""


def customer_rfm(orders: DataFrame) -> DataFrame:
    """(custkey, recency_days, frequency, monetary_cents, r_score,
    f_score, m_score, rfm_cell, segment) for every customer with at
    least one order."""
    per_cust = orders.groupBy(
        F.col("o_custkey").alias("custkey")
    ).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(
            F.floor(
                F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("monetary_cents"),
    )
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("anchor")
    )
    base = per_cust.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        F.datediff("anchor", "last_order")
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    n1 = base.agg(F.count("*").cast("long").alias("n"))

    # The three metric ranks are ONE grouped rank over the melted
    # (metric, value) table — one ranged shuffle + one lineage pin
    # instead of three rank jobs. Sort values are encoded so every
    # metric ranks ascending (recency negated: most-recent = rank n
    # = score 5); ranks then pivot back via conditional aggregation,
    # the metric columns riding along to avoid a join-back.
    melted = base.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.expr(
            "stack(3, 'r', -recency_days, 'f', frequency,"
            " 'm', monetary_cents) AS (metric, v)"
        ),
    )
    rk = grouped_row_number(
        melted, ["metric"], [F.asc("v"), F.asc("custkey")], "rk"
    )

    def _rank(m: str) -> F.Column:
        return (
            F.max(F.when(F.col("metric") == m, F.col("rk")))
            .cast("long")
            .alias(f"rank_{m}")
        )

    ranked = rk.groupBy("custkey").agg(
        F.max("recency_days").alias("recency_days"),
        F.max("frequency").alias("frequency"),
        F.max("monetary_cents").alias("monetary_cents"),
        _rank("r"),
        _rank("f"),
        _rank("m"),
    )
    scored = ranked.crossJoin(F.broadcast(n1)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.expr(
            f"((rank_r - 1) * {RFM_BUCKETS}) div n + 1"
        ).cast("int").alias("r_score"),
        F.expr(
            f"((rank_f - 1) * {RFM_BUCKETS}) div n + 1"
        ).cast("int").alias("f_score"),
        F.expr(
            f"((rank_m - 1) * {RFM_BUCKETS}) div n + 1"
        ).cast("int").alias("m_score"),
    )
    return scored.select(
        "*",
        F.expr("r_score * 100 + f_score * 10 + m_score")
        .cast("int")
        .alias("rfm_cell"),
        F.expr(_SEGMENT_CASE).alias("segment"),
    )


def customer_rfm_oracle_sql() -> str:
    return f"""
WITH per_cust AS (
    SELECT o_custkey AS custkey,
           max(CAST(o_orderdate AS DATE)) AS last_order,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT)
               AS monetary_cents
    FROM orders GROUP BY o_custkey
), anchor AS (
    SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders
), base AS (
    SELECT custkey,
           CAST(date_diff('day', last_order, anchor) AS BIGINT)
               AS recency_days,
           frequency, monetary_cents
    FROM per_cust CROSS JOIN anchor
), nn AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM base
), ranked AS (
    SELECT custkey, recency_days, frequency, monetary_cents,
           CAST(row_number() OVER (
               ORDER BY recency_days DESC, custkey) AS BIGINT)
               AS rank_r,
           CAST(row_number() OVER (
               ORDER BY frequency, custkey) AS BIGINT) AS rank_f,
           CAST(row_number() OVER (
               ORDER BY monetary_cents, custkey) AS BIGINT)
               AS rank_m
    FROM base
), scored AS (
    SELECT custkey, recency_days, frequency, monetary_cents,
           CAST(((rank_r - 1) * {RFM_BUCKETS}) // n + 1 AS INT)
               AS r_score,
           CAST(((rank_f - 1) * {RFM_BUCKETS}) // n + 1 AS INT)
               AS f_score,
           CAST(((rank_m - 1) * {RFM_BUCKETS}) // n + 1 AS INT)
               AS m_score
    FROM ranked CROSS JOIN nn
)
SELECT *,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT)
           AS rfm_cell,
       {_SEGMENT_CASE} AS segment
FROM scored"""
