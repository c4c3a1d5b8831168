"""Last-touch marketing attribution over the events stream.

Every purchase is credited to the user's most recent preceding
touch (view or click) within a 7-day lookback; purchases with no
in-window touch are 'organic'. The report aggregates purchases,
distinct buyers, quantized revenue, and the integer-ppm share per
attributed channel.

Implementation is the zero-join as-of pattern (same family as
events_asof_prev): touches and purchases are ONE union frame, and a
per-user ordered window with `last(..., ignorenulls=True)` over
ROWS UNBOUNDED PRECEDING..1 PRECEDING carries the latest touch onto
each purchase row. Strictness at equal timestamps is encoded in the
sort key: purchases order BEFORE touches at the same (us) instant
(kind 0 < 1), so an equal-ts touch is excluded from the preceding
frame on both engines identically.

Exactness: timestamps compare as micros BIGINT (epoch_us both
sides); revenue is per-row quantized to cents with the shared
floor(x*100 + 0.5) IEEE op before the sum, so the aggregate is
order-free and hash-identical.

Scale: one map-side filter + union, one user-keyed window shuffle
(user_id is high-cardinality and evenly distributed), then a
channel-grain aggregate of at most a handful of rows; the total for
the ppm share joins back as a broadcast 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOUCH_TYPES = ("view", "click")
LOOKBACK_US = 7 * 24 * 3600 * 1_000_000  # 7 days in micros


def last_touch_attribution(
    events: DataFrame, lookback_us: int = LOOKBACK_US
) -> DataFrame:
    """events(user_id, event_id, event_type, ts, value) -> one row
    per attributed channel ('view' / 'click' / 'organic')."""
    e = events.filter(
        F.col("event_type").isin(*TOUCH_TYPES, "purchase")
    ).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "purchase", F.lit(0))
        .otherwise(F.lit(1))
        .alias("kind"),
        F.when(
            F.col("event_type") != "purchase", F.col("event_type")
        ).alias("touch_type"),
        F.when(
            F.col("event_type") != "purchase", F.unix_micros("ts")
        ).alias("touch_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        ).alias("cents"),
    )
    wpre = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = e.select(
        "user_id",
        "us",
        "kind",
        "cents",
        F.last("touch_us", ignorenulls=True).over(wpre).alias("lt_us"),
        F.last("touch_type", ignorenulls=True)
        .over(wpre)
        .alias("lt_type"),
    )
    purchases = carried.filter(F.col("kind") == 0).select(
        F.when(
            F.col("lt_us").isNotNull()
            & (F.col("us") - F.col("lt_us") <= lookback_us),
            F.col("lt_type"),
        )
        .otherwise(F.lit("organic"))
        .alias("attributed_type"),
        "user_id",
        "cents",
    )
    total = purchases.agg(
        F.count("*").cast("long").alias("n_total")
    )
    return (
        purchases.groupBy("attributed_type")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "attributed_type",
            "n_purchases",
            "n_users",
            "revenue_cents",
            F.expr("n_purchases * 1000000 div n_total")
            .cast("long")
            .alias("purchase_share_ppm"),
        )
        .orderBy("attributed_type")
    )


def attribution_oracle_sql(lookback_us: int = LOOKBACK_US) -> str:
    touches = ", ".join(f"'{t}'" for t in TOUCH_TYPES)
    return f"""
WITH u AS (
    SELECT user_id, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS us,
           CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
               AS kind,
           CASE WHEN event_type <> 'purchase' THEN event_type END
               AS touch_type,
           CASE WHEN event_type <> 'purchase'
                THEN CAST(epoch_us(ts) AS BIGINT) END AS touch_us,
           CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END
               AS cents
    FROM events
    WHERE event_type IN ({touches}, 'purchase')
), w AS (
    SELECT user_id, us, kind, cents,
           last_value(touch_us IGNORE NULLS) OVER wpre AS lt_us,
           last_value(touch_type IGNORE NULLS) OVER wpre AS lt_type
    FROM u
    WINDOW wpre AS (
        PARTITION BY user_id ORDER BY us, kind, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), p AS (
    SELECT CASE WHEN lt_us IS NOT NULL
                     AND us - lt_us <= {lookback_us}
                THEN lt_type ELSE 'organic' END AS attributed_type,
           user_id, cents
    FROM w WHERE kind = 0
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM p)
SELECT attributed_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(count(*) * 1000000 // n_total AS BIGINT)
           AS purchase_share_ppm
FROM p CROSS JOIN tot GROUP BY attributed_type, n_total"""
