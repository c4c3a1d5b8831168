"""Join operators (SURVEY §2.3, J1-J3).

The reference has no SQL joins — it runs correlated Python loops of
point queries (N+1 pattern). Here they are real joins:

- J1: explode composition -> broadcast equi-join against
  latest-row-per-ticker (replaces dashboard.py:97-117's 100+ queries
  per render with ONE job).
- J2: upsert = left-anti join + union (INSERT OR REPLACE semantics,
  database_manager.py:38-43) — see also pipelines/upsert.py.
- J3: as-of / nearest-prior-date lookup with a bounded walk-back
  (dashboard.py:328-343) as a window over a date spine.

Scale notes: J1's build side is the latest composition — ~K rows — so
it is explicitly broadcast; no shuffle of the fact table. J2's
anti-join shuffles only on the PK, and with date-partitioned storage
becomes a partition overwrite instead (no read of old data at all).
J3 is a window over the union of spine+index, linear in the spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..numerics import rnd
from .windows import latest_per_group


def composition_market_caps(
    index_df: DataFrame, stocks_df: DataFrame, top_n: int = 5
) -> DataFrame:
    """J1 + A3 + O6: latest composition joined to latest market caps,
    top-n constituents kept individually and the rest folded into an
    OTHERS bucket (reference pie chart, dashboard.py:88-144).

    Output: (name, market_cap_billions) rows — top_n tickers plus one
    'OTHERS' row, caps scaled /1e9 and rounded to 1dp like the
    reference (dashboard.py:106,117,119).
    """
    latest_comp = (
        index_df.orderBy(F.col("date").desc())
        .limit(1)
        .select(
            F.posexplode(F.split("composition", ",")).alias("pos", "ticker")
        )
    )
    latest_caps = latest_per_group(stocks_df, "ticker").select(
        "ticker", "market_cap"
    )
    joined = F.broadcast(latest_comp).join(latest_caps, "ticker", "inner")
    named = joined.select(
        F.when(F.col("pos") < top_n, F.col("ticker"))
        .otherwise(F.lit("OTHERS"))
        .alias("name"),
        F.col("market_cap"),
    )
    # decimal-cast before the sum: the OTHERS bucket folds ~N-top_n
    # double market caps, and a raw float sum is summation-order-
    # dependent — the same class the sf0.1 parity run caught in the
    # trend slope. double->decimal(28,2) is the same correctly-
    # rounded value on both engines, and the decimal sum is exact.
    return named.groupBy("name").agg(
        rnd(
            F.sum(F.col("market_cap").cast("decimal(28,2)"))
            .cast("double")
            / 1e9,
            1,
        ).alias("market_cap_billions")
    )


def upsert(
    existing: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """J2: INSERT OR REPLACE — keep every `new` row, plus `existing`
    rows whose key is absent from `new` (database_manager.py:38-43).

    Idempotent by construction: upsert(upsert(e, n), n) == upsert(e, n).
    """
    replaced = existing.join(
        new.select(*keys).distinct(), keys, "left_anti"
    )
    return replaced.unionByName(new)


def asof_walkback(
    spine: DataFrame,
    index_df: DataFrame,
    max_back_days: int = 5,
) -> DataFrame:
    """J3: for each spine date, the nearest index row at-or-before it,
    but only within `max_back_days` calendar days (the reference's
    ≤5-day holiday walk-back, dashboard.py:328-343).

    spine: DataFrame[date: string]. Implemented as a last-non-null
    window over the union of spine and index rows — one sort, no
    quadratic lookup; generalizes to a streaming as-of with
    `last(..., ignorenulls=True)`.
    """
    tagged = index_df.select(
        "date",
        F.col("index_value").alias("_iv"),
        F.col("composition").alias("_comp"),
        F.lit(0).alias("_is_spine"),
    ).unionByName(
        spine.select(
            "date",
            F.lit(None).cast("double").alias("_iv"),
            F.lit(None).cast("string").alias("_comp"),
            F.lit(1).alias("_is_spine"),
        )
    )
    # Index rows sort before spine rows on the same date so an exact
    # match is picked up.
    w = (
        Window.orderBy("date", "_is_spine")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "date",
        "_is_spine",
        F.last("_iv", ignorenulls=True).over(w).alias("index_value"),
        F.last("_comp", ignorenulls=True).over(w).alias("composition"),
        F.last(
            F.when(F.col("_is_spine") == 0, F.col("date")), ignorenulls=True
        )
        .over(w)
        .alias("matched_date"),
    )
    out = filled.filter(F.col("_is_spine") == 1).withColumn(
        "lag_days", F.datediff(F.to_date("date"), F.to_date("matched_date"))
    )
    return out.select(
        "date",
        F.when(F.col("lag_days") <= max_back_days, F.col("matched_date")).alias(
            "matched_date"
        ),
        F.when(F.col("lag_days") <= max_back_days, F.col("index_value")).alias(
            "index_value"
        ),
        F.when(F.col("lag_days") <= max_back_days, F.col("composition")).alias(
            "composition"
        ),
    )


def asof_prev_event(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "click",
) -> DataFrame:
    """Generic timestamp AS-OF join at the event grain: every
    ``left_type`` event annotated with the most recent ``right_type``
    event by the same user at or before it (trade/quote semantics —
    pandas ``merge_asof`` / kdb ``aj``, unbounded lookback; the
    bounded-interval variant is ``streaming.joins.
    click_error_pairs_batch``).

    Reference parity: the reference app has no event stream; this is
    an engine extension (SURVEY §2.9) reusing J3's union + last(
    ignorenulls) dataflow (``asof_walkback`` above) at data grain.

    Implemented with ZERO joins: union-tag both event types, one
    window keyed by user ordered by (ts, event_id), and
    ``last(..., ignorenulls=True)`` carries the right side forward.
    "Preceding" means earlier in (ts, event_id) order, so a right
    event sharing the exact timestamp with a lower event_id counts
    — deterministic on both engines.

    Scale: a sort-merge as-of via ONE shuffle on user_id (the
    interval-join alternative shuffles both sides AND explodes on
    range overlap). Partitions are bounded by per-user event counts;
    user_id is uniform in the testdata, and a skewed power-user key
    would be salted upstream exactly like operators/skew.py does.
    """
    both = events.filter(
        F.col("event_type").isin(left_type, right_type)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_val = F.when(
        F.col("event_type") == right_type, F.col("value")
    )
    right_ts = F.when(F.col("event_type") == right_type, F.col("ts"))
    annotated = both.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts"),
        F.last(right_val, ignorenulls=True).over(w).alias("prev_value"),
        F.last(right_ts, ignorenulls=True).over(w).alias("_prev_ts"),
    )
    us = lambda c: (F.unix_micros(c)).cast("long")  # noqa: E731
    return (
        annotated.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("left_id"),
            "user_id",
            us(F.col("ts")).alias("ts_us"),
            F.col("prev_value"),
            (us(F.col("ts")) - us(F.col("_prev_ts"))).alias("gap_us"),
        )
    )


def table_diff(
    v1: DataFrame,
    v2: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff between two versions of a keyed table: each key
    is classified added (v2 only), removed (v1 only), changed (both,
    compared columns differ) or unchanged — the audit an ingestion
    pipeline runs after an upsert/repair/retention pass to prove the
    write did exactly what was intended.

    Comparison is one null-safe struct equality over the compare
    columns (NULL == NULL is unchanged, NULL vs value is changed).

    Scale: a single full-outer sort-merge join on the primary key —
    the same shuffle an upsert already pays; nothing is collected,
    and the classification is a map-side expression over the joined
    row.
    """
    a = v1.select(*keys, F.struct(*compare_cols).alias("_va"))
    b = v2.select(*keys, F.struct(*compare_cols).alias("_vb"))
    j = a.join(b, keys, "full_outer")
    status = (
        F.when(F.col("_va").isNull(), "added")
        .when(F.col("_vb").isNull(), "removed")
        .when(F.col("_va").eqNullSafe(F.col("_vb")), "unchanged")
        .otherwise("changed")
    )
    return j.select(*keys, status.alias("status"))
