"""Entry point 3 — the dashboard read path as one DataFrame job.

The reference interleaves SQL point queries and pandas mutations
(dashboard.py:266-408); here `analytics()` produces every derived
column the dashboard consumes in a single window pass, and the
summary/tail views are cheap follow-ons. Presentation (Streamlit,
plotly, XLSX/PDF) stays at the driver via toPandas() — see export.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windows import (
    composition_changes,
    daily_and_cumulative_returns,
)


def analytics(index_df: DataFrame) -> DataFrame:
    """index_data -> + daily_return, cumulative_return,
    composition_changed, change_label (W3-W6 in one pass)."""
    df = daily_and_cumulative_returns(index_df)
    return composition_changes(df)


def summary_metrics(index_df: DataFrame) -> DataFrame:
    """A4+A5 headline metrics: latest constituent count and number of
    composition-change dates (dashboard.py:282-298)."""
    enriched = composition_changes(index_df)
    latest = (
        enriched.orderBy(F.col("date").desc())
        .limit(1)
        .select(
            F.size(F.split("composition", ",")).alias("constituent_count")
        )
    )
    changes = enriched.agg(
        F.sum(F.col("composition_changed").cast("int")).alias(
            "change_date_count"
        )
    )
    return latest.crossJoin(changes)


def summary_tail(index_df: DataFrame, n: int = 30) -> DataFrame:
    """O5+O4+W6: last-n-days summary table, newest first — the
    XLSX/PDF export input (dashboard.py:364-373)."""
    full = analytics(index_df)
    w = Window.orderBy(F.col("date").desc())
    return (
        full.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select(
            "date",
            "index_value",
            "daily_return",
            "cumulative_return",
            "change_label",
        )
        .orderBy(F.col("date").desc())
    )
