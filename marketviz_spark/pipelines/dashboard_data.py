"""Dashboard-equivalent read API (reference dashboard.py:266-408).

Everything the Streamlit dashboard renders, as one facade over the
operator layer. The index table is cached on first use — the
reference's rationale for :memory: SQLite was dashboard read speed
(README.md:111); Spark's equivalent is `cache()` on the hot table,
with parquet remaining the durable store (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import asof_walkback, composition_market_caps
from ..operators.windows import composition_changes, latest_stats
from .analytics import analytics, summary_metrics, summary_tail


class DashboardData:
    """Read-path facade. Pass the index_data and stocks frames once;
    every accessor is a small job over the cached index series."""

    def __init__(self, index_df: DataFrame, stocks_df: DataFrame):
        self.index_df = index_df.cache()
        self.stocks_df = stocks_df

    def headline_stats(self) -> DataFrame:
        """Current value + daily change (dashboard.py:146-156, W7)."""
        return latest_stats(self.index_df)

    def metrics(self) -> DataFrame:
        """Constituent count + change-date count (A4+A5)."""
        return summary_metrics(self.index_df)

    def performance(self) -> DataFrame:
        """Returns series for the line chart (W3+W4+W5-W6)."""
        return analytics(self.index_df)

    def market_cap_pie(self, top_n: int = 5) -> DataFrame:
        """Top-n + OTHERS market caps (J1+A3+O6)."""
        return composition_market_caps(
            self.index_df, self.stocks_df, top_n
        )

    def composition_at(self, date_str: str) -> DataFrame:
        """Composition at a date with the <=5-day walk-back (J3)."""
        spine = self.index_df.sparkSession.createDataFrame(
            [(date_str,)], "date string"
        )
        return asof_walkback(spine, self.index_df)

    def change_dates(self) -> DataFrame:
        """Dates where composition changed, newest first (W5, O4)."""
        return (
            composition_changes(self.index_df)
            .filter(F.col("composition_changed"))
            .select("date", "change_label")
            .orderBy(F.col("date").desc())
        )

    def summary_30(self) -> DataFrame:
        """The 30-row export table (O5+W6)."""
        return summary_tail(self.index_df, 30)

    def unpersist(self) -> None:
        self.index_df.unpersist()
