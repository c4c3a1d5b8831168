"""SQL API surface: register the domain tables as temp views so
every engine capability is reachable from ``spark.sql(...)`` —
the reference's users queried with raw SQL strings
(database_manager.py / dashboard.py), and Catalyst compiles view SQL
and DataFrame code to the same plans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import tables
from .registry import ensure_session_confs


def register_domain_views(spark: SparkSession, sf_dir: str) -> None:
    """Register testdata tables plus the derived domain views
    (stocks, raw_history, index_data) as temp views."""
    ensure_session_confs(spark)
    tables.register_all(spark, sf_dir)
    # events with usable timestamps
    tables.load_events(spark, sf_dir).createOrReplaceTempView("events")
    tables.stocks(spark, sf_dir).createOrReplaceTempView("stocks")
    tables.raw_history(spark, sf_dir).createOrReplaceTempView(
        "raw_history"
    )
    tables.index_data(spark, sf_dir).createOrReplaceTempView(
        "index_data"
    )


FLAGSHIP_SQL = """
SELECT date,
       CAST(sum(CAST(share_price AS DECIMAL(18,2))) AS DOUBLE) / {k}
           AS index_value,
       array_join(
           transform(
               array_sort(
                   collect_list(struct(-market_cap AS negcap,
                                       ticker AS t))),
               s -> s.t),
           ',') AS composition
FROM (
    SELECT *,
           row_number() OVER (
               PARTITION BY date
               ORDER BY market_cap DESC, ticker
           ) AS rn
    FROM stocks
)
WHERE rn <= {k}
GROUP BY date
"""
