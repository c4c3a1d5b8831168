"""End-to-end pipeline — the reference's app.py re-expressed.

Reference flow (app.py:9-29): fetch universe -> store -> loop over
30 dates computing the index per day -> dashboard. Here each stage
is one set-oriented Spark job and storage is date-partitioned
parquet:

    ingest (S1-S4)  -> stocks table        (upsert S6)
    compute_index   -> index_data table    (upsert S7)   [ONE job]
    analytics       -> returns/changes     (dashboard read path)
    exports         -> XLSX/PDF            (driver-side, S10-S11)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .pipelines.analytics import analytics, summary_metrics
from .pipelines.export import export_pdf, export_xlsx
from .pipelines.index import compute_index
from .pipelines.ingest import HistorySource, UniverseSource, ingest
from .pipelines.upsert import table_exists, upsert_by_date_partition


def run_pipeline(
    spark: SparkSession,
    universe: UniverseSource,
    source: HistorySource,
    data_dir: str,
    k: int = 10,
    export_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Run the full ETL; returns the materialized frames."""
    stocks_path = os.path.join(data_dir, "stocks")
    index_path = os.path.join(data_dir, "index_data")

    stocks, errors = ingest(universe.to_df(spark), source)
    upsert_by_date_partition(spark, stocks, stocks_path)
    stocks_t = spark.read.parquet(stocks_path)

    # Reference guards on table existence before computing
    # (equal_weight_index.py:26-31).
    assert table_exists(spark, stocks_path)
    index_df = compute_index(stocks_t, k=k)
    upsert_by_date_partition(spark, index_df, index_path)
    index_t = spark.read.parquet(index_path)

    out = {
        "stocks": stocks_t,
        "errors": errors,
        "index_data": index_t,
        "analytics": analytics(index_t),
        "summary_metrics": summary_metrics(index_t),
    }
    if export_dir:
        os.makedirs(export_dir, exist_ok=True)
        export_xlsx(index_t, os.path.join(export_dir, "index_data.xlsx"))
        export_pdf(index_t, os.path.join(export_dir, "index_data.pdf"))
    return out
