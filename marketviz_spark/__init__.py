"""marketviz_spark — a PySpark-native analytics engine.

A ground-up re-implementation of the query and data-processing
capabilities of the reference MarketViz app (a pandas+SQLite stock
index ETL; see SURVEY.md), re-expressed as an idiomatic Spark
DataFrame/SQL engine over Parquet, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) such an engine needs at 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, tuned shuffle partitions)
- ``schemas``    explicit StructTypes for every table (no inference)
- ``tables``     testdata loaders + the canonical derived ``stocks`` view
- ``registry``   (name -> spark query, oracle SQL) registry feeding
                 ``__spark_entry__.py``
- ``operators``  pure DataFrame->DataFrame functions mirroring SURVEY §2
- ``pipelines``  ingest / index / analytics / upsert / export entry points
- ``datapipe``   dedup, similarity search, text stats, multimodal plumbing
- ``streaming``  Structured Streaming variants of the event-window ops
"""

__version__ = "0.1.0"
