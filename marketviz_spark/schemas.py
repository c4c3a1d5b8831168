"""Explicit StructTypes for every table the engine touches.

The reference declares DDL for its two tables
(reference src/data/database_manager.py:13-31) and lets pandas infer
everything in flight; here every schema is declared (SURVEY §1.2-1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference data model (SURVEY §1.1) ---------------------------------

# stocks: one row per (ticker, trading day).
# Reference DDL at src/data/database_manager.py:13-22. Dates are kept
# as DateType internally; ISO 'yyyy-MM-dd' strings only at API edges.
STOCKS = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("date", T.StringType(), False),  # ISO yyyy-MM-dd
        T.StructField("share_price", T.DoubleType(), True),
        T.StructField("market_cap", T.DoubleType(), True),
        T.StructField("effective_shares_outstanding", T.DoubleType(), True),
    ]
)

# index_data: one row per computed index day.
# Reference DDL at src/data/database_manager.py:24-31. `composition`
# is modeled as the CSV string the reference stores; the array form is
# derived where needed (SURVEY §1.2).
INDEX_DATA = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("index_value", T.DoubleType(), True),
        T.StructField("composition", T.StringType(), True),
    ]
)

# raw_history: pre-transform per-ticker history (split-adjustment
# input; reference src/data/stock_data_fetcher.py:50-71).
RAW_HISTORY = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("stock_splits", T.DoubleType(), True),
        T.StructField("shares_outstanding", T.DoubleType(), True),
    ]
)

# --- Driver-provided testdata tables (TESTDATA.md) ----------------------

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal assets: opaque binary payload + typed metadata
# (engine extension; see datapipe/multimodal.py).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
