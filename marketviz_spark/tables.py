"""Testdata loaders and the canonical derived market-data views.

The reference's domain tables (``stocks``, ``raw_history``,
``index_data``) are derived deterministically from the driver's
TPC-H-ish testdata so every query has a DuckDB-SQL oracle twin over
the same parquet files. The Spark builders here and the SQL CTE text
below are intentionally adjacent: they MUST express bit-identical
arithmetic.

Determinism rules (the oracle hash gate is exact):
- dates cross the API edge as ISO 'yyyy-MM-dd' strings
  (the reference also stores ISO strings; SURVEY §1.1)
- aggregates over doubles use exact forms only: max / count / sums of
  integer-valued doubles / DECIMAL(18,2)-cast sums of 2-dp prices
- per-row arithmetic is written with identical association on both
  sides (IEEE doubles are deterministic given identical expressions)

Scale note: at 100 TB the `stocks` derivation is one map-side
projection + one hash aggregation on (ticker, date) — Catalyst pushes
the column pruning into the parquet scan, and the aggregation is
partial (map-side combine) before the single shuffle. The derived
table would be written out partitioned by date for partition-pruned
downstream reads (see pipelines/upsert.py).
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Number of index constituents. The reference uses 100 of a 120-ticker
# universe (reference constants.py:1); we scale to the testdata's
# per-date universe the same way.
INDEX_K = 10


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to cluster parallelism BEFORE CPU-heavy
    per-row derivation (optimization guide §2.5, input skew: a
    single-row-group parquet file is one scan task no matter how many
    cores — and every per-row expression above it then runs on one
    core). The textstats collocation miner carried this guard locally
    ("standing pitfall #2"); this is the shared form.

    Conditional, so it is a NO-OP at real scale: when the scan
    already has >= defaultParallelism partitions (any table of
    cluster-relevant size), no shuffle is added. The round-robin
    repartition is deterministic under retries
    (spark.sql.execution.sortBeforeRepartition, default on), and
    deterministic filters still push through an added Repartition
    into the parquet scan, so pushdown is unaffected.

    NOT free locally: the widening shuffle ships the full row once,
    ~0.15-0.2 s for the sf0.1 fact tables. Consumers whose
    downstream work is too light to amortize that (measured, r13
    bench: dedup_exact 1.69x, corpus_source_report 1.58x isolated)
    opt out via their loader's ``fan=False``; at real scale the
    choice is moot because the guard is a no-op either way.

    The probe (r14, guide §1/§7.3 — plan-compile time IS driver
    time): the former ``df.rdd.getNumPartitions()`` forced a full
    physical-plan → RDD conversion on every loader call (~45
    consumer paths pay it once per query build). The scan's split
    count is instead ESTIMATED from file metadata with Spark's own
    packing arithmetic (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, bytesPerCore))) — the decision only needs
    the `< defaultParallelism` comparison, where the estimate and
    the real planner agree except exactly at the boundary, where
    the conditional repartition is a semantic no-op anyway. Falls
    back to the RDD probe for non-file or unreadable sources."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    est = _scan_splits_estimate(df, target)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df


def _scan_splits_estimate(df: DataFrame, parallelism: int) -> int | None:
    """Estimated scan-partition count of a file-backed DataFrame from
    file sizes + the session's split confs (FilePartition's packing
    arithmetic), or None when the plan is not a local-file scan."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    conf = df.sparkSession.conf
    try:
        max_pb = _size_bytes(
            conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        open_cost = _size_bytes(
            conf.get("spark.sql.files.openCostInBytes", "4194304")
        )
        sizes = []
        for uri in files:
            p = urlparse(uri)
            if p.scheme not in ("file", ""):
                return None
            sizes.append(os.path.getsize(unquote(p.path)))
    except (OSError, ValueError):
        return None
    total = sum(sizes) + open_cost * len(files)
    bytes_per_core = total / max(parallelism, 1)
    max_split = min(max_pb, max(open_cost, bytes_per_core))
    return max(1, math.ceil(total / max(max_split, 1)))


_SIZE_SUFFIX = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def _size_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m',
    '1g', '4194304b')."""
    s = str(v).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    if s and s[-1] in _SIZE_SUFFIX:
        return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
    return int(s)


def normalize_events_ts(ev: DataFrame) -> DataFrame:
    """Normalize `ts` to a session-tz TimestampType, whatever the
    reader produced.

    The parquet stores TIMESTAMP(NANOS), and how Spark surfaces that
    has drifted across releases/configs:
    - ``bigint`` (spark.sql.legacy.parquet.nanosAsLong honored):
      long nanoseconds — integer floor-division to micros, identical
      to DuckDB's nanos->micros truncation. Integer DIV, not float:
      nanos exceed double's 53-bit exact range.
    - ``timestamp_ntz`` (Spark 4.1+ ignores the legacy conf): already
      micros-truncated; cast to TimestampType. The session time zone
      is pinned to UTC (session.py), so the NTZ->TZ cast is a pure
      re-tag — the underlying micros value is unchanged and
      ``unix_micros`` matches DuckDB's ``epoch_us``.
    - ``timestamp``: already what downstream expects.

    Every consumer (batch registry queries, streaming joins/windows)
    goes through this, so `unix_micros`/window math never sees NTZ.
    """
    dt = dict(ev.dtypes)["ts"]
    if dt == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif dt == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` as a proper TimestampType (see
    :func:`normalize_events_ts` for the type-drift handling)."""
    return normalize_events_ts(load(spark, sf_dir, "events"))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view."""
    from .schemas import TESTDATA_TABLES

    for name in TESTDATA_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# ----------------------------------------------------------------------
# stocks: one row per (ticker, date), derived from lineitem.
#   ticker  <- 'T' + zero-padded part key
#   date    <- l_shipdate (ISO string)
#   share_price <- max(l_extendedprice)            (exact)
#   effective_shares_outstanding <- sum(l_quantity) * 1000  (integral, exact)
#   market_cap <- share_price * effective_shares   (single IEEE product)
# Mirrors the reference fact table (src/data/database_manager.py:13-22).
# ----------------------------------------------------------------------

STOCKS_SQL = """
SELECT
    concat('T', lpad(CAST(l_partkey AS VARCHAR), 5, '0')) AS ticker,
    strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS date,
    max(l_extendedprice) AS share_price,
    sum(l_quantity) * 1000.0 AS effective_shares_outstanding,
    max(l_extendedprice) * (sum(l_quantity) * 1000.0) AS market_cap
FROM lineitem
WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
GROUP BY 1, 2
HAVING max(l_extendedprice) IS NOT NULL
   AND sum(l_quantity) IS NOT NULL
"""


def stocks(
    spark: SparkSession, sf_dir: str, fan: bool = True
) -> DataFrame:
    """Derived fact table. CONTRACT (both engines): a (ticker, date)
    with no observed price or no observed quantity is NOT a stocks
    row — NULL keys and all-NULL measure groups are dropped at the
    derivation, so every downstream ranking/percentile/window sees
    non-null prices and the two engines can never diverge on NULL
    ordering (found by the r7 differential fuzzer, which feeds
    NULL-laced lineitem).

    ``fan=False`` skips the local scan-widening guard for consumers
    whose work above the derivation is too light to pay the widening
    shuffle (see fan_out); identical results either way."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey").isNotNull()
        & F.col("l_shipdate").isNotNull()
    )
    if fan:
        li = fan_out(li)
    eff = (F.sum("l_quantity") * F.lit(1000.0)).alias(
        "effective_shares_outstanding"
    )
    return (
        li.groupBy(
            F.concat(
                F.lit("T"), F.lpad(F.col("l_partkey").cast("string"), 5, "0")
            ).alias("ticker"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("date"),
        )
        .agg(F.max("l_extendedprice").alias("share_price"), eff)
        .filter(
            F.col("share_price").isNotNull()
            & F.col("effective_shares_outstanding").isNotNull()
        )
        .withColumn(
            "market_cap",
            F.col("share_price") * F.col("effective_shares_outstanding"),
        )
    )


# ----------------------------------------------------------------------
# raw_history: pre-transform per-ticker history with a synthetic,
# deterministic split schedule (reference input shape at
# src/data/stock_data_fetcher.py:50-57: Date/Close/Stock Splits, with
# 0.0 meaning "no split" — repaired to 1.0 downstream, P6).
#   stock_splits: 2.0 when (partkey + day-of-month) % 37 == 0,
#                 3.0 when % 41 == 0, else 0.0
#   shares_outstanding: scalar per ticker (partkey * 10000), the
#                 yfinance `sharesOutstanding` analogue (S3).
# ----------------------------------------------------------------------

# Expects a `stocks` CTE in scope.
RAW_HISTORY_FROM_STOCKS_SQL = """
SELECT
    ticker,
    date,
    share_price AS close,
    CASE
        WHEN (pk + dom) % 37 = 0 THEN 2.0
        WHEN (pk + dom) % 41 = 0 THEN 3.0
        ELSE 0.0
    END AS stock_splits,
    pk * 10000.0 AS shares_outstanding
FROM (
    SELECT
        s.*,
        CAST(substr(ticker, 2) AS BIGINT) AS pk,
        CAST(strftime(CAST(date AS DATE), '%d') AS BIGINT) AS dom
    FROM stocks s
)
"""


def raw_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = stocks(spark, sf_dir)
    pk = F.substring("ticker", 2, 10).cast("bigint")
    dom = F.dayofmonth(F.to_date("date")).cast("bigint")
    key = pk + dom
    return s.select(
        "ticker",
        "date",
        F.col("share_price").alias("close"),
        F.when(key % 37 == 0, F.lit(2.0))
        .when(key % 41 == 0, F.lit(3.0))
        .otherwise(F.lit(0.0))
        .alias("stock_splits"),
        (pk * F.lit(10000.0)).alias("shares_outstanding"),
    )


# ----------------------------------------------------------------------
# index_data: the flagship equal-weighted top-K index, one row per
# date (reference src/index/equal_weight_index.py:9-54, generalized
# from a 30-iteration per-date loop to ONE windowed job; SURVEY §3).
#   index_value <- sum(top-K share_price) / K   (decimal-exact sum)
#   composition <- tickers CSV in desc-market-cap order, ticker tiebreak
# ----------------------------------------------------------------------

# Expects a `stocks` CTE in scope.
INDEX_FROM_STOCKS_SQL = """
SELECT
    date,
    CAST(sum(CAST(share_price AS DECIMAL(18,2))) AS DOUBLE) / {k} AS index_value,
    string_agg(ticker, ',' ORDER BY market_cap DESC, ticker) AS composition
FROM (
    SELECT
        s.*,
        row_number() OVER (
            PARTITION BY date ORDER BY market_cap DESC, ticker
        ) AS rn
    FROM stocks s
)
WHERE rn <= {k}
GROUP BY date
"""


def oracle_cte(*, raw_history: bool = False, index: bool = False, k: int = INDEX_K) -> str:
    """Compose the WITH-prefix for an oracle query: always `stocks`,
    optionally `raw_history` and/or `index_data`."""
    parts = [f"stocks AS ({STOCKS_SQL})"]
    if raw_history:
        parts.append(f"raw_history AS ({RAW_HISTORY_FROM_STOCKS_SQL})")
    if index:
        parts.append(
            f"index_data AS ({INDEX_FROM_STOCKS_SQL.format(k=k)})"
        )
    return "WITH " + ",\n".join(parts) + "\n"


def index_data(
    spark: SparkSession, sf_dir: str, k: int = INDEX_K
) -> DataFrame:
    from .pipelines.index import compute_index

    return compute_index(stocks(spark, sf_dir), k=k)
