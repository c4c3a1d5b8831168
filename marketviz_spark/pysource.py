"""A Python DataSource (Spark 4 `pyspark.sql.datasource` API) for
the ticker-universe feed — the engine's demonstration that S1-style
external sources plug in as FIRST-CLASS `spark.read.format(...)`
providers, not driver-side loops.

The reference fetches its universe with one blocking HTTP GET on the
driver (stock_data_fetcher.py:106-118). A DataSource instead splits
the fetch into partitions that execute ON EXECUTORS: `partitions()`
returns the shards (here: ranges of the symbol space; in a live
deployment: paginated screener URLs), and each `read(partition)`
produces only its shard. At cluster scale that means the ingest
parallelism is the partition count, the driver never holds the
universe, and a failed shard retries alone.

The synthetic generator is deterministic (seeded per symbol index,
same arithmetic every run) so tests and the driver contract get
stable rows without network. A live implementation would subclass
and override `_row` with the HTTP fetch; the Spark-side plumbing
(registration, schema, partition planning, Arrow transfer) is
identical.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

DEFAULT_COUNT = 120
DEFAULT_PARTS = 8

# A few symbols carry the reference's '/'-class quirk so downstream
# normalization ('/' -> '-', ingest.UniverseSource) stays exercised.
SLASH_EVERY = 17


def _symbol(i: int) -> str:
    base = f"T{i:04d}"
    return f"{base}/W" if i % SLASH_EVERY == 0 else base


def _row(i: int) -> tuple[str, float, float]:
    # Deterministic Lehmer-style mix, same arithmetic every run.
    h = (i * 48271 + 11) % 2147483647
    shares = float(1_000_000 + (h % 9_000_000))
    last_price = float(5 + (h % 49500) / 100.0)
    return (_symbol(i), last_price, shares)


class UniversePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class UniverseReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.count = int(options.get("count", DEFAULT_COUNT))
        self.parts = max(1, int(options.get("parts", DEFAULT_PARTS)))

    def partitions(self) -> Sequence[UniversePartition]:
        if self.count <= 0:
            # an empty universe (filtered screener, first morning)
            # is an empty read, not a planning error
            return [UniversePartition(0, 0)]
        step = -(-self.count // self.parts)  # ceil
        return [
            UniversePartition(lo, min(lo + step, self.count))
            for lo in range(0, self.count, step)
        ]

    def read(self, partition: UniversePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class UniverseDataSource(DataSource):
    """`spark.read.format("marketviz_universe")
    .option("count", 120).option("parts", 8).load()`"""

    @classmethod
    def name(cls) -> str:
        return "marketviz_universe"

    def schema(self) -> str:
        return "symbol string, last_price double, shares_outstanding double"

    def reader(self, schema) -> UniverseReader:
        return UniverseReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(UniverseDataSource)


# ----------------------------------------------------------------------
# Streaming flavor: the same feed as a Structured Streaming SOURCE
# (Spark 4 SimpleDataSourceStreamReader) — a live quote tick stream
# with deterministic, offset-addressed content.
# ----------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    SimpleDataSourceStreamReader,
)

TICK_BATCH = 10
TICK_TOTAL = 50
TICK_SYMBOLS = 7


def _tick(seq: int) -> tuple[int, str, float]:
    h = (seq * 48271 + 7) % 2147483647
    return (
        seq,
        f"T{seq % TICK_SYMBOLS:04d}",
        float(5 + (h % 49500) / 100.0),
    )


class QuoteStreamReader(SimpleDataSourceStreamReader):
    """Offset-based tick feed. The offset is the absolute sequence
    number, so (a) progress is a plain dict the checkpoint persists,
    (b) `readBetweenOffsets` regenerates EXACTLY the rows of any
    replayed range (deterministic content -> exactly-once on
    recovery), and (c) a drained feed returns an empty batch with an
    unchanged offset — triggers past the end are no-ops. (Note:
    availableNow snapshots only the simple reader's first prefetched
    batch, so a finite feed drains under a processing-time trigger,
    not availableNow — the test stops the query once the feed is
    exhausted.)

    A live implementation would page a quotes API from `start` and
    persist fetched pages for replay; the offset/replay contract —
    the part Spark cares about — is identical.
    """

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("total", TICK_TOTAL))
        self.batch = max(1, int(options.get("batch", TICK_BATCH)))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = int(start["seq"])
        # max(lo, ...): offsets must never move backward — a restart
        # from a checkpoint whose offset exceeds a RECONFIGURED
        # smaller `total` must hold position (empty batches), not
        # violate the monotonic-offset contract.
        hi = max(lo, min(lo + self.batch, self.total))
        return iter([_tick(i) for i in range(lo, hi)]), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_tick(i) for i in range(int(start["seq"]), int(end["seq"]))]
        )


class QuoteStreamDataSource(DataSource):
    """`spark.readStream.format("marketviz_quotes")
    .option("total", 50).option("batch", 10).load()`"""

    @classmethod
    def name(cls) -> str:
        return "marketviz_quotes"

    def schema(self) -> str:
        return "seq long, symbol string, price double"

    def simpleStreamReader(self, schema) -> QuoteStreamReader:
        return QuoteStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(QuoteStreamDataSource)
