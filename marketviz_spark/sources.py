"""Format-agnostic table IO: parquet / ORC / CSV / JSON / JDBC.

Parquet is the engine's native format (columnar, stats, pushdown).
The others exist so a user can land data from anywhere; every read
takes an EXPLICIT schema — inference is banned in the engine
(SURVEY §1.2), both for determinism and because schema inference
costs a full extra pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "orc", "csv", "json")


def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    **options: str,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use {_FORMATS}")
    reader = spark.read.schema(schema)
    if fmt == "csv":
        return reader.csv(path, header=True, **options)
    if fmt == "json":
        return reader.json(path, **options)
    return getattr(reader, fmt)(path)


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", **options: str
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use {_FORMATS}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.csv(path, header=True, **options)
    elif fmt == "json":
        writer.json(path, **options)
    else:
        getattr(writer, fmt)(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source with partitioned parallel reads (each executor
    pulls its own key range — the only way a JDBC scan parallelizes).
    No JDBC driver jar ships in this environment; the call shape is
    the tested contract (see tests), the connection is production's.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
