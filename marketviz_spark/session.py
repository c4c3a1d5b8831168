"""SparkSession factory.

Scale stance: these configs are the local[32] test profile of settings
that matter identically on a 1000-executor cluster — AQE for runtime
re-planning (partition coalescing, skew-join splitting), UTC session
time zone so timestamp semantics match the DuckDB oracle and any
other engine, Arrow for the pandas boundary, and shuffle partitions
sized to the parallelism at hand (on a real cluster this would be
~2-3x total cores or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "marketviz_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[N]`` with N from $SPARK_GRAFT_CPUS.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing, skew-join handling, and
        # dynamic join-strategy switching — essential at 100 TB where
        # static planning guesses wrong.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamp semantics (matches DuckDB's UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas-boundary crossing (toPandas, pandas UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        # The events testdata stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type. Older Sparks honor this conf and
        # surface `ts` as long nanos; Spark 4.1+ ignores it and reads
        # timestamp_ntz. tables.normalize_events_ts accepts either
        # (and plain timestamp), so the engine is conf-drift-proof —
        # the conf stays for back-compat with honoring versions.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Partition values must round-trip as written (ISO strings at
        # the API edge, SURVEY §1.1) — not be re-inferred as DATE.
        .config(
            "spark.sql.sources.partitionColumnTypeInference.enabled",
            "false",
        )
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    # Deployment-specific overrides without code changes:
    # $SPARK_GRAFT_CONF="k=v;k=v" (production clusters set e.g.
    # spark.sql.adaptive.advisoryPartitionSizeInBytes here). Applied
    # before extra_conf so explicit callers win.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for item in env_conf.split(";"):
        if "=" in item:
            k, _, v = item.partition("=")
            builder = builder.config(k.strip(), v.strip())
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
