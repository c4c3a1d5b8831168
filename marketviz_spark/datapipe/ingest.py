"""Document-corpus ingestion: JSONL reader with an explicit
bad-record channel.

LLM training corpora overwhelmingly arrive as JSON-lines (one doc
per line); at 100 TB some lines are ALWAYS broken — truncated
writes, encoding damage, schema drift. The production contract is
the same skip-bad-rows gate the market-data side implements for
universe assembly (`pipelines/ingest.py`, SURVEY §2.1 S4): never
abort the job on a bad row, never silently drop it either — route
it to an error channel with a reason, and let the caller decide
the failure budget.

Spark-first shape: the native JSON reader in PERMISSIVE mode with
``columnNameOfCorruptRecord`` does the parse-level routing inside
the scan (distributed, no Python); a second, semantic gate routes
parseable rows that violate the corpus contract (missing doc_id /
text). Both channels come back as DataFrames — at scale the bad
channel is written next to the run's output, not collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"

# The documents-table contract (TESTDATA.md), plus the corrupt
# side-channel the reader fills for unparseable lines.
DOC_FIELDS = [
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
]
DOC_JSONL_SCHEMA = T.StructType(DOC_FIELDS + [T.StructField(_CORRUPT, T.StringType())])


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document corpus; returns ``(good, bad)``.

    ``good`` carries exactly the documents-table schema. ``bad``
    carries (reason, raw) — one row per rejected line, where
    ``reason`` is 'unparseable json' (scan-level corrupt record) or
    'missing doc_id' / 'missing text' (parseable but violating the
    corpus contract; raw is the row re-serialized to_json).

    The parsed frame is cached before splitting: Spark refuses
    corrupt-column-only projections over a raw JSON scan (the
    internal corrupt record is only populated alongside real
    columns), and the cache also keeps the two channels one scan —
    at 100 TB this is one pass over the files either way, and the
    cache should be swapped for a staging write when the corpus
    exceeds cluster memory (callers own .unpersist()).
    """
    df = (
        spark.read.schema(DOC_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    ).cache()
    return split_channels(df)


def split_channels(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The gate itself: split a DOC_JSONL_SCHEMA frame into
    ``(good, bad)`` — shared by the batch reader and the streaming
    twin so the two ingest paths cannot drift."""
    corrupt = F.col(_CORRUPT).isNotNull()
    no_id = F.col("doc_id").isNull()
    no_text = F.col("text").isNull()

    good = (
        df.filter(~corrupt & ~no_id & ~no_text)
        .drop(_CORRUPT)
    )
    bad = df.filter(corrupt | no_id | no_text).select(
        F.when(corrupt, F.lit("unparseable json"))
        .when(no_id, F.lit("missing doc_id"))
        .otherwise(F.lit("missing text"))
        .alias("reason"),
        F.coalesce(
            F.col(_CORRUPT),
            F.to_json(F.struct(*[f.name for f in DOC_FIELDS])),
        ).alias("raw"),
    )
    return good, bad


def stream_documents_jsonl(
    spark: SparkSession,
    path: str,
    good_dir: str,
    bad_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Streaming twin of :func:`read_documents_jsonl`: continuously
    ingest a JSONL landing directory, routing every micro-batch
    through the SAME gate (:func:`split_channels`) into a good
    corpus sink and a (reason, raw) bad sink. Returns the started
    StreamingQuery.

    Exactly-once across retries and restarts via the repo's
    (run, epoch) dynamic-partition-overwrite scheme
    (`streaming/dedup.stream_ingest_gate` documents the failure
    modes): a task retry of epoch N overwrites its OWN partition
    wholesale, and a restart gets a fresh run token so re-zeroed
    epoch ids can never alias an older run's output. Plain append
    sinks would duplicate rows on exactly those paths.

    Scale: the gate is a per-batch column-expression filter — no
    Python, no shuffle; the sinks partition by (run, epoch), so
    downstream consumers compact or prune by ingest generation.
    """
    import uuid

    from ..pipelines.upsert import upsert_by_date_partition

    run_token = uuid.uuid4().hex

    def route(batch_df: DataFrame, epoch_id: int) -> None:
        bspark = batch_df.sparkSession
        batch_df.persist()
        try:
            good, bad = split_channels(batch_df)
            for frame, dest in ((good, good_dir), (bad, bad_dir)):
                upsert_by_date_partition(
                    bspark,
                    frame.withColumn("run", F.lit(run_token))
                    .withColumn("epoch", F.lit(int(epoch_id))),
                    dest,
                    ["run", "epoch"],
                )
        finally:
            batch_df.unpersist()

    src = (
        spark.readStream.schema(DOC_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )
    return (
        src.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
