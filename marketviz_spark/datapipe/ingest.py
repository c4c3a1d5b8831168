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


class JsonlIngest:
    """Result of :func:`read_documents_jsonl`: the ``(good, bad)``
    channel pair PLUS ownership of the cached parent scan.

    Unpacks like the historical 2-tuple (``good, bad = ...``), and
    additionally exposes :meth:`unpersist` — the good/bad frames are
    *derived* from one cached parent, so unpersisting them would not
    release the cache; only the owner object can. Callers that care
    about memory (any corpus near cluster-memory scale) call
    ``res.unpersist()`` once both channels are consumed, or swap the
    cache for a staging write as the reader docstring suggests.
    """

    def __init__(
        self, good: DataFrame, bad: DataFrame, source: DataFrame
    ) -> None:
        self.good = good
        self.bad = bad
        self.source = source

    def __iter__(self):
        return iter((self.good, self.bad))

    def unpersist(self, blocking: bool = False) -> "JsonlIngest":
        """Release the cached parent scan both channels share."""
        self.source.unpersist(blocking)
        return self


def read_documents_jsonl(spark: SparkSession, path: str) -> JsonlIngest:
    """Read a JSONL document corpus; returns a :class:`JsonlIngest`
    (unpacks as ``(good, bad)``).

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
    exceeds cluster memory. The cached parent is owned by the
    returned object: call ``.unpersist()`` on IT (unpersisting the
    derived good/bad frames would not release the parent).
    """
    df = (
        spark.read.schema(DOC_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    ).cache()
    good, bad = split_channels(df)
    return JsonlIngest(good, bad, df)


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


def _persisted_run_token(spark: SparkSession, checkpoint_dir: str) -> str:
    """Run identifier that is STABLE across restarts of the same
    checkpoint: minted once on first start and persisted UNDER the
    checkpoint directory, so its lifetime is exactly the
    checkpoint's. Three cases the (run, epoch) overwrite scheme
    needs:

    - restart with intact checkpoint → same token; a replayed epoch
      (sink written, commit log not) overwrites its OWN partition
      instead of duplicating it under a fresh run id;
    - checkpoint deleted (true fresh run, epoch ids re-zeroed) →
      the marker dies with the checkpoint, a new token is minted,
      and re-zeroed epochs cannot alias the old run's output;
    - two different streams → different checkpoint dirs by
      Structured Streaming's own contract, hence different tokens.

    The token is encoded in a marker FILE NAME
    (``<ckpt>/_marketviz_run/<hex>``) so recovery is a Hadoop-FS
    listStatus, not a byte-stream read — works on any scheme the
    checkpoint itself works on (local, HDFS, S3A).
    """
    import uuid

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(checkpoint_dir, "_marketviz_run")
    fs = marker.getFileSystem(hconf)
    if fs.exists(marker):
        names = [st.getPath().getName() for st in fs.listStatus(marker)]
        if names:
            return sorted(names)[0]
    token = uuid.uuid4().hex
    fs.mkdirs(marker)
    fs.createNewFile(
        jvm.org.apache.hadoop.fs.Path(marker, token)
    )
    return token


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

    Exactly-once across retries AND restarts via the repo's
    (run, epoch) dynamic-partition-overwrite scheme
    (`streaming/dedup.stream_ingest_gate` documents the failure
    modes): a task retry of epoch N overwrites its OWN partition
    wholesale, and the run token is persisted under the checkpoint
    directory (:func:`_persisted_run_token`) so a crash-replay
    after restart (sink written, commit log not) re-lands on the
    SAME (run, epoch) partition and overwrites it — epoch ids
    continue from the checkpoint, so the pair stays unique. A
    deleted checkpoint (epoch ids re-zeroed) also deletes the
    token, so a genuinely fresh run cannot alias an older run's
    partitions. Plain append sinks would duplicate rows on exactly
    these paths.

    Scale: the gate is a per-batch column-expression filter — no
    Python, no shuffle; the sinks partition by (run, epoch), so
    downstream consumers compact or prune by ingest generation.
    """
    from ..pipelines.upsert import upsert_by_date_partition

    run_token = _persisted_run_token(spark, checkpoint_dir)

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


def stream_quality_gated_jsonl(
    spark: SparkSession,
    path: str,
    keep_dir: str,
    reject_dir: str,
    bad_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    weights: list[float] | None = None,
):
    """Curation at ingest time: the full streaming quality-gated
    pipeline — JSONL landing dir → parse/contract gate
    (:func:`split_channels`) → learned quality gate
    (`quality_model.quality_scores`, optionally the trained
    ``weights=`` path) — routed into THREE sinks: kept documents
    (with their n_tokens/q_score audit columns), rejected documents
    (same columns, the curation-reject channel a pipeline keeps for
    threshold tuning), and the (reason, raw) bad-line channel.
    Returns the started StreamingQuery.

    This is a pure composition of verified pieces: the quality
    scorer is a map-only column projection (no shuffle, no state),
    so it applies to a micro-batch exactly as to a batch —
    stream == batch parity is pinned by test. Idempotence across
    retries AND restarts is the same persisted-run-token
    (run, epoch) partition-overwrite scheme as
    :func:`stream_documents_jsonl`.

    Scale: per micro-batch one codegen'd scan (gate + scorer are
    column expressions); the three sinks partition by (run, epoch)
    for generation-pruned downstream compaction. The keep/reject
    decision rides WITH the rows (q_score, keep), so downstream
    re-thresholding needs no recompute.
    """
    from ..pipelines.upsert import upsert_by_date_partition
    from .quality_model import quality_scores

    run_token = _persisted_run_token(spark, checkpoint_dir)
    doc_cols = [f.name for f in DOC_FIELDS]

    def route(batch_df: DataFrame, epoch_id: int) -> None:
        bspark = batch_df.sparkSession
        batch_df.persist()
        try:
            good, bad = split_channels(batch_df)
            scored = quality_scores(
                good, passthrough=tuple(c for c in doc_cols if c != "doc_id"),
                weights=weights,
            ).select(
                *doc_cols, "n_tokens", "q_score", "keep"
            )
            kept = scored.filter(F.col("keep")).drop("keep")
            rejected = scored.filter(~F.col("keep")).drop("keep")
            for frame, dest in (
                (kept, keep_dir),
                (rejected, reject_dir),
                (bad, bad_dir),
            ):
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
