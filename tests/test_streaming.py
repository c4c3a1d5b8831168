"""Streaming semantics: bounded replay through Structured Streaming
must agree with the batch operators (which are DuckDB-oracle-checked
in test_oracle_parity). This closes the loop: batch == oracle,
stream == batch => stream == oracle."""

from __future__ import annotations

import os
import tempfile

import pytest

from marketviz_spark.registry import QUERIES
from marketviz_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
    session_counts,
)
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture(scope="module")
def events_dir():
    """File-source needs a directory; symlink the testdata file in."""
    with tempfile.TemporaryDirectory() as d:
        os.symlink(
            f"{SF_SMALL}/events.parquet", os.path.join(d, "events.parquet")
        )
        yield d


def test_tumbling_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(tumbling_counts(stream), "t_tumbling", "complete")
    got = _rows(spark.sql("SELECT * FROM t_tumbling"))
    want = _rows(QUERIES["events_tumbling_1h"].fn(spark, SF_SMALL))
    assert got == want


def test_session_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(session_counts(stream), "t_session", "complete")
    got = _rows(spark.sql("SELECT * FROM t_session"))
    want = _rows(QUERIES["events_session_10m"].fn(spark, SF_SMALL))
    assert got == want


def test_watermark_drops_late_rows(spark, events_dir):
    """With a tiny watermark and per-file triggers, the aggregate
    state still produces complete-mode results for all windows seen;
    append-mode only emits closed windows. Assert append emits a
    subset of complete."""
    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        tumbling_counts(stream, watermark="1 minute"), "t_append", "append"
    )
    appended = spark.sql("SELECT count(*) AS n FROM t_append").collect()[0].n
    complete = (
        QUERIES["events_tumbling_1h"].fn(spark, SF_SMALL).count()
    )
    assert appended <= complete


def test_stateful_running_totals_equals_batch(spark, events_dir):
    """Custom stateful operator: after a bounded replay, the LAST
    emitted row per user equals the batch aggregate."""
    from pyspark.sql import functions as F

    from marketviz_spark.streaming.stateful import running_user_totals
    from marketviz_spark import tables

    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        running_user_totals(stream), "t_stateful", "update"
    )
    # update mode re-emits per batch; with one input file there is
    # exactly one batch -> one row per user
    got = {
        r["user_id"]: (r["n_events"], round(r["value_sum"], 6))
        for r in spark.sql("SELECT * FROM t_stateful").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in tables.load_events(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_stateful_state_carries_across_micro_batches(spark):
    """Live-mode contract of the custom stateful operator: state
    must CARRY across micro-batches, not reset. Two staggered files
    force two micro-batches; the update-mode sink records each
    batch's emission, so the per-batch running totals are directly
    assertable — including the second batch's incremented state."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.stateful import running_user_totals

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    batch1 = [
        (1, base + 60 * ns, 1, "click", 1.0, None),
        (2, base + 120 * ns, 1, "view", 2.0, None),
        (3, base + 180 * ns, 2, "click", 3.0, None),
    ]
    batch2 = [
        (4, base + 240 * ns, 1, "click", 4.0, None),  # user 1 again
        (5, base + 300 * ns, 3, "view", 5.0, None),  # new user
    ]
    with tempfile.TemporaryDirectory() as src:
        f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
        spark.createDataFrame(batch1, schema).toPandas().to_parquet(f1)
        spark.createDataFrame(batch2, schema).toPandas().to_parquet(f2)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))
        os.utime(f2, (now, now))

        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        run_to_memory(
            running_user_totals(stream), "t_stateful_multi", "update"
        )
        got = {
            (r["user_id"], r["batches"]): (r["n_events"], r["value_sum"])
            for r in spark.sql("SELECT * FROM t_stateful_multi").collect()
        }
    # batch 1 emissions: fresh state per touched user
    assert got[(1, 1)] == (2, 3.0)
    assert got[(2, 1)] == (1, 3.0)
    # batch 2: user 1's state CARRIED (n=2+1, s=3+4, batches=2);
    # user 3 starts fresh; user 2 untouched -> no second emission
    assert got[(1, 2)] == (3, 7.0)
    assert got[(3, 1)] == (1, 5.0)
    assert (2, 2) not in got
    assert len(got) == 4


def test_stream_stream_join_multi_batch_watermark_eviction(spark):
    """Live-mode contract of the stream-stream interval join across
    micro-batches: an in-horizon pair in batch 1 emits; batch 2
    advances event time (and thus the watermark); a LATE error in
    batch 3 — older than the watermark — is dropped at input, so it
    joins with nothing even though its matching click existed; a
    fresh in-horizon pair in batch 3 still emits."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.joins import click_error_pairs_stream

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    h = 3600 * ns
    base = 1704103200 * ns
    # watermark = 10 minutes (passed below)
    batch1 = [
        (1, base + 60 * ns, 1, "click", 1.0, None),
        (2, base + 120 * ns, 1, "error", 1.0, None),  # pairs with 1
    ]
    # advances max event time on BOTH sides (the global watermark is
    # the MIN across the click and error watermark nodes, so a batch
    # advancing only clicks leaves the join's watermark at the start)
    # -> subsequent batches run with watermark ~base+2h-10m
    batch2 = [
        (3, base + 2 * h, 9, "click", 1.0, None),
        (7, base + 2 * h, 8, "error", 1.0, None),  # no click for u=8: no pair
    ]
    # state cleanup runs at the END of a batch with that batch's
    # watermark, so one more batch must pass for click 1's state to
    # be evicted (same two-step as the dedup-content watermark test)
    batch3 = [(8, base + 2 * h + 30 * ns, 9, "click", 1.0, None)]
    batch4 = [
        # LATE error (event time far below the watermark): its only
        # range match, click 1, is evicted -> must produce no pair
        (4, base + 180 * ns, 1, "error", 1.0, None),
        # fresh in-horizon pair, proving the join still works
        (5, base + 2 * h + 60 * ns, 2, "click", 1.0, None),
        (6, base + 2 * h + 120 * ns, 2, "error", 1.0, None),
    ]
    with tempfile.TemporaryDirectory() as src:
        now = time.time()
        for i, batch in enumerate((batch1, batch2, batch3, batch4)):
            f = os.path.join(src, f"{i}.parquet")
            spark.createDataFrame(batch, schema).toPandas().to_parquet(f)
            os.utime(f, (now - 60 + 30 * i, now - 60 + 30 * i))

        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        run_to_memory(
            click_error_pairs_stream(stream, watermark="10 minutes"),
            "t_ss_join_multi",
            "append",
        )
        got = {
            (r["error_id"], r["click_id"])
            for r in spark.sql("SELECT * FROM t_ss_join_multi").collect()
        }
    assert got == {(2, 1), (6, 5)}


def test_sliding_stream_equals_batch(spark, events_dir):
    from pyspark.sql import functions as F

    from marketviz_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, events_dir)
    slid = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
    )
    run_to_memory(slid, "t_sliding", "complete")
    got = _rows(spark.sql("SELECT * FROM t_sliding"))
    want = _rows(
        QUERIES["events_sliding_1h_30m"]
        .fn(spark, SF_SMALL)
        .select("window_start", "n_events")
    )
    assert got == want


def test_foreachbatch_partitioned_sink(spark, events_dir):
    """foreachBatch + partition overwrite: the streamed tumbling
    aggregate lands in a parquet table equal to the batch result."""
    import tempfile

    from marketviz_spark.streaming.windows import (
        stream_to_partitioned_table,
        tumbling_counts,
    )

    with tempfile.TemporaryDirectory() as d:
        stream = read_events_stream(spark, events_dir)
        agg = tumbling_counts(stream)
        q = stream_to_partitioned_table(
            agg,
            os.path.join(d, "table"),
            os.path.join(d, "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = _rows(
            spark.read.parquet(os.path.join(d, "table")).select(
                "window_start", "event_type", "n_events", "sum_value"
            )
        )
        want = _rows(QUERIES["events_tumbling_1h"].fn(spark, SF_SMALL))
        assert got == want


def test_foreachbatch_multi_trigger_no_loss(spark):
    """Regression: a later micro-batch that updates only ONE
    event_type of an already-written window must not delete the
    window's other event_type rows (update mode emits only changed
    groups; the sink must partition on the FULL grouping key)."""
    import time

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from marketviz_spark.streaming.windows import (
        stream_to_partitioned_table,
        tumbling_counts,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns  # some instant; window alignment is moot
    rows1 = [
        (1, base + 60 * ns, 1, "click", 1.0, None),
        (2, base + 120 * ns, 1, "click", 2.0, None),
        (3, base + 180 * ns, 2, "view", 3.0, None),
    ]
    rows2 = [(4, base + 240 * ns, 3, "click", 4.0, None)]

    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as d:
        f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
        spark.createDataFrame(rows1, schema).toPandas().to_parquet(f1)
        spark.createDataFrame(rows2, schema).toPandas().to_parquet(f2)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))  # f1 triggers first
        os.utime(f2, (now, now))

        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        q = stream_to_partitioned_table(
            tumbling_counts(stream),
            os.path.join(d, "table"),
            os.path.join(d, "ckpt"),
        )
        try:
            q.processAllAvailable()
            n_batches = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
        finally:
            q.stop()
        assert n_batches >= 2, "test must exercise multiple micro-batches"

        got = _rows(
            spark.read.parquet(os.path.join(d, "table")).select(
                "window_start", "event_type", "n_events", "sum_value"
            )
        )
        batch = (
            spark.read.schema(schema)
            .parquet(src)
            .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        )
        want = _rows(tumbling_counts(batch))
        assert got == want
        # the 'view' group written in batch 1 must have survived batch 2
        assert any("view" in r for r in got)


def test_stream_dedup_exact_across_batches(spark):
    """Duplicate event_ids arriving in LATER micro-batches (within
    the watermark) are dropped; the surviving set equals batch
    dropDuplicates."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.dedup import stream_dedup_exact

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    batch1 = [
        (1, base + 60 * ns, 1, "click", 1.0, None),
        (2, base + 120 * ns, 1, "view", 2.0, None),
    ]
    batch2 = [
        (1, base + 61 * ns, 1, "click", 1.0, None),  # dup key, later ts
        (3, base + 180 * ns, 2, "click", 3.0, None),
    ]
    with tempfile.TemporaryDirectory() as src:
        f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
        spark.createDataFrame(batch1, schema).toPandas().to_parquet(f1)
        spark.createDataFrame(batch2, schema).toPandas().to_parquet(f2)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))
        os.utime(f2, (now, now))

        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        run_to_memory(
            stream_dedup_exact(stream).select("event_id"),
            "t_dedup",
            "append",
        )
        got = sorted(
            r.event_id for r in spark.sql("SELECT * FROM t_dedup").collect()
        )
    assert got == [1, 2, 3]


def test_stream_dedup_content_late_arrival_residual(spark):
    """The documented watermark contract of stream_dedup_content,
    proven on a late-arrival replay:

    - a duplicate payload arriving WITHIN the watermark horizon is
      dropped;
    - NULL props and empty-string props are DIFFERENT contents (the
      fingerprint distinguishes them) — both survive;
    - a duplicate arriving AFTER the watermark evicted its
      fingerprint state SURVIVES the stream (the residual), and the
      downstream batch mop-up collapses it — the standard
      lambda-cleanup pattern.
    """
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.dedup import stream_dedup_content

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    h = 3600 * ns
    base = 1704103200 * ns
    # watermark is 2h; state for a fingerprint first seen at ts T is
    # evicted once watermark (= max event time - 2h) passes T + 2h.
    batch1 = [
        (1, base, 1, "click", 1.0, "x"),
        (2, base + 60 * ns, 1, "view", 1.0, None),  # NULL props
        (3, base + 120 * ns, 1, "view", 1.0, ""),  # empty != NULL
        (4, base + 180 * ns, 2, "click", 1.0, "x"),  # in-horizon dup
    ]
    # advances max event time to base+5h -> the NEXT batch runs with
    # watermark base+3h, past the "x" state expiry (base+2h).
    batch2 = [(9, base + 5 * h, 3, "click", 1.0, "filler")]
    # eviction applies at the END of a batch using that batch's
    # watermark, so one more batch must pass before the dup arrives:
    # batch3 runs at watermark base+3h and evicts the "x" state.
    batch3 = [(10, base + 5 * h + 10 * ns, 3, "click", 1.0, "filler2")]
    # duplicate "x" payload, ts past the watermark -> not late, but
    # its fingerprint state is gone: the residual that survives.
    batch4 = [(5, base + 5 * h + 60 * ns, 4, "click", 1.0, "x")]
    with tempfile.TemporaryDirectory() as src:
        now = time.time()
        for i, batch in enumerate((batch1, batch2, batch3, batch4)):
            f = os.path.join(src, f"{i}.parquet")
            spark.createDataFrame(batch, schema).toPandas().to_parquet(f)
            os.utime(f, (now - 60 + 30 * i, now - 60 + 30 * i))

        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        run_to_memory(
            stream_dedup_content(stream).select("event_id", "props"),
            "t_dedup_content",
            "append",
        )
        out = spark.sql("SELECT * FROM t_dedup_content")
        got = sorted(r.event_id for r in out.collect())
        # 4 dropped (dup within horizon); 2 and 3 BOTH kept (NULL vs
        # empty are distinct contents); 5 kept (post-watermark residual)
        assert got == [1, 2, 3, 5, 9, 10]

        # batch mop-up: exact content dedup collapses the residual
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        fp = F.when(F.col("props").isNull(), F.lit("<null>")).otherwise(
            F.md5(F.col("props"))
        )
        mopped = (
            out.withColumn("_fp", fp)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("_fp").orderBy("event_id")
                ),
            )
            .filter("rn = 1")
        )
        assert sorted(r.event_id for r in mopped.collect()) == [
            1,
            2,
            3,
            9,
            10,
        ]


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Stream-stream interval join (watermarked both sides, user_id
    equi-key + time-range condition) must produce exactly the batch
    twin's pairs — the batch side is DuckDB-oracle-checked, so
    stream == batch closes the loop."""
    from marketviz_spark.streaming.joins import click_error_pairs_stream

    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        click_error_pairs_stream(stream), "t_ss_join", "append"
    )
    got = _rows(spark.sql("SELECT * FROM t_ss_join"))
    want = _rows(QUERIES["events_click_error_pairs"].fn(spark, SF_SMALL))
    assert got and got == want


def test_streaming_curation_map_ops_equal_batch(spark):
    """The curation layer's map-only operators (PII scrub, quality
    stats) run UNCHANGED on a document stream — Spark's unified
    model means the DuckDB-oracle-checked batch semantics carry
    over; a bounded replay must match the batch output exactly."""
    import os
    import tempfile

    from marketviz_spark import tables
    from marketviz_spark.datapipe.curation import pii_scrub
    from marketviz_spark.datapipe.textstats import text_stats
    from marketviz_spark.schemas import DOCUMENTS

    with tempfile.TemporaryDirectory() as d:
        os.symlink(
            f"{SF_SMALL}/documents.parquet",
            os.path.join(d, "documents.parquet"),
        )
        stream = (
            spark.readStream.schema(DOCUMENTS)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        batch = tables.load(spark, SF_SMALL, "documents")
        run_to_memory(pii_scrub(stream), "t_cur_scrub", "append")
        assert _rows(spark.sql("SELECT * FROM t_cur_scrub")) == _rows(
            pii_scrub(batch)
        )
        run_to_memory(text_stats(stream), "t_cur_stats", "append")
        assert _rows(spark.sql("SELECT * FROM t_cur_stats")) == _rows(
            text_stats(batch)
        )


def test_stream_ingest_gate_dedups_against_persisted_corpus(spark):
    """The foreachBatch ingest gate refuses duplicates across
    micro-batches by anti-joining the PERSISTED corpus (not
    watermark state): batch 2's repeat of batch 1's payload is
    dropped, its genuinely new payload lands, within-batch dups
    collapse to the min event_id, and re-running the whole stream
    over the same checkpointed corpus admits nothing new
    (idempotent restart)."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.dedup import stream_ingest_gate

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    batch1 = [
        (5, base + 60 * ns, 1, "click", 1.0, "payload-A"),
        (2, base + 61 * ns, 1, "click", 1.0, "payload-A"),  # in-batch dup
        (3, base + 120 * ns, 1, "view", 2.0, "payload-B"),
    ]
    batch2 = [
        (9, base + 180 * ns, 2, "click", 3.0, "payload-A"),  # cross-batch dup
        (4, base + 240 * ns, 2, "view", 4.0, "payload-C"),
    ]
    with tempfile.TemporaryDirectory() as src, \
            tempfile.TemporaryDirectory() as d:
        f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
        spark.createDataFrame(batch1, schema).toPandas().to_parquet(f1)
        spark.createDataFrame(batch2, schema).toPandas().to_parquet(f2)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))
        os.utime(f2, (now, now))
        corpus = os.path.join(d, "corpus")

        q = stream_ingest_gate(
            read_events_stream(spark, src, max_files_per_trigger=1),
            corpus,
            os.path.join(d, "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = {
            r["event_id"]
            for r in spark.read.parquet(corpus).collect()
        }
        # payload-A -> min(2,5)=2; payload-B -> 3; payload-C -> 4; 9 refused
        assert got == {2, 3, 4}

        # restart with a FRESH checkpoint over the same files: the
        # corpus itself is the dedup reference, so nothing is re-admitted
        q2 = stream_ingest_gate(
            read_events_stream(spark, src, max_files_per_trigger=1),
            corpus,
            os.path.join(d, "ckpt2"),
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        got2 = {
            r["event_id"]
            for r in spark.read.parquet(corpus).collect()
        }
        assert got2 == {2, 3, 4}


def test_stream_starts_on_empty_staging_dir(spark):
    """Production contract: the stream must start cleanly against an
    existing-but-EMPTY staging directory (no parquet footer to
    probe — the schema falls back to the canonical EVENTS shape)."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    with tempfile.TemporaryDirectory() as src:
        stream = read_events_stream(spark, src)  # must not raise
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_empty_start")
            .start()
        )
        try:
            q.processAllAvailable()  # zero batches: fine
            n0 = spark.sql("SELECT count(*) n FROM t_empty_start").first()["n"]
            assert n0 == 0
        finally:
            q.stop()


def test_stream_static_enrich_equals_batch(spark, events_dir):
    """Stream-static dimension join: replaying the bounded events
    through enrich_stream must equal the oracle-checked batch twin.
    Stateless — no watermark involved."""
    from marketviz_spark import tables
    from marketviz_spark.streaming.enrich import enrich_stream

    stream = read_events_stream(spark, events_dir)
    batch = tables.load_events(spark, SF_SMALL)
    run_to_memory(
        enrich_stream(stream, batch), "t_enrich", "append"
    )
    got = _rows(spark.sql("SELECT * FROM t_enrich"))
    want = _rows(QUERIES["events_enrich_static"].fn(spark, SF_SMALL))
    assert got == want
    assert len(got) > 0


def test_streaming_anomaly_flags_match_integer_rule(spark):
    """Three staggered micro-batches per event type; the emitted
    flags must equal the pure-Python integer rule applied to the
    prior batch-count history — batch 1 has no history (never
    flags), batch 2 flags any change, batch 3 flags iff the count
    deviates from the first two."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.stateful import running_type_anomaly

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    # per-batch counts for type "click": 3, 3, 9 (spike at batch 3)
    counts = [3, 3, 9]
    batches = []
    eid = 0
    for b, c in enumerate(counts):
        rows = []
        for i in range(c):
            eid += 1
            rows.append(
                (eid, base + (b * 600 + i) * ns, 1, "click", 1.0, None)
            )
        batches.append(rows)
    with tempfile.TemporaryDirectory() as src:
        now = time.time()
        for b, rows in enumerate(batches):
            f = os.path.join(src, f"b{b}.parquet")
            spark.createDataFrame(rows, schema).toPandas().to_parquet(f)
            os.utime(f, (now - 60 * (len(batches) - b), ) * 2)
        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        run_to_memory(
            running_type_anomaly(stream), "t_anomaly_multi", "update"
        )
        got = {
            r["hist_batches"]: (r["batch_count"], r["is_anomaly"])
            for r in spark.sql("SELECT * FROM t_anomaly_multi").collect()
        }
    # mirror the integer rule in python over the same history
    n, s, q = 0, 0, 0
    for b, c in enumerate(counts):
        expect = int(n > 0 and (c * n - s) ** 2 > 4 * (n * q - s * s))
        assert got[b] == (c, expect), (b, got[b], expect)
        n, s, q = n + 1, s + c, q + c * c
    # and the spike batch specifically must be flagged
    assert got[2] == (9, 1)


def test_observed_stream_metrics_per_micro_batch(spark):
    """observe_checks on a STREAM surfaces violation counts in each
    micro-batch's StreamingQueryProgress.observedMetrics — two
    staggered files, each with one null-user row, must report one
    violation per batch and two in total."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.pipelines.quality import not_null, observe_checks

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    batches = [
        [(1, base + ns, 1, "click", 1.0, None),
         (2, base + 2 * ns, None, "view", 2.0, None)],
        [(3, base + 3 * ns, 2, "click", 3.0, None),
         (4, base + 4 * ns, None, "view", 4.0, None)],
    ]
    with tempfile.TemporaryDirectory() as src:
        now = time.time()
        for i, rows in enumerate(batches):
            f = os.path.join(src, f"b{i}.parquet")
            spark.createDataFrame(rows, schema).toPandas().to_parquet(f)
            os.utime(f, (now - 60 * (len(batches) - i),) * 2)
        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        observed = observe_checks(stream, [not_null("user_id")])
        q = (
            observed.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_observed_gate")
            .start()
        )
        try:
            q.processAllAvailable()
            per_batch = [
                p["observedMetrics"]["dq_gate"]["not_null(user_id)"]
                for p in q.recentProgress
                if p.get("observedMetrics", {}).get("dq_gate")
            ]
        finally:
            q.stop()
    assert per_batch == [1, 1], per_batch
    # and the rows themselves passed through untouched
    assert spark.sql("SELECT count(*) FROM t_observed_gate").first()[0] == 4


def test_stream_upsert_sink_last_writer_wins_and_idempotent(spark):
    """foreachBatch keyed-upsert sink: two staggered files force two
    micro-batches with an overlapping key; the final table holds one
    row per key with the LATEST value (within-batch dups collapse by
    order_col first), and replaying the whole stream into the same
    table from a fresh checkpoint converges to the identical state
    (the at-least-once -> effectively-exactly-once argument)."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.sinks import run_upsert_stream

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    batch1 = [
        (1, base + 60 * ns, 1, "click", 1.0, None),
        (1, base + 90 * ns, 1, "click", 1.5, None),  # in-batch dup,
        (2, base + 120 * ns, 1, "view", 2.0, None),  # later ts wins
    ]
    batch2 = [
        (1, base + 240 * ns, 1, "click", 9.0, None),  # update key 1
        (3, base + 300 * ns, 2, "view", 3.0, None),   # new key
    ]

    def final_table(src, out, ck):
        os.makedirs(src, exist_ok=True)
        f1 = os.path.join(src, "a.parquet")
        f2 = os.path.join(src, "b.parquet")
        spark.createDataFrame(batch1, schema).toPandas().to_parquet(f1)
        spark.createDataFrame(batch2, schema).toPandas().to_parquet(f2)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))
        os.utime(f2, (now, now))
        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        run_upsert_stream(
            stream, out, ["event_id"], ck, order_col="ts"
        )
        return {
            r["event_id"]: r["value"]
            for r in spark.read.parquet(out).collect()
        }

    with tempfile.TemporaryDirectory() as d:
        got1 = final_table(
            os.path.join(d, "src1"),
            os.path.join(d, "out"),
            os.path.join(d, "ck1"),
        )
        assert got1 == {1: 9.0, 2: 2.0, 3: 3.0}
        # full replay, fresh checkpoint, SAME output table
        got2 = final_table(
            os.path.join(d, "src2"),
            os.path.join(d, "out"),
            os.path.join(d, "ck2"),
        )
        assert got2 == got1


def test_quote_stream_into_upsert_sink_latest_per_symbol(spark):
    """End-to-end: the Python streaming quote source drains through
    the foreachBatch keyed-upsert sink into a per-symbol latest-tick
    table — last writer (highest seq) wins across micro-batches."""
    import time

    from marketviz_spark import pysource
    from marketviz_spark.streaming.sinks import upsert_batch_fn

    pysource.register_stream(spark)
    with tempfile.TemporaryDirectory() as d:
        out, ck = os.path.join(d, "latest"), os.path.join(d, "ck")
        stream = (
            spark.readStream.format("marketviz_quotes")
            .option("total", 25)
            .option("batch", 10)
            .load()
        )
        sink = upsert_batch_fn(out, ["symbol"], "seq")
        sizes = []

        def apply_and_track(bdf, bid):
            n = bdf.count()
            if n:
                sink(bdf, bid)
            sizes.append(n)

        q = (
            stream.writeStream.foreachBatch(apply_and_track)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        # drained = all 25 feed rows arrived; `sizes` is appended
        # AFTER the sink call returns, so sum == 25 already proves
        # every write completed (and the output read below happens
        # after stop()+awaitTermination anyway). The old condition
        # additionally waited for a trailing EMPTY micro-batch,
        # which an exhausted source never produces — the loop always
        # burned its full 60 s deadline (r14 measurement fix).
        deadline = time.time() + 60
        while time.time() < deadline and sum(sizes) != 25:
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()
        assert sum(sizes) == 25, sizes
        assert [n for n in sizes if n] == [10, 10, 5]
        got = {
            r["symbol"]: r["seq"]
            for r in spark.read.parquet(out).collect()
        }
        # symbol of tick i is T{i % 7}: latest seq per symbol is the
        # largest i < 25 with i % 7 == s
        expect = {}
        for i in range(25):
            expect[f"T{i % 7:04d}"] = i
        assert got == expect


def test_idle_session_flush_timeout_evicts_state(spark):
    """Processing-time timeout: an idle user's session is flushed as
    a final row and the state REMOVED — proven by the user's next
    event starting a fresh count (n resets), not continuing the old
    one."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.stateful import idle_session_flush
    from marketviz_spark.streaming.windows import read_events_stream

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    with tempfile.TemporaryDirectory() as src:
        f1 = os.path.join(src, "a.parquet")
        spark.createDataFrame(
            [(1, base, 1, "click", 2.0, None),
             (2, base + ns, 1, "view", 3.0, None)],
            schema,
        ).toPandas().to_parquet(f1)
        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            idle_session_flush(stream)
            .writeStream.format("memory")
            .queryName("t_idle")
            .outputMode("update")
            .trigger(processingTime="200 milliseconds")
            .start()
        )

        def rows():
            return [
                (r["n_events"], r["value_sum"], r["final"])
                for r in spark.sql(
                    "SELECT * FROM t_idle WHERE user_id = 1"
                ).collect()
            ]

        deadline = time.time() + 60
        # phase 1: running row, then the timeout flush
        while (2, 5.0, 1) not in rows() and time.time() < deadline:
            time.sleep(0.3)
        assert (2, 5.0, 0) in rows(), rows()   # running emission
        assert (2, 5.0, 1) in rows(), rows()   # final flush fired
        # phase 2: next event starts a FRESH session (state removed)
        f2 = os.path.join(src, "b.parquet")
        spark.createDataFrame(
            [(3, base + 2 * ns, 1, "click", 7.0, None)], schema
        ).toPandas().to_parquet(f2)
        os.utime(f2, None)
        while (1, 7.0, 0) not in rows() and time.time() < deadline:
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()
        got = rows()
        assert (1, 7.0, 0) in got, got       # fresh count proves reset
        assert (3, 12.0, 0) not in got, got  # old state did NOT leak


def test_progress_recorder_sees_every_micro_batch(spark):
    """The ops listener records one progress event per micro-batch
    with the input-row counts, start/termination lifecycle, and the
    bounded-memory contract."""
    import time

    from marketviz_spark import pysource
    from marketviz_spark.streaming import monitor

    pysource.register_stream(spark)
    rec = monitor.attach(spark, max_events=100)
    try:
        with tempfile.TemporaryDirectory() as d:
            q = (
                spark.readStream.format("marketviz_quotes")
                .option("total", 25)
                .option("batch", 10)
                .load()
                .writeStream.format("memory")
                .queryName("t_mon")
                .option(
                    "checkpointLocation", os.path.join(d, "ck")
                )
                .trigger(processingTime="0 seconds")
                .start()
            )
            deadline = time.time() + 60
            while (
                spark.sql("SELECT count(*) FROM t_mon").collect()[0][0]
                < 25
                and time.time() < deadline
            ):
                time.sleep(0.3)
            qid = str(q.id)
            q.stop()
            q.awaitTermination()
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while (
            qid not in rec.terminated and time.time() < deadline
        ):
            time.sleep(0.3)
        assert qid in rec.started and qid in rec.terminated
        batches = rec.batches_for(qid)
        sizes = [
            b["num_input_rows"] for b in batches
            if b["num_input_rows"] > 0
        ]
        assert sizes == [10, 10, 5], batches
        assert all(
            b["batch_duration_ms"] is not None for b in batches
        )
    finally:
        spark.streams.removeListener(rec)


def test_stateful_resume_from_checkpoint_exactly_once(spark):
    """Production recovery path (r8): a STOPPED stateful query
    restarted against the SAME checkpoint location must (a) not
    reprocess input files the first run committed and (b) restore
    per-user state from the state store, so post-restart emissions
    continue the running totals exactly where the first run stopped.
    Every other replay test here uses a fresh checkpoint; this is
    the one that exercises offset + state recovery."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.stateful import running_user_totals

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    run1 = [
        (1, base + 60 * ns, 1, "click", 1.0, None),
        (2, base + 120 * ns, 1, "view", 2.0, None),
        (3, base + 180 * ns, 2, "click", 3.0, None),
    ]
    run2 = [
        (4, base + 240 * ns, 1, "click", 4.0, None),
        (5, base + 300 * ns, 1, "view", 6.0, None),
        (6, base + 360 * ns, 3, "view", 5.0, None),
    ]

    def drive(src, ck, out):
        # the memory sink refuses checkpoint recovery; foreachBatch
        # appending each micro-batch's emissions (tagged with its
        # epoch) IS recoverable — the production sink shape
        def write_batch(bdf, epoch_id):
            bdf.withColumn("epoch", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(out)

        # production startup order: pin the state schema against the
        # checkpoint before start() (both first start and restart)
        from marketviz_spark.streaming.stateful import (
            STATE_SCHEMA,
            pin_state_schema,
        )

        pin_state_schema(ck, STATE_SCHEMA, "running_user_totals")
        q = (
            running_user_totals(read_events_stream(spark, src))
            .writeStream.outputMode("update")
            .foreachBatch(write_batch)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            (r["user_id"], r["epoch"]): (
                r["n_events"],
                r["value_sum"],
                r["batches"],
            )
            for r in spark.read.parquet(out).collect()
        }

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "staging")
        os.makedirs(src)
        ck = os.path.join(d, "ck")
        out = os.path.join(d, "out")
        f1 = os.path.join(src, "a.parquet")
        spark.createDataFrame(run1, schema).toPandas().to_parquet(f1)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))

        got1 = drive(src, ck, out)
        assert got1 == {(1, 0): (2, 3.0, 1), (2, 0): (1, 3.0, 1)}

        # the query is STOPPED; a second file lands, then restart
        # with the SAME checkpoint (same output dir: appends only)
        f2 = os.path.join(src, "b.parquet")
        spark.createDataFrame(run2, schema).toPandas().to_parquet(f2)
        all2 = drive(src, ck, out)
        got2 = {
            u: v for (u, e), v in all2.items() if e > 0
        }  # post-restart emissions only

    # exactly-once input: file a was committed by run 1, so user 2
    # (only in file a) produces NO new emission after the restart
    assert 2 not in got2
    # state recovery: user 1's totals CONTINUE from run 1's state
    # (n 2+2, sum 3+10, batches 1+1); user 3 starts fresh
    assert got2[1] == (4, 13.0, 2)
    assert got2[3] == (1, 5.0, 1)
    assert len(got2) == 2


def test_stateful_identical_under_rocksdb_state_store(spark):
    """The RocksDB state store (ROCKSDB_STATE_STORE_CONF — the
    100 TB provider: disk-backed state instead of executor heap)
    must be a pure swap: the same staggered two-file stateful replay
    emits bit-identical rows under both providers. The provider conf
    is read at query start, so it can be toggled per query on a live
    session."""
    import time

    import pyspark.sql.types as T

    from marketviz_spark.streaming.stateful import (
        ROCKSDB_STATE_STORE_CONF,
        running_user_totals,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    ns = 10**9
    base = 1704103200 * ns
    rows1 = [
        (1, base + 60 * ns, 1, "click", 1.0, None),
        (2, base + 120 * ns, 1, "view", None, None),  # NULL value
        (3, base + 180 * ns, 2, "click", 3.0, None),
    ]
    rows2 = [
        (4, base + 240 * ns, 1, "click", 4.0, None),
        (5, base + 300 * ns, 3, "view", 5.0, None),
    ]
    (key, rocks_val), = ROCKSDB_STATE_STORE_CONF.items()
    default_val = spark.conf.get(key)

    def replay(name):
        with tempfile.TemporaryDirectory() as src:
            f1 = os.path.join(src, "a.parquet")
            f2 = os.path.join(src, "b.parquet")
            spark.createDataFrame(rows1, schema).toPandas().to_parquet(f1)
            spark.createDataFrame(rows2, schema).toPandas().to_parquet(f2)
            now = time.time()
            os.utime(f1, (now - 60, now - 60))
            os.utime(f2, (now, now))
            run_to_memory(
                running_user_totals(
                    read_events_stream(spark, src, max_files_per_trigger=1)
                ),
                name,
                "update",
            )
            return sorted(
                map(str, spark.sql(f"SELECT * FROM {name}").collect())
            )

    try:
        spark.conf.set(key, rocks_val)
        rocks = replay("t_rocksdb_provider")
    finally:
        spark.conf.set(key, default_val)
    default = replay("t_default_provider")
    # 4 emissions: users 1+2 in batch 1, users 1+3 in batch 2
    assert rocks == default and len(rocks) == 4


def test_cms_cells_stream_equals_batch(spark, events_dir):
    """The windowed count-min grid is a plain streaming agg (the
    mergeability claim made operational): complete-mode stream
    output must equal the batch twin cell-for-cell."""
    from marketviz_spark.streaming.windows import cms_cells

    stream = read_events_stream(spark, events_dir)
    run_to_memory(cms_cells(stream), "t_cms_cells", "complete")
    got = _rows(spark.sql("SELECT * FROM t_cms_cells"))
    want = _rows(QUERIES["events_cms_cells"].fn(spark, SF_SMALL))
    assert got == want


def test_state_schema_guard_fails_loudly_on_old_checkpoint(tmp_path):
    """r11 verdict item 6: stateful.py documents that the 4-field
    STATE_SCHEMA is checkpoint-incompatible with the round-6 3-field
    one — pin_state_schema must turn that restart into an immediate,
    actionable error (fresh checkpoint location), never a mid-batch
    state deserialization failure."""
    from marketviz_spark.streaming.stateful import (
        STATE_SCHEMA,
        pin_state_schema,
    )

    ck = str(tmp_path / "ck")
    legacy = "n long, s double, b int"  # the r6 schema
    pin_state_schema(ck, legacy, "running_user_totals")
    # same-schema restart is clean
    pin_state_schema(ck, legacy, "running_user_totals")
    # a second operator under the same checkpoint tree pins
    # independently
    pin_state_schema(ck, "n long, s long, q long", "running_type_anomaly")
    # upgraded code against the legacy checkpoint: loud + remediation
    with pytest.raises(RuntimeError, match="FRESH checkpoint"):
        pin_state_schema(ck, STATE_SCHEMA, "running_user_totals")
    # the unrelated operator is still unaffected
    pin_state_schema(ck, "n long, s long, q long", "running_type_anomaly")
    # fresh location: pins the new schema and restarts cleanly
    ck2 = str(tmp_path / "ck2")
    pin_state_schema(ck2, STATE_SCHEMA, "running_user_totals")
    pin_state_schema(ck2, STATE_SCHEMA, "running_user_totals")
    # concurrent pins live in per-operator sidecars (ADVICE r12): a
    # shared dict was a non-locked read-modify-write where the last
    # writer dropped the other's pin
    import os

    files = [f for f in os.listdir(ck) if f.startswith("marketviz_")]
    assert len(files) == 2, files
    # legacy shared sidecar (pre-r13 layout) still guards restarts
    import json

    ck3 = str(tmp_path / "ck3")
    os.makedirs(ck3)
    with open(os.path.join(ck3, "marketviz_state_schema.json"), "w") as fh:
        json.dump({"running_user_totals": legacy}, fh)
    with pytest.raises(RuntimeError, match="FRESH checkpoint"):
        pin_state_schema(ck3, STATE_SCHEMA, "running_user_totals")
