"""Python DataSource (partition-parallel universe feed) and
manifest-based dataset snapshots."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from marketviz_spark import pysource
from marketviz_spark.pipelines.snapshots import (
    latest_version,
    list_versions,
    read_snapshot,
    rollback,
    write_snapshot,
)


def test_universe_datasource_partitioned_and_deterministic(spark):
    pysource.register(spark)
    df = (
        spark.read.format("marketviz_universe")
        .option("count", 100)
        .option("parts", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows1 = sorted(map(tuple, df.collect()))
    rows2 = sorted(map(tuple, df.collect()))
    assert rows1 == rows2 and len(rows1) == 100
    # the reference's '/'-class symbols appear and normalize away
    assert any("/" in r[0] for r in rows1)
    norm = df.select(
        F.regexp_replace("symbol", "/", "-").alias("ticker")
    )
    assert norm.filter(F.col("ticker").contains("/")).count() == 0
    # shard boundaries don't change content: different parts, same rows
    other = (
        spark.read.format("marketviz_universe")
        .option("count", 100)
        .option("parts", 3)
        .load()
    )
    assert sorted(map(tuple, other.collect())) == rows1


def test_snapshot_versions_isolate_and_rollback(spark):
    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "tbl")
        os.makedirs(root)
        v1 = write_snapshot(spark.range(10), root)
        v2 = write_snapshot(spark.range(25), root)
        assert (v1, v2) == (1, 2)
        assert list_versions(root) == [1, 2]
        assert latest_version(root) == 2
        # pinned reads: old version unchanged by the new write
        assert read_snapshot(spark, root, 1).count() == 10
        assert read_snapshot(spark, root).count() == 25
        # a stray file in the version dir is invisible: reads follow
        # the manifest's file list, not the directory
        stray = os.path.join(root, "versions", "2", "stray.parquet")
        spark.range(1000).coalesce(1).write.parquet(stray + ".tmp")
        part = next(
            f
            for f in os.listdir(stray + ".tmp")
            if f.endswith(".parquet")
        )
        os.replace(os.path.join(stray + ".tmp", part), stray)
        assert read_snapshot(spark, root).count() == 25
        # rollback is a pointer flip; both versions stay readable
        rollback(root, 1)
        assert latest_version(root) == 1
        assert read_snapshot(spark, root).count() == 10
        assert read_snapshot(spark, root, 2).count() == 25


def test_ivf_index_persist_and_search(spark):
    """Persisted-index search must be byte-identical to the
    in-query ivf_topk over the same vectors, and the probe join
    must dynamically prune the cell-partitioned postings scan."""
    import tempfile

    from marketviz_spark import tables
    from marketviz_spark.datapipe.similarity import ivf_topk
    from marketviz_spark.pipelines.ann_index import (
        build_ivf_index,
        ivf_search_index,
    )

    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "ivf")
        build_ivf_index(emb, root)
        # the model is K rows; postings are partitioned by cell
        cells = [
            f
            for f in os.listdir(os.path.join(root, "postings"))
            if f.startswith("cell=")
        ]
        assert len(cells) > 1
        got = ivf_search_index(spark, root, emb)
        want = ivf_topk(emb)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        plan = (
            got._jdf.queryExecution().executedPlan().toString()
        )
        assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_snapshot_diff_cdc(spark):
    from pyspark.sql import functions as F

    from marketviz_spark.pipelines.snapshots import snapshot_diff

    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "tbl")
        os.makedirs(root)
        base = spark.range(10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        write_snapshot(base, root)
        nxt = (
            base.filter("id <> 3")  # remove 3
            .union(spark.createDataFrame([(42, 84)], "id long, v long"))
            .withColumn(
                "v",
                F.when(F.col("id") == 5, F.lit(999)).otherwise(
                    F.col("v")
                ),
            )
        )
        write_snapshot(nxt, root)
        diff = {
            (r["id"], r["change_type"])
            for r in snapshot_diff(spark, root, 1, 2, ["id"]).collect()
        }
        assert diff == {(3, "removed"), (42, "added"), (5, "changed")}


def test_quality_checks_single_pass(spark):
    import tempfile as _tf  # noqa: F401

    from marketviz_spark import tables
    from marketviz_spark.pipelines.quality import (
        accepted_range,
        accepted_values,
        assert_table,
        check_table,
        not_null,
    )

    sf = "/root/testdata/sf0.001"
    li = tables.load(spark, sf, "lineitem")
    orders = tables.load(spark, sf, "orders")
    out = {
        r["check"]: (r["n_violations"], r["passed"])
        for r in check_table(
            li,
            checks=[
                not_null("l_orderkey"),
                accepted_range("l_quantity", 1, 40),
                accepted_values("l_returnflag", ["A", "N", "R"]),
            ],
            unique_keys=[["l_orderkey", "l_linenumber"]],
            refs=[("l_orderkey", orders, "o_orderkey")],
        ).collect()
    }
    assert out["not_null(l_orderkey)"] == (0, True)
    assert out["accepted_values(l_returnflag)"] == (0, True)
    # the synthetic generator does NOT enforce the TPC-H line key —
    # the unique check must COUNT those real duplicates, not pass
    dup = li.count() - li.select(
        "l_orderkey", "l_linenumber"
    ).distinct().count()
    assert dup > 0
    assert out["unique(l_orderkey,l_linenumber)"] == (dup, False)
    assert out["references(l_orderkey->o_orderkey)"] == (0, True)
    # quantities run 1..50 in the synthetic data: the range check
    # must actually count the >40 tail
    n_bad, passed = out["accepted_range(l_quantity,1,40)"]
    want = li.filter("l_quantity > 40").count()
    assert (n_bad, passed) == (want, want == 0)
    # assert_table raises with the failing checks in the message
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="accepted_range"):
        assert_table(
            li, checks=[accepted_range("l_quantity", 1, 40)]
        )


def test_quality_float_range_names(spark):
    """Check names contain dots for float bounds — the result
    columns must still resolve (backtick quoting)."""
    from marketviz_spark.pipelines.quality import (
        accepted_range,
        check_table,
    )

    df = spark.createDataFrame(
        [(0.5,), (1.7,), (None,)], "x double"
    )
    out = check_table(df, checks=[accepted_range("x", 0.0, 1.5)])
    r = out.collect()[0]
    assert r["check"] == "accepted_range(x,0.0,1.5)"
    assert (r["n_violations"], r["passed"]) == (1, False)


def test_snapshot_diff_schema_evolution(spark):
    """Adding a column between versions marks surviving rows
    changed (they gained a field) instead of crashing."""
    from pyspark.sql import functions as F

    from marketviz_spark.pipelines.snapshots import snapshot_diff

    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "tbl")
        os.makedirs(root)
        write_snapshot(
            spark.range(3).select("id", (F.col("id") * 2).alias("v")),
            root,
        )
        write_snapshot(
            spark.range(3).select(
                "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("w")
            ),
            root,
        )
        out = snapshot_diff(spark, root, 1, 2, ["id"]).collect()
        assert {r["change_type"] for r in out} == {"changed"}
        assert len(out) == 3


def test_universe_datasource_empty(spark):
    import marketviz_spark.pysource as pysource

    pysource.register(spark)
    df = (
        spark.read.format("marketviz_universe")
        .option("count", 0)
        .load()
    )
    assert df.count() == 0


def test_python_streaming_source_offsets_and_replay(spark):
    """Spark-4 Python streaming source: availableNow drains the
    finite feed in batch-sized micro-batches (10+10+5), rows are
    exactly the deterministic ticks with no duplicates, and a fresh-
    checkpoint replay yields identical content (the
    readBetweenOffsets exactly-once contract)."""
    import tempfile

    from marketviz_spark import pysource

    pysource.register_stream(spark)

    def drain(ck):
        sizes = []
        rows = []

        def collect(bdf, _bid):
            pdf = bdf.toPandas()
            if len(pdf):
                sizes.append(len(pdf))
                rows.extend(
                    (int(r.seq), r.symbol, float(r.price))
                    for r in pdf.itertuples()
                )

        q = (
            spark.readStream.format("marketviz_quotes")
            .option("total", 25)
            .option("batch", 10)
            .load()
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        # drain: the simple stream reader advances one batch per
        # trigger; stop once the finite feed is exhausted
        import time as _t

        deadline = _t.time() + 60
        while len(rows) < 25 and _t.time() < deadline:
            _t.sleep(0.3)
        q.stop()
        q.awaitTermination()
        return sizes, sorted(rows)

    with tempfile.TemporaryDirectory() as d:
        sizes1, rows1 = drain(d + "/ck1")
        assert sizes1 == [10, 10, 5]
        assert len(rows1) == 25
        assert [r[0] for r in rows1] == list(range(25))
        assert rows1[3] == (3, "T0003", pysource._tick(3)[2])
        sizes2, rows2 = drain(d + "/ck2")
        assert rows2 == rows1
