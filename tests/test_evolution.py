"""Schema evolution: mixed-schema parquet directories must read as
one stable schema with declared defaults backfilled, without losing
column pruning on the scan."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from marketviz_spark.pipelines.evolution import (
    evolution_report,
    read_evolved,
)


def _write_two_generations(spark, path):
    v1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)],
        "id long, sym string, px double",
    )
    v1.write.mode("overwrite").parquet(path)
    v2 = spark.createDataFrame(
        [(3, "c", 3.0, "XNYS"), (4, "d", 4.0, "XNAS"),
         (5, "e", 5.0, None)],  # venue explicitly unknown
        "id long, sym string, px double, venue string",
    )
    v2.write.mode("append").parquet(path)


def test_read_evolved_backfills_defaults(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        _write_two_generations(spark, path)
        df = read_evolved(spark, path, {"venue": "UNKNOWN"})
        got = {
            r["id"]: r["venue"] for r in df.collect()
        }
        # strict: pre-evolution rows backfill; the explicitly-
        # written NULL (id 5) is PRESERVED, not overwritten
        assert got == {
            1: "UNKNOWN", 2: "UNKNOWN",
            3: "XNYS", 4: "XNAS", 5: None,
        }
        # non-strict coalesce fills every NULL, including id 5
        loose = read_evolved(
            spark, path, {"venue": "UNKNOWN"}, strict=False
        )
        assert {
            r["id"]: r["venue"] for r in loose.collect()
        }[5] == "UNKNOWN"
        # old-file rows keep NULL without a declared default
        raw = read_evolved(spark, path)
        assert (
            raw.filter("venue IS NULL").count() == 3
            and raw.count() == 5
        )


def test_read_evolved_keeps_column_pruning(spark):
    """The defaults projection must not defeat pruning: selecting
    (id, venue) reads only those columns from the scan."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        _write_two_generations(spark, path)
        df = read_evolved(spark, path, {"venue": "UNKNOWN"}).select(
            "id", "venue"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        scan = next(
            l for l in plan.splitlines() if "Scan parquet" in l
        )
        # match only the ReadSchema, not the whole line: the random
        # tempdir path can contain "px"/"sym" as substrings (it did
        # once: /tmp/tmpxgg12spy) and the Location renders inline
        schema = scan.split("ReadSchema:")[1]
        assert "px" not in schema and "sym" not in schema
        assert df.count() == 5


def test_read_evolved_default_for_column_absent_everywhere(spark):
    """A default declared for a column NO file carries must add the
    constant column, not die on an unresolved F.col (ADVICE r6) —
    the ingest-config-ahead-of-first-write case."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        _write_two_generations(spark, path)
        for strict in (True, False):
            df = read_evolved(
                spark, path, {"region": "GLOBAL"}, strict=strict
            )
            assert df.filter(F.col("region") == "GLOBAL").count() == 5


def test_read_evolved_strict_survives_basename_collision(spark):
    """Two partition subdirectories each holding a part file with
    the SAME basename, only one lacking the column: strict routing
    must backfill only the rows from the lacking FILE, so it has to
    key on full paths, not basenames (ADVICE r6)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        old_dir = os.path.join(path, "gen=old")
        new_dir = os.path.join(path, "gen=new")
        os.makedirs(old_dir)
        os.makedirs(new_dir)
        pq.write_table(
            pa.table({"id": [1, 2]}),
            os.path.join(old_dir, "part-00000.parquet"),
        )
        pq.write_table(
            pa.table({"id": [3, 4], "venue": ["XNYS", None]}),
            os.path.join(new_dir, "part-00000.parquet"),
        )
        df = read_evolved(spark, path, {"venue": "UNKNOWN"})
        got = {r["id"]: r["venue"] for r in df.collect()}
        assert got == {
            1: "UNKNOWN",
            2: "UNKNOWN",
            3: "XNYS",
            4: None,  # explicit NULL in the column-bearing file
        }


def test_evolution_report_classifies_columns(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        _write_two_generations(spark, path)
        rep = dict(evolution_report(spark, path))
        assert rep["id"] == "base" and rep["px"] == "base"
        assert rep.get("venue") in ("base", "evolved")
