"""Per-query profiling: where does the wall go?

For each named query (or the top-N by BENCH_DETAIL.md wall), runs
isolated at $SPARK_GRAFT_SF_DIR and reports:

- build_s: Python-side DataFrame construction (registry fn call)
- plan_s: analysis + optimization + physical planning (explain)
- exec1_s / exec2_s: first and second noop materialization
- jobs / stages / tasks: Spark job/stage/task counts of exec2
  (the warm run — the structural cost that survives at scale)

Usage: python tools/profile_queries.py [name1,name2,... | topN]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from marketviz_spark.registry import QUERIES  # noqa: E402
from marketviz_spark.session import get_spark  # noqa: E402


def _top_by_detail(n: int) -> list[str]:
    names: list[str] = []
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.md",
    )
    with open(path) as fh:
        for ln in fh:
            parts = [p.strip() for p in ln.strip().strip("|").split("|")]
            if len(parts) >= 2 and parts[0] in QUERIES:
                names.append(parts[0])
            if len(names) >= n:
                break
    return names


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "top25"
    if arg.startswith("top"):
        names = _top_by_detail(int(arg[3:]))
    else:
        names = [n for n in arg.split(",") if n in QUERIES]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("marketviz_profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm the JVM/parquet/codegen paths once
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(
        f"{'query':34s} {'build':>6s} {'plan':>6s} {'exec1':>7s}"
        f" {'exec2':>7s} {'jobs':>5s} {'stage':>6s} {'tasks':>6s}"
    )
    for name in names:
        fn = QUERIES[name].fn
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        with redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t2 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t3 = time.time()
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        df2 = fn(spark, sf_dir)
        t4 = time.time()
        df2.write.mode("overwrite").format("noop").save()
        t5 = time.time()
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = jobs_after - jobs_before
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            f"{name:34s} {t1 - t0:6.2f} {t2 - t1:6.2f} {t3 - t2:7.2f}"
            f" {t5 - t4:7.2f} {len(new_jobs):5d} {n_stages:6d}"
            f" {n_tasks:6d}"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
