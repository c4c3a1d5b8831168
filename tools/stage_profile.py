"""Warm-run a query with the UI enabled and dump per-stage wall /
task-time / shuffle metrics via the UI REST API — evidence for which
stage actually carries a multi-job iterative query.

Usage: python tools/stage_profile.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("SPARK_UI", "true")

from marketviz_spark.registry import QUERIES  # noqa: E402
from marketviz_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("marketviz_stageprof")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm pass, then measured pass
    QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages_before = {
        s["stageId"]
        for s in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
    }
    t0 = time.time()
    QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    wall = time.time() - t0
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    new = [s for s in stages if s["stageId"] not in stages_before]
    new.sort(key=lambda s: s["stageId"])
    print(f"query={name} wall={wall:.2f}s n_stages={len(new)}")
    print(
        f"{'id':>4} {'name':42s} {'tasks':>5} {'wall_ms':>8} "
        f"{'taskTime_ms':>11} {'shufR_kB':>8} {'shufW_kB':>8}"
    )
    tot_wall = 0.0
    for s in new:
        sub = s.get("submissionTime")
        com = s.get("completionTime")
        wall_ms = -1
        if sub and com:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                wall_ms = (
                    datetime.strptime(com, fmt)
                    - datetime.strptime(sub, fmt)
                ).total_seconds() * 1000
                tot_wall += wall_ms
            except ValueError:
                pass
        nm = s["name"].split("\n")[0][:42]
        print(
            f"{s['stageId']:>4} {nm:42s} {s['numCompleteTasks']:>5} "
            f"{wall_ms:>8.0f} {s['executorRunTime']:>11} "
            f"{s['shuffleReadBytes'] // 1024:>8} "
            f"{s['shuffleWriteBytes'] // 1024:>8}"
        )
    print(f"sum(stage walls) = {tot_wall / 1000:.2f}s vs wall {wall:.2f}s")


if __name__ == "__main__":
    main()
