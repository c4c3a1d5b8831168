"""Quick A/B benchlet: time a query list (warm, best-of-two) in one
session. Conf variations come from $SPARK_GRAFT_CONF; compare runs.

Usage: python tools/ab_bench.py name1,name2,...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from marketviz_spark.registry import QUERIES  # noqa: E402
from marketviz_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("marketviz_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # full warmup pass (JIT + codegen), then two timed passes
    for name in names:
        QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    best: dict[str, float] = {}
    for _ in range(2):
        spark.sparkContext._jvm.System.gc()
        for name in names:
            t0 = time.time()
            QUERIES[name].fn(spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.time() - t0
            best[name] = min(best.get(name, dt), dt)
    for name, dt in best.items():
        print(f"{name:34s} {dt:7.3f}")
    print(f"{'TOTAL':34s} {sum(best.values()):7.3f}")


if __name__ == "__main__":
    main()
