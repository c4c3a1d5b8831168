"""Standalone parity runner: `python tests/run_parity.py [sf_dir]`.
Prints per-query PASS/FAIL against the DuckDB oracle — the same
comparison the driver's t2 gate performs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketviz_spark.registry import QUERIES
from marketviz_spark.session import get_spark
from tests.oracle_check import compare, duck_con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("parity", shuffle_partitions=8)
    con = duck_con(sf_dir)
    failed = []
    checked = 0
    for name, qd in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            df = qd.fn(spark, sf_dir)
            if qd.oracle is None:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                continue
            problems = compare(df, con, qd.oracle, name)
        except Exception as e:  # noqa: BLE001
            problems = [f"{name}: EXCEPTION {e}"]
        dt = time.time() - t0
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({dt:.1f}s)")
            for p in problems[:6]:
                print(f"   {p}")
        else:
            print(f"PASS {name} ({dt:.1f}s)")
    print(f"\n{checked - len(failed)}/{checked} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
