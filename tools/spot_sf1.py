"""Registry 10x spot-runner: any query at sf0.1 vs the adversarial
.sf1data tables (10x documents/embeddings/events/TPC-H with
density, entity, burst, and hot-key skew — see tools/gen_sf1.py).
Prints per-query wall at both scales and the ratio; the point is
to catch density-squared paths that uniform small-scale data
cannot see. Defaults to the events family. Usage: python tools/spot_sf1.py [names,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketviz_spark.registry import QUERIES
from marketviz_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".sf1data",
)

EVENTS_QUERIES = sorted(
    n for n in QUERIES if n.startswith("events_")
)


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    names = (
        sys.argv[1].split(",") if len(sys.argv) > 1 else EVENTS_QUERIES
    )
    spark = get_spark("spot_sf1")
    # warm codegen on the small scale first
    for n in names:
        _materialize(QUERIES[n].fn(spark, "/root/testdata/sf0.01"))
    for n in names:
        t0 = time.time()
        _materialize(QUERIES[n].fn(spark, SF01))
        t_small = time.time() - t0
        t0 = time.time()
        try:
            _materialize(QUERIES[n].fn(spark, SF1))
        except Exception as e:  # noqa: BLE001 — refusal guards raise
            msg = str(e).splitlines()[0][:120]
            print(
                f"{n}: sf0.1 {t_small:.2f}s  sf1 REFUSED/ERROR "
                f"after {time.time() - t0:.1f}s: {msg}",
                flush=True,
            )
            continue
        t_big = time.time() - t0
        print(
            f"{n}: sf0.1 {t_small:.2f}s  sf1 {t_big:.2f}s  "
            f"ratio {t_big / max(t_small, 0.2):.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
