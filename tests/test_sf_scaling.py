"""Structural scale guard: the join-heavy datapipe queries must scale
sub-quadratically from sf0.01 to sf0.1 (10x the data).

A capped bucket/band join grows ~linearly in rows; an uncapped
all-pairs or hot-key join grows ~quadratically (~100x). The 25x
wall-time bound sits between the two with wide margins on both sides,
so the test catches a quadratic pairing regression (the failure mode
the driver's sf0.01 correctness gate can NOT see) without being a
microbenchmark. Times are floored at 0.5s before the ratio so fixed
per-query overhead (session, planning, parquet footers) can't inflate
the ratio of a fast query into a false alarm.
"""

from __future__ import annotations

import os
import time

import pytest

from marketviz_spark.registry import QUERIES

SF_MED = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

# The five pairing/verification queries whose cost is quadratic
# without their caps (SHINGLE_DF_CAP / MAX_BUCKET / LSH banding).
JOIN_HEAVY = [
    "dedup_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_minhash_estimate",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    # round-6 batch 4: chunk-fingerprint flag-back join (would go
    # quadratic if the chunk unit ever degenerated to per-token) and
    # the cluster-hash split riding on the capped-bucket components
    "boilerplate_chunks",
    "cluster_split",
    # round-6 batch 5: the chunk-md5 aggregate (hot boilerplate keys
    # must stay map-side-combined) and the broadcast-eval cosine
    # scan (would go quadratic if the eval side ever stopped being
    # the broadcast side)
    "chunk_index_dedup",
    "decontam_embedding",
]

MAX_RATIO = 25.0
FLOOR_S = 0.5


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


@pytest.mark.skipif(
    not (os.path.isdir(SF_MED) and os.path.isdir(SF_BIG)),
    reason="needs sf0.01 and sf0.1 testdata",
)
def test_join_heavy_queries_scale_subquadratically(spark):
    # Warm the JVM/codegen on the same plan shapes so the measured
    # passes compare data volume, not compilation.
    for name in JOIN_HEAVY:
        _materialize(QUERIES[name].fn(spark, SF_MED))

    ratios = {}
    for name in JOIN_HEAVY:
        t0 = time.time()
        _materialize(QUERIES[name].fn(spark, SF_MED))
        t_med = max(time.time() - t0, FLOOR_S)
        t0 = time.time()
        _materialize(QUERIES[name].fn(spark, SF_BIG))
        t_big = max(time.time() - t0, FLOOR_S)
        ratios[name] = t_big / t_med

    offenders = {n: round(r, 1) for n, r in ratios.items() if r > MAX_RATIO}
    assert not offenders, (
        f"10x data grew wall-time >{MAX_RATIO}x (quadratic pairing?): "
        f"{offenders}; all ratios: "
        f"{ {n: round(r, 1) for n, r in ratios.items()} }"
    )
