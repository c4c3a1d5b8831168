"""Persisted IVF index: build once, search many — the ANN lifecycle
a production vector store runs, on plain parquet.

`ivf_topk` (datapipe/similarity.py) trains + searches in one query,
which is right for the oracle-checked semantics but wrong as a
deployment shape: at 100 TB the index is an ARTIFACT. Here:

- `build_ivf_index` trains the Lloyd centroids, assigns every
  vector, and writes two tables: `centroids/` (K rows — the model)
  and `postings/` partitioned BY CELL. Postings carry the vector
  and its norm inline, so search never joins back to the raw
  embedding table.
- `ivf_search_index` loads the K-row centroid model, assigns the
  query set (broadcast of K·d floats, map-only), and joins the
  probe cells against the postings scan. Because postings are
  partitioned by cell and the probe side is small, Spark's dynamic
  partition pruning turns the probe join into a scan of ONLY the
  probed cells' directories — the on-disk analogue of an inverted
  list lookup, and the reason the layout is partitioned.

Search over an index built from the same vectors is byte-identical
to the in-query `ivf_topk` (tested): persistence adds no semantic
drift because doubles round-trip parquet exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datapipe.similarity import (
    N_IVF_PROBE,
    _assign_to,
    _dot,
    ivf_train,
    with_norm,
)
from ..numerics import rnd


def build_ivf_index(emb: DataFrame, root: str) -> None:
    cents = ivf_train(emb)
    cents.write.mode("overwrite").parquet(
        os.path.join(root, "centroids")
    )
    n = with_norm(emb).select("vec_id", "_v", "_norm")
    assigned = _assign_to(n, cents)
    (
        assigned.select("vec_id", "_v", "_norm", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(root, "postings"))
    )


def ivf_search_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = N_IVF_PROBE,
) -> DataFrame:
    """Top-k neighbors for `queries` (vec_id, embedding) from a
    persisted index. Self-matches (same vec_id) are excluded, as in
    ivf_topk."""
    cents = spark.read.parquet(os.path.join(root, "centroids"))
    postings = spark.read.parquet(os.path.join(root, "postings"))
    qn = with_norm(queries).select("vec_id", "_v", "_norm")
    # allow_reeval: the probe join must seed dynamic partition
    # pruning of the cell-partitioned postings scan, and DPP refuses
    # nondeterministic expressions; the query set is tiny, so the
    # optimizer re-evaluating the assignment UDF around its inferred
    # filters costs nq rows (see _assign_to).
    qa = _assign_to(qn, cents, nprobe=nprobe, allow_reeval=True)
    probes = qa.select(
        "vec_id",
        "_v",
        "_norm",
        F.explode(
            F.col("probe_cells")
            if nprobe > 1
            else F.array(F.col("cell"))
        ).alias("pcell"),
    )
    a, b = probes.alias("a"), postings.alias("b")
    pairs = a.join(
        b,
        (F.col("a.pcell") == F.col("b.cell"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        rnd(
            _dot(F.col("a._v"), F.col("b._v"))
            / (F.col("a._norm") * F.col("b._norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )
