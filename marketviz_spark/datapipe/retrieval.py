"""Diversified retrieval: MMR (Maximal Marginal Relevance) re-rank.

Carbonell & Goldstein, SIGIR'98: after an ANN shortlist, greedily
pick results that are relevant to the query but dissimilar to what
was already picked — the standard de-redundancy pass of a RAG /
retrieval pipeline (and of training-data selection, where it picks a
diverse subset of near-duplicate-rich candidates).

    pick_r = argmax_c  λ·sim(q, c) − (1−λ)·max_{s∈picked} sim(c, s)

Cross-engine exactness: similarities are INTEGER dot products of
globally quantized vectors (``floor(x·1000 + 0.5)`` per component —
one double multiply + floor, bit-identical on any IEEE engine), and
λ = 1/2 so the scaled objective is ``rel − max_pen``, all BIGINT.
No float ever enters the selection, so the DuckDB oracle (the same
greedy loop unrolled as K CTE steps) hashes bit-for-bit.

Scale shape (the 100-TB story):
- The expensive stage is the SHORTLIST, not the re-rank. Here it is
  the brute integer-dot top-C per query (queries are a small probe
  set, broadcast; candidates stream map-side through the broadcast
  nested-loop — zero candidate shuffle). At index scale you swap
  this stage for the IVF/PQ shortlist (`emb_ivfpq_topk`) unchanged.
- The MMR loop itself touches only C rows per query (C=16 here), so
  it runs as a grouped-map over qid: one hash shuffle of nq·C
  shortlist rows, then O(C²·K) integer work per query, perfectly
  parallel in the number of queries. Python is fine here because
  the per-group data is model-sized — this is the same boundary
  call as `w_ticker_trend_slope` (registry §2.10).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MMR_QUANT = 1000  # global component quantization (exactness contract)
MMR_QUERY_MOD = 100  # vec_id % MOD == 0 → query probe set
MMR_SHORTLIST = 16  # C: ANN shortlist depth per query
MMR_K = 5  # results returned per query
# λ = 1/2: the scaled objective 2·(λ·rel − (1−λ)·pen) = rel − pen
# stays in BIGINT. Other rationals p/q scale the same way.

_OUT_SCHEMA = (
    "vec_id long, mmr_rank int, neighbor_id long, "
    "relevance long, mmr_score long"
)


def _quantized(col: Column) -> Column:
    """array<float> → array<long>: floor(x·MMR_QUANT + 0.5)."""
    return F.transform(
        col,
        lambda x: F.floor(
            x.cast("double") * F.lit(float(MMR_QUANT)) + F.lit(0.5)
        ).cast("long"),
    )


def _idot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product (long fold, no float)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def mmr_shortlist(
    emb: DataFrame,
    shortlist: int = MMR_SHORTLIST,
    query_mod: int = MMR_QUERY_MOD,
) -> DataFrame:
    """Top-``shortlist`` candidates per query by integer relevance.

    Queries = vec_id % query_mod == 0 (the broadcast probe set);
    candidates = everything else, streamed map-side. Deterministic
    ties: higher rel first, then smaller cid.
    """
    q = emb.select(
        F.col("vec_id").alias("qid"),
        _quantized(F.col("embedding")).alias("qq"),
    ).filter(F.col("qid") % query_mod == 0)
    c = emb.select(
        F.col("vec_id").alias("cid"),
        _quantized(F.col("embedding")).alias("cq"),
    ).filter(F.col("cid") % query_mod != 0)
    # The relevance pass is (candidate partitions) wide: a corpus
    # that fits one file split would score all nq·N dots in a single
    # task (the cosine_topk lesson, similarity.py:90-101). Fan the
    # streamed candidate side out to cluster parallelism first; at
    # real scale the scan is already wide and this gate is a no-op.
    sc = emb.sparkSession.sparkContext
    target = sc.defaultParallelism
    if c.rdd.getNumPartitions() < target:
        c = c.repartition(target)
    pairs = c.crossJoin(F.broadcast(q)).select(
        "qid", "cid", "cq", _idot("qq", "cq").alias("rel")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("rel"), F.asc("cid")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .drop("rn")
    )


def _mmr_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy MMR over one query's shortlist — pure python-int
    arithmetic (exact; mirrors the unrolled SQL oracle step for
    step, including the (score desc, cid asc) tie order)."""
    cands = sorted(
        (
            (int(r.rel), int(r.cid), [int(v) for v in r.cq])
            for r in pdf.itertuples()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    qid = int(pdf["qid"].iloc[0])
    picked: list[tuple[int, int, list[int]]] = []
    rows = []
    for rank in range(1, MMR_K + 1):
        best = None
        for rel, cid, v in cands:
            if any(cid == p[1] for p in picked):
                continue
            if picked:
                pen = max(
                    sum(a * b for a, b in zip(v, p[2]))
                    for p in picked
                )
                score = rel - pen
            else:
                score = rel
            if best is None or (-score, cid) < (-best[0], best[2]):
                best = (score, rel, cid, v)
        if best is None:
            break
        score, rel, cid, v = best
        picked.append((rel, cid, v))
        rows.append((qid, rank, cid, rel, score))
    return pd.DataFrame(
        rows,
        columns=[
            "vec_id",
            "mmr_rank",
            "neighbor_id",
            "relevance",
            "mmr_score",
        ],
    )


def mmr_topk(
    emb: DataFrame,
    shortlist: int = MMR_SHORTLIST,
    query_mod: int = MMR_QUERY_MOD,
) -> DataFrame:
    """MMR-diversified top-K per query (λ=1/2, integer-exact).

    Plan: broadcast-NLJ shortlist (map-side over candidates) → one
    qid shuffle → grouped-map greedy selection. Returns
    (vec_id, mmr_rank, neighbor_id, relevance, mmr_score).
    """
    sl = mmr_shortlist(emb, shortlist=shortlist, query_mod=query_mod)
    return sl.groupBy("qid").applyInPandas(_mmr_group, _OUT_SCHEMA)


def mmr_oracle_sql(
    shortlist: int = MMR_SHORTLIST,
    query_mod: int = MMR_QUERY_MOD,
    k: int = MMR_K,
) -> str:
    """DuckDB twin: the greedy loop unrolled as k CTE steps from the
    same constants (lockstep-by-construction, like the simhash and
    BPE oracles)."""

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_dot_product(CAST({a} AS DOUBLE[]), "
            f"CAST({b} AS DOUBLE[])) AS BIGINT)"
        )

    # Every step CTE references its predecessors several times;
    # DuckDB's default CTE inlining would re-evaluate the nq·N
    # cross join once per reference (the compounding the BPE oracle
    # documents — and at sf1 it spills temp storage to death).
    # MATERIALIZED pins each to one evaluation.
    sql = f"""
WITH qv AS MATERIALIZED (
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * {float(MMR_QUANT)} + 0.5) AS BIGINT)) AS q
    FROM embeddings
), qs AS MATERIALIZED (
    SELECT vec_id AS qid, q AS qq FROM qv WHERE vec_id % {query_mod} = 0
), cs AS MATERIALIZED (
    SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id % {query_mod} <> 0
), sl AS MATERIALIZED (
    SELECT qid, cid, cq, rel FROM (
        SELECT qid, cid, cq, rel,
               row_number() OVER (
                   PARTITION BY qid ORDER BY rel DESC, cid) AS rn
        FROM (SELECT qs.qid, cs.cid, cs.cq,
                     {dot('qs.qq', 'cs.cq')} AS rel
              FROM qs CROSS JOIN cs)
    ) WHERE rn <= {shortlist}
), s1 AS MATERIALIZED (
    SELECT qid, cid, cq, rel, rel AS score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY rel DESC, cid) AS rn FROM sl
    ) WHERE rn = 1
)"""
    for r in range(2, k + 1):
        union = " UNION ALL ".join(
            f"SELECT qid, cid, cq FROM s{i}" for i in range(1, r)
        )
        sql += f""", p{r} AS MATERIALIZED (
    SELECT r.qid, r.cid, r.rel,
           r.rel - max({dot('r.cq', 's.cq')}) AS score
    FROM sl r JOIN ({union}) s ON r.qid = s.qid
    WHERE NOT EXISTS (
        SELECT 1 FROM ({union}) x
        WHERE x.qid = r.qid AND x.cid = r.cid)
    GROUP BY r.qid, r.cid, r.rel
), s{r} AS MATERIALIZED (
    SELECT p.qid, p.cid, sl.cq, p.rel, p.score
    FROM (SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY score DESC, cid) AS rn
              FROM p{r}) WHERE rn = 1) p
    JOIN sl ON sl.qid = p.qid AND sl.cid = p.cid
)"""
    finals = " UNION ALL ".join(
        f"SELECT qid AS vec_id, CAST({r} AS INT) AS mmr_rank, "
        f"cid AS neighbor_id, rel AS relevance, score AS mmr_score "
        f"FROM s{r}"
        for r in range(1, k + 1)
    )
    return sql + "\n" + finals
