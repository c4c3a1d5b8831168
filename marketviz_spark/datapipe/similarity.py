"""Similarity search over an embedding column (array<float>).

Two paths, mirroring what a 100 TB pipeline needs:

- `cosine_topk`: brute-force all-pairs cosine top-k — the exact
  baseline. O(n²·d) — correct at verification scale, and the
  reference semantics every approximate method is judged against.
  Expressed entirely in higher-order JVM functions (zip_with +
  aggregate fold): no Python in the loop.
- `hyperplane_lsh_topk`: random-hyperplane LSH — each vector gets a
  b-bit sign bucket; candidate pairs share a bucket, so the
  all-pairs join becomes an equi-join on bucket. Hyperplanes are
  md5-derived ±1 weights, so the bucketing is reproducible on any
  engine (and in the SQL oracle) without shipping a weights matrix.

Scale notes: at 1e9+ vectors, brute force is out; LSH bucket join
shuffles each vector once per table of hyperplanes. The natural next
steps (IVF with learned centroids, Pandas-UDF BLAS scoring of the
candidate set) keep the same dataflow — bucket, equi-join, verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..numerics import rnd

HEX = "0123456789abcdef"
N_HYPERPLANES = 8
EMB_DIM = 64


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic double sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.withColumn("_v", v).withColumn(
        "_norm", F.sqrt(_dot(F.col("_v"), F.col("_v")))
    )


# Refuse-and-report cap for the brute-force path (same contract as
# dedup.MAX_BUCKET / dedup.SHINGLE_DF_CAP): above this many vectors an
# uncapped all-pairs self-join is ~N_BRUTE_CAP²/2 scored pairs and is
# the wrong tool on any engine — the caller is told which scale paths
# to use instead of silently launching a quadratic job.
N_BRUTE_CAP = 100_000


def cosine_topk(
    emb: DataFrame, k: int = 5, n_rows: int | None = None
) -> DataFrame:
    """Exact top-k neighbors per vector by cosine similarity.

    Similarity is rounded to 6dp BEFORE ranking (with a vec-id
    tiebreak) so the ranking is reproducible across engines and
    partitionings despite float sum-order effects.

    This is the O(n²·d) exact BASELINE; it refuses inputs larger
    than ``N_BRUTE_CAP`` vectors (pass ``n_rows`` from table stats
    to skip the guard's count scan). The scale paths with the same
    output contract are ``blas_cosine_topk`` (exact, tiled BLAS),
    ``hyperplane_lsh_topk`` and ``ivf_topk`` (approximate,
    candidate-bounded).
    """
    if n_rows is None:
        # Column-pruned count scan; on a real deployment this comes
        # from catalog statistics, not a job.
        n_rows = emb.select("vec_id").count()
    if n_rows > N_BRUTE_CAP:
        raise ValueError(
            f"cosine_topk: input has {n_rows} vectors, above "
            f"N_BRUTE_CAP={N_BRUTE_CAP}; an all-pairs self-join at "
            "this size is quadratic. Use blas_cosine_topk (exact, "
            "block-tiled BLAS) or hyperplane_lsh_topk / ivf_topk "
            "(approximate, candidate-bounded) instead."
        )
    # r13 rework (guide §4.2 — heavy lifting in native code): the
    # former broadcast-NLJ evaluated an INTERPRETED zip_with+aggregate
    # fold per pair (higher-order functions never enter codegen), n²·d
    # element closures. The tiled-dgemm path computes the identical
    # floor-6dp cosine (round_dp=6 routes every near-boundary entry
    # through _fix_round6's order-fixed einsum rescore — the numerics
    # every green oracle row of the 6dp family already validates) and
    # the identical round-then-rank/neighbor-tiebreak ranking, at BLAS
    # throughput. The refuse-above-cap contract above is unchanged.
    return blas_cosine_topk(emb, k=k, round_dp=6, n_rows=n_rows)


def _plane_sign(h: int, d: int) -> int:
    """±1 weight of hyperplane h at dimension d, derived from md5
    parity — reproducible anywhere md5 exists."""
    import hashlib

    c = hashlib.md5(f"{h}-{d}".encode()).hexdigest()[0]
    return 1 if (HEX.index(c) % 2 == 0) else -1


def plane_weights() -> list[list[int]]:
    return [
        [_plane_sign(h, d) for d in range(EMB_DIM)]
        for h in range(N_HYPERPLANES)
    ]


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """b-bit sign bucket per vector: bit h = (Σ_d w[h][d]·v[d]) > 0."""
    n = with_norm(emb)
    bucket = F.lit(0)
    for h, weights in enumerate(plane_weights()):
        warr = F.array(*[F.lit(float(x)) for x in weights])
        proj = _dot(F.col("_v"), warr)
        bucket = bucket + F.when(proj > 0.0, F.lit(2**h)).otherwise(
            F.lit(0)
        )
    return n.withColumn("bucket", bucket.cast("long"))


# Per-bucket candidate cap for the LSH top-k's build side. The
# same-bucket equi-join is Σ_bucket |bucket|² work: with 2^8 buckets
# and CLUSTERED embeddings a bucket can hold a large fraction of the
# corpus, and the join quietly goes quadratic — measured 35x
# wall-clock for a 10x denser corpus in the round-7 sf1 spot-run.
# Each query keeps its full row; only the CANDIDATE side of an
# over-full bucket is truncated to the first `cap` members by
# vec_id (deterministic on any engine). Recall degradation is
# auditable via the ann_recall query. sf0.1 buckets max out at 23,
# far under the cap, so driver results are unchanged.
LSH_BUCKET_CANDIDATE_CAP = 128


def hyperplane_lsh_topk(
    emb: DataFrame,
    k: int = 3,
    bucket_cap: int = LSH_BUCKET_CANDIDATE_CAP,
) -> DataFrame:
    """Approximate top-k: candidates restricted to same-bucket pairs
    (the scale path: equi-join on bucket instead of cross join),
    with the candidate side of each bucket capped at ``bucket_cap``
    members (see LSH_BUCKET_CANDIDATE_CAP)."""
    n = lsh_buckets(emb).select("vec_id", "_v", "_norm", "bucket")
    wb = Window.partitionBy("bucket").orderBy("vec_id")
    cand = (
        n.withColumn("_brn", F.row_number().over(wb))
        .filter(F.col("_brn") <= bucket_cap)
        .drop("_brn")
    )
    a, b = n.alias("a"), cand.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        _arrow_cosine()(
            F.col("a._v"),
            F.col("b._v"),
            F.col("a._norm") * F.col("b._norm"),
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


BLAS_BLOCK_ROWS = 4096


def blas_cosine_topk(
    emb: DataFrame,
    k: int = 5,
    round_dp: int = 4,
    block_rows: int = BLAS_BLOCK_ROWS,
    n_rows: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k, the throughput path: block-partitioned
    BLAS. Rows are hashed into `nb` blocks; every UPPER-TRIANGULAR
    (ab <= bb) block pair becomes one applyInPandas group that runs a
    dense matmul once and emits per-row top-k candidates for BOTH pair
    orientations; a final window merges the tile candidates into the
    global top-k. NOTHING is collected to the driver — the whole
    dataflow is shuffle + executor-side BLAS.

    Grid sizing is parallelism-aware, not data-constant:
    ``nb = max(ceil(n/block_rows), ceil(sqrt(2·defaultParallelism)))``
    so small inputs still fan out to ~one tile per core (nb(nb+1)/2
    tiles) instead of degenerating to a single task, while large
    inputs keep tiles bounded at `block_rows` vectors per side.
    When `n_rows` isn't supplied the input is persisted and counted —
    the count doubles as the cache warm for the two shuffle branches;
    at real scale pass the catalog's row count instead.

    Scale: each row ships `nb` copies (a-side to tiles (r, r..nb-1),
    b-side to tiles (0..r-1, r)), i.e. O(n²·d / block_rows) bytes
    total — half the naive full-grid volume, and the inherent cost of
    exact all-pairs. block_rows trades executor memory (a tile holds
    ≤2·block_rows vectors) against shuffle volume; 4096×64d ≈ 2
    MB/side/tile. Past ~1e7 vectors exact all-pairs is the wrong tool
    regardless of engine — switch to hyperplane_lsh_topk / ivf_topk
    (same bucket→equi-join→verify dataflow, candidates only).

    Cosines are rounded (floor-based, numerics.rnd semantics) BEFORE
    ranking, with a neighbor-id tiebreak, so per-tile top-k + global
    merge is exactly the full-sort ranking and reproducible against
    the SQL oracle despite BLAS sum ordering. The result is invariant
    to `nb`: every unordered pair meets in exactly one tile.
    """
    import math

    import numpy as np
    import pandas as pd

    base = emb.select("vec_id", "embedding")
    if n_rows is None:
        # plain count, no persist: caching here would pin the table
        # in executor storage with no safe unpersist point (the
        # result is consumed lazily, after this function returns),
        # leaking memory across repeated calls. The extra pass is a
        # column-pruned scan; on a real deployment the row count
        # comes from table stats, not a scan at all.
        n_rows = base.count()
    par = emb.sparkSession.sparkContext.defaultParallelism
    nb = max(
        math.ceil(n_rows / block_rows),
        math.ceil(math.sqrt(2.0 * par)),
        1,
    )
    blk = F.pmod(F.col("vec_id"), F.lit(nb)).cast("int")
    # Symmetric scheme: a row in block r is the A side of tiles
    # (r, r..nb-1) and the B side of tiles (0..r-1, r); tile (x, y)
    # with x < y holds A-block x + B-block y, and the diagonal tile
    # (r, r) holds block r once (a-side only, B := A inside).
    a = (
        base.withColumn("ab", blk)
        .withColumn("bb", F.explode(F.sequence(blk, F.lit(nb - 1))))
        .withColumn("side", F.lit("a"))
    )
    # sequence() steps backwards when start > stop, so guard blk=0
    # with a NULL array — explode() of NULL emits no rows.
    b = (
        base.withColumn("bb", blk)
        .withColumn(
            "ab",
            F.explode(
                F.when(blk > 0, F.sequence(F.lit(0), blk - 1))
            ),
        )
        .withColumn("side", F.lit("b"))
    )
    both = a.unionByName(b)
    p = float(10**round_dp)

    def topk_rows(ids_q, ids_c, R):
        # Per-query-row top-k over candidate columns of R.
        out_vec, out_nb, out_cos = [], [], []
        for i in range(R.shape[0]):
            mask = ids_c != ids_q[i]
            cand_ids = ids_c[mask]
            cand_cos = R[i][mask]
            order = np.lexsort((cand_ids, -cand_cos))[:k]
            out_vec.extend([ids_q[i]] * len(order))
            out_nb.extend(cand_ids[order])
            out_cos.extend(cand_cos[order])
        return out_vec, out_nb, out_cos

    def tile(key, pdf):
        ab, bb = key
        A = pdf[pdf["side"] == "a"]
        B = A if ab == bb else pdf[pdf["side"] == "b"]
        if A.empty or B.empty:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        a_ids = A["vec_id"].to_numpy(dtype=np.int64)
        b_ids = B["vec_id"].to_numpy(dtype=np.int64)
        Am = np.array(A["embedding"].tolist(), dtype=np.float64)
        Bm = np.array(B["embedding"].tolist(), dtype=np.float64)
        an = np.sqrt(np.einsum("ij,ij->i", Am, Am))
        bn = np.sqrt(np.einsum("ij,ij->i", Bm, Bm))
        S = (Am @ Bm.T) / (an[:, None] * bn[None, :])
        if p == 1e6:
            # near-boundary entries rescored order-fixed
            R = _fix_round6(S, Am, Bm, an, bn)
        else:
            R = np.floor(S * p + 0.5) / p
        out_vec, out_nb, out_cos = topk_rows(a_ids, b_ids, R)
        if ab != bb:
            # Off-diagonal: one matmul serves both orientations.
            v2, n2, c2 = topk_rows(b_ids, a_ids, R.T)
            out_vec.extend(v2)
            out_nb.extend(n2)
            out_cos.extend(c2)
        return pd.DataFrame(
            {
                "vec_id": np.array(out_vec, dtype=np.int64),
                "neighbor_id": np.array(out_nb, dtype=np.int64),
                "cosine": np.array(out_cos, dtype=np.float64),
            }
        )

    cands = both.groupBy("ab", "bb").applyInPandas(
        tile, "vec_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )


EMB_TABLES = 4
EMB_TABLE_BITS = 6
NEAR_DUP_COSINE = 0.35


def _fix_round6(S, A, B, an, bn):
    """Floor-round a dgemm cosine block at 6dp with BLAS-order
    robustness (r8 ADVICE): ``S = (A @ B.T) / (an x bn)`` is computed
    by whatever BLAS numpy links (OpenBLAS/MKL/ARM), whose summation
    order and FMA use vary by build — a last-ulp difference can flip
    the floor-6dp boundary that the oracle's sequential
    ``list_dot_product`` fold lands exactly on. This helper keeps the
    dgemm for the bulk (candidate pruning is value-tolerant) and
    recomputes ONLY the entries within 1e-4 grid units (~1e-10 in
    cosine, 5 orders above any dgemm-vs-sequential drift) of a
    rounding boundary with numpy's order-fixed einsum — the same
    reduction `_arrow_cosine` uses, which every green oracle row has
    validated against DuckDB's fold. Cost: O(near_boundary) extra
    dot products — empirically ~1e-4 of entries.

    Returns the floor-6dp-rounded matrix; `an`/`bn` must be the SAME
    norms the caller's oracle uses (JVM `_dot` fold or einsum —
    never a BLAS-reduced sum). CONSUMES `S` (in-place scratch): on
    this class of matrices the elementwise passes rival the matmul
    itself, so the implementation reuses S's buffer and allocates
    only the floor copy.
    """
    import numpy as np

    S *= 1e6
    S += 0.5
    fl = np.floor(S)
    # near an integer boundary iff the fractional part is within
    # 1e-4 of 0 or 1
    S -= fl  # S is now the fractional part
    i, j = np.nonzero((S < 1e-4) | (S > 1.0 - 1e-4))
    R = fl
    R /= 1e6
    if i.size:
        d = np.einsum("ij,ij->i", A[i], B[j])
        s = d / (an[i] * bn[j])
        R[i, j] = np.floor(s * 1e6 + 0.5) / 1e6
    return R


def _arrow_cosine():
    """Arrow-vectorized floor-6dp cosine over (vec_a, vec_b,
    norm_a*norm_b) columns — the pair-scoring hot loop shared by the
    candidate-verification paths (near_pairs, LSH top-k, IVF probe).
    numpy einsum replaces the interpreted per-element `F.aggregate`
    fold, ~20x on dense candidate sets (r7 sf1 sweep). The dense
    block-scoring sites (blas_cosine_topk, ivf_topk, semdedup,
    embedding_decontaminate) keep dgemm for the bulk and route
    near-boundary entries through `_fix_round6`, which rescores them
    with this same order-fixed einsum reduction; TRAINING
    assignment (`_assign_to`, r13) uses this reduction too — same
    dots, divide and 6dp round as the former JVM left-fold chain,
    so the unrolled-iteration oracles still match. Functional
    pandas_udf form: the module uses postponed annotations, which
    the decorator's hint inference can't resolve for closures."""
    import numpy as np
    import pandas as pd

    def _fn(va, vb, nn):
        A = np.array(va.tolist(), dtype=np.float64)
        B = np.array(vb.tolist(), dtype=np.float64)
        s = np.einsum("ij,ij->i", A, B) / nn.to_numpy(dtype=np.float64)
        return pd.Series(np.floor(s * 1e6 + 0.5) / 1e6)

    return F.pandas_udf(_fn, "double")


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = NEAR_DUP_COSINE,
    n_tables: int = EMB_TABLES,
    bits: int = EMB_TABLE_BITS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-family
    member over the embedding column: candidates come from
    `n_tables` independent hyperplane-LSH tables (each a `bits`-bit
    sign bucket; multi-table OR-ing is the standard recall
    amplifier: P(candidate) = 1-(1-p^bits)^n_tables with
    p = 1 - theta/pi), then exact rounded cosine verifies
    candidates against `threshold`.

    Scale: ONE shuffle to the (table, key) buckets, pairs stream
    in-bucket via dedup._bucket_pairs (bounded memory, degenerate
    buckets refused) carrying IDS ONLY, then the DISTINCT candidate
    set joins the vector table back (uniform vec_id keys) and is
    verified in one Arrow-vectorized pandas_udf batch dot. The
    round-6 form carried (vector, norm) structs through the band
    explode and ran an interpreted `F.aggregate` dot per
    band-duplicated candidate — n_tables x redundant work on ~4x
    heavier shuffle rows; at the sf1 regime's 15.7M verified edges
    that was the whole cost of dedup_modality_agreement (146 s, 31x
    for 10x data). Deduplicating before verification makes the dot
    count equal the unique-candidate count and moves the arithmetic
    into numpy (einsum over Arrow batches). The operator's CONTRACT
    is bucketed recall (both engines evaluate identical tables), so
    the SQL oracle reproduces the bucketing bit-for-bit via the
    same md5-derived planes; cosine keeps the blas_cosine_topk
    numerics (float64 dot, floor-round 6dp).
    """
    import numpy as np
    import pandas as pd

    from .dedup import _bucket_pairs

    n = with_norm(emb)
    keys = []
    for t in range(n_tables):
        key = F.lit(0)
        for j in range(bits):
            h = t * bits + j
            warr = F.array(
                *[
                    F.lit(float(_plane_sign(h, d)))
                    for d in range(EMB_DIM)
                ]
            )
            key = key + F.when(
                _dot(F.col("_v"), warr) > 0.0, F.lit(2**j)
            ).otherwise(F.lit(0))
        keys.append(key.cast("long"))
    stacked = n.select(
        F.col("vec_id").alias("item"),
        F.posexplode(F.array(*keys)).alias("band", "key"),
    ).select("band", "key", "item")
    cand = (
        _bucket_pairs(stacked)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )

    _cos = _arrow_cosine()

    va = n.select(
        F.col("vec_id").alias("doc_a"),
        F.col("_v").alias("_va"),
        F.col("_norm").alias("_na"),
    )
    vb = n.select(
        F.col("vec_id").alias("doc_b"),
        F.col("_v").alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    pairs = (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _cos(
                F.col("_va"),
                F.col("_vb"),
                F.col("_na") * F.col("_nb"),
            ).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


N_IVF_CELLS = 16
N_IVF_ITERS = 2


def _assign_to(
    n: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    allow_reeval: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment by rounded cosine (cell tiebreak).

    r13 rework (guide §4.2): the K-way argmax runs MAP-ONLY in one
    Arrow-vectorized numpy batch per task — each vector scores all
    K centroids (the model is a driver-side closure literal; K·d
    floats, the same rows the former broadcast carried) and emits
    its home cell plus, for ``nprobe > 1``, the probe list. The
    former shape crossJoined the broadcast centroid table and ran
    an INTERPRETED `_dot` fold per (vector, cell) — n·K closure
    chains that never enter codegen — then collapsed K rows back
    to one with a groupBy min(struct); this removes both the n·K
    row blow-up and that aggregation exchange.

    Numerics are bit-identical on any input the fold path accepts:
    the dot is the `_arrow_cosine` einsum reduction (validated
    green against the oracle's sequential fold across rounds), the
    divide/round(6dp) are the same IEEE double ops, and ANSI mode
    means a zero norm RAISES in both forms (replicated explicitly
    here) rather than producing NaN. Ties on the rounded cosine
    break to the smallest cell — centroid rows are scored in
    ascending-cell order, so a stable argmin/argsort reproduces
    the struct-comparison (cosine desc, cell asc) ordering.
    """
    import numpy as np
    import pandas as pd

    cent_rows = sorted(
        centroids.collect(), key=lambda r: r["cell"]
    )  # LocalRelation in every caller: a driver-side model, not data
    out_type = "struct<cell:bigint,probes:array<bigint>>"
    if not cent_rows:
        # empty model: the crossJoin form emitted zero rows
        cols = [
            F.col("vec_id"),
            F.col("_v"),
            F.col("_norm"),
            F.lit(0).cast("long").alias("cell"),
        ]
        if nprobe > 1:
            cols.append(
                F.array().cast("array<bigint>").alias("probe_cells")
            )
        return n.select(*cols).where(F.lit(False))
    cells = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array(
        [list(r["c_v"]) for r in cent_rows], dtype=np.float64
    )
    cnorm = np.array(
        [r["c_norm"] for r in cent_rows], dtype=np.float64
    )

    def _best(v, norm):
        if len(v) == 0:
            return pd.DataFrame({"cell": [], "probes": []})
        E = np.array(v.tolist(), dtype=np.float64)
        nn = norm.to_numpy(dtype=np.float64)
        neg = np.empty((E.shape[0], len(cells)), dtype=np.float64)
        for k in range(len(cells)):
            den = nn * cnorm[k]
            if np.any(den == 0.0):
                raise ArithmeticError(
                    "[DIVIDE_BY_ZERO] zero vector norm in "
                    "centroid assignment"
                )
            d = np.einsum(
                "ij,ij->i", E, np.broadcast_to(cmat[k], E.shape)
            )
            neg[:, k] = -(np.floor(d / den * 1e6 + 0.5) / 1e6)
        home = cells[np.argmin(neg, axis=1)]
        if nprobe > 1:
            order = np.argsort(neg, axis=1, kind="stable")[
                :, :nprobe
            ]
            probes = list(cells[order])
        else:
            probes = [None] * E.shape[0]
        return pd.DataFrame({"cell": home, "probes": probes})

    # asNondeterministic (guide §4.4): consumers join/explode on the
    # assignment's fields, and the optimizer was pushing the inferred
    # predicates (isnotnull(cell), size(probes)>0) below the scan
    # fan-out exchange by DUPLICATING the whole UDF call — two full
    # Arrow assignment passes over the corpus per branch (measured in
    # plans/r13/*_prebatch8.txt, nodes 3+8). The assignment is a pure
    # function of (_v, _norm); the flag only forbids the optimizer
    # from re-evaluating or reordering it, never changes a value. The
    # inferred filters it blocks were no-ops anyway (cell is never
    # null; every vector probes >= 1 cell).
    #
    # allow_reeval=True keeps the UDF deterministic for the ONE
    # consumer where the optimizer's freedom to re-derive predicates
    # through it is load-bearing: ivf_search_index's probe side must
    # seed DYNAMIC PARTITION PRUNING of the cell-partitioned postings
    # scan (the on-disk inverted-list lookup), and DPP will not build
    # a pruning subquery over a nondeterministic expression. There
    # the input is the nq-row query set, so a duplicated evaluation
    # costs nq rows, not a corpus pass.
    udf = F.pandas_udf(_best, out_type)
    if not allow_reeval:
        udf = udf.asNondeterministic()
    best = udf(F.col("_v"), F.col("_norm"))
    staged = n.select("vec_id", "_v", "_norm", best.alias("_b"))
    cols = [
        F.col("vec_id"),
        F.col("_v"),
        F.col("_norm"),
        F.col("_b.cell").alias("cell"),
    ]
    if nprobe > 1:
        cols.append(F.col("_b.probes").alias("probe_cells"))
    return staged.select(*cols)


def centroid_df_for(emb: DataFrame, rows: list) -> DataFrame:
    """(cell, vector) model rows -> broadcastable centroid
    DataFrame, norms folded in the same left-to-right order as
    _dot's fold."""
    import math

    data = []
    for cell, vec in rows:
        s = 0.0
        for x in vec:
            s = s + x * x
        data.append((cell, vec, math.sqrt(s)))
    return emb.sparkSession.createDataFrame(
        data, "cell long, c_v array<double>, c_norm double"
    )


def ivf_train(
    emb: DataFrame,
    n_cells: int = N_IVF_CELLS,
    n_iters: int = N_IVF_ITERS,
    _prefix: list | None = None,
) -> DataFrame:
    """Trained IVF centroids: deterministic Lloyd k-means.

    Seeds with the first `n_cells` vectors by vec_id, then runs a
    FIXED number of assign/mean iterations. Every step is
    cross-engine exact so the SQL oracle can unroll the identical
    training: assignment ranks rounded (6dp) cosines with a cell
    tiebreak, and each centroid mean is a decimal(30,12)-exact
    elementwise sum divided by the member count, rounded to 6dp.
    Cells that lose all members drop out (both engines agree).

    Scale: per iteration, one broadcast of K·d centroid floats for
    the assignment (map-side only) and ONE shuffle — the groupBy
    (cell) with d partial-aggregated column sums; no posexplode, so
    the shuffle carries K·d accumulators per map task, not n·d rows.
    Driver never sees vector data.
    """
    import math

    def centroid_df(rows):
        return centroid_df_for(emb, rows)

    n = with_norm(emb).select("vec_id", "_v", "_norm")
    # The MODEL (K·d floats) is driver-resident between iterations —
    # that's K rows of aggregate output, not a data collect (same
    # shape pyspark.ml.KMeans keeps internally). Materializing it
    # cuts the lineage so downstream self-joins don't re-run
    # training, and each assignment broadcasts a literal table.
    # r14 (guide §2.6): the seed is the same first-n_cells-by-vec_id
    # prefix the PQ seed and the audit query set consume, so callers
    # that hold a pq._prefix_rows collect pass it in and the seed
    # job disappears; the float→double widening below is the same
    # arithmetic the former `_v` projection ran plan-side.
    if _prefix is not None:
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in _prefix[:n_cells]
        ]
    else:
        seed = (
            n.orderBy("vec_id").limit(n_cells).select("vec_id", "_v")
        )
        cents = [(r["vec_id"], list(r["_v"])) for r in seed.collect()]
    for _ in range(n_iters):
        assigned = _assign_to(n, centroid_df(cents))
        # Elementwise mean via posexplode + narrow (cell, pos) agg:
        # partial aggregation collapses the exploded rows to K·d
        # accumulators per map task BEFORE the shuffle (same traffic
        # as d sum columns), and the 3-expression plan avoids the
        # multi-second codegen of a d-wide decimal aggregate.
        sums = (
            assigned.select(
                "cell", F.posexplode("_v").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(
                F.count("*").alias("n_members"),
                F.sum(F.col("val").cast("decimal(30,12)"))
                .cast("double")
                .alias("s"),
            )
        )
        by_cell: dict = {}
        for row in sums.collect():  # K·d aggregate rows (the model)
            by_cell.setdefault(row["cell"], {})[row["pos"]] = (
                math.floor(row["s"] / row["n_members"] * 1e6 + 0.5) / 1e6
            )
        cents = [
            (cell, [dims[d] for d in range(EMB_DIM)])
            for cell, dims in sorted(by_cell.items())
        ]
    return centroid_df(cents)


def ivf_assign(emb: DataFrame) -> DataFrame:
    """IVF coarse quantization against the trained centroids: each
    vector goes to the centroid with the highest rounded cosine
    (cell tiebreak)."""
    n = with_norm(emb).select("vec_id", "_v", "_norm")
    return _assign_to(n, ivf_train(emb))


N_IVF_PROBE = 2


def ivf_topk(
    emb: DataFrame,
    k: int = 3,
    nprobe: int = N_IVF_PROBE,
) -> DataFrame:
    """IVF search: each query probes its `nprobe` nearest cells
    (candidates are indexed by home cell only, standard IVF). The
    probe list rides out of the same assignment aggregate, so vs
    nprobe=1 the only extra cost is the candidate equi-join fanning
    out `nprobe` probe rows per query — recall across cell
    boundaries without rescoring the whole index."""
    import numpy as np
    import pandas as pd

    n = with_norm(emb).select("vec_id", "_v", "_norm")
    assigned = _assign_to(n, ivf_train(emb), nprobe=nprobe)
    # Cell-block scoring, the blas_cosine_topk tile pattern applied
    # to IVF cells: each cell's members + the queries probing it
    # meet in ONE applyInPandas group that runs a dense matmul and
    # emits per-query in-cell top-k. Vectors ship once per cell
    # MEMBERSHIP (n + n·nprobe rows), not once per scored pair —
    # the pair-join + per-pair UDF form moved |pairs| x 2 vectors
    # through Arrow (tens of GB at the sf1 regime, 301 s); the
    # block form moves megabytes and lets BLAS do the n·|cell|
    # flops. Group memory is one cell (n/K vectors) — K is the IVF
    # design dial that keeps cells executor-sized at any corpus
    # (at 100 TB also salt the query side per cell, same candidate
    # replication trick as the LSH bucket cap). A pair meets in
    # exactly one group: candidates are indexed by home cell only.
    # One assignment pass (r13 batch 8, guide §2.4/§4.4): the former
    # cand/qry UNION referenced `assigned` twice, so the physical plan
    # re-ran the scan + norm fold + Arrow assignment once per branch
    # (and predicate pushdown through the fan-out exchange duplicated
    # the UDF again inside the qry branch — 3 full corpus passes,
    # plans/r13/emb_ivf_topk_prebatch8.txt). Emitting each vector's
    # home entry ('c') and its probe entries ('q') from ONE explode
    # over a struct array keeps a single assignment subtree. The row
    # multiset is identical to the union; `score` separates sides per
    # cell group exactly as before. explode_outer (not explode): the
    # array always holds >= 1 + nprobe entries, so the outer form
    # emits the same rows while keeping the optimizer from inferring
    # a size()>0 filter it would push below the exchange by cloning
    # the UDF.
    probe_src = (
        F.col("probe_cells") if nprobe > 1 else F.array(F.col("cell"))
    )
    entries = F.concat(
        F.array(
            F.struct(
                F.col("cell").alias("cell"), F.lit("c").alias("side")
            )
        ),
        F.transform(
            probe_src,
            lambda pc: F.struct(
                pc.alias("cell"), F.lit("q").alias("side")
            ),
        ),
    )
    both = (
        assigned.select(
            "vec_id", "_v", "_norm", F.explode_outer(entries).alias("e")
        )
        .select(
            "vec_id",
            "_v",
            "_norm",
            F.col("e.cell").alias("cell"),
            F.col("e.side").alias("side"),
        )
    )

    def score(key, pdf):
        Q = pdf[pdf["side"] == "q"]
        C = pdf[pdf["side"] == "c"]
        if Q.empty or C.empty:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        q_ids = Q["vec_id"].to_numpy(dtype=np.int64)
        c_ids = C["vec_id"].to_numpy(dtype=np.int64)
        Qm = np.array(Q["_v"].tolist(), dtype=np.float64)
        Cm = np.array(C["_v"].tolist(), dtype=np.float64)
        qn = Q["_norm"].to_numpy(dtype=np.float64)
        cn = C["_norm"].to_numpy(dtype=np.float64)
        S = (Qm @ Cm.T) / (qn[:, None] * cn[None, :])
        # near-boundary entries rescored order-fixed (see _fix_round6)
        R = _fix_round6(S, Qm, Cm, qn, cn)
        out_v, out_n, out_c = [], [], []
        for i in range(R.shape[0]):
            mask = c_ids != q_ids[i]
            ids, cos = c_ids[mask], R[i][mask]
            order = np.lexsort((ids, -cos))[:k]
            out_v.extend([q_ids[i]] * len(order))
            out_n.extend(ids[order])
            out_c.extend(cos[order])
        return pd.DataFrame(
            {"vec_id": out_v, "neighbor_id": out_n, "cosine": out_c}
        )

    pairs = both.groupBy("cell").applyInPandas(
        score, "vec_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )


# Symmetric int8 quantization: max-abs scaling to [-127, 127].
QUANT_LEVELS = 127


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding
    column, plus the reconstruction RMSE an index-build job would
    log. Map-only JVM higher-order functions — no Python, no
    shuffle; at 100 TB this is the cheap pre-pass that shrinks an
    ANN index 4x.

    Rounding is the floor-based half-up from numerics.rnd (toward
    +inf for .5 ties) so any SQL engine reproduces the exact codes.

    The pipeline is deliberately STAGED through three projections
    (v -> scale -> q -> outputs) instead of one nested expression:
    higher-order-function lambdas are evaluated per array element,
    and an inlined `scale` (which contains an array_max over the
    vector) inside the quantize/error lambdas degrades the whole op
    to O(dim^2)-O(dim^3) per row. Staging keeps each intermediate
    computed once per row (Catalyst's CollapseProject leaves
    multiply-referenced non-cheap expressions un-inlined) — measured
    7x faster at sf0.1.
    """
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(F.col("v"), F.abs))
    staged = emb.select("vec_id", v.alias("v")).select(
        "vec_id",
        "v",
        (F.greatest(amax, F.lit(1e-12)) / QUANT_LEVELS).alias("scale"),
    )
    q = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.lit(-QUANT_LEVELS),
            F.least(
                F.lit(QUANT_LEVELS),
                F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    staged = staged.select("vec_id", "v", "scale", q.alias("q"))
    # (x - q*scale)*(x - q*scale), not pow(x, 2): IEEE multiply is
    # bit-identical across engines, pow need not be
    err = F.zip_with(
        F.col("v"),
        F.col("q"),
        lambda x, qi: (x - qi * F.col("scale"))
        * (x - qi * F.col("scale")),
    )
    err2 = F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x)
    return staged.select(
        "vec_id",
        rnd(F.sqrt(err2 / F.size("v")), 6).alias("rmse"),
        rnd(F.col("scale"), 6).alias("q_scale"),
        F.concat_ws(
            ",", F.transform(F.col("q"), lambda c: c.cast("string"))
        ).alias("q_codes"),
    )


SEMDEDUP_TAU = NEAR_DUP_COSINE


def semdedup(
    emb: DataFrame,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): cluster embeddings with the trained IVF centroids,
    then inside each cluster prune every vector that has a
    sufficiently-similar neighbor with a smaller vec_id. One row per
    vector: (vec_id, cell, kept, pruned_by) where pruned_by is the
    SMALLEST dominating neighbor (NULL for kept rows) — so the kept
    set is exactly the id-dominance representatives, deterministic
    on any engine (cosines are rounded to 6dp before the threshold
    test, and the dominance rule needs no iteration, unlike
    connected components).

    Scale shape: the quadratic pair space is confined to each IVF
    cell (the whole point of SemDeDup — k cells cut the O(N^2)
    all-pairs to O(N^2/k) and the cells are embarrassingly
    parallel); each cell is ONE applyInPandas group running a
    chunked BLAS matmul (rows scored CHUNK x |cell| at a time, so
    group memory stays CHUNK-bounded even for a hot cell) with the
    id-dominance resolved in-block — ids are sorted, so the first
    chunk row to dominate a column IS the smallest dominator. The
    earlier per-pair form (cell equi-join + interpreted dot per
    pair) paid the r7 sf1 sweep's interpreted-lambda tax; this is
    the same cell-block movement pattern as ivf_topk — vectors
    ship once per member, never per pair. Degenerate cells
    (everything identical) cost b^2/2 FLOPs within their own cell
    only — route corpora with massive exact duplication through
    dedup_exact first.
    """
    import numpy as np
    import pandas as pd

    base = _assign_to(
        with_norm(emb).select("vec_id", "_v", "_norm"),
        ivf_train(emb),
    )

    def prune(key, pdf):
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        M = np.array(pdf["_v"].tolist(), dtype=np.float64)
        nn = pdf["_norm"].to_numpy(dtype=np.float64)
        m = len(ids)
        pruned = np.full(m, -1, dtype=np.int64)
        chunk = 1024
        for s in range(0, m, chunk):
            e = min(s + chunk, m)
            S = (M[s:e] @ M.T) / (nn[s:e][:, None] * nn[None, :])
            # near-boundary entries rescored order-fixed
            R = _fix_round6(S, M[s:e], M, nn[s:e], nn)
            ok = R >= tau
            for i in range(e - s):
                gi = s + i
                cols = np.nonzero(ok[i, gi + 1:])[0] + gi + 1
                if cols.size:
                    # ids ascend, gi ascends: first setter is the
                    # smallest dominating neighbor
                    unset = cols[pruned[cols] == -1]
                    pruned[unset] = ids[gi]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": np.full(m, key[0], dtype=np.int64),
                "kept": pruned == -1,
                "pruned_by": pd.array(
                    [None if p == -1 else int(p) for p in pruned],
                    dtype="Int64",
                ),
            }
        )

    return base.select("vec_id", "_v", "_norm", "cell").groupBy(
        "cell"
    ).applyInPandas(
        prune,
        "vec_id long, cell long, kept boolean, pruned_by long",
    )


def ann_recall(emb: DataFrame, k: int = 3) -> DataFrame:
    """Recall@k audit of the hyperplane-LSH ANN against exact
    brute-force ground truth, broken down by label (the similarity-
    search analog of dedup_modality_agreement): per label,
    n_queries, the exact neighbor count (k per query), how many of
    those the LSH path recovered, and recall_ppm — the number that
    tells you whether N_HYPERPLANES is sized right BEFORE you trust
    the scale path on a real corpus.

    Both sides rank with the same floor-rounded 6dp cosine and
    neighbor-id tiebreak, so the "true" top-k set is deterministic
    and the hit join is exact, not tolerance-based.

    Scale: ground truth is blas_cosine_topk (tiled, nothing on the
    driver) — inherently O(N²/block) and meant to run on a DETER-
    MINISTIC SAMPLE of queries at real scale (filter vec_id by
    Lehmer percentile first; exactness per query is unaffected
    because the CORPUS side stays complete). The hit join and label
    rollup are (vec_id, neighbor_id)- and label-keyed — uniform.
    """
    exact = blas_cosine_topk(emb, k=k, round_dp=6).select(
        "vec_id", "neighbor_id"
    )
    approx = hyperplane_lsh_topk(emb, k=k).select(
        "vec_id", "neighbor_id", F.lit(1).alias("hit")
    )
    labels = emb.select("vec_id", "label")
    hits = (
        exact.join(approx, ["vec_id", "neighbor_id"], "left")
        .join(labels, "vec_id")
    )
    return (
        hits.groupBy("label")
        .agg(
            F.count_distinct("vec_id").cast("long").alias("n_queries"),
            F.count("*").cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_hits"),
        )
        .select(
            "label",
            "n_queries",
            "n_exact",
            "n_hits",
            F.floor(F.col("n_hits") * F.lit(1_000_000) / F.col("n_exact"))
            .cast("long")
            .alias("recall_ppm"),
        )
    )


# Embedding-space decontamination: corpus vectors too close to an
# evaluation/benchmark vector are flagged (the semantic analogue of
# curation.decontaminate's shingle overlap — catches paraphrased or
# re-encoded benchmark leakage that exact n-grams miss). The eval
# set here is the vec_id % DECONTAM_EVAL_MOD == 0 slice standing in
# for a real benchmark embedding table; the threshold compares the
# 6dp-ROUNDED cosine so the boundary is engine-exact.
DECONTAM_EVAL_MOD = 50
DECONTAM_TAU = 0.35


# Refuse-and-report bound on the collected eval matrix: the audit
# holds the EVAL side on the driver as a dense float64 matrix (the
# model, like IVF centroids — 100k x 64d = 51 MB), so an eval set
# that is secretly corpus-sized must refuse loudly instead of
# OOM-ing the driver. Past the cap the right dataflow is the
# candidate path (dedup_embedding_pairs / ivf), not a dense audit.
DECONTAM_EVAL_CAP = 100_000


def embedding_decontaminate(
    emb: DataFrame,
    eval_mod: int = DECONTAM_EVAL_MOD,
    tau: float = DECONTAM_TAU,
    eval_cap: int = DECONTAM_EVAL_CAP,
) -> DataFrame:
    """Flag corpus embeddings within cosine ``tau`` of ANY eval
    embedding; emit per-vector hit count and max eval cosine so the
    audit is threshold-tunable downstream without recomputation.

    Scale: the eval set is benchmark-sized (thousands, not corpus-
    scale) — it is collected to a dense float64 matrix (model-sized,
    like the IVF centroids; refused above ``eval_cap``) and the
    corpus side is ONE Arrow-batched ``mapInPandas`` pass running a
    BLAS matmul per batch: no join, no shuffle, no per-element
    interpreted expression. The previous broadcast-nested-loop form
    computed the same corpus x eval dot products through
    ``F.aggregate`` lambdas — the round-7 sf1 spot-run (10x corpus,
    10x eval slice = 100x dots) measured 56x wall; the matmul form
    runs the same audit in ~1/40th the time and scales with
    corpus-rows x eval-size FLOPs, executor-parallel. Cosines use
    the blas_cosine_topk numerics (float64 matmul, floor-round to
    6dp before comparison) so the DuckDB oracle still matches
    hash-exactly. At very large eval sets, route through the
    IVF/LSH candidate path exactly like dedup_embedding_pairs
    instead of any dense audit.
    """
    import numpy as np
    import pandas as pd

    ev_rows = (
        emb.filter(F.pmod(F.col("vec_id"), F.lit(eval_mod)) == 0)
        .select("embedding")
        .limit(eval_cap + 1)
        .collect()
    )
    if len(ev_rows) > eval_cap:
        raise ValueError(
            f"embedding_decontaminate: eval slice exceeds "
            f"eval_cap={eval_cap}; a corpus-sized eval set makes "
            "the dense audit quadratic — use the candidate path "
            "(dedup_embedding_pairs / ivf_topk) or raise eval_cap "
            "explicitly."
        )
    corp = emb.filter(
        F.pmod(F.col("vec_id"), F.lit(eval_mod)) != 0
    ).select("vec_id", "label", "embedding")
    if not ev_rows:
        # Empty benchmark set is "all clean", not "empty audit" —
        # short-circuit plan-side so max_eval_cosine is a true NULL.
        return corp.select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            F.lit(0).cast("long").alias("n_eval_hits"),
            F.lit(None).cast("double").alias("max_eval_cosine"),
            F.lit(False).alias("contaminated"),
        )
    E = np.array([r["embedding"] for r in ev_rows], dtype=np.float64)
    # einsum, not a BLAS-reduced sum: the oracle's norms come from a
    # sequential list_dot_product fold
    en = np.sqrt(np.einsum("ij,ij->i", E, E))

    def audit(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cn = np.sqrt(np.einsum("ij,ij->i", C, C))
            S = (C @ E.T) / (cn[:, None] * en[None, :])
            # near-boundary entries rescored order-fixed
            R = _fix_round6(S, C, E, cn, en)
            hits = (R >= tau).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "label": pdf["label"].astype("int32"),
                    "n_eval_hits": hits,
                    "max_eval_cosine": R.max(axis=1),
                    "contaminated": hits > 0,
                }
            )

    return corp.mapInPandas(
        audit,
        "vec_id long, label int, n_eval_hits long, "
        "max_eval_cosine double, contaminated boolean",
    )


# ----------------------------------------------------------------------
# Per-dimension embedding statistics (feature-scaling pass)
# ----------------------------------------------------------------------


def emb_dim_stats(emb: DataFrame) -> DataFrame:
    """Per-dimension statistics of the embedding column — the
    feature-standardization pass an ANN index or training pipeline
    runs before normalizing: for each dim 1..EMB_DIM, the non-null
    count, quantized value sum, mean square, and min/max.

    Exactness: every value quantizes once to q = floor(v*1e6 + 0.5)
    (the shared rnd arithmetic, on the float->double exact
    promotion), then ONLY integer aggregates follow. Outputs avoid
    engine-divergent division on signed values: Spark `div`
    truncates toward zero while DuckDB `//` floors, so the SUM is
    emitted raw (consumer divides in float) and the only division
    (mean square) is over non-negative integers, where the two
    operators agree.

    Scale: explode of a 1..EMB_DIM literal sequence + element_at —
    rows scale as n_vectors * EMB_DIM with map-side combine on the
    64-value dim key; sums of squares accumulate in DECIMAL(38,0)
    (HUGEINT on the oracle) before the bounded mean-square cast.
    """
    dec = "decimal(38,0)"
    exploded = emb.select(
        F.explode(F.sequence(F.lit(1), F.lit(EMB_DIM))).alias("dim"),
        F.col("embedding").alias("e"),
    ).select(
        "dim",
        F.expr(
            "CAST(floor(CAST(element_at(e, dim) AS DOUBLE) * 1000000.0"
            " + 0.5) AS BIGINT)"
        ).alias("q"),
    )
    return (
        exploded.groupBy("dim")
        .agg(
            F.count("q").cast("long").alias("n"),
            F.sum("q").cast("long").alias("sum_q6"),
            F.sum(F.expr(f"CAST(q AS {dec}) * CAST(q AS {dec})")).alias(
                "_ssq"
            ),
            F.min("q").cast("long").alias("min_q6"),
            F.max("q").cast("long").alias("max_q6"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n",
            "sum_q6",
            F.expr("CAST(_ssq div CAST(n AS decimal(38,0)) AS BIGINT)")
            .alias("mean_sq_q12"),
            "min_q6",
            "max_q6",
        )
    )


def emb_dim_stats_oracle_sql() -> str:
    return f"""
WITH exploded AS (
    SELECT t.dim,
           CAST(floor(CAST(embedding[CAST(t.dim AS INT)] AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS q
    FROM embeddings CROSS JOIN range(1, {EMB_DIM} + 1) t(dim)
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(q) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q6,
       CAST(sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT))
            // CAST(count(q) AS HUGEINT) AS BIGINT) AS mean_sq_q12,
       CAST(min(q) AS BIGINT) AS min_q6,
       CAST(max(q) AS BIGINT) AS max_q6
FROM exploded GROUP BY dim"""
