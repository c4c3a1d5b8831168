"""Product quantization (PQ) vector compression + asymmetric-
distance (ADC) search — the memory-bound ANN tier.

Public technique: Jégou/Douze/Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011) — split each d-dim vector
into M subvectors, vector-quantize each subspace against its own
K-entry codebook, store only the M code ids, and answer queries by
summing per-subspace LOOKUP-TABLE distances (asymmetric: the query
stays exact, only the database side is coded). This is the tier
the repo's similarity canon was missing: `cosine_topk` /
`blas_cosine_topk` are compute-bound exact paths,
`hyperplane_lsh_topk` / `ivf_topk` bound the CANDIDATE set — PQ
bounds the BYTES. At 100 TB of raw float32 embeddings (256 B per
64-dim vector), the PQ code table is M small ints per vector (64x
smaller here at M=8, K=16), which is the difference between an ANN
index that fits executor memory and one that doesn't.

Spark-first shapes (the parts that matter at scale):

- **The model is a literal, never a join.** The trained codebooks
  are M·K·(d/M) integers (1,024 here) — they ship into every plan
  as ONE nested array literal (the quality-classifier weights
  pattern: bytes in the task binary), and assignment is a fold
  against that literal. The subvector stream itself crosses a
  Generate (posexplode) barrier first, so the quantize/slice work
  is materialized ONCE per (vector, subspace) row and the K-way
  distance fold touches only attribute arrays — the CollapseProject
  staging lesson from winnowing/similarity applied here: lambda
  bodies don't protect staged projections, Generate outputs do.
- **Training is the ivf_train driver-loop shape**: a FIXED number
  of Lloyd refinements, each one map-side assignment + ONE
  partial-aggregated shuffle of (m, cell, pos) component sums —
  M·K·(d/M) aggregate rows cross the wire per iteration, never
  vector data. The model lives driver-side between iterations
  (same K·d scale pyspark.ml.KMeans keeps internally).
- **ADC search is one broadcast join + one partial-agg shuffle.**
  The per-query lookup table (nq·M·K distances) broadcasts; codes
  join it map-side on (m, cell); partial aggregation collapses the
  M per-subspace rows per (query, vector) before the shuffle, so
  the wire carries the N·nq scored candidates themselves, not
  N·nq·M terms. The final per-query top-k is a window group-limit
  (the w9 pattern).

Determinism contract (DuckDB oracle parity): EVERYTHING is
integer-exact. Components are quantized up front
(``floor(x * 1e6)`` — one IEEE multiply + floor on the
float32→double widening, bit-identical in both engines); squared
L2 distances are integer sums of integer squares (order-free);
argmin ties break by cell id via the order-preserving encode
``d2 * K + cell`` (K a power of two, encode non-negative, so
Spark's shiftright and DuckDB's ``//`` agree exactly); centroid
updates are ``floor(sum/count + 0.5)`` — one IEEE division of
exact integers — so refined codebooks stay integer vectors. No
float ever needs a cross-engine summation-order argument. The
oracle unrolls the identical training as SQL CTEs (the
emb_ivf_topk pattern).

Reference parity note: /root/reference has no vector search at
all; this module extends the beyond-reference training-data layer
(SURVEY §2 datapipe additions) alongside similarity.py.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import EMB_DIM

PQ_M = 8  # subspaces (codes per vector)
PQ_DS = EMB_DIM // PQ_M  # dims per subspace
PQ_K = 16  # codebook entries per subspace (4-bit codes)
PQ_ITERS = 2  # fixed Lloyd refinements (cross-engine unrollable)
PQ_NQ = 8  # demo query-set size for the registry ADC query
PQ_SCALE = 1_000_000  # integer quantization of vector components
PQ_SHORTLIST = 64  # ADC shortlist size the exact re-rank rescores

# the encode d2*K + cell is split with shiftright/%; both need K a
# power of two and the encode non-negative (d2, cell >= 0 always)
_PQ_SHIFT = PQ_K.bit_length() - 1
assert PQ_K == 1 << _PQ_SHIFT


# How many prefix rows every model/query consumer needs: the PQ seed
# takes the first PQ_K vectors, the IVF seed the first N_IVF_CELLS
# (== PQ_K here), the audit query set the first PQ_NQ.
_PREFIX_N = max(PQ_K, PQ_NQ)


def _prefix_rows(emb: DataFrame, n: int = _PREFIX_N) -> list:
    """The first `n` (vec_id, embedding) rows by vec_id — ONE tiny
    driver collect (r14, guide §2.6/§5): the PQ seed, the IVF seed,
    the audit query-id set, the ADC lookup-table queries and the
    exact ground-truth arm all consume exactly this prefix, and each
    used to run its own sort-limit job (or worse, a corpus-scan
    semi-join subtree inside the final plan). The prefix is
    model-sized (16 vectors), the same driver-resident object the
    training ladders already hold. Rows are re-sorted driver-side so
    callers never depend on collect order."""
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n)
        .collect()
    )
    return sorted(rows, key=lambda r: r["vec_id"])


def _quant_list(embedding) -> list[int]:
    """floor(double(x) * 1e6) per component, driver-side — the same
    one IEEE multiply + floor on the float32→double widening `_qv`
    computes plan-side (Python floats ARE IEEE doubles, so the
    arithmetic is bit-identical)."""
    return [
        math.floor(float(x) * float(PQ_SCALE)) for x in embedding
    ]


def _seed_model(rows: list) -> dict[int, dict[int, list[int]]]:
    """The PQ seed model from the first PQ_K prefix rows: cell i of
    every subspace is vector i's quantized subvector slice — exactly
    the (vec_id rank → cell) mapping the former seed collect built
    from the exploded subvector stream."""
    model: dict[int, dict[int, list[int]]] = {
        m: {} for m in range(PQ_M)
    }
    for i, r in enumerate(rows[:PQ_K]):
        qv = _quant_list(r["embedding"])
        for m in range(PQ_M):
            model[m][i] = qv[m * PQ_DS : (m + 1) * PQ_DS]
    return model


def _qv() -> Column:
    """The 1e6-quantized long vector: floor(double(x) * 1e6)."""
    return F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(float(PQ_SCALE))),
    )


def _subs() -> Column:
    """array<array<long>>: the M quantized subvector slices."""
    qv = _qv()
    return F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.slice(qv, m * PQ_DS + 1, PQ_DS),
    )


def _per_sub(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sv): the quantized subvector stream. The
    posexplode materializes sv as a Generate output attribute, so
    every downstream fold (K-way assignment, LUT build) touches a
    plain long array — the quantize+slice work runs once per
    (vector, subspace), never once per codebook entry."""
    return emb.select(
        "vec_id", F.posexplode(_subs()).alias("m", "sv")
    )


def _d2(a: Column, b: Column) -> Column:
    """Integer squared L2 distance between two long-array
    subvectors — an order-free exact sum of integer squares."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _model_lit(model: dict[int, dict[int, list[int]]]) -> Column:
    """The trained codebooks as ONE nested array literal
    array<array<struct<cell,cv>>> indexed [m+1] via element_at —
    cells dropped during training are simply absent from their
    subspace's list, so the assignment fold never sees them."""
    return F.array(
        *[
            F.array(
                *[
                    F.struct(
                        F.lit(cell).alias("cell"),
                        F.array(
                            *[F.lit(int(c)) for c in cv]
                        ).alias("cv"),
                    )
                    for cell, cv in sorted(model.get(m, {}).items())
                ]
            )
            for m in range(PQ_M)
        ]
    )


def _enc_min(sv: Column, cents_m: Column) -> Column:
    """min over the subspace codebook of d2(sv, cv) * K + cell —
    the order-preserving integer encode whose min IS the
    (distance, cell-id-tiebreak) argmin. One map-side fold."""
    return F.array_min(
        F.transform(
            cents_m,
            lambda e: _d2(sv, e["cv"]) * F.lit(PQ_K) + e["cell"],
        )
    )


def _model_empty(model: dict) -> bool:
    return not any(model.get(m) for m in range(PQ_M))


def _codebooks_np(model: dict):
    """Per-subspace (cell-ids, centroid-matrix) int64 numpy pair
    list for a model in which EVERY subspace still has at least one
    cell, else None (callers fall back to the JVM fold, preserving
    the NULL an empty subspace's array_min yields)."""
    import numpy as np

    cbs = []
    for m in range(PQ_M):
        items = sorted(model.get(m, {}).items())
        if not items:
            return None
        cbs.append(
            (
                np.array([c for c, _ in items], dtype=np.int64),
                np.array([cv for _, cv in items], dtype=np.int64),
            )
        )
    return cbs


def _enc_arr(model: dict) -> Column:
    """array<long> of the M subspace encodes for one vector —
    the batch-vectorized twin of mapping `_enc_min` over the
    subvector slices (r13, guide §4.2: the interpreted
    transform/zip_with/aggregate chain never enters codegen and
    paid ~n·M·K element-closure calls; this computes the identical
    integer math — IEEE double multiply + floor quantization, then
    int64 d2/encode/argmin — in one Arrow-vectorized numpy pass).
    Bit-identical by construction: every op after the (identical)
    quantize is exact integer arithmetic, so there is no float
    summation-order to fix. Falls back to the JVM fold when a
    subspace codebook is empty."""
    cbs = _codebooks_np(model)
    if cbs is None:
        cents = _model_lit(model)
        qv = _qv()
        return F.transform(
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda m: _enc_min(
                F.slice(qv, m * PQ_DS + 1, PQ_DS),
                F.element_at(cents, m + 1),
            ),
        )

    import numpy as np
    import pandas as pd

    def _enc(batch):
        if len(batch) == 0:
            return pd.Series([], dtype=object)
        E = np.array(batch.tolist(), dtype=np.float64)
        Q = np.floor(E * float(PQ_SCALE)).astype(np.int64)
        out = np.empty((Q.shape[0], PQ_M), dtype=np.int64)
        for m, (cells, cb) in enumerate(cbs):
            sv = Q[:, m * PQ_DS : (m + 1) * PQ_DS]
            diff = sv[:, None, :] - cb[None, :, :]
            d2 = np.einsum("bkd,bkd->bk", diff, diff)
            out[:, m] = (d2 * PQ_K + cells[None, :]).min(axis=1)
        return pd.Series(list(out))

    return F.pandas_udf(_enc, "array<long>")(F.col("embedding"))


def pq_train(
    emb: DataFrame,
    n_iters: int = PQ_ITERS,
    _prefix: list | None = None,
) -> dict[int, dict[int, list[int]]]:
    """Train the M per-subspace codebooks: seed each subspace with
    the subvectors of the first K vectors by vec_id (cell = rank),
    then run `n_iters` integer-exact Lloyd refinements. Returns
    {m: {cell: [component, ...]}} — M·K·(d/M) ints, driver-side.

    Scale: per iteration ONE map-side assignment (model literal
    over the Generate-materialized subvector stream) and ONE
    partial-aggregated shuffle whose reduce output is the
    M·K·(d/M)-row component-sum table — the only thing collected.
    Cells that lose all members drop out (both engines agree;
    their ids are not reused). An empty input yields an empty
    model; downstream ops return schema-stable empty frames.

    ``_prefix`` (r14, guide §2.6): the `_prefix_rows` collect,
    passed in by consumers that already hold it so one prefix job
    serves the PQ seed, the IVF seed and the query set — the seed
    quantize/slice runs driver-side on 16 vectors with bit-identical
    arithmetic (see `_quant_list`)."""
    rows = _prefix_rows(emb, PQ_K) if _prefix is None else _prefix
    model = _seed_model(rows)

    for _ in range(n_iters):
        if _model_empty(model):
            break
        # subvectors and their encodes ride one zipped array so the
        # single Generate keeps (sv, cell) aligned per subspace; the
        # encode itself is the vectorized _enc_arr (guide §4.2)
        z = F.arrays_zip(
            _subs().alias("sv"), _enc_arr(model).alias("enc")
        )
        asg = emb.select(
            F.posexplode(z).alias("m", "z")
        ).select(
            "m",
            F.col("z.sv").alias("sv"),
            (F.col("z.enc") % F.lit(PQ_K)).cast("int").alias("cell"),
        )
        sums = (
            asg.select(
                "m", "cell", F.posexplode("sv").alias("pos", "comp")
            )
            .groupBy("m", "cell", "pos")
            .agg(
                F.count("*").alias("n_members"),
                F.sum("comp").alias("s"),  # exact long sum
            )
        )
        nxt: dict[int, dict[int, dict[int, int]]] = {}
        for r in sums.collect():  # M*K*(d/M) aggregate rows
            nxt.setdefault(r["m"], {}).setdefault(r["cell"], {})[
                r["pos"]
            ] = math.floor(r["s"] / r["n_members"] + 0.5)
        model = {
            m: {
                cell: [dims[p] for p in range(PQ_DS)]
                for cell, dims in nxt.get(m, {}).items()
            }
            for m in range(PQ_M)
        }

    return model


def _assigned(emb: DataFrame, model: dict) -> DataFrame:
    """(vec_id, m, cell, d2): each vector's code and quantization
    error per subspace — map-side assignment against the literal
    model over the materialized subvector stream. The encode is
    STAGED (one fold, referenced twice) and split exactly:
    cell = enc % K, d2 = enc >> log2(K)."""
    if _model_empty(model):
        return (
            _per_sub(emb)
            .select(
                "vec_id",
                "m",
                F.lit(0).cast("int").alias("cell"),
                F.lit(0).cast("long").alias("d2"),
            )
            .where(F.lit(False))
        )
    staged = emb.select(
        "vec_id", F.posexplode(_enc_arr(model)).alias("m", "_enc")
    )
    return staged.select(
        "vec_id",
        "m",
        (F.col("_enc") % F.lit(PQ_K)).cast("int").alias("cell"),
        F.shiftright(F.col("_enc"), _PQ_SHIFT).alias("d2"),
    )


def pq_codes(
    emb: DataFrame
) -> DataFrame:
    """The compressed index: (vec_id, code, sq_err) — `code` is the
    M cell ids hyphen-joined in subspace order (the stored bytes),
    `sq_err` the vector's total integer quantization error (the
    distortion an index-build job monitors; units are the
    1e12-scaled squared component domain).

    Scale: assignment is map-side; the per-vector regroup is one
    partial-aggregated shuffle keyed on vec_id whose in-aggregate
    buffer is exactly M (8) structs — bounded by the model shape,
    not by data."""
    a = _assigned(emb, pq_train(emb))
    return a.groupBy("vec_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "cell"))),
                lambda s: s["cell"].cast("string"),
            ),
            "-",
        ).alias("code"),
        F.sum("d2").cast("long").alias("sq_err"),
    )


def _recall_report(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """One-row integer recall report shared by every audit:
    (n_queries, n_exact, n_hits, recall_ppm), empty-input-safe."""
    joined = exact.join(approx, ["q_id", "neighbor_id"], "left")
    return joined.agg(
        F.countDistinct("q_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("n_exact"),
        F.coalesce(F.sum("hit"), F.lit(0))
        .cast("long")
        .alias("n_hits"),
        F.when(
            F.count("*") > 0,
            F.floor(
                F.coalesce(F.sum("hit"), F.lit(0))
                * F.lit(1_000_000)
                / F.count("*")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("recall_ppm"),
    )


def pq_exact_topk(
    emb: DataFrame,
    k: int = 3,
    nq: int = PQ_NQ,
    _prefix: list | None = None,
) -> DataFrame:
    """Ground truth for the ADC audit: EXACT integer squared-L2
    top-k for the first `nq` queries over the full (uncoded)
    quantized vectors — the same integer domain the codes
    approximate, so recall losses measure QUANTIZATION error only,
    not float noise. Output: (q_id, neighbor_id, dist, rank).

    Scale: deliberately brute — nq·N scored pairs — but bounded by
    the audit's query-set size, the same contract as ann_recall's
    exact arm. The nq quantized query vectors are a driver-side
    literal (one tiny collect, the model-sized object a serving
    audit would hold anyway) and every corpus vector scores all nq
    queries in one Arrow-vectorized int64 numpy batch (r13, guide
    §4.2 — replaces the M-explode + broadcast join + interpreted
    zip_with fold + (q,vec) re-aggregation: full-vector integer d2
    equals the per-subspace sum exactly, so the values are
    bit-identical and the plan drops a Generate, a join and a
    shuffle)."""
    import numpy as np
    import pandas as pd

    qrows = (
        _prefix_rows(emb, nq) if _prefix is None else _prefix
    )[:nq]
    if not qrows:
        return emb.select(
            F.col("vec_id").alias("q_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.lit(0).cast("long").alias("dist"),
            F.lit(0).cast("int").alias("rank"),
        ).where(F.lit(False))
    q_ids = [int(r["vec_id"]) for r in qrows]
    qm = np.floor(
        np.array([list(r["embedding"]) for r in qrows], dtype=np.float64)
        * float(PQ_SCALE)
    ).astype(np.int64)

    def _q_dists(batch):
        if len(batch) == 0:
            return pd.Series([], dtype=object)
        E = np.array(batch.tolist(), dtype=np.float64)
        Q = np.floor(E * float(PQ_SCALE)).astype(np.int64)
        diff = Q[:, None, :] - qm[None, :, :]
        d2 = np.einsum("bqd,bqd->bq", diff, diff)
        return pd.Series(list(d2))

    q_dists = F.pandas_udf(_q_dists, "array<long>")
    qid_arr = F.array(*[F.lit(q) for q in q_ids])
    exact = (
        emb.select(
            "vec_id",
            F.posexplode(q_dists(F.col("embedding"))).alias(
                "qi", "dist"
            ),
        )
        .select(
            F.element_at(qid_arr, F.col("qi") + 1).alias("q_id"),
            "vec_id",
            "dist",
        )
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", F.col("vec_id").alias("neighbor_id"), "dist", "rank"
        )
    )


def pq_recall(
    emb: DataFrame,
    k: int = 3,
    nq: int = PQ_NQ,
) -> DataFrame:
    """The PQ accuracy audit (the ann_recall shape for the coded
    index): recall@k of ADC search against the exact integer
    ground truth over the same queries. One report row:
    (n_queries, n_exact, n_hits, recall_ppm) — recall in exact
    integer parts-per-million, so the row hashes cross-engine.

    r13 batch 8 (guide §2.6 — overlap independent jobs): the exact
    ground-truth arm is independent of the trained model, so it
    materializes (tiny nq·k localCheckpoint) in a driver thread
    WHILE the pq_train ladder runs — the training jobs are
    driver-latency-bound and leave the executors mostly idle, so the
    exact arm's corpus pass back-fills them. Values are unchanged:
    both arms are pure functions of `emb`; the checkpoint only cuts
    the exact subtree out of the final plan (it is recomputed fresh
    on every invocation). Note (r13 ADVICE): localCheckpoint blocks
    are unreplicated executor state — fine for this tiny nq·k frame
    locally; audits on preemptible executors should collect-and-
    recreate or use a reliable checkpoint instead. r14: ONE prefix collect feeds the seed,
    the query set and the exact arm (guide §2.6), and a failed
    training cancels/surfaces the exact future instead of silently
    dropping its error (r13 ADVICE)."""
    prefix = _prefix_rows(emb)
    with ThreadPoolExecutor(max_workers=2) as ex:
        exact_fut = ex.submit(
            lambda: pq_exact_topk(emb, k=k, nq=nq, _prefix=prefix)
            .select("q_id", "neighbor_id")
            .localCheckpoint()
        )
        try:
            model = pq_train(emb, _prefix=prefix)
        except BaseException:
            exact_fut.cancel()
            raise
        exact = exact_fut.result()
    adc = pq_adc_topk(
        emb, k=k, nq=nq, _model=model, _prefix=prefix
    ).select("q_id", "neighbor_id", F.lit(1).alias("hit"))
    return _recall_report(exact, adc)


def _query_ids(
    emb: DataFrame, nq: int, _prefix: list | None = None
) -> DataFrame:
    """The nq-row audit query-id set as a broadcast LocalRelation
    (r14): the former sort-limit subtree re-scanned the corpus
    inside every consuming plan; the ids are the `_prefix_rows`
    prefix the caller already holds (collected fresh per
    invocation when not passed)."""
    rows = _prefix_rows(emb, nq) if _prefix is None else _prefix
    ids = [(int(r["vec_id"]),) for r in rows[:nq]]
    return F.broadcast(
        emb.sparkSession.createDataFrame(ids, "q_id long")
    )


def _query_subs(
    emb: DataFrame, nq: int, _prefix: list | None = None
) -> DataFrame:
    """(q_id, m, sv): the query set's exact quantized subvectors as
    a LocalRelation (nq·M rows) computed driver-side from the prefix
    (r14 — replaces a full corpus subvector scan semi-joined down to
    nq rows inside every audit plan; `_quant_list` is bit-identical
    to the plan-side quantize)."""
    rows = _prefix_rows(emb, nq) if _prefix is None else _prefix
    data = []
    for r in rows[:nq]:
        qv = _quant_list(r["embedding"])
        for m in range(PQ_M):
            data.append(
                (int(r["vec_id"]), m, qv[m * PQ_DS : (m + 1) * PQ_DS])
            )
    return emb.sparkSession.createDataFrame(
        data, "q_id long, m int, sv array<bigint>"
    )


def _adc_lut(
    emb: DataFrame, model: dict, nq: int, _prefix: list | None = None
) -> DataFrame:
    """(q_id, m, cell, d2): the per-query subspace lookup table —
    nq·M·K rows, always broadcastable. Computed DRIVER-SIDE (r14,
    guide §2.4): the queries are the prefix the caller holds and the
    model is a driver dict, so the LUT is pure integer arithmetic
    over model-sized inputs — the former plan-side form re-scanned
    the whole corpus (posexplode + semi-join + literal-codebook
    explode) just to produce these 1,024 rows inside every ADC
    plan. Integer d2 is order-free exact, identical in Python."""
    rows = _prefix_rows(emb, nq) if _prefix is None else _prefix
    data = []
    for r in rows[:nq]:
        q_id = int(r["vec_id"])
        qv = _quant_list(r["embedding"])
        for m in range(PQ_M):
            sv = qv[m * PQ_DS : (m + 1) * PQ_DS]
            for cell, cv in sorted(model.get(m, {}).items()):
                d2 = sum(
                    (a - b) * (a - b) for a, b in zip(sv, cv)
                )
                data.append((q_id, m, int(cell), d2))
    return F.broadcast(
        emb.sparkSession.createDataFrame(
            data, "q_id long, m int, cell int, d2 long"
        )
    )


def _adc_scored(
    emb: DataFrame, model: dict, nq: int, _prefix: list | None = None
) -> DataFrame:
    """(q_id, vec_id, adc_dist): every (query, vector) candidate
    scored through the code lookup table — the shared core of the
    plain ADC top-k and the re-ranked variant."""
    lut = _adc_lut(emb, model, nq, _prefix)
    codes = _assigned(emb, model).select("vec_id", "m", "cell")
    return (
        codes.join(lut, ["m", "cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2").cast("long").alias("adc_dist"))
    )


def pq_adc_topk(
    emb: DataFrame,
    k: int = 3,
    nq: int = PQ_NQ,
    _model: dict | None = None,
    _prefix: list | None = None,
) -> DataFrame:
    """ADC search: the first `nq` vectors by vec_id act as the
    query set (asymmetric — queries stay EXACT integer subvectors,
    only the database side is coded). Output: (q_id, neighbor_id,
    adc_dist, rank) — integer approximate squared L2, rank 1..k
    per query with a neighbor-id tiebreak; the query itself is
    excluded.

    Scale: the lookup table is nq·M·K rows (1,024 at the defaults)
    built from the queries' exact subvectors against the codebooks
    — it BROADCASTS; codes join it map-side on (m, cell); partial
    aggregation collapses the M subspace terms per (query, vector)
    before the one shuffle, whose payload is the N·nq scored
    candidates themselves. The per-query top-k is a window
    group-limit (k rows per query survive each map partition)."""
    if _prefix is None:
        _prefix = _prefix_rows(emb)
    model = pq_train(emb, _prefix=_prefix) if _model is None else _model
    if _model_empty(model):
        return (
            _query_ids(emb, nq, _prefix)
            .select(
                "q_id",
                F.lit(0).cast("long").alias("neighbor_id"),
                F.lit(0).cast("long").alias("adc_dist"),
                F.lit(0).cast("int").alias("rank"),
            )
            .where(F.lit(False))
        )
    scored = _adc_scored(emb, model, nq, _prefix)
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_dist",
            "rank",
        )
    )


def pq_rerank_topk(
    emb: DataFrame,
    k: int = 3,
    nq: int = PQ_NQ,
    shortlist: int = PQ_SHORTLIST,
    _model: dict | None = None,
    _prefix: list | None = None,
) -> DataFrame:
    """ADC shortlist + EXACT re-rank — the production PQ serving
    pattern (FAISS's refine step): the coded index prunes N
    candidates to `shortlist` per query at lookup-table cost, then
    only those nq·shortlist vectors are rescored with the exact
    integer distance. Output: (q_id, neighbor_id, dist, rank) with
    `dist` the EXACT quantized squared L2.

    Scale: the ADC pass is the pq_adc_topk plan (broadcast LUT,
    partial-agg shuffle of N·nq candidates, group-limit shortlist);
    the refine joins the corpus subvector stream against the
    BROADCAST shortlist (nq·shortlist rows), so exact scoring
    touches nq·shortlist·M rows no matter how large N grows —
    recall improves from the shortlist's depth, not from rescoring
    the corpus."""
    if _prefix is None:
        _prefix = _prefix_rows(emb)
    model = pq_train(emb, _prefix=_prefix) if _model is None else _model
    if _model_empty(model):
        return (
            _query_ids(emb, nq, _prefix)
            .select(
                "q_id",
                F.lit(0).cast("long").alias("neighbor_id"),
                F.lit(0).cast("long").alias("dist"),
                F.lit(0).cast("int").alias("rank"),
            )
            .where(F.lit(False))
        )
    scored = _adc_scored(emb, model, nq, _prefix)
    ws = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    short = (
        scored.withColumn("_r", F.row_number().over(ws))
        .filter(F.col("_r") <= shortlist)
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
    )
    # r14 refine (guide §4.2/§2.4): the corpus joins the BROADCAST
    # nq·shortlist pair list first, then one Arrow eval rescores each
    # surviving row against the driver-resident quantized query
    # matrix with a FULL-VECTOR integer d2 (== the per-subspace sum,
    # exactly — the pq_exact_topk identity). The former shape
    # re-quantized the whole corpus through the interpreted _per_sub
    # explode and paid a (q, neighbor) re-aggregation shuffle to sum
    # the M subspace terms.
    exact = (
        emb.select("vec_id", "embedding")
        .join(
            F.broadcast(short),
            F.col("vec_id") == F.col("neighbor_id"),
        )
        .select(
            "q_id",
            "neighbor_id",
            _exact_dist_udf(_prefix, nq)(
                F.col("embedding"), F.col("q_id")
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "dist", "rank")
    )


def pq_rerank_recall(
    emb: DataFrame,
    k: int = 3,
    nq: int = PQ_NQ,
    shortlist: int = PQ_SHORTLIST,
) -> DataFrame:
    """Recall@k of the re-ranked PQ pipeline against the exact
    ground truth — the companion audit to pq_recall that shows what
    the refine step buys back (a true neighbor is recovered iff it
    survives into the ADC shortlist; the exact re-rank then orders
    it correctly). Same one-row integer report as pq_recall, and the
    same §2.6 exact-arm/training overlap + shared prefix collect +
    failure-path future cancel (see pq_recall)."""
    prefix = _prefix_rows(emb)
    with ThreadPoolExecutor(max_workers=2) as ex:
        exact_fut = ex.submit(
            lambda: pq_exact_topk(emb, k=k, nq=nq, _prefix=prefix)
            .select("q_id", "neighbor_id")
            .localCheckpoint()
        )
        try:
            model = pq_train(emb, _prefix=prefix)
        except BaseException:
            exact_fut.cancel()
            raise
        exact = exact_fut.result()
    rr = pq_rerank_topk(
        emb, k=k, nq=nq, shortlist=shortlist, _model=model,
        _prefix=prefix,
    ).select("q_id", "neighbor_id", F.lit(1).alias("hit"))
    return _recall_report(exact, rr)


def _prefix_norm_df(
    emb: DataFrame, prefix: list, nq: int
) -> DataFrame:
    """(vec_id, _v, _norm) for the first nq prefix rows as a
    LocalRelation — the query side of the IVF probe assignment
    (r14): the former shape semi-joined the full `with_norm` corpus
    down to nq rows, paying a corpus scan + norm fold inside the
    plan. `_v` is the same float→double widening and `_norm` the
    same left-to-right fold `with_norm` computes (the
    centroid_df_for arithmetic), so values are bit-identical."""
    data = []
    for r in prefix[:nq]:
        v = [float(x) for x in r["embedding"]]
        s = 0.0
        for x in v:
            s = s + x * x
        data.append((int(r["vec_id"]), v, math.sqrt(s)))
    return emb.sparkSession.createDataFrame(
        data, "vec_id long, _v array<double>, _norm double"
    )


def _probe_rows(
    prefix: list, ivf_rows: list, nq: int, nprobe: int
) -> list[tuple[int, int]]:
    """(q_id, cell) probe list computed DRIVER-side (r14, guide
    §2.6/§5): both inputs are driver-resident model-sized objects —
    the nq prefix query vectors and the K IVF centroids — so the
    probe assignment is a tiny numpy argsort on the driver, not a
    pandas-UDF eval over an nq-row frame inside the plan. The
    arithmetic is `_assign_to._best` verbatim (float→double widen,
    einsum dot, IEEE divide, 6dp floor-round, stable argsort over
    ascending cells, ANSI zero-norm raise), so the probe list is
    bit-identical to the former in-plan assignment."""
    import numpy as np

    cells = np.array([r["cell"] for r in ivf_rows], dtype=np.int64)
    cmat = np.array(
        [list(r["c_v"]) for r in ivf_rows], dtype=np.float64
    )
    cnorm = np.array(
        [r["c_norm"] for r in ivf_rows], dtype=np.float64
    )
    out: list[tuple[int, int]] = []
    for r in prefix[:nq]:
        v = np.array(
            [float(x) for x in r["embedding"]], dtype=np.float64
        )
        s = 0.0
        for x in v:
            s = s + x * x
        nn = math.sqrt(s)
        den = nn * cnorm
        if np.any(den == 0.0):
            raise ArithmeticError(
                "[DIVIDE_BY_ZERO] zero vector norm in "
                "centroid assignment"
            )
        d = cmat @ v
        neg = -(np.floor(d / den * 1e6 + 0.5) / 1e6)
        order = np.argsort(neg, kind="stable")[:nprobe]
        out.extend(
            (int(r["vec_id"]), int(c)) for c in cells[order]
        )
    return out


def _exact_dist_udf(prefix: list, nq: int):
    """long d2(embedding, query q_id) over the nq driver-resident
    quantized query vectors — the rerank refine's exact rescore as
    ONE Arrow eval on the broadcast-joined shortlist rows (r14,
    guide §4.2/§2.4: the former refine re-quantized the WHOLE corpus
    through the interpreted `_per_sub` explode, joined two broadcast
    tables and paid a (q, neighbor) re-aggregation shuffle to sum M
    subspace terms — full-vector integer d2 equals the per-subspace
    sum exactly, the pq_exact_topk identity)."""
    import numpy as np
    import pandas as pd

    rows = prefix[:nq]
    q_ids = np.array(
        [int(r["vec_id"]) for r in rows], dtype=np.int64
    )
    qsort = np.argsort(q_ids)
    q_ids = q_ids[qsort]
    qm = np.array(
        [_quant_list(rows[i]["embedding"]) for i in qsort],
        dtype=np.int64,
    )

    def _fn(emb_s, qid_s):
        if len(emb_s) == 0:
            return pd.Series([], dtype="int64")
        E = np.array(emb_s.tolist(), dtype=np.float64)
        Q = np.floor(E * float(PQ_SCALE)).astype(np.int64)
        qi = np.searchsorted(q_ids, qid_s.to_numpy(dtype=np.int64))
        diff = Q - qm[qi]
        return pd.Series(np.einsum("bd,bd->b", diff, diff))

    return F.pandas_udf(_fn, "long")


def _home_enc_udf(ivf_rows: list, model: dict):
    """ONE Arrow pass computing each corpus vector's IVF home cell
    AND its PQ encode array (r14, guide §2.4 — remove shuffles
    outright): ivfpq_topk previously ran two separate corpus Arrow
    passes (home assignment, PQ encode) and then shuffle-joined the
    corpus-sized code table back onto the candidate pairs on
    vec_id. Fusing them makes the candidate pair list carry its
    codes, so the pairs⋈codes exchange pair disappears and the plan
    is: one scan → one ArrowEval → broadcast probe join → broadcast
    LUT join → one partial-agg shuffle.

    Numerics: the home argmin is `_assign_to._best` verbatim
    (einsum dot, IEEE divide, 6dp floor-round, ascending-cell
    stable argmin, ANSI zero-norm raise); the encode is
    `_enc_arr._enc` verbatim (exact int64). Marked
    asNondeterministic for the same §4.4 reason as `_assign_to`:
    consumers join on the emitted cell, and optimizer-inferred
    no-op predicates must not clone a corpus-wide Arrow pass."""
    import numpy as np
    import pandas as pd

    cells = np.array([r["cell"] for r in ivf_rows], dtype=np.int64)
    cmat = np.array(
        [list(r["c_v"]) for r in ivf_rows], dtype=np.float64
    )
    cnorm = np.array(
        [r["c_norm"] for r in ivf_rows], dtype=np.float64
    )
    cbs = _codebooks_np(model)

    def _fn(v, norm):
        if len(v) == 0:
            return pd.DataFrame({"cell": [], "enc": []})
        E = np.array(v.tolist(), dtype=np.float64)
        nn = norm.to_numpy(dtype=np.float64)
        neg = np.empty((E.shape[0], len(cells)), dtype=np.float64)
        for kk in range(len(cells)):
            den = nn * cnorm[kk]
            if np.any(den == 0.0):
                raise ArithmeticError(
                    "[DIVIDE_BY_ZERO] zero vector norm in "
                    "centroid assignment"
                )
            d = np.einsum(
                "ij,ij->i", E, np.broadcast_to(cmat[kk], E.shape)
            )
            neg[:, kk] = -(np.floor(d / den * 1e6 + 0.5) / 1e6)
        home = cells[np.argmin(neg, axis=1)]
        Q = np.floor(E * float(PQ_SCALE)).astype(np.int64)
        out = np.empty((Q.shape[0], PQ_M), dtype=np.int64)
        for m, (cls, cb) in enumerate(cbs):
            sv = Q[:, m * PQ_DS : (m + 1) * PQ_DS]
            diff = sv[:, None, :] - cb[None, :, :]
            d2 = np.einsum("bkd,bkd->bk", diff, diff)
            out[:, m] = (d2 * PQ_K + cls[None, :]).min(axis=1)
        return pd.DataFrame({"cell": home, "enc": list(out)})

    return F.pandas_udf(
        _fn, "struct<cell:bigint,enc:array<bigint>>"
    ).asNondeterministic()


def ivfpq_topk(
    emb: DataFrame,
    k: int = 3,
    nq: int = PQ_NQ,
    _models: tuple | None = None,
    _prefix: list | None = None,
) -> DataFrame:
    """IVF-PQ: the composed production index (FAISS's IndexIVFPQ) —
    the IVF coarse quantizer prunes the CANDIDATE set (each query
    probes its nprobe nearest cells; candidates are indexed by home
    cell), and PQ codes bound the BYTES scored inside those cells
    via the ADC lookup table. Output matches pq_adc_topk:
    (q_id, neighbor_id, adc_dist, rank), self excluded.

    Both trainings are the repo's existing verified loops
    (similarity.ivf_train, pq_train), retrained from the input on
    every invocation. They are INDEPENDENT driver-resident job
    ladders (seed collect + fixed Lloyd rounds of one small job
    each), so they run from two driver threads and their jobs
    interleave on the cluster (optimization guide §2.6 — overlap
    independent jobs; each model is a pure function of `emb`, so
    results are identical to the sequential order).

    Scale: the probe list (nq·nprobe rows) broadcasts; the
    candidate pair list is |cell-members| x |queries probing the
    cell| — the IVF contract that keeps scored work ~nprobe/K of
    the corpus; the ADC LUT broadcasts; one partial-agg shuffle
    carries the candidate scores and a window group-limit takes
    the per-query top-k."""
    from .similarity import N_IVF_PROBE, _assign_to, ivf_train, with_norm

    if _prefix is None:
        _prefix = _prefix_rows(emb)
    if _models is None:
        with ThreadPoolExecutor(max_workers=2) as ex:
            pq_fut = ex.submit(pq_train, emb, PQ_ITERS, _prefix)
            ivf_fut = ex.submit(ivf_train, emb, _prefix=_prefix)
            model = pq_fut.result()
            ivf_model = ivf_fut.result()
    else:
        # recall audits pass the models they trained while their
        # exact ground-truth arm materialized (guide §2.6)
        model, ivf_model = _models
    if _model_empty(model):
        return (
            _query_ids(emb, nq, _prefix)
            .select(
                "q_id",
                F.lit(0).cast("long").alias("neighbor_id"),
                F.lit(0).cast("long").alias("adc_dist"),
                F.lit(0).cast("int").alias("rank"),
            )
            .where(F.lit(False))
        )
    # r13 batch 8 (guide §2.4): the probe pass assigns ONLY the nq
    # query vectors; r14 computes that probe list entirely on the
    # driver (`_probe_rows` — queries and centroids are both
    # driver-resident model objects) and fuses the corpus
    # home-assignment and PQ-encode passes into ONE Arrow eval whose
    # output rides directly into the broadcast probe/LUT joins — see
    # _home_enc_udf. Zero-norm ANSI raise behavior is unchanged:
    # every corpus vector still passes through the home assignment.
    n = with_norm(emb).select("vec_id", "_v", "_norm")
    lut = _adc_lut(emb, model, nq, _prefix)
    ivf_rows = sorted(
        ivf_model.collect(), key=lambda r: r["cell"]
    )  # LocalRelation: the driver-side model, not data
    if ivf_rows:
        probes = F.broadcast(
            emb.sparkSession.createDataFrame(
                _probe_rows(_prefix, ivf_rows, nq, N_IVF_PROBE),
                "q_id long, cell long",
            )
        )
    else:
        qn = _prefix_norm_df(emb, _prefix, nq)
        probes = _assign_to(
            qn, ivf_model, nprobe=N_IVF_PROBE
        ).select(
            F.col("vec_id").alias("q_id"),
            F.explode("probe_cells").alias("cell"),
        )
    if ivf_rows and _codebooks_np(model) is not None:
        hc = n.select(
            "vec_id",
            _home_enc_udf(ivf_rows, model)(
                F.col("_v"), F.col("_norm")
            ).alias("_hc"),
        ).select(
            "vec_id",
            F.col("_hc.cell").alias("cell"),
            F.col("_hc.enc").alias("enc"),
        )
        scored = (
            hc.join(F.broadcast(probes), "cell")
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                "vec_id",
                F.posexplode("enc").alias("m", "_enc"),
            )
            .select(
                "q_id",
                "vec_id",
                "m",
                (F.col("_enc") % F.lit(PQ_K)).cast("int").alias("cell"),
            )
            .join(lut, ["q_id", "m", "cell"])
            .groupBy("q_id", "vec_id")
            .agg(F.sum("d2").cast("long").alias("adc_dist"))
        )
    else:
        # degenerate model (an empty subspace codebook / no IVF
        # centroids): keep the r13 two-pass shape, whose JVM fold
        # fallback preserves the empty-subspace NULL semantics
        homes = _assign_to(n, ivf_model).select("vec_id", "cell")
        pairs = (
            homes.join(F.broadcast(probes), "cell")
            .filter(F.col("vec_id") != F.col("q_id"))
            .select("q_id", "vec_id")
        )
        codes = _assigned(emb, model).select("vec_id", "m", "cell")
        scored = (
            pairs.join(codes, "vec_id")
            .join(lut, ["q_id", "m", "cell"])
            .groupBy("q_id", "vec_id")
            .agg(F.sum("d2").cast("long").alias("adc_dist"))
        )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_dist",
            "rank",
        )
    )


def ivfpq_recall(
    emb: DataFrame,
    k: int = 3,
    nq: int = PQ_NQ,
) -> DataFrame:
    """Recall@k of the composed IVF-PQ index against the exact
    ground truth — the audit that closes the family (ann_recall for
    LSH, pq_recall for plain ADC, pq_rerank_recall for the refine
    step): losses here combine CELL misses (the true neighbor's
    home cell was not probed) with CODE distortion.

    r13 batch 8 (guide §2.6): all THREE independent pieces — the PQ
    training ladder, the IVF training ladder, and the exact
    ground-truth arm — run concurrently from driver threads (the
    batch-7 overlap covered the two trainings; the exact arm's corpus
    pass now back-fills the same window). Each is a pure function of
    `emb`, so the result is identical to the sequential order."""
    from .similarity import ivf_train

    prefix = _prefix_rows(emb)
    with ThreadPoolExecutor(max_workers=3) as ex:
        exact_fut = ex.submit(
            lambda: pq_exact_topk(emb, k=k, nq=nq, _prefix=prefix)
            .select("q_id", "neighbor_id")
            .localCheckpoint()
        )
        pq_fut = ex.submit(pq_train, emb, PQ_ITERS, prefix)
        try:
            ivf_model = ivf_train(emb, _prefix=prefix)
        except BaseException:
            exact_fut.cancel()
            pq_fut.cancel()
            raise
        model = pq_fut.result()
        exact = exact_fut.result()
    ap = ivfpq_topk(
        emb, k=k, nq=nq, _models=(model, ivf_model), _prefix=prefix
    ).select("q_id", "neighbor_id", F.lit(1).alias("hit"))
    return _recall_report(exact, ap)
