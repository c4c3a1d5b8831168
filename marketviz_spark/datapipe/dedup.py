"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the core of a 100 TB training-data pipeline.

Scale design:
- exact dedup is a single hash aggregation on the md5 fingerprint —
  the shuffle key is uniform by construction (cryptographic hash),
  so no skew; at 100 TB you'd pre-partition by fp_prefix.
- MinHash/LSH turns all-pairs O(n²) into an equi-join on band
  signatures: each doc shuffles k band keys, candidates are only
  same-bucket pairs. Bucket-count vs recall is the NUM_HASHES /
  BANDS dial.
- SimHash packs a document into one SIMHASH_BITS (32)-bit integer;
  candidate retrieval is an equi-join on 8-bit bands (pigeonhole: hamming<=3
  guarantees a shared band), verification is xor+bit_count.
- n-gram Jaccard is computed over the RARE-shingle space: shingles
  whose document frequency exceeds SHINGLE_DF_CAP are anti-joined
  away before pairing (broadcast — the over-cap list is tiny by
  Zipf) and surfaced via `shingle_overflow_keys`, the same
  refuse-and-report contract as MAX_BUCKET. A boilerplate shingle
  present in 1M docs would otherwise emit ~5e11 join rows. Both
  intersection AND set sizes use the capped space, so the ratio is
  a true Jaccard of the rare-shingle sets.
- the sketch-accuracy audit restricts the corpus to docs appearing
  in an LSH candidate pair BEFORE the exact-Jaccard join — cost is
  bounded by the candidate set, never corpus-wide.

All hashing is md5-based so every step has a bit-identical SQL
oracle (min over hex strings == a random permutation min-hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..numerics import rnd
from .textstats import tokens

NUM_HASHES = 6
BAND_SIZE = 2  # 3 bands of 2 hashes
SIMHASH_BITS = 32  # 4 bands of 8 bits; hamming<=3 => >=1 shared band
SIMHASH_BAND_BITS = 8
HEX = "0123456789abcdef"


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    representative (min) doc_id and the copy count."""
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def gram_array(t: F.Column, n: int) -> F.Column:
    """Array of ALL word n-grams (with multiplicity) over a token
    array column. `t` must be a materialized COLUMN, not the split
    expression: Catalyst does not CSE across lambda invocations, so
    an inlined split re-evaluates inside every element_at (~5x).
    Shared by shingles (distinct per doc) and the curation
    repetition counter (multiplicity kept)."""
    # Guard short docs: Spark's sequence(1, 0) produces a DESCENDING
    # [1, 0] rather than an empty list.
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    return F.when(
        F.size(t) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle)."""
    tk = docs.select("doc_id", tokens().alias("_t"))
    grams = gram_array(F.col("_t"), n)
    return (
        tk.select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-document MinHash signature: for each of NUM_HASHES seeded
    hash functions, the minimum md5(seed|shingle) over the doc's
    shingle set (min over hex strings == permutation min), plus the
    LSH band keys (concatenation of the band's hashes)."""
    sh = shingles(docs)
    # All NUM_HASHES mins in ONE aggregation pass: each seeded hash
    # is its own min() column, so the whole signature costs a single
    # shuffle on doc_id (the map side partially aggregates). An
    # explode-by-seed would multiply the shuffle NUM_HASHES-fold.
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{h}|"), F.col("shingle")))).alias(
            f"mh{h}"
        )
        for h in range(NUM_HASHES)
    ]
    per_doc = sh.groupBy("doc_id").agg(*mins)
    sig = F.concat_ws(
        "|", *[F.col(f"mh{h}") for h in range(NUM_HASHES)]
    ).alias("sig")
    bands = [
        F.concat_ws(
            "|",
            *[
                F.col(f"mh{b * BAND_SIZE + j}")
                for j in range(BAND_SIZE)
            ],
        ).alias(f"band_{b}")
        for b in range(NUM_HASHES // BAND_SIZE)
    ]
    return per_doc.select("doc_id", sig, *bands)


# Contract constant: buckets larger than this are refused by
# _bucket_pairs and surface via bucket_overflow_keys instead. Part of
# the engine's OBSERVABLE semantics — every pairing oracle in
# registry_datapipe mirrors it (HAVING count(*) <= MAX_BUCKET), so
# changing it changes query results (it was 10_000 before round 2;
# callers relying on pairs from 2k-10k buckets see them routed to the
# overflow report instead).
MAX_BUCKET = 2_000


def _bucket_pairs(
    stacked: DataFrame, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """(band, key, id[, extra]) -> distinct (a, b) pairs per bucket.

    Memory is bounded at EVERY operator, even against degenerate
    buckets (mass-duplicated boilerplate):

    - a row_number cap keeps at most max_bucket+1 rows per bucket
      BEFORE collect_list, so no unbounded array ever materializes
      (row_number streams; it buffers nothing);
    - buckets that hit the cap (size == max_bucket+1) are oversized
      and dropped — their O(b²) pairs cover content exact dedup
      already collapses; route the keys via `bucket_overflow_keys`;
    - pairs STREAM out of two chained explodes (posexplode for the
      left element, explode of the items tail for the right): the
      largest single-row object is the bucket's item array
      (≤ max_bucket elements), never the O(b²) pair set. The pair
      rows flow through whole-stage codegen a batch at a time.

    The groupBy reuses the window's (band, key) hash partitioning,
    so the whole thing still costs ONE shuffle — and the upstream
    sketch computes once (a self-join would re-evaluate its whole
    subplan per side and per band).
    """
    w = Window.partitionBy("band", "key").orderBy("item")
    capped = stacked.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_bucket + 1
    )
    buckets = (
        capped.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(F.col("item"))).alias("items"))
        .filter(
            (F.size("items") > 1) & (F.size("items") <= max_bucket)
        )
    )
    left = buckets.select("items", F.posexplode("items").alias("i", "a"))
    tail = F.slice(
        F.col("items"), F.col("i") + 2, F.size("items") - F.col("i") - 1
    )
    return left.select(F.col("a"), F.explode(tail).alias("b"))


def bucket_overflow_keys(
    stacked: DataFrame, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """The (band, key, n_items) buckets `_bucket_pairs` refuses —
    the exact-dedup routing side-channel for degenerate mass
    duplication (a 100 TB pipeline alerts on these instead of
    pairing them)."""
    return (
        stacked.groupBy("band", "key")
        .agg(F.count("*").alias("n_items"))
        .filter(F.col("n_items") > max_bucket)
    )


def lsh_candidate_pairs(
    docs: DataFrame, sigs: DataFrame | None = None
) -> DataFrame:
    """Near-duplicate candidate pairs: docs sharing any LSH band.

    Pass a precomputed `sigs` (minhash_signatures output, possibly
    checkpointed) when the caller also uses the signatures itself —
    Catalyst does not dedupe identical subplans across a self-join,
    so sharing the DataFrame avoids recomputing the shingle+minhash
    aggregation once per use.

    PRECEDENCE: when `sigs` is supplied it is authoritative and
    `docs` is not read at all — the caller must ensure `sigs` was
    derived from the same corpus (`minhash_signatures(docs)`), or
    pass only one of the two. The two-argument form exists solely to
    share an already-materialized signature plan."""
    if sigs is None:
        sigs = minhash_signatures(docs)
    n_bands = NUM_HASHES // BAND_SIZE
    stacked = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band_{b}") for b in range(n_bands)])
        ).alias("band", "key"),
    ).select("band", "key", F.col("doc_id").alias("item"))
    return (
        _bucket_pairs(stacked)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )


# Contract constant: shingles whose document frequency exceeds this
# are excluded from n-gram Jaccard pairing and surface via
# shingle_overflow_keys instead — the refuse-and-report twin of
# MAX_BUCKET. A shingle shared by b docs contributes ~b²/2 join rows,
# so an uncapped hot shingle is the verifier's quadratic blow-up.
# Part of the engine's OBSERVABLE semantics: the dedup_ngram_jaccard
# and dedup_minhash_estimate oracles mirror it (HAVING count <= cap).
SHINGLE_DF_CAP = 2_000


def _hot_shingles(sh: DataFrame, df_cap: int) -> DataFrame:
    """(shingle, n_docs) with document frequency over df_cap — the
    ONE definition of "hot" shared by the refuse path
    (_rare_shingles) and the report path (shingle_overflow_keys),
    so what is refused and what is reported can never diverge."""
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > df_cap)
    )


def _rare_shingles(sh: DataFrame, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """Drop shingles with document frequency > df_cap via a broadcast
    anti-join. The over-cap list is tiny by Zipf (boilerplate heads),
    so it broadcasts; the surviving table keeps its partitioning."""
    hot = _hot_shingles(sh, df_cap).select("shingle")
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def shingle_overflow_keys(
    docs: DataFrame, n: int = 3, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """The (shingle, n_docs) keys `ngram_jaccard_pairs` refuses —
    boilerplate so common it carries no near-dup signal. A 100 TB
    pipeline alerts on these (template/license text) instead of
    pairing them."""
    return _hot_shingles(shingles(docs, n), df_cap)


# Refuse-and-report budget for the exact verifier's TOTAL candidate
# pair space. SHINGLE_DF_CAP bounds each shingle's contribution to
# DF²/2 pairs but not the SUM over shingles: on a dense corpus (many
# shingles near the cap) Σ DF·(DF-1)/2 grows with density² even with
# every shingle under the cap — measured 33x wall-clock for a 10x
# denser corpus in the round-7 sf1 spot-run. Above the budget the
# right tool is LSH candidates + exact Jaccard on the pair list, not
# a corpus-wide self-join on any engine.
JACCARD_PAIR_BUDGET = 100_000_000


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.05,
    df_cap: int = SHINGLE_DF_CAP,
    pair_budget: int | None = JACCARD_PAIR_BUDGET,
) -> DataFrame:
    """Exact n-gram Jaccard over the rare-shingle space: shingles
    with document frequency > df_cap are removed first (see
    SHINGLE_DF_CAP), then pairs sharing >=1 surviving shingle get
    integer intersection/union arithmetic; only the final ratio is a
    (deterministic) double division. Set sizes count surviving
    shingles too, so the ratio is a true Jaccard of the capped sets.

    Before the self-join launches, the exact candidate-pair count
    Σ DF·(DF-1)/2 over surviving shingles is checked against
    ``pair_budget`` — refuse-and-report like the other caps, because
    df_cap alone does not bound the total pair space on dense
    corpora (the sf1 spot-run measured 33x wall with every per-key
    cap green). The estimate costs one extra LINEAR pass (a shingle
    DF aggregate to one driver row) — the price of never launching
    a density-quadratic join.

    NOTE — EAGER when ``pair_budget`` is set (the default): the
    budget check runs a Spark action (``.first()`` on the DF
    aggregate) at CALL time, so this function triggers a job — and
    can raise — during plan construction, unlike the rest of the
    module's lazy plan builders. Callers composing pipelines that
    must stay lazy until execution should pass ``pair_budget=None``
    (uncapped, plan-only) and enforce the budget themselves at the
    point they choose to execute.

    The capped shingle table is consumed four times (sizes, both
    self-join sides, and the DF computation feeding the cap);
    Catalyst re-derives unshared subplans, so it is lazily
    localCheckpoint'ed — the shingle inverted index IS the artifact
    a substring-dedup pipeline persists (bucketed by shingle at
    100 TB), so materializing it once is the production dataflow,
    not a local trick.
    """
    raw = shingles(docs, n)
    if pair_budget is not None:
        # One DF aggregation serves BOTH the budget estimate and the
        # hot-shingle cap: checkpoint the (shingle, n_docs) table —
        # far smaller than the doc_id x shingle table the pipeline
        # already checkpoints below — so the eager .first() that
        # materializes it leaves the hot-list scan free.
        dfs = (
            raw.groupBy("shingle")
            .agg(F.count("*").alias("n_docs"))
            .localCheckpoint(eager=False)
        )
        est = (
            dfs.filter(F.col("n_docs") <= df_cap)
            .agg(
                F.sum(
                    F.col("n_docs") * (F.col("n_docs") - 1) / 2
                ).alias("_pairs")
            )
            .first()["_pairs"]
        )
        if est is not None and est > pair_budget:
            raise ValueError(
                f"ngram_jaccard_pairs: {int(est)} candidate pairs "
                f"from the surviving shingle space, above "
                f"pair_budget={pair_budget}; a corpus-wide exact "
                "self-join at this density is quadratic work even "
                "with every shingle under df_cap. Generate "
                "candidates with lsh_candidate_pairs / "
                "simhash_pairs first and verify Jaccard on that "
                "pair list, or raise pair_budget explicitly."
            )
        hot = dfs.filter(F.col("n_docs") > df_cap).select("shingle")
        sh = raw.join(
            F.broadcast(hot), "shingle", "left_anti"
        ).localCheckpoint(eager=False)
    else:
        sh = _rare_shingles(raw, df_cap).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    j = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            rnd(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


# Exact-substring duplicate detection (the char-level complement of
# word-shingle Jaccard; cf. "Deduplicating Training Data Makes
# Language Models Better"-style substring dedup): fixed-width char
# windows at a stride, hashed and grouped. Stride trades fidelity
# for row count (stride 1 = full suffix coverage at |text| rows/doc;
# stride 10 bounds the explode at ~|text|/10 rows/doc).
SUBSTR_K = 40
SUBSTR_STRIDE = 10


def substring_dup_spans(
    docs: DataFrame, k: int = SUBSTR_K, stride: int = SUBSTR_STRIDE
) -> DataFrame:
    """Char windows of width `k` at `stride` offsets that appear in
    >= 2 distinct documents — the span-level duplication report.

    Scale shape: one map-side explode (bounded by n_chars/stride
    rows per doc) into ONE hash aggregation on the window hash (md5
    — uniform key space, no skew). The output is GROUPED, never
    paired, so a window shared by b docs costs b rows, not b² —
    duplication this op exists to find can't blow it up. rep_doc_id
    and min_pos are independent minima (deterministic tie-break).
    """
    n = F.length("text")
    npos = (F.floor((n - k) / F.lit(stride)) + 1).cast("int")
    w = (
        docs.filter(n >= k)
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), npos - 1)).alias("i"),
        )
        .select(
            "doc_id",
            (F.col("i") * stride + 1).cast("bigint").alias("pos"),
            F.md5(
                F.expr(f"substring(text, CAST(i * {stride} + 1 AS INT), {k})")
            ).alias("h"),
        )
    )
    return (
        w.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
            F.min("doc_id").alias("rep_doc_id"),
            F.min("pos").alias("min_pos"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def simhash(docs: DataFrame) -> DataFrame:
    """SIMHASH_BITS-bit SimHash over token frequencies.

    bit b of md5(token) is extracted with integer nibble arithmetic
    (no engine-specific bit functions), summed as +1/-1 across all
    token instances; simhash = Σ (sum_b > 0) << b. Exact integer
    arithmetic end-to-end."""
    tok = docs.select(
        "doc_id", F.explode(tokens()).alias("tok")
    ).withColumn(
        "h4", F.substring(F.md5("tok"), 1, SIMHASH_BITS // 4)
    )
    aggs = []
    for b in range(SIMHASH_BITS):
        mask = 2 ** (b % 4)
        bit = F.expr(
            f"((instr('{HEX}', substring(h4, {b // 4 + 1}, 1)) - 1)"
            f" DIV {mask}) % 2"
        )
        contrib = F.when(bit == 1, 1).otherwise(-1)
        aggs.append(F.sum(contrib).alias(f"s{b}"))
    sums = tok.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of 4 8-bit
    bands (pigeonhole guarantees recall at hamming<=3), verified with
    xor + bit_count."""
    s = simhash(docs)
    # Stack the band keys from ONE simhash evaluation; the bucket
    # items carry (doc_id, simhash) structs so verification needs no
    # join back.
    band_mod = 2**SIMHASH_BAND_BITS
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    stacked = s.select(
        F.struct("doc_id", "simhash").alias("item"),
        F.posexplode(
            F.array(
                *[
                    (
                        (F.col("simhash") / (band_mod**band)).cast("long")
                        % band_mod
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    ).select("band", "key", "item")
    pairs = _bucket_pairs(stacked).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sh_a"),
        F.col("b.simhash").alias("sh_b"),
    ).distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _min_label_components(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components by iterative min-label propagation over
    `pairs` (doc_a, doc_b) with node set `nodes` (doc_id): every node
    gets the minimum doc_id of its component as cluster_id (isolated
    nodes are their own cluster).

    The canonical Spark iterative algorithm shape: a driver loop of
    joins with a checkpoint per round to truncate lineage (without it
    the plan doubles every iteration). Each round does (a) the
    neighbor-min propagation and (b) POINTER DOUBLING — every label
    is itself a node id, so shortcutting each node's label through
    its label's current label halves the remaining label distance.
    Convergence is O(log diameter) rounds, not O(diameter): a chain
    of 10⁶ docs (mass-duplication graphs produce exactly these)
    converges in ~20 rounds where plain min-label needs 10⁶.

    `reliable_checkpoint=True` uses `DataFrame.checkpoint` (requires
    `spark.sparkContext.setCheckpointDir` on fault-tolerant storage)
    so a lost executor replays from the checkpoint instead of
    re-deriving rounds; localCheckpoint (the default, fine for
    local/interactive) stores blocks on executors and dies with
    them. Both paths are semantically identical.
    """
    if max_iter < 1:
        raise ValueError(
            f"max_iter must be >= 1, got {max_iter}: zero rounds "
            "cannot certify convergence"
        )

    def ckpt(df: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = ckpt(
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"),
                F.col("doc_a").alias("doc_b"),
            )
        )
    )
    labels = ckpt(
        nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels, edges["doc_b"] == labels["doc_id"], "inner"
            )
            .groupBy("doc_a")
            .agg(F.min("cluster_id").alias("n_min"))
        )
        propagated = ckpt(
            labels.join(
                neighbor_min,
                labels["doc_id"] == neighbor_min["doc_a"],
                "left",
            ).select(
                "doc_id",
                F.col("cluster_id").alias("old_cluster"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("n_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # Pointer doubling: cluster_id is always some node's doc_id
        # (labels start as ids and only move by min over ids), so
        # re-labeling through the label's own label compresses two
        # hops into one — this is what turns O(diameter) rounds into
        # O(log diameter). `propagated` is checkpointed first so the
        # self-join reads the materialized table twice instead of
        # recomputing the edge join. The `moved` flag rides along so
        # the convergence count is a filter over this round's
        # checkpoint, not another labels join.
        parent = propagated.select(
            F.col("doc_id").alias("p_id"),
            F.col("cluster_id").alias("p_lbl"),
        )
        new_lbl = F.least(
            F.col("x.cluster_id"),
            F.coalesce(F.col("p_lbl"), F.col("x.cluster_id")),
        )
        updated = ckpt(
            propagated.alias("x")
            .join(parent, F.col("x.cluster_id") == F.col("p_id"), "left")
            .select(
                F.col("x.doc_id").alias("doc_id"),
                new_lbl.alias("cluster_id"),
                (new_lbl != F.col("x.old_cluster")).alias("moved"),
            )
        )
        changed = updated.filter("moved").count()
        labels = updated.select("doc_id", "cluster_id")
        if changed == 0:
            break
    else:
        # Refuse-and-report, like MAX_BUCKET/SHINGLE_DF_CAP: labels
        # that stopped moving only because the iteration budget ran
        # out are NOT converged components — silently returning them
        # would let duplicate representatives through dedup_apply.
        # Components are tiny by bucket-cap construction, so hitting
        # this means pathological chaining; fail loudly.
        raise RuntimeError(
            f"connected components did not converge in {max_iter} "
            f"rounds ({changed} labels still moving); raise max_iter "
            "or investigate the near-dup graph's diameter"
        )
    return labels


def _star_components(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iter: int = 25,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components by LARGE-STAR / SMALL-STAR alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the scale path that replaced `_min_label_components`
    in the dedup end-game queries.

    Why this beats min-label + pointer doubling here: each
    alternation is TWO groupBy passes over the (shrinking) edge set
    only — no join against the node-label table — and converges in
    O(log² n) rounds worst-case, a handful in practice. Min-label
    carries a full node-size label table through 3 jobs per round;
    on the sf0.1 multimodal graph (diameter 34) that was 12 rounds ×
    3 jobs, vs ~5 alternations × 2 jobs for the stars.

    One alternation:
    - large-star: around every node c, link every LARGER neighbor x
      to m = min(Γ(c) ∪ {c}). Strictly height-reducing.
    - small-star: orient every edge large→small; around every node u
      link its smaller neighbors and u itself to m = min(Γ⁻(u) ∪ {u}).
    Both only ever create edges WITHIN a component (each new edge
    (x, m) replaces a path x–c–…–m), so over-merge is impossible by
    construction; at the fixed point the edge set is exactly one
    star per component, centered at its minimum id.

    Each star is ONE window-min shuffle (min over partitionBy), not
    a groupBy + join back: at 100 TB the per-node min table is a
    full node-table that could never broadcast, so the join form
    costs two wide shuffles per star where the window costs one.

    Termination is a structural test, not a fingerprint: a canonical
    (u > v) edge set is a fixed point of both stars IFF it forms
    disjoint stars — every child u has exactly ONE parent v and no
    node appears on both sides (canonical orientation then forces
    each root below all its children, i.e. min-rooted). That is one
    cheap aggregation per alternation and needs no extra confirm
    round. On top of it an EXACT end certificate — no original edge
    may cross two labels and every cluster_id must be its group's
    min doc_id — refuses-and-reports (RuntimeError) if the budget
    runs out or the proof fails, same contract as MAX_BUCKET /
    SHINGLE_DF_CAP: unconverged labels must never leak into
    dedup_apply.

    Output matches `_min_label_components`: (doc_id, cluster_id)
    for every node in `nodes`, isolated nodes labelled themselves.
    """
    if max_iter < 1:
        raise ValueError(
            f"max_iter must be >= 1, got {max_iter}: zero rounds "
            "cannot certify convergence"
        )

    def ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
        if reliable_checkpoint:
            # reliable checkpoints stay eager: non-eager RDD
            # checkpointing recomputes the lineage a second time to
            # write the checkpoint files
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=eager)

    # r14 (guide §2.6 — the CC loop is driver-job-latency bound, ~2
    # jobs per alternation of sub-second stages): the LOOP
    # checkpoints are LAZY (eager=False), so the bookkeeping action
    # that immediately follows each — the star-forest probe / the
    # orig isEmpty — both MATERIALIZES the checkpoint and answers
    # the test in ONE job instead of a materialize job plus a probe
    # job. This is only safe where the materializing action reads
    # the frame through ONE branch (the probe was restructured to a
    # single-read explode for exactly that reason); the final label
    # table stays EAGER because the certificate reads it through
    # three projections at once. Local checkpoint blocks persist as
    # they compute; Spark's post-job fill-in covers any reduce
    # partitions a take-style probe skipped.

    # Canonical orientation u > v; self-loops add nothing.
    orig = ckpt(
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .distinct(),
        eager=False,
    )

    def alternate(e: DataFrame) -> DataFrame:
        # large-star: symmetrize to (center c, neighbor x); link
        # every x > c to m = min(Γ(c) ∪ {c}). x > c >= m keeps the
        # output canonical. No distinct here — the small-star's
        # trailing distinct re-canonicalizes the alternation output,
        # and the duplicate factor in between (common-neighbor
        # count) is bounded by the LSH bucket cap.
        sym = e.select(
            F.col("u").alias("c"), F.col("v").alias("x")
        ).unionByName(e.select(F.col("v").alias("c"), F.col("u").alias("x")))
        ls = (
            sym.withColumn(
                "m",
                F.least(F.col("c"), F.min("x").over(Window.partitionBy("c"))),
            )
            .filter(F.col("x") > F.col("c"))
            .select(F.col("x").alias("u"), F.col("m").alias("v"))
        )
        # small-star: edges are oriented large→small already; link u
        # and each smaller neighbor v to m = min(Γ⁻(u) ∪ {u}) = min(v)
        # (skip the v == m self-link). u > m and v >= m keep the
        # output canonical.
        wm = ls.withColumn("m", F.min("v").over(Window.partitionBy("u")))
        return (
            wm.select("u", F.col("m").alias("v"))
            .unionByName(
                wm.filter(F.col("v") != F.col("m")).select(
                    F.col("v").alias("u"), F.col("m").alias("v")
                )
            )
            .distinct()
        )

    def is_star_forest(e: DataFrame) -> bool:
        # Fixed-point test: each child has exactly one parent and
        # the child / parent node sets are disjoint. One light
        # shuffle over 2·|E| single-column rows. The roles stream is
        # ONE read of `e` exploded into two rows per edge (r14) —
        # the former two-branch union read the edge frame twice,
        # which was free against an eagerly-cached checkpoint but
        # would make this probe (the LAZY checkpoint's materializing
        # action) compute every alternation partition twice
        # concurrently.
        roles = e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u").alias("node"),
                        F.lit(1).alias("child"),
                        F.lit(0).alias("parent"),
                    ),
                    F.struct(
                        F.col("v").alias("node"),
                        F.lit(0).alias("child"),
                        F.lit(1).alias("parent"),
                    ),
                )
            ).alias("r")
        ).select("r.node", "r.child", "r.parent")
        bad = (
            roles.groupBy("node")
            .agg(
                F.max("child").alias("c"),
                F.max("parent").alias("p"),
                F.sum("child").alias("n_parents"),
            )
            .filter(
                (F.col("c") == 1)
                & ((F.col("p") == 1) | (F.col("n_parents") > 1))
            )
        )
        return bad.isEmpty()

    edges = orig
    converged = orig.isEmpty()  # no edges: every node is isolated
    if not converged:
        for _ in range(max_iter):
            # lazy checkpoint + probe = one job per alternation
            edges = ckpt(alternate(edges), eager=False)
            if is_star_forest(edges):
                converged = True
                break
    if not converged:
        raise RuntimeError(
            f"star components did not converge in {max_iter} "
            "alternations; raise max_iter or investigate the "
            "near-dup graph"
        )

    # At the fixed point `edges` is (member u -> component min v);
    # roots and isolated nodes label themselves.
    labels = (
        nodes.select("doc_id")
        .join(edges, nodes["doc_id"] == edges["u"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("v"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    # EAGER (unlike the loop checkpoints): the certificate reads
    # labels through three projections (la, lb, offmin) in one job —
    # a lazy cut would recompute the nodes⋈edges join concurrently
    # per branch instead of reading cache.
    labels = ckpt(labels)

    # EXACT convergence certificate (the fingerprint loop is
    # probabilistic): one job, two violation shapes unioned —
    # (a) an original edge whose endpoints carry different labels
    # (under-merge / premature stop), (b) a label group whose
    # cluster_id is not its min doc_id (a star centered off-min).
    la = labels.select(
        F.col("doc_id").alias("u"), F.col("cluster_id").alias("lbl_a")
    )
    lb = labels.select(
        F.col("doc_id").alias("v"), F.col("cluster_id").alias("lbl_b")
    )
    cross = (
        orig.join(la, "u")
        .join(lb, "v")
        .filter(F.col("lbl_a") != F.col("lbl_b"))
        .select(F.lit("cross-label edge").alias("what"))
    )
    offmin = (
        labels.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("mn"))
        .filter(F.col("mn") != F.col("cluster_id"))
        .select(F.lit("non-min cluster_id").alias("what"))
    )
    # isEmpty (a LIMIT-1 probe, no driver collect) is the whole
    # happy path; the per-shape diagnosis runs only when raising.
    if not cross.unionByName(offmin).isEmpty():
        what = (
            "cross-label edge" if not cross.isEmpty()
            else "non-min cluster_id"
        )
        raise RuntimeError(
            f"star components certificate failed ({what}); "
            "labels are not a converged min-id component assignment"
        )
    return labels


def dedup_clusters(
    docs: DataFrame, max_iter: int = 20, reliable_checkpoint: bool = False
) -> DataFrame:
    """Connected components over the LSH near-dup graph — the dedup
    end-game: keep one representative per cluster_id."""
    return _star_components(
        docs.select("doc_id"),
        lsh_candidate_pairs(docs),
        max_iter=max_iter,
        reliable_checkpoint=reliable_checkpoint,
    )


def dedup_apply(
    docs: DataFrame, max_iter: int = 20, reliable_checkpoint: bool = False
) -> DataFrame:
    """Materialize the DEDUPED corpus — the end product the report
    queries exist for: exactly one representative (the min-doc_id
    member, i.e. the doc whose id equals its cluster_id) survives
    per near-dup cluster; isolated docs survive as their own
    cluster. Output carries the content fingerprint so the oracle
    hash-verifies WHICH text survived, not just which ids.

    Scale: the label table is one row per doc; the representative
    filter is a map-side predicate on it, and the corpus join is a
    left-semi on doc_id (uniform key). At 100 TB this is the query
    you'd write as the final INSERT INTO curated_corpus."""
    labels = dedup_clusters(
        docs, max_iter=max_iter, reliable_checkpoint=reliable_checkpoint
    )
    reps = labels.filter(
        F.col("doc_id") == F.col("cluster_id")
    ).select("doc_id")
    return docs.join(reps, "doc_id", "left_semi").select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("fp"),
    )


def dedup_clusters_multi(
    docs: DataFrame,
    emb: DataFrame,
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components over the UNION of the text near-dup graph
    (MinHash-LSH candidate pairs) and the embedding-cosine near-dup
    graph (multi-table hyperplane LSH + cosine verify) — the full
    dedup end-game for a multimodal corpus: two docs land in one
    cluster if they look alike in EITHER modality. vec_id is the
    document's embedding id (shared id space), so edges union by
    doc id; the node set is docs ∪ embedded docs, keeping
    vector-only ids clusterable too.

    Scale: each edge source is its own capped bucket-join pipeline
    (one shuffle each); the union itself adds no shuffle — the one
    normalization shuffle is _star_components' canonical distinct.
    """
    from .similarity import embedding_near_pairs

    text_edges = lsh_candidate_pairs(docs)
    emb_edges = embedding_near_pairs(emb).select("doc_a", "doc_b")
    nodes = (
        docs.select("doc_id")
        .unionByName(emb.select(F.col("vec_id").alias("doc_id")))
        .distinct()
    )
    return _star_components(
        nodes,
        text_edges.unionByName(emb_edges),
        max_iter=max_iter,
        reliable_checkpoint=reliable_checkpoint,
    )


# Incremental-ingest dedup: which slice of doc_ids plays the role of
# the "incoming batch" in the demo query.
INCOMING_MOD = 4


def bow_fingerprint() -> F.Column:
    """Bag-of-words content fingerprint: md5 of the sorted distinct
    token set. Coarser than the exact/normalized fingerprints in
    textstats — reordered or internally-repeated copies of the same
    vocabulary collide, which is the granularity an ingest gate
    wants."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens())), " ")
    )


def incremental_dedup(docs: DataFrame) -> DataFrame:
    """Dedup an incoming batch against the existing corpus without
    ever joining corpus-vs-corpus: fingerprint both sides, collapse
    the existing side to one representative per fingerprint (min
    doc_id), left-join the incoming batch on the fingerprint.

    Scale: the existing side's groupBy and the join are both keyed
    by md5 output — uniform by construction. At 100 TB the collapsed
    fingerprint index is what you'd persist (bucketed by fp) so
    each nightly batch joins against it co-located, with no rescan
    of the raw corpus.
    """
    fp = bow_fingerprint()
    incoming = docs.filter(F.col("doc_id") % INCOMING_MOD == 0).select(
        "doc_id", fp.alias("fp")
    )
    existing = docs.filter(F.col("doc_id") % INCOMING_MOD != 0).select(
        F.col("doc_id").alias("ex_id"), fp.alias("fp")
    )
    index = existing.groupBy("fp").agg(F.min("ex_id").alias("dup_of"))
    return incoming.join(index, "fp", "left").select(
        "doc_id",
        "fp",
        "dup_of",
        F.col("dup_of").isNull().alias("is_new"),
    )


def minhash_jaccard_estimate(
    docs: DataFrame, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Sketch-accuracy audit: for every LSH candidate pair, the
    MinHash Jaccard ESTIMATE (fraction of matching signature
    positions — the unbiased estimator the sketch exists for) next
    to the exact n-gram Jaccard, with their absolute error.

    This is the measurement a pipeline uses to size NUM_HASHES: at
    100 TB you audit a sample of candidate pairs, not all pairs,
    but the dataflow is identical — signatures join in (doc-keyed,
    uniform), the estimate is a per-row array comparison, and the
    exact-Jaccard side is RESTRICTED to docs appearing in a
    candidate pair (left-semi join) BEFORE its shingle self-join
    runs, so the expensive verifier's cost is bounded by the
    candidate set, never the corpus. The shingle DF cap is then
    computed within that subset — the oracle mirrors both steps.

    CONTRACT NOTE: because the DF cap is evaluated on the candidate
    SUBSET, a shingle hot corpus-wide but rare among candidate docs
    survives here while the standalone `ngram_jaccard_pairs` (run on
    the full corpus) would drop it — this audit's "exact" Jaccard is
    subset-relative and intentionally NOT comparable row-for-row with
    the standalone verifier's output. To audit against corpus-wide
    rare-shingle Jaccard instead, join this output's pairs to
    `ngram_jaccard_pairs(docs, threshold=0.0)` (cost then scales with
    the corpus, not the candidate set).

    The two SMALL intermediates consumed more than once — per-doc
    signatures (used by the pairing, both estimate sides, and the
    candidate restriction) and the candidate pairs (used three
    times) — are lazily localCheckpoint'ed: Catalyst does not dedupe
    identical subplans, so without this the shingle+minhash
    aggregation runs ~4x. At 100 TB these are exactly the artifacts
    a pipeline persists (one row per doc / per candidate pair); the
    big shingle table is never materialized.
    """
    sigs = minhash_signatures(docs).localCheckpoint(eager=False)
    pairs = lsh_candidate_pairs(docs, sigs=sigs).localCheckpoint(
        eager=False
    )
    sig = sigs.select("doc_id", F.split("sig", "[|]").alias("mins"))
    pa = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("mins").alias("mins_a")
    )
    pb = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("mins").alias("mins_b")
    )
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.join(cand_ids, "doc_id", "left_semi")
    exact = ngram_jaccard_pairs(
        cand_docs, threshold=0.0, df_cap=df_cap
    ).select("doc_a", "doc_b", "jaccard")
    matches = F.size(
        F.filter(
            F.zip_with(
                F.col("mins_a"), F.col("mins_b"), lambda x, y: x == y
            ),
            lambda b: b,
        )
    )
    est = rnd(matches / F.lit(float(NUM_HASHES)), 6)
    # LEFT join + coalesce(jaccard, 0): a candidate pair whose only
    # shared shingles are over the DF cap has NO verifier row, but
    # its Jaccard in the rare-shingle space is exactly 0 — and
    # est~1/true=0 boilerplate collisions are precisely the sketch
    # error this audit exists to expose. An inner join would
    # silently drop them and understate the error.
    jac = F.coalesce(F.col("jaccard"), F.lit(0.0))
    return (
        pairs.join(pa, "doc_a")
        .join(pb, "doc_b")
        .join(exact, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_jaccard"),
            jac.alias("jaccard"),
            rnd(F.abs(est - jac), 6).alias("abs_err"),
        )
    )


def cluster_size_histogram(docs: DataFrame) -> DataFrame:
    """The headline dedup report: distribution of near-dup cluster
    sizes. Per size: how many clusters, how many documents they
    hold, and how many of those are redundant (size - 1 per
    cluster — the docs dedup_apply would drop). Size-1 rows count
    the unique mass, so the histogram partitions the corpus exactly.

    Scale: rides dedup_clusters' capped-bucket + pointer-doubling
    labels; then two partial-aggregated shuffles — cluster_id
    (uniform: cluster sizes are bounded by the bucket caps upstream)
    and the tiny size-keyed rollup.
    """
    labels = dedup_clusters(docs)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("dup_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
# Local Algorithms for Document Fingerprinting", SIGMOD'03; the MOSS
# algorithm). A dedup family the shingle/minhash/simhash tiers don't
# cover: POSITIONAL substring fingerprints with a guarantee — any
# shared substring of length >= WINNOW_K + WINNOW_W - 1 chars is
# caught by at least one shared fingerprint, while storing only
# ~2/(W+1) of the k-gram hashes.
# ---------------------------------------------------------------------------

WINNOW_K = 8  # char k-gram size
WINNOW_W = 4  # winnowing window (in k-gram positions)
_WINNOW_B = 257  # polynomial base
_WINNOW_M = 2_147_483_647  # 2^31-1; keeps the fold inside a long


def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): the DISTINCT winnowed fingerprint set of every
    document — min k-gram hash per sliding window of WINNOW_W
    consecutive positions.

    Shape: stage the code-point array, EXPLODE the k-gram start
    positions to rows across a Generate barrier, hash each k-gram
    as a flat unrolled polynomial over `element_at` on the
    materialized array column, then take the window min with a
    per-document ROWS frame and distinct the survivors.

    Why the Generate barrier (hard-won): the array-local form —
    `transform(sequence(1, n), i -> poly(element_at(_cs, i+k)))`
    over a staged `_cs` — gets its staging DESTROYED by
    CollapseProject, because references inside a lambda body are
    not counted by the collapse rule's non-cheap-reference check
    (the similarity.py staging lesson only protects TOP-LEVEL
    references). The inlined plan re-split the whole text per
    polynomial term — jstack showed StringSplit under Remainder —
    for ~K * n_grams redundant tokenizations per document, minutes
    for 500 small docs. A Generate cannot be collapsed through, so
    downstream projections see `_cs` as a materialized attribute
    (cheap to reference 8 times), not an inlinable expression.

    The mod in the hash fold keeps astral codepoints from
    overflowing a long; both engines evaluate the identical
    integer arithmetic, and substring/ascii are code-point based
    in both (probed incl. astral + combining chars).

    Scale: the explode is a corpus-character-scale narrow stream
    (the LM bigram stream's class); the window min costs ONE
    per-doc_id shuffle; the downstream groupBy(fp) is the only
    other wide stage, on uniform hash keys.
    """
    codes = F.transform(
        F.split(F.col("text"), ""),
        lambda c: F.ascii(c).cast("long"),
    )
    toked = docs.select("doc_id", codes.alias("_cs")).select(
        "doc_id", "_cs", F.size("_cs").alias("_n")
    )
    n_grams = F.col("_n") - F.lit(WINNOW_K) + 1
    g = (
        toked.where(F.col("_n") >= WINNOW_K + WINNOW_W - 1)
        .select(
            "doc_id",
            "_cs",
            n_grams.alias("_ng"),
            F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
        )
    )
    h = F.element_at(F.col("_cs"), F.col("pos").cast("int"))
    for k in range(1, WINNOW_K):
        h = (
            h * _WINNOW_B
            + F.element_at(
                F.col("_cs"), (F.col("pos") + k).cast("int")
            )
        ) % _WINNOW_M
    hashed = g.select(
        "doc_id",
        "pos",
        (F.col("_ng") - F.lit(WINNOW_W) + 1).alias("_nw"),
        h.alias("_h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    return (
        hashed.withColumn("fp", F.min("_h").over(w))
        .filter(F.col("pos") <= F.col("_nw"))
        .select("doc_id", "fp")
        .distinct()
    )


def winnowing_shared_report(docs: DataFrame) -> DataFrame:
    """Cross-document winnowing report: fingerprints appearing in
    >= 2 documents, with the document count and min-id
    representative — the dedup_exact-shaped output (bounded by the
    fingerprint domain, never a pair set).

    Scale: ONE partial-aggregated groupBy on the uniform fp key;
    a hot boilerplate fingerprint produces one wide row, not a
    quadratic pair space."""
    fps = winnowing_fingerprints(docs)
    return (
        fps.groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )
