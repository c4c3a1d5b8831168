"""Corpus-trained bigram language-model scoring — the statistical-LM
quality filter family (CCNet's KenLM perplexity gate is the public
archetype) as distributed Spark passes.

Two phases, both classic shuffle shapes at 100 TB:

- **train** (`unigram_counts` / `bigram_counts`): token and
  adjacent-pair frequencies — one partial-aggregated `groupBy` each
  (map-side combine collapses the per-partition mass before the
  shuffle; keys are words/pairs, uniformly hashable, skew handled by
  AQE the same way vocab_topk's counts are).
- **score** (`doc_lm_likelihood`): every document's bigram stream
  joined against the trained counts, add-one smoothed, folded to a
  per-document mean likelihood. Joins are left to Catalyst: the
  unigram side is vocabulary-sized (often broadcastable), the
  bigram-count side grows with the corpus and must be free to stay
  a shuffled hash join.

Scoring model (add-one / Laplace smoothing):

    p(w2 | w1) = (c12 + 1) / (c1 + V)

with V = distinct unigram count. The reported ``lm_score`` is the
per-document MEAN of p over its bigram stream, floor-half-up at
6dp, plus the OOV-bigram count (c12 = 0 — unseen transitions). A
production gate would threshold log-perplexity instead of mean
likelihood; the dataflow (train counts -> join -> per-doc fold) is
identical, and mean likelihood keeps the cross-engine contract
below airtight, where per-term ``log()`` would reintroduce libm
rounding differences no oracle can hash.

Determinism contract (DuckDB oracle parity): each smoothed p is ONE
division of engine-identical integers (IEEE-exact, bit-equal in
both engines); each p is then QUANTIZED to an integer —
``floor(p * 1e15)``, one IEEE multiply plus floor, bit-identical
in both engines — and the per-document sum runs over those
integers in exact decimal arithmetic, which is order-FREE. So the
mean is bit-identical — not approximately equal — and the 6dp
floor can never straddle an engine boundary, with NO per-document
buffer: round 9 shipped this as sort_array(collect_list(...)) +
a position-ordered fold, whose per-doc aggregation buffer was
O(doc tokens) — a fat-row/OOM risk on book-length documents at
100 TB. The quantized-integer sum keeps the exactness and drops
the buffer (the quantization error, ≤1e-15 per term on a mean
later rounded at 6dp, is 9 orders of magnitude below the reported
precision).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

SMOOTH_K = 1  # add-one (Laplace); the oracle interpolates the same


def _bigram_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w1, w2) for every adjacent token pair; docs
    with fewer than 2 tokens contribute nothing. posexplode of a
    zip of the two shifted slices — no shuffle, array-local.

    The tokenize and its size are STAGED as projection columns
    (each referenced 2+ times downstream, so CollapseProject keeps
    the staging): higher-order expressions are CodegenFallback and
    re-evaluate per reference, so the unstaged form ran the
    tokenize up to 4x per row (filter + two slice bounds) — the
    same trap quality_model.py stages away, plan-asserted in
    tests."""
    toked = docs.select("doc_id", tokens().alias("_t")).select(
        "doc_id", "_t", F.size("_t").alias("_n")
    )
    pairs = F.arrays_zip(
        F.slice(F.col("_t"), 1, F.col("_n") - 1).alias("w1"),
        F.slice(F.col("_t"), 2, F.col("_n") - 1).alias("w2"),
    )
    return (
        toked.where(F.col("_n") >= 2)
        .select("doc_id", F.posexplode(pairs).alias("pos", "bg"))
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("pos"),  # 1-based like the oracle
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
        )
    )


def unigram_counts(docs: DataFrame) -> DataFrame:
    """(w, c1) corpus token frequencies — one partial-agg shuffle."""
    return (
        docs.select(F.explode(tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c1"))
    )


def bigram_counts(docs: DataFrame) -> DataFrame:
    """(w1, w2, c12) adjacent-pair frequencies — one partial-agg
    shuffle on the pair key."""
    return (
        _bigram_stream(docs)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )


def doc_lm_likelihood(
    docs: DataFrame, train_docs: DataFrame | None = None
) -> DataFrame:
    """Per-document add-one-smoothed bigram likelihood.

    Columns: doc_id, n_bigrams (long), oov_bigrams (long — unseen
    transitions), lm_score (double — mean p, floor-half-up 6dp;
    0.0 for docs with no bigram, NULL-text included).

    ``train_docs`` (default: ``docs``) is the corpus the LM is
    trained on. Training on the scored corpus itself makes
    oov_bigrams vacuously 0 (every transition was seen); a HELD-OUT
    split — train on one source slice, score everything — is the
    production cross-corpus shape, where unseen transitions and
    even unseen unigrams appear (an unseen w1 backs off to the pure
    Laplace floor p = 1/V, since c12 = c1 = 0).

    The vocabulary size V rides in as a 1-row broadcast cross join
    (the repo's scalar-bind pattern); counts joins are
    Catalyst-chosen. The per-doc sum is an order-free exact decimal
    sum of 1e15-quantized p — bit-identical across engines with no
    per-document array buffer (module docstring).
    """
    train = docs if train_docs is None else train_docs
    # r14 (guide §2.4 — remove shuffles outright): the unigram table
    # is the trained model (vocabulary-sized, the object a CCNet-
    # style gate ships with the filter), and it was consumed TWICE as
    # independent plan subtrees — once for the c1 join and once just
    # to count V — so the train corpus was scanned and tokenized
    # twice and the plan carried an extra aggregate + broadcast
    # crossJoin. One lazy localCheckpoint materializes it in the
    # count job; V becomes a driver scalar folded in as a literal
    # (the pagerank-n / pq-model collect pattern), and the c1 join
    # reads the cached table. Values are identical: V is the same
    # exact integer, and AQE still picks the join strategy from the
    # checkpoint's runtime size.
    uni = unigram_counts(train).localCheckpoint(eager=False)
    v = uni.count()
    big = bigram_counts(train)

    # V = 0 (empty training corpus) is a defined case, not an Inf:
    # no model means nothing is likely — every p is 0.0 and every
    # bigram counts as OOV. Without the guard the smoothed division
    # is 1/0.0 = +Inf and floor() semantics diverge by engine.
    stream = (
        _bigram_stream(docs)
        .join(big, ["w1", "w2"], "left")
        .join(uni, F.col("w1") == uni["w"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            (
                F.when(
                    F.lit(v > 0),
                    (
                        F.coalesce(F.col("c12"), F.lit(0))
                        + F.lit(SMOOTH_K)
                    ).cast("double")
                    / (
                        F.coalesce(F.col("c1"), F.lit(0))
                        + F.lit(SMOOTH_K) * F.lit(v)
                    ).cast("double"),
                )
                .otherwise(F.lit(0.0))
            ).alias("p"),
        )
    )
    # Order-free exact per-doc sum: quantize each p to
    # floor(p * 1e15) — a long, bit-identical in both engines — and
    # sum in decimal(38,0) (exact, never overflows a book-length
    # doc, commutative). No collect_list, no per-doc array buffer:
    # the aggregation state is two longs and a decimal regardless
    # of document length.
    per_doc = (
        stream.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("c12") == 0, 1).otherwise(0))
            .cast("long")
            .alias("oov_bigrams"),
            F.sum(
                F.floor(F.col("p") * F.lit(1e15)).cast("decimal(38,0)")
            ).alias("_psum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "oov_bigrams",
            (
                F.floor(
                    F.col("_psum").cast("double")
                    / F.lit(1_000_000_000.0)
                    / F.col("n_bigrams").cast("double")
                    + F.lit(0.5)
                )
                / F.lit(1_000_000.0)
            ).alias("lm_score"),
        )
    )
    # Docs with no bigram stream (0-1 tokens, NULL text) score 0.0
    # with zero counts — same degenerate-row convention as
    # quality_model / text_stats.
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("oov_bigrams"), F.lit(0).cast("long")).alias(
                "oov_bigrams"
            ),
            F.coalesce(F.col("lm_score"), F.lit(0.0)).alias("lm_score"),
        )
    )
