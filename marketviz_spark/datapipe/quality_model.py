"""Hashed-linear quality classifier — the learned-filter shape of
public LLM data pipelines, as a map-only Spark operator.

Public technique stack: the feature-hashing trick (Weinberger et
al., "Feature Hashing for Large Scale Multitask Learning", ICML'09)
under a linear bag-of-words scorer — the shape of the fastText
quality filters the public CCNet / GPT-3 / LLaMA data-pipeline
writeups describe (score each document with a small linear model,
gate on the score). The reference has no learned filter; this op
belongs to the beyond-reference training-data layer next to
``textstats.text_stats`` (which is the heuristic twin: ratios, not
a model).

The weight vector here is a DETERMINISTIC STAND-IN — bucket ``j``
gets the multiplicative-hash pseudo-weight
``(j * KNUTH_MIX) % WEIGHT_MOD - WEIGHT_OFF`` — standing exactly
where a trained coefficient array would sit. In production the
trained ``float[HASH_DIM]`` arrives as one broadcast array literal
(HASH_DIM doubles — bytes, not a table; no join) and the dataflow
is unchanged: per-token feature hash -> weight lookup -> per-doc
mean -> threshold gate. That dataflow is the part that matters at
100 TB: map-only, zero shuffles, zero UDFs — one JVM-side
projection over higher-order array expressions (plan-asserted: no
Exchange, no Python eval).

Determinism contract (DuckDB oracle parity): everything up to the
final division stays in INTEGER space — the char-sum token hash,
the bucket, and the weight (an integer in [-WEIGHT_OFF,
WEIGHT_MOD - 1 - WEIGHT_OFF], i.e. the true weight scaled by
WEIGHT_MOD) — so per-doc sums are exact and order-free. The single
double division and floor-half-up 6dp rounding then run on
IDENTICAL integers in both engines, and IEEE 754 makes one
division of equal inputs bit-equal everywhere. No summation-order
or libm dependence anywhere (the lesson of similarity.py's
``_fix_round6``: never round a float whose value depends on
reduction order).

Null/degenerate semantics follow ``textstats.text_stats``: NULL
text propagates NULL token metrics (and a 0.0 score with
keep=false); a text with no [a-z] runs at all scores 0 tokens,
weight-sum 0, score 0.0, keep=false — never a divide-by-zero under
ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# All constants are public literature values or small primes; the
# oracle SQL in registry_datapipe interpolates the SAME constants so
# the two sides cannot drift.
HASH_DIM = 256  # feature buckets; production would use 1<<20
KNUTH_MIX = 2654435761  # Knuth multiplicative-hash constant
WEIGHT_MOD = 1_000_003  # prime weight scale (weights are k/WEIGHT_MOD)
WEIGHT_OFF = WEIGHT_MOD // 2  # centers pseudo-weights near zero
LEN_MIX = 97  # folds token length into the hash
KEEP_THRESHOLD = 0.0  # gate: keep documents scoring above this


def _tokens() -> Column:
    """Lowercased [a-z]+ runs of `text` — the same normalization in
    the oracle (`regexp_split_to_array(lower(text), '[^a-z]+')` +
    empty filter), chosen because both engines agree on it exactly
    (probed: split/ascii/filter semantics are identical)."""
    return F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"),
        lambda t: t != F.lit(""),
    )


def _bucket(tok: Column) -> Column:
    """Feature hash of one token: (char-sum * MIX + len * LEN_MIX)
    mod HASH_DIM. Char-sum (not positional) keeps the fold a flat
    integer `aggregate` both engines evaluate identically; the
    length term splits the worst anagram collisions. Stand-in
    fidelity, not cryptography — the hashing-trick model it mirrors
    tolerates collisions by construction."""
    char_sum = F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc + F.ascii(c),
    )
    return (
        char_sum * F.lit(KNUTH_MIX) + F.length(tok).cast("long") * LEN_MIX
    ) % HASH_DIM


def _weight_int(tok: Column) -> Column:
    """Integer pseudo-weight of the token's bucket: the true weight
    is this value / WEIGHT_MOD, inside (-0.5, 0.5)."""
    return (_bucket(tok) * F.lit(KNUTH_MIX)) % WEIGHT_MOD - F.lit(WEIGHT_OFF)


def demo_trained_weights() -> list[float]:
    """A deterministic stand-in for a TRAINED coefficient vector —
    exercises the production ``weights=`` path end-to-end (array
    literal shipped in the task binary, `element_at` lookup,
    sequential float fold) with values distinct from the integer
    pseudo-weights so the two paths cannot be confused.

    Every weight is a dyadic rational k/2^15 (k from a Lehmer-style
    integer sequence): EXACTLY representable in binary floating
    point, so the decimal literal the DuckDB oracle parses and the
    Python float Spark ships are the same double bit-for-bit — the
    cross-engine fold then runs identical IEEE additions in
    identical order."""
    return [
        ((i * 48271 + 11) % 65537 - 32768) / 32768.0
        for i in range(HASH_DIM)
    ]


def quality_scores(
    docs: DataFrame,
    passthrough: tuple[str, ...] = (),
    weights: list[float] | None = None,
) -> DataFrame:
    """Per-document linear quality score and keep gate.

    Columns: doc_id, *passthrough, n_tokens (long), w_sum (long
    with the default pseudo-weights — exact integer weight sum, the
    auditable intermediate; double when trained `weights` are
    supplied), q_score (double — mean weight, floor-half-up at
    6dp), keep (boolean).

    ``weights`` is the production path the stand-in models: a
    trained coefficient vector of exactly HASH_DIM floats, shipped
    into the plan as ONE array literal (bytes in the task binary —
    no join, no broadcast table) and indexed per token by
    `element_at`. The per-doc sum folds the document's token array
    sequentially (`F.aggregate` is order-defined, not
    partition-order-dependent), so results stay deterministic; only
    the default integer pseudo-weights additionally guarantee the
    cross-engine order-FREE exactness the DuckDB oracle hashes.

    Scale: one narrow projection over `documents` — no shuffle, no
    UDF, no join, either path. Plan is a single codegen'd scan at
    any corpus size.
    """
    # STAGED projections: the tokenize and the token-hash fold are
    # non-cheap higher-order expressions (CodegenFallback —
    # re-evaluated per reference, never CSE'd), so each is
    # materialized as a projection column exactly once — tokens,
    # then (n_tokens, w_sum), then q_score, then keep — where a
    # single select would inline the fold four times and the
    # tokenize eight. Every staged column is referenced 2+ times
    # downstream, so CollapseProject preserves the staging (the
    # similarity.py scale lesson; plan-asserted in tests).
    toked = docs.select(
        "doc_id", *passthrough, _tokens().alias("_toks")
    )
    t = F.col("_toks")
    n = F.size(t).cast("long")
    if weights is None:
        w_sum = F.aggregate(
            F.transform(t, _weight_int),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        denom = F.col("n_tokens").cast("double") * F.lit(
            float(WEIGHT_MOD)
        )
    else:
        if len(weights) != HASH_DIM:
            raise ValueError(
                f"weights must have exactly HASH_DIM={HASH_DIM} "
                f"entries, got {len(weights)}"
            )
        arr = F.lit([float(w) for w in weights])
        w_sum = F.aggregate(
            F.transform(
                t,
                lambda tok: F.element_at(
                    arr, (_bucket(tok) + 1).cast("int")
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        denom = F.col("n_tokens").cast("double")
    # One division, then floor-half-up 6dp: the repo's standard
    # order-free rounding (cf. timeseries.py:326).
    staged = toked.select(
        "doc_id",
        *passthrough,
        n.alias("n_tokens"),
        w_sum.alias("w_sum"),
    )
    score = F.when(
        F.col("n_tokens") > 0,
        F.floor(
            F.col("w_sum").cast("double")
            * F.lit(1_000_000.0)
            / denom
            + F.lit(0.5)
        )
        / F.lit(1_000_000.0),
    ).otherwise(F.lit(0.0))
    return (
        staged.select(
            "doc_id",
            *passthrough,
            "n_tokens",
            "w_sum",
            score.alias("q_score"),
        )
        .select(
            "doc_id",
            *passthrough,
            "n_tokens",
            "w_sum",
            "q_score",
            (F.col("q_score") > F.lit(KEEP_THRESHOLD)).alias("keep"),
        )
    )


def keep_rate_by_source(docs: DataFrame) -> DataFrame:
    """Corpus acceptance report: per (source, lang) document count,
    kept count, and keep-rate — the gate summary a curation run
    logs before applying the filter.

    Scale: the gate rides the SAME scan via
    ``quality_scores(passthrough=("source", "lang"))`` (it is a
    pure column expression — joining back to a separate scoring
    frame would self-join the corpus for nothing), so this is ONE
    partial-agg shuffle on (source, lang) — low cardinality by construction
    (sources × languages), so the reduce side is tiny regardless of
    corpus size."""
    return (
        quality_scores(docs, passthrough=("source", "lang"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .withColumn(
            "keep_rate",
            F.floor(
                F.col("n_kept").cast("double")
                * F.lit(1_000_000.0)
                / F.col("n_docs").cast("double")
                + F.lit(0.5)
            )
            / F.lit(1_000_000.0),
        )
    )
