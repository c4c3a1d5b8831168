"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token
counting, and document fingerprinting over the `documents` table —
all pure built-in-function column expressions (JVM codegen, no
Python in the hot path), so they scale linearly with a map-only
plan: no shuffle at all for per-document features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..numerics import rnd

# Tiny demonstration stopword lists; the operator is the thing, the
# lists are config.
STOPWORDS_EN = ["the", "a", "of", "and", "to"]
STOPWORDS_ES = ["el", "la", "de", "y", "que"]
STOPWORDS_DE = ["der", "die", "das", "und", "zu"]


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokens with empties dropped (texts may carry
    trailing separators)."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


# GPT-2-style pretokenizer, simplified to the RE2/Java-regex common
# subset (no lookahead): contractions, space-prefixed letter runs,
# digit runs, punctuation runs, residual whitespace. Alternation
# order matters and both engines match leftmost-first, so counts are
# engine-identical.
BPE_PATTERN = r"'(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_tokens(text_col: str = "text") -> Column:
    """BPE-ish pretokens (the unit an LLM tokenizer would merge
    within) — a whole different count than whitespace words for
    punctuation/number-heavy text."""
    return F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_PATTERN), F.lit(0)
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace vs BPE-ish token counts per document, plus the
    ratio an LLM-cost estimator would use. Map-only, JVM regex."""
    ws = F.size(tokens()).cast("long")
    bpe = F.size(
        F.filter(bpe_tokens(), lambda t: F.trim(t) != "")
    ).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        rnd(bpe / F.greatest(ws, F.lit(1).cast("long")), 6).alias(
            "bpe_per_word"
        ),
    )


def _hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast(
        "long"
    )


def text_stats(docs: DataFrame) -> DataFrame:
    """Token count, char stats, stopword ratio, quality score.

    Degenerate rows every crawl corpus contains have DEFINED,
    engine-identical semantics: NULL text propagates NULL metrics;
    zero-token text (empty/whitespace-only) gets NULL for the
    per-token ratios (no tokens to average) and quality 0.0 — and
    never a divide-by-zero under ANSI mode (the bug this guard
    fixed, caught by the null-parity test)."""
    t = tokens()
    n_tok = F.size(t).cast("long")
    has_tok = F.col("n_tokens") > 0
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_ratio = F.col("_stop_hits") / F.col("n_tokens")
    quality = rnd(
        F.least(F.lit(1.0), F.col("n_tokens") / 100.0)
        * (1.0 - stop_ratio),
        6,
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        sum_len.alias("sum_token_chars"),
        _hits(t, STOPWORDS_EN).alias("_stop_hits"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_chars_computed",
        "sum_token_chars",
        F.when(has_tok, F.col("sum_token_chars") / F.col("n_tokens"))
        .alias("avg_token_len"),
        F.when(has_tok, stop_ratio).alias("stopword_ratio"),
        F.when(has_tok, quality)
        .when(F.col("n_tokens") == 0, F.lit(0.0))
        .alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID with a fixed priority tiebreak
    (en > es > de). A real pipeline would swap in char-n-gram
    profiles; the dataflow is identical."""
    t = tokens()
    en, es, de = (
        _hits(t, STOPWORDS_EN),
        _hits(t, STOPWORDS_ES),
        _hits(t, STOPWORDS_DE),
    )
    predicted = (
        F.when((en >= es) & (en >= de), F.lit("en"))
        .when(es >= de, F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        en.alias("en_hits"),
        es.alias("es_hits"),
        de.alias("de_hits"),
        predicted.alias("predicted_lang"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Exact and whitespace-normalized md5 fingerprints plus a short
    prefix key (the bucketing key for a distributed dedup shuffle)."""
    norm = F.array_join(tokens(), " ")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp_md5"),
        F.md5(norm).alias("fp_norm_md5"),
        F.substring(F.md5(F.col("text")), 1, 8).alias("fp_prefix"),
    )


MERGE_TOPK = 50


def merge_pair_topk(docs: DataFrame, k: int = MERGE_TOPK) -> DataFrame:
    """Top-K adjacent-token-pair merge candidates — the counting
    step of ONE BPE merge iteration (the pair a tokenizer trainer
    would fuse next), over whitespace tokens. A full BPE train
    iterates this; one distributed iteration is the engine-shaped
    piece, and its output ranks the corpus's strongest collocations.

    Scale: pair extraction is map-only (zip_with over two shifted
    slices — no explode-then-self-join); the count is a two-phase
    groupBy whose map-side combine absorbs hot-pair skew; top-K is
    TakeOrdered (no global sort), and the rank window runs over the
    K-row result only.
    """
    t = tokens()
    pairs_col = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pr = docs.select(F.explode(pairs_col).alias("pair"))
    counts = pr.groupBy("pair").agg(
        F.count("*").cast("long").alias("n_occ")
    )
    top = counts.orderBy(F.desc("n_occ"), F.asc("pair")).limit(k)
    w = Window.orderBy(F.desc("n_occ"), F.asc("pair"))
    return top.select(
        "pair",
        "n_occ",
        F.row_number().over(w).cast("int").alias("rank"),
    )


# ----------------------------------------------------------------------
# Bigram collocations by integer lift
# ----------------------------------------------------------------------

COLL_MIN_SUPPORT = 3  # bigram must occur >= 3 times corpus-wide


def collocations(docs: DataFrame, min_support: int = COLL_MIN_SUPPORT) -> DataFrame:
    """Corpus-wide bigram collocations scored by integer lift:

        lift(a b) = c(ab) * N / (c(a) * c(b))   (ppm-truncated)

    — the float-free stand-in for PMI (same argmax ordering, no
    engine-divergent log). Token-instance counts, not document
    frequencies, so "of the" scores low and real collocations high.

    Scale: one explode + two-phase groupBy per grain (map-side
    partial aggregation absorbs hot tokens like 'the' before any
    exchange — the vocab_topk discipline); unigram counts attach by
    two vocab-keyed equi-joins (NOT a forced broadcast: vocabulary
    at 100 TB does not fit, AQE may still choose one when it does);
    the product runs in DECIMAL(38,0) so c(ab)*N*1e6 cannot
    overflow int64 at real corpus sizes."""
    from .dedup import gram_array

    tk = docs.select("doc_id", tokens().alias("_t"))
    # Single-split guard (standing pitfall #2): a small corpus
    # arrives as 1-2 parquet splits and the explode+partial-agg
    # would run at that parallelism; widen BEFORE the explode.
    sc = docs.sparkSession.sparkContext
    if tk.rdd.getNumPartitions() < sc.defaultParallelism:
        tk = tk.repartition(sc.defaultParallelism, "doc_id")
    uni = (
        tk.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c_w"))
    )
    n1 = uni.agg(F.sum("c_w").cast("long").alias("n_tokens"))
    big = (
        tk.select(F.explode(gram_array(F.col("_t"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= min_support)
        .select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
            "c_ab",
        )
    )
    dec = "decimal(38,0)"
    return (
        big.join(
            uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")),
            "w2",
        )
        .crossJoin(F.broadcast(n1))
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                f"CAST((CAST(c_ab AS {dec}) * CAST(n_tokens AS {dec})"
                f" * 1000000) div (CAST(c_a AS {dec})"
                f" * CAST(c_b AS {dec})) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def collocations_oracle_sql(
    toks_cte: str, min_support: int = COLL_MIN_SUPPORT
) -> str:
    return f"""
WITH {toks_cte},
uni AS MATERIALIZED (
    SELECT w, CAST(count(*) AS BIGINT) AS c_w
    FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
), n1 AS (
    SELECT CAST(sum(c_w) AS BIGINT) AS n_tokens FROM uni
), big AS (
    SELECT g, CAST(count(*) AS BIGINT) AS c_ab
    FROM (
        SELECT unnest(CASE WHEN len(t) >= 2 THEN
            list_transform(range(1, len(t)),
                i -> t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)])
            ELSE CAST([] AS VARCHAR[]) END) AS g
        FROM toks
    ) GROUP BY g
    HAVING count(*) >= {min_support}
)
SELECT split_part(g, ' ', 1) AS w1,
       split_part(g, ' ', 2) AS w2,
       c_ab, ua.c_w AS c_a, ub.c_w AS c_b,
       CAST((CAST(c_ab AS HUGEINT) * CAST(n_tokens AS HUGEINT)
             * 1000000)
            // (CAST(ua.c_w AS HUGEINT) * CAST(ub.c_w AS HUGEINT))
            AS BIGINT) AS lift_ppm
FROM big
JOIN uni ua ON ua.w = split_part(g, ' ', 1)
JOIN uni ub ON ub.w = split_part(g, ' ', 2)
CROSS JOIN n1"""
