"""Registry entries for the training-data-pipeline operators
(dedup, text analysis, similarity search, multimodal plumbing).

Imported by registry.py for its side effects. Oracle SQL for the
hash-heavy operators (simhash, LSH) is generated programmatically
from the same constants as the Spark implementations, so both sides
stay in lockstep by construction.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tables
from .datapipe import dedup, lm, pq, quality_model
from .datapipe.dedup import (
    BAND_SIZE,
    HEX,
    NUM_HASHES,
    SIMHASH_BITS,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from .datapipe.multimodal import payload_features, to_media
from .datapipe.similarity import (
    EMB_DIM,
    LSH_BUCKET_CANDIDATE_CAP,
    N_HYPERPLANES,
    cosine_topk,
    hyperplane_lsh_topk,
)
from .datapipe.textstats import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_ES,
    fingerprints,
    lang_id,
    text_stats,
)
from .registry import register

def _docs(
    spark: SparkSession, sf_dir: str, fan: bool = True
) -> DataFrame:
    """documents scan widened to cluster parallelism (tables.fan_out,
    guide §2.5): every consumer tokenizes/hashes/shingles per row,
    which a single-row-group local file would otherwise run on one
    core. No-op at real scale (scan splits >= parallelism).

    ``fan=False`` for the consumers whose per-row work is too light
    to amortize the local widening shuffle (measured r13: the
    fanned form cost dedup_exact 1.69x / corpus_source_report 1.58x
    isolated vs baseline while the tokenize/hash-heavy consumers
    gained 16-76%); identical results either way."""
    d = tables.load(spark, sf_dir, "documents")
    return tables.fan_out(d) if fan else d


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings scan, widened like _docs: the per-row work above it
    (hyperplane projections, subvector quantization, norm folds) is
    the expensive part of every similarity/PQ plan."""
    return tables.fan_out(tables.load(spark, sf_dir, "embeddings"))


# Shared SQL fragments -------------------------------------------------


def _materialize(sql: str, names: tuple[str, ...]) -> str:
    """Mark the named CTEs ``AS MATERIALIZED`` in a composed oracle.

    DuckDB's CTE inlining re-evaluates a CTE once PER REFERENCE, so a
    multiply-referenced chain (e.g. the minhash-estimate oracle's
    pairs -> stacked -> sigs, where _BAND_STACK alone references sigs
    once per band) compounds multiplicatively — at sf1 the unmarked
    version spilled past the disk. Applied per-query so the shared
    CTE constants stay engine-neutral text."""
    for n in names:
        pat = rf"\b{n} AS \("
        hits = len(re.findall(pat, sql))
        if hits != 1:
            # ValueError (not assert): under `python -O` an assert
            # vanishes and a renamed/duplicated CTE would silently
            # skip the mark, regressing the oracle to the documented
            # sf1 multiplicative-inlining spill with no error.
            raise ValueError(
                f"_materialize: CTE {n!r} matched {hits} times "
                f"(want exactly 1) in oracle starting {sql[:80]!r}"
            )
        sql = re.sub(pat, f"{n} AS MATERIALIZED (", sql)
    return sql

TOKS_CTE = """
toks AS (
    SELECT doc_id, text, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
)
"""

SHINGLES_CTE = """
sh AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(
               generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM toks
    WHERE len(t) >= 3
)
"""


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ----------------------------------------------------------------------
# Text analysis
# ----------------------------------------------------------------------


@register(
    "text_stats",
    f"WITH {TOKS_CTE}"
    + f"""
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           CASE WHEN t IS NULL THEN NULL
                ELSE CAST(coalesce(
                    list_sum(list_transform(t, x -> length(x))), 0)
                    AS BIGINT) END
               AS sum_token_chars,
           CASE WHEN len(t) > 0 THEN
               CAST(list_sum(list_transform(t, x -> length(x)))
                    AS BIGINT) / CAST(len(t) AS BIGINT)
           END AS avg_token_len,
           CASE WHEN len(t) > 0 THEN
               len(list_filter(t, x -> list_contains(
                   {_sql_list(STOPWORDS_EN)}, x))) / len(t)
           END AS stopword_ratio,
           CASE WHEN len(t) > 0 THEN
               floor(least(1.0, len(t) / 100.0)
                     * (1.0 - len(list_filter(t, x -> list_contains(
                           {_sql_list(STOPWORDS_EN)}, x))) / len(t))
                     * 1000000.0 + 0.5) / 1000000.0
           WHEN len(t) = 0 THEN 0.0
           END AS quality_score
    FROM toks
    """,
    survey="text quality scoring + token counting (datapipe)",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(_docs(spark, sf_dir))


@register(
    "text_token_bpe",
    f"WITH {TOKS_CTE}"
    + r"""
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_ws_tokens,
           CAST(len(list_filter(regexp_extract_all(text,
               '''(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
               x -> trim(x) <> '')) AS BIGINT) AS n_bpe_tokens,
           floor(CAST(len(list_filter(regexp_extract_all(text,
               '''(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
               x -> trim(x) <> '')) AS BIGINT)
               / greatest(CAST(len(t) AS BIGINT), 1)
               * 1000000.0 + 0.5) / 1000000.0 AS bpe_per_word
    FROM toks
    """,
    survey="BPE-ish regex token counting (LLM cost estimator, datapipe)",
)
def q_text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.textstats import token_counts

    return token_counts(_docs(spark, sf_dir))




@register(
    "text_langid",
    f"WITH {TOKS_CTE}"
    + f"""
    SELECT doc_id, lang AS declared_lang,
           CAST(len(list_filter(t, x -> list_contains(
               {_sql_list(STOPWORDS_EN)}, x))) AS BIGINT) AS en_hits,
           CAST(len(list_filter(t, x -> list_contains(
               {_sql_list(STOPWORDS_ES)}, x))) AS BIGINT) AS es_hits,
           CAST(len(list_filter(t, x -> list_contains(
               {_sql_list(STOPWORDS_DE)}, x))) AS BIGINT) AS de_hits,
           CASE WHEN len(list_filter(t, x -> list_contains(
                        {_sql_list(STOPWORDS_EN)}, x)))
                     >= greatest(
                        len(list_filter(t, x -> list_contains(
                            {_sql_list(STOPWORDS_ES)}, x))),
                        len(list_filter(t, x -> list_contains(
                            {_sql_list(STOPWORDS_DE)}, x))))
                THEN 'en'
                WHEN len(list_filter(t, x -> list_contains(
                        {_sql_list(STOPWORDS_ES)}, x)))
                     >= len(list_filter(t, x -> list_contains(
                        {_sql_list(STOPWORDS_DE)}, x)))
                THEN 'es' ELSE 'de'
           END AS predicted_lang
    FROM toks
    """,
    survey="language identification heuristic (datapipe)",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


@register(
    "text_fingerprints",
    f"WITH {TOKS_CTE}"
    + """
    SELECT doc_id,
           md5(text) AS fp_md5,
           -- coalesce: DuckDB array_to_string([]) is NULL while
           -- Spark array_join([]) is '' — a token-less doc's
           -- normalized fingerprint is md5('') on both engines
           -- (total, never-null; r7 fuzzer)
           md5(coalesce(array_to_string(t, ' '), '')) AS fp_norm_md5,
           substring(md5(text), 1, 8) AS fp_prefix
    FROM toks
    """,
    survey="document fingerprinting (datapipe)",
)
def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(_docs(spark, sf_dir))


@register(
    "bpe_merge_pairs",
    f"WITH {TOKS_CTE},"
    + """
    pr AS (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1])) AS pair
        FROM toks WHERE len(t) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(row_number() OVER (ORDER BY count(*) DESC, pair)
                AS INT) AS rank
    FROM pr GROUP BY pair
    ORDER BY n_occ DESC, pair
    LIMIT 50
    """,
    survey="BPE merge-candidate mining: corpus-wide adjacent-pair counts, one distributed tokenizer-training iteration (datapipe)",
)
def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.textstats import merge_pair_topk

    return merge_pair_topk(_docs(spark, sf_dir))


# Winnowing fingerprints (dedup.py WINNOW_*). Engine-identical by
# construction: substring/length/ascii are code-point based in both
# engines (probed incl. astral + combining chars), the polynomial
# fold is exact modular integer arithmetic, and the short-text
# guard keeps Spark's descending sequence(1,0) quirk out of play.
_WINNOW_SQL = f"""
    WITH win_h AS (
        SELECT doc_id,
               CASE WHEN length(text) - {dedup.WINNOW_K} + 1 >= 1 THEN
                   list_transform(
                       generate_series(1, length(text) - {dedup.WINNOW_K} + 1),
                       i -> list_reduce(
                           list_transform(
                               string_split(
                                   substring(text, i, {dedup.WINNOW_K}), ''),
                               c -> CAST(ascii(c) AS BIGINT)),
                           (a, c) -> (a * {dedup._WINNOW_B} + c)
                                     % {dedup._WINNOW_M}))
               ELSE [] END AS hs
        FROM documents WHERE text IS NOT NULL
    ),
    win_f AS (
        SELECT DISTINCT doc_id, fp
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(hs) - {dedup.WINNOW_W} + 1),
                       j -> list_min(hs[j:j + {dedup.WINNOW_W} - 1])))
                       AS fp
            FROM win_h WHERE len(hs) >= {dedup.WINNOW_W}
        )
    )
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS rep_doc_id
    FROM win_f GROUP BY fp HAVING count(*) >= 2
    """


@register(
    "dedup_winnowing",
    _WINNOW_SQL,
    survey="winnowing positional fingerprints (Schleimer/MOSS SIGMOD'03): shared >= K+W-1-char substrings guaranteed caught, ~2/(W+1) storage (datapipe)",
)
def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.winnowing_shared_report(
        _docs(spark, sf_dir)
    )


# Hashed-linear quality classifier (quality_model.py). The oracle
# interpolates the SAME module constants as the Spark side, and the
# score stays in integer space until one final division + floor-6dp
# on identical integers — order-free by construction (see the
# module docstring's determinism contract).
_QM_CTES = f"""
qtok AS (
    SELECT doc_id, source, lang,
           list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                       t -> t <> '') AS t
    FROM documents
),
qsum AS (
    SELECT doc_id, source, lang,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN t IS NULL THEN NULL
                     WHEN len(t) = 0 THEN 0
                ELSE list_sum(list_transform(t, tok ->
                    ((((list_sum(list_transform(string_split(tok, ''),
                            c -> ascii(c))) * {quality_model.KNUTH_MIX}
                        + length(tok) * {quality_model.LEN_MIX})
                       % {quality_model.HASH_DIM})
                      * {quality_model.KNUTH_MIX})
                     % {quality_model.WEIGHT_MOD})
                    - {quality_model.WEIGHT_OFF}))
                END AS BIGINT) AS w_sum
    FROM qtok
),
qscore AS (
    SELECT doc_id, source, lang, n_tokens, w_sum,
           CASE WHEN n_tokens > 0 THEN
               floor(CAST(w_sum AS DOUBLE) * 1000000.0
                     / (CAST(n_tokens AS DOUBLE)
                        * {float(quality_model.WEIGHT_MOD)}) + 0.5)
               / 1000000.0
           ELSE 0.0 END AS q_score
    FROM qsum
)
"""


# Bigram-LM likelihood scoring (datapipe/lm.py). Every smoothed p
# is one division of engine-identical integers; each p is then
# quantized — floor(p * 1e15), one IEEE multiply + floor,
# bit-identical in both engines — and the per-doc sum runs over
# those integers in exact arithmetic (Spark decimal(38,0), DuckDB
# hugeint), which is order-FREE: lm_score is bit-identical with no
# per-document list buffer on either side (round 10; the previous
# position-ordered list fold buffered O(doc tokens) per group).
# The CTE block is GENERATED per training slice so the
# self-trained and held-out queries share one oracle definition;
# an empty training slice is a defined case (V = 0 -> every p 0.0,
# every bigram OOV), not an engine-divergent Inf.


def _lm_ctes(train_where: str) -> str:
    return f"""
lm_tr AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents WHERE {train_where}
),
lm_uni AS (
    SELECT w, CAST(count(*) AS BIGINT) AS c1
    FROM (SELECT unnest(t) AS w FROM lm_tr) GROUP BY w
),
lm_vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM lm_uni),
lm_big AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
    FROM (
        SELECT t[pos] AS w1, t[pos + 1] AS w2
        FROM (
            SELECT unnest(generate_series(1, len(t) - 1)) AS pos, t
            FROM lm_tr WHERE len(t) >= 2
        )
    ) GROUP BY w1, w2
),
lm_pairs AS (
    SELECT doc_id, pos, t[pos] AS w1, t[pos + 1] AS w2
    FROM (
        SELECT doc_id,
               unnest(generate_series(1, len(t) - 1)) AS pos, t
        FROM toks WHERE len(t) >= 2
    )
),
lm_p AS (
    SELECT d.doc_id, d.pos,
           coalesce(b.c12, 0) AS c12,
           CASE WHEN v.v > 0 THEN
               CAST(coalesce(b.c12, 0) + {lm.SMOOTH_K} AS DOUBLE)
                 / CAST(coalesce(u.c1, 0) + {lm.SMOOTH_K} * v.v
                        AS DOUBLE)
           ELSE 0.0 END AS p
    FROM lm_pairs d
    LEFT JOIN lm_big b USING (w1, w2)
    LEFT JOIN lm_uni u ON d.w1 = u.w
    CROSS JOIN lm_vocab v
),
lm_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS oov_bigrams,
           sum(CAST(floor(p * 1e15) AS HUGEINT)) AS psum
    FROM lm_p GROUP BY doc_id
)
"""


_LM_SELECT = """
    SELECT d.doc_id,
           CAST(coalesce(l.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(l.oov_bigrams, 0) AS BIGINT) AS oov_bigrams,
           coalesce(floor(CAST(l.psum AS DOUBLE)
                          / 1000000000.0
                          / CAST(l.n_bigrams AS DOUBLE) + 0.5)
                    / 1000000.0, 0.0) AS lm_score
    FROM documents d LEFT JOIN lm_doc l USING (doc_id)
    """


@register(
    "lm_doc_likelihood",
    f"WITH {TOKS_CTE}, {_lm_ctes('TRUE')}" + _LM_SELECT,
    survey="corpus-trained bigram-LM likelihood scoring (CCNet-shape statistical-LM filter, datapipe)",
)
def q_lm_doc_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm.doc_lm_likelihood(_docs(spark, sf_dir))


@register(
    "lm_heldout_score",
    "WITH "
    + TOKS_CTE
    + ", "
    + _lm_ctes("source = 'src0'")
    + _LM_SELECT,
    survey="held-out bigram-LM scoring: train on the source='src0' seed slice, score the whole corpus — the cross-corpus shape where OOV transitions (~20% at sf0.01) and unseen-unigram Laplace backoff are real, not vacuous (datapipe)",
)
def q_lm_heldout_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-corpus LM: trained on the src0 slice only, scoring
    everything — documents far from the seed distribution surface
    as low lm_score / high oov_bigrams, the filter CCNet runs with
    a Wikipedia-trained KenLM over Common Crawl. The self-trained
    twin (`lm_doc_likelihood`) has a vacuously-zero OOV channel;
    this split exercises it for real (~20% OOV at sf0.01). The
    empty-train V=0 convention (p=0.0, all-OOV) is pinned by a
    dedicated unit test with a corpus containing no src0 docs."""
    docs = _docs(spark, sf_dir)
    return lm.doc_lm_likelihood(
        docs, train_docs=docs.filter(F.col("source") == "src0")
    )


@register(
    "quality_classifier",
    f"WITH {_QM_CTES}"
    + """
    SELECT doc_id, n_tokens, w_sum, q_score, q_score > 0.0 AS keep
    FROM qscore
    """,
    survey="hashed-linear quality classifier scoring (fastText/CCNet-shape learned filter, datapipe)",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_model.quality_scores(
        _docs(spark, sf_dir)
    )


# Trained-weights twin of the quality classifier: the SAME token
# hash buckets, but the weight lookup is element_at into a float
# coefficient array literal (the production fastText-shape path).
# Every demo weight is a dyadic rational k/2^15 — exactly
# representable in binary floating point — so the decimal literals
# below parse to bit-identical doubles in both engines, and both
# sides fold the per-token weights SEQUENTIALLY in token order
# (Spark F.aggregate left fold from 0.0; DuckDB list_reduce over a
# 0.0-prepended list): identical IEEE additions in identical order,
# hash-exact with no integer detour.
_QT_WEIGHTS_SQL = (
    "CAST(["
    + ", ".join(repr(w) for w in quality_model.demo_trained_weights())
    + "] AS DOUBLE[])"
)

_QT_CTES = f"""
qtok AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                       t -> t <> '') AS t
    FROM documents
),
qtw AS (SELECT {_QT_WEIGHTS_SQL} AS w),
qtsum AS (
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CASE WHEN t IS NULL THEN NULL
                WHEN len(t) = 0 THEN 0.0
           ELSE list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(t, tok -> qtw.w[CAST(
                       ((list_sum(list_transform(string_split(tok, ''),
                               c -> ascii(c))) * {quality_model.KNUTH_MIX}
                         + length(tok) * {quality_model.LEN_MIX})
                        % {quality_model.HASH_DIM}) + 1 AS INT)])),
               (x, y) -> x + y)
           END AS w_sum
    FROM qtok CROSS JOIN qtw
),
qtscore AS (
    SELECT doc_id, n_tokens, w_sum,
           CASE WHEN n_tokens > 0 THEN
               floor(w_sum * 1000000.0
                     / CAST(n_tokens AS DOUBLE) + 0.5)
               / 1000000.0
           ELSE 0.0 END AS q_score
    FROM qtsum
)
"""


@register(
    "quality_classifier_trained",
    f"WITH {_QT_CTES}"
    + """
    SELECT doc_id, n_tokens, w_sum, q_score, q_score > 0.0 AS keep
    FROM qtscore
    """,
    survey="hashed-linear quality classifier, TRAINED-coefficient path: float weight array shipped as one literal, element_at lookup, sequential fold (datapipe)",
)
def q_quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_model.quality_scores(
        _docs(spark, sf_dir),
        weights=quality_model.demo_trained_weights(),
    )


@register(
    "quality_keep_rate",
    f"WITH {_QM_CTES}"
    + """
    SELECT source, lang, n_docs, n_kept,
           floor(CAST(n_kept AS DOUBLE) * 1000000.0
                 / CAST(n_docs AS DOUBLE) + 0.5) / 1000000.0 AS keep_rate
    FROM (
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN q_score > 0.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM qscore GROUP BY source, lang
    )
    """,
    survey="quality-gate acceptance report by (source, lang) (datapipe)",
)
def q_quality_keep_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_model.keep_rate_by_source(
        _docs(spark, sf_dir)
    )


# ----------------------------------------------------------------------
# Deduplication
# ----------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS fp,
           CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    survey="exact dedup via hash-groupBy (datapipe)",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_docs(spark, sf_dir, fan=False))


_MINHASH_CTES = (
    f"WITH {TOKS_CTE}, {SHINGLES_CTE}, "
    + f"""
    hashed AS (
        SELECT doc_id, h,
               md5(CAST(h AS VARCHAR) || '|' || shingle) AS hv
        FROM sh, (SELECT unnest(generate_series(0, {NUM_HASHES - 1})) AS h)
    ), mins AS (
        SELECT doc_id, h, min(hv) AS mh FROM hashed GROUP BY 1, 2
    ), sigs AS (
        SELECT doc_id, string_agg(mh, '|' ORDER BY h) AS sig
        FROM mins GROUP BY 1
    )
    """
)

_N_BANDS = NUM_HASHES // BAND_SIZE

_BAND_COLS = ", ".join(
    "string_split(sig, '|')["
    + "] || '|' || string_split(sig, '|')[".join(
        str(b * BAND_SIZE + j + 1) for j in range(BAND_SIZE)
    )
    + f"] AS band_{b}"
    for b in range(_N_BANDS)
)


@register(
    "dedup_minhash_signatures",
    _MINHASH_CTES
    + f"SELECT doc_id, sig, {_BAND_COLS} FROM sigs",
    survey="MinHash signatures + LSH band keys (datapipe)",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(_docs(spark, sf_dir))


_BAND_STACK = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, string_split(sig, '|')[{b * BAND_SIZE + 1}]"
    f" || '|' || string_split(sig, '|')[{b * BAND_SIZE + 2}] AS key FROM sigs"
    for b in range(_N_BANDS)
)

from .datapipe.dedup import MAX_BUCKET  # noqa: E402

# Engine contract: buckets larger than MAX_BUCKET are refused by
# _bucket_pairs (degenerate mass duplication routes to the overflow
# report instead of O(b²) pairing). Every pairing oracle mirrors the
# cap so Spark and DuckDB stay identical on data WITH an over-cap
# bucket, not just on fixtures without one.
_OK_BUCKETS = f"""
    ok AS (
        SELECT band, key FROM stacked
        GROUP BY band, key
        HAVING count(*) <= {MAX_BUCKET}
    )"""

_CAPPED_PAIRS = (
    _OK_BUCKETS
    + """,
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM stacked a
        JOIN ok ON ok.band = a.band AND ok.key = a.key
        JOIN stacked b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )"""
)


@register(
    "dedup_lsh_pairs",
    _MINHASH_CTES
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS}
    SELECT doc_a, doc_b FROM pairs
    """,
    survey="LSH near-dup candidate pairs (datapipe)",
)
def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs(_docs(spark, sf_dir))


@register(
    "dedup_bucket_overflow",
    _MINHASH_CTES
    + f""", stacked AS ({_BAND_STACK})
    SELECT band, key, CAST(count(*) AS BIGINT) AS n_items
    FROM stacked
    GROUP BY band, key
    HAVING count(*) > 2
    """,
    survey="LSH bucket overflow report (degenerate-dup routing, datapipe)",
)
def q_dedup_bucket_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-dedup routing side-channel as a first-class query:
    buckets larger than the pairing cap (set to 2 here so the
    fixture exercises the path; production uses dedup.MAX_BUCKET).
    """
    from .datapipe.dedup import (
        BAND_SIZE,
        NUM_HASHES,
        bucket_overflow_keys,
        minhash_signatures,
    )

    sigs = minhash_signatures(_docs(spark, sf_dir))
    n_bands = NUM_HASHES // BAND_SIZE
    stacked = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band_{b}") for b in range(n_bands)])
        ).alias("band", "key"),
    ).select("band", "key", F.col("doc_id").alias("item"))
    return bucket_overflow_keys(stacked, max_bucket=2)


from .datapipe.dedup import SHINGLE_DF_CAP  # noqa: E402

# Engine contract (mirrors dedup.SHINGLE_DF_CAP): shingles with
# document frequency over the cap are excluded from Jaccard pairing
# AND from the per-doc set sizes — the rare-shingle space — so Spark
# and DuckDB stay identical on data WITH a boilerplate shingle, not
# just on fixtures without one.
_RARE_SHINGLES = f"""
    ok_sh AS (
        SELECT shingle FROM sh
        GROUP BY shingle HAVING count(*) <= {SHINGLE_DF_CAP}
    ),
    shr AS (SELECT sh.* FROM sh JOIN ok_sh USING (shingle))"""


@register(
    "dedup_ngram_jaccard",
    f"WITH {TOKS_CTE}, {SHINGLES_CTE}, {_RARE_SHINGLES},"
    + """
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY 1),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM shr a JOIN shr b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           floor(n_common / (sa.n_sh + sb.n_sh - n_common)
                 * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE floor(n_common / (sa.n_sh + sb.n_sh - n_common)
                * 1000000.0 + 0.5) / 1000000.0 >= 0.05
    """,
    survey="n-gram Jaccard near-dup verification over the DF-capped rare-shingle space (datapipe)",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.05
    )


@register(
    "dedup_shingle_overflow",
    f"WITH {TOKS_CTE}, {SHINGLES_CTE}"
    + """
    SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs
    FROM sh
    GROUP BY shingle
    HAVING count(*) > 2
    """,
    survey="shingle DF-cap overflow report (boilerplate routing, datapipe)",
)
def q_dedup_shingle_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verifier's refuse-and-report side-channel as a first-class
    query: shingles over the pairing DF cap (set to 2 here so the
    fixture exercises the path; production uses dedup.SHINGLE_DF_CAP).
    """
    from .datapipe.dedup import shingle_overflow_keys

    return shingle_overflow_keys(
        _docs(spark, sf_dir), df_cap=2
    )


from .datapipe.dedup import SUBSTR_K, SUBSTR_STRIDE  # noqa: E402


@register(
    "dedup_substring_spans",
    f"""
    WITH w AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, (length(text) - {SUBSTR_K}) // {SUBSTR_STRIDE} + 1),
                   i -> CAST((i - 1) * {SUBSTR_STRIDE} + 1 AS BIGINT))) AS pos,
               unnest(list_transform(
                   generate_series(1, (length(text) - {SUBSTR_K}) // {SUBSTR_STRIDE} + 1),
                   i -> md5(substr(text, (i - 1) * {SUBSTR_STRIDE} + 1, {SUBSTR_K})))) AS h
        FROM documents
        WHERE length(text) >= {SUBSTR_K}
    )
    SELECT h,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ,
           CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
           min(pos) AS min_pos
    FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    """,
    survey="exact-substring duplicate spans: strided char-window hashing, grouped report (datapipe)",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.dedup import substring_dup_spans

    return substring_dup_spans(_docs(spark, sf_dir))


def _simhash_sql() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN ((instr('{HEX}', substring(h4, {b // 4 + 1}, 1)) - 1)"
        f" // {2 ** (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return (
        f"WITH {TOKS_CTE}, "
        + f"""
        tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        h AS (SELECT doc_id, substring(md5(tok), 1, {SIMHASH_BITS // 4}) AS h4 FROM tok),
        sums AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
        """,
        f"SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM sums",
    )


_SIMHASH_CTES, _SIMHASH_SELECT = _simhash_sql()


@register(
    "dedup_simhash",
    _SIMHASH_CTES + _SIMHASH_SELECT,
    survey="SimHash document sketches (datapipe)",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir))


from .datapipe.dedup import SIMHASH_BAND_BITS  # noqa: E402

_SIMHASH_BAND_MOD = 2**SIMHASH_BAND_BITS
_SIMHASH_BAND_STACK = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {band} AS band,"
    f" (simhash // {_SIMHASH_BAND_MOD ** band}) % {_SIMHASH_BAND_MOD}"
    " AS key FROM s"
    for band in range(SIMHASH_BITS // SIMHASH_BAND_BITS)
)


@register(
    "dedup_simhash_pairs",
    _SIMHASH_CTES
    + f", s AS ({_SIMHASH_SELECT}), stacked AS ({_SIMHASH_BAND_STACK}), "
    + _OK_BUCKETS
    + """,
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM stacked a
        JOIN ok ON ok.band = a.band AND ok.key = a.key
        JOIN stacked b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
    survey="SimHash near-dup pairs via 4-bit bands (datapipe)",
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# Similarity search over embeddings
# ----------------------------------------------------------------------

_VEC_CTE = """
v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
)
"""


@register(
    "emb_cosine_topk",
    f"WITH {_VEC_CTE}"
    + """
    , pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               floor(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                     * 1000000.0 + 0.5) / 1000000.0
                   AS cosine
        FROM v a JOIN v b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM pairs
    )
    WHERE rank <= 5
    """,
    survey="brute-force cosine top-k ANN baseline (datapipe)",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_emb(spark, sf_dir), k=5)


@register(
    "decontam_embedding",
    f"WITH {_VEC_CTE}"
    + """
    , ev AS (
        SELECT vec AS ev_v, nrm AS ev_n FROM v WHERE vec_id % 50 = 0
    ), pairs AS (
        -- LEFT JOIN ON TRUE, not a cross join: an empty eval slice
        -- must yield every corpus row all-clean, mirroring the
        -- engine's broadcast left join.
        SELECT c.vec_id, e.label,
               floor(list_dot_product(c.vec, ev.ev_v)
                     / (c.nrm * ev.ev_n) * 1000000.0 + 0.5)
                   / 1000000.0 AS cos
        FROM v c
        JOIN embeddings e ON e.vec_id = c.vec_id
        LEFT JOIN ev ON TRUE
        WHERE c.vec_id % 50 <> 0
    )
    SELECT vec_id, CAST(label AS INT) AS label,
           CAST(sum(CASE WHEN cos >= 0.35 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_eval_hits,
           max(cos) AS max_eval_cosine,
           sum(CASE WHEN cos >= 0.35 THEN 1 ELSE 0 END) > 0
               AS contaminated
    FROM pairs GROUP BY vec_id, label
    """,
    survey="embedding-space decontamination vs a broadcast benchmark set: semantic leakage the exact-shingle decontaminate misses (datapipe curation)",
)
def q_decontam_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.similarity import embedding_decontaminate

    return embedding_decontaminate(
        _emb(spark, sf_dir)
    )


def _table_key_sql(t: int, bits: int) -> str:
    """bits-bit sign-bucket key of hyperplane table t — planes
    h = t*bits + j with the same md5-derived weights the Spark side
    uses (similarity._plane_sign)."""
    projs = []
    for j in range(bits):
        h = t * bits + j
        sign = (
            f"CASE WHEN (instr('{HEX}', substring(md5("
            f"'{h}-' || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 0"
            " THEN 1.0 ELSE -1.0 END"
        )
        proj = (
            "list_sum(list_transform("
            f"generate_series(0, {EMB_DIM - 1}),"
            f" d -> ({sign}) * vec[d + 1]))"
        )
        projs.append(f"CASE WHEN ({proj}) > 0.0 THEN {2 ** j} ELSE 0 END")
    return " + ".join(projs)


def _lsh_bucket_sql() -> str:
    projs = []
    for h in range(N_HYPERPLANES):
        sign = (
            f"CASE WHEN (instr('{HEX}', substring(md5("
            f"'{h}-' || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 0"
            " THEN 1.0 ELSE -1.0 END"
        )
        proj = (
            "list_sum(list_transform("
            f"generate_series(0, {EMB_DIM - 1}),"
            f" d -> ({sign}) * vec[d + 1]))"
        )
        projs.append(f"CASE WHEN ({proj}) > 0.0 THEN {2 ** h} ELSE 0 END")
    return " + ".join(projs)


def _emb_pair_ctes() -> str:
    """CTE chain ev→estacked→eok→ecand→epairs(doc_a, doc_b, cosine):
    embedding near-dup pairs, e-prefixed so the chain composes with
    the minhash CTEs (which own the names stacked/ok/pairs) in the
    multimodal clusters oracle."""
    from .datapipe.similarity import (
        EMB_TABLES,
        EMB_TABLE_BITS,
        NEAR_DUP_COSINE,
    )

    tables_sql = "\n    UNION ALL\n".join(
        f"    SELECT {t} AS tbl, CAST({_table_key_sql(t, EMB_TABLE_BITS)}"
        " AS BIGINT) AS key, vec_id, vec, nrm FROM ev"
        for t in range(EMB_TABLES)
    )
    return f"""
    ev AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ), estacked AS (
{tables_sql}
    ), eok AS (
        SELECT tbl, key FROM estacked
        GROUP BY tbl, key
        HAVING count(*) <= {MAX_BUCKET}
    ), ecand AS (
        SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM estacked a
        JOIN eok ON eok.tbl = a.tbl AND eok.key = a.key
        JOIN estacked b
          ON a.tbl = b.tbl AND a.key = b.key AND a.vec_id < b.vec_id
    ), epairs AS (
        SELECT doc_a, doc_b, cosine FROM (
            SELECT c.doc_a, c.doc_b,
                   floor(list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm)
                         * 1000000.0 + 0.5) / 1000000.0 AS cosine
            FROM ecand c
            JOIN ev x ON x.vec_id = c.doc_a
            JOIN ev y ON y.vec_id = c.doc_b
        )
        WHERE cosine >= {NEAR_DUP_COSINE}
    )"""


def _near_dup_oracle() -> str:
    return (
        "WITH "
        + _emb_pair_ctes()
        + "\n    SELECT doc_a, doc_b, cosine FROM epairs"
    )


@register(
    "dedup_embedding_pairs",
    _near_dup_oracle(),
    survey="embedding-cosine near-dup pairs (multi-table LSH, datapipe)",
)
def q_dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.similarity import embedding_near_pairs

    return embedding_near_pairs(_emb(spark, sf_dir))


@register(
    "emb_lsh_topk",
    f"WITH {_VEC_CTE}"
    + f""", bucketed AS (
        SELECT vec_id, vec, nrm,
               CAST({_lsh_bucket_sql()} AS BIGINT) AS bucket
        FROM v
    ), cand AS (
        -- candidate-side bucket cap, interpolated from
        -- similarity.LSH_BUCKET_CANDIDATE_CAP (first cap members of
        -- each bucket by vec_id; sf buckets stay far below this)
        SELECT vec_id, vec, nrm, bucket FROM (
            SELECT *, row_number() OVER (
                PARTITION BY bucket ORDER BY vec_id
            ) AS brn FROM bucketed
        ) WHERE brn <= {LSH_BUCKET_CANDIDATE_CAP}
    ), pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               floor(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                     * 1000000.0 + 0.5) / 1000000.0
                   AS cosine
        FROM bucketed a JOIN cand b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM pairs
    )
    WHERE rank <= 3
    """,
    survey="hyperplane-LSH bucketed ANN (scale path, datapipe)",
)
def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hyperplane_lsh_topk(_emb(spark, sf_dir), k=3)


# ----------------------------------------------------------------------
# Multimodal plumbing (binary payload + pandas-UDF feature extraction)
# ----------------------------------------------------------------------


@register(
    "mm_payload_features",
    # first_byte is the first UTF-8 BYTE (hex-nibble arithmetic on
    # the encode()d blob), matching the Spark side's payload[0] —
    # ascii() would return the first CODE POINT and diverge on
    # non-ASCII text; CAST(.. AS BLOB) rejects non-ASCII outright.
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
                ELSE (instr('0123456789ABCDEF',
                            substring(hex(encode(text)), 1, 1)) - 1) * 16
                   + (instr('0123456789ABCDEF',
                            substring(hex(encode(text)), 2, 1)) - 1)
                END AS INT) AS first_byte
    FROM documents
    """,
    survey="multimodal binary payload + Arrow-batched features (datapipe)",
)
def q_mm_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = to_media(_docs(spark, sf_dir))
    return payload_features(media)


def _frame_sample_oracle() -> str:
    from .datapipe.multimodal import FRAME_CHUNK, FRAME_EVERY

    step = FRAME_CHUNK * FRAME_EVERY
    n = f"(length(text) - 1) // {step} + 1"
    frame = f"substr(text, (j - 1) * {step} + 1, {FRAME_CHUNK})"
    # testdata text is pure ASCII (mm_payload_features relies on the
    # same property), so char offsets equal the UDF's byte offsets
    return f"""
    SELECT doc_id,
           unnest(list_transform(generate_series(1, {n}),
               j -> CAST((j - 1) * {FRAME_EVERY} AS BIGINT))) AS frame_idx,
           unnest(list_transform(generate_series(1, {n}),
               j -> CAST(length({frame}) AS BIGINT))) AS n_bytes,
           unnest(list_transform(generate_series(1, {n}),
               j -> md5({frame}))) AS frame_md5
    FROM documents
    WHERE length(text) > 0
    """
    # the length guard matches the UDF's range(0, 0, step) == no
    # rows for an empty payload; DuckDB's truncating // would
    # otherwise emit a phantom frame ((0-1)//step + 1 = 1)


@register(
    "mm_frame_sample",
    _frame_sample_oracle(),
    survey="multimodal frame sampling: every-Nth fixed-size payload chunk via 1->N mapInPandas (datapipe)",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.multimodal import sample_frames

    return sample_frames(to_media(_docs(spark, sf_dir)))


@register(
    "emb_cosine_topk_blas",
    f"WITH {_VEC_CTE}"
    + """
    , pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               floor(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                     * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM v a JOIN v b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM pairs
    )
    WHERE rank <= 5
    """,
    survey="BLAS-blocked cosine top-k (throughput path, datapipe)",
)
def q_cosine_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.similarity import blas_cosine_topk

    return blas_cosine_topk(_emb(spark, sf_dir), k=5)


def _ivf_assign_sql(src: str, cent: str, out: str) -> str:
    """One nearest-centroid assignment CTE (rounded cosine, cell
    tiebreak) — the SQL twin of similarity._assign_to."""
    return f"""
, {out} AS (
    SELECT vec_id, vec, nrm, cell
    FROM (
        SELECT {src}.vec_id, {src}.vec, {src}.nrm, {cent}.cell,
               row_number() OVER (
                   PARTITION BY {src}.vec_id
                   ORDER BY floor(list_dot_product({src}.vec, {cent}.c_v)
                                  / ({src}.nrm * {cent}.c_nrm)
                                  * 1000000.0 + 0.5) / 1000000.0 DESC,
                            {cent}.cell
               ) AS rn
        FROM {src}, {cent}
    )
    WHERE rn = 1
)
"""


def _ivf_probe_sql(
    src: str, cent: str, out: str, nprobe: int
) -> str:
    """Probe-list CTE: each vector's `nprobe` nearest cells in the
    same (rounded cosine desc, cell asc) order — the SQL twin of
    similarity._assign_to's probe_cells."""
    return f"""
, {out} AS (
    SELECT vec_id, cell
    FROM (
        SELECT {src}.vec_id, {cent}.cell,
               row_number() OVER (
                   PARTITION BY {src}.vec_id
                   ORDER BY floor(list_dot_product({src}.vec, {cent}.c_v)
                                  / ({src}.nrm * {cent}.c_nrm)
                                  * 1000000.0 + 0.5) / 1000000.0 DESC,
                            {cent}.cell
               ) AS rn
        FROM {src}, {cent}
    )
    WHERE rn <= {nprobe}
)
"""


def _ivf_mean_sql(assigned: str, out: str) -> str:
    """Centroid re-estimation CTE: decimal-exact elementwise mean
    rounded to 6dp — the SQL twin of similarity.ivf_train's sums."""
    return f"""
, {out} AS (
    SELECT cell, c_v, sqrt(list_dot_product(c_v, c_v)) AS c_nrm
    FROM (
        SELECT cell, list(mv ORDER BY pos) AS c_v
        FROM (
            SELECT cell, pos,
                   floor(CAST(sum(CAST(val AS DECIMAL(30,12))) AS DOUBLE)
                         / count(*) * 1000000.0 + 0.5) / 1000000.0 AS mv
            FROM (
                SELECT cell, unnest(vec) AS val,
                       generate_subscripts(vec, 1) AS pos
                FROM {assigned}
            )
            GROUP BY cell, pos
        )
        GROUP BY cell
    )
)
"""


# Trained-IVF oracle: seed = first 16 by vec_id, then the SAME two
# deterministic Lloyd iterations similarity.ivf_train runs, unrolled.
_IVF_CTE = (
    """
, c0 AS (
    SELECT vec_id AS cell, vec AS c_v, nrm AS c_nrm
    FROM v ORDER BY vec_id LIMIT 16
)"""
    + _ivf_assign_sql("v", "c0", "a0")
    + _ivf_mean_sql("a0", "c1")
    + _ivf_assign_sql("v", "c1", "a1")
    + _ivf_mean_sql("a1", "c2")
    + _ivf_assign_sql("v", "c2", "assigned")
    + _ivf_probe_sql("v", "c2", "probes", 2)
)


@register(
    "emb_ivf_topk",
    f"WITH {_VEC_CTE}"
    + _IVF_CTE
    + """
    , pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               floor(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                     * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM assigned a
        JOIN probes p ON p.vec_id = a.vec_id
        JOIN assigned b
          ON b.cell = p.cell AND b.vec_id <> a.vec_id
    )
    SELECT vec_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM pairs
    )
    WHERE rank <= 3
    """,
    survey="IVF coarse-quantized ANN (scale path, datapipe)",
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.similarity import ivf_topk

    return ivf_topk(
        _emb(spark, sf_dir), k=3
    )


@register(
    "dedup_clusters",
    _MINHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS}, edges AS (
        SELECT doc_a, doc_b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT doc_id AS doc, doc_id AS r FROM documents
        UNION
        SELECT e.doc_a AS doc, reach.r
        FROM edges e JOIN reach ON e.doc_b = reach.doc
    )
    SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY doc
    """,
    survey="iterative connected components -> dedup clusters (datapipe)",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.dedup import dedup_clusters

    return dedup_clusters(_docs(spark, sf_dir))


@register(
    "dedup_apply",
    _MINHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS}, edges AS (
        SELECT doc_a, doc_b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT doc_id AS doc, doc_id AS r FROM documents
        UNION
        SELECT e.doc_a AS doc, reach.r
        FROM edges e JOIN reach ON e.doc_b = reach.doc
    ), labels AS (
        SELECT doc AS doc_id, min(r) AS cluster_id
        FROM reach GROUP BY doc
    )
    SELECT d.doc_id, d.lang, d.source,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           md5(d.text) AS fp
    FROM documents d
    JOIN labels l ON l.doc_id = d.doc_id AND l.cluster_id = d.doc_id
    """,
    survey="dedup end-game: materialized representative-only corpus (datapipe)",
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.dedup import dedup_apply

    return dedup_apply(_docs(spark, sf_dir))


@register(
    "dedup_clusters_multi",
    _MINHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS},"""
    + _emb_pair_ctes()
    + """, alledges AS (
        SELECT doc_a, doc_b FROM pairs
        UNION
        SELECT doc_a, doc_b FROM epairs
    ), edges AS (
        SELECT doc_a, doc_b FROM alledges
        UNION ALL
        SELECT doc_b AS doc_a, doc_a AS doc_b FROM alledges
    ), reach AS (
        SELECT doc_id AS doc, doc_id AS r FROM (
            SELECT doc_id FROM documents
            UNION
            SELECT vec_id AS doc_id FROM embeddings
        )
        UNION
        SELECT e.doc_a AS doc, reach.r
        FROM edges e JOIN reach ON e.doc_b = reach.doc
    )
    SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY doc
    """,
    survey="multimodal dedup clusters: text LSH + embedding near-dup edges (datapipe)",
)
def q_dedup_clusters_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.dedup import dedup_clusters_multi

    return dedup_clusters_multi(
        _docs(spark, sf_dir),
        _emb(spark, sf_dir),
    )


@register(
    "dedup_modality_agreement",
    _MINHASH_CTES
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS},"""
    + _emb_pair_ctes()
    + """, tp AS (SELECT doc_a, doc_b FROM pairs),
    ep AS (SELECT doc_a, doc_b FROM epairs),
    m AS (
        SELECT tp.doc_a IS NOT NULL AS in_text,
               ep.doc_a IS NOT NULL AS in_emb
        FROM tp FULL JOIN ep
          ON tp.doc_a = ep.doc_a AND tp.doc_b = ep.doc_b
    )
    SELECT
        CAST(coalesce(sum(CASE WHEN in_text AND NOT in_emb THEN 1 END), 0)
             AS BIGINT) AS n_text_only,
        CAST(coalesce(sum(CASE WHEN in_emb AND NOT in_text THEN 1 END), 0)
             AS BIGINT) AS n_emb_only,
        CAST(coalesce(sum(CASE WHEN in_text AND in_emb THEN 1 END), 0)
             AS BIGINT) AS n_both
    FROM m
    """,
    survey="text-LSH vs embedding-LSH pair agreement audit (multimodal recall tuning, datapipe)",
)
def q_dedup_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much the two near-dup modalities agree: candidate pairs
    found only by text MinHash-LSH, only by embedding hyperplane-LSH,
    and by both — the audit that tunes each side's recall dial
    (NUM_HASHES/BANDS vs EMB_TABLES/BITS) before running the
    multimodal clusters. Both pair sets are already capped and
    deduplicated; the full-outer join is keyed by the (doc_a, doc_b)
    pair — uniform — and collapses to a single audit row."""
    from .datapipe.dedup import lsh_candidate_pairs
    from .datapipe.similarity import embedding_near_pairs

    tp = lsh_candidate_pairs(
        _docs(spark, sf_dir)
    ).withColumn("in_text", F.lit(True))
    ep = (
        embedding_near_pairs(_emb(spark, sf_dir))
        .select("doc_a", "doc_b")
        .withColumn("in_emb", F.lit(True))
    )
    m = tp.join(ep, ["doc_a", "doc_b"], "full")

    def _n(cond: F.Column, name: str) -> F.Column:
        return (
            F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))
            .cast("bigint")
            .alias(name)
        )

    return m.agg(
        _n(
            F.col("in_text").isNotNull() & F.col("in_emb").isNull(),
            "n_text_only",
        ),
        _n(
            F.col("in_emb").isNotNull() & F.col("in_text").isNull(),
            "n_emb_only",
        ),
        _n(
            F.col("in_text").isNotNull() & F.col("in_emb").isNotNull(),
            "n_both",
        ),
    )


@register(
    "dedup_levenshtein",
    _MINHASH_CTES
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS}
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(da.text, db.text) AS INT) AS edit_distance,
           CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
               AS max_len
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    """,
    survey="edit-distance verification of near-dup candidates (UTF-8 byte unit, datapipe)",
)
def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distance unit is UTF-8 BYTES — the portable choice:
    DuckDB/Postgres `levenshtein` count bytes while Spark's counts
    code points (probed: 😀 scores 4 vs 1), so the round-10 fuzz
    corpus's astral documents diverged. The latin-1 re-decode maps
    each UTF-8 byte to exactly one code point, making Spark count
    bytes too; on ASCII corpora the units coincide, so historical
    values are unchanged."""

    def _bytes(col: str) -> F.Column:
        return F.decode(F.encode(F.col(col), "UTF-8"), "ISO-8859-1")

    docs = _docs(spark, sf_dir)
    pairs = lsh_candidate_pairs(docs)
    da = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    db = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(_bytes("text_a"), _bytes("text_b")).alias(
                "edit_distance"
            ),
            F.greatest(F.length("text_a"), F.length("text_b"))
            .cast("long")
            .alias("max_len"),
        )
    )


# ----------------------------------------------------------------------
# Corpus curation (repetition filters, decontamination, sampling)
# ----------------------------------------------------------------------

from .datapipe.curation import (  # noqa: E402
    CONTAM_MIN_SHARED,
    DEFAULT_RATE,
    DUP_TRIGRAM_FRAC_MAX,
    EVAL_MOD,
    LEHMER_MOD,
    LEHMER_MUL,
    REP_MIN_TOKENS,
    SAMPLE_RATES,
    TOP_BIGRAM_FRAC_MAX,
    decontaminate,
    repetition_stats,
    sample_stratified,
)
from .numerics import rnd_sql  # noqa: E402

_TOP_FRAC = rnd_sql("top_bigram_count * 2 / n_tokens", 6)
_DUP_FRAC = rnd_sql("dup_trigram_count / greatest(n_trigrams, 1)", 6)

# The full repetition-stats CTE chain (gram occurrences -> per-gram
# counts -> per-n stats -> per-doc stats), shared by text_repetition
# and curation_funnel.
_REP_CTES = """
    g AS (
        SELECT doc_id, 2 AS n, CAST(len(t) AS BIGINT) AS n_tokens,
               unnest(list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1])) AS gram
        FROM toks WHERE len(t) >= 2
        UNION ALL
        SELECT doc_id, 3 AS n, CAST(len(t) AS BIGINT) AS n_tokens,
               unnest(list_transform(generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
        FROM toks WHERE len(t) >= 3
    ),
    c AS (
        SELECT doc_id, n, gram, max(n_tokens) AS n_tokens,
               count(*) AS cnt
        FROM g GROUP BY doc_id, n, gram
    ),
    p AS (
        SELECT doc_id, n, max(n_tokens) AS n_tokens,
               max(cnt) AS top,
               CAST(sum(cnt) AS BIGINT) AS tot,
               CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)
                    AS BIGINT) AS dup
        FROM c GROUP BY doc_id, n
    ),
    d AS (
        SELECT doc_id, max(n_tokens) AS n_tokens,
               max(CASE WHEN n = 2 THEN top END) AS top_bigram_count,
               coalesce(max(CASE WHEN n = 3 THEN dup END),
                        CAST(0 AS BIGINT)) AS dup_trigram_count,
               coalesce(max(CASE WHEN n = 3 THEN tot END),
                        CAST(0 AS BIGINT)) AS n_trigrams
        FROM p GROUP BY doc_id
    )
"""

_REPETITIVE_SQL = (
    f"(n_tokens >= {REP_MIN_TOKENS}"
    f" AND (({_TOP_FRAC}) > {TOP_BIGRAM_FRAC_MAX}"
    f" OR ({_DUP_FRAC}) >= {DUP_TRIGRAM_FRAC_MAX}))"
)


@register(
    "text_repetition",
    f"WITH {TOKS_CTE}, {_REP_CTES}"
    + f"""
    SELECT doc_id, n_tokens, top_bigram_count,
           {_TOP_FRAC} AS top_bigram_frac,
           dup_trigram_count, n_trigrams,
           {_DUP_FRAC} AS dup_trigram_frac,
           {_REPETITIVE_SQL} AS repetitive
    FROM d
    """,
    survey="Gopher-style repetition filters (datapipe curation)",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(_docs(spark, sf_dir))


@register(
    "text_decontaminate",
    f"WITH {TOKS_CTE}, {SHINGLES_CTE},"
    + f"""
    ev AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
    ),
    hits AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM sh s JOIN ev USING (shingle)
        WHERE s.doc_id % {EVAL_MOD} <> 0
        GROUP BY s.doc_id
    )
    SELECT c.doc_id,
           coalesce(h.n_shared, CAST(0 AS BIGINT))
               AS n_shared_shingles,
           coalesce(h.n_shared, CAST(0 AS BIGINT))
               >= {CONTAM_MIN_SHARED} AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % {EVAL_MOD} <> 0) c
    LEFT JOIN hits h USING (doc_id)
    """,
    survey="benchmark decontamination via shingle overlap (datapipe curation)",
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(_docs(spark, sf_dir))


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in SAMPLE_RATES.items()
    )
    return f"CASE source {whens} ELSE {DEFAULT_RATE} END"


_PCT_SQL = (
    f"((doc_id % {LEHMER_MOD} + {LEHMER_MOD}) % {LEHMER_MOD})"
    f" * {LEHMER_MUL} % {LEHMER_MOD} % 100"
)


@register(
    "sample_stratified",
    f"""
    SELECT doc_id, source,
           CAST({_PCT_SQL} AS INT) AS sample_pct,
           CAST({_rate_case_sql()} AS INT) AS keep_rate
    FROM documents
    WHERE {_PCT_SQL} < {_rate_case_sql()}
    """,
    survey="deterministic stratified sampling for dataset mixing (datapipe curation)",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_stratified(_docs(spark, sf_dir))


from .datapipe.curation import (  # noqa: E402
    PPS_TARGET_K,
    PPS_WEIGHT_SCALE,
    sample_pps,
)


@register(
    "sample_pps",
    f"""
    WITH tot AS (
        SELECT CAST(sum(n_chars) AS BIGINT) AS w FROM documents
    ), t AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
               least(({PPS_TARGET_K} * n_chars * {LEHMER_MOD}) // w,
                     {LEHMER_MOD}) AS thr
        FROM documents, tot
    )
    SELECT doc_id, source, n_chars,
           CAST({LEHMER_MOD * PPS_WEIGHT_SCALE} // thr AS BIGINT)
               AS ht_weight_ppm
    FROM t
    WHERE ((doc_id % {LEHMER_MOD} + {LEHMER_MOD}) % {LEHMER_MOD})
          * {LEHMER_MUL} % {LEHMER_MOD}
          * {LEHMER_MUL} % {LEHMER_MOD} < thr
    """,
    survey="Poisson PPS sampling with Horvitz-Thompson weights: size-biased corpus auditing, map-only + one scalar agg (datapipe curation)",
)
def q_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_pps(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# Sequence packing, PII, vocabulary (datapipe curation)
# ----------------------------------------------------------------------

from .datapipe.curation import (  # noqa: E402
    PACK_BUCKETS,
    PACK_BUDGET,
    PII_PATTERNS,
    VOCAB_TOPK,
    pack_sequences,
    pii_scrub,
    pii_stats,
    vocab_topk,
)

_LEHMER_SQL = (
    f"((doc_id % {LEHMER_MOD} + {LEHMER_MOD}) % {LEHMER_MOD})"
    f" * {LEHMER_MUL} % {LEHMER_MOD}"
)


@register(
    "pack_sequences",
    f"WITH {TOKS_CTE},"
    + f"""
    tk AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST({_LEHMER_SQL} % {PACK_BUCKETS} AS INT) AS bucket
        FROM toks WHERE len(t) > 0
    ),
    c AS (
        SELECT doc_id, bucket, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY bucket ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM tk
    )
    SELECT doc_id, bucket, n_tokens,
           cum - n_tokens AS start_offset,
           CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT)
               AS bin_first,
           CAST(floor((cum - 1) / {PACK_BUDGET}) AS BIGINT) AS bin_last,
           CAST(floor((cum - 1) / {PACK_BUDGET})
                - floor((cum - n_tokens) / {PACK_BUDGET}) + 1 AS BIGINT)
               AS n_bins
    FROM c
    """,
    survey="concat-and-chunk sequence packing into token-budget bins (datapipe curation)",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(_docs(spark, sf_dir))


# The synthetic corpus contains no digits or @-signs by construction,
# so the PII queries exercise the patterns on a deterministically
# augmented copy: a fraction of documents get an email / phone / SSN
# / IPv4 appended, derived from doc_id identically in both engines.
# The operators themselves take any corpus.

def _pii_augment(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    s = did.cast("string")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" contact user"), s, F.lit("@example.com")),
        ).otherwise(""),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call 555-123-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(did % 11 == 0, F.lit(" ssn 123-45-6789")).otherwise(""),
        F.when(
            did % 13 == 0,
            F.concat(F.lit(" ip 10.0."), (did % 256).cast("string"), F.lit(".7")),
        ).otherwise(""),
    )
    return docs.select("doc_id", aug.alias("text"))


_PII_AUG_SQL = """
    aug AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 5 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com' ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                  THEN ' call 555-123-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                  THEN ' ssn 123-45-6789' ELSE '' END
               || CASE WHEN doc_id % 13 = 0
                  THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.7' ELSE '' END
               AS text
        FROM documents
    )
"""

_PII_COUNT_COLS = ",\n           ".join(
    f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
    f" AS n_{name}"
    for name, pat in PII_PATTERNS
)
_PII_TOTAL = " + ".join(f"n_{name}" for name, _ in PII_PATTERNS)

_PII_RED_SQL = "text"
for _name, _pat in PII_PATTERNS:
    _PII_RED_SQL = (
        f"regexp_replace({_PII_RED_SQL}, '{_pat}',"
        f" '<{_name.upper()}>', 'g')"
    )


@register(
    "pii_stats",
    f"WITH {_PII_AUG_SQL},"
    + f"""
    c AS (
        SELECT doc_id, {_PII_COUNT_COLS}
        FROM aug
    )
    SELECT *, ({_PII_TOTAL}) > 0 AS has_pii FROM c
    """,
    survey="PII detection counts: email/phone/SSN/IPv4 regex, map-only (datapipe curation)",
)
def q_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_stats(_pii_augment(_docs(spark, sf_dir)))


@register(
    "pii_scrub",
    f"WITH {_PII_AUG_SQL}"
    + f"""
    SELECT doc_id,
           {_PII_RED_SQL} AS redacted,
           CAST(length({_PII_RED_SQL}) AS BIGINT) AS n_chars_red
    FROM aug
    """,
    survey="PII redaction via ordered regexp_replace chain (datapipe curation)",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scrub(_pii_augment(_docs(spark, sf_dir)))


@register(
    "vocab_topk",
    f"WITH {TOKS_CTE},"
    + f"""
    tok AS (SELECT doc_id, unnest(t) AS token FROM toks)
    SELECT token,
           CAST(count(*) AS BIGINT) AS tf,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM tok GROUP BY token
    ORDER BY tf DESC, token LIMIT {VOCAB_TOPK}
    """,
    survey="corpus vocabulary: global top-K tokens by tf with df (datapipe curation)",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# Curation funnel, incremental dedup, embedding quantization
# ----------------------------------------------------------------------

from .datapipe.curation import curation_funnel  # noqa: E402
from .datapipe.dedup import INCOMING_MOD, incremental_dedup  # noqa: E402
from .datapipe.similarity import QUANT_LEVELS, quantize_int8  # noqa: E402


@register(
    "curation_funnel",
    f"WITH {TOKS_CTE}, {_REP_CTES}, {SHINGLES_CTE},"
    + f"""
    rep AS (
        SELECT doc_id, {_REPETITIVE_SQL} AS repetitive FROM d
    ),
    ev AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
    ),
    hits AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM sh s JOIN ev USING (shingle)
        WHERE s.doc_id % {EVAL_MOD} <> 0
        GROUP BY s.doc_id
    ),
    base AS (
        SELECT doc_id, source,
               ({_PCT_SQL}) < ({_rate_case_sql()}) AS sampled
        FROM documents WHERE doc_id % {EVAL_MOD} <> 0
    ),
    j AS (
        SELECT b.source, b.sampled,
               coalesce(r.repetitive, FALSE) AS repetitive,
               coalesce(h.n_shared >= {CONTAM_MIN_SHARED}, FALSE)
                   AS contaminated
        FROM base b
        LEFT JOIN rep r USING (doc_id)
        LEFT JOIN hits h USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN repetitive THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repetitive,
           CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(sum(CASE WHEN NOT sampled THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled_out,
           CAST(sum(CASE WHEN NOT repetitive AND NOT contaminated
                         AND sampled THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
    FROM j GROUP BY source
    """,
    survey="end-to-end curation funnel: per-source survival through repetition/contamination/sampling (datapipe curation)",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_funnel(_docs(spark, sf_dir))


@register(
    "curation_apply",
    f"WITH {TOKS_CTE}, {_REP_CTES}, {SHINGLES_CTE},"
    + f"""
    rep AS (
        SELECT doc_id, {_REPETITIVE_SQL} AS repetitive FROM d
    ),
    ev AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
    ),
    hits AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM sh s JOIN ev USING (shingle)
        WHERE s.doc_id % {EVAL_MOD} <> 0
        GROUP BY s.doc_id
    ),
    base AS (
        SELECT doc_id, lang, source, text,
               ({_PCT_SQL}) < ({_rate_case_sql()}) AS sampled
        FROM documents WHERE doc_id % {EVAL_MOD} <> 0
    )
    SELECT b.doc_id, b.lang, b.source,
           md5({_PII_RED_SQL}) AS fp,
           CAST(length({_PII_RED_SQL}) AS BIGINT) AS n_chars_curated
    FROM base b
    LEFT JOIN rep r USING (doc_id)
    LEFT JOIN hits h USING (doc_id)
    WHERE coalesce(r.repetitive, FALSE) = FALSE
      AND coalesce(h.n_shared >= {CONTAM_MIN_SHARED}, FALSE) = FALSE
      AND b.sampled
    """,
    survey="curation end-game: materialized kept+PII-redacted corpus (datapipe curation)",
)
def q_curation_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.curation import curation_apply

    return curation_apply(_docs(spark, sf_dir))


def _split_pct2_sql() -> str:
    from .datapipe.curation import LEHMER_MOD, LEHMER_MUL

    h1 = (
        f"((doc_id % {LEHMER_MOD} + {LEHMER_MOD}) % {LEHMER_MOD})"
        f" * {LEHMER_MUL} % {LEHMER_MOD}"
    )
    return f"({h1}) * {LEHMER_MUL} % {LEHMER_MOD} % 100"


@register(
    "split_assign",
    f"""
    SELECT doc_id, source,
           CAST({_split_pct2_sql()} AS INT) AS split_pct,
           CASE WHEN {_split_pct2_sql()} < 80 THEN 'train'
                WHEN {_split_pct2_sql()} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    survey="deterministic disjoint train/val/test split assignment (datapipe curation)",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.curation import split_assign

    return split_assign(_docs(spark, sf_dir, fan=False))


@register(
    "corpus_source_report",
    """
    WITH per_doc AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> x <> '')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars,
               md5(text) AS fp
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(floor(sum(n_chars) / count(*)) AS BIGINT)
               AS avg_chars_floor,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
    FROM per_doc
    GROUP BY source
    """,
    survey="per-source corpus health report: volume, token/char mass, in-source exact-dup count (datapipe reporting)",
)
def q_corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first query a curation team runs: per-source volume,
    token and char mass, floor-average doc length, and the
    in-source exact-duplicate count (docs minus distinct content
    fingerprints). One scan, one source-keyed aggregation with
    map-side partials; the distinct-fp count is the only expanding
    term and is keyed by (source, fp) — uniform by md5."""
    from .datapipe.textstats import tokens

    per_doc = _docs(spark, sf_dir, fan=False).select(
        "source",
        F.size(tokens()).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.md5("text").alias("fp"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.floor(F.sum("n_chars") / F.count("*"))
        .cast("long")
        .alias("avg_chars_floor"),
        (F.count("*") - F.countDistinct("fp"))
        .cast("long")
        .alias("n_exact_dups"),
    )


@register(
    "dedup_incremental",
    f"WITH {TOKS_CTE},"
    + f"""
    fp AS (
        -- coalesce: array_to_string([]) is NULL in DuckDB but '' in
        -- Spark, and a NULL fp would silently never match the index
        -- (NULL <> NULL in the join) — token-less docs fingerprint
        -- as md5('') on both engines (r7 fuzzer)
        SELECT doc_id,
               md5(coalesce(
                   array_to_string(list_sort(list_distinct(t)), ' '),
                   '')) AS fp
        FROM toks
    ),
    idx AS (
        SELECT fp, CAST(min(doc_id) AS BIGINT) AS dup_of
        FROM fp WHERE doc_id % {INCOMING_MOD} <> 0 GROUP BY fp
    )
    SELECT i.doc_id, i.fp, x.dup_of, x.dup_of IS NULL AS is_new
    FROM (SELECT * FROM fp WHERE doc_id % {INCOMING_MOD} = 0) i
    LEFT JOIN idx x USING (fp)
    """,
    survey="incremental-ingest dedup: new batch vs existing-corpus fingerprint index (datapipe)",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_dedup(_docs(spark, sf_dir))


_Q_RMSE = rnd_sql(
    "sqrt(list_sum(list_transform(generate_series(1, len(v)),"
    " i -> (v[i] - q[i] * scale) * (v[i] - q[i] * scale))) / len(v))",
    6,
)


@register(
    "emb_quantize_int8",
    f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, v,
               greatest(list_max(list_transform(v, x -> abs(x))),
                        1e-12) / {QUANT_LEVELS} AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, v, scale,
               list_transform(v, x -> CAST(greatest(-{QUANT_LEVELS},
                   least({QUANT_LEVELS}, floor(x / scale + 0.5)))
                   AS INT)) AS q
        FROM s
    )
    SELECT vec_id,
           {_Q_RMSE} AS rmse,
           {rnd_sql("scale", 6)} AS q_scale,
           array_to_string(list_transform(q,
               c -> CAST(c AS VARCHAR)), ',') AS q_codes
    FROM q
    """,
    survey="symmetric int8 embedding quantization + reconstruction RMSE (datapipe)",
)
def q_emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantize_int8(_emb(spark, sf_dir))


# ----------------------------------------------------------------------
# Product quantization (datapipe/pq.py) — the memory-bound ANN tier.
# The oracle UNROLLS the identical integer-exact training as CTEs
# (the emb_ivf_topk pattern): quantized subvector stream, seed
# codebooks from the first K vectors, PQ_ITERS Lloyd refinements
# where every distance is an integer sum of integer squares, argmin
# ties break through the encode d2*K + cell (non-negative, K a
# power of two, so Spark shiftright == DuckDB //), and centroid
# updates are floor(sum/count + 0.5) on exact integers. Both sides
# are bit-identical by construction — no float comparison anywhere.
# ----------------------------------------------------------------------


def _pq_d2_sql(s: str, c: str) -> str:
    return " + ".join(
        f"({s}.sv[{i}]-{c}.cv[{i}])*({s}.sv[{i}]-{c}.cv[{i}])"
        for i in range(1, pq.PQ_DS + 1)
    )


_PQ_SV = f"""
pq_sv AS (
    SELECT vec_id, mm.m AS m,
           list_transform(
               embedding[mm.m*{pq.PQ_DS}+1 : mm.m*{pq.PQ_DS}+{pq.PQ_DS}],
               x -> CAST(floor(CAST(x AS DOUBLE) * {float(pq.PQ_SCALE)})
                         AS BIGINT)) AS sv
    FROM embeddings
    CROSS JOIN (SELECT unnest(range({pq.PQ_M})) AS m) mm
),
pq_seed AS (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {pq.PQ_K})
),
pq_c0 AS (
    SELECT s.m, d.cell, s.sv AS cv
    FROM pq_sv s JOIN pq_seed d USING (vec_id)
)"""


def _pq_assign_sql(c: str, a: str) -> str:
    return f"""
, {a} AS (
    SELECT vec_id, m, CAST(min(enc) % {pq.PQ_K} AS INT) AS cell,
           CAST(min(enc) // {pq.PQ_K} AS BIGINT) AS d2
    FROM (
        SELECT s.vec_id, s.m,
               ({_pq_d2_sql('s', 'c')}) * {pq.PQ_K} + c.cell AS enc
        FROM pq_sv s JOIN {c} c ON c.m = s.m
    ) GROUP BY vec_id, m
)"""


def _pq_mean_sql(a: str, c: str) -> str:
    return f"""
, {c} AS (
    SELECT m, cell, list(comp ORDER BY pos) AS cv
    FROM (
        SELECT a.m, a.cell, pp.pos,
               CAST(floor(CAST(sum(s.sv[pp.pos]) AS DOUBLE)
                          / count(*) + 0.5) AS BIGINT) AS comp
        FROM {a} a
        JOIN pq_sv s ON s.vec_id = a.vec_id AND s.m = a.m
        CROSS JOIN (SELECT unnest(range(1, {pq.PQ_DS + 1})) AS pos) pp
        GROUP BY a.m, a.cell, pp.pos
    ) GROUP BY m, cell
)"""


_PQ_CTE = (
    _PQ_SV
    + _pq_assign_sql("pq_c0", "pq_a0")
    + _pq_mean_sql("pq_a0", "pq_c1")
    + _pq_assign_sql("pq_c1", "pq_a1")
    + _pq_mean_sql("pq_a1", "pq_c2")
    + _pq_assign_sql("pq_c2", "pq_af")
)
assert pq.PQ_ITERS == 2  # the oracle unrolls exactly two refinements


@register(
    "emb_pq_codes",
    f"WITH {_PQ_CTE}"
    + """
    SELECT vec_id,
           string_agg(CAST(cell AS VARCHAR), '-' ORDER BY m) AS code,
           CAST(sum(d2) AS BIGINT) AS sq_err
    FROM pq_af GROUP BY vec_id
    """,
    survey="product-quantization codes + per-vector distortion (Jegou TPAMI'11; the memory-bound ANN index build, datapipe)",
)
def q_emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.pq_codes(
        _emb(spark, sf_dir)
    )


_PQ_Q_LUT_CTES = f"""
, pq_q AS (
    SELECT vec_id AS q_id FROM embeddings ORDER BY vec_id LIMIT {pq.PQ_NQ}
)
, pq_lut AS (
    SELECT s.vec_id AS q_id, c.m, c.cell,
           ({_pq_d2_sql('s', 'c')}) AS d2
    FROM pq_sv s
    JOIN pq_q ON pq_q.q_id = s.vec_id
    JOIN pq_c2 c ON c.m = s.m
)"""


_PQ_ADC_CTES = _PQ_Q_LUT_CTES + f"""
, pq_scored AS (
    SELECT l.q_id, a.vec_id AS neighbor_id,
           CAST(sum(l.d2) AS BIGINT) AS adc_dist
    FROM pq_af a JOIN pq_lut l ON l.m = a.m AND l.cell = a.cell
    WHERE a.vec_id <> l.q_id
    GROUP BY l.q_id, a.vec_id
)
, pq_adc AS (
    SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY adc_dist, neighbor_id
    ) AS rnk
    FROM pq_scored
)"""


@register(
    "emb_pq_topk",
    f"WITH {_PQ_CTE}{_PQ_ADC_CTES}"
    + """
    SELECT q_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rank
    FROM pq_adc WHERE rnk <= 3
    """,
    survey="PQ asymmetric-distance (ADC) top-k search over the coded index (datapipe)",
)
def q_emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.pq_adc_topk(
        _emb(spark, sf_dir), k=3
    )


def _pq_sv_d2_sql(a: str, b: str) -> str:
    """Squared L2 between two subvector streams (sv vs sv)."""
    return " + ".join(
        f"({a}.sv[{i}]-{b}.sv[{i}])*({a}.sv[{i}]-{b}.sv[{i}])"
        for i in range(1, pq.PQ_DS + 1)
    )


def _pq_exact_ctes() -> str:
    """pq_qsub + exact integer ground-truth top-3 — shared by every
    recall audit (requires pq_sv and pq_q to be in scope)."""
    return f"""
, pq_qsub AS (
    SELECT s.vec_id AS q_id, s.m, s.sv
    FROM pq_sv s JOIN pq_q ON pq_q.q_id = s.vec_id
)
, pq_exact AS (
    SELECT q_id, vec_id, CAST(sum(d2) AS BIGINT) AS dist
    FROM (
        SELECT qs.q_id, s.vec_id, ({_pq_sv_d2_sql('s', 'qs')}) AS d2
        FROM pq_sv s
        JOIN pq_qsub qs ON qs.m = s.m AND s.vec_id <> qs.q_id
    ) GROUP BY q_id, vec_id
)
, pq_exact_top AS (
    SELECT q_id, neighbor_id FROM (
        SELECT q_id, vec_id AS neighbor_id, row_number() OVER (
            PARTITION BY q_id ORDER BY dist, vec_id
        ) AS xr
        FROM pq_exact
    ) WHERE xr <= 3
)"""


_PQ_RECALL_SELECT = """
SELECT CAST(count(DISTINCT e.q_id) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN count(*) > 0 THEN
                floor(coalesce(sum(hit), 0) * 1000000 / count(*))
            ELSE 0 END AS BIGINT) AS recall_ppm
FROM pq_exact_top e
LEFT JOIN ({approx_hits}) a USING (q_id, neighbor_id)
"""


@register(
    "pq_recall",
    f"WITH {_PQ_CTE}{_PQ_ADC_CTES}"
    + _pq_exact_ctes()
    + _PQ_RECALL_SELECT.format(
        approx_hits="SELECT q_id, neighbor_id, 1 AS hit"
        " FROM pq_adc WHERE rnk <= 3"
    ),
    survey="PQ accuracy audit: ADC recall@k vs exact integer ground truth (datapipe)",
)
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.pq_recall(
        _emb(spark, sf_dir), k=3
    )


_PQ_QSUB_CTE = """
, pq_qsub AS (
    SELECT s.vec_id AS q_id, s.m, s.sv
    FROM pq_sv s JOIN pq_q ON pq_q.q_id = s.vec_id
)"""


_PQ_RERANK_CTES = (
    _PQ_QSUB_CTE
    + f"""
, pq_short AS (
    SELECT q_id, neighbor_id FROM pq_adc WHERE rnk <= {pq.PQ_SHORTLIST}
)
, pq_rr AS (
    SELECT q_id, neighbor_id, CAST(sum(d2) AS BIGINT) AS dist
    FROM (
        SELECT sh.q_id, sh.neighbor_id,
               ({_pq_sv_d2_sql('s', 'qs')}) AS d2
        FROM pq_short sh
        JOIN pq_sv s ON s.vec_id = sh.neighbor_id
        JOIN pq_qsub qs ON qs.q_id = sh.q_id AND qs.m = s.m
    ) GROUP BY q_id, neighbor_id
)
, pq_rr_top AS (
    SELECT q_id, neighbor_id, dist, row_number() OVER (
        PARTITION BY q_id ORDER BY dist, neighbor_id
    ) AS rr
    FROM pq_rr
)"""
)


@register(
    "emb_pq_rerank_topk",
    f"WITH {_PQ_CTE}{_PQ_ADC_CTES}{_PQ_RERANK_CTES}"
    + """
    SELECT q_id, neighbor_id, dist, CAST(rr AS INT) AS rank
    FROM pq_rr_top WHERE rr <= 3
    """,
    survey="PQ ADC shortlist + exact re-rank top-k (the FAISS refine serving pattern, datapipe)",
)
def q_emb_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.pq_rerank_topk(
        _emb(spark, sf_dir), k=3
    )


@register(
    "pq_rerank_recall",
    f"WITH {_PQ_CTE}{_PQ_ADC_CTES}{_PQ_RERANK_CTES}"
    + """
, pq_x AS (
    SELECT q_id, vec_id, CAST(sum(d2) AS BIGINT) AS dist
    FROM (
        SELECT qs.q_id, s.vec_id, ("""
    + _pq_sv_d2_sql("s", "qs")
    + """) AS d2
        FROM pq_sv s
        JOIN pq_qsub qs ON qs.m = s.m AND s.vec_id <> qs.q_id
    ) GROUP BY q_id, vec_id
)
, pq_x_top AS (
    SELECT q_id, neighbor_id FROM (
        SELECT q_id, vec_id AS neighbor_id, row_number() OVER (
            PARTITION BY q_id ORDER BY dist, vec_id
        ) AS xr
        FROM pq_x
    ) WHERE xr <= 3
)
SELECT CAST(count(DISTINCT e.q_id) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN count(*) > 0 THEN
                floor(coalesce(sum(hit), 0) * 1000000 / count(*))
            ELSE 0 END AS BIGINT) AS recall_ppm
FROM pq_x_top e
LEFT JOIN (
    SELECT q_id, neighbor_id, 1 AS hit FROM pq_rr_top WHERE rr <= 3
) a USING (q_id, neighbor_id)
""",
    survey="PQ re-ranked recall@k audit: what the exact refine step buys back (datapipe)",
)
def q_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.pq_rerank_recall(
        _emb(spark, sf_dir), k=3
    )


@register(
    "emb_ivfpq_topk",
    f"WITH {_VEC_CTE}"
    + _IVF_CTE
    + ","
    + _PQ_CTE
    + _PQ_Q_LUT_CTES
    + """
, ivfpq_pairs AS (
    SELECT p.vec_id AS q_id, a.vec_id
    FROM probes p
    JOIN pq_q ON pq_q.q_id = p.vec_id
    JOIN assigned a ON a.cell = p.cell
    WHERE a.vec_id <> p.vec_id
)
, ivfpq_scored AS (
    SELECT pr.q_id, pr.vec_id AS neighbor_id,
           CAST(sum(l.d2) AS BIGINT) AS adc_dist
    FROM ivfpq_pairs pr
    JOIN pq_af a ON a.vec_id = pr.vec_id
    JOIN pq_lut l ON l.q_id = pr.q_id AND l.m = a.m AND l.cell = a.cell
    GROUP BY pr.q_id, pr.vec_id
)
SELECT q_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY adc_dist, neighbor_id
    ) AS rank
    FROM ivfpq_scored
)
WHERE rank <= 3
""",
    survey="IVF-PQ composed index: coarse cells bound candidates, PQ codes bound bytes, ADC inside probed cells (FAISS IndexIVFPQ shape, datapipe)",
)
def q_emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.ivfpq_topk(
        _emb(spark, sf_dir), k=3
    )


@register(
    "ivfpq_recall",
    f"WITH {_VEC_CTE}"
    + _IVF_CTE
    + ","
    + _PQ_CTE
    + _PQ_Q_LUT_CTES
    + """
, ivfpq_pairs AS (
    SELECT p.vec_id AS q_id, a.vec_id
    FROM probes p
    JOIN pq_q ON pq_q.q_id = p.vec_id
    JOIN assigned a ON a.cell = p.cell
    WHERE a.vec_id <> p.vec_id
)
, ivfpq_scored AS (
    SELECT pr.q_id, pr.vec_id AS neighbor_id,
           CAST(sum(l.d2) AS BIGINT) AS adc_dist
    FROM ivfpq_pairs pr
    JOIN pq_af a ON a.vec_id = pr.vec_id
    JOIN pq_lut l ON l.q_id = pr.q_id AND l.m = a.m AND l.cell = a.cell
    GROUP BY pr.q_id, pr.vec_id
)
, ivfpq_top AS (
    SELECT q_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, neighbor_id
        ) AS rnk
        FROM ivfpq_scored
    ) WHERE rnk <= 3
)"""
    + _pq_exact_ctes()
    + _PQ_RECALL_SELECT.format(
        approx_hits="SELECT q_id, neighbor_id, 1 AS hit FROM ivfpq_top"
    ),
    survey="IVF-PQ recall@k audit: cell-miss + code-distortion losses vs exact ground truth (datapipe)",
)
def q_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.ivfpq_recall(
        _emb(spark, sf_dir), k=3
    )


# ----------------------------------------------------------------------
# Sketch accuracy audit
# ----------------------------------------------------------------------

from .datapipe.dedup import minhash_jaccard_estimate  # noqa: E402

_EST_SQL = rnd_sql(
    f"len(list_filter(generate_series(1, {NUM_HASHES}),"
    f" i -> sa.mins[i] = sb.mins[i])) / {float(NUM_HASHES)}",
    6,
)
_JAC_SQL = rnd_sql("n_common / (za.n_sh + zb.n_sh - n_common)", 6)


@register(
    "dedup_minhash_estimate",
    _materialize(
        _MINHASH_CTES
        + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS},
    splits AS (
        SELECT doc_id, string_split(sig, '|') AS mins FROM sigs
    ),
    -- exact-Jaccard side restricted to candidate-pair docs FIRST
    -- (mirrors the Spark left-semi join), then DF-capped within
    -- that subset (mirrors dedup.SHINGLE_DF_CAP)
    cand AS (
        SELECT doc_a AS doc_id FROM pairs
        UNION SELECT doc_b FROM pairs
    ),
    shc AS (SELECT sh.* FROM sh JOIN cand USING (doc_id)),
    ok_sh AS (
        SELECT shingle FROM shc
        GROUP BY shingle HAVING count(*) <= {SHINGLE_DF_CAP}
    ),
    shr AS (SELECT shc.* FROM shc JOIN ok_sh USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY 1),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM shr a JOIN shr b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           {_EST_SQL} AS est_jaccard,
           coalesce({_JAC_SQL}, 0.0) AS jaccard,
           {rnd_sql(f"abs(({_EST_SQL}) - coalesce({_JAC_SQL}, 0.0))", 6)}
               AS abs_err
    FROM pairs p
    JOIN splits sa ON sa.doc_id = p.doc_a
    JOIN splits sb ON sb.doc_id = p.doc_b
    -- LEFT: a pair sharing only over-cap shingles has no verifier
    -- row; its rare-shingle Jaccard is 0 (mirrors the Spark side)
    LEFT JOIN common c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
    LEFT JOIN sizes za ON za.doc_id = p.doc_a
    LEFT JOIN sizes zb ON zb.doc_id = p.doc_b
    """,
        # every multiply-referenced step (pairs x3, shr x3, stacked
        # x3, splits/sizes/shc/sh x2, sigs x n_bands via _BAND_STACK)
        ("sh", "sigs", "stacked", "pairs", "splits", "shc", "shr",
         "sizes"),
    ),
    survey="MinHash estimate vs exact Jaccard, candidate-bounded (sketch-accuracy audit, datapipe)",
)
def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_jaccard_estimate(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# Corpus-rarity quality score
# ----------------------------------------------------------------------

from .datapipe.curation import RARITY_SCALE, rarity_scores  # noqa: E402


@register(
    "text_rarity",
    f"WITH {TOKS_CTE},"
    + f"""
    tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
    model AS (
        SELECT token,
               CAST(floor({RARITY_SCALE}
                    / (1 + (length(bin(count(*))) - 1))) AS BIGINT)
                   AS c
        FROM tok GROUP BY token
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(floor(sum(c) / count(*)) AS BIGINT) AS rarity_ppm
    FROM tok JOIN model USING (token)
    GROUP BY doc_id
    """,
    survey="corpus-rarity quality score: integer-exact stand-in for LM-perplexity filtering (datapipe curation)",
)
def q_text_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rarity_scores(_docs(spark, sf_dir, fan=False))


from .datapipe.curation import curriculum_order  # noqa: E402


@register(
    "curriculum_order",
    f"WITH {TOKS_CTE},"
    + f"""
    tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
    model AS (
        SELECT token,
               CAST(floor({RARITY_SCALE}
                    / (1 + (length(bin(count(*))) - 1))) AS BIGINT)
                   AS c
        FROM tok GROUP BY token
    ),
    r AS (
        SELECT doc_id,
               CAST(floor(sum(c) / count(*)) AS BIGINT) AS rarity_ppm
        FROM tok JOIN model USING (token)
        GROUP BY doc_id
    ),
    b AS (
        SELECT d.doc_id, d.source, r.rarity_ppm,
               CAST(row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY r.rarity_ppm, d.doc_id
               ) AS BIGINT) AS rank_in_source
        FROM documents d JOIN r ON d.doc_id = r.doc_id
    ),
    s AS (
        SELECT source,
               CAST(row_number() OVER (ORDER BY source) AS BIGINT)
                   AS sidx,
               CAST(count(*) OVER () AS BIGINT) AS nsrc
        FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT b.doc_id, b.source, b.rarity_ppm, b.rank_in_source,
           CAST((b.rank_in_source - 1) * s.nsrc + (s.sidx - 1)
                AS BIGINT) AS global_pos
    FROM b JOIN s ON b.source = s.source
    """,
    survey="curriculum + source interleave: rising-rarity order within source, round-robin across sources via a CLOSED-FORM global position — no global sort (datapipe curation)",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curriculum_order(_docs(spark, sf_dir, fan=False))


# ----------------------------------------------------------------------
# Corpus mixture drift audit
# ----------------------------------------------------------------------

from .datapipe.curation import corpus_drift  # noqa: E402


@register(
    "corpus_drift",
    """
    WITH tok AS (
        SELECT source,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    st AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token),
    g AS (SELECT token, CAST(sum(cnt) AS BIGINT) AS g
          FROM st GROUP BY token),
    tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_src
            FROM st GROUP BY source),
    gt AS (SELECT CAST(sum(cnt) AS BIGINT) AS gtot FROM st),
    j AS (
        SELECT st.source, st.cnt, g.g, tot.n_src, gt.gtot
        FROM st
        JOIN g USING (token)
        JOIN tot ON tot.source = st.source, gt),
    agg AS (
        SELECT source, n_src, gtot,
               CAST(count(*) AS BIGINT) AS n_vocab,
               CAST(sum(abs(cnt * (gtot - n_src)
                            - (g - cnt) * n_src)) AS BIGINT) AS num_in,
               CAST(sum(g) AS BIGINT) AS sg
        FROM j GROUP BY source, n_src, gtot)
    SELECT source,
           n_src AS n_tokens,
           n_vocab,
           CAST(num_in + (gtot - sg) * n_src AS BIGINT) AS drift_num,
           CASE WHEN gtot > n_src THEN
               CAST(num_in + (gtot - sg) * n_src AS DOUBLE)
                   / (2.0 * n_src * (gtot - n_src))
           END AS tv_dist
    FROM agg
    """,
    survey="per-source token-distribution TV-distance drift audit, exact-integer numerator (datapipe curation)",
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_drift(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# SemDeDup semantic dedup
# ----------------------------------------------------------------------

from .datapipe.similarity import SEMDEDUP_TAU, semdedup  # noqa: E402


@register(
    "semdedup_prune",
    f"WITH {_VEC_CTE}"
    + _IVF_CTE
    + f"""
    , dom AS (
        SELECT b.vec_id AS b_id, min(a.vec_id) AS pruned_by
        FROM assigned a
        JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE floor(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                    * 1000000.0 + 0.5) / 1000000.0 >= {SEMDEDUP_TAU}
        GROUP BY b.vec_id)
    SELECT s.vec_id, s.cell,
           dom.pruned_by IS NULL AS kept,
           dom.pruned_by
    FROM assigned s LEFT JOIN dom ON dom.b_id = s.vec_id
    """,
    survey="SemDeDup semantic dedup: IVF-cell-confined cosine dominance prune (datapipe)",
)
def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semdedup(
        _emb(spark, sf_dir)
    )


# ----------------------------------------------------------------------
# Mixture rebalance plan + vocabulary-coverage audit
# ----------------------------------------------------------------------

from .datapipe.curation import OOV_VOCAB_K, mixture_plan, oov_rates  # noqa: E402


@register(
    "mixture_plan",
    """
    WITH tok AS (
        SELECT source,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    inv AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
        FROM tok GROUP BY source),
    m AS (SELECT CAST(min(n_tokens) AS BIGINT) AS min_inv FROM inv)
    SELECT source, n_tokens,
           CAST(floor(min_inv * 1000000 / n_tokens) AS BIGINT)
               AS keep_ppm,
           CAST(floor(n_tokens
                      * floor(min_inv * 1000000 / n_tokens)
                      / 1000000) AS BIGINT) AS kept_tokens
    FROM inv, m
    """,
    survey="uniform-mixture rebalance plan: integer-exact per-source keep fractions bounded by the scarcest source (datapipe curation)",
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_plan(_docs(spark, sf_dir, fan=False))


@register(
    "oov_rates",
    f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    vocab AS (
        SELECT token, 1 AS in_vocab
        FROM (SELECT token, count(*) AS tf FROM tok GROUP BY token)
        ORDER BY tf DESC, token LIMIT {OOV_VOCAB_K})
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS oov_tokens,
           CAST(floor(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)
                      * 1000000 / count(*)) AS BIGINT) AS oov_ppm
    FROM tok LEFT JOIN vocab USING (token)
    GROUP BY doc_id
    """,
    survey="per-document OOV rate vs the corpus top-K vocabulary, integer-exact (datapipe curation)",
)
def q_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan=False: measured-regressed under the widening shuffle
    # (r13 adjudicator 1.46x iso; A/B 1.03-1.18 s fan vs 0.63 s)
    return oov_rates(_docs(spark, sf_dir, fan=False))


# ----------------------------------------------------------------------
# Retrieval-side document chunking
# ----------------------------------------------------------------------

from .datapipe.curation import CHUNK_STRIDE, CHUNK_TOKENS, doc_chunks  # noqa: E402


@register(
    "doc_chunks",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE}))
                   AS start_pos
        FROM toks WHERE len(t) > 0)
    SELECT doc_id,
           CAST(floor(start_pos / {CHUNK_STRIDE}) AS BIGINT) AS chunk_id,
           CAST(start_pos AS BIGINT) AS start_pos,
           CAST(len(list_slice(t, start_pos + 1,
                               start_pos + {CHUNK_TOKENS})) AS BIGINT)
               AS n_chunk_tokens,
           md5(array_to_string(
               list_slice(t, start_pos + 1,
                          start_pos + {CHUNK_TOKENS}), ' ')) AS chunk_md5
    FROM starts
    """,
    survey="overlapping token-window chunking, the RAG indexing unit — zero-shuffle map-side explode (datapipe curation)",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_chunks(_docs(spark, sf_dir))


@register(
    "chunk_index_dedup",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE}))
                   AS start_pos
        FROM toks WHERE len(t) > 0),
    ch AS (
        SELECT doc_id,
               CAST(floor(start_pos / {CHUNK_STRIDE}) AS BIGINT)
                   AS chunk_id,
               md5(array_to_string(
                   list_slice(t, start_pos + 1,
                              start_pos + {CHUNK_TOKENS}), ' '))
                   AS chunk_md5
        FROM starts),
    g AS (
        SELECT chunk_md5,
               CAST(count(*) AS BIGINT) AS n_copies,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               min(doc_id) AS rep_doc_id
        FROM ch GROUP BY 1),
    r AS (
        SELECT ch.chunk_md5, min(chunk_id) AS rep_chunk_id
        FROM ch JOIN g ON ch.chunk_md5 = g.chunk_md5
                       AND ch.doc_id = g.rep_doc_id
        GROUP BY 1)
    SELECT g.chunk_md5, rep_doc_id, rep_chunk_id, n_copies, n_docs
    FROM g JOIN r ON g.chunk_md5 = r.chunk_md5
    """,
    survey="chunk-level dedup for the retrieval index: each distinct chunk embedded once, first-occurrence representative, min(struct) inside the aggregate (datapipe curation)",
)
def q_chunk_index_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe.curation import chunk_index_dedup

    return chunk_index_dedup(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# Boilerplate chunk detection, leakage-safe split, mixture execution,
# vocabulary-coverage curve
# ----------------------------------------------------------------------

from .datapipe.curation import (  # noqa: E402
    BOILER_MIN_DOCS,
    COVERAGE_TOPK,
    LEHMER_MOD,
    LEHMER_MUL,
    boilerplate_chunks,
    cluster_split,
    mixture_apply,
    token_coverage_curve,
)

_CHUNK_CTE = f"""
    toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE}))
                   AS start_pos
        FROM toks WHERE len(t) > 0),
    ch AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(t, start_pos + 1,
                              start_pos + {CHUNK_TOKENS}), ' '))
                   AS chunk_md5
        FROM starts)
"""


@register(
    "boilerplate_chunks",
    f"""
    WITH {_CHUNK_CTE},
    common AS (
        SELECT chunk_md5, 1 AS is_boiler
        FROM (SELECT chunk_md5, count(DISTINCT doc_id) AS nd
              FROM ch GROUP BY chunk_md5)
        WHERE nd >= {BOILER_MIN_DOCS})
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN is_boiler IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS boiler_chunks,
           CAST(floor(sum(CASE WHEN is_boiler IS NULL THEN 0 ELSE 1 END)
                      * 1000000 / count(*)) AS BIGINT) AS boiler_ppm
    FROM ch LEFT JOIN common USING (chunk_md5)
    GROUP BY doc_id
    """,
    survey="per-document boilerplate ratio: chunk fingerprints shared across documents — the CCNet line-dedup signal at the chunk unit (datapipe curation)",
)
def q_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_chunks(_docs(spark, sf_dir))


def _cluster_pct2_sql(col: str) -> str:
    from .datapipe.curation import LEHMER_MOD, LEHMER_MUL

    h1 = (
        f"(({col} % {LEHMER_MOD} + {LEHMER_MOD}) % {LEHMER_MOD})"
        f" * {LEHMER_MUL} % {LEHMER_MOD}"
    )
    return f"({h1}) * {LEHMER_MUL} % {LEHMER_MOD} % 100"


@register(
    "cluster_split",
    _MINHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS}, edges AS (
        SELECT doc_a, doc_b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT doc_id AS doc, doc_id AS r FROM documents
        UNION
        SELECT e.doc_a AS doc, reach.r
        FROM edges e JOIN reach ON e.doc_b = reach.doc
    ), labels AS (
        SELECT doc AS doc_id, min(r) AS cluster_id
        FROM reach GROUP BY doc
    )
    SELECT d.doc_id, d.source,
           CAST(l.cluster_id AS BIGINT) AS cluster_id,
           CAST({_cluster_pct2_sql("l.cluster_id")} AS INT) AS split_pct,
           CASE WHEN {_cluster_pct2_sql("l.cluster_id")} < 80
                    THEN 'train'
                WHEN {_cluster_pct2_sql("l.cluster_id")} < 90
                    THEN 'val'
                ELSE 'test' END AS split
    FROM documents d JOIN labels l ON l.doc_id = d.doc_id
    """,
    survey="leakage-safe train/val/test split: near-dup clusters assigned atomically by cluster-id hash (datapipe curation)",
)
def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_split(_docs(spark, sf_dir))


@register(
    "mixture_apply",
    f"""
    WITH per_doc AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents),
    m AS (SELECT min(inv) AS min_inv FROM (
        SELECT source, sum(n_tokens) AS inv FROM per_doc
        GROUP BY source)),
    c AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % {LEHMER_MOD} + {LEHMER_MOD})
                             % {LEHMER_MOD}) * {LEHMER_MUL}
                             % {LEHMER_MOD},
                            doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM per_doc)
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c, m WHERE cum_tokens <= min_inv
    """,
    survey="uniform-mixture execution: per-source greedy doc selection to the scarcest-source token budget (datapipe curation)",
)
def q_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_apply(_docs(spark, sf_dir, fan=False))


@register(
    "token_coverage_curve",
    f"""
    WITH tf AS (
        SELECT token, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS token
              FROM documents)
        GROUP BY token),
    total AS (SELECT sum(tf) AS total FROM tf),
    topk AS (SELECT token, tf FROM tf
             ORDER BY tf DESC, token LIMIT {COVERAGE_TOPK})
    SELECT CAST(row_number() OVER (ORDER BY tf DESC, token) AS INT)
               AS rank,
           token, tf,
           CAST(sum(tf) OVER (ORDER BY tf DESC, token
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_tf,
           CAST(floor(sum(tf) OVER (ORDER BY tf DESC, token
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 / total) AS BIGINT) AS coverage_ppm
    FROM topk, total
    """,
    survey="cumulative corpus coverage of the top-K tokens — the tokenizer-vocab sizing curve (datapipe curation)",
)
def q_token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_coverage_curve(_docs(spark, sf_dir, fan=False))


# ----------------------------------------------------------------------
# ANN recall audit: LSH scale path vs exact ground truth
# ----------------------------------------------------------------------

from .datapipe.similarity import ann_recall  # noqa: E402


@register(
    "ann_recall",
    f"WITH {_VEC_CTE}"
    + f""", epairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               floor(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                     * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ), exact AS (
        SELECT vec_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
            ) AS rank FROM epairs
        ) WHERE rank <= 3
    ), bucketed AS (
        SELECT vec_id, vec, nrm,
               CAST({_lsh_bucket_sql()} AS BIGINT) AS bucket
        FROM v
    ), bcand AS (
        -- candidate-side bucket cap, interpolated from
        -- similarity.LSH_BUCKET_CANDIDATE_CAP
        SELECT vec_id, vec, nrm, bucket FROM (
            SELECT *, row_number() OVER (
                PARTITION BY bucket ORDER BY vec_id
            ) AS brn FROM bucketed
        ) WHERE brn <= {LSH_BUCKET_CANDIDATE_CAP}
    ), apairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               floor(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                     * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM bucketed a JOIN bcand b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ), approx AS (
        SELECT vec_id, neighbor_id, 1 AS hit FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
            ) AS rank FROM apairs
        ) WHERE rank <= 3
    )
    SELECT label,
           CAST(count(DISTINCT e.vec_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hits,
           CAST(floor(coalesce(sum(hit), 0) * 1000000 / count(*))
                AS BIGINT) AS recall_ppm
    FROM exact e
    LEFT JOIN approx a USING (vec_id, neighbor_id)
    JOIN embeddings m ON m.vec_id = e.vec_id
    GROUP BY label
    """,
    survey="ANN recall@k audit: hyperplane-LSH vs exact ground truth, per label (datapipe similarity)",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_recall(_emb(spark, sf_dir), k=3)


# ----------------------------------------------------------------------
# Weighted mixture plan + dedup cluster-size histogram
# ----------------------------------------------------------------------

from .datapipe.curation import (  # noqa: E402
    MIX_DEFAULT_WEIGHT,
    MIX_WEIGHTS,
    mixture_plan_weighted,
)
from .datapipe.dedup import cluster_size_histogram  # noqa: E402


def _mix_rel_sql() -> str:
    branches = " ".join(
        f"WHEN '{src}' THEN {wt}" for src, wt in sorted(MIX_WEIGHTS.items())
    )
    return f"CASE source {branches} ELSE {MIX_DEFAULT_WEIGHT} END"


@register(
    "mixture_plan_weighted",
    f"""
    WITH tok AS (
        SELECT source,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    inv AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               {_mix_rel_sql()} AS w_rel
        FROM tok GROUP BY source),
    t AS (SELECT sum(w_rel) AS w_tot FROM inv),
    p AS (
        SELECT source, n_tokens,
               CAST(floor(w_rel * 1000000 / w_tot) AS BIGINT) AS w_ppm
        FROM inv, t),
    c AS (SELECT CAST(min(floor(n_tokens * 1000000 / w_ppm)) AS BIGINT)
              AS c_total FROM p)
    SELECT source, n_tokens, w_ppm,
           CAST(floor(c_total * w_ppm / 1000000) AS BIGINT)
               AS kept_tokens,
           CAST(floor(floor(c_total * w_ppm / 1000000) * 1000000
                      / n_tokens) AS BIGINT) AS keep_ppm
    FROM p, c
    """,
    survey="weighted-mixture rebalance plan: arbitrary target domain shares bounded by the first source to run out (datapipe curation)",
)
def q_mixture_plan_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_plan_weighted(_docs(spark, sf_dir))


@register(
    "mixture_plan_temperature",
    """
    WITH tok AS (
        SELECT source,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    inv AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(floor(sqrt(CAST(count(*) AS BIGINT))) AS BIGINT)
                   AS w_rel
        FROM tok GROUP BY source),
    t AS (SELECT sum(w_rel) AS w_tot FROM inv),
    p AS (
        SELECT source, n_tokens,
               CAST(floor(w_rel * 1000000 / w_tot) AS BIGINT) AS w_ppm
        FROM inv, t),
    c AS (SELECT CAST(min(CASE WHEN w_ppm > 0 THEN
                   floor(n_tokens * 1000000 / w_ppm) END) AS BIGINT)
              AS c_total FROM p)
    SELECT source, n_tokens, w_ppm,
           CAST(floor(c_total * w_ppm / 1000000) AS BIGINT)
               AS kept_tokens,
           CAST(floor(floor(c_total * w_ppm / 1000000) * 1000000
                      / n_tokens) AS BIGINT) AS keep_ppm
    FROM p, c
    """,
    survey="temperature-smoothed (alpha=1/2) mixture plan: XLM-R/mT5 alpha-sampling shape, weights derived from the inventory in-plan, IEEE-exact via correctly-rounded sqrt (datapipe curation)",
)
def q_mixture_plan_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .datapipe.curation import mixture_plan_temperature

    return mixture_plan_temperature(
        _docs(spark, sf_dir)
    )


# ----------------------------------------------------------------------
# BPE tokenizer training (datapipe/bpe.py) — the oracle unrolls the
# SAME K merge steps as CTE chains (the emb_pq/emb_ivf pattern):
# exact integer pair counts over the word-frequency table, argmax
# with (cnt DESC, lhs, rhs) binary-collation tiebreak, and the
# probed-identical left-to-right non-rescanning replace applying
# each merge. The coalesce(chr(30)) guard makes a dried-up step a
# no-op instead of a NULL replace (chr(30)/chr(31) words are
# excluded from training on both sides).
# ----------------------------------------------------------------------

from .datapipe import bpe as bpe_mod  # noqa: E402


def _bpe_step_sql(i: int) -> str:
    prev = f"bpe_s{i - 1}"
    return f"""
, bpe_p{i} AS MATERIALIZED (
    SELECT t[pos] AS s1, t[pos + 1] AS s2,
           CAST(sum(wc) AS BIGINT) AS cnt
    FROM (
        SELECT wc, unnest(generate_series(1, len(t) - 1)) AS pos, t
        FROM (SELECT wc, string_split(seq, chr(31)) AS t FROM {prev})
        WHERE len(t) >= 2
    ) GROUP BY s1, s2
)
, bpe_b{i} AS MATERIALIZED (
    SELECT s1, s2, cnt FROM bpe_p{i} ORDER BY cnt DESC, s1, s2 LIMIT 1
)
, bpe_s{i} AS MATERIALIZED (
    SELECT w, wc, replace(seq,
        coalesce((SELECT s1 || chr(31) || s2 FROM bpe_b{i}), chr(30)),
        coalesce((SELECT s1 || s2 FROM bpe_b{i}), chr(30))) AS seq
    FROM {prev}
)"""


_BPE_CTE = (
    """
bpe_w AS (
    SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        SELECT unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS w
        FROM documents
    ) WHERE NOT contains(w, chr(31)) AND NOT contains(w, chr(30))
    GROUP BY w
),
bpe_s0 AS MATERIALIZED (
    SELECT w, wc, array_to_string(string_split(w, ''), chr(31)) AS seq
    FROM bpe_w
)"""
    + "".join(_bpe_step_sql(i) for i in range(1, bpe_mod.BPE_K + 1))
)

_BPE_SELECT = "\nUNION ALL ".join(
    f"SELECT CAST({i} AS INT) AS step, s1 AS lhs, s2 AS rhs,"
    f" cnt AS pair_count FROM bpe_b{i}"
    for i in range(1, bpe_mod.BPE_K + 1)
)


@register(
    "bpe_train_merges",
    f"WITH {_BPE_CTE}\n{_BPE_SELECT}",
    survey="BPE tokenizer TRAINING: the full K-step merge loop over the word-frequency table (Sennrich ACL'16), merge table = the model (datapipe)",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_mod.bpe_train(_docs(spark, sf_dir))


@register(
    "bpe_apply_vocab",
    f"WITH {_BPE_CTE}"
    + f"""
    SELECT w, wc,
           CAST(len(string_split(seq, chr(31))) AS BIGINT)
               AS n_subwords,
           replace(seq, chr(31), ' ') AS subwords
    FROM bpe_s{bpe_mod.BPE_K}
    """,
    survey="BPE tokenizer APPLY: the trained merge table segmenting the vocabulary — (word, count, n_subwords, segmentation) (datapipe)",
)
def q_bpe_apply_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_mod.bpe_apply_vocab(
        _docs(spark, sf_dir)
    )


@register(
    "cluster_size_histogram",
    _MINHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""", stacked AS ({_BAND_STACK}),{_CAPPED_PAIRS}, edges AS (
        SELECT doc_a, doc_b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT doc_id AS doc, doc_id AS r FROM documents
        UNION
        SELECT e.doc_a AS doc, reach.r
        FROM edges e JOIN reach ON e.doc_b = reach.doc
    ), labels AS (
        SELECT doc AS doc_id, min(r) AS cluster_id
        FROM reach GROUP BY doc
    ), sizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        FROM labels GROUP BY cluster_id
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS dup_docs
    FROM sizes GROUP BY cluster_size
    """,
    survey="dedup cluster-size histogram: unique vs redundant document mass per cluster size (datapipe reporting)",
)
def q_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_size_histogram(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# Audit rollups: language-ID confusion matrix + Jaccard band report
# ----------------------------------------------------------------------

from .registry import QUERIES as _Q  # noqa: E402


@register(
    "langid_confusion",
    f"""
    WITH liq AS ({_Q["text_langid"].oracle})
    SELECT declared_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM liq GROUP BY declared_lang, predicted_lang
    """,
    survey="language-ID confusion matrix: heuristic prediction vs declared label (datapipe audit)",
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit that says whether the lang-ID heuristic can be
    trusted for filtering: per (declared, predicted) cell counts.
    Map-only scoring (the per-doc heuristic is all expression work)
    + one rollup bounded by langs² — no shuffle of document text."""
    from .datapipe.textstats import lang_id

    return (
        lang_id(_docs(spark, sf_dir))
        .groupBy("declared_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "jaccard_band_report",
    f"""
    WITH jpairs AS ({_Q["dedup_ngram_jaccard"].oracle})
    SELECT CAST(floor(jaccard * 10) AS INT) AS band_lo_tenths,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(n_common) AS BIGINT) AS min_common,
           CAST(max(n_common) AS BIGINT) AS max_common
    FROM jpairs GROUP BY 1
    """,
    survey="near-dup threshold tuning curve: verified-pair counts per Jaccard decile band (datapipe audit)",
)
def q_jaccard_band_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where to SET the dedup threshold: verified pair counts per
    Jaccard decile. Banding is deterministic because the verifier's
    jaccard is already floor-rounded at 6dp identically on both
    engines. One tiny rollup on top of the capped verifier — the
    pair set is already DF-cap bounded."""
    from .datapipe.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.05
    )
    return (
        pairs.groupBy(
            F.floor(F.col("jaccard") * 10).cast("int").alias(
                "band_lo_tenths"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min("n_common").cast("long").alias("min_common"),
            F.max("n_common").cast("long").alias("max_common"),
        )
    )


# ----------------------------------------------------------------------
# Packing efficiency report
# ----------------------------------------------------------------------


@register(
    "pack_fill_report",
    f"""
    WITH packed AS ({_Q["pack_sequences"].oracle})
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(max(bin_last) + 1 AS BIGINT) AS n_bins,
           CAST(floor(sum(n_tokens) * 1000000
                      / ((max(bin_last) + 1) * {PACK_BUDGET}))
                AS BIGINT) AS fill_ppm
    FROM packed GROUP BY bucket
    """,
    survey="sequence-packing efficiency: per-stream token fill rate vs the padding budget (datapipe curation audit)",
)
def q_pack_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What packing is FOR: the fraction of each packing stream's
    token budget actually filled (the rest is padding waste a
    trainer pays for). One rollup keyed by the bucket id on top of
    pack_sequences' windowed layout; fill_ppm is integer-exact."""
    from .datapipe.curation import PACK_BUDGET, pack_sequences

    packed = pack_sequences(_docs(spark, sf_dir))
    return packed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (F.max("bin_last") + 1).cast("long").alias("n_bins"),
        F.floor(
            F.sum("n_tokens")
            * F.lit(1_000_000)
            / ((F.max("bin_last") + 1) * F.lit(PACK_BUDGET))
        )
        .cast("long")
        .alias("fill_ppm"),
    )


# ----------------------------------------------------------------------
# Diversified retrieval (MMR re-rank)
# ----------------------------------------------------------------------


from .datapipe.retrieval import mmr_oracle_sql, mmr_topk  # noqa: E402


@register(
    "emb_mmr_topk",
    mmr_oracle_sql(),
    survey="MMR-diversified top-k retrieval: integer-exact greedy re-rank of the per-query ANN shortlist (datapipe similarity; Carbonell&Goldstein SIGIR'98)",
)
def q_emb_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The de-redundancy pass of a retrieval / data-selection
    pipeline: top-C shortlist per probe query (broadcast NLJ,
    map-side over candidates), then a grouped-map greedy MMR
    selection over the ≤C-row shortlist — one qid shuffle, O(C²K)
    local integer work per query, parallel in nq. λ=1/2 scaled into
    BIGINT so the unrolled 5-step DuckDB oracle hashes bit-for-bit."""
    return mmr_topk(_emb(spark, sf_dir))


# ----------------------------------------------------------------------
# Iterative graph analytics (PageRank)
# ----------------------------------------------------------------------


from .operators.graph import pagerank_oracle_sql, supply_pagerank  # noqa: E402


@register(
    "graph_pagerank",
    pagerank_oracle_sql(),
    survey="integer-exact PageRank over the supplier→customer supply graph: dangling-mass redistribution, 2 wide stages per iteration, unrolled-CTE oracle (graph analytics)",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with BIGINT ppt ranks and truncating-division
    arithmetic identical on both engines (operators/graph.py). Four
    fixed iterations; lineage cut per round with localCheckpoint
    exactly like dedup._star_components."""
    return supply_pagerank(spark, sf_dir)


# ----------------------------------------------------------------------
# Data layout: Z-order clustering + zone-map skipping audit
# ----------------------------------------------------------------------


from .operators.layout import (  # noqa: E402
    skipping_audit,
    skipping_audit_oracle_sql,
    zorder_oracle_sql,
    zorder_zone_maps,
)


@register(
    "layout_zorder",
    zorder_oracle_sql(),
    survey="Z-order (Morton) layout assignment + per-file zone maps: map-only bit interleave, one groupBy, no global sort (data layout)",
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPTIMIZE-ZORDER layout pass: fold both keys to a 16-bit
    budget, interleave bits (generated expression shared with the
    oracle), assign fixed z-range files, emit each file's zone map
    (operators/layout.py)."""
    return zorder_zone_maps(tables.load(spark, sf_dir, "lineitem"))


@register(
    "layout_skipping_audit",
    skipping_audit_oracle_sql(),
    survey="zone-map skipping audit: summed per-file key spans under natural vs z-order layout — the pruning win, quantified (data layout)",
)
def q_layout_skipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Why z-order: 2-row integer comparison of expected pruning
    (summed per-file spans per dimension) between the single-key
    natural layout and the Morton layout."""
    return skipping_audit(tables.load(spark, sf_dir, "lineitem"))


# ----------------------------------------------------------------------
# Lexical retrieval (BM25)
# ----------------------------------------------------------------------


from .datapipe.bm25 import bm25_oracle_sql, bm25_topk  # noqa: E402


@register(
    "bm25_topk",
    bm25_oracle_sql(),
    survey="BM25 lexical top-k: map-side query-term filter (no inverted index materialized), integer-exact rational idf/saturation (datapipe retrieval; Robertson TREC-3)",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval beside the embedding ANN tiers: postings
    for the probe terms only (filter inside the explode map stage),
    1-row corpus stats broadcast, integer ppm scoring, per-query
    top-k window (datapipe/bm25.py)."""
    return bm25_topk(_docs(spark, sf_dir))


# ----------------------------------------------------------------------
# Market-basket mining (A-priori frequent pairs)
# ----------------------------------------------------------------------


from .operators.basket import basket_pairs, basket_pairs_oracle_sql  # noqa: E402


@register(
    "basket_pairs",
    basket_pairs_oracle_sql(),
    survey="A-priori frequent item pairs with confidence/lift: frequent-item semi-join prune BEFORE pair generation (AQE-chosen strategy), co-partitioned within-basket self-join, capped basket size (operators/basket.py; Agrawal&Srikant VLDB'94)",
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent (part, part) co-purchase pairs over orders with
    integer ppm confidence/lift — the candidate space is pruned by
    the A-priori property before any pair exists."""
    return basket_pairs(tables.load(spark, sf_dir, "lineitem"))


# ----------------------------------------------------------------------
# Column profiling (ANALYZE-style exact stats)
# ----------------------------------------------------------------------


from .operators.profile import profile_columns, profile_oracle_sql  # noqa: E402


@register(
    "profile_lineitem",
    profile_oracle_sql(),
    survey="ANALYZE-style column profile: exact per-column row/null/NDV stats in one Expand pass — the exact tier the HLL sketch family is audited against (operators/profile.py)",
)
def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO/data-quality stats for 7 lineitem columns: one scan, one
    wide aggregate (Expand + partial distinct sets), 7 output rows."""
    return profile_columns(tables.load(spark, sf_dir, "lineitem"))


# ----------------------------------------------------------------------
# Count-min sketch heavy-hitter audit
# ----------------------------------------------------------------------


from .operators.cms import cms_heavy_hitters, cms_oracle_sql  # noqa: E402


@register(
    "cms_heavy_hitters",
    cms_oracle_sql(),
    survey="count-min sketch heavy-hitter audit: fixed d*w integer grid built from pre-aggregated counts (map-side combine), min-over-rows estimate vs exact, one-sided error quantified (operators/cms.py; Cormode&Muthukrishnan '05)",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable frequency sketch beside the HLL family: exact
    top-20 l_partkey counts joined against the broadcast 4x256 cell
    grid; cms_est >= exact always, over_ppm is the collision cost."""
    return cms_heavy_hitters(tables.load(spark, sf_dir, "lineitem"))


# ----------------------------------------------------------------------
# Streaming-mergeable CMS: hourly cell grid (batch twin)
# ----------------------------------------------------------------------


from .operators.cms import (  # noqa: E402
    CMS_DEPTH,
    _col_expr,
    events_cms_cells,
)


def _cms_cells_oracle() -> str:
    hash_rows = "\n    UNION ALL\n".join(
        f"    SELECT ts, {t} AS t, ({_col_expr('user_id', t)}) AS col"
        " FROM events"
        for t in range(CMS_DEPTH)
    )
    return f"""
WITH hashed AS (
{hash_rows}
)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       t, col, CAST(count(*) AS BIGINT) AS cell
FROM hashed GROUP BY 1, 2, 3"""


@register(
    "events_cms_cells",
    _cms_cells_oracle(),
    survey="hourly count-min cell grid over the event stream: the windowed-sketch state a streaming heavy-hitter job maintains in O(d*w) — batch twin of streaming.windows.cms_cells, stream==batch pinned (operators/cms.py)",
)
def q_events_cms_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour 4x256 user_id CMS: a plain windowed count over the
    (t, col) explode — mergeable across windows by cell addition,
    which is exactly why the streaming twin needs no custom state."""
    return events_cms_cells(tables.load_events(spark, sf_dir))


from .operators.layout import rle_audit, rle_audit_oracle_sql  # noqa: E402


@register(
    "layout_rle_audit",
    rle_audit_oracle_sql(),
    survey="RLE encoding audit: value-run counts per key dimension under natural vs z-order layout — the encoding face of the zone-map tradeoff (data layout)",
)
def q_layout_rle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many RLE runs each layout's files store per dimension:
    dedup-before-window run counting over the collapsed (file, key)
    groups (deterministic without a raw-row tiebreak)."""
    return rle_audit(tables.load(spark, sf_dir, "lineitem"))


from .datapipe.bm25 import phrase_match, phrase_match_oracle_sql  # noqa: E402


@register(
    "phrase_match",
    phrase_match_oracle_sql(),
    survey="exact phrase queries via map-side n-gram streams: no positional-postings join, only matching n-grams shuffle (datapipe retrieval)",
)
def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-token phrase matching (lengths 2-3) against the
    shingle-shaped n-gram stream; the literal-phrase filter runs
    inside the explode stage (datapipe/bm25.py)."""
    return phrase_match(_docs(spark, sf_dir))


from .operators.skewstats import skew_report, skew_report_oracle_sql  # noqa: E402


@register(
    "skew_report",
    skew_report_oracle_sql(),
    survey="join-key skew diagnosis: exact Gini + top-1/top-10 shares per audited key column — the measurement behind the salting/AQE decisions (operators/skewstats.py)",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What to check before picking a join strategy: integer-exact
    Gini and heavy-key shares of the per-key count distribution for
    three join keys; the global rank runs over the count table, not
    the data."""
    return skew_report(spark, sf_dir)


from .operators.cms import join_size_estimate, join_size_oracle_sql  # noqa: E402


@register(
    "join_size_estimate",
    join_size_oracle_sql(),
    survey="CBO join-cardinality estimation: CMS/AMS grid inner product vs the exact count-product, one-sided error in ppm (operators/cms.py)",
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|lineitem ⋈ orders| from two 4x256 grids (mergeable,
    map-side) audited against the exact co-keyed count product —
    the estimate a CBO would use where the exact join is exactly
    what it cannot afford to run."""
    return join_size_estimate(
        tables.load(spark, sf_dir, "lineitem"),
        tables.load(spark, sf_dir, "orders"),
    )


# ----------------------------------------------------------------------
# SCD2: composition validity intervals (gaps-and-islands)
# ----------------------------------------------------------------------


@register(
    "scd2_composition",
    f"""
    WITH idx AS MATERIALIZED ({{IDX}}),
    flagged AS (
        SELECT date, composition,
               CASE WHEN lag(composition) OVER (ORDER BY date)
                         IS DISTINCT FROM composition
                    THEN 1 ELSE 0 END AS chg
        FROM idx
    ), versioned AS (
        SELECT date, composition,
               CAST(sum(chg) OVER (ORDER BY date
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        FROM flagged
    )
    SELECT version, min(date) AS valid_from, max(date) AS valid_to,
           any_value(composition) AS composition,
           CAST(count(*) AS BIGINT) AS n_days
    FROM versioned GROUP BY version
    """.replace("{IDX}", "PLACEHOLDER"),
    survey="SCD2 dimension build: composition validity intervals via gaps-and-islands (change flag -> running version -> island rollup) over the index series (warehouse pattern)",
)
def q_scd2_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension materialization of the
    index composition: [valid_from, valid_to] per distinct
    consecutive composition. The global windows run over the
    |dates|-row index series — the same documented bounded case as
    W3/W4 — never the fact table."""
    from pyspark.sql.window import Window

    idx = _Q["index_daily"].fn(spark, sf_dir).select(
        "date", "composition"
    )
    wo = Window.orderBy("date")
    flagged = idx.select(
        "date",
        "composition",
        F.when(
            ~F.lag("composition").over(wo).eqNullSafe(
                F.col("composition")
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    versioned = flagged.select(
        "date",
        "composition",
        F.sum("chg")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("version"),
    )
    return versioned.groupBy("version").agg(
        F.min("date").alias("valid_from"),
        F.max("date").alias("valid_to"),
        F.first("composition").alias("composition"),
        F.count("*").cast("long").alias("n_days"),
    )


# The oracle references the index_daily oracle text; splice it in
# now that _Q is importable (decorator ran with a placeholder).
_Q["scd2_composition"].oracle = _Q["scd2_composition"].oracle.replace(
    "PLACEHOLDER", _Q["index_daily"].oracle
)


from .operators.layout import compaction_plan, compaction_plan_oracle_sql  # noqa: E402


@register(
    "layout_compaction_plan",
    compaction_plan_oracle_sql(),
    survey="small-file compaction plan: z-adjacent files binned to a target size by prefix-sum assignment — the rewrite manifest that completes the layout lifecycle (data layout)",
)
def q_layout_compaction_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """assign (layout_zorder) → audit (skipping/rle) → COMPACT:
    deterministic bin manifest merging adjacent z-files up to
    ~COMPACT_TARGET_ROWS (operators/layout.py)."""
    return compaction_plan(tables.load(spark, sf_dir, "lineitem"))


from .operators.basket import copurchase_triangles, triangles_oracle_sql  # noqa: E402


@register(
    "graph_triangles",
    triangles_oracle_sql(_Q["basket_pairs"].oracle),
    survey="triangle census + transitivity of the co-purchase graph: single-representation ordered wedge join over canonical edges (graph analytics)",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each triangle counted exactly once via its unique a<b<c
    wedge; edges are the A-priori pair-mining output, lineage-cut
    before the two equi-joins (operators/basket.py)."""
    return copurchase_triangles(tables.load(spark, sf_dir, "lineitem"))


from .operators.graph import (  # noqa: E402
    copurchase_pagerank,
    copurchase_pagerank_oracle_sql,
)


@register(
    "graph_pagerank_weighted",
    copurchase_pagerank_oracle_sql(_Q["basket_pairs"].oracle),
    survey="weighted PageRank over the symmetrized co-purchase graph (edge weight = pair support): product centrality with the same integer contract as graph_pagerank (graph analytics)",
)
def q_graph_pagerank_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rank flows out proportionally to support: contrib = (r·w)
    div strength. Symmetric edges → no dangling, path kept live for
    empty-pair fuzz shapes (operators/graph.py)."""
    return copurchase_pagerank(spark, sf_dir)


from .operators.graph import (  # noqa: E402
    copurchase_kcore,
    copurchase_kcore_oracle_sql,
)


@register(
    "graph_kcore",
    copurchase_kcore_oracle_sql(_Q["basket_pairs"].oracle),
    survey="k-core decomposition of the co-purchase graph: fixed-round degree peeling with a min-core-degree convergence certificate (graph analytics)",
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative peel: degree count + two semi-join prunes per
    round, lineage-cut per round; the certificate column proves
    (not assumes) convergence (operators/graph.py)."""
    return copurchase_kcore(spark, sf_dir)


from .operators.basket import (  # noqa: E402
    item_recommendations,
    item_recommendations_oracle_sql,
)


@register(
    "item_recommendations",
    item_recommendations_oracle_sql(_Q["basket_pairs"].oracle),
    survey="'customers also bought' serving table: symmetrized pair-mining output, per-item top-k partners by lift with per-direction confidence (operators/basket.py)",
)
def q_item_recommendations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-5 partners per item by lift over the symmetrized
    frequent-pair graph; reverse-direction confidence re-derived
    from the broadcast item supports; one item-keyed window."""
    return item_recommendations(tables.load(spark, sf_dir, "lineitem"))


from .operators.rfm import customer_rfm, customer_rfm_oracle_sql  # noqa: E402


@register(
    "customer_rfm",
    customer_rfm_oracle_sql(),
    survey="RFM customer segmentation: integer-exact recency/frequency/monetary quintile scores via closed-form rank buckets (not ntile), classic segment labels (warehouse analytics)",
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse scoring pass: one custkey groupBy, three rank
    windows over the customer table, engine-proof quintiles
    ((rank-1)*5 div n + 1 — never ntile) (operators/rfm.py)."""
    return customer_rfm(tables.load(spark, sf_dir, "orders"))


# ----------------------------------------------------------------------
# Funnel time-to-convert: exact percentiles
# ----------------------------------------------------------------------


@register(
    "funnel_time_percentiles",
    """
WITH ev AS (
    -- epoch_us truncates TIMESTAMP_NS to micros, matching the Spark
    -- side's normalize_events_ts (tables.py): both engines compare
    -- and subtract micros-truncated values, so the strict > filters
    -- and durations agree even if events ever carry sub-us parts.
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS us
    FROM events
), v AS (
    SELECT user_id, min(us) AS t1 FROM ev
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.us) AS t2, min(v.t1) AS t1
    FROM ev e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.us > v.t1
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.us) AS t3, min(c.t2) AS t2
    FROM ev e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.us > c.t2
    GROUP BY e.user_id
), durs AS (
    SELECT 'view_to_click' AS transition, user_id,
           CAST(t2 - t1 AS BIGINT) AS dur_us
    FROM c
    UNION ALL
    SELECT 'click_to_purchase', user_id,
           CAST(t3 - t2 AS BIGINT)
    FROM p
), ranked AS (
    SELECT transition, dur_us,
           CAST(row_number() OVER (
               PARTITION BY transition
               ORDER BY dur_us, user_id) AS BIGINT) AS rk,
           CAST(count(*) OVER (PARTITION BY transition) AS BIGINT)
               AS n
    FROM durs
)
SELECT transition, CAST(max(n) AS BIGINT) AS n_conversions,
       max(CASE WHEN rk = (n * 50 + 99) // 100 THEN dur_us END)
           AS p50_us,
       max(CASE WHEN rk = (n * 90 + 99) // 100 THEN dur_us END)
           AS p90_us,
       max(CASE WHEN rk = (n * 99 + 99) // 100 THEN dur_us END)
           AS p99_us
FROM ranked GROUP BY transition
    """,
    survey="ordered-funnel time-to-convert with EXACT closed-form percentiles (rank = ceil(n*p/100), never an approx or interpolating percentile) over per-user first-transition durations (event analytics)",
)
def q_funnel_time_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """view→click→purchase latency: per-user first ordered
    transitions (strictly increasing ts), integer microsecond
    durations, exact nearest-rank percentiles computed by a
    closed-form rank pick — deterministic on both engines where
    interpolating percentile_cont/approx sketches are not. Three
    co-keyed user groupBys + one transition-keyed window over the
    conversions table (users-sized, ≪ events)."""
    from pyspark.sql.window import Window

    ev = tables.load_events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t2").alias("t2"))
    )
    d12 = c.select(
        F.lit("view_to_click").alias("transition"),
        "user_id",
        (F.unix_micros("t2") - F.unix_micros("t1")).alias("dur_us"),
    )
    d23 = p.select(
        F.lit("click_to_purchase").alias("transition"),
        "user_id",
        (F.unix_micros("t3") - F.unix_micros("t2")).alias("dur_us"),
    )
    durs = d12.unionByName(d23)
    w = Window.partitionBy("transition").orderBy(
        F.asc("dur_us"), F.asc("user_id")
    )
    ranked = durs.select(
        "transition",
        "dur_us",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count("*")
        .over(Window.partitionBy("transition"))
        .cast("long")
        .alias("n"),
    )
    pick = (
        lambda pct: F.max(
            F.when(
                F.col("rk")
                == F.expr(f"(n * {pct} + 99) div 100"),
                F.col("dur_us"),
            )
        ).alias(f"p{pct}_us")
    )
    return ranked.groupBy("transition").agg(
        F.max("n").cast("long").alias("n_conversions"),
        pick(50),
        pick(90),
        pick(99),
    )


# ----------------------------------------------------------------------
# Per-source retention budgets (datapipe/budget.py)
# ----------------------------------------------------------------------


from .datapipe.budget import (  # noqa: E402
    domain_cap_oracle_sql,
    domain_cap_report,
    token_budget_oracle_sql,
    token_budget_prefix,
)


@register(
    "source_domain_cap",
    domain_cap_oracle_sql(),
    survey="per-source domain-frequency cap: keep the N quality-ranked docs per source, kept/dropped report with ranking checksum (CCNet-style corpus bounding; WindowGroupLimit pre-truncates map-side)",
)
def q_source_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain cap over the documents table: row_number per source
    (rank-filter rewritten to WindowGroupLimit, so hot domains are
    truncated before the shuffle), then a same-keyed report
    aggregate (datapipe/budget.py)."""
    return domain_cap_report(_docs(spark, sf_dir))


@register(
    "token_budget_prefix",
    token_budget_oracle_sql(),
    survey="per-source token-budget prefix selection: quality-ordered running token sum per source, select while within allowance, integer-ppm utilization report (training-mix token budgeting)",
)
def q_token_budget_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget prefix over documents: one per-source cumsum
    window + report aggregate, integer-exact ppm utilization
    (datapipe/budget.py)."""
    return token_budget_prefix(_docs(spark, sf_dir))


from .datapipe.snm import snm_candidate_pairs, snm_oracle_sql  # noqa: E402


@register(
    "dedup_sorted_neighborhood",
    snm_oracle_sql(),
    survey="multi-pass sorted-neighborhood dedup blocking: prefix + reversed-prefix 6-char keys, per-block rank windows, equi-join gap pairing (candidates linear in N, never all-pairs), integer trigram-Jaccard verification (dedup family)",
)
def q_dedup_sorted_neighborhood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SNM candidate generation + verification: per-block windows
    (a hot block costs |block|*(W-1) pairs, still linear), explode-
    a-gap EQUI-join pairing, trigram sets joined back onto the
    small pair list only (datapipe/snm.py)."""
    return snm_candidate_pairs(_docs(spark, sf_dir))


from .operators.layout import (  # noqa: E402
    bloom_audit,
    bloom_audit_oracle_sql,
)


@register(
    "layout_bloom_audit",
    bloom_audit_oracle_sql(),
    survey="per-file Bloom-filter skipping audit: 61-bit 2-hash bloom word per z-order file over the folded partkey, exact false-positive rate vs a deterministic probe set (point-lookup pruning where zone maps fail; data-layout family)",
)
def q_layout_bloom_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy(file) bit_or builds every file's bloom word; a
    file-grain broadcast probe join measures exact FPR — the number
    that sizes m/k before paying for real Parquet/Iceberg bloom
    columns (operators/layout.py)."""
    return bloom_audit(tables.load(spark, sf_dir, "lineitem"))


from .operators.basket import (  # noqa: E402
    basket_triples,
    basket_triples_oracle_sql,
)


@register(
    "basket_triples",
    basket_triples_oracle_sql(),
    survey="A-priori level-3 frequent triples with wide-decimal 3-way lift (downward-closure-pruned, basket-capped ordered self-joins; mining family)",
)
def q_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-1 prune -> capped ordered self-joins -> HAVING (sound
    by downward closure); lift3 runs in DECIMAL(38,0)/HUGEINT and
    casts only the final ppm (operators/basket.py)."""
    return basket_triples(tables.load(spark, sf_dir, "lineitem"))


from .datapipe.textstats import (  # noqa: E402
    collocations,
    collocations_oracle_sql,
)


@register(
    "text_collocations",
    collocations_oracle_sql(TOKS_CTE),
    survey="bigram collocations by integer lift (float-free PMI stand-in): token-instance counts, min-support pruned, wide-decimal product (text analysis family)",
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode + two-phase groupBy per grain (hot tokens absorb
    map-side), vocab-keyed equi-joins for unigram attach, decimal
    lift (datapipe/textstats.py)."""
    return collocations(_docs(spark, sf_dir))


from .datapipe.similarity import (  # noqa: E402
    emb_dim_stats,
    emb_dim_stats_oracle_sql,
)


@register(
    "emb_dim_stats",
    emb_dim_stats_oracle_sql(),
    survey="per-dimension embedding statistics (quantized sum, mean square, min/max): the feature-standardization pass before normalization/ANN indexing; sign-safe integer outputs (similarity family)",
)
def q_emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode a 1..EMB_DIM literal + element_at, map-side combine
    on the 64-value dim key, DECIMAL(38,0) square sums
    (datapipe/similarity.py)."""
    return emb_dim_stats(_emb(spark, sf_dir))
