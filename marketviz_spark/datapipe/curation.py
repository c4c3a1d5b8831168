"""Corpus-curation operators for training-data pipelines:
Gopher-style repetition filters, benchmark decontamination, and
deterministic stratified sampling for dataset mixing.

Scale design (all three must survive 100 TB):
- repetition_stats: token n-gram occurrence counting as
  explode -> groupBy(doc_id, n, gram) -> groupBy(doc_id, n) ->
  groupBy(doc_id). Every shuffle key embeds doc_id, so the key space
  is at least as fine as the document space — uniform by
  construction, no skew, and partial aggregation (map-side combine)
  collapses each document's grams before the exchange. Nothing is
  ever buffered per document (a 10M-token document costs rows, not
  memory), unlike the obvious array-based formulation
  (array_max over per-doc count maps), which is O(L^2) per doc in
  the lambda-based form and O(L) heap in the map-based form.
- decontaminate: the eval/benchmark set is small by definition
  (thousands of docs), so its distinct shingle set is broadcast;
  the corpus side stays map-only until one groupBy(doc_id) count.
  No corpus-vs-corpus join ever happens.
- sample_stratified: pure map-only projection + filter, zero
  shuffle. The sampling decision is a deterministic integer hash of
  doc_id (Lehmer/Park-Miller step, modulus 2^31-1), NOT rand():
  re-running the pipeline re-selects the same rows (idempotent
  ingestion), and the same arithmetic is exactly reproducible in
  any SQL engine for auditing. All operands stay < 2^47 so the
  arithmetic never overflows int64 in either engine.
- pack_sequences: GPT-style concat-and-chunk packing. Documents are
  Lehmer-hashed into PACK_BUCKETS independent token streams; inside
  a bucket a window cumsum (spillable sort, never a per-group
  buffer) assigns each document its global token offset and the
  range of fixed-size training bins it lands in. Parallelism is the
  bucket count — set it to a small multiple of the cluster's cores
  and the single ordered window (the one inherently sequential part
  of packing) shards uniformly.
- pii_stats / pii_scrub: map-only JVM regex (RE2/Java common
  subset — no lookaround, no backrefs — so any SQL engine audits
  the exact same matches). Detection counts and redaction never
  shuffle.
- vocab_topk: explode -> two-phase groupBy(token). Hot tokens ("the")
  are exactly the keys partial aggregation collapses map-side, so
  token skew never reaches the exchange; the global top-K is a
  TakeOrdered (per-partition heap + driver merge of K rows), not a
  full sort.

Reference parity note: the reference app (MarketViz) has no corpus
layer at all (SURVEY.md §2.11 lists what it lacks); these operators
extend the engine for its target deployment (LLM training-data
preparation), first-class like the rest of the datapipe surface
(COVERAGE.md "datapipe" rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..numerics import rnd
from .dedup import gram_array, shingles
from .textstats import tokens

# Repetition thresholds (Gopher-style "repetitive document" gates),
# calibrated so the synthetic corpus splits on both clauses.
TOP_BIGRAM_FRAC_MAX = 0.125
DUP_TRIGRAM_FRAC_MAX = 0.05
# Below this many tokens the bigram signal has no resolution: a doc
# with ALL-unique bigrams still has top_bigram_frac = 2/n > 0.125
# when n < 16, so every short doc would be flagged. Short docs are a
# length-filter concern (textstats quality score), not a repetition
# one — the flag is forced false under the floor.
REP_MIN_TOKENS = 16

# Decontamination: eval split selector and the shared-shingle count
# at which a corpus document counts as contaminated.
EVAL_MOD = 50
CONTAM_MIN_SHARED = 2

# Stratified sampling: per-source keep-percentages (dataset mixing
# weights); sources absent from the map fall back to DEFAULT_RATE.
SAMPLE_RATES = {"src0": 90, "src1": 75, "src2": 50, "src3": 10}
DEFAULT_RATE = 30
LEHMER_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)
LEHMER_MUL = 48271


def _gram_occurrences(docs: DataFrame, n: int) -> DataFrame:
    """ALL n-gram occurrences (non-distinct) per document:
    (doc_id, n_tokens, gram). Contrast dedup.shingles, which is
    DISTINCT per doc — repetition counting needs multiplicity; the
    gram construction itself is the shared dedup.gram_array."""
    tk = docs.select("doc_id", tokens().alias("_t"))
    t = F.col("_t")
    return tk.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.explode(gram_array(t, n)).alias("gram"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document:

    - top_bigram_frac: tokens covered by the most frequent bigram
      (count * 2 / n_tokens) — catches "foo bar foo bar foo bar"
      boilerplate;
    - dup_trigram_frac: fraction of trigram occurrences whose gram
      appears more than once in the document — catches longer-span
      self-repetition;
    - repetitive: either signal over its threshold, AND the document
      is at least REP_MIN_TOKENS long (below that the bigram ratio is
      saturated by construction; see the constant's comment).

    Documents shorter than 2 tokens have no bigrams and are absent
    from the output (nothing to measure), matching the oracle.
    """
    occ = _gram_occurrences(docs, 2).select(
        "doc_id", "n_tokens", F.lit(2).alias("n"), "gram"
    ).unionByName(
        _gram_occurrences(docs, 3).select(
            "doc_id", "n_tokens", F.lit(3).alias("n"), "gram"
        )
    )
    per_gram = occ.groupBy("doc_id", "n", "gram").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count("*").alias("cnt"),
    )
    per_n = per_gram.groupBy("doc_id", "n").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max("cnt").alias("top"),
        F.sum("cnt").alias("tot"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias(
            "dup"
        ),
    )
    two, three = F.col("n") == 2, F.col("n") == 3
    per_doc = per_n.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max(F.when(two, F.col("top"))).alias("top_bigram_count"),
        # a 2-token doc has bigrams but no trigrams: trigram stats 0
        F.coalesce(
            F.max(F.when(three, F.col("dup"))), F.lit(0).cast("long")
        ).alias("dup_trigram_count"),
        F.coalesce(
            F.max(F.when(three, F.col("tot"))), F.lit(0).cast("long")
        ).alias("n_trigrams"),
    )
    top_frac = rnd(
        F.col("top_bigram_count") * 2 / F.col("n_tokens"), 6
    )
    dup_frac = rnd(
        F.col("dup_trigram_count")
        / F.greatest(F.col("n_trigrams"), F.lit(1).cast("long")),
        6,
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "top_bigram_count",
        top_frac.alias("top_bigram_frac"),
        "dup_trigram_count",
        "n_trigrams",
        dup_frac.alias("dup_trigram_frac"),
        (
            (F.col("n_tokens") >= REP_MIN_TOKENS)
            & (
                (top_frac > TOP_BIGRAM_FRAC_MAX)
                | (dup_frac >= DUP_TRIGRAM_FRAC_MAX)
            )
        ).alias("repetitive"),
    )


def decontaminate(docs: DataFrame) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct word trigrams it shares with the eval split
    (doc_id % EVAL_MOD == 0), and a contaminated flag.

    The eval shingle set is explicitly broadcast — at 100 TB the
    corpus side is the big one and must never shuffle for this join.
    Corpus documents too short to have trigrams surface with 0
    shared shingles (still checkable rows), not silently dropped.
    """
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    ev_sh = (
        shingles(docs.filter(is_eval), 3)
        .select("shingle")
        .distinct()
    )
    corpus = docs.filter(~is_eval)
    hits = (
        shingles(corpus, 3)
        .join(F.broadcast(ev_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("n_shared_shingles"), F.lit(0).cast("long")
            ).alias("n_shared_shingles"),
            (
                F.coalesce(F.col("n_shared_shingles"), F.lit(0))
                >= CONTAM_MIN_SHARED
            ).alias("contaminated"),
        )
    )


def lehmer_hash(id_col: Column) -> Column:
    """One Park-Miller/Lehmer step: deterministic uniform hash of an
    integer id in [0, 2^31-1). pmod (not %) on the input: Spark's %
    keeps the dividend's sign, so a negative id (realistic when ids
    are 64-bit hashes) would yield a negative hash — making every
    sampling test `pct < rate` trivially true and bucket ids
    negative. (pmod(id) % m) * 48271 fits comfortably in int64, so
    Spark and any SQL oracle compute the identical value."""
    return F.pmod(id_col, LEHMER_MOD) * LEHMER_MUL % LEHMER_MOD


def lehmer_pct(id_col: Column) -> Column:
    """Deterministic pseudo-random percentile in [0, 100)."""
    return (lehmer_hash(id_col) % 100).cast("int")


# Sequence packing: training-sequence token budget and the number of
# independent packing streams (cluster-parallelism knob).
PACK_BUDGET = 64
PACK_BUCKETS = 8

# PII patterns, RE2/Java common subset (no lookaround). Order matters
# for redaction: the SSN pattern would otherwise match inside a
# phone number's tail.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\d{3}[-.]\d{3}[-.]\d{4}"),
    ("ssn", r"\d{3}-\d{2}-\d{4}"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"),
]

VOCAB_TOPK = 50


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT pretraining
    layout): each bucket is an independent token stream ordered by
    doc_id; consecutive documents are concatenated and the stream is
    chunked every `budget` tokens, so a document may span bins.

    Output per document: its bucket, token offset within the bucket
    stream, and the first/last training-bin index it occupies.
    Empty documents carry no tokens and are dropped.
    """
    from pyspark.sql import Window

    tk = docs.select(
        "doc_id",
        F.size(tokens()).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    bucket = (
        (lehmer_hash(F.col("doc_id")) % n_buckets)
        .cast("int")
        .alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return (
        tk.select("doc_id", "n_tokens", bucket)
        .select(
            "doc_id",
            "bucket",
            "n_tokens",
            start,
            F.floor((cum - F.col("n_tokens")) / budget)
            .cast("long")
            .alias("bin_first"),
            F.floor((cum - 1) / budget).cast("long").alias("bin_last"),
        )
        .withColumn(
            "n_bins",
            (F.col("bin_last") - F.col("bin_first") + 1).cast("long"),
        )
    )


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII match counts (one column per pattern) and a
    has_pii flag. Map-only."""
    counts = [
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        )
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    out = docs.select("doc_id", *counts)
    total = sum((F.col(f"n_{n}") for n, _ in PII_PATTERNS), F.lit(0))
    return out.withColumn("has_pii", total > 0)


def pii_redacted(text_col: Column) -> Column:
    """The PII redaction expression: replace in fixed pattern order
    (email before the number patterns; SSN before IPv4 would not
    overlap but the order is pinned anyway so engines agree)."""
    red = text_col
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return red


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII per document. Map-only."""
    red = pii_redacted(F.col(text_col))
    return docs.select(
        "doc_id", red.alias("redacted"), F.length(red).alias("n_chars_red")
    )


def vocab_topk(docs: DataFrame, k: int = VOCAB_TOPK) -> DataFrame:
    """Corpus vocabulary: global top-K tokens by term frequency with
    document frequency, ties broken by token. The tf aggregation is
    two-phase (map-side combine absorbs hot-token skew); df is a
    distinct (token, doc_id) count."""
    tok = docs.select(
        "doc_id", F.explode(tokens()).alias("token")
    )
    stats = tok.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    return stats.orderBy(F.desc("tf"), F.asc("token")).limit(k)


def keep_rate(source_col: Column) -> Column:
    """Per-source keep-percentage (dataset mixing weight)."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]
    )
    return F.coalesce(rate_map[source_col], F.lit(DEFAULT_RATE)).cast(
        "int"
    )


def _kept_flags(docs: DataFrame) -> DataFrame:
    """Corpus rows (eval split excluded) with the three coalesced
    funnel flags — repetitive, contaminated, sampled — carried
    alongside every document column. THE single definition of the
    keep decision: curation_funnel (the counts) and curation_apply
    (the materialized corpus) both read it, so they can never
    disagree about which docs are kept. Documents too short for
    repetition stats (absent from that output) count as not
    repetitive. Both flag tables are doc_id-keyed (uniform joins
    against the corpus)."""
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    corpus = docs.filter(~is_eval)
    rep = repetition_stats(corpus).select("doc_id", "repetitive")
    dec = decontaminate(docs).select("doc_id", "contaminated")
    return (
        corpus.join(rep, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .withColumn("repetitive", F.coalesce("repetitive", F.lit(False)))
        .withColumn(
            "contaminated", F.coalesce("contaminated", F.lit(False))
        )
        .withColumn(
            "sampled",
            lehmer_pct(F.col("doc_id")) < keep_rate(F.col("source")),
        )
    )


def _kept() -> Column:
    """The keep predicate over _kept_flags output — one definition,
    two consumers (funnel counts it, apply filters by it). A
    function, not a module constant: classic PySpark Columns wrap
    JVM objects, so building one requires an active SparkContext,
    which doesn't exist at import time."""
    return (
        ~F.col("repetitive") & ~F.col("contaminated") & F.col("sampled")
    )


def curation_funnel(docs: DataFrame) -> DataFrame:
    """The end-to-end curation decision, per source: how many corpus
    documents each filter stage removes and how many survive.

    A corpus document (eval split excluded) is kept iff it is not
    repetitive, not contaminated, and selected by the stratified
    sample (see _kept_flags — shared with curation_apply).

    Scale: the final groupBy collapses to one row per source with
    map-side partial aggregation.
    """
    j = _kept_flags(docs)
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return j.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        cnt(F.col("repetitive")).alias("n_repetitive"),
        cnt(F.col("contaminated")).alias("n_contaminated"),
        cnt(~F.col("sampled")).alias("n_sampled_out"),
        cnt(_kept()).alias("n_kept"),
    )


def curation_apply(docs: DataFrame) -> DataFrame:
    """Materialize the CURATED corpus — the docs `curation_funnel`
    counts as kept (not repetitive, not contaminated, selected by
    the stratified sample; eval split excluded), with PII redacted.
    The content fingerprint is md5 of the REDACTED text, so the
    oracle hash-verifies the exact bytes a training run would read.

    Scale: the keep decision comes from _kept_flags (the SAME
    dataflow curation_funnel counts — shared helper, so the apply
    and the report can never diverge); the predicate and redaction
    are map-only on the survivors. This is the final INSERT INTO
    curated_corpus of the funnel."""
    red = pii_redacted(F.col("text"))
    return _kept_flags(docs).filter(_kept()).select(
        "doc_id",
        "lang",
        "source",
        F.md5(red).alias("fp"),
        F.length(red).cast("bigint").alias("n_chars_curated"),
    )


# Train/val/test split: a SECOND Lehmer step decorrelates the split
# percentile from the sampling percentile (reusing lehmer_pct would
# send every sampled doc to the same split band).
TRAIN_PCT = 80
VAL_PCT = 90


def split_assign(docs: DataFrame) -> DataFrame:
    """Deterministic, disjoint, exhaustive train/val/test assignment
    per document (80/10/10 by a doc_id-derived percentile). Stable
    across re-runs and engines — the property that makes the split
    auditable and leak-checkable; zero shuffle."""
    pct2 = lehmer_pct(lehmer_hash(F.col("doc_id")))
    split = (
        F.when(pct2 < TRAIN_PCT, "train")
        .when(pct2 < VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.select(
        "doc_id",
        "source",
        pct2.alias("split_pct"),
        split.alias("split"),
    )


def sample_stratified(docs: DataFrame) -> DataFrame:
    """Deterministic stratified sampling for dataset mixing: keep a
    per-source percentage of documents (SAMPLE_RATES, default
    DEFAULT_RATE), selected by Lehmer hash of doc_id — stable across
    re-runs and engines, zero shuffle."""
    rate = keep_rate(F.col("source"))
    pct = lehmer_pct(F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            "source",
            pct.alias("sample_pct"),
            rate.alias("keep_rate"),
        )
        .filter(F.col("sample_pct") < F.col("keep_rate"))
    )


PPS_TARGET_K = 100
PPS_WEIGHT_SCALE = 1_000_000


def sample_pps(docs: DataFrame, target_k: int = PPS_TARGET_K) -> DataFrame:
    """Poisson probability-proportional-to-size sampling: each
    document is kept independently with probability
    p_i = min(1, k * w_i / W) where w_i = n_chars and W = sum(w) —
    big documents (more training tokens) are proportionally more
    likely to be audited/sampled, and the emitted Horvitz-Thompson
    inclusion weight (ppm of 1/p_i) makes any sum over the sample an
    unbiased estimate of the corpus total. Expected sample size is
    ~k (exactly k in expectation when no p_i caps at 1).

    Determinism/exactness: the keep decision is
    ``lehmer_hash(lehmer_hash(doc_id)) < floor(k * w_i * LEHMER_MOD
    DIV W)`` — pure int64 arithmetic (k*w_i*MOD fits int64 for w_i
    up to ~4e7 chars), identical on Spark and the SQL oracle, stable
    across re-runs; no rand(). TWO Lehmer steps, not one: the keep
    test compares the hash against a LARGE threshold, and one step
    of sequential ids is id*48271 — small ids land uniformly in the
    LOW range and would all be kept (the pct-bucket ops survive one
    step because `% 100` only reads the low digits).

    Scale: map-only over the corpus plus ONE scalar aggregate for W
    (catalog stats in production); the scalar is cross-joined as a
    1-row broadcast, so there is no data shuffle at all.
    """
    total = docs.agg(
        F.sum("n_chars").cast("long").alias("_total_chars")
    )
    thr_raw = F.expr(
        f"({target_k} * n_chars * {LEHMER_MOD}) DIV _total_chars"
    )
    # p_i caps at 1: threshold clamps to MOD (hash is always < MOD).
    thr = F.least(thr_raw, F.lit(LEHMER_MOD)).cast("long")
    return (
        docs.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            thr.alias("_thr"),
        )
        .filter(
            lehmer_hash(lehmer_hash(F.col("doc_id"))) < F.col("_thr")
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.expr(
                f"{LEHMER_MOD * PPS_WEIGHT_SCALE}L DIV _thr"
            )
            .cast("long")
            .alias("ht_weight_ppm"),
        )
    )


RARITY_SCALE = 1_000_000


def rarity_scores(docs: DataFrame) -> DataFrame:
    """Corpus-rarity quality score — the deterministic stand-in for
    LM-perplexity filtering (CCNet-style): documents made of common
    vocabulary score low, rare-vocabulary documents score high.

    Each token occurrence contributes floor(RARITY_SCALE /
    (1 + floor(log2(tf)))) where tf is the token's corpus frequency;
    the document score is the integer mean of its contributions
    (rarity_ppm in [0, RARITY_SCALE]). Everything is integer
    arithmetic — floor_log2 via the binary-string length — so any
    SQL engine reproduces the exact scores with no float-sum-order
    or libm-log divergence (a real log/exp would hash-mismatch
    across engines).

    Scale: the frequency model is one partial-aggregated
    groupBy(token) (hot tokens collapse map-side); it is BROADCAST
    into the scoring join on purpose — a shuffle join on token
    would send every occurrence of "the" to one partition (the
    canonical join-skew trap), while vocabularies (millions of
    rows) comfortably broadcast.
    """
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    model = tok.groupBy("token").agg(F.count("*").alias("tf"))
    # floor(log2(tf)) without libm: bin(tf) has no leading zeros
    flog2 = (F.length(F.expr("bin(tf)")) - 1).cast("long")
    contrib = F.floor(RARITY_SCALE / (1 + flog2)).cast("long")
    scored = tok.join(
        F.broadcast(model.select("token", contrib.alias("c"))),
        "token",
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("c").alias("sc"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.floor(F.col("sc") / F.col("n_tokens"))
            .cast("long")
            .alias("rarity_ppm"),
        )
    )


def corpus_drift(docs: DataFrame) -> DataFrame:
    """Per-source token-distribution drift: the total-variation
    distance between each source's unigram distribution and the rest
    of the corpus — the mixture-audit a training pipeline runs to
    catch a source whose content shifted between crawls (or a split
    whose distribution leaks).

    TV(s) = 1/2 * sum_t | cnt_{t,s}/N_s - cnt_{t,rest}/N_rest |
    is computed WITHOUT per-token division: the numerator
    sum_t |cnt_{t,s} * N_rest - cnt_{t,rest} * N_s| is exact int64
    arithmetic (tokens absent from the source fold into one closed-
    form term, (G - sum_{t in s} g_t) * N_s, so the sum only ranges
    over tokens PRESENT in the source — no source x vocabulary
    expansion). The single final division is one IEEE op on exact
    integers: bit-identical on any engine. int64 bounds the corpus
    at ~3e9 tokens per cohort pair; past that, flip the last
    multiply to double (the audit is a ratio — 1 ulp is noise).

    Scale shape: two partial-aggregated shuffles — (source, token)
    then token — plus a broadcast of the per-source totals and the
    1-row global total. Never quadratic, no skew (hot tokens
    collapse map-side in both aggregations).
    """
    tok = docs.select("source", F.explode(tokens()).alias("token"))
    st = tok.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("cnt")
    )
    g = st.groupBy("token").agg(F.sum("cnt").alias("g"))
    tot = st.groupBy("source").agg(F.sum("cnt").alias("n_src"))
    gt = st.agg(F.sum("cnt").alias("gtot"))
    j = (
        st.join(g, "token")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(gt))
    )
    term = F.abs(
        F.col("cnt") * (F.col("gtot") - F.col("n_src"))
        - (F.col("g") - F.col("cnt")) * F.col("n_src")
    )
    agg = j.groupBy("source", "n_src", "gtot").agg(
        F.count("*").cast("long").alias("n_vocab"),
        F.sum(term).alias("num_in"),
        F.sum("g").alias("sg"),
    )
    drift_num = F.col("num_in") + (
        (F.col("gtot") - F.col("sg")) * F.col("n_src")
    )
    return agg.select(
        "source",
        F.col("n_src").alias("n_tokens"),
        "n_vocab",
        drift_num.cast("long").alias("drift_num"),
        # a source holding the ENTIRE corpus (gtot == n_src, e.g. a
        # single-source corpus) has no "rest" cohort to drift from:
        # tv_dist is NULL by definition, never a divide-by-zero
        F.when(
            F.col("gtot") > F.col("n_src"),
            drift_num.cast("double")
            / (
                F.lit(2.0)
                * F.col("n_src")
                * (F.col("gtot") - F.col("n_src"))
            ),
        ).alias("tv_dist"),
    )


def mixture_plan(docs: DataFrame) -> DataFrame:
    """Uniform-mixture rebalance plan: given the per-source token
    inventory, the largest corpus in which every source contributes
    an EQUAL token share is bounded by the scarcest source; each
    source's keep fraction is that bound over its inventory. The op
    emits the plan a sampler (sample_stratified) would execute:
    (source, n_tokens, keep_ppm, kept_tokens).

    keep_ppm = floor(min_inventory * 1e6 / inventory) and
    kept_tokens = floor(n_tokens * keep_ppm / 1e6) are pure integer
    arithmetic — identical on any engine, no float shares. The
    scarcest source reads keep_ppm == 1_000_000 exactly.

    Scale: one partial-aggregated shuffle on source (hot sources
    collapse map-side), then a 1-row global min broadcast back —
    the plan output is |sources| rows.
    """
    tok = docs.select("source", F.explode(tokens()).alias("token"))
    inv = tok.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    floor_min = F.broadcast(inv.agg(F.min("n_tokens").alias("min_inv")))
    keep_ppm = F.floor(
        F.col("min_inv") * F.lit(1_000_000) / F.col("n_tokens")
    ).cast("long")
    return (
        inv.crossJoin(floor_min)
        .select(
            "source",
            "n_tokens",
            keep_ppm.alias("keep_ppm"),
            F.floor(
                F.col("n_tokens") * keep_ppm / F.lit(1_000_000)
            )
            .cast("long")
            .alias("kept_tokens"),
        )
    )


# Vocabulary-coverage audit: the top-K corpus tokens stand in for a
# tokenizer's vocab; per-document OOV rate in ppm is the signal a
# pipeline uses to catch content a fixed tokenizer would shred.
OOV_VOCAB_K = 20  # sized to the synthetic corpus's 31-token vocab; a real
# tokenizer audit would use the tokenizer's actual vocab size


def oov_rates(docs: DataFrame, vocab_k: int = OOV_VOCAB_K) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-K
    vocabulary (tf desc, token tiebreak — the deterministic twin of
    vocab_topk's ordering). oov_ppm = floor(oov_tokens * 1e6 /
    n_tokens): integer-exact on any engine.

    Scale: the vocab is a two-phase top-K aggregate (map-side
    combine, then a K-row TakeOrdered result) BROADCAST into the
    scoring join — joining occurrence rows on token by shuffle
    would put every 'the' on one partition (the join-skew trap).
    Scoring is then map-only per token with one doc_id-keyed
    aggregation."""
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(vocab_k)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    scored = tok.join(F.broadcast(vocab), "token", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("oov_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "oov_tokens",
            F.floor(
                F.col("oov_tokens") * F.lit(1_000_000) / F.col("n_tokens")
            )
            .cast("long")
            .alias("oov_ppm"),
        )
    )


# Retrieval-side chunking: fixed token windows with overlap — the
# dual of pack_sequences (training-side concat-and-chunk).
CHUNK_TOKENS = 30
CHUNK_STRIDE = 20


def doc_chunks(
    docs: DataFrame,
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Overlapping token-window chunks per document (the RAG
    indexing unit): chunk k covers tokens [k*stride, k*stride +
    window). Emits (doc_id, chunk_id, start_pos, n_chunk_tokens,
    chunk_md5) — the fingerprint, not the text, so the output stays
    row-shaped for downstream embedding/indexing joins.

    Scale: ZERO shuffle — chunk starts are generated per row with
    `sequence` over the token count and sliced from the already-
    tokenized array, so the whole op is one map-side explode with
    ~n_tokens/stride output rows per document. Zero-token documents
    produce no chunks (filtered before the explode, both engines).
    """
    t = tokens()
    chunked = (
        docs.select("doc_id", t.alias("t"), F.size(t).alias("n"))
        .filter(F.col("n") > 0)
        .select(
            "doc_id",
            F.col("t"),
            # last start < n, so every chunk is non-empty
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
            ).alias("start_pos"),
        )
    )
    piece = F.slice(F.col("t"), F.col("start_pos") + 1, window)
    return chunked.select(
        "doc_id",
        F.floor(F.col("start_pos") / stride).cast("long").alias(
            "chunk_id"
        ),
        F.col("start_pos").cast("long").alias("start_pos"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


# Boilerplate detection: the CCNet/RefinedWeb "line dedup" signal,
# adapted to the chunk unit (this corpus has no newlines — the chunk
# fingerprint is the repeated-content unit). A chunk fingerprint
# shared by >= BOILER_MIN_DOCS distinct documents is boilerplate
# (headers, footers, templated spans); boiler_ppm is the per-document
# removal/score signal.
BOILER_MIN_DOCS = 2


def boilerplate_chunks(
    docs: DataFrame,
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    min_docs: int = BOILER_MIN_DOCS,
) -> DataFrame:
    """Per-document boilerplate ratio: the fraction (ppm) of a
    document's token-window chunks whose fingerprint also appears in
    >= min_docs distinct documents corpus-wide. Emits (doc_id,
    n_chunks, boiler_chunks, boiler_ppm), integer-exact.

    Scale: chunking is the zero-shuffle map-side explode of
    doc_chunks; the corpus-wide frequency is one partial-aggregated
    groupBy(chunk_md5) (uniform 128-bit keys); the flag-back join is
    an equality join on chunk_md5 — left as a shuffle join on
    purpose (the boilerplate set grows with the corpus, so a
    broadcast would not survive 100 TB) with AQE skew-join covering
    the pathological one-chunk-in-a-million-docs case. The final
    rollup is doc_id-keyed.
    """
    ch = doc_chunks(docs, window, stride).select("doc_id", "chunk_md5")
    common = (
        ch.groupBy("chunk_md5")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("chunk_md5", F.lit(1).alias("is_boiler"))
    )
    flagged = ch.join(common, "chunk_md5", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(
                F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("boiler_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "boiler_chunks",
            F.floor(
                F.col("boiler_chunks") * F.lit(1_000_000) / F.col("n_chunks")
            )
            .cast("long")
            .alias("boiler_ppm"),
        )
    )


def cluster_split(docs: DataFrame) -> DataFrame:
    """Leakage-safe train/val/test split: every member of a near-dup
    cluster (dedup_clusters labels) lands in the SAME split, because
    the split percentile is hashed from the CLUSTER id, not the doc
    id. split_assign hashes doc_id and can put a document in train
    and its near-duplicate in test — the classic contamination bug
    this operator exists to prevent.

    Scale: inherits dedup_clusters' capped-bucket + pointer-doubling
    shape; the split itself adds one doc_id-keyed join (labels are
    (doc_id, cluster_id) — co-partitioned with the corpus) and a
    map-only hash. Same 80/10/10 Lehmer split as split_assign, so
    the two are directly comparable in an A/B audit.
    """
    from .dedup import dedup_clusters

    labels = dedup_clusters(docs)
    pct2 = lehmer_pct(lehmer_hash(F.col("cluster_id")))
    split = (
        F.when(pct2 < TRAIN_PCT, "train")
        .when(pct2 < VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select("doc_id", "source")
        .join(labels, "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            pct2.alias("split_pct"),
            split.alias("split"),
        )
    )


def mixture_apply(docs: DataFrame) -> DataFrame:
    """Execute mixture_plan at document granularity: per source, keep
    documents in deterministic pseudo-random order (Lehmer hash of
    doc_id, doc_id tiebreak) until the kept token count reaches the
    uniform-mixture bound (the scarcest source's inventory). Emits
    the kept rows as (doc_id, source, n_tokens, cum_tokens) — the
    document-level realization of mixture_plan's keep_ppm.

    A document is kept while the running total INCLUDING it stays
    <= the bound, so kept_tokens <= min_inventory exactly and the
    scarcest source keeps everything.

    Scale: per-doc token counts are map-only (size of the token
    array, no explode); the cumulative sum is a window partitioned
    by SOURCE — parallelism = source count, the right unit because
    the budget is per-source (a source big enough to overflow one
    task's window would first overflow the budget itself and can be
    pre-filtered by mixture_plan's keep_ppm). ROWS UNBOUNDED
    PRECEDING with a total order (hash, then doc_id) keeps the
    frame engine-identical.
    """
    from pyspark.sql import Window

    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(tokens()).cast("long").alias("n_tokens"),
    )
    inv = per_doc.groupBy("source").agg(
        F.sum("n_tokens").alias("inv")
    )
    bound = F.broadcast(inv.agg(F.min("inv").alias("min_inv")))
    w = (
        Window.partitionBy("source")
        .orderBy(lehmer_hash(F.col("doc_id")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        per_doc.crossJoin(bound)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            cum.cast("long").alias("cum_tokens"),
            F.col("min_inv"),
        )
        .filter(F.col("cum_tokens") <= F.col("min_inv"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


# Tokenizer-vocab sizing curve: how much of the corpus the top-K
# tokens cover, cumulatively.
COVERAGE_TOPK = 25


def token_coverage_curve(
    docs: DataFrame, k: int = COVERAGE_TOPK
) -> DataFrame:
    """Cumulative corpus coverage of the top-K tokens by frequency
    (tf desc, token tiebreak): (rank, token, tf, cum_tf,
    coverage_ppm). The curve a tokenizer-vocab sizing decision reads
    — where it flattens is where additional vocab stops paying.
    Integer-exact: coverage_ppm = floor(cum_tf * 1e6 / total).

    Scale: the frequency table is one partial-aggregated
    groupBy(token); the top-K is a TakeOrdered LIMIT (never a full
    sort); the ranking window then runs over K ROWS ONLY — an
    unpartitioned window is safe exactly because its input is
    pre-limited to a constant. The 1-row corpus total broadcasts.
    """
    from pyspark.sql import Window

    tf = (
        docs.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    total = F.broadcast(tf.agg(F.sum("tf").alias("total")))
    topk = tf.orderBy(F.desc("tf"), F.asc("token")).limit(k)
    w = (
        Window.orderBy(F.desc("tf"), F.asc("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        topk.crossJoin(total)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("tf"), F.asc("token")))
            .cast("int")
            .alias("rank"),
            "token",
            "tf",
            F.sum("tf").over(w).cast("long").alias("cum_tf"),
            F.floor(
                F.sum("tf").over(w) * F.lit(1_000_000) / F.col("total")
            )
            .cast("long")
            .alias("coverage_ppm"),
        )
    )


# Weighted mixture: target domain weights for the blended corpus
# (DoReMi/multilingual-temperature style rebalance, vs mixture_plan's
# uniform target). Relative weights; normalization to ppm happens in
# integer arithmetic inside the op.
MIX_WEIGHTS = {"src0": 3, "src1": 2}
MIX_DEFAULT_WEIGHT = 1


def mixture_plan_weighted(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    default_weight: int = MIX_DEFAULT_WEIGHT,
) -> DataFrame:
    """Rebalance plan for an ARBITRARY target mixture: given relative
    integer weights per source, the largest corpus in which source s
    contributes share w_s is bounded by min_s floor(inv_s * 1e6 /
    w_ppm_s) — the source that runs out first at its target share.
    Emits (source, n_tokens, w_ppm, kept_tokens, keep_ppm), all
    integer arithmetic: w_ppm = floor(w_rel * 1e6 / sum(w_rel)) over
    the sources PRESENT, kept_tokens = floor(C * w_ppm / 1e6) which
    is <= inv_s by construction of C.

    Scale: one partial-aggregated shuffle on source for the
    inventory; weights enter as a literal CASE (a driver-side dict —
    the mixture spec is configuration, not data); the binding C is a
    1-row global min broadcast back. |sources| output rows.
    """
    w = weights if weights is not None else MIX_WEIGHTS
    tok = docs.select("source", F.explode(tokens()).alias("token"))
    inv = tok.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    rel = F.lit(default_weight)
    for src, wt in sorted(w.items()):
        rel = F.when(F.col("source") == src, F.lit(int(wt))).otherwise(rel)
    with_rel = inv.select("source", "n_tokens", rel.alias("w_rel"))
    tot = F.broadcast(with_rel.agg(F.sum("w_rel").alias("w_tot")))
    with_ppm = (
        with_rel.crossJoin(tot)
        .select(
            "source",
            "n_tokens",
            F.floor(F.col("w_rel") * F.lit(1_000_000) / F.col("w_tot"))
            .cast("long")
            .alias("w_ppm"),
        )
    )
    c = F.broadcast(
        with_ppm.agg(
            F.min(
                F.floor(F.col("n_tokens") * F.lit(1_000_000) / F.col("w_ppm"))
            )
            .cast("long")
            .alias("c_total")
        )
    )
    kept = F.floor(F.col("c_total") * F.col("w_ppm") / F.lit(1_000_000)).cast(
        "long"
    )
    return with_ppm.crossJoin(c).select(
        "source",
        "n_tokens",
        "w_ppm",
        kept.alias("kept_tokens"),
        F.floor(kept * F.lit(1_000_000) / F.col("n_tokens"))
        .cast("long")
        .alias("keep_ppm"),
    )


def mixture_plan_temperature(docs: DataFrame) -> DataFrame:
    """Temperature-smoothed mixture plan — the alpha-sampling shape
    of multilingual/multi-source pipelines (XLM-R, mT5: sample
    source s with probability proportional to n_s^alpha, alpha < 1,
    so small sources are up-weighted without drowning large ones).
    Here alpha = 1/2: w_rel = floor(sqrt(n_tokens)) DERIVES the
    relative weights from the inventory in-plan, then the
    rebalance arithmetic is mixture_plan_weighted's (w_ppm, binding
    corpus size C from the first source to run out, kept/keep_ppm).

    alpha = 1/2 is the one smoothing exponent that stays
    CROSS-ENGINE EXACT: IEEE 754 requires sqrt (unlike pow/exp) to
    be correctly rounded, so floor(sqrt(bigint)) is bit-identical
    in Spark and DuckDB — a general alpha would route through pow's
    libm variance. Other exponents ride the identical dataflow via
    mixture_plan_weighted(weights=...) with driver-computed
    weights (the mixture spec is configuration).

    Scale: one partial-aggregated shuffle on source for the
    inventory; two 1-row broadcasts (weight total, binding C);
    |sources| output rows.
    """
    tok = docs.select("source", F.explode(tokens()).alias("token"))
    inv = tok.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    with_rel = inv.select(
        "source",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens"))).cast("long").alias("w_rel"),
    )
    tot = F.broadcast(with_rel.agg(F.sum("w_rel").alias("w_tot")))
    with_ppm = with_rel.crossJoin(tot).select(
        "source",
        "n_tokens",
        F.floor(F.col("w_rel") * F.lit(1_000_000) / F.col("w_tot"))
        .cast("long")
        .alias("w_ppm"),
    )
    # a source so dominated its smoothed share floors to 0 ppm must
    # not bind C (and would be an ANSI divide-by-zero): it simply
    # keeps nothing
    c = F.broadcast(
        with_ppm.agg(
            F.min(
                F.when(
                    F.col("w_ppm") > 0,
                    F.floor(
                        F.col("n_tokens")
                        * F.lit(1_000_000)
                        / F.col("w_ppm")
                    ),
                )
            )
            .cast("long")
            .alias("c_total")
        )
    )
    kept = F.floor(
        F.col("c_total") * F.col("w_ppm") / F.lit(1_000_000)
    ).cast("long")
    return with_ppm.crossJoin(c).select(
        "source",
        "n_tokens",
        "w_ppm",
        kept.alias("kept_tokens"),
        F.floor(kept * F.lit(1_000_000) / F.col("n_tokens"))
        .cast("long")
        .alias("keep_ppm"),
    )


def chunk_index_dedup(docs: DataFrame) -> DataFrame:
    """Chunk-level dedup for the retrieval index: each distinct
    chunk fingerprint is indexed ONCE, represented by its first
    occurrence in (doc_id, chunk_id) order, with copy/document
    counts for storage accounting. (boilerplate_chunks flags the
    DOCUMENTS carrying over-shared chunks; this op builds the
    deduplicated CHUNK side — what actually gets embedded.)

    Scale: one shuffle keyed by chunk_md5 (uniform by construction);
    the representative is `min(struct(doc_id, chunk_id))` INSIDE the
    aggregate — no window, no second pass, map-side partial combine
    absorbs hot boilerplate chunks.
    """
    ch = doc_chunks(docs)
    rep = F.min(F.struct("doc_id", "chunk_id")).alias("_rep")
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            rep,
        )
        .select(
            "chunk_md5",
            F.col("_rep.doc_id").alias("rep_doc_id"),
            F.col("_rep.chunk_id").alias("rep_chunk_id"),
            "n_copies",
            "n_docs",
        )
    )


def curriculum_order(docs: DataFrame) -> DataFrame:
    """Deterministic training-order assignment: documents are
    round-robin interleaved across sources (no long same-source
    runs — the data-ordering hygiene training pipelines want) in
    rising-rarity order within each source (common/easy text first:
    curriculum). The emitted ``global_pos`` is a CLOSED FORM
    ``(rank_in_source - 1) * n_sources + (source_idx - 1)`` — a
    total order with gaps where sources run short, computed with no
    global row-number.

    Scale: one per-source window (uniform partitions), one window
    over the DISTINCT source list (bounded domain), and a closed-
    form position — there is no global sort or single-partition
    window anywhere; the consumer writes with
    ``repartitionByRange(global_pos)`` to lay files out in order.
    """
    from pyspark.sql import Window

    scored = rarity_scores(docs).select("doc_id", "rarity_ppm")
    base = docs.select("doc_id", "source").join(scored, "doc_id")
    w_src = Window.partitionBy("source").orderBy(
        "rarity_ppm", "doc_id"
    )
    srcs = docs.select("source").distinct()
    w_all = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    src_idx = srcs.select(
        "source",
        F.row_number()
        .over(Window.orderBy("source"))
        .alias("_sidx"),
        F.count("*").over(w_all).alias("_nsrc"),
    )
    return (
        base.withColumn("rank_in_source", F.row_number().over(w_src))
        .join(F.broadcast(src_idx), "source")
        .select(
            "doc_id",
            "source",
            "rarity_ppm",
            F.col("rank_in_source").cast("long").alias(
                "rank_in_source"
            ),
            (
                (F.col("rank_in_source") - 1) * F.col("_nsrc")
                + (F.col("_sidx") - 1)
            )
            .cast("long")
            .alias("global_pos"),
        )
    )
