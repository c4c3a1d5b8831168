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
- SimHash packs a document into one 16-bit integer; candidate
  retrieval is an equi-join on 4-bit bands (pigeonhole: hamming<=3
  guarantees a shared band), verification is xor+bit_count.
- n-gram Jaccard is the exact verifier run AFTER candidate
  generation — never all-pairs at scale.

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
SIMHASH_BITS = 16
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


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle)."""
    t = tokens()
    # Guard short docs: Spark's sequence(1, 0) produces a DESCENDING
    # [1, 0] rather than an empty list.
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-document MinHash signature: for each of NUM_HASHES seeded
    hash functions, the minimum md5(seed|shingle) over the doc's
    shingle set (min over hex strings == permutation min), plus the
    LSH band keys (concatenation of the band's hashes)."""
    sh = shingles(docs)
    hashed = sh.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(h) for h in range(NUM_HASHES)])
        ).alias("h"),
        "shingle",
    ).select(
        "doc_id",
        "h",
        F.md5(
            F.concat_ws("|", F.col("h").cast("string"), F.col("shingle"))
        ).alias("hv"),
    )
    mins = hashed.groupBy("doc_id", "h").agg(F.min("hv").alias("mh"))
    per_doc = mins.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("h"), F.col("mh")))
                ),
                lambda s: s.getField("mh"),
            ),
            "|",
        ).alias("sig")
    )
    cols = ["doc_id", "sig"]
    out = per_doc
    n_bands = NUM_HASHES // BAND_SIZE
    parts = F.split(F.col("sig"), r"\|")
    for b in range(n_bands):
        start = b * BAND_SIZE
        out = out.withColumn(
            f"band_{b}",
            F.concat_ws(
                "|",
                *[F.element_at(parts, start + j + 1) for j in range(BAND_SIZE)],
            ),
        )
        cols.append(f"band_{b}")
    return out.select(*cols)


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Near-duplicate candidate pairs: docs sharing any LSH band."""
    sigs = minhash_signatures(docs)
    n_bands = NUM_HASHES // BAND_SIZE
    stacked = None
    for b in range(n_bands):
        part = sigs.select(
            "doc_id", F.lit(b).alias("band"), F.col(f"band_{b}").alias("key")
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    a = stacked.alias("a")
    b_ = stacked.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.05
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.
    Integer intersection/union arithmetic; only the final ratio is a
    (deterministic) double division."""
    sh = shingles(docs, n)
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


def simhash(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over token frequencies.

    bit b of md5(token) is extracted with integer nibble arithmetic
    (no engine-specific bit functions), summed as +1/-1 across all
    token instances; simhash = Σ (sum_b > 0) << b. Exact integer
    arithmetic end-to-end."""
    tok = docs.select(
        "doc_id", F.explode(tokens()).alias("tok")
    ).withColumn("h4", F.substring(F.md5("tok"), 1, 4))
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
    """Near-dup pairs by SimHash: candidates share one of 4 4-bit
    bands (pigeonhole guarantees recall at hamming<=3), verified with
    xor + bit_count."""
    s = simhash(docs)
    stacked = None
    for band in range(4):
        part = s.select(
            "doc_id",
            "simhash",
            F.lit(band).alias("band"),
            ((F.col("simhash") / (16**band)).cast("long") % 16).alias("key"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
