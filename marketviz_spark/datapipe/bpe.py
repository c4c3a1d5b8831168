"""BPE tokenizer TRAINING as distributed passes — the full merge
loop, not just pair mining.

Public technique: Sennrich/Haddow/Birch, "Neural Machine Translation
of Rare Words with Subword Units" (ACL 2016): start from
character-level symbol sequences over the word-frequency table,
repeatedly count adjacent symbol pairs (weighted by word frequency)
and merge the most frequent pair everywhere, for K steps. The merge
list IS the tokenizer model. `bpe_merge_pairs` (curation) mines one
round of pair statistics; this module runs the actual training
loop.

Spark-first shapes:

- **Train on the word-frequency table, not the token stream.** The
  classic BPE trick: group the corpus to (word, count) once —
  vocabulary-sized, orders of magnitude smaller than the corpus —
  and persist it; every merge step is then one partial-aggregated
  shuffle over the vocabulary plus a ONE-ROW argmax collect (the
  model grows by one merge per step, the ivf/pq driver-loop
  pattern).
- **Merge application is a string replace, not a fold.** Symbol
  sequences are SEP-joined strings (SEP = the \\x1f unit
  separator); applying merge (a, b) is
  ``replace(seq, a || SEP || b, a || b)`` — probed: Spark and
  DuckDB both scan left-to-right, replace non-overlapping
  occurrences, and do NOT rescan the replacement ('l l l' ->
  'll l' in both), which is exactly BPE's greedy merge semantics.
  Map-side, no UDF; the K-step lineage is K nested replaces.

Determinism contract (DuckDB oracle parity): pair counts are exact
integer sums; the argmax tiebreak is (count DESC, left ASC, right
ASC) under binary string collation in both engines; merge
application is the probed-identical replace. The oracle unrolls the
SAME K steps as CTE chains (the emb_pq/emb_ivf pattern). Words
containing the SEP or guard control characters (\\x1e, \\x1f) are
excluded from training on both sides — a curation-sane exclusion
that keeps the string representation unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import tokens

BPE_K = 8  # merge steps the registry query trains (oracle-unrolled)
BPE_SEP = "\x1f"  # symbol separator inside a word's sequence string
BPE_GUARD = "\x1e"  # never-occurring needle for the oracle's no-op


def _word_inventory(docs: DataFrame) -> DataFrame:
    """(w, wc): the word-frequency table BPE trains on, with
    control-character words excluded (keeps the SEP-joined symbol
    representation unambiguous on both engines)."""
    return (
        docs.select(F.explode(tokens()).alias("w"))
        .filter(
            (~F.col("w").contains(BPE_SEP))
            & (~F.col("w").contains(BPE_GUARD))
        )
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wc"))
    )


def _pair_counts(wdf: DataFrame) -> DataFrame:
    """(s1, s2, cnt): adjacent symbol-pair frequencies over the
    current sequences, weighted by word count — one
    partial-aggregated shuffle on the pair key."""
    syms = F.split(F.col("seq"), BPE_SEP)
    staged = wdf.select("wc", syms.alias("_t")).select(
        "wc", "_t", F.size("_t").alias("_n")
    )
    pairs = (
        staged.where(F.col("_n") >= 2)
        .select(
            "wc",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_t"), 1, F.col("_n") - 1).alias("s1"),
                    F.slice(F.col("_t"), 2, F.col("_n") - 1).alias("s2"),
                )
            ).alias("p"),
        )
        .select("wc", F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
    )
    return pairs.groupBy("s1", "s2").agg(
        F.sum("wc").cast("long").alias("cnt")
    )


def bpe_train(
    docs: DataFrame, k: int = BPE_K
) -> DataFrame:
    """Train `k` BPE merges over the corpus; returns the merge
    table (step, lhs, rhs, pair_count) — step 1..k in training
    order, fewer rows if the pair space dries up first. This is
    the tokenizer MODEL: applying merges 1..k in order reproduces
    the learned segmentation.

    Scale: the word inventory is computed once and persisted
    (vocabulary-sized); each step is one pair-count shuffle over it
    plus a 1-row argmax collect (driver-resident model, the
    ivf/pq loop shape) and a map-side replace. K shuffles total,
    never a corpus-sized iteration state."""
    spark = docs.sparkSession
    wdf = _word_inventory(docs).withColumn(
        "seq", F.array_join(F.split(F.col("w"), ""), BPE_SEP)
    )
    base = wdf.select("wc", "seq").persist()
    wdf = base
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, k + 1):
            best = (
                _pair_counts(wdf)
                .orderBy(
                    F.col("cnt").desc(),
                    F.col("s1").asc(),
                    F.col("s2").asc(),
                )
                .limit(1)
                .collect()  # the 1-row model increment
            )
            if not best:
                break
            a, b, cnt = best[0]["s1"], best[0]["s2"], best[0]["cnt"]
            merges.append((step, a, b, int(cnt)))
            wdf = wdf.select(
                "wc",
                F.replace(
                    F.col("seq"),
                    F.lit(a + BPE_SEP + b),
                    F.lit(a + b),
                ).alias("seq"),
            )
            # r14 (guide §5 — very large plans / re-execution depth):
            # each step re-executes ALL prior replaces over the
            # cached inventory, O(k²) replace applications across the
            # loop. A LAZY localCheckpoint every third merge bounds
            # the chain at 3 — the NEXT step's pair-count job
            # materializes it (no extra job), after which later steps
            # re-execute at most 2 replaces from the cut. Values are
            # unchanged (checkpointing only truncates lineage).
            if step % 3 == 0 and step < k:
                wdf = wdf.localCheckpoint(eager=False)
    finally:
        # the merge table is already driver-resident; the cached
        # inventory has served its K pair-count jobs
        base.unpersist()
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count long"
    )


def bpe_apply_vocab(
    docs: DataFrame, k: int = BPE_K
) -> DataFrame:
    """Apply a trained merge table to the vocabulary — the
    tokenizer's OUTPUT side: (w, wc, n_subwords, subwords) per
    distinct word, `subwords` the space-joined segmentation
    (words cannot contain spaces — they were split on them).

    Scale: training is :func:`bpe_train` (the merge list is the
    driver-resident model); application is K chained map-side
    replaces over the vocabulary — encoding the full corpus stream
    is the same projection applied per token, so the vocab-level
    output IS the tokenizer table a 100 TB encode job broadcasts."""
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(docs, k=k).orderBy("step").collect()
    ]
    seq = F.array_join(F.split(F.col("w"), ""), BPE_SEP)
    for a, b in merges:
        seq = F.replace(seq, F.lit(a + BPE_SEP + b), F.lit(a + b))
    staged = _word_inventory(docs).select(
        "w", "wc", seq.alias("_seq")
    )
    return staged.select(
        "w",
        "wc",
        F.size(F.split(F.col("_seq"), BPE_SEP))
        .cast("long")
        .alias("n_subwords"),
        F.translate(F.col("_seq"), BPE_SEP, " ").alias("subwords"),
    )
