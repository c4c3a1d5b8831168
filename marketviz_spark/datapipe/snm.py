"""Multi-pass sorted-neighborhood (SNM) dedup blocking.

The classic entity-resolution candidate generator (Hernandez &
Stolfo, SIGMOD'95): sort records by a blocking key, slide a window
of W over the sorted order, and emit only pairs within the window —
candidates are LINEAR in corpus size (<= N*(W-1) per pass), never
all-pairs. The classic weakness (near-dups straddling a block
boundary) gets the classic fix: a second pass with an independent
key (here: the normalized document HEAD, then the reversed
normalized TAIL), and the union of both passes.

Every string the operator sorts, blocks, or verifies on is BOUNDED:
the head/tail normalization regions are SNM_REGION chars of raw
text, so sort-key comparisons, the checkpointed frame, and the
trigram sets are all O(1) per document regardless of document
length. (The first cut normalized the WHOLE document and sorted by
it — the 10x-data spot ratio was 4.2x from multi-KB sort keys
alone; with bounded regions it is sub-linear.)

Spark shape (100 TB story):
- Ranks are per-BLOCK windows (partitionBy the 6-char key), never a
  global row_number — a hot block costs |block| * (W-1) pairs,
  still linear.
- The windowed pairing is a pure EQUI-join: the left side explodes
  a gap d in 1..W-1 and joins on (block, rank + d) == (block,
  rank) — no range predicate, no nested-loop fallback.
- Trigram sets join back by doc_id only onto the (small) candidate
  pair list, so arrays never ride through the pairing.
- Verification is integer-exact: |A∩B| * 1e6 div |A∪B| on distinct
  character-trigram sets; two empty keys count as identical.

Reference note: the reference app has no dedup at all — this
extends the repo's dedup family (MinHash/LSH, SimHash, winnowing)
with the third classic blocking technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SNM_KEY_LEN = 6  # blocking-key prefix length
SNM_WINDOW = 5  # neighborhood width (pairs with rank gap < W)
SNM_DUP_PPM = 500_000  # trigram-Jaccard duplicate threshold
SNM_REGION = 400  # raw-text chars normalized for each key region
# Verifier fingerprint: trigram IDs over the first SNM_FP_LEN
# normalized chars, as INTEGERS (ascii-folded — engine-identical),
# not strings: int-array intersect/union is ~8x cheaper than string
# sets, and with 381k sf1 candidate pairs the verifier dominated the
# wall (16 of 21 s) before this.
SNM_FP_LEN = 120


def _norm(col: F.Column) -> F.Column:
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def snm_candidate_pairs(
    docs: DataFrame,
    key_len: int = SNM_KEY_LEN,
    window: int = SNM_WINDOW,
    dup_ppm: int = SNM_DUP_PPM,
) -> DataFrame:
    """documents(doc_id, text) -> verified SNM candidates: one row
    per unordered pair found by either pass, with per-pass
    provenance flags, the integer trigram-Jaccard, and the
    duplicate verdict."""
    head = _norm(F.substring(F.col("text"), 1, SNM_REGION))
    tail_rev = F.reverse(
        _norm(
            F.expr(
                f"substring(text, greatest(length(text) - {SNM_REGION - 1},"
                " 1), " + str(SNM_REGION) + ")"
            )
        )
    )
    base = docs.select(
        "doc_id", head.alias("hn"), tail_rev.alias("tn")
    )
    # Single-split guard (same gate as similarity.cosine_topk): a
    # small corpus arrives as 1-2 parquet splits, and the checkpoint
    # below would pin EVERY downstream stage to that parallelism.
    sc = docs.sparkSession.sparkContext
    if base.rdd.getNumPartitions() < sc.defaultParallelism:
        base = base.repartition(sc.defaultParallelism, "doc_id")
    base = base.localCheckpoint(eager=False)

    def one_pass(sort_col: str, label: str) -> DataFrame:
        ranked = base.select(
            "doc_id",
            F.col(sort_col).alias("k"),
            F.substring(F.col(sort_col), 1, key_len).alias("blk"),
        ).withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("blk").orderBy("k", "doc_id")
            ),
        )
        left = ranked.select(
            "blk",
            F.col("doc_id").alias("id_l"),
            F.explode(
                F.sequence(F.col("rk") + 1, F.col("rk") + (window - 1))
            ).alias("rk_r"),
        )
        right = ranked.select(
            "blk", F.col("rk").alias("rk_r"), F.col("doc_id").alias("id_r")
        )
        return left.join(right, ["blk", "rk_r"]).select(
            F.least("id_l", "id_r").alias("doc_a"),
            F.greatest("id_l", "id_r").alias("doc_b"),
            F.lit(label).alias("pass_name"),
        )

    pairs = (
        one_pass("hn", "head")
        .unionByName(one_pass("tn", "tail"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max((F.col("pass_name") == "head").cast("int"))
            .cast("boolean")
            .alias("in_head_pass"),
            F.max((F.col("pass_name") == "tail").cast("int"))
            .cast("boolean")
            .alias("in_tail_pass"),
        )
    )
    def tri_id(i):
        fp = F.col("fp")
        return (
            F.ascii(fp.substr(i, F.lit(1))) * 16384
            + F.ascii(fp.substr(i + 1, F.lit(1))) * 128
            + F.ascii(fp.substr(i + 2, F.lit(1)))
        ).cast("int")

    grams = base.select(
        "doc_id", F.substring(F.col("hn"), 1, SNM_FP_LEN).alias("fp")
    ).select(
        "doc_id",
        F.when(
            F.length("fp") >= 3,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("fp") - 2), tri_id
                )
            ),
        )
        .otherwise(F.array().cast("array<int>"))
        .alias("grams"),
    )
    ga = grams.select(
        F.col("doc_id").alias("doc_a"), F.col("grams").alias("g_a")
    )
    gb = grams.select(
        F.col("doc_id").alias("doc_b"), F.col("grams").alias("g_b")
    )
    jac = F.expr(
        "CASE WHEN size(array_union(g_a, g_b)) = 0 THEN 1000000"
        " ELSE CAST((CAST(size(array_intersect(g_a, g_b)) AS BIGINT)"
        " * 1000000) div size(array_union(g_a, g_b)) AS BIGINT) END"
    )
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "in_head_pass",
            "in_tail_pass",
            jac.cast("long").alias("jaccard_ppm"),
        )
        .withColumn("is_dup", F.col("jaccard_ppm") >= dup_ppm)
        # no global orderBy: a sort would add a range-partition
        # sampling pass that re-executes the whole pairing chain,
        # and pair output is set-semantics for every consumer
    )


def snm_oracle_sql(
    key_len: int = SNM_KEY_LEN,
    window: int = SNM_WINDOW,
    dup_ppm: int = SNM_DUP_PPM,
    region: int = SNM_REGION,
    fp_len: int = SNM_FP_LEN,
) -> str:
    return f"""
WITH base AS (
    SELECT doc_id,
           regexp_replace(lower(substr(text, 1, {region})),
                          '[^a-z0-9]', '', 'g') AS hn,
           reverse(regexp_replace(
               lower(substr(text,
                            greatest(length(text) - {region - 1}, 1),
                            {region})),
               '[^a-z0-9]', '', 'g')) AS tn
    FROM documents
), ranked1 AS (
    SELECT doc_id, hn AS k, substr(hn, 1, {key_len}) AS blk,
           row_number() OVER (
               PARTITION BY substr(hn, 1, {key_len})
               ORDER BY hn, doc_id) AS rk
    FROM base
), ranked2 AS (
    SELECT doc_id, tn AS k, substr(tn, 1, {key_len}) AS blk,
           row_number() OVER (
               PARTITION BY substr(tn, 1, {key_len})
               ORDER BY tn, doc_id) AS rk
    FROM base
), p1 AS (
    SELECT least(a.doc_id, b.doc_id) AS doc_a,
           greatest(a.doc_id, b.doc_id) AS doc_b,
           'head' AS pass_name
    FROM ranked1 a JOIN ranked1 b
      ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + {window - 1}
), p2 AS (
    SELECT least(a.doc_id, b.doc_id),
           greatest(a.doc_id, b.doc_id), 'tail'
    FROM ranked2 a JOIN ranked2 b
      ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + {window - 1}
), pairs AS (
    SELECT doc_a, doc_b,
           max(CASE WHEN pass_name = 'head' THEN 1 ELSE 0 END) = 1
               AS in_head_pass,
           max(CASE WHEN pass_name = 'tail' THEN 1 ELSE 0 END) = 1
               AS in_tail_pass
    FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
    GROUP BY doc_a, doc_b
), fps AS (
    SELECT doc_id, substr(hn, 1, {fp_len}) AS fp FROM base
), grams AS (
    SELECT doc_id,
           CASE WHEN length(fp) >= 3 THEN
               list_distinct(list_transform(
                   range(1, length(fp) - 1),
                   i -> ascii(substr(fp, CAST(i AS INT), 1)) * 16384
                        + ascii(substr(fp, CAST(i + 1 AS INT), 1))
                          * 128
                        + ascii(substr(fp, CAST(i + 2 AS INT), 1))))
           ELSE CAST([] AS INTEGER[]) END AS g
    FROM fps
)
SELECT p.doc_a, p.doc_b, p.in_head_pass, p.in_tail_pass,
       CAST(CASE WHEN len(list_distinct(list_concat(ga.g, gb.g))) = 0
                 THEN 1000000
                 ELSE len(list_intersect(ga.g, gb.g)) * 1000000
                      // len(list_distinct(list_concat(ga.g, gb.g)))
            END AS BIGINT) AS jaccard_ppm,
       CAST(CASE WHEN len(list_distinct(list_concat(ga.g, gb.g))) = 0
                 THEN 1000000
                 ELSE len(list_intersect(ga.g, gb.g)) * 1000000
                      // len(list_distinct(list_concat(ga.g, gb.g)))
            END AS BIGINT) >= {dup_ppm} AS is_dup
FROM pairs p
JOIN grams ga ON p.doc_a = ga.doc_id
JOIN grams gb ON p.doc_b = gb.doc_id"""
