"""Data-layout clustering: Z-order (Morton) interleaving + the
zone-map skipping audit that justifies it.

The 100-TB problem this solves: a table physically clustered on ONE
key (the natural `l_orderkey` ingest order) gives great file-level
min/max pruning on that key and NONE on any other — a point filter
on `l_partkey` scans every file. Interleaving the bits of both keys
(Morton order, the layout behind Delta/Iceberg `OPTIMIZE ZORDER BY`)
makes every file cover a small RECTANGLE in (orderkey, partkey)
space, so zone maps prune on either dimension. The audit quantifies
exactly that: the summed per-file key span of each dimension under
each layout — proportional to the expected number of files a
point lookup must scan.

Exactness + engine parity: keys fold into a fixed 16-bit budget
(`k % 65536` — the deterministic stand-in for the min/max range map
a real layout job computes), the 32-bit z-value is a generated
sum-of-bits expression TEXTUALLY shared with the DuckDB oracle
(only the integer-division operator differs), and files are fixed
z-ranges (`z div 2^26` → 64 cells), so the whole thing is map-only
integer math + ONE groupBy — no global sort, no window. A real
compaction job would follow with a range-partitioned write; the
layout ASSIGNMENT, which is what needs to be correct, is this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension bit budget after folding
Z_FOLD = 1 << Z_BITS  # 65536
Z_FILE_SHIFT = 26  # file = z div 2^26 → 64 z-range cells
N_FILES = (1 << (2 * Z_BITS)) >> Z_FILE_SHIFT  # 64


def _z_expr(a: str, b: str, div: str) -> str:
    """Morton interleave of two Z_BITS-bit ints as portable SQL:
    bit j of `a` lands at position 2j+1, of `b` at 2j. `div` is the
    engine's integer-division operator ('div' Spark, '//' DuckDB);
    everything else is shared text."""
    terms = []
    for j in range(Z_BITS):
        terms.append(f"(({a} {div} {1 << j}) % 2) * {1 << (2 * j + 1)}")
        terms.append(f"(({b} {div} {1 << j}) % 2) * {1 << (2 * j)}")
    return " + ".join(terms)


def _folded(lineitem: DataFrame) -> DataFrame:
    return lineitem.select(
        (F.col("l_orderkey") % Z_FOLD).alias("b1"),
        (F.col("l_partkey") % Z_FOLD).alias("b2"),
    )


def zorder_zone_maps(lineitem: DataFrame) -> DataFrame:
    """Per-file zone maps under the z-order layout: (file_id,
    n_rows, min/max of each folded key). Map-only z computation +
    one groupBy(file_id) — the only shuffle."""
    z = F.expr(_z_expr("b1", "b2", "div"))
    return (
        _folded(lineitem)
        .select("b1", "b2", (z.cast("long")).alias("z"))
        .select(
            "b1", "b2", F.expr(f"z div {1 << Z_FILE_SHIFT}").alias("file_id")
        )
        .groupBy("file_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("b1").cast("long").alias("min_order_fold"),
            F.max("b1").cast("long").alias("max_order_fold"),
            F.min("b2").cast("long").alias("min_part_fold"),
            F.max("b2").cast("long").alias("max_part_fold"),
        )
    )


def skipping_audit(lineitem: DataFrame) -> DataFrame:
    """2-row layout comparison: summed per-file zone-map spans per
    dimension (∝ expected files scanned by a point lookup on that
    dimension). 'natural' = files are fixed ranges of the orderkey
    fold; 'zorder' = fixed z-ranges. Lower span sum ⇒ better
    pruning; z-order trades a little orderkey locality for a ~8x
    partkey-span collapse (the whole point)."""
    folded = _folded(lineitem)
    natural_width = Z_FOLD // N_FILES
    nat = folded.select(
        "b1", "b2", F.expr(f"b1 div {natural_width}").alias("file_id")
    )
    z = F.expr(_z_expr("b1", "b2", "div"))
    zod = folded.select("b1", "b2", z.cast("long").alias("z")).select(
        "b1", "b2", F.expr(f"z div {1 << Z_FILE_SHIFT}").alias("file_id")
    )

    def summary(df: DataFrame, name: str) -> DataFrame:
        per_file = df.groupBy("file_id").agg(
            F.count("*").alias("n"),
            (F.max("b1") - F.min("b1") + 1).alias("span1"),
            (F.max("b2") - F.min("b2") + 1).alias("span2"),
        )
        return per_file.agg(
            F.lit(name).alias("layout"),
            F.count("*").cast("long").alias("n_files"),
            F.sum("n").cast("long").alias("n_rows"),
            F.sum("span1").cast("long").alias("sum_order_span"),
            F.sum("span2").cast("long").alias("sum_part_span"),
        ).filter(
            # empty input: match the oracle's GROUP BY semantics
            # (no layouts to report), not the 1-row global agg
            F.col("n_rows").isNotNull()
        )
    return summary(nat, "natural").unionByName(summary(zod, "zorder"))


def zorder_oracle_sql() -> str:
    z = _z_expr("b1", "b2", "//")
    return f"""
WITH folded AS (
    SELECT l_orderkey % {Z_FOLD} AS b1, l_partkey % {Z_FOLD} AS b2
    FROM lineitem
), zed AS (
    SELECT b1, b2, ({z}) // {1 << Z_FILE_SHIFT} AS file_id FROM folded
)
SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(b1) AS BIGINT) AS min_order_fold,
       CAST(max(b1) AS BIGINT) AS max_order_fold,
       CAST(min(b2) AS BIGINT) AS min_part_fold,
       CAST(max(b2) AS BIGINT) AS max_part_fold
FROM zed GROUP BY file_id"""


def skipping_audit_oracle_sql() -> str:
    z = _z_expr("b1", "b2", "//")
    natural_width = Z_FOLD // N_FILES
    return f"""
WITH folded AS (
    SELECT l_orderkey % {Z_FOLD} AS b1, l_partkey % {Z_FOLD} AS b2
    FROM lineitem
), nat AS (
    SELECT 'natural' AS layout, b1 // {natural_width} AS file_id, b1, b2
    FROM folded
    UNION ALL
    SELECT 'zorder' AS layout,
           ({z}) // {1 << Z_FILE_SHIFT} AS file_id, b1, b2
    FROM folded
), per_file AS (
    SELECT layout, file_id, count(*) AS n,
           max(b1) - min(b1) + 1 AS span1,
           max(b2) - min(b2) + 1 AS span2
    FROM nat GROUP BY layout, file_id
)
SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(span1) AS BIGINT) AS sum_order_span,
       CAST(sum(span2) AS BIGINT) AS sum_part_span
FROM per_file GROUP BY layout"""


def rle_audit(lineitem: DataFrame) -> DataFrame:
    """Encoding audit: how many RLE value-runs each layout produces
    per key dimension. Rows sorted by a layout's key are collapsed
    to distinct (file, b1, b2) groups FIRST (equal rows are one run
    segment, and a total order over distinct pairs is deterministic
    where a raw-row tiebreak would not be — the engine's dedup-
    before-window trick); run boundaries are then lag-compares over
    the collapsed sequence. Result: 2 rows (layout, n_files,
    n_rows, n_groups, runs_order_fold, runs_part_fold). Natural
    layout RLE-compresses its own key and shreds the other; z-order
    pays a bounded premium on both — the encoding face of the same
    tradeoff `skipping_audit` shows for zone maps.

    Shuffles: one groupBy on (file, b1, b2) — which collapses the
    stream before anything wide — then a per-file window and a
    2-row rollup."""
    folded = _folded(lineitem)
    natural_width = Z_FOLD // N_FILES
    z = F.expr(_z_expr("b1", "b2", "div"))

    def runs(df: DataFrame, name: str, order_col: str) -> DataFrame:
        g = df.groupBy("file_id", "b1", "b2").agg(
            F.count("*").cast("long").alias("n")
        )
        if order_col == "z":
            g = g.withColumn("z", z.cast("long"))
            order = [F.asc("z")]
        else:
            order = [F.asc("b1"), F.asc("b2")]
        w = Window.partitionBy("file_id").orderBy(*order)
        with_lag = g.select(
            "file_id",
            "n",
            (F.lag("b1").over(w).isNull()
             | (F.lag("b1").over(w) != F.col("b1")))
            .cast("long")
            .alias("nb1"),
            (F.lag("b2").over(w).isNull()
             | (F.lag("b2").over(w) != F.col("b2")))
            .cast("long")
            .alias("nb2"),
        )
        return with_lag.agg(
            F.lit(name).alias("layout"),
            F.countDistinct("file_id").cast("long").alias("n_files"),
            F.sum("n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum("nb1").cast("long").alias("runs_order_fold"),
            F.sum("nb2").cast("long").alias("runs_part_fold"),
        )

    from pyspark.sql.window import Window

    nat = folded.withColumn(
        "file_id", F.expr(f"b1 div {natural_width}")
    )
    zod = folded.withColumn("file_id", z.cast("long")).withColumn(
        "file_id", F.expr(f"file_id div {1 << Z_FILE_SHIFT}")
    )
    return runs(nat, "natural", "b1").unionByName(
        runs(zod, "zorder", "z")
    )


def rle_audit_oracle_sql() -> str:
    z = _z_expr("b1", "b2", "//")
    natural_width = Z_FOLD // N_FILES

    def side(name: str, file_expr: str, order: str) -> str:
        return f"""
    SELECT '{name}' AS layout,
           CAST(count(DISTINCT file_id) AS BIGINT) AS n_files,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(nb1) AS BIGINT) AS runs_order_fold,
           CAST(sum(nb2) AS BIGINT) AS runs_part_fold
    FROM (
        SELECT file_id, n,
               CASE WHEN lag(b1) OVER w IS NULL
                         OR lag(b1) OVER w <> b1
                    THEN 1 ELSE 0 END AS nb1,
               CASE WHEN lag(b2) OVER w IS NULL
                         OR lag(b2) OVER w <> b2
                    THEN 1 ELSE 0 END AS nb2
        FROM (
            SELECT {file_expr} AS file_id, b1, b2,
                   CAST(count(*) AS BIGINT) AS n,
                   {z} AS zv
            FROM folded GROUP BY 1, 2, 3
        )
        WINDOW w AS (PARTITION BY file_id ORDER BY {order})
    )"""

    return f"""
WITH folded AS (
    SELECT l_orderkey % {Z_FOLD} AS b1, l_partkey % {Z_FOLD} AS b2
    FROM lineitem
)
{side('natural', f'b1 // {natural_width}', 'b1, b2')}
UNION ALL
{side('zorder', f'({z}) // {1 << Z_FILE_SHIFT}', 'zv')}"""


COMPACT_TARGET_ROWS = 4096


def compaction_plan(lineitem: DataFrame) -> DataFrame:
    """Small-file compaction plan over the z-order layout: merge
    z-ADJACENT files into bins of ~COMPACT_TARGET_ROWS via the
    prefix-sum assignment ``bin = cum_rows_before div target`` —
    the deterministic, shuffle-light stand-in for greedy bin
    packing (bins can overshoot by at most one file; adjacency in
    z preserves the clustering the layout bought). Output one row
    per output bin: files merged, rows, and the bin's z-file range
    (what the rewrite job's input manifest would be).

    Shuffles: the zone-map groupBy (inherited) + one bounded global
    window over N_FILES rows (expressed as SQL text shared with the
    oracle)."""
    zm = zorder_zone_maps(lineitem).select("file_id", "n_rows")
    binned = zm.select(
        "file_id",
        "n_rows",
        F.expr(
            f"coalesce(sum(n_rows) OVER ("
            f"ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING"
            f" AND 1 PRECEDING), 0) div {COMPACT_TARGET_ROWS}"
        ).alias("bin_id"),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").cast("long").alias("n_files_merged"),
        F.sum("n_rows").cast("long").alias("bin_rows"),
        F.min("file_id").cast("long").alias("z_file_min"),
        F.max("file_id").cast("long").alias("z_file_max"),
    )


def compaction_plan_oracle_sql() -> str:
    return f"""
WITH zm AS ({zorder_oracle_sql()}),
binned AS (
    SELECT file_id, n_rows,
           CAST(coalesce(sum(n_rows) OVER (
               ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) // {COMPACT_TARGET_ROWS}
                AS BIGINT) AS bin_id
    FROM zm
)
SELECT bin_id, CAST(count(*) AS BIGINT) AS n_files_merged,
       CAST(sum(n_rows) AS BIGINT) AS bin_rows,
       CAST(min(file_id) AS BIGINT) AS z_file_min,
       CAST(max(file_id) AS BIGINT) AS z_file_max
FROM binned GROUP BY bin_id"""


# ----------------------------------------------------------------------
# Bloom-filter file-skipping audit
# ----------------------------------------------------------------------
#
# Zone maps (above) prune RANGE predicates; point lookups on a
# high-cardinality key that is scattered within every file (the
# natural state of l_partkey under orderkey-clustered ingest) pass
# every min/max check and scan everything. Per-file Bloom filters
# are the standard fix (Parquet bloom_filter_enabled, Iceberg
# bloom columns); this audit builds one 61-bit, 2-hash bloom word
# per z-order file over the folded partkey and measures the exact
# false-positive rate against a deterministic probe set — the
# number a table owner uses to size m/k before paying for real
# filters. All integer arithmetic (bit_or / bit_count / shifts are
# engine-identical), one groupBy(file) + one file-grain probe join.

BLOOM_BITS = 61  # word stays a positive BIGINT (bit 62 unused)
BLOOM_H1_MUL = 2654435761  # Knuth multiplicative; b2 < 2^16 so no overflow
BLOOM_H2_MUL = 40503
BLOOM_H2_ADD = 17
BLOOM_PROBES = 500  # probe keys 0..499 of the folded domain


def bloom_audit(lineitem: DataFrame) -> DataFrame:
    """Per z-order file: rows, distinct folded partkeys, bloom bits
    set, and exact probe results (hits / true presents / false
    positives / FPR over absent probes, ppm)."""
    z = F.expr(_z_expr("b1", "b2", "div"))
    keyed = (
        _folded(lineitem)
        .select("b2", z.cast("long").alias("z"))
        .select(
            "b2", F.expr(f"z div {1 << Z_FILE_SHIFT}").alias("file_id")
        )
    )
    h1 = f"(b2 * {BLOOM_H1_MUL}) % {BLOOM_BITS}"
    h2 = f"(b2 * {BLOOM_H2_MUL} + {BLOOM_H2_ADD}) % {BLOOM_BITS}"
    word = keyed.select(
        "file_id",
        "b2",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({h1} AS INT)) | "
            f"shiftleft(CAST(1 AS BIGINT), CAST({h2} AS INT))"
        ).alias("bits"),
    )
    blooms = word.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("b2").cast("long").alias("n_keys"),
        F.bit_or("bits").alias("bloom"),
    )
    spark = lineitem.sparkSession
    probes = spark.range(BLOOM_PROBES).select(
        F.col("id").cast("long").alias("k")
    )
    present = (
        keyed.filter(F.col("b2") < BLOOM_PROBES)
        .select("file_id", F.col("b2").alias("k"))
        .distinct()
        .withColumn("is_present", F.lit(1))
    )
    ph1 = f"(k * {BLOOM_H1_MUL}) % {BLOOM_BITS}"
    ph2 = f"(k * {BLOOM_H2_MUL} + {BLOOM_H2_ADD}) % {BLOOM_BITS}"
    probed = (
        blooms.crossJoin(F.broadcast(probes))
        .join(present, ["file_id", "k"], "left")
        .select(
            "file_id",
            "n_rows",
            "n_keys",
            "bloom",
            F.coalesce("is_present", F.lit(0)).alias("is_present"),
            F.expr(
                f"CASE WHEN (bloom & shiftleft(CAST(1 AS BIGINT),"
                f" CAST({ph1} AS INT))) <> 0 AND"
                f" (bloom & shiftleft(CAST(1 AS BIGINT),"
                f" CAST({ph2} AS INT))) <> 0 THEN 1 ELSE 0 END"
            ).alias("is_hit"),
        )
    )
    return (
        probed.groupBy("file_id")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("n_keys").alias("n_keys"),
            F.bit_count(F.max("bloom")).cast("long").alias("bits_set"),
            F.sum("is_hit").cast("long").alias("probe_hits"),
            F.sum("is_present").cast("long").alias("probe_present"),
            F.sum(
                ((F.col("is_hit") == 1) & (F.col("is_present") == 0))
                .cast("long")
            ).alias("false_positives"),
        )
        .withColumn(
            "fpr_ppm",
            F.expr(
                "CAST(false_positives * 1000000 div"
                f" greatest({BLOOM_PROBES} - probe_present, 1)"
                " AS BIGINT)"
            ),
        )
    )


def bloom_audit_oracle_sql() -> str:
    z = _z_expr("b1", "b2", "//")
    h1 = f"(b2 * {BLOOM_H1_MUL}) % {BLOOM_BITS}"
    h2 = f"(b2 * {BLOOM_H2_MUL} + {BLOOM_H2_ADD}) % {BLOOM_BITS}"
    ph1 = f"(p.k * {BLOOM_H1_MUL}) % {BLOOM_BITS}"
    ph2 = f"(p.k * {BLOOM_H2_MUL} + {BLOOM_H2_ADD}) % {BLOOM_BITS}"
    return f"""
WITH folded AS (
    SELECT l_orderkey % {Z_FOLD} AS b1, l_partkey % {Z_FOLD} AS b2
    FROM lineitem
), keyed AS (
    SELECT b2, ({z}) // {1 << Z_FILE_SHIFT} AS file_id FROM folded
), blooms AS (
    SELECT file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT b2) AS BIGINT) AS n_keys,
           bit_or((CAST(1 AS BIGINT) << CAST({h1} AS INT)) |
                  (CAST(1 AS BIGINT) << CAST({h2} AS INT))) AS bloom
    FROM keyed GROUP BY file_id
), probes AS (
    SELECT CAST(unnest(range(0, {BLOOM_PROBES})) AS BIGINT) AS k
), present AS (
    SELECT DISTINCT file_id, CAST(b2 AS BIGINT) AS k, 1 AS is_present
    FROM keyed WHERE b2 < {BLOOM_PROBES}
), probed AS (
    SELECT b.file_id, b.n_rows, b.n_keys, b.bloom, p.k AS k,
           coalesce(pr.is_present, 0) AS is_present,
           CASE WHEN (b.bloom & (CAST(1 AS BIGINT)
                                 << CAST({ph1} AS INT))) <> 0
                 AND (b.bloom & (CAST(1 AS BIGINT)
                                 << CAST({ph2} AS INT))) <> 0
                THEN 1 ELSE 0 END AS is_hit
    FROM blooms b CROSS JOIN probes p
    LEFT JOIN present pr
      ON pr.file_id = b.file_id AND pr.k = p.k
)
SELECT file_id,
       CAST(max(n_rows) AS BIGINT) AS n_rows,
       CAST(max(n_keys) AS BIGINT) AS n_keys,
       CAST(bit_count(max(bloom)) AS BIGINT) AS bits_set,
       CAST(sum(is_hit) AS BIGINT) AS probe_hits,
       CAST(sum(is_present) AS BIGINT) AS probe_present,
       CAST(sum(CASE WHEN is_hit = 1 AND is_present = 0
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS false_positives,
       CAST(sum(CASE WHEN is_hit = 1 AND is_present = 0
                     THEN 1 ELSE 0 END) * 1000000
            // greatest({BLOOM_PROBES} - sum(is_present), 1)
            AS BIGINT) AS fpr_ppm
FROM probed GROUP BY file_id"""
