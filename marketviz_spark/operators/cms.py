"""Count-min sketch heavy-hitter audit (Cormode & Muthukrishnan,
J.Algorithms'05) — the mergeable fixed-size frequency sketch, built
distributed and audited against exact counts in the same plan.

Why it matters at 100 TB: exact per-key counts of a high-cardinality
column need a key-grain shuffle; a CMS is a d×w INTEGER grid that
partial-aggregates map-side and merges by cell-wise addition —
constant size regardless of cardinality, streamable, unionable
across days. The sketch never under-counts; the audit quantifies the
collision overestimate on the true heavy hitters.

Engine parity: the d hash rows use the same LCG family as the PPS
sampler (`sample_pps`): h_t(x) = ((x % P)·A + t·B) % P % w — pure
BIGINT, identical text on both engines. Cells, estimates (min over
rows), and overestimate ppm are all integers.

Plan shape: exact counts groupBy(item) once; the sketch derives
FROM those pre-aggregated counts (map-side combine — each item
contributes once per row, not once per occurrence), collapsing to
d·w rows; the audit joins the top-k exact items against the
broadcast d·w cell table. One key-grain shuffle total; everything
downstream is sketch-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_P = 2_147_483_647
CMS_A = 48_271
CMS_B = 9_973
CMS_TOPK = 20


def _col_expr(item: str, t: int) -> str:
    """Row-t column index, textually identical on both engines."""
    return (
        f"(((({item}) % {CMS_P}) * {CMS_A} + {t} * {CMS_B})"
        f" % {CMS_P}) % {CMS_WIDTH}"
    )


def cms_heavy_hitters(
    lineitem: DataFrame, k: int = CMS_TOPK
) -> DataFrame:
    """(rank, item, exact_cnt, cms_est, over_ppm) for the top-k
    exact heavy hitters of l_partkey. cms_est >= exact_cnt always
    (the CMS one-sided error); over_ppm is the collision cost."""
    counts = lineitem.groupBy(
        F.col("l_partkey").alias("item")
    ).agg(F.count("*").cast("long").alias("cnt"))

    # d cells per item via ONE explode (a union of d branches would
    # recompute the counts subtree — and rescan the fact — d times)
    hash_cols = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.expr(_col_expr("item", t)).alias("col"),
            )
            for t in range(CMS_DEPTH)
        ]
    )
    hashed = counts.select(
        "item", "cnt", F.explode(hash_cols).alias("h")
    ).select("item", "cnt", "h.t", "h.col")
    cells = hashed.groupBy("t", "col").agg(
        F.sum("cnt").cast("long").alias("cell")
    )

    top = counts.orderBy(F.desc("cnt"), F.asc("item")).limit(k)
    probes = top.select(
        "item", "cnt", F.explode(hash_cols).alias("h")
    ).select("item", "cnt", "h.t", "h.col")
    est = (
        probes.join(F.broadcast(cells), ["t", "col"])
        .groupBy("item", "cnt")
        .agg(F.min("cell").cast("long").alias("cms_est"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("item"))
    return est.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "item",
        F.col("cnt").alias("exact_cnt"),
        "cms_est",
        F.expr("((cms_est - cnt) * 1000000) div cnt").alias(
            "over_ppm"
        ),
    )


def cms_oracle_sql(k: int = CMS_TOPK) -> str:
    hash_rows = "\n    UNION ALL\n".join(
        f"    SELECT {t} AS t, ({_col_expr('item', t)})"
        f" AS col, item, cnt FROM counts"
        for t in range(CMS_DEPTH)
    )
    return f"""
WITH counts AS MATERIALIZED (
    SELECT l_partkey AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_partkey
), hashed AS MATERIALIZED (
{hash_rows}
), cells AS (
    SELECT t, col, CAST(sum(cnt) AS BIGINT) AS cell
    FROM hashed GROUP BY t, col
), top AS (
    SELECT item, cnt FROM counts
    ORDER BY cnt DESC, item LIMIT {k}
), est AS (
    SELECT h.item, h.cnt,
           CAST(min(cell) AS BIGINT) AS cms_est
    FROM hashed h
    JOIN top USING (item)
    JOIN cells ON cells.t = h.t AND cells.col = h.col
    GROUP BY h.item, h.cnt
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, item) AS INT)
           AS rank,
       item, cnt AS exact_cnt, cms_est,
       ((cms_est - cnt) * 1000000) // cnt AS over_ppm
FROM est"""


def with_cms_cells(
    events: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Attach the d (t, col) sketch coordinates of ``key`` to each
    event (one explode, map-only) — the shared core of the batch
    and streaming windowed-CMS builds."""
    hash_cols = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.expr(_col_expr(key, t)).alias("col"),
            )
            for t in range(CMS_DEPTH)
        ]
    )
    return events.select(
        "ts", F.explode(hash_cols).alias("h")
    ).select("ts", "h.t", "h.col")


def events_cms_cells(events: DataFrame) -> DataFrame:
    """Hourly CMS cell grid of user_id frequencies — the batch twin
    of streaming.windows.cms_cells (stream==batch is asserted in
    tests/test_streaming-style equality). Each hour's d×w grid is a
    complete, mergeable sketch: summing grids across hours/days IS
    the union sketch, which is the operational point — a streaming
    job maintains per-window heavy-hitter state in O(d·w) instead
    of per-key state."""
    return (
        with_cms_cells(events)
        .groupBy(F.window("ts", "1 hour"), "t", "col")
        .agg(F.count("*").cast("long").alias("cell"))
        .select(
            F.date_format(
                "window.start", "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "t",
            "col",
            "cell",
        )
    )


def join_size_estimate(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """Join-cardinality estimation — what a CBO does before picking
    a join strategy. |A ⋈_k B| = Σ_k cA(k)·cB(k); the CMS estimate
    is the grid inner product min_t Σ_col gA[t,col]·gB[t,col]
    (AMS/CMS inner-product estimate — one-sided: collisions only
    ADD). Both sides here so the audit can report the ppm error.

    Scale: the exact term needs the co-keyed counts join (one
    shuffle per side — the thing a real CBO cannot afford, which
    is the point of the sketch); the estimate needs only the two
    1024-cell grids, buildable map-side and mergeable. Overflow
    margin: cell·cell·width < 2⁶³ holds to ~10⁸ rows per grid
    cell; beyond that widen the grid or lift to decimal(38,0).
    """
    cl = lineitem.groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count("*").cast("long").alias("c"))
    co = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").cast("long").alias("c")
    )
    exact = (
        cl.alias("a")
        .join(co.alias("b"), "k")
        .agg(
            F.coalesce(
                F.sum(F.col("a.c") * F.col("b.c")), F.lit(0)
            )
            .cast("long")
            .alias("exact_pairs")
        )
    )

    def grid(counts: DataFrame) -> DataFrame:
        hash_cols = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    F.expr(_col_expr("k", t)).alias("col"),
                )
                for t in range(CMS_DEPTH)
            ]
        )
        return (
            counts.select("c", F.explode(hash_cols).alias("h"))
            .select("c", "h.t", "h.col")
            .groupBy("t", "col")
            .agg(F.sum("c").cast("long").alias("cell"))
        )

    prod = (
        grid(cl)
        .alias("ga")
        .join(
            grid(co).alias("gb"),
            ["t", "col"],
        )
        .groupBy("t")
        .agg(
            F.sum(F.col("ga.cell") * F.col("gb.cell"))
            .cast("long")
            .alias("p")
        )
        .agg(F.min("p").cast("long").alias("cms_est_pairs"))
    )
    return exact.crossJoin(F.broadcast(prod)).select(
        "exact_pairs",
        "cms_est_pairs",
        F.expr(
            "CASE WHEN exact_pairs = 0 THEN NULL"
            " ELSE ((cms_est_pairs - exact_pairs) * 1000000)"
            "      div exact_pairs END"
        ).alias("over_ppm"),
    )


def join_size_oracle_sql() -> str:
    def hashed(cte: str) -> str:
        return "\n    UNION ALL\n".join(
            f"    SELECT {t} AS t, ({_col_expr('k', t)}) AS col, c"
            f" FROM {cte}"
            for t in range(CMS_DEPTH)
        )

    return f"""
WITH cl AS MATERIALIZED (
    SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
    FROM lineitem GROUP BY l_orderkey
), co AS MATERIALIZED (
    SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
    FROM orders GROUP BY o_orderkey
), exact AS (
    SELECT CAST(COALESCE(sum(cl.c * co.c), 0) AS BIGINT)
               AS exact_pairs
    FROM cl JOIN co USING (k)
), ga AS (
    SELECT t, col, CAST(sum(c) AS BIGINT) AS cell FROM (
{hashed('cl')}
    ) GROUP BY t, col
), gb AS (
    SELECT t, col, CAST(sum(c) AS BIGINT) AS cell FROM (
{hashed('co')}
    ) GROUP BY t, col
), est AS (
    SELECT CAST(min(p) AS BIGINT) AS cms_est_pairs FROM (
        SELECT ga.t, sum(ga.cell * gb.cell) AS p
        FROM ga JOIN gb ON ga.t = gb.t AND ga.col = gb.col
        GROUP BY ga.t
    )
)
SELECT exact_pairs, cms_est_pairs,
       CASE WHEN exact_pairs = 0 THEN NULL
            ELSE ((cms_est_pairs - exact_pairs) * 1000000)
                 // exact_pairs END AS over_ppm
FROM exact CROSS JOIN est"""
