"""Iterative graph analytics: integer-exact PageRank.

PageRank (Brin & Page, WWW'98) over the supply graph derived from
the TPC-H-ish tables: a directed edge supplier→customer for every
distinct (l_suppkey, o_custkey) pair in lineitem⋈orders. Customers
have no out-edges, which makes them DANGLING nodes — the classic
PageRank complication — so the dangling mass is redistributed
uniformly each step, exactly as in the original formulation.

Cross-engine exactness: ranks are BIGINT parts-per-trillion. Every
step is integer arithmetic with truncating division (`div` in Spark,
`//` in DuckDB — identical on the non-negative values here):

    base   = TOTAL div N                       (uniform teleport)
    contrib(v) = Σ_{u→v} r_u div outdeg(u)
    dm     = Σ_{dangling u} r_u
    r'(v)  = (15·base) div 100
           + (85·(contrib(v) + dm div N)) div 100

The division dust (< 1 ppt per node per step) is deliberately lost
on BOTH engines identically, so the unrolled-CTE DuckDB oracle
hashes bit-for-bit — no float ever appears.

Scale shape (the 100-TB story):
- Edge derivation is one co-keyed lineitem⋈orders shuffle + a
  distinct on (src, dst); out-degrees attach with one groupBy on
  src that then co-partitions with the per-iteration contribution
  join (`src` is the join key throughout — one partitioning reused
  across all iterations).
- Each iteration is exactly TWO wide stages over the edge list:
  the ranks⋈edges join on src and the groupBy(dst) sum. The ranks
  table is node-sized (≪ edges); the dangling sum and the node
  count broadcast as 1-row frames.
- Lineage is cut per iteration with localCheckpoint (same pattern
  as dedup._star_components; on a real cluster use
  `reliable_checkpoint=True` → HDFS checkpoint every few rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PR_TOTAL = 10**12  # total rank mass (parts-per-trillion)
PR_ITERS = 4  # fixed, cross-engine unrollable
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as a rational


def supply_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Distinct supplier→customer edges ('S<k>' → 'C<k>')."""
    return (
        lineitem.select("l_suppkey", "l_orderkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = PR_ITERS,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Integer-exact PageRank: ``nodes(node)``, ``edges(src, dst)``
    → ``(node, rank_ppt)``. See module docstring for the exact
    recurrence and scale notes.

    Thin wrapper over :func:`pagerank_weighted` with unit weights —
    exactly equivalent because ``(r·1) div deg == r div deg``
    (pinned in test_weighted_pagerank_reduces_to_unweighted_on_
    unit_weights), so the iteration logic lives in ONE place."""
    return pagerank_weighted(
        nodes,
        edges.select("src", "dst").withColumn(
            "w", F.lit(1).cast("long")
        ),
        iters=iters,
        reliable_checkpoint=reliable_checkpoint,
    )


def supply_pagerank(
    spark: SparkSession, sf_dir: str, iters: int = PR_ITERS
) -> DataFrame:
    """PageRank over the supplier→customer supply graph."""
    from .. import tables

    lineitem = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    supplier = tables.load(spark, sf_dir, "supplier")
    customer = tables.load(spark, sf_dir, "customer")
    nodes = (
        supplier.select(
            F.concat(
                F.lit("S"), F.col("s_suppkey").cast("string")
            ).alias("node")
        )
        .unionByName(
            customer.select(
                F.concat(
                    F.lit("C"), F.col("c_custkey").cast("string")
                ).alias("node")
            )
        )
        .distinct()
    )
    edges = supply_edges(lineitem, orders)
    return pagerank(nodes, edges, iters=iters)


def pagerank_oracle_sql(iters: int = PR_ITERS) -> str:
    """DuckDB twin: the identical integer recurrence unrolled as
    ``iters`` CTE steps from the same constants."""
    base = f"({PR_TOTAL} // n)"
    sql = f"""
WITH edges AS (
    SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS src,
                    'C' || CAST(o_custkey AS VARCHAR) AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), outdeg AS (
    SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
), nodes AS (
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS node FROM supplier
    UNION
    SELECT 'C' || CAST(c_custkey AS VARCHAR) AS node FROM customer
), nn AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), r0 AS (
    SELECT node, CAST({PR_TOTAL} // n AS BIGINT) AS r
    FROM nodes CROSS JOIN nn
)"""
    for i in range(iters):
        sql += f""", dm{i} AS (
    SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS dm
    FROM r{i} LEFT JOIN outdeg ON node = src WHERE deg IS NULL
), c{i} AS (
    SELECT dst, CAST(sum(r // deg) AS BIGINT) AS cin
    FROM edges JOIN outdeg USING (src) JOIN r{i} ON node = src
    GROUP BY dst
), r{i + 1} AS (
    SELECT nodes.node,
           CAST(({PR_DAMP_DEN - PR_DAMP_NUM} * {base})
                    // {PR_DAMP_DEN}
                + ({PR_DAMP_NUM} * (COALESCE(cin, 0) + dm // n))
                    // {PR_DAMP_DEN} AS BIGINT) AS r
    FROM nodes CROSS JOIN nn CROSS JOIN dm{i}
    LEFT JOIN c{i} ON nodes.node = c{i}.dst
)"""
    return sql + f"\nSELECT node, r AS rank_ppt FROM r{iters}"


def pagerank_weighted(
    nodes: DataFrame | None,
    edges: DataFrame,
    iters: int = PR_ITERS,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Weighted PageRank: ``edges(src, dst, w)`` with BIGINT
    weights; a node's rank flows out proportionally to edge weight:

        contrib(u→v) = (r_u · w_uv) div strength(u),  strength = Σw

    Same integer contract, iteration shape, and dangling handling
    as :func:`pagerank` (w=1 on every edge reproduces it exactly,
    since (r·1) div deg == r div deg). Overflow margin: needs
    r·w < 2⁶³, i.e. max edge weight below ~9·10⁶ at the 10¹²
    rank scale — rescale weights (only ratios matter) above that.

    ``nodes=None`` derives the node set from the CHECKPOINTED edge
    list (``distinct src`` — complete for symmetrized graphs): a
    caller whose node frame is itself a view over the edge-mining
    pipeline would otherwise re-run that whole pipeline a second
    time just to list ids (the r13 copurchase finding: the
    basket-pair miner executed twice per query).

    Per-iteration shape (r13 rework, guide §2.4 — remove shuffles
    outright): the node count and the dangling flag are STATIC, so
    they are computed once — n as one driver-side scalar folded
    into the recurrence as a literal (the model-collect pattern;
    it replaces a per-iteration 1-row broadcast agg + crossJoin),
    and ``_dangling`` as a column carried on the rank frame (it
    replaces a per-iteration broadcast anti-join against strength).
    Each iteration is then exactly: one filter+agg over ranks (the
    dangling mass), one edges⋈ranks join + groupBy(dst) shuffle,
    and one node-table left join — two wide stages over the edges.
    """

    def ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
        if reliable_checkpoint:
            # reliable checkpoints stay eager: non-eager RDD
            # checkpointing recomputes lineage to write the files
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=eager)

    # Cut the (expensive) edge mining ONCE; derive strength, the
    # join input, and (optionally) the node set from the cut. `raw`
    # stays EAGER: its first consumer job reads it through two
    # branches (node_src and strength), and a lazy checkpoint would
    # let both recompute the miner concurrently. The three derived
    # cuts are LAZY (r14, guide §2.6): each has a single first
    # consumer — nodes2/strength materialize inside the n-count job,
    # edges inside iteration 1's job — so three materialize-only job
    # submissions disappear.
    raw = ckpt(edges.select("src", "dst", "w"))
    strength = ckpt(
        raw.groupBy("src").agg(
            F.sum("w").cast("long").alias("s_out")
        ),
        eager=False,
    )
    edges = ckpt(
        raw.join(strength, "src").select("src", "dst", "w", "s_out"),
        eager=False,
    )
    node_src = (
        raw.select(F.col("src").alias("node"))
        if nodes is None
        else nodes.select("node")
    )
    nodes2 = ckpt(
        node_src.distinct()
        .join(strength, F.col("node") == F.col("src"), "left")
        .select("node", F.col("s_out").isNull().alias("_dangling")),
        eager=False,
    )
    # One bounded driver scalar (the pq_train model-collect shape):
    # nodes2 is already materialized, so this is a cheap count, and
    # inlining n removes two 1-row broadcast subplans per iteration.
    n = nodes2.count()
    if n == 0:
        return nodes2.select(
            "node", F.lit(0).cast("long").alias("rank_ppt")
        )
    base = PR_TOTAL // n  # == TOTAL div n (both non-negative)
    teleport = ((PR_DAMP_DEN - PR_DAMP_NUM) * base) // PR_DAMP_DEN

    ranks = nodes2.select(
        "node", "_dangling", F.lit(base).cast("long").alias("r")
    )
    for _ in range(iters):
        dm1 = ranks.filter(F.col("_dangling")).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
        )
        contrib = (
            edges.join(
                ranks.select("node", "r"),
                edges["src"] == F.col("node"),
            )
            .select("dst", F.expr("(r * w) div s_out").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("cin"))
        )
        ranks = ckpt(
            nodes2.crossJoin(F.broadcast(dm1))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                "_dangling",
                F.expr(
                    f"{teleport}L"
                    f" + ({PR_DAMP_NUM} * (coalesce(cin, 0)"
                    f" + dm div {n})) div {PR_DAMP_DEN}"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_ppt"))


def copurchase_pagerank(
    spark: SparkSession, sf_dir: str, iters: int = PR_ITERS
) -> DataFrame:
    """Weighted PageRank over the SYMMETRIZED co-purchase graph
    (nodes = frequent parts, edge weight = pair support): product
    centrality. Symmetric edges mean no dangling nodes, but the
    dangling path stays live for generality (and for fuzz shapes
    where the pair set is empty)."""
    from .. import tables
    from .basket import basket_pairs

    pairs = basket_pairs(
        tables.load(spark, sf_dir, "lineitem")
    ).select("item_a", "item_b", "support")
    fwd = pairs.select(
        F.concat(F.lit("P"), F.col("item_a").cast("string")).alias("src"),
        F.concat(F.lit("P"), F.col("item_b").cast("string")).alias("dst"),
        F.col("support").cast("long").alias("w"),
    )
    rev = pairs.select(
        F.concat(F.lit("P"), F.col("item_b").cast("string")).alias("src"),
        F.concat(F.lit("P"), F.col("item_a").cast("string")).alias("dst"),
        F.col("support").cast("long").alias("w"),
    )
    # nodes=None: the node set is the distinct src of the CHECKPOINTED
    # symmetrized edges inside pagerank_weighted — deriving it here
    # from the lazy `edges` plan re-ran the whole basket_pairs miner
    # a second time (measured r13: ~3.3 s of duplicated stages per
    # run at sf0.1).
    edges = fwd.unionByName(rev)
    return pagerank_weighted(None, edges, iters=iters)


def copurchase_pagerank_oracle_sql(
    pairs_oracle: str, iters: int = PR_ITERS
) -> str:
    """Unrolled weighted recurrence over the pair-mining oracle."""
    base = f"({PR_TOTAL} // n)"
    sql = f"""
WITH pairs AS MATERIALIZED ({pairs_oracle}),
edges AS MATERIALIZED (
    SELECT 'P' || CAST(item_a AS VARCHAR) AS src,
           'P' || CAST(item_b AS VARCHAR) AS dst,
           support AS w
    FROM pairs
    UNION ALL
    SELECT 'P' || CAST(item_b AS VARCHAR),
           'P' || CAST(item_a AS VARCHAR), support
    FROM pairs
), strength AS (
    SELECT src, CAST(sum(w) AS BIGINT) AS s_out
    FROM edges GROUP BY src
), nodes AS (
    SELECT DISTINCT src AS node FROM edges
), nn AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), r0 AS (
    SELECT node, CAST({PR_TOTAL} // n AS BIGINT) AS r
    FROM nodes CROSS JOIN nn
)"""
    for i in range(iters):
        sql += f""", dm{i} AS (
    SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS dm
    FROM r{i} LEFT JOIN strength ON node = src WHERE s_out IS NULL
), c{i} AS (
    SELECT dst, CAST(sum((r * w) // s_out) AS BIGINT) AS cin
    FROM edges JOIN strength USING (src) JOIN r{i} ON node = src
    GROUP BY dst
), r{i + 1} AS (
    SELECT nodes.node,
           CAST(({PR_DAMP_DEN - PR_DAMP_NUM} * {base})
                    // {PR_DAMP_DEN}
                + ({PR_DAMP_NUM} * (COALESCE(cin, 0) + dm // n))
                    // {PR_DAMP_DEN} AS BIGINT) AS r
    FROM nodes CROSS JOIN nn CROSS JOIN dm{i}
    LEFT JOIN c{i} ON nodes.node = c{i}.dst
)"""
    return sql + f"\nSELECT node, r AS rank_ppt FROM r{iters}"


# ----------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ----------------------------------------------------------------------

KCORE_K = 3  # minimum within-core degree
KCORE_ITERS = 10  # fixed peel rounds, cross-engine unrollable
# (sf0.01 co-purchase graph converges in 9; extra rounds are no-op
# prunes over the stable core — the certificate column PROVES the
# fixed point rather than assuming it)


def kcore(
    edges: DataFrame,
    k: int = KCORE_K,
    iters: int = KCORE_ITERS,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """k-core of a SYMMETRIZED edge list: repeatedly drop nodes of
    degree < k (and their incident edges) for `iters` rounds, then
    report each surviving node's within-core degree plus a
    convergence certificate (the core's min degree — >= k iff one
    more peel would drop nobody, the same audit-not-assumption
    pattern as dedup's star-contraction).

    Scale: each peel round is one groupBy(src) degree count plus
    two semi-join prunes keyed on src/dst — the same co-partitioned
    keys every round, so AQE reuses the exchange layout. The
    surviving-node frame only shrinks. Lineage is cut per round
    (localCheckpoint; pass reliable_checkpoint=True on a real
    cluster for HDFS checkpoints).
    """

    def ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
        if reliable_checkpoint:
            # reliable checkpoints stay eager: non-eager RDD
            # checkpointing recomputes lineage to write the files
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=eager)

    # Early exit at the fixed point (r13): peeling only ever REMOVES
    # edges, so an unchanged edge count after a round means no node
    # fell below k — every remaining round is the identity and the
    # output (including the certificate) is unchanged by skipping
    # them. r14 (guide §2.6): the checkpoint is LAZY and the count
    # is its materializing action, so each round is ONE job
    # (peel + persist + count) instead of a materialize job plus a
    # count job; blocks persist as they compute, nothing runs twice.
    cur = ckpt(edges.select("src", "dst").distinct(), eager=False)
    prev_n = cur.count()
    for _ in range(iters):
        keep = (
            cur.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        cur = ckpt(
            cur.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst"),
            eager=False,
        )
        n = cur.count()
        if n == prev_n:
            break
        prev_n = n
    deg = cur.groupBy("src").agg(
        F.count("*").cast("long").alias("core_deg")
    )
    cert = deg.agg(
        F.min("core_deg").cast("long").alias("min_core_deg"),
        F.count("*").cast("long").alias("n_core_nodes"),
    )
    return (
        deg.crossJoin(F.broadcast(cert))
        .select(
            F.col("src").alias("node"),
            "core_deg",
            "n_core_nodes",
            "min_core_deg",
            (F.col("min_core_deg") >= k).alias("converged"),
        )
        .orderBy("node")
    )


def copurchase_kcore(
    spark: SparkSession,
    sf_dir: str,
    k: int = KCORE_K,
    iters: int = KCORE_ITERS,
) -> DataFrame:
    """k-core over the symmetrized co-purchase graph (same edge
    miner as copurchase_pagerank): the densely-connected product
    nucleus a recommender would seed from."""
    from .. import tables
    from .basket import basket_pairs

    pairs = basket_pairs(
        tables.load(spark, sf_dir, "lineitem")
    ).select("item_a", "item_b")
    fwd = pairs.select(
        F.concat(F.lit("P"), F.col("item_a").cast("string")).alias("src"),
        F.concat(F.lit("P"), F.col("item_b").cast("string")).alias("dst"),
    )
    rev = pairs.select(
        F.concat(F.lit("P"), F.col("item_b").cast("string")).alias("src"),
        F.concat(F.lit("P"), F.col("item_a").cast("string")).alias("dst"),
    )
    return kcore(fwd.unionByName(rev), k=k, iters=iters)


def copurchase_kcore_oracle_sql(
    pairs_oracle: str, k: int = KCORE_K, iters: int = KCORE_ITERS
) -> str:
    """Unrolled peeling over the pair-mining oracle. Every round's
    edge set is AS MATERIALIZED — DuckDB's CTE inlining would
    otherwise re-evaluate the whole peel chain once per reference
    (see PAPERS.md pitfall; same treatment as the PageRank
    oracle)."""
    sql = f"""
WITH pairs AS MATERIALIZED ({pairs_oracle}),
e0 AS MATERIALIZED (
    SELECT 'P' || CAST(item_a AS VARCHAR) AS src,
           'P' || CAST(item_b AS VARCHAR) AS dst
    FROM pairs
    UNION ALL
    SELECT 'P' || CAST(item_b AS VARCHAR),
           'P' || CAST(item_a AS VARCHAR)
    FROM pairs
)"""
    for i in range(iters):
        sql += f""", k{i} AS MATERIALIZED (
    SELECT src FROM e{i} GROUP BY src HAVING count(*) >= {k}
), e{i + 1} AS MATERIALIZED (
    SELECT e.src, e.dst
    FROM e{i} e JOIN k{i} a ON e.src = a.src
    JOIN k{i} b ON e.dst = b.src
)"""
    return sql + f""", deg AS (
    SELECT src, CAST(count(*) AS BIGINT) AS core_deg
    FROM e{iters} GROUP BY src
), cert AS (
    SELECT CAST(min(core_deg) AS BIGINT) AS min_core_deg,
           CAST(count(*) AS BIGINT) AS n_core_nodes
    FROM deg
)
SELECT src AS node, core_deg, n_core_nodes, min_core_deg,
       min_core_deg >= {k} AS converged
FROM deg CROSS JOIN cert"""
