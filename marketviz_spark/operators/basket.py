"""Market-basket mining: A-priori frequent pairs with
confidence / lift (Agrawal & Srikant, VLDB'94).

Baskets are orders, items are parts (distinct (l_orderkey,
l_partkey)). The classic distributed shape:

1. Item supports first (one small groupBy), then the A-PRIORI PRUNE:
   only items that are individually frequent can appear in a
   frequent pair, so the basket stream is semi-joined against the
   frequent-item set BEFORE any pair is generated (join strategy
   left to Catalyst/AQE — see the comment at the join) — the
   candidate-space collapse that makes the algorithm viable at
   scale (pair generation on the unpruned stream is the naive
   quadratic everyone regrets).
2. Within-basket pair generation is a self-equi-join on the basket
   key with ``i1 < i2`` — co-partitioned (both sides shuffle once,
   same key), never a cross join. Per-basket cost is size², so
   baskets are capped at BASKET_CAP items (rank by item id,
   deterministic) — the same refuse-the-blowup contract as
   dedup.MAX_BUCKET; the cap is a no-op on this data (max basket
   13) but the guard rides in the plan.
3. Support filter, then confidence/lift against the broadcast item
   supports and the 1-row basket count.

Exactness: supports are counts; confidence and lift are single
BIGINT ppm divisions (truncating on both engines). No floats.
Overflow margin: lift's numerator support·n_baskets·10⁶ needs
support·n_baskets < 9.2·10¹² — holds to ~10⁸ baskets at any
realistic pair support; beyond that rescale lift to per-mille or
lift the product into decimal(38,0) (Spark's non-ANSI mode would
otherwise wrap silently where DuckDB errors — the divergence the
margin exists to preclude).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MIN_SUPPORT = 2  # pair must co-occur in >= 2 baskets
BASKET_CAP = 256  # max items per basket entering pair generation


def _baskets(lineitem: DataFrame) -> DataFrame:
    """Distinct (basket, item) rows, CLUSTERED BY basket: the one
    full-data exchange every mining level shares (r13, guide §2.4).
    Distinct needs rows clustered on (basket, item) and hash(basket)
    satisfies that, so the explicit basket repartition lets the
    dedup, the per-basket cap window, AND the in-basket pair/triple
    generation all run on ONE exchange — the previous shape paid a
    (basket, item) exchange for the distinct plus a second basket
    exchange for the window. Trade, documented: the raw rows cross
    the wire un-deduped (no map-side combine), which is a wash at
    the low (order, part) duplication any order-lines table has; a
    corpus with heavy in-basket duplication should reinstate the
    distinct-first form."""
    return (
        lineitem.select(
            F.col("l_orderkey").alias("basket"),
            F.col("l_partkey").alias("item"),
        )
        .repartition("basket")
        .distinct()
    )


def _capped_items(
    baskets: DataFrame, frequent: DataFrame, cap: int
) -> DataFrame:
    """(basket, items): each basket's frequent items, ascending,
    capped at `cap` by item rank — one row per basket, array
    bounded by the cap, so the collect buffer is model-sized at
    any corpus scale. No exchange beyond _baskets' when the prune
    broadcasts (the window and the grouped collect both reuse the
    basket clustering)."""
    pruned = baskets.join(
        frequent.select("item"), "item", "left_semi"
    )
    return (
        pruned.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("basket").orderBy("item")
            ),
        )
        .filter(F.col("rn") <= cap)
        .groupBy("basket")
        .agg(F.sort_array(F.collect_list("item")).alias("items"))
    )


def basket_pairs(lineitem: DataFrame) -> DataFrame:
    """(item_a, item_b, support, conf_ab_ppm, lift_ppm) for every
    frequent pair. conf_ab = P(b ∈ basket | a ∈ basket);
    lift = support·n_baskets / (sup_a·sup_b), both ppm-truncated.

    Pair generation (r13 rework): in-basket combinations are
    generated MAP-SIDE from the capped per-basket item array
    (ordered nested transform over the ascending items, a < b by
    construction) instead of a basket-keyed self-join — same pair
    stream into the same (item_a, item_b) aggregation, one fewer
    pass over the capped frame, and the whole prune→cap→pair chain
    rides the single basket-clustered exchange (see _baskets). The
    per-basket work and memory stay cap²-bounded exactly as the
    self-join form's were."""
    baskets = _baskets(lineitem)
    n1 = baskets.agg(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    item_sup = baskets.groupBy("item").agg(
        F.count("*").cast("long").alias("sup_i")
    )
    frequent = item_sup.filter(F.col("sup_i") >= MIN_SUPPORT)
    # A-priori prune: drop never-frequent items BEFORE pairing.
    # NO broadcast hint: at MIN_SUPPORT=2 the frequent set is
    # nearly all items, and at 100 TB force-broadcasting it would
    # be the bug the round-8 RI-audit advice removed elsewhere —
    # Catalyst/AQE broadcasts it when (and only when) it fits;
    # with a realistic support threshold at scale it does.
    capped = _capped_items(baskets, frequent, BASKET_CAP)
    it = F.col("items")
    pairs = (
        capped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        it,
                        lambda x, i: F.transform(
                            F.slice(it, i + F.lit(2), F.size(it)),
                            lambda y: F.struct(
                                x.alias("item_a"), y.alias("item_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.item_a").alias("item_a"),
            F.col("p.item_b").alias("item_b"),
        )
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )
    return (
        pairs.join(
            F.broadcast(
                item_sup.select(
                    F.col("item").alias("item_a"),
                    F.col("sup_i").alias("sup_a"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                item_sup.select(
                    F.col("item").alias("item_b"),
                    F.col("sup_i").alias("sup_b"),
                )
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n1))
        .select(
            "item_a",
            "item_b",
            "support",
            F.expr("(support * 1000000) div sup_a").alias(
                "conf_ab_ppm"
            ),
            F.expr(
                "(support * n_baskets * 1000000) div (sup_a * sup_b)"
            ).alias("lift_ppm"),
        )
    )


def basket_pairs_oracle_sql() -> str:
    return f"""
WITH baskets AS (
    SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
    FROM lineitem
), n1 AS (
    SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
    FROM baskets
), item_sup AS (
    SELECT item, CAST(count(*) AS BIGINT) AS sup_i
    FROM baskets GROUP BY item
), pruned AS (
    SELECT basket, item FROM baskets
    WHERE item IN (SELECT item FROM item_sup
                   WHERE sup_i >= {MIN_SUPPORT})
), capped AS (
    SELECT basket, item FROM (
        SELECT basket, item, row_number() OVER (
            PARTITION BY basket ORDER BY item) AS rn
        FROM pruned
    ) WHERE rn <= {BASKET_CAP}
), pairs AS (
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(count(*) AS BIGINT) AS support
    FROM capped a JOIN capped b
      ON a.basket = b.basket AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING count(*) >= {MIN_SUPPORT}
)
SELECT item_a, item_b, support,
       (support * 1000000) // sa.sup_i AS conf_ab_ppm,
       (support * n_baskets * 1000000) // (sa.sup_i * sb.sup_i)
           AS lift_ppm
FROM pairs
JOIN item_sup sa ON sa.item = item_a
JOIN item_sup sb ON sb.item = item_b
CROSS JOIN n1"""


def copurchase_triangles(lineitem: DataFrame) -> DataFrame:
    """Triangle census of the co-purchase graph (nodes = parts,
    edges = frequent pairs): n_edges, ordered wedges, triangles,
    and transitivity (closed-wedge fraction, ppm).

    The classic distributed triangle count: edges are canonical
    (a < b) already, so the wedge join E(a,b)⋈E(b,c) with a<b<c
    enumerates each candidate wedge once and each triangle has
    EXACTLY one such representation ((a,b),(b,c)) closed by (a,c)
    — no multiple counting, no orientation pass. Id-ordering here
    stands in for the degree-ordering used at web scale to bound
    per-node wedge fan-out; the A-priori support threshold already
    bounds the co-purchase graph's degrees.

    Plan: the edge table (pair-mining output, ≪ data) is
    lineage-cut once, then one self-join on the wedge center and
    one semi-join on the closing edge — both equi-joins on edge
    keys; the census is a 1-row aggregate."""
    edges = (
        basket_pairs(lineitem)
        .select("item_a", "item_b")
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    # Cut the wedge join too: it is the heaviest stage and feeds
    # BOTH the census count and the closing semi-join — without
    # the cut it would execute twice.
    wedges = (
        edges.alias("e1")
        .join(
            edges.alias("e2"),
            F.col("e1.item_b") == F.col("e2.item_a"),
        )
        .select(
            F.col("e1.item_a").alias("a"),
            F.col("e1.item_b").alias("b"),
            F.col("e2.item_b").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    closed = wedges.join(
        edges.alias("e3"),
        (F.col("a") == F.col("e3.item_a"))
        & (F.col("c") == F.col("e3.item_b")),
        "left_semi",
    )
    return (
        wedges.agg(F.count("*").cast("long").alias("n_wedges"))
        .crossJoin(
            F.broadcast(
                closed.agg(
                    F.count("*").cast("long").alias("n_triangles")
                )
            )
        )
        .select(
            F.lit(n_edges).cast("long").alias("n_edges"),
            "n_wedges",
            "n_triangles",
            F.expr(
                "CASE WHEN n_wedges = 0 THEN NULL"
                " ELSE (n_triangles * 1000000) div n_wedges END"
            ).alias("transitivity_ppm"),
        )
    )


def triangles_oracle_sql(pairs_oracle: str) -> str:
    return f"""
WITH pairs AS MATERIALIZED ({pairs_oracle}),
edges AS MATERIALIZED (SELECT item_a, item_b FROM pairs),
wedges AS MATERIALIZED (
    SELECT e1.item_a AS a, e1.item_b AS b, e2.item_b AS c
    FROM edges e1 JOIN edges e2 ON e1.item_b = e2.item_a
),
closed AS (
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM wedges w
    WHERE EXISTS (SELECT 1 FROM edges e
                  WHERE e.item_a = w.a AND e.item_b = w.c)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
       n_triangles,
       CASE WHEN (SELECT count(*) FROM wedges) = 0 THEN NULL
            ELSE (n_triangles * 1000000)
                 // (SELECT count(*) FROM wedges) END
           AS transitivity_ppm
FROM closed"""


RECO_TOPK = 5


def item_recommendations(
    lineitem: DataFrame, k: int = RECO_TOPK
) -> DataFrame:
    """"Customers also bought": top-k partners per item by lift
    (ties: higher support, then smaller partner id) — the serving
    table a recommender materializes from the pair-mining output.

    The pair table stores each pair once (a < b); both directions
    matter for serving, so it is symmetrized first — a map-side
    union, then ONE window over the (item, partner) stream. conf is
    re-derived per direction (conf(a→b) ≠ conf(b→a)); lift is
    symmetric and rides along.
    """
    pairs = basket_pairs(lineitem)
    fwd = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("partner"),
        "support",
        F.col("conf_ab_ppm").alias("conf_ppm"),
        "lift_ppm",
    )
    # reverse direction: conf = support/sup_b, recomputed from the
    # symmetric fields support·n_baskets·10⁶/(sup_a·sup_b) × sup_a
    # is NOT recoverable from the row alone — rejoin the supports.
    # Same _baskets subtree as the miner (r13): the identical
    # repartition+distinct plan lets AQE reuse the miner's exchange
    # instead of paying a second full lineitem pass (the former
    # plain distinct here could never line up with it).
    item_sup = _baskets(lineitem).groupBy("item").agg(
        F.count("*").cast("long").alias("sup_i")
    )
    rev = (
        pairs.join(
            F.broadcast(
                item_sup.select(
                    F.col("item").alias("item_b"),
                    F.col("sup_i").alias("sup_b"),
                )
            ),
            "item_b",
        )
        .select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("partner"),
            "support",
            F.expr("(support * 1000000) div sup_b").alias("conf_ppm"),
            "lift_ppm",
        )
    )
    both = fwd.unionByName(rev)
    from pyspark.sql.window import Window

    w = Window.partitionBy("item").orderBy(
        F.desc("lift_ppm"), F.desc("support"), F.asc("partner")
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item",
            F.col("rank").cast("int").alias("rank"),
            "partner",
            "support",
            "conf_ppm",
            "lift_ppm",
        )
    )


def item_recommendations_oracle_sql(
    pairs_oracle: str, k: int = RECO_TOPK
) -> str:
    return f"""
WITH pairs AS MATERIALIZED ({pairs_oracle}),
baskets AS (
    SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
    FROM lineitem
), item_sup AS (
    SELECT item, CAST(count(*) AS BIGINT) AS sup_i
    FROM baskets GROUP BY item
), sym AS (
    SELECT item_a AS item, item_b AS partner, support,
           conf_ab_ppm AS conf_ppm, lift_ppm
    FROM pairs
    UNION ALL
    SELECT item_b, item_a, support,
           (support * 1000000) // sup_i, lift_ppm
    FROM pairs JOIN item_sup ON item = item_b
)
SELECT item, CAST(rank AS INT) AS rank, partner, support,
       conf_ppm, lift_ppm
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY item
        ORDER BY lift_ppm DESC, support DESC, partner) AS rank
    FROM sym
)
WHERE rank <= {k}"""


# ----------------------------------------------------------------------
# A-priori level-3: frequent triples
# ----------------------------------------------------------------------

TRIPLE_BASKET_CAP = 32  # items per basket entering triple generation


def basket_triples(lineitem: DataFrame) -> DataFrame:
    """Frequent item TRIPLES (item_a < item_b < item_c, support,
    lift3_ppm): the level-3 A-priori step above basket_pairs.

    The downward-closure property makes the candidate space safe:
    any sub-pair of a triple with support >= MIN_SUPPORT itself has
    support >= MIN_SUPPORT, so pruning baskets to frequent ITEMS
    (level 1) before the two ordered self-joins is sound, and the
    HAVING clause is the only filter needed for correctness. The
    basket cap bounds the per-basket join fan-out at C(32,3) even
    on a pathological basket (TPC-H baskets hold <= 7 items; the
    cap exists for skewed/fuzz shapes, mirrored in the oracle).

    lift3 = sup_abc * n_baskets^2 / (sup_a * sup_b * sup_c); the
    numerator exceeds int64 at real scale, so the product runs in
    DECIMAL(38,0) (HUGEINT on the oracle side) and only the final
    ppm value is cast back to BIGINT.

    The denominators sup_a/sup_b/sup_c are counted over the SAME
    capped population the triple supports come from (not the raw
    item supports), so lift3 stays an internally consistent
    statistic when the cap binds on skewed/fuzz shapes; on TPC-H
    baskets (<= 7 items) capped == raw and the output is identical
    (ADVICE r11).
    """
    baskets = _baskets(lineitem)
    n1 = baskets.agg(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    item_sup = baskets.groupBy("item").agg(
        F.count("*").cast("long").alias("sup_i")
    )
    frequent = item_sup.filter(F.col("sup_i") >= MIN_SUPPORT)
    capped = _capped_items(baskets, frequent, TRIPLE_BASKET_CAP)
    # lift denominators from the capped frame — same population as
    # the triple supports (see docstring)
    capped_sup = (
        capped.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("sup_i"))
    )
    # In-basket triple combinations map-side (r13, same rework as
    # basket_pairs): ordered nested transforms over the ascending
    # capped item array replace BOTH basket-keyed self-joins; for a
    # at 0-based i, b at 0-based j within the post-a tail, the c
    # tail starts at 1-based position i+j+3. Work and memory are
    # C(cap,3)-bounded per basket, mirroring the joins' fan-out.
    it = F.col("items")
    triples = (
        capped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        it,
                        lambda a, i: F.flatten(
                            F.transform(
                                F.slice(it, i + F.lit(2), F.size(it)),
                                lambda b, j: F.transform(
                                    F.slice(
                                        it,
                                        i + j + F.lit(3),
                                        F.size(it),
                                    ),
                                    lambda c: F.struct(
                                        a.alias("item_a"),
                                        b.alias("item_b"),
                                        c.alias("item_c"),
                                    ),
                                ),
                            )
                        ),
                    )
                )
            ).alias("t")
        )
        .groupBy(
            F.col("t.item_a").alias("item_a"),
            F.col("t.item_b").alias("item_b"),
            F.col("t.item_c").alias("item_c"),
        )
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )

    def sup(side: str) -> DataFrame:
        return F.broadcast(
            capped_sup.select(
                F.col("item").alias(f"item_{side}"),
                F.col("sup_i").alias(f"sup_{side}"),
            )
        )

    dec = "decimal(38,0)"
    return (
        triples.join(sup("a"), "item_a")
        .join(sup("b"), "item_b")
        .join(sup("c"), "item_c")
        .crossJoin(F.broadcast(n1))
        .select(
            "item_a",
            "item_b",
            "item_c",
            "support",
            F.expr(
                f"CAST((CAST(support AS {dec})"
                f" * CAST(n_baskets AS {dec})"
                f" * CAST(n_baskets AS {dec}) * 1000000)"
                f" div (CAST(sup_a AS {dec}) * CAST(sup_b AS {dec})"
                f" * CAST(sup_c AS {dec})) AS BIGINT)"
            ).alias("lift3_ppm"),
        )
    )


def basket_triples_oracle_sql() -> str:
    # every multiply-referenced CTE is AS MATERIALIZED: DuckDB's
    # inlining otherwise re-evaluates `capped` (and its window)
    # once per self-join arm — three evaluations of the whole
    # prune chain at sf1 (the repo's standing oracle pitfall #1)
    return f"""
WITH baskets AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
    FROM lineitem
), n1 AS (
    SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
    FROM baskets
), item_sup AS MATERIALIZED (
    SELECT item, CAST(count(*) AS BIGINT) AS sup_i
    FROM baskets GROUP BY item
), pruned AS (
    SELECT basket, item FROM baskets
    WHERE item IN (SELECT item FROM item_sup
                   WHERE sup_i >= {MIN_SUPPORT})
), capped AS MATERIALIZED (
    SELECT basket, item FROM (
        SELECT basket, item, row_number() OVER (
            PARTITION BY basket ORDER BY item) AS rn
        FROM pruned
    ) WHERE rn <= {TRIPLE_BASKET_CAP}
), capped_sup AS MATERIALIZED (
    -- lift denominators over the SAME capped population as the
    -- triple supports (internally consistent when the cap binds)
    SELECT item, CAST(count(*) AS BIGINT) AS sup_i
    FROM capped GROUP BY item
), triples AS (
    SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
           CAST(count(*) AS BIGINT) AS support
    FROM capped a
    JOIN capped b ON a.basket = b.basket AND a.item < b.item
    JOIN capped c ON a.basket = c.basket AND b.item < c.item
    GROUP BY a.item, b.item, c.item
    HAVING count(*) >= {MIN_SUPPORT}
)
SELECT item_a, item_b, item_c, support,
       CAST((CAST(support AS HUGEINT)
             * CAST(n_baskets AS HUGEINT)
             * CAST(n_baskets AS HUGEINT) * 1000000)
            // (CAST(sa.sup_i AS HUGEINT) * CAST(sb.sup_i AS HUGEINT)
                * CAST(sc.sup_i AS HUGEINT)) AS BIGINT) AS lift3_ppm
FROM triples
JOIN capped_sup sa ON sa.item = item_a
JOIN capped_sup sb ON sb.item = item_b
JOIN capped_sup sc ON sc.item = item_c
CROSS JOIN n1"""
