"""Cross-series similarity: top-k most price-correlated ticker
pairs — the distributed time-series similarity-search shape (cf.
the retrieved EDBT'19/VLDB'23 distributed-series-search papers:
candidate-bound first, exact-score second).

Scale design: pairwise correlation over N series is O(N²·T) — never
run it on the full universe. The operator takes an explicit
UNIVERSE bound (here a ticker prefix range; in production a sector/
index membership list) and generates candidate pairs per DATE
bucket (a self-equi-join on date restricted to the universe), so
the pair stream is bounded by |universe|²/2 per trading day and the
aggregation is keyed by the uniform (ticker_a, ticker_b) pair key.
For universes beyond ~1e3 series, bucket by a coarse sketch first
(e.g. sign-of-move SimHash) exactly like the text LSH path.

Exactness: the five co-moment sums accumulate 2-dp prices as
DECIMAL (4-dp products) — order-free exact integers in scaled form.
The Pearson ratio is then a FIXED expression tree over the exact
sums cast to double, floor-rounded at 6 dp with a pair tiebreak, so
Spark and the SQL oracle rank identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..numerics import rnd

CORR_UNIVERSE_MAX = "T00200"  # ticker-prefix universe bound
CORR_MIN_OVERLAP = 3  # min shared trading days per pair; a real
# deployment uses >=30 — the synthetic sparse shipping calendar
# caps pair overlap at ~5 days, and the floor is a parameter
CORR_TOPK = 50


def corr_pairs(
    stocks_df: DataFrame,
    universe_max: str = CORR_UNIVERSE_MAX,
    min_overlap: int = CORR_MIN_OVERLAP,
    k: int = CORR_TOPK,
) -> DataFrame:
    """Top-k (ticker_a, ticker_b, n_days, corr) by Pearson
    correlation of shared-date closing prices within the universe,
    ties broken by the pair key. Pairs below `min_overlap` shared
    days or with zero price variance on either side are dropped
    (a constant series has no defined correlation)."""
    px = (
        stocks_df.filter(F.col("ticker") < universe_max)
        .select(
            "ticker",
            "date",
            F.col("share_price").cast("decimal(18,2)").alias("p"),
        )
    )
    a, b = px.alias("a"), px.alias("b")
    pairs = a.join(
        b,
        (F.col("a.date") == F.col("b.date"))
        & (F.col("a.ticker") < F.col("b.ticker")),
    ).select(
        F.col("a.ticker").alias("ticker_a"),
        F.col("b.ticker").alias("ticker_b"),
        F.col("a.p").alias("x"),
        F.col("b.p").alias("y"),
    )
    return _score_and_rank(pairs, min_overlap, k)


def _score_and_rank(
    pairs: DataFrame, min_overlap: int, k: int
) -> DataFrame:
    """Shared exact-scoring tail of both tiers: DECIMAL co-moment
    aggregation keyed by the pair, the fixed-expression Pearson
    ratio over exact sums, overlap/variance filters, and the
    floor-rounded 6dp rank with pair tiebreak. One implementation
    so the exact and sketch tiers (and therefore corr_recall's hit
    join) can never diverge in scoring semantics. `pairs` carries
    (ticker_a, ticker_b, x, y) with x/y DECIMAL(18,2)."""
    g = pairs.groupBy("ticker_a", "ticker_b").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    vx = nd * F.col("sxx").cast("double") - sxd * sxd
    vy = nd * F.col("syy").cast("double") - syd * syd
    num = nd * F.col("sxy").cast("double") - sxd * syd
    scored = (
        g.filter(F.col("n") >= min_overlap)
        .withColumn("vx", vx)
        .withColumn("vy", vy)
        .filter((F.col("vx") > 0) & (F.col("vy") > 0))
        .select(
            "ticker_a",
            "ticker_b",
            F.col("n").alias("n_days"),
            rnd(num / F.sqrt(F.col("vx") * F.col("vy")), 6).alias(
                "corr"
            ),
        )
    )
    w = Window.orderBy(
        F.desc("corr"), F.asc("ticker_a"), F.asc("ticker_b")
    )
    # rank over a LIMIT-bounded set would be ideal, but the rank IS
    # the output; the window input is already reduced to the
    # candidate-bounded scored pairs, not data volume
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "ticker_a",
            "ticker_b",
            "n_days",
            "corr",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# Scale path: sign-of-move sketch bucketing (the LSH tier). Weeks
# are integer-indexed from a fixed epoch (never engine week-number
# semantics); movement bits band into quarters; only same-band
# tickers pair, and degenerate buckets (boilerplate movement
# patterns shared by > CORR_MAX_BUCKET tickers) are refused, the
# same rationale as the text SHINGLE_DF_CAP: they carry no
# discriminative signal and would go quadratic.
CORR_EPOCH = "1992-01-01"
CORR_BAND_WEEKS = 13
CORR_MAX_BUCKET = 50
SKETCH_UNIVERSE_MAX = "T02000"


def _movement_bits(px: DataFrame) -> DataFrame:
    """Per (ticker, week): majority direction bit. sign is 1 when
    the price rose vs the previous trading day (per-ticker lag),
    week = floor(days-since-epoch / 7) — pure integer arithmetic,
    identical on any engine (never %W/%U week numbering, which
    differs across engines and locales)."""
    w = Window.partitionBy("ticker").orderBy("date")
    mv = px.select(
        "ticker",
        "date",
        (F.col("p") > F.lag("p").over(w)).cast("int").alias("up"),
    ).filter(F.col("up").isNotNull())
    week = F.floor(
        F.datediff(F.col("date"), F.lit(CORR_EPOCH)) / 7
    ).cast("long")
    return (
        mv.groupBy("ticker", week.alias("week"))
        .agg(
            F.sum("up").alias("ups"), F.count("*").alias("days")
        )
        .select(
            "ticker",
            "week",
            (F.col("ups") * 2 > F.col("days")).cast("int").alias("bit"),
        )
    )


def corr_pairs_sketched(
    stocks_df: DataFrame,
    universe_max: str = SKETCH_UNIVERSE_MAX,
    min_overlap: int = CORR_MIN_OVERLAP,
    k: int = CORR_TOPK,
    max_bucket: int = CORR_MAX_BUCKET,
) -> DataFrame:
    """Approximate top-k correlated pairs for universes too large to
    all-pairs: tickers whose weekly majority-direction bits agree on
    a full quarter band become candidates (banded signature join —
    the same bucket→equi-join→verify dataflow as text LSH); exact
    DECIMAL co-moment scoring then runs on CANDIDATES ONLY. Buckets
    larger than `max_bucket` are refused (a movement pattern shared
    that widely is market-wide beta, not pair affinity — the
    SHINGLE_DF_CAP rationale). Same output shape as corr_pairs, so
    an ann_recall-style audit is a direct join of the two."""
    px = (
        stocks_df.filter(F.col("ticker") < universe_max)
        .select(
            "ticker",
            F.to_date("date").alias("date"),
            F.col("share_price").cast("decimal(18,2)").alias("p"),
        )
    )
    bits = _movement_bits(px)
    band = F.floor(F.col("week") / CORR_BAND_WEEKS).cast("long")
    sigs = (
        bits.groupBy("ticker", band.alias("band"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("week", "bit"))
                    ),
                    lambda s: s["bit"].cast("string"),
                ),
                "",
            ).alias("sig")
        )
    )
    # refuse boilerplate buckets BEFORE pairing
    sized = sigs.withColumn(
        "n_in_bucket",
        F.count("*").over(Window.partitionBy("band", "sig")),
    ).filter(F.col("n_in_bucket") <= max_bucket)
    a, b = sized.alias("a"), sized.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.ticker") < F.col("b.ticker")),
        )
        .select(
            F.col("a.ticker").alias("ticker_a"),
            F.col("b.ticker").alias("ticker_b"),
        )
        .distinct()
    )
    joined = (
        cands.join(
            px.select(
                F.col("ticker").alias("ticker_a"),
                "date",
                F.col("p").alias("x"),
            ),
            "ticker_a",
        )
        .join(
            px.select(
                F.col("ticker").alias("ticker_b"),
                "date",
                F.col("p").alias("y"),
            ),
            ["ticker_b", "date"],
        )
    )
    pairs = joined.select("ticker_a", "ticker_b", "x", "y")
    return _score_and_rank(pairs, min_overlap, k)


def corr_recall(
    stocks_df: DataFrame,
    universe_max: str = CORR_UNIVERSE_MAX,
    min_overlap: int = CORR_MIN_OVERLAP,
    k: int = CORR_TOPK,
) -> DataFrame:
    """Recall audit of the sketch tier against the exact tier on the
    SAME universe (the ann_recall pattern applied to series): of the
    exact top-k pairs, how many did the sketch's candidate+score
    path recover? One row: (k, n_exact, n_hits, recall_ppm). Both
    tiers rank through the shared _score_and_rank, so the hit join
    compares identical scoring semantics by construction."""
    exact = corr_pairs(
        stocks_df, universe_max=universe_max,
        min_overlap=min_overlap, k=k,
    ).select("ticker_a", "ticker_b")
    approx = corr_pairs_sketched(
        stocks_df, universe_max=universe_max,
        min_overlap=min_overlap, k=k,
    ).select("ticker_a", "ticker_b", F.lit(1).alias("hit"))
    hits = exact.join(approx, ["ticker_a", "ticker_b"], "left")
    return hits.agg(
        F.lit(k).cast("int").alias("k"),
        F.count("*").cast("long").alias("n_exact"),
        # outer coalesce: sum over an EMPTY exact set is NULL, the
        # audit's hit count is 0
        F.coalesce(F.sum(F.coalesce(F.col("hit"), F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_hits"),
    ).select(
        "k",
        "n_exact",
        "n_hits",
        # recall of an empty exact set is UNDEFINED, not 0 or NaN:
        # emit NULL (both engines) instead of dividing 0/0
        F.when(
            F.col("n_exact") > 0,
            F.floor(
                F.col("n_hits") * F.lit(1_000_000) / F.col("n_exact")
            ),
        )
        .cast("long")
        .alias("recall_ppm"),
    )


def trend_slope(
    stocks_df: DataFrame,
    ticker_col: str = "ticker",
    date_col: str = "date",
    price_col: str = "share_price",
) -> DataFrame:
    """Per-group OLS trend slope, closed-form — the SCALE path for
    the grouped-map ``w_ticker_trend_slope`` showcase (registry
    §2.10): identical semantics, pure DataFrame ops, whole-stage
    codegen end to end, no Python in the plan.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) where x is the 0-based
    day index within the group (a per-ticker ``row_number`` window —
    the only sort, bounded by each ticker's history length) and y is
    the 2-dp price as integer cents. The four moments are INTEGER
    sums (order-free exact; all ≤ 2^45 here, so their doubles are
    exact), and the final slope is ONE fixed-tree double expression
    with the same operation order as the pandas twin and the SQL
    oracle — IEEE ops on identical inputs give identical bits, which
    ``test_operators_golden.py`` asserts against the applyInPandas
    version.

    Scale: one hash shuffle on ticker (the window), partial-agg'd
    integer sums, map-side scalar math. The grouped-map twin moves
    every group through Arrow into Python; this plan never leaves
    the JVM — prefer it anywhere the per-group logic fits closed
    form.
    """
    w = Window.partitionBy(ticker_col).orderBy(date_col)
    seq = stocks_df.select(
        ticker_col,
        (F.row_number().over(w) - 1).cast("long").alias("_x"),
        F.floor(F.col(price_col) * 100 + F.lit(0.5))
        .cast("long")
        .alias("_cents"),
    )
    m = seq.groupBy(ticker_col).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
        F.sum("_cents").cast("double").alias("_sc"),
        F.sum(F.col("_x") * F.col("_cents"))
        .cast("double")
        .alias("_sxc"),
    )
    n = F.col("n_days").cast("double")
    num = n * F.col("_sxc") - F.col("_sx") * F.col("_sc")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return m.filter(F.col("n_days") > 1).select(
        ticker_col,
        "n_days",
        (F.floor(num * F.lit(100.0) / den + F.lit(0.5)) / F.lit(10000.0)).alias(
            "trend_slope"
        ),
    )
