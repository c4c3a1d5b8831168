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
CORR_MIN_OVERLAP = 8  # min shared trading days per pair
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
    sxyd = F.col("sxy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    vx = nd * sxxd - sxd * sxd
    vy = nd * syyd - syd * syd
    num = nd * sxyd - sxd * syd
    scored = (
        g.filter(F.col("n") >= min_overlap)
        .withColumn("vx", vx)
        .withColumn("vy", vy)
        .filter((F.col("vx") > 0) & (F.col("vy") > 0))
        .select(
            "ticker_a",
            "ticker_b",
            F.col("n").alias("n_days"),
            rnd(
                num / F.sqrt(F.col("vx") * F.col("vy")), 6
            ).alias("corr"),
        )
    )
    w = Window.orderBy(
        F.desc("corr"), F.asc("ticker_a"), F.asc("ticker_b")
    )
    # rank over a LIMIT-bounded set would be ideal, but the rank IS
    # the output here; the window input is already reduced to the
    # |universe|²/2 scored pairs — bounded by the universe contract,
    # not by data volume
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("ticker_a", "ticker_b", "n_days", "corr", F.col("rank").cast("int").alias("rank"))
    )
