"""Query registry: every SURVEY §2 operator as a named (Spark query,
DuckDB oracle SQL) pair, feeding ``__spark_entry__.py``.

Contract (driver): each Spark callable takes (spark, sf_dir) and
returns a DataFrame; the oracle is ANSI SQL DuckDB runs over the same
parquet files (views pre-registered). Row-count + schema +
order-insensitive value hash must match, so:

- every computed column is aliased identically on both sides
- aggregates over doubles use exact arithmetic (see tables.py)
- dates are emitted as ISO strings
- genuinely order-dependent float sums are rounded identically on
  both sides (noted per query)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import tables
from .numerics import rnd
from .tables import INDEX_K, oracle_cte


def _thousands_2dp(col):
    """'{:,}.cc' formatting from deterministic integer cents (the
    reference's f'{v:,.2f}', dashboard.py:243-245, re-done in
    cross-engine-exact arithmetic)."""
    cents = F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")
    return F.concat(
        F.format_number((cents / F.lit(100)).cast("long"), 0),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    survey: str  # SURVEY §2 ids this query covers


QUERIES: dict[str, QueryDef] = {}


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any caller-provided SparkSession safe for these queries.

    The driver constructs its own session, so the two configs the
    engine depends on are (idempotently) applied at query time:
    UTC timestamps (oracle comparability, and what makes the
    timestamp_ntz->timestamp cast in tables.normalize_events_ts a
    pure re-tag) and nanos-as-long parquet reads (honored by older
    Sparks for the events table's TIMESTAMP(NANOS); Spark 4.1+
    ignores it and reads timestamp_ntz — normalize_events_ts
    accepts both). Both are runtime-settable SQL confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def register(name: str, oracle: str | None, survey: str):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = QueryDef(wrapped, oracle, survey)
        return fn

    return deco


# ----------------------------------------------------------------------
# Flagship: the equal-weighted top-K index over every date
# (entry point 2 generalized; W9 + A1 + A2 + P7).
# ----------------------------------------------------------------------


@register(
    "index_daily",
    oracle_cte(index=True)
    + "SELECT date, index_value, composition FROM index_data",
    survey="W9,A1,A2,P7,S5",
)
def q_index_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.index_data(spark, sf_dir)


# ----------------------------------------------------------------------
# Projections / filters (P1-P7) and simple scans (S8-S9)
# ----------------------------------------------------------------------


@register(
    "p2_filter_date",
    oracle_cte()
    + """
    SELECT ticker, share_price, market_cap
    FROM stocks WHERE date = '1997-03-17'
    """,
    survey="P1,P2,P5",
)
def q_filter_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tables.stocks(spark, sf_dir)
        .filter(F.col("date") == "1997-03-17")
        .select("ticker", "share_price", "market_cap")
    )


@register(
    "p4_ticker_history",
    oracle_cte()
    + """
    SELECT date, share_price, market_cap
    FROM stocks WHERE ticker = 'T00042'
    """,
    survey="P4,S9,O1",
)
def q_ticker_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tables.stocks(spark, sf_dir)
        .filter(F.col("ticker") == "T00042")
        .orderBy("date")
        .select("date", "share_price", "market_cap")
    )


@register(
    "p6_split_repair",
    oracle_cte(raw_history=True)
    + """
    SELECT ticker, date, stock_splits,
           CASE WHEN stock_splits = 0.0 THEN 1.0 ELSE stock_splits END
               AS split_factor
    FROM raw_history
    """,
    survey="P6",
)
def q_split_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = tables.raw_history(spark, sf_dir)
    return raw.select(
        "ticker",
        "date",
        "stock_splits",
        F.when(F.col("stock_splits") == 0.0, F.lit(1.0))
        .otherwise(F.col("stock_splits"))
        .alias("split_factor"),
    )


# ----------------------------------------------------------------------
# Windows (W1-W9)
# ----------------------------------------------------------------------


@register(
    "w1_split_adjust",
    oracle_cte(raw_history=True)
    + """
    SELECT ticker, date, close AS share_price,
           power(2.0, twos) * power(3.0, threes) AS cum_split_factor,
           shares_outstanding / (power(2.0, twos) * power(3.0, threes))
               AS effective_shares_outstanding,
           close * (shares_outstanding
                    / (power(2.0, twos) * power(3.0, threes)))
               AS market_cap
    FROM (
        SELECT *,
               count(CASE WHEN stock_splits = 2.0 THEN 1 END) OVER w AS twos,
               count(CASE WHEN stock_splits = 3.0 THEN 1 END) OVER w AS threes
        FROM raw_history
        WINDOW w AS (PARTITION BY ticker ORDER BY date DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    """,
    survey="W1,W2",
)
def q_split_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import split_adjust

    return split_adjust(tables.raw_history(spark, sf_dir))


@register(
    "w3_w4_returns",
    oracle_cte(index=True)
    + """
    SELECT date, index_value,
           (index_value - lag(index_value) OVER (ORDER BY date))
               / lag(index_value) OVER (ORDER BY date) * 100.0
               AS daily_return,
           (index_value - first_value(index_value) OVER w_cum)
               / first_value(index_value) OVER w_cum * 100.0
               AS cumulative_return
    FROM index_data
    WINDOW w_cum AS (ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey="W3,W4,S8",
)
def q_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import daily_and_cumulative_returns

    return daily_and_cumulative_returns(
        tables.index_data(spark, sf_dir)
    ).select("date", "index_value", "daily_return", "cumulative_return")


@register(
    "w5_w6_composition_changes",
    oracle_cte(index=True)
    + """
    SELECT date,
           CASE WHEN prev IS NULL THEN FALSE
                ELSE len(list_filter(cur, x -> NOT list_contains(prev, x)))
                   + len(list_filter(prev, x -> NOT list_contains(cur, x)))
                   > 0
           END AS composition_changed,
           CASE WHEN prev IS NULL
                     OR len(list_filter(cur, x -> NOT list_contains(prev, x)))
                      + len(list_filter(prev, x -> NOT list_contains(cur, x)))
                      = 0
                THEN '-'
                ELSE printf(
                    '+(%s) , -(%s)',
                    coalesce(array_to_string(
                        list_filter(cur, x -> NOT list_contains(prev, x)),
                        ', '), ''),
                    coalesce(array_to_string(
                        list_filter(prev, x -> NOT list_contains(cur, x)),
                        ', '), ''))
           END AS change_label
    FROM (
        SELECT date,
               string_split(composition, ',') AS cur,
               lag(string_split(composition, ',')) OVER (ORDER BY date)
                   AS prev
        FROM index_data
    )
    """,
    survey="W5,W6",
)
def q_composition_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import composition_changes

    return composition_changes(tables.index_data(spark, sf_dir)).select(
        "date", "composition_changed", "change_label"
    )


@register(
    "w7_latest_stats",
    oracle_cte(index=True)
    + """
    SELECT date AS latest_date,
           index_value AS current_value,
           index_value - prev AS daily_change,
           (index_value - prev) / prev * 100.0 AS daily_change_pct
    FROM (
        SELECT *,
               lead(index_value) OVER (ORDER BY date DESC) AS prev,
               row_number() OVER (ORDER BY date DESC) AS rn
        FROM index_data
    )
    WHERE rn = 1
    """,
    survey="W7,O2",
)
def q_latest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import latest_stats

    return latest_stats(tables.index_data(spark, sf_dir))


@register(
    "w8_latest_per_ticker",
    oracle_cte()
    + """
    SELECT ticker, date, share_price, market_cap
    FROM (
        SELECT *,
               row_number() OVER (PARTITION BY ticker ORDER BY date DESC)
                   AS rn
        FROM stocks
    )
    WHERE rn = 1
    """,
    survey="W8,O2",
)
def q_latest_per_ticker(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import latest_per_group

    return latest_per_group(tables.stocks(spark, sf_dir), "ticker").select(
        "ticker", "date", "share_price", "market_cap"
    )


@register(
    "w9_topk_per_date",
    oracle_cte()
    + f"""
    SELECT date, ticker, market_cap, rn AS cap_rank
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY date ORDER BY market_cap DESC, ticker
               ) AS rn
        FROM stocks
    )
    WHERE rn <= {INDEX_K}
    """,
    survey="W9,O3",
)
def q_topk_per_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import topk_per_group

    return topk_per_group(
        tables.stocks(spark, sf_dir),
        "date",
        [F.col("market_cap").desc(), F.col("ticker").asc()],
        INDEX_K,
    ).select("date", "ticker", "market_cap", F.col("rn").alias("cap_rank"))


# ----------------------------------------------------------------------
# Joins (J1-J3)
# ----------------------------------------------------------------------


@register(
    "j1_composition_market_cap",
    oracle_cte(index=True)
    + """
    , latest_comp AS (
        SELECT string_split(composition, ',') AS comp
        FROM index_data ORDER BY date DESC LIMIT 1
    ), exploded AS (
        SELECT unnest(comp) AS ticker,
               list_position(comp, unnest(comp)) - 1 AS pos
        FROM latest_comp
    ), latest_caps AS (
        SELECT ticker, market_cap
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY ticker ORDER BY date DESC) AS rn
            FROM stocks
        ) WHERE rn = 1
    )
    SELECT CASE WHEN e.pos < 5 THEN e.ticker ELSE 'OTHERS' END AS name,
           -- decimal sum -> order-free; see composition_market_caps
           floor(CAST(sum(CAST(c.market_cap AS DECIMAL(28,2)))
                      AS DOUBLE) / 1e9 * 10.0 + 0.5) / 10.0
               AS market_cap_billions
    FROM exploded e JOIN latest_caps c ON e.ticker = c.ticker
    GROUP BY 1
    """,
    survey="J1,A3,O6,W8",
)
def q_composition_market_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import composition_market_caps

    return composition_market_caps(
        tables.index_data(spark, sf_dir), tables.stocks(spark, sf_dir)
    )


@register(
    "j2_upsert",
    oracle_cte()
    + """
    , existing AS (
        SELECT * FROM stocks
        WHERE date >= '1998-01-01' AND date <= '1998-03-31'
    ), new_rows AS (
        SELECT ticker, date,
               share_price + 1.0 AS share_price,
               effective_shares_outstanding,
               (share_price + 1.0) * effective_shares_outstanding
                   AS market_cap
        FROM stocks
        WHERE date >= '1998-01-01' AND date <= '1998-01-31'
    )
    SELECT ticker, date, share_price, effective_shares_outstanding,
           market_cap
    FROM new_rows
    UNION ALL
    SELECT e.ticker, e.date, e.share_price,
           e.effective_shares_outstanding, e.market_cap
    FROM existing e
    WHERE NOT EXISTS (
        SELECT 1 FROM new_rows n
        WHERE n.ticker = e.ticker AND n.date = e.date
    )
    """,
    survey="J2,S6,S7",
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import upsert

    # fan=False: both branches are date-range slices whose work above
    # the derive is one anti-join — too light to pay the widening
    # shuffle (r13 bench: 1.19x with it, parity without).
    s = tables.stocks(spark, sf_dir, fan=False)
    existing = s.filter(
        (F.col("date") >= "1998-01-01") & (F.col("date") <= "1998-03-31")
    )
    new = s.filter(
        (F.col("date") >= "1998-01-01") & (F.col("date") <= "1998-01-31")
    ).select(
        "ticker",
        "date",
        (F.col("share_price") + 1.0).alias("share_price"),
        "effective_shares_outstanding",
        (
            (F.col("share_price") + 1.0)
            * F.col("effective_shares_outstanding")
        ).alias("market_cap"),
    )
    return upsert(existing, new, ["ticker", "date"]).select(
        "ticker",
        "date",
        "share_price",
        "effective_shares_outstanding",
        "market_cap",
    )


@register(
    "j3_asof_walkback",
    oracle_cte(index=True)
    + """
    , spine AS (
        SELECT strftime(d::DATE, '%Y-%m-%d') AS date
        FROM generate_series(DATE '1999-01-01', DATE '2002-06-30',
                             INTERVAL 1 DAY) t(d)
    ), tagged AS (
        SELECT date, index_value AS _iv, composition AS _comp,
               0 AS _is_spine
        FROM index_data
        UNION ALL
        SELECT date, NULL, NULL, 1 FROM spine
    ), filled AS (
        SELECT date, _is_spine,
               last_value(_iv IGNORE NULLS) OVER w AS index_value,
               last_value(_comp IGNORE NULLS) OVER w AS composition,
               last_value(CASE WHEN _is_spine = 0 THEN date END
                          IGNORE NULLS) OVER w AS matched_date
        FROM tagged
        WINDOW w AS (ORDER BY date, _is_spine
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT date,
           CASE WHEN lag_days <= 5 THEN matched_date END AS matched_date,
           CASE WHEN lag_days <= 5 THEN index_value END AS index_value,
           CASE WHEN lag_days <= 5 THEN composition END AS composition
    FROM (
        SELECT *,
               date_diff('day', matched_date::DATE, date::DATE) AS lag_days
        FROM filled WHERE _is_spine = 1
    )
    """,
    survey="J3",
)
def q_asof_walkback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import asof_walkback

    spine = spark.sql(
        """
        SELECT date_format(d, 'yyyy-MM-dd') AS date
        FROM (SELECT explode(sequence(DATE'1999-01-01', DATE'2002-06-30',
                                      INTERVAL 1 DAY)) AS d)
        """
    )
    return asof_walkback(spine, tables.index_data(spark, sf_dir))


# ----------------------------------------------------------------------
# Aggregations / summary (A4, A5) and tail-30 (O4, O5)
# ----------------------------------------------------------------------


@register(
    "a4_a5_summary_metrics",
    oracle_cte(index=True)
    + """
    , enriched AS (
        SELECT date,
               CASE WHEN prev IS NULL THEN FALSE
                    ELSE len(list_filter(cur, x -> NOT list_contains(prev, x)))
                       + len(list_filter(prev, x -> NOT list_contains(cur, x)))
                       > 0
               END AS composition_changed
        FROM (
            SELECT date, string_split(composition, ',') AS cur,
                   lag(string_split(composition, ',')) OVER (ORDER BY date)
                       AS prev
            FROM index_data
        )
    ), latest AS (
        SELECT CAST(len(string_split(composition, ',')) AS BIGINT)
                   AS constituent_count
        FROM index_data ORDER BY date DESC LIMIT 1
    )
    SELECT latest.constituent_count,
           (SELECT CAST(count(CASE WHEN composition_changed THEN 1 END)
                        AS BIGINT)
            FROM enriched) AS change_date_count
    FROM latest
    """,
    survey="A4,A5",
)
def q_summary_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import composition_changes

    enriched = composition_changes(tables.index_data(spark, sf_dir))
    latest = (
        enriched.orderBy(F.col("date").desc())
        .limit(1)
        .select(
            F.size(F.split("composition", ","))
            .cast("long")
            .alias("constituent_count")
        )
    )
    changes = enriched.agg(
        F.count(F.when(F.col("composition_changed"), 1))
        .cast("long")
        .alias("change_date_count")
    )
    return latest.crossJoin(changes)


@register(
    "o5_summary_tail30",
    oracle_cte(index=True)
    + """
    , enriched AS (
        SELECT date, index_value,
               (index_value - lag(index_value) OVER (ORDER BY date))
                   / lag(index_value) OVER (ORDER BY date) * 100.0
                   AS daily_return,
               (index_value - first_value(index_value) OVER w_cum)
                   / first_value(index_value) OVER w_cum * 100.0
                   AS cumulative_return,
               string_split(composition, ',') AS cur,
               lag(string_split(composition, ',')) OVER (ORDER BY date)
                   AS prev
        FROM index_data
        WINDOW w_cum AS (ORDER BY date
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT date, index_value, daily_return, cumulative_return,
           CASE WHEN prev IS NULL
                     OR len(list_filter(cur, x -> NOT list_contains(prev, x)))
                      + len(list_filter(prev, x -> NOT list_contains(cur, x)))
                      = 0
                THEN '-'
                ELSE printf(
                    '+(%s) , -(%s)',
                    coalesce(array_to_string(
                        list_filter(cur, x -> NOT list_contains(prev, x)),
                        ', '), ''),
                    coalesce(array_to_string(
                        list_filter(prev, x -> NOT list_contains(cur, x)),
                        ', '), ''))
           END AS change_label
    FROM enriched
    ORDER BY date DESC LIMIT 30
    """,
    survey="O4,O5,W6",
)
def q_summary_tail30(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.analytics import summary_tail

    return summary_tail(tables.index_data(spark, sf_dir), 30)


# ----------------------------------------------------------------------
# TPC-H-shaped headliners (bench anchors; exercise scan+agg and
# multi-join paths at scale)
# ----------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         * (1.0 + l_tax)
                         AS DECIMAL(28,10))) AS DOUBLE) AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A1-class scan+agg (bench anchor)",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    charge = disc_price * (1.0 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ----------------------------------------------------------------------
# Scalar function bundle (§2.8) and set ops (§2.7)
# ----------------------------------------------------------------------


@register(
    "scalar_bundle",
    oracle_cte(index=True)
    + """
    SELECT date,
           replace(composition, ',', '|') AS comp_pipes,
           string_split(composition, ',')[1] AS top_ticker,
           upper(string_split(composition, ',')[1]) AS top_ticker_upper,
           floor(index_value * 10.0 + 0.5) / 10.0 AS index_rounded,
           format('{:,}', CAST(floor(index_value * 100.0 + 0.5)
                               AS BIGINT) // 100)
               || '.'
               || lpad(CAST(CAST(floor(index_value * 100.0 + 0.5)
                                 AS BIGINT) % 100 AS VARCHAR), 2, '0')
               AS index_formatted,
           strftime(CAST(date AS DATE) - INTERVAL 1 DAY, '%Y-%m-%d')
               AS prev_day,
           CAST(day(CAST(date AS DATE)) AS INT) AS dom,
           concat('IDX-', date) AS idx_key
    FROM index_data
    """,
    survey="§2.8 scalar functions (split/join/replace/format/date/round)",
)
def q_scalar_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = tables.index_data(spark, sf_dir)
    comp = F.split(F.col("composition"), ",")
    return idx.select(
        "date",
        F.regexp_replace("composition", ",", "|").alias("comp_pipes"),
        F.element_at(comp, 1).alias("top_ticker"),
        F.upper(F.element_at(comp, 1)).alias("top_ticker_upper"),
        rnd(F.col("index_value"), 1).alias("index_rounded"),
        _thousands_2dp(F.col("index_value")).alias("index_formatted"),
        F.date_format(
            F.date_sub(F.to_date("date"), 1), "yyyy-MM-dd"
        ).alias("prev_day"),
        F.dayofmonth(F.to_date("date")).alias("dom"),
        F.concat(F.lit("IDX-"), F.col("date")).alias("idx_key"),
    )


@register(
    "set_ops",
    oracle_cte()
    + """
    , jan AS (SELECT DISTINCT ticker FROM stocks WHERE date LIKE '1996-01%'),
      feb AS (SELECT DISTINCT ticker FROM stocks WHERE date LIKE '1996-02%')
    SELECT ticker, 'both' AS tag FROM (SELECT * FROM jan INTERSECT SELECT * FROM feb)
    UNION ALL
    SELECT ticker, 'jan_only' AS tag FROM (SELECT * FROM jan EXCEPT SELECT * FROM feb)
    UNION ALL
    SELECT ticker, 'feb_only' AS tag FROM (SELECT * FROM feb EXCEPT SELECT * FROM jan)
    """,
    survey="§2.7 union/intersect/except",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = tables.stocks(spark, sf_dir)
    jan = s.filter(F.col("date").like("1996-01%")).select("ticker").distinct()
    feb = s.filter(F.col("date").like("1996-02%")).select("ticker").distinct()
    # subtract == EXCEPT on these already-distinct sets; each branch
    # evaluates one set op instead of re-deriving the intersect
    # subplan per side (3 evaluations before).
    return (
        jan.intersect(feb).select("ticker", F.lit("both").alias("tag"))
        .unionByName(
            jan.subtract(feb).select(
                "ticker", F.lit("jan_only").alias("tag")
            )
        )
        .unionByName(
            feb.subtract(jan).select(
                "ticker", F.lit("feb_only").alias("tag")
            )
        )
    )


@register(
    "skew_salted_join",
    """
    SELECT concat('S_', l_linestatus) AS status_label,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_linestatus
    """,
    survey="salted shuffle join on a skewed key (skew ops, extension)",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perf-regression guard for operators.skew.salted_join: join the
    fact table to a tiny dim on l_linestatus — a 3-value key, the
    worst shuffle-skew shape (each key is ~1/3 of 100 TB on one
    reducer). The shuffle_hash hint forces the join OFF the broadcast
    path so the salt actually spreads reducers, as it would when the
    dim exceeds the broadcast threshold at scale."""
    from .operators.skew import salted_join

    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_extendedprice"
    )
    dim = (
        li.select("l_linestatus")
        .distinct()
        .withColumn(
            "status_label", F.concat(F.lit("S_"), F.col("l_linestatus"))
        )
        .hint("shuffle_hash")
    )
    joined = salted_join(li, dim, "l_linestatus")
    return joined.groupBy("status_label").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "skew_salted_agg",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="two-phase salted aggregation on a skewed group key (skew ops, extension)",
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.skew.salted_agg_sum as a first-class query: sum over
    l_returnflag — a 3-value group key, the worst aggregation-skew
    shape (each group is ~1/3 of 100 TB on one reducer without the
    salt). The salt hashes the lineitem PK (l_orderkey,
    l_linenumber), so even mass-duplicated (flag, qty) pairs spread
    across reducers. Decimal-cast values keep the two-phase sum
    bit-identical to the oracle's single-phase sum (order-free)."""
    from .operators.skew import salted_agg_sum

    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty_dec"),
        "l_orderkey",
        "l_linenumber",
    )
    summed = salted_agg_sum(
        li,
        "l_returnflag",
        "qty_dec",
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    return summed.select(
        "l_returnflag",
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
    )


# ----------------------------------------------------------------------
# JSON extraction on events.props (engine extension, SURVEY §2.8 note)
# ----------------------------------------------------------------------


@register(
    "json_props",
    """
    SELECT event_type,
           -- json_valid guard: get_json_object is NULL on malformed
           -- JSON while DuckDB's json_extract_string THROWS — the
           -- oracle must mirror null-on-malformed (r7 fuzzer)
           CAST(sum(CAST(CASE WHEN json_valid(props)
                              THEN json_extract_string(props, '$.k')
                         END AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
    survey="JSON extraction (from_json/get_json_object)",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count("*").alias("n_events"),
    )


# ----------------------------------------------------------------------
# Event-time windows on events.ts (§2.9 extension). Batch semantics
# here (same operators Structured Streaming uses — see streaming/);
# each has an exact SQL oracle.
# ----------------------------------------------------------------------


@register(
    "events_tumbling_1h",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    survey="§2.9 tumbling event-time window",
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_1h_30m",
    """
    WITH shifted AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - INTERVAL 30 MINUTE AS ws, value
        FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
    FROM shifted
    GROUP BY 1
    """,
    survey="§2.9 sliding event-time window",
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_session_10m",
    """
    WITH flagged AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts)
                         >= 600000000
                         OR lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts_us,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(min(ts_us) AS BIGINT) AS session_start_us,
           CAST(max(ts_us) + 600000000 AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    survey="§2.9 session window (gap-merge sessionization)",
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
    )


# Training-data-pipeline operators register themselves on import.
from . import registry_datapipe  # noqa: E402, F401


# ----------------------------------------------------------------------
# OLAP surface beyond the reference: distinct/percentile aggregates,
# cube/rollup, semi/anti joins, pivot, frame windows, range join.
# These make the engine a complete destination for the reference's
# users (SURVEY §2.11 lists them as absent in the reference).
# ----------------------------------------------------------------------


@register(
    "agg_distinct_percentile",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="distinct aggregation + exact percentile (engine extension)",
)
def q_agg_distinct_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two countDistinct in one agg forces an EXPAND (row-tripling)
    # before the shuffle; computing each distinct as its own
    # dedup+count and joining on the (tiny) group key is ~5x faster
    # at sf0.1 and byte-identical.
    li = tables.load(spark, sf_dir, "lineitem")
    n_o = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_orders"))
    )
    n_p = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_parts"))
    )
    # Exact median WITHOUT percentile()'s per-group value buffer
    # (that buffer is an OOM at 100 TB) and WITHOUT a row-level sort:
    # collapse the fact rows to a per-(group, value) histogram first —
    # a parallel, map-side-combining hash aggregate — then walk the
    # far smaller cumulative histogram. A value covers the row-rank
    # range (cum - c, cum]; the interpolation inputs are the values
    # covering positions floor/ceil((n-1)/2)+1, and lo + (hi-lo)*frac
    # reproduces quantile_cont(0.5) bit-for-bit. The window sort now
    # touches distinct values per group, not rows (worst case equal,
    # typically orders of magnitude smaller), and stays spillable.
    # min/max ride the same group-count pass — one lineitem scan
    # serves sizing AND the price extremes.
    # NULL quantities must enter neither _n nor the histogram:
    # quantile_cont ignores NULLs, and NULLs sort first in the
    # ascending cumsum window, which would shift every rank (the
    # r7 differential fuzzer caught exactly this on NULL-laced
    # lineitem — the cents_quantile_bounds ADVICE class).
    cnt = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("_n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    hist = (
        li.filter(F.col("l_quantity").isNotNull())
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count("*").alias("_c"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w_cum)).join(
        F.broadcast(cnt.select("l_returnflag", "_n")), "l_returnflag"
    )
    pos = (F.col("_n") - 1) / F.lit(2.0)  # 0-based, frac in {0, .5}
    pos_lo = F.floor(pos) + 1
    pos_hi = F.ceil(pos) + 1
    lo_cover = (F.col("_cum") - F.col("_c") < pos_lo) & (
        pos_lo <= F.col("_cum")
    )
    hi_cover = (F.col("_cum") - F.col("_c") < pos_hi) & (
        pos_hi <= F.col("_cum")
    )
    med = (
        cum.filter(lo_cover | hi_cover)
        .groupBy("l_returnflag")
        .agg(
            F.min(F.when(lo_cover, F.col("l_quantity"))).alias("_lo"),
            F.min(F.when(hi_cover, F.col("l_quantity"))).alias("_hi"),
            F.first("_n").alias("_n"),
        )
    )
    med_frac = (F.col("_n") - 1) / F.lit(2.0) - F.floor(
        (F.col("_n") - 1) / F.lit(2.0)
    )
    med = med.select(
        "l_returnflag",
        (F.col("_lo") + (F.col("_hi") - F.col("_lo")) * med_frac).alias(
            "median_qty"
        ),
    )
    return (
        cnt.select("l_returnflag", "min_price", "max_price")
        .join(med, "l_returnflag")
        .join(n_o, "l_returnflag")
        .join(n_p, "l_returnflag")
        .select(
            "l_returnflag",
            "n_orders",
            "n_parts",
            "median_qty",
            "min_price",
            "max_price",
        )
    )


@register(
    "cube_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    -- engine contract: grouping-set aggregates over an EMPTY input
    -- emit no rows (Spark cube semantics); ANSI would emit the
    -- grand-total () row, which this HAVING removes on empty input
    -- and is a no-op otherwise (every real group has count >= 1)
    HAVING count(*) > 0
    """,
    survey="grouping sets / cube (engine extension)",
)
def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    -- empty-input contract: see cube_revenue
    HAVING count(*) > 0
    """,
    survey="rollup (engine extension)",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


@register(
    "semi_anti_join",
    """
    SELECT c_custkey, 'has_urgent_order' AS tag FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, 'no_urgent_order' AS tag FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    """,
    survey="left-semi / left-anti joins (engine extension)",
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cond = c["c_custkey"] == o["o_custkey"]
    semi = c.join(o, cond, "left_semi").select(
        "c_custkey", F.lit("has_urgent_order").alias("tag")
    )
    anti = c.join(o, cond, "left_anti").select(
        "c_custkey", F.lit("no_urgent_order").alias("tag")
    )
    return semi.unionByName(anti)


@register(
    "pivot_order_status",
    """
    SELECT o_orderpriority,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                AS BIGINT) AS "O",
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                AS BIGINT) AS "F",
           CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END)
                AS BIGINT) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey="pivot (engine extension)",
)
def q_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


@register(
    "w_moving_stats",
    oracle_cte(index=True)
    + """
    SELECT date, index_value,
           CAST(sum(iv_cents) OVER w AS DOUBLE)
               / (100.0 * count(*) OVER w) AS mov_avg_7,
           min(index_value) OVER w AS mov_min_7,
           max(index_value) OVER w AS mov_max_7
    FROM (
        SELECT date, index_value,
               CAST(floor(index_value * 100.0 + 0.5) AS BIGINT)
                   AS iv_cents
        FROM index_data
    )
    WINDOW w AS (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    survey="frame-bounded moving window (engine extension)",
)
def q_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    idx = tables.index_data(spark, sf_dir)
    # exact integer cents -> the moving sum is order-independent
    cents = F.floor(F.col("index_value") * 100.0 + 0.5).cast("long")
    # INTENTIONAL global window (WindowExec "No Partition Defined"
    # is expected): index_data is ONE row per calendar date — its
    # cardinality grows with time, not data volume, so a single
    # partition stays bounded at any sf. Do not "fix" by adding a
    # partition key; that would change the moving-frame semantics.
    w = Window.orderBy("date").rowsBetween(-6, Window.currentRow)
    return idx.select(
        "date",
        "index_value",
        (
            F.sum(cents).over(w).cast("double")
            / (100.0 * F.count("*").over(w))
        ).alias("mov_avg_7"),
        F.min("index_value").over(w).alias("mov_min_7"),
        F.max("index_value").over(w).alias("mov_max_7"),
    )


@register(
    "events_range_join",
    """
    WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events)
    SELECT a.event_id,
           CAST(count(b.event_id) AS BIGINT) AS n_clicks_5m_before
    FROM (SELECT * FROM e WHERE event_type = 'error') a
    LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') b
      ON b.us >= a.us - 300000000 AND b.us < a.us
    GROUP BY a.event_id
    """,
    survey="range/interval join via bucketed equi-join (engine extension)",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range COUNT decomposed into pre-aggregated second cells plus
    exact boundary seconds — never a raw error x click pairing.

    The round-6 shape (5-min-bucket equi-join against RAW clicks)
    was still Σ per-bucket |errors|x|clicks|: linear on uniform
    traffic but density-squared in a burst — the round-7 sf1
    spot-run's incident minute measured 19.9x wall for 10x data.
    Counting needs no pairing: clicks pre-aggregate to 1-second
    cells (one linear pass), each error sums the cells FULLY inside
    (a-5m, a) via the same 2-bucket equi-join (<= 600 cell rows per
    error at ANY click density), and the <= 2 boundary seconds —
    the only cells a micros-precision window can cut — join raw
    clicks by second equality (per-error work = clicks in 2
    seconds). Both contribution streams union into one count
    aggregate; the cell join stays LEFT so an error with no nearby
    clicks keeps its zero row. Same answer, but the burst regime
    degrades to per-second aggregation instead of pair explosion."""
    ev = tables.load_events(spark, sf_dir).select(
        "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    gap = 300_000_000  # 5 minutes in micros
    sec_us = 1_000_000
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("event_id"), F.col("us").alias("a_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("us").alias("b_us"),
        (F.col("us") / sec_us).cast("long").alias("sec"),
    )
    cells = clicks.groupBy("sec").agg(F.count("*").alias("cnt"))
    # a second cell [sec, sec+1) is fully inside (a-gap, a) iff
    cell_full = (
        F.col("sec") * sec_us >= F.col("a_us") - gap
    ) & ((F.col("sec") + 1) * sec_us <= F.col("a_us"))
    # full cells: equi-join on the 5-min bucket (a fully-inside cell
    # lives in the error's bucket or the one before)
    errors_b = errors.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("a_us") / gap).cast("long"),
                (F.col("a_us") / gap).cast("long") - 1,
            )
        ),
    )
    cells_b = cells.withColumn(
        "bucket", (F.col("sec") * sec_us / gap).cast("long")
    )
    contrib_full = (
        errors_b.join(cells_b, "bucket", "left")
        .select(
            "event_id",
            F.when(cell_full, F.col("cnt")).alias("c"),
        )
    )
    # boundary seconds: the window endpoints' cells, counted exactly
    # against raw clicks (excluding fully-inside cells so an aligned
    # endpoint can't double-count)
    in_range = (F.col("b_us") >= F.col("a_us") - gap) & (
        F.col("b_us") < F.col("a_us")
    )
    errors_s = errors.withColumn(
        "sec",
        F.explode(
            F.array(
                ((F.col("a_us") - gap) / sec_us).cast("long"),
                (F.col("a_us") / sec_us).cast("long"),
            )
        ),
    )
    contrib_bnd = (
        errors_s.join(clicks, "sec")
        .filter(in_range & ~cell_full)
        .select("event_id", F.lit(1).alias("c"))
    )
    return (
        contrib_full.unionByName(contrib_bnd)
        .groupBy("event_id")
        .agg(
            F.coalesce(F.sum("c"), F.lit(0))
            .cast("long")
            .alias("n_clicks_5m_before")
        )
    )


@register(
    "events_funnel_conversion",
    """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (
        SELECT user_id, min(us) AS t1 FROM e
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
        WHERE event_type = 'view' AND us > t1 GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
        WHERE event_type = 'click' AND us > t2 GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, min(us) AS t4 FROM e JOIN s3 USING (user_id)
        WHERE event_type = 'purchase' AND us > t3 GROUP BY e.user_id
    )
    SELECT s1.user_id,
           CAST(1 + CAST(t2 IS NOT NULL AS INT)
                  + CAST(t3 IS NOT NULL AS INT)
                  + CAST(t4 IS NOT NULL AS INT) AS INT) AS furthest_step
    FROM s1
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    LEFT JOIN s4 USING (user_id)
    """,
    survey="ordered funnel conversion: signup->view->click->purchase per user (event-sequence extension)",
)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: step k counts only if it happens STRICTLY
    AFTER the earliest achievable step k-1 (the greedy earliest-step
    chain, which maximizes conversion — the standard funnel
    semantics). Expressed as chained conditional min-aggregations:
    every shuffle is keyed by user_id, so the four stages
    co-partition and AQE reuses the exchange; no per-user event
    array is ever materialized (a power user costs rows, not
    memory), unlike the collect_list formulation."""
    ev = tables.load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )

    def step(prev: DataFrame, etype: str, tprev: str, tcol: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("us") > F.col(tprev))
            .groupBy("user_id")
            .agg(F.min("us").alias(tcol))
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = step(s1.select("user_id", "t1"), "view", "t1", "t2")
    s3 = step(s2, "click", "t2", "t3")
    s4 = step(s3, "purchase", "t3", "t4")
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .join(s4, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
                + F.col("t4").isNotNull().cast("int")
            ).alias("furthest_step"),
        )
    )


@register(
    "events_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    survey="event-type transition matrix via per-user lag window (event-sequence extension)",
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: counts of consecutive event-type
    transitions per user (event_id tiebreak pins ties for exact
    cross-engine parity). One window shuffle keyed by user_id, then
    a partial-aggregated count keyed by the 25-cell transition
    space — hot cells collapse map-side."""
    ev = tables.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "events_retention_cohorts",
    """
    WITH cohort AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(datediff('day', cohort_day, d) AS INT) AS age_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM active JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
    survey="cohort retention matrix: users active N days after their first-seen day (event-sequence extension)",
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: cohort = a user's first active
    calendar day; cell (cohort_day, age_days) counts users from
    that cohort active exactly age_days later. Three shuffles
    total, none of the raw fact: distinct active (user, day) pairs
    (partial-aggregated — a power user's million events collapse
    map-side to <=days rows), a user_id-partitioned window MIN for
    the cohort day (no separate cohort aggregate + join back), and
    the final rollup whose key space is bounded by days², not data
    volume. count(*) is exact because (user_id, d) is distinct."""
    active = (
        tables.load_events(spark, sf_dir)
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id")
    return (
        active.withColumn("cohort_day", F.min("d").over(w))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_day").cast("int").alias("age_days"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "events_anomaly_days",
    """
    WITH daily AS (
        SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(n_events) AS HUGEINT) AS s,
               sum(CAST(n_events AS HUGEINT)
                   * CAST(n_events AS HUGEINT)) AS q
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n_events,
           CAST(CASE WHEN
               (CAST(d.n_events AS HUGEINT) * n - s)
               * (CAST(d.n_events AS HUGEINT) * n - s)
               > 4 * (n * q - s * s)
           THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM daily d JOIN stats USING (event_type)
    """,
    survey="integer-exact daily-volume anomaly flags per event type (|z| > 2 without computing z) (event-sequence extension)",
)
def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count anomaly detection with NO floating point in the
    decision: |count - mean| > 2*stddev is algebraically
    (n*c - S)^2 > 4 * (n*Q - S^2), all integers (S = sum of daily
    counts, Q = sum of squares, n = days) — so Spark and any SQL
    engine flag the identical set of days with no epsilon. The
    squares can exceed int64 at real scale, so the comparison runs
    in DECIMAL(38,0) (HUGEINT on the DuckDB side; both exact).
    Shape: one (type, day)-keyed partial aggregation, a per-type
    stats rollup of DAYS (bounded by the calendar, broadcast back),
    and a map-only flag."""
    ev = tables.load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").cast("long").alias("n_events"))
    return anomaly_flags(daily)


def anomaly_flags(daily: DataFrame) -> DataFrame:
    """(event_type, day, n_events) -> the same rows + is_anomaly.
    All arithmetic in DECIMAL(38,0) (HUGEINT on the oracle side):
    a daily count near ~3e9 would overflow the square in int64
    BEFORE any downstream cast could save it, so the squares are
    accumulated wide from the start. Exposed separately from the
    registry query so the >int64 regime is unit-testable."""
    dec = "decimal(38,0)"
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("n_events").cast(dec).alias("s"),
        F.sum(F.col("n_events").cast(dec) * F.col("n_events").cast(dec))
        .cast(dec)
        .alias("q"),
    )
    dev = F.col("n_events").cast(dec) * F.col("n") - F.col("s")
    rhs = F.lit(4).cast(dec) * (
        F.col("n") * F.col("q") - F.col("s") * F.col("s")
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            F.when(dev * dev > rhs, 1).otherwise(0).cast("int").alias(
                "is_anomaly"
            ),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           o_orderpriority,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    survey="multi-join + agg + deterministic top-n (bench anchor)",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-06-01"
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-06-01"
    )
    joined = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
    )
    return (
        joined.groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
                    "decimal(28,10)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "p3_point_lookup",
    oracle_cte(index=True)
    + """
    SELECT date, index_value, composition
    FROM index_data WHERE date = '1997-03-17'
    """,
    survey="P3 (PK point lookup, 0-or-1 row)",
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tables.index_data(spark, sf_dir)
        .filter(F.col("date") == "1997-03-17")
        .limit(1)
    )


@register(
    "having_big_orders",
    """
    SELECT l_orderkey,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150
    """,
    survey="groupBy + HAVING post-aggregation filter (engine extension)",
)
def q_having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count("*").alias("n_lines"),
        )
        .filter(F.col("total_qty") > 150)
    )


@register(
    "unpivot_prices",
    """
    SELECT p_partkey, 'retail' AS price_kind, p_retailprice AS price
    FROM part
    UNION ALL
    SELECT p_partkey, 'size_x100' AS price_kind,
           CAST(p_size AS DOUBLE) * 100.0 AS price
    FROM part
    """,
    survey="unpivot / melt wide-to-long (engine extension)",
)
def q_unpivot_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables.load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retail"),
        (F.col("p_size").cast("double") * 100.0).alias("size_x100"),
    )
    return p.unpivot(
        "p_partkey", ["retail", "size_x100"], "price_kind", "price"
    )


@register(
    "agg_approx_sketches",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
           TRUE AS orders_ok,
           TRUE AS parts_ok,
           TRUE AS median_ok
    FROM lineitem GROUP BY 1
    """,
    survey="approximate aggregates (HLL distinct, approx quantiles), tolerance-checked vs exact",
)
def q_agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) and percentile_approx
    (KLL-style) — the sketches a 100 TB profile pass uses instead of
    exact distinct/sort. Sketch values are engine-specific, so the
    oracle contract is the TOLERANCE, not the estimate (the
    events_hll_cascade pattern): exact counts (computed
    independently, hash-matched) plus bounded-error flags —
    HLL++ default rsd is 5%, so 15% (3 sigma) is a stable
    deterministic bound; the approx median must land between the
    exact 45th and 55th percentile_disc values (rank tolerance >>
    the sketch's 1/accuracy=0.01% rank error — percentile_approx
    returns an actual data value, so disc bounds are the natural
    band). The oracle asserts every flag.

    Scale: the exact p45/p55 rank bounds come from
    ``cents_quantile_bounds`` (bounded cents-domain histogram +
    cumsum), NOT a buffering ``percentile()`` aggregate — the old
    plan's SortAggregate buffered every price per group, which dies
    at 100 TB; the histogram's size is the cents domain, independent
    of row count. ``test_plan_lint.py`` forbids ``percentile(`` in
    this plan."""
    from .operators.aggregates import cents_quantile_bounds

    li = tables.load(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias(
            "approx_median_price"
        ),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
        "long"
    )
    bounds = cents_quantile_bounds(
        li.select("l_returnflag", cents.alias("_c")),
        "_c",
        {"_p45c": (9, 20), "_p55c": (11, 20)},
        group_cols=["l_returnflag"],
    )

    def _ok(est: str, ex: str) -> F.Column:
        return (
            F.abs(F.col(est) - F.col(ex)) / F.col(ex) <= 0.15
        ).alias(est.replace("approx_", "") + "_ok")

    return (
        approx.join(exact, "l_returnflag")
        .join(F.broadcast(bounds), "l_returnflag")
        .select(
            "l_returnflag",
            "n_orders_exact",
            "n_parts_exact",
            _ok("approx_orders", "n_orders_exact"),
            _ok("approx_parts", "n_parts_exact"),
            (
                (
                    F.col("approx_median_price")
                    >= F.col("_p45c").cast("double") / 100.0
                )
                & (
                    F.col("approx_median_price")
                    <= F.col("_p55c").cast("double") / 100.0
                )
            ).alias("median_ok"),
        )
    )


@register(
    "w_ticker_trend_slope",
    oracle_cte()
    + """
    , seq AS (
        SELECT ticker,
               CAST(row_number() OVER (
                   PARTITION BY ticker ORDER BY date) - 1 AS BIGINT)
                   AS x,
               CAST(floor(share_price * 100 + 0.5) AS BIGINT) AS cents
        FROM stocks
    ), m AS (
        -- the four moments are INTEGER sums (exact, order-free);
        -- the old float sum((x-xbar)*(y-ybar)) flipped the 4dp
        -- round-half boundary on 4 of ~15k groups at sf0.1
        SELECT ticker,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(cents) AS DOUBLE) AS sc,
               CAST(sum(x * cents) AS DOUBLE) AS sxc
        FROM seq GROUP BY ticker
    )
    SELECT ticker, n AS n_days,
           floor((CAST(n AS DOUBLE) * sxc - sx * sc) * 100.0
                 / (CAST(n AS DOUBLE) * sxx - sx * sx) + 0.5)
               / 10000.0 AS trend_slope
    FROM m WHERE n > 1
    """,
    survey="grouped-map applyInPandas custom operator (per-ticker OLS)",
)
def q_ticker_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ticker OLS trend slope via applyInPandas — the grouped-map
    pandas shape (each ticker's history as one pandas frame).

    Cross-engine exactness: slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)
    where x is the 0-based day index and y is the 2dp price. The
    four moments are computed as INTEGER sums over cents (exact and
    order-free; all ≤ 2^45 here, so their doubles are exact), and
    the final slope is ONE scalar double expression with the same
    operation order as the oracle — IEEE ops on identical inputs
    give identical bits on both engines. The previous formulation
    float-summed (x−x̄)(y−ȳ) in engine-specific order, which flipped
    the 4dp round-half boundary on 4 of ~15k groups at sf0.1 (found
    by the full-registry sf0.1 parity run)."""
    import numpy as np
    import pandas as pd

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("date")
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame(
                columns=["ticker", "n_days", "trend_slope"]
            )
        y = pdf["share_price"].to_numpy(dtype=np.float64)
        # ONE rounding rule in all three engines: half-up via
        # floor(x*100 + 0.5) — same as the closed-form Spark twin
        # (timeseries.py) and the DuckDB oracle. np.rint here was
        # half-to-even and would diverge on an exact half-cent.
        cents = np.floor(y * 100.0 + 0.5).astype(np.int64)
        xs = np.arange(n, dtype=np.int64)
        sx = float(n * (n - 1) // 2)
        sxx = float((n - 1) * n * (2 * n - 1) // 6)
        sc = float(int(cents.sum()))
        sxc = float(int((xs * cents).sum()))
        num = float(n) * sxc - sx * sc
        den = float(n) * sxx - sx * sx
        s = np.floor(num * 100.0 / den + 0.5) / 10000.0
        return pd.DataFrame(
            {
                "ticker": [pdf["ticker"].iloc[0]],
                "n_days": [n],
                "trend_slope": [s],
            }
        )

    # Explicit projection before the opaque grouped-map (guide §4.1):
    # Spark cannot see which columns `slope` touches, so without this
    # the whole stocks row (effective_shares_outstanding, market_cap)
    # crosses the ticker shuffle AND the Arrow boundary unused.
    stocks = tables.stocks(spark, sf_dir).select(
        "ticker", "date", "share_price"
    )
    # Pin the grouped-map exchange to cluster parallelism (r13,
    # guide §2.6/§4): AQE coalesces this shuffle by BYTES (the
    # ~15k-group frame is a few MB -> ~10 post-shuffle tasks) but
    # the stage cost is per-group Python CPU the planner cannot
    # see, leaving 2/3 of the cores idle. Same defaultParallelism
    # convention as tables.fan_out — scale-adaptive, not a local
    # constant — and the repartition IS the one exchange the
    # groupBy needs (hash(ticker) satisfies its clustering), so
    # the plan shape is unchanged. A/B at sf0.1: 8.1 -> 4.3 s.
    stocks = stocks.repartition(
        spark.sparkContext.defaultParallelism, "ticker"
    )
    return stocks.groupBy("ticker").applyInPandas(
        slope, "ticker string, n_days long, trend_slope double"
    )


@register(
    "w_trend_slope_closed",
    oracle_cte()
    + """
    , seq AS (
        SELECT ticker,
               CAST(row_number() OVER (
                   PARTITION BY ticker ORDER BY date) - 1 AS BIGINT)
                   AS x,
               CAST(floor(share_price * 100 + 0.5) AS BIGINT) AS cents
        FROM stocks
    ), m AS (
        SELECT ticker,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(cents) AS DOUBLE) AS sc,
               CAST(sum(x * cents) AS DOUBLE) AS sxc
        FROM seq GROUP BY ticker
    )
    SELECT ticker, n AS n_days,
           floor((CAST(n AS DOUBLE) * sxc - sx * sc) * 100.0
                 / (CAST(n AS DOUBLE) * sxx - sx * sx) + 0.5)
               / 10000.0 AS trend_slope
    FROM m WHERE n > 1
    """,
    survey="closed-form per-ticker OLS trend slope — the pure-DataFrame scale path for the §2.10 grouped-map showcase (same oracle, no Python in the plan)",
)
def q_trend_slope_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form twin of ``w_ticker_trend_slope``: identical
    semantics and bit-identical output (golden-tested) with no
    Python in the plan — the version a 100 TB run should use. See
    ``operators/timeseries.py:trend_slope`` for the numerics."""
    from .operators.timeseries import trend_slope

    return trend_slope(tables.stocks(spark, sf_dir))


@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    survey="6-way join, TPC-H Q5 shape (bench anchor)",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    joined = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy("n_name").agg(
        F.sum(
            (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
                "decimal(28,10)"
            )
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "json_props_struct",
    """
    WITH parsed AS (
        -- json_valid guard mirrors from_json's null-on-malformed
        -- (DuckDB json_extract_string throws instead — r7 fuzzer)
        SELECT event_id,
               CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k')
                    END AS BIGINT) AS k
        FROM events
    )
    SELECT event_id, k FROM parsed WHERE k >= 90
    """,
    survey="from_json structured parsing (engine extension)",
)
def q_json_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing with from_json (vs the path-extract
    get_json_object in json_props)."""
    from pyspark.sql import types as T

    ev = tables.load_events(spark, sf_dir)
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.select(
        "event_id", F.from_json("props", schema).alias("p")
    )
    return parsed.select("event_id", F.col("p.k").alias("k")).filter(
        F.col("k") >= 90
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount
                         AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    survey="pure filter+agg with full pushdown, TPC-H Q6 shape",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(28,10)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "w_rank_family",
    oracle_cte()
    + """
    SELECT ticker, market_cap,
           CAST(rank() OVER w AS INT) AS cap_rank,
           CAST(dense_rank() OVER w AS INT) AS cap_dense_rank,
           CAST(ntile(4) OVER w AS INT) AS cap_quartile,
           percent_rank() OVER w AS cap_pct_rank,
           cume_dist() OVER w AS cap_cume_dist
    FROM stocks
    WHERE date = '1997-03-17'
    WINDOW w AS (ORDER BY market_cap DESC, ticker)
    """,
    survey="rank/dense_rank/ntile/percent_rank/cume_dist family",
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # fan=False: the date point-filter pushes into the scan, so the
    # frame is one date's rows — the widening shuffle has nothing to
    # parallelize (r13 bench: 1.15x with it).
    s = tables.stocks(spark, sf_dir, fan=False).filter(
        F.col("date") == "1997-03-17"
    )
    # INTENTIONAL global window (WindowExec warning expected): the
    # frame is ONE date's constituents — a few thousand rows after
    # the pushed-down point filter, bounded by universe size, not
    # data volume. Ranking a whole date globally IS the semantics
    # (reference's rank family); partitioning would break ntile.
    w = Window.orderBy(F.col("market_cap").desc(), F.col("ticker"))
    return s.select(
        "ticker",
        "market_cap",
        F.rank().over(w).alias("cap_rank"),
        F.dense_rank().over(w).alias("cap_dense_rank"),
        F.ntile(4).over(w).alias("cap_quartile"),
        F.percent_rank().over(w).alias("cap_pct_rank"),
        F.cume_dist().over(w).alias("cap_cume_dist"),
    )


@register(
    "events_click_error_pairs",
    """
    WITH c AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'
    ), e AS (
        SELECT event_id AS error_id, user_id, epoch_us(ts) AS e_us
        FROM events WHERE event_type = 'error'
    )
    SELECT e.error_id, c.click_id, e.user_id,
           CAST(e.e_us - c.c_us AS BIGINT) AS gap_us
    FROM e JOIN c ON e.user_id = c.user_id
     AND c.c_us >= e.e_us - 300000000 AND c.c_us < e.e_us
    """,
    survey="same-user click->error attribution interval join; batch twin of the stream-stream join (§2.9 extension)",
)
def q_events_click_error_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .streaming.joins import click_error_pairs_batch

    return click_error_pairs_batch(tables.load_events(spark, sf_dir))


@register(
    "events_bars_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    survey="hierarchical bar rollup: 1-minute bars re-aggregated to 1-hour bars; oracle is the DIRECT hourly aggregate, so parity proves the rollup algebra (hypertable-rollup extension)",
)
def q_events_bars_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup cascade: 1-minute bars, then 1-hour bars
    computed FROM the minute bars (count/sum re-sum, min/max re-min
    — every aggregate is decomposable, the hypertable-rollup
    contract). The oracle aggregates the raw events straight to
    hours: hash-equality proves cascade == direct.

    Scale: this is the plan shape a downsampling pipeline runs —
    the expensive exchange is the fine-grained one (minute, key
    space x60); the hour-level re-aggregation consumes the already
    tiny bar table. In production the minute bars persist and every
    coarser granularity derives from them, never re-scanning raw.
    """
    ev = tables.load_events(spark, sf_dir)
    m1 = ev.groupBy(
        F.window("ts", "1 minute").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        m1.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("w.start")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "event_type",
        )
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )


@register(
    "events_hll_cascade",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM events GROUP BY 1
    """,
    survey="mergeable HLL sketch cascade: daily sketches unioned to a global distinct estimate, tolerance-checked vs exact (approx extension)",
)
def q_events_hll_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via a two-level DataSketches
    HLL cascade: per-day sketches (`hll_sketch_agg`), merged with
    `hll_union_agg` — the pattern that lets a 100 TB pipeline
    persist small daily sketches and answer any period's distinct
    count by union, never re-scanning raw data.

    The sketch binary is engine-specific, so the oracle contract is
    the TOLERANCE, not the estimate: the query emits the exact
    count (computed independently) plus `est_ok` = |est - exact| /
    exact <= 5% (HLL lgConfigK=12 has ~1.6% relative standard
    error, so 5% is a stable, deterministic bound for these
    cardinalities), and the oracle asserts est_ok is TRUE for every
    group with the exact counts hash-matched.
    """
    ev = tables.load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            / F.col("n_exact")
            <= 0.05
        ).alias("est_ok"),
    )


@register(
    "q4_late_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    survey="TPC-H Q4 shape: correlated EXISTS -> left-semi join + agg (bench anchor; adapted to schema: late shipment = >60d after order)",
)
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelates to a LEFT SEMI join: one pass over
    lineitem, no duplicate-orders blowup (an inner join + distinct
    would shuffle the multiplicity only to throw it away)."""
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    l = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q13_order_histogram",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    survey="TPC-H Q13 shape: outer-join count + re-aggregated histogram (bench anchor; adapted: non-urgent orders per customer)",
)
def q_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with zero qualifying orders must appear in the
    c_count=0 bucket — the left join is load-bearing, and the
    filter lives in the JOIN CONDITION (a WHERE would silently turn
    it into an inner join and drop them)."""
    c = tables.load(spark, sf_dir, "customer").select("c_custkey")
    o = tables.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


_RET9 = "floor(({x}) * 1000000000.0 + 0.5) / 1000000000.0"
_TX = _RET9.format(
    x="(share_price - lag(share_price) OVER w) / lag(share_price) OVER w"
)
_TY = _RET9.format(
    x="(index_value - lag(index_value) OVER wi) / lag(index_value) OVER wi"
)
_MOM = """
    m AS (
        SELECT ticker,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(18,9))
                        * CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS DECIMAL(18,9))
                        * CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(18,9))
                        * CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS syy
        FROM joined GROUP BY ticker
    )
"""


@register(
    "w_beta_corr",
    oracle_cte(index=True)
    + f""",
    tr AS (
        SELECT ticker, date, {_TX} AS x
        FROM stocks WINDOW w AS (PARTITION BY ticker ORDER BY date)
    ),
    ir AS (
        SELECT date, {_TY} AS y
        FROM index_data WINDOW wi AS (ORDER BY date)
    ),
    joined AS (
        SELECT tr.ticker, tr.x, ir.y
        FROM tr JOIN ir ON tr.date = ir.date
        WHERE tr.x IS NOT NULL AND ir.y IS NOT NULL
    ),
    {_MOM}
    SELECT ticker, n,
           floor((n * sxy - sx * sy)
                 / (n * sxx - sx * sx) * 1000000.0 + 0.5) / 1000000.0
               AS beta,
           floor((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 1000000.0 + 0.5) / 1000000.0 AS corr
    FROM m WHERE n >= 2 AND n * sxx - sx * sx > 0
               AND n * syy - sy * sy > 0
    """,
    survey="per-ticker beta and correlation vs the index via decimal-exact second-moment sums (quant analytics extension)",
)
def q_beta_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic covariance/correlation, made cross-engine exact: the
    built-in corr/covar aggregates accumulate floats in partition
    order (nondeterministic), so instead the daily returns are
    rounded to 9dp, cast to DECIMAL(18,9) (the cast recovers the
    9dp rational exactly in both engines; 9 integer digits of
    headroom, since a near-zero lag price can make a single-day
    return enormous — the r7 seed-5 fuzzer overflowed the earlier
    DECIMAL(15,10) with a 0.01 -> 1100 price step), and the five
    moment sums are decimal -> order-free: products land at
    decimal(37,18), inside Spark's 38 cap, so nothing truncates.
    The final beta/corr formula is then identical double
    arithmetic on identical inputs.

    Scale: returns are two windowed lags (ticker-partitioned /
    tiny index series), the join is date-keyed, the moments are one
    partial-aggregated groupBy(ticker) — no all-pairs anything.
    """
    from pyspark.sql import Window

    s = tables.stocks(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("date")
    x = rnd(
        (F.col("share_price") - F.lag("share_price").over(w))
        / F.lag("share_price").over(w),
        9,
    )
    tr = s.select("ticker", "date", x.alias("x")).filter(
        F.col("x").isNotNull()
    )
    idx = tables.index_data(spark, sf_dir)
    # INTENTIONAL global window (WindowExec warning expected):
    # index_data is the single index series, one row per calendar
    # date — bounded by time, not data volume. The lag needs the
    # whole series in date order; there is no partition key.
    wi = Window.orderBy("date")
    y = rnd(
        (F.col("index_value") - F.lag("index_value").over(wi))
        / F.lag("index_value").over(wi),
        9,
    )
    ir = idx.select("date", y.alias("y")).filter(F.col("y").isNotNull())
    j = tr.join(ir, "date")
    xd = F.col("x").cast("decimal(18,9)")
    yd = F.col("y").cast("decimal(18,9)")
    m = j.groupBy("ticker").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return (
        m.filter((n >= 2) & (var_x > 0) & (var_y > 0))
        .select(
            "ticker",
            "n",
            rnd(cov_n / var_x, 6).alias("beta"),
            rnd(cov_n / F.sqrt(var_x * var_y), 6).alias("corr"),
        )
    )


@register(
    "dq_lineitem_gate",
    """
    SELECT 'not_null(l_orderkey)' AS "check",
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'accepted_range(l_quantity,1,40)',
           CAST(sum(CASE WHEN l_quantity IS NOT NULL
                          AND (l_quantity < 1 OR l_quantity > 40)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'accepted_values(l_returnflag)',
           CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                          AND l_returnflag NOT IN ('A', 'N', 'R')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'unique(l_orderkey,l_linenumber)',
           CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'references(l_orderkey->o_orderkey)',
           CAST((SELECT count(*) FROM lineitem l
                 LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                   ON l.l_orderkey = o.o_orderkey
                 WHERE l.l_orderkey IS NOT NULL
                   AND o.o_orderkey IS NULL) AS BIGINT)
    """,
    survey="declarative data-quality gate: null/range/values/unique/referential checks compiled to one scan + two probes (datapipe extension)",
)
def q_dq_lineitem_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle intentionally omits `passed` (a pure derivation of
    n_violations) to keep the hash surface on the counts; the
    engine emits it for callers and the query drops it here."""
    from .pipelines.quality import (
        accepted_range,
        accepted_values,
        check_table,
        not_null,
    )

    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    return check_table(
        li,
        checks=[
            not_null("l_orderkey"),
            accepted_range("l_quantity", 1, 40),
            accepted_values("l_returnflag", ["A", "N", "R"]),
        ],
        unique_keys=[["l_orderkey", "l_linenumber"]],
        refs=[("l_orderkey", orders, "o_orderkey")],
    ).select("check", "n_violations")



from .operators.timeseries import (  # noqa: E402
    CORR_BAND_WEEKS,
    CORR_EPOCH,
    CORR_MAX_BUCKET,
    CORR_MIN_OVERLAP,
    CORR_TOPK,
    CORR_UNIVERSE_MAX,
    SKETCH_UNIVERSE_MAX,
)

# The CORR_* constants interpolate into the oracle text (like
# BOILER_MIN_DOCS / PACK_BUDGET elsewhere): tuning a constant moves
# BOTH engines, never just one.
_CORR_SCORE_SQL = f"""
        SELECT ticker_a, ticker_b, n AS n_days,
               floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     * 1000000.0 + 0.5) / 1000000.0 AS corr
        FROM g
        WHERE n >= {CORR_MIN_OVERLAP}
          AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
          AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
"""

_CORR_TOPK_SQL = f"""
    SELECT ticker_a, ticker_b, n_days, corr, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            ORDER BY corr DESC, ticker_a, ticker_b
        ) AS rank FROM scored
    ) WHERE rank <= {CORR_TOPK}
    """


def _corr_exact_sql(universe: str) -> str:
    """Exact-tier pair-correlation SQL (without the final top-k
    SELECT), parameterized on the universe bound so the recall
    audit can run both tiers on the same universe."""
    return f"""
    , px AS (
        SELECT ticker, date, CAST(share_price AS DECIMAL(18,2)) AS p
        FROM stocks WHERE ticker < '{universe}'
    ), pr AS (
        SELECT a.ticker AS ticker_a, b.ticker AS ticker_b,
               a.p AS x, b.p AS y
        FROM px a JOIN px b
          ON a.date = b.date AND a.ticker < b.ticker
    ), g AS (
        SELECT ticker_a, ticker_b,
               CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx,
               sum(y * y) AS syy
        FROM pr GROUP BY ticker_a, ticker_b
    ), scored AS ({_CORR_SCORE_SQL})
    """


def _corr_sketched_sql(universe: str) -> str:
    """Sketch-tier SQL (movement bits -> banded signatures ->
    capped buckets -> candidate scoring), parameterized on the
    universe bound; exposes the same `scored` CTE name as the
    exact tier."""
    return f"""
    , px AS (
        SELECT ticker, CAST(date AS DATE) AS date,
               CAST(share_price AS DECIMAL(18,2)) AS p
        FROM stocks WHERE ticker < '{universe}'
    ), mv AS (
        SELECT ticker, date,
               CAST(p > lag(p) OVER (
                   PARTITION BY ticker ORDER BY date) AS INT) AS up
        FROM px
    ), bits AS (
        SELECT ticker,
               CAST(floor(datediff('day', DATE '{CORR_EPOCH}', date)
                          / 7) AS BIGINT) AS week,
               CAST(sum(up) * 2 > count(*) AS INT) AS bit
        FROM mv WHERE up IS NOT NULL
        GROUP BY ticker, 2
    ), sigs AS (
        SELECT ticker, CAST(floor(week / {CORR_BAND_WEEKS}) AS BIGINT) AS band,
               string_agg(CAST(bit AS VARCHAR), '' ORDER BY week)
                   AS sig
        FROM bits GROUP BY ticker, 2
    ), sized AS (
        SELECT *, count(*) OVER (PARTITION BY band, sig)
                   AS n_in_bucket
        FROM sigs
    ), cands AS (
        SELECT DISTINCT a.ticker AS ticker_a, b.ticker AS ticker_b
        FROM sized a JOIN sized b
          ON a.band = b.band AND a.sig = b.sig
         AND a.ticker < b.ticker
        WHERE a.n_in_bucket <= {CORR_MAX_BUCKET} AND b.n_in_bucket <= {CORR_MAX_BUCKET}
    ), pr AS (
        SELECT c.ticker_a, c.ticker_b, xa.p AS x, xb.p AS y
        FROM cands c
        JOIN px xa ON xa.ticker = c.ticker_a
        JOIN px xb ON xb.ticker = c.ticker_b AND xb.date = xa.date
    ), g AS (
        SELECT ticker_a, ticker_b,
               CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx,
               sum(y * y) AS syy
        FROM pr GROUP BY ticker_a, ticker_b
    ), scored AS ({_CORR_SCORE_SQL})
    """




@register(
    "w_rolling_range_7d",
    tables.oracle_cte()
    + """
    SELECT ticker, date,
           CAST(n7 AS BIGINT) AS n_in_window,
           CAST(c7 AS DOUBLE) / (100.0 * n7) AS avg_7d,
           CAST(mx AS DOUBLE) / 100.0 AS max_7d
    FROM (
        SELECT ticker, date,
               count(*) OVER w AS n7,
               sum(cents) OVER w AS c7,
               max(cents) OVER w AS mx
        FROM (
            SELECT ticker, date,
                   CAST(floor(share_price * 100 + 0.5) AS BIGINT)
                       AS cents,
                   datediff('day', DATE '1992-01-01',
                            CAST(date AS DATE)) AS day_num
            FROM stocks
        )
        WINDOW w AS (PARTITION BY ticker ORDER BY day_num
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    """,
    survey="calendar-aware rolling window: RANGE frame over day numbers, so gaps in trading days shrink the window instead of reaching back 7 ROWS (window-frame extension)",
)
def q_w_rolling_range_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame kind the ROWS family can't express: a 7-DAY window
    over a sparse series. `rowsBetween(-6, 0)` on thin tickers
    reaches back months; the RANGE frame over an integer day number
    includes exactly the rows within 6 calendar days. Cents-integer
    sums keep the average bit-exact across engines; the window is
    ticker-partitioned (uniform), one shuffle."""
    s = tables.stocks(spark, sf_dir)
    day_num = F.datediff(F.to_date("date"), F.lit("1992-01-01")).cast(
        "long"
    )
    cents = F.floor(F.col("share_price") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("ticker")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        s.select(
            "ticker",
            "date",
            cents.alias("cents"),
            day_num.alias("day_num"),
        )
        .select(
            "ticker",
            "date",
            F.count("*").over(w).cast("long").alias("n_in_window"),
            (
                F.sum("cents").over(w).cast("double")
                / (F.lit(100.0) * F.count("*").over(w))
            ).alias("avg_7d"),
            (F.max("cents").over(w).cast("double") / F.lit(100.0)).alias(
                "max_7d"
            ),
        )
    )


@register(
    "ts_corr_pairs",
    tables.oracle_cte() + _corr_exact_sql(CORR_UNIVERSE_MAX) + _CORR_TOPK_SQL,
    survey="time-series similarity search: top-k price-correlated ticker pairs, universe-bounded date-bucketed candidates, decimal-exact co-moments (cross-series extension)",
)
def q_ts_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See operators/timeseries.py: candidate pairs are bounded by
    an explicit universe (never all-pairs over the full ticker
    space), co-moment sums are DECIMAL-exact, and the Pearson ratio
    is one fixed double expression over exact sums — rank-stable
    across engines."""
    from .operators.timeseries import corr_pairs

    return corr_pairs(tables.stocks(spark, sf_dir))


@register(
    "ts_corr_pairs_sketched",
    tables.oracle_cte() + _corr_sketched_sql(SKETCH_UNIVERSE_MAX) + _CORR_TOPK_SQL,
    survey="time-series similarity scale path: sign-of-move sketch banding -> capped-bucket candidates -> exact co-moment scoring (cross-series extension)",
)
def q_ts_corr_pairs_sketched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH tier of corr_pairs: candidates from banded movement
    signatures (integer week grid, majority bit, quarter bands,
    bucket cap) — never all-pairs; exact scoring on candidates
    only. See operators/timeseries.corr_pairs_sketched."""
    from .operators.timeseries import corr_pairs_sketched

    return corr_pairs_sketched(tables.stocks(spark, sf_dir))


@register(
    "ts_corr_recall",
    tables.oracle_cte()
    + f"""
    , e AS (
        SELECT ticker_a, ticker_b FROM (
            WITH {_corr_exact_sql(CORR_UNIVERSE_MAX).lstrip().removeprefix(",")}
            {_CORR_TOPK_SQL}
        )
    ), a AS (
        SELECT ticker_a, ticker_b, 1 AS hit FROM (
            WITH {_corr_sketched_sql(CORR_UNIVERSE_MAX).lstrip().removeprefix(",")}
            {_CORR_TOPK_SQL}
        )
    )
    SELECT CAST({CORR_TOPK} AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hits,
           -- recall of an empty exact set is UNDEFINED -> NULL
           CAST(CASE WHEN count(*) > 0
                THEN floor(coalesce(sum(hit), 0) * 1000000 / count(*))
                END AS BIGINT) AS recall_ppm
    FROM e LEFT JOIN a USING (ticker_a, ticker_b)
    """,
    survey="series-similarity recall audit: sketch tier vs exact tier on the same universe (cross-series extension)",
)
def q_ts_corr_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@50 of the sketch tier against the exact tier on the
    shared universe — the number that says whether the quarter-band
    signature is sized right (the ann_recall pattern for series)."""
    from .operators.timeseries import corr_recall

    # fan=False: measured-regressed under the widening shuffle
    # (r13 adjudicator 1.50x iso; A/B 3.25-3.50 s fan vs 2.60 s)
    return corr_recall(tables.stocks(spark, sf_dir, fan=False))

@register(
    "dq_documents_gate",
    """
    SELECT 'not_null(doc_id)' AS "check",
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM documents
    UNION ALL
    SELECT 'not_null(text)',
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'accepted_range(n_chars,1,None)',
           CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars < 1
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'accepted_values(lang)',
           CAST(sum(CASE WHEN lang IS NOT NULL
                          AND lang NOT IN ('en','zh','fr','es','de')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'expression(n_chars=len(text))',
           CAST(sum(CASE WHEN length(text) <> n_chars
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'unique(doc_id)',
           CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
    FROM documents
    """,
    survey="documents-table quality gate: ingest expectations incl. a cross-column length-consistency expression, one scan + one key probe (datapipe extension)",
)
def q_dq_documents_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest gate a corpus pipeline runs per batch: the five
    row-level expectations (incl. the cross-column stored-length
    consistency check via the `expression` escape hatch) compile
    into ONE scan; uniqueness adds one doc_id-keyed groupBy."""
    from .pipelines.quality import (
        accepted_range,
        accepted_values,
        check_table,
        expression,
        not_null,
    )

    docs = tables.load(spark, sf_dir, "documents")
    return check_table(
        docs,
        checks=[
            not_null("doc_id"),
            not_null("text"),
            accepted_range("n_chars", 1, None),
            accepted_values("lang", ["en", "zh", "fr", "es", "de"]),
            expression(
                "n_chars=len(text)",
                F.length("text") != F.col("n_chars"),
            ),
        ],
        unique_keys=[["doc_id"]],
    ).select("check", "n_violations")


@register(
    "q17_small_qty_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10)))
                AS DOUBLE) / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#1'
      AND l_quantity * 5
          * (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = p_partkey)
          < (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(28,10)))
                         AS DOUBLE)
             FROM lineitem l3 WHERE l3.l_partkey = p_partkey)
    """,
    survey="correlated scalar subquery -> decorrelated agg-join, TPC-H Q17 shape (engine extension)",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue: lines whose quantity is below 20% of
    the part's average quantity. Expressed as a TRUE correlated
    scalar subquery in Spark SQL — Catalyst decorrelates it into a
    per-part aggregate joined back (one pass over lineitem for the
    thresholds, one for the probe; never a per-row subplan), which
    is exactly the plan you'd hand-write with groupBy+join.

    Cross-engine exactness: the textbook `l_quantity < 0.2 * avg`
    compares against a float DIVISION whose value depends on sum
    order; rewritten as `l_quantity * 5 * count < sum` every term
    is either exact (decimal sum, bigint count) or a single IEEE
    multiply, so both engines evaluate the identical predicate.
    Parts absent from lineitem yield NULL sums -> row filtered, in
    both engines.
    """
    tables.register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10)))
                    AS DOUBLE) / 7.0 AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#1'
          AND l_quantity * 5
              * (SELECT count(*) FROM lineitem l2
                 WHERE l2.l_partkey = p_partkey)
              < (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(28,10)))
                             AS DOUBLE)
                 FROM lineitem l3 WHERE l3.l_partkey = p_partkey)
        """
    )


@register(
    "q18_large_order_customers",
    """
    WITH big AS (
        SELECT l_orderkey AS bok,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,10)))
                    AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(28,10))) > 300)
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = bok
    JOIN customer ON c_custkey = o_custkey
    """,
    survey="semi-join on HAVING aggregate, TPC-H Q18 shape (engine extension)",
)
def q18_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding very large orders: aggregate lineitem by
    order, keep sums over the threshold, join back to orders and
    customers. Scale shape: the HAVING filter collapses the fact
    table to a tiny key set BEFORE the dimension joins (46 rows at
    sf0.01), so both joins broadcast; the only big shuffle is the
    orderkey aggregation, which partial-aggregates map-side."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("dq")
        )
        .filter(F.col("dq") > 300)
        .select(
            F.col("l_orderkey").alias("bok"),
            F.col("dq").cast("double").alias("sum_qty"),
        )
    )
    return (
        big.join(o, o["o_orderkey"] == big["bok"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty"
        )
    )


@register(
    "q7_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    survey="bidirectional nation-pair trade volume by year, TPC-H Q7 shape (engine extension)",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between two nations per year, in both
    directions. The nation dimension joins twice under different
    roles (supplier vs customer side) — both broadcast (25 rows);
    the disjunctive nation-pair predicate lands on the broadcast
    result, so the fact table shuffles only for the final
    3-key aggregation."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    s = tables.load(spark, sf_dir, "supplier")
    n1 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    joined = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n1), F.col("n1_key") == s["s_nationkey"])
        .join(F.broadcast(n2), F.col("n2_key") == c["c_nationkey"])
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
                "decimal(28,10)"
            )
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey="top-k customers by returned-item revenue, TPC-H Q10 shape (engine extension)",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in a half-year.
    The top-k set is deterministic cross-engine because revenue is a
    decimal-exact sum cast once to double (identical in both
    engines) with a custkey tiebreak. Returnflag and the order-date
    range both push into the parquet scans."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    return (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n), F.col("n_nationkey") == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
                ).cast("decimal(28,10)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    -- empty-input contract: see cube_revenue
    HAVING count(*) > 0
    """,
    survey="explicit GROUPING SETS (completes the cube/rollup family, engine extension)",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping-set selection — the general form that
    cube_revenue / rollup_orders are special cases of. One scan:
    Spark expands the sets with a single Expand node feeding one
    aggregation, not one scan per set."""
    tables.register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               floor(min(l_extendedprice / l_quantity) * 1000000.0
                     + 0.5) / 1000000.0 AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    ranked AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_cost NULLS LAST,
                                           l_suppkey) AS rn
        FROM ps)
    SELECT p_partkey, p_brand, s_name, unit_cost
    FROM ranked
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 AND p_type = 'PROMO'
    """,
    survey="argmin-per-group min-cost supplier, TPC-H Q2 shape adapted to lineitem prices (engine extension)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every PROMO part, the supplier with the lowest observed
    unit price (argmin per group — the Q2 correlated-min shape,
    adapted because the testdata has no partsupp table). Unit cost
    is a single IEEE division, min'ed (order-insensitive) and
    floor-rounded BEFORE ranking with a suppkey tiebreak, so both
    engines rank identically. Scale: the (part, supp) aggregation
    partial-aggregates map-side; the per-part window runs on the
    already-collapsed aggregate (~|part|x|supp| rows max), and the
    part/supplier dimension joins broadcast."""
    from pyspark.sql import Window

    from .numerics import rnd

    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    s = tables.load(spark, sf_dir, "supplier")
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            rnd(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6
            ).alias("unit_cost")
        )
    )
    # asc_nulls_last explicitly: Spark ASC is NULLS FIRST while
    # DuckDB's is NULLS LAST, and an unknown (all-NULL-cost) group
    # must never win an argmin (r7 fuzzer on NULL-laced lineitem)
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_cost").asc_nulls_last(), F.col("l_suppkey")
    )
    best = ps.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        best.join(F.broadcast(p), p["p_partkey"] == best["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == best["l_suppkey"])
        .select("p_partkey", "p_brand", "s_name", "unit_cost")
    )


# ----------------------------------------------------------------------
# Round-6 OLAP anchors, batch 2: the remaining classic hard shapes —
# two-level conditional-agg ratio (Q8), HAVING vs a global scalar
# (Q11), single-row promo ratio (Q14), argmax-vs-view (Q15), distinct
# count with NOT-IN exclusion (Q16), OR-of-brackets join predicate
# (Q19), double-correlated EXISTS/NOT EXISTS (Q21), and anti-join
# against a global average (Q22).
# ----------------------------------------------------------------------

_DEC_REV = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))"


@register(
    "q8_market_share",
    f"""
    WITH flows AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               n2.n_name AS supp_nation,
               {_DEC_REV} AS rev
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        JOIN part ON p_partkey = l_partkey
        WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev
                         ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
               / CAST(sum(rev) AS DOUBLE) AS mkt_share,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM flows GROUP BY o_year
    """,
    survey="national market share: two-level conditional-agg ratio, TPC-H Q8 shape (engine extension)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2's share of STANDARD-part revenue sold into ASIA-region
    customers, per order year. Shape: 7-way join where every
    dimension (customer/nation x2/region/supplier/part) broadcasts,
    the order-date range pushes into the orders scan, and the fact
    table shuffles once for the per-year aggregation. The share is a
    single IEEE division of two decimal-exact sums, so both engines
    emit bit-identical ratios."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = tables.load(spark, sf_dir, "customer")
    s = tables.load(spark, sf_dir, "supplier")
    p = tables.load(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    n1 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    n2 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = tables.load(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    rev = (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    flows = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), F.col("cn_key") == c["c_nationkey"])
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_region"))
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n2), F.col("sn_key") == s["s_nationkey"])
        .join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.col("supp_nation"),
            rev.alias("rev"),
        )
    )
    zero = F.lit(0).cast("decimal(28,10)")
    return flows.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("rev"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("rev").cast("double")
        ).alias("mkt_share"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q11_part_value_share",
    f"""
    SELECT l_partkey,
           CAST(sum({_DEC_REV}) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(sum({_DEC_REV}) AS DOUBLE) * 2000.0
           > (SELECT CAST(sum({_DEC_REV}) AS DOUBLE) FROM lineitem)
    """,
    survey="HAVING against a global scalar subquery, TPC-H Q11 shape (engine extension)",
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 0.05% of GLOBAL revenue — a HAVING
    clause referencing an uncorrelated scalar subquery. Catalyst
    computes the global sum once (one extra pass, broadcast as a
    1-row join), never per group. Exactness: both sides of the
    comparison are decimal-exact sums cast once to double, with a
    multiply instead of a division against the threshold."""
    tables.register_all(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_partkey,
               CAST(sum({_DEC_REV}) AS DOUBLE) AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING CAST(sum({_DEC_REV}) AS DOUBLE) * 2000.0
               > (SELECT CAST(sum({_DEC_REV}) AS DOUBLE) FROM lineitem)
        """
    )


@register(
    "q14_promo_revenue_pct",
    f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DEC_REV}
                         ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
               * 100.0
               / CAST(sum({_DEC_REV}) AS DOUBLE) AS promo_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
    survey="single-row conditional-agg ratio, TPC-H Q14 shape (engine extension)",
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of one month's revenue from PROMO parts. The ship-date
    range pushes into the lineitem scan, part broadcasts, and the
    whole query collapses to one partial-aggregated scan. The ratio
    divides two decimal-exact doubles (multiply by 100 first — both
    engines evaluate the identical expression tree)."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-06-01")
        & (F.col("l_shipdate") < "1997-07-01")
    )
    p = tables.load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    zero = F.lit(0).cast("decimal(28,10)")
    return (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .agg(
            (
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
                * F.lit(100.0)
                / F.sum(rev).cast("double")
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_DEC_REV}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    survey="argmax against a reused aggregate view, TPC-H Q15 shape (engine extension)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum revenue in a quarter — the Q15
    view-reuse shape: the same aggregate feeds both the probe and the
    global-max scalar. Expressed in SQL so Catalyst plans the reuse
    (the CTE aggregates once per reference; equality on the
    decimal-exact double is safe cross-engine). The supplier
    dimension join broadcasts."""
    tables.register_all(spark, sf_dir)
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum({_DEC_REV}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@register(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    survey="distinct-count with NOT-IN supplier exclusion, TPC-H Q16 shape (engine extension)",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct (non-delinquent) suppliers serve each part
    shape. The NOT IN exclusion list (suppliers in arrears) is a
    broadcast anti-join — s_suppkey is non-null so NOT IN and
    LEFT ANTI agree; the part predicate prunes before the join; the
    distinct count shuffles on the 3 group keys with the suppkey
    folded into the aggregation buffer."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = tables.load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_bracket_disjunction",
    f"""
    SELECT CAST(sum({_DEC_REV}) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    survey="OR-of-brackets multi-column join predicate, TPC-H Q19 shape (engine extension)",
)
def q19_bracket_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three disjunctive brand/size/quantity brackets —
    the classic test that an engine extracts the common join key and
    pushes the per-table conjuncts from a disjunction: Catalyst
    derives `l_quantity BETWEEN 1 AND 30` and the brand/size union
    onto the scans, then applies the full bracket predicate after
    the broadcast join."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 20)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(21, 30)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .filter(bracket)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q21_sole_late_supplier",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate
                            > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    survey="double-correlated EXISTS/NOT EXISTS anti-join, TPC-H Q21 shape (engine extension)",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper on finished
    multi-supplier orders (late = shipped >60 days after the order
    date — adapted: this schema has no commit/receipt dates). The
    correlated EXISTS becomes a left-semi join and the NOT EXISTS a
    left-anti join, both on l_orderkey — Catalyst plans two hash
    joins against the same fact table, never a per-row subplan.
    Identical SQL runs on both engines."""
    tables.register_all(spark, sf_dir)
    return spark.sql(QUERIES["q21_sole_late_supplier"].oracle)


@register(
    "q22_idle_customer_balance",
    """
    WITH pos AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
                   AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
               AS totacctbal
    FROM customer, pos
    WHERE c_acctbal * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    survey="anti-join against orders + global-average balance filter, TPC-H Q22 shape (engine extension)",
)
def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers who never ordered, by segment: balance
    above the all-customer positive average (written multiply-only:
    `bal * n > sum`, both factors exact or single-IEEE) and an
    anti-join against orders. The 1-row average cross-joins
    (broadcast); the anti-join shuffles on custkey — at scale
    that's the one real exchange, against a key set AQE can
    convert to broadcast when the order side is small."""
    tables.register_all(spark, sf_dir)
    return spark.sql(QUERIES["q22_idle_customer_balance"].oracle)


@register(
    "q9_nation_profit",
    """
    SELECT n_name AS supp_nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         - p_retailprice * l_quantity * 0.5
                         AS DECIMAL(28,10))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY supp_nation, o_year
    """,
    survey="product-line profit by supplier nation and year, TPC-H Q9 shape (engine extension; cost = half retail, no partsupp table)",
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation per year. The cost
    term substitutes half the part's retail price for the absent
    ps_supplycost. Each row's margin is three IEEE multiplies and a
    subtract — identical bits on both engines — then decimal-summed.
    The LIKE filter prunes part BEFORE its broadcast join; supplier
    and nation broadcast; orders joins on the fact key; one
    aggregation shuffle on (nation, year)."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    o = tables.load(spark, sf_dir, "orders")
    margin = (
        F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.5)
    ).cast("decimal(28,10)")
    return (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n), F.col("n_nationkey") == s["s_nationkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(margin).cast("double").alias("profit"))
    )


@register(
    "q12_priority_by_delay",
    """
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS delay_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY delay_class
    """,
    survey="priority mix by delivery-delay class, TPC-H Q12 shape (engine extension; shipmode -> derived delay class)",
)
def q12_priority_by_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many high- vs low-priority order lines fall in each
    delivery-delay class for one ship year (Q12's shipmode replaced
    by a derived LATE/ONTIME class — the schema carries no shipmode).
    Integer CASE-sums, one aggregation over a 2-value derived key;
    the ship-date range pushes into the scan."""
    tables.register_all(spark, sf_dir)
    return spark.sql(QUERIES["q12_priority_by_delay"].oracle)


@register(
    "q20_promo_volume_suppliers",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN
              (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(28,10))) > 500)
    """,
    survey="nested IN semi-join chain over a HAVING aggregate, TPC-H Q20 shape (engine extension)",
)
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved serious PROMO-part volume in a year — the
    Q20 nested-IN chain: part keys IN-filter lineitem (semi join),
    the surviving lines aggregate per supplier with a HAVING
    threshold (decimal-exact), and that key set IN-filters supplier
    (second semi join). Catalyst turns both INs into hash semi-joins
    — the inner one broadcast — so the fact table is scanned once,
    pre-pruned by the pushed ship-date range."""
    tables.register_all(spark, sf_dir)
    return spark.sql(QUERIES["q20_promo_volume_suppliers"].oracle)


@register(
    "events_enrich_static",
    """
    WITH profile AS (
        SELECT user_id AS p_user_id,
               CAST(count(*) AS BIGINT) AS hist_events,
               CASE WHEN count(*) >= 40 THEN 'heavy'
                    WHEN count(*) >= 20 THEN 'medium'
                    ELSE 'light' END AS tier
        FROM events
        WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY user_id)
    SELECT event_id, user_id, event_type,
           coalesce(tier, 'new') AS tier,
           coalesce(hist_events, 0) AS hist_events
    FROM events
    LEFT JOIN profile ON p_user_id = user_id
    WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    """,
    survey="stream-static enrichment join, batch twin (streaming dimension pattern, §2.9 extension)",
)
def q_events_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.enrich.enrich_stream: live events
    left-joined onto the broadcast per-user historical profile
    (stateless streaming-dimension pattern — stream==batch asserted
    in tests/test_streaming.py)."""
    from .streaming.enrich import enrich, user_profile

    ev = tables.load_events(spark, sf_dir)
    return enrich(ev, user_profile(ev))


@register(
    "events_asof_prev",
    """
    WITH u AS (
        SELECT event_id, user_id, event_type, value,
               epoch_us(ts) AS ts_us
        FROM events WHERE event_type IN ('click', 'error')
    ), lv AS (
        SELECT *,
            last_value(CASE WHEN event_type = 'click' THEN value END
                       IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS prev_value,
            last_value(CASE WHEN event_type = 'click' THEN ts_us END
                       IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS prev_ts_us
        FROM u
    )
    SELECT event_id AS left_id, user_id,
           CAST(ts_us AS BIGINT) AS ts_us,
           prev_value,
           CAST(ts_us - prev_ts_us AS BIGINT) AS gap_us
    FROM lv WHERE event_type = 'error'
    """,
    survey="generic timestamp AS-OF join (trade/quote semantics, unbounded lookback) — union+window sort-merge, zero joins (§2.3/§2.9 extension)",
)
def q_events_asof_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import asof_prev_event

    return asof_prev_event(tables.load_events(spark, sf_dir))


@register(
    "events_bars_incremental",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
               AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    survey="incremental materialized-view maintenance: merge a new batch's partial bars into stored bars without re-scanning history; oracle is the DIRECT aggregate, so parity proves merge(old, delta) == recompute (engine extension)",
)
def q_events_bars_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-view maintenance for the hourly-bars table: the
    stored view holds bars for everything BEFORE the cutoff; a new
    batch (events at/after the cutoff) is aggregated alone and
    MERGED into the view by bar key — every aggregate here is
    decomposable (count/sum re-add, min/max re-min), so the merge
    needs only a full-outer join at BAR grain, never the raw
    history. The stored partial keeps the DECIMAL sum (what a real
    incremental view persists) so re-merging stays order-free exact;
    the double cast happens once, at presentation.

    Scale: this is the nightly-ingest shape — history cost is the
    view's own size (bar grain, ~keys x hours, tiny vs raw), batch
    cost is one batch-sized aggregation + join. With the bars table
    date-partitioned, dynamic partition overwrite rewrites only the
    hours the batch touched. The oracle aggregates ALL raw events
    directly: hash parity proves merge(old, delta) == recompute.
    """
    cutoff = "2024-01-16 00:00:00"
    ev = tables.load_events(spark, sf_dir)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "event_type",
        ).agg(
            F.count("*").alias("_n"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("_s"),
            F.min("value").alias("_mn"),
            F.max("value").alias("_mx"),
        )

    stored = partial(ev.filter(F.col("ts") < F.lit(cutoff)))
    delta = partial(ev.filter(F.col("ts") >= F.lit(cutoff)))
    o, d = stored.alias("o"), delta.alias("d")
    merged = o.join(
        d,
        (F.col("o.window_start") == F.col("d.window_start"))
        & (F.col("o.event_type") == F.col("d.event_type")),
        "full_outer",
    )
    zero_l = F.lit(0).cast("long")
    return merged.select(
        F.coalesce(F.col("o.window_start"), F.col("d.window_start"))
        .alias("window_start"),
        F.coalesce(F.col("o.event_type"), F.col("d.event_type"))
        .alias("event_type"),
        (
            F.coalesce(F.col("o._n"), zero_l)
            + F.coalesce(F.col("d._n"), zero_l)
        )
        .cast("long")
        .alias("n_events"),
        # coalesce(a+b, a, b): both present -> add; one absent ->
        # the other; BOTH absent -> NULL, matching the direct
        # aggregate's sum over an all-NULL group (a 0 here would
        # diverge from recompute — r7 fuzzer on NULL-laced values)
        F.coalesce(
            F.col("o._s") + F.col("d._s"),
            F.col("o._s"),
            F.col("d._s"),
        )
        .cast("double")
        .alias("sum_value"),
        F.least(F.col("o._mn"), F.col("d._mn")).alias("min_value"),
        F.greatest(F.col("o._mx"), F.col("d._mx")).alias("max_value"),
    )


@register(
    "price_equidepth_hist",
    oracle_cte()
    + """
    , c AS (
        SELECT CAST(floor(share_price * 100 + 0.5) AS BIGINT) AS c
        FROM stocks
    ), b AS (
        SELECT quantile_disc(c, 0.25) AS b1,
               quantile_disc(c, 0.50) AS b2,
               quantile_disc(c, 0.75) AS b3
        FROM c
    )
    SELECT CAST(1 + CAST(c > b1 AS INT) + CAST(c > b2 AS INT)
                + CAST(c > b3 AS INT) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(c) / 100.0 AS min_price,
           max(c) / 100.0 AS max_price,
           CAST(sum(CAST(c AS DECIMAL(28,2))) / 100 AS DOUBLE)
               AS sum_price
    FROM c, b GROUP BY 1
    """,
    survey="equi-depth quartile histogram with exact percentile_disc boundaries computed from the bounded cents-domain cumsum, not a buffering percentile aggregate (OLAP extension)",
)
def q_price_equidepth_hist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.aggregates import equidepth_hist

    return equidepth_hist(tables.stocks(spark, sf_dir))


@register(
    "price_winsorize",
    oracle_cte()
    + """
    , c AS (
        SELECT ticker, date,
               CAST(floor(share_price * 100 + 0.5) AS BIGINT) AS c
        FROM stocks
    ), b AS (
        SELECT quantile_disc(c, 0.05) AS lo,
               quantile_disc(c, 0.95) AS hi
        FROM c
    )
    SELECT ticker, date,
           c / 100.0 AS share_price,
           least(greatest(c, lo), hi) / 100.0 AS winsorized_price,
           c < lo AS clamped_low,
           c > hi AS clamped_high
    FROM c, b
    """,
    survey="winsorization at exact p05/p95 percentile_disc bounds from the cents-domain cumsum — robust-stats pre-step, two linear passes (OLAP extension)",
)
def q_price_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.aggregates import winsorize_prices

    return winsorize_prices(tables.stocks(spark, sf_dir))


@register(
    "stocks_snapshot_diff",
    oracle_cte(raw_history=True)
    + """
    , d AS (SELECT min(date) AS mind, max(date) AS maxd
            FROM raw_history),
    v1 AS (
        SELECT ticker, date, close, stock_splits AS split
        FROM raw_history, d WHERE date < maxd
    ),
    v2 AS (
        SELECT ticker, date, close,
               CASE WHEN stock_splits = 0.0 THEN 1.0
                    ELSE stock_splits END AS split
        FROM raw_history, d WHERE date > mind
    ),
    j AS (
        SELECT coalesce(v1.ticker, v2.ticker) AS ticker,
               -- IS NOT DISTINCT FROM mirrors table_diff's
               -- eqNullSafe struct compare: NULL==NULL counts as
               -- unchanged, not changed.
               CASE WHEN v1.ticker IS NULL THEN 'added'
                    WHEN v2.ticker IS NULL THEN 'removed'
                    WHEN v1.close IS NOT DISTINCT FROM v2.close
                         AND v1.split IS NOT DISTINCT FROM v2.split
                         THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM v1 FULL OUTER JOIN v2
          ON v1.ticker = v2.ticker AND v1.date = v2.date
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT ticker) AS BIGINT) AS n_tickers
    FROM j GROUP BY status
    """,
    survey="snapshot diff audit after a repair+retention write: added/removed/changed/unchanged per key via ONE full-outer PK join, null-safe struct compare (engine extension)",
)
def q_stocks_snapshot_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """v1 = yesterday's snapshot (original splits, no latest date);
    v2 = today's (split 0->1 repair applied, oldest date purged by
    retention). The diff must classify exactly: latest-date rows
    'added', oldest-date rows 'removed', repaired rows 'changed',
    the rest 'unchanged' — proving the write-audit wiring on a pair
    of snapshots whose true diff is derivable."""
    from .operators.joins import table_diff

    raw = tables.raw_history(spark, sf_dir)
    d = raw.agg(
        F.min("date").alias("_mind"), F.max("date").alias("_maxd")
    )
    v1 = (
        raw.crossJoin(F.broadcast(d))
        .filter(F.col("date") < F.col("_maxd"))
        .select(
            "ticker", "date", "close",
            F.col("stock_splits").alias("split"),
        )
    )
    v2 = (
        raw.crossJoin(F.broadcast(d))
        .filter(F.col("date") > F.col("_mind"))
        .select(
            "ticker", "date", "close",
            F.when(F.col("stock_splits") == 0.0, F.lit(1.0))
            .otherwise(F.col("stock_splits"))
            .alias("split"),
        )
    )
    diff = table_diff(v1, v2, ["ticker", "date"], ["close", "split"])
    return diff.groupBy("status").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("ticker").cast("long").alias("n_tickers"),
    )


@register(
    "events_bars_gapfill",
    """
    WITH bars AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS n_events,
               max(value) AS max_value
        FROM events GROUP BY 1, 2
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(min(h), max(h),
                                      INTERVAL 1 HOUR)) AS h
        FROM bars GROUP BY event_type
    ), filled AS (
        SELECT s.event_type, s.h,
               coalesce(b.n_events, 0) AS n_events,
               b.h IS NULL AS gap_filled,
               last_value(b.max_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS locf_max_value
        FROM spine s LEFT JOIN bars b
          ON b.event_type = s.event_type AND b.h = s.h
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
           n_events, gap_filled, locf_max_value
    FROM filled
    """,
    survey="time-bucket gap-fill with LOCF: dense hourly spine per key, zero-filled counts, last-observation-carried-forward values (timeseries extension, cf. TimescaleDB time_bucket_gapfill/locf)",
)
def q_events_bars_gapfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dense hourly series per event_type: the observed bars are
    left-joined onto a generated per-key hour spine; missing hours
    get n_events = 0 and carry the last seen max_value forward
    (LOCF) — what a charting/feature layer needs where 'no rows'
    must mean zero, not absent.

    Scale: the spine is |keys| x |hours| — calendar-bounded, tiny
    next to the events table; the join keys are (event_type, hour),
    uniform by construction, and the LOCF window is partitioned per
    key over the calendar axis, so nothing here grows with raw event
    volume except the one bars aggregation that any rollup already
    pays.
    """
    ev = tables.load_events(spark, sf_dir)
    bars = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("value").alias("max_value"),
    )
    spine = bars.groupBy("event_type").agg(
        F.min("h").alias("_h0"), F.max("h").alias("_h1")
    ).select(
        "event_type",
        F.explode(
            F.sequence(
                F.col("_h0"), F.col("_h1"), F.expr("INTERVAL 1 HOUR")
            )
        ).alias("h"),
    )
    b = bars.alias("b")
    s = spine.alias("s")
    joined = s.join(
        b,
        (F.col("b.event_type") == F.col("s.event_type"))
        & (F.col("b.h") == F.col("s.h")),
        "left",
    )
    w = (
        Window.partitionBy(F.col("s.event_type"))
        .orderBy(F.col("s.h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("s.event_type").alias("event_type"),
        F.date_format(F.col("s.h"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.coalesce(F.col("b.n_events"), F.lit(0).cast("long")).alias(
            "n_events"
        ),
        F.col("b.h").isNull().alias("gap_filled"),
        F.last(F.col("b.max_value"), ignorenulls=True)
        .over(w)
        .alias("locf_max_value"),
    )


@register(
    "ticker_mad_outliers",
    oracle_cte()
    + """
    , c AS (
        SELECT ticker, date,
               CAST(floor(share_price * 100 + 0.5) AS BIGINT) AS c
        FROM stocks
    ), med AS (
        SELECT ticker, quantile_disc(c, 0.5) AS m
        FROM c GROUP BY ticker
    ), r AS (
        SELECT c.ticker, c.date, c.c, med.m, abs(c.c - med.m) AS r
        FROM c JOIN med ON c.ticker = med.ticker
    ), mad AS (
        SELECT ticker, quantile_disc(r, 0.5) AS mad
        FROM r GROUP BY ticker
    )
    SELECT r.ticker, r.date,
           r.c / 100.0 AS share_price,
           r.m / 100.0 AS median_price,
           mad.mad / 100.0 AS mad_price,
           r.r > 5 * mad.mad AS is_outlier
    FROM r JOIN mad ON r.ticker = mad.ticker
    """,
    survey="robust per-ticker outlier flags: exact per-group median + MAD from bounded cents-domain histograms, no buffering percentile aggregate (OLAP/robust-stats extension)",
)
def q_ticker_mad_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.aggregates import mad_outliers

    return mad_outliers(tables.stocks(spark, sf_dir))


@register(
    "dq_referential_integrity",
    """
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lineitem,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
            AS orphan_lineitems,
        (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
        (SELECT CAST(count(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
            AS orphan_orders,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
            AS orphan_part_refs
    """,
    survey="cross-table referential-integrity audit: orphan FK counts via anti-joins — the DQ gate an ingest pipeline runs before publishing a snapshot (engine extension)",
)
def q_dq_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Orphan-foreign-key counts across the fact/dim graph
    (lineitem->orders, orders->customer, lineitem->part), emitted as
    one row with the table totals for rate computation.

    Scale: ONE pass over each fact table. The old plan scanned
    lineitem three times (total + two anti-joins) and orders twice;
    this plan left-joins each fact once against the PK-projections
    of its dims and folds every count into a single conditional
    aggregate over that scan. Join strategy is deliberately LEFT TO
    CATALYST: at test scale the distinct dim-key projections fit the
    autoBroadcastJoinThreshold and plan as broadcasts, but at 100 TB
    orders/part/customer PKs are billions of keys — a hard
    ``F.broadcast()`` hint there would OOM the build side, whereas a
    size-based fallback to a shuffled hash join keeps the same
    single-scan conditional-aggregate shape (the counts still
    collapse in the partial aggregate after the join). The two 1-row
    scalars cross-join (1-row broadcast) into the audit row.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer")
    part = tables.load(spark, sf_dir, "part")

    # lineitem scanned ONCE: both FK checks ride the same pass. The
    # dim key projections are DISTINCT'd first — NOT EXISTS never
    # multiplies the outer row, but a left join against a dim with
    # duplicate keys would (the fuzz edge-case sweep caught exactly
    # that: a dirty dim inflated n_lineitem 804 vs 800). No
    # broadcast hints: Catalyst broadcasts small dims and falls back
    # to shuffled hash joins when the distinct'd PK side outgrows
    # the threshold (at 100 TB it will — a forced broadcast of
    # billions of keys OOMs).
    li_audit = (
        li.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .join(
            part.select("p_partkey").distinct(),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .agg(
            F.count("*").cast("long").alias("n_lineitem"),
            F.count(F.when(F.col("o_orderkey").isNull(), 1))
            .cast("long")
            .alias("orphan_lineitems"),
            F.count(F.when(F.col("p_partkey").isNull(), 1))
            .cast("long")
            .alias("orphan_part_refs"),
        )
    )
    ord_audit = (
        orders.select("o_custkey")
        .join(
            cust.select("c_custkey").distinct(),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count(F.when(F.col("c_custkey").isNull(), 1))
            .cast("long")
            .alias("orphan_orders"),
        )
    )
    return li_audit.crossJoin(F.broadcast(ord_audit)).select(
        "n_lineitem",
        "orphan_lineitems",
        "n_orders",
        "orphan_orders",
        "orphan_part_refs",
    )


@register(
    "w_share_of_day",
    oracle_cte()
    + """
    SELECT ticker, date, market_cap,
           floor(market_cap
                 / (sum(CAST(market_cap AS DECIMAL(28,4)))
                    OVER (PARTITION BY date))
                 * 1000000.0 + 0.5) / 1000000.0 AS cap_share
    FROM stocks
    """,
    survey="ratio-to-report window: each ticker's share of its date's total market cap — decimal-exact partition denominator, 6dp-rounded ratio (OLAP analytic extension)",
)
def q_w_share_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT: per-row share of the partition total. The
    denominator is a DECIMAL per-date aggregate (order-free exact, so
    any partitioning yields the identical double after one cast); the
    ratio is a single fixed-tree division rounded at 6dp, making the
    Spark and oracle values bit-equal.

    Scale: the old plan was a full-partition DECIMAL window sum,
    which buffers outside whole-stage codegen and measured 4.3x its
    baseline at sf0.1 (and only worsens at 100x). This plan computes
    the per-date total with a partial-aggregating, codegen'd
    ``groupBy("date")`` and broadcast-joins the (bounded: one row per
    calendar date) totals back — no window, no per-partition buffer,
    and the fact side never shuffles. The join is NULL-SAFE on date:
    a window's PARTITION BY groups NULL dates into one partition and
    emits those rows, and groupBy keeps a NULL group too — a plain
    (null-unsafe) equi-join would silently drop them on dirty data,
    the same divergence class the fuzz sweep caught in the RI audit."""
    s = tables.stocks(spark, sf_dir)
    totals = s.groupBy(F.col("date").alias("_d")).agg(
        F.sum(F.col("market_cap").cast("decimal(28,4)")).alias("_total")
    )
    return (
        s.join(
            F.broadcast(totals), F.col("date").eqNullSafe(F.col("_d"))
        )
        .select(
            "ticker",
            "date",
            "market_cap",
            rnd(F.col("market_cap") / F.col("_total"), 6).alias(
                "cap_share"
            ),
        )
    )


@register(
    "events_top_paths",
    """
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ), lagged AS (
        SELECT *,
               CASE WHEN ts_us - lag(ts_us) OVER (
                        PARTITION BY user_id
                        ORDER BY ts_us, event_id
                    ) > 600000000 OR lag(ts_us) OVER (
                        PARTITION BY user_id
                        ORDER BY ts_us, event_id
                    ) IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM e
    ), sess AS (
        SELECT *, sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess_id
        FROM lagged
    ), paths AS (
        SELECT user_id, sess_id,
               array_to_string(
                   list(event_type ORDER BY ts_us, event_id)[1:3],
                   '>') AS path
        FROM sess GROUP BY user_id, sess_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(row_number() OVER (ORDER BY count(*) DESC, path)
                AS INT) AS rank
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    survey="clickstream path analysis: batch sessionization (lag-gap + cumsum) and top session-opening event-type trigrams (engine extension)",
)
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: sessions cut at >10-minute gaps
    per user (the batch twin of the streaming session window:
    lag-gap flag, then a running sum as session id), each session
    reduced to its first three event types, ranked by frequency.

    Scale: one user-keyed shuffle for the lag/cumsum windows, one
    (user, session) aggregation whose per-group state is the
    bounded 3-slot path prefix (the collect_list is sliced after
    sort — sessions are gap-bounded so lists stay session-sized),
    TakeOrdered for the top-K, rank over K rows.
    """
    ev = tables.load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts")).cast("long")
    e = ev.select(
        "user_id", "event_id", "event_type", us.alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lagged = e.withColumn(
        "new_sess",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > 600_000_000,
            1,
        )
        .when(F.lag("ts_us").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = lagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    "ts_us", "event_id", "event_type"
                                )
                            )
                        ),
                        lambda s: s.getField("event_type"),
                    ),
                    1,
                    3,
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    top = counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(20)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.select(
        "path",
        "n_sessions",
        F.row_number().over(wr).cast("int").alias("rank"),
    )


@register(
    "w_max_drawdown",
    oracle_cte()
    + """
    , c AS (
        SELECT ticker, date,
               CAST(floor(share_price * 100 + 0.5) AS BIGINT) AS c
        FROM stocks
    ), dd AS (
        SELECT ticker, date, c,
               max(c) OVER (PARTITION BY ticker ORDER BY date
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS peak
        FROM c
    ), scored AS (
        SELECT ticker, date,
               CAST((peak - c) * 1000000 // peak AS BIGINT) AS dd_ppm
        FROM dd
    )
    SELECT ticker,
           CAST(max(dd_ppm) AS BIGINT) AS max_drawdown_ppm,
           min(CASE WHEN dd_ppm = (SELECT max(s2.dd_ppm)
                                   FROM scored s2
                                   WHERE s2.ticker = scored.ticker)
                    THEN date END) AS trough_date
    FROM scored GROUP BY ticker
    """,
    survey="max drawdown per ticker: running-peak window + integer ppm ratio, argmin-date tiebreak (financial analytic extension)",
)
def q_w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum peak-to-trough drawdown per ticker with the trough
    date (earliest date attaining it). All arithmetic is integer
    cents/ppm — `(peak - c) * 1e6 DIV peak` — so the ranking has no
    float boundary. One ticker-keyed shuffle: running-peak window,
    then a per-ticker aggregate that computes the max and its
    earliest date in a single pass (min-when over the max via a
    second window, not a correlated subquery)."""
    s = tables.stocks(spark, sf_dir)
    cents = F.floor(F.col("share_price") * 100 + F.lit(0.5)).cast(
        "long"
    )
    base = s.select("ticker", "date", cents.alias("_c"))
    wpeak = (
        Window.partitionBy("ticker")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        base.withColumn("_peak", F.max("_c").over(wpeak))
        .select(
            "ticker",
            "date",
            F.expr("(_peak - _c) * 1000000 DIV _peak")
            .cast("long")
            .alias("dd_ppm"),
        )
    )
    wmax = Window.partitionBy("ticker")
    return (
        scored.withColumn("_mx", F.max("dd_ppm").over(wmax))
        .groupBy("ticker")
        .agg(
            F.max("dd_ppm").cast("long").alias("max_drawdown_ppm"),
            F.min(
                F.when(F.col("dd_ppm") == F.col("_mx"), F.col("date"))
            ).alias("trough_date"),
        )
    )


@register(
    "w_longest_up_streak",
    oracle_cte()
    + """
    , c AS (
        SELECT ticker, date,
               CAST(floor(share_price * 100 + 0.5) AS BIGINT) AS c
        FROM stocks
    ), flags AS (
        SELECT ticker, date,
               CASE WHEN c > lag(c) OVER (PARTITION BY ticker
                                          ORDER BY date)
                    THEN 1 ELSE 0 END AS up
        FROM c
    ), grouped AS (
        SELECT ticker, date, up,
               sum(CASE WHEN up = 0 THEN 1 ELSE 0 END) OVER (
                   PARTITION BY ticker ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS streak_id
        FROM flags
    ), lengths AS (
        SELECT ticker, streak_id,
               CAST(sum(up) AS BIGINT) AS len,
               max(date) AS end_date
        FROM grouped GROUP BY ticker, streak_id
    ), ranked AS (
        SELECT ticker, len, end_date,
               row_number() OVER (PARTITION BY ticker
                                  ORDER BY len DESC, end_date)
                   AS rn
        FROM lengths
    )
    SELECT ticker, len AS longest_up_streak, end_date
    FROM ranked WHERE rn = 1
    """,
    survey="gaps-and-islands: longest consecutive up-day streak per ticker via boundary-cumsum grouping (window analytic extension)",
)
def q_w_longest_up_streak(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Longest run of consecutive up-days per ticker (the classic
    gaps-and-islands shape): an up flag from lag comparison, a
    boundary cumsum as the island id (increments at every non-up
    row, so each island holds one run), per-island up-count, then
    argmax per ticker (length desc, earliest end date tiebreak).
    Integer cents comparisons throughout; a single ticker-keyed
    shuffle feeds every window and the island aggregation."""
    s = tables.stocks(spark, sf_dir)
    cents = F.floor(F.col("share_price") * 100 + F.lit(0.5)).cast(
        "long"
    )
    base = s.select("ticker", "date", cents.alias("_c"))
    wo = Window.partitionBy("ticker").orderBy("date")
    flags = base.select(
        "ticker",
        "date",
        F.when(F.col("_c") > F.lag("_c").over(wo), 1)
        .otherwise(0)
        .alias("up"),
    )
    grouped = flags.withColumn(
        "streak_id",
        F.sum(F.when(F.col("up") == 0, 1).otherwise(0)).over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    lengths = grouped.groupBy("ticker", "streak_id").agg(
        F.sum("up").cast("long").alias("len"),
        F.max("date").alias("end_date"),
    )
    wr = Window.partitionBy("ticker").orderBy(
        F.desc("len"), F.asc("end_date")
    )
    return (
        lengths.withColumn("rn", F.row_number().over(wr))
        .filter("rn = 1")
        .select(
            "ticker",
            F.col("len").alias("longest_up_streak"),
            "end_date",
        )
    )


@register(
    "events_hll_intersection",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'error'),
    u AS (SELECT user_id FROM a UNION SELECT user_id FROM b),
    i AS (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_click_users,
        (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_error_users,
        (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_union_exact,
        (SELECT CAST(count(*) AS BIGINT) FROM i)
            AS n_intersect_exact,
        TRUE AS est_ok
    """,
    survey="sketch set algebra: HLL inclusion-exclusion intersection estimate, union-relative tolerance vs exact (approx extension)",
)
def q_events_hll_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate audience overlap (|click users ∩ error users|)
    from three HLL sketches via inclusion-exclusion:
    est∩ = est(A) + est(B) - est(A∪B). The union sketch here is
    built over the combined stream, which has the identical
    registers `hll_union_agg` over the two persisted side sketches
    would have — the set-algebra trick that answers overlap
    questions from PERSISTED per-segment sketches without
    re-scanning raw data.

    Tolerance contract (cf. events_hll_cascade): the estimate's
    error is a sum of three union-scale HLL errors, so est_ok
    asserts |est∩ - exact∩| <= 5% of the EXACT UNION size (the
    honest bound — intersection-relative error is unbounded when
    the overlap is small), and the exact counts hash-match.
    """
    # ONE scan, TWO aggregates, NO distinct rewrites: roll up to
    # per-user membership flags (groupBy user_id, map-side combine),
    # then a single global aggregate emits the summary row — which
    # a global agg does even on EMPTY input, where the old
    # grouped-then-filtered shape returned no rows (shape fuzzer)
    # and also silently returned empty whenever either segment had
    # zero events. The exact intersection count rides the same
    # rollup (is_click AND is_error), replacing a separate
    # distinct+intersect branch; the sketches see each user once,
    # which leaves HLL registers identical to sketching the raw
    # stream. countDistinct is deliberately avoided: three distinct
    # aggregates trigger the Expand-based rewrite whose empty-input
    # defaults leak NULL through any projection above the agg.
    # coalesce: sum/sketch-estimate over zero rows are NULL, and
    # the inclusion-exclusion arithmetic needs additive identities.
    ev = tables.load_events(spark, sf_dir)
    per_user = (
        ev.filter(F.col("event_type").isin("click", "error"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "click").alias("is_click"),
            F.max(F.col("event_type") == "error").alias("is_error"),
        )
    )
    zero = F.lit(0).cast("long")
    row = per_user.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(F.col("is_click"), F.col("user_id"))
            )
        ).alias("est_a"),
        F.sum(F.col("is_click").cast("long")).alias("n_click_users"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(F.col("is_error"), F.col("user_id"))
            )
        ).alias("est_b"),
        F.sum(F.col("is_error").cast("long")).alias("n_error_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "est_u"
        ),
        F.count("*").cast("long").alias("n_union_exact"),
        F.sum(
            (F.col("is_click") & F.col("is_error")).cast("long")
        ).alias("n_intersect_exact"),
    )
    est_i = (
        F.coalesce("est_a", zero)
        + F.coalesce("est_b", zero)
        - F.coalesce("est_u", zero)
    )
    return row.select(
        F.coalesce("n_click_users", zero).alias("n_click_users"),
        F.coalesce("n_error_users", zero).alias("n_error_users"),
        "n_union_exact",
        F.coalesce("n_intersect_exact", zero).alias(
            "n_intersect_exact"
        ),
        (
            F.abs(est_i - F.coalesce("n_intersect_exact", zero))
            <= 0.05 * F.col("n_union_exact")
        ).alias("est_ok"),
    )


# ----------------------------------------------------------------------
# CUSUM changepoint over daily event volumes (operators/changepoint.py)
# ----------------------------------------------------------------------


from .operators.changepoint import (  # noqa: E402
    cusum_changepoint,
    cusum_oracle_sql,
)


@register(
    "events_cusum_changepoint",
    cusum_oracle_sql(),
    survey="offline CUSUM level-shift changepoint per event type: integer-scaled cumulative deviation n*P_t - t*T over daily counts, argmax day + ppm magnitude (event analytics extension)",
)
def q_events_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily (type, day) counts reduce the fact table map-side;
    every window after that runs over calendar-length per-type
    series. DECIMAL(38,0) products, BIGINT outputs
    (operators/changepoint.py)."""
    ev = tables.load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").cast("long").alias("n_events"))
    return cusum_changepoint(daily)


from .operators.attribution import (  # noqa: E402
    attribution_oracle_sql,
    last_touch_attribution,
)


@register(
    "events_attribution_last_touch",
    attribution_oracle_sql(),
    survey="last-touch marketing attribution: each purchase credited to the latest strictly-preceding view/click within a 7-day lookback (else 'organic'), via the zero-join union+window as-of pattern; cents-quantized revenue and ppm shares (event analytics extension)",
)
def q_events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One union frame, one user-keyed window carrying the latest
    touch onto purchases (strict < encoded in the sort key), one
    channel-grain report aggregate (operators/attribution.py)."""
    return last_touch_attribution(tables.load_events(spark, sf_dir))
