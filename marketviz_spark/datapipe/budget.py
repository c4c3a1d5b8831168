"""Per-source retention budgets: domain-frequency caps and
token-budget prefix selection.

Large-corpus pipelines (CCNet-style) bound how much any one
source/domain may contribute to the training mix — both by document
count ("no domain exceeds N docs") and by token budget ("take the
best documents from each source until its token allowance is
spent"). The reference has no counterpart (it is a market-data app);
these extend the repo's curation family (mixture_*, sample_*,
curation_apply) with the two standard per-source bounding rules.

Scale notes (100 TB):
- Both operators window `partitionBy(source)`: parallelism equals the
  number of sources, and each group is processed stream-wise within
  its partition. The doc-count cap uses `row_number` + rank-filter,
  which Spark >=3.3 rewrites to WindowGroupLimit — each map task
  pre-truncates to the cap BEFORE the shuffle, so a billion-doc hot
  domain ships only `cap` rows per map task, not its whole history.
- The token-budget prefix needs a running sum, which has no group-
  limit rewrite. Its cumsum runs the shared two-phase
  range-partitioned path (operators/ranks.py grouped_prefix_sum):
  range-split on the unique (source, n_chars desc, doc_id)
  composite — a hot source larger than one partition spans several
  contiguous partitions, each summed in parallel and stitched by a
  broadcast per-(source, partition) offset table — so no source
  ever funnels through a single task, and the result is
  bit-identical to the per-source window sum it replaced.
- All arithmetic is BIGINT (counts, sums, ppm shares) so the DuckDB
  oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.ranks import grouped_prefix_sum
from .textstats import tokens

# Keep at most this many documents per source (quality-ranked).
DOMAIN_CAP = 15
# Per-source whitespace-token allowance for the prefix selection.
TOKEN_BUDGET = 800

# Quality ordering shared by both operators: longer documents first
# (n_chars is the stored quality proxy), doc_id as the total-order
# tiebreak so both engines rank identically.
_ORDER = lambda: (F.col("n_chars").desc(), F.col("doc_id").asc())  # noqa: E731


def domain_cap_report(docs: DataFrame, cap: int = DOMAIN_CAP) -> DataFrame:
    """Per-source doc-count cap: keep the `cap` best documents of
    each source, report kept/dropped counts and a checksum of the
    kept set (sum of kept doc_ids + kept chars) that pins the exact
    ranking, not just the counts.

    Deliberately NOT one window over every row: ranking all docs
    just to count the dropped ones would force a full per-source
    sort of the corpus. Instead the kept side is a rank-FILTER
    (rewritten to WindowGroupLimit — each map task pre-truncates to
    `cap` rows, so a billion-doc domain ships `cap` rows per task,
    not its history) and the totals are a plain hash aggregate (no
    sort at all); the two per-source frames are then joined —
    both have one row per source, negligible at any scale.
    """
    base = docs.select("doc_id", "source", "n_chars")
    totals = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = Window.partitionBy("source").orderBy(*_ORDER())
    kept = (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("kept_docid_sum"),
            F.sum("n_chars").cast("long").alias("kept_chars_sum"),
        )
    )
    return (
        totals.join(kept, "source")
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept"))
            .cast("long")
            .alias("n_dropped"),
            "kept_docid_sum",
            "kept_chars_sum",
        )
        .orderBy("source")
    )


def domain_cap_oracle_sql(cap: int = DOMAIN_CAP) -> str:
    return f"""
WITH ranked AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rk
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rk <= {cap} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(sum(CASE WHEN rk > {cap} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
       CAST(sum(CASE WHEN rk <= {cap} THEN doc_id END) AS BIGINT)
           AS kept_docid_sum,
       CAST(sum(CASE WHEN rk <= {cap} THEN n_chars END) AS BIGINT)
           AS kept_chars_sum
FROM ranked GROUP BY source"""


def token_budget_prefix(
    docs: DataFrame, budget: int = TOKEN_BUDGET
) -> DataFrame:
    """Per-source token-budget prefix: walk each source's documents
    in quality order, selecting while the running whitespace-token
    total stays within `budget` (a document that would overflow the
    allowance is excluded, as is everything after it — a prefix, not
    a knapsack, so the selection is deterministic and order-stable).

    Report per source: docs/tokens selected, a doc_id checksum of
    the selected prefix, and the integer-ppm budget utilization.
    """
    toked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(tokens()).cast("long").alias("n_tok"),
    )
    cum = grouped_prefix_sum(
        toked, ["source"], list(_ORDER()), "n_tok", "cum_tok"
    )
    sel = F.col("cum_tok") <= budget
    return (
        cum.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(sel.cast("long")).alias("n_selected"),
            F.coalesce(
                F.sum(F.when(sel, F.col("n_tok"))), F.lit(0)
            )
            .cast("long")
            .alias("tokens_selected"),
            F.coalesce(
                F.sum(F.when(sel, F.col("doc_id"))), F.lit(0)
            )
            .cast("long")
            .alias("sel_docid_sum"),
        )
        .withColumn(
            "budget_used_ppm",
            F.expr(f"tokens_selected * 1000000 div {budget}").cast(
                "long"
            ),
        )
        .orderBy("source")
    )


def token_budget_oracle_sql(budget: int = TOKEN_BUDGET) -> str:
    return f"""
WITH toked AS (
    SELECT doc_id, source, n_chars,
           CAST(len(list_filter(string_split(text, ' '),
                                x -> x <> '')) AS BIGINT) AS n_tok
    FROM documents
), cum AS (
    SELECT doc_id, source, n_tok,
           sum(n_tok) OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tok
    FROM toked
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cum_tok <= {budget} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_selected,
       CAST(coalesce(sum(CASE WHEN cum_tok <= {budget}
                              THEN n_tok END), 0) AS BIGINT)
           AS tokens_selected,
       CAST(coalesce(sum(CASE WHEN cum_tok <= {budget}
                              THEN doc_id END), 0) AS BIGINT)
           AS sel_docid_sum,
       CAST(CAST(coalesce(sum(CASE WHEN cum_tok <= {budget}
                                   THEN n_tok END), 0) AS BIGINT)
            * 1000000 // {budget} AS BIGINT) AS budget_used_ppm
FROM cum GROUP BY source"""
