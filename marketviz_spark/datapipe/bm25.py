"""Lexical retrieval: BM25 top-k — the keyword sibling of the
embedding ANN family (brute/LSH/IVF/PQ score vectors; this scores
terms). Robertson et al., TREC-3 (Okapi BM25).

    score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

Cross-engine exactness: every factor is INTEGER arithmetic.
- k1=6/5 and b=3/4 are rationals; clearing denominators (×20·S,
  S = Σ dl) turns the saturation into
      sat_ppm = (22·tf·S·10⁶) div (10·S·tf + 3·S + 9·dl·N)
  — one BIGINT division, identical under Spark `div` / DuckDB `//`.
- idf uses the LOG-FREE Robertson ratio
      idf_ppm = ((2(N−df)+1)·10⁶) div (2·df+1)
  because `ln` is the one factor whose last bit an engine pair may
  disagree on; in production swap ln-idf back in — the plan is
  unchanged, only this literal expression. (exp/ln avoidance is the
  same contract as numerics.rnd.)
- term score = (idf_ppm · sat_ppm) div 10⁶; doc score = Σ terms.
  Overflow margin: needs 22·tf·S·10⁶ < 2⁶³, i.e. S·tf < 4·10¹¹ —
  fine to ~10 billion tokens; beyond that rescale to per-mille or
  lift into decimal(38,0) (same plan).

Scale shape (the 100-TB story):
- NO inverted index is materialized: the query-term filter is
  applied to the exploded token stream MAP-SIDE, before the first
  shuffle, so the postings that move are only the query terms'.
- dl rides along from the same projection that explodes (one scan).
- Corpus stats (N, S) are one partial-agg'd 1-row broadcast; df per
  query term is a tiny broadcast; queries are a literal table.
- Wide stages: groupBy(doc,term) for tf, groupBy(query,doc) for the
  score sum, and the per-query top-k window — all partial-agg'd,
  all keyed by (query, doc)-grain keys that cannot hot-spot more
  than a term's posting list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import tokens

BM25_TOPK = 10
# (query_id, distinct terms) — a literal probe set, VALUES on both
# engines. Terms deliberately span common corpus vocabulary.
BM25_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["hash", "join"]),
    (2, ["window", "agg", "stream"]),
    (3, ["vector", "scan", "slow", "fast"]),
]
_ALL_TERMS = sorted({t for _, ts in BM25_QUERIES for t in ts})


def bm25_topk(docs: DataFrame, k: int = BM25_TOPK) -> DataFrame:
    """(query_id, doc_id, score_ppm, rank) — BM25 top-k per query.

    See module docstring for the exact integer arithmetic and the
    plan shape. Ties: higher score first, then smaller doc_id.
    """
    spark = docs.sparkSession
    with_dl = docs.select(
        "doc_id", tokens().alias("t")
    ).select("doc_id", "t", F.size("t").cast("long").alias("dl"))

    # 1-row corpus stats: N docs, S total tokens (broadcast).
    stats = with_dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("s_tokens"),
    )

    # Postings for QUERY TERMS ONLY: the isin filter runs in the
    # same map stage as the explode — nothing else ever shuffles.
    postings = (
        with_dl.select(
            "doc_id", "dl", F.explode("t").alias("term")
        )
        .filter(F.col("term").isin(_ALL_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"), F.first("dl").alias("dl"))
    )

    df_per_term = postings.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )

    queries = spark.createDataFrame(
        [(qid, t) for qid, ts in BM25_QUERIES for t in ts],
        "query_id int, term string",
    )

    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(queries), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                "((2 * (n_docs - df) + 1) * 1000000) div (2 * df + 1)"
            ).alias("idf_ppm"),
            F.expr(
                "(22 * tf * s_tokens * 1000000)"
                " div (10 * s_tokens * tf + 3 * s_tokens"
                "      + 9 * dl * n_docs)"
            ).alias("sat_ppm"),
        )
        .select(
            "query_id",
            "doc_id",
            F.expr("(idf_ppm * sat_ppm) div 1000000").alias("term_ppm"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_ppm").cast("long").alias("score_ppm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "score_ppm",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_oracle_sql(k: int = BM25_TOPK) -> str:
    """DuckDB twin, from the same constants."""
    terms_sql = ", ".join(f"'{t}'" for t in _ALL_TERMS)
    queries_sql = ", ".join(
        f"({qid}, '{t}')" for qid, ts in BM25_QUERIES for t in ts
    )
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), with_dl AS (
    SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM toks
), stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS BIGINT) AS s_tokens
    FROM with_dl
), postings AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
    FROM (SELECT doc_id, dl, unnest(t) AS term FROM with_dl)
    WHERE term IN ({terms_sql})
    GROUP BY doc_id, term
), df_per_term AS (
    SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM postings GROUP BY term
), queries(query_id, term) AS (
    SELECT CAST(query_id AS INT), term
    FROM (VALUES {queries_sql}) v(query_id, term)
), scored AS (
    SELECT query_id, doc_id,
           CAST(sum((((2 * (n_docs - df) + 1) * 1000000) // (2 * df + 1)
                     * ((22 * tf * s_tokens * 1000000)
                        // (10 * s_tokens * tf + 3 * s_tokens
                            + 9 * dl * n_docs))) // 1000000)
                AS BIGINT) AS score_ppm
    FROM postings
    JOIN df_per_term USING (term)
    JOIN queries USING (term)
    CROSS JOIN stats
    GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, score_ppm, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id
          ORDER BY score_ppm DESC, doc_id) AS rank
      FROM scored)
WHERE rank <= {k}"""


# Phrase queries: exact n-gram matches, lengths 2 and 3. A phrase
# of length n is matched against the map-side n-gram stream (the
# same construction as the dedup shingles), so there is NO
# positional-postings join at all: the filter on the literal phrase
# set runs inside the explode stage and the only shuffle is the
# final per-phrase rollup — at 100 TB the bytes that move are the
# matching n-grams only.
PHRASE_QUERIES: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "window agg"),
    (3, "fast table scan"),
    (4, "key value"),
]


def phrase_match(docs: DataFrame) -> DataFrame:
    """(phrase_id, phrase, n_docs, n_occurrences) for EVERY literal
    phrase — exact consecutive-token matches; a phrase with no
    matches reports zeros (left join from the phrase table, so the
    4-row output contract holds on any corpus). n-grams come from
    dedup.gram_array (one construction, one set of short-doc /
    CSE guards)."""
    from .dedup import gram_array

    lens = sorted({len(p.split()) for _, p in PHRASE_QUERIES})
    toks = docs.select("doc_id", tokens().alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(*[gram_array(F.col("t"), n) for n in lens])
        ).alias("gram"),
    ).filter(F.col("gram").isin([p for _, p in PHRASE_QUERIES]))
    spark = docs.sparkSession
    phrases = spark.createDataFrame(
        PHRASE_QUERIES, "phrase_id int, phrase string"
    )
    hits = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_occurrences"),
    )
    return phrases.join(
        hits, phrases["phrase"] == hits["gram"], "left"
    ).select(
        "phrase_id",
        "phrase",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce("n_occurrences", F.lit(0))
        .cast("long")
        .alias("n_occurrences"),
    )


def phrase_match_oracle_sql() -> str:
    lens = sorted({len(p.split()) for _, p in PHRASE_QUERIES})
    phrase_rows = ", ".join(
        f"({pid}, '{p}')" for pid, p in PHRASE_QUERIES
    )

    def gram_cte(n: int) -> str:
        parts = " || ' ' || ".join(
            f"t[i + {j}]" for j in range(n)
        )
        return (
            f"SELECT doc_id, unnest(list_transform("
            f"generate_series(1, len(t) - {n - 1}),"
            f" i -> {parts})) AS gram FROM toks"
            f" WHERE len(t) >= {n}"
        )

    grams = "\n    UNION ALL\n    ".join(gram_cte(n) for n in lens)
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), grams AS (
    {grams}
), phrases(phrase_id, phrase) AS (
    SELECT CAST(phrase_id AS INT), phrase
    FROM (VALUES {phrase_rows}) v(phrase_id, phrase)
), hits AS (
    SELECT gram,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM grams
    WHERE gram IN (SELECT phrase FROM phrases)
    GROUP BY gram
)
SELECT phrase_id, phrase,
       CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(n_occurrences, 0) AS BIGINT) AS n_occurrences
FROM phrases LEFT JOIN hits ON gram = phrase"""
