"""Cross-engine unicode parity: the shipped testdata is pure ASCII,
so multibyte behavior (CJK, emoji with surrogate pairs, combining
accents, RTL) of the text stack is otherwise untested — and string
LENGTH, regex classes, and split semantics are exactly where JVM
and DuckDB implementations could disagree. This runs the REAL
registry queries and their REAL oracles over a synthetic multilingual
corpus written to parquet."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from marketviz_spark.registry import QUERIES

DOCS = [
    (1, "héllo wörld héllo wörld", "de", "src0"),
    (2, "日本語 の テキスト 処理 日本語", "zh", "src1"),
    (3, "مرحبا بالعالم مرحبا", "en", "src0"),          # RTL Arabic
    (4, "emoji 🙂 mix 🙂🙂 done", "en", "src2"),        # surrogate pairs
    (5, "étude combining étude", "fr", "src1"),  # é as e+◌́
    (6, "ASCII only control case", "en", "src0"),
    (7, "日本語 の テキスト 処理 日本語", "zh", "src1"),   # exact dup of 2
]

UNICODE_SAFE_QUERIES = [
    "text_stats",
    "text_token_bpe",
    "text_fingerprints",
    "dedup_exact",
    "dedup_minhash_signatures",
    "bpe_merge_pairs",
    "vocab_topk",
    "text_rarity",
]


@pytest.fixture(scope="module")
def uni_dir(spark):
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(
            [(i, t, l, s, len(t)) for i, t, l, s in DOCS],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        # single file so DuckDB's view glob matches the layout the
        # oracle CTEs expect
        df.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
        yield d


@pytest.mark.parametrize("name", UNICODE_SAFE_QUERIES)
def test_unicode_parity(spark, uni_dir, name):
    from tests.oracle_check import compare

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{uni_dir}/documents.parquet'"
    )
    qd = QUERIES[name]
    problems = compare(
        qd.fn(spark, uni_dir), con, qd.oracle, name
    )
    assert problems == [], problems


NULL_DOCS = [
    (1, None, "en", "src0"),           # NULL text
    (2, "", "en", "src0"),             # empty text
    (3, "   ", "en", "src1"),          # whitespace only
    (4, "real words here", "en", "src1"),
]


@pytest.fixture(scope="module")
def null_dir(spark):
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(
            [
                (i, t, l, s, len(t) if t is not None else 0)
                for i, t, l, s in NULL_DOCS
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        df.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
        yield d


@pytest.mark.parametrize(
    "name",
    ["text_stats", "text_token_bpe", "dedup_exact", "vocab_topk"],
)
def test_null_and_empty_text_parity(spark, null_dir, name):
    """NULL / empty / whitespace-only text must flow through the
    text stack with DEFINED, engine-identical behavior (dropped or
    zeroed the same way on both engines) — the rows a real crawl
    corpus always contains."""
    from tests.oracle_check import compare

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{null_dir}/documents.parquet'"
    )
    qd = QUERIES[name]
    problems = compare(
        qd.fn(spark, null_dir), con, qd.oracle, name
    )
    assert problems == [], problems


def test_degenerate_corpus_crashes_nothing(spark, null_dir):
    """Regression sweep: EVERY documents-family registry query must
    execute (possibly to an empty result) on a corpus of
    NULL/empty/whitespace-only documents — the ANSI divide-by-zero
    class of bug text_stats had. Embeddings-dependent queries get a
    tiny embeddings table alongside."""
    import numpy as np
    import pandas as pd

    emb = pd.DataFrame(
        {
            "vec_id": [1, 2],
            "embedding": [
                np.array([1.0, 0.0], dtype="float32"),
                np.array([0.0, 1.0], dtype="float32"),
            ],
            "label": np.array([0, 1], dtype="int32"),
        }
    )
    emb.to_parquet(os.path.join(null_dir, "embeddings.parquet"))
    prefixes = (
        "text_", "dedup_", "curation", "sample_", "split_",
        "vocab", "pii_", "pack_", "corpus_", "mixture", "oov",
        "doc_", "boilerplate", "token_", "langid", "jaccard",
        "bpe_", "chunk_", "curriculum",
    )
    from concurrent.futures import ThreadPoolExecutor

    def probe(item):
        name, qd = item
        try:
            # noop write, NOT .count(): count lets Catalyst prune
            # the projection, hiding exactly the ANSI
            # divide-by-zero class this sweep exists to catch
            qd.fn(spark, null_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:  # noqa: BLE001
            return (name, str(e).splitlines()[0][:100])
        return None

    # fanned over driver threads (guide §2.6): per-query job latency
    # dominates on a 6-row corpus; coverage/assertions unchanged
    with ThreadPoolExecutor(max_workers=4) as ex:
        failures = [
            r
            for r in ex.map(
                probe,
                (
                    (n, q)
                    for n, q in QUERIES.items()
                    if n.startswith(prefixes)
                ),
            )
            if r
        ]
    assert failures == [], failures


def test_events_family_survives_empty_and_single_event(spark):
    """Quiet-hour regression: every events-family query must execute
    on (a) a properly-typed EMPTY events table and (b) a single-
    event table — the window/lag/ratio edge cases a fresh deployment
    hits on day one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    single = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1704103200000000], pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array([None], pa.string()),
        },
        schema=schema,
    )
    for label, table in (
        (
            "empty",
            pa.table(
                {f.name: pa.array([], f.type) for f in schema},
                schema=schema,
            ),
        ),
        ("single", single),
    ):
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(
                table, os.path.join(d, "events.parquet")
            )
            from concurrent.futures import ThreadPoolExecutor

            def probe(item, _d=d, _label=label):
                name, qd = item
                try:
                    qd.fn(spark, _d).write.mode(
                        "overwrite"
                    ).format("noop").save()
                except Exception as e:  # noqa: BLE001
                    return (
                        _label, name, str(e).splitlines()[0][:100]
                    )
                return None

            # fanned over driver threads (guide §2.6); coverage
            # and assertions unchanged
            with ThreadPoolExecutor(max_workers=4) as ex:
                failures = [
                    r
                    for r in ex.map(
                        probe,
                        (
                            (n, q)
                            for n, q in QUERIES.items()
                            if n.startswith("events_")
                        ),
                    )
                    if r
                ]
            assert failures == [], failures
