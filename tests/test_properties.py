"""Property-based invariants (SURVEY §5.2d): results must be
independent of row order / partitioning, and upsert idempotent —
the properties that break first when an operator silently depends on
partition-local state."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

price = st.floats(
    min_value=1.0, max_value=1e5, allow_nan=False, allow_infinity=False
)


@st.composite
def stock_rows(draw):
    n_tickers = draw(st.integers(2, 6))
    n_dates = draw(st.integers(1, 4))
    rows = []
    for t in range(n_tickers):
        for d in range(n_dates):
            p = draw(price)
            rows.append(
                (f"T{t:02d}", f"2024-01-{d + 1:02d}", round(p, 2),
                 round(p, 2) * 1000.0, 1000.0)
            )
    return rows


@given(rows=stock_rows(), seed=st.integers(0, 3))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_index_invariant_under_row_order(spark, rows, seed):
    """Same stocks set, shuffled input order and partitioning ->
    byte-identical index (value AND composition string)."""
    import random

    from marketviz_spark.pipelines.index import compute_index

    schema = (
        "ticker string, date string, share_price double, "
        "market_cap double, effective_shares_outstanding double"
    )
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    a = compute_index(
        spark.createDataFrame(rows, schema).repartition(1), k=3
    ).collect()
    b = compute_index(
        spark.createDataFrame(shuffled, schema).repartition(7), k=3
    ).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


@given(rows=stock_rows())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_upsert_idempotent_property(spark, rows):
    from marketviz_spark.operators.joins import upsert

    schema = (
        "ticker string, date string, share_price double, "
        "market_cap double, effective_shares_outstanding double"
    )
    df = spark.createDataFrame(rows, schema)
    new = df.limit(max(1, len(rows) // 2))
    once = upsert(df, new, ["ticker", "date"])
    twice = upsert(once, new, ["ticker", "date"])
    assert sorted(map(str, once.collect())) == sorted(
        map(str, twice.collect())
    )


@st.composite
def doc_rows(draw):
    n = draw(st.integers(3, 12))
    rows = []
    for i in range(n):
        n_tok = draw(st.integers(0, 9))
        words = [
            draw(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]))
            for _ in range(n_tok)
        ]
        src = draw(st.sampled_from(["src0", "src1", "srcZ"]))
        rows.append((i, " ".join(words), "en", src, n_tok))
    return rows


_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@given(rows=doc_rows(), seed=st.integers(0, 3))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_sequences_invariant_under_row_order(spark, rows, seed):
    """Packing is a function of (doc_id, n_tokens) only: shuffled
    input order / partitioning yields identical bins, streams stay
    contiguous, and token totals are conserved per bucket."""
    import random

    from marketviz_spark.datapipe.curation import (
        PACK_BUDGET,
        pack_sequences,
    )

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    a = sorted(
        map(
            tuple,
            pack_sequences(
                spark.createDataFrame(rows, _DOC_SCHEMA)
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(
                spark.createDataFrame(shuffled, _DOC_SCHEMA).repartition(5)
            ).collect(),
        )
    )
    assert a == b
    # conservation + contiguity per bucket
    streams = {}
    for doc_id, bucket, n_tok, start, b_first, b_last, n_bins in a:
        streams.setdefault(bucket, []).append((start, n_tok, b_first, b_last))
    for parts in streams.values():
        off = 0
        for start, n_tok, b_first, b_last in sorted(parts):
            assert start == off
            assert b_first == start // PACK_BUDGET
            assert b_last == (start + n_tok - 1) // PACK_BUDGET
            off += n_tok


@given(rows=doc_rows())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_funnel_conserves_documents(spark, rows):
    """The funnel's per-source counts always partition the corpus:
    0 <= each stage count <= n_docs, kept <= sampled survivors, and
    n_docs sums to the non-eval document count."""
    from marketviz_spark.datapipe.curation import (
        EVAL_MOD,
        curation_funnel,
    )

    docs = spark.createDataFrame(rows, _DOC_SCHEMA)
    out = curation_funnel(docs).collect()
    n_corpus = sum(1 for r in rows if r[0] % EVAL_MOD != 0)
    assert sum(r["n_docs"] for r in out) == n_corpus
    for r in out:
        for c in ("n_repetitive", "n_contaminated", "n_sampled_out", "n_kept"):
            assert 0 <= r[c] <= r["n_docs"]
        assert r["n_kept"] <= r["n_docs"] - r["n_sampled_out"]


word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


@st.composite
def doc_rows(draw):
    n = draw(st.integers(2, 8))
    return [
        (i, " ".join(draw(st.lists(word, min_size=0, max_size=12))))
        for i in range(n)
    ]


def _mk_docs(spark, rows, parts=1):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).repartition(parts)


@given(rows=doc_rows(), seed=st.integers(0, 3))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_substring_spans_invariant_under_partitioning(spark, rows, seed):
    """The duplicated-span report is independent of row order and
    partitioning (pure grouped aggregation — no partition-local
    state), on arbitrary short documents."""
    import random

    from marketviz_spark.datapipe.dedup import substring_dup_spans

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    a = substring_dup_spans(_mk_docs(spark, rows, 1), k=4, stride=2).collect()
    b = substring_dup_spans(
        _mk_docs(spark, shuffled, 5), k=4, stride=2
    ).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


@given(rows=doc_rows())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_assign_deterministic_and_complete(spark, rows):
    """Split assignment re-run twice is identical (no rand()), every
    doc appears exactly once, and the split name always matches the
    percentile band."""
    from marketviz_spark.datapipe.curation import (
        TRAIN_PCT,
        VAL_PCT,
        split_assign,
    )

    docs = _mk_docs(spark, rows, 3)
    a = {r["doc_id"]: r for r in split_assign(docs).collect()}
    b = {r["doc_id"]: r for r in split_assign(docs).collect()}
    assert {k: str(v) for k, v in a.items()} == {
        k: str(v) for k, v in b.items()
    }
    assert set(a) == {i for i, _ in rows}
    for r in a.values():
        band = (
            "train"
            if r["split_pct"] < TRAIN_PCT
            else ("val" if r["split_pct"] < VAL_PCT else "test")
        )
        assert r["split"] == band


@given(rows=doc_rows(), cap=st.integers(1, 4))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_refused_and_paired_shingles_partition_cleanly(spark, rows, cap):
    """For ANY corpus and cap: a shingle is either pairable (df <=
    cap) or reported by shingle_overflow_keys (df > cap) — never
    both, never neither. The refuse and report paths must partition
    the shingle space exactly."""
    from marketviz_spark.datapipe.dedup import (
        _rare_shingles,
        shingle_overflow_keys,
        shingles,
    )

    docs = _mk_docs(spark, rows, 2)
    all_sh = {
        r["shingle"] for r in shingles(docs, 2).select("shingle").collect()
    }
    kept = {
        r["shingle"]
        for r in _rare_shingles(shingles(docs, 2), cap)
        .select("shingle")
        .collect()
    }
    refused = {
        r["shingle"]
        for r in shingle_overflow_keys(docs, n=2, df_cap=cap).collect()
    }
    assert kept | refused == all_sh
    assert kept & refused == set()


@st.composite
def corpus_rows(draw):
    n_sources = draw(st.integers(2, 4))
    rows = []
    doc_id = 0
    for s in range(n_sources):
        for _ in range(draw(st.integers(1, 6))):
            n_tok = draw(st.integers(1, 30))
            words = [
                f"w{draw(st.integers(0, 9))}" for _ in range(n_tok)
            ]
            rows.append((doc_id, " ".join(words), f"s{s}"))
            doc_id += 1
    return rows


@given(rows=corpus_rows())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mixture_apply_budget_invariants(spark, rows):
    """For ANY corpus: per-source kept tokens never exceed the
    scarcest source's inventory; the scarcest source keeps every
    document; output is a subset of the input; re-run is identical
    (no rand())."""
    from marketviz_spark.datapipe.curation import mixture_apply

    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    inv = {}
    for _i, t, s in rows:
        inv[s] = inv.get(s, 0) + len(t.split())
    min_inv = min(inv.values())
    out = mixture_apply(docs).collect()
    per_src: dict[str, int] = {}
    for r in out:
        per_src[r["source"]] = per_src.get(r["source"], 0) + r["n_tokens"]
    for s, kept in per_src.items():
        assert kept <= min_inv, (s, kept, min_inv)
    scarcest = min(inv, key=lambda s: inv[s])
    n_docs_scarcest = sum(1 for _i, _t, s in rows if s == scarcest)
    assert (
        sum(1 for r in out if r["source"] == scarcest) == n_docs_scarcest
    )
    again = mixture_apply(docs).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


@given(rows=corpus_rows())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_boilerplate_doubled_corpus_fully_flagged(spark, rows):
    """Duplicating EVERY document (fresh ids) makes every chunk
    fingerprint appear in >=2 docs, so with min_docs=2 every doc
    scores boiler_ppm == 1e6 — and ppm is always in [0, 1e6]."""
    from marketviz_spark.datapipe.curation import boilerplate_chunks

    base = [(i, t, "en", s, len(t)) for i, t, s in rows]
    doubled = base + [
        (10_000 + i, t, lang, s, n) for i, t, lang, s, n in base
    ]
    docs = spark.createDataFrame(
        doubled,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = boilerplate_chunks(docs).collect()
    assert len(out) == len(doubled)  # every doc has >=1 chunk (>=1 token)
    for r in out:
        assert r["boiler_ppm"] == 1_000_000, r


@st.composite
def event_rows(draw):
    n = draw(st.integers(3, 24))
    rows = []
    for i in range(n):
        rows.append(
            (
                i + 1,
                f"2024-01-01 {draw(st.integers(0, 23)):02d}:"
                f"{draw(st.integers(0, 59)):02d}:00",
                draw(st.integers(1, 4)),
                draw(st.sampled_from(["click", "error", "view"])),
                float(draw(st.integers(1, 100))),
            )
        )
    return rows


@given(rows=event_rows())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_equals_interval_join_formulation(spark, rows):
    """The zero-join as-of operator must equal the naive
    join-then-argmax formulation: for each error, the click with the
    greatest (ts, event_id) at-or-before it per user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from marketviz_spark.operators.joins import asof_prev_event

    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long,"
        " event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))

    got = {
        r["left_id"]: (r["prev_value"], r["gap_us"])
        for r in asof_prev_event(ev).collect()
    }

    e = ev.filter("event_type = 'error'").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("ets"),
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
        F.col("value").alias("cval"),
    )
    j = e.join(
        c,
        (e["u"] == c["u"])
        & (
            (c["cts"] < e["ets"])
            | ((c["cts"] == e["ets"]) & (c["cid"] < e["eid"]))
        ),
        "left",
    )
    w = Window.partitionBy("eid").orderBy(
        F.desc("cts"), F.desc("cid")
    )
    ref = {
        r["eid"]: (
            r["cval"],
            None
            if r["cts"] is None
            else int(
                (r["ets"] - r["cts"]).total_seconds() * 1_000_000
            ),
        )
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == ref


@given(rows=stock_rows())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winsorize_bounds_and_tail_mass(spark, rows):
    """percentile_disc clamp invariants on arbitrary price data:
    every winsorized value sits inside [lo, hi]; strictly-below-lo
    mass is < 5% of rows and strictly-above-hi mass is <= 5%
    (the discrete-percentile guarantee)."""
    from pyspark.sql import functions as F

    from marketviz_spark.operators.aggregates import winsorize_prices

    df = spark.createDataFrame(
        [(t, d, p) for (t, d, p, _, _) in rows],
        "ticker string, date string, share_price double",
    )
    out = winsorize_prices(df).collect()
    n = len(out)
    assert n == len(rows)
    lo_clamped = sum(1 for r in out if r["clamped_low"])
    hi_clamped = sum(1 for r in out if r["clamped_high"])
    assert lo_clamped < 0.05 * n + 1e-9
    assert hi_clamped <= 0.05 * n + 1e-9
    for r in out:
        assert not (r["clamped_low"] and r["clamped_high"])
        if not r["clamped_low"] and not r["clamped_high"]:
            assert r["winsorized_price"] == r["share_price"]


@given(rows=stock_rows(), drop=st.integers(0, 2))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_table_diff_conserves_rows(spark, rows, drop):
    """Diff conservation on arbitrary snapshots: |v1| = removed +
    changed + unchanged, |v2| = added + changed + unchanged; and
    diff(v, v) is all-unchanged."""
    from pyspark.sql import functions as F

    from marketviz_spark.operators.joins import table_diff

    df = spark.createDataFrame(
        [(t, d, p) for (t, d, p, _, _) in rows],
        "ticker string, date string, share_price double",
    ).dropDuplicates(["ticker", "date"])
    n = df.count()
    same = table_diff(
        df, df, ["ticker", "date"], ["share_price"]
    )
    assert (
        same.filter("status = 'unchanged'").count() == n
        and same.count() == n
    )
    v2 = df.filter(F.substring("date", 10, 1) != str(drop)).withColumn(
        "share_price", F.col("share_price") + 1.0
    )
    d2 = (
        table_diff(df, v2, ["ticker", "date"], ["share_price"])
        .groupBy("status")
        .count()
        .collect()
    )
    counts = {r["status"]: r["count"] for r in d2}
    n2 = v2.count()
    assert (
        counts.get("removed", 0)
        + counts.get("changed", 0)
        + counts.get("unchanged", 0)
        == n
    )
    assert (
        counts.get("added", 0)
        + counts.get("changed", 0)
        + counts.get("unchanged", 0)
        == n2
    )


# ---------------------------------------------------------------------
# Round-9 scorers vs their pure-python mirrors, under hypothesis text
# ---------------------------------------------------------------------

doc_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=60,
    ),
)


def _qm_mirror(text):
    """Independent mirror of quality_model's default scoring — same
    contract as test_datapipe._qm_expected, duplicated here so this
    file stays self-contained."""
    import math
    import re

    if text is None:
        return (None, None, 0.0, False)
    toks = [t for t in re.split("[^a-z]+", text.lower()) if t]
    n = len(toks)
    w_sum = 0
    for tok in toks:
        char_sum = sum(ord(c) for c in tok)
        bucket = (char_sum * 2654435761 + len(tok) * 97) % 256
        w_sum += (bucket * 2654435761) % 1000003 - 500001
    if n == 0:
        return (0, 0, 0.0, False)
    score = math.floor(w_sum * 1e6 / (n * 1000003.0) + 0.5) / 1e6
    return (n, w_sum, score, score > 0.0)


@given(texts=st.lists(doc_text, min_size=1, max_size=8))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_quality_scores_match_python_mirror(spark, texts):
    """Arbitrary unicode/NULL corpora: Spark's hashed-linear scorer
    must agree exactly with the independent python mirror (the
    engine-vs-engine fuzz covers DuckDB; this covers the spec)."""
    from marketviz_spark.datapipe.quality_model import quality_scores

    docs = spark.createDataFrame(
        [(i, t, "en", "s", 0) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["w_sum"], r["q_score"], r["keep"])
        for r in quality_scores(docs).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _qm_mirror(t), (i, t)


def _lm_mirror(texts):
    """Independent bigram-LM mirror: whitespace (single-space)
    tokens, add-one smoothing, position-ordered left-fold sum."""
    import math

    def toks(t):
        return [x for x in (t or "").split(" ") if x]

    uni: dict = {}
    big: dict = {}
    for t in texts:
        ws = toks(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for i, t in enumerate(texts):
        ws = toks(t)
        ps = [
            (big.get((a, b), 0) + 1) / (uni[a] + v)
            for a, b in zip(ws, ws[1:])
        ]
        if not ps:
            out[i] = (0, 0, 0.0)
            continue
        s = 0.0
        for p in ps:
            s += p  # left fold, position order — matches both engines
        oov = sum(1 for a, b in zip(ws, ws[1:]) if (a, b) not in big)
        out[i] = (
            len(ps),
            oov,
            math.floor(s * 1e6 / len(ps) + 0.5) / 1e6,
        )
    return out


@given(texts=st.lists(doc_text, min_size=1, max_size=6))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lm_likelihood_matches_python_mirror(spark, texts):
    """Arbitrary unicode/NULL corpora: lm_score, n_bigrams and
    oov_bigrams must be bit-equal to the sequential-fold mirror
    (floats included — the position-ordered fold is the contract)."""
    from marketviz_spark.datapipe.lm import doc_lm_likelihood

    docs = spark.createDataFrame(
        [(i, t, "en", "s", 0) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["oov_bigrams"], r["lm_score"])
        for r in doc_lm_likelihood(docs).collect()
    }
    want = _lm_mirror(texts)
    assert got == want
