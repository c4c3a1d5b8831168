"""Unit tests for corpus-curation operators (repetition filters,
decontamination, stratified sampling) — crafted-input invariants the
SQL-oracle parity can't express."""

from __future__ import annotations

from marketviz_spark.datapipe.curation import (
    CONTAM_MIN_SHARED,
    DEFAULT_RATE,
    LEHMER_MOD,
    LEHMER_MUL,
    SAMPLE_RATES,
    decontaminate,
    repetition_stats,
    sample_stratified,
)


def _docs(spark, rows):
    """rows: (doc_id, text, source)"""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_repetition_flags_boilerplate_not_prose(spark):
    docs = _docs(
        spark,
        [
            (1, "foo bar " * 8, "src"),
            (
                2,
                "the quick brown fox jumps over a lazy dog while"
                " rain falls on green hills near town square",
                "src",
            ),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: 16 tokens, "foo bar" occurs 8x -> covers 16/16 tokens;
    # every trigram occurs >=2x.
    assert out[1]["top_bigram_count"] == 8
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["dup_trigram_frac"] == 1.0
    assert out[1]["repetitive"] is True
    # doc 2: 18 tokens, all bigrams unique -> frac 2/18 under the
    # threshold (a shorter prose doc would saturate the ratio; the
    # REP_MIN_TOKENS gate exists for exactly that).
    assert out[2]["top_bigram_count"] == 1
    assert out[2]["dup_trigram_count"] == 0
    assert out[2]["repetitive"] is False


def test_repetition_short_docs(spark):
    docs = _docs(
        spark,
        [(1, "solo", "src"), (2, "two words", "src")],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # 1-token doc has no bigrams: absent by contract.
    assert 1 not in out
    # 2-token doc: one bigram, zero trigrams, no division blow-up;
    # saturated ratio (2/2 = 1.0) but under the token floor -> not
    # flagged.
    assert out[2]["n_trigrams"] == 0
    assert out[2]["dup_trigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 1.0
    assert out[2]["repetitive"] is False


def test_decontaminate_overlap_and_eval_exclusion(spark):
    # doc_id 0 -> eval split (0 % EVAL_MOD == 0).
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon", "src"),
            # shares trigrams (alpha beta gamma), (beta gamma delta),
            # (gamma delta epsilon) with the eval doc -> >= 2 shared
            (1, "alpha beta gamma delta epsilon zeta", "src"),
            (2, "one two three four five six seven", "src"),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs).collect()}
    assert 0 not in out  # eval docs are not corpus rows
    assert out[1]["n_shared_shingles"] >= CONTAM_MIN_SHARED
    assert out[1]["contaminated"] is True
    assert out[2]["n_shared_shingles"] == 0
    assert out[2]["contaminated"] is False


def test_sample_stratified_deterministic_and_correct(spark):
    rows = [
        (i, f"w{i} x y z", "src0" if i % 2 == 0 else "srcZ")
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    got1 = sorted(
        (r["doc_id"], r["sample_pct"], r["keep_rate"])
        for r in sample_stratified(docs).collect()
    )
    got2 = sorted(
        (r["doc_id"], r["sample_pct"], r["keep_rate"])
        for r in sample_stratified(docs).collect()
    )
    assert got1 == got2  # hash sampling, not rand(): re-run stable
    assert got1  # something survives
    for doc_id, pct, rate in got1:
        expect_pct = (doc_id % LEHMER_MOD) * LEHMER_MUL % LEHMER_MOD % 100
        assert pct == expect_pct
        assert rate == (
            SAMPLE_RATES["src0"] if doc_id % 2 == 0 else DEFAULT_RATE
        )
        assert pct < rate
    # src0 keeps ~90%, default keeps ~30%: the strata really differ.
    kept_src0 = sum(1 for d, _, _ in got1 if d % 2 == 0)
    kept_rest = len(got1) - kept_src0
    assert kept_src0 > kept_rest


def test_pack_sequences_stream_invariants(spark):
    from marketviz_spark.datapipe.curation import (
        PACK_BUDGET,
        pack_sequences,
    )

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(5 + (i * 7) % 90)), "s")
        for i in range(60)
    ] + [(99, "", "s")]
    out = pack_sequences(_docs(spark, rows)).collect()
    assert all(r["doc_id"] != 99 for r in out)  # empty doc dropped
    by_bucket = {}
    for r in sorted(out, key=lambda r: (r["bucket"], r["doc_id"])):
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rs in by_bucket.values():
        # contiguous token stream: each doc starts where the
        # previous one ended
        off = 0
        for r in rs:
            assert r["start_offset"] == off
            assert r["bin_first"] == off // PACK_BUDGET
            end = off + r["n_tokens"]
            assert r["bin_last"] == (end - 1) // PACK_BUDGET
            assert r["n_bins"] == r["bin_last"] - r["bin_first"] + 1
            off = end
    # some document must span a bin boundary (concat-and-chunk, not
    # whole-doc packing)
    assert any(r["n_bins"] > 1 for r in out)


def test_pii_detect_and_scrub(spark):
    from marketviz_spark.datapipe.curation import pii_scrub, pii_stats

    docs = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@corp.example.org today", "s"),
            (2, "call 555-123-4567 or 555.987.6543", "s"),
            (3, "ssn 123-45-6789 ip 10.0.0.7", "s"),
            (4, "nothing to see here", "s"),
        ],
    )
    st = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert st[1]["n_email"] == 1 and st[1]["has_pii"] is True
    # a phone is NOT also an SSN match (the 3-2-4 grouping cannot
    # align inside 3-3-4)
    assert st[2]["n_phone"] == 2 and st[2]["n_ssn"] == 0
    assert st[3]["n_ssn"] == 1 and st[3]["n_ipv4"] == 1
    assert st[4]["has_pii"] is False
    sc = {r["doc_id"]: r["redacted"] for r in pii_scrub(docs).collect()}
    assert sc[1] == "mail me at <EMAIL> today"
    assert sc[2] == "call <PHONE> or <PHONE>"
    assert sc[3] == "ssn <SSN> ip <IPV4>"
    assert sc[4] == "nothing to see here"


def test_vocab_topk_counts_and_order(spark):
    from marketviz_spark.datapipe.curation import vocab_topk

    docs = _docs(
        spark,
        [
            (1, "aa bb aa cc", "s"),
            (2, "aa bb", "s"),
            (3, "dd", "s"),
        ],
    )
    out = vocab_topk(docs, k=3).collect()
    assert [(r["token"], r["tf"], r["df"]) for r in out] == [
        ("aa", 3, 2),
        ("bb", 2, 2),
        ("cc", 1, 1),  # tf tie with dd broken by token asc
    ]


def test_curation_funnel_counts(spark):
    from marketviz_spark.datapipe.curation import curation_funnel

    prose = (
        "the quick brown fox jumps over a lazy dog while"
        " rain falls on green hills near town square"
    )
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon", "src0"),  # eval
            (1, "alpha beta gamma delta epsilon zeta", "src0"),  # contam
            (2, "foo bar " * 8, "src0"),  # repetitive
            (3, prose, "src0"),  # clean, sampled in (pct 13 < 90)
            (4, prose + " again", "srcZ"),  # clean, pct 84 >= 30 -> out
        ],
    )
    out = {r["source"]: r for r in curation_funnel(docs).collect()}
    s0, sz = out["src0"], out["srcZ"]
    assert (s0["n_docs"], s0["n_repetitive"], s0["n_contaminated"]) == (
        3,
        1,
        1,
    )
    assert (s0["n_sampled_out"], s0["n_kept"]) == (0, 1)
    assert (sz["n_docs"], sz["n_sampled_out"], sz["n_kept"]) == (1, 1, 0)


def test_incremental_dedup_bow_collisions(spark):
    from marketviz_spark.datapipe.dedup import incremental_dedup

    docs = _docs(
        spark,
        [
            # incoming (doc_id % 4 == 0)
            (0, "b a", "s"),  # same token SET as existing 1 and 3
            (4, "c d x", "s"),  # novel
            # existing
            (1, "a b", "s"),
            (2, "c d", "s"),
            (3, "a b a", "s"),  # reordered+repeated copy of the set
        ],
    )
    out = {r["doc_id"]: r for r in incremental_dedup(docs).collect()}
    assert set(out) == {0, 4}  # only the incoming batch is emitted
    assert out[0]["is_new"] is False and out[0]["dup_of"] == 1
    assert out[4]["is_new"] is True and out[4]["dup_of"] is None


def test_quantize_int8_roundtrip(spark):
    from marketviz_spark.datapipe.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0, 0.254]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    # scale = 1/127; codes: 1.0->127 (clamped top), -0.5->-63
    # (floor(-63.5 + 0.5)), 0->0, 0.254->32
    assert out[1]["q_codes"] == "127,-63,0,32"
    assert abs(out[1]["q_scale"] - 1 / 127) < 1e-6
    assert 0 < out[1]["rmse"] < 1 / 127  # error bounded by one step
    # zero vector: guard scale, all-zero codes, exact reconstruction
    assert out[2]["q_codes"] == "0,0"
    assert out[2]["rmse"] == 0.0


def test_curation_ops_on_empty_corpus(spark):
    """Every curation operator must return an empty (not failing)
    frame on an empty documents table — the first morning of a new
    pipeline is always empty."""
    from marketviz_spark.datapipe.curation import (
        corpus_drift,
        curation_funnel,
        decontaminate,
        doc_chunks,
        mixture_plan,
        oov_rates,
        pack_sequences,
        pii_scrub,
        pii_stats,
        repetition_stats,
        sample_stratified,
        vocab_topk,
    )
    from marketviz_spark.datapipe.dedup import incremental_dedup

    empty = _docs(spark, [])
    for op in (
        repetition_stats,
        decontaminate,
        sample_stratified,
        pack_sequences,
        pii_stats,
        pii_scrub,
        vocab_topk,
        curation_funnel,
        incremental_dedup,
        corpus_drift,
        mixture_plan,
        oov_rates,
        doc_chunks,
    ):
        assert op(empty).count() == 0, op.__name__


def test_mega_document_stays_row_shaped(spark):
    """A degenerate 50k-token document must flow through the
    repetition/packing pipelines as ROWS, not per-doc buffers:
    results stay exact and nothing blows up."""
    from marketviz_spark.datapipe.curation import (
        pack_sequences,
        repetition_stats,
    )

    mega = "tok " * 50_000  # one gram repeated: worst-case skew
    docs = _docs(spark, [(1, mega, "src"), (2, "a b c d", "src")])
    rep = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rep[1]["n_tokens"] == 50_000
    assert rep[1]["top_bigram_count"] == 49_999
    assert rep[1]["repetitive"] is True
    pack = {r["doc_id"]: r for r in pack_sequences(docs).collect()}
    assert pack[1]["n_bins"] >= 50_000 // 64  # spans many bins


def test_rarity_orders_common_vs_rare(spark):
    from marketviz_spark.datapipe.curation import (
        RARITY_SCALE,
        rarity_scores,
    )

    # "the" appears 8x across the corpus; singletons once each
    docs = _docs(
        spark,
        [
            (1, "the the the the", "s"),
            (2, "zq xv wk pj", "s"),
            (3, "the the the the zq2 xv2", "s"),
        ],
    )
    out = {r["doc_id"]: r for r in rarity_scores(docs).collect()}
    # tf(the)=8 -> floor_log2=3 -> contribution SCALE/4
    assert out[1]["rarity_ppm"] == RARITY_SCALE // 4
    # singletons: tf=1 -> floor_log2=0 -> full contribution
    assert out[2]["rarity_ppm"] == RARITY_SCALE
    assert (
        out[1]["rarity_ppm"]
        < out[3]["rarity_ppm"]
        < out[2]["rarity_ppm"]
    )


def test_lehmer_nonnegative_for_negative_ids(spark):
    """64-bit-hash doc_ids can be negative: the sampling percentile
    and pack bucket must stay in range (Spark's % keeps the
    dividend's sign; lehmer_hash uses pmod)."""
    from marketviz_spark.datapipe.curation import (
        pack_sequences,
        sample_stratified,
    )

    rows = [(-i, "w x y z", "srcZ") for i in range(1, 60)]
    docs = _docs(spark, rows)
    out = sample_stratified(docs).collect()
    assert all(0 <= r["sample_pct"] < 100 for r in out)
    # default rate is 30: a sign bug would keep ALL negative ids
    assert 0 < len(out) < 59
    packed = pack_sequences(docs).collect()
    assert all(r["bucket"] >= 0 for r in packed)


def test_curation_apply_matches_funnel_kept_counts(spark):
    """The materialized curated corpus must contain exactly the docs
    curation_funnel counts as kept, per source — the apply and the
    report are two views of one decision."""
    from marketviz_spark import tables
    from marketviz_spark.datapipe.curation import (
        curation_apply,
        curation_funnel,
    )

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    kept = {
        r["source"]: r["n_kept"]
        for r in curation_funnel(docs).collect()
        if r["n_kept"] > 0
    }
    applied = {
        r["source"]: r["n"]
        for r in curation_apply(docs)
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert applied == kept and kept


def test_split_assign_disjoint_exhaustive_decorrelated(spark):
    """Every doc gets exactly one split; proportions are near
    80/10/10; and the split is decorrelated from the sampling
    percentile (the second Lehmer step): sampled docs must NOT all
    land in one split."""
    from marketviz_spark import tables
    from marketviz_spark.datapipe.curation import (
        sample_stratified,
        split_assign,
    )

    docs = tables.load(spark, "/root/testdata/sf0.01", "documents")
    out = split_assign(docs).collect()
    assert len(out) == docs.count()  # exhaustive, one row per doc
    by = {}
    for r in out:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    total = sum(len(v) for v in by.values())
    assert len(set.union(*by.values())) == total  # disjoint
    assert 0.6 < len(by["train"]) / total < 0.95
    sampled = {r["doc_id"] for r in sample_stratified(docs).collect()}
    splits_of_sampled = {
        r["split"] for r in out if r["doc_id"] in sampled
    }
    assert len(splits_of_sampled) > 1, "split correlated with sampling"


def test_corpus_drift_identical_sources_zero_distance(spark):
    """Two sources with the SAME token multiset must both read
    tv_dist == 0 exactly (the int64 numerator makes this an exact
    zero, not an epsilon); a third source with disjoint vocabulary
    must read tv_dist == 1 exactly."""
    from marketviz_spark.datapipe.curation import corpus_drift

    docs = _docs(
        spark,
        [
            (0, "alpha beta beta gamma", "s_a"),
            (1, "beta gamma alpha beta", "s_b"),  # same multiset
            (2, "zeta zeta eta theta", "s_c"),  # disjoint vocab
        ],
    )
    got = {r["source"]: r for r in corpus_drift(docs).collect()}
    # s_a vs rest: rest = s_b + s_c; not zero. The exact-zero case
    # needs rest == same distribution, so compare s_a against s_b
    # alone:
    two = {
        r["source"]: r
        for r in corpus_drift(docs.filter("source != 's_c'")).collect()
    }
    assert two["s_a"]["tv_dist"] == 0.0
    assert two["s_b"]["tv_dist"] == 0.0
    assert two["s_a"]["drift_num"] == 0
    # disjoint vocabulary vs rest -> TV exactly 1
    disj = {
        r["source"]: r
        for r in corpus_drift(docs.filter("source != 's_b'")).collect()
    }
    assert disj["s_c"]["tv_dist"] == 1.0


def test_corpus_drift_matches_brute_force(spark):
    """The folded absent-token term must equal the brute-force TV
    distance computed per token over the full union vocabulary."""
    from collections import Counter

    from marketviz_spark.datapipe.curation import corpus_drift

    rows = [
        (0, "a b c c d", "x"),
        (1, "b c d d e e", "x"),
        (2, "a a a f g", "y"),
        (3, "c d e f g g g", "y"),
        (4, "h h i j", "z"),
    ]
    docs = _docs(spark, rows)
    got = {r["source"]: r["tv_dist"] for r in corpus_drift(docs).collect()}
    by_src: dict[str, Counter] = {}
    for _i, text, src in rows:
        by_src.setdefault(src, Counter()).update(text.split())
    for src, cnt in by_src.items():
        rest = Counter()
        for other, c in by_src.items():
            if other != src:
                rest.update(c)
        ns, nr = sum(cnt.values()), sum(rest.values())
        vocab = set(cnt) | set(rest)
        tv = sum(
            abs(cnt[t] / ns - rest[t] / nr) for t in vocab
        ) / 2.0
        assert abs(got[src] - tv) < 1e-12, src


def test_semdedup_dominance_invariants(spark):
    """SemDeDup structural properties: every pruned_by is a smaller
    id; the smallest vec_id of every cell is always kept; kept is
    exactly (pruned_by IS NULL); and a rerun is identical."""
    from pyspark.sql import functions as F

    from marketviz_spark import tables
    from marketviz_spark.datapipe.similarity import semdedup
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    out = semdedup(emb).cache()
    rows = out.collect()
    assert len(rows) == emb.count()  # one row per vector
    for r in rows:
        if r["pruned_by"] is not None:
            assert r["pruned_by"] < r["vec_id"]
            assert not r["kept"]
        else:
            assert r["kept"]
    mins = {
        r["cell"]: r["m"]
        for r in out.groupBy("cell")
        .agg(F.min("vec_id").alias("m"))
        .collect()
    }
    by_id = {r["vec_id"]: r for r in rows}
    for cell, m in mins.items():
        assert by_id[m]["kept"], f"cell {cell} min id {m} not kept"
    again = sorted(map(str, semdedup(emb).collect()))
    assert sorted(map(str, rows)) == again


# ---------------------------------------------------------------------------
# Round-6 batch 4: boilerplate detection, leakage-safe split, mixture
# execution, coverage curve
# ---------------------------------------------------------------------------


def test_boilerplate_identical_docs_fully_flagged(spark):
    """Two identical documents share every chunk fingerprint, so with
    min_docs=2 both score boiler_ppm == 1e6; a unique doc scores 0."""
    from marketviz_spark.datapipe.curation import boilerplate_chunks

    body = " ".join(f"w{i}" for i in range(55))
    uniq = " ".join(f"u{i}" for i in range(55))
    docs = _docs(spark, [(1, body, "a"), (2, body, "a"), (3, uniq, "b")])
    got = {
        r["doc_id"]: (r["boiler_ppm"], r["n_chunks"])
        for r in boilerplate_chunks(docs).collect()
    }
    assert got[1][0] == 1_000_000 and got[2][0] == 1_000_000
    assert got[3][0] == 0
    assert got[1][1] == got[3][1] == 3  # 55 tokens, stride 20


def test_boilerplate_partial_overlap(spark):
    """A doc sharing only its FIRST aligned chunk with another doc is
    flagged on exactly that chunk."""
    from marketviz_spark.datapipe.curation import boilerplate_chunks

    shared = " ".join(f"s{i}" for i in range(40))
    a = shared + " " + " ".join(f"a{i}" for i in range(40))
    b = shared + " " + " ".join(f"b{i}" for i in range(40))
    docs = _docs(spark, [(1, a, "x"), (2, b, "x")])
    got = {r["doc_id"]: r for r in boilerplate_chunks(docs).collect()}
    # 80 tokens -> starts 0,20,40,60: only the start-0 window
    # [0,30) lies fully inside the shared 40-token prefix
    assert got[1]["n_chunks"] == 4
    assert got[1]["boiler_chunks"] == 1
    assert got[1]["boiler_ppm"] == 250_000


def test_cluster_split_keeps_near_dups_together(spark):
    """Every member of a dedup cluster gets the same split label, and
    the assignment is exhaustive and disjoint."""
    from marketviz_spark.datapipe.curation import cluster_split

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok59", "changed")
    rows = [(1, base, "a"), (2, near, "a"), (3, base, "b")] + [
        (10 + i, f"solo{i} " * 30, "c") for i in range(20)
    ]
    docs = _docs(spark, rows)
    out = cluster_split(docs).collect()
    assert len(out) == len(rows)  # exhaustive, one row per doc
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # docs 1-3 are near-dups of each other -> one cluster, one split
    c = {r["doc_id"]: r["cluster_id"] for r in out}
    assert c[1] == c[2] == c[3]


def test_mixture_apply_respects_budget_and_keeps_scarcest(spark):
    """Kept tokens per source never exceed the scarcest source's
    inventory, and the scarcest source keeps every document."""
    from marketviz_spark.datapipe.curation import mixture_apply

    rows = (
        [(i, "a " * 50, "big") for i in range(1, 21)]
        + [(100 + i, "b " * 50, "mid") for i in range(1, 11)]
        + [(200 + i, "c " * 50, "small") for i in range(1, 4)]
    )
    docs = _docs(spark, [(i, t.strip(), s) for i, t, s in rows])
    out = mixture_apply(docs).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r)
    min_inv = 3 * 50
    for src, kept in per_src.items():
        assert sum(r["n_tokens"] for r in kept) <= min_inv
        assert max(r["cum_tokens"] for r in kept) <= min_inv
    assert len(per_src["small"]) == 3  # scarcest keeps everything
    assert len(per_src["big"]) == 3  # 3*50 fills the 150 budget


def test_token_coverage_curve_monotone_and_bounded(spark):
    from marketviz_spark.datapipe.curation import token_coverage_curve

    docs = _docs(
        spark,
        [(1, "x x x y y z", "a"), (2, "x y q r s t u v w", "a")],
    )
    out = token_coverage_curve(docs, k=5).collect()
    out.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    assert out[0]["token"] == "x" and out[0]["tf"] == 4
    cums = [r["cum_tf"] for r in out]
    assert cums == sorted(cums)
    assert all(0 < r["coverage_ppm"] <= 1_000_000 for r in out)
    # cum_tf really is the running sum of tf in rank order
    run = 0
    for r in out:
        run += r["tf"]
        assert r["cum_tf"] == run


def test_mixture_plan_weighted_binding_source(spark):
    """With target weights 3:1 and equal inventories, the
    high-weight source binds: it keeps (nearly) everything while the
    low-weight source is cut to ~1/3 of the corpus bound — and no
    source ever keeps more than its inventory."""
    from marketviz_spark.datapipe.curation import mixture_plan_weighted

    docs = _docs(
        spark,
        [(i, "w " * 100, "hot") for i in range(5)]
        + [(10 + i, "w " * 100, "cold") for i in range(5)],
    )
    out = {
        r["source"]: r
        for r in mixture_plan_weighted(docs, weights={"hot": 3}).collect()
    }
    assert out["hot"]["n_tokens"] == out["cold"]["n_tokens"] == 500
    assert out["hot"]["w_ppm"] == 750_000
    assert out["cold"]["w_ppm"] == 250_000
    for r in out.values():
        assert r["kept_tokens"] <= r["n_tokens"]
    # hot binds: C = floor(500e6/750000) = 666 -> hot keeps 499
    assert out["hot"]["kept_tokens"] == 499
    assert out["cold"]["kept_tokens"] == 166


def test_mixture_plan_weighted_uniform_matches_plan(spark):
    """With all-equal weights the weighted plan degenerates to the
    uniform plan's kept_tokens (same binding bound)."""
    from marketviz_spark.datapipe.curation import (
        mixture_plan,
        mixture_plan_weighted,
    )

    docs = _docs(
        spark,
        [(1, "a " * 30, "x"), (2, "b " * 70, "y"), (3, "c " * 50, "z")],
    )
    uni = {
        r["source"]: r["kept_tokens"]
        for r in mixture_plan(docs).collect()
    }
    wtd = {
        r["source"]: r["kept_tokens"]
        for r in mixture_plan_weighted(docs, weights={}).collect()
    }
    # w_ppm = 333333 for 3 sources; C = floor(min_inv*1e6/333333);
    # floor noise keeps them within 1 token of the uniform plan
    for s in uni:
        assert abs(uni[s] - wtd[s]) <= 1, (s, uni[s], wtd[s])


def test_batch4_ops_empty_corpus_yield_empty_not_error(spark):
    """Empty input must produce empty output (no div-by-zero, no
    min-of-nothing crash) for the batch-4/5 curation ops — the
    behavior an incremental pipeline hits on a quiet ingest hour."""
    from marketviz_spark.datapipe.curation import (
        boilerplate_chunks,
        mixture_apply,
        mixture_plan,
        mixture_plan_weighted,
        token_coverage_curve,
    )

    empty = _docs(spark, []).filter("doc_id IS NOT NULL")
    for fn in (
        boilerplate_chunks,
        mixture_apply,
        mixture_plan,
        mixture_plan_weighted,
        token_coverage_curve,
    ):
        assert fn(empty).count() == 0, fn.__name__


def test_sample_pps_size_bias_weights_determinism(spark):
    """Poisson PPS: deterministic re-run, sample is a subset, HT
    weight >= 1e6 ppm (p <= 1), big docs sampled at a higher rate
    than small ones, and a doc with w_i >= W/k (p capped at 1) is
    ALWAYS in the sample with exactly 1e6 ppm weight."""
    from marketviz_spark.datapipe.curation import sample_pps

    # 400 small docs (10 chars) + 1 mega doc (> W/k chars for k=100)
    rows = [(i, "x" * 10, "small") for i in range(400)]
    rows.append((9999, "y" * 2000, "mega"))
    docs = _docs(spark, rows)
    got1 = sorted(
        (r["doc_id"], r["ht_weight_ppm"])
        for r in sample_pps(docs, target_k=100).collect()
    )
    got2 = sorted(
        (r["doc_id"], r["ht_weight_ppm"])
        for r in sample_pps(docs, target_k=100).collect()
    )
    assert got1 == got2 and len(got1) > 0
    ids = {d for d, _ in got1}
    assert ids <= {i for i, _, _ in rows} | {9999}
    assert all(w >= 1_000_000 for _, w in got1)
    # mega doc: w_i*k = 2000*100 = 200k > W = 400*10 + 2000 = 6000
    # -> p capped at 1, always present, weight exactly 1e6 ppm
    mega = [w for d, w in got1 if d == 9999]
    assert mega == [1_000_000]
    # small docs: p = 100*10/6000 = 1/6 -> expect ~67 of 400; the
    # Lehmer hash is uniform enough that [20, 140] is a safe band
    n_small = len(got1) - 1
    assert 20 <= n_small <= 140


def test_chunk_index_dedup_first_occurrence_rep(spark):
    """Chunk dedup: a chunk repeated within one doc AND across docs
    collapses to one index row, represented by the lowest
    (doc_id, chunk_id), with copy/doc counts; unique chunks pass
    through with n_copies == 1."""
    from marketviz_spark.datapipe.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_index_dedup,
    )

    # Window/stride default: make one chunk's token window identical
    # across docs by repeating the same window-sized prefix.
    prefix = " ".join(f"w{i}" for i in range(CHUNK_TOKENS))
    docs = _docs(
        spark,
        [
            (0, prefix + " tail0 " + "u0 " * CHUNK_STRIDE, "s"),
            (1, prefix + " tail1", "s"),
            (2, "totally different words here entirely", "s"),
        ],
    )
    rows = chunk_index_dedup(docs).collect()
    by_rep = {
        (r["rep_doc_id"], r["rep_chunk_id"]): r for r in rows
    }
    shared = [r for r in rows if r["n_docs"] == 2]
    assert len(shared) == 1
    assert shared[0]["rep_doc_id"] == 0
    assert shared[0]["rep_chunk_id"] == 0
    assert shared[0]["n_copies"] == 2
    # every chunk_md5 appears exactly once in the index
    md5s = [r["chunk_md5"] for r in rows]
    assert len(md5s) == len(set(md5s))
    assert all(r["n_copies"] >= 1 for r in rows)


def test_batch5_ops_empty_input_yield_empty_not_error(spark):
    """Empty-input regression for the batch-5 ops (as-of join, PPS
    sample, BPE pairs, chunk dedup, decontamination, equi-depth
    hist): a quiet ingest hour must produce empty output, not a
    null-threshold or min-of-nothing crash."""
    from marketviz_spark.datapipe.curation import (
        chunk_index_dedup,
        sample_pps,
    )
    from marketviz_spark.datapipe.similarity import (
        embedding_decontaminate,
    )
    from marketviz_spark.datapipe.textstats import merge_pair_topk
    from marketviz_spark.operators.aggregates import equidepth_hist
    from marketviz_spark.operators.joins import asof_prev_event

    empty_docs = _docs(spark, []).filter("doc_id IS NOT NULL")
    for fn in (sample_pps, merge_pair_topk, chunk_index_dedup):
        assert fn(empty_docs).count() == 0, fn.__name__

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert embedding_decontaminate(empty_emb).count() == 0

    empty_ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    assert asof_prev_event(empty_ev).count() == 0

    empty_px = spark.createDataFrame(
        [], "ticker string, date string, share_price double"
    )
    assert equidepth_hist(empty_px).count() == 0


def test_curriculum_order_interleaves_sources(spark):
    """Round-robin interleave: global_pos is unique; within a
    source positions rise with rarity rank; consecutive ranks of
    one source are n_sources apart (no long same-source runs);
    rank 1 docs occupy positions 0..n_sources-1."""
    from marketviz_spark.datapipe.curation import curriculum_order

    rows = [
        (i, f"w{i % 7} common words here {i}", ["a", "b", "c"][i % 3])
        for i in range(30)
    ]
    docs = _docs(spark, rows)
    out = curriculum_order(docs).collect()
    pos = [r["global_pos"] for r in out]
    assert len(pos) == len(set(pos)) == 30
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(
            (r["rank_in_source"], r["global_pos"])
        )
    for src, lst in by_src.items():
        lst.sort()
        for (r1, p1), (r2, p2) in zip(lst, lst[1:]):
            assert r2 == r1 + 1 and p2 - p1 == 3, (src, r1, r2)
    firsts = sorted(
        p for r, lst in (("x", v) for x, v in by_src.items())
        for rk, p in lst if rk == 1
    )
    assert firsts == [0, 1, 2]


def test_mixture_plan_temperature_upweights_small_sources(spark):
    """alpha=1/2 smoothing: a source with 4x the tokens gets only
    2x the weight (sqrt), so the small source's kept SHARE rises
    vs its raw share — and every integer column is reproducible
    arithmetic on the inventory. Verified against a hand mirror."""
    import math

    from marketviz_spark.datapipe.curation import (
        mixture_plan_temperature,
    )

    docs = spark.createDataFrame(
        [
            (0, "a " * 400, "en", "big", 800),
            (1, "b " * 100, "en", "small", 200),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    rows = {
        r["source"]: r
        for r in mixture_plan_temperature(docs).collect()
    }
    # hand mirror: n = {big: 400, small: 100}; w_rel = {20, 10}
    w_tot = 30
    for src, n, w in (("big", 400, 20), ("small", 100, 10)):
        ppm = math.floor(w * 1_000_000 / w_tot)
        assert rows[src]["n_tokens"] == n
        assert rows[src]["w_ppm"] == ppm
    c = min(
        math.floor(400 * 1_000_000 / rows["big"]["w_ppm"]),
        math.floor(100 * 1_000_000 / rows["small"]["w_ppm"]),
    )
    for src, n in (("big", 400), ("small", 100)):
        kept = math.floor(c * rows[src]["w_ppm"] / 1_000_000)
        assert rows[src]["kept_tokens"] == kept
        assert rows[src]["keep_ppm"] == math.floor(
            kept * 1_000_000 / n
        )
    # the smoothed plan keeps a LARGER share of the small source
    assert (
        rows["small"]["keep_ppm"] > rows["big"]["keep_ppm"]
    )
