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
