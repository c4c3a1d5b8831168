"""Unit tests for the training-data-pipeline operators: invariants
that the SQL-oracle parity can't express (recall guarantees, stub
behavior, dedup on crafted near-duplicates)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


BASE = "the quick brown fox jumps over the lazy dog again and again ok"


def test_exact_dedup_groups(spark):
    from marketviz_spark.datapipe.dedup import exact_dedup_groups

    docs = _docs(spark, [BASE, BASE, "something else entirely here now"])
    out = {r["rep_doc_id"]: r["n_copies"]
           for r in exact_dedup_groups(docs).collect()}
    assert out == {0: 2, 2: 1}


def test_minhash_identical_docs_collide(spark):
    from marketviz_spark.datapipe.dedup import lsh_candidate_pairs

    docs = _docs(spark, [BASE, BASE, "x y z " * 10])
    pairs = {(r["doc_a"], r["doc_b"])
             for r in lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_ngram_jaccard_near_dup(spark):
    from marketviz_spark.datapipe.dedup import ngram_jaccard_pairs

    near = BASE.replace("dog", "cat")
    docs = _docs(spark, [BASE, near])
    rows = ngram_jaccard_pairs(docs, threshold=0.3).collect()
    assert rows and rows[0]["jaccard"] > 0.3


def test_shingle_df_cap_refuses_boilerplate(spark):
    """A shingle shared by more docs than df_cap is excluded from
    pairing (refuse) and reported via shingle_overflow_keys (report).
    Docs that only overlap on the hot shingle produce NO pair; docs
    sharing rare shingles still pair, with sizes counted in the
    capped space."""
    from marketviz_spark.datapipe.dedup import (
        ngram_jaccard_pairs,
        shingle_overflow_keys,
    )

    boiler = "all rights reserved worldwide"  # one shared 4-token run
    texts = [
        f"{boiler} alpha bravo charlie delta echo",
        f"{boiler} foxtrot golf hotel india juliet",
        f"{boiler} kilo lima mike november oscar",
        f"{boiler} papa quebec romeo sierra tango",
    ]
    docs = _docs(spark, texts)

    # df_cap=3: the boilerplate shingles (df=4) are refused...
    pairs = ngram_jaccard_pairs(docs, threshold=0.0, df_cap=3).collect()
    assert pairs == [], f"hot-shingle-only overlaps must not pair: {pairs}"
    # ...and reported
    over = {r["shingle"]: r["n_docs"]
            for r in shingle_overflow_keys(docs, df_cap=3).collect()}
    assert over and all(n == 4 for n in over.values())
    assert all(sh.split()[0] in boiler for sh in over)

    # with the cap above the boilerplate DF, the same docs DO pair
    pairs = ngram_jaccard_pairs(docs, threshold=0.0, df_cap=4).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {
        (a, b) for a in range(4) for b in range(4) if a < b
    }


def test_dedup_apply_keeps_one_representative(spark):
    """Two LSH-colliding near-dups collapse to the min-doc_id
    representative; the unrelated doc survives untouched, with
    content fingerprints proving WHICH text survived."""
    from marketviz_spark.datapipe.dedup import dedup_apply

    docs = _docs(spark, [BASE, BASE, "x y z " * 10])
    out = {r["doc_id"]: r["fp"] for r in dedup_apply(docs).collect()}
    assert set(out) == {0, 2}
    import hashlib

    assert out[0] == hashlib.md5(BASE.encode()).hexdigest()


def test_substring_dup_spans_cross_doc(spark):
    """A >=k-char run shared by two docs at a stride-aligned offset
    is reported once (grouped, n_docs=2) with deterministic
    representative; unique text and sub-k docs produce nothing."""
    from marketviz_spark.datapipe.dedup import substring_dup_spans

    # non-periodic so stride-offset windows don't hash-collapse
    shared = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMN"  # 50 chars
    docs = _docs(
        spark,
        [shared + " unique tail one", shared + " other ending two",
         "entirely different text " * 3, "short"],
    )
    rows = substring_dup_spans(docs).collect()
    assert rows, "shared 50-char run must produce duplicated windows"
    assert all(r["n_docs"] == 2 and r["rep_doc_id"] == 0 for r in rows)
    # the two windows fully inside the shared run: offsets 1 and 11
    assert {r["min_pos"] for r in rows} == {1, 11}
    assert all(r["n_occ"] == 2 for r in rows)


def test_simhash_near_dup_low_hamming(spark):
    from marketviz_spark.datapipe.dedup import simhash_near_pairs

    near = BASE + " extra"
    docs = _docs(spark, [BASE, near])
    rows = simhash_near_pairs(docs, max_hamming=4).collect()
    assert any(r["doc_a"] == 0 and r["doc_b"] == 1 for r in rows)


def test_cosine_topk_self_excluded_and_exact(spark):
    from marketviz_spark.datapipe.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in
           cosine_topk(emb, k=1).collect()}
    assert out[0]["neighbor_id"] == 1 and out[0]["cosine"] == 1.0
    assert out[2]["cosine"] == 0.0


def test_components_chain_converges_in_log_rounds(spark):
    """Pointer doubling in _min_label_components must collapse a
    long PATH graph in O(log diameter) rounds: a 200-node chain with
    max_iter=12 (2^12 >> 200) converges only if label distance
    compounds per round — plain one-hop min-label would need 200
    rounds and raise. This is the shape an sf0.1 multimodal dup
    graph actually produced (non-convergence at 20 rounds, round 6)."""
    from marketviz_spark.datapipe.dedup import _min_label_components

    n = 200
    nodes = spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = _min_label_components(nodes, chain, max_iter=12)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_components_chain_and_edge_cases(spark):
    """Large-star/small-star (_star_components, the scale path the
    cluster queries run) must collapse a 200-node chain within a
    log-bounded alternation budget, label isolated nodes as their
    own cluster, and be insensitive to edge direction, duplicate
    pairs, and self-loops (the canonicalization contract)."""
    from marketviz_spark.datapipe.dedup import _star_components

    n = 200
    nodes = spark.createDataFrame(
        [(i,) for i in range(n + 3)], "doc_id long"  # +3 isolated
    )
    rows = [(i, i + 1) for i in range(n - 1)]
    rows += [(5, 4), (10, 10), (0, 1), (0, 1)]  # reversed, loop, dups
    chain = spark.createDataFrame(rows, "doc_a long, doc_b long")
    labels = _star_components(nodes, chain, max_iter=12)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    want = {i: 0 for i in range(n)}
    want.update({n: n, n + 1: n + 1, n + 2: n + 2})
    assert got == want

    # empty edge set: everyone isolated
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    iso = _star_components(nodes, empty, max_iter=3)
    assert {r["doc_id"]: r["cluster_id"] for r in iso.collect()} == {
        i: i for i in range(n + 3)
    }


def test_star_components_shuffled_id_chain(spark):
    """Adversarial id layout: a 150-node PATH whose node ids are a
    seeded permutation, so the component min sits at a random chain
    position and labels must propagate BOTH directions — the shape
    where a naive one-directional pass stalls. Must converge within
    the log-bounded budget to the true min everywhere."""
    import random

    from marketviz_spark.datapipe.dedup import _star_components

    rng = random.Random(99)
    n = 150
    ids = list(range(n))
    rng.shuffle(ids)
    nodes = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    chain = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)],
        "doc_a long, doc_b long",
    )
    labels = _star_components(nodes, chain, max_iter=12)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_components_matches_min_label_random_graph(spark):
    """Fuzz parity: on a seeded random graph (mixed stars, chains,
    isolated nodes) the star alternation must produce exactly the
    labels of the reference min-label propagation."""
    import random

    from marketviz_spark.datapipe.dedup import (
        _min_label_components,
        _star_components,
    )

    rng = random.Random(20260815)
    n = 400
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(300)
    ]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in _star_components(nodes, pairs, max_iter=15).collect()
    }
    ref = {
        (r["doc_id"], r["cluster_id"])
        for r in _min_label_components(
            nodes, pairs.distinct(), max_iter=25
        ).collect()
    }
    assert star == ref


def test_dedup_adversarial_all_identical_corpus(spark):
    """Adversarial mass-duplication: a corpus of N IDENTICAL
    documents must flow end-to-end through dedup_clusters without a
    quadratic pair explosion — the identical MinHash signatures land
    in one LSH bucket per band, the bucket cap bounds pairing, the
    overflow report names the refused buckets, and the cluster
    output still assigns every doc a label with ONE representative
    corpus after dedup_apply."""
    from pyspark.sql import functions as F

    from marketviz_spark.datapipe.dedup import (
        BAND_SIZE,
        MAX_BUCKET,
        NUM_HASHES,
        bucket_overflow_keys,
        dedup_apply,
        dedup_clusters,
        minhash_signatures,
    )

    n = 300  # > bucket cap when capped small below; identical texts
    docs = _docs(spark, [BASE] * n)

    # 1) capped pairing: with a tiny cap every bucket overflows and
    # is REPORTED, not paired (refuse-and-report under skew)
    sigs = minhash_signatures(docs)
    n_bands = NUM_HASHES // BAND_SIZE
    stacked = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band_{b}") for b in range(n_bands)])
        ).alias("band", "key"),
    ).select("band", "key", F.col("doc_id").alias("item"))
    overflow = bucket_overflow_keys(stacked, max_bucket=10).collect()
    assert overflow and all(r["n_items"] == n for r in overflow)

    # 2) default caps: N=300 < MAX_BUCKET so pairing is allowed and
    # bounded; clusters converge (pointer doubling) to ONE cluster
    assert n < MAX_BUCKET
    labels = dedup_clusters(docs)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert set(got) == set(range(n))
    assert set(got.values()) == {0}

    # 3) representative-only corpus: exactly one doc survives
    kept = dedup_apply(docs).collect()
    assert len(kept) == 1 and kept[0]["doc_id"] == 0


def test_cosine_topk_refuses_above_brute_cap(spark):
    """Refuse-and-report contract (same as dedup's MAX_BUCKET /
    SHINGLE_DF_CAP): brute force must refuse an input larger than
    N_BRUTE_CAP and point at the scale paths, without launching the
    quadratic join. `n_rows` from table stats skips the count scan."""
    import pytest

    from marketviz_spark.datapipe.similarity import (
        N_BRUTE_CAP,
        cosine_topk,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="blas_cosine_topk"):
        cosine_topk(emb, k=1, n_rows=N_BRUTE_CAP + 1)
    # at-cap input is allowed (stat-supplied count, no scan)
    assert cosine_topk(emb, k=1, n_rows=N_BRUTE_CAP).count() == 0


def test_jaccard_pair_budget_refuses_dense_corpus(spark):
    """ngram_jaccard_pairs must refuse when the exact candidate-pair
    count over SURVIVING (under-df_cap) shingles exceeds the budget:
    df_cap alone does not bound Σ DF·(DF-1)/2 on dense corpora (the
    round-7 sf1 spot-run measured 33x wall for 10x density). The
    error names the candidate-based scale path."""
    import pytest

    from marketviz_spark.datapipe.dedup import ngram_jaccard_pairs

    # 6 docs sharing one 3-shingle "a b c": DF=6 -> 15 pairs
    docs = _docs(spark, ["a b c d%d" % i for i in range(6)])
    with pytest.raises(ValueError, match="lsh_candidate_pairs"):
        ngram_jaccard_pairs(docs, pair_budget=10).count()
    # same corpus under a sufficient budget runs; budget=None uncaps
    assert ngram_jaccard_pairs(docs, pair_budget=100).count() >= 0
    assert ngram_jaccard_pairs(docs, pair_budget=None).count() >= 0


def test_lsh_topk_bucket_candidate_cap(spark):
    """hyperplane_lsh_topk truncates only the CANDIDATE side of an
    over-full bucket (first `bucket_cap` members by vec_id): every
    query still emits its top-k, total pair work is bounded, and the
    capped result equals the uncapped one restricted to the kept
    candidates — deterministic on any engine."""
    from marketviz_spark.datapipe.similarity import (
        hyperplane_lsh_topk,
    )

    # 12 near-identical vectors land in one bucket
    emb = spark.createDataFrame(
        [
            (i, [1.0, 0.001 * i, 0.0, 0.0], 0)
            for i in range(12)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    capped = hyperplane_lsh_topk(emb, k=2, bucket_cap=5).collect()
    # every vector keeps a full query row set
    assert {r["vec_id"] for r in capped} == set(range(12))
    # candidates only come from the first 5 bucket members
    assert all(r["neighbor_id"] < 5 for r in capped)
    # uncapped: neighbors from the whole bucket
    full = hyperplane_lsh_topk(emb, k=2, bucket_cap=1000).collect()
    assert any(r["neighbor_id"] >= 5 for r in full)


def test_multimodal_decode_stub_shapes(spark):
    """The stub decode must flow through mapInPandas with the real
    schema, flagging non-decodable rows instead of failing the job."""
    from marketviz_spark.datapipe.multimodal import decode_image, to_media

    docs = _docs(spark, ["plain text payload"])
    media = to_media(docs)
    rows = decode_image(media).collect()
    assert rows[0]["ok"] is True  # deterministic fake for non-image bytes
    jpeg = media.withColumn(
        "payload", F.lit(bytearray(b"\xff\xd8rest"))
    )
    rows2 = decode_image(jpeg).collect()
    assert rows2[0]["ok"] is False and "decoding" in rows2[0]["err"]


def test_blas_blocked_equals_single_tile(spark):
    """The block-partitioned BLAS grid (nb > 1, tile top-k + global
    merge) must produce exactly the single-tile result — per-tile
    pre-filtering cannot change the global top-k."""
    from marketviz_spark.datapipe.similarity import blas_cosine_topk
    from marketviz_spark import tables
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    one = blas_cosine_topk(emb, k=5, block_rows=10**9)  # 1 tile
    many = blas_cosine_topk(emb, k=5, block_rows=64)  # 8x8 grid
    assert sorted(map(str, one.collect())) == sorted(
        map(str, many.collect())
    )


def test_blas_no_driver_collect():
    """Scale guard: the BLAS query path must never collect the
    embedding table to the driver."""
    import inspect

    from marketviz_spark.datapipe import similarity

    src = inspect.getsource(similarity.blas_cosine_topk)
    assert "toPandas" not in src and "collect()" not in src


def test_ivf_trained_centroids_recall(spark):
    """Trained (Lloyd) IVF must beat the untrained seed assignment
    on recall vs the exact brute-force top-k, and clear an absolute
    floor well above the 1/n_cells chance level (~0.06). Data and
    training are fully deterministic, so exact thresholds are safe."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from marketviz_spark import tables
    from marketviz_spark.datapipe.similarity import (
        _assign_to,
        _dot,
        cosine_topk,
        ivf_topk,
        ivf_train,
        with_norm,
    )
    from marketviz_spark.numerics import rnd
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    exact = {
        (r.vec_id, r.neighbor_id) for r in cosine_topk(emb, k=3).collect()
    }
    trained = {
        (r.vec_id, r.neighbor_id) for r in ivf_topk(emb, k=3).collect()
    }

    def cell_topk_pairs(assigned):
        a, b = assigned.alias("a"), assigned.alias("b")
        pairs = a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            rnd(
                _dot(F.col("a._v"), F.col("b._v"))
                / (F.col("a._norm") * F.col("b._norm")),
                6,
            ).alias("cosine"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return {
            (r.vec_id, r.neighbor_id)
            for r in pairs.withColumn("rank", F.row_number().over(w))
            .filter("rank <= 3")
            .collect()
        }

    n = with_norm(emb).select("vec_id", "_v", "_norm")
    untrained = cell_topk_pairs(_assign_to(n, ivf_train(emb, n_iters=0)))

    recall_trained = len(exact & trained) / len(exact)
    recall_untrained = len(exact & untrained) / len(exact)
    assert recall_trained > recall_untrained
    assert recall_trained >= 0.2


def test_ivf_train_deterministic(spark):
    """Two independent ivf_train runs over the same data must return
    bit-identical models (deterministic Lloyd: fixed seed order,
    exact decimal mean, 6dp round) — every IVF consumer retrains
    from the parquet inputs, so cross-run determinism is what keeps
    the unrolled SQL oracles exact."""
    from marketviz_spark import tables
    from marketviz_spark.datapipe.similarity import ivf_train
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    a = sorted(
        (r["cell"], tuple(r["c_v"]), r["c_norm"])
        for r in ivf_train(emb).collect()
    )
    b = sorted(
        (r["cell"], tuple(r["c_v"]), r["c_norm"])
        for r in ivf_train(emb).collect()
    )
    assert a == b


def test_ivf_nprobe2_recall_strictly_improves(spark):
    """Probing the 2 nearest cells must strictly beat probing only
    the home cell: nprobe=2 reaches neighbors across the query's
    cell boundary. Deterministic data + training → exact measured
    recalls (0.235 vs 0.388 on this fixture), so strict > is safe."""
    from marketviz_spark import tables
    from marketviz_spark.datapipe.similarity import cosine_topk, ivf_topk
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    exact = {
        (r.vec_id, r.neighbor_id) for r in cosine_topk(emb, k=3).collect()
    }
    p1 = {
        (r.vec_id, r.neighbor_id)
        for r in ivf_topk(emb, k=3, nprobe=1).collect()
    }
    p2 = {
        (r.vec_id, r.neighbor_id)
        for r in ivf_topk(emb, k=3, nprobe=2).collect()
    }
    assert len(exact & p2) / len(exact) > len(exact & p1) / len(exact)
    # nprobe only ever widens the candidate set per query, so the
    # approximation stays sound: every returned pair shares a probed
    # cell, and recall is monotone in nprobe.
    assert len(exact & p2) >= len(exact & p1)


def test_bucket_pairs_degenerate_bucket_bounded(spark):
    """A 1k-copy degenerate fixture must complete with streamed pair
    generation (no O(b^2) single-row array) and produce exactly
    C(1000,2) pairs; past the cap the bucket is refused and surfaces
    via bucket_overflow_keys."""
    from pyspark.sql import functions as F

    from marketviz_spark.datapipe.dedup import (
        _bucket_pairs,
        bucket_overflow_keys,
    )

    stacked = spark.range(1000).select(
        F.lit(0).alias("band"),
        F.lit("k").alias("key"),
        F.col("id").alias("item"),
    )
    assert _bucket_pairs(stacked).count() == 1000 * 999 // 2
    assert bucket_overflow_keys(stacked).count() == 0

    # same bucket, cap below its size -> no pairs, one overflow key
    assert _bucket_pairs(stacked, max_bucket=500).count() == 0
    ov = bucket_overflow_keys(stacked, max_bucket=500).collect()
    assert [(r.band, r.key, r.n_items) for r in ov] == [(0, "k", 1000)]


def test_bucket_pairs_ordering_and_small_buckets(spark):
    """Pairs are (min, max)-ordered per sorted bucket, across
    multiple buckets."""
    from pyspark.sql import functions as F

    from marketviz_spark.datapipe.dedup import _bucket_pairs

    rows = [(0, "x", 3), (0, "x", 1), (0, "x", 2), (1, "y", 9), (1, "y", 5)]
    stacked = spark.createDataFrame(
        rows, "band int, key string, item long"
    )
    got = {(r.a, r.b) for r in _bucket_pairs(stacked).collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (5, 9)}


def test_dedup_clusters_reliable_checkpoint(spark, tmp_path):
    """Reliable checkpoint() and localCheckpoint() converge to the
    identical clustering."""
    from marketviz_spark.datapipe.dedup import dedup_clusters

    docs = _docs(
        spark,
        [BASE, BASE + " x", "another doc entirely", BASE + " y"],
    )
    local = sorted(map(str, dedup_clusters(docs).collect()))
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    reliable = sorted(
        map(str, dedup_clusters(docs, reliable_checkpoint=True).collect())
    )
    assert local == reliable


def test_mm_payload_first_byte_non_ascii(spark):
    """Spark payload features and the DuckDB oracle must agree on
    BYTE semantics for non-ASCII and empty documents (the oracle
    previously used ascii() = first code point)."""
    import duckdb

    from marketviz_spark.datapipe.multimodal import (
        payload_features,
        to_media,
    )
    from marketviz_spark.registry import QUERIES

    texts = ["hello", "éclair", "", "日本 text"]
    docs = _docs(spark, texts)
    got = sorted(
        (r.doc_id, r.n_bytes, r.payload_md5, r.first_byte)
        for r in payload_features(to_media(docs)).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            QUERIES["mm_payload_features"].oracle
        ).fetchall()
    )
    assert got == want


def test_embedding_near_pairs_sound_and_multi_table_recall(spark):
    """Every emitted pair must truly clear the cosine threshold
    (soundness), and OR-ing 4 LSH tables must recall at least as
    many true pairs as any single table (the amplification
    argument), strictly more on this fixture."""
    from marketviz_spark import tables
    from marketviz_spark.datapipe.similarity import (
        NEAR_DUP_COSINE,
        cosine_topk,
        embedding_near_pairs,
    )
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    multi = embedding_near_pairs(emb).collect()
    assert multi, "fixture must produce near-dup pairs"
    assert all(r["cosine"] >= NEAR_DUP_COSINE for r in multi)
    assert all(r["doc_a"] < r["doc_b"] for r in multi)

    single = embedding_near_pairs(emb, n_tables=1).collect()
    assert {(r.doc_a, r.doc_b) for r in single} <= {
        (r.doc_a, r.doc_b) for r in multi
    } or len(single) <= len(multi)
    assert len(multi) > len(single)


def test_bpe_tokens_diverge_from_whitespace(spark):
    """On punctuation/contraction/number-heavy text the BPE-ish
    pretokenizer must split more finely than whitespace, and Spark's
    Java-regex counts must equal DuckDB's RE2 counts cell-for-cell."""
    import duckdb

    from marketviz_spark.datapipe.textstats import token_counts
    from marketviz_spark.registry import QUERIES

    texts = [
        "it's a well-known fact: 42 isn't 'nothing'!",
        "plain words only here",
        "a1b2c3 ... (x+y)=z",
    ]
    docs = _docs(spark, texts)
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens, r.bpe_per_word)
        for r in token_counts(docs).collect()
    }
    assert got[0][1] > got[0][0]  # punctuation splits
    assert got[1][1] == got[1][0]  # plain words: identical
    assert got[2][1] > got[2][0]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en')",
        list(enumerate(texts)),
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            QUERIES["text_token_bpe"].oracle
        ).fetchall()
    }
    assert got == want


def test_bucket_cap_is_engine_identical_on_overflow(spark, tmp_path):
    """The MAX_BUCKET pairing cap is part of the query CONTRACT:
    on data with an over-cap bucket (mass-duplicated boilerplate),
    the Spark engine and the DuckDB oracle must still produce the
    same pairs — the degenerate bucket is refused by both, while
    genuine near-dup pairs survive."""
    import duckdb
    import pandas as pd

    from marketviz_spark.datapipe.dedup import (
        MAX_BUCKET,
        lsh_candidate_pairs,
    )
    from marketviz_spark.registry import QUERIES

    boiler = (
        "spam spam lovely spam wonderful spam bakery fresh bread daily"
    )
    near_a = (
        "the quick brown fox jumps over the lazy dog in the morning sun"
    )
    near_b = (
        "the quick brown fox jumps over the lazy dog in the evening sun"
    )
    rows = [
        (i, boiler, "en", "dup", len(boiler))
        for i in range(MAX_BUCKET + 1)
    ]
    rows += [
        (90001, near_a, "en", "uniq", len(near_a)),
        (90002, near_b, "en", "uniq", len(near_b)),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq_path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(pq_path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq_path}'")
    du = con.execute(QUERIES["dedup_lsh_pairs"].oracle).fetchdf()
    sp = lsh_candidate_pairs(spark.createDataFrame(pdf)).toPandas()
    sp_pairs = set(map(tuple, sp[["doc_a", "doc_b"]].values))
    du_pairs = set(map(tuple, du[["doc_a", "doc_b"]].values))
    assert sp_pairs == du_pairs
    # the 2001-doc bucket contributed nothing; the near pair survived
    assert sp_pairs == {(90001, 90002)}


def test_dedup_clusters_multi_merges_via_embedding_edge(spark):
    """Two docs with UNRELATED texts but near-identical embeddings
    must land in one cluster only under the multimodal variant: the
    text-only graph keeps them apart, the embedding edge merges
    them. A third doc unrelated in both modalities stays isolated."""
    from marketviz_spark.datapipe.dedup import (
        dedup_clusters,
        dedup_clusters_multi,
    )
    from marketviz_spark.datapipe.similarity import EMB_DIM

    docs = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten eleven",
            "completely different content about weather and mountains",
        ],
    )
    v0 = [1.0] + [0.0] * (EMB_DIM - 1)
    v1 = [1.0, 0.01] + [0.0] * (EMB_DIM - 2)
    v2 = [0.0] * (EMB_DIM - 1) + [1.0]
    emb = spark.createDataFrame(
        [(0, v0), (1, v1), (2, v2)],
        "vec_id long, embedding array<float>",
    )
    text_only = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs).collect()
    }
    multi = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters_multi(docs, emb).collect()
    }
    assert text_only == {0: 0, 1: 1, 2: 2}  # texts unrelated
    assert multi == {0: 0, 1: 0, 2: 2}  # embedding edge merges 0-1


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_image_pil_branch_via_injected_module():
    """The Pillow branch of _decode, exercised with an injected
    image module (so it runs with or without Pillow installed):
    successful opens return real dimensions, failed opens flow down
    the error channel as ok=False rows — never an exception."""
    from marketviz_spark.datapipe.multimodal import (
        _decode,
        _image_module,
    )

    # env truth: the probe returns the real module iff Pillow exists
    assert (_image_module() is not None) == _pil_available()

    class FakeImage:
        width, height = 640, 480

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImageModule:
        @staticmethod
        def open(buf):
            if buf.read(4) == b"\x89PNG":
                return FakeImage()
            raise OSError("cannot identify image file")

    ok = _decode(b"\x89PNG....", image_mod=FakeImageModule)
    assert ok == (640, 480, True, None)
    bad = _decode(b"not an image", image_mod=FakeImageModule)
    assert bad[2] is False and "decoding failed" in bad[3]


def test_decode_image_real_pil_branch(spark):
    """REAL decode path (r8 ADVICE/VERDICT item 7): when Pillow is
    installed, _decode must open actual image bytes and the
    decode_image operator must emit real dimensions end-to-end.
    Skipped (not faked) where Pillow is absent — the sandbox has no
    media libs, but an environment that does exercises this branch
    so it cannot bit-rot unnoticed."""
    import pytest

    if not _pil_available():
        pytest.skip("Pillow not installed in this environment")
    import io

    from PIL import Image

    from marketviz_spark.datapipe.multimodal import (
        _decode,
        decode_image,
    )

    buf = io.BytesIO()
    Image.new("RGB", (5, 3)).save(buf, format="PNG")
    png = buf.getvalue()
    assert _decode(png) == (5, 3, True, None)
    corrupt = png[:20]  # truncated container -> error channel
    w, h, ok, err = _decode(corrupt)
    assert ok is False and err and "decoding failed" in err

    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(corrupt))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_image(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["ok"]) == (
        5,
        3,
        True,
    )
    assert rows[2]["ok"] is False


def test_frame_sample_chunks_and_tail(spark):
    """Every 4th 64-byte chunk is kept, the short tail chunk
    survives, and frame_md5 matches a driver-side recomputation."""
    import hashlib

    from marketviz_spark.datapipe.multimodal import (
        sample_frames,
        to_media,
    )

    text = "A" * 300  # frames at byte 0 (64B) and byte 256 (44B tail)
    docs = _docs(spark, [text])
    rows = sorted(
        sample_frames(to_media(docs)).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["n_bytes"]) for r in rows] == [
        (0, 64),
        (4, 44),
    ]
    assert rows[0]["frame_md5"] == hashlib.md5(b"A" * 64).hexdigest()
    assert rows[1]["frame_md5"] == hashlib.md5(b"A" * 44).hexdigest()


def test_resize_plan_aspect_and_no_upscale(spark):
    """Resize arithmetic: longer side capped at max_side with aspect
    preserved (floor), small images pass through unscaled, failed
    decodes keep the error channel."""
    from marketviz_spark.datapipe.multimodal import resize_plan

    decoded = spark.createDataFrame(
        [
            (1, 1024, 512, True, None),
            (2, 100, 50, True, None),
            (3, None, None, False, "decoding failed: boom"),
        ],
        "doc_id long, width int, height int, ok boolean, err string",
    )
    out = {r["doc_id"]: r for r in resize_plan(decoded).collect()}
    assert (out[1]["out_width"], out[1]["out_height"]) == (256, 128)
    assert out[1]["scaled"] is True
    assert (out[2]["out_width"], out[2]["out_height"]) == (100, 50)
    assert out[2]["scaled"] is False
    assert out[3]["out_width"] is None and out[3]["err"] is not None


def test_minhash_estimate_keeps_overcap_only_pairs(spark):
    """A candidate pair whose ONLY shared shingles are over the DF
    cap must stay in the sketch audit with jaccard 0 — est~1/true=0
    boilerplate collisions are exactly the sketch error the audit
    exists to expose; an inner join would silently drop them."""
    from marketviz_spark.datapipe.dedup import minhash_jaccard_estimate

    boiler = "all rights reserved worldwide do not copy this text"
    texts = [boiler, boiler, boiler, boiler]  # identical: all bands collide
    docs = _docs(spark, texts)
    rows = minhash_jaccard_estimate(docs, df_cap=3).collect()
    assert rows, "over-cap-only candidate pairs must not vanish"
    for r in rows:
        assert r["jaccard"] == 0.0  # rare-shingle space is empty
        assert r["est_jaccard"] == 1.0  # identical signatures
        assert r["abs_err"] == 1.0  # the error the audit must show


def test_multimodal_null_payload_error_channel(spark):
    """A NULL payload (the columns are nullable) must flow through
    every mapInPandas operator — null features, an error-channel
    decode row, zero frames — never a Python-worker crash."""
    from marketviz_spark.datapipe.multimodal import (
        decode_image,
        payload_features,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"real bytes"), "text/plain"), (2, None, None)],
        "doc_id long, payload binary, mime string",
    )
    feats = {r["doc_id"]: r for r in payload_features(media).collect()}
    assert feats[1]["n_bytes"] == 10
    assert feats[2]["n_bytes"] is None and feats[2]["payload_md5"] is None
    dec = {r["doc_id"]: r for r in decode_image(media).collect()}
    assert dec[2]["ok"] is False and dec[2]["err"] == "null payload"
    frames = sample_frames(media).collect()
    assert {r["doc_id"] for r in frames} == {1}


def test_ann_recall_bounds_and_arithmetic(spark):
    """Recall is bounded by [0, 1e6], n_exact == k * n_queries, and
    recall_ppm is exactly floor(n_hits*1e6/n_exact). Noisy clusters
    near a hyperplane boundary legitimately give recall < 1e6 (bucket
    splits are the cost the audit exists to measure), so this test
    pins the accounting, not a recall value."""
    import numpy as np

    from marketviz_spark.datapipe.similarity import EMB_DIM, ann_recall

    rng = np.random.default_rng(7)
    rows = []
    for label, center in ((0, 1.0), (1, -1.0)):
        base = np.full(EMB_DIM, center, dtype=np.float64)
        for i in range(6):
            v = base + rng.normal(0, 1e-3, EMB_DIM)
            rows.append(
                (label * 100 + i, [float(x) for x in v], label)
            )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in ann_recall(emb, k=3).collect()}
    for label in (0, 1):
        r = out[label]
        assert r["n_queries"] == 6
        assert r["n_exact"] == 18  # k * n_queries
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert r["recall_ppm"] == r["n_hits"] * 1_000_000 // r["n_exact"]


def test_ann_recall_perfect_on_identical_vectors(spark):
    """Identical vectors share one LSH bucket by construction (every
    hyperplane dot is bit-identical), so the approx candidate set
    contains the full corpus and recall must be exactly 1e6."""
    from marketviz_spark.datapipe.similarity import EMB_DIM, ann_recall

    v = [1.0] * EMB_DIM
    emb = spark.createDataFrame(
        [(i, v, 0) for i in range(8)],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = ann_recall(emb, k=3).collect()
    assert r["n_queries"] == 8 and r["n_exact"] == 24
    assert r["recall_ppm"] == 1_000_000, r


def test_cluster_size_histogram_partitions_corpus(spark):
    """The histogram partitions the corpus exactly: sum(n_docs) ==
    total documents, dup_docs == n_docs - n_clusters per row, and a
    corpus with one duplicated pair yields exactly one size-2 row."""
    from marketviz_spark.datapipe.dedup import cluster_size_histogram
    from tests.test_curation import _docs

    base = " ".join(f"tok{i}" for i in range(60))
    rows = [(1, base, "a"), (2, base, "a")] + [
        (10 + i, f"solo{i} unique{i} " * 20, "b") for i in range(6)
    ]
    out = cluster_size_histogram(_docs(spark, rows)).collect()
    assert sum(r["n_docs"] for r in out) == len(rows)
    for r in out:
        assert r["dup_docs"] == r["n_docs"] - r["n_clusters"]
    two = [r for r in out if r["cluster_size"] == 2]
    assert len(two) == 1 and two[0]["n_clusters"] == 1


def test_bpe_merge_pairs_counts_and_rank(spark):
    """Adjacent-pair mining: 'a b' appears 3x (twice in doc0 via
    overlap-free repeats, once in doc1), single-token and empty docs
    contribute nothing, rank is (count desc, pair asc)."""
    from marketviz_spark.datapipe.textstats import merge_pair_topk

    docs = _docs(
        spark,
        [
            "a b c a b",   # pairs: a b, b c, c a, a b
            "a b",         # pair: a b
            "solo",        # no pair
            "",            # no pair
        ],
    )
    rows = merge_pair_topk(docs, k=10).collect()
    got = {r["pair"]: (r["n_occ"], r["rank"]) for r in rows}
    assert got["a b"] == (3, 1)
    assert got["b c"] == (1, 2)  # ties by pair asc: 'b c' < 'c a'
    assert got["c a"] == (1, 3)
    assert len(rows) == 3


def test_embedding_decontaminate_flags_near_eval(spark):
    """A corpus vector equal to an eval vector is contaminated
    (cosine 1.0); an orthogonal one is not; eval vectors themselves
    (vec_id % mod == 0) never appear in the output."""
    from marketviz_spark.datapipe.similarity import (
        embedding_decontaminate,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # eval (id % 4 == 0)
        (1, [1.0, 0.0, 0.0, 0.0], 0),   # corpus == eval -> hit
        (2, [0.0, 1.0, 0.0, 0.0], 1),   # orthogonal -> clean
        (3, [0.9, 0.1, 0.0, 0.0], 0),   # cos ~0.994 -> hit
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r["vec_id"]: r
        for r in embedding_decontaminate(
            emb, eval_mod=4, tau=0.9
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["contaminated"] and got[1]["max_eval_cosine"] == 1.0
    assert not got[2]["contaminated"] and got[2]["n_eval_hits"] == 0
    assert got[3]["contaminated"] and got[3]["n_eval_hits"] == 1


def test_embedding_decontaminate_empty_eval_all_clean(spark):
    """An empty eval slice (no vec_id hits the modulus) must report
    EVERY corpus row clean with n_eval_hits=0 — not silently return
    an empty audit (ADVICE r6: the cross join dropped all rows)."""
    from marketviz_spark.datapipe.similarity import (
        embedding_decontaminate,
    )

    emb = spark.createDataFrame(
        [
            (i, [float(i), 1.0, 0.0, 0.0], i % 2)
            for i in (1, 2, 3, 5, 7)  # none divisible by 50
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = embedding_decontaminate(emb).collect()
    assert {r["vec_id"] for r in rows} == {1, 2, 3, 5, 7}
    for r in rows:
        assert r["n_eval_hits"] == 0
        assert not r["contaminated"]
        assert r["max_eval_cosine"] is None


def test_dedup_clusters_reliable_checkpoint_path(spark, tmp_path):
    """The fault-tolerant branch (DataFrame.checkpoint to a real
    checkpoint dir, the cluster deployment mode) must produce labels
    identical to the localCheckpoint default."""
    from marketviz_spark.datapipe.dedup import dedup_clusters

    docs = _docs(
        spark,
        [BASE, BASE + " x", BASE + " y", "something entirely else ok"],
    )
    local = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters(docs).collect()
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    reliable = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters(
            docs, reliable_checkpoint=True
        ).collect()
    )
    assert reliable == local and len(local) == 4


def test_embedding_decontaminate_refuses_oversized_eval(spark):
    """The collected eval matrix is driver-held (model-sized); an
    eval slice over eval_cap must refuse loudly, naming the
    candidate path, instead of densifying a corpus-sized audit."""
    import pytest

    from marketviz_spark.datapipe.similarity import (
        embedding_decontaminate,
    )

    emb = spark.createDataFrame(
        [(i * 4, [1.0, 0.0], 0) for i in range(6)]  # all eval
        + [(1, [1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    with pytest.raises(ValueError, match="dedup_embedding_pairs"):
        embedding_decontaminate(emb, eval_mod=4, eval_cap=5).count()
    assert (
        embedding_decontaminate(emb, eval_mod=4, eval_cap=6).count()
        == 1
    )


# ---------------------------------------------------------------------
# Hashed-linear quality classifier (quality_model.py)
# ---------------------------------------------------------------------


def _qm_expected(text):
    """Independent pure-python mirror of the scoring contract —
    deliberately NOT importing the module's helpers, so a silent
    constant or order change in either side fails the test."""
    import math
    import re

    toks = [t for t in re.split("[^a-z]+", text.lower()) if t]
    n = len(toks)
    w_sum = 0
    for tok in toks:
        char_sum = sum(ord(c) for c in tok)
        bucket = (char_sum * 2654435761 + len(tok) * 97) % 256
        w_sum += (bucket * 2654435761) % 1000003 - 500001
    if n == 0:
        return 0, 0, 0.0, False
    score = math.floor(w_sum * 1e6 / (n * 1000003.0) + 0.5) / 1e6
    return n, w_sum, score, score > 0.0


def test_quality_scores_known_values(spark):
    from marketviz_spark.datapipe.quality_model import quality_scores

    texts = [
        "spark",
        "Hello, world! 42",
        "the quick brown fox JUMPS over 9 lazy dogs",
    ]
    docs = _docs(spark, texts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["w_sum"], r["q_score"], r["keep"])
        for r in quality_scores(docs).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _qm_expected(t), (i, t)


def test_quality_scores_degenerate_inputs(spark):
    """NULL text -> NULL token metrics, score 0.0, keep false;
    letterless text -> 0 tokens, 0 sum, 0.0, false (no ANSI
    divide-by-zero) — the textstats.text_stats convention."""
    from marketviz_spark.datapipe.quality_model import quality_scores

    docs = spark.createDataFrame(
        [(0, None, "en", "s", 0), (1, "!!! 123 ?", "en", "s", 9),
         (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["w_sum"], r["q_score"], r["keep"])
        for r in quality_scores(docs).collect()
    }
    assert got[0] == (None, None, 0.0, False)
    assert got[1] == (0, 0, 0.0, False)
    assert got[2] == (0, 0, 0.0, False)


def _keyed_exchanges(plan: str) -> int:
    """Exchange count EXCLUDING the r13 conditional fan-out's
    round-robin exchange (tables.fan_out widens a sub-parallelism
    local scan; it vanishes at real scale where the scan has >=
    parallelism splits), so map-only / single-shuffle contracts pin
    the shuffles that exist at 100 TB."""
    return plan.count("Exchange") - plan.count(
        "Exchange RoundRobinPartitioning"
    )


def test_quality_classifier_plan_is_map_only(spark):
    """The scoring query's executed plan must stay a single
    shuffle-free projection: no Exchange, no Python eval — the
    100 TB contract of a learned gate (weights broadcast, not
    joined). The staged projections must also hold: higher-order
    folds are CodegenFallback (re-evaluated per reference), so the
    tokenize and the weight fold may appear EXACTLY ONCE in the
    plan — a regression to single-select inlining shows up as 4
    folds / 8 tokenizes."""
    from marketviz_spark.registry import QUERIES

    df = QUERIES["quality_classifier"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert _keyed_exchanges(plan) == 0
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert plan.count("aggregate(transform(") == 1
    assert plan.count("split(lower(") == 1


def test_quality_classifier_trained_plan_is_map_only(spark):
    """The TRAINED-coefficient registry twin keeps the same plan
    contract as the pseudo-weight path: one codegen'd scan — no
    Exchange, no Python eval, the weight array a literal in the
    plan (no join), and the staged projections intact (one
    tokenize, one fold)."""
    from marketviz_spark.registry import QUERIES

    df = QUERIES["quality_classifier_trained"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert _keyed_exchanges(plan) == 0  # no shuffle, no broadcast table
    assert "Join" not in plan  # weights ride as a literal, not a dim
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert plan.count("aggregate(transform(") == 1
    assert plan.count("split(lower(") == 1


def test_keep_rate_by_source_matches_per_doc_gate(spark):
    from marketviz_spark.datapipe.quality_model import (
        keep_rate_by_source,
        quality_scores,
    )

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta doc {i} unique words here", "en",
             "srcA" if i % 2 else "srcB", 30)
            for i in range(10)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    per_doc = quality_scores(docs, passthrough=("source",)).collect()
    want = {}
    for r in per_doc:
        d = want.setdefault(r["source"], [0, 0])
        d[0] += 1
        d[1] += 1 if r["keep"] else 0
    got = {
        r["source"]: (r["n_docs"], r["n_kept"], r["keep_rate"])
        for r in keep_rate_by_source(docs).collect()
    }
    import math

    for src, (n, k) in want.items():
        assert got[src] == (
            n, k, math.floor(k * 1e6 / n + 0.5) / 1e6
        )


def test_quality_scores_trained_weights(spark):
    """The production path: a trained HASH_DIM coefficient vector
    shipped as one array literal. A one-hot weight on the bucket of
    'spark' must score exactly the token-frequency mean of that
    bucket, and the plan must stay shuffle- and Python-free."""
    from marketviz_spark.datapipe.quality_model import (
        HASH_DIM,
        quality_scores,
    )

    # bucket of 'spark' via the independent python mirror
    char_sum = sum(ord(c) for c in "spark")
    b = (char_sum * 2654435761 + len("spark") * 97) % 256
    w = [0.0] * HASH_DIM
    w[b] = 1.0

    def mirror_score(text):
        import math

        toks = text.split()
        hits = sum(
            1
            for tok in toks
            if (sum(ord(c) for c in tok) * 2654435761 + len(tok) * 97)
            % 256
            == b
        )
        return math.floor(hits * 1e6 / len(toks) + 0.5) / 1e6

    texts = ["spark spark", "no matching token here"]
    docs = _docs(spark, texts)
    df = quality_scores(docs, weights=w)
    got = {r["doc_id"]: (r["q_score"], r["keep"]) for r in df.collect()}
    assert got[0] == (1.0, True)  # 2 hits / 2 tokens
    # the control doc scores exactly its (possibly collision-driven)
    # bucket-hit frequency — asserted via the independent mirror
    exp1 = mirror_score(texts[1])
    assert got[1] == (exp1, exp1 > 0.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan

    import pytest

    with pytest.raises(ValueError, match="HASH_DIM"):
        quality_scores(docs, weights=[0.0])


def test_lm_doc_likelihood_hand_corpus(spark):
    """Hand-checkable 3-doc corpus: uni a:3 b:3 c:1 (V=3), bigrams
    (a,b):3 (b,a):1. d0 'a b a b' -> mean(4/6, 2/6, 4/6) =
    10/18 -> 0.555556; d1 'a b' -> 4/6 -> 0.666667; d2 'c' has no
    bigram -> zeros; NULL text -> zeros."""
    from marketviz_spark.datapipe.lm import doc_lm_likelihood

    docs = spark.createDataFrame(
        [
            (0, "a b a b", "en", "s", 7),
            (1, "a b", "en", "s", 3),
            (2, "c", "en", "s", 1),
            (3, None, "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["oov_bigrams"], r["lm_score"])
        for r in doc_lm_likelihood(docs).collect()
    }
    assert got[0] == (3, 0, 0.555556)
    assert got[1] == (1, 0, 0.666667)
    assert got[2] == (0, 0, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_lm_score_order_free_under_repartition(spark):
    """The position-ordered fold must make lm_score invariant to
    physical layout: the same corpus scored at 1 and 16 partitions
    is bit-identical (not approx)."""
    from marketviz_spark.datapipe.lm import doc_lm_likelihood
    from marketviz_spark import tables

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    a = {
        r["doc_id"]: r["lm_score"]
        for r in doc_lm_likelihood(docs.coalesce(1)).collect()
    }
    b = {
        r["doc_id"]: r["lm_score"]
        for r in doc_lm_likelihood(docs.repartition(16)).collect()
    }
    assert a == b


def test_read_documents_jsonl_routes_bad_lines(spark, tmp_path):
    """JSONL ingest gate: parse-level corruption and contract
    violations (missing doc_id / text) land in the bad channel with
    reasons; good rows come back with the exact documents schema;
    nothing is silently dropped (good + bad == lines)."""
    from marketviz_spark.datapipe.ingest import read_documents_jsonl

    p = tmp_path / "corpus.jsonl"
    lines = [
        '{"doc_id": 1, "text": "alpha beta", "lang": "en",'
        ' "source": "s", "n_chars": 10}',
        '{"doc_id": 2, "text": "gamma", "lang": "en",'
        ' "source": "s", "n_chars": 5}',
        '{"doc_id": 3, "text": "truncated...',          # broken JSON
        '{"text": "no id here", "lang": "en", "source": "s",'
        ' "n_chars": 10}',                               # missing doc_id
        '{"doc_id": 5, "lang": "en", "source": "s",'
        ' "n_chars": 0}',                                # missing text
    ]
    p.write_text("\n".join(lines) + "\n")

    good, bad = read_documents_jsonl(spark, str(p))
    g = {r["doc_id"]: r["text"] for r in good.collect()}
    assert g == {1: "alpha beta", 2: "gamma"}
    assert [f.name for f in good.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    reasons = sorted(r["reason"] for r in bad.collect())
    assert reasons == [
        "missing doc_id", "missing text", "unparseable json",
    ]
    # the corrupt row keeps its raw line for forensics
    raws = {r["reason"]: r["raw"] for r in bad.collect()}
    assert raws["unparseable json"].startswith('{"doc_id": 3')
    # and the scorers downstream accept the good channel unchanged
    from marketviz_spark.datapipe.quality_model import quality_scores

    assert quality_scores(good).count() == 2


def test_stream_documents_jsonl_matches_batch_gate(spark, tmp_path):
    """Stream == batch replay parity for the JSONL ingest gate: the
    same landing files streamed one-per-trigger through
    stream_documents_jsonl produce exactly the batch reader's good
    and bad channels (modulo the (run, epoch) idempotence
    columns)."""
    from marketviz_spark.datapipe.ingest import (
        read_documents_jsonl,
        stream_documents_jsonl,
    )

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha beta", "lang": "en",'
        ' "source": "s", "n_chars": 10}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    (land / "b.jsonl").write_text(
        '{"doc_id": 2, "text": "gamma", "lang": "en",'
        ' "source": "s", "n_chars": 5}\n'
        '{"text": "no id", "lang": "en", "source": "s",'
        ' "n_chars": 5}\n'
    )

    good_dir = str(tmp_path / "good")
    bad_dir = str(tmp_path / "bad")
    q = stream_documents_jsonl(
        spark, str(land), good_dir, bad_dir, str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sg = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(good_dir).collect()
    )
    sb = sorted(r["reason"] for r in spark.read.parquet(bad_dir).collect())

    bg, bb = read_documents_jsonl(spark, str(land))
    assert sg == sorted((r["doc_id"], r["text"]) for r in bg.collect())
    assert sb == sorted(r["reason"] for r in bb.collect())
    assert sb == ["missing doc_id", "unparseable json"]


def test_read_documents_jsonl_cache_ownership(spark, tmp_path):
    """The reader's cached parent scan is owned by the returned
    JsonlIngest: unpersisting the derived channels would NOT release
    it (they are children of the cached frame), so the result object
    exposes .unpersist() on the parent itself — and tuple-unpacking
    compatibility is preserved."""
    from marketviz_spark.datapipe.ingest import read_documents_jsonl

    p = tmp_path / "c.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "a b", "lang": "en", "source": "s",'
        ' "n_chars": 3}\n'
    )
    res = read_documents_jsonl(spark, str(p))
    good, bad = res  # unpacking still works
    assert good.count() == 1 and bad.count() == 0
    assert res.source.storageLevel.useMemory  # parent IS cached
    res.unpersist(blocking=True)
    assert not res.source.storageLevel.useMemory  # and releasable


def test_stream_documents_jsonl_restart_replay_no_dups(spark, tmp_path):
    """Restart-replay idempotence: a crash between the sink write
    and the commit-log write makes Structured Streaming re-execute
    that epoch on restart. Because the run token is persisted under
    the checkpoint dir, the replayed epoch lands on the SAME
    (run, epoch) partition and dynamic-partition-overwrite rewrites
    it — no duplicate rows, one run generation on disk. (Before
    round 10 the token was minted per start(), so exactly this path
    duplicated the whole epoch under a second run id.)"""
    import os

    from marketviz_spark.datapipe.ingest import (
        read_documents_jsonl,
        stream_documents_jsonl,
    )

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s",'
        ' "n_chars": 5}\n'
        '{"doc_id": 9, "text": "bad line...\n'
    )
    good_dir = str(tmp_path / "good")
    bad_dir = str(tmp_path / "bad")
    ck = tmp_path / "ck"

    q = stream_documents_jsonl(
        spark, str(land), good_dir, bad_dir, str(ck)
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # Simulate the crash: epoch 0's sink write survived, its commit
    # record did not — delete the newest commit-log entry so the
    # restart replays that epoch with the SAME epoch id.
    commits = sorted(
        f for f in os.listdir(ck / "commits") if not f.startswith(".")
    )
    os.remove(ck / "commits" / commits[-1])
    crc = ck / "commits" / f".{commits[-1]}.crc"
    if crc.exists():  # local ChecksumFileSystem sidecar must go too
        os.remove(crc)

    # New data lands between crash and restart.
    (land / "b.jsonl").write_text(
        '{"doc_id": 2, "text": "beta", "lang": "en", "source": "s",'
        ' "n_chars": 4}\n'
    )
    q2 = stream_documents_jsonl(
        spark, str(land), good_dir, bad_dir, str(ck)
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    good = spark.read.parquet(good_dir)
    rows = sorted(
        (r["doc_id"], r["text"]) for r in good.collect()
    )
    assert rows == [(1, "alpha"), (2, "beta")]  # replay did NOT dup
    assert good.select("run").distinct().count() == 1  # one token
    bad = spark.read.parquet(bad_dir)
    assert bad.count() == 1  # the broken line, exactly once
    assert bad.select("run").distinct().count() == 1

    # And the end state equals the batch gate over the same landing
    # dir — the stream==batch contract survives the restart.
    bg, bb = read_documents_jsonl(spark, str(land))
    assert rows == sorted(
        (r["doc_id"], r["text"]) for r in bg.collect()
    )
    assert bb.count() == 1


def test_lm_heldout_empty_train_is_defined(spark):
    """An empty training slice (V=0) is a defined case — every p is
    0.0 and every bigram is OOV — never an engine-divergent Inf
    (1/0.0) reaching floor()."""
    from marketviz_spark.datapipe.lm import doc_lm_likelihood

    docs = spark.createDataFrame(
        [(0, "a b c", "en", "srcX", 5), (1, "b c", "en", "srcY", 3)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["oov_bigrams"], r["lm_score"])
        for r in doc_lm_likelihood(
            docs, train_docs=docs.filter(F.col("source") == "src0")
        ).collect()
    }
    assert out == {0: (2, 2, 0.0), 1: (1, 1, 0.0)}


def test_lm_heldout_oov_counts_unseen_transitions(spark):
    """Train on doc 0 ('a b c'), score doc 1 ('c a x b'): the
    transitions c->a, a->x, x->b are unseen (oov=3); its smoothed
    probabilities back off — unseen w1 'x' to the Laplace floor
    1/V."""
    import math

    from marketviz_spark.datapipe.lm import doc_lm_likelihood

    docs = spark.createDataFrame(
        [(0, "a b c", "en", "seed", 5), (1, "c a x b", "en", "web", 7)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["oov_bigrams"], r["lm_score"])
        for r in doc_lm_likelihood(
            docs, train_docs=docs.filter(F.col("source") == "seed")
        ).collect()
    }
    # train: uni a/b/c = 1 each, V=3; bigrams (a,b),(b,c) = 1 each
    # doc0: p(a->b)=2/4, p(b->c)=2/4 -> mean 0.5, oov 0
    assert out[0] == (2, 0, 0.5)
    # doc1: c->a (0+1)/(1+3), a->x (0+1)/(1+3), x->b (0+1)/(0+3)
    ps = [1 / 4, 1 / 4, 1 / 3]
    s = 0.0
    for p in ps:
        s += p
    want = math.floor(s * 1e6 / 3 + 0.5) / 1e6
    assert out[1] == (3, 3, want)


def test_winnowing_guarantee_and_edges(spark):
    """The winnowing contract (Schleimer SIGMOD'03): any shared
    substring of length >= K + W - 1 chars is caught by at least
    one shared fingerprint; disjoint texts share nothing; texts
    shorter than K + W - 1 produce no fingerprints; NULL text is
    dropped."""
    from marketviz_spark.datapipe.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
        winnowing_shared_report,
    )

    guarantee = WINNOW_K + WINNOW_W - 1  # 11 chars
    shared = "qwertyuiopasdfghjkl"  # 19 chars >> guarantee
    docs = spark.createDataFrame(
        [
            (0, "AAA " + shared + " tail one", "en", "s", 0),
            (1, "completely different prefix " + shared, "en", "s", 0),
            (2, "zz 0123456789 zz nothing in common here", "en", "s", 0),
            (3, "short", "en", "s", 0),  # < K+W-1: no fingerprints
            (4, None, "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    assert len(shared) >= guarantee
    fps = {
        (r["doc_id"], r["fp"])
        for r in winnowing_fingerprints(docs).collect()
    }
    by_doc = {}
    for d, f in fps:
        by_doc.setdefault(d, set()).add(f)
    assert by_doc[0] & by_doc[1], "shared 19-char run must collide"
    assert not (by_doc[0] & by_doc[2]) and not (by_doc[1] & by_doc[2])
    assert 3 not in by_doc and 4 not in by_doc

    rep = winnowing_shared_report(docs).collect()
    assert rep and all(
        r["n_docs"] == 2 and r["rep_doc_id"] == 0 for r in rep
    )


# ----------------------------------------------------------------------
# Product quantization (datapipe/pq.py)
# ----------------------------------------------------------------------


def _emb(spark, vecs):
    from marketviz_spark.datapipe.pq import EMB_DIM

    rows = [
        (i, [float(x) for x in v] + [0.0] * (EMB_DIM - len(v)), 0)
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_pq_codes_known_clusters(spark):
    """Two tight clusters of vectors, K seeds drawn from them: after
    training, same-cluster vectors must share a code and the
    distortion of an exact seed copy must be ~0 in its subspaces.
    The mirror is hand-derivable: with <=K distinct vectors every
    vector IS a centroid after refinement, so sq_err == 0."""
    from marketviz_spark.datapipe.pq import pq_codes

    emb = _emb(
        spark,
        [[1.0] * 8, [1.0] * 8, [-1.0] * 8, [-1.0] * 8],
    )
    rows = {r["vec_id"]: r for r in pq_codes(emb).collect()}
    assert rows[0]["code"] == rows[1]["code"]  # identical vectors
    assert rows[2]["code"] == rows[3]["code"]
    assert rows[0]["code"] != rows[2]["code"]  # opposite clusters
    # every distinct vector seeds its own cell -> zero distortion
    assert all(r["sq_err"] == 0 for r in rows.values())


def test_pq_adc_prefers_true_neighbors(spark):
    """ADC ranking must put the geometrically-near vector first:
    query 0's nearest by construction is vector 1 (identical), then
    the slightly-perturbed 2, with the far cluster last."""
    from marketviz_spark.datapipe.pq import pq_adc_topk

    emb = _emb(
        spark,
        [
            [1.0] * 8,
            [1.0] * 8,          # identical to the query
            [1.1] * 8,          # near
            [-9.0] * 8,         # far
        ],
    )
    got = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in pq_adc_topk(emb, k=3, nq=1).collect()
    }
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 2
    assert got[(0, 3)] == 3
    # the query itself never appears
    assert 0 not in got.values()


def test_pq_degenerate_inputs(spark):
    """Schema-stable empties: an empty corpus trains an empty model
    and every downstream op returns zero rows with the contract
    schema; a single-vector corpus yields one code row and an empty
    top-k (the only candidate is the query itself)."""
    from marketviz_spark.datapipe.pq import pq_adc_topk, pq_codes

    empty = _emb(spark, []).limit(0)
    assert pq_codes(empty).count() == 0
    assert [f.name for f in pq_codes(empty).schema.fields] == [
        "vec_id", "code", "sq_err",
    ]
    tk = pq_adc_topk(empty, k=3)
    assert tk.count() == 0
    assert [f.name for f in tk.schema.fields] == [
        "q_id", "neighbor_id", "adc_dist", "rank",
    ]

    one = _emb(spark, [[0.5] * 8])
    assert pq_codes(one).count() == 1
    assert pq_adc_topk(one, k=3, nq=1).count() == 0


def test_pq_codes_plan_map_side_model_literal(spark):
    """The 100 TB contract of the PQ encoder: the model rides in
    the encode closure (no join anywhere in the plan), assignment
    is map-side — one ARROW-vectorized eval per task (r13: the
    interpreted fold chain never entered codegen; row-at-a-time
    BatchEvalPython stays banned) — and the only wide stage is the
    per-vector regroup: exactly ONE shuffle exchange."""
    from marketviz_spark.registry import QUERIES

    plan = (
        QUERIES["emb_pq_codes"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert _keyed_exchanges(plan) == 1
    assert "Generate posexplode" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_pq_topk_plan_broadcast_lut_partial_agg(spark):
    """ADC search scale shape: the LUT join is BROADCAST (never a
    sort-merge shuffle of the code table), the M subspace terms
    collapse in a partial aggregate BEFORE the (q, vec) exchange,
    and the per-query top-k pre-filters map-side via
    WindowGroupLimit."""
    from marketviz_spark.registry import QUERIES

    plan = (
        QUERIES["emb_pq_topk"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    assert "WindowGroupLimit" in plan
    # wide stages: the (q,vec) sum + the per-query window, nothing else
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BatchEvalPython" not in plan  # Arrow-vectorized encode only


def test_pq_recall_tiny_and_empty(spark):
    """With <= K distinct vectors every vector seeds its own cell,
    so ADC distances equal exact distances and recall@k is exactly
    1.0 (1,000,000 ppm). The empty corpus is a defined zero report
    — never an ANSI divide-by-zero."""
    from marketviz_spark.datapipe.pq import pq_recall

    emb = _emb(
        spark, [[1.0] * 8, [1.0] * 8, [-1.0] * 8, [2.0] * 8]
    )
    r = pq_recall(emb, k=2, nq=2).collect()[0]
    assert r["n_queries"] == 2 and r["n_exact"] == 4
    assert r["n_hits"] == 4 and r["recall_ppm"] == 1_000_000

    e = pq_recall(_emb(spark, []).limit(0), k=3).collect()[0]
    assert tuple(e) == (0, 0, 0, 0)


def test_pq_rerank_orders_exactly_and_lifts_recall(spark):
    """The refine step's contract: whatever survives the ADC
    shortlist is ordered by EXACT distance — with a shortlist
    covering the whole corpus, rerank output must equal the exact
    top-k; and reranked recall is never below plain-ADC recall."""
    from marketviz_spark.datapipe.pq import (
        pq_exact_topk,
        pq_recall,
        pq_rerank_recall,
        pq_rerank_topk,
    )

    emb = _emb(
        spark,
        [[float(i)] * 8 for i in range(6)],  # a 1-d line of vectors
    )
    exact = [
        (r["q_id"], r["neighbor_id"], r["dist"], r["rank"])
        for r in pq_exact_topk(emb, k=3, nq=2)
        .orderBy("q_id", "rank")
        .collect()
    ]
    rr = [
        (r["q_id"], r["neighbor_id"], r["dist"], r["rank"])
        for r in pq_rerank_topk(emb, k=3, nq=2, shortlist=100)
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert rr == exact  # full-corpus shortlist == exact search
    adc = pq_recall(emb, k=3, nq=2).collect()[0]["recall_ppm"]
    ref = pq_rerank_recall(emb, k=3, nq=2, shortlist=100).collect()[0][
        "recall_ppm"
    ]
    assert ref == 1_000_000 and ref >= adc


def test_pq_rerank_plan_broadcast_refine(spark):
    """Refine-step scale shape: every join is broadcast (the
    shortlist and query subvectors are audit-sized), never a
    sort-merge shuffle of the corpus; no row-at-a-time Python
    eval (the encode is the r13 Arrow-vectorized pass)."""
    from marketviz_spark.registry import QUERIES

    plan = (
        QUERIES["emb_pq_rerank_topk"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan  # Arrow-vectorized encode only


def test_stream_quality_gated_jsonl_matches_batch(spark, tmp_path):
    """Curation-at-ingest parity: the streaming quality-gated
    pipeline's three sinks must equal the batch composition of the
    same gates (split_channels -> quality_scores -> keep split),
    with the audit columns riding along and the usual (run, epoch)
    idempotence columns on every sink."""
    from marketviz_spark.datapipe.ingest import (
        read_documents_jsonl,
        stream_quality_gated_jsonl,
    )
    from marketviz_spark.datapipe.quality_model import quality_scores

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "the quick brown fox jumps high",'
        ' "lang": "en", "source": "s", "n_chars": 30}\n'
        '{"doc_id": 2, "text": "zzz", "lang": "en", "source": "s",'
        ' "n_chars": 3}\n'
        '{"doc_id": 9, "text": "broken...\n'
    )
    (land / "b.jsonl").write_text(
        '{"doc_id": 3, "text": "alpha beta gamma delta common",'
        ' "lang": "en", "source": "s", "n_chars": 29}\n'
    )

    keep_dir = str(tmp_path / "keep")
    reject_dir = str(tmp_path / "reject")
    bad_dir = str(tmp_path / "bad")
    q = stream_quality_gated_jsonl(
        spark, str(land), keep_dir, reject_dir, bad_dir,
        str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # batch twin over the same landing dir
    good, bad = read_documents_jsonl(spark, str(land))
    scored = quality_scores(
        good, passthrough=("text", "lang", "source", "n_chars")
    )
    want_keep = {
        (r["doc_id"], r["q_score"])
        for r in scored.filter("keep").collect()
    }
    want_rej = {
        (r["doc_id"], r["q_score"])
        for r in scored.filter("NOT keep").collect()
    }
    assert want_keep or want_rej  # the fixture exercises the gate

    got_keep_df = spark.read.parquet(keep_dir)
    got_keep = {
        (r["doc_id"], r["q_score"]) for r in got_keep_df.collect()
    }
    got_rej = (
        {
            (r["doc_id"], r["q_score"])
            for r in spark.read.parquet(reject_dir).collect()
        }
        if want_rej
        else set()
    )
    assert got_keep == want_keep
    assert got_rej == want_rej
    assert spark.read.parquet(bad_dir).count() == 1  # the broken line
    # audit + idempotence columns ride with the kept rows
    names = set(got_keep_df.columns)
    assert {"n_tokens", "q_score", "run", "epoch"} <= names


def test_bpe_train_hand_example(spark):
    """Hand-derivable BPE run: corpus 'aa aa ab' -> word table
    {aa: 2, ab: 1}; step 1 merges (a, a) with weight 2, step 2
    merges (a, b) with weight 1, then the pair space is dry and the
    loop stops early — greedy left-to-right semantics included
    ('aaa' would become [aa, a])."""
    from marketviz_spark.datapipe.bpe import bpe_train

    docs = _docs(spark, ["aa aa ab"])
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(docs, k=8).orderBy("step").collect()
    ]
    assert got == [(1, "a", "a", 2), (2, "a", "b", 1)]

    # greedy non-rescanning merge: 'aaa' under merge (a,a) is
    # [aa, a], so step 2 of 'aaa aaa' counts (aa, a), not (a, aa)
    got2 = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(_docs(spark, ["aaa aaa"]), k=2)
        .orderBy("step")
        .collect()
    ]
    assert got2 == [(1, "a", "a", 4), (2, "aa", "a", 2)]

    # empty corpus -> empty merge table with the contract schema
    empty = bpe_train(_docs(spark, []).limit(0), k=3)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "step", "lhs", "rhs", "pair_count",
    ]


def test_bpe_apply_vocab_segmentation(spark):
    """Apply-side contract: after training on 'aa aa ab', the word
    'aa' segments to one subword and 'ab' to one ('a b' merged at
    step 2); an untrained rare word stays at its post-merge
    granularity. Subword joins use spaces (impossible inside
    words)."""
    from marketviz_spark.datapipe.bpe import bpe_apply_vocab

    got = {
        r["w"]: (r["n_subwords"], r["subwords"])
        for r in bpe_apply_vocab(
            _docs(spark, ["aa aa ab xyz"]), k=8
        ).collect()
    }
    assert got["aa"] == (1, "aa")
    assert got["ab"] == (1, "ab")
    # 'xyz': pairs (x,y), (y,z) each weight 1 — merged in lhs/rhs
    # tiebreak order after the higher-weight merges; whatever the
    # exact order, the result must reassemble the word
    n, seg = got["xyz"]
    assert seg.replace(" ", "") == "xyz" and 1 <= n <= 3


def test_ivfpq_subset_of_adc_and_plan(spark):
    """IVF-PQ is plain ADC restricted to probed cells: every
    (q, neighbor) it returns must carry the SAME adc_dist the
    unrestricted ADC scorer assigns, and the plan must stay
    broadcast-only (probe list + LUT), never a sort-merge shuffle,
    with the group-limit top-k."""
    from marketviz_spark.datapipe.pq import (
        _adc_scored,
        ivfpq_topk,
        pq_train,
    )
    from marketviz_spark.registry import QUERIES

    # +1 offsets keep every vector off the zero point: cosine (the
    # IVF coarse quantizer's metric) is undefined for zero vectors
    emb = _emb(
        spark,
        [
            [float(i % 5) + 1.0, float(i // 5) + 1.0] + [0.0] * 6
            for i in range(20)
        ],
    )
    model = pq_train(emb)
    full = {
        (r["q_id"], r["vec_id"]): r["adc_dist"]
        for r in _adc_scored(emb, model, 4).collect()
    }
    got = ivfpq_topk(emb, k=3, nq=4).collect()
    assert got  # probed cells produce candidates on this grid
    for r in got:
        assert full[(r["q_id"], r["neighbor_id"])] == r["adc_dist"]

    plan = (
        QUERIES["emb_ivfpq_topk"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan
