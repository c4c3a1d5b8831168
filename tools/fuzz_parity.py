"""Differential fuzz harness: run the FULL registry Spark-vs-DuckDB
on a seeded EDGE-CASE dataset instead of the driver's well-behaved
testdata. The fixed tables can't exercise NULL aggregates, exact
ties, empty/whitespace/unicode text, duplicate keys, malformed
JSON, identical timestamps, or zero vectors — the places where two
engines' semantics quietly diverge (the r6 ADVICE NULL-quantile gap
is exactly this class).

Usage: python tools/fuzz_parity.py [seed] [names,...]
Writes the dataset to <repo>/.fuzzdata/seed<seed>/ and prints the
same PASS/FAIL lines as tests/run_parity.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EMB_DIM = 64


def gen_dataset(seed: int, out: str) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    # region/nation: copy the static dims (scale-independent)
    for t in ("region", "nation"):
        shutil.copyfile(
            f"/root/testdata/sf0.001/{t}.parquet",
            os.path.join(out, f"{t}.parquet"),
        )

    def _null_some(vals, frac, null=None):
        """Replace ~frac of entries with NULL."""
        return [
            null if rng.random() < frac else v for v in vals
        ]

    # --- customer / supplier / part (small dims, edgy strings) ---
    n_cust, n_supp, n_part = 40, 20, 30
    segs = ["MACHINERY", "BUILDING", "HOUSEHOLD", "FURNITURE",
            "AUTOMOBILE"]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array(
            [f"Customer#{k:09d}" if k % 7 else "O'Hara \"quoted\" 顧客"
             for k in range(n_cust)], pa.string()),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(
            _null_some(np.round(rng.random(n_cust) * 1000 - 100, 2),
                       0.1), pa.float64()),
        "c_mktsegment": pa.array(
            [segs[int(k)] for k in rng.integers(0, 5, n_cust)],
            pa.string()),
    }), os.path.join(out, "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array(
            [f"Supplier#{k:09d}" for k in range(n_supp)], pa.string()),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(
            _null_some(np.round(rng.random(n_supp) * 1000 - 100, 2),
                       0.1), pa.float64()),
    }), os.path.join(out, "supplier.parquet"))
    ptypes = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL",
              "PROMO"]
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array(
            ["tiny widget" if k % 5 else "" for k in range(n_part)],
            pa.string()),
        "p_brand": pa.array(
            [f"Brand#{int(k)}" for k in rng.integers(1, 5, n_part)],
            pa.string()),
        "p_type": pa.array(
            [ptypes[int(k)] for k in rng.integers(0, 6, n_part)],
            pa.string()),
        "p_size": pa.array(
            rng.integers(1, 51, n_part).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(
            np.round(900 + rng.random(n_part) * 100, 2), pa.float64()),
    }), os.path.join(out, "part.parquet"))

    # --- orders: duplicate keys + NULL totalprice + date ties ---
    n_ord = 150
    okeys = list(range(n_ord))
    okeys[10] = okeys[11]  # duplicate PK (DQ gates must agree)
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    day = 24 * 3600 * 1_000_000
    odays = rng.integers(0, 900, n_ord, dtype=np.int64)
    odays[:20] = 5  # 20 orders on the same date
    pq.write_table(pa.table({
        "o_orderkey": pa.array(okeys, pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord, dtype=np.int64),
            pa.int64()),
        "o_orderstatus": pa.array(
            [["O", "F", "P"][int(k)]
             for k in rng.integers(0, 3, n_ord)], pa.string()),
        "o_totalprice": pa.array(
            _null_some(np.round(1000 + rng.random(n_ord) * 9000, 2),
                       0.05), pa.float64()),
        "o_orderdate": pa.array(d0 + odays * day, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"][int(k)] for k in rng.integers(0, 5, n_ord)],
            pa.string()),
    }), os.path.join(out, "orders.parquet"))

    # --- lineitem: price ties, NULL measures, extreme values ---
    n_li = 800
    lkeys = rng.integers(0, n_ord, n_li, dtype=np.int64)
    price = np.round(900 + rng.random(n_li) * 1000, 2)
    price[:40] = 950.00        # exact ties (max/argmax tiebreaks)
    price[40] = 0.01           # boundary
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    ship_days = rng.integers(1, 900, n_li, dtype=np.int64)
    ship_days[:60] = 7         # many rows on one ship date
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(
            rng.integers(0, n_part, n_li, dtype=np.int64),
            pa.int64()),
        "l_suppkey": pa.array(
            rng.integers(0, n_supp, n_li, dtype=np.int64),
            pa.int64()),
        "l_linenumber": pa.array(
            (rng.integers(1, 8, n_li)).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(
            _null_some(qty, 0.03), pa.float64()),
        "l_extendedprice": pa.array(
            _null_some(price, 0.03), pa.float64()),
        "l_discount": pa.array(
            rng.integers(0, 11, n_li) / 100.0, pa.float64()),
        "l_tax": pa.array(
            rng.integers(0, 9, n_li) / 100.0, pa.float64()),
        "l_returnflag": pa.array(
            [["A", "N", "R"][int(k)]
             for k in rng.integers(0, 3, n_li)], pa.string()),
        "l_linestatus": pa.array(
            [["F", "O"][int(k)]
             for k in rng.integers(0, 2, n_li)], pa.string()),
        "l_shipdate": pa.array(
            d0 + ship_days * day, pa.timestamp("us")),
    }), os.path.join(out, "lineitem.parquet"))

    # --- events: NULL value, weird/NULL json, identical ts runs ---
    n_ev = 400
    e0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ets = np.sort(rng.integers(0, 5 * day, n_ev, dtype=np.int64))
    ets[50:70] = ets[50]       # 20 events at the SAME microsecond
    etypes = ["view", "click", "signup", "purchase", "error"]
    props = []
    for k in range(n_ev):
        r = rng.random()
        if r < 0.05:
            props.append(None)
        elif r < 0.08:
            props.append("not json {")
        elif r < 0.10:
            props.append("{}")
        else:
            props.append('{"k": %d}' % rng.integers(0, 100))
    uids = rng.integers(0, 30, n_ev, dtype=np.int64)
    vals = _null_some(np.round(rng.random(n_ev) * 560, 2), 0.08)
    # user 7: EVERY value NULL — an all-NULL group's sum must stay
    # NULL (not 0) through both batch aggregates and streaming state
    vals = [None if u == 7 else v for u, v in zip(uids, vals)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(e0 + ets, pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(
            [etypes[int(k)] for k in rng.integers(0, 5, n_ev)],
            pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    }), os.path.join(out, "events.parquet"))

    # --- documents: empty/whitespace/unicode/dup/single-word ---
    vocab = "alpha beta gamma delta eps zeta eta theta".split()
    texts = []
    for k in range(120):
        r = rng.random()
        if r < 0.05:
            texts.append("")
        elif r < 0.08:
            texts.append("   ")
        elif r < 0.11:
            texts.append("solo")
        elif r < 0.16:
            texts.append("héllo wörld 你好 мир – em—dash")
        else:
            texts.append(" ".join(
                vocab[int(i)]
                for i in rng.integers(0, len(vocab),
                                      int(rng.integers(3, 40)))))
    texts[100] = texts[0]      # exact duplicate
    texts[101] = texts[1]
    # Round-10 adversarial shapes for the explode-stream operators
    # (winnowing fingerprints, LM bigrams, quality fold):
    # astral-plane + combining chars — code-point semantics must
    # agree across engines beyond the BMP — and LONG documents that
    # make the per-doc k-gram/bigram streams thousands of rows.
    texts[102] = "😀🚀𝕏 éclair 𝔘𝔫𝔦 😀🚀𝕏 zz"   # astral + combining
    texts[103] = ("😀" * 50) + " plain tail"           # astral run
    long_words = [vocab[int(i)] for i in
                  rng.integers(0, len(vocab), 4000)]
    texts[104] = " ".join(long_words)                  # ~24k chars
    texts[105] = "ab" * 10_000                         # 20k-char one-token doc
    texts[106] = " ".join(long_words[:2000]) + " 😀𝕏 " + " ".join(
        long_words[:2000])                             # long + internal dup + astral
    langs = ["en", "es", "fr", "zh", "de"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(
            [langs[int(k)]
             for k in rng.integers(0, 5, len(texts))], pa.string()),
        "source": pa.array(
            [f"src{int(k)}" for k in rng.integers(0, 5, len(texts))],
            pa.string()),
        "n_chars": pa.array(
            [len(t) for t in texts], pa.int64()),
    }), os.path.join(out, "documents.parquet"))

    # --- embeddings: identical vectors, near-ties, tiny norms ---
    n_vec = 50
    vecs = rng.normal(0, 1, (n_vec, EMB_DIM))
    vecs[10] = vecs[0]                       # exact duplicate vector
    vecs[11] = vecs[1] * 1e-6                # tiny norm, same angle
    vecs[12] = -vecs[2]                      # anti-parallel
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs],
            pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, 5, n_vec).astype(np.int32), pa.int32()),
    }), os.path.join(out, "embeddings.parquet"))


def gen_shaped_dataset(seed: int, out: str, rows: int | None) -> None:
    """Same schemas as gen_dataset, truncated to `rows` rows per
    table (0 = all-empty, 1 = single-row). region/nation are kept
    intact — they are static dims the engine may assume non-empty,
    and the interesting degeneracy is empty FACTS over real dims."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        gen_dataset(seed, tmp)
        for f in sorted(os.listdir(tmp)):
            t = pq.read_table(os.path.join(tmp, f))
            if rows is not None and f not in (
                "region.parquet", "nation.parquet"
            ):
                t = t.slice(0, rows)
            pq.write_table(t, os.path.join(out, f))


_SKEW_CONST = {
    # every join/group key collapsed to ONE hot value: the shape a
    # power-law corpus degenerates to. Exercises (a) tiebreak
    # determinism — identical keys force ordering ties everywhere —
    # and (b) the skew-safety of joins/aggs (one-key shuffles).
    "lineitem.parquet": {"l_partkey": 0, "l_suppkey": 0},
    "orders.parquet": {"o_custkey": 0},
    "events.parquet": {"user_id": 0},
    "documents.parquet": {"lang": "en", "source": "src0"},
    "embeddings.parquet": {"label": 0},
}


def gen_skewed_dataset(seed: int, out: str) -> None:
    """gen_dataset with every fact's key columns set to a single
    constant value (see _SKEW_CONST)."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        gen_dataset(seed, tmp)
        for f in sorted(os.listdir(tmp)):
            t = pq.read_table(os.path.join(tmp, f))
            for col, val in _SKEW_CONST.get(f, {}).items():
                i = t.schema.get_field_index(col)
                typ = t.schema.field(i).type
                t = t.set_column(
                    i, t.schema.field(i),
                    pa.array([val] * t.num_rows, typ),
                )
            pq.write_table(t, os.path.join(out, f))


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    shape = os.environ.get("FUZZ_SHAPE")  # None|"empty"|"one"|"skew"
    tag = f"seed{seed}" if shape is None else f"seed{seed}_{shape}"
    out = os.path.join(REPO, ".fuzzdata", tag)
    os.makedirs(out, exist_ok=True)
    if shape is None:
        gen_dataset(seed, out)
    elif shape == "skew":
        gen_skewed_dataset(seed, out)
    else:
        gen_shaped_dataset(seed, out, {"empty": 0, "one": 1}[shape])

    from marketviz_spark.registry import QUERIES
    from marketviz_spark.session import get_spark
    from tests.oracle_check import compare, duck_con

    spark = get_spark("fuzz_parity", shuffle_partitions=4)
    con = duck_con(out)
    # Documented oracle-expressiveness exclusions (NOT engine bugs):
    # the engine behavior is correct but DuckDB cannot state it on
    # this data. Run rows-only for these.
    rows_only = {
        # byte-sliced binary frames: md5 of a mid-codepoint byte
        # slice of non-ASCII text is not expressible over DuckDB's
        # VARCHAR-only md5; the oracle documents its ASCII
        # precondition (registry_datapipe._frame_sample_oracle)
        "mm_frame_sample",
    }
    failed = []
    checked = 0
    for name, qd in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        if name in rows_only:
            print(f"ROWS-ONLY {name}: "
                  f"{qd.fn(spark, out).count()} rows (excluded: "
                  "oracle ASCII precondition)")
            continue
        checked += 1
        t0 = time.time()
        try:
            df = qd.fn(spark, out)
            if qd.oracle is None:
                print(f"ROWS-ONLY {name}: {df.count()} rows")
                continue
            problems = compare(df, con, qd.oracle, name)
        except Exception as e:  # noqa: BLE001
            problems = [f"{name}: EXCEPTION {e}"]
        dt = time.time() - t0
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({dt:.1f}s)")
            for p in problems[:6]:
                print(f"   {p}")
        else:
            print(f"PASS {name} ({dt:.1f}s)")
    print(f"\nseed {seed}: {checked - len(failed)}/{checked} pass")
    if failed:
        print("failed:", ",".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
