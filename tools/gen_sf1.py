"""Generate seeded sf1-equivalent documents/embeddings/events for
the 10x spot-runs (round-7: the dedup/ANN caps and the events-family
joins are adversarially tested at small scale but had never seen a
10x data step). Shapes mirror the driver's sf0.1 tables (5k docs /
2k vectors / 100k events -> 50k / 20k / 1M): vocabulary word-salad
text with exact + near duplicates, 64-dim label-clustered embeddings
with planted near-dup vectors, and an events month skewed by one hot
user (5% of rows) plus a 10-minute click/error burst incident (3%).

Writes to <repo>/.sf1data/ (testdata is read-only). Deterministic:
numpy PCG64 seed 427. Usage: python tools/gen_sf1.py [outdir].
Consumers: tools/spot_sf1.py and the measured tables in
ARCHITECTURE.md ("10x spot-run" sections).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 50_000
N_VECS = 20_000
EMB_DIM = 64
N_LABELS = 10
VOCAB = (
    "spark line column order small sort fast value scan hash batch "
    "part query agg table stream filter big merge group row key the "
    "a join vector customer slow".split()
)
LANGS = ["en", "en", "en", "es", "fr", "zh", "de"]  # en-heavy like sf0.1


def gen_documents(rng: np.random.Generator):
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    base_texts: list[str] = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.01:
            # exact duplicate of an earlier doc (sf0.1 has ~0.2%;
            # be a bit meaner at 10x)
            t = base_texts[int(rng.integers(0, len(base_texts)))]
        elif i > 100 and r < 0.03:
            # near duplicate: copy + mutate a few words
            words = base_texts[
                int(rng.integers(0, len(base_texts)))
            ].split()
            for _ in range(max(1, len(words) // 20)):
                words[int(rng.integers(0, len(words)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
            t = " ".join(words)
        else:
            n_words = int(rng.integers(8, 110))
            t = " ".join(
                VOCAB[int(k)]
                for k in rng.integers(0, len(VOCAB), n_words)
            )
            base_texts.append(t)
        doc_ids.append(i)
        texts.append(t)
        langs.append(LANGS[int(rng.integers(0, len(LANGS)))])
        sources.append(f"src{int(rng.integers(0, 20))}")
        n_chars.append(len(t))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator):
    centroids = rng.normal(0, 1, (N_LABELS, EMB_DIM))
    labels = rng.integers(0, N_LABELS, N_VECS)
    vecs = centroids[labels] + rng.normal(0, 0.35, (N_VECS, EMB_DIM))
    # plant ~1% near-duplicate vectors (tiny perturbations of an
    # earlier vector) so the near-dup path has real work
    n_planted = N_VECS // 100
    src = rng.integers(0, N_VECS // 2, n_planted)
    dst = rng.integers(N_VECS // 2, N_VECS, n_planted)
    vecs[dst] = vecs[src] + rng.normal(0, 0.01, (n_planted, EMB_DIM))
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


N_EVENTS = 1_000_000
N_USERS = 15_000
HOT_USER_SHARE = 0.05  # one user owns 5% of all events
BURST_SHARE = 0.03     # 3% of events land in one 10-minute incident
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]


def gen_events(rng: np.random.Generator):
    """10x the sf0.1 events table, made ADVERSARIAL on the two axes
    the events family shuffles on: one hot user (user_id 0, ~5% of
    rows — stresses per-user sessionization/sequence/pair shapes)
    and one 10-minute burst incident of interleaved click/error
    traffic (~3% of rows — stresses time-bucketed range joins whose
    cost is per-bucket |a|x|b|). Uniform 10x would only prove
    linearity; these regimes probe the density-squared paths."""
    start_us = np.datetime64("2024-01-01", "us").astype(np.int64)
    month_us = 30 * 24 * 3600 * 1_000_000
    n_burst = int(N_EVENTS * BURST_SHARE)
    n_norm = N_EVENTS - n_burst

    ts = np.sort(
        rng.integers(0, month_us, n_norm, dtype=np.int64)
    )
    # the incident: 10 minutes on Jan 15, click/error heavy
    burst_t0 = 14 * 24 * 3600 * 1_000_000
    burst_ts = np.sort(
        rng.integers(
            burst_t0, burst_t0 + 600 * 1_000_000, n_burst,
            dtype=np.int64,
        )
    )
    users = rng.integers(1, N_USERS, n_norm, dtype=np.int64)
    hot = rng.random(n_norm) < HOT_USER_SHARE
    users[hot] = 0
    types = rng.integers(0, len(EVENT_TYPES), n_norm)

    burst_users = rng.integers(1, N_USERS, n_burst, dtype=np.int64)
    burst_users[rng.random(n_burst) < HOT_USER_SHARE] = 0
    # incident traffic alternates click/error (range-join fuel)
    burst_types = np.where(rng.random(n_burst) < 0.5, 1, 4)

    all_ts = np.concatenate([ts, burst_ts])
    order = np.argsort(all_ts, kind="stable")
    all_ts = all_ts[order] + start_us
    all_users = np.concatenate([users, burst_users])[order]
    all_types = np.concatenate([types, burst_types])[order]
    value = np.round(rng.random(N_EVENTS) * 560.0, 2)
    props = [
        '{"k": %d}' % k for k in rng.integers(0, 100, N_EVENTS)
    ]
    return pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), pa.int64()),
            "ts": pa.array(all_ts, pa.timestamp("us")),
            "user_id": pa.array(all_users, pa.int64()),
            "event_type": pa.array(
                [EVENT_TYPES[t] for t in all_types], pa.string()
            ),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


N_ORDERS1 = 1_500_000
N_CUST1 = 150_000
N_PART1 = 200_000
N_SUPP1 = 10_000
HOT_PART_SHARE = 0.03  # one part (= one derived ticker) on 3% of lines
HOT_CUST_SHARE = 0.02  # one customer on 2% of orders
HOT_SUPP_SHARE = 0.02

_ADJ = ("large hot blue small red green dark pale round flat "
        "smooth rough light heavy quick").split()
_NOUN = ("ring bolt screw washer plate gear shaft valve pin "
         "clip lever strut cog hub").split()


def gen_tpch(rng: np.random.Generator, out: str):
    """10x the sf0.1 TPC-H-ish tables with the skew TPC-H lacks:
    one hot part (the derived stocks ticker with a giant history),
    one hot customer, one hot supplier. Dims grow with the fact
    table so referential joins stay closed."""
    day_us = 24 * 3600 * 1_000_000
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)

    # dims
    part = pa.table({
        "p_partkey": pa.array(range(N_PART1), pa.int64()),
        "p_name": pa.array(
            [f"{_ADJ[int(a)]} {_NOUN[int(b)]}"
             for a, b in zip(rng.integers(0, len(_ADJ), N_PART1),
                             rng.integers(0, len(_NOUN), N_PART1))],
            pa.string()),
        "p_brand": pa.array(
            [f"Brand#{k}" for k in rng.integers(1, 26, N_PART1)],
            pa.string()),
        "p_type": pa.array(
            [["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL",
              "PROMO"][k] for k in rng.integers(0, 6, N_PART1)],
            pa.string()),
        "p_size": pa.array(
            rng.integers(1, 51, N_PART1).astype(np.int32),
            pa.int32()),
        "p_retailprice": pa.array(
            np.round(900.0 + rng.random(N_PART1) * 100.0, 2),
            pa.float64()),
    })
    customer = pa.table({
        "c_custkey": pa.array(range(N_CUST1), pa.int64()),
        "c_name": pa.array(
            [f"Customer#{k:09d}" for k in range(N_CUST1)],
            pa.string()),
        "c_nationkey": pa.array(
            rng.integers(0, 25, N_CUST1).astype(np.int32),
            pa.int32()),
        "c_acctbal": pa.array(
            np.round(-999.0 + rng.random(N_CUST1) * 10999.0, 2),
            pa.float64()),
        "c_mktsegment": pa.array(
            [["MACHINERY", "BUILDING", "HOUSEHOLD", "FURNITURE",
              "AUTOMOBILE"][k] for k in rng.integers(0, 5, N_CUST1)],
            pa.string()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(range(N_SUPP1), pa.int64()),
        "s_name": pa.array(
            [f"Supplier#{k:09d}" for k in range(N_SUPP1)],
            pa.string()),
        "s_nationkey": pa.array(
            rng.integers(0, 25, N_SUPP1).astype(np.int32),
            pa.int32()),
        "s_acctbal": pa.array(
            np.round(-999.0 + rng.random(N_SUPP1) * 10999.0, 2),
            pa.float64()),
    })

    # orders
    custkey = rng.integers(0, N_CUST1, N_ORDERS1, dtype=np.int64)
    custkey[rng.random(N_ORDERS1) < HOT_CUST_SHARE] = 0
    odate_days = rng.integers(0, 2405, N_ORDERS1, dtype=np.int64)
    orders = pa.table({
        "o_orderkey": pa.array(range(N_ORDERS1), pa.int64()),
        "o_custkey": pa.array(custkey, pa.int64()),
        "o_orderstatus": pa.array(
            [["O", "F", "P"][k]
             for k in rng.integers(0, 3, N_ORDERS1)], pa.string()),
        "o_totalprice": pa.array(
            np.round(1000.0 + rng.random(N_ORDERS1) * 499000.0, 2),
            pa.float64()),
        "o_orderdate": pa.array(
            d0 + odate_days * day_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"][k] for k in rng.integers(0, 5, N_ORDERS1)],
            pa.string()),
    })

    # lineitem: 1-7 lines per order
    nlines = rng.integers(1, 8, N_ORDERS1)
    okey = np.repeat(np.arange(N_ORDERS1, dtype=np.int64), nlines)
    n_li = len(okey)
    lnum = np.concatenate(
        [np.arange(1, k + 1) for k in nlines]
    ).astype(np.int32)
    pkey = rng.integers(0, N_PART1, n_li, dtype=np.int64)
    pkey[rng.random(n_li) < HOT_PART_SHARE] = 0
    skey = rng.integers(0, N_SUPP1, n_li, dtype=np.int64)
    skey[rng.random(n_li) < HOT_SUPP_SHARE] = 0
    ship = (
        d0
        + np.repeat(odate_days, nlines) * day_us
        + rng.integers(1, 121, n_li, dtype=np.int64) * day_us
    )
    lineitem = pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(pkey, pa.int64()),
        "l_suppkey": pa.array(skey, pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64),
            pa.float64()),
        "l_extendedprice": pa.array(
            np.round(900.0 + rng.random(n_li) * 104100.0, 2),
            pa.float64()),
        "l_discount": pa.array(
            rng.integers(0, 11, n_li) / 100.0, pa.float64()),
        "l_tax": pa.array(
            rng.integers(0, 9, n_li) / 100.0, pa.float64()),
        "l_returnflag": pa.array(
            [["A", "N", "R"][k] for k in rng.integers(0, 3, n_li)],
            pa.string()),
        "l_linestatus": pa.array(
            [["F", "O"][k] for k in rng.integers(0, 2, n_li)],
            pa.string()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    })
    for name, tbl in [
        ("part", part), ("customer", customer),
        ("supplier", supplier), ("orders", orders),
        ("lineitem", lineitem),
    ]:
        path = os.path.join(out, f"{name}.parquet")
        if os.path.islink(path):
            os.unlink(path)  # never write through to testdata
        pq.write_table(tbl, path)
    return n_li


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".sf1data",
        )
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(427)
    pq.write_table(gen_documents(rng), os.path.join(out, "documents.parquet"))
    pq.write_table(
        gen_embeddings(rng), os.path.join(out, "embeddings.parquet")
    )
    pq.write_table(gen_events(rng), os.path.join(out, "events.parquet"))
    n_li = gen_tpch(rng, out)
    # region/nation are FIXED-cardinality dims (5/25 rows at every
    # TPC-H scale factor) — copy them from sf0.1 unchanged so the
    # oracle harness (tests/run_parity.py registers all ten tables)
    # can run hash parity against .sf1data too.
    import shutil

    for dim in ("region", "nation"):
        shutil.copyfile(
            f"/root/testdata/sf0.1/{dim}.parquet",
            os.path.join(out, f"{dim}.parquet"),
        )
    print(
        f"wrote {out}: documents {N_DOCS}, embeddings {N_VECS}, "
        f"events {N_EVENTS}, orders {N_ORDERS1}, lineitem {n_li}"
    )


if __name__ == "__main__":
    main()
