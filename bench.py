"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink — full computation
of every column, no driver collect, no output I/O — the fairest
proxy for cluster throughput. First query run includes JVM/codegen
warmup; a warmup pass runs a trivial job first so per-query numbers
reflect the plans, not startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marketviz_spark.registry import QUERIES  # noqa: E402
from marketviz_spark.session import get_spark  # noqa: E402

# Headliners: the scan+agg anchor, the flagship windowed index, the
# split-adjustment window chain, the broadcast join, upsert, and the
# data-pipeline extensions as they land.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "index_daily",
    "w1_split_adjust",
    "w8_latest_per_ticker",
    "j1_composition_market_cap",
    "j2_upsert",
    "w3_w4_returns",
    "o5_summary_tail30",
    # training-data-pipeline headliners
    "dedup_exact",
    "dedup_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "dedup_clusters",
    "text_stats",
    "text_token_bpe",
    "text_repetition",
    "text_decontaminate",
    "sample_stratified",
    "pack_sequences",
    "vocab_topk",
    "curation_funnel",
    "dedup_incremental",
    "emb_quantize_int8",
    "emb_cosine_topk_blas",
    "emb_lsh_topk",
    "events_tumbling_1h",
    "mm_payload_features",
    # OLAP extensions
    "q3_shipping_priority",
    "cube_revenue",
    "agg_distinct_percentile",
    "events_range_join",
    "skew_salted_join",
    "skew_salted_agg",
    # dedup verifier family + streaming batch-twin
    "dedup_ngram_jaccard",
    "dedup_minhash_estimate",
    "events_click_error_pairs",
    "dedup_substring_spans",
    "events_funnel_conversion",
    "events_transition_matrix",
    # round-6 additions: the heaviest previously-unbenched registry
    # queries (multi-way joins, multi-modal clustering, HLL cascade,
    # candidate-bounded edit distance)
    "q5_local_supplier_volume",
    "q13_order_histogram",
    "q4_late_order_priority",
    "dedup_clusters_multi",
    "events_hll_cascade",
    "dedup_levenshtein",
    # round-6 batch 2/3: the heaviest of the new TPC-H anchors
    # (multi-way broadcast joins, decorrelated subqueries, the
    # double-EXISTS), the token-drift audit, and SemDeDup
    "q7_nation_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q17_small_qty_revenue",
    "q21_sole_late_supplier",
    "corpus_drift",
    "semdedup_prune",
    # round-6 batch 4: boilerplate detection (chunk-fingerprint
    # groupBy + flag-back join), leakage-safe cluster split, mixture
    # execution, coverage curve, cohort retention
    "boilerplate_chunks",
    "cluster_split",
    "mixture_apply",
    "token_coverage_curve",
    "events_retention_cohorts",
    "ann_recall",
    # round-6 batch 5: weighted mixture, dedup histogram, integer-
    # exact anomaly flags, documents quality gate
    "mixture_plan_weighted",
    "cluster_size_histogram",
    "events_anomaly_days",
    "dq_documents_gate",
    # round-6 batch 6: cross-series similarity search (brute tier +
    # sign-of-move sketch tier)
    "ts_corr_pairs",
    "ts_corr_pairs_sketched",
    # round-6 batch 7: calendar-aware RANGE window frame
    "w_rolling_range_7d",
    # round-6 batch 8: as-of join, PPS sampling, BPE pair mining,
    # embedding decontamination, incremental view maintenance,
    # equi-depth histogram
    "events_asof_prev",
    "sample_pps",
    "bpe_merge_pairs",
    "decontam_embedding",
    "events_bars_incremental",
    "price_equidepth_hist",
    "chunk_index_dedup",
    "price_winsorize",
    "stocks_snapshot_diff",
    "events_bars_gapfill",
    "ticker_mad_outliers",
    "curriculum_order",
    "dq_referential_integrity",
    "w_share_of_day",
    "events_top_paths",
    "w_max_drawdown",
    "w_longest_up_streak",
    "events_hll_intersection",
]

# Round 7: the bench covers the ENTIRE registry — the curated list
# above keeps its order (stable cross-round comparisons), and every
# remaining registry query is appended in registry order so nothing
# can regress unbenched. BASELINE.md carries a row for each.
BENCH_QUERIES += [n for n in QUERIES if n not in BENCH_QUERIES]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # A ~450-job single-JVM suite accumulates broadcast/shuffle
    # state the ContextCleaner only frees on driver GC; the default
    # periodicGC interval (30min) never fires inside one bench run,
    # which measurably degrades late-order queries (observed ~1.3x
    # drift by position 111+ without it). An explicit collection
    # between passes (and before the timed pass) drains that state
    # OUTSIDE the measured windows. Deliberately NOT a short
    # periodicGC interval: forced full GCs landing inside measured
    # queries made everything uniformly ~1.5x slower when tried.
    spark = get_spark("marketviz_bench")

    def _drain_jvm() -> None:
        spark.sparkContext._jvm.System.gc()

    # Warmup: JVM, parquet reader, and the exact codegen shapes of the
    # benched plans — run the same queries at the tiny sf first so the
    # timings below measure throughput, not class compilation.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            if name in QUERIES:
                try:
                    materialize(QUERIES[name].fn(spark, warm_dir))
                except Exception:
                    pass  # measured pass records the error row

    # Two passes at the target sf; report the warm (best) time per
    # query — the first pass pays AQE-specific codegen compilation.
    # Per-query fault isolation: one broken query records an error
    # row, never aborts the suite.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _pass in range(2):
        _drain_jvm()
        for name in BENCH_QUERIES:
            if name not in QUERIES:
                continue
            t0 = time.time()
            try:
                materialize(QUERIES[name].fn(spark, sf_dir))
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                # a query must be EITHER a timed success OR an error
                # row — a pass-1 timing for a query that broke in
                # pass 2 would silently count toward the suite total
                timings.pop(name, None)
                continue
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            errors.pop(name, None)

    total = round(sum(timings.values()), 3)
    baselines = _load_baselines()
    stable_set = _load_stable_set()

    # Isolated re-measure of apparent outliers: BASELINE.md's tell
    # for host noise vs a real regression is that an isolated re-run
    # returns to the suite-global drift factor. Automate it — every
    # query whose suite ratio exceeds 1.3x gets a fresh isolated
    # best-of-two (JVM drained first), so the judge can separate
    # suite-context/host noise from structural regressions without
    # a manual session. Runs AFTER the suite so it never perturbs
    # the comparable per-query rows. A wide cap (24 worst) bounds a
    # pathological all-noise run; if it ever binds, the drop count
    # is emitted (never a silent cap) — at the observed per-round
    # outlier population (~9 rows, mostly sub-second) the cap is
    # far from binding.
    outliers_all = sorted(
        (
            (n, t / baselines[n])
            for n, t in timings.items()
            if baselines.get(n) and t / baselines[n] > 1.3
        ),
        key=lambda kv: -kv[1],
    )
    outliers = outliers_all[:24]
    outliers_dropped = len(outliers_all) - len(outliers)
    outliers_isolated: dict[str, dict[str, float]] = {}
    for name, suite_ratio in outliers:
        _drain_jvm()
        iso = None
        # Sub-second rows get a third pass: their walls are dominated
        # by one-time JVM class-loading of the expression's runtime
        # (measured r13 on json_props_struct — from_json's Jackson
        # path costs ~0.85/0.69/0.43 s cold and 0.32 s once any JSON
        # query has run; the 0.35 s baseline is the warmed wall, so a
        # best-of-two after _drain_jvm read 1.8-2.0x on pure warmup).
        # Bounded cost: one extra sub-second run per outlier.
        runs = 3 if baselines.get(name, 1.0) < 1.0 else 2
        for _ in range(runs):
            t0 = time.time()
            try:
                materialize(QUERIES[name].fn(spark, sf_dir))
            except Exception:
                break
            dt = time.time() - t0
            iso = dt if iso is None else min(iso, dt)
        if iso is not None:
            outliers_isolated[name] = {
                "suite_x": round(suite_ratio, 2),
                "iso_sec": round(iso, 3),
                "iso_x": round(iso / baselines[name], 2),
            }

    _write_detail(
        timings, errors, baselines, sf, outliers_isolated,
        outliers_dropped,
    )
    # The driver records only a ~2000-char tail of stdout, so the
    # final line must stay compact AND parseable: suite total, the
    # worst queries (by wall and by baseline ratio), and a pointer
    # to BENCH_DETAIL.md for the full per-query map (round-7 lost
    # 77/148 rows to tail truncation).
    worst_wall = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:25]
    )
    ratios = {
        n: round(t / baselines[n], 2)
        for n, t in timings.items()
        if baselines.get(n)
    }
    worst_ratio = dict(
        sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    )
    # ratio over the INTERSECTION only: a freshly-registered query
    # with no BASELINE.md row yet must not inflate the suite ratio
    base_sum = sum(baselines[n] for n in timings if n in baselines)
    shared_total = sum(
        t for n, t in timings.items() if n in baselines
    )
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": worst_wall,
        "sf": float(sf),
        "n_queries": len(timings),
        "suite_vs_baseline": (
            round(shared_total / base_sum, 3) if base_sum else None
        ),
        # Frozen round-7 148-query set: the registry grows every
        # round, so the full-suite wall conflates new queries with
        # drift — this wall is comparable round-over-round. null =
        # the frozen-set file was unreadable (warned on stderr),
        # never a measured 0.0.
        "stable148_wall": (
            round(
                sum(t for n, t in timings.items() if n in stable_set),
                3,
            )
            if stable_set is not None
            else None
        ),
        # alias kept under the name the round-9 verdict asked for:
        # the suite-global drift factor — per-query ratios are
        # judged AGAINST this (BASELINE.md's host-noise
        # methodology); a 1.6x query in a 1.5x-drift run is parity
        "drift_factor": (
            round(shared_total / base_sum, 3) if base_sum else None
        ),
        "worst5_vs_baseline": worst_ratio,
        "detail": "BENCH_DETAIL.md",
    }
    if outliers_isolated:
        out["outliers_isolated"] = outliers_isolated
    if outliers_dropped:
        out["outliers_dropped"] = outliers_dropped
    if errors:
        # Inline errors are bounded: at most 3, each message cut to
        # 80 chars — a run with many long Spark stack-trace strings
        # must still fit the driver's ~2000-char stdout tail. The
        # full error text is already in BENCH_DETAIL.md.
        out["n_errors"] = len(errors)
        out["errors"] = {
            n: msg[:80] for n, msg in list(errors.items())[:3]
        }
    line = json.dumps(out)
    # Shrink EVERY unbounded dict, not just queries: pop the longest
    # remaining collection one entry at a time until the line fits.
    while len(line) > 1900:
        for key, floor_n in (
            ("queries", 5),
            ("outliers_isolated", 1),
            ("errors", 1),
            ("worst5_vs_baseline", 1),
        ):
            d = out.get(key)
            if isinstance(d, dict) and len(d) > floor_n:
                d.pop(next(reversed(d)))
                break
        else:
            break  # nothing left to shrink; emit as-is
        line = json.dumps(out)
    print(line)


def _load_stable_set() -> frozenset[str] | None:
    """The frozen round-7 re-base query set (148 names): the
    cross-round-comparable bench subset. Registry growth changes the
    full-suite wall every round; this one is apples-to-apples.

    Returns None (never an empty set) when the file is missing or
    corrupt: a silent empty set would make stable148_wall report 0.0,
    indistinguishable from a real measurement in the round-over-round
    comparison the metric exists for."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "stable_set_r7.json",
    )
    try:
        with open(path) as fh:
            names = frozenset(json.load(fh))
    except (OSError, ValueError) as exc:
        print(
            f"WARN stable_set_r7.json unreadable ({exc}); "
            "stable148_wall will be null",
            file=sys.stderr,
        )
        return None
    if not names:
        print(
            "WARN stable_set_r7.json is empty; stable148_wall will "
            "be null",
            file=sys.stderr,
        )
        return None
    return names


def _load_baselines() -> dict[str, float]:
    """Per-query baseline walls from BASELINE.md's markdown table
    (the round-7 full-registry re-base)."""
    out: dict[str, float] = {}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    try:
        with open(path) as fh:
            for ln in fh:
                parts = [p.strip() for p in ln.strip().strip("|").split("|")]
                if len(parts) == 2 and parts[0] in QUERIES:
                    try:
                        out[parts[0]] = float(parts[1])
                    except ValueError:
                        pass
    except OSError:
        pass
    return out


def _write_detail(
    timings: dict[str, float],
    errors: dict[str, str],
    baselines: dict[str, float],
    sf: str,
    outliers_isolated: dict[str, dict[str, float]] | None = None,
    outliers_dropped: int = 0,
) -> None:
    """Full per-query map -> BENCH_DETAIL.md (wall desc, with
    baseline ratios where BASELINE.md has a row)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.md"
    )
    lines = [
        f"# BENCH_DETAIL — full per-query walls at sf{sf}",
        "",
        f"Suite total: {round(sum(timings.values()), 3)} s over "
        f"{len(timings)} queries ({len(errors)} errors). "
        "Written by bench.py each run; the driver's BENCH_r{N}.json "
        "keeps only a compact tail — this file is the full map.",
        "",
        "| query | wall (s) | baseline (s) | ratio |",
        "|---|---|---|---|",
    ]
    for n, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        b = baselines.get(n)
        lines.append(
            f"| {n} | {t} | {b if b is not None else '—'} | "
            f"{round(t / b, 2) if b else '—'} |"
        )
    if outliers_isolated:
        lines += [
            "",
            "Isolated re-measures of >1.3x rows (host-noise vs",
            "structural-regression separation; see BASELINE.md).",
            "Sub-second-baseline rows run best-of-three: their cold",
            "walls are one-time JVM class-loading, not plan cost",
            "(r13 diagnosis of json_props_struct: from_json's",
            "Jackson path is 0.85/0.69/0.43 s on first touches and",
            "0.32 s warmed vs the 0.35 s baseline — the r12 1.8x",
            "'isolated' reading was pure warmup):",
            "",
            "| query | suite ratio | isolated (s) | isolated ratio |",
            "|---|---|---|---|",
        ] + [
            f"| {n} | {d['suite_x']} | {d['iso_sec']} | {d['iso_x']} |"
            for n, d in outliers_isolated.items()
        ]
    if outliers_dropped:
        lines += [
            "",
            f"NOTE: {outliers_dropped} further >1.3x rows exceeded "
            "the 24-row isolation cap and were NOT re-measured (a "
            "whole-suite-drift run; read ratios against "
            "drift_factor).",
        ]
    for n, e in sorted(errors.items()):
        # one clean cell: raw Spark errors carry newlines and pipes
        # that would shred the markdown table
        msg = " ".join(e.split()).replace("|", "\\|")[:120]
        lines.append(f"| {n} | ERROR | — | — |")
        lines.append(f"|  | `{msg}` | | |")
    # Preserve sections other writers own (bench_streaming.py's
    # state-store table): everything from the first second-level
    # heading onward survives the rewrite.
    extra = ""
    if os.path.exists(path):
        old = open(path).read()
        cut = old.find("\n## ")
        if cut != -1:
            extra = old[cut:]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n" + extra)


if __name__ == "__main__":
    main()
