"""Local harness mimicking the driver's t2 correctness gate:
run each registry query on Spark and its oracle on DuckDB over the
same parquet, compare row count, column names, and an
order-insensitive value comparison (exact for strings/ints/bools,
tolerant for floats so we catch REAL divergences, not last-bit noise
— the engine still aims for bit-equality via exact arithmetic).
"""

from __future__ import annotations

import math
import re

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish decimals for sort/compare keys
        return round(v, 9)
    return v


def _key(row):
    return tuple(
        (str(type(v).__name__), str(_norm_cell(v))) for v in row
    )


def oracle_type_problems(
    con: duckdb.DuckDBPyConnection, oracle: str, name: str
) -> list[str]:
    """Standing lint for the r10 driver-fail class: any oracle result
    column typed HUGEINT/UHUGEINT fetches as float64, which the driver
    hashes differently from Spark's long. Binds (doesn't execute) the
    query and inspects declared result types.

    Also flags DECIMAL result types that are hazardous the same way
    (declared-type coverage must not depend on null-free data — the
    runtime float-vs-int check in compare() exempts NaN-carrying
    columns, so a DECIMAL column that happens to hold a NULL at the
    test scale factor would slip through both checks otherwise):
    - scale == 0: integer-intent arithmetic that fetchdf() turns into
      float64 ("107450.0") while Spark hashes a long ("107450");
    - precision > 15: the float64 fetch is no longer value-exact, so
      even a float-typed Spark twin can diverge in the last bits.
    Small fractional decimals (e.g. the source table's DECIMAL(2,1)
    split factors) convert exactly and match a Spark double — allowed.
    """
    bad = []
    rel = con.sql(oracle)
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if "HUGEINT" in t:
            bad.append(
                f"{name}: oracle column {col} is {typ} — wrap the "
                "expression in CAST(... AS BIGINT)"
            )
            continue
        m = re.match(r"DECIMAL\((\d+),(\d+)\)", t)
        if m:
            prec, scale = int(m.group(1)), int(m.group(2))
            if scale == 0:
                bad.append(
                    f"{name}: oracle column {col} is {typ} (integer-"
                    "intent) — fetchdf() materializes it as float64, "
                    "which the driver hashes differently from Spark's "
                    "long; wrap in CAST(... AS BIGINT)"
                )
            elif prec > 15:
                bad.append(
                    f"{name}: oracle column {col} is {typ} — beyond "
                    "float64 exactness, the fetchdf() conversion can "
                    "diverge from Spark in the last bits; CAST the "
                    "edge to DOUBLE/BIGINT (quantize) explicitly"
                )
    return bad


def compare(spark_df, con, oracle: str, name: str, rel_tol=1e-9) -> list[str]:
    """Returns a list of problem strings (empty = match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(oracle).fetchdf()
    if len(sp) != len(du):
        # Bail out: zip() below would silently truncate to the shared
        # prefix; with differing counts, show the symmetric difference.
        problems.append(f"{name}: row count {len(sp)} vs oracle {len(du)}")
        sp_keys = {tuple(map(str, r)) for r in sp.itertuples(index=False)}
        du_keys = {tuple(map(str, r)) for r in du.itertuples(index=False)}
        for extra in list(sp_keys - du_keys)[:3]:
            problems.append(f"{name}: spark-only row {extra}")
        for extra in list(du_keys - sp_keys)[:3]:
            problems.append(f"{name}: oracle-only row {extra}")
        return problems
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    if sp_cols != du_cols:
        problems.append(f"{name}: columns {sp_cols} vs {du_cols}")
        return problems
    sp = sp[sp_cols]
    du = du[du_cols]
    # Type-strictness (r10 driver bug class): a DuckDB HUGEINT result
    # column materializes as float64 in fetchdf(), so 107450 hashes as
    # "107450.0" at the driver while the int==float value compare below
    # passes locally. Flag any column where one side is float and the
    # other integral, unless the float side carries NaN (pandas promotes
    # nullable int -> float64, which is a materialization artifact, not
    # an engine type divergence).
    for c in sp_cols:
        ks, kd = sp[c].dtype.kind, du[c].dtype.kind
        pair = {ks, kd}
        if "f" in pair and pair & {"i", "u"}:
            floats = sp[c] if ks == "f" else du[c]
            if not floats.isna().any():
                problems.append(
                    f"{name}: column {c} dtype kind spark={ks!r} vs "
                    f"oracle={kd!r} (null-free float vs int — the "
                    "driver hashes these differently; CAST the oracle "
                    "or the Spark column)"
                )
    if problems:
        return problems
    sp_rows = sorted((tuple(r) for r in sp.itertuples(index=False)), key=_key)
    du_rows = sorted((tuple(r) for r in du.itertuples(index=False)), key=_key)
    mismatches = 0
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        for ca, cb in zip(a, b):
            if ca is None and cb is None:
                continue
            if isinstance(ca, float) and isinstance(cb, float):
                if math.isnan(ca) and math.isnan(cb):
                    continue
                if ca == cb:
                    continue
                if abs(ca - cb) <= rel_tol * max(abs(ca), abs(cb), 1.0):
                    # tolerable float noise — flag bit-inequality softly
                    continue
                mismatches += 1
                if mismatches <= 3:
                    problems.append(
                        f"{name}: row {i} float {ca!r} vs {cb!r}"
                    )
            elif ca != cb and str(ca) != str(cb):
                mismatches += 1
                if mismatches <= 3:
                    problems.append(f"{name}: row {i} {ca!r} vs {cb!r}")
    if mismatches > 3:
        problems.append(f"{name}: ... {mismatches} total cell mismatches")
    return problems
