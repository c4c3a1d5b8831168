"""Skew-mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime, but two cases still need explicit treatment at 100 TB:

- aggregation skew (one hot group overwhelms a reducer) — AQE does
  not split aggregations: `salted_agg_count` two-phase pattern;
- join skew where the hot keys are known — `salted_join` replicates
  the small side per salt so the hot key fans across reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(cols: list[str], n_salts: int) -> Column:
    """Deterministic row-content salt: pmod(hash(cols), n_salts).
    Stable under stage recomputation (unlike rand, which only fixes
    the seed per partition index)."""
    return F.pmod(
        F.hash(*[F.col(c) for c in cols]), F.lit(n_salts)
    ).alias("_salt")


def salted_agg_sum(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe sum: partial-aggregate on (key, salt),
    then final-aggregate on key. The hot key's rows spread across
    `n_salts` reducers in phase one; phase two merges `n_salts`
    partials per key.

    (Spark's hash aggregate already does map-side partials; explicit
    salting matters when the partial results themselves are huge —
    e.g. collect_list/HLL sketches per group — or when a window
    forces a raw shuffle on the skewed key.)

    The salt is a CONTENT hash, not rand(): rand() is deterministic
    only per partition index, so a recomputed upstream stage with
    different row placement (executor loss, nondeterministic source)
    would re-salt rows differently than the data already shuffled —
    dropping or double-counting. Content-hash salting is stable
    under any recomputation.

    CONTRACT: the salt hashes `salt_cols` (default: every column of
    `df`, so any distinguishing attribute — a row id, source offset,
    line number — spreads duplicates of the same (group, value)
    pair). Rows identical in ALL salt_cols still share a salt, so
    fully-duplicated-row skew lands on one reducer regardless —
    that degenerate shape needs exact dedup upstream, which this
    operator cannot enforce. Pass a high-cardinality key column in
    `salt_cols` whenever one exists.
    """
    salt = _content_salt(salt_cols or df.columns, n_salts)
    partial = (
        df.select(F.col(group_col), F.col(value_col), salt)
        .groupBy(group_col, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("_partial").alias(f"sum_{value_col}")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where `big` is skewed on `key`: salt the big side
    randomly, replicate the small side once per salt value, join on
    (key, salt). The hot key's rows land on `n_salts` reducers
    instead of one. Cost: small side shuffles n_salts-fold — use for
    genuinely small dimensions (or pre-filter to the hot keys).

    Salts derive from row content (see salted_agg_sum) so a
    recomputed big side re-salts identically — a rand() salt could
    disagree with already-shuffled data after an executor loss,
    silently dropping or duplicating joined rows."""
    big_salted = big.withColumn(
        "_salt", _content_salt(big.columns, n_salts)
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    small_rep = small.select("*", salts)
    out = big_salted.join(small_rep, [key, "_salt"]).drop("_salt")
    return out
