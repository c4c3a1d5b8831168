"""Cross-engine deterministic rounding.

Spark's ``round``/``format_number`` round HALF_UP on the double's
shortest decimal representation (java BigDecimal.valueOf), while
DuckDB rounds on the exact binary value — they disagree whenever a
value lands exactly on a decimal boundary, which is COMMON here
because prices carry exactly 2 decimals. ``rnd`` instead uses
``floor(v·10^k + 0.5)/10^k``: pure IEEE double arithmetic, so the
result is bit-identical on any engine that evaluates the same
expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column, k: int) -> Column:
    """Deterministic half-up round to k decimals (floor-based)."""
    p = float(10**k)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def rnd_sql(expr: str, k: int) -> str:
    """DuckDB twin of :func:`rnd` — textually identical arithmetic."""
    p = float(10**k)
    return f"floor(({expr}) * {p} + 0.5) / {p}"
