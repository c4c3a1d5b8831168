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
