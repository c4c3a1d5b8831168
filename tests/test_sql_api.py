"""SQL-API parity: the flagship expressed as Spark SQL over the
registered views must equal the DataFrame implementation exactly."""

from __future__ import annotations

from marketviz_spark import tables
from marketviz_spark.sql import FLAGSHIP_SQL, register_domain_views
from marketviz_spark.tables import INDEX_K
from tests.conftest import SF_SMALL


def test_flagship_sql_equals_dataframe(spark):
    register_domain_views(spark, SF_SMALL)
    via_sql = sorted(
        map(str, spark.sql(FLAGSHIP_SQL.format(k=INDEX_K)).collect())
    )
    via_df = sorted(
        map(str, tables.index_data(spark, SF_SMALL).collect())
    )
    assert via_sql == via_df


def test_views_queryable(spark):
    register_domain_views(spark, SF_SMALL)
    n = spark.sql(
        "SELECT count(*) AS n FROM stocks WHERE date LIKE '1996%'"
    ).collect()[0].n
    assert n > 0
    e = spark.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = 'click'"
    ).collect()[0].n
    assert e > 0


def test_retention_cohorts_age0_equals_cohort_size(spark):
    """Every cohort's age-0 row counts the whole cohort (each user is
    by definition active on their own first day), and no age is
    negative."""
    from marketviz_spark.registry import QUERIES

    out = QUERIES["events_retention_cohorts"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out, "retention matrix must be non-empty"
    assert all(r["age_days"] >= 0 for r in out)
    age0 = {r["cohort_day"]: r["n_users"] for r in out if r["age_days"] == 0}
    # age-0 must exist for every cohort present in the matrix and be
    # the max count in that cohort's row (retention never exceeds 100%)
    for r in out:
        assert r["cohort_day"] in age0
        assert r["n_users"] <= age0[r["cohort_day"]]


def test_anomaly_flags_match_pure_python_mirror(spark):
    """The integer-exact anomaly rule recomputed in arbitrary-
    precision Python must flag the identical set of (type, day)
    cells — the no-epsilon guarantee the operator advertises."""
    from collections import defaultdict

    from marketviz_spark.registry import QUERIES

    rows = QUERIES["events_anomaly_days"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for evs in by_type.values():
        n = len(evs)
        s = sum(r["n_events"] for r in evs)
        q = sum(r["n_events"] ** 2 for r in evs)
        for r in evs:
            expect = int((r["n_events"] * n - s) ** 2 > 4 * (n * q - s * s))
            assert r["is_anomaly"] == expect, r


def test_anomaly_flags_survive_beyond_int64_counts(spark):
    """Daily counts near 3.1e9 (whose squares overflow int64) must
    still flag exactly — the DECIMAL(38,0) accumulation regime.
    Mirrored against arbitrary-precision Python."""
    from marketviz_spark.registry import anomaly_flags

    # 10 baseline days + one 4x spike: with only ~4 days a single
    # outlier cannot exceed 2 sigma because it inflates sigma itself
    big = 3_100_000_000
    counts = [big + i * 11 for i in range(10)] + [4 * big]
    daily = spark.createDataFrame(
        [("t", f"d{i}", c) for i, c in enumerate(counts)],
        "event_type string, day string, n_events long",
    )
    got = {r["day"]: r["is_anomaly"] for r in anomaly_flags(daily).collect()}
    n = len(counts)
    s = sum(counts)
    q = sum(c * c for c in counts)
    for i, c in enumerate(counts):
        expect = int((c * n - s) ** 2 > 4 * (n * q - s * s))
        assert got[f"d{i}"] == expect, (i, c)
    assert got["d10"] == 1  # the 4x spike must flag
    assert sum(got.values()) == 1  # and nothing else does
