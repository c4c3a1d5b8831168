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
