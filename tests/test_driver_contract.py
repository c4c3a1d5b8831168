"""Driver-contract integrity: the ordering list in
__spark_entry__._FIRST must reference only real registry queries —
_ordered() silently filters unknown names, so a typo there would
silently demote a query out of the driver's correctness budget."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_first_list_names_are_registry_queries():
    mod = importlib.import_module("__spark_entry__")
    from marketviz_spark.registry import QUERIES

    unknown = [n for n in mod._FIRST if n not in QUERIES]
    assert unknown == [], f"_FIRST references unknown queries: {unknown}"
    dupes = [n for n in set(mod._FIRST) if mod._FIRST.count(n) > 1]
    assert dupes == [], f"_FIRST has duplicates: {dupes}"


# Queries intentionally shipped WITHOUT an oracle (rows-only driver
# check); empty today — adding a name here must be a deliberate call.
ORACLE_LESS: set[str] = set()


def test_every_query_has_matching_oracle_key():
    mod = importlib.import_module("__spark_entry__")
    qs, osql = mod.queries(), mod.oracle_sql()
    # both directions: every oracle names a query AND every query
    # has an oracle unless explicitly allowlisted as rows-only
    assert set(osql) <= set(qs)
    missing = set(qs) - set(osql) - ORACLE_LESS
    assert missing == set(), f"queries without an oracle: {missing}"
    # ordering helper returns every registry query exactly once
    assert sorted(qs) == sorted(set(qs))
