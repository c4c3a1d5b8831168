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


def test_stable_set_loader_fails_loudly(tmp_path, monkeypatch, capsys):
    """ADVICE r11: a missing/corrupt tools/stable_set_r7.json must
    yield None (stable148_wall -> null in the JSON line), never an
    empty set that silently reports a 0.0 'measurement'."""
    import bench

    real = bench.os.path.join

    def fake_join(*parts):
        if parts and parts[-1] == "stable_set_r7.json":
            return str(tmp_path / "stable_set_r7.json")
        return real(*parts)

    monkeypatch.setattr(bench.os.path, "join", fake_join)
    assert bench._load_stable_set() is None  # missing file
    (tmp_path / "stable_set_r7.json").write_text("not json {")
    assert bench._load_stable_set() is None  # corrupt file
    (tmp_path / "stable_set_r7.json").write_text("[]")
    assert bench._load_stable_set() is None  # empty set
    (tmp_path / "stable_set_r7.json").write_text('["index_daily"]')
    assert bench._load_stable_set() == frozenset({"index_daily"})
