"""Per-source retention budgets (datapipe/budget.py): value
invariants, a pandas mirror of the exact selection, and the
scale-plan pins (WindowGroupLimit for the cap, partitioned window
for the prefix)."""

from __future__ import annotations

import pandas as pd
import pytest

from marketviz_spark import tables
from marketviz_spark.datapipe.budget import DOMAIN_CAP, TOKEN_BUDGET
from marketviz_spark.registry import QUERIES
from tests.conftest import SF_MED


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs_pd(spark):
    return (
        tables.load(spark, SF_MED, "documents")
        .select("doc_id", "source", "n_chars", "text")
        .toPandas()
    )


@pytest.fixture(scope="module")
def cap_rows(spark):
    return {
        r["source"]: r
        for r in QUERIES["source_domain_cap"].fn(spark, SF_MED).collect()
    }


@pytest.fixture(scope="module")
def prefix_rows(spark):
    return {
        r["source"]: r
        for r in QUERIES["token_budget_prefix"].fn(spark, SF_MED).collect()
    }


def test_domain_cap_mirror(docs_pd, cap_rows):
    """Exact pandas mirror: quality order (n_chars desc, doc_id),
    keep the first DOMAIN_CAP per source; counts AND the kept-set
    checksums must match — the checksum pins the ranking itself."""
    for src, g in docs_pd.groupby("source"):
        g = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        kept = g.head(DOMAIN_CAP)
        r = cap_rows[src]
        assert r["n_docs"] == len(g)
        assert r["n_kept"] == len(kept)
        assert r["n_dropped"] == len(g) - len(kept)
        assert r["kept_docid_sum"] == int(kept["doc_id"].sum())
        assert r["kept_chars_sum"] == int(kept["n_chars"].sum())


def test_token_budget_mirror(docs_pd, prefix_rows):
    """Exact pandas mirror of the prefix walk: whitespace tokens
    (empties dropped, same rule as textstats.tokens), cumulative sum
    in quality order, select while cum <= budget."""
    ntok = docs_pd["text"].map(
        lambda t: sum(1 for w in t.split(" ") if w != "")
    )
    d = docs_pd.assign(n_tok=ntok)
    for src, g in d.groupby("source"):
        g = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        cum = g["n_tok"].cumsum()
        sel = g[cum <= TOKEN_BUDGET]
        r = prefix_rows[src]
        assert r["n_docs"] == len(g)
        assert r["n_selected"] == len(sel)
        assert r["tokens_selected"] == int(sel["n_tok"].sum())
        assert r["sel_docid_sum"] == int(sel["doc_id"].sum())
        assert (
            r["budget_used_ppm"]
            == int(sel["n_tok"].sum()) * 1_000_000 // TOKEN_BUDGET
        )


def test_budget_invariants(cap_rows, prefix_rows):
    for r in cap_rows.values():
        assert 0 <= r["n_kept"] <= DOMAIN_CAP
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
    for r in prefix_rows.values():
        assert r["tokens_selected"] <= TOKEN_BUDGET
        assert 0 <= r["budget_used_ppm"] <= 1_000_000
        assert r["n_selected"] <= r["n_docs"]


def test_domain_cap_plan_group_limit_no_cartesian(spark):
    """The rank-filter must rewrite to WindowGroupLimit so a hot
    domain is truncated to the cap map-side, BEFORE the shuffle —
    the property that makes the cap safe at 100 TB."""
    df = QUERIES["source_domain_cap"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = _plan(df)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_token_prefix_plan_partitioned_window(spark):
    """The running sum windows on source (never a global window) and
    plans no cartesian; the report groupBy reuses the same key."""
    df = QUERIES["token_budget_prefix"].fn(spark, SF_MED)
    df.write.mode("overwrite").format("noop").save()
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(source" in plan
