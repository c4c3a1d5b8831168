"""Interactive dashboard server (pipelines/dashboard_server.py) —
the live twin of the static report: widget params re-render the
page, the date picker walks back ≤5 days like the reference
(dashboard.py:317-349), and the export endpoints stream the real
XLSX/PDF artifacts."""

import datetime as dt
import urllib.error
import urllib.request

import pytest

from marketviz_spark import tables
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def server(spark):
    from marketviz_spark.pipelines.dashboard_server import serve_background

    httpd, thread = serve_background(spark, SF_SMALL, port=0)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers, r.read()


def _dates(spark):
    rows = (
        tables.index_data(spark, SF_SMALL)
        .select("date")
        .orderBy("date")
        .collect()
    )
    return [r["date"] for r in rows]


def test_page_renders_and_k_changes_pie(server, spark):
    status, _, body = _get(f"{server}/")
    doc = body.decode()
    assert status == 200
    assert doc.count("<svg") == 2  # line chart + pie
    assert "Index Composition" in doc and "Index Summary" in doc

    # k=1 -> top-1 + OTHERS bucket; the default k=20 fits the whole
    # composition so no OTHERS appears. The widget must actually
    # recompute the pie, not re-serve the default page.
    _, _, body_k1 = _get(f"{server}/?k=1")
    doc_k1 = body_k1.decode()
    assert "OTHERS" in doc_k1 and "OTHERS" not in doc
    assert doc_k1 != doc


def test_date_picker_exact_and_walk_back(server, spark):
    dates = _dates(spark)
    # exact trading day: composition shown for that date, no warning
    d_ok = dates[len(dates) // 2]
    _, _, body = _get(f"{server}/?date={d_ok}")
    doc = body.decode()
    assert f"Stock ({d_ok}" in doc and "Possible Holiday" not in doc

    # a gap date (next calendar day missing from the index) walks
    # back to the previous trading day with the reference's warning
    have = set(dates)
    gap = next(
        (dt.date.fromisoformat(d) + dt.timedelta(days=1)).isoformat()
        for d in dates[:-1]
        if (dt.date.fromisoformat(d) + dt.timedelta(days=1)).isoformat()
        not in have
    )
    prev = max(d for d in dates if d < gap)
    _, _, body = _get(f"{server}/?date={gap}")
    doc = body.decode()
    assert "Possible Holiday" in doc and f"Stock ({prev}" in doc

    # far before any data: the reference's error path
    _, _, body = _get(f"{server}/?date=1990-01-01")
    assert "No data available for 1990-01-01" in body.decode()


def test_export_endpoints_stream_real_artifacts(server):
    _, hdr, xlsx = _get(f"{server}/export.xlsx")
    assert xlsx[:2] == b"PK" and "spreadsheetml" in hdr["Content-Type"]
    _, hdr, pdf = _get(f"{server}/export.pdf")
    assert pdf[:5] == b"%PDF-" and hdr["Content-Type"] == "application/pdf"


def test_bad_params_and_unknown_path(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/?date=not-a-date")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/nope")
    assert e.value.code == 404
    # k is clamped, not an error (the reference widget enforces >=1)
    status, _, _ = _get(f"{server}/?k=-5")
    assert status == 200


def test_walkback_golden_vs_j3_asof(server, spark):
    """r11 verdict item 7: GET /?date=<holiday> end-to-end must show
    the reference's warning AND a walked-back composition identical
    to the j3 as-of operator's answer for the same spine date (the
    two implement the same dashboard.py:317-349 semantics through
    different plans — HTTP point-lookup vs union+window as-of)."""
    import re

    from marketviz_spark.operators.joins import asof_walkback

    dates = _dates(spark)
    have = set(dates)
    # first calendar gap: 1 day back, inside both operators' windows
    gap = next(
        (dt.date.fromisoformat(d) + dt.timedelta(days=1)).isoformat()
        for d in dates[:-1]
        if (dt.date.fromisoformat(d) + dt.timedelta(days=1)).isoformat()
        not in have
    )

    spine = spark.createDataFrame([(gap,)], "date: string")
    [j3] = asof_walkback(
        spine, tables.index_data(spark, SF_SMALL)
    ).collect()
    assert j3["matched_date"] is not None  # golden date is in-window
    j3_tickers = [t for t in j3["composition"].split(",") if t]

    _, _, body = _get(f"{server}/?date={gap}")
    doc = body.decode()
    assert "Possible Holiday" in doc
    assert f"Showing data for {j3['matched_date']}" in doc
    m = re.search(
        r"<table><tr><th>Stock \(([0-9-]+), (\d+) constituents\)"
        r"</th></tr>(.*?)</table>",
        doc,
        re.S,
    )
    assert m, doc[:500]
    page_date, page_n, rows_html = m.groups()
    page_tickers = re.findall(r"<tr><td>([^<]+)</td></tr>", rows_html)
    assert page_date == j3["matched_date"]
    assert int(page_n) == len(j3_tickers)
    assert page_tickers == j3_tickers  # same order, same set
