from __future__ import annotations

import os
import re
import tempfile

from marketviz_spark import tables
from marketviz_spark.pipelines.export import export_pdf, export_xlsx
from tests.conftest import SF_SMALL


def test_export_xlsx_real_workbook_roundtrip(spark):
    """export_xlsx emits a REAL workbook (no CSV fallback): sheet
    names, reference header strings, row counts, and value types
    survive a read-back through the independent stdlib parser."""
    from tests.xlsx_reader import column_width, read_workbook

    idx = tables.index_data(spark, SF_SMALL)
    n_dates = idx.count()
    n = min(30, n_dates)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "index_data.xlsx")
        out = export_xlsx(idx, path)
        assert out == path
        wb = read_workbook(path)
        assert column_width(path, 1) == 15.0
    assert list(wb) == ["Performance", "Composition", "Composition Changes"]
    perf = wb["Performance"]
    assert perf[0] == [
        "Date",
        "Price",
        "Daily Return (%)",
        "Cumulative Return (%)",
    ]
    assert len(perf) == n + 1
    assert all(isinstance(r[0], str) for r in perf[1:])
    assert all(isinstance(r[1], float) for r in perf[1:])
    # newest first
    dates = [r[0] for r in perf[1:]]
    assert dates == sorted(dates, reverse=True)
    assert wb["Composition"][0] == ["Date", "Composition"]
    assert wb["Composition Changes"][0] == ["Date", "Composition Changes"]
    assert len(wb["Composition"]) == n + 1
    assert len(wb["Composition Changes"]) == n + 1
    labels = {r[1] for r in wb["Composition Changes"][1:]}
    assert all(
        v == "-" or re.fullmatch(r"\+\(.*\) , -\(.*\)", v) for v in labels
    )


def test_export_pdf_real_pdf_structure(spark):
    """export_pdf emits a structurally valid PDF: header/EOF
    markers, a correct startxref offset, the report title, and the
    reference's .2f% cell formatting in the content stream."""
    idx = tables.index_data(spark, SF_SMALL)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "index_data.pdf")
        out = export_pdf(idx, path)
        assert out == path
        raw = open(path, "rb").read()
    assert raw.startswith(b"%PDF-1.")
    assert raw.rstrip().endswith(b"%%EOF")
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF\s*$", raw)
    assert m, "missing startxref"
    assert raw[int(m.group(1)) :].startswith(b"xref")
    assert b"(Index Report) Tj" in raw
    assert b"/Helvetica-Bold" in raw and b"/Helvetica" in raw
    # body cells carry the reference's formatting: 2dp + % suffix
    assert re.search(rb"\(-?\d+\.\d\d%\) Tj", raw)
    # every page object resolves its content stream
    assert raw.count(b"/Type /Page ") == raw.count(b"/Contents")


def test_export_pdf_paginates(spark):
    """More rows than fit one page -> multiple /Page objects."""
    from marketviz_spark.pipelines.pdf_lite import write_pdf

    rows = [[f"2024-01-{i:02d}", "1.00", "0.00%", "0.00%"] for i in range(1, 29)]
    rows = rows * 3  # 84 rows, ~2.8 pages
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "big.pdf")
        write_pdf(path, "Index Report", ["Date", "V", "D", "C"], rows)
        raw = open(path, "rb").read()
    n_pages = raw.count(b"/Type /Page ")
    assert n_pages >= 2
    assert b"/Count %d" % n_pages in raw


def test_xlsx_sheet_name_with_quote_yields_valid_xml(tmp_path):
    """A sheet name containing a double quote must produce
    well-formed workbook.xml (attribute context needs quote
    escaping, which plain escape() does not do)."""
    import xml.etree.ElementTree as ET
    import zipfile

    from marketviz_spark.pipelines.xlsx_lite import write_xlsx

    path = str(tmp_path / "q.xlsx")
    write_xlsx(path, [('He said "hi"', ["a"], [[1]])])
    with zipfile.ZipFile(path) as z:
        wb = z.read("xl/workbook.xml").decode()
    root = ET.fromstring(wb)  # raises on corrupt XML
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    names = [s.get("name") for s in root.iter(f"{ns}sheet")]
    assert names == ['He said "hi"']


def test_xlsx_unicode_and_control_chars_roundtrip(tmp_path):
    """Cell text with non-ASCII unicode must round-trip byte-exact,
    and XML-invalid control characters must be STRIPPED (not passed
    through escape(), which leaves them in and corrupts the
    workbook) — the fuzz corpus's unicode documents exercise the
    former, a stray \\x07 in scraped text the latter."""
    import zipfile

    from marketviz_spark.pipelines.xlsx_lite import write_xlsx
    from tests.xlsx_reader import read_workbook

    path = str(tmp_path / "u.xlsx")
    uni = "héllo wörld 你好 мир – em—dash"
    write_xlsx(
        path,
        [("s", ["txt"], [[uni], ["bad\x07ctl\x00still\ttab"]])],
    )
    rows = read_workbook(path)["s"]
    # rows[0] is the header
    assert rows[1][0] == uni
    assert rows[2][0] == "badctlstill\ttab"
    # the archive must be well-formed XML throughout
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(path) as z:
        for n in z.namelist():
            if n.endswith(".xml"):
                ET.fromstring(z.read(n))


def test_export_html_dashboard_report(spark):
    """The static HTML dashboard report is self-contained and
    structurally complete: both SVG charts (polyline with one point
    per index date, pie slices summing to the full circle), the
    summary table with the reference's column headers, and no
    external resource references. Byte-determinism across two
    renders is asserted so the artifact is golden-pinnable."""
    from marketviz_spark.pipelines.report_html import export_html

    idx = tables.index_data(spark, SF_SMALL)
    stocks = tables.stocks(spark, SF_SMALL)
    n_dates = idx.count()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dash.html")
        out = export_html(idx, stocks, path)
        assert out == path
        doc = open(path, encoding="utf-8").read()
        path2 = os.path.join(d, "dash2.html")
        export_html(idx, stocks, path2)
        assert doc == open(path2, encoding="utf-8").read()

    assert doc.count("<svg") == 2 and doc.count("</svg>") == 2
    # line chart: one polyline vertex per index date
    poly = re.search(r'<polyline points="([^"]+)"', doc).group(1)
    assert len(poly.split()) == n_dates
    assert "MarketViz Index Performance" in doc
    # pie: one slice per label (+ OTHERS only when the composition
    # exceeds k — at sf0.001 it has 2 constituents, so no bucket)
    assert "Top 5 Stocks by Market Cap" in doc
    comp_size = len(
        idx.orderBy("date", ascending=False)
        .limit(1)
        .collect()[0]["composition"]
        .split(",")
    )
    assert doc.count("<path d=") + doc.count("<circle") >= min(
        comp_size, 2
    )
    assert ("OTHERS" in doc) == (comp_size > 5)
    # summary table headers mirror the dashboard
    for hdr in (
        "<th>Date</th>",
        "<th>Index Value</th>",
        "<th>Daily Return %</th>",
        "<th>Cumulative Return %</th>",
        "<th>Composition Change</th>",
    ):
        assert hdr in doc
    assert doc.count("<tr>") == min(30, n_dates) + 1  # + header row
    # self-contained: no external fetches of any kind
    for marker in ("http://", "https://", "<script", "src="):
        assert marker not in doc, marker
