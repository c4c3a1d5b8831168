"""Interactive dashboard server — the live twin of report_html.py,
closing the reference's last surface: widget-driven recompute
(dashboard.py:266-408) without Streamlit.

The reference's interactivity is three widgets:
- a top-k number input for the market-cap pie (dashboard.py:309,
  ``st.number_input(min_value=1, value=20)``),
- a date picker for the composition table with a ≤5-day walk-back
  and a holiday warning (dashboard.py:317-349),
- Excel / PDF download buttons (dashboard.py:371-395).

Here each widget is a query-string parameter on a stdlib
``http.server`` handler: ``GET /?k=7&date=1997-03-14`` re-renders
the page for those values (a plain HTML form round-trips them — no
JS), and ``GET /export.xlsx`` / ``GET /export.pdf`` stream the
existing export-pipeline artifacts. All rendering reuses
report_html's inline-SVG primitives and charts.py's spec builders,
so every number still comes from the distributed operator layer and
every collect stays behind presentation_frame's row cap.

Scale note: the server is PRESENTATION — each request runs bounded
point/range queries (a 5-day partition-pruned composition lookup,
the capped chart frames). The Spark session and the two source
DataFrames are built once at server construction; requests share
them. This is exactly where the reference hands frames to plotly,
not a data-plane component.
"""

from __future__ import annotations

import datetime as _dt
import html
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from .presentation import presentation_frame
from .report_html import (
    _BG,
    _FG,
    _GRID,
    _PANEL,
    _summary_table_html,
    render_line_svg,
    render_pie_svg,
)

DEFAULT_K = 20  # the reference number_input's default
MAX_K = 200  # sanity clamp; the pie degenerates long before this
WALK_BACK_DAYS = 4  # dates checked: selected, -1 .. -4 (5 total)
PAGE_CACHE_SIZE = 64  # FIFO of rendered (k, date) pages


def composition_asof(index_df: DataFrame, date_str: str):
    """The date-picker semantics (dashboard.py:324-342): the
    composition at `date_str`, walking back up to WALK_BACK_DAYS
    calendar days. Returns (actual_date, [tickers]) or (None, [])
    if no index row exists in the window.

    Scale: a two-sided date-range filter that prunes to ≤5
    partitions/row-groups, then a 1-row top-1 — a point lookup, not
    a scan."""
    sel = _dt.date.fromisoformat(date_str)
    lo = (sel - _dt.timedelta(days=WALK_BACK_DAYS)).isoformat()
    rows = presentation_frame(
        index_df.filter(
            (F.col("date") >= F.lit(lo)) & (F.col("date") <= F.lit(date_str))
        )
        .select("date", "composition")
        .orderBy(F.col("date").desc())
        .limit(1),
        max_rows=1,
        what="composition_asof",
    )
    if not rows:
        return None, []
    return rows[0]["date"], [
        t for t in rows[0]["composition"].split(",") if t
    ]


def _composition_section(index_df: DataFrame, date_str: str) -> str:
    actual, tickers = composition_asof(index_df, date_str)
    if actual is None:
        return (
            f"<p class='err'>No data available for {html.escape(date_str)} "
            f"or the previous {WALK_BACK_DAYS + 1} trading days</p>"
        )
    note = ""
    if actual != date_str:
        note = (
            f"<p class='warn'>No data available for "
            f"{html.escape(date_str)} (Possible Holiday). Showing data "
            f"for {html.escape(actual)} instead.</p>"
        )
    body = "".join(f"<tr><td>{html.escape(t)}</td></tr>" for t in tickers)
    return (
        f"{note}<table><tr><th>Stock ({html.escape(actual)}, "
        f"{len(tickers)} constituents)</th></tr>{body}</table>"
    )


def render_dashboard_page(
    index_df: DataFrame,
    stocks_df: DataFrame,
    k: int = DEFAULT_K,
    date_str: str | None = None,
) -> str:
    """One full page render for (k, date) — the per-request body of
    the server, also callable directly (tests golden-pin it the same
    way as export_html)."""
    from .charts import index_chart_spec, market_cap_pie_spec

    k = max(1, min(int(k), MAX_K))
    if date_str is None:
        last = presentation_frame(
            index_df.select(F.max("date").alias("d")), 1, "last_date"
        )
        date_str = last[0]["d"] if last and last[0]["d"] else "1997-01-01"

    line_svg = render_line_svg(index_chart_spec(index_df))
    pie_svg = render_pie_svg(market_cap_pie_spec(index_df, stocks_df, k))
    comp = _composition_section(index_df, date_str)
    table = _summary_table_html(index_df, 30)
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>MarketViz Index Dashboard</title>
<style>
body {{ background: {_BG}; color: {_FG};
       font-family: system-ui, sans-serif; margin: 24px; }}
h1 {{ font-size: 22px; }}
section {{ margin-bottom: 28px; }}
table {{ border-collapse: collapse; font-size: 13px; }}
th, td {{ border: 1px solid {_GRID}; padding: 4px 10px;
          text-align: right; }}
th {{ background: {_PANEL}; }}
td:first-child, th:first-child {{ text-align: left; }}
.warn {{ color: #ffa15a; }} .err {{ color: #ef553b; }}
form {{ margin-bottom: 16px; }}
input {{ background: {_PANEL}; color: {_FG};
         border: 1px solid {_GRID}; padding: 2px 6px; }}
</style></head><body>
<h1>MarketViz Index Dashboard</h1>
<form method="get" action="/">
  <label>Number of stocks to display:
    <input type="number" name="k" min="1" value="{k}"></label>
  <label>Select date to view composition:
    <input type="date" name="date" value="{html.escape(date_str)}"></label>
  <button type="submit">Update</button>
  <a href="/export.xlsx">Export to Excel</a>
  <a href="/export.pdf">Export to PDF</a>
</form>
<section>{line_svg}</section>
<section>{pie_svg}</section>
<section><h2>Index Composition</h2>{comp}</section>
<section><h2>Index Summary (last 30 days)</h2>{table}</section>
</body></html>
"""


class DashboardHandler(BaseHTTPRequestHandler):
    """Routes: ``/`` (page, params k/date), ``/export.xlsx``,
    ``/export.pdf``. Anything else is 404. The server instance
    carries the Spark frames (see make_server)."""

    def log_message(self, *args):  # quiet: tests and batch drivers
        pass

    def _send(self, code: int, ctype: str, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server API
        srv = self.server  # type: ignore[assignment]
        url = urlparse(self.path)
        try:
            if url.path == "/":
                qs = parse_qs(url.query)
                try:
                    k = int(qs.get("k", [DEFAULT_K])[0])
                    date_str = qs.get("date", [None])[0]
                    if date_str is not None:
                        _dt.date.fromisoformat(date_str)
                except ValueError:
                    self._send(
                        400, "text/plain; charset=utf-8",
                        b"bad k or date parameter",
                    )
                    return
                # Renders are deterministic for (k, date) over a
                # fixed corpus, so a tiny FIFO response cache keeps
                # widget round-trips (back buttons, repeated polls)
                # off the Spark session. Bounded; evicts oldest.
                ck = (max(1, min(k, MAX_K)), date_str)
                body = srv.page_cache.get(ck)
                if body is None:
                    body = render_dashboard_page(
                        srv.index_df, srv.stocks_df, k, date_str
                    ).encode()
                    with srv.cache_lock:
                        srv.page_cache[ck] = body
                        while len(srv.page_cache) > PAGE_CACHE_SIZE:
                            srv.page_cache.pop(
                                next(iter(srv.page_cache))
                            )
                self._send(200, "text/html; charset=utf-8", body)
            elif url.path in ("/export.xlsx", "/export.pdf"):
                from .export import export_pdf, export_xlsx

                ext = url.path.rsplit(".", 1)[-1]
                fn = export_xlsx if ext == "xlsx" else export_pdf
                ctype = (
                    "application/vnd.openxmlformats-officedocument"
                    ".spreadsheetml.sheet"
                    if ext == "xlsx"
                    else "application/pdf"
                )
                with tempfile.TemporaryDirectory() as d:
                    path = fn(
                        srv.index_df, os.path.join(d, f"index_data.{ext}")
                    )
                    with open(path, "rb") as fh:
                        data = fh.read()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header(
                    "Content-Disposition",
                    f'attachment; filename="index_data.{ext}"',
                )
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self._send(404, "text/plain; charset=utf-8", b"not found")
        except Exception as e:  # noqa: BLE001 — surface, don't hang
            self._send(
                500,
                "text/plain; charset=utf-8",
                f"render error: {e}".encode()[:2000],
            )


def make_server(
    spark: SparkSession, sf_dir: str, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build the HTTP server bound to (host, port); port 0 picks a
    free one (tests). The two source frames are constructed once —
    they are lazy plans, so each request executes only its own
    bounded queries."""
    httpd = ThreadingHTTPServer((host, port), DashboardHandler)
    httpd.index_df = tables.index_data(spark, sf_dir)
    httpd.stocks_df = tables.stocks(spark, sf_dir)
    httpd.page_cache = {}
    httpd.cache_lock = threading.Lock()
    return httpd


def serve_background(
    spark: SparkSession, sf_dir: str, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the server on a daemon thread and return (server,
    thread); ``server.shutdown()`` stops it. The test entry point —
    a production deployment would call make_server().serve_forever()
    from its driver main."""
    httpd = make_server(spark, sf_dir, host, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, t


def main() -> None:
    """CLI: python -m marketviz_spark.pipelines.dashboard_server
    [sf_dir] [port]. $MARKETVIZ_HOST overrides the bind address
    (loopback by default; containers set 0.0.0.0)."""
    import sys

    from ..session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8501
    host = os.environ.get("MARKETVIZ_HOST", "127.0.0.1")
    spark = get_spark("dashboard_server")
    httpd = make_server(spark, sf_dir, host=host, port=port)
    print(f"serving dashboard on http://{httpd.server_address[0]}:"
          f"{httpd.server_address[1]} (sf_dir={sf_dir})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
