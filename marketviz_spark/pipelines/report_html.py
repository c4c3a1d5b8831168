"""Static HTML dashboard report — the engine's answer to the
reference's Streamlit dashboard (dashboard.py:266-408).

The reference serves its figures live (st.plotly_chart) from an
in-process SQLite store; a Spark deployment publishes instead: one
batch job renders the same content — the index-performance chart
with composition-change markers (dashboard.py:39-86), the top-k
market-cap pie (dashboard.py:88-144), the 30-day summary table and
composition-change list (dashboard.py:146-201) — into ONE
self-contained HTML file with inline SVG. No server, no JS, no
plotting library: the file opens anywhere and is byte-deterministic
for a given input, so tests can golden-pin it.

Boundary discipline (same as charts.py / export.py): every number
comes from the distributed operator layer (analytics, J1+A3+O6
composition market caps) via the chart-spec dicts; this module only
draws. The collect is the ≤~1000-point presentation frame — exactly
where the reference hands a frame to plotly.

SVG rendering is pure stdlib arithmetic. The line chart scales
(date-index, value) into a fixed viewport; the pie converts the
value vector into arc paths. Colors mirror the reference's styling
constants (INDEX_LINE red, orange change markers, plotly_dark-like
background).
"""

from __future__ import annotations

import html
import math
import os

from pyspark.sql import DataFrame

# plotly_dark-equivalent surface colors
_BG = "#111111"
_PANEL = "#1e1e1e"
_FG = "#e0e0e0"
_GRID = "#333333"
_PIE_COLORS = [  # plotly default categorical cycle (public palette)
    "#636efa",
    "#ef553b",
    "#00cc96",
    "#ab63fa",
    "#ffa15a",
    "#19d3f3",
]

_W, _H = 840, 360
_ML, _MR, _MT, _MB = 60, 20, 40, 50  # margins


def _fmt(v: float) -> str:
    return f"{v:.2f}"


def _scale(vals, lo_px, hi_px):
    """Linear scale factory: data range -> pixel range."""
    vmin, vmax = min(vals), max(vals)
    span = (vmax - vmin) or 1.0

    def s(v):
        return lo_px + (v - vmin) / span * (hi_px - lo_px)

    return s, vmin, vmax


def render_line_svg(spec: dict) -> str:
    """The index-performance chart spec (charts.index_chart_spec)
    as inline SVG: trace 0 is the polyline, trace 1 (when present)
    the composition-change markers, both in the reference's colors."""
    line = spec["data"][0]
    xs, ys = line["x"], line["y"]
    if not xs:
        return (
            f'<svg width="{_W}" height="{_H}" role="img">'
            f'<rect width="100%" height="100%" fill="{_PANEL}"/>'
            f'<text x="20" y="40" fill="{_FG}">no data</text></svg>'
        )
    sx, *_ = _scale(list(range(len(xs))), _ML, _W - _MR)
    sy, ymin, ymax = _scale(ys, _H - _MB, _MT)  # y grows downward
    pos = {d: i for i, d in enumerate(xs)}
    pts = " ".join(
        f"{sx(i):.1f},{sy(v):.1f}" for i, v in enumerate(ys)
    )
    parts = [
        f'<svg width="{_W}" height="{_H}" role="img" '
        f'aria-label="{html.escape(spec["layout"]["title"]["text"])}">',
        f'<rect width="100%" height="100%" fill="{_PANEL}"/>',
    ]
    # horizontal gridlines + y tick labels (4 divisions)
    for k in range(5):
        yv = ymin + (ymax - ymin) * k / 4
        yp = sy(yv)
        parts.append(
            f'<line x1="{_ML}" y1="{yp:.1f}" x2="{_W - _MR}" '
            f'y2="{yp:.1f}" stroke="{_GRID}" stroke-width="1"/>'
        )
        parts.append(
            f'<text x="{_ML - 8}" y="{yp + 4:.1f}" fill="{_FG}" '
            f'font-size="11" text-anchor="end">{_fmt(yv)}</text>'
        )
    # x tick labels: ~8 evenly spaced dates
    step = max(1, (len(xs) - 1) // 7 or 1)
    for i in range(0, len(xs), step):
        parts.append(
            f'<text x="{sx(i):.1f}" y="{_H - _MB + 18}" '
            f'fill="{_FG}" font-size="10" text-anchor="middle">'
            f"{html.escape(str(xs[i]))}</text>"
        )
    color = line.get("line", {}).get("color", "#ff0000")
    parts.append(
        f'<polyline points="{pts}" fill="none" stroke="{color}" '
        f'stroke-width="{line.get("line", {}).get("width", 2)}"/>'
    )
    if len(spec["data"]) > 1:  # composition-change markers
        mk = spec["data"][1]
        mcol = mk.get("marker", {}).get("color", "orange")
        for d, v in zip(mk["x"], mk["y"]):
            if d not in pos:  # marker outside the line trace's
                continue  # window: skip, don't crash the render
            x, y = sx(pos[d]), sy(v)
            # star-triangle-down stand-in: a filled triangle
            parts.append(
                f'<polygon points="{x - 5:.1f},{y - 4:.1f} '
                f'{x + 5:.1f},{y - 4:.1f} {x:.1f},{y + 5:.1f}" '
                f'fill="{mcol}"><title>Composition changed on '
                f"{html.escape(str(d))}</title></polygon>"
            )
    parts.append(
        f'<text x="{_W / 2}" y="24" fill="{_FG}" font-size="15" '
        f'text-anchor="middle">'
        f'{html.escape(spec["layout"]["title"]["text"])}</text>'
    )
    parts.append("</svg>")
    return "".join(parts)


def render_pie_svg(spec: dict) -> str:
    """The market-cap pie spec (charts.market_cap_pie_spec) as
    inline SVG arc paths with a side legend."""
    pie = spec["data"][0]
    labels, values = pie["labels"], pie["values"]
    size, cx, cy, r = 300, 160, 160, 120
    total = sum(values) or 1.0
    parts = [
        f'<svg width="560" height="{size + 40}" role="img" '
        f'aria-label="{html.escape(spec["layout"]["title"]["text"])}">',
        f'<rect width="100%" height="100%" fill="{_PANEL}"/>',
        f'<text x="280" y="24" fill="{_FG}" font-size="15" '
        f'text-anchor="middle">'
        f'{html.escape(spec["layout"]["title"]["text"])}</text>',
    ]
    ang = -math.pi / 2  # 12 o'clock start, clockwise
    for i, (name, v) in enumerate(zip(labels, values)):
        frac = v / total
        a2 = ang + 2 * math.pi * frac
        large = 1 if frac > 0.5 else 0
        x1, y1 = cx + r * math.cos(ang), cy + 40 + r * math.sin(ang)
        x2, y2 = cx + r * math.cos(a2), cy + 40 + r * math.sin(a2)
        col = _PIE_COLORS[i % len(_PIE_COLORS)]
        if frac >= 0.999999:  # single-slice pie: a full circle
            parts.append(
                f'<circle cx="{cx}" cy="{cy + 40}" r="{r}" '
                f'fill="{col}"/>'
            )
        else:
            parts.append(
                f'<path d="M{cx},{cy + 40} L{x1:.1f},{y1:.1f} '
                f'A{r},{r} 0 {large} 1 {x2:.1f},{y2:.1f} Z" '
                f'fill="{col}"><title>{html.escape(str(name))}: '
                f"{v}B ({frac * 100:.1f}%)</title></path>"
            )
        ly = 70 + i * 22
        parts.append(
            f'<rect x="340" y="{ly - 11}" width="12" height="12" '
            f'fill="{col}"/>'
            f'<text x="358" y="{ly}" fill="{_FG}" font-size="12">'
            f"{html.escape(str(name))} — {v}B</text>"
        )
        ang = a2
    parts.append(
        f'<text x="540" y="{size + 28}" fill="{_FG}" font-size="10" '
        f'text-anchor="end">Market Cap in BILLION USD</text>'
    )
    parts.append("</svg>")
    return "".join(parts)


def _summary_table_html(index_df: DataFrame, n: int = 30) -> str:
    """The dashboard's summary table (dashboard.py:146-201): last n
    days in reverse order with returns and change labels — the same
    distributed job the XLSX/PDF sinks format."""
    from .analytics import summary_tail
    from .presentation import presentation_frame

    rows = presentation_frame(
        summary_tail(index_df, n), what="summary table"
    )
    out = [
        "<table><thead><tr><th>Date</th><th>Index Value</th>"
        "<th>Daily Return %</th><th>Cumulative Return %</th>"
        "<th>Composition Change</th></tr></thead><tbody>"
    ]
    for r in rows:
        dr = (
            "" if r["daily_return"] is None
            else f"{r['daily_return']:.4f}"
        )
        cr = (
            "" if r["cumulative_return"] is None
            else f"{r['cumulative_return']:.4f}"
        )
        out.append(
            f"<tr><td>{html.escape(str(r['date']))}</td>"
            f"<td>{r['index_value']:.4f}</td><td>{dr}</td>"
            f"<td>{cr}</td>"
            f"<td>{html.escape(str(r['change_label']))}</td></tr>"
        )
    out.append("</tbody></table>")
    return "".join(out)


def export_html(
    index_df: DataFrame,
    stocks_df: DataFrame,
    out_path: str,
    k: int = 5,
    n: int = 30,
) -> str:
    """Render the full dashboard report to one self-contained HTML
    file and return its path. Content mirrors the reference page
    top to bottom: title, performance chart, market-cap pie,
    summary table (dashboard.py:266-408)."""
    from .charts import index_chart_spec, market_cap_pie_spec

    line_svg = render_line_svg(index_chart_spec(index_df))
    pie_svg = render_pie_svg(market_cap_pie_spec(index_df, stocks_df, k))
    table = _summary_table_html(index_df, n)
    doc = f"""<!DOCTYPE html>
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
</style></head><body>
<h1>MarketViz Index Dashboard</h1>
<section>{line_svg}</section>
<section>{pie_svg}</section>
<section><h2>Index Summary (last {n} days)</h2>{table}</section>
</body></html>
"""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write(doc)
    return out_path
