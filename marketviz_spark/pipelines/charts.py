"""Chart-spec layer: the reference's two plotly figures
(dashboard.py:39-86 line+markers, :88-144 pie) emitted as plain
plotly-figure dicts — `{"data": [...], "layout": {...}}` — so any
renderer (plotly.graph_objects.Figure(**spec), a browser, a JSON
API) draws the identical chart without this engine depending on a
plotting library.

This is the presentation boundary made explicit: every NUMBER in a
spec comes from the distributed operator layer
(analytics/composition_market_caps — oracle-checked queries); only
the final ≤~1000-point presentation frame is collected, exactly
where the reference hands a frame to plotly. Styling constants
(colors, marker symbol, titles, templates) mirror the reference so
a migrating user sees the same chart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import composition_market_caps
from .analytics import analytics
from .presentation import (
    MAX_SERIES_POINTS,
    presentation_frame,
)

INDEX_LINE = {"color": "#ff0000", "width": 2}  # dashboard.py:50
CHANGE_MARKER = {  # dashboard.py:63
    "color": "orange",
    "size": 10,
    "symbol": "star-triangle-down",
}


def index_chart_spec(index_df: DataFrame) -> dict:
    """The index-performance line chart with composition-change
    markers (dashboard.py:39-86): trace 0 is the full (date, value)
    line; trace 1 marks the dates whose composition differs from the
    previous day, at the index value of that date."""
    perf = presentation_frame(
        analytics(index_df)
        .select("date", "index_value", "composition_changed")
        .orderBy("date"),
        MAX_SERIES_POINTS,
        "index chart series",
    )
    dates = [r["date"] for r in perf]
    values = [r["index_value"] for r in perf]
    changes = [
        (r["date"], r["index_value"])
        for r in perf
        if r["composition_changed"]
    ]
    data = [
        {
            "type": "scatter",
            "x": dates,
            "y": values,
            "mode": "lines",
            "name": "Index Value",
            "line": dict(INDEX_LINE),
        }
    ]
    if changes:
        data.append(
            {
                "type": "scatter",
                "x": [d for d, _ in changes],
                "y": [v for _, v in changes],
                "mode": "markers",
                "name": "Composition Change",
                "marker": dict(CHANGE_MARKER),
                "hovertemplate": (
                    "Composition changed on %{x}<extra></extra>"
                ),
            }
        )
    return {
        "data": data,
        # figure-JSON layout form (valid for plotly.js and
        # go.Figure(**spec) alike): axis titles live INSIDE the
        # axis objects — the magic-underscore "xaxis_title" keys are
        # a plotly.py-only convenience and are dropped or clobbered
        # by real renderers
        "layout": {
            "title": {"text": "MarketViz Index Performance"},
            "template": "plotly_dark",
            "hovermode": "x unified",
            "legend": {
                "yanchor": "top",
                "y": 0.99,
                "xanchor": "left",
                "x": 0.01,
            },
            "xaxis": {
                "title": {"text": "Date"},
                "tickangle": 45,
                "tickmode": "auto",
                "nticks": 20,
                "tickformat": "%d/%m",
            },
            "yaxis": {"title": {"text": "Index Value"}},
        },
    }


def market_cap_pie_spec(
    index_df: DataFrame, stocks_df: DataFrame, k: int = 5
) -> dict:
    """The top-k market-cap pie (dashboard.py:88-144): k named
    slices plus OTHERS, values in billions rounded to 1dp — computed
    by the distributed J1+A3+O6 operator, not per-ticker point
    queries like the reference."""
    rows = presentation_frame(
        composition_market_caps(index_df, stocks_df, k),
        what="market-cap pie slices",
    )
    by_name = {r["name"]: r["market_cap_billions"] for r in rows}
    # reference slice order: top-k by composition rank, then OTHERS
    comp = presentation_frame(
        index_df.orderBy(F.col("date").desc())
        .limit(1)
        .select(F.split("composition", ",").alias("c")),
        what="latest composition row",
    )[0]["c"]
    names = [t for t in comp[:k] if t in by_name]
    if "OTHERS" in by_name:
        names.append("OTHERS")
    return {
        "data": [
            {
                "type": "pie",
                "labels": names,
                "values": [by_name[n] for n in names],
            }
        ],
        "layout": {
            "title": {"text": f"Top {k} Stocks by Market Cap"},
            "template": "plotly_dark",
            "annotations": [
                {
                    "text": "Market Cap in BILLION USD",
                    "showarrow": False,
                    "x": 0.95,
                    "y": 0.97,
                    "xref": "paper",
                    "yref": "paper",
                    "font": {"size": 10},
                }
            ],
        },
    }
