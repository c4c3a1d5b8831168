"""S10/S11: XLSX and PDF export of the summary table.

Presentation-layer sinks, executed at the driver from toPandas() —
exactly the boundary the reference draws (dashboard.py:203-264). The
heavy lifting (the 30-row summary) is the distributed job in
analytics.summary_tail; these functions only format.

xlsxwriter / reportlab are not in this environment, so each export
degrades to a CSV sibling with the same sheet content (clearly
reported in the returned path) rather than failing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _summary_frames(index_df: DataFrame, n: int = 30):
    from .analytics import summary_tail
    from ..operators.windows import composition_changes

    perf = summary_tail(index_df, n).toPandas()
    comp = (
        index_df.orderBy("date", ascending=False)
        .limit(n)
        .select("date", "composition")
        .toPandas()
    )
    changes = (
        composition_changes(index_df)
        .filter("composition_changed")
        .select("date", "change_label")
        .toPandas()
    )
    return perf, comp, changes


def export_xlsx(index_df: DataFrame, out_path: str, n: int = 30) -> str:
    """Three-sheet workbook: Performance / Composition / Composition
    Changes (sheet set matches the reference exporter,
    dashboard.py:207-219). Falls back to CSVs when xlsxwriter is
    unavailable."""
    perf, comp, changes = _summary_frames(index_df, n)
    try:
        import xlsxwriter  # noqa: F401
        import pandas as pd

        with pd.ExcelWriter(out_path, engine="xlsxwriter") as xl:
            perf.to_excel(xl, sheet_name="Performance", index=False)
            comp.to_excel(xl, sheet_name="Composition", index=False)
            changes.to_excel(
                xl, sheet_name="Composition Changes", index=False
            )
            for sheet in xl.sheets.values():
                sheet.set_column(0, 4, 18)
        return out_path
    except ImportError:
        base, _ = os.path.splitext(out_path)
        for name, frame in (
            ("Performance", perf),
            ("Composition", comp),
            ("Composition Changes", changes),
        ):
            frame.to_csv(f"{base}.{name.replace(' ', '_')}.csv", index=False)
        return f"{base}.*.csv"


def export_pdf(index_df: DataFrame, out_path: str, n: int = 30) -> str:
    """Date/Index Value/Daily Return/Cumulative Return table
    (dashboard.py:228-264). CSV fallback when reportlab is missing."""
    perf, _, _ = _summary_frames(index_df, n)
    cols = ["date", "index_value", "daily_return", "cumulative_return"]
    table = perf[cols]
    try:
        from reportlab.lib.pagesizes import letter  # noqa: F401
        from reportlab.platypus import SimpleDocTemplate, Table

        doc = SimpleDocTemplate(out_path, pagesize=letter)
        data = [cols] + table.round(2).astype(str).values.tolist()
        doc.build([Table(data)])
        return out_path
    except ImportError:
        base, _ = os.path.splitext(out_path)
        table.to_csv(f"{base}.pdf.csv", index=False)
        return f"{base}.pdf.csv"
