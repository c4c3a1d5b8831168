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
    from .presentation import presentation_pandas

    perf = presentation_pandas(
        summary_tail(index_df, n), what="XLSX/PDF performance sheet"
    )
    comp = presentation_pandas(
        index_df.orderBy("date", ascending=False)
        .limit(n)
        .select("date", "composition"),
        what="XLSX/PDF composition sheet",
    )
    # Every date carries a label ('-' when unchanged) — the
    # reference's Composition Changes sheet lists all rows
    # (fixture: 21 rows, '-' included), not only change dates.
    changes = perf[["date", "change_label"]]
    return perf, comp, changes


def _sheet_tuples(perf, comp, changes):
    """Reference sheet layout (dashboard.py:207-219): exact sheet
    names and header strings of the committed fixture."""

    def cell(v):
        return None if v is None or v != v else v

    perf_rows = [
        [r.date, cell(r.index_value), cell(r.daily_return),
         cell(r.cumulative_return)]
        for r in perf.itertuples(index=False)
    ]
    comp_rows = [
        [r.date, r.composition] for r in comp.itertuples(index=False)
    ]
    chg_rows = [
        [r.date, r.change_label] for r in changes.itertuples(index=False)
    ]
    return [
        (
            "Performance",
            ["Date", "Price", "Daily Return (%)", "Cumulative Return (%)"],
            perf_rows,
        ),
        ("Composition", ["Date", "Composition"], comp_rows),
        (
            "Composition Changes",
            ["Date", "Composition Changes"],
            chg_rows,
        ),
    ]


def export_xlsx(index_df: DataFrame, out_path: str, n: int = 30) -> str:
    """Three-sheet workbook: Performance / Composition / Composition
    Changes with the reference's sheet names, header strings, and
    fixed column width (dashboard.py:207-226). Uses xlsxwriter when
    available; otherwise the stdlib OOXML writer (xlsx_lite) emits a
    real workbook — no CSV degradation."""
    perf, comp, changes = _summary_frames(index_df, n)
    sheets = _sheet_tuples(perf, comp, changes)
    try:
        import xlsxwriter  # noqa: F401
        import pandas as pd

        with pd.ExcelWriter(out_path, engine="xlsxwriter") as xl:
            for name, header, rows in sheets:
                pd.DataFrame(rows, columns=header).to_excel(
                    xl, sheet_name=name, index=False
                )
            for sheet in xl.sheets.values():
                sheet.set_column(0, 3, 15)  # set_column('A:D', 15)
        return out_path
    except ImportError:
        from .xlsx_lite import write_xlsx

        write_xlsx(out_path, sheets, col_width=15)
        return out_path


def export_pdf(index_df: DataFrame, out_path: str, n: int = 30) -> str:
    """"Index Report": gridded Date / Index Value / Daily Return (%)
    / Cumulative Return (%) table with the reference's cell
    formatting (dashboard.py:228-264: f"{v:.2f}" and a % suffix).
    reportlab when available, else the stdlib PDF writer — no CSV
    degradation."""
    perf, _, _ = _summary_frames(index_df, n)
    header = ["Date", "Index Value", "Daily Return (%)",
              "Cumulative Return (%)"]

    def fmt(v, pct=False):
        if v is None or v != v:
            return ""
        return f"{v:.2f}%" if pct else f"{v:.2f}"

    rows = [
        [r.date, fmt(r.index_value), fmt(r.daily_return, True),
         fmt(r.cumulative_return, True)]
        for r in perf.itertuples(index=False)
    ]
    try:
        from reportlab.lib.pagesizes import letter  # noqa: F401
        from reportlab.platypus import SimpleDocTemplate, Table

        doc = SimpleDocTemplate(out_path, pagesize=letter)
        doc.build([Table([header] + rows)])
        return out_path
    except ImportError:
        from .pdf_lite import write_pdf

        write_pdf(out_path, "Index Report", header, rows)
        return out_path
