"""Minimal OOXML spreadsheet writer — stdlib only (zipfile + XML).

S10 completion: the environment has no xlsxwriter, and the CSV
fallback left byte/format parity untested. An .xlsx is just a ZIP of
SpreadsheetML parts, so this writes a REAL workbook: one sheet per
(name, header, rows) tuple, inline strings (no sharedStrings part
needed), numeric cells as numbers, None as blank, and the
reference's fixed column width (dashboard.py:224 set_column('A:D',
15)) via a <cols> element.

Scope is deliberately exactly what the reference exporter uses —
this is a presentation sink fed by a 30-row driver-side frame
(export.py), not a data path; scale work lives upstream.
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr
from zipfile import ZIP_DEFLATED, ZipFile

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
)

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _col_letter(i: int) -> str:
    """0-based column index -> A1-style letters."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


# XML 1.0 forbids control chars below 0x20 except \t \n \r; a stray
# control byte in a text cell would corrupt the whole workbook, so
# strip them (xlsxwriter does the same)
_XML_INVALID = {
    c: None for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)
}


def _cell(r: int, c: int, v) -> str:
    ref = f"{_col_letter(c)}{r}"
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and v != v:  # NaN -> blank like pandas
            return ""
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(str(v).translate(_XML_INVALID))}</t></is></c>"
    )


def _sheet_xml(header, rows, col_width) -> str:
    n_cols = len(header)
    cols = (
        f'<cols><col min="1" max="{n_cols}" width="{col_width}" '
        'customWidth="1"/></cols>'
    )
    body = []
    for r, row in enumerate([list(header)] + [list(x) for x in rows], 1):
        cells = "".join(_cell(r, c, v) for c, v in enumerate(row))
        body.append(f'<row r="{r}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">'
        + cols
        + "<sheetData>"
        + "".join(body)
        + "</sheetData></worksheet>"
    )


def write_xlsx(path: str, sheets, col_width: int = 15) -> None:
    """sheets: iterable of (name, header, rows). Writes a real
    workbook readable by Excel/openpyxl/pandas."""
    sheets = list(sheets)
    with ZipFile(path, "w", ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheet_overrides="\n".join(
                    _SHEET_OVERRIDE.format(i=i + 1)
                    for i in range(len(sheets))
                )
            ),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr(
            "xl/workbook.xml",
            _WORKBOOK.format(
                sheets="".join(
                    # quoteattr: attribute context needs quote
                    # escaping too (escape() leaves '"' alone)
                    f"<sheet name={quoteattr(name)} sheetId=\"{i + 1}\" "
                    f'r:id="rId{i + 1}"/>'
                    for i, (name, _, _) in enumerate(sheets)
                )
            ),
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            _WB_RELS.format(
                rels="\n".join(
                    f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                    "openxmlformats.org/officeDocument/2006/relationships/"
                    f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                    for i in range(len(sheets))
                )
            ),
        )
        for i, (_, header, rows) in enumerate(sheets):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(header, rows, col_width),
            )
