"""Stdlib OOXML reader for tests: enough of SpreadsheetML to read
back both the reference's committed fixture (sharedStrings-based)
and xlsx_lite's output (inline strings)."""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def read_workbook(path: str) -> dict[str, list[list]]:
    """sheet name -> rows (cells as str/float/None, ragged rows
    padded with None to the header width)."""
    z = zipfile.ZipFile(path)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        shared = [
            (el.find("m:t", NS).text or "")
            if el.find("m:t", NS) is not None
            else ""
            for el in ET.fromstring(
                z.read("xl/sharedStrings.xml")
            ).findall("m:si", NS)
        ]
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    names = [s.get("name") for s in wb.findall(".//m:sheet", NS)]
    out: dict[str, list[list]] = {}
    for i, name in enumerate(names, 1):
        root = ET.fromstring(z.read(f"xl/worksheets/sheet{i}.xml"))
        rows = []
        for row in root.findall(".//m:row", NS):
            vals = []
            for c in row.findall("m:c", NS):
                t = c.get("t")
                if t == "inlineStr":
                    tnode = c.find("m:is/m:t", NS)
                    vals.append(tnode.text or "" if tnode is not None else "")
                    continue
                v = c.find("m:v", NS)
                x = v.text if v is not None else None
                if x is None:
                    vals.append(None)
                elif t == "s":
                    vals.append(shared[int(x)])
                elif t == "b":
                    vals.append(bool(int(x)))
                else:
                    vals.append(float(x))
            rows.append(vals)
        width = max((len(r) for r in rows), default=0)
        out[name] = [r + [None] * (width - len(r)) for r in rows]
    return out


def column_width(path: str, sheet_index: int = 1):
    z = zipfile.ZipFile(path)
    root = ET.fromstring(z.read(f"xl/worksheets/sheet{sheet_index}.xml"))
    col = root.find(".//m:cols/m:col", NS)
    return None if col is None else float(col.get("width"))
