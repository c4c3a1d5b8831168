"""Minimal PDF table writer — stdlib only.

S11 completion: no reportlab in this environment, so this emits a
small but REAL PDF (header, page tree, Helvetica fonts,
uncompressed content streams, xref, trailer) reproducing the
reference report's structure (dashboard.py:228-264): an "Index
Report" title and a gridded table with a bold header row. Values
are pre-formatted by the caller exactly like the reference
(f"{v:.2f}" / f"{v:.2f}%").

Presentation sink only — fed by a 30-row driver-side frame.
"""

from __future__ import annotations

LETTER = (612, 792)
MARGIN = 54
ROW_H = 22
TITLE_SIZE = 18
HEADER_SIZE = 11
BODY_SIZE = 10


def _esc(s: str) -> str:
    return (
        str(s).replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    )


def _page_stream(title, header, rows, col_w) -> bytes:
    w, h = LETTER
    out = []
    y = h - MARGIN
    if title:
        out.append(
            f"BT /F2 {TITLE_SIZE} Tf {MARGIN} {y - TITLE_SIZE} Td "
            f"({_esc(title)}) Tj ET"
        )
        y -= TITLE_SIZE + 18
    top = y
    n_rows = len(rows) + 1
    # grid lines
    x0, x1 = MARGIN, MARGIN + sum(col_w)
    for i in range(n_rows + 1):
        yy = top - i * ROW_H
        out.append(f"{x0} {yy} m {x1} {yy} l S")
    xx = x0
    for wcol in [0, *col_w]:
        xx += wcol
        out.append(f"{xx} {top} m {xx} {top - n_rows * ROW_H} l S")
    # header (bold) + body text
    for r, row in enumerate([header, *rows]):
        font = "/F2" if r == 0 else "/F1"
        size = HEADER_SIZE if r == 0 else BODY_SIZE
        ty = top - r * ROW_H - ROW_H + 7
        tx = x0
        for c, v in enumerate(row):
            out.append(
                f"BT {font} {size} Tf {tx + 4} {ty} Td ({_esc(v)}) Tj ET"
            )
            tx += col_w[c]
    return ("\n".join(out)).encode("latin-1", "replace")


def write_pdf(path: str, title: str, header, rows, col_w=None) -> None:
    """Paginated gridded table with a title on the first page."""
    header = [str(x) for x in header]
    rows = [[str(x) for x in r] for r in rows]
    if col_w is None:
        usable = LETTER[0] - 2 * MARGIN
        col_w = [usable // len(header)] * len(header)

    per_page = (LETTER[1] - 2 * MARGIN - TITLE_SIZE - 18) // ROW_H - 1
    chunks = [
        rows[i : i + per_page] for i in range(0, len(rows), per_page)
    ] or [[]]

    objs: list[bytes] = []  # 1-based object bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font1 = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    font2 = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>"
    )
    page_ids = []
    pages_id = len(objs) + 2 * len(chunks) + 1  # filled after loop
    for i, chunk in enumerate(chunks):
        stream = _page_stream(
            title if i == 0 else None, header, chunk, col_w
        )
        cid = add(
            b"<< /Length %d >>\nstream\n%s\nendstream"
            % (len(stream), stream)
        )
        pid = add(
            (
                f"<< /Type /Page /Parent {pages_id} 0 R "
                f"/MediaBox [0 0 {LETTER[0]} {LETTER[1]}] "
                f"/Resources << /Font << /F1 {font1} 0 R /F2 {font2} 0 R "
                f">> >> /Contents {cid} 0 R >>"
            ).encode()
        )
        page_ids.append(pid)
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    real_pages_id = add(
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>"
        ).encode()
    )
    assert real_pages_id == pages_id
    catalog = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    )
    with open(path, "wb") as f:
        f.write(bytes(buf))
