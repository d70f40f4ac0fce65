"""Minimal stdlib PDF codec for the extraction seam.

The reference's extractor (etl_infrastructure.py:9-55) needs exactly
two capabilities per page: the text and the (optional) table. This
container ships neither pdfplumber nor reportlab and installs are not
permitted, so this module provides the honest subset implementable
with the standard library alone:

- :func:`write_pdf` -- a valid single-font PDF writer (Helvetica /
  WinAnsi i.e. cp1252, which covers the bullet glyphs and Spanish
  accents; FlateDecode content streams; correct xref). Pages are
  plain text or mixed blocks of text and RULED TABLES (stroked grid
  lines + cells positioned on the column grid), used to generate
  *real* PDF fixtures for the end-to-end golden tests and as the
  reportlab-free backend of the S6 calendar report sink;
- :func:`extract_pages` / :func:`extract_text` -- per-page layout
  extraction: object scan, page-tree ordering via /Kids, zlib stream
  decode, and a content-stream interpreter that tracks the text
  matrix (Tm/Td/TD/T*/TL) and stroked path segments (m/l/re + S), so
  every shown string has an (x, y) position. Lines are y-clusters of
  runs; tables are recovered with TWO strategies, tried in order:

  1. **lines strategy** (pdfplumber's default model, reference
     etl_infrastructure.py:18-23, page.extract_table()): a grid of
     >=2 horizontal and >=2 vertical painted rules defines the
     cells, and runs are binned into cells by position;
  2. **text strategy** (pdfplumber's ``"text"`` vertical/horizontal
     strategy, for BORDERLESS tables): when no ruled grid exists,
     x-positions of runs are clustered into column gutters across a
     consecutive block of multi-column rows; adjacent single-column
     rows whose runs sit exactly on a detected gutter (e.g. a
     full-width "Unidad n. N" banner cell) are absorbed into the
     block, while prose at the page margin is not.

Scope is documented, not hidden: this handles simple Type1/WinAnsi
text PDFs (including everything :func:`write_pdf` emits); it does NOT
do CID/TrueType-subset decoding, and the text strategy requires
columns aligned within 1pt across rows (true of program-generated
tables; scanned/jittered layouts need pdfplumber). When pdfplumber is
present the extraction stage uses it instead (see
pipeline.extract.extract_documents).
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

_ESCAPES = {ord("\\"): b"\\\\", ord("("): b"\\(", ord(")"): b"\\)"}


def _pdf_string(text: str) -> bytes:
    out = bytearray(b"(")
    for byte in text.encode("cp1252", errors="replace"):
        out += _ESCAPES.get(byte, bytes([byte]))
    out += b")"
    return bytes(out)


# A page is a plain string (text lines) or a list of blocks, each a
# string or a ("table", rows) tuple with rows: list[list[str]].
PageSpec = "str | list[str | tuple[str, list[list[str]]]]"

_TABLE_X0, _TABLE_X1 = 72.0, 540.0
_RULE_DROP = 4.0  # rule sits this far below the row's text baseline


def _fmt_num(v: float) -> bytes:
    s = f"{v:.2f}".rstrip("0").rstrip(".")
    return (s or "0").encode("ascii")


#: Non-stroking RGB fills mirroring the reference's reportlab TableStyle
#: (etl_pipeline.py:128-140): colors.grey header band, whitesmoke header
#: text, white/lightgrey alternating body rows.
_GREY = b"0.5 0.5 0.5 rg"
_LIGHTGREY = b"0.83 0.83 0.83 rg"
_WHITESMOKE = b"0.96 0.96 0.96 rg"
_BLACK = b"0 0 0 rg"


def _page_content(blocks, font_size: int = 11, leading: int = 14) -> bytes:
    """Render text blocks and ruled-table blocks top-down from y=720.

    Every line/cell is absolutely positioned with Tm; table grids are
    stroked as real path segments (m/l/S), i.e. the page carries the
    same ruling lines a styled report table has -- which is also what
    the reader's lines-strategy table detection keys on.

    A ``("styled_table", rows)`` block additionally paints the
    reference's reportlab styling (grey header band, whitesmoke bold
    header text, white/lightgrey striped body rows -- reference
    etl_pipeline.py:128-140). The background rectangles span exactly
    the grid cells, so their `re` edges coincide with the stroked
    rules and the reader's table detection sees the identical grid as
    the unstyled variant."""
    parts: list[bytes] = []
    y = 720.0

    def show(
        x: float, ty: float, text: str, font: bytes = b"F1", size: int | None = None,
        color: bytes | None = None,
    ) -> None:
        # color ops go BEFORE BT: the reader treats unknown operators as
        # run breaks, which would drop a pending string after it.
        parts.append(
            b"%sBT /%s %d Tf 1 0 0 1 %s %s Tm %s Tj ET%s"
            % (
                color + b" " if color else b"",
                font,
                size or font_size,
                _fmt_num(x),
                _fmt_num(ty),
                _pdf_string(text),
                b" " + _BLACK if color else b"",
            )
        )

    for block in blocks:
        if isinstance(block, str):
            for line in block.split("\n"):
                show(72.0, y, line)
                y -= leading
            continue
        tag, rows = block
        styled = tag == "styled_table"
        bare = tag == "bare_table"  # cells on the grid, NO painted rules
        rows = [list(r) for r in rows]
        ncols = max((len(r) for r in rows), default=0) or 1
        col_w = (_TABLE_X1 - _TABLE_X0) / ncols
        top = y + leading - _RULE_DROP
        bottoms = [y - i * leading - _RULE_DROP for i in range(len(rows))]
        if styled:
            # painter's model: fills first, then rules, then text
            bands = [(0, _GREY)]  # header
            bands += [
                (i, _LIGHTGREY) for i in range(1, len(rows)) if i % 2 == 0
            ]  # ROWBACKGROUNDS [white, lightgrey] from body row 1
            for i, color in bands:
                row_top = top if i == 0 else bottoms[i - 1]
                parts.append(
                    b"%s %s %s %s %s re f"
                    % (
                        color,
                        _fmt_num(_TABLE_X0),
                        _fmt_num(bottoms[i]),
                        _fmt_num(_TABLE_X1 - _TABLE_X0),
                        _fmt_num(row_top - bottoms[i]),
                    )
                )
            parts.append(_BLACK)
        if not bare:
            for yh in [top, *bottoms]:
                parts.append(
                    b"%s %s m %s %s l S"
                    % (_fmt_num(_TABLE_X0), _fmt_num(yh), _fmt_num(_TABLE_X1), _fmt_num(yh))
                )
            for j in range(ncols + 1):
                xv = _TABLE_X0 + j * col_w
                parts.append(
                    b"%s %s m %s %s l S"
                    % (_fmt_num(xv), _fmt_num(bottoms[-1]), _fmt_num(xv), _fmt_num(top))
                )
        for i, row in enumerate(rows):
            header = styled and i == 0
            for j, cell in enumerate(row):
                if cell:
                    show(
                        _TABLE_X0 + j * col_w + 2,
                        y - i * leading,
                        cell,
                        font=b"F2" if header else b"F1",
                        size=12 if header else None,
                        color=_WHITESMOKE if header else None,
                    )
        y = bottoms[-1] - leading
    return b"\n".join(parts)


def write_pdf(path: str, pages: list) -> None:
    """Write a valid PDF: Helvetica + Helvetica-Bold WinAnsi fonts, one
    FlateDecode content stream per page, correct xref table. Each page
    is a plain string of newline-separated lines, or a list of blocks
    mixing strings with ``("table", rows)`` ruled tables /
    ``("styled_table", rows)`` report-styled tables (grey header,
    striped rows -- the reference's reportlab style) /
    ``("bare_table", rows)`` BORDERLESS tables (cells positioned on
    the column grid with no painted rules -- the text-strategy test
    shape)."""
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    # 4+2i page object, 5+2i content stream; 4+2n bold font (F2,
    # styled-table headers)
    bold_obj = 4 + 2 * n_pages
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
        + b"] /Count %d >>" % n_pages,
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>",
        bold_obj: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold"
        b" /Encoding /WinAnsiEncoding >>",
    }
    streams: dict[int, bytes] = {}
    for i, page in enumerate(pages):
        page_obj, content_obj = 4 + 2 * i, 5 + 2 * i
        objects[page_obj] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R /F2 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (bold_obj, content_obj)
        )
        blocks = [page] if isinstance(page, str) else page
        streams[content_obj] = zlib.compress(_page_content(blocks))

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects | streams):
        offsets[num] = len(buf)
        if num in streams:
            data = streams[num]
            buf += b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % (
                num,
                len(data),
            )
            buf += data + b"\nendstream\nendobj\n"
        else:
            buf += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_at = len(buf)
    n_obj = max(offsets) + 1
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % n_obj
    for num in range(1, n_obj):
        buf += b"%010d 00000 n \n" % offsets[num]
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_obj, xref_at)
    )
    with open(path, "wb") as fh:
        fh.write(bytes(buf))


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_OBJ_RX = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF_RX = re.compile(rb"(\d+)\s+\d+\s+R\b")
_WS = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


_LENGTH_RX = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Object number -> body bytes, by direct scan (no xref needed --
    robust to the incremental-update and broken-xref files real
    pipelines meet).

    The scan walks forward object by object and jumps over stream
    payloads (sized by a literal /Length when present, else by the next
    `endstream`), so compressed bytes that happen to contain `endobj`
    or `N 0 obj` can neither truncate the enclosing object nor inject
    spurious ones."""
    objects: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RX.search(data, pos)
        if m is None:
            return objects
        body_start = m.end()
        stream_at = data.find(b"stream", body_start)
        endobj_at = data.find(b"endobj", body_start)
        if stream_at != -1 and (endobj_at == -1 or stream_at < endobj_at):
            payload_start = stream_at + len(b"stream")
            if data[payload_start : payload_start + 2] == b"\r\n":
                payload_start += 2
            elif data[payload_start : payload_start + 1] in (b"\n", b"\r"):
                payload_start += 1
            lm = _LENGTH_RX.search(data[body_start:stream_at])
            search_from = payload_start + int(lm.group(1)) if lm else payload_start
            endstream_at = data.find(b"endstream", search_from)
            if endstream_at == -1 and lm:  # /Length lied; fall back
                endstream_at = data.find(b"endstream", payload_start)
            endobj_at = data.find(
                b"endobj", endstream_at if endstream_at != -1 else payload_start
            )
        if endobj_at == -1:
            pos = body_start
            continue
        objects[int(m.group(1))] = data[body_start:endobj_at]
        pos = endobj_at + len(b"endobj")


def _stream_payload(body: bytes) -> bytes | None:
    at = body.find(b"stream")
    if at == -1:
        return None
    start = at + len(b"stream")
    if body[start : start + 2] == b"\r\n":
        start += 2
    elif body[start : start + 1] in (b"\n", b"\r"):
        start += 1
    end = body.rfind(b"endstream")
    payload = body[start:end]
    if b"/FlateDecode" in body[:at]:
        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            # corrupt or unsupported stream: treat as undecodable rather
            # than failing the whole document
            return None
    return payload


def _read_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a (...) literal string starting at data[i] == '('."""
    if data[i : i + 1] != b"(":
        # caller contract violation; a real raise (not assert, which
        # python -O strips) keeps a malformed token from silently
        # shifting every subsequent parse position
        raise ValueError(f"expected '(' at content-stream offset {i}")
    i += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == ord("\\"):
            nxt = data[i + 1 : i + 2]
            if nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
                # octal escapes consume at most 3 digits 0-7 (PDF 32000
                # 7.3.4.2); \8 and \9 fall through to the unrecognized-
                # escape branch below, which drops the backslash only
                j = 1
                while j <= 3 and data[i + j : i + j + 1] in b"01234567" and data[i + j : i + j + 1] != b"":
                    j += 1
                out.append(int(data[i + 1 : i + j], 8) & 0xFF)
                i += j
            elif nxt in (b"\n", b"\r"):
                # backslash-EOL is a line continuation: no character
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                out += {
                    b"n": b"\n",
                    b"r": b"\r",
                    b"t": b"\t",
                    b"b": b"\b",
                    b"f": b"\x0c",
                }.get(nxt, nxt)
                i += 2
            continue
        if c == ord("("):
            depth += 1
        elif c == ord(")"):
            depth -= 1
            if depth == 0:
                return out.decode("cp1252", errors="replace"), i + 1
        out.append(c)
        i += 1
    return out.decode("cp1252", errors="replace"), i


_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
_STROKE_OPS = (b"S", b"s", b"B", b"b", b"B*", b"b*", b"f", b"F", b"f*")


def _mat_mult(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _page_layout(
    stream: bytes, seq0: int = 0
) -> tuple[list[tuple[float, float, int, str]], list[tuple[float, float, float, float]]]:
    """Interpret a content stream into positioned text runs and rules.

    Returns ``(runs, rules)`` where runs are ``(y, x, seq, text)`` --
    the text-matrix translation at which each string was shown, with
    ``seq`` preserving emission order for same-position runs -- and
    rules are painted path segments ``(x0, y0, x1, y1)`` (from m/l and
    re, flushed by any stroke/fill operator). Tracks Tm/Td/TD/T*/TL
    through real matrix composition, so both the absolute-Tm layout
    the current writer emits and the Td/T* relative layout of older
    files (and most simple generators) position identically. Glyph
    widths are unknown without font metrics, so consecutive shows
    without a repositioning share an (x, y) and are re-joined in seq
    order downstream."""
    runs: list[tuple[float, float, int, str]] = []
    rules: list[tuple[float, float, float, float]] = []
    stack: list[float] = []
    pending: list[str] = []
    tm = lm = _IDENTITY
    tl = 0.0
    path: list[tuple[float, float, float, float]] = []
    pt: tuple[float, float] | None = None
    seq = seq0

    def show() -> None:
        nonlocal seq
        if pending:
            runs.append((tm[5], tm[4], seq, "".join(pending)))
            seq += 1
            pending.clear()

    def text_advance(tx: float, ty: float) -> None:
        nonlocal lm, tm
        lm = _mat_mult((1.0, 0.0, 0.0, 1.0, tx, ty), lm)
        tm = lm

    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c in _WS:
            i += 1
        elif c == b"(":
            s, i = _read_string(stream, i)
            pending.append(s)
        elif c == b"<" and stream[i + 1 : i + 2] != b"<":
            end = stream.find(b">", i)
            hexstr = re.sub(rb"\s", b"", stream[i + 1 : end])
            if len(hexstr) % 2:
                hexstr += b"0"
            pending.append(bytes.fromhex(hexstr.decode("ascii")).decode("cp1252", errors="replace"))
            i = end + 1
        elif c == b"<":  # << dict >>
            i += 2
        elif c in (b"[", b"]", b">", b"{", b"}"):
            i += 1
        elif c == b"/":
            i += 1
            while i < n and stream[i : i + 1] not in _WS and stream[i : i + 1] not in _DELIMS:
                i += 1
        elif c.isdigit() or c in (b"+", b"-", b"."):
            j = i
            while j < n and (stream[j : j + 1].isdigit() or stream[j : j + 1] in b"+-.eE"):
                j += 1
            try:
                stack.append(float(stream[i:j]))
            except ValueError:
                pass
            i = j
        else:
            j = i
            while j < n and stream[j : j + 1] not in _WS and stream[j : j + 1] not in _DELIMS:
                j += 1
            op = stream[i:j]
            i = j if j > i else i + 1
            if op in (b"Tj", b"TJ"):
                show()
            elif op in (b"'", b'"'):
                text_advance(0.0, -tl)
                show()
            elif op == b"Td" and len(stack) >= 2:
                text_advance(stack[-2], stack[-1])
            elif op == b"TD" and len(stack) >= 2:
                tl = -stack[-1]
                text_advance(stack[-2], stack[-1])
            elif op == b"Tm" and len(stack) >= 6:
                lm = tm = tuple(stack[-6:])
            elif op == b"T*":
                text_advance(0.0, -tl)
            elif op == b"TL" and stack:
                tl = stack[-1]
            elif op == b"BT":
                tm = lm = _IDENTITY
            elif op == b"m" and len(stack) >= 2:
                pt = (stack[-2], stack[-1])
                pending.clear()
            elif op == b"l" and len(stack) >= 2:
                if pt is not None:
                    path.append((pt[0], pt[1], stack[-2], stack[-1]))
                pt = (stack[-2], stack[-1])
                pending.clear()
            elif op == b"re" and len(stack) >= 4:
                x, y, w, h = stack[-4:]
                path.extend(
                    [
                        (x, y, x + w, y),
                        (x, y + h, x + w, y + h),
                        (x, y, x, y + h),
                        (x + w, y, x + w, y + h),
                    ]
                )
                pending.clear()
            elif op in _STROKE_OPS:
                rules.extend(path)
                path.clear()
                pt = None
                pending.clear()
            elif op == b"n":
                path.clear()
                pt = None
                pending.clear()
            elif op == b"ET":
                pass
            else:
                pending.clear()
            stack.clear()
    return runs, rules


def _assemble_lines(runs: list[tuple[float, float, int, str]]) -> list[str]:
    """y-cluster runs into text lines (top-down, left-to-right).

    Runs at the same x (consecutive shows without repositioning)
    concatenate directly; a change of x within a line reads as a cell/
    column gap and joins with a single space."""
    by_y: dict[float, list[tuple[float, int, str]]] = {}
    for y, x, seq, text in runs:
        by_y.setdefault(round(y, 1), []).append((x, seq, text))
    lines: list[str] = []
    for y in sorted(by_y, reverse=True):
        parts: list[str] = []
        prev_x: float | None = None
        for x, _seq, text in sorted(by_y[y]):
            if parts and x != prev_x:
                parts.append(" ")
            parts.append(text)
            prev_x = x
        lines.append("".join(parts))
    return lines


def _detect_table(
    runs: list[tuple[float, float, int, str]],
    rules: list[tuple[float, float, float, float]],
) -> list[list[str]] | None:
    """Lines-strategy table detection (pdfplumber's default model):
    >=2 horizontal + >=2 vertical painted rules define a cell grid;
    text runs inside the grid box are binned into cells by position.
    One grid per page -- the layout this engine's writer and simple
    report generators produce. Returns None when the page has no
    ruled grid (an unruled aligned-text table is NOT a table here,
    matching ``page.extract_table()`` on the same layout)."""
    hs = {round(r[1], 1) for r in rules if abs(r[1] - r[3]) < 0.01 and abs(r[0] - r[2]) > 1}
    vs = {round(r[0], 1) for r in rules if abs(r[0] - r[2]) < 0.01 and abs(r[1] - r[3]) > 1}
    ys = sorted(hs, reverse=True)
    xs = sorted(vs)
    if len(ys) < 2 or len(xs) < 2:
        return None
    nrows, ncols = len(ys) - 1, len(xs) - 1
    cells: list[list[list[tuple[float, int, str]]]] = [
        [[] for _ in range(ncols)] for _ in range(nrows)
    ]
    for y, x, seq, text in runs:
        if not (xs[0] <= x <= xs[-1] and ys[-1] <= y <= ys[0]):
            continue
        r = next((k for k in range(nrows) if ys[k + 1] < y <= ys[k]), None)
        c = next((k for k in range(ncols) if xs[k] <= x < xs[k + 1]), None)
        if r is not None and c is not None:
            cells[r][c].append((x, seq, text))
    return [
        ["".join(t for _x, _s, t in sorted(cell)).strip() for cell in row]
        for row in cells
    ]


def _detect_table_unruled(
    runs: list[tuple[float, float, int, str]],
    x_tol: float = 1.0,
    min_rows: int = 2,
    min_cols: int = 2,
) -> list[list[str]] | None:
    """Text-alignment strategy for BORDERLESS tables (pdfplumber's
    ``"text"`` strategy model): no painted rules, so columns are
    inferred from the x-positions of text runs.

    1. y-cluster runs into rows (top-down);
    2. find the longest consecutive block of rows with >= ``min_cols``
       distinct x-positions (the multi-column core of the table);
    3. cluster the core rows' x-positions into column gutters; a
       gutter must be anchored by >= 2 rows;
    4. extend the block to adjacent rows whose every run sits ON a
       detected gutter (within ``x_tol``) -- this absorbs full-width
       single-cell banner rows (e.g. "Unidad n. N: ..." in a syllabus
       units table) while page-margin prose, which starts left of
       column 0, is not absorbed;
    5. bin each row's runs into the gutter columns by x.

    The 1pt tolerance is deliberate: program-generated tables place a
    column at an exact x on every row, while prose words almost never
    align within 1pt across rows, which keeps false positives out of
    the tableless-page path. Returns None when no aligned block
    exists.

    Known limit (shared with pdfplumber's text strategy, whose
    ``min_words_vertical=3`` is stricter still): a column needs >= 2
    rows with a non-empty cell to anchor its gutter; a column that is
    empty in every body row merges into its left neighbor."""
    by_y: dict[float, list[tuple[float, int, str]]] = {}
    for y, x, seq, text in runs:
        by_y.setdefault(round(y, 1), []).append((x, seq, text))
    ys = sorted(by_y, reverse=True)
    is_core = [len({x for x, _s, _t in by_y[y]}) >= min_cols for y in ys]
    best_len, best_at = 0, 0
    i = 0
    while i < len(ys):
        if is_core[i]:
            j = i
            while j < len(ys) and is_core[j]:
                j += 1
            if j - i > best_len:
                best_len, best_at = j - i, i
            i = j
        else:
            i += 1
    if best_len < min_rows:
        return None
    core = ys[best_at : best_at + best_len]
    xs = sorted(x for y in core for x, _s, _t in by_y[y])
    clusters: list[list[float]] = []  # [lo, hi]
    for x in xs:
        if clusters and x - clusters[-1][1] <= x_tol:
            clusters[-1][1] = x
        else:
            clusters.append([x, x])
    gutters = [
        lo
        for lo, hi in clusters
        if sum(
            1 for y in core if any(lo - x_tol <= x <= hi + x_tol for x, _s, _t in by_y[y])
        )
        >= 2
    ]
    if len(gutters) < min_cols:
        return None

    def on_gutters(y: float) -> bool:
        return all(
            any(abs(x - g) <= x_tol for g in gutters) for x, _s, _t in by_y[y]
        )

    lo_i, hi_i = best_at, best_at + best_len - 1
    while lo_i > 0 and by_y[ys[lo_i - 1]] and on_gutters(ys[lo_i - 1]):
        lo_i -= 1
    while hi_i + 1 < len(ys) and by_y[ys[hi_i + 1]] and on_gutters(ys[hi_i + 1]):
        hi_i += 1
    table: list[list[str]] = []
    for y in ys[lo_i : hi_i + 1]:
        cells: list[list[tuple[float, int, str]]] = [[] for _ in gutters]
        for x, seq, text in sorted(by_y[y]):
            c = 0
            for k, g in enumerate(gutters):
                if x >= g - x_tol:
                    c = k
            cells[c].append((x, seq, text))
        table.append(["".join(t for _x, _s, t in sorted(cell)).strip() for cell in cells])
    return table


def _page_order(objects: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order via the /Kids arrays."""
    kids: list[int] = []
    for body in objects.values():
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body:
            arr_start = body.find(b"[", body.find(b"/Kids"))
            arr_end = body.find(b"]", arr_start)
            kids.extend(int(m.group(1)) for m in _REF_RX.finditer(body[arr_start:arr_end]))
    if kids:
        return kids
    return sorted(num for num, body in objects.items() if b"/Type" in body and b"/Page" in body and b"/Pages" not in body)


def extract_pages(data: bytes) -> list[tuple[str, list[list[str]] | None]]:
    """Per-page ``(text, table)`` of a simple text PDF -- the two
    capabilities the reference extractor needs per page
    (etl_infrastructure.py:9-23: ``page.extract_text()`` +
    ``page.extract_table()``). ``table`` is rows of cell strings when
    the page carries a ruled grid (lines strategy), else when a
    borderless aligned-column block exists (text strategy), else
    None."""
    objects = _scan_objects(data)
    pages: list[tuple[str, list[list[str]] | None]] = []
    for page_num in _page_order(objects):
        body = objects.get(page_num, b"")
        contents: list[bytes] = []
        at = body.find(b"/Contents")
        if at != -1:
            # one ref or an array of refs
            tail = body[at : body.find(b"/", at + 9) if body.find(b"/", at + 9) != -1 else len(body)]
            for m in _REF_RX.finditer(tail):
                payload = _stream_payload(objects.get(int(m.group(1)), b""))
                if payload is not None:
                    contents.append(payload)
        runs: list[tuple[float, float, int, str]] = []
        rules: list[tuple[float, float, float, float]] = []
        for payload in contents:
            more_runs, more_rules = _page_layout(payload, seq0=len(runs))
            runs.extend(more_runs)
            rules.extend(more_rules)
        table = _detect_table(runs, rules)
        if table is None:
            table = _detect_table_unruled(runs)
        pages.append(("\n".join(_assemble_lines(runs)), table))
    return pages


def extract_text(data: bytes) -> list[str]:
    """Per-page text of a simple text PDF (the extract_text seam of
    reference etl_infrastructure.py:9-16)."""
    return [text for text, _table in extract_pages(data)]
