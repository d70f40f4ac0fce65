"""Minimal stdlib PDF codec for the extraction seam.

The reference's extractor (etl_infrastructure.py:9-55) needs exactly
two capabilities per page: the text and the (optional) table. This
container ships neither pdfplumber nor reportlab and installs are not
permitted, so this module provides the honest subset implementable
with the standard library alone:

- :func:`write_pdf` -- a valid single-font PDF writer (Helvetica /
  WinAnsi i.e. cp1252, which covers the bullet glyphs and Spanish
  accents; FlateDecode content streams; correct xref), used to
  generate *real* PDF fixtures for the end-to-end golden tests and as
  the reportlab-free backend of the S6 calendar report sink;
- :func:`extract_text` -- per-page text extraction: object scan,
  page-tree ordering via /Kids, zlib stream decode, and a content
  stream tokenizer covering the text-showing operators (Tj, TJ, ',
  ") with Td/TD/T* line breaks.

Scope is documented, not hidden: this handles simple Type1/WinAnsi
text PDFs (including everything :func:`write_pdf` emits); it does NOT
do CID/TrueType-subset decoding or geometric table detection. When
pdfplumber is present the extraction stage uses it instead (see
pipeline.extract.extract_documents); table extraction without
pdfplumber stays fixture-seam.
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


def _page_content(lines: list[str], font_size: int = 11, leading: int = 14) -> bytes:
    parts = [b"BT", b"/F1 %d Tf" % font_size, b"%d TL" % leading, b"72 720 Td"]
    first = True
    for line in lines:
        if not first:
            parts.append(b"T*")
        parts.append(_pdf_string(line) + b" Tj")
        first = False
    parts.append(b"ET")
    return b"\n".join(parts)


def write_pdf(path: str, pages: list[str]) -> None:
    """Write a valid text-only PDF: one Helvetica/WinAnsi font, one
    FlateDecode content stream per page, correct xref table."""
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    # 4+2i page object, 5+2i content stream
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
        + b"] /Count %d >>" % n_pages,
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>",
    }
    streams: dict[int, bytes] = {}
    for i, page_text in enumerate(pages):
        page_obj, content_obj = 4 + 2 * i, 5 + 2 * i
        objects[page_obj] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % content_obj
        )
        streams[content_obj] = zlib.compress(_page_content(page_text.split("\n")))

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
    assert data[i : i + 1] == b"("
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


def _content_lines(stream: bytes) -> list[str]:
    """Reconstruct text lines from a content stream.

    Strings accumulate as `pending` until a text-showing operator
    consumes them (Tj/TJ append to the current line; '/" break first),
    and Td/TD/T* break lines -- the model pdfplumber's layout engine
    reduces to for single-column text."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

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
            while i < n and (stream[i : i + 1].isdigit() or stream[i : i + 1] in b"+-.eE"):
                i += 1
        else:
            j = i
            while j < n and stream[j : j + 1] not in _WS and stream[j : j + 1] not in _DELIMS:
                j += 1
            op = stream[i:j]
            i = j if j > i else i + 1
            if op in (b"Tj", b"TJ"):
                cur.extend(pending)
                pending.clear()
            elif op in (b"'", b'"'):
                newline()
                cur.extend(pending)
                pending.clear()
            elif op in (b"Td", b"TD", b"T*", b"BT", b"ET"):
                newline()
                pending.clear()
            else:
                pending.clear()
    newline()
    return lines


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


def extract_text(data: bytes) -> list[str]:
    """Per-page text of a simple text PDF (the extract_text seam of
    reference etl_infrastructure.py:9-16)."""
    objects = _scan_objects(data)
    pages: list[str] = []
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
        text_lines: list[str] = []
        for payload in contents:
            text_lines.extend(_content_lines(payload))
        pages.append("\n".join(text_lines))
    return pages
