"""PDF layout parse: per-page text spans with bounding boxes.

Role analogue in the reference: `no-ocr-api/np_ocr/data.py:14-33`
(`PdfReader(...).pages[i].extract_text()` + poppler page raster). The rebuild
needs `bytes -> [(page, spans[])]` where each span carries text + bbox,
emitted as nested struct arrays (SURVEY.md §1.3 `spans` schema).

PyMuPDF is not installed in this environment, so this module implements a
small from-scratch parser covering the standard text-showing subset of real
PDFs: operators BT/ET, Tf, Td, TD, Tm, TL, T*, Tj, TJ (array show with
kerning), ' and " (next-line shows), literal `(...)` and hex `<...>`
strings, and page ordering via the document page tree (Catalog -> /Pages
/Kids walk, nested tree nodes and multi-stream /Contents arrays included),
falling back to content-stream file order for tree-less files. That subset
is real PDF (readable by any viewer); the parser is the canonical
extraction path so goldens are reproducible in any environment. If PyMuPDF
is present it can be opted into via `use_pymupdf=True`, but it is never the
default (environment-dependent output would break byte-identity goldens).

Geometry model (deterministic, font-metric-free): for a glyph run shown at
text-space position (x, y) with font size s, the span bbox is
  x0=x, y0=y - 0.2*s, x1=x + 0.6*s*len(text), y1=y + 0.8*s
— the conventional 80/20 ascent/descent split and 0.6em advance for a
monospaced Helvetica-ish approximation.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_NUM_RE = re.compile(rb"[-+]?\d+(?:\.\d+)?")


@dataclass
class Span:
    text: str
    x0: float
    y0: float
    x1: float
    y1: float
    block: int  # BT..ET group index on the page, 0-based
    line: int   # Tj index within the block, 0-based


def is_pdf(payload: bytes) -> bool:
    return payload[:5] == b"%PDF-"


# --------------------------------------------------------------------------
# content-stream tokenizer


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    n = len(raw)
    esc = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12,
        ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = bytearray()
                while j < n and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits.append(raw[j])
                    j += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
                i = j
                continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


def _tokenize_content(stream: bytes):
    """Yield ('num', f) / ('str', s) / ('name', s) / ('op', s) tokens."""
    i = 0
    n = len(stream)
    while i < n:
        c = stream[i:i + 1]
        if c in b" \t\r\n\x00":
            i += 1
            continue
        if c == b"(":
            depth = 1
            j = i + 1
            start = j
            buf = bytearray()
            while j < n and depth:
                ch = stream[j]
                if ch == 0x5C:
                    buf.append(ch)
                    if j + 1 < n:
                        buf.append(stream[j + 1])
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(ch)
                j += 1
            yield ("str", _unescape_pdf_string(bytes(buf)))
            i = j + 1
            continue
        if c == b"<":
            if stream[i + 1:i + 2] == b"<":  # dict open (BDC prop lists etc.)
                i += 2
                continue
            j = stream.find(b">", i + 1)
            if j == -1:
                j = n
            hx = bytes(ch for ch in stream[i + 1:j]
                       if ch in b"0123456789abcdefABCDEF")
            if len(hx) % 2:
                hx += b"0"  # PDF spec: odd final digit implies trailing 0
            yield ("str", bytes.fromhex(hx.decode()).decode("latin-1"))
            i = j + 1
            continue
        if c == b">":  # dict close '>>'
            i += 2 if stream[i:i + 2] == b">>" else 1
            continue
        if c == b"[":
            yield ("arrstart", None)
            i += 1
            continue
        if c == b"]":
            yield ("arrend", None)
            i += 1
            continue
        if c == b"/":
            m = re.match(rb"/[^\s()<>\[\]{}/%]*", stream[i:])
            yield ("name", m.group(0)[1:].decode("latin-1"))
            i += m.end()
            continue
        m = _NUM_RE.match(stream, i)
        if m and m.start() == i:
            yield ("num", float(m.group(0)))
            i = m.end()
            continue
        m = re.match(rb"[A-Za-z'*\"]+", stream[i:])
        if m:
            yield ("op", m.group(0).decode("latin-1"))
            i += m.end()
            continue
        i += 1  # unknown byte: skip


def _parse_content_stream(stream: bytes) -> list[Span]:
    spans: list[Span] = []
    stack: list = []
    size = 12.0
    leading = 14.0
    x = y = 0.0
    line_x = line_y = 0.0
    block = -1
    line = 0

    def show(text: str, width: float) -> None:
        """Emit one span at the current text position and advance x."""
        nonlocal x, line
        if text:
            spans.append(Span(
                text=text,
                x0=round(x, 2),
                y0=round(y - 0.2 * size, 2),
                x1=round(x + width, 2),
                y1=round(y + 0.8 * size, 2),
                block=block if block >= 0 else 0,
                line=line,
            ))
            line += 1
        x += width

    def newline() -> None:
        nonlocal line_y, x, y
        line_y -= leading
        x, y = line_x, line_y

    for kind, val in _tokenize_content(stream):
        if kind in ("num", "str", "name"):
            stack.append((kind, val))
            continue
        if kind == "arrstart":
            stack.append(("mark", None))
            continue
        if kind == "arrend":
            elems: list = []
            while stack and stack[-1][0] != "mark":
                elems.append(stack.pop())
            if stack:
                stack.pop()  # the mark
            elems.reverse()
            stack.append(("arr", elems))
            continue
        op = val
        if op == "BT":
            block += 1
            line = 0
            x = y = line_x = line_y = 0.0
        elif op == "Tf" and len(stack) >= 2:
            size = float(stack[-1][1])
        elif op == "TL" and stack:
            leading = float(stack[-1][1])
        elif op == "Td" and len(stack) >= 2:
            line_x += float(stack[-2][1])
            line_y += float(stack[-1][1])
            x, y = line_x, line_y
        elif op == "TD" and len(stack) >= 2:
            leading = -float(stack[-1][1])
            line_x += float(stack[-2][1])
            line_y += float(stack[-1][1])
            x, y = line_x, line_y
        elif op == "Tm" and len(stack) >= 6:
            line_x = float(stack[-2][1])
            line_y = float(stack[-1][1])
            x, y = line_x, line_y
        elif op == "T*":
            newline()
        elif op == "Tj" and stack and stack[-1][0] == "str":
            t = stack[-1][1]
            show(t, 0.6 * size * len(t))
        elif op == "'" and stack and stack[-1][0] == "str":
            # move to next line, then show (PDF 32000-1 9.4.3)
            newline()
            t = stack[-1][1]
            show(t, 0.6 * size * len(t))
        elif op == '"' and len(stack) >= 3 and stack[-1][0] == "str":
            # aw ac string " : set word/char spacing (no geometric effect in
            # our metric-free model), next line, show
            newline()
            t = stack[-1][1]
            show(t, 0.6 * size * len(t))
        elif op == "TJ" and stack and stack[-1][0] == "arr":
            # array show: strings concatenate into ONE span (pypdf-style
            # extract_text behavior); numbers are kerning adjustments that
            # shift the advance by -n/1000 * size
            parts: list[str] = []
            width = 0.0
            for k, v in stack[-1][1]:
                if k == "str":
                    parts.append(v)
                    width += 0.6 * size * len(v)
                elif k == "num":
                    width -= v / 1000.0 * size
            show("".join(parts), width)
        if kind == "op":
            stack.clear()
    return spans


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _object_map(payload: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)}


def _stream_data(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    data = m.group(1)
    if b"/FlateDecode" in body[:m.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _page_content_streams(payload: bytes) -> list[bytes] | None:
    """Walk Catalog -> /Pages -> /Kids recursively; return one content-bytes
    blob per page IN PAGE-TREE ORDER (the document's true page order, which
    need not match object file order). None when no usable tree exists."""
    objs = _object_map(payload)
    root = None
    for body in objs.values():
        if re.search(rb"/Type\s*/Catalog\b", body):
            m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", body)
            if m:
                root = int(m.group(1))
                break
    if root is None or root not in objs:
        return None
    pages: list[bytes] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        if re.search(rb"/Type\s*/Pages\b", body):
            kids = re.search(rb"/Kids\s*\[(.*?)\]", body, re.DOTALL)
            if kids:
                for m in _REF_RE.finditer(kids.group(1)):
                    walk(int(m.group(1)))
        elif re.search(rb"/Type\s*/Page\b", body):
            cm = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", body)
            datas: list[bytes] = []
            if cm:
                for rm in _REF_RE.finditer(cm.group(1)):
                    cbody = objs.get(int(rm.group(1)))
                    if cbody is not None:
                        d = _stream_data(cbody)
                        if d is not None:
                            datas.append(d)
            pages.append(b"\n".join(datas))

    walk(root)
    return pages if pages else None


def parse_pdf(payload: bytes) -> list[list[Span]]:
    """PDF bytes -> one Span list per page (pages in document order).

    Page order comes from the document page tree (Catalog -> /Pages /Kids
    walk; handles nested tree nodes, /Contents arrays, and object file
    order != page order). Files without a parseable tree fall back to
    content-stream file order. FlateDecode'd streams are inflated when the
    object dict says /FlateDecode.
    """
    tree_pages = _page_content_streams(payload)
    if tree_pages is not None:
        return [_parse_content_stream(s) for s in tree_pages]
    pages: list[list[Span]] = []
    for m in _STREAM_RE.finditer(payload):
        head = payload[max(0, m.start() - 200):m.start()]
        data = m.group(1)
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        spans = _parse_content_stream(data)
        if spans or b"/Length" in head:
            pages.append(spans)
    return pages


def page_text(spans: list[Span]) -> str:
    """Assemble a page's text: lines joined by \\n inside a block, blocks
    joined by blank lines. Mirrors the reference's layout-free text branch
    (`data.py:20-23` extract_text)."""
    out: list[str] = []
    cur_block = None
    for sp in spans:
        if cur_block is None:
            out.append(sp.text)
        elif sp.block != cur_block:
            out.append("\n\n" + sp.text)
        else:
            out.append("\n" + sp.text)
        cur_block = sp.block
    return "".join(out)


def pdf_text(payload: bytes) -> str:
    """Whole-document text: page texts joined by blank lines (1-based page
    order, reference convention `data.py:56`)."""
    return "\n\n".join(page_text(p) for p in parse_pdf(payload) if p)


# --------------------------------------------------------------------------
# deterministic PDF writer (fixture generator — real, minimal PDF 1.4)


def pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf_custom(content_streams: list[str],
                     reverse_pages_in_file: bool = False) -> bytes:
    """Build a minimal valid uncompressed PDF around caller-supplied content
    streams (one per page). With reverse_pages_in_file=True the page/content
    OBJECTS are emitted in reverse file order while the page TREE keeps true
    order — a fixture for asserting tree-order (not file-order) parsing.
    Fully deterministic."""
    n_pages = len(content_streams)
    # obj 1: catalog, obj 2: pages; page i -> obj 3+2i, content -> obj 4+2i,
    # font -> obj 3+2*n_pages (referenced by every page's /Resources)
    font_id = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()),
    ]
    page_objs: list[tuple[int, bytes]] = []
    for i, content_str in enumerate(content_streams):
        page_obj = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R "
            f"/Resources << /Font << /F1 {font_id} 0 R >> >> >>"
        ).encode()
        content = content_str.encode("latin-1", errors="replace")
        stream_obj = (
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content + b"\nendstream"
        )
        page_objs.append((3 + 2 * i, page_obj))
        page_objs.append((4 + 2 * i, stream_obj))
    if reverse_pages_in_file:
        page_objs.reverse()
    objs += page_objs
    objs.append(
        (font_id, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for oid, body in objs:
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in sorted(offsets):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_pdf(pages: list[list[str]], font_size: int = 12,
              left: float = 72.0, top: float = 720.0,
              style: str = "tj") -> bytes:
    """Build a minimal valid uncompressed PDF: one content stream per page.
    Fully deterministic. `style` picks the text-showing operator family so a
    corpus can exercise every parser path while extracting IDENTICAL text:

      - "tj":      per-line Td + literal-string Tj (the classic form)
      - "tj_arr":  per-line TJ array show, each line split at spaces with
                   interleaved kerning numbers (net width-neutral pairs)
      - "quote":   first line Tj, then TL leading + ' next-line shows
      - "reversed": like "tj" but page/content OBJECTS emitted in reverse
                   file order — text order must come from the page tree
    """
    leading = font_size + 2
    streams: list[str] = []
    for lines in pages:
        if style == "quote":
            parts = [f"BT /F1 {font_size} Tf {leading} TL {left} {top} Td"]
            for j, ln in enumerate(lines):
                if j == 0:
                    parts.append(f"({pdf_escape(ln)}) Tj")
                else:
                    parts.append(f"({pdf_escape(ln)}) '")
            parts.append("ET")
        elif style == "tj_arr":
            parts = [f"BT /F1 {font_size} Tf {left} {top} Td"]
            for j, ln in enumerate(lines):
                if j > 0:
                    parts.append(f"0 -{leading} Td")
                words = ln.split(" ")
                elems: list[str] = []
                for wi, word in enumerate(words):
                    if wi > 0:
                        # ( )-space plus a width-neutral kern pair: the
                        # shown text is byte-identical to the "tj" style
                        elems.append("( )")
                        elems.append("40 -40")
                    elems.append(f"({pdf_escape(word)})")
                parts.append("[" + " ".join(elems) + "] TJ")
            parts.append("ET")
        else:  # "tj" and "reversed"
            parts = [f"BT /F1 {font_size} Tf {left} {top} Td"]
            for j, ln in enumerate(lines):
                if j > 0:
                    parts.append(f"0 -{leading} Td")
                parts.append(f"({pdf_escape(ln)}) Tj")
            parts.append("ET")
        streams.append(" ".join(parts))
    return build_pdf_custom(streams,
                            reverse_pages_in_file=(style == "reversed"))
