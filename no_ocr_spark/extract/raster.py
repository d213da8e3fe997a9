"""From-scratch PDF page rasterizer (the S3 "page raster scan" leg).

Reference analogue: `no-ocr-api/np_ocr/data.py:25-27` — poppler via
pdf2image renders each PDF page at dpi=150 and re-encodes as JPEG; those
page images are the unit the reference embeds and thumbnails. Poppler is
absent from this container, so this module renders pages directly from
the layout parse (`extract/pdf.py` spans with bounding boxes) onto a
pixel canvas, then the from-scratch JPEG encoder (`extract/jpeg.py`)
produces the same page-image artifact shape.

Fidelity contract (stated plainly):

* Page GEOMETRY is real — US-Letter canvas (the 612x792pt MediaBox our
  builder and most crawl PDFs use) scaled by dpi/72, spans placed at
  their parsed bounding boxes with the PDF's bottom-left origin flipped
  to raster top-left; per-character cells advance across the span box
  exactly like the parser's width model.
* GLYPH SHAPES are a REAL hand-drawn 5x7 dot-matrix font for letters,
  digits, and common punctuation (drawn from scratch below —
  `_FONT_ART` — in the classic 5x7 LED-matrix style; lowercase renders
  as small caps, i.e. the uppercase form, a deliberate table-size
  trade that keeps every letter legible and distinct). Codepoints
  outside the font fall back to a deterministic 5x7 pseudo-glyph
  (bits of a Knuth-style multiplicative hash) so arbitrary unicode
  still rasters with faithful ink statistics. Space renders blank.
  Both paths share one bit encoding (bit 5*row+col), so the
  page_rasters SQL oracle recomputes ink counts in closed form from
  the same 35-bit glyph values.

Everything is integer/deterministic: the same (pdf, dpi) yields the same
bytes on every worker, so per-page checksums are stable across
parallelism levels — the same invariant the text path proves.
"""

from __future__ import annotations

import numpy as np

from no_ocr_spark.extract.pdf import DEFAULT_MEDIA_BOX, parse_pdf_full

PAGE_W_PT, PAGE_H_PT = 612.0, 792.0  # US-Letter (tree-less fallback)

# PDF 32000-1 maximum page dimension without /UserUnit: 14400 pt (200in)
_MAX_PAGE_PT = 14400.0
_MIN_PAGE_PT = 3.0


def _sane_box(box) -> tuple[float, float, float, float]:
    """Normalize a /MediaBox per §7.9.5 (corners may come in any order —
    real writers emit reversed boxes) and reject degenerate or
    spec-overflowing dimensions with the Letter default, so a corrupt
    box can neither crash the canvas allocation (negative dims) nor
    drive a multi-TiB one (review finding)."""
    x0, y0, x1, y1 = box
    x0, x1 = min(x0, x1), max(x0, x1)
    y0, y1 = min(y0, y1), max(y0, y1)
    w, h = x1 - x0, y1 - y0
    if not (_MIN_PAGE_PT <= w <= _MAX_PAGE_PT
            and _MIN_PAGE_PT <= h <= _MAX_PAGE_PT):
        return DEFAULT_MEDIA_BOX
    return (x0, y0, x1, y1)


# Hand-drawn 5x7 dot-matrix font (7 rows of 5 cells, '#' = ink). Drawn
# for this module in the classic dot-matrix style; nothing transcribed.
_FONT_ART: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": (".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": ("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    ",": (".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."),
    ":": (".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    ";": (".....", ".##..", ".##..", ".....", ".##..", "..#..", ".#..."),
    "!": ("..#..", "..#..", "..#..", "..#..", "..#..", ".....", "..#.."),
    "?": (".###.", "#...#", "....#", "...#.", "..#..", ".....", "..#.."),
    "-": (".....", ".....", ".....", ".###.", ".....", ".....", "....."),
    "'": ("..#..", "..#..", ".....", ".....", ".....", ".....", "....."),
    '"': (".#.#.", ".#.#.", ".....", ".....", ".....", ".....", "....."),
    "(": ("...#.", "..#..", ".#...", ".#...", ".#...", "..#..", "...#."),
    ")": (".#...", "..#..", "...#.", "...#.", "...#.", "..#..", ".#..."),
    "/": ("....#", "...#.", "...#.", "..#..", ".#...", ".#...", "#...."),
}


def _art_value(rows: tuple[str, ...]) -> int:
    """Glyph bitmap -> 35-bit value, bit index = 5*row + col (the SAME
    encoding the pseudo-glyph hash uses, so the SQL oracle's 5-bit row
    slicing works identically for both)."""
    v = 0
    for r, row in enumerate(rows):
        for c, ch in enumerate(row):
            if ch == "#":
                v |= 1 << (5 * r + c)
    return v


FONT_VALUES: dict[int, int] = {ord(k): _art_value(a)
                               for k, a in _FONT_ART.items()}
# lowercase renders as small caps (the uppercase form)
FONT_VALUES.update({ord(k.lower()): FONT_VALUES[ord(k)]
                    for k in _FONT_ART if k.isalpha()})


def _bits_to_glyph(v: int) -> np.ndarray:
    bits = np.array([(v >> i) & 1 for i in range(35)], np.uint8)
    return bits.reshape(7, 5)


def _pseudo_glyph(cp: int) -> np.ndarray:
    """FALLBACK for codepoints outside the font: deterministic 5x7 bit
    pattern (0 = blank space). Knuth multiplicative hash spreads the 35
    bits; every non-space glyph gets a baseline row so text lines read
    as lines in ink-density."""
    if cp == 0x20:
        return np.zeros((7, 5), np.uint8)
    h = (cp * 2654435761) & 0xFFFFFFFFF  # 36 bits, use 35
    g = _bits_to_glyph(h)
    g[6, :] = 1  # baseline stroke
    return g


_GLYPH_CACHE: dict[int, np.ndarray] = {}


def _glyph(cp: int) -> np.ndarray:
    g = _GLYPH_CACHE.get(cp)
    if g is None:
        v = FONT_VALUES.get(cp)
        g = _bits_to_glyph(v) if v is not None else _pseudo_glyph(cp)
        _GLYPH_CACHE[cp] = g
    return g


def rasterize_pages(pdf_bytes: bytes, dpi: int = 150) -> list[np.ndarray]:
    """PDF -> one (H, W) uint8 grayscale canvas per page (255 = paper,
    0 = ink), H/W = that page's /MediaBox * dpi/72 — real documents mix
    sizes (A4 595x842, Letter 612x792, ...), inherited down the page
    tree; tree-less files default to US-Letter. dpi is the reference's
    knob."""
    pages, boxes = parse_pdf_full(pdf_bytes)  # ONE scan + tree walk
    scale = dpi / 72.0
    out = []
    for spans, raw_box in zip(pages, boxes):
        bx0, by0, bx1, by1 = _sane_box(raw_box)
        w = int(round((bx1 - bx0) * scale))
        h = int(round((by1 - by0) * scale))
        canvas = np.full((h, w), 255, np.uint8)
        for sp in spans:
            text = sp.text
            if not text:
                continue
            # span box in raster coords: shift by the box origin, flip y
            # (PDF origin bottom-left -> raster top-left)
            x0 = (sp.x0 - bx0) * scale
            y_top = (by1 - sp.y1) * scale
            y_bot = (by1 - sp.y0) * scale
            cell_w = (sp.x1 - sp.x0) * scale / len(text)
            cell_h = y_bot - y_top
            gh = max(1, int(cell_h))
            for i, ch in enumerate(text):
                g = _glyph(ord(ch) if ord(ch) < 0x110000 else 0x20)
                if not g.any():
                    continue
                gx = int(x0 + i * cell_w)
                gw = max(1, int(cell_w * 0.8))
                # nearest-neighbor stretch of the 5x7 bitmap to the cell
                ys = (np.arange(gh) * 7) // gh
                xs = (np.arange(gw) * 5) // gw
                patch = g[ys[:, None], xs[None, :]]
                yy0, xx0 = int(y_top), gx
                yy1, xx1 = min(h, yy0 + gh), min(w, xx0 + gw)
                if yy1 <= yy0 or xx1 <= xx0 or yy0 < 0 or xx0 < 0:
                    continue
                region = canvas[yy0:yy1, xx0:xx1]
                region[patch[:yy1 - yy0, :xx1 - xx0] == 1] = 0
        out.append(canvas)
    return out


def pdf_to_page_jpegs(pdf_bytes: bytes, dpi: int = 150,
                      scale: int = 2,
                      progressive: bool = True) -> list[dict]:
    """The reference's page-image pipeline shape: PDF -> per-page raster
    -> JPEG bytes + metadata. `scale` is the JPEG quant knob (1 = finest
    ~= the reference's quality=100); `progressive` defaults True to
    match the reference's exact encoder config (data.py:25-27:
    quality=100, progressive)."""
    from no_ocr_spark.extract.jpeg import jpeg_encode

    out = []
    for page_no, canvas in enumerate(rasterize_pages(pdf_bytes, dpi=dpi), 1):
        ink = int((canvas == 0).sum())
        out.append({
            "page": page_no,
            "width": canvas.shape[1],
            "height": canvas.shape[0],
            "ink_pixels": ink,
            "jpeg": jpeg_encode(canvas, scale=scale,
                                progressive=progressive),
        })
    return out
