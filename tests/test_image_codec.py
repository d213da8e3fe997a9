"""From-scratch PNG/NetPBM codec tests (`extract/image.py`): encode/decode
round trips, all five PNG scanline filters (hand-built streams so the
decoder — not our own filter-0 encoder — is what's exercised), palette
images, deterministic resize, and format sniffing."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from no_ocr_spark.extract.image import (
    ImageFormatError,
    _PNG_SIG,
    _chunk,
    decode_image,
    png_decode,
    png_encode,
    ppm_decode,
    ppm_encode,
    resize_nearest,
    sniff_format,
)


def test_png_roundtrip_all_channel_counts():
    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, (13, 9, ch)).astype(np.uint8)
        out = png_decode(png_encode(img))
        assert out.shape == img.shape
        assert (out == img).all()


def test_png_encode_2d_gray():
    img = np.arange(30, dtype=np.uint8).reshape(5, 6)
    out = png_decode(png_encode(img))
    assert out.shape == (5, 6, 1)
    assert (out[:, :, 0] == img).all()


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanline y uses filters[y] — independent
    re-derivation of the spec's forward filters, so decode is checked
    against a second implementation, not our own encoder."""
    h, w, ch = img.shape
    raw = bytearray()
    prior = np.zeros(w * ch, np.int32)
    for y, f in enumerate(filters):
        line = img[y].reshape(-1).astype(np.int32)
        if f == 0:
            enc = line
        elif f == 1:
            enc = line.copy()
            enc[ch:] = (line[ch:] - line[:-ch]) % 256
        elif f == 2:
            enc = (line - prior) % 256
        elif f == 3:
            enc = np.zeros(w * ch, np.int32)
            for x in range(w * ch):
                left = line[x - ch] if x >= ch else 0
                enc[x] = (line[x] - (left + prior[x]) // 2) % 256
        else:
            enc = np.zeros(w * ch, np.int32)
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        raw.append(f)
        raw += bytes(enc.astype(np.uint8))
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def test_png_all_five_scanline_filters():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (5, 6, 3)).astype(np.uint8)
    assert (png_decode(_png_with_filters(img, [0, 1, 2, 3, 4])) == img).all()


def test_png_paeth_heavy():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (7, 4, 3)).astype(np.uint8)
    assert (png_decode(_png_with_filters(img, [4] * 7)) == img).all()


def test_png_palette():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, (3, 5)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    ihdr = struct.pack(">IIBBBBB", 5, 3, 8, 3, 0, 0, 0)
    png = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert (png_decode(png) == pal[idx]).all()


def _adam7_png(img: np.ndarray) -> bytes:
    """Hand-build an Adam7 interlaced PNG (filter-0 scanlines per pass)
    directly from the spec's pass grid — an independent re-derivation,
    so the decoder's interlace path is checked against a second
    implementation rather than our own encoder."""
    from no_ocr_spark.extract.image import _ADAM7_PASSES

    h, w, ch = img.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_PASSES:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            raw.append(0)
            raw += row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def test_png_adam7_interlaced_decodes():
    rng = np.random.RandomState(17)
    # odd dims exercise the empty/partial pass edge cases
    for shape in ((9, 11, 3), (1, 1, 3), (3, 2, 3), (16, 8, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert (png_decode(_adam7_png(img)) == img).all(), shape


def test_png_rejects_16bit_and_bad_interlace():
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png = (_PNG_SIG + _chunk(b"IHDR", ihdr16)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
           + _chunk(b"IEND", b""))
    with pytest.raises(ImageFormatError, match="bit depth"):
        png_decode(png)
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7)
    png = (_PNG_SIG + _chunk(b"IHDR", ihdr_bad)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
           + _chunk(b"IEND", b""))
    with pytest.raises(ImageFormatError, match="interlace"):
        png_decode(png)


def test_png_truncated_idat_quarantines():
    img = np.zeros((4, 4, 3), np.uint8)
    png = png_encode(img)
    with pytest.raises(ImageFormatError):
        png_decode(png[:40])


def test_ppm_roundtrip_and_comments():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    assert (ppm_decode(ppm_encode(img)) == img).all()
    gray = rng.randint(0, 256, (4, 6, 1)).astype(np.uint8)
    assert (ppm_decode(ppm_encode(gray)) == gray).all()
    # header comments (NetPBM allows them between fields)
    with_comment = b"P6\n# a comment\n7 5\n255\n" + img.tobytes()
    assert (ppm_decode(with_comment) == img).all()


def test_resize_nearest_floor_mapping():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)[:, :, None]
    t = resize_nearest(img, 4, 4)
    # out(y, x) = in((y*8)//4, (x*8)//4) = in(2y, 2x)
    assert t.shape == (4, 4, 1)
    for y in range(4):
        for x in range(4):
            assert t[y, x, 0] == img[2 * y, 2 * x, 0]
    up = resize_nearest(img, 16, 16)
    assert up.shape == (16, 16, 1) and up[1, 1, 0] == img[0, 0, 0]


def test_sniff_and_dispatch():
    png = png_encode(np.zeros((2, 2, 3), np.uint8))
    ppm = ppm_encode(np.zeros((2, 2, 3), np.uint8))
    assert sniff_format(png) == "png" and sniff_format(ppm) == "ppm"
    assert sniff_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert sniff_format(b"GIF89a") == "gif"      # recognized, no decoder
    assert sniff_format(b"BM\x00\x00") is None   # unknown magic
    assert decode_image(png).shape == (2, 2, 3)
    with pytest.raises(ImageFormatError):  # truncated garbage after SOI
        decode_image(b"\xff\xd8\xff\xe0 not really")
    with pytest.raises(ImageFormatError):
        decode_image(b"nonsense payload")
    # real JPEG dispatches through the baseline codec
    from no_ocr_spark.extract.jpeg import jpeg_encode

    jp = jpeg_encode(np.full((8, 8), 100, np.uint8))
    assert sniff_format(jp) == "jpeg"
    assert decode_image(jp).shape == (8, 8, 1)


def test_malformed_payloads_always_quarantine():
    """Review finding: every malformed-payload failure must surface as
    ImageFormatError, never bare struct.error/IndexError/ValueError."""
    # IHDR body shorter than 13 bytes -> struct.error without the wrap
    from no_ocr_spark.extract.image import _chunk as chunk

    short_ihdr = _PNG_SIG + chunk(b"IHDR", b"\x00" * 5)
    with pytest.raises(ImageFormatError):
        png_decode(short_ihdr)
    # palette index past PLTE -> IndexError without the wrap
    import struct as _struct

    idx = np.full((2, 2), 3, np.uint8)  # palette has only 2 entries
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = _struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (_PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", bytes(6))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ImageFormatError):
        png_decode(png)
    # PPM body shorter than w*h*ch -> numpy ValueError without the wrap
    with pytest.raises(ImageFormatError):
        ppm_decode(b"P6 4 4 255\n\x00\x00\x00")
    # PPM header truncated mid-fields
    with pytest.raises(ImageFormatError):
        ppm_decode(b"P6 4")


def test_extract_document_type_skips_image_payloads():
    """Crawls serve image bytes on document URLs: the extraction API
    must type-skip them (typed method, empty text, NO quarantine),
    never tokenize them as HTML or fail the row."""
    from no_ocr_spark.extract.api import extract_document
    from no_ocr_spark.extract.jpeg import jpeg_encode

    payloads = {
        "png": png_encode(np.zeros((2, 2, 3), np.uint8)),
        "jpeg": jpeg_encode(np.full((8, 8), 9, np.uint8)),
        "gif": b"GIF89a" + bytes(20),
        "webp": b"RIFF\x00\x00\x00\x00WEBP" + bytes(8),
    }
    for fmt, payload in payloads.items():
        rec = extract_document(payload)
        assert rec["method"] == f"binary_{fmt}_v1", fmt
        assert rec["error"] is None and rec["text"] == ""
        assert rec["spans"] == [] and rec["n_blocks"] == 0


def test_ppm_sniff_requires_whitespace_after_magic():
    """Review finding: a TEXT document starting with 'P5'/'P6' must NOT
    sniff as an image (the extraction API would silently empty it);
    real NetPBM magic is P5/P6 followed by whitespace."""
    from no_ocr_spark.extract.api import extract_document

    # 'P5' followed by a non-space char is NOT NetPBM
    assert sniff_format(b"P5ratings are great") is None
    assert sniff_format(b"P6-colored widgets") is None
    rec = extract_document(
        b"<html><body><main><article><p>P6-colored widgets are "
        b"great. More text follows here to classify.</p>"
        b"</article></main></body></html>")
    assert rec["method"] == "html_densitometric_v1"
    # real PPM (magic + whitespace) still sniffs
    assert sniff_format(b"P6 2 2 255\n" + bytes(12)) == "ppm"
