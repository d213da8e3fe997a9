"""Fuzz the total-function contracts: the per-document entry points the
Spark UDFs vectorize over must NEVER raise on arbitrary bytes — errors
become quarantine records (extract_document) or ImageFormatError
(decode_image). A single uncaught exception in these functions kills a
whole Spark task at 10^12-document scale, so totality is load-bearing,
not cosmetic."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from no_ocr_spark.extract.api import extract_document
from no_ocr_spark.extract.image import ImageFormatError, decode_image
from no_ocr_spark.extract.jpeg import jpeg_decode, jpeg_encode
from no_ocr_spark.extract.raster import rasterize_pages


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_extract_document_is_total(payload):
    rec = extract_document(payload)
    assert isinstance(rec["text"], str)
    assert rec["method"] is not None


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_extract_document_total_with_format_magics(payload):
    """Random tails behind every sniffable magic — the dispatch branches
    themselves must stay total."""
    for magic in (b"%PDF-1.4\n", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
                  b"P6 ", b"GIF89a", b"RIFF1234WEBP", b"<html>"):
        rec = extract_document(magic + payload)
        assert isinstance(rec["text"], str)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_decode_image_raises_only_imageformaterror(payload):
    for magic in (b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0",
                  b"P6 2 2 255\n"):
        try:
            img = decode_image(magic + payload)
            assert img.dtype == np.uint8 and img.ndim == 3
        except ImageFormatError:
            pass  # the one permitted failure mode


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.integers(0, 3))
def test_jpeg_decode_mutation_fuzz(tail, flip_at):
    """Bit-flip + truncate a VALID jpeg, then append junk: decode either
    succeeds (flip landed somewhere recoverable) or quarantines."""
    base = bytearray(jpeg_encode(np.full((8, 16), 90, np.uint8)))
    if flip_at and len(base) > 20:
        base[7 + flip_at * 11 % (len(base) - 8)] ^= 0xFF
    data = bytes(base[:len(base) - flip_at]) + tail
    try:
        jpeg_decode(data)
    except ImageFormatError:
        pass


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_rasterizer_is_total_over_pdf_shaped_garbage(payload):
    """Garbage behind a PDF header: the rasterizer inherits the
    parser's tolerance — pages (possibly none) out, never a raise."""
    pages = rasterize_pages(b"%PDF-1.4\n" + payload, dpi=72)
    for p in pages:
        assert p.dtype == np.uint8


def test_zlib_bomb_shaped_idat_is_bounded():
    """A PNG whose IDAT inflates far larger than the declared dims must
    quarantine on the length mismatch, not produce a wrong image."""
    from no_ocr_spark.extract.image import _PNG_SIG, _chunk, png_decode

    import struct as _s

    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    big = zlib.compress(b"\x00" * 100_000)
    png = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", big)
           + _chunk(b"IEND", b""))
    with pytest.raises(ImageFormatError, match="length mismatch"):
        png_decode(png)
