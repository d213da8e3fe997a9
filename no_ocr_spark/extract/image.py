"""From-scratch raster image codecs: PNG (ISO 15948 / RFC 2083) and
NetPBM P5/P6, plus deterministic resize — the real decode step behind the
multimodal thumbnail operator (`operators/multimodal.py`).

Reference analogue: the page-image JPEG column and its thumbnail
post-processing (`no-ocr-api/np_ocr/data.py:25-27,51-53`,
`search.py:164-168`). PIL/poppler are absent from this container; PNG
and PPM are implemented here from the public specs with stdlib zlib —
chunk framing, CRC-32, scanline filters 0-4 (Paeth per the spec's
predictor), Adam7 interlace, 8-bit gray/RGB/RGBA and palette images —
and JPEG (baseline + progressive) lives in the sibling
`extract/jpeg.py`. Everything is deterministic, so decoded-pixel
checksums are oracle-checkable in plain SQL when the pixels are
arithmetically defined (see `q_image_thumbnails`).

Decode hot path is numpy-vectorized per scanline: filter 0 (None) and 2
(Up) are pure vector ops; 1 (Sub) is a strided cumulative sum (uint8
wraparound IS mod-256 arithmetic); 3/4 (Average/Paeth) fall back to a
per-pixel loop — rare in practice for small thumbnails and always correct.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class ImageFormatError(ValueError):
    """Unsupported or malformed image payload (total-function callers
    turn this into a quarantine record, mirroring the PDF parser)."""


def _quarantine_wrap(fn):
    """Decoders promise: EVERY malformed payload raises ImageFormatError,
    never a bare struct.error / IndexError (e.g. palette index past
    PLTE) / numpy ValueError from a short buffer. ImageFormatError is a
    ValueError subclass, so re-raise it first."""
    import functools

    @functools.wraps(fn)
    def inner(data, *a, **kw):
        try:
            return fn(data, *a, **kw)
        except ImageFormatError:
            raise
        except (IndexError, KeyError, ValueError, struct.error) as e:
            raise ImageFormatError(f"malformed image payload: {e}") from e

    return inner


def sniff_format(data: bytes) -> str | None:
    """Magic-byte sniff. gif/webp are recognized (so the extraction API
    can type-skip them) but have no decoder here — decode_image
    quarantines them as declared-unsupported."""
    if data[:8] == _PNG_SIG:
        return "png"
    # real PNM magic is P5/P6 followed by whitespace — without that
    # check any TEXT document starting with the characters 'P5'/'P6'
    # (review finding: 'P5 ratings for...') would be sniffed as an image
    # and silently emptied by the extraction API's type-skip
    if data[:2] in (b"P5", b"P6") and data[2:3] in b" \t\n\r\x0b\x0c" \
            and len(data) > 3:
        return "ppm"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


# ----------------------------------------------------------------- PNG


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IEND":
            return


@_quarantine_wrap
def png_decode(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8 array. Supports bit depth 8, color types
    0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA); both progressive
    layouts — sequential and Adam7 interlaced (seven independently
    filtered sub-images re-placed on the sample grid)."""
    if data[:8] != _PNG_SIG:
        raise ImageFormatError("not a PNG signature")
    width = height = None
    ctype_img = depth = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, ctype_img, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise ImageFormatError("missing IHDR")
    if depth != 8:
        raise ImageFormatError(f"unsupported bit depth {depth}")
    if ctype_img not in _CHANNELS:
        raise ImageFormatError(f"unsupported color type {ctype_img}")
    if interlace not in (0, 1):
        raise ImageFormatError(f"unknown interlace method {interlace}")
    ch = _CHANNELS[ctype_img]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ImageFormatError(f"IDAT inflate failed: {e}") from e
    if interlace:
        # Adam7: seven sub-images, each filtered independently, placed
        # back on the (8x8-periodic) sample grid
        img = np.zeros((height, width, ch), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            n = ph * (pw * ch + 1)
            sub = _unfilter(raw[pos:pos + n], ph, pw, ch)
            pos += n
            img[y0::dy, x0::dx] = sub
        if pos != len(raw):
            raise ImageFormatError("interlaced scanline length mismatch")
    else:
        img = _unfilter(raw, height, width, ch)
    if ctype_img == 3:
        if palette is None:
            raise ImageFormatError("palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


# Adam7 pass origins/strides (PNG spec §8.2): (x0, y0, dx, dy)
_ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(raw: bytes, height: int, width: int, ch: int) -> np.ndarray:
    """Filtered scanline bytes -> (H, W, C) samples (PNG filters 0-4)."""
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ImageFormatError("scanline data length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    for y in range(height):
        f, line = int(filters[y]), lines[y]
        if f == 0:                       # None
            rec = line.copy()
        elif f == 1:                     # Sub: strided cumsum mod 256
            rec = line.copy()
            for c in range(ch):
                np.cumsum(rec[c::ch], dtype=np.uint8, out=rec[c::ch])
        elif f == 2:                     # Up
            rec = line + prior
        elif f == 3:                     # Average (sequential in x)
            rec = np.zeros(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + (left + int(prior[x])) // 2) % 256
        elif f == 4:                     # Paeth (sequential in x)
            rec = np.zeros(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prior[x])
                c = int(prior[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) % 256
        else:
            raise ImageFormatError(f"unknown scanline filter {f}")
        out[y] = rec
        prior = rec
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (filter 0 scanlines)."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype_img = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype_img is None:
        raise ImageFormatError(f"cannot encode {ch}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_img, 0, 0, 0)
    flat = img.reshape(h, w * ch)
    scan = np.zeros((h, w * ch + 1), np.uint8)
    scan[:, 1:] = flat
    idat = zlib.compress(scan.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) \
        + _chunk(b"IEND", b"")


# --------------------------------------------------------------- NetPBM


@_quarantine_wrap
def ppm_decode(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary NetPBM, maxval <= 255."""
    fields: list[bytes] = []
    pos = 2
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ImageFormatError("not a binary NetPBM payload")
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":           # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise ImageFormatError("16-bit NetPBM not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    body = np.frombuffer(data, np.uint8, count=need, offset=pos)
    return body.reshape(h, w, ch).copy()


def ppm_encode(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch == 3:
        return b"P6 %d %d 255\n" % (w, h) + img.tobytes()
    if ch == 1:
        return b"P5 %d %d 255\n" % (w, h) + img.tobytes()
    raise ImageFormatError(f"cannot encode {ch}-channel NetPBM")


# --------------------------------------------------------------- resize


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample with floor index mapping:
    out(y, x) = in(floor(y * H / out_h), floor(x * W / out_w)). Exactly
    reproducible in SQL (integer arithmetic only), which is what makes
    the thumbnail operator oracle-checkable end to end."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys[:, None], xs[None, :]]


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes. All three formats decode through
    from-scratch codecs: PNG/PPM here, JPEG (baseline AND progressive,
    incl. successive approximation) in `extract/jpeg.py`."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return png_decode(payload)
    if fmt == "ppm":
        return ppm_decode(payload)
    if fmt == "jpeg":
        from no_ocr_spark.extract.jpeg import jpeg_decode

        return jpeg_decode(payload)
    if fmt is not None:
        raise ImageFormatError(f"no decoder for {fmt} (declared)")
    raise ImageFormatError("unrecognized image payload")
