"""Baseline JPEG codec tests (`extract/jpeg.py`): closed-form flat-block
reconstruction, bounded-error round trips (gray / RGB 4:4:4 / 4:2:0),
restart markers, DC prediction across blocks, and non-baseline
quarantines. Error bounds are generous vs observed (observed max err 1-8
at scale=1) — they catch structural breakage, not quantization drift."""

from __future__ import annotations

import math

import numpy as np
import pytest

from no_ocr_spark.extract.image import ImageFormatError
from no_ocr_spark.extract.jpeg import (
    _ZIGZAG,
    jpeg_decode,
    jpeg_encode,
    quant_table,
)


def test_zigzag_is_permutation_with_known_anchors():
    z = list(_ZIGZAG)
    assert sorted(z) == list(range(64))
    # first diagonal steps of the T.81 scan: (0,0) (0,1) (1,0) (2,0) (1,1)
    assert z[:6] == [0, 1, 8, 16, 9, 2]
    assert z[-1] == 63


def flat_recon(v: int, scale: int) -> int:
    """Closed-form decode of a flat 8x8 gray block: DC-only path with the
    codec's pinned floor(x+0.5) rounding — the same arithmetic the SQL
    oracle of the jpeg_roundtrip query uses."""
    q00 = int(quant_table(scale)[0, 0])
    dc = math.floor(8 * (v - 128) / q00 + 0.5)
    return min(255, max(0, math.floor(dc * q00 / 8 + 0.5) + 128))


def test_flat_blocks_reconstruct_in_closed_form():
    for scale in (1, 2, 5):
        for v in (0, 1, 7, 127, 128, 129, 200, 254, 255):
            img = np.full((8, 8), v, np.uint8)
            out = jpeg_decode(jpeg_encode(img, scale=scale))
            assert out.shape == (8, 8, 1)
            assert (out == flat_recon(v, scale)).all(), (v, scale)


def test_gray_gradient_bounded_error():
    y, x = np.mgrid[0:32, 0:24]
    img = ((y * 3 + x * 2) % 200 + 20).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, scale=1))[:, :, 0]
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 12


def test_rgb_444_roundtrip_and_odd_dims():
    sm = np.zeros((17, 19, 3), np.uint8)
    sm[:, :, 0] = np.linspace(30, 200, 19, dtype=int)[None, :]
    sm[:, :, 1] = np.linspace(60, 120, 17, dtype=int)[:, None]
    sm[:, :, 2] = 90
    out = jpeg_decode(jpeg_encode(sm, scale=1))
    assert out.shape == sm.shape
    assert int(np.abs(out.astype(int) - sm.astype(int)).max()) <= 15


def test_rgb_420_subsampled_roundtrip():
    sm = np.zeros((17, 19, 3), np.uint8)
    sm[:, :, 0] = np.linspace(30, 200, 19, dtype=int)[None, :]
    sm[:, :, 1] = np.linspace(60, 120, 17, dtype=int)[:, None]
    sm[:, :, 2] = 90
    out = jpeg_decode(jpeg_encode(sm, scale=1, subsample=True))
    assert out.shape == sm.shape
    assert int(np.abs(out.astype(int) - sm.astype(int)).max()) <= 25


def test_dc_prediction_chains_across_blocks():
    """Blocks with very different means force large DC diffs in both
    directions; a broken predictor shifts whole blocks."""
    img = np.zeros((8, 32), np.uint8)
    for i, v in enumerate((10, 240, 60, 180)):
        img[:, 8 * i:8 * (i + 1)] = v
    out = jpeg_decode(jpeg_encode(img, scale=2))[:, :, 0]
    for i, v in enumerate((10, 240, 60, 180)):
        assert (out[:, 8 * i:8 * (i + 1)] == flat_recon(v, 2)).all(), i


def test_restart_markers_roundtrip():
    img = np.zeros((8, 48), np.uint8)
    vals = (10, 240, 60, 180, 30, 220)
    for i, v in enumerate(vals):
        img[:, 8 * i:8 * (i + 1)] = v
    enc = jpeg_encode(img, scale=2, restart_interval=2)
    assert b"\xff\xdd" in enc            # DRI segment present
    assert b"\xff\xd0" in enc            # at least RST0 in the stream
    out = jpeg_decode(enc)[:, :, 0]
    for i, v in enumerate(vals):
        assert (out[:, 8 * i:8 * (i + 1)] == flat_recon(v, 2)).all(), i


def test_doctored_sof_and_12bit_quarantine():
    """A baseline file whose SOF is flipped to SOF2 is CORRUPT (its scan
    header claims the full band in what progressive treats as a DC
    scan) — must quarantine, not mis-decode; 12-bit precision likewise."""
    enc = bytearray(jpeg_encode(np.full((8, 8), 50, np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # claim progressive over a baseline scan layout
    with pytest.raises(ImageFormatError):
        jpeg_decode(bytes(enc))
    enc[sof + 1] = 0xC0
    enc[sof + 4] = 12    # claim 12-bit precision
    with pytest.raises(ImageFormatError, match="precision"):
        jpeg_decode(bytes(enc))


def test_truncated_stream_quarantines():
    """Every truncation point maps to ImageFormatError — the
    total-function quarantine contract (never a bare IndexError)."""
    enc = jpeg_encode(np.full((16, 16), 50, np.uint8))
    for cut in (3, 10, 40, len(enc) // 2, len(enc) - 3):
        with pytest.raises(ImageFormatError):
            jpeg_decode(enc[:cut])


def test_high_detail_image_survives_entropy_coding():
    """Checkerboard maximizes AC energy (every zigzag position in play):
    exercises ZRL, long runs, and multi-bit amplitudes. Lossy, so only
    structural assertions: shape, and block means within quant error."""
    y, x = np.mgrid[0:16, 0:16]
    img = (((y + x) % 2) * 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, scale=1))[:, :, 0]
    assert out.shape == (16, 16)
    assert abs(float(out.mean()) - float(img.mean())) < 16.0


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes — a compliant stream with padding must decode
    identically (review finding: the marker loop misparsed it)."""
    img = np.full((8, 8), 77, np.uint8)
    enc = jpeg_encode(img, scale=2)
    # insert fill bytes before the DQT and SOF markers
    padded = enc.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1) \
                .replace(b"\xff\xc0", b"\xff\xff\xc0", 1)
    assert padded != enc
    assert (jpeg_decode(padded) == jpeg_decode(enc)).all()


def test_missing_huffman_table_quarantines():
    """SOS referencing a Huffman table no DHT defined must raise
    ImageFormatError, not KeyError (review finding)."""
    enc = jpeg_encode(np.full((8, 8), 50, np.uint8))
    # strip every DHT segment (marker FF C4, big-endian length follows)
    out = bytearray()
    pos = 0
    while pos < len(enc):
        if enc[pos] == 0xFF and enc[pos + 1] == 0xC4:
            seglen = int.from_bytes(enc[pos + 2:pos + 4], "big")
            pos += 2 + seglen
            continue
        out.append(enc[pos])
        pos += 1
    with pytest.raises(ImageFormatError):
        jpeg_decode(bytes(out))


def test_progressive_roundtrip_identical_to_baseline():
    """SOF2 spectral-selection files (the reference's own page-image
    format) must decode to EXACTLY the pixels the baseline layout of the
    same coefficients yields — progressive is a reordering, not a
    different image."""
    y, x = np.mgrid[0:33, 0:25]
    gray = ((y * 3 + x * 2) % 200 + 20).astype(np.uint8)
    assert (jpeg_decode(jpeg_encode(gray, scale=1, progressive=True))
            == jpeg_decode(jpeg_encode(gray, scale=1))).all()
    rgb = np.stack([(y * 5 + x) % 256, (x * 7) % 256,
                    (y * 2 + x * 3) % 256], axis=2).astype(np.uint8)
    assert (jpeg_decode(jpeg_encode(rgb, scale=1, progressive=True))
            == jpeg_decode(jpeg_encode(rgb, scale=1))).all()
    # many all-zero AC bands in a row -> EOBn runs > 1 exercised
    flat = np.full((32, 32), 130, np.uint8)
    assert (jpeg_decode(jpeg_encode(flat, scale=2, progressive=True))
            == jpeg_decode(jpeg_encode(flat, scale=2))).all()


def test_progressive_single_component_scan_with_sampling_factors():
    """T.81 A.2.2: a one-component scan is ALWAYS non-interleaved over the
    component's real block grid, even when the frame declares sampling
    factors > 1. A grayscale SOF2 frame patched to h=v=2 keeps the same
    real grid (the sole component is full-resolution), so every scan
    must decode identically — routing it through the interleaved MCU
    grid would read 4 blocks where 1 was coded."""
    img = ((np.mgrid[0:8, 0:8][0] * 9 + 30) % 180).astype(np.uint8)
    enc = bytearray(jpeg_encode(img, scale=1, progressive=True))
    ref = jpeg_decode(bytes(enc))
    sof = bytes(enc).find(b"\xff\xc2")
    # SOF2 layout: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) cid(1) hv(1)
    assert enc[sof + 10] == 1 and enc[sof + 11] == 0x11
    enc[sof + 11] = 0x22
    assert (jpeg_decode(bytes(enc)) == ref).all()


def _prog_sos(comp_specs, ss, se, ah, al):
    import struct as _s

    ns = len(comp_specs)
    out = b"\xff\xda" + _s.pack(">HB", 6 + 2 * ns, ns)
    for cid, tq in comp_specs:
        out += bytes([cid, (tq << 4) | tq])
    return out + bytes([ss, se, (ah << 4) | al])


def test_progressive_successive_approximation_hand_built():
    """Full successive-approximation decode against a hand-built stream
    (our encoder emits spectral selection only, so the refinement paths
    are pinned here): DC first at Al=1 + DC refine, AC first at Al=1 +
    AC refine with a newly-significant coefficient after zero-history
    runs (incl. ZRL) and correction bits for prior nonzeros. The
    expected image is the direct IDCT of the full coefficient block."""
    import struct as _s

    from no_ocr_spark.extract.jpeg import (
        _AC_CODES,
        _BitWriter,
        _DC_CODES,
        _DC_LEN,
        _DC_SYMBOLS,
        _AC_LEN,
        _AC_SYMBOLS,
        _amplitude_bits,
        _dht_payload,
        _idct_blocks,
        _size_category,
    )

    # coefficients (zigzag): DC=5, k1=5, k3=-3, k10=+1, k63=-1; q = all 1
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _s.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    out += b"\xff\xc2" + _s.pack(">HBHHB", 11, 8, 8, 8, 1) \
        + bytes([1, 0x11, 0])
    for cls in (0, 1):
        syms = _DC_SYMBOLS if cls == 0 else _AC_SYMBOLS
        ln = _DC_LEN if cls == 0 else _AC_LEN
        p = _dht_payload(cls, 0, syms, ln)
        out += b"\xff\xc4" + _s.pack(">H", 2 + len(p)) + p
    # scan 1: DC first Al=1 (5 >> 1 = 2)
    out += _prog_sos([(1, 0)], 0, 0, 0, 1)
    bw = _BitWriter()
    s = _size_category(2)
    c, n = _DC_CODES[s]
    bw.write(c, n)
    bw.write(_amplitude_bits(2, s), s)
    out += bw.flush()
    # scan 2: DC refine (bit 5 & 1 = 1)
    out += _prog_sos([(1, 0)], 0, 0, 1, 0)
    bw = _BitWriter()
    bw.write(1, 1)
    out += bw.flush()
    # scan 3: AC first Al=1: k1 -> 2, k3 -> -1 (magnitudes >> 1), EOB
    out += _prog_sos([(1, 0)], 1, 63, 0, 1)
    bw = _BitWriter()
    s = _size_category(2)
    c, n = _AC_CODES[(0 << 4) | s]
    bw.write(c, n)
    bw.write(_amplitude_bits(2, s), s)
    s = _size_category(-1)
    c, n = _AC_CODES[(1 << 4) | s]
    bw.write(c, n)
    bw.write(_amplitude_bits(-1, s), s)
    c, n = _AC_CODES[0x00]
    bw.write(c, n)
    out += bw.flush()
    # scan 4: AC refine Ah=1: +1 newly significant at k10 (7 zero-history
    # run, then correction bits for k1 and k3), -1 at k63 (3x ZRL + run 4)
    out += _prog_sos([(1, 0)], 1, 63, 1, 0)
    bw = _BitWriter()
    c, n = _AC_CODES[(7 << 4) | 1]
    bw.write(c, n)
    bw.write(1, 1)   # sign of the new +1
    bw.write(1, 1)   # correction bit for k1 (5 & 1)
    bw.write(1, 1)   # correction bit for k3 (3 & 1)
    for _ in range(3):
        c, n = _AC_CODES[0xF0]
        bw.write(c, n)
    c, n = _AC_CODES[(4 << 4) | 1]
    bw.write(c, n)
    bw.write(0, 1)   # sign of the new -1
    out += bw.flush()
    out += b"\xff\xd9"

    img = jpeg_decode(bytes(out))
    zz = np.zeros(64, np.int64)
    zz[0], zz[1], zz[3], zz[10], zz[63] = 5, 5, -3, 1, -1
    raster = np.zeros(64, np.int32)
    raster[_ZIGZAG] = zz
    expect = _idct_blocks(raster[None, :])[0]
    assert (img[:, :, 0] == expect).all()


def test_arithmetic_coding_quarantines():
    enc = bytearray(jpeg_encode(np.full((8, 8), 50, np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(ImageFormatError, match="unsupported JPEG mode"):
        jpeg_decode(bytes(enc))


def test_app0_com_and_interscan_dht_segments():
    """Real files carry JFIF APP0/COM segments and often re-emit DHT
    between progressive scans; the marker loop must skip/absorb them
    without disturbing decode."""
    import struct as _s

    img = np.full((16, 8), 99, np.uint8)
    enc = jpeg_encode(img, scale=2, progressive=True)
    want = jpeg_decode(enc)
    # JFIF APP0 + COM right after SOI
    app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + _s.pack(">H", 9) + b"comment"
    with_app = enc[:2] + app0 + com + enc[2:]
    assert (jpeg_decode(with_app) == want).all()
    # duplicate the existing DHT block right before the SECOND SOS
    dht_start = enc.find(b"\xff\xc4")
    dht_end = enc.find(b"\xff", dht_start + 2)
    while enc[dht_end:dht_end + 2] == b"\xff\xc4" or \
            (enc[dht_end] == 0xFF and enc[dht_end + 1] == 0xC4):
        seglen = int.from_bytes(enc[dht_end + 2:dht_end + 4], "big")
        dht_end += 2 + seglen
    dht_blob = enc[dht_start:dht_start + 2
                   + int.from_bytes(enc[dht_start + 2:dht_start + 4],
                                    "big")]
    first_sos = enc.find(b"\xff\xda")
    second_sos = enc.find(b"\xff\xda", first_sos + 2)
    assert second_sos > 0
    with_dht = enc[:second_sos] + dht_blob + enc[second_sos:]
    assert (jpeg_decode(with_dht) == want).all()
