"""Vectorized entropy encoder (VERDICT r4 #3) vs the scalar reference:
byte-identity of the numpy event-array/bit-packing path against the
per-coefficient _BitWriter path it replaced (which survives on the
restart-marker and 4:2:0 branches and serves as the oracle here)."""

from __future__ import annotations

import numpy as np

from no_ocr_spark.extract.jpeg import (
    _AC_CODES,
    _amplitude_bits,
    _BitWriter,
    _encode_ac_band_v,
    _size_category,
    jpeg_decode,
    jpeg_encode,
)


def _scalar_band(band: np.ndarray) -> bytes:
    """The pre-vectorization progressive AC band loop, verbatim."""
    bw = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun:
            run = min(eobrun, 32767)
            r = run.bit_length() - 1
            code, nb = _AC_CODES[r << 4]
            bw.write(code, nb)
            if r:
                bw.write(run - (1 << r), r)
            eobrun -= run

    L = band.shape[1]
    for m in range(band.shape[0]):
        bd = band[m]
        nz = np.nonzero(bd)[0]
        if len(nz) == 0:
            eobrun += 1
            continue
        flush_eob()
        last = int(nz[-1])
        run = 0
        for k in range(last + 1):
            v = int(bd[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, nb = _AC_CODES[0xF0]
                bw.write(code, nb)
                run -= 16
            s = _size_category(v)
            code, nb = _AC_CODES[(run << 4) | s]
            bw.write(code, nb)
            bw.write(_amplitude_bits(v, s), s)
            run = 0
        if last < L - 1:
            eobrun += 1
    flush_eob()
    return bw.flush()


def test_ac_band_vectorized_matches_scalar_randomized():
    rng = np.random.default_rng(20250817)
    for _ in range(120):
        n = int(rng.integers(1, 40))
        length = int(rng.integers(1, 64))
        dens = rng.random() * 0.4
        band = (rng.integers(-600, 600, size=(n, length))
                * (rng.random((n, length)) < dens)).astype(np.int64)
        assert _scalar_band(band) == _encode_ac_band_v(band)


def test_ac_band_eobrun_over_32767():
    band = np.zeros((40000, 3), np.int64)
    band[-1, 0] = 5
    assert _scalar_band(band) == _encode_ac_band_v(band)
    empty = np.zeros((70000, 2), np.int64)  # tail flush needs 3 EOBn syms
    assert _scalar_band(empty) == _encode_ac_band_v(empty)


def _strip_dri(data: bytes) -> bytes:
    i = data.find(b"\xff\xdd")
    assert i >= 0
    return data[:i] + data[i + 6:]


def test_sequential_vectorized_matches_scalar_via_restart_stub():
    """restart_interval > n_mcu routes through the scalar per-block loop
    but emits zero actual restart markers, so apart from the 6-byte DRI
    segment the stream must be byte-identical to the vectorized path."""
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (24, 16), (33, 25), (64, 48)]:
        gray = rng.integers(0, 256, size=shape).astype(np.uint8)
        vec = jpeg_encode(gray, scale=1)
        scal = jpeg_encode(gray, scale=1, restart_interval=65535)
        assert vec == _strip_dri(scal)
    rgb = rng.integers(0, 256, size=(24, 16, 3)).astype(np.uint8)
    vec = jpeg_encode(rgb, scale=1, subsample=False)
    scal = jpeg_encode(rgb, scale=1, subsample=False,
                       restart_interval=65535)
    assert vec == _strip_dri(scal)


def test_vectorized_streams_still_decode():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 56)).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(img, scale=1))
    prog = jpeg_decode(jpeg_encode(img, scale=1, progressive=True))
    assert (base == prog).all()
