"""Property tests for the round-4 from-scratch components: codec round
trips under hypothesis-generated inputs, the AES core's inverse property
at every key size, JPEG's closed-form flat-block identity over the full
value range, and packing invariants on arbitrary size lists."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from no_ocr_spark.extract.image import png_decode, png_encode, ppm_decode, ppm_encode
from no_ocr_spark.extract.jpeg import (
    jpeg_decode,
    jpeg_encode,
    quant_table,
)
from no_ocr_spark.extract.pdf import (
    _aes_cbc_decrypt,
    _aes_cbc_encrypt,
    _hash_2b,
)
from no_ocr_spark.operators.packing import BUDGET, _pack_group

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24),
                  st.sampled_from([1, 2, 3, 4]))


@settings(max_examples=25, deadline=None)
@given(_dims, st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(dims, seed):
    h, w, ch = dims
    img = np.random.RandomState(seed).randint(
        0, 256, (h, w, ch)).astype(np.uint8)
    out = png_decode(png_encode(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=25, deadline=None)
@given(st.tuples(st.integers(1, 24), st.integers(1, 24),
                 st.sampled_from([1, 3])), st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_property(dims, seed):
    h, w, ch = dims
    img = np.random.RandomState(seed).randint(
        0, 256, (h, w, ch)).astype(np.uint8)
    out = ppm_decode(ppm_encode(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=20, deadline=None)
@given(st.sampled_from([16, 24, 32]), st.binary(min_size=0, max_size=200),
       st.integers(0, 2**32 - 1))
def test_aes_cbc_inverse_property(keylen, data, seed):
    rng = np.random.RandomState(seed)
    key = bytes(rng.randint(0, 256, keylen).astype(np.uint8))
    iv = bytes(rng.randint(0, 256, 16).astype(np.uint8))
    assert _aes_cbc_decrypt(key, _aes_cbc_encrypt(key, data, iv=iv)) == data


def test_jpeg_flat_closed_form_full_range():
    """Every gray value 0..255 reconstructs to the closed form the SQL
    oracle computes — the exactness claim behind jpeg_roundtrip."""
    q00 = int(quant_table(2)[0, 0])
    for v in range(256):
        out = jpeg_decode(jpeg_encode(np.full((8, 8), v, np.uint8), scale=2))
        dc = math.floor(8 * (v - 128) / q00 + 0.5)
        expect = min(255, max(0, math.floor(dc * q00 / 8 + 0.5) + 128))
        assert (out == expect).all(), v


def test_hash_2b_determinism_and_salt_sensitivity():
    a = _hash_2b(b"", bytes(8), b"")
    assert a == _hash_2b(b"", bytes(8), b"") and len(a) == 32
    assert a != _hash_2b(b"", bytes([1]) + bytes(7), b"")
    assert a != _hash_2b(b"x", bytes(8), b"")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(1, 2 * BUDGET), min_size=0, max_size=60))
def test_packing_invariants_property(sizes):
    pdf = pd.DataFrame({"lang": ["en"] * len(sizes),
                        "doc_id": list(range(len(sizes))),
                        "n_tokens": sizes})
    out = _pack_group(pdf)
    assert len(out) == len(sizes)
    if not len(sizes):
        return
    seqs = list(out["seq_id"])
    fills = list(out["seq_fill"])
    ns = list(out["n_tokens"])
    # seq ids start at 1 and advance by at most 1, in order
    assert seqs[0] == 1
    assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
    # fill never exceeds budget except for single over-budget docs
    for n, f in zip(ns, fills):
        assert f <= BUDGET or (n > BUDGET and f == n)
    # within a sequence the fill is the running sum; across docs nothing
    # is lost or duplicated
    total = 0
    prev_seq, prev_fill = 0, 0
    for n, s, f in zip(ns, seqs, fills):
        if s != prev_seq:
            assert f == n  # a sequence opens with its first doc's count
        else:
            assert f == prev_fill + n
        prev_seq, prev_fill = s, f
        total += n
    assert total == sum(sizes)
