"""From-scratch baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the multimodal JPEG stub leg without PIL/poppler: the reference's
page images are JPEG (`no-ocr-api/np_ocr/data.py:25-27`), so a real
decode path needs Huffman entropy coding + dequantization + 8x8 IDCT +
YCbCr conversion — all implemented here from the public spec.

Scope (declared): baseline sequential DCT (SOF0/1) and PROGRESSIVE
(SOF2) decode — spectral selection AND successive approximation
(DC/AC first + refinement scans, EOB runs, interleaved DC,
non-interleaved AC on per-component grids) — 8-bit, grayscale and
YCbCr with 4:4:4 or 2x2-subsampled (4:2:0) chroma, restart markers,
multiple DQT/DHT segments. The reference's own page images are
progressive JPEGs (`data.py:25-27`: quality=100, progressive), so
progressive DECODE is the parity-critical direction; the encoder's
progressive mode emits a spectral-selection scan script (refinement
decode is unit-tested against hand-built streams). Hierarchical modes,
arithmetic coding, and 12-bit precision raise ImageFormatError
(quarantine, same contract as the PDF parser's unsupported-encryption
path).

Derivation notes (nothing transcribed from tables we could mis-copy):

* Quantization uses a FORMULA table, q[u,v] = 1 + (1+u+v)*scale — the
  classic distance-weighted example from the literature; any table is
  legal since DQT ships in the file, and the decoder honors whatever
  DQT it finds.
* Huffman tables are our own CANONICAL FIXED-LENGTH tables: the 12 DC
  size categories as 4-bit codes, the 162 valid AC (run,size) symbols
  as 8-bit codes. Fixed-length canonical codes are legal Huffman tables
  (DHT ships them), keep the all-ones prefix unused, and free us from
  transcribing Annex K's example code lengths. Compression is a little
  worse than optimized tables — this codec optimizes for provable
  correctness, not ratio.
* DCT: the exact orthonormal DCT-II basis built with numpy cosines;
  IDCT is its transpose (separable matrix form, batched over all
  blocks). Rounding is pinned to floor(x + 0.5) everywhere so flat
  blocks (DC-only) reconstruct in CLOSED FORM — which is what makes the
  jpeg round-trip query exactly oracle-checkable in SQL.
"""

from __future__ import annotations

import re
import struct

import numpy as np

from no_ocr_spark.extract.image import ImageFormatError

# ------------------------------------------------------------ constants


def _zigzag_order() -> np.ndarray:
    """8x8 zigzag scan order, derived (diagonals alternate direction)."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order += diag
    idx = np.array([y * 8 + x for y, x in order])
    return idx


_ZIGZAG = _zigzag_order()          # zigzag position -> raster index


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M; block DCT = M @ f @ M.T."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5


_DCT_M = _dct_matrix()


def quant_table(scale: int) -> np.ndarray:
    """Formula quant table q[u,v] = 1 + (1+u+v)*scale (8x8, uint8)."""
    u = np.arange(8)
    q = 1 + (1 + u[:, None] + u[None, :]) * scale
    return np.clip(q, 1, 255).astype(np.uint8)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): the codec's single pinned rounding rule (numpy
    rint would banker's-round, which the SQL oracle can't express).
    MUTATES x in place (every call site passes a fresh temporary) —
    avoids two full-array allocations on the 33k-blocks-per-page path."""
    np.add(x, 0.5, out=x)
    np.floor(x, out=x)
    return x.astype(np.int32)


# ----------------------------------------------------- canonical Huffman

_DC_SYMBOLS = list(range(12))                       # size categories 0-11
_AC_SYMBOLS = ([0x00, 0xF0]                         # EOB/EOB0, ZRL
               + [(r << 4) for r in range(1, 15)]   # EOBn (progressive)
               + [(r << 4) | s                      # (run, size)
                  for r in range(16) for s in range(1, 11)])
_DC_LEN, _AC_LEN = 4, 8


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """All symbols at one code length: canonical assignment is just
    enumeration order. Legal iff n_symbols < 2**length (keeps the
    all-ones code unused, as T.81 requires for length-16; we keep it
    unused at every length for safety)."""
    assert len(symbols) < (1 << length)
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMBOLS, _DC_LEN)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, _AC_LEN)


def _dht_payload(table_class: int, table_id: int, symbols: list[int],
                 length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return (bytes([(table_class << 4) | table_id]) + bytes(counts)
            + bytes(symbols))


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)

    def pad_marker(self, marker_byte: int) -> None:
        """Byte-align (1-bit padding) then emit a raw marker — markers
        are NOT byte-stuffed, so they bypass write()."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, marker_byte])


class _BitReader:
    """Entropy-coded segment reader, built for the decode hot path: the
    segment is pre-scanned ONCE up front — byte-stuffing (FF 00)
    stripped with bytes.replace and restart markers split into
    intervals — so per-symbol work is pure integer arithmetic with no
    per-byte marker checks. Huffman symbols decode through a prefix
    lookup table (_HuffDecoder) in one peek instead of bit-by-bit."""

    def __init__(self, data: bytes, pos: int) -> None:
        # entropy data ends at the first marker that is neither stuffing
        # nor a restart (normally EOI)
        m = re.search(rb"\xff(?![\x00\xd0-\xd7])", data[pos:])
        end = pos + (m.start() if m else len(data) - pos)
        self.end_pos = end  # where the next marker begins (scan resume)
        raw = data[pos:end]
        self.intervals = [seg.replace(b"\xff\x00", b"\xff")
                          for seg in re.split(rb"\xff[\xd0-\xd7]", raw)]
        self.rst_seq = [b[0] & 7
                        for b in re.findall(rb"\xff([\xd0-\xd7])", raw)]
        self.interval_i = 0
        self.seg = self.intervals[0]
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, want: int = 4) -> int:
        """Pull up to `want` bytes into the accumulator in ONE
        int.from_bytes (not byte-at-a-time), masking consumed high bits
        first so the accumulator stays a small int (without the mask it
        grows monotonically and big-int arithmetic creeps into every
        shift — measured as a decode hot spot)."""
        take = min(want, len(self.seg) - self.pos)
        if take > 0:
            self.acc = (
                ((self.acc & ((1 << self.nbits) - 1)) << (8 * take))
                | int.from_bytes(self.seg[self.pos:self.pos + take], "big")
            )
            self.pos += take
            self.nbits += 8 * take
        return take

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            if not self._fill():
                raise ImageFormatError("truncated entropy stream")
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_huff(self, table: list, maxlen: int) -> int:
        """One-peek canonical Huffman decode: look `maxlen` bits up
        (zero-padded near stream end — padding only selects among
        entries sharing the true prefix), consume the entry's length."""
        nbits = self.nbits
        if nbits < maxlen:
            self._fill()
            nbits = self.nbits
        if nbits >= maxlen:
            window = (self.acc >> (nbits - maxlen)) & ((1 << maxlen) - 1)
            entry = table[window]
            if entry is None:
                raise ImageFormatError("invalid Huffman code")
        else:
            if nbits <= 0:
                raise ImageFormatError("truncated entropy stream")
            window = (self.acc << (maxlen - nbits)) & ((1 << maxlen) - 1)
            entry = table[window]
            if entry is None or entry[1] > nbits:
                raise ImageFormatError(
                    "invalid Huffman code" if entry is None
                    else "truncated entropy stream")
        self.nbits = nbits - entry[1]
        return entry[0]

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align, then consume the expected RSTn marker (= advance
        to the next pre-split interval)."""
        self.acc = 0
        self.nbits = 0
        if (self.interval_i >= len(self.rst_seq)
                or self.rst_seq[self.interval_i] != n):
            raise ImageFormatError("missing restart marker")
        self.interval_i += 1
        self.seg = self.intervals[self.interval_i]
        self.pos = 0


class _HuffDecoder:
    """Canonical Huffman decode table from a DHT segment's (counts,
    symbols) — works for ANY legal table, not just our fixed-length
    ones. Realized as a 2^maxlen prefix lookup: every code of length L
    fills the 2^(maxlen-L) entries sharing its prefix, so decode is a
    single table index (total fill work is bounded by 2^maxlen)."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        lengths = [ln for ln in range(1, 17) if counts[ln - 1]]
        self.maxlen = lengths[-1] if lengths else 1
        self.table: list = [None] * (1 << self.maxlen)
        code = 0
        k = 0
        for length in range(1, self.maxlen + 1):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                base = code << (self.maxlen - length)
                entry = (sym, length)
                for i in range(1 << (self.maxlen - length)):
                    self.table[base + i] = entry
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        return br.decode_huff(self.table, self.maxlen)


# ------------------------------------------------------------- encoder


def _size_category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    # T.81 F.1.4.1: negative amplitudes encode as v - 1 in `size` bits
    return v if v >= 0 else v + (1 << size) - 1


def _last_nz_per_block(quant_zz: np.ndarray) -> np.ndarray:
    """Vectorized per-block index of the last nonzero AC coefficient
    (0 when all AC are zero) — hoisted out of the entropy loop, where
    a per-block np.any/np.max pair dominated encode time."""
    mask = quant_zz != 0
    mask[:, 0] = False
    any_ac = mask.any(axis=1)
    return np.where(any_ac, 63 - np.argmax(mask[:, ::-1], axis=1), 0)


def _encode_block(bw: _BitWriter, coefs: np.ndarray, dc_pred: int,
                  last_nz: int | None = None) -> int:
    """Zigzagged quantized coefficients -> entropy-coded bits. Returns
    the new DC predictor. `last_nz` comes precomputed from
    _last_nz_per_block on the hot path (None = derive locally)."""
    dc = int(coefs[0])
    diff = dc - dc_pred
    s = _size_category(diff)
    code, nb = _DC_CODES[s]
    bw.write(code, nb)
    if s:
        bw.write(_amplitude_bits(diff, s), s)
    run = 0
    if last_nz is None:
        nz = np.nonzero(coefs[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, 64):
        v = int(coefs[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, nb = _AC_CODES[0xF0]  # ZRL: 16 zeros
            bw.write(code, nb)
            run -= 16
        s = _size_category(v)
        code, nb = _AC_CODES[(run << 4) | s]
        bw.write(code, nb)
        bw.write(_amplitude_bits(v, s), s)
        run = 0
    if last_nz < 63:
        code, nb = _AC_CODES[0x00]  # EOB
        bw.write(code, nb)
    return dc


# ------------------------------------------- vectorized entropy encode
#
# The canonical tables are FIXED-WIDTH (DC 4 bits, AC 8 bits — see
# _canonical_codes), so symbol -> (code, length) is a table lookup and
# the whole entropy stage reduces to building (value, nbits) event
# arrays in stream order and bit-packing them with numpy (VERDICT r4 #3:
# the pure-Python per-coefficient _BitWriter loop was ~0.2-0.5 s/page —
# the page-image leg's bottleneck). The scalar path remains for the
# 4:2:0 and restart-marker encodes (and as the differential-test oracle:
# tests assert byte-identity between the two).

_DC_CODE_V = np.array([_DC_CODES[s][0] for s in range(12)], np.int64)
_AC_CODE_V = np.zeros(256, np.int64)
for _sym, (_code, _nb) in _AC_CODES.items():
    _AC_CODE_V[_sym] = _code
del _sym, _code, _nb


def _size_cat_v(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length(|v|) — frexp's exponent IS the bit length
    for integers (exact: |v| < 2^53 >> any DCT range)."""
    return np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)


def _sym_events(codes: np.ndarray, code_bits: int,
                v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(code || amplitude-bits) merged into one event per symbol:
    value = code << s | amp, nbits = code_bits + s."""
    s = _size_cat_v(v)
    amp = np.where(v >= 0, v, v + (np.int64(1) << s) - 1).astype(np.int64)
    return (codes << s) | amp, code_bits + s


def _pack_events(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """(value, nbits) event arrays -> entropy-coded segment: big-endian
    bit concatenation, 1-bit padding to a byte boundary, FF 00 byte
    stuffing. Each event must fit 32 bits (max here: 8-bit AC code +
    10 amplitude bits, or 8-bit EOBn code + 14 run bits)."""
    if len(values) == 0:
        return b""
    total = int(nbits.sum())
    pad = (-total) % 8
    if pad:
        values = np.append(values, (1 << pad) - 1)
        nbits = np.append(nbits, pad)
        total += pad
    offs = np.cumsum(nbits) - nbits
    buf = np.zeros(total // 8 + 5, np.uint8)
    # left-align each event in a 40-bit window starting at its byte
    shift = (np.int64(40) - (offs & 7) - nbits).astype(np.uint64)
    aligned = values.astype(np.uint64) << shift
    byte0 = (offs >> 3).astype(np.int64)
    for j in range(5):
        np.bitwise_or.at(
            buf, byte0 + j,
            ((aligned >> np.uint64(8 * (4 - j))) & np.uint64(0xFF))
            .astype(np.uint8))
    buf = buf[:total // 8]
    ff = np.nonzero(buf == 0xFF)[0]
    if len(ff):
        buf = np.insert(buf, ff + 1, 0)
    return buf.tobytes()


def _rle_events(band: np.ndarray):
    """Shared AC run-length stage over (n_blocks, L) coefficients in scan
    order: ZRL + (run, size) symbol events for every nonzero, keyed for a
    lexsort merge. Returns (key_block, key_col, key_sub, values, nbits,
    last_nz) where last_nz is -1 for all-zero rows."""
    nz_b, nz_c = np.nonzero(band)
    n = band.shape[0]
    last_nz = np.full(n, -1, np.int64)
    if len(nz_b):
        last_nz[nz_b] = nz_c  # ascending per block -> last write wins
    if len(nz_b) == 0:
        z = np.zeros(0, np.int64)
        empty = np.zeros(0, np.int64)
        return empty, empty, empty, empty, empty, last_nz
    prev_c = np.empty_like(nz_c)
    prev_c[0] = -1
    prev_c[1:] = np.where(nz_b[1:] == nz_b[:-1], nz_c[:-1], -1)
    run = nz_c - prev_c - 1
    z, rem = run >> 4, run & 15
    vals = band[nz_b, nz_c].astype(np.int64)
    s = _size_cat_v(vals)
    sym = (rem << 4) | s
    values, nbits = _sym_events(_AC_CODE_V[sym], _AC_LEN, vals)
    # ZRL fan-out: z[i] copies of the ZRL event before symbol i
    zrl_code, zrl_nb = _AC_CODES[0xF0]
    tz = np.repeat(nz_b, z)
    cz = np.repeat(nz_c, z)
    cum = np.cumsum(z) - z
    sub_z = np.arange(len(tz), dtype=np.int64) - np.repeat(cum, z)
    key_b = np.concatenate([tz, nz_b])
    key_c = np.concatenate([cz, nz_c]) + 1  # col 0 reserved for DC/EOBn
    key_sub = np.concatenate([sub_z, z])
    values = np.concatenate([np.full(len(tz), zrl_code, np.int64), values])
    nbits = np.concatenate([np.full(len(tz), zrl_nb, np.int64), nbits])
    return key_b, key_c, key_sub, values, nbits, last_nz


def _encode_sequential_v(inter: np.ndarray, n_comp: int) -> bytes:
    """Vectorized baseline scan for the non-subsampled, no-restart case.
    `inter` is the (n_mcu * n_comp, 64) zigzagged block sequence in MCU
    order (components interleaved); DC prediction runs per component."""
    n = inter.shape[0]
    dc = inter[:, 0].astype(np.int64).reshape(-1, n_comp)
    diff = np.diff(dc, axis=0,
                   prepend=np.zeros((1, n_comp), np.int64)).reshape(-1)
    dc_vals, dc_nb = _sym_events(_DC_CODE_V[_size_cat_v(diff)], _DC_LEN,
                                 diff)
    kb, kc, ks, vals, nbits, last_nz = _rle_events(inter[:, 1:])
    eob_b = np.nonzero(last_nz < 62)[0]
    eob_code, eob_nb = _AC_CODES[0x00]
    key_b = np.concatenate([np.arange(n, dtype=np.int64), kb, eob_b])
    key_c = np.concatenate([np.zeros(n, np.int64), kc,
                            np.full(len(eob_b), 64, np.int64)])
    key_sub = np.concatenate([np.zeros(n, np.int64), ks,
                              np.zeros(len(eob_b), np.int64)])
    values = np.concatenate([dc_vals, vals,
                             np.full(len(eob_b), eob_code, np.int64)])
    nb = np.concatenate([dc_nb, nbits,
                         np.full(len(eob_b), eob_nb, np.int64)])
    order = np.lexsort((key_sub, key_c, key_b))
    return _pack_events(values[order], nb[order])


def _encode_dc_scan_v(blocks: list[np.ndarray]) -> bytes:
    """Vectorized progressive DC-first scan (interleaved, 4:4:4/gray)."""
    n_comp = len(blocks)
    dc = np.stack([b[:, 0].astype(np.int64) for b in blocks], axis=1)
    diff = np.diff(dc, axis=0,
                   prepend=np.zeros((1, n_comp), np.int64)).reshape(-1)
    vals, nb = _sym_events(_DC_CODE_V[_size_cat_v(diff)], _DC_LEN, diff)
    return _pack_events(vals, nb)


def _encode_ac_band_v(band: np.ndarray) -> bytes:
    """Vectorized progressive AC band scan with EOB-run accumulation:
    every all-zero block — and every nonzero block whose band tail is
    zero — accrues one EOB credit; accrued credits flush as EOBn symbols
    immediately before the next nonzero block's symbols (and at scan
    end), exactly the scalar flush_eob protocol."""
    n, L = band.shape
    kb, kc, ks, vals, nbits, last_nz = _rle_events(band)
    has_nz = last_nz >= 0
    credits = (~has_nz | (last_nz < L - 1)).astype(np.int64)
    csum_ext = np.concatenate([[0], np.cumsum(credits)])  # [i] = 0..i-1
    ne = np.nonzero(has_nz)[0]
    # flush j covers credits accrued in [ne_{j-1}, ne_j - 1]: the PREVIOUS
    # nonzero block's trailing credit (accrued after its symbols) plus
    # every empty block since
    before = csum_ext[ne]
    prev_before = np.empty_like(before)
    if len(ne):
        prev_before[0] = 0
        prev_before[1:] = csum_ext[ne[:-1]]
    flush_at = ne
    flush_amt = before - prev_before if len(ne) else np.zeros(0, np.int64)
    # final flush: everything accrued from the last nonzero block on
    tail = csum_ext[-1] - (csum_ext[ne[-1]] if len(ne) else 0)
    if tail > 0:
        flush_at = np.concatenate([flush_at, [n]])
        flush_amt = np.concatenate([flush_amt, [tail]])
    live = flush_amt > 0
    flush_at, flush_amt = flush_at[live], flush_amt[live]
    # EOBn events: run r -> symbol (bit_length(r)-1) << 4 plus r's low
    # bits; r caps at 32767 per symbol (rounds handle the overflow tail)
    eb, ec, es, ev, en = [], [], [], [], []
    rnd = 0
    remaining, at = flush_amt, flush_at
    while len(remaining):
        take = np.minimum(remaining, 32767)
        r = _size_cat_v(take) - 1
        code = _AC_CODE_V[(r << 4).astype(np.int64)]
        ev.append((code << r) | (take - (np.int64(1) << r)))
        en.append(_AC_LEN + r)
        eb.append(at)
        ec.append(np.zeros(len(at), np.int64))
        es.append(np.full(len(at), rnd, np.int64))
        keep = remaining > 32767
        remaining, at = remaining[keep] - 32767, at[keep]
        rnd += 1
    key_b = np.concatenate([kb] + eb) if eb else kb
    key_c = np.concatenate([kc] + ec) if ec else kc
    key_sub = np.concatenate([ks] + es) if es else ks
    values = np.concatenate([vals] + ev) if ev else vals
    nb = np.concatenate([nbits] + en) if en else nbits
    order = np.lexsort((key_sub, key_c, key_b))
    return _pack_events(values[order], nb[order])


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (n_blocks, 8, 8) in raster MCU order, edge-replicated
    to multiples of 8 (T.81 recommends replication for the pad region)."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _fdct_quant(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, 8, 8) pixel blocks (any numeric dtype) -> (n, 64) zigzagged
    quantized coefficients. The 2-D DCT runs as two big (n*8, 8)x(8, 8)
    GEMMs instead of n batched 8x8 matmuls — same numbers (matmul
    association only), measurably faster on the 33k-blocks-per-page
    path, and the single astype here replaces the per-call-site float64
    conversion copies."""
    shifted = blocks.reshape(-1, 8).astype(np.float64) - 128.0
    y = (shifted @ _DCT_M.T).reshape(-1, 8, 8)
    y = (y.transpose(0, 2, 1).reshape(-1, 8) @ _DCT_M.T).reshape(-1, 8, 8)
    quant = _round_half_up(y.transpose(0, 2, 1) / q.astype(np.float64))
    return quant.reshape(-1, 64)[:, _ZIGZAG]  # zigzag per block


def jpeg_encode(img: np.ndarray, scale: int = 2,
                subsample: bool = False,
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """(H, W) / (H, W, 1) grayscale or (H, W, 3) RGB -> JPEG.
    `scale` parameterizes the formula quant table (1 = finest).
    `subsample=True` emits 4:2:0 chroma (box-averaged), else 4:4:4.
    `restart_interval` > 0 emits a DRI segment and RSTn markers every N
    MCUs (4:4:4/gray path only) — exists mainly so the decoder's restart
    handling is round-trip-testable against a real stream.
    `progressive=True` emits SOF2 with a spectral-selection scan script
    (interleaved DC scan, then per-component AC bands 1-5 and 6-63 with
    EOB-run accumulation; Al=0 — no successive approximation on the
    encode side; the decoder handles refinement scans regardless, unit-
    tested against hand-built streams). 4:4:4/gray only, the reference's
    own page-image config is progressive so decode parity matters most."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q_lum = quant_table(scale)
    q_chr = quant_table(scale * 2)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    planes = [np.clip(_round_half_up(p), 0, 255).astype(np.uint8)
              for p in planes]
    if not gray and subsample:
        for i in (1, 2):
            p = planes[i]
            ph, pw = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                       mode="edge").astype(np.float64)
            planes[i] = np.clip(_round_half_up(
                (p[0::2, 0::2] + p[0::2, 1::2]
                 + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0), 0, 255
            ).astype(np.uint8)

    out = bytearray(b"\xff\xd8")  # SOI
    for tid, q in ((0, q_lum),) if gray else ((0, q_lum), (1, q_chr)):
        zz = q.reshape(64)[_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(zz)
    ncomp = 1 if gray else 3
    sof_at = len(out)  # recorded at emit time; rewritten C0->C2 if progressive
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    hv_lum = 0x22 if (not gray and subsample) else 0x11
    comps = [(1, hv_lum, 0)] if gray else [
        (1, hv_lum, 0), (2, 0x11, 1), (3, 0x11, 1)]
    for cid, hv, tq in comps:
        out += bytes([cid, hv, tq])
    for cls, tid in ((0, 0), (1, 0)) if gray else ((0, 0), (1, 0), (0, 1), (1, 1)):
        syms = _DC_SYMBOLS if cls == 0 else _AC_SYMBOLS
        ln = _DC_LEN if cls == 0 else _AC_LEN
        payload = _dht_payload(cls, tid, syms, ln)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if progressive and (restart_interval or (subsample and not gray)):
        raise ImageFormatError(
            "progressive encode supports 4:4:4/gray, no restarts")
    if restart_interval:
        if subsample and not gray:
            raise ImageFormatError(
                "restart_interval unsupported with 4:2:0 encode")
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        # rewrite the SOF marker C0 -> C2 at the offset recorded at emit
        # time (searching the header could hit a DQT byte pair instead)
        out[sof_at + 1] = 0xC2
        blocks = [_fdct_quant(_blocks_of(p),
                              q_lum if i == 0 else q_chr)
                  for i, p in enumerate(planes)]
        out += _progressive_scans(blocks, comps)
        out += b"\xff\xd9"
        return bytes(out)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, _hv, tq in comps:
        out += bytes([cid, (tq << 4) | tq])
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    bw = _BitWriter()
    if gray or not subsample:
        blocks = [_fdct_quant(_blocks_of(p),
                              q_lum if i == 0 else q_chr)
                  for i, p in enumerate(planes)]
        if not restart_interval:
            # hot path (page images): vectorized entropy stage
            inter = np.stack(blocks, axis=1).reshape(-1, 64)
            out += _encode_sequential_v(inter, len(planes))
            out += b"\xff\xd9"
            return bytes(out)
        lasts = [_last_nz_per_block(b) for b in blocks]
        n_mcu = blocks[0].shape[0]
        preds = [0] * len(planes)
        rst = 0
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                bw.pad_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for c in range(len(planes)):
                preds[c] = _encode_block(bw, blocks[c][m], preds[c],
                                         int(lasts[c][m]))
    else:
        # 4:2:0 MCU = 4 luminance blocks (2x2) + 1 Cb + 1 Cr
        yb_h, yb_w = (h + 15) // 16 * 2, (w + 15) // 16 * 2
        ypad = np.pad(planes[0], ((0, yb_h * 8 - h), (0, yb_w * 8 - w)),
                      mode="edge").astype(np.float64)
        yq = _fdct_quant(_blocks_of(ypad), q_lum).reshape(
            yb_h // 2, 2, yb_w // 2, 2, 64)
        cq = []
        for i in (1, 2):
            p = planes[i]
            cpad = np.pad(
                p, ((0, yb_h // 2 * 8 - p.shape[0]),
                    (0, yb_w // 2 * 8 - p.shape[1])), mode="edge")
            cq.append(_fdct_quant(_blocks_of(cpad.astype(np.float64)),
                                  q_chr).reshape(yb_h // 2, yb_w // 2, 64))
        preds = [0, 0, 0]
        for my in range(yb_h // 2):
            for mx in range(yb_w // 2):
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_block(
                            bw, yq[my, by, mx, bx], preds[0])
                preds[1] = _encode_block(bw, cq[0][my, mx], preds[1])
                preds[2] = _encode_block(bw, cq[1][my, mx], preds[2])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


def _sos_header(comp_specs: list[tuple[int, int]], ss: int, se: int,
                ah: int, al: int) -> bytes:
    ns = len(comp_specs)
    out = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
    for cid, tq in comp_specs:
        out += bytes([cid, (tq << 4) | tq])
    return out + bytes([ss, se, (ah << 4) | al])


def _progressive_scans(blocks: list[np.ndarray], comps) -> bytes:
    """Spectral-selection scan script: one interleaved DC scan, then AC
    bands (1-5, 6-63) per component, with EOB-run accumulation (EOBn
    symbols) — so decode round trips exercise runs > 1."""
    out = bytearray()
    # scan 1: DC, all components interleaved (4:4:4 -> MCU == block)
    out += _sos_header([(cid, tq) for cid, _hv, tq in comps], 0, 0, 0, 0)
    out += _encode_dc_scan_v(blocks)
    # AC band scans, one component at a time
    for c, (cid, _hv, tq) in enumerate(comps):
        for ss, se in ((1, 5), (6, 63)):
            out += _sos_header([(cid, tq)], ss, se, 0, 0)
            out += _encode_ac_band_v(blocks[c][:, ss:se + 1])
    return bytes(out)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 64) raster-order dequantized coefficients -> (n, 8, 8) pixels."""
    blocks = coefs.reshape(-1, 8, 8).astype(np.float64)
    pix = _DCT_M.T @ blocks @ _DCT_M
    return np.clip(_round_half_up(pix) + 128, 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, dc_tab: _HuffDecoder, ac_tab: _HuffDecoder,
                  dc_pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, np.int32)
    s = dc_tab.decode(br)
    diff = 0
    if s:
        bits = br.read_bits(s)
        diff = bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
    dc = dc_pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = ac_tab.decode(br)
        if sym == 0x00:   # EOB
            break
        if sym == 0xF0:   # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ImageFormatError("AC run past end of block")
        bits = br.read_bits(size)
        zz[k] = bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1
        k += 1
    return zz, dc


# ------------------------------------------------- progressive (T.81 G)
#
# Progressive files ship the SAME coefficients as baseline, split across
# scans two ways: SPECTRAL SELECTION (each AC scan carries one zigzag
# band Ss..Se; DC travels alone) and SUCCESSIVE APPROXIMATION (first
# scans carry coefficients shifted right by Al; refinement scans with
# Ah>0 restore one bit at a time). Decode accumulates into per-component
# coefficient stores (zigzag order) and reconstructs once at EOI. AC
# scans are always single-component (non-interleaved, walking that
# component's real block grid); DC scans may interleave in MCU order.
# EOBn symbols ((r<<4)|0, r<15) encode END-OF-BAND RUNS of 2^r + extra
# blocks — the progressive replacement for baseline's single-block EOB.
# Re-derived from the spec's Annex G flow descriptions.


def _prog_store(h: int, w: int, comps) -> dict:
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ImageFormatError("sampling factors > 2 unsupported")
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    coefs, dims = [], []
    for cid, ch, cv, tq in comps:
        comp_w = (w * ch + hmax - 1) // hmax
        comp_h = (h * cv + vmax - 1) // vmax
        dims.append(((comp_h + 7) // 8, (comp_w + 7) // 8))  # real grid
        coefs.append(np.zeros((mcus_y * cv, mcus_x * ch, 64), np.int64))
    return {"coefs": coefs, "dims": dims, "mcus": (mcus_y, mcus_x),
            "hmax": hmax, "vmax": vmax, "preds": None}


def _dc_first(br, dc_tab, pred: int) -> tuple[int, int]:
    s = dc_tab.decode(br)
    diff = 0
    if s:
        bits = br.read_bits(s)
        diff = bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
    return pred + diff, pred + diff


def _ac_first(br, ac_tab, block, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac_tab.decode(br)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r == 15:          # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ImageFormatError("AC run past band end")
        bits = br.read_bits(s)
        val = bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
        block[k] = val << al
        k += 1
    return eobrun


def _ac_refine(br, ac_tab, block, ss, se, al, eobrun) -> int:
    """Refinement scan for one block's band: newly-significant
    coefficients arrive as +-1<<Al; already-nonzero coefficients each
    carry one correction bit; runs count only ZERO-HISTORY positions."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac_tab.decode(br)
            r, s = sym >> 4, sym & 15
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ImageFormatError("bad refinement magnitude")
                val = p1 if br.read_bits(1) else m1
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if br.read_bits(1) and (c & p1) == 0:
                        block[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:       # correction bits for the rest of the band
            c = int(block[k])
            if c != 0:
                if br.read_bits(1) and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(data, pos, frame, htabs, scan_comps,
                             ss, se, ah, al, restart_interval,
                             store) -> int:
    h, w, comps = frame
    if ss == 0 and se != 0:
        # T.81 B.2.3: a progressive DC scan has Se=0; Ss=0/Se=63 is a
        # baseline scan layout inside a SOF2 frame (doctored/corrupt)
        raise ImageFormatError("progressive DC scan with Se != 0")
    by_cid = {c[0]: i for i, c in enumerate(comps)}
    br = _BitReader(data, pos)
    mcus_y, mcus_x = store["mcus"]
    rst_n, unit = 0, 0
    preds = [0] * len(comps)
    eobrun = 0

    def maybe_restart():
        nonlocal rst_n, preds, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            br.align_and_expect_rst(rst_n)
            rst_n = (rst_n + 1) % 8
            preds = [0] * len(comps)
            eobrun = 0

    if len(scan_comps) > 1:
        # interleaved MCU order (multi-component DC scans only,
        # T.81 G.1.1.1.1); per A.2.2 a one-component scan is ALWAYS
        # non-interleaved over the component's real block grid, even
        # when the frame declares sampling factors > 1
        if ss != 0 or se != 0:
            raise ImageFormatError("interleaved progressive AC scan")
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for cid, dc_t, _ac_t in scan_comps:
                    ci = by_cid[cid]
                    _c, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = store["coefs"][ci][my * cv + by,
                                                     mx * ch + bx]
                            if ah == 0:
                                dc, preds[ci] = _dc_first(
                                    br, htabs[(0, dc_t)], preds[ci])
                                blk[0] = dc << al
                            else:
                                blk[0] = int(blk[0]) | (
                                    br.read_bits(1) << al)
                unit += 1
    else:
        cid, dc_t, ac_t = scan_comps[0]
        ci = by_cid[cid]
        real_by, real_bx = store["dims"][ci]
        for by in range(real_by):
            for bx in range(real_bx):
                maybe_restart()
                blk = store["coefs"][ci][by, bx]
                if ss == 0:          # non-interleaved DC band
                    if ah == 0:
                        dc, preds[ci] = _dc_first(
                            br, htabs[(0, dc_t)], preds[ci])
                        blk[0] = dc << al
                    else:
                        blk[0] = int(blk[0]) | (br.read_bits(1) << al)
                elif ah == 0:
                    eobrun = _ac_first(br, htabs[(1, ac_t)], blk,
                                       ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, htabs[(1, ac_t)], blk,
                                        ss, se, al, eobrun)
                unit += 1
    return br.end_pos


def _prog_reconstruct(store, frame, qtabs) -> np.ndarray:
    h, w, comps, _prog = frame
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        grid = store["coefs"][ci]
        pad_by, pad_bx, _ = grid.shape
        zz = grid.reshape(-1, 64)
        raster = np.zeros_like(zz)
        raster[:, _ZIGZAG] = zz
        pix = _idct_blocks(raster * qtabs[tq][None, :])
        plane = (pix.reshape(pad_by, pad_bx, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(pad_by * 8, pad_bx * 8).astype(np.int32))
        planes.append(plane)
    return _planes_to_image(planes, comps, h, w,
                            store["hmax"], store["vmax"])


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG (baseline SOF0/1 or progressive SOF2) -> (H, W, C) uint8,
    C = 1 (gray) or 3 (RGB). Truncated/corrupt streams raise
    ImageFormatError (total-function quarantine contract, same as the
    PDF parser)."""
    try:
        return _jpeg_decode_inner(data)
    except ImageFormatError:
        raise
    except (IndexError, KeyError, struct.error, ValueError) as e:
        # ValueError covers numpy shape mismatches from truncated
        # DQT/DHT segments; KeyError covers SOS references to tables no
        # DHT/DQT defined; ImageFormatError (a ValueError subclass)
        # re-raises above untouched
        raise ImageFormatError(f"truncated or corrupt JPEG: {e}") from e


def _jpeg_decode_inner(data: bytes) -> np.ndarray:
    if data[:3] != b"\xff\xd8\xff":
        raise ImageFormatError("not a JPEG signature")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    store = None  # progressive: per-component coefficient accumulators
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ImageFormatError("marker expected")
        while data[pos + 1] == 0xFF:  # T.81 B.1.1.2: optional fill bytes
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec:
                    raise ImageFormatError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg[p + 1:p + 65], np.uint8)
                q = np.zeros(64, np.int32)
                q[_ZIGZAG] = zz
                qtabs[tid] = q
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                htabs[(cls, tid)] = _HuffDecoder(
                    counts, seg[p + 17:p + 17 + n])
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ImageFormatError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                f"unsupported JPEG mode (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ImageFormatError("SOS before SOF")
            h, w, comps, progressive = frame
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            if not progressive:
                return _decode_scan(data, pos + seglen, (h, w, comps),
                                    qtabs, htabs,
                                    {c: (d, a) for c, d, a in scan_comps},
                                    restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if store is None:
                store = _prog_store(h, w, comps)
            pos = _decode_progressive_scan(
                data, pos + seglen, (h, w, comps), htabs, scan_comps,
                ss, se, ahal >> 4, ahal & 0x0F, restart_interval, store)
            continue
        pos += seglen
    if store is not None:
        return _prog_reconstruct(store, frame, qtabs)
    raise ImageFormatError("no scan data found")


def _decode_scan(data, pos, frame, qtabs, htabs, scan_tabs,
                 restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ImageFormatError("sampling factors > 2 unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    br = _BitReader(data, pos)
    # Entropy decode is inherently sequential; dequant + IDCT is not.
    # Accumulate zigzag coefficient rows per component during the scan,
    # then run ONE batched dequant+IDCT per component (mirroring the
    # encoder's batched _fdct_quant) — per-block numpy dispatch in the
    # four-deep MCU loop was the decode hot spot at page-image sizes.
    coef_rows: list[list[np.ndarray]] = [[] for _ in comps]
    origins: list[list[tuple[int, int]]] = [[] for _ in comps]
    preds = [0] * len(comps)
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) % 8
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dc_t, ac_t = scan_tabs[cid]
                for by in range(cv):
                    for bx in range(ch):
                        zz, preds[ci] = _decode_block(
                            br, htabs[(0, dc_t)], htabs[(1, ac_t)],
                            preds[ci])
                        coef_rows[ci].append(zz)
                        origins[ci].append(
                            ((my * cv + by) * 8, (mx * ch + bx) * 8))
            mcu_count += 1
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        plane = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), np.int32)
        zzs = np.stack(coef_rows[ci])            # (n_blocks, 64) zigzag
        raster = np.zeros_like(zzs)
        raster[:, _ZIGZAG] = zzs                 # de-zigzag, batched
        pix = _idct_blocks(raster * qtabs[tq][None, :])
        for (y0, x0), block in zip(origins[ci], pix):
            plane[y0:y0 + 8, x0:x0 + 8] = block
        planes.append(plane)
    return _planes_to_image(planes, comps, h, w, hmax, vmax)


def _planes_to_image(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Sample planes -> final image: replicate-upsample subsampled
    components, crop to frame dims, YCbCr -> RGB for 3 components."""
    out_planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        out_planes.append(p[:h, :w].astype(np.float64))
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)
