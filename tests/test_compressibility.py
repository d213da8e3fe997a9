"""Compression-ratio quality signal (operators/compressibility.py).
No SQL oracle by design (deflate is not SQL-expressible) — instead the
EXACT per-doc byte counts are recomputed here with the same zlib, the
role the DuckDB oracle plays elsewhere."""

from __future__ import annotations

import zlib

import duckdb

from no_ocr_spark.operators.compressibility import (
    LEVEL,
    MAX_RATIO,
    MIN_RATIO,
    q_compression_ratio,
)

SF = "/root/testdata/sf0.001"


def test_exact_byte_counts_match_independent_zlib(spark):
    got = {r.doc_id: (r.raw_bytes, r.deflate_bytes, r.ratio, r.verdict)
           for r in q_compression_ratio(spark, SF).collect()}
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(rows)
    for doc_id, text in rows:
        raw = (text or "").encode("utf-8")
        exp_raw, exp_def = len(raw), len(zlib.compress(raw, LEVEL))
        raw_b, def_b, ratio, verdict = got[doc_id]
        assert (raw_b, def_b) == (exp_raw, exp_def), doc_id
        if exp_raw == 0:
            assert ratio is None and verdict == "empty"
        else:
            assert abs(ratio - exp_def / exp_raw) < 1e-6
            r = exp_def / exp_raw
            exp_v = ("too_compressible" if r < MIN_RATIO else
                     "incompressible" if r > MAX_RATIO else "keep")
            assert verdict == exp_v


def test_signal_separates_repetition_from_prose_from_noise(spark):
    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randrange(0x21, 0x2FA0)) for _ in range(4000))
    # varied prose (word salad over a real function-word vocabulary):
    # measured ratio ~0.38 at level 6 — the natural-text band. A repeated
    # sentence is NOT a prose fixture; it compresses like spam.
    vocab = ("the of and a to in is was he for it with as his on be at "
             "by had not are but from or have an they which one you "
             "were her all she there would their we him been has when "
             "who will no more if out so said what up its about into "
             "than them can only other new some could time").split()
    prose = " ".join(vocab[rng.randrange(len(vocab))] for _ in range(700))
    docs = spark.createDataFrame(
        [(1, "spam " * 2000),
         (2, prose),
         (3, noise),
         (4, None)],
        "doc_id long, text string",
    )
    from no_ocr_spark.operators.compressibility import compression_counts

    got = {r.doc_id: r.deflate_bytes / r.raw_bytes if r.raw_bytes else None
           for r in compression_counts(docs).collect()}
    assert got[1] < MIN_RATIO          # pure repetition: junk-compressible
    assert MIN_RATIO < got[2] < MAX_RATIO  # prose-ish
    assert got[3] > got[2]             # randomness compresses worst
    assert got[4] is None              # null text -> 0 bytes
