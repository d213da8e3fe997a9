"""Mojibake repair (operators/mojibake.py). No SQL oracle by design —
the EXACT repair is recomputed here with Python's codecs machinery
(the independent-implementation role DuckDB plays elsewhere)."""

from __future__ import annotations

import hashlib

import duckdb

from no_ocr_spark.operators.mojibake import (
    _CP1252,
    q_mojibake_repair,
    repair_mojibake_col,
)

SF = "/root/testdata/sf0.001"

_TO_BYTE = {c: b for b, c in _CP1252.items()}


def _py_repair(s: str) -> tuple[str, bool]:
    """Independent reimplementation: sloppy-cp1252 byte mirror ->
    strict UTF-8 decode attempt."""
    mirrored = "".join(chr(_TO_BYTE.get(c, ord(c))) for c in s)
    if any(ord(c) > 0xFF for c in mirrored):
        return s, False
    b = mirrored.encode("latin-1")
    try:
        out = b.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return s, False
    if out == mirrored:        # pure ASCII: no multi-byte lead present
        return s, False
    return out, True


def test_repair_cases(spark):
    cases = [
        # (input, expected_output, expected_flag)
        ("cafÃ©", "café", True),                      # latin-1 class
        ("itâ€™s here", "it’s here", True),          # cp1252 class
        ("â‚¬5 â€” ok", "€5 — ok", True),            # cp1252 € and em-dash
        ("café plain", "café plain", False),          # legit latin-1 kept
        ("ascii only", "ascii only", False),
        ("日本語", "日本語", False),                   # CJK untouched
        ("Ã», Ã¼, Ã±", "û, ü, ñ", True),
        (None, None, False),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(cases)],
        "i long, text string",
    )
    from pyspark.sql import functions as F

    rep, flag = repair_mojibake_col(F.col("text"))
    got = {r.i: (r.out, r.flag) for r in df.select(
        "i", rep.alias("out"), flag.alias("flag")).collect()}
    for i, (inp, want, want_flag) in enumerate(cases):
        assert got[i] == (want, want_flag), (inp, got[i])
        if inp is not None:
            assert _py_repair(inp) == (want, want_flag), inp


def test_query_matches_python_oracle_exactly(spark):
    got = {r.doc_id: (r.text_md5, r.was_repaired)
           for r in q_mojibake_repair(spark, SF).collect()}
    rows = duckdb.sql(f"""
        SELECT doc_id, text FROM '{SF}/documents.parquet'
        UNION ALL
        SELECT doc_id + 300000,
               array_to_string((string_split(text,' '))[1:10], ' ')
                 || ' it’s café — €5'
        FROM '{SF}/documents.parquet' WHERE doc_id % 25 = 0
    """).fetchall()
    assert len(got) == len(rows)
    n_rep = 0
    for doc_id, text in rows:
        if doc_id >= 300000:
            # replicate the in-plan corruption: utf-8 bytes as latin-1
            text = text.encode("utf-8").decode("latin-1")
        out, flag = _py_repair(text)
        n_rep += flag
        md5 = hashlib.md5(out.encode("utf-8")).hexdigest()
        assert got[doc_id] == (md5, flag), doc_id
    # every planted row repaired, and repairs actually happened
    assert n_rep == sum(1 for d, _ in rows if d >= 300000) > 0
