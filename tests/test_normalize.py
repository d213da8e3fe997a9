"""Unicode NFC normalization (operators/normalize.py): the Python
`unicodedata` stage must agree BYTE-exactly with DuckDB's
`nfc_normalize` (both UAX #15) — that agreement is what makes the
parity oracle meaningful — plus end-to-end verdicts on the planted
denormalized rows. Full corpus grading is
tests/test_oracle_parity.py::normalize_text."""

from __future__ import annotations

import unicodedata

import duckdb

from no_ocr_spark.operators.normalize import (
    _PLANTED,
    nfc_normalize_col,
    q_normalize_text,
)

SF = "/root/testdata/sf0.001"

EXTRA_CASES = [
    "café",                  # NFD -> NFC compose
    "각",          # Hangul jamo -> syllable
    "Å",                      # ANGSTROM SIGN singleton -> U+00C5
    "Ω",                      # OHM SIGN singleton -> U+03A9
    "ẋ̣",               # combining-class reordering
    "q̣̇",               # reorders to dot-below first
    "ﬁﬂ",                # ligatures survive NFC
    "Å",                # A + ring -> Å
    "ascii stays ascii",
    "",
]


def test_python_nfc_agrees_with_duckdb_byte_exactly():
    con = duckdb.connect()
    for s in EXTRA_CASES + [t for _, t in _PLANTED]:
        py = unicodedata.normalize("NFC", s)
        dd = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert py == dd, repr(s)


def test_nfc_stage_null_passthrough_and_compose(spark):
    df = spark.createDataFrame(
        [(1, "café"), (2, None), (3, "Å")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text_nfc for r in nfc_normalize_col(df).collect()}
    assert got[1] == "café"
    assert got[2] is None
    assert got[3] == "Å"


def test_planted_rows_are_marked_changed(spark):
    rows = {r.doc_id: r for r in q_normalize_text(spark, SF).collect()
            if r.doc_id >= 200001}
    assert len(rows) == len(_PLANTED)
    # every planted row is rewritten by NFC and/or cleanup EXCEPT the
    # ligature row: NFC (unlike NFKC) keeps compatibility ligatures, and
    # that non-rewrite is the point of planting it
    assert all(r.changed for i, r in rows.items() if i != 200004)
    assert not rows[200004].changed
    # control strip + whitespace collapse: BEL gone, runs collapsed,
    # trailing spaces trimmed
    expect = "ctrlchars and tabs runs"
    import hashlib
    assert rows[200005].text_md5 == hashlib.md5(
        expect.encode("utf-8")).hexdigest()
    assert rows[200005].n_chars_norm == len(expect)


def test_ascii_corpus_rows_are_unchanged(spark):
    rows = [r for r in q_normalize_text(spark, SF).collect()
            if r.doc_id < 200001]
    assert rows and all(not r.changed for r in rows)
