"""Search snippets (operators/snippets.py): the window really contains
the matched term and stays within text bounds. Byte-exact grading is
tests/test_oracle_parity.py::search_snippets."""

from __future__ import annotations

from no_ocr_spark.operators.bm25 import TOP_K
from no_ocr_spark.operators.snippets import PAD, q_search_snippets

SF = "/root/testdata/sf0.001"


def test_snippets_contain_their_term(spark):
    rows = q_search_snippets(spark, SF).collect()
    assert len(rows) == TOP_K
    for r in rows:
        assert r.term is not None          # top hits matched some term
        assert r.snippet is not None
        assert len(r.snippet) <= 2 * PAD
        # the window is anchored at the match: the term appears inside
        # (it can only be clipped when the match sits at the text edge)
        assert r.term in r.snippet or r.snippet.startswith(
            r.term[max(0, len(r.term) - 2 * PAD):])
