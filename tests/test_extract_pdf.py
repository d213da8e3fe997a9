"""Unit tests for the PDF branch: writer/parser round trip, span geometry,
1-based page numbering (reference convention, no-ocr-api/np_ocr/data.py:56),
and the page-count invariant analogue (data.py:28)."""

from no_ocr_spark.extract.api import extract_document
from no_ocr_spark.extract.pdf import build_pdf, is_pdf, page_text, parse_pdf, pdf_text


def test_roundtrip_two_pages():
    pdf = build_pdf([["Hello world.", "Second line."], ["Page two."]])
    assert is_pdf(pdf)
    pages = parse_pdf(pdf)
    assert len(pages) == 2  # the data.py:28 invariant: page count agrees
    assert [s.text for s in pages[0]] == ["Hello world.", "Second line."]
    assert [s.text for s in pages[1]] == ["Page two."]


def test_span_geometry_monotone_lines():
    pdf = build_pdf([["aaa", "bbb", "ccc"]])
    (spans,) = parse_pdf(pdf)
    ys = [s.y0 for s in spans]
    assert ys == sorted(ys, reverse=True)  # lines descend down the page
    assert all(s.x1 > s.x0 for s in spans)
    assert [s.line for s in spans] == [0, 1, 2]
    assert all(s.block == 0 for s in spans)


def test_escapes():
    pdf = build_pdf([["a(b)c\\d"]])
    (spans,) = parse_pdf(pdf)
    assert spans[0].text == "a(b)c\\d"


def test_pdf_text_join():
    pdf = build_pdf([["l1", "l2"], ["l3"]])
    assert pdf_text(pdf) == "l1\nl2\n\nl3"


def test_extract_document_pdf_branch():
    pdf = build_pdf([["x y z"], ["w"]])
    rec = extract_document(pdf)
    assert rec["method"] == "pdf_minispan_v1"
    assert rec["n_blocks"] == 2
    assert {s["page"] for s in rec["spans"]} == {1, 2}  # 1-based
    assert rec["error"] is None


def test_extract_document_quarantines_garbage():
    rec = extract_document(b"%PDF-1.4 then complete garbage \xff\xff")
    assert rec["method"] in ("pdf_minispan_v1", "error")
    assert isinstance(rec["text"], str)
