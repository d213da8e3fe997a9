"""Property-based tests (hypothesis) for the extraction core — SURVEY §7's
"what's hard" items: the extractor must be a TOTAL, PURE per-document
function (no cross-row state), byte-deterministic regardless of input
mangling, so Arrow batch boundaries and repartitioning cannot change any
output byte."""

from hypothesis import given, settings
from hypothesis import strategies as st

from no_ocr_spark.extract.api import extract_document
from no_ocr_spark.extract.html_tokenizer import tokenize
from no_ocr_spark.extract.pdf import parse_pdf

_html_ish = st.text(
    alphabet=st.sampled_from(list("<>/=\"' abcdefgp!-&;\n\tüé€\x00")),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(_html_ish)
def test_extractor_total_and_deterministic_over_garbage(s):
    payload = s.encode("utf-8", errors="replace")
    r1 = extract_document(payload)
    r2 = extract_document(payload)
    assert isinstance(r1["text"], str)
    assert r1["text"] == r2["text"]
    assert r1["spans"] == r2["spans"]
    assert r1["method"] == r2["method"]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_extractor_total_over_arbitrary_bytes(b):
    rec = extract_document(b)
    assert isinstance(rec["text"], str)
    assert isinstance(rec["spans"], list)


@settings(max_examples=150, deadline=None)
@given(_html_ish)
def test_tokenizer_never_loses_position(s):
    # the tokenizer is a single forward scan: it must terminate and only
    # emit well-formed tokens
    for tok in tokenize(s):
        assert tok[0] in ("text", "open", "close")
        if tok[0] == "open":
            assert isinstance(tok[2], dict) and isinstance(tok[3], bool)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=5, max_size=300).map(lambda b: b"%PDF-" + b))
def test_pdf_parser_total_over_garbage(b):
    pages = parse_pdf(b)
    assert isinstance(pages, list)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.lists(st.text(alphabet=st.sampled_from(list("ab c().\\")), min_size=1,
                     max_size=20), min_size=1, max_size=4),
    min_size=1, max_size=3,
))
def test_pdf_writer_parser_roundtrip_text(pages):
    from no_ocr_spark.extract.pdf import build_pdf

    parsed = parse_pdf(build_pdf(pages))
    assert len(parsed) == len(pages)
    for want_lines, got in zip(pages, parsed):
        # empty lines show nothing; others come back byte-identical
        want = [ln for ln in want_lines if ln]
        assert [s.text for s in got] == want
