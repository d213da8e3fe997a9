"""segment_tokens (the r6 fused token->block pass on the extraction hot
path) must produce EXACTLY the block list of the tree-building pipeline
segment(parse(x)) — same implied-close/stray-close stack behavior, same
drop/boiler/anchor/cur-tag bookkeeping — for real corpus pages and for
adversarial tag soup."""

import random

from no_ocr_spark.extract.boilerplate import segment, segment_tokens
from no_ocr_spark.extract.dom import parse
from no_ocr_spark.extract.html_tokenizer import decode_bytes


def _eq(html: str) -> bool:
    return segment(parse(html)) == segment_tokens(html)


def test_handwritten_structures():
    cases = [
        "",
        "plain text only",
        "<p>a<p>b",                          # same-tag autoclose
        "<p>x<div>y</div>z",                 # block closes open p
        "<head><p>hidden</p></head>visible",  # drop subtree
        "<p><head></p>after",                # stray close pops out of drop
        "<nav><p>boiler</p></nav><p>real content here</p>",
        "<a href=q>link text</a> tail",
        "<div><a>one<b>two</b></a></div>",
        "<ul><li>a<li>b<li>c</ul>",
        "<table><tr><td>1<td>2<tr><td>3</table>",
        "<br><hr>text after voids",
        "<div/>selfclosing block",
        "<a/>selfclosing anchor",
        "<script>ignored <p>not a tag</p></script>after",
        "<template><p>swallowed</p></template>after",
        "<div><p>unclosed at eof",
        "</p></div>stray closes first",
        "<select><option>x<option>y</select>visible",
        "<footer><div><p>deep boiler</p></div></footer>",
        "<p>a&amp;b &lt;c&gt;</p>",
        "<h2>Heading</h2><p>body body body body body</p>",
        "<div class='x' data-y=\"z\">attrs</div>",
        "<p>one <a href=u>two</a> three</p>",
    ]
    for html in cases:
        assert _eq(html), f"block mismatch for {html!r}"


def test_fuzz_tag_soup():
    rng = random.Random(20240622)
    tags = ["p", "div", "a", "li", "td", "span", "nav", "head", "option",
            "br", "script", "table", "b", "footer", "form", "template",
            "select", "h1", "aside", "tr"]
    for _ in range(1500):
        parts = []
        for _ in range(rng.randrange(1, 40)):
            c = rng.random()
            if c < 0.35:
                parts.append(rng.choice(
                    ["hello", " ", "x&amp;y", "a b  c", "<", ">", "&",
                     "t ", "\n", "word word word word word"]))
            elif c < 0.7:
                tg = rng.choice(tags)
                attr = rng.choice(["", " href=q", ' class="z"', " x", " /"])
                parts.append(f"<{tg}{attr}>")
            else:
                parts.append(f"</{rng.choice(tags)}>")
        html = "".join(parts)
        assert _eq(html), f"block mismatch for {html!r}"


def test_bytes_path_matches():
    payload = "<div><p>café — text</p></div>".encode("utf-8")
    html = decode_bytes(payload)
    assert segment(parse(payload)) == segment_tokens(html)
