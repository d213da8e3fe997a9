"""DOM-tree construction over the token stream (from scratch).

A deliberately small tree: element nodes with (name, attrs, children),
text leaves as plain strings. Enough HTML5 tree-building is implemented to
make real-world pages segment correctly:

  * same-tag auto-close for p/li/td/th/tr/option/dd/dt (e.g. `<p>a<p>b`),
  * block-level start tags implicitly close an open <p>,
  * stray end tags pop to the nearest matching open element or are ignored,
  * void and self-closing elements never nest.

The reference never builds a DOM (its input is PDFs); this is the
from-scratch HTML branch mandated by the rebuild's north star.
"""

from __future__ import annotations

from no_ocr_spark.extract.html_tokenizer import tokenize, decode_bytes

# Tags that establish text "blocks" during the walk (see boilerplate.py) and
# that implicitly close an open <p> per the HTML5 tree construction rules.
BLOCK_TAGS = frozenset(
    {"address", "article", "aside", "blockquote", "canvas", "dd", "div",
     "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
     "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li", "main",
     "nav", "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot",
     "th", "thead", "tr", "ul", "br", "caption", "center", "summary",
     "details"}
)

_SAME_TAG_AUTOCLOSE = frozenset({"p", "li", "td", "th", "tr", "option", "dd", "dt"})


class Node:
    """Element node. Children are Node instances or str text leaves."""

    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict[str, str] | None = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list = []

    def __repr__(self) -> str:  # debugging aid only
        return f"<{self.name} n_children={len(self.children)}>"


def parse(payload: "bytes | str") -> Node:
    """Parse HTML bytes/str into a tree rooted at a synthetic #root node."""
    html = decode_bytes(payload) if isinstance(payload, bytes) else payload
    root = Node("#root")
    stack: list[Node] = [root]
    open_names: list[str] = ["#root"]

    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            s = tok[1]
            if s:
                stack[-1].children.append(s)
        elif kind == "open":
            _, name, attrs, selfclose = tok
            # implied closes
            if name in _SAME_TAG_AUTOCLOSE and open_names[-1] == name:
                stack.pop()
                open_names.pop()
            elif name in BLOCK_TAGS and open_names[-1] == "p":
                stack.pop()
                open_names.pop()
            node = Node(name, attrs)
            stack[-1].children.append(node)
            if not selfclose:
                stack.append(node)
                open_names.append(name)
        else:  # close
            name = tok[1]
            if name in open_names[1:]:
                # pop to and including the matching element
                while open_names[-1] != name:
                    stack.pop()
                    open_names.pop()
                stack.pop()
                open_names.pop()
            # else: stray close tag — ignored (browser behavior)
    return root
