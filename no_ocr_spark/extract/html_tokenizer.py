"""Byte-stream HTML tokenizer, written from scratch.

Turns raw page bytes into a flat token stream:

    ("text", s)                      — character data (entities NOT yet decoded)
    ("open", name, attrs, selfclose) — start tag; attrs is a dict[str, str]
    ("close", name)                  — end tag

Comments, doctypes, processing instructions, and CDATA are consumed and
dropped. Raw-text elements (script/style/...) have their content swallowed —
it is never page text. The tokenizer is a single forward scan over the
decoded string: O(n), no backtracking, fully deterministic.

Reference role analogue: the per-page text extraction entry point
(`no-ocr-api/np_ocr/data.py:20-23`) — there pypdf does the tokenizing; here
the HTML branch is re-derived from the HTML5 lexing rules (public spec),
simplified to the subset that matters for main-content extraction.
"""

from __future__ import annotations

import re
from typing import Iterator, Union

Token = Union[
    tuple[str, str],                     # ("text", s) / ("close", name)
    tuple[str, str, dict[str, str], bool]  # ("open", name, attrs, selfclose)
]

# Elements whose content is raw text (not markup) per the HTML5 spec; we
# swallow it — none of it is extractable page content.
RAWTEXT_ELEMENTS = frozenset(
    {"script", "style", "noscript", "template", "textarea", "xmp", "iframe"}
)

# Void elements: never pushed on the open-element stack.
VOID_ELEMENTS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

_TAG_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:_-]*")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)      # attr name
        (?:\s*=\s*
           (?:"([^"]*)"|'([^']*)'|([^\s"'=<>`]+))
        )?""",
    re.VERBOSE,
)


def decode_bytes(payload: bytes) -> str:
    """Deterministic byte -> str decode: UTF-8 with replacement.

    Charset sniffing is intentionally NOT done (a <meta charset> dependent
    decode would make extraction output depend on parse order); Common-Crawl
    style corpora are normalized to UTF-8 upstream, and replacement makes the
    function total over arbitrary bytes.
    """
    return payload.decode("utf-8", errors="replace")


def _find_tag_end(s: str, start: int) -> int:
    """Index of the '>' terminating a start tag at *start* ('<' position),
    respecting quoted attribute values (so '>' inside quotes is skipped).
    Returns -1 if the tag never closes (truncated page).
    """
    # fast path: no quoted attribute values before the first '>' (ranged
    # find instead of slicing — no per-tag allocation)
    gt = s.find(">", start)
    if gt == -1:
        return -1
    if s.find('"', start, gt) == -1 and s.find("'", start, gt) == -1:
        return gt
    # slow path: scan with quote state
    i = start
    n = len(s)
    quote = ""
    while i < n:
        c = s[i]
        if quote:
            if c == quote:
                quote = ""
        elif c in ('"', "'"):
            quote = c
        elif c == ">":
            return i
        i += 1
    return -1


def _parse_attrs(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        if name not in attrs:  # first wins, like browsers
            attrs[name] = m.group(2) or m.group(3) or m.group(4) or ""
    return attrs


def tokenize(html: str) -> "list[Token]":
    """Single-pass tokenizer over decoded HTML text.

    Returns the token LIST (r6: the generator protocol cost one frame
    switch per token — ~180 tokens/page — and this is the extraction hot
    loop; every consumer just iterates, and a list iterates faster).
    Token stream is unchanged."""
    i = 0
    n = len(html)
    low = None  # html.lower(), computed lazily ONCE (rawtext close search)
    out: list[Token] = []
    emit = out.append
    find = html.find
    while i < n:
        lt = find("<", i)
        if lt == -1:
            if i < n:
                emit(("text", html[i:]))
            return out
        if lt > i:
            emit(("text", html[i:lt]))
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt == "!":
            if html.startswith("<!--", lt):  # comment
                end = find("-->", lt + 4)
                i = n if end == -1 else end + 3
            else:  # doctype / CDATA / markup declaration
                end = find(">", lt)
                i = n if end == -1 else end + 1
            continue
        if nxt == "?":  # processing instruction
            end = find(">", lt)
            i = n if end == -1 else end + 1
            continue
        if nxt == "/":  # end tag
            end = find(">", lt + 2)
            if end == -1:
                return out
            m = _TAG_NAME_RE.match(html, lt + 2)
            if m:
                emit(("close", m.group(0).lower()))
            i = end + 1
            continue
        # start tag
        m = _TAG_NAME_RE.match(html, lt + 1)
        if not m:
            # bare '<' that opens nothing: literal text, like browsers
            emit(("text", "<"))
            i = lt + 1
            continue
        name = m.group(0).lower()
        end = _find_tag_end(html, m.end())
        if end == -1:
            return out
        raw_attrs = html[m.end():end]
        stripped = raw_attrs.rstrip()
        selfclose = False
        if stripped.endswith("/"):
            # HTML5: a trailing '/' is the self-closing flag only when it is
            # NOT part of an unquoted attribute value — i.e. it directly
            # follows the tag name, a quote, or whitespace. In
            # <a href=http://x/> the slash belongs to the value.
            prev = stripped[-2:-1]
            if prev in ("", '"', "'") or prev.isspace():
                selfclose = True
                raw_attrs = stripped[:-1]
        attrs = _parse_attrs(raw_attrs) if raw_attrs.strip() else {}
        i = end + 1
        if name in RAWTEXT_ELEMENTS and not selfclose:
            # swallow raw content up to the matching close tag
            if low is None:
                low = html.lower()
            close_at = _find_rawtext_close(html, low, i, name)
            if close_at == -1:
                # truncated page: element runs to EOF; swallow the rest
                emit(("open", name, attrs, False))
                emit(("close", name))
                return out
            content_end, next_i = close_at
            emit(("open", name, attrs, False))
            emit(("close", name))
            i = next_i
            continue
        emit(("open", name, attrs, selfclose or name in VOID_ELEMENTS))
    return out


def _find_rawtext_close(html: str, low: str, start: int,
                        name: str) -> "tuple[int, int] | int":
    """Find `</name` (case-insensitive) from *start*; return
    (content_end, index_after_close_tag_gt) or -1. *low* is html.lower(),
    computed once per document by the caller (lowering per rawtext element
    was O(n) per <script>/<style> tag — quadratic on script-heavy pages)."""
    needle = "</" + name
    j = low.find(needle, start)
    while j != -1:
        after = j + len(needle)
        if after >= len(html) or html[after] in (">", " ", "\t", "\n", "\r", "/"):
            gt = html.find(">", after)
            if gt == -1:
                return (j, len(html))
            return (j, gt + 1)
        j = low.find(needle, j + 1)
    return -1
