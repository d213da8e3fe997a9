"""Block segmentation + text-density / link-density boilerplate
classification, re-derived from the published densitometric approach
(Kohlschuetter, Fankhauser, Nejdl: "Boilerplate Detection using Shallow Text
Features", WSDM 2010 — the Boilerpipe paper) and the Arc90 readability
heuristics. No code is ported from any implementation; the decision rules
below are the paper's published `NumWordsRulesClassifier` decision tree plus
structural hard rules (nav/header/footer/aside subtrees are boilerplate).

Pipeline (pure, deterministic, per document):

  DOM tree -> linear block sequence -> per-block shallow features
  (word count, link density, text density, heading flag, boiler-ancestor
  flag) -> classify -> assemble main text.

Determinism contract (the BASELINE.json per-row invariant): same bytes in,
byte-identical text out, independent of Arrow batch boundaries or partition
assignment — guaranteed because nothing here reads cross-document state.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from no_ocr_spark.extract.dom import BLOCK_TAGS, Node, parse
from html import unescape

# Subtrees that are structurally boilerplate regardless of their text.
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "menu"})
# Subtrees that carry no page text at all.
_DROP_TAGS = frozenset({"head", "select", "option", "button", "object",
                        "figure", "svg", "math", "map", "datalist"})
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Boilerpipe wraps text at 80 columns to estimate line counts for density.
_WRAP_COLS = 80


@dataclass
class Block:
    """One visually-contiguous text block with shallow features."""

    text: str = ""
    n_words: int = 0
    n_chars: int = 0
    anchor_chars: int = 0
    is_boiler_ancestor: bool = False
    is_heading: bool = False
    tag: str = ""
    is_content: bool = False  # set by classify()

    @property
    def link_density(self) -> float:
        return self.anchor_chars / self.n_chars if self.n_chars else 0.0

    @property
    def text_density(self) -> float:
        # words per wrapped line, the Boilerpipe text-density measure
        lines = max(1, math.ceil(self.n_chars / _WRAP_COLS))
        return self.n_words / lines


@dataclass
class _WalkState:
    blocks: list[Block] = field(default_factory=list)
    parts: list[str] = field(default_factory=list)
    anchor_chars: int = 0
    anchor_depth: int = 0
    boiler_depth: int = 0
    cur_tag: str = ""


def _flush(st: _WalkState) -> None:
    if not st.parts:
        # fast path (r6): most block boundaries carry no pending text;
        # the full path's join/split/Block dance is pure overhead there.
        # anchor_chars still resets, exactly like the slow path.
        st.anchor_chars = 0
        return
    raw = "".join(st.parts)
    if "&" in raw:  # entity decode only when entities can exist
        raw = unescape(raw)
    text = " ".join(raw.split())
    st.parts.clear()
    anchor = st.anchor_chars
    st.anchor_chars = 0
    if not text:
        return
    st.blocks.append(
        Block(
            text=text,
            n_words=len(text.split()),
            n_chars=len(text),
            anchor_chars=min(anchor, len(text)),
            is_boiler_ancestor=st.boiler_depth > 0,
            is_heading=st.cur_tag in _HEADING_TAGS,
            tag=st.cur_tag,
        )
    )


def segment(root: Node) -> list[Block]:
    """DFS the tree; block-level tags delimit blocks; inline text accretes."""
    st = _WalkState()

    def walk(node: Node) -> None:
        for child in node.children:
            if isinstance(child, str):
                if st.parts or child.strip():
                    st.parts.append(child)
                    if st.anchor_depth > 0:
                        st.anchor_chars += len(" ".join(child.split()))
                continue
            name = child.name
            if name in _DROP_TAGS:
                continue
            if name in BLOCK_TAGS:
                _flush(st)
                boiler = name in _BOILER_TAGS
                prev_tag = st.cur_tag
                st.cur_tag = name
                if boiler:
                    st.boiler_depth += 1
                walk(child)
                _flush(st)
                if boiler:
                    st.boiler_depth -= 1
                st.cur_tag = prev_tag
            elif name == "a":
                st.anchor_depth += 1
                walk(child)
                st.anchor_depth -= 1
            else:
                walk(child)

    walk(root)
    _flush(st)
    return st.blocks


def segment_tokens(html: str) -> list[Block]:
    """Single-pass fusion of dom.parse + segment (r6, guide §1.2: the
    extraction hot path built a full Node tree and then walked it; this
    replays BOTH sets of rules directly over the token stream — same
    implied-close/stray-close stack behavior as dom.parse, same
    enter/exit flush, drop-subtree, boiler-depth, cur-tag and
    anchor-depth bookkeeping as segment's DFS — without allocating the
    tree). Equivalence is pinned three ways: segment(parse(x)) ==
    segment_tokens(x) property test, the byte-identity goldens, and the
    extractor fuzz suite. dom.parse stays for consumers that need the
    tree (WAT titles, anchor pairs)."""
    from no_ocr_spark.extract.dom import BLOCK_TAGS, _SAME_TAG_AUTOCLOSE
    from no_ocr_spark.extract.html_tokenizer import (VOID_ELEMENTS,
                                                     tokenize)

    st = _WalkState()
    open_names: list[str] = ["#root"]
    # per-entry walk bookkeeping: (fired_block, boiler, anchor, dropped,
    # prev_tag) — what to undo when the entry pops (by explicit close,
    # implied close, stray-close unwind, or EOF)
    meta: list[tuple[bool, bool, bool, bool, str]] = [
        (False, False, False, False, "")]

    def pop_one() -> None:
        open_names.pop()
        fired_block, boiler, anchor, _, prev_tag = meta.pop()
        if fired_block:
            _flush(st)
            if boiler:
                st.boiler_depth -= 1
            st.cur_tag = prev_tag
        elif anchor:
            st.anchor_depth -= 1

    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            if meta[-1][3]:  # inside a dropped subtree
                continue
            s = tok[1]
            if s and (st.parts or s.strip()):
                st.parts.append(s)
                if st.anchor_depth > 0:
                    st.anchor_chars += len(" ".join(s.split()))
        elif kind == "open":
            _, name, _attrs, selfclose = tok
            # dom.parse's implied closes fire regardless of visibility
            if name in _SAME_TAG_AUTOCLOSE and open_names[-1] == name:
                pop_one()
            elif name in BLOCK_TAGS and open_names[-1] == "p":
                pop_one()
            parent_dropped = meta[-1][3]
            # segment's walk visits a child iff its parent is visible and
            # it is not a drop tag; drop tags hide their whole subtree
            visited = not parent_dropped and name not in _DROP_TAGS
            dropped = parent_dropped or name in _DROP_TAGS
            fired_block = False
            boiler = False
            anchor = False
            prev_tag = st.cur_tag
            if visited:
                if name in BLOCK_TAGS:
                    _flush(st)
                    fired_block = True
                    boiler = name in _BOILER_TAGS
                    st.cur_tag = name
                    if boiler:
                        st.boiler_depth += 1
                elif name == "a":
                    anchor = True
                    st.anchor_depth += 1
            if selfclose or name in VOID_ELEMENTS:
                # childless node: the walk enters and leaves immediately
                if fired_block:
                    _flush(st)
                    if boiler:
                        st.boiler_depth -= 1
                    st.cur_tag = prev_tag
                elif anchor:
                    st.anchor_depth -= 1
            else:
                open_names.append(name)
                meta.append((fired_block, boiler, anchor, dropped,
                             prev_tag))
        else:  # close
            name = tok[1]
            if name in open_names[1:]:
                while open_names[-1] != name:
                    pop_one()
                pop_one()
    while len(open_names) > 1:  # unwind elements left open at EOF
        pop_one()
    _flush(st)
    return st.blocks


def classify(blocks: list[Block]) -> list[Block]:
    """Mark each block content/boilerplate.

    Core rule set = the published NumWordsRulesClassifier decision tree
    (curr/prev/next word counts + link densities), preceded by structural
    hard rules and followed by the heading-promotion pass (a heading
    immediately preceding a content block is content — Arc90-style).
    """
    n = len(blocks)
    for i, b in enumerate(blocks):
        prev_b = blocks[i - 1] if i > 0 else None
        next_b = blocks[i + 1] if i + 1 < n else None
        if b.is_boiler_ancestor:
            b.is_content = False
            continue
        b.is_content = _num_words_rules(
            curr_words=b.n_words,
            curr_ld=b.link_density,
            prev_words=prev_b.n_words if prev_b else 0,
            prev_ld=prev_b.link_density if prev_b else 0.0,
            next_words=next_b.n_words if next_b else 0,
        )
    # heading promotion: a short heading right before content is content
    for i in range(n - 1):
        b = blocks[i]
        if (
            b.is_heading
            and not b.is_content
            and not b.is_boiler_ancestor
            and b.link_density <= 0.333333
            and blocks[i + 1].is_content
        ):
            b.is_content = True
    return blocks


def _num_words_rules(
    curr_words: int,
    curr_ld: float,
    prev_words: int,
    prev_ld: float,
    next_words: int,
) -> bool:
    """The WSDM-2010 paper's trained decision tree over shallow features."""
    if curr_ld > 0.333333:
        return False
    if prev_ld <= 0.555556:
        if curr_words <= 16:
            if next_words <= 15:
                return prev_words > 4
            return True
        return True
    if curr_words <= 40:
        return next_words > 17
    return True


def extract_main_text(payload: "bytes | str") -> tuple[str, list[Block]]:
    """bytes/str -> (main text, all blocks with classification).

    Main text = content blocks joined by a blank line. The join rule and the
    per-block whitespace normalization (collapse runs to single spaces) ARE
    the byte-identity contract — do not change without regenerating goldens.
    """
    from no_ocr_spark.extract.html_tokenizer import decode_bytes

    html = decode_bytes(payload) if isinstance(payload, bytes) else payload
    # fused token->block pass (segment_tokens docstring); identical block
    # list to classify(segment(parse(payload))) by construction and test
    blocks = classify(segment_tokens(html))
    text = "\n\n".join(b.text for b in blocks if b.is_content)
    return text, blocks
