"""Main-content extraction from raw HTML (boilerplate strip), stdlib-only.

The reference cleans *images* before OCR (flat-field correction, grayscale —
/root/reference/StudiOCR/OcrEngine.py:60-85); the web-page analogue mandated by
the north rule is readability-style main-content extraction: drop chrome
(nav/header/footer/ads/link farms) and keep the article text.  No lxml/bs4 in
the sandbox (SURVEY.md §0), so this builds a lightweight DOM — a single-pass
regex scanner (``parse_html``), cross-checked node-for-node against a stdlib
``html.parser.HTMLParser`` builder (``parse_html_stdlib``) — and scores block
elements by **text density vs link density**, the classic
readability/boilerpipe heuristic.

Semantics (shared verbatim by the single-process oracle and the distributed
pipeline — byte-identity by construction, verified by golden tests):

* ``<script>/<style>/<noscript>/<template>`` subtrees and comments are dropped.
* For every element we compute ``text_len`` (total character count of text
  nodes beneath it, whitespace-normalized) and ``link_len`` (portion of that
  beneath ``<a>`` tags).
* A *block candidate* (``p li td h1..h6 blockquote pre div section article``)
  contributes its **direct text** (text nodes that are immediate children, or
  children of inline descendants) iff its link density ``link_len/text_len``
  is ≤ 0.33 and its direct text has ≥ ``min_text_len`` characters.
* Contributions are concatenated in document order; each contribution's text
  is whitespace-normalized (``" ".join(raw.split())``).
* Embedded raster payloads — ``<img src="data:image/x-rstr;base64,...">``,
  the stand-in for the reference's image/PDF page inputs
  (/root/reference/StudiOCR/EditDocWindow.py:467 allows .jpg/.jpeg/.png/.pdf)
  — are collected in document order and base64-decoded.
* ``boilerplate_ratio`` = 1 - main_chars/total_chars over the whole page.
"""

from __future__ import annotations

import base64
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_DROP_TAGS = {"script", "style", "noscript", "template"}
_BLOCK_TAGS = {
    "p", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "div", "section", "article", "main",
}
# Inline tags whose text still counts as the enclosing block's direct text.
_INLINE_TAGS = {
    "a", "b", "i", "em", "strong", "span", "u", "s", "small", "sup", "sub",
    "code", "abbr", "mark", "q", "time", "cite",
}
_VOID_TAGS = {
    "img", "br", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
}

RASTER_DATA_URI_PREFIX = "data:image/x-rstr;base64,"

MAX_LINK_DENSITY = 0.33
MIN_TEXT_LEN = 25


_EMPTY_ATTRS: dict = {}  # shared read-only default; never mutated after parse


class _Node:
    """Lightweight DOM node; ``tag == ""`` marks a text node."""

    __slots__ = ("tag", "text", "attrs", "children")

    def __init__(self, tag: str, text: str = "", attrs: dict | None = None):
        self.tag = tag
        self.text = text
        self.attrs = _EMPTY_ATTRS if attrs is None else attrs
        self.children: list = []


class _DomBuilder(HTMLParser):
    """Builds a lightweight DOM tree, tolerant of unclosed tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs=dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, attrs=dict(attrs)))

    def handle_endtag(self, tag):
        # close the innermost matching open tag, tolerating mis-nesting
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(_Node("", text=data))


def parse_html_stdlib(html: bytes | str) -> _Node:
    """Reference DOM builder on stdlib ``html.parser`` — kept as the
    cross-check oracle for the fast scanner (see test_fast_parser_parity)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


# Fast regex scanner: one pass over the document; text nodes are the spans
# between tag matches. ~4× faster than HTMLParser (which regex-matches
# per-character states and unconditionally parses attributes); attributes are
# parsed lazily and only for <img> (the single tag whose attrs extraction
# reads). Raw-text elements (script/style/...) skip straight to their end tag.
_TAG_RE = re.compile(
    r"<!--.*?(?:-->|$)"                  # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"        # cdata
    r"|<![^>]*>"                         # doctype / declarations
    r"|<\?[^>]*>"                        # processing instruction
    r"|</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>"  # 1: end tag
    r"|<([a-zA-Z][a-zA-Z0-9-]*)"            # 2: start tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",  # 3: attr blob (quote-aware)
    re.S,
)
_SRC_RE = re.compile(r"""\bsrc\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
# Raw-text elements exactly as stdlib html.parser's CDATA_CONTENT_ELEMENTS —
# keeping the set identical keeps the two parsers' DOMs identical.
_RAWTEXT_END = {t: re.compile(f"</\\s*{t}", re.I) for t in ("script", "style")}


def parse_html(html: bytes | str) -> _Node:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    root = _Node("#root")
    stack = [root]
    pos = 0
    n = len(html)
    unescape = _unescape
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            text = html[pos:]
            if text:
                stack[-1].children.append(
                    _Node("", text=unescape(text) if "&" in text else text)
                )
            break
        if m.start() > pos:
            text = html[pos:m.start()]
            stack[-1].children.append(
                _Node("", text=unescape(text) if "&" in text else text)
            )
        pos = m.end()
        end_name, start_name, attr_blob = m.group(1), m.group(2), m.group(3)
        if start_name is not None:
            tag = start_name.lower()
            attrs = None
            if tag == "img" and attr_blob:
                sm = _SRC_RE.search(attr_blob)
                if sm:
                    attrs = {"src": sm.group(2) or sm.group(3) or sm.group(4) or ""}
            node = _Node(tag, attrs=attrs)
            stack[-1].children.append(node)
            self_closing = attr_blob.rstrip().endswith("/") if attr_blob else False
            if tag in _RAWTEXT_END and not self_closing:
                em = _RAWTEXT_END[tag].search(html, pos)
                raw_end = em.start() if em else n
                raw = html[pos:raw_end]
                if raw:
                    node.children.append(_Node("", text=raw))
                gt = html.find(">", raw_end)
                pos = (gt + 1) if gt != -1 else n
            elif tag not in _VOID_TAGS and not self_closing:
                stack.append(node)
        elif end_name is not None:
            tag = end_name.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
        # comments / doctype / PI: skipped
    return root


def _unescape(s: str) -> str:
    from html import unescape

    return unescape(s)


@dataclass
class ExtractedPageContent:
    main_text: str
    raster_payloads: list[bytes]
    total_chars: int
    main_chars: int

    @property
    def boilerplate_ratio(self) -> float:
        if self.total_chars == 0:
            return 0.0
        return 1.0 - (self.main_chars / self.total_chars)


def _norm(s: str) -> str:
    return " ".join(s.split())


def _text_stats(node: _Node) -> tuple[int, int]:
    """(text_len, link_len) of whitespace-normalized text beneath node."""
    if node.tag == "":
        return len(_norm(node.text)), 0
    if node.tag in _DROP_TAGS:
        return 0, 0
    t = l = 0
    for c in node.children:
        ct, cl = _text_stats(c)
        t += ct
        l += cl
    if node.tag == "a":
        l = t
    return t, l


def _direct_text(node: _Node) -> str:
    """Text of immediate text-node children plus inline descendants."""
    parts: list[str] = []

    def rec(n: _Node, top: bool) -> None:
        for c in n.children:
            if c.tag == "":
                parts.append(c.text)
            elif c.tag in _INLINE_TAGS:
                rec(c, False)
            # nested block tags contribute via their own candidacy, not here

    rec(node, True)
    return _norm(" ".join(parts))


def extract_content(html: bytes | str) -> ExtractedPageContent:
    """Readability-style extraction: returns main text, embedded raster
    payloads (document order) and boilerplate accounting."""
    root = parse_html(html)

    contributions: list[str] = []
    payloads: list[bytes] = []

    def walk(node: _Node) -> None:
        if node.tag in _DROP_TAGS:
            return
        if node.tag == "img":
            src = node.attrs.get("src") or ""
            if src.startswith(RASTER_DATA_URI_PREFIX):
                payloads.append(
                    base64.b64decode(src[len(RASTER_DATA_URI_PREFIX):])
                )
            return
        if node.tag in _BLOCK_TAGS:
            direct = _direct_text(node)
            if len(direct) >= MIN_TEXT_LEN:
                t, l = _text_stats(node)
                density = (l / t) if t else 1.0
                if density <= MAX_LINK_DENSITY:
                    contributions.append(direct)
        for c in node.children:
            walk(c)

    walk(root)

    main_text = " ".join(contributions)
    total_chars, _ = _text_stats(root)
    return ExtractedPageContent(
        main_text=main_text,
        raster_payloads=payloads,
        total_chars=total_chars,
        main_chars=len(main_text),
    )


# ---------------------------------------------------------------------------
# Synthetic layout: turn main-content words into OCR-shaped token arrays so the
# HTML path and the raster path share one downstream representation (the
# parallel-array page shape of /root/reference/StudiOCR/OcrEngine.py:88-89).
# ---------------------------------------------------------------------------

_CHAR_W = 8
_LINE_H = 20
_TOK_H = 16
_MAX_W = 960


def layout_tokens(text: str) -> dict[str, list]:
    """Deterministic word layout: monospace flow layout, wrap at _MAX_W.

    conf is a deterministic function of the token so confidence-bucket
    semantics (/root/reference/StudiOCR/DocWindow.py:221-227) are exercised.
    """
    toks = text.split()
    lens = [len(t) for t in toks]  # split() tokens are never empty
    widths = [l * _CHAR_W for l in lens]
    left: list[int] = []
    top: list[int] = []
    la, ta = left.append, top.append
    x = y = 0
    for w in widths:
        if x + w > _MAX_W and x > 0:
            x = 0
            y += _LINE_H
        la(x)
        ta(y)
        x += w + _CHAR_W
    return {
        "left": left,
        "top": top,
        "width": widths,
        "height": [_TOK_H] * len(toks),
        "conf": [88 + (l % 12) for l in lens],
        "text": toks,
    }
