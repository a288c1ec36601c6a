"""FROZEN copy of the K1 extraction spec (SURVEY.md §5 layer 1).

This file is the operational definition of "reference-extracted
text" for the byte-identity contract (BASELINE.json:15): the empty
reference mount (SURVEY.md §0) means the spec itself is the oracle.
Do NOT refactor together with kg/extract.py — tests/test_extract.py
pins this file by hash; an intentional spec change must update the
pin in the same commit.
"""

from __future__ import annotations

from html.parser import HTMLParser

SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
BLOCK_TAGS = frozenset(
    {
        "html", "head", "body", "title", "p", "div", "br", "hr",
        "ul", "ol", "li", "table", "tr", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "section", "article", "header", "footer", "nav", "aside",
        "blockquote", "pre", "figure", "figcaption", "main",
    }
)


class _FrozenExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._buf: list[str] = []
        self._blocks: list[str] = []

    def _flush(self) -> None:
        if self._buf:
            block = " ".join("".join(self._buf).split())
            self._buf = []
            if block:
                self._blocks.append(block)

    def handle_starttag(self, tag, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
        elif tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag) -> None:
        if tag in SKIP_TAGS:
            if self._skip > 0:
                self._skip -= 1
        elif tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data) -> None:
        if self._skip == 0:
            self._buf.append(data)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._blocks)


def extract_text_frozen(html: bytes | str) -> str:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _FrozenExtractor()
    p.feed(html)
    p.close()
    return p.result()
