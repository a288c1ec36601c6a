"""K1 — HTML -> text extraction (SURVEY.md §2.B K1).

Contract (BASELINE.json:15): extracted ``text`` must be
**byte-identical per url** versus the reference. The reference mount
is empty (SURVEY.md §0), so the operational definition of "reference
text" is this frozen extraction spec, duplicated verbatim in
``tests/oracle/extract_frozen.py`` and pinned by hash in
``tests/test_extract.py``. The spec:

  * parse with stdlib ``html.parser`` (charrefs decoded),
  * drop all content inside <script>/<style>/<noscript>/<template>,
  * comments ignored,
  * block-level tags flush the current inline buffer as one block,
  * inline whitespace runs collapse to a single space, blocks are
    stripped, empty blocks dropped,
  * output = blocks joined by "\\n".

Pure Python stdlib only (no lxml/bs4 in env), so the byte-identity is
stable across pandas/pyarrow versions.

The distributed operator is a vectorized Arrow UDF
(``mapInPandas``-free scalar pandas_udf): binary html in, string text
out, one Python<->JVM crossing, no per-row Python at the Spark level
(the per-row loop lives inside the Arrow batch, which is the standard
shape for opaque-binary kernels).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

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


class _TextExtractor(HTMLParser):
    """Streaming block-structured text extractor (frozen spec)."""

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

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
        elif tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            if self._skip > 0:
                self._skip -= 1
        elif tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip == 0:
            self._buf.append(data)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._blocks)


def extract_text(html: bytes | str) -> str:
    """Frozen pure function: html bytes -> extracted text (K1 kernel)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return parser.result()


@pandas_udf(StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    # Arrow batch in, Arrow batch out; the loop is per-batch Python,
    # which is the vectorized-UDF contract for opaque binary kernels.
    return html.map(extract_text)


def html_to_text(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """K1 operator: pages(url, warc_ts, html, lang, ...) -> text_extracted.

    Drops ``html`` immediately after extraction so the (large) binary
    column never crosses another stage boundary — Arrow UDFs are
    column-pruning barriers, so the projection is explicit
    (SURVEY.md §4 "Arrow UDFs are pruning barriers").
    """
    keep = [c for c in pages.columns if c not in ("html", text_col)]
    return pages.select(*keep, _extract_text_udf(F.col("html")).alias(text_col))
