"""P1 — conditional HTML→text with Slack-link anchor rules.

Reference: `Producer/kafkaProducer.js:131-159` — html-to-text with
wordwrap:230, preserveNewlines, and a custom <a> formatter:
  * if the parent element's text starts with "by " (case-insens.)  → bare text
  * if the anchor text looks like an author name
    (`/^[A-Z][a-z]+(?:\\s+[A-Z][a-z]+){1,3}$/`)                    → bare text
  * otherwise                                                      → `<href|*text*>`
    (text falls back to 'Link' when empty)

This is the one email-path operator that genuinely needs Python (an HTML
parser). Implemented with stdlib html.parser inside an Arrow-batched
pandas UDF — the engine's sanctioned slow path. The surrounding gate
(only bodies containing '<html'/'<body' enter the UDF,
kafkaProducer.js:131) stays a native `when()`, so at 100 TB the UDF only
sees the HTML fraction of rows.

Fidelity note: the reference's exact output depends on the html-to-text
npm package's block/spacing model; we reproduce the documented options
(wordwrap 230, newline preservation) and the anchor rules exactly, and
treat other whitespace details as implementation-defined. The downstream
clean chain (P2-P16) normalizes most of the difference away.
"""

from __future__ import annotations

import re
import textwrap
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

AUTHOR_NAME_RE = re.compile(r"^[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,3}$")  # :150
BY_PREFIX_RE = re.compile(r"^by\s+", re.IGNORECASE)  # :145
WORDWRAP = 230  # :134

_BLOCK_TAGS = {
    "p", "div", "br", "tr", "table", "ul", "ol", "li",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "footer", "section",
}
_SKIP_TAGS = {"script", "style", "head", "title"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self._skip_depth = 0
        self._anchor_stack: list[dict] = []
        self._parent_first_text: list[str] = [""]  # first text seen per element

    # -- element tracking --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self.out.append("\n")
        if tag == "a":
            self._anchor_stack.append(
                {"href": dict(attrs).get("href", ""), "text": [],
                 "parent_text": self._parent_first_text[-1]}
            )
        self._parent_first_text.append("")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._parent_first_text:
            self._parent_first_text.pop()
        if tag == "a" and self._anchor_stack:
            a = self._anchor_stack.pop()
            text = "".join(a["text"])
            self.out.append(_format_anchor(text, a["href"], a["parent_text"]))
        if tag in _BLOCK_TAGS:
            self.out.append("\n")

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._parent_first_text and not self._parent_first_text[-1]:
            self._parent_first_text[-1] = data
        if self._anchor_stack:
            self._anchor_stack[-1]["text"].append(data)
        else:
            self.out.append(data)


def _format_anchor(text: str, href: str, parent_text: str) -> str:
    """The reference's custom <a> formatter (kafkaProducer.js:139-154)."""
    if BY_PREFIX_RE.search(parent_text or ""):
        return text
    if AUTHOR_NAME_RE.match(text.strip()):
        return text
    return f"<{href}|*{text or 'Link'}*>"


def html_to_text_py(html: str) -> str:
    """Pure-Python P1 (usable in tests and in the pandas UDF)."""
    if html is None:
        return None
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:  # noqa: BLE001 — parser errors → raw text passthrough
        return html
    raw = "".join(parser.out)
    # collapse intra-line whitespace, preserve newlines, wrap at 230
    lines = []
    for line in raw.split("\n"):
        line = re.sub(r"[ \t]+", " ", line).strip()
        if len(line) > WORDWRAP:
            lines.extend(textwrap.wrap(line, WORDWRAP) or [""])
        else:
            lines.append(line)
    text = "\n".join(lines)
    return re.sub(r"\n{3,}", "\n\n", text).strip()


_UDF_CACHE: dict = {}


def html_to_text_udf(body: Column) -> Column:
    """Arrow-batched P1 UDF (built lazily: pandas_udf with a DDL-string
    return type needs an active SparkSession, so module import must not
    create it)."""
    if "udf" not in _UDF_CACHE:

        @F.pandas_udf("string")
        def _udf(bodies: pd.Series) -> pd.Series:
            return bodies.map(html_to_text_py)

        _UDF_CACHE["udf"] = _udf
    return _UDF_CACHE["udf"](body)


def maybe_html_to_text(body: Column) -> Column:
    """The gated P1: only bodies containing '<html'/'<body' pay the UDF
    cost (kafkaProducer.js:131)."""
    from .textclean import is_html

    return F.when(is_html(body), html_to_text_udf(body)).otherwise(body)
