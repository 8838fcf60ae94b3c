"""HTML -> text extraction (the pipeline's first stateful stage).

Analogue of the reference's UMI extractor — a pure deterministic
per-record parse (/root/reference/src/bamutil.cpp:23-112).  The
north-rule invariant is *byte-identical extracted text per url* versus
the corpus ground truth, so the whole policy is pinned here:

  1. parse with html.parser (stdlib, convert_charrefs=True so
     entities/charrefs are decoded exactly once);
  2. drop everything inside <script> <style> <head> <nav> <header>
     <footer> <aside> <template> and comments;
  3. block-level tags open/close paragraph boundaries;
  4. within a paragraph, whitespace runs collapse to one space and
     edges are stripped;
  5. empty paragraphs are dropped; paragraphs join with "\n\n".

Run as an actor-pool ``map_batches`` stage: the parser class +
compiled regex are per-actor state (ST1 analogue — reference genome
singleton, /root/reference/src/reference.cpp:4-11).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

_WS_RUN = re.compile(r"\s+")

_SKIP_SUBTREE = frozenset(
    {"script", "style", "head", "nav", "header", "footer", "aside", "template"}
)
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
        "table", "tr", "td", "th", "blockquote", "pre", "section", "article",
        "main", "body", "title", "hr", "figure", "figcaption", "dl", "dt", "dd",
    }
)
_VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []       # current paragraph fragments
        self._paragraphs: list[str] = []

    def _flush(self) -> None:
        if self._parts:
            para = _WS_RUN.sub(" ", "".join(self._parts)).strip()
            if para:
                self._paragraphs.append(para)
            self._parts = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREE:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS and tag not in _VOID_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._parts.append(data)

    def result(self) -> str:
        self._flush()
        return "\n\n".join(self._paragraphs)


def extract_text(html: str | bytes) -> str:
    """Deterministic HTML -> text. Pure function; safe to call anywhere."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.result()


class ExtractStage:
    """Actor-pool map_batches stage: pages(html) -> pages(+text).

    Usage::

        pages.map_batches(ExtractStage, batch_format="pyarrow",
                          batch_size=256, concurrency=(2, 8))

    html is a wide binary column — keep batch_size small and project
    html away immediately after this stage (SURVEY §7 hard part (e)).
    """

    def __init__(self, html_col: str = "html", text_col: str = "text"):
        self.html_col = html_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        texts = [extract_text(h) for h in htmls]
        arr = pa.array(texts, type=pa.large_string())
        if self.text_col in batch.column_names:
            batch = batch.drop_columns([self.text_col])
        return batch.append_column(self.text_col, arr)
