"""Main-content extraction — block-level link-density boilerplate filtering.

The reference's HTML→text pass (``/root/reference/mainReport.go:109-110``,
html2text **[dep-inferred]**) flattens the ENTIRE page — navigation, footers,
cookie banners and all. A web-text training pipeline wants the article body
only; the standard shallow-text-feature approach (Kohlschütter et al.,
"Boilerplate detection using shallow text features", WSDM 2010; Pomikálek,
jusText, 2011) scores block-level text segments by length and link density
and drops the link-heavy short blocks that are almost always chrome.

Pinned extraction spec (deterministic; the value oracle and tests encode it):

* The page is segmented at BLOCK-level tags (``p div section article header
  footer nav aside main form table tr td th li ul ol h1..h6 blockquote pre
  br hr``) — both their starts and ends close the current segment.
* ``script``/``style``/``noscript``/``template``/``title`` subtrees
  contribute nothing, and neither does anything inside ``<head>`` — head
  mode ends at ``</head>`` or at the first ``<body>`` start tag (the
  guard against unclosed heads on malformed markup), so a page title can
  never prepend itself to ``main_text`` (ADVICE r3).
* Within a segment, each text run is whitespace-collapsed
  (``" ".join(split())``); the segment text is the space-join of its
  non-empty runs; ``chars = len(text)``; ``anchor_chars`` = Σ collapsed run
  lengths for runs inside ``<a>`` (nesting-depth tracked).
* A segment is KEPT iff ``chars ≥ min_chars`` AND
  ``anchor_chars · ld_den ≤ chars · ld_num`` (link density ≤ ld_num/ld_den,
  default ≤ 1/3 — integer cross-multiplication, no float drift).
* ``main_text`` = ``"\\n"``-join of kept segments in document order.

Scale shape: pure ``map_batches`` (zero shuffle, stateless tasks); one
stdlib-HTMLParser pass per page, no DOM built.
"""
from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

BLOCK_TAGS = frozenset((
    "p", "div", "section", "article", "header", "footer", "nav", "aside",
    "main", "form", "table", "tr", "td", "th", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "br", "hr",
    "body", "html",
))
SKIP_TAGS = frozenset(("script", "style", "noscript", "template", "title"))


class _BlockParser(HTMLParser):
    """Segment a page into (text, chars, anchor_chars) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._runs: list[str] = []
        self._anchor_runs: int = 0  # Σ collapsed chars of in-anchor runs
        self._anchor_depth = 0
        self._skip_depth = 0
        self._in_head = False

    def _flush(self) -> None:
        if not self._runs:
            return
        text = " ".join(self._runs)
        self.blocks.append((text, len(text), self._anchor_runs))
        self._runs = []
        self._anchor_runs = 0

    def handle_starttag(self, tag, attrs) -> None:
        if tag == "head":
            self._in_head = True
        elif tag == "body":
            self._in_head = False  # implied </head> on malformed markup
        if tag in SKIP_TAGS:
            self._skip_depth += 1
        elif tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._anchor_depth += 1

    def handle_startendtag(self, tag, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag) -> None:
        if tag == "head":
            self._in_head = False
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data) -> None:
        if self._skip_depth or self._in_head:
            return
        run = " ".join(data.split())
        if not run:
            return
        self._runs.append(run)
        if self._anchor_depth:
            self._anchor_runs += len(run)


def page_blocks(html: bytes | str) -> list[tuple[str, int, int]]:
    """→ [(text, chars, anchor_chars)] segments of one page, document order."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p._flush()
    return p.blocks


def main_content(html: bytes | str, *, min_chars: int = 25,
                 ld_num: int = 1, ld_den: int = 3) -> tuple[str, int, int]:
    """→ (main_text, n_blocks_kept, n_blocks_total) for one page."""
    blocks = page_blocks(html)
    kept = [
        text for text, chars, anchor in blocks
        if chars >= min_chars and anchor * ld_den <= chars * ld_num
    ]
    return "\n".join(kept), len(kept), len(blocks)


def extract_main_content(pages_ds, *, url_col: str = "url",
                         html_col: str = "html", min_chars: int = 25,
                         ld_num: int = 1, ld_den: int = 3):
    """→ Dataset(url, main_text, n_blocks_kept, n_blocks_total) — one row
    per page, pure map (zero shuffle)."""

    def batch(t: pa.Table) -> pa.Table:
        texts, kept_n, total_n = [], [], []
        for html in t.column(html_col).to_pylist():
            text, k, n = main_content(html, min_chars=min_chars,
                                      ld_num=ld_num, ld_den=ld_den)
            texts.append(text)
            kept_n.append(k)
            total_n.append(n)
        return pa.table({
            "url": t.column(url_col),
            "main_text": pa.array(texts, pa.string()),
            "n_blocks_kept": pa.array(kept_n, pa.int64()),
            "n_blocks_total": pa.array(total_n, pa.int64()),
        })

    return pages_ds.map_batches(batch, batch_format="pyarrow",
                                batch_size=128)
