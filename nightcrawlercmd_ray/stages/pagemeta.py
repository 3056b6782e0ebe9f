"""Page-metadata extraction + canonical-link dedup over crawled pages.

Reference parity: NightCrawlerCmd's report pass walks every stored page and
keeps hrefs/forms/words (``/root/reference/mainReport.go:96-172``) but drops
the ``<head>`` signals every real crawl scheduler consumes — the title, the
meta description, ``<link rel="canonical">`` and the robots meta directives.
These stages add that head-extraction pass as a first-class engine operator,
plus the dedup family member it enables: canonical-link dedup (cluster pages
by their declared canonical target — the crawl-side dual of content dedup).

Pinned extraction semantics (the deterministic spec; tests enforce it):

* ``title``           — text of the FIRST ``<title>`` element, entities
                        decoded, whitespace collapsed (``" ".join(split())``);
                        null when absent/empty.
* ``meta_description``— ``content`` of the FIRST ``<meta name="description">``
                        (name match case-insensitive); null when absent.
* ``canonical_url``   — ``href`` of the FIRST ``<link rel="canonical">``,
                        resolved against the page's canonical URL
                        (``urlnorm.to_abs_url``) and canonicalized; null when
                        absent or unparseable. ``rel`` may be a space-separated
                        token list (HTML5), matched case-insensitively.
* ``noindex``/``nofollow`` — OR over ALL ``<meta name="robots">`` directives
                        (comma/space-separated token lists, case-insensitive).
* HEAD-ONLY rule (ADVICE r3 — canonical-hijack guard): every signal above
  is collected only until ``</head>`` or the first ``<body>`` start tag,
  whichever comes first; a canonical/robots/meta/title injected into the
  document body (e.g. unescaped user content) is ignored, matching the
  convention real crawlers follow to prevent a body-injected canonical
  from redirecting a page's dedup cluster.

Scale shape:

* ``extract_page_metadata`` — pure ``map_batches`` (zero shuffle); the parse
  is a single stdlib-HTMLParser pass per page (head signals only, no DOM
  built, no text accumulation outside ``<title>``).
* ``canonical_dedup`` — parse pass emits compact (url, canonical-key) rows
  (page bytes never leave the parse task), then ONE coarse
  ``groupby(hash(key) % P)`` shuffle with P ∝ corpus and a vectorized
  in-partition winner pick (polars sort + first-per-group; never a per-group
  Python dispatch — the per-singleton-group trap, see stages/dedup.py).
"""
from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import canonicalize, to_abs_url

META_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("title", pa.string()),
    ("meta_description", pa.string()),
    ("canonical_url", pa.string()),
    ("noindex", pa.bool_()),
    ("nofollow", pa.bool_()),
])


class _MetaParser(HTMLParser):
    """One-pass head-signal collector (first-wins title/description/canonical,
    OR-accumulated robots directives)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: str | None = None
        self.description: str | None = None
        self.canonical_href: str | None = None
        self.noindex = False
        self.nofollow = False
        self._in_title = False
        self._title_parts: list[str] = []
        self._head_done = False  # set at </head> or first <body>

    # -- tag handling -------------------------------------------------------
    def _handle_tag(self, tag: str, attrs) -> None:
        if self._head_done:
            return
        if tag == "meta":
            a = {k: (v or "") for k, v in attrs}
            name = a.get("name", "").lower()
            if name == "description" and self.description is None:
                self.description = a.get("content", "")
            elif name == "robots":
                toks = {
                    t.strip().lower()
                    for t in a.get("content", "").replace(",", " ").split()
                }
                self.noindex = self.noindex or "noindex" in toks
                self.nofollow = self.nofollow or "nofollow" in toks
        elif tag == "link" and self.canonical_href is None:
            a = {k: (v or "") for k, v in attrs}
            rel = a.get("rel", "").lower().split()
            if "canonical" in rel and a.get("href"):
                self.canonical_href = a["href"]

    def handle_starttag(self, tag, attrs) -> None:
        if tag == "body":
            self._head_done = True  # implied </head> on malformed markup
            return
        if tag == "title":
            # nested <title> cannot occur; first element wins (head only)
            if self.title is None and not self._head_done:
                self._in_title = True
            return
        self._handle_tag(tag, attrs)

    def handle_startendtag(self, tag, attrs) -> None:
        self._handle_tag(tag, attrs)

    def handle_endtag(self, tag) -> None:
        if tag == "head":
            self._head_done = True
        if tag == "title" and self._in_title:
            self._in_title = False
            self.title = " ".join("".join(self._title_parts).split())

    def handle_data(self, data) -> None:
        if self._in_title:
            self._title_parts.append(data)


def parse_page_metadata(html: bytes | str) -> _MetaParser:
    """Parse one document's head signals (tolerant of malformed HTML)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _MetaParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever was collected before the parser gave up
    if p._in_title:  # unterminated <title>: accept collected text
        p.title = " ".join("".join(p._title_parts).split())
    return p


def extract_page_metadata(pages_ds, *, url_col: str = "url",
                          html_col: str = "html"):
    """→ Dataset(url, title, meta_description, canonical_url, noindex,
    nofollow) — one row per page, pure map (zero shuffle)."""

    def batch(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        titles, descs, canons, noidx, nofol = [], [], [], [], []
        for url, html in zip(urls, t.column(html_col).to_pylist()):
            p = parse_page_metadata(html)
            titles.append(p.title if p.title else None)
            descs.append(p.description)
            canon = None
            if p.canonical_href is not None:
                base = canonicalize(url)
                canon = (to_abs_url(base, p.canonical_href)
                         if base is not None
                         else canonicalize(p.canonical_href))
            canons.append(canon)
            noidx.append(p.noindex)
            nofol.append(p.nofollow)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "meta_description": pa.array(descs, pa.string()),
            "canonical_url": pa.array(canons, pa.string()),
            "noindex": pa.array(noidx, pa.bool_()),
            "nofollow": pa.array(nofol, pa.bool_()),
        })

    return pages_ds.map_batches(batch, batch_format="pyarrow", batch_size=128)


def canonical_dedup(pages_ds, *, url_col: str = "url",
                    html_col: str = "html",
                    num_partitions: int | None = None):
    """Cluster pages by declared canonical target; pick one winner per
    cluster → Dataset(url, canonical_target, is_winner).

    Pinned semantics (one hop, no chain following — the industry contract:
    Google treats rel=canonical as a single-hop hint):

    * cluster key = the page's absolutized ``rel=canonical`` target when
      declared, else the page's own canonical URL (self);
    * winner       = the target page itself when it is a cluster member
      (``url == canonical_target``), else ``min(url)`` — deterministic at
      any parallelism;
    * a page whose canonical target is NOT in the corpus still forms a
      cluster (its members keep ``is_winner`` by min-url).

    Only compact (url, key, is_self) rows ride the single coarse shuffle.
    """
    import polars as pl

    from .dedup import _num_coarse_partitions

    P = _num_coarse_partitions(pages_ds, num_partitions, None,
                               rows_per_partition=65536)

    def rows(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        keys, selfs = [], []
        for url, html in zip(urls, t.column(html_col).to_pylist()):
            cu = canonicalize(url) or url
            p = parse_page_metadata(html)
            key = cu
            if p.canonical_href is not None:
                tgt = to_abs_url(cu, p.canonical_href)
                if tgt is not None:
                    key = tgt
            keys.append(key)
            selfs.append(key == cu)
        karr = pa.array(keys, pa.string())
        h = (pl.from_arrow(karr).hash(seed=0).to_numpy().astype(np.uint64)
             % np.uint64(P)).astype(np.int64)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "canonical_target": karr,
            "_self": pa.array(selfs, pa.bool_()),
            "_coarse": pa.array(h),
        })

    def partition_pick(g: pa.Table) -> pa.Table:
        # many clusters per coarse partition — one vectorized sort + first
        df = pl.from_arrow(g.select(["url", "canonical_target", "_self"]))
        win = (
            df.sort(["canonical_target", "_self", "url"],
                    descending=[False, True, False])
            .group_by("canonical_target", maintain_order=True)
            .first()
            .rename({"url": "_win"})
        )
        out = df.join(win.select(["canonical_target", "_win"]),
                      on="canonical_target", how="left")
        return pa.table({
            "url": out["url"].to_arrow(),
            "canonical_target": out["canonical_target"].to_arrow(),
            "is_winner": (out["url"] == out["_win"]).to_arrow(),
        })

    return (
        pages_ds.map_batches(rows, batch_format="pyarrow", batch_size=128)
        .groupby("_coarse")
        .map_groups(partition_pick, batch_format="pyarrow")
    )
