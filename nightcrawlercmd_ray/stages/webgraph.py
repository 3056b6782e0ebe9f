"""Webgraph contraction operators over crawled pages — the standard
link-analysis aggregates a crawl product feeds (host-level graph for
scheduler budgeting, per-URL in-link authority stats for prioritisation).

Reference parity: NightCrawlerCmd's report pass walks every stored page and
tallies per-URL link rows (``/root/reference/mainReport.go:150-200``); these
stages are the graph-shaped generalisation — contracting the URL edge list
to hosts and to per-target in-degree, as a crawl scheduler at 10^10-URL
scale consumes it.

Scale shape (both operators):

* ONE parse pass over pages (the expensive part, actor-pool-friendly
  ``map_batches``), emitting already-combined per-batch partial counts —
  the exchange carries distinct (src_host, dst_host) or (dst, src_host)
  keys, never raw links and never page bytes.
* ONE multi-key groupby-sum over partials. Host-graph cardinality is
  |hosts|², in practice ≪ |links|; per-URL stats cardinality is |urls|.
* Skew note: mega-hosts fan out to millions of targets, but the per-batch
  combiner caps each batch's contribution at its distinct-key count; the
  groupby key includes the destination, so no single reducer sees a whole
  hot host's out-edges.
"""
from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nightcrawlercmd_ray.functions.htmlparse import parse_html
from nightcrawlercmd_ray.functions.urlnorm import (
    canonicalize,
    host_of,
    to_abs_url,
)


def _page_edges(t: pa.Table):
    """Yield (src_url, dst_url) canonical pairs for one batch of pages."""
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        cu = canonicalize(url)
        if cu is None:
            continue
        for href in parse_html(html).hrefs:
            au = to_abs_url(cu, href)
            if au is not None:
                yield cu, au


def host_link_graph(pages_ds, *, drop_self_loops: bool = False):
    """Contract the URL link graph to a weighted host graph:
    (src_host, dst_host, n_links) with n_links = number of URL-level edges.

    → one row per directed host pair, bit-exact independent of
    partitioning (integer counts, associative sum).
    """
    def partial(t: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for cu, au in _page_edges(t):
            key = (host_of(cu), host_of(au))
            if drop_self_loops and key[0] == key[1]:
                continue
            counts[key] = counts.get(key, 0) + 1
        ks = list(counts.keys())
        return pa.table({
            "src_host": pa.array([k[0] for k in ks], pa.string()),
            "dst_host": pa.array([k[1] for k in ks], pa.string()),
            "_n": pa.array([counts[k] for k in ks], pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("_n", alias_name="n_links"))
    )


def url_inlink_stats(pages_ds):
    """Per-target in-link authority stats: for every linked-to canonical URL,
    (dst_url, n_inlinks, n_src_hosts) — total in-edges and DISTINCT linking
    hosts (the anti-spam authority signal: 1000 links from one host ≠ 1000
    hosts).

    ONE coarse hash(dst)-keyed exchange: each batch collapses to distinct
    (dst, src_host, partial_count) rows (the combiner); because the
    exchange key is a function of dst alone, ALL partials for a dst land
    in one partition, so the exact two-level fold — sum per (dst, src),
    then (n_inlinks, n_src_hosts) per dst — runs as two vectorized Arrow
    group_bys in-partition. Never a per-URL group dispatch (the
    per-singleton-group trap; see stages/dedup.py exact_dedup), and no
    multi-key string sort shuffle (measured ~2× the whole query).
    """
    import polars as pl

    P = 64

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for cu, au in _page_edges(t):
            key = (au, host_of(cu))
            counts[key] = counts.get(key, 0) + 1
        ks = list(counts.keys())
        dst = pa.array([k[0] for k in ks], pa.string())
        h = pl.from_arrow(dst).hash(seed=0).to_numpy().astype(np.uint64)
        return pa.table({
            "dst_url": dst,
            "src_host": pa.array([k[1] for k in ks], pa.string()),
            "_n": pa.array([counts[k] for k in ks], pa.int64()),
            "_c": pa.array((h % np.uint64(P)).astype(np.int64)),
        })

    def fold_hosts(t: pa.Table) -> pa.Table:
        # a coarse partition holds MANY dst_urls — vectorized group_bys
        per_src = t.group_by(["dst_url", "src_host"]).aggregate(
            [("_n", "sum")])
        agg = per_src.group_by(["dst_url"]).aggregate(
            [("_n_sum", "sum"), ("src_host", "count")]
        )
        return pa.table({
            "dst_url": agg.column("dst_url"),
            "n_inlinks": pc.cast(agg.column("_n_sum_sum"), pa.int64()),
            "n_src_hosts": pc.cast(agg.column("src_host_count"), pa.int64()),
        })

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("_c")
        .map_groups(fold_hosts, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------- #
# anchor text — the classic webgraph signal the crawl's own link extraction
# discards (mainReport.go keeps only the href). Anchor text describes the
# TARGET page better than the target's own content (Brin & Page 1998 §2.2;
# Craswell et al., *Effective Site Finding using Link Anchor Information*,
# SIGIR 2001), so the aggregate is keyed by destination URL.
# --------------------------------------------------------------------------- #
class _AnchorExtractor(HTMLParser):
    """(href, text) pairs per document: text is everything between an
    ``<a href=...>`` and its close — nested inline markup included,
    script/style content excluded — whitespace-collapsed. A new ``<a>``
    auto-closes an open one (HTML5 'a is not nestable'); anchors with empty
    href or empty text are dropped, matching the crawl's empty-href rule."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []
        self._skip = 0

    def _close_anchor(self) -> None:
        if self._href is not None:
            text = " ".join("".join(self._buf).split())
            if text:
                self.anchors.append((self._href, text))
            self._href = None
            self._buf = []

    def handle_starttag(self, tag, attrs) -> None:
        if tag in ("script", "style"):
            self._skip += 1
            return
        if tag == "a":
            self._close_anchor()
            href = (dict(attrs).get("href") or "").strip()
            if href:
                self._href = href

    def handle_startendtag(self, tag, attrs) -> None:
        if tag in ("script", "style"):  # <script src=x/> has no body to skip
            return
        if tag == "a":  # <a/> opens and closes empty — never emits
            self._close_anchor()

    def handle_endtag(self, tag) -> None:
        if tag in ("script", "style"):
            if self._skip > 0:
                self._skip -= 1
            return
        if tag == "a":
            self._close_anchor()

    def handle_data(self, data) -> None:
        if self._skip == 0 and self._href is not None:
            self._buf.append(data)


def extract_anchors(html: bytes | str) -> list[tuple[str, str]]:
    """Serial (href, text) extraction for one document — the unit the
    distributed operators and their test oracles share."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    ex = _AnchorExtractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:
        pass  # truncated markup: keep whatever was extracted before the error
    ex._close_anchor()
    return ex.anchors


def _page_anchors(t: pa.Table):
    """Yield (dst_url, anchor_text) canonical pairs for one batch of pages."""
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        cu = canonicalize(url)
        if cu is None:
            continue
        for href, text in extract_anchors(html):
            au = to_abs_url(cu, href)
            if au is not None:
                yield au, text


def anchor_text_index(pages_ds, *, max_anchor_len: int = 256):
    """Full inverted anchor index: (dst_url, anchor, n) — how many times
    each exact anchor string points at each target across the corpus.
    Anchor strings are truncated to ``max_anchor_len`` chars (adversarial
    pages embed megabyte anchors; truncation keys the aggregate, bounded
    exchange). Same scale shape as :func:`host_link_graph`: per-batch
    distinct-pair count combiner, ONE multi-key groupby-sum; exchange rows
    ∝ distinct (dst, anchor) pairs, never raw links or page bytes."""

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for au, text in _page_anchors(t):
            key = (au, text[:max_anchor_len])
            counts[key] = counts.get(key, 0) + 1
        ks = list(counts.keys())
        return pa.table({
            "dst_url": pa.array([k[0] for k in ks], pa.string()),
            "anchor": pa.array([k[1] for k in ks], pa.string()),
            "_n": pa.array([counts[k] for k in ks], pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby(["dst_url", "anchor"])
        .aggregate(Sum("_n", alias_name="n"))
    )


def top_anchor_per_url(pages_ds, *, max_anchor_len: int = 256,
                       num_partitions: int = 64):
    """Per-target anchor summary: (dst_url, top_anchor, n_top, n_anchors) —
    the most frequent anchor string pointing at each URL (ties break to the
    lexicographically smallest, so the result is partition-invariant), its
    count, and the total in-anchor count. ONE coarse hash(dst)-keyed
    exchange of per-batch (dst, anchor, count) combiners (the key is a
    function of dst alone, so a dst's rows co-locate and the exact
    anchor-count fold is in-partition); per partition one vectorized
    group_by + sort + first-row-per-group — never a per-URL group dispatch
    and no multi-key string sort shuffle."""
    import polars as pl

    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for au, text in _page_anchors(t):
            key = (au, text[:max_anchor_len])
            counts[key] = counts.get(key, 0) + 1
        ks = list(counts.keys())
        dst = pa.array([k[0] for k in ks], pa.string())
        h = pl.from_arrow(dst).hash(seed=0).to_numpy().astype(np.uint64)
        return pa.table({
            "dst_url": dst,
            "anchor": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64()),
            "_c": pa.array((h % np.uint64(P)).astype(np.int64)),
        })

    def fold(t: pa.Table) -> pa.Table:
        # exact per-(dst, anchor) counts are local to the partition
        t = t.group_by(["dst_url", "anchor"]).aggregate([("n", "sum")])
        t = pa.table({"dst_url": t.column("dst_url"),
                      "anchor": t.column("anchor"),
                      "n": pc.cast(t.column("n_sum"), pa.int64())})
        g = t.sort_by([("dst_url", "ascending"), ("n", "descending"),
                       ("anchor", "ascending")])
        dst = g.column("dst_url").to_numpy(zero_copy_only=False)
        first = np.empty(len(dst), dtype=bool)
        if len(dst):
            first[0] = True
            first[1:] = dst[1:] != dst[:-1]
        totals = g.group_by(["dst_url"]).aggregate([("n", "sum")])
        top = g.filter(pa.array(first)).select(["dst_url", "anchor", "n"])
        joined = top.join(totals, keys=["dst_url"])
        return pa.table({
            "dst_url": joined.column("dst_url"),
            "top_anchor": joined.column("anchor"),
            "n_top": joined.column("n"),
            "n_anchors": pc.cast(joined.column("n_sum"), pa.int64()),
        })

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("_c")
        .map_groups(fold, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Sitemap discovery — the crawl-seed channel the reference has no reader for
# (its seeds come only from -url / -url-list, mainCrawler.go:100-140). A real
# web-scale frontier bootstraps from sitemaps (sitemaps.org protocol) and
# from robots.txt `Sitemap:` directives (the discovery pointer defined by the
# same protocol). Both extractors below are pure stateless maps — zero
# shuffle; output rows are compact (page_url, loc, ord) triples.

_XML_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">",
            "&quot;": '"', "&apos;": "'"}


def _xml_unescape(s: str) -> str:
    # the five XML predefined entities — the only escaping the sitemap
    # protocol requires for URLs
    if "&" not in s:
        return s
    for k, v in _XML_ENT.items():
        s = s.replace(k, v)
    return s


def extract_sitemap_urls(pages_ds, *, url_col: str = "url",
                         body_col: str = "html"):
    """(page_url, loc, ord) for every ``<loc>`` entry of every sitemap /
    sitemap-index body. ``ord`` is the 0-based position within its page —
    the protocol's document order, which crawl schedulers treat as the
    publisher's priority hint. Entities are unescaped per the protocol;
    surrounding whitespace inside ``<loc>`` is stripped. Pure map."""
    import re

    pat = re.compile(rb"<loc>\s*(.*?)\s*</loc>", re.DOTALL | re.IGNORECASE)

    def expand(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        bodies = t.column(body_col).to_pylist()
        out_u, out_l, out_o = [], [], []
        for u, b in zip(urls, bodies):
            if b is None:
                continue
            if isinstance(b, str):
                b = b.encode()
            for i, m in enumerate(pat.finditer(b)):
                out_u.append(u)
                out_l.append(_xml_unescape(m.group(1).decode("utf-8",
                                                             "replace")))
                out_o.append(i)
        return pa.table({
            "url": pa.array(out_u, pa.string()),
            "loc": pa.array(out_l, pa.string()),
            "ord": pa.array(out_o, pa.int64()),
        })

    return pages_ds.map_batches(expand, batch_format="pyarrow",
                                batch_size=128)


def sitemaps_from_robots(pages_ds, *, url_col: str = "url",
                         body_col: str = "html"):
    """(robots_url, loc, ord) for every ``Sitemap:`` directive in every
    robots.txt body — the discovery pointer of the sitemap protocol
    (case-insensitive key, value to end-of-line, whitespace-trimmed).
    Only rows whose URL path is exactly ``/robots.txt`` are scanned."""
    import re

    # \S+ cannot swallow \r (it is whitespace), so CRLF bodies need no
    # special-casing
    line = re.compile(rb"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)")

    def expand(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        bodies = t.column(body_col).to_pylist()
        out_u, out_l, out_o = [], [], []
        for u, b in zip(urls, bodies):
            if b is None or not u.split("?", 1)[0].endswith("/robots.txt"):
                continue
            if isinstance(b, str):
                b = b.encode()
            for k, m in enumerate(line.finditer(b)):
                out_u.append(u)
                out_l.append(m.group(1).decode("utf-8", "replace"))
                out_o.append(k)
        return pa.table({
            "url": pa.array(out_u, pa.string()),
            "loc": pa.array(out_l, pa.string()),
            "ord": pa.array(out_o, pa.int64()),
        })

    return pages_ds.map_batches(expand, batch_format="pyarrow",
                                batch_size=128)
