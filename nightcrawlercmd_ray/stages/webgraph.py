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

    Two-level combiner: each batch collapses to distinct
    (dst, src_host, partial_count) rows; groupby(dst, src_host) sums to the
    exact per-host in-count; a second COARSE hash(dst)-keyed exchange folds
    host rows into (n_inlinks, n_src_hosts) with one vectorized Arrow
    group_by per partition — never a per-URL group dispatch (the
    per-singleton-group trap; see stages/dedup.py exact_dedup). Both
    exchanges carry distinct keys only.
    """
    import polars as pl
    def partial(t: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for cu, au in _page_edges(t):
            key = (au, host_of(cu))
            counts[key] = counts.get(key, 0) + 1
        ks = list(counts.keys())
        return pa.table({
            "dst_url": pa.array([k[0] for k in ks], pa.string()),
            "src_host": pa.array([k[1] for k in ks], pa.string()),
            "_n": pa.array([counts[k] for k in ks], pa.int64()),
        })

    P = 64

    def add_coarse(t: pa.Table) -> pa.Table:
        h = (pl.from_arrow(t.column("dst_url").combine_chunks())
             .hash(seed=0).to_numpy().astype(np.uint64))
        return t.append_column(
            "_c", pa.array((h % np.uint64(P)).astype(np.int64)))

    def fold_hosts(t: pa.Table) -> pa.Table:
        # a coarse partition holds MANY dst_urls — one vectorized group_by
        agg = t.group_by(["dst_url"]).aggregate(
            [("n_per_host", "sum"), ("src_host", "count")]
        )
        return pa.table({
            "dst_url": agg.column("dst_url"),
            "n_inlinks": pc.cast(agg.column("n_per_host_sum"), pa.int64()),
            "n_src_hosts": pc.cast(agg.column("src_host_count"), pa.int64()),
        })

    from ray.data.aggregate import Sum

    per_host = (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby(["dst_url", "src_host"])
        .aggregate(Sum("_n", alias_name="n_per_host"))
    )
    # second exchange is keyed on hash(dst_url) % P; rows ∝ distinct
    # (dst, src_host) pairs — already combined, no raw links
    return (
        per_host.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_c")
        .map_groups(fold_hosts, batch_format="pyarrow")
    )
