"""Crawler-trap detection — per-host URL-explosion vs content-duplication
signals.

A crawl frontier at the 10^10-URL design point must detect hosts that
generate unbounded URL spaces over near-constant content (calendar pages,
session-id links, faceted-search permutations): the classic crawler traps
(Heydon & Najork, "Mercator: a scalable, extensible web crawler", 1999 §4.2).
The reference has no such guard — its frontier is a flat ``map[string]bool``
(``/root/reference/mainCrawler.go:110-115``) that would happily enqueue a
trap forever. This stage computes, per host, the signals a scheduler gates
on, and an integer-exact trap verdict.

Signals (all exact integers — bit-reproducible at any partitioning, and
replayable in SQL for the value oracle):

* ``n_urls``     — URLs seen for the host;
* ``n_content``  — DISTINCT content values (two-seed 128-bit hash — no
                   birthday collisions at corpus scale, see
                   stages/dedup._content_hashes);
* ``sum_depth``  — Σ path-segment counts (trap URL spaces are deep);
* ``n_query``    — URLs carrying a query string (session-id/facet traps);
* ``is_trap``    — ``n_urls ≥ min_urls`` AND the duplication ratio
                   ``1 − n_content/n_urls ≥ dup_threshold``, evaluated by
                   integer cross-multiplication (no float drift).

Scale shape: ONE coarse ``groupby(hash(host) % P)`` exchange of compact
(host, h1, h2, depth, has_query) rows — page bytes never move; the exact
distinct-content fold needs every (host, content) pair co-located, which
bounds the exchange at one short row per URL. In-partition aggregation is a
single vectorized polars group_by (never a per-host Python dispatch — the
per-singleton-group trap, see stages/dedup.py).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import canonicalize, host_of

TRAP_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("n_urls", pa.int64()),
    ("n_content", pa.int64()),
    ("sum_depth", pa.int64()),
    ("n_query", pa.int64()),
    ("is_trap", pa.bool_()),
])


def _url_signals(url: str) -> tuple[str, int, bool]:
    """(host, path depth = non-empty path segments, has query) of one URL."""
    cu = canonicalize(url) or url
    host = host_of(cu)
    rest = cu.split("://", 1)[-1]
    slash = rest.find("/")
    path = "" if slash < 0 else rest[slash:]
    q = path.find("?")
    has_query = q >= 0
    if has_query:
        path = path[:q]
    depth = sum(1 for seg in path.split("/") if seg)
    return host, depth, has_query


def host_trap_signals(ds, *, url_col: str = "url", content_col: str = "text",
                      min_urls: int = 20, dup_num: int = 1, dup_den: int = 2,
                      num_partitions: int | None = None):
    """→ Dataset(host, n_urls, n_content, sum_depth, n_query, is_trap).

    ``is_trap`` ⇔ ``n_urls ≥ min_urls`` and
    ``(n_urls − n_content) · dup_den ≥ n_urls · dup_num`` (duplication ratio
    ≥ dup_num/dup_den; default ≥ 1/2 — half the host's URLs add no content).
    """
    import polars as pl

    from .dedup import _content_hashes, _num_coarse_partitions

    P = _num_coarse_partitions(ds, num_partitions, None,
                               rows_per_partition=65536)

    def rows(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        hosts, depths, queries = [], [], []
        for u in urls:
            h, d, q = _url_signals(u)
            hosts.append(h)
            depths.append(d)
            queries.append(q)
        h1, h2 = _content_hashes(t.column(content_col))
        harr = pa.array(hosts, pa.string())
        coarse = (pl.from_arrow(harr).hash(seed=0).to_numpy()
                  .astype(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "host": harr,
            "_h1": pa.array(h1), "_h2": pa.array(h2),
            "_depth": pa.array(depths, pa.int64()),
            "_q": pa.array(queries, pa.bool_()),
            "_coarse": pa.array(coarse),
        })

    def fold(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.select(["host", "_h1", "_h2", "_depth", "_q"]))
        agg = (
            df.group_by("host")
            .agg(
                pl.len().alias("n_urls"),
                pl.struct("_h1", "_h2").n_unique().alias("n_content"),
                pl.col("_depth").sum().alias("sum_depth"),
                pl.col("_q").sum().alias("n_query"),
            )
            .sort("host")
        )
        n, c = agg["n_urls"], agg["n_content"]
        trap = (n >= min_urls) & ((n - c) * dup_den >= n * dup_num)
        return pa.table({
            "host": agg["host"].to_arrow(),
            "n_urls": agg["n_urls"].cast(pl.Int64).to_arrow(),
            "n_content": agg["n_content"].cast(pl.Int64).to_arrow(),
            "sum_depth": agg["sum_depth"].cast(pl.Int64).to_arrow(),
            "n_query": agg["n_query"].cast(pl.Int64).to_arrow(),
            "is_trap": trap.to_arrow(),
        })

    return (
        ds.map_batches(rows, batch_format="pyarrow", batch_size=1024)
        .groupby("_coarse")
        .map_groups(fold, batch_format="pyarrow")
    )
