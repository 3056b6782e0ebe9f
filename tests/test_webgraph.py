"""Webgraph contraction: host_link_graph and url_inlink_stats vs a serial
parse oracle on the synthetic corpus, partition invariance, self-loop
handling, and the distinct-host-vs-inlink distinction."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.functions.htmlparse import parse_html
from nightcrawlercmd_ray.functions.urlnorm import (
    canonicalize,
    host_of,
    to_abs_url,
)
from nightcrawlercmd_ray.stages.webgraph import host_link_graph, url_inlink_stats


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from nightcrawlercmd_ray.sources.synth import CorpusSpec, generate_corpus

    out = str(tmp_path_factory.mktemp("wgcorpus"))
    generate_corpus(out, CorpusSpec(n_pages=250, n_hosts=10))
    return out


def _serial_edges(pages: pd.DataFrame):
    for url, html in zip(pages["url"], pages["html"]):
        cu = canonicalize(url)
        if cu is None:
            continue
        for href in parse_html(html).hrefs:
            au = to_abs_url(cu, href)
            if au is not None:
                yield cu, au


@pytest.mark.parametrize("nparts", [1, 5])
def test_host_link_graph_vs_serial(corpus, nparts):
    pages = pd.read_parquet(f"{corpus}/pages.parquet", columns=["url", "html"])
    exp: dict[tuple[str, str], int] = {}
    for cu, au in _serial_edges(pages):
        k = (host_of(cu), host_of(au))
        exp[k] = exp.get(k, 0) + 1

    ds = ray.data.read_parquet(f"{corpus}/pages.parquet",
                               columns=["url", "html"]).repartition(nparts)
    got = host_link_graph(ds).to_pandas()
    gmap = {(r.src_host, r.dst_host): r.n_links for r in got.itertuples()}
    assert gmap == exp
    assert got["n_links"].sum() == sum(exp.values())


def test_host_link_graph_drop_self_loops(corpus):
    pages = pd.read_parquet(f"{corpus}/pages.parquet", columns=["url", "html"])
    exp = {}
    for cu, au in _serial_edges(pages):
        k = (host_of(cu), host_of(au))
        if k[0] != k[1]:
            exp[k] = exp.get(k, 0) + 1
    ds = ray.data.read_parquet(f"{corpus}/pages.parquet",
                               columns=["url", "html"])
    got = host_link_graph(ds, drop_self_loops=True).to_pandas()
    assert {(r.src_host, r.dst_host): r.n_links
            for r in got.itertuples()} == exp


@pytest.mark.parametrize("nparts", [1, 5])
def test_url_inlink_stats_vs_serial(corpus, nparts):
    pages = pd.read_parquet(f"{corpus}/pages.parquet", columns=["url", "html"])
    n_in: dict[str, int] = {}
    hosts: dict[str, set] = {}
    for cu, au in _serial_edges(pages):
        n_in[au] = n_in.get(au, 0) + 1
        hosts.setdefault(au, set()).add(host_of(cu))

    ds = ray.data.read_parquet(f"{corpus}/pages.parquet",
                               columns=["url", "html"]).repartition(nparts)
    got = url_inlink_stats(ds).to_pandas()
    assert len(got) == len(n_in)
    for r in got.itertuples():
        assert n_in[r.dst_url] == r.n_inlinks
        assert len(hosts[r.dst_url]) == r.n_src_hosts


def test_inlink_distinct_hosts_differ_from_counts():
    """1000 links from one host must give n_src_hosts=1, and the same target
    linked from two hosts must give 2 — hand-built micro-graph."""
    a = "http://a.test/p"
    mk = lambda n: ("<html><body>" +
                    "".join(f'<a href="http://t.test/x">l{i}</a>'
                            for i in range(n)) + "</body></html>").encode()
    rows = pa.table({
        "url": [a, "http://b.test/q"],
        "html": [mk(7), mk(2)],
    })
    got = url_inlink_stats(ray.data.from_arrow(rows)).to_pandas()
    row = got[got["dst_url"] == "http://t.test/x"].iloc[0]
    assert row["n_inlinks"] == 9
    assert row["n_src_hosts"] == 2
