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


# --------------------------------------------------------------------------- #
# anchor text operators vs the shared serial extractor
# --------------------------------------------------------------------------- #
def test_extract_anchors_semantics():
    from nightcrawlercmd_ray.stages.webgraph import extract_anchors

    h = (b'<html><body>'
         b'<a href="/x">Click <b>here</b></a>'
         b'<a href="/y">next<a href="/z">auto-closes prior</a>'
         b'<script>var a="<a href=q>never</a>";</script>'
         b'<a href="">empty href dropped</a>'
         b'<a href="/w">  collapse&amp;   <i>entities</i> </a>'
         b'<a href="/empty"><img src="pic.png"></a>'
         b'</body></html>')
    got = extract_anchors(h)
    assert got == [
        ("/x", "Click here"),
        ("/y", "next"),
        ("/z", "auto-closes prior"),
        ("/w", "collapse& entities"),
    ]


def test_extract_anchors_unclosed_tail():
    from nightcrawlercmd_ray.stages.webgraph import extract_anchors

    assert extract_anchors(b'<a href="/t">dangling text') == \
        [("/t", "dangling text")]


@pytest.mark.parametrize("nparts", [1, 5])
def test_anchor_text_index_vs_serial(corpus, nparts):
    from nightcrawlercmd_ray.stages.webgraph import (
        anchor_text_index, extract_anchors,
    )

    pages = pd.read_parquet(f"{corpus}/pages.parquet", columns=["url", "html"])
    exp: dict[tuple[str, str], int] = {}
    for url, html in zip(pages["url"], pages["html"]):
        cu = canonicalize(url)
        if cu is None:
            continue
        for href, text in extract_anchors(html):
            au = to_abs_url(cu, href)
            if au is not None:
                k = (au, text[:256])
                exp[k] = exp.get(k, 0) + 1
    assert exp, "synthetic corpus must contain anchors"

    ds = ray.data.read_parquet(f"{corpus}/pages.parquet",
                               columns=["url", "html"]).repartition(nparts)
    got = anchor_text_index(ds).to_pandas()
    assert {(r.dst_url, r.anchor): r.n for r in got.itertuples()} == exp


def test_top_anchor_per_url_vs_serial(corpus):
    from nightcrawlercmd_ray.stages.webgraph import (
        anchor_text_index, top_anchor_per_url,
    )

    ds = ray.data.read_parquet(f"{corpus}/pages.parquet",
                               columns=["url", "html"])
    idx = anchor_text_index(ds).to_pandas()
    # serial fold from the (already serially-verified) exact index
    exp = {}
    for dst, grp in idx.groupby("dst_url"):
        g = grp.sort_values(["n", "anchor"], ascending=[False, True])
        exp[dst] = (g.iloc[0]["anchor"], int(g.iloc[0]["n"]),
                    int(grp["n"].sum()))
    got = top_anchor_per_url(ds).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        ea, en, etot = exp[r.dst_url]
        assert (r.top_anchor, r.n_top, r.n_anchors) == (ea, en, etot)


def test_top_anchor_tie_breaks_lexicographic():
    from nightcrawlercmd_ray.stages.webgraph import top_anchor_per_url

    html = (b'<html><body>'
            b'<a href="http://t.test/p">zeta</a>'
            b'<a href="http://t.test/p">alpha</a>'
            b'</body></html>')
    rows = pa.table({"url": ["http://a.test/"], "html": [html]})
    got = top_anchor_per_url(ray.data.from_arrow(rows)).to_pandas()
    row = got[got["dst_url"] == "http://t.test/p"].iloc[0]
    assert row["top_anchor"] == "alpha"
    assert row["n_top"] == 1 and row["n_anchors"] == 2


# ---------------------------------------------------------------------------
# sitemap discovery


def _one_page(url, body):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.table({
        "url": pa.array([url]),
        "html": pa.array([body if isinstance(body, bytes) else body.encode()],
                         pa.binary()),
    }))


def test_sitemap_locs_order_whitespace_entities():
    from nightcrawlercmd_ray.stages.webgraph import extract_sitemap_urls

    body = (b"<?xml version='1.0'?><urlset>"
            b"<url><loc> http://a.test/p?x=1&amp;y=2 </loc></url>"
            b"<url><LOC>http://a.test/q</LOC></url>"
            b"<url><loc>\nhttp://a.test/r\n</loc></url>"
            b"</urlset>")
    got = extract_sitemap_urls(_one_page("http://a.test/sitemap.xml", body)).take_all()
    assert [(r["loc"], r["ord"]) for r in got] == [
        ("http://a.test/p?x=1&y=2", 0),
        ("http://a.test/q", 1),
        ("http://a.test/r", 2),
    ]
    assert all(r["url"] == "http://a.test/sitemap.xml" for r in got)


def test_sitemap_index_and_empty():
    from nightcrawlercmd_ray.stages.webgraph import extract_sitemap_urls

    idx = (b"<sitemapindex><sitemap><loc>http://a.test/s1.xml</loc></sitemap>"
           b"<sitemap><loc>http://a.test/s2.xml</loc></sitemap></sitemapindex>")
    got = extract_sitemap_urls(_one_page("http://a.test/sitemap.xml", idx)).take_all()
    assert [r["loc"] for r in got] == ["http://a.test/s1.xml",
                                      "http://a.test/s2.xml"]
    assert extract_sitemap_urls(
        _one_page("http://a.test/x", b"<html>no locs</html>")).count() == 0


def test_sitemaps_from_robots_directives():
    from nightcrawlercmd_ray.stages.webgraph import sitemaps_from_robots

    body = (b"User-agent: *\r\n"
            b"Disallow: /private\r\n"
            b"SITEMAP: http://a.test/s1.xml\r\n"
            b"  sitemap:http://a.test/s2.xml\n"
            b"# sitemap: commented out is still a match? no - hash prefix\n")
    got = sitemaps_from_robots(
        _one_page("http://a.test/robots.txt", body)).take_all()
    assert [(r["loc"], r["ord"]) for r in got] == [
        ("http://a.test/s1.xml", 0), ("http://a.test/s2.xml", 1)]
    # non-robots pages are never scanned
    assert sitemaps_from_robots(
        _one_page("http://a.test/page", b"Sitemap: http://x/s.xml")).count() == 0
