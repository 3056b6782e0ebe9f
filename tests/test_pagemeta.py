"""Page-metadata extraction + canonical-link dedup: pinned head-signal
semantics (first-wins title/description/canonical, OR'd robots directives,
relative-canonical absolutization), a serial oracle for the dedup clusters,
partition invariance, and the chain / missing-target edges."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.functions.urlnorm import canonicalize, to_abs_url
from nightcrawlercmd_ray.stages.pagemeta import (
    canonical_dedup,
    extract_page_metadata,
    parse_page_metadata,
)


# --------------------------------------------------------------------------- #
# parse_page_metadata unit semantics
# --------------------------------------------------------------------------- #
def test_parse_basic_head():
    p = parse_page_metadata(
        b"<html><head><title>  Hello \n World </title>"
        b'<meta name="description" content="a summary">'
        b'<link rel="canonical" href="http://ex.com/x">'
        b"</head><body>body text</body></html>"
    )
    assert p.title == "Hello World"
    assert p.description == "a summary"
    assert p.canonical_href == "http://ex.com/x"
    assert p.noindex is False and p.nofollow is False


def test_parse_first_wins_and_case_insensitive():
    p = parse_page_metadata(
        '<TITLE>First</TITLE><title>Second</title>'
        '<META NAME="Description" CONTENT="d1">'
        '<meta name="description" content="d2">'
        '<LINK REL="Canonical" HREF="/a"><link rel="canonical" href="/b">'
    )
    assert p.title == "First"
    assert p.description == "d1"
    assert p.canonical_href == "/a"


def test_parse_robots_or_accumulates_over_metas():
    p = parse_page_metadata(
        '<meta name="robots" content="NOINDEX, follow">'
        '<meta name="robots" content="nofollow">'
    )
    assert p.noindex is True and p.nofollow is True
    q = parse_page_metadata('<meta name="robots" content="index follow">')
    assert q.noindex is False and q.nofollow is False


def test_parse_rel_token_list_and_self_closing():
    p = parse_page_metadata(
        '<link rel="alternate canonical" href="http://t.example/c"/>'
        '<meta name="description" content="x"/>'
    )
    assert p.canonical_href == "http://t.example/c"
    assert p.description == "x"


def test_parse_entities_and_unterminated_title():
    assert parse_page_metadata("<title>A &amp; B</title>").title == "A & B"
    # unterminated <title>: collected text is still accepted
    assert parse_page_metadata("<title>dangling text").title == "dangling text"


def test_head_only_signals_ignore_body_injection():
    """ADVICE r3: a body-injected canonical (unescaped user content) must
    not redirect the page's canonical_dedup cluster — signals stop at
    </head> or the first <body> start tag."""
    p = parse_page_metadata(
        '<html><head><title>Real</title></head><body>'
        '<link rel="canonical" href="http://evil.example/steal">'
        '<meta name="robots" content="noindex,nofollow">'
        '<meta name="description" content="injected">'
        '<title>Injected Title</title>'
        '</body></html>'
    )
    assert p.title == "Real"
    assert p.canonical_href is None
    assert p.noindex is False and p.nofollow is False
    assert p.description is None
    # implied </head>: <body> without a closing head still ends head mode
    q = parse_page_metadata(
        '<head><link rel="canonical" href="/good"><body>'
        '<link rel="canonical" href="/bad">'
    )
    assert q.canonical_href == "/good"
    # no head/body markup at all (fragment): signals still collected
    r = parse_page_metadata('<link rel="canonical" href="/frag">')
    assert r.canonical_href == "/frag"


def test_parse_garbage_and_empty():
    assert parse_page_metadata(b"\xff\xfe<<<>><title>").title in (None, "")
    p = parse_page_metadata("")
    assert p.title is None and p.canonical_href is None


def test_ignores_link_without_href_and_meta_without_name():
    p = parse_page_metadata(
        '<link rel="canonical"><meta content="orphan">'
        '<link rel="canonical" href="http://kept.example/">'
    )
    assert p.canonical_href == "http://kept.example/"


# --------------------------------------------------------------------------- #
# extract_page_metadata stage
# --------------------------------------------------------------------------- #
def _pages_table():
    rows = [
        ("http://a.example/p1",
         b"<title>P1</title>"
         b'<meta name="description" content="first page">'
         b'<link rel="canonical" href="/canon">'
         b'<meta name="robots" content="noindex">'),
        ("http://a.example/p2", b"<p>no head signals</p>"),
        ("http://b.example/p3",
         b'<link rel="canonical" href="HTTP://B.example:80/Canon">'),
    ]
    return pa.table({
        "url": pa.array([r[0] for r in rows]),
        "html": pa.array([r[1] for r in rows], pa.binary()),
    })


def test_extract_page_metadata_stage():
    out = (
        extract_page_metadata(ray.data.from_arrow(_pages_table()))
        .to_pandas().set_index("url").sort_index()
    )
    p1 = out.loc["http://a.example/p1"]
    assert p1["title"] == "P1"
    assert p1["meta_description"] == "first page"
    # relative canonical resolved against the page URL
    assert p1["canonical_url"] == "http://a.example/canon"
    assert bool(p1["noindex"]) is True and bool(p1["nofollow"]) is False
    p2 = out.loc["http://a.example/p2"]
    assert p2["title"] is None and p2["canonical_url"] is None
    # absolute canonical is canonicalized (host lowercased, :80 dropped)
    assert out.loc["http://b.example/p3"]["canonical_url"] == \
        "http://b.example/Canon"


# --------------------------------------------------------------------------- #
# canonical_dedup: serial oracle + invariance + edges
# --------------------------------------------------------------------------- #
def _mk_corpus(n=60, group=4):
    """Groups of ``group`` pages; member 0 IS the canonical target, the rest
    declare rel=canonical to it. Every 5th group's target is MISSING from
    the corpus (members still cluster; min-url wins)."""
    urls, htmls = [], []
    for i in range(n):
        g, m = divmod(i, group)
        target = f"http://h{g % 7}.example/canon/{g}"
        if m == 0:
            if g % 5 == 4:
                continue  # drop the target page for these groups
            urls.append(target)
            htmls.append(b"<title>target</title>")
        else:
            urls.append(f"http://h{g % 7}.example/d/{i}")
            htmls.append(
                f'<link rel="canonical" href="{target}">'.encode())
    return pa.table({
        "url": pa.array(urls),
        "html": pa.array(htmls, pa.binary()),
    })


def _serial_canonical_oracle(t: pa.Table):
    from nightcrawlercmd_ray.stages.pagemeta import parse_page_metadata

    rows = []
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        cu = canonicalize(url) or url
        p = parse_page_metadata(html)
        key = cu
        if p.canonical_href is not None:
            tgt = to_abs_url(cu, p.canonical_href)
            if tgt is not None:
                key = tgt
        rows.append((url, key, key == cu))
    winners = {}
    for url, key, is_self in rows:
        cand = (0 if is_self else 1, url)
        if key not in winners or cand < winners[key]:
            winners[key] = cand
    return {url: (key, winners[key][1] == url) for url, key, _ in rows}


@pytest.mark.parametrize("nparts", [1, 6])
def test_canonical_dedup_vs_serial(nparts):
    t = _mk_corpus()
    exp = _serial_canonical_oracle(t)
    out = (
        canonical_dedup(ray.data.from_arrow(t).repartition(nparts),
                        num_partitions=5)
        .to_pandas()
    )
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        key, win = exp[r["url"]]
        assert r["canonical_target"] == key, r["url"]
        assert bool(r["is_winner"]) is win, r["url"]
    # exactly one winner per cluster
    per = out.groupby("canonical_target")["is_winner"].sum()
    assert (per == 1).all()


def test_canonical_dedup_chain_is_single_hop():
    # A -> B, B -> C: B belongs to C's cluster, A's cluster targets B
    t = pa.table({
        "url": ["http://x.example/a", "http://x.example/b",
                "http://x.example/c"],
        "html": [
            b'<link rel="canonical" href="http://x.example/b">',
            b'<link rel="canonical" href="http://x.example/c">',
            b"<p>plain target</p>",
        ],
    })
    out = (canonical_dedup(ray.data.from_arrow(t), num_partitions=2)
           .to_pandas().set_index("url"))
    assert out.loc["http://x.example/a"]["canonical_target"].endswith("/b")
    assert out.loc["http://x.example/b"]["canonical_target"].endswith("/c")
    # A is alone in the /b cluster (B itself moved on) -> A wins by min-url
    assert bool(out.loc["http://x.example/a"]["is_winner"]) is True
    # C is the self-declared member of the /c cluster -> C wins over B
    assert bool(out.loc["http://x.example/c"]["is_winner"]) is True
    assert bool(out.loc["http://x.example/b"]["is_winner"]) is False
