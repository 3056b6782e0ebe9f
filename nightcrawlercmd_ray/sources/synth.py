"""Deterministic synthetic web corpus — the sandbox's "HTTP universe".

Generates the Common-Crawl-style ``pages`` Parquet table of
``BASELINE.json.input_hint`` (``url, warc_ts, html, text, lang``) plus the
``fetch_meta`` sidecar (``url, status, location, content_type, fetch_ms``) per
FIXTURES.md §1-2, a seed list, and per-host robots.txt pages. No external data;
every value derives from ``hash64(f"{seed}:{kind}:{index}")`` only (no wall
clock, no iteration-order dependence), so any scale regenerates bit-identically.

The ``text`` column is the golden HTML→text extraction, produced by the SAME
pinned spec (``functions.htmlparse.html_to_text``) the engine must match
byte-identically — the north-rule invariant is then that the *distributed*
pipeline reproduces it for every fetched url at any parallelism.

The grammar mirrors what the reference's extractor consumes
(``/root/reference/mainCrawler.go:179,191-195``, ``mainReport.go:162-169,342-349``):
relative/absolute/cross-host/fragment/empty hrefs, forms with inputs,
img/link/script resources, entities, comments, nested tags, a hot-host skew
knob, redirect chains and non-HTML pages.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.htmlparse import html_to_text
from ..functions.urlnorm import hash64, host_hash

_WORDS_EN = (
    "the and of to in is that it for was on are with as they this have from "
    "crawl engine data stream frontier queue politeness robots filter shard "
    "wave batch arrow column vector table schema index merge sorted unique"
).split()
_WORDS_DE = (
    "der die das und ist nicht eine mit auf für von den sich auch als werden "
    "seite daten strom warteschlange tabelle spalte eindeutig sortiert"
).split()
_WORDS_FR = (
    "le la les et est pas une des dans pour que qui sur avec par page "
    "données flux file attente tableau colonne unique trié fusion"
).split()
_LANG_WORDS = {"en": _WORDS_EN, "de": _WORDS_DE, "fr": _WORDS_FR}
_LANGS = ("en", "de", "fr")

_BASE_TS_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in µs


@dataclass
class CorpusSpec:
    n_pages: int = 200
    n_hosts: int = 8
    hot_frac: float = 0.3  # share of pages owned by host 0 (skew knob)
    seed: int = 42
    redirect_frac: float = 0.05
    nonhtml_frac: float = 0.05
    error_frac: float = 0.03
    private_frac: float = 0.1  # pages under /private/ (robots-gated)
    max_links: int = 12
    rich_text: int = 1  # paragraph multiplier (heavier pages for bench)
    # seed-list width: N seed URLs per host. The 10^10-URL design point runs
    # with millions of seeds, so BFS reaches full machine width in ~1 wave;
    # >1 here makes bench corpora ramp the same way.
    seeds_per_host: int = 1


def _host_name(k: int) -> str:
    return f"host-{k:03d}.test"


def page_host_index(spec: CorpusSpec, i: int) -> int:
    r = random.Random(hash64(f"{spec.seed}:host:{i}"))
    if spec.n_hosts > 1 and r.random() < spec.hot_frac:
        return 0
    return r.randrange(spec.n_hosts) if spec.n_hosts > 1 else 0


def page_url(spec: CorpusSpec, i: int) -> str:
    host = _host_name(page_host_index(spec, i))
    r = random.Random(hash64(f"{spec.seed}:path:{i}"))
    x = r.random()
    if x < spec.private_frac:
        return f"http://{host}/private/p/{i}"
    if x < spec.private_frac + 0.1:  # query-string pages (querykeys report)
        return f"http://{host}/q?id={i}&page={i // 100}"
    return f"http://{host}/p/{i // 100}/{i}"


def host_lang(host: str) -> str:
    return _LANGS[host_hash(host) % 3]


def _sentence(r: random.Random, words: list[str], n: int) -> str:
    return " ".join(r.choice(words) for _ in range(n))


def build_page_html(spec: CorpusSpec, i: int) -> bytes:
    """Seeded HTML grammar for page i (pure function of (spec.seed, i))."""
    r = random.Random(hash64(f"{spec.seed}:html:{i}"))
    url = page_url(spec, i)
    host = url.split("/")[2]
    words = _LANG_WORDS[host_lang(host)]
    parts: list[str] = [
        "<!DOCTYPE html><html><head>",
        f"<title>Page {i} &amp; {_sentence(r, words, 2)}</title>",
        '<meta charset="utf-8"><link href="/static/style.css" rel="stylesheet">',
        "<script>var tracker = 'skip-me';</script>",
        "<style>body { color: red }</style>",
        "</head><body>",
        f"<!-- comment {i} -->",
        f"<h1>{_sentence(r, words, 3)} &#x41;</h1>",
    ]
    # paragraphs with nested inline tags + entities + whitespace variation
    for p in range(r.randint(1, 4) * spec.rich_text):
        parts.append(
            f"<p>{_sentence(r, words, r.randint(5, 18))} "
            f"<b>{r.choice(words)}</b>\n\t {_sentence(r, words, 3)} &amp; "
            f"<i>{r.choice(words)}</i>.</p>"
        )
    # links
    n_links = r.randint(0, spec.max_links)
    for L in range(n_links):
        kind = r.random()
        target = r.randrange(spec.n_pages)
        turl = page_url(spec, target)
        tpath = "/" + turl.split("/", 3)[3]
        if kind < 0.45:  # relative same-host form
            href = tpath if turl.split("/")[2] == host else turl
        elif kind < 0.8:  # absolute (same or cross host)
            href = turl
        elif kind < 0.88:
            href = "#frag-" + str(L)  # fragment-only → canonicalizes to page itself
        elif kind < 0.93:
            href = ""  # empty href — skipped by extraction
        else:
            href = "mailto:someone@example.test"  # non-http → dropped at canon
        parts.append(f'<a href="{href}">{_sentence(r, words, 2)}</a> ')
    # forms
    for f in range(r.randint(0, 2)):
        parts.append(f'<form action="/search/{f}" method="{r.choice(["get", "post"])}">')
        for inp in range(r.randint(0, 4)):
            parts.append(
                f'<input name="q{inp}" type="{r.choice(["text", "hidden"])}" value="v{inp}">'
            )
        parts.append("</form>")
    # resources
    if r.random() < 0.6:
        parts.append(f'<img src="/img/{i % 50}.png">')
    if r.random() < 0.3:
        parts.append('<script src="/js/app.js"></script>')
    # sprinkle whitelist violations to exercise the validator (M13)
    if r.random() < 0.25:
        parts.append(f"<blink>deprecated {r.choice(words)}</blink>")
    if r.random() < 0.25:
        parts.append(f'<p custom-attr="x{i}">{r.choice(words)}</p>')
    # querystring link to exercise query-key report
    if r.random() < 0.3:
        parts.append(f'<a href="{page_url(spec, r.randrange(spec.n_pages))}?q={i}&lang={host_lang(host)}">q</a>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def robots_body(spec: CorpusSpec, host_idx: int) -> bytes:
    r = random.Random(hash64(f"{spec.seed}:robots:{host_idx}"))
    lines = ["User-agent: *"]
    if r.random() < 0.7:
        lines.append("Disallow: /private/")
    if r.random() < 0.3:
        lines.append(f"Crawl-delay: {r.choice([1, 2])}")
    lines.append("Allow: /")
    return "\n".join(lines).encode()


def page_status(spec: CorpusSpec, i: int) -> tuple[int, str]:
    """(status, location) for page i — fetch_meta sidecar values."""
    r = random.Random(hash64(f"{spec.seed}:status:{i}"))
    x = r.random()
    if x < spec.redirect_frac:
        status = r.choice([301, 302, 307])
        target = page_url(spec, r.randrange(spec.n_pages))
        return status, target
    if x < spec.redirect_frac + spec.error_frac:
        return r.choice([404, 500]), ""
    return 200, ""


def page_content_type(spec: CorpusSpec, i: int) -> str:
    r = random.Random(hash64(f"{spec.seed}:ct:{i}"))
    if r.random() < spec.nonhtml_frac:
        return r.choice(["text/plain", "application/json"])
    return "text/html; charset=utf-8"


def generate_corpus(
    out_dir: str, spec: CorpusSpec, rows_per_file: int = 50_000
) -> dict:
    """Write pages.parquet + fetch_meta.parquet + seeds.txt under out_dir.

    Pages include one /robots.txt row per host. Returns a manifest dict.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    m_url, m_status, m_loc, m_ct, m_ms = [], [], [], [], []

    def add_page(url: str, ts_us: int, html: bytes, lang: str, status: int,
                 location: str, ctype: str, fetch_ms: int) -> None:
        mime_html = ctype.split(";")[0].strip() == "text/html"
        urls.append(url)
        tss.append(ts_us)
        htmls.append(html)
        texts.append(html_to_text(html) if (status == 200 and mime_html) else "")
        langs.append(lang)
        m_url.append(url)
        m_status.append(status)
        m_loc.append(location)
        m_ct.append(ctype)
        m_ms.append(fetch_ms)

    for k in range(spec.n_hosts):
        host = _host_name(k)
        add_page(
            f"http://{host}/robots.txt", _BASE_TS_US, robots_body(spec, k),
            host_lang(host), 200, "", "text/plain", 1 + k % 7,
        )
    for i in range(spec.n_pages):
        url = page_url(spec, i)
        status, location = page_status(spec, i)
        ctype = page_content_type(spec, i)
        html = build_page_html(spec, i) if status == 200 else b""
        host = url.split("/")[2]
        add_page(
            url, _BASE_TS_US + i * 1_000_000, html, host_lang(host),
            status, location, ctype, 1 + (hash64(f"ms:{i}") % 500),
        )

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(tss, dtype=np.int64), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    meta = pa.table(
        {
            "url": pa.array(m_url, pa.string()),
            "status": pa.array(m_status, pa.int16()),
            "location": pa.array(m_loc, pa.string()),
            "content_type": pa.array(m_ct, pa.string()),
            "fetch_ms": pa.array(m_ms, pa.int32()),
        }
    )
    pq.write_table(pages, f"{out_dir}/pages.parquet", row_group_size=rows_per_file)
    pq.write_table(meta, f"{out_dir}/fetch_meta.parquet", row_group_size=rows_per_file)

    # seeds: root page of every host that owns pages, in host order
    seed_urls = []
    seen_hosts = set()
    for i in range(spec.n_pages):
        h = page_url(spec, i).split("/")[2]
        if h not in seen_hosts:
            seen_hosts.add(h)
            seed_urls.append(page_url(spec, i))
        if len(seed_urls) >= spec.n_hosts:
            break
    with open(f"{out_dir}/seeds.txt", "w") as f:
        f.write("\n".join(seed_urls) + "\n")
    return {
        "n_pages": pages.num_rows,
        "n_hosts": spec.n_hosts,
        "seeds": seed_urls,
        "dir": out_dir,
    }


def _build_rows(spec: CorpusSpec, indices: list[int]) -> tuple[pa.Table, pa.Table]:
    """pages + fetch_meta rows for page indices (pure function of spec+index)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    m_status, m_loc, m_ct, m_ms = [], [], [], []
    for i in indices:
        url = page_url(spec, i)
        status, location = page_status(spec, i)
        ctype = page_content_type(spec, i)
        html = build_page_html(spec, i) if status == 200 else b""
        host = url.split("/")[2]
        mime_html = ctype.split(";")[0].strip() == "text/html"
        urls.append(url)
        tss.append(_BASE_TS_US + i * 1_000_000)
        htmls.append(html)
        texts.append(html_to_text(html) if (status == 200 and mime_html) else "")
        langs.append(host_lang(host))
        m_status.append(status)
        m_loc.append(location)
        m_ct.append(ctype)
        m_ms.append(1 + (hash64(f"ms:{i}") % 500))
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(tss, dtype=np.int64), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    meta = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "status": pa.array(m_status, pa.int16()),
            "location": pa.array(m_loc, pa.string()),
            "content_type": pa.array(m_ct, pa.string()),
            "fetch_ms": pa.array(m_ms, pa.int32()),
        }
    )
    return pages, meta


def generate_corpus_ray(out_dir: str, spec: CorpusSpec, num_blocks: int = 64) -> dict:
    """Ray-parallel corpus generation for bench-scale corpora: page building +
    golden text extraction fan out over the cluster; ``pages.parquet`` /
    ``fetch_meta.parquet`` become DIRECTORIES of part files (every reader here
    and in pyarrow accepts a dataset directory path). Content is a pure
    function of (seed, page index) — partitioning cannot change it."""
    import os

    import ray

    os.makedirs(f"{out_dir}/pages.parquet", exist_ok=True)
    os.makedirs(f"{out_dir}/fetch_meta.parquet", exist_ok=True)
    chunk = (spec.n_pages + num_blocks - 1) // num_blocks

    @ray.remote
    def build_chunk(b: int) -> int:
        lo, hi = b * chunk, min((b + 1) * chunk, spec.n_pages)
        if lo >= hi:
            return 0
        pages, meta = _build_rows(spec, list(range(lo, hi)))
        pq.write_table(pages, f"{out_dir}/pages.parquet/part-{b:05d}.parquet")
        pq.write_table(meta, f"{out_dir}/fetch_meta.parquet/part-{b:05d}.parquet")
        return pages.num_rows

    n = sum(ray.get([build_chunk.remote(b) for b in range(num_blocks)]))
    # robots rows: one tiny extra part (serial)
    r_urls, r_html = [], []
    for k in range(spec.n_hosts):
        host = _host_name(k)
        r_urls.append(f"http://{host}/robots.txt")
        r_html.append(robots_body(spec, k))
    robots = pa.table(
        {
            "url": pa.array(r_urls, pa.string()),
            "warc_ts": pa.array(
                np.full(len(r_urls), _BASE_TS_US, dtype=np.int64), pa.timestamp("us")
            ),
            "html": pa.array(r_html, pa.binary()),
            "text": pa.array([""] * len(r_urls), pa.string()),
            "lang": pa.array([host_lang(h.split("/")[2]) for h in r_urls], pa.string()),
        }
    )
    pq.write_table(robots, f"{out_dir}/pages.parquet/part-robots.parquet")
    robots_meta = pa.table(
        {
            "url": pa.array(r_urls, pa.string()),
            "status": pa.array([200] * len(r_urls), pa.int16()),
            "location": pa.array([""] * len(r_urls), pa.string()),
            "content_type": pa.array(["text/plain"] * len(r_urls), pa.string()),
            "fetch_ms": pa.array([1] * len(r_urls), pa.int32()),
        }
    )
    pq.write_table(robots_meta, f"{out_dir}/fetch_meta.parquet/part-robots.parquet")

    seed_urls = []
    per_host: dict[str, int] = {}
    target = spec.n_hosts * max(1, spec.seeds_per_host)
    for i in range(spec.n_pages):
        u = page_url(spec, i)
        h = u.split("/")[2]
        c = per_host.get(h, 0)
        if c < max(1, spec.seeds_per_host):
            per_host[h] = c + 1
            seed_urls.append(u)
        if len(seed_urls) >= target:
            break
    with open(f"{out_dir}/seeds.txt", "w") as f:
        f.write("\n".join(seed_urls) + "\n")
    return {
        "n_pages": n + len(r_urls),
        "n_hosts": spec.n_hosts,
        "seeds": seed_urls,
        "dir": out_dir,
    }
