"""Serial crawl oracle — the pinned §3.1 specification, executed one URL at a
time with plain dicts. The distributed engine (pipelines/crawl.py) must
produce EXACTLY these outputs at any parallelism / shard count; pytest enforces
it (SURVEY §5.2-5.3).

This is an independent implementation of the ordering contract: it shares only
the pure per-record functions (canonicalization, extraction, robots parsing)
with the engine — no frontier/actor/Dataset machinery.

Reference semantics reproduced (with the documented determinism pins):
seed ingestion ``/root/reference/mainCrawler.go:100-140``; dedup-on-enqueue
``:110-136``; follow filters + redirect + resources ``:157-198``; politeness
``:45,81``; max-pages stop ``:149-155``; scope ``:106,138``.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..functions.crawlcore import process_fetched_page
from ..functions.urlnorm import canonicalize, host_hash, host_of, to_abs_url
from ..state.robots import parse_robots, url_path


@dataclass
class CrawlParams:
    seeds: list[str] = field(default_factory=list)
    base_url: str | None = None
    scope_to_domain: bool = True  # only effective when base_url is set
    max_pages: int = -1
    no_new_links: bool = False
    follow: list[str] = field(default_factory=list)
    dont_follow: list[str] = field(default_factory=list)
    load_resources: bool = False
    default_delay_ms: int = 500
    per_host_delay_ms: dict[str, int] = field(default_factory=dict)
    window_ms: int = 2000
    respect_robots: bool = True
    max_waves: int = 10_000


@dataclass
class CrawlResult:
    # one row per fetch, in global crawl order
    fetches: list[dict] = field(default_factory=list)
    # one row per extracted link occurrence (src in fetch order, doc order)
    links: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    text_by_url: dict[str, str] = field(default_factory=dict)
    counters: dict = field(default_factory=dict)


def crawl_oracle(universe: dict[str, dict], params: CrawlParams) -> CrawlResult:
    """``universe``: canonical url -> {html: bytes, status: int, location: str,
    content_type: str} (the pages+fetch_meta tables as a dict)."""
    res = CrawlResult()
    lanes: dict[str, deque[tuple[str, int]]] = {}
    robots_cache: dict[str, object | None] = {}
    counters = {
        "dup_dropped": 0, "robots_blocked": 0, "scope_dropped": 0,
        "enqueued": 0, "not_found": 0,
    }

    base_host = host_of(canonicalize(params.base_url)) if params.base_url else None
    scope_host = base_host if (params.base_url and params.scope_to_domain) else None

    def robots_for(host: str):
        if host not in robots_cache:
            row = universe.get(f"http://{host}/robots.txt")
            robots_cache[host] = parse_robots(row["html"]) if row else None
        return robots_cache[host]

    def delay_ms(host: str) -> int:
        d = params.per_host_delay_ms.get(host, params.default_delay_ms)
        if params.respect_robots:
            r = robots_for(host)
            if r is not None and r.crawl_delay_ms is not None:
                d = max(d, r.crawl_delay_ms)
        return max(1, d)

    def enqueue(candidates: list[tuple[str, int]]) -> None:
        """Dedup + robots-gate + lane-append, in discovery order.
        Items are (canonical_url, depth) with depth = src_depth + 1."""
        for url, depth in candidates:
            host = host_of(url)
            if scope_host is not None and host != scope_host:
                counters["scope_dropped"] += 1
                continue
            if params.respect_robots:
                r = robots_for(host)
                if r is not None and not r.allowed(url_path(url)):
                    counters["robots_blocked"] += 1
                    continue
            if url in res.seen:
                counters["dup_dropped"] += 1
                continue
            res.seen.add(url)
            lanes.setdefault(host, deque()).append((url, depth))
            counters["enqueued"] += 1

    # ---- seed ingestion (mainCrawler.go:100-140) ---------------------------
    seed_candidates = []
    for s in params.seeds:
        u = to_abs_url(params.base_url, s) if params.base_url else to_abs_url(None, s)
        if u is not None:
            seed_candidates.append((u, 0))
    enqueue(seed_candidates)

    # ---- BSP wave loop -----------------------------------------------------
    seq = 0
    done = False
    for wave in range(params.max_waves):
        if done or not lanes:
            break
        # emit the wave: ticks × hosts sorted by (host_hash, host)
        wave_rows: list[tuple[int, str, str, int]] = []  # (tick, host, url, depth)
        budgets = {h: max(1, params.window_ms // delay_ms(h)) for h in lanes}
        hosts = sorted(lanes, key=lambda h: (host_hash(h), h))
        tick = 0
        active = [h for h in hosts if lanes[h]]
        while active:
            nxt = []
            for h in active:
                url, depth = lanes[h].popleft()
                wave_rows.append((tick, h, url, depth))
                if lanes[h] and tick + 1 < budgets[h]:
                    nxt.append(h)
            tick += 1
            active = nxt
        for h in [h for h in list(lanes) if not lanes[h]]:
            del lanes[h]
        # max-pages truncation on the ordered wave (mainCrawler.go:149-155)
        if params.max_pages >= 0:
            remaining = params.max_pages - len(res.fetches)
            if remaining <= 0:
                break
            if len(wave_rows) > remaining:
                wave_rows = wave_rows[:remaining]
                done = True

        # fetch + extract + collect next-wave candidates, in wave order
        next_candidates: list[tuple[str, int]] = []
        for tick_, host, url, depth in wave_rows:
            row = universe.get(url)
            o = process_fetched_page(
                url, host, row,
                no_new_links=params.no_new_links,
                follow=params.follow, dont_follow=params.dont_follow,
                load_resources=params.load_resources,
            )
            if o.error:
                counters["not_found"] += 1
            if o.status == 200 and o.content_type == "text/html":
                res.text_by_url[url] = o.text
            for raw, abs_url, same in o.links:
                res.links.append(
                    {"src_url": url, "href": raw, "abs_url": abs_url, "same_host": same}
                )
            res.fetches.append(
                {"wave": wave, "seq": seq, "tick": tick_, "url": url,
                 "host": host, "depth": depth, "status": o.status,
                 "location": o.abs_location, "content_type": o.content_type,
                 "error": o.error, "n_links": o.n_links}
            )
            seq += 1
            next_candidates.extend((c, depth + 1) for c in o.candidates)
        if not done:
            enqueue(next_candidates)

    res.counters = counters
    return res


def universe_from_tables(pages, fetch_meta=None) -> dict[str, dict]:
    """Build the url→row dict from pyarrow pages (+ optional fetch_meta)."""
    uni: dict[str, dict] = {}
    purls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    for u, h in zip(purls, htmls):
        uni[u] = {"html": h, "status": 200, "location": "", "content_type": "text/html"}
    if fetch_meta is not None:
        for u, s, loc, ct in zip(
            fetch_meta.column("url").to_pylist(),
            fetch_meta.column("status").to_pylist(),
            fetch_meta.column("location").to_pylist(),
            fetch_meta.column("content_type").to_pylist(),
        ):
            if u in uni:
                uni[u].update(status=int(s), location=loc or "", content_type=ct or "")
    return uni
