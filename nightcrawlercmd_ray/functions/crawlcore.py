"""Per-page crawl processing — shared by the serial oracle and the distributed
fetch/extract tasks so candidate ordering is defined in exactly one place.

Semantics: ``AfterCrawlFn`` (``/root/reference/mainCrawler.go:157-198``) —
redirect Location, follow/don't-follow filtered hrefs, optional resources —
plus the engine's pinned candidate ordering: for each fetched page the
candidate list is ``[redirect location] + [followed hrefs, document order] +
[resources, document order]``; ``link_pos`` is the index into that list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .extractors import content_mime, follow_link, is_redirect
from .htmlparse import ParsedPage, parse_html
from .urlnorm import host_of, to_abs_url


@dataclass
class PageOutcome:
    status: int = 0
    abs_location: str = ""
    content_type: str = ""
    error: str = ""
    text: str = ""
    title: str = ""
    n_links: int = 0
    # link occurrence rows: (href_raw, abs_url_or_empty, same_host)
    links: list[tuple[str, str, bool]] = field(default_factory=list)
    # candidates for the next wave, in pinned order (canonical urls)
    candidates: list[str] = field(default_factory=list)
    parsed: ParsedPage | None = None


def process_fetched_page(
    url: str,
    host: str,
    row: dict | None,
    *,
    no_new_links: bool = False,
    follow: list[str] | None = None,
    dont_follow: list[str] | None = None,
    load_resources: bool = False,
    want_parsed: bool = False,
) -> PageOutcome:
    """``row`` = {html, status, location, content_type} or None (dead URL)."""
    out = PageOutcome()
    if row is None:
        out.error = "not found"
        return out
    out.status = int(row.get("status", 200))
    out.content_type = content_mime(row.get("content_type", "text/html"))
    location = row.get("location", "") or ""
    if is_redirect(out.status) and location:
        loc_abs = to_abs_url(url, location)
        if loc_abs:
            out.abs_location = loc_abs
            out.candidates.append(loc_abs)
    if out.status == 200 and out.content_type == "text/html":
        parsed = parse_html(row["html"])
        out.text = parsed.text
        out.title = parsed.title
        if want_parsed:
            out.parsed = parsed
        if not no_new_links:
            raw_links = [
                h for h in parsed.hrefs if follow_link(h, follow, dont_follow)
            ]
            if load_resources:
                raw_links += parsed.resources
            for raw in raw_links:
                a = to_abs_url(url, raw)
                out.links.append((raw, a or "", bool(a) and host_of(a) == host))
                if a is not None:
                    out.candidates.append(a)
            out.n_links = len(raw_links)
    return out
