"""URL canonicalization, absolutization and stable hashing.

Semantics source (reference, cited for parity — no code copied):
- URL parse + absolutize against a base URL: ``/root/reference/mainCrawler.go:100-140``
  (``url.Parse`` + ``crawlbase.ToAbsUrl``; relative seed URLs resolved against the
  base, absolute-only kept when no base).
- Same-host scope predicate: ``mainCrawler.go:54,83,106,138``
  (``RemoveLinksNotSameHost`` / ``ScopeToDomain``).

The engine additionally *canonicalizes* URLs (the reference dedupes on the raw
string); the canonical form is the key of the URL-seen filter and of all
shuffles, so it is pinned here once and reused by the distributed pipeline, the
serial oracle and the tests:

- scheme and host lowercased
- default port stripped (``:80`` for http, ``:443`` for https)
- fragment stripped
- path dot-segments removed (RFC 3986 §5.2.4); empty path -> ``/``
- query string preserved byte-for-byte (reference treats it as opaque)

All hashes are 64-bit, derived from ``hashlib.blake2b`` (stable across
processes, machines and Python versions — required for shard routing and for
checkpoint/resume equality).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}

# Already-canonical fast path: lowercase http(s) scheme, lowercase ASCII host
# with no trailing dot / port / userinfo / brackets, a non-empty path whose
# segments are never exactly "." or "..", an optional query, no fragment, no
# ASCII control/space characters anywhere. A URL matching this is a fixpoint
# of canonicalize() (differentially pinned in tests/test_urlnorm.py), so the
# whole urlsplit → normalize → urlunsplit round trip can be skipped. The
# match is deliberately conservative — anything unusual falls to the full
# path, never the other way.
_CANONICAL_RE = re.compile(
    r"https?://"
    r"[a-z0-9-]+(?:\.[a-z0-9-]+)*"                 # host (structure bars trailing '.')
    r"(?:/(?!\.\.?(?:[/?#]|$))[^\x00-\x20/?#]*)+"  # path, no '.'/'..' segments
    r"(?:\?[^\x00-\x20#]+)?"                       # non-empty query (a bare '?'
    r"$"                                           #  is dropped by urlunsplit)
)
_NETLOC_END_RE = re.compile(r"[/?#]")


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if not path:
        return path
    output: list[str] = []
    # Work segment-wise; preserve leading/trailing slash structure.
    leading = path.startswith("/")
    segs = path.split("/")
    for i, seg in enumerate(segs):
        if seg == ".":
            if i == len(segs) - 1:
                output.append("")  # trailing "/." -> "/"
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
            if i == len(segs) - 1:
                output.append("")  # trailing "/.." -> "/"
            continue
        output.append(seg)
    out = "/".join(output)
    if leading and not out.startswith("/"):
        out = "/" + out
    return out


def canonicalize(url: str) -> str | None:
    """Canonical form of an absolute URL, or None if not absolute/parsable.

    Only http(s)-like URLs with a network host are considered in-universe
    (the reference only ever fetches http(s) URLs).
    """
    if not url:
        return None
    if url.isascii() and _CANONICAL_RE.match(url) is not None:
        return url  # already canonical — skip the split/normalize round trip
    return _canonicalize_full(url)


def _canonicalize_full(url: str) -> str | None:
    """The full split → normalize → unsplit path (fast-path reference)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower().rstrip(".")
    # urlsplit().hostname strips IPv6 brackets — re-add them, else the
    # rebuilt netloc re-parses as (host "::1" → port error) and the function
    # loses its fixpoint property (canonicalize(canonicalize(u)) == c(u))
    netloc = f"[{host}]" if ":" in host else host
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        userinfo = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{userinfo}@{netloc}"
    path = _remove_dot_segments(parts.path) or "/"
    out = urlunsplit((scheme, netloc, path, parts.query, ""))
    if out != out.rstrip():
        # dropping the fragment can expose trailing whitespace (e.g.
        # "a\x0c#f" → "a\x0c") that the entry strip() would then remove on a
        # SECOND pass — re-canonicalize so the function is a fixpoint
        # (seen-set equality across checkpoint round-trips depends on it)
        return _canonicalize_full(out)
    return out


def to_abs_url(base: str | None, link: str) -> str | None:
    """Resolve ``link`` against ``base`` (RFC 3986 join) and canonicalize.

    With no base, only already-absolute links survive — the semantics of the
    seed-list ingestion at ``mainCrawler.go:117-140``.
    """
    link = (link or "").strip()
    if not link:
        return None
    if base:
        # fast path: an absolute http(s) link with a real netloc comes out of
        # the RFC 3986 join canonicalize-equivalent, so the join is skipped.
        # Excluded (they take the full join): scheme-prefixed relative forms
        # ("http:x"), and empty-netloc forms ("http://", "http:///p",
        # "http://?q") where urljoin substitutes the BASE's netloc.
        j = (7 if link.startswith("http://")
             else 8 if link.startswith("https://") else 0)
        if j == 0 or link[j : j + 1] in ("", "/", "?", "#"):
            try:
                link = urljoin(base, link)
            except ValueError:
                return None
    return canonicalize(link)


def host_of(canonical_url: str) -> str:
    """Hostname (lowercased, port stripped) of an already-canonical URL."""
    u = canonical_url
    # fast path: slice the netloc out directly for the overwhelmingly common
    # plain shape — no userinfo ('@'), no IPv6 bracket; port (last ':') is
    # stripped like urlsplit().hostname. Equivalence pinned differentially
    # in tests/test_urlnorm.py.
    i = u.find("://")
    # the prefix must be a plain alphabetic scheme, else urlsplit doesn't
    # treat what follows as a netloc at all (e.g. ':://h' has no scheme)
    if 0 < i and u.isascii() and u[:i].isalpha():
        m = _NETLOC_END_RE.search(u, i + 3)
        netloc = u[i + 3 : m.start()] if m else u[i + 3 :]
        if "@" not in netloc and "[" not in netloc:
            k = netloc.find(":")  # hostname ends at the FIRST ':' (urlsplit)
            return (netloc if k < 0 else netloc[:k]).lower()
    return _host_of_full(canonical_url)


def _host_of_full(canonical_url: str) -> str:
    """The full urlsplit path (fast-path reference)."""
    try:
        return urlsplit(canonical_url).hostname or ""
    except ValueError:
        return ""


def registrable_host(canonical_url: str) -> str:
    """Politeness/scope key. The reference scopes and rate-limits per full
    hostname (``RemoveLinksNotSameHost``, one serial fetch stream), so the
    registrable host IS the hostname here; a public-suffix-aware variant can
    be slotted in without touching callers."""
    return host_of(canonical_url)


def same_host(canonical_url: str, base_host: str) -> bool:
    """Scope predicate of ``mainCrawler.go:106,138`` (host equality)."""
    return host_of(canonical_url) == base_host


def hash64(data: str | bytes) -> int:
    """Stable unsigned 64-bit hash (blake2b/8). Used for url_hash, host_hash,
    shard routing, cuckoo fingerprints and checkpoint equality."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def url_hash(canonical_url: str) -> int:
    return hash64(canonical_url)


def host_hash(host: str) -> int:
    return hash64(host)


def shard_of(host: str, num_shards: int) -> int:
    """Frontier shard a host is routed to — ONE partitioning key reused across
    every crawl stage (SURVEY §4.3)."""
    return host_hash(host) % num_shards
