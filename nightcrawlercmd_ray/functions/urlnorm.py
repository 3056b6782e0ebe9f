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
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}


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
    netloc = host
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
        return canonicalize(out)
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
        try:
            link = urljoin(base, link)
        except ValueError:
            return None
    return canonicalize(link)


def host_of(canonical_url: str) -> str:
    """Hostname (lowercased, port stripped) of an already-canonical URL."""
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
