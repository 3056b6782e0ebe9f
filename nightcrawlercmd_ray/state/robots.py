"""robots.txt parsing + gate — engine addition mandated by the north rule.

The reference has no robots handling; the spec here is the standard
(RFC 9309-style) subset the engine pins:

- only ``User-agent: *`` groups apply (the engine advertises no product token);
- ``Allow`` / ``Disallow`` are path **prefixes** (no wildcards); the most
  specific (longest) matching rule wins; ties → Allow; no match → allowed;
- empty ``Disallow:`` means allow-all;
- ``Crawl-delay: <seconds>`` is honored as the host's politeness delay when it
  exceeds the configured one.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit


@dataclass
class RobotsRules:
    allows: list[str] = field(default_factory=list)
    disallows: list[str] = field(default_factory=list)
    crawl_delay_ms: int | None = None

    def allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for p in self.allows:
            if p and path.startswith(p) and len(p) >= best_len:
                # ties → Allow: >= lets an equal-length Allow win
                best_len, best_allow = len(p), True
        for p in self.disallows:
            if p and path.startswith(p) and len(p) > best_len:
                best_len, best_allow = len(p), False
        return best_allow


def parse_robots(body: bytes | str) -> RobotsRules:
    if isinstance(body, (bytes, bytearray, memoryview)):
        body = bytes(body).decode("utf-8", "replace")
    rules = RobotsRules()
    in_star_group = False
    seen_any_ua = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            seen_any_ua = True
            in_star_group = val == "*"
        elif not seen_any_ua:
            continue  # rules before any User-agent line are ignored
        elif in_star_group:
            if key == "disallow":
                if val:
                    rules.disallows.append(val)
            elif key == "allow":
                if val:
                    rules.allows.append(val)
            elif key == "crawl-delay":
                try:
                    rules.crawl_delay_ms = int(float(val) * 1000)
                except ValueError:
                    pass
    return rules


def url_path(canonical_url: str) -> str:
    parts = urlsplit(canonical_url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    return path


def robots_url(host: str, scheme: str = "http") -> str:
    return f"{scheme}://{host}/robots.txt"
