"""Regex extractor family, tokenizers and normalizers.

Parity targets in the reference (regex literals at
``/root/reference/mainWordlist.go:17-22``, dispatch ``:188-216``; text
extractor caps at ``mainReport.go:112-116,134-135``). The Go regexes are
re-expressed in Python syntax below; character-class quirks of the originals
are preserved and commented. No code is copied.

Documented intended-vs-literal deviations (SURVEY §5.5):
- ``string`` extractor: the reference pads its output with empty strings via a
  ``make(len)+append`` bug (``mainWordlist.go:203-207``); the engine implements
  the intended semantics (quoted spans, quotes trimmed, no padding).
- ``GetWordListFromText``/``GetUrlsFromText``/``GetIPsFromText`` live in the
  un-vendored ``crawlbase`` dep; their specs are pinned here (word tokens /
  absolute-URL-looking spans / dotted-quad spans, prefix-capped in document
  order — caps 2000/100/100 per ``mainReport.go:112-116,134-135``).
"""

from __future__ import annotations

import re

# mainWordlist.go:17 — `[a-zA-Z][a-z]{3,}`
RE_WORD = re.compile(r"[a-zA-Z][a-z]{3,}")
# mainWordlist.go:18 — `[a-zA-Z0-9]*[\/\\][a-zA-Z0-9-\._\\]{4,}`
RE_URL_REL = re.compile(r"[a-zA-Z0-9]*[/\\][a-zA-Z0-9\-._\\]{4,}")
# mainWordlist.go:19 — `[a-zA-Z]{2,}://[\w:-\\-\.\/]+`. The Go class contains
# the range 0x3A(':')–0x5C('\') i.e. `:;<=>?@A-Z[\` plus `\w - . /`.
RE_URL_ABS = re.compile(r"[a-zA-Z]{2,}://[\w:;<=>?@\[\\\-./]+")
# mainWordlist.go:20-21 — `"([[:print:]]*?)"` / `'([[:print:]]*?)'`
RE_STRING_DQ = re.compile(r"\"([ -~]*?)\"")
RE_STRING_SQ = re.compile(r"\'([ -~]*?)\'")
# mainWordlist.go:22 — umlaut-aware email regex
RE_EMAIL = re.compile(
    r"[a-zA-Z0-9_öäüÄÖÜß\-.]{3,}@[a-zA-Z0-9_öäüÄÖÜß.\-]{2,}\.[a-zA-Z0-9_öäüÄÖÜß.\-]{2,}"
)
# engine-pinned spec for crawlbase.GetIPsFromText (mainReport.go:115)
RE_IPV4 = re.compile(r"\b\d{1,3}(?:\.\d{1,3}){3}\b")


def extract(text: str, extractor: str) -> list[str]:
    """Extractor dispatch — semantics of ``mainWordlist.go:188-216``.

    ``url`` = rel ∪ abs with duplicates preserved until the pipeline's final
    distinct (``mainWordlist.go:196-198``); ``string`` = both quote styles,
    quotes trimmed; ``none`` = newline split.
    """
    if extractor == "word":
        return RE_WORD.findall(text)
    if extractor == "url_rel":
        return RE_URL_REL.findall(text)
    if extractor == "url_abs":
        return RE_URL_ABS.findall(text)
    if extractor == "url":
        return RE_URL_REL.findall(text) + RE_URL_ABS.findall(text)
    if extractor == "email":
        return RE_EMAIL.findall(text)
    if extractor == "string":
        spans = [m.group(0) for m in RE_STRING_DQ.finditer(text)]
        spans += [m.group(0) for m in RE_STRING_SQ.finditer(text)]
        return [s.strip("\"'") for s in spans]
    if extractor == "none":
        return text.split("\n")
    raise ValueError(f"extractor {extractor!r} not found")


EXTRACTORS = ("word", "url_rel", "url_abs", "url", "email", "string", "none")


def normalize_word(word: str, file_label: str = "") -> str:
    """lowercase + trim (+ optional `` [file]`` suffix) —
    ``mainWordlist.go:165-175``."""
    w = word.lower().strip()
    return f"{w} [{file_label}]" if file_label else w


def expand_template(template: str, word: str) -> str:
    """First ``<word>`` occurrence replaced, then lower+trim —
    ``mainWordlist.go:80-84``."""
    return template.replace("<word>", word, 1).lower().strip()


def words_from_text(text: str, cap: int = 2000) -> list[str]:
    """Pinned spec of ``crawlbase.GetWordListFromText`` (mainReport.go:134-135):
    word tokens in document order, first ``cap`` kept."""
    out = []
    for m in RE_WORD.finditer(text):
        out.append(m.group(0))
        if len(out) >= cap:
            break
    return out


def urls_from_text(text: str, cap: int = 100) -> list[str]:
    """Pinned spec of ``crawlbase.GetUrlsFromText`` (mainReport.go:112-114)."""
    out = []
    for m in RE_URL_ABS.finditer(text):
        out.append(m.group(0))
        if len(out) >= cap:
            break
    return out


def ips_from_text(text: str, cap: int = 100) -> list[str]:
    """Pinned spec of ``crawlbase.GetIPsFromText`` (mainReport.go:115-116)."""
    out = []
    for m in RE_IPV4.finditer(text):
        out.append(m.group(0))
        if len(out) >= cap:
            break
    return out


def contains_all(needles: list[str], text: str) -> bool:
    """links-follow conjunction — ``mainCrawler.go:209-216``."""
    return all(n in text for n in needles)


def contains_any(needles: list[str], text: str) -> bool:
    """links-not-follow disjunction — ``mainCrawler.go:200-207``."""
    return any(n in text for n in needles)


def follow_link(
    link: str, follow: list[str] | None, dont_follow: list[str] | None
) -> bool:
    """Follow/don't-follow predicate of ``AfterCrawlFn``
    (``mainCrawler.go:175-189``). With neither filter set, all hrefs are
    followed (the reference's intended semantics; its literal nil-``copy`` is
    a documented no-op bug, SURVEY §5.5)."""
    has_follow = bool(follow)
    has_dont = bool(dont_follow)
    if not has_follow and not has_dont:
        return True
    match_follow = has_follow and contains_all(follow or [], link)
    match_dont = has_dont and contains_any(dont_follow or [], link)
    if has_follow:
        return match_follow and not match_dont
    return not match_dont


def content_mime(content_type: str | None) -> str:
    """Pinned spec of ``crawlbase.GetContentMime`` (mainReport.go:122-123):
    Content-Type with parameters stripped, lowercased."""
    if not content_type:
        return ""
    return content_type.split(";", 1)[0].strip().lower()


def is_redirect(status: int) -> bool:
    """``300 <= status < 308`` — ``mainCrawler.go:164`` (308 excluded)."""
    return 300 <= status < 308
