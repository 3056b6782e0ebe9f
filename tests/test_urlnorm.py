from nightcrawlercmd_ray.functions.urlnorm import (
    canonicalize,
    hash64,
    host_of,
    same_host,
    shard_of,
    to_abs_url,
)


def test_canonicalize_basic():
    assert canonicalize("HTTP://Example.COM/a") == "http://example.com/a"
    assert canonicalize("http://example.com") == "http://example.com/"
    assert canonicalize("http://example.com:80/x") == "http://example.com/x"
    assert canonicalize("https://example.com:443/x") == "https://example.com/x"
    assert canonicalize("http://example.com:8080/x") == "http://example.com:8080/x"
    assert canonicalize("http://example.com/a#frag") == "http://example.com/a"
    assert canonicalize("http://example.com/a?b=1&c=2#f") == "http://example.com/a?b=1&c=2"


def test_canonicalize_dot_segments():
    assert canonicalize("http://h/a/./b/../c") == "http://h/a/c"
    assert canonicalize("http://h/a/b/..") == "http://h/a/"
    assert canonicalize("http://h/../../x") == "http://h/x"
    assert canonicalize("http://h/a/.") == "http://h/a/"


def test_canonicalize_rejects():
    assert canonicalize("") is None
    assert canonicalize("mailto:x@y.z") is None
    assert canonicalize("ftp://h/x") is None
    assert canonicalize("/relative/only") is None
    assert canonicalize("javascript:void(0)") is None


def test_to_abs_url():
    # relative resolved against base — mainCrawler.go:117-140 semantics
    assert to_abs_url("http://h.test/p/1/2", "x") == "http://h.test/p/1/x"
    assert to_abs_url("http://h.test/p/1/2", "/root") == "http://h.test/root"
    assert to_abs_url("http://h.test/p/1/2", "../up") == "http://h.test/p/up"
    assert to_abs_url("http://h.test/p/", "#frag") == "http://h.test/p/"
    # absolute link wins over base
    assert to_abs_url("http://a/", "http://b/x") == "http://b/x"
    # no base: absolute-only
    assert to_abs_url(None, "relative/x") is None
    assert to_abs_url(None, "http://b/x") == "http://b/x"
    assert to_abs_url(None, "") is None


def test_host_helpers():
    assert host_of("http://a.test:8080/x") == "a.test"
    assert same_host("http://a.test/x", "a.test")
    assert not same_host("http://b.test/x", "a.test")


def test_hash64_stable():
    # pinned values: must never change across versions (checkpoint format)
    assert hash64("") == hash64(b"")
    assert hash64("http://a.test/") != hash64("http://a.test")
    assert 0 <= shard_of("a.test", 16) < 16
    assert shard_of("a.test", 16) == shard_of("a.test", 16)


# --------------------------------------------------------------------------- #
# fast-path differentials: canonicalize / to_abs_url / host_of each carry a
# C-level fast path for the common shapes; every fast path must agree with
# the full urlsplit/urljoin reference on EVERY input.
# --------------------------------------------------------------------------- #
from urllib.parse import urljoin

from nightcrawlercmd_ray.functions.urlnorm import (
    _canonicalize_full,
    _host_of_full,
)


def _ref_to_abs_url(base, link):
    """to_abs_url as originally defined: join, then full canonicalize."""
    link = (link or "").strip()
    if not link:
        return None
    if base:
        try:
            link = urljoin(base, link)
        except ValueError:
            return None
    return _canonicalize_full(link)


_URL_QUIRKS = [
    "http://h.test/a/b",
    "http://h.test/a/b?q=1&r=2",
    "http://h.test/",
    "http://h.test",
    "http://h.test/a/",
    "http://h.test/a//b",
    "http://h.test/a/./b",
    "http://h.test/a/../b",
    "http://h.test/.../b",
    "http://h.test/.x/..y",
    "http://h.test/a?",
    "http://h.test/a?#",
    "http://h.test/a#",
    "http://h.test/a#f",
    "http://H.Test/a",
    "HTTP://h.test/a",
    "http://h.test./a",
    "http://h.test:80/a",
    "http://h.test:8080/a",
    "http://u@h.test/a",
    "http://u:p@h.test/a",
    "http://h.test:/a",
    "http://[::1]/a",
    "http://h:1:2/a",
    "https://h.test/a",
    "http://",
    "http:///p",
    "http://?q",
    "http://#f",
    "http:x",
    "http:/x",
    "//h.test/x",
    "/rooted",
    "rel/x",
    "../up",
    "?query",
    "#frag",
    "",
    " http://h.test/a ",
    "http://h.test/a ",
    "http://h.test/a b",
    "http://h.test/a%20b",
    "http://h.test/%2e%2e/x",
    "http://h.test/a\x0c#f",
    "http://h.test/é",
    "http://hé.test/a",
    "mailto:x@y.z",
    "javascript:void(0)",
    "ftp://h/x",
]


def test_canonicalize_fast_path_differential():
    for u in _URL_QUIRKS:
        assert canonicalize(u) == _canonicalize_full(u), repr(u)


def test_host_of_fast_path_differential():
    for u in _URL_QUIRKS:
        assert host_of(u) == _host_of_full(u), repr(u)


def test_to_abs_url_fast_path_differential():
    bases = [None, "http://base.test/p/q?x=1", "http://base.test",
             "https://base.test/p/", "HTTP://Base.Test/p"]
    for b in bases:
        for u in _URL_QUIRKS:
            assert to_abs_url(b, u) == _ref_to_abs_url(b, u), (b, u)


def test_urlnorm_fast_path_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    piece = st.sampled_from([
        "http", "https", "HTTP", "ftp", "://", ":", "/", "//", ".", "..",
        "h.test", "H.Test", "h", "80", "8080", "u@", "[::1]", "?", "#",
        "q=1", "a", "b", "%2e", " ", "\x0c", "é", "&", "=", "~",
    ])

    @settings(max_examples=400, deadline=None)
    @given(st.lists(piece, max_size=8))
    def inner(parts):
        u = "".join(parts)
        assert canonicalize(u) == _canonicalize_full(u), repr(u)
        assert host_of(u) == _host_of_full(u), repr(u)
        assert to_abs_url("http://base.test/p/q", u) == _ref_to_abs_url(
            "http://base.test/p/q", u), repr(u)

    inner()


def test_canonicalize_still_fixpoint():
    for u in _URL_QUIRKS:
        c = canonicalize(u)
        if c is not None:
            assert canonicalize(c) == c, repr(u)
