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
