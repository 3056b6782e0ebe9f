from nightcrawlercmd_ray.functions.extractors import (
    content_mime,
    contains_all,
    contains_any,
    extract,
    follow_link,
    ips_from_text,
    is_redirect,
    normalize_word,
    urls_from_text,
    words_from_text,
)
from nightcrawlercmd_ray.functions.fuzzer import gen_payloads
from nightcrawlercmd_ray.functions.mutators import permute, username_mutator


def test_word_extractor():
    # regex mainWordlist.go:17 — leading letter + ≥3 lowercase
    assert extract("Hello ab xyzzy WORLD Abcd", "word") == ["Hello", "xyzzy", "Abcd"]


def test_url_extractors():
    text = "see /path/to/file and http://host.test/x plus a\\b-dir\\file_name"
    # Go-equivalent matching: the class after the separator has no '/', so
    # '/path/to/file' yields '/path' then 'to/file' (mainWordlist.go:18)
    rel = extract(text, "url_rel")
    assert rel == ["/path", "to/file", "/host.test", "a\\b-dir\\file_name"]
    ab = extract(text, "url_abs")
    assert ab == ["http://host.test/x"]
    # union preserves duplicates until final dedup (mainWordlist.go:196-198)
    assert extract(text, "url") == rel + ab


def test_email_extractor_umlauts():
    assert extract("mail: jörg.müller@übung.example.de ok", "email") == [
        "jörg.müller@übung.example.de"
    ]


def test_string_extractor_trims_quotes():
    out = extract("a \"double\" and 'single' ends", "string")
    assert "double" in out and "single" in out


def test_none_extractor():
    assert extract("a\nb\n", "none") == ["a", "b", ""]


def test_normalize():
    assert normalize_word("  WoRd  ") == "word"
    assert normalize_word("w", "f.txt") == "w [f.txt]"


def test_caps():
    text = " ".join(f"word{chr(97 + i % 26)}xyz" for i in range(3000))
    assert len(words_from_text(text, 2000)) == 2000
    ips = " ".join(f"10.0.0.{i}" for i in range(200))
    assert len(ips_from_text(ips, 100)) == 100
    urls = " ".join(f"http://h{i}.test/x" for i in range(200))
    assert len(urls_from_text(urls, 100)) == 100


def test_follow_predicates():
    # containsAll / containsAny — mainCrawler.go:200-216
    assert contains_all(["a", "b"], "xaxbx") and not contains_all(["a", "z"], "xaxbx")
    assert contains_any(["q", "b"], "xaxbx") and not contains_any(["q"], "xaxbx")
    # no filters → follow everything (intended semantics of the nil-copy bug)
    assert follow_link("http://x/", None, None)
    assert follow_link("http://x/keep", ["keep"], None)
    assert not follow_link("http://x/other", ["keep"], None)
    assert not follow_link("http://x/keep/bad", ["keep"], ["bad"])
    assert not follow_link("http://x/bad", None, ["bad"])
    assert follow_link("http://x/fine", None, ["bad"])


def test_redirect_boundary():
    # 300 included, 308 excluded — mainCrawler.go:164
    assert is_redirect(300) and is_redirect(307)
    assert not is_redirect(308) and not is_redirect(299) and not is_redirect(200)


def test_content_mime():
    assert content_mime("text/html; charset=utf-8") == "text/html"
    assert content_mime("TEXT/HTML") == "text/html"
    assert content_mime(None) == ""


def test_username_mutator():
    out = username_mutator("john smith")
    assert "johnsmith" in out and "john_smith" in out
    assert "john.smith" in out and "john-smith" in out
    assert "jsmith" in out and "smith" in out  # drop/initial variants
    assert "johns" in out and "john" in out
    # single word: only the four joins
    assert username_mutator("solo") == ["solo", "solo", "solo", "solo"]


def test_permute_identity_and_registry():
    assert permute({"a b"}, "") == {"a b"}
    assert "a_b" in permute({"a b"}, "username")


def test_fuzzer_deterministic():
    vec = {"b": [":", "#", "<zq>"], "3": list("abc")}
    p1 = gen_payloads(vec, "{3.b}", seed=40039, iterations=20)
    p2 = gen_payloads(vec, "{3.b}", seed=40039, iterations=20)
    assert p1 == p2 and len(p1) == 20
    # literal chars for unknown classes; vector picks for known
    assert all(p[0] == "{" and p[2] == "." and p[-1] == "}" for p in p1)
    assert gen_payloads(vec, "{3.b}", seed=1, iterations=20) != p1


def test_follow_link_dont_follow_only_deviation():
    """Pins the documented intended-vs-literal deviation (SURVEY §5.5): with
    ONLY dont_follow set, the reference's matchFollow stays false for every
    link (mainCrawler.go:179-186) so it literally follows nothing; the engine
    implements the intended semantics — follow links NOT matching any
    dont_follow needle."""
    assert follow_link("http://x/page", None, ["logout"])
    assert follow_link("http://x/page", [], ["logout"])
    assert not follow_link("http://x/logout", None, ["logout"])
    assert not follow_link("http://x/a/logout/b", None, ["logout", "admin"])
    assert follow_link("http://x/safe", None, ["logout", "admin"])
