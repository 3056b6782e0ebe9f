"""Main-content extraction: pinned block segmentation + link-density
filtering semantics, boilerplate-vs-article behavior, edge cases."""

from __future__ import annotations

import pyarrow as pa
import ray

from nightcrawlercmd_ray.stages.maincontent import (
    extract_main_content,
    main_content,
    page_blocks,
)

ARTICLE = (
    b"<html><head><title>T</title><script>var x = 'nav nav nav';</script>"
    b"</head><body>"
    b'<nav><a href="/">Home</a> <a href="/a">Archive</a> '
    b'<a href="/b">About</a></nav>'
    b"<article>"
    b"<p>This is the first real paragraph of the article body text.</p>"
    b"<p>A second substantial paragraph with plenty of real content "
    b'and <a href="/ref">one inline link</a> inside it.</p>'
    b"</article>"
    b'<footer><a href="/tos">Terms</a> | <a href="/priv">Privacy</a>'
    b"</footer></body></html>"
)


def test_blocks_segmentation_and_skip_tags():
    blocks = page_blocks(ARTICLE)
    texts = [b[0] for b in blocks]
    # script content excluded; title is its own (inline-in-head) segment
    assert not any("nav nav nav" in t for t in texts)
    assert "This is the first real paragraph of the article body text." \
        in texts
    # nav block is all anchor chars
    nav = next(b for b in blocks if "Home" in b[0])
    assert nav[2] == len("Home") + len("Archive") + len("About")


def test_main_content_keeps_article_drops_chrome():
    text, kept, total = main_content(ARTICLE)
    assert "first real paragraph" in text
    assert "second substantial paragraph" in text
    assert "Home" not in text and "Terms" not in text
    assert "T" not in text.split("\n")  # the title segment is dropped
    assert kept == 2 and total > kept
    # the inline link's text survives inside a low-density paragraph
    assert "one inline link" in text


def test_link_density_boundary_integer_exact():
    # chars=30, anchor=10 -> density exactly 1/3 -> kept
    body = ("<p>" + "x" * 20 + '<a href="/">' + "y" * 10 + "</a></p>")
    text, kept, _ = main_content(body, min_chars=30)
    assert kept == 1 and text == "x" * 20 + " " + "y" * 10
    # one more anchor char -> dropped  (chars=30: 19 plain + 11 anchor)
    body2 = ("<p>" + "x" * 19 + '<a href="/">' + "y" * 11 + "</a></p>")
    _, kept2, _ = main_content(body2, min_chars=30)
    assert kept2 == 0


def test_min_chars_and_whitespace_collapse():
    html = "<p>  short  </p><p>long enough paragraph to pass the bar</p>"
    text, kept, total = main_content(html, min_chars=20)
    assert kept == 1 and total == 2
    assert text == "long enough paragraph to pass the bar"
    # collapse: runs joined with single spaces
    assert page_blocks("<p>a\n   b\t c</p>")[0][0] == "a b c"


def test_edges_empty_and_malformed():
    assert main_content(b"") == ("", 0, 0)
    assert main_content(b"<p></p><br><div></div>") == ("", 0, 0)
    t, k, n = main_content(b"\xff<unclosed <p>some dangling text that is "
                           b"certainly long enough to keep here")
    assert k <= n  # no crash; counts consistent


def test_long_title_and_head_text_never_enter_main_text():
    """ADVICE r3: a real-page title ≥ min_chars with zero anchors used to
    be KEPT (title was neither block nor skip), prepending itself to
    main_text on virtually every real page. Head is now a skip subtree
    (ends at </head> or at an implied <body>), and <title> is skipped even
    when body-injected."""
    long_title = "A Very Long and Descriptive Page Title About Things"
    page = (f"<html><head><title>{long_title}</title>"
            f"<style>.x{{}}</style></head><body>"
            f"<p>The only real paragraph with plenty of body text.</p>"
            f"</body></html>")
    text, kept, total = main_content(page)
    assert long_title not in text
    assert text == "The only real paragraph with plenty of body text."
    assert kept == 1
    # unclosed head: body start still exits head mode
    page2 = (f"<html><head><title>{long_title}</title><body>"
             f"<p>Body paragraph long enough to clear the bar here.</p>")
    text2, _, _ = main_content(page2)
    assert long_title not in text2 and "Body paragraph" in text2
    # body-injected title (no head at all) is still skipped
    page3 = f"<p>Real text that is long enough to keep around here.</p>" \
            f"<title>{long_title}</title>"
    text3, _, _ = main_content(page3)
    assert long_title not in text3 and "Real text" in text3


def test_stage_over_dataset():
    t = pa.table({
        "url": ["http://a.example/1", "http://a.example/2"],
        "html": pa.array([ARTICLE, b"<p>tiny</p>"], pa.binary()),
    })
    out = (extract_main_content(ray.data.from_arrow(t))
           .to_pandas().set_index("url"))
    assert out.loc["http://a.example/1"].n_blocks_kept == 2
    assert out.loc["http://a.example/2"].main_text == ""
