from nightcrawlercmd_ray.functions.htmlparse import html_to_text, parse_html


def test_extract_links_forms_resources():
    html = b"""<html><head><title>T</title>
    <link href="/style.css" rel="stylesheet"><script src="/app.js"></script></head>
    <body>
    <a href="/p/1">one</a>
    <a href="">empty-skipped</a>
    <a href="http://other.test/x">cross</a>
    <a href="#frag">frag</a>
    <form action="/search" method="get">
      <input name="q" type="text" value="v0">
      <input name="h" type="hidden" value="v1">
    </form>
    <img src="/i.png">
    </body></html>"""
    p = parse_html(html)
    assert p.hrefs == ["/p/1", "http://other.test/x", "#frag"]
    assert p.resources == ["/style.css", "/app.js", "/i.png"]
    assert len(p.forms) == 1
    f = p.forms[0]
    assert f.url == "/search" and f.method == "get"
    assert [(i.name, i.type, i.value) for i in f.inputs] == [
        ("q", "text", "v0"),
        ("h", "hidden", "v1"),
    ]
    assert p.title == "T"


def test_text_spec_entities_and_blocks():
    html = b"<p>A &amp; B &#x41;</p><div>C</div>line<br>next"
    assert html_to_text(html) == "A & B A\nC\nline\nnext"


def test_text_spec_skips_script_style_comments():
    html = b"<body><script>var x=1;</script><style>a{}</style><!-- c -->ok</body>"
    assert html_to_text(html) == "ok"


def test_text_whitespace_collapse():
    html = b"<p>  a\t\t b\n c  </p><p>   </p><p>d</p>"
    assert html_to_text(html) == "a b c\nd"


def test_inline_tags_transparent():
    html = b"<p>a <b>bold</b> and <i>ital</i>ic</p>"
    assert html_to_text(html) == "a bold and italic"


def test_malformed_html_no_raise():
    assert isinstance(html_to_text(b"<a href='x'><b>unclosed"), str)
    assert parse_html(b"\xff\xfe garbage <a href='/ok'>x</a>").hrefs == ["/ok"]


def test_self_closing_script_resource():
    p = parse_html(b'<script src="/s.js"/><p>after</p>')
    assert "/s.js" in p.resources
    assert "after" in p.text
