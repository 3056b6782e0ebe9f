"""Wordlist tool: Dataset pipeline == serial oracle (SURVEY §3.3/§5)."""

import pytest

from nightcrawlercmd_ray.pipelines.wordlist import (
    build_wordlist,
    wordlist_oracle,
    write_wordlist,
)

FILES = {
    "a.txt": "Hello world someword Hello\nvisit /path/to/page now\n",
    "b.html": '<a href="http://site.test/abs/path">mail me: hans.müller@post.de</a>',
    "sub/c.js": "var s = \"quoted text\"; var t = 'single';\n10.0.0.1 here",
    "sub/d.txt": "",
}


@pytest.fixture(scope="module")
def word_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("wordfiles")
    for rel, content in FILES.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return str(root)


@pytest.mark.parametrize("extractor", ["word", "url", "url_abs", "email", "string", "none"])
def test_wordlist_matches_oracle(word_tree, extractor):
    ds = build_wordlist(word_tree, extractor=extractor)
    got = [r["word"] for r in ds.take_all()]
    assert got == wordlist_oracle(word_tree, extractor=extractor)


def test_wordlist_mutator_and_template(word_tree, tmp_path):
    tpl = tmp_path / "template.txt"
    tpl.write_text("admin-<word>\n<word>123")
    ds = build_wordlist(
        word_tree, extractor="word", mutator="username", template_file=str(tpl)
    )
    got = [r["word"] for r in ds.take_all()]
    expect = wordlist_oracle(
        word_tree, extractor="word", mutator="username", template_file=str(tpl)
    )
    assert got == expect
    assert any(w.startswith("admin-") for w in got)
    out = tmp_path / "wl.txt"
    n = write_wordlist(build_wordlist(word_tree, extractor="word"), str(out))
    lines = out.read_text().splitlines()
    assert len(lines) == n and lines == sorted(lines)
