"""Report pipeline vs a serial recomputation of each reducer (SURVEY §3.2/§5.4)."""

import csv

import pyarrow.parquet as pq
import pytest

from nightcrawlercmd_ray.functions.extractors import content_mime, words_from_text
from nightcrawlercmd_ray.functions.htmlparse import parse_html
from nightcrawlercmd_ray.pipelines.report import generate_reports


@pytest.fixture(scope="module")
def report_out(tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("reports"))
    counts = generate_reports(tiny_corpus["dir"], out, wordlist=True)
    return out, counts


def _read_csv(path, has_header):
    with open(path, newline="") as f:
        rows = list(csv.reader(f, delimiter=";"))
    return rows[1:] if has_header else rows


def _serial_pages(tiny_corpus):
    d = tiny_corpus["dir"]
    pages = pq.read_table(f"{d}/pages.parquet")
    meta = pq.read_table(f"{d}/fetch_meta.parquet")
    mmap = {
        u: (int(s), ct)
        for u, s, ct in zip(
            meta.column("url").to_pylist(),
            meta.column("status").to_pylist(),
            meta.column("content_type").to_pylist(),
        )
    }
    out = []
    for u, h in zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()):
        status, ct = mmap.get(u, (200, "text/html"))
        out.append((u, h, status, content_mime(ct)))
    return out


def test_crawledurls_rows(tiny_corpus, report_out):
    out, counts = report_out
    pages = pq.read_table(f"{tiny_corpus['dir']}/pages.parquet")
    rows = _read_csv(f"{out}/crawledurls.csv", has_header=True)
    assert len(rows) == pages.num_rows == counts["crawledurls"]
    assert all(len(r) == 6 for r in rows)


def test_allurls_matches_serial(tiny_corpus, report_out):
    out, _ = report_out
    expect = set()
    for u, h, status, mime in _serial_pages(tiny_corpus):
        if mime == "text/html" and h:
            expect.update(x for x in parse_html(h).hrefs if x)
    got = {r[0] for r in _read_csv(f"{out}/allUrls.csv", has_header=True)}
    assert got == expect


def test_wordlist_counts_match_serial(tiny_corpus, report_out):
    out, _ = report_out
    counts: dict[str, int] = {}
    exemplar: dict[str, str] = {}
    for u, h, status, mime in _serial_pages(tiny_corpus):
        if mime != "text/html" or not h:
            continue
        text = parse_html(h).text
        for w in words_from_text(text, 2000):
            wl = w.lower()
            if not wl:
                continue
            counts[wl] = counts.get(wl, 0) + 1
            exemplar[wl] = min(exemplar.get(wl, u), u)
    rows = _read_csv(f"{out}/wordlist.csv", has_header=False)
    got = {r[0]: (int(r[1]), r[2]) for r in rows}
    assert got == {w: (counts[w], exemplar[w]) for w in counts}


def test_querykeys_min_url_exemplar(tiny_corpus, report_out):
    out, _ = report_out
    from urllib.parse import parse_qs, urlsplit

    expect: dict[str, str] = {}
    for u, _h, _s, _m in _serial_pages(tiny_corpus):
        for k in parse_qs(urlsplit(u).query, keep_blank_values=True):
            expect[k] = min(expect.get(k, u), u)
    rows = _read_csv(f"{out}/querykeys.csv", has_header=False)
    got = {r[0]: r[1] for r in rows}
    assert got == expect


def test_formtags_and_invalidtags_nonempty(report_out):
    out, counts = report_out
    forms = _read_csv(f"{out}/formtags.csv", has_header=False)
    assert counts["formtags"] == len(forms) > 0
    assert all(len(r) == 7 for r in forms)
    inv = _read_csv(f"{out}/invalidtags.csv", has_header=True)
    assert counts["invalidtags"] == len(inv) > 0
    reasons = {r[0] for r in inv}
    assert "InvTag" in reasons and "InvAttribute" in reasons
    assert all(int(r[3]) >= 1 for r in inv)  # line numbers annotated


def test_distributed_csv_sink_byte_identical(tiny_corpus, tmp_path):
    """The distributed single-file CSV sink (ordered per-block part files +
    byte-wise concat) must produce a byte-identical file to the streaming
    driver sink, including on a multi-block sorted dataset."""
    from nightcrawlercmd_ray.pipelines.report import (
        page_reports_dataset,
        report_all_urls,
        write_semicolon_csv,
        write_semicolon_csv_distributed,
    )

    pr = page_reports_dataset(tiny_corpus["dir"]).materialize()
    urls = report_all_urls(pr).sort("href").repartition(5).materialize()
    a = str(tmp_path / "stream.csv")
    b = str(tmp_path / "dist.csv")
    n1 = write_semicolon_csv(urls, a, ["url"])
    n2 = write_semicolon_csv_distributed(urls, b, ["url"],
                                         parts_dir=str(tmp_path / "parts"))
    assert n1 == n2 > 0
    assert open(a, "rb").read() == open(b, "rb").read()
