"""CDX/SURT index: transform rules, exact global order, pruned lookups."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
import ray.data

from nightcrawlercmd_ray.sources.cdx import (
    build_cdx,
    cdx_prefix_lookup,
    cdx_prefix_lookup_stats,
    read_cdx,
    surt_key,
)


@pytest.mark.parametrize("url,want", [
    ("HTTP://WWW.Example.COM/A?b=2&a=1", "com,example)/a?a=1&b=2"),
    ("http://example.com", "com,example)/"),
    ("https://sub.Example.org/Path/X#frag", "org,example,sub)/path/x"),
    ("http://example.com:80/x", "com,example)/x"),          # default port
    ("https://example.com:443/x", "com,example)/x"),
    ("http://example.com:8080/x", "com,example:8080)/x"),   # kept port
    ("http://10.2.3.4/x", "10.2.3.4)/x"),                   # IPv4 not reversed
    ("http://www.www.example.com/", "com,example,www)/"),   # strip ONE www.
    ("http://h.test/p?z=1&a=2&a=1", "test,h)/p?a=1&a=2&z=1"),
])
def test_surt_rules(url, want):
    assert surt_key(url) == want


@pytest.fixture(scope="module")
def pages(tiny_corpus):
    return pq.read_table(f"{tiny_corpus['dir']}/pages.parquet")


def _oracle_rows(pages):
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    ts = pc.cast(pc.cast(pages.column("warc_ts"), pa.timestamp("us")),
                 pa.int64()).to_pylist()
    rows = []
    for u, s, h in zip(pages.column("url").to_pylist(), ts,
                       pages.column("html").to_pylist()):
        b = bytes(h)
        rows.append((surt_key(u), s, u, hashlib.md5(b).hexdigest(), len(b)))
    rows.sort()
    return rows


def test_build_read_exact_order(pages, tmp_path):
    out = str(tmp_path / "cdx")
    man = build_cdx(ray.data.from_arrow(pages), out, num_partitions=5)
    assert man["total_rows"] == pages.num_rows
    got = sorted(read_cdx(out).take_all(), key=lambda r: r["pos"])
    want = _oracle_rows(pages)
    assert [(r["surt"], r["ts_us"], r["url"], r["digest"], r["length"])
            for r in got] == want
    assert [r["pos"] for r in got] == list(range(len(want)))
    # parts are disjoint, ordered ranges
    from nightcrawlercmd_ray.sources.cdx import _load_manifest
    parts = sorted(_load_manifest(out)["parts"], key=lambda p: p["part"])
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] < b["lo"]


def test_partition_invariance(pages, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_cdx(ray.data.from_arrow(pages).repartition(2), a, num_partitions=3)
    build_cdx(ray.data.from_arrow(pages).repartition(9), b, num_partitions=11)
    ra = sorted((r["surt"], r["ts_us"], r["url"], r["pos"])
                for r in read_cdx(a).take_all())
    rb = sorted((r["surt"], r["ts_us"], r["url"], r["pos"])
                for r in read_cdx(b).take_all())
    assert ra == rb


def test_prefix_lookup_pruned(pages, tmp_path):
    out = str(tmp_path / "cdx")
    build_cdx(ray.data.from_arrow(pages), out, num_partitions=8)
    want = _oracle_rows(pages)
    # pick a host prefix present in the corpus
    prefix = want[len(want) // 2][0].split(")")[0] + ")"
    t, opened = cdx_prefix_lookup_stats(out, prefix)
    exp = [r for r in want if r[0].startswith(prefix)]
    got = sorted(zip(t.column("surt").to_pylist(), t.column("ts_us").to_pylist(),
                     t.column("url").to_pylist()))
    assert got == [(s, ts, u) for s, ts, u, _, _ in exp]
    n_parts = sum(1 for _ in __import__("os").listdir(out)
                  if _.startswith("part-"))
    assert opened <= n_parts  # and strictly fewer when ranges allow
    # a prefix smaller than any part range must open ≤ 2 parts
    t2, opened2 = cdx_prefix_lookup_stats(out, want[0][0])
    assert opened2 <= 2 and t2.num_rows >= 1


def test_prefix_lookup_miss(pages, tmp_path):
    out = str(tmp_path / "cdx")
    build_cdx(ray.data.from_arrow(pages), out, num_partitions=4)
    t = cdx_prefix_lookup(out, "zzz,nothing)")
    assert t.num_rows == 0
