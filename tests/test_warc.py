"""WARC source/sink: framing, round-trip exactness, partition invariance."""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from nightcrawlercmd_ray.sources.warc import (
    build_record,
    parse_warc,
    read_warc,
    records_to_gz,
    write_warc,
)


def _us(dt):
    from datetime import timezone
    return (int(dt.replace(tzinfo=timezone.utc).timestamp()) * 1_000_000
            + dt.microsecond) if hasattr(dt, "timestamp") else int(dt)


def _rows(path_dir):
    out = read_warc(path_dir).take_all()
    return sorted(
        [(r["url"], _us(r["warc_ts"]), bytes(r["html"])) for r in out]
    )


def test_single_record_roundtrip(tmp_path):
    rec = build_record("http://a.example/x?q=1", 1_600_000_000_123_456,
                       b"<html>hi</html>")
    got = parse_warc(rec)
    assert got == [("http://a.example/x?q=1", 1_600_000_000_123_456,
                    b"<html>hi</html>")]


def test_body_containing_warc_magic_and_crlf():
    body = b"WARC/1.0\r\nContent-Length: 7\r\n\r\nnot a record\r\n\r\nmore"
    rec = build_record("http://a/x", 5, body)
    rec2 = build_record("http://a/y", 6, b"tail")
    got = parse_warc(rec + rec2)
    assert got == [("http://a/x", 5, body), ("http://a/y", 6, b"tail")]


def test_non_response_records_skipped():
    req = build_record("http://a/x", 1, b"GETish").replace(
        b"WARC-Type: response", b"WARC-Type: request")
    info = build_record("", 2, b"software: test").replace(
        b"WARC-Type: response", b"WARC-Type: warcinfo")
    resp = build_record("http://a/z", 3, b"B")
    assert parse_warc(req + info + resp) == [("http://a/z", 3, b"B")]


def test_gzip_members_and_plain_parse_equal():
    recs = [build_record(f"http://h/{i}", i * 1_000_000, bytes([65 + i]) * i)
            for i in range(5)]
    plain = parse_warc(b"".join(recs))
    gz = parse_warc(records_to_gz(recs))
    assert plain == gz and len(plain) == 5


def test_warc_date_second_resolution_accepted():
    rec = build_record("http://a/x", 7_000_000, b"B")
    rec = rec.replace(b"WARC-Date: 1970-01-01T00:00:07.000000Z",
                      b"WARC-Date: 1970-01-01T00:00:07Z")
    assert parse_warc(rec) == [("http://a/x", 7_000_000, b"B")]


def test_malformed_raises():
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


@pytest.fixture(scope="module")
def pages_table(tiny_corpus):
    return pq.read_table(f"{tiny_corpus['dir']}/pages.parquet")


def test_dataset_roundtrip_exact(pages_table, tmp_path):
    out = str(tmp_path / "warc")
    ds = ray.data.from_arrow(pages_table)
    n = write_warc(ds, out)
    assert n == pages_table.num_rows
    got = _rows(out)
    ts_us = pa.compute.cast(
        pa.compute.cast(pages_table.column("warc_ts"), pa.timestamp("us")),
        pa.int64()).to_pylist()
    want = sorted(
        (u, s, bytes(h)) for u, s, h in zip(
            pages_table.column("url").to_pylist(), ts_us,
            pages_table.column("html").to_pylist())
    )
    assert [(u, s) for u, s, _ in got] == [(u, s) for u, s, _ in want]
    assert got == want  # byte-identical bodies


def test_partition_invariance_and_content_addressing(pages_table, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(ray.data.from_arrow(pages_table).repartition(2), a)
    write_warc(ray.data.from_arrow(pages_table).repartition(7), b)
    assert _rows(a) == _rows(b)
    # different grouping => different file sets, but rewriting the SAME
    # partitioning is idempotent (content-addressed names)
    before = sorted(os.listdir(a))
    write_warc(ray.data.from_arrow(pages_table).repartition(2), a)
    assert sorted(os.listdir(a)) == before


def test_deterministic_gzip_bytes():
    recs = [build_record("http://h/1", 1, b"xyz")]
    assert records_to_gz(recs) == records_to_gz(recs)
    assert gzip.decompress(records_to_gz(recs)) == recs[0]


# ---------------------------------------------------------------------------
# corpus interchange: export -> ingest -> crawl equivalence


def test_full_envelope_roundtrip():
    rec = build_record(
        "http://a/x", 9, b"B", http_status=301, content_type=b"text/plain",
        http_headers=((b"Location", b"http://a/y"), (b"X-Fetch-Ms", b"42"),
                      (b"X-Lang", b"de")))
    from nightcrawlercmd_ray.sources.warc import parse_warc_full

    (r,) = parse_warc_full(rec)
    assert (r["status"], r["location"], r["content_type"]) == \
        (301, "http://a/y", "text/plain")
    assert r["http"][b"x-fetch-ms"] == b"42"
    assert r["http"][b"x-lang"] == b"de"


def test_export_ingest_crawl_equivalence(tiny_corpus, tmp_path):
    """export_warc -> ingest_warc reproduces the corpus bit-exactly (pages
    AND fetch_meta), and a crawl over the ingested corpus is identical to
    one over the original."""
    from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams
    from nightcrawlercmd_ray.pipelines.crawl import run_crawl
    from nightcrawlercmd_ray.sources.warc import export_warc, ingest_warc

    src = tiny_corpus["dir"]
    warc_dir = str(tmp_path / "warc")
    dst = str(tmp_path / "corpus2")
    n = export_warc(src, warc_dir)
    n2 = ingest_warc(warc_dir, dst)
    orig_pages = pq.read_table(f"{src}/pages.parquet")
    assert n == n2 == orig_pages.num_rows

    def canon_pages(path):
        import pyarrow.dataset as pds
        t = pds.dataset(path).to_table()
        rows = sorted(zip(t.column("url").to_pylist(),
                          t.column("warc_ts").to_pylist(),
                          [bytes(x) for x in t.column("html").to_pylist()],
                          t.column("text").to_pylist(),
                          t.column("lang").to_pylist()))
        return rows

    assert canon_pages(f"{dst}/pages.parquet") == \
        canon_pages(f"{src}/pages.parquet")

    def canon_meta(path):
        import pyarrow.dataset as pds
        t = pds.dataset(path).to_table()
        return sorted(zip(t.column("url").to_pylist(),
                          t.column("status").to_pylist(),
                          t.column("location").to_pylist(),
                          t.column("content_type").to_pylist(),
                          t.column("fetch_ms").to_pylist()))

    assert canon_meta(f"{dst}/fetch_meta.parquet") == \
        canon_meta(f"{src}/fetch_meta.parquet")

    params = CrawlParams(seeds=tiny_corpus["seeds"])
    ra = run_crawl(src, params, num_shards=3, num_buckets=4,
                   store_dir=str(tmp_path / "store_a"),
                   checkpoint_dir=str(tmp_path / "ck_a"))
    rb = run_crawl(dst, params, num_shards=3, num_buckets=4,
                   store_dir=str(tmp_path / "store_b"),
                   checkpoint_dir=str(tmp_path / "ck_b"))
    assert ra.stats() == rb.stats()
    fa = ra.fetches_dataset().to_pandas().sort_values("url").reset_index(drop=True)
    fb = rb.fetches_dataset().to_pandas().sort_values("url").reset_index(drop=True)
    assert fa.equals(fb)


def test_parse_warc_raises_only_valueerror_on_malformed_bytes():
    """Ingest tasks over untrusted archives catch ValueError per file; any
    other exception type escaping (BadGzipFile/EOFError/zlib.error/
    KeyError were all observed pre-guard) kills the task. Fuzz with
    noise, version-line prefixes, truncations and byte-flips."""
    import numpy as np

    from nightcrawlercmd_ray.sources.warc import (
        build_record,
        parse_warc,
        parse_warc_full,
        records_to_gz,
    )

    rng = np.random.default_rng(3)
    valid = records_to_gz(
        [build_record("http://a.example/x", 1_700_000_000_000_000,
                      b"<html>hi</html>")] * 3)
    for trial in range(400):
        kind = trial % 4
        if kind == 0:
            b = rng.integers(0, 256, int(rng.integers(0, 300)),
                             dtype=np.uint8).tobytes()
        elif kind == 1:
            b = b"WARC/1.0\r\n" + rng.integers(
                0, 256, int(rng.integers(0, 200)), dtype=np.uint8).tobytes()
        elif kind == 2:
            b = valid[: int(rng.integers(0, len(valid)))]
        else:
            v = bytearray(valid)
            for _ in range(int(rng.integers(1, 8))):
                v[int(rng.integers(0, len(v)))] = int(rng.integers(0, 256))
            b = bytes(v)
        for fn in (parse_warc, parse_warc_full):
            try:
                fn(b)
            except ValueError:
                pass  # the only allowed failure mode
    assert len(parse_warc(valid)) == 3
