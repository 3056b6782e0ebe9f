"""Recrawl delta over two prepared pagestores (pipelines/crawl.py:
pagestore_hashes / pagestore_diff): statuses match a direct corpus-level
comparison, at more than one store geometry."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from nightcrawlercmd_ray.functions.urlnorm import url_hash


def _write_pages(path, rows):
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], pa.binary()),
    }), path)


@pytest.mark.parametrize("num_buckets", [2, 8])
def test_pagestore_diff_statuses(tmp_path, num_buckets):
    from nightcrawlercmd_ray.pipelines.crawl import pagestore_diff, prepare_pagestore

    base = [(f"http://h{i % 3}.test/p{i}", f"<html>page {i}</html>".encode())
            for i in range(40)]
    old_rows = base[:36]                       # 36..39 missing from old
    new_rows = [(u, (h + b" v2") if i % 5 == 0 else h)
                for i, (u, h) in enumerate(base) if i % 11 != 0]

    old_pq, new_pq = tmp_path / "old.parquet", tmp_path / "new.parquet"
    _write_pages(str(old_pq), old_rows)
    _write_pages(str(new_pq), new_rows)
    prepare_pagestore(str(old_pq), None, str(tmp_path / "so"),
                      num_buckets=num_buckets, rows_per_run=16)
    prepare_pagestore(str(new_pq), None, str(tmp_path / "sn"),
                      num_buckets=num_buckets, rows_per_run=16)

    out = pagestore_diff(str(tmp_path / "so"), str(tmp_path / "sn")).to_pandas()
    got = dict(zip(out["url_hash"], out["status"]))

    # serial oracle straight from the two row lists
    oldm = {url_hash(u) & 0x7FFFFFFFFFFFFFFF: hashlib.md5(h).hexdigest()
            for u, h in old_rows}
    newm = {url_hash(u) & 0x7FFFFFFFFFFFFFFF: hashlib.md5(h).hexdigest()
            for u, h in new_rows}
    expect = {}
    for k in oldm.keys() | newm.keys():
        if k not in oldm:
            expect[k] = "added"
        elif k not in newm:
            expect[k] = "removed"
        else:
            expect[k] = "same" if oldm[k] == newm[k] else "changed"
    assert got == expect
    assert set(expect.values()) == {"added", "removed", "changed", "same"}


def test_page_codec_store_crawls_and_diffs_identically(tiny_corpus, tmp_path):
    """NCRAWLER_PAGE_CODEC=lz4: a per-page-compressed store must (a) crawl
    bit-identically to the uncompressed store and (b) md5 RAW page bytes in
    pagestore_hashes, so a compressed and an uncompressed store of the same
    corpus diff as all-'same' (codec-independent diffs)."""
    import pandas as pd

    import nightcrawlercmd_ray.pipelines.crawl as C
    from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams
    from nightcrawlercmd_ray.pipelines.crawl import pagestore_diff, run_crawl

    params = CrawlParams(seeds=tiny_corpus["seeds"])
    run_a = run_crawl(tiny_corpus["dir"], params,
                      store_dir=str(tmp_path / "plain"),
                      num_shards=3, num_buckets=4)
    df_a = (run_a.fetches_dataset().to_pandas()
            .sort_values("seq").reset_index(drop=True))
    old = C.PAGE_CODEC
    C.PAGE_CODEC = "lz4"
    try:
        run_b = run_crawl(tiny_corpus["dir"], params,
                          store_dir=str(tmp_path / "lz4"),
                          num_shards=3, num_buckets=4)
    finally:
        C.PAGE_CODEC = old
    df_b = (run_b.fetches_dataset().to_pandas()
            .sort_values("seq").reset_index(drop=True))
    pd.testing.assert_frame_equal(df_a, df_b)
    d = pagestore_diff(str(tmp_path / "plain"),
                       str(tmp_path / "lz4")).to_pandas()
    assert len(d) > 0 and (d["status"] == "same").all()
