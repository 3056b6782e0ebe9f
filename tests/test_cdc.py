"""Content-defined chunking (stages/cdc.py): span invariants, shift
stability, serial-oracle chunk rows, planted shifted-dup recall, partition
invariance, and the planted entry query."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
import ray


def test_span_invariants_and_determinism():
    from nightcrawlercmd_ray.stages.cdc import chunk_spans

    rng = np.random.default_rng(3)
    for n in (0, 1, 15, 16, 17, 500, 5000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        sp = chunk_spans(data, avg_bits=6, min_size=16, max_size=1024)
        assert sp == chunk_spans(data, avg_bits=6, min_size=16, max_size=1024)
        if n == 0:
            assert sp == []
            continue
        # full coverage, contiguity, clamps (last chunk may undershoot min)
        assert sp[0][0] == 0 and sp[-1][1] == n
        assert all(a[1] == b[0] for a, b in zip(sp, sp[1:]))
        assert all(e - s <= 1024 for s, e in sp)
        assert all(e - s >= 16 for s, e in sp[:-1])


def test_shift_stability():
    """A prefix-shifted copy must share almost all chunk contents — the
    whole point of content-defined (vs fixed-offset) boundaries."""
    from nightcrawlercmd_ray.stages.cdc import chunk_spans

    data = bytes(np.random.default_rng(7).integers(0, 256, 8000, dtype=np.uint8))
    shifted = b"#header inserted 123#" + data

    def hashes(d):
        return {hashlib.blake2b(d[s:e], digest_size=8).digest()
                for s, e in chunk_spans(d)}

    h1, h2 = hashes(data), hashes(shifted)
    assert len(h1 & h2) / len(h1) > 0.9


def test_chunk_rows_match_serial():
    from nightcrawlercmd_ray.stages.cdc import cdc_chunks, chunk_spans

    texts = {i: f"document {i} " + "lorem ipsum dolor sit amet. " * (10 + i)
             for i in range(20)}
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()]
    ).repartition(4)
    out = cdc_chunks(ds).to_pandas().sort_values(["doc_id", "chunk_idx"])
    for did, grp in out.groupby("doc_id"):
        data = texts[did].encode("utf-8")
        spans = chunk_spans(data)
        assert list(grp["chunk_idx"]) == list(range(len(spans)))
        assert list(grp["length"]) == [e - s for s, e in spans]
        expect_h = [
            int.from_bytes(
                hashlib.blake2b(data[s:e], digest_size=8).digest(), "big"
            ) & 0x7FFFFFFFFFFFFFFF
            for s, e in spans
        ]
        assert list(grp["chunk_hash"]) == expect_h
        assert sum(grp["length"]) == len(data)


def _dup_corpus():
    body = "the quick brown fox jumps over the lazy dog. "
    docs = [{"doc_id": 1, "text": body * 50},
            {"doc_id": 2, "text": "INSERTED NAV HEADER | " + body * 50},
            {"doc_id": 3, "text": "totally different text about arrow record batches. " * 40},
            {"doc_id": 4, "text": ""},
            {"doc_id": 5, "text": body * 50}]  # exact copy of 1
    return docs


@pytest.mark.parametrize("blocks,parts", [(1, 1), (5, 17)])
def test_duplicates_shifted_and_exact(blocks, parts):
    from nightcrawlercmd_ray.stages.cdc import cdc_duplicates

    ds = ray.data.from_items(_dup_corpus()).repartition(blocks)
    out = cdc_duplicates(ds, frac=0.5, num_partitions=parts).to_pandas()
    got = dict(zip(out["doc_id"], out["dup_of"]))
    assert got[2] == 1  # shifted copy caught
    assert got[5] == 1  # exact copy caught
    assert 3 not in got and 4 not in got and 1 not in got


def test_entry_query_planted_recall():
    import __ray_entry__ as E

    out = E.queries()["cdc_near_dups"]("/root/testdata/sf0.001").to_pandas()
    planted = out[out["doc_id"] >= 10_000_000]
    assert len(planted) > 0
    # every planted copy surfaces; dup_of is its source OR a smaller natural
    # near-dup (min-partner convention — the synthetic corpus has genuine
    # chunk-sharing near-dups of its own)
    assert (planted["dup_of"] <= planted["doc_id"] - 10_000_000).all()
    assert (planted["dup_of"] == planted["doc_id"] - 10_000_000).sum() >= len(planted) - 2
    import pyarrow.parquet as pq

    srcs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"]).column("doc_id").to_pylist()
    expect_planted = {d + 10_000_000 for d in srcs if d % 25 == 0}
    # recall bound, not equality: sources under ~3 chunks (≈200 chars at
    # avg_bits=6) are below CDC resolution once the header perturbs their
    # first chunk — inherent to chunk-level matching, deterministic here
    assert set(planted["doc_id"]) <= expect_planted
    assert len(planted) / len(expect_planted) >= 0.8
