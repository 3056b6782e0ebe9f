"""Content-defined chunking (CDC) dedup: Rabin-style rolling-hash chunk
boundaries + chunk-hash sharing across documents.

Why it exists: exact dedup and fixed k-word-window substring dedup both miss
SHIFTED duplication — the same article behind a different nav header, a
quote block with one inserted sentence. CDC boundaries depend only on local
content (a w-byte rolling hash), so identical passages chunk identically no
matter where they sit in the document, and shared chunks become an exact,
vectorizable join key. (The same trick backs rsync, LBFS and modern backup
dedup; FastCDC, Xia et al. 2016, is the canonical reference.)

Algorithm
---------
Boundary rule: position i ends a chunk when the w-byte polynomial rolling
hash H_i = Σ_{t<w} g[b_{i−t}]·p^t (mod 2^64, p odd) has its low
``avg_bits`` bits zero — average chunk ≈ 2^avg_bits bytes — subject to
min/max clamps. H is computed for ALL positions with numpy prefix products
(wraparound uint64 arithmetic; p odd ⇒ invertible mod 2^64), so the per-byte
work is vectorized; only the boundary candidates (n/2^avg_bits of them) are
walked in Python to enforce the clamps.

Scale shape: chunking is a pure per-batch map; the only shuffle is the
compact (chunk_hash, doc_id) rows through the corpus-scaled coarse
partitioning (``dedup._num_coarse_partitions``), where per-chunk-hash
sharing pairs are computed vectorized — raw text never moves. Duplicate
verdicts (doc shares ≥ frac of its chunks with a smaller-id doc) come from
ONE doc_id-keyed aggregation of tiny (doc_id, dup_of, n_shared) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import splitmix64

_P = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd ⇒ invertible mod 2^64
_GEAR = splitmix64(np.arange(256, dtype=np.uint64) + np.uint64(0xC2C2))


def _pinv(p: np.uint64) -> np.uint64:
    """Inverse of odd p mod 2^64 (Newton iteration, 6 steps)."""
    x = p  # correct mod 2^3
    for _ in range(5):
        with np.errstate(over="ignore"):
            x = x * (np.uint64(2) - p * x)
    return x


_PINV = _pinv(_P)


def chunk_spans(data: bytes, *, avg_bits: int = 6, min_size: int = 16,
                max_size: int = 1024, window: int = 16) -> list[tuple[int, int]]:
    """Deterministic CDC chunk spans [(start, end), ...] covering ``data``.

    Vectorized rolling hash over every position; Python only touches the
    boundary CANDIDATES (≈ n/2^avg_bits) to enforce min/max clamps."""
    n = len(data)
    if n == 0:
        return []
    if n <= min_size:
        return [(0, n)]
    b = np.frombuffer(data, np.uint8)
    g = _GEAR[b]
    idx = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # prefix powers p^i and inverse powers p^-i via cumulative products
        pows = np.multiply.accumulate(np.full(n, _P, np.uint64)) * _PINV  # p^i
        ipows = np.multiply.accumulate(np.full(n, _PINV, np.uint64)) * _P  # p^-i
        s = np.add.accumulate(g * ipows)  # S_i = Σ_{j≤i} g_j p^-j
        h = s.copy()
        w = min(window, n)
        h[w:] = s[w:] - s[:-w]
        h *= pows  # H_i = Σ_{t<w} g_{i-t} p^t
    mask = np.uint64((1 << avg_bits) - 1)
    cand = np.nonzero((h & mask) == 0)[0]
    # walk candidates enforcing clamps (plus forced cuts at max_size)
    spans, start = [], 0
    for c in cand:
        end = int(c) + 1
        if end - start < min_size:
            continue
        while end - start > max_size:  # forced cuts for long candidate gaps
            spans.append((start, start + max_size))
            start += max_size
        if end - start >= min_size:
            spans.append((start, end))
            start = end
    while n - start > max_size:
        spans.append((start, start + max_size))
        start += max_size
    if n > start:
        spans.append((start, n))
    return spans


def _chunk_rows(t: pa.Table, text_col: str, id_col: str, avg_bits: int,
                min_size: int, max_size: int) -> pa.Table:
    import hashlib

    ids, idxs, hashes, lens, totals = [], [], [], [], []
    for did, text in zip(t.column(id_col).to_pylist(),
                         t.column(text_col).to_pylist()):
        data = (text or "").encode("utf-8")
        spans = chunk_spans(data, avg_bits=avg_bits, min_size=min_size,
                            max_size=max_size)
        for ci, (s, e) in enumerate(spans):
            ids.append(did)
            idxs.append(ci)
            h = hashlib.blake2b(data[s:e], digest_size=8).digest()
            hashes.append(int.from_bytes(h, "big") & 0x7FFFFFFFFFFFFFFF)
            lens.append(e - s)
            totals.append(len(spans))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "chunk_idx": pa.array(idxs, pa.int64()),
        "chunk_hash": pa.array(hashes, pa.int64()),
        "length": pa.array(lens, pa.int64()),
        # per-doc chunk count, repeated on every row: a doc's chunks are all
        # produced in its own batch, so the total is known HERE — carrying it
        # kills the separate totals groupby + join downstream
        "n_chunks": pa.array(totals, pa.int64()),
    })


def cdc_chunks(ds, *, text_col: str = "text", id_col: str = "doc_id",
               avg_bits: int = 6, min_size: int = 16, max_size: int = 1024):
    """Pure map: document rows → (id, chunk_idx, chunk_hash, length) rows."""
    import functools

    return ds.map_batches(
        functools.partial(_chunk_rows, text_col=text_col, id_col=id_col,
                          avg_bits=avg_bits, min_size=min_size,
                          max_size=max_size),
        batch_format="pyarrow",
    )


def cdc_duplicates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   frac: float = 0.5, avg_bits: int = 6, min_size: int = 16,
                   max_size: int = 1024, num_partitions: int | None = None,
                   n_docs: int | None = None):
    """Docs sharing ≥ ``frac`` of their chunks with a smaller-id doc →
    Dataset(doc_id, dup_of) in the dedup-family pair shape. dup_of is the
    smallest doc id sharing any chunk (min over shared chunks), mirroring
    the LSH family's min-rep convention.

    Shuffles: ONE coarse chunk_hash exchange of compact int rows (min-rep
    pairing per bucket — hot chunks cost O(n), the LSH-path bound), then ONE
    (doc, candidate) share-count aggregation and ONE per-doc min. The corpus
    text is scanned exactly once: each doc's total chunk count rides on its
    chunk rows, so there is no separate totals pass and no join."""
    from .dedup import _num_coarse_partitions

    P = _num_coarse_partitions(ds, num_partitions, n_docs)
    chunks = cdc_chunks(ds, text_col=text_col, id_col=id_col,
                        avg_bits=avg_bits, min_size=min_size,
                        max_size=max_size)

    def add_coarse(t: pa.Table) -> pa.Table:
        ch = t.column("chunk_hash").to_numpy(zero_copy_only=False)
        return t.append_column(
            "_coarse", pa.array((ch % P).astype(np.int64)))

    def shared_pairs(g: pa.Table) -> pa.Table:
        # per chunk_hash bucket: pair every occurrence with the bucket's
        # min-id occurrence (O(n) per bucket, hot-chunk safe)
        g = g.sort_by([("chunk_hash", "ascending"), (id_col, "ascending")])
        ch = g.column("chunk_hash").to_numpy(zero_copy_only=False)
        did = g.column(id_col).to_numpy(zero_copy_only=False)
        if len(ch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({id_col: z, "dup_of": z, "n_chunks": z})
        new = np.empty(len(ch), dtype=bool)
        new[0] = True
        new[1:] = ch[1:] != ch[:-1]
        rep = np.maximum.accumulate(np.where(new, np.arange(len(ch)), 0))
        keep = (~new) & (did != did[rep])  # cross-document sharing only
        nc = g.column("n_chunks").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(did[keep], pa.int64()),
            "dup_of": pa.array(did[rep[keep]], pa.int64()),
            "n_chunks": pa.array(nc[keep], pa.int64()),
        })

    pair_rows = (
        chunks.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(shared_pairs, batch_format="pyarrow")
    )

    # per (doc, candidate): shared-chunk count; n_chunks is constant per doc
    from ray.data.aggregate import Count, Min

    shared = (
        pair_rows.groupby([id_col, "dup_of"])
        .aggregate(Count(alias_name="n_shared"),
                   Min("n_chunks", alias_name="n_chunks"))
    )

    def verdict(t: pa.Table) -> pa.Table:
        ns = t.column("n_shared").to_numpy(zero_copy_only=False)
        nc = t.column("n_chunks").to_numpy(zero_copy_only=False)
        keep = pa.array(ns * 1.0 >= frac * nc)
        return pa.table({
            id_col: t.column(id_col).filter(keep),
            "dup_of": t.column("dup_of").filter(keep),
        })

    # min dup_of per doc (a doc may clear frac against several partners)
    return (
        shared.map_batches(verdict, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Min("dup_of", alias_name="dup_of"))
        .map_batches(lambda t: t.rename_columns([id_col, "dup_of"]),
                     batch_format="pyarrow")
    )
