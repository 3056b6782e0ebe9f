"""Benchmark decontamination: flag training documents that share word
n-grams with a (small) benchmark/eval set — the standard pre-training
hygiene pass (the reference has no analog; its nearest machinery is the
wordlist extractor family, ``mainWordlist.go:17-22``).

Scale shape: the benchmark side is small by definition (eval sets are
thousands of docs, not billions), so this is the broadcast form — its
shingle set is hashed ONCE driver-side, ``ray.put`` once, and each training
batch probes it with one vectorized ``np.isin`` per batch; the corpus
streams, nothing shuffles. Shingles are lowercased word k-grams hashed to
64-bit (same tokenizer as the wordcount family), so membership is exact on
hashes (collision probability ~n²/2^64 — negligible at eval-set scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nightcrawlercmd_ray.functions.extractors import RE_WORD

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit FNV-1a hashes of the ``'w1 w2 … wk'`` joined lowercased word
    k-grams of ``text``; empty array when fewer than k words."""
    toks = [w.lower() for w in RE_WORD.findall(text or "")]
    if len(toks) < k:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks) - k + 1, dtype=np.uint64)
    for i in range(len(toks) - k + 1):
        h = _FNV_OFFSET
        for b in " ".join(toks[i : i + k]).encode():
            h = (h ^ np.uint64(b)) * _FNV_PRIME
        out[i] = h
    return out


def benchmark_shingles(texts: list[str], k: int) -> np.ndarray:
    """Driver-side: the deduped, SORTED shingle-hash set of the benchmark
    texts (sorted so the probe side can use searchsorted membership)."""
    parts = [_shingle_hashes(t, k) for t in texts]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def flag_contaminated(
    ds,
    bench_hashes_ref,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """→ Dataset(doc_id, n_shingles, n_hits, contaminated:bool) — one row
    per input doc; ``contaminated`` = shares ≥1 word-k-gram with the
    benchmark set. ``bench_hashes_ref`` is the ``ray.put`` ref of
    :func:`benchmark_shingles` output (broadcast once, not per batch)."""
    import ray

    def probe(t: pa.Table) -> pa.Table:
        bench = (
            ray.get(bench_hashes_ref)
            if isinstance(bench_hashes_ref, ray.ObjectRef)
            else bench_hashes_ref
        )
        ids, n_sh, n_hit = [], [], []
        for did, text in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            h = _shingle_hashes(text, k)
            ids.append(did)
            n_sh.append(len(h))
            if len(h) and len(bench):
                pos = np.searchsorted(bench, h)
                pos[pos == len(bench)] = 0
                n_hit.append(int(np.count_nonzero(bench[pos] == h)))
            else:
                n_hit.append(0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_hits": pa.array(n_hit, pa.int64()),
            "contaminated": pa.array([n > 0 for n in n_hit], pa.bool_()),
        })

    return ds.map_batches(probe, batch_format="pyarrow")
