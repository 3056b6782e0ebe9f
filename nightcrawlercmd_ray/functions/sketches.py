"""MinHash / SimHash signatures — mergeable sketches for near-dedup at scale.

Standard constructions from the published literature (Broder '97 min-wise
hashing; Charikar '02 SimHash; Leskovec/Rajaraman/Ullman MMDS ch.3 banding).
Vectorized with numpy: per document we hash its shingles once (stable 64-bit,
reduced into a 31-bit Mersenne field so the universal-hash products fit in
uint64), then apply all permutations as (a*x+b) mod p in one matrix op.
"""

from __future__ import annotations

import numpy as np

from .textstats import shingles, tokens
from .urlnorm import hash64

# 2^31-1: a*x+b with a,b,x < p stays < 2^62 — exact in uint64, no overflow.
_P31 = np.uint64((1 << 31) - 1)
_EMPTY_SLOT = np.uint64((1 << 31) - 1)  # max possible minhash value


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, int(_P31), size=num_perm).astype(np.uint64)
    b = rng.randint(0, int(_P31), size=num_perm).astype(np.uint64)
    return a, b


class MinHasher:
    """num_perm-wide MinHash over word k-shingles. Construct once per actor
    (permutation params derive from the seed, so signatures are stable across
    processes, partitions and runs)."""

    def __init__(self, num_perm: int = 128, k: int = 5, seed: int = 1):
        self.num_perm = num_perm
        self.k = k
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, _EMPTY_SLOT, dtype=np.uint64)
        x = np.fromiter(
            (hash64(s) & 0x7FFFFFFF for s in sh), dtype=np.uint64, count=len(sh)
        )
        hashed = (self.a[:, None] * x[None, :] + self.b[:, None]) % _P31
        return hashed.min(axis=1)

    def bands(self, sig: np.ndarray, num_bands: int) -> list[int]:
        """LSH band hashes: split the signature into ``num_bands`` groups of
        rows; hash each group to a bucket key (two docs are candidates iff
        they share any (band_id, band_hash) bucket)."""
        rows = len(sig) // num_bands
        return [
            hash64(sig[i * rows : (i + 1) * rows].tobytes()) & 0x7FFFFFFFFFFFFFFF
            for i in range(num_bands)
        ]


def minhash_signature_batch(
    texts: list[str], num_perm: int = 128, k: int = 5, seed: int = 1
) -> np.ndarray:
    """Signatures for a batch → (len(texts), num_perm) uint64 array."""
    mh = MinHasher(num_perm, k, seed)
    return np.stack([mh.signature(t) for t in texts]) if texts else np.empty(
        (0, num_perm), dtype=np.uint64
    )


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over word tokens: sign-sum of token-hash bit vectors."""
    toks = tokens(text)
    if not toks:
        return 0
    acc = np.zeros(bits, dtype=np.int64)
    shift = np.arange(bits, dtype=np.uint64)
    for t in toks:
        h = np.uint64(hash64(t))
        bits_vec = (h >> shift) & np.uint64(1)
        acc += np.where(bits_vec.astype(bool), 1, -1)
    out = 0
    for i in range(bits):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(texts: list[str], bits: int = 64) -> np.ndarray:
    return np.array([simhash(t, bits) for t in texts], dtype=np.uint64)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
