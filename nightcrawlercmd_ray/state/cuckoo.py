"""Cuckoo URL-seen filter — the approximate membership sketch of the north rule.

Replaces the reference's exact in-process ``cw.Links map[string]bool`` seen-set
(``/root/reference/mainCrawler.go:110-136``) with a sharded, serializable
approximate filter (standard cuckoo-filter construction, Fan et al. 2014):

- guarantees **no false negatives** (a seen URL is never refetched — the
  reference's dedup invariant, SURVEY J2);
- false positives at rate ε ≈ 2·slots/2^fp_bits per bucket pair (an unseen URL
  may wrongly be dropped) — the documented trade for 10^10-URL scale: with
  16-bit fingerprints and 4 slots, ε ≈ 2^-13 at ~2.1 bytes/key, so a 10^10-URL
  frontier costs ~21 GB total across shards (SURVEY §4.3 sizing: P=256 shards
  → ~82 MB/shard);
- items that cannot be placed after max kicks go to an exact overflow set, so
  the no-false-negative guarantee survives overload;
- ``to_bytes``/``from_bytes`` round-trips bit-exactly for checkpoint/resume.

``ExactSeenFilter`` (a plain hash set) is the conformance mode used by tests to
compare the engine's seen-set against the serial oracle exactly.
"""

from __future__ import annotations

import pickle

import numpy as np

_MAX_KICKS = 500
_SLOTS = 4


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, seed: int = 7):
        nb = 1
        while nb * _SLOTS * 0.95 < capacity:
            nb <<= 1
        self.num_buckets = nb
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.seed = seed
        # homeless (canonical_bucket, fp) pairs after a failed eviction chain —
        # keeps the no-false-negative guarantee under overload
        self.overflow: set[tuple[int, int]] = set()
        self._rng_state = np.uint64(seed * 2654435761 + 1)

    # -- hashing ------------------------------------------------------------
    @staticmethod
    def _mix(h: int) -> int:
        # splitmix64 finalizer: decorrelates fingerprint and bucket bits even
        # for adversarially-regular keys (sequential ints, low-entropy hashes)
        h = (h + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return h ^ (h >> 31)

    def _fp(self, h: int) -> int:
        fp = (self._mix(h) >> 48) & 0xFFFF
        return fp if fp != 0 else 1  # 0 marks an empty slot

    def _i1(self, h: int) -> int:
        return self._mix(h) & (self.num_buckets - 1)

    def _alt(self, i: int, fp: int) -> int:
        # partial-key cuckoo: alternate bucket = i XOR hash(fp)
        return (i ^ (fp * 0x5BD1E995)) & (self.num_buckets - 1)

    def _next_rand(self) -> int:
        # xorshift64 — deterministic eviction choices (resume-stable)
        x = int(self._rng_state)
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        self._rng_state = np.uint64(x)
        return x

    def _canon(self, i: int, fp: int) -> tuple[int, int]:
        return (min(i, self._alt(i, fp)), fp)

    # -- ops ----------------------------------------------------------------
    def contains(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        if fp in self.table[i1]:
            return True
        i2 = self._alt(i1, fp)
        if fp in self.table[i2]:
            return True
        return self._canon(i1, fp) in self.overflow

    def insert(self, h: int) -> None:
        """Insert (caller has already checked ``contains``)."""
        fp = self._fp(h)
        i1 = self._i1(h)
        self._insert_at(i1, self._alt(i1, fp), fp)

    def _insert_at(self, i1: int, i2: int, fp: int) -> None:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # evict: the inserted fp takes a slot immediately; the displaced victim
        # fingerprint ("cur") walks the chain looking for a home
        i = i1 if (self._next_rand() & 1) else i2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = self._next_rand() % _SLOTS
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            i = self._alt(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        # table overloaded: the still-homeless victim goes to the exact
        # overflow set (NOT the original item — it was placed in the chain)
        self.overflow.add(self._canon(i, cur))
        self.count += 1

    def add_if_new(self, h: int) -> bool:
        """True iff ``h`` was not seen (and is now marked seen)."""
        if self.contains(h):
            return False
        self.insert(h)
        return True

    @staticmethod
    def _mix_vec(h: np.ndarray) -> np.ndarray:
        """Vector splitmix64 (wrap-around uint64 arithmetic) — bit-identical
        to the scalar ``_mix``."""
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership, NO insertion: bool[n], no false negatives.

        Membership is MONOTONE in this filter: fingerprints only ever move
        between their two legal buckets during eviction chains, and a
        homeless victim lands in the exact ``overflow`` set rather than
        being dropped — so once ``contains`` is True it stays True under
        any later inserts. That monotonicity is what makes a conservative
        pre-wave dedup prefilter sound (state/frontier.py
        ``add_candidates``): anything True here is guaranteed still-dup at
        the canonical-order seal pass."""
        h = np.ascontiguousarray(np.asarray(hashes, dtype=np.uint64))
        n = len(h)
        if n == 0:
            return np.zeros(0, dtype=bool)
        m = self._mix_vec(h)
        fp = ((m >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        mask = self.num_buckets - 1
        i1 = (m & np.uint64(mask)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1E995)) & mask
        present = (self.table[i1] == fp[:, None]).any(axis=1)
        need = np.nonzero(~present)[0]
        present[need] |= (self.table[i2[need]] == fp[need, None]).any(axis=1)
        if self.overflow:
            for j in np.nonzero(~present)[0]:
                if (min(int(i1[j]), int(i2[j])), int(fp[j])) in self.overflow:
                    present[j] = True
        return present

    def add_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vector form: bool mask of newly-added items, in input order —
        EXACTLY the per-item ``add_if_new`` sequence's result (duplicates and
        fingerprint collisions within the batch: first occurrence wins; later
        occurrences are rechecked against the updated table before insert).
        The membership test (the hot path at crawl scale — most candidates
        are already-seen) is fully vectorized; only genuinely-new items take
        the Python insert path."""
        h = np.ascontiguousarray(np.asarray(hashes, dtype=np.uint64))
        n = len(h)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        m = self._mix_vec(h)
        fp = ((m >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        mask = self.num_buckets - 1
        i1 = (m & np.uint64(mask)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1E995)) & mask
        present = (self.table[i1] == fp[:, None]).any(axis=1)
        need = np.nonzero(~present)[0]
        present[need] |= (self.table[i2[need]] == fp[need, None]).any(axis=1)
        if self.overflow:
            for j in np.nonzero(~present)[0]:
                if (min(int(i1[j]), int(i2[j])), int(fp[j])) in self.overflow:
                    present[j] = True
        for j in np.nonzero(~present)[0]:
            fpj, a, b = int(fp[j]), int(i1[j]), int(i2[j])
            # recheck: an earlier in-batch insert may have placed this fp
            if (
                fpj in self.table[a]
                or fpj in self.table[b]
                or (self.overflow and (min(a, b), fpj) in self.overflow)
            ):
                continue
            self._insert_at(a, b, fpj)
            out[j] = True
        return out

    def __len__(self) -> int:
        return self.count

    # -- checkpoint ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "table": self.table,
                "count": self.count,
                "seed": self.seed,
                "overflow": self.overflow,
                "rng": int(self._rng_state),
            },
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        d = pickle.loads(data)
        f = cls.__new__(cls)
        f.table = d["table"]
        f.num_buckets = f.table.shape[0]
        f.count = d["count"]
        f.seed = d["seed"]
        f.overflow = d["overflow"]
        f._rng_state = np.uint64(d["rng"])
        return f


class BloomSeenFilter:
    """Sharded Bloom URL-seen filter — the north rule's other named sketch
    ("a sharded Bloom/cuckoo URL-seen filter").

    Standard Bloom construction over an m-bit array with k double-hashed
    probes (Kirsch–Mitzenmacher: idx_i = h1 + i·h2 mod m). Properties:

    - **no false negatives** by construction (bits are only ever set), so a
      seen URL is never refetched — the dedup invariant;
    - false positives at ε ≈ (1 - e^(-kn/m))^k; the default 16 bits/key with
      k=11 gives ε ≈ 5e-4 at full load — denser than cuckoo per key but
      without deletion support (the crawl never deletes);
    - deterministic for a fixed seed (a passing equality test stays passing);
    - ``to_bytes``/``from_bytes`` round-trips bit-exactly for checkpoint.

    ``add_batch`` is fully vectorized: one (n, k) index matrix, one gather
    for the pre-batch membership test, one scatter for the new bits;
    in-batch exact duplicates resolve first-wins via ``np.unique``.
    """

    _C1 = np.uint64(0xFF51AFD7ED558CCD)
    _C2 = np.uint64(0xC4CEB9FE1A85EC53)

    def __init__(self, capacity: int = 1 << 16, seed: int = 7,
                 bits_per_key: int = 16, k: int = 11):
        n_bits = max(128, int(capacity) * int(bits_per_key))
        n_bits = (n_bits + 63) & ~63
        self.m = n_bits
        self.k = int(k)
        self.seed = np.uint64(seed)
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)
        self.n = 0

    def _probes(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(word_idx, bit_mask) matrices of shape (n, k)."""
        x = h.astype(np.uint64) ^ self.seed
        x ^= x >> np.uint64(33)
        h1 = x * self._C1
        h2 = (x * self._C2) | np.uint64(1)  # odd → full-period stride
        ks = np.arange(self.k, dtype=np.uint64)
        idx = (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.m)
        return (idx >> np.uint64(6)).astype(np.int64), \
            np.uint64(1) << (idx & np.uint64(63))

    def contains(self, h: int) -> bool:
        w, bit = self._probes(np.array([h], dtype=np.uint64))
        return bool(((self.words[w] & bit) != 0).all())

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool[n] (no false negatives)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        w, bit = self._probes(h)
        return ((self.words[w] & bit) != 0).all(axis=1)

    def add_if_new(self, h: int) -> bool:
        return bool(self.add_batch(np.array([h], dtype=np.uint64))[0])

    def add_batch(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        w, bit = self._probes(h)
        pre_seen = ((self.words[w] & bit) != 0).all(axis=1)
        # first-wins within the batch for exact duplicates
        _, first_pos = np.unique(h, return_index=True)
        is_first = np.zeros(len(h), dtype=bool)
        is_first[first_pos] = True
        new = (~pre_seen) & is_first
        nz = np.nonzero(new)[0]
        if nz.size:
            np.bitwise_or.at(self.words, w[nz].ravel(), bit[nz].ravel())
            self.n += int(nz.size)
        return new

    def __len__(self) -> int:
        return self.n

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"m": self.m, "k": self.k, "seed": int(self.seed), "n": self.n,
             "words": self.words.tobytes()},
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomSeenFilter":
        d = pickle.loads(data)
        f = cls.__new__(cls)
        f.m, f.k, f.seed, f.n = d["m"], d["k"], np.uint64(d["seed"]), d["n"]
        f.words = np.frombuffer(d["words"], dtype=np.uint64).copy()
        return f


class ExactSeenFilter:
    """Exact seen-set (conformance mode; API-compatible with CuckooFilter)."""

    def __init__(self, capacity: int = 0, seed: int = 0):
        self.items: set[int] = set()

    def contains(self, h: int) -> bool:
        return h in self.items

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        for j, h in enumerate(hashes):
            out[j] = int(h) in self.items
        return out

    def add_if_new(self, h: int) -> bool:
        if h in self.items:
            return False
        self.items.add(h)
        return True

    def add_batch(self, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        for j, h in enumerate(hashes):
            out[j] = self.add_if_new(int(h))
        return out

    def __len__(self) -> int:
        return len(self.items)

    def to_bytes(self) -> bytes:
        return pickle.dumps(sorted(self.items), protocol=4)

    @classmethod
    def from_bytes(cls, data: bytes) -> "ExactSeenFilter":
        f = cls()
        f.items = set(pickle.loads(data))
        return f


def seen_filter_class(kind: str):
    if kind == "cuckoo":
        return CuckooFilter
    if kind == "bloom":
        return BloomSeenFilter
    if kind == "exact":
        return ExactSeenFilter
    raise ValueError(f"unknown seen-filter kind {kind!r}")


def make_seen_filter(kind: str, capacity: int, seed: int = 7):
    if kind in ("cuckoo", "bloom"):
        return seen_filter_class(kind)(capacity, seed)
    return seen_filter_class(kind)()
