"""Byte-pair-encoding tokenizer: distributed training pass + actor-pool encode.

Engine addition (SURVEY §8 training-data operators) — the tokenizer-training
step an LLM data pipeline runs after curation. Algorithm is word-level BPE per
Sennrich et al. 2016 (arXiv:1508.07909): train merges on the corpus
word-frequency table, encode by applying merges in rank order.

Scale shape
-----------
* **Training** is ONE distributed word-count pass (per-batch Counter combiner →
  one word-keyed ``groupby().sum`` shuffle, rows ∝ distinct words, never corpus
  rows) followed by a driver-side merge loop over the word-frequency table.
  The driver pull is bounded: ``max_vocab_words`` caps the table via
  sort-by-(count desc, word asc) + limit BEFORE ``take_all`` — exact whenever
  distinct words ≤ cap (true at test scale; at web scale this is the standard
  frequency-truncated training set, and the cut is deterministic). The merge
  loop itself is corpus-size-independent: O(num_merges × affected-words) with
  an inverted pair→words index so each merge touches only words containing it.
* **Encoding** is an actor-pool ``map_batches`` stage: merge ranks compiled
  once per actor in ``__init__``, per-word memo exploits the Zipfian word
  distribution (hit rate >95 % on web text), no shuffle at all.

Determinism: ties in the merge loop break by (count desc, pair lexicographic
asc), so merges — and therefore every encoding — are bit-reproducible at any
partitioning. Pinned vs a serial oracle in tests/test_bpe.py.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

END = "</w>"  # end-of-word sentinel symbol (Sennrich-style)

import numpy as np  # noqa: E402  (vectorized stream hashing in the encoder)


def _pinv_u64(p: np.uint64) -> np.uint64:
    """Inverse of odd p mod 2^64 (Newton iteration)."""
    x = p
    with np.errstate(over="ignore"):
        for _ in range(5):
            x = x * (np.uint64(2) - p * x)
    return x


def _fnv1a(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def word_frequencies(ds, text_col: str = "text", max_vocab_words: int = 100_000):
    """Distributed word-frequency table: (word, n), whitespace pre-tokenized
    and lowercased. Combiner-first: the shuffle carries each batch's DISTINCT
    words. Result is capped at ``max_vocab_words`` rows by (n desc, word asc)
    so the driver pull in :func:`train_bpe` stays bounded at any corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update((text or "").lower().split())
        words = list(c.keys())
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    counted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
    )
    counted = counted.map_batches(
        lambda t: t.rename_columns(["word", "n"]), batch_format="pyarrow"
    )
    # Total order (n desc, word asc) then cap → deterministic bounded table.
    return counted.sort(["n", "word"], descending=[True, False]).limit(max_vocab_words)


def _pairs_of(syms: tuple) -> list:
    return list(zip(syms, syms[1:]))


def _merge_word(syms: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_merges_from_vocab(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """Driver-side merge loop over a (word, count) list → ordered merge rules
    [(left, right, pair_count), ...]. Incremental: an inverted pair→word-ids
    index means each merge recounts only the words that contain the pair —
    O(num_merges × affected words), independent of corpus size.

    Tie-break: max count, then lexicographically smallest (left, right) —
    total order ⇒ bit-deterministic merges."""
    words: list[tuple] = []  # word id → symbol tuple
    counts: list[int] = []
    for w, c in word_counts:
        if not w:
            continue
        words.append(tuple(w) + (END,))
        counts.append(c)

    pair_counts: Counter = Counter()
    pair_words: dict[tuple, set[int]] = {}
    for i, syms in enumerate(words):
        for p in _pairs_of(syms):
            pair_counts[p] += counts[i]
            pair_words.setdefault(p, set()).add(i)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best, best_n = None, 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n <= 0:
            break
        merges.append((best[0], best[1], best_n))
        joined = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            old = words[i]
            for p in _pairs_of(old):
                pair_counts[p] -= counts[i]
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del pair_words[p]
            new = _merge_word(old, best, joined)
            words[i] = new
            for p in _pairs_of(new):
                pair_counts[p] += counts[i]
                pair_words.setdefault(p, set()).add(i)
    return merges


def train_bpe(
    ds,
    text_col: str = "text",
    num_merges: int = 200,
    max_vocab_words: int = 100_000,
) -> pa.Table:
    """Train BPE merges on a documents Dataset → Arrow table
    (rank, left, right, pair_count), rank 0-based in merge order.

    One distributed word-count shuffle; driver work bounded by
    ``max_vocab_words`` rows (see module docstring)."""
    vocab_rows = word_frequencies(
        ds, text_col=text_col, max_vocab_words=max_vocab_words
    ).take_all()
    wc = [(r["word"], r["n"]) for r in vocab_rows]
    # take_all() order after sort is the (n desc, word asc) total order, but
    # re-sort defensively: the merge loop's determinism must not depend on it.
    wc.sort(key=lambda x: (-x[1], x[0]))
    merges = train_merges_from_vocab(wc, num_merges)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple, int]) -> tuple:
    """Apply merges in rank order to one word (standard greedy-by-rank BPE)."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair, best_pair[0] + best_pair[1])
    return syms


class BPEEncodeStage:
    """Actor-pool encode stage for ``map_batches(BPEEncodeStage, fn_constructor_args=(merges,), concurrency=N)``.

    ``__init__`` (once per actor) compiles the rank dict and seeds the word
    memo; ``__call__`` encodes a batch. Output appends ``n_bpe`` (token count)
    and ``bpe_hash`` (order-sensitive polynomial combine of per-token FNV-1a
    hashes, int64; token hashes memoized, combine vectorized) —
    a compact deterministic projection of the full encoding; pass
    ``emit_tokens=True`` to also emit the token list column (test/debug scale
    only: at 100 TB the token strings would triple the corpus bytes moved)."""

    # polynomial-combine constant for the order-sensitive stream hash
    _P = np.uint64(0x9E3779B97F4A7C15 | 1)

    def __init__(self, merges: list[tuple], text_col: str = "text", emit_tokens: bool = False):
        self.ranks = {(l, r): i for i, (l, r, *_rest) in enumerate(merges)}
        self.text_col = text_col
        self.emit_tokens = emit_tokens
        self.memo: dict[str, tuple] = {}
        # token → uint64 FNV hash memo: the token vocabulary is tiny
        # (chars + ≤ num_merges merge outputs), so each token's byte-level
        # FNV runs once per actor and the per-doc combine is vectorized
        self.tok_hash: dict[str, int] = {}
        self._pows = np.multiply.accumulate(
            np.full(4096, self._P, np.uint64)
        ) * _pinv_u64(self._P)  # p^0..p^4095, grown on demand

    def _encode_text(self, text: str) -> list:
        out: list = []
        memo = self.memo
        for w in (text or "").lower().split():
            toks = memo.get(w)
            if toks is None:
                toks = encode_word(w, self.ranks)
                if len(memo) < 2_000_000:  # bound actor heap on adversarial vocab
                    memo[w] = toks
            out.extend(toks)
        return out

    def _stream_hash(self, toks: list) -> int:
        """Order-sensitive hash of the token stream: per-token FNV-1a
        (memoized — the token vocabulary is chars + merges, tiny) combined
        as Σ fnv(tok_i)·p^i mod 2^64 (numpy-vectorized)."""
        if not toks:
            return 0
        th = self.tok_hash
        hs = np.empty(len(toks), np.uint64)
        for i, tok in enumerate(toks):
            h = th.get(tok)
            if h is None:
                h = th.setdefault(tok, _fnv1a(tok.encode()))
            hs[i] = h
        while len(toks) > len(self._pows):
            with np.errstate(over="ignore"):
                self._pows = np.concatenate(
                    [self._pows, self._pows * self._pows[-1] * self._P]
                )
        with np.errstate(over="ignore"):
            total = np.sum(hs * self._pows[: len(toks)], dtype=np.uint64)
        return int(total) & 0x7FFFFFFFFFFFFFFF

    def __call__(self, t: pa.Table) -> pa.Table:
        n_col, h_col, tok_col = [], [], []
        for text in t.column(self.text_col).to_pylist():
            toks = self._encode_text(text)
            n_col.append(len(toks))
            h_col.append(self._stream_hash(toks))
            if self.emit_tokens:
                tok_col.append(list(toks))
        t = t.append_column("n_bpe", pa.array(n_col, pa.int64())).append_column(
            "bpe_hash", pa.array(h_col, pa.int64())
        )
        if self.emit_tokens:
            t = t.append_column("bpe_tokens", pa.array(tok_col, pa.list_(pa.string())))
        return t


def encode_documents(
    ds,
    merges: list[tuple] | pa.Table,
    text_col: str = "text",
    emit_tokens: bool = False,
    concurrency: int | tuple = (1, 4),
):
    """Encode a documents Dataset with trained merges → appended columns
    ``n_bpe``, ``bpe_hash`` (and ``bpe_tokens`` when requested). Merge list is
    tiny (≤ num_merges rows) and ships once per actor via constructor args.

    Default concurrency is an AUTOSCALING (1, 4) pool: a fixed pool equal to
    the CPU count starves the upstream read / downstream sort on small
    clusters (observed livelock at num_cpus=4). At scale pass an explicit
    (min, max) sized to the node."""
    if isinstance(merges, pa.Table):
        merges = list(
            zip(
                merges.column("left").to_pylist(),
                merges.column("right").to_pylist(),
            )
        )
    return ds.map_batches(
        BPEEncodeStage,
        fn_constructor_args=(merges,),
        fn_constructor_kwargs={"text_col": text_col, "emit_tokens": emit_tokens},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
