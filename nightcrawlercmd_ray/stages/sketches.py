"""Distinct-count operators: exact (shuffle) and HyperLogLog (sketch).

The reference's only membership/distinct machinery is ``map[string]bool``
sets (SURVEY §2.7) — exact, single-process. At 100 TB an exact global
COUNT(DISTINCT) needs a full hash shuffle of the key column; the HLL sketch
replaces it with a fixed 2^p-byte register array that merges by elementwise
max — each batch folds its keys into a local register set, the tiny
register rows tree-merge, and NOTHING key-sized ever crosses the network.
This engine keeps both: the exact form (SQL-oracle-able, used as the
sketch's ground truth in tests) and the sketch (the 100-TB path, with the
standard ~1.04/sqrt(2^p) relative error).

Hashing: splitmix64 finalizer over int64 keys (vectorized numpy uint64
ops) — a public-domain mixer with full avalanche; string keys should be
pre-hashed upstream (e.g. the urlnorm url_hash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64[n] → uint64[n]."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _fold_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Fold a batch of 64-bit hashes into a fresh 2^p uint8 register array."""
    m = np.uint64(1 << p)
    idx = (hashes & (m - np.uint64(1))).astype(np.int64)
    rest = hashes >> np.uint64(p)
    # rho = number of leading zeros in the remaining (64-p) bits, + 1 =
    # (64-p) - bit_length(rest) + 1. bit_length via float64 log2 is only
    # exact below 2^32 (64-bit values like 2^50-1 round UP across the power
    # of two), so compute it on 32-bit halves.
    def _blen32(v: np.ndarray) -> np.ndarray:  # exact for v < 2^32
        w = np.zeros(len(v), dtype=np.int64)
        nz = v != 0
        w[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        return w

    hi = (rest >> np.uint64(32)).astype(np.uint64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    width = np.where(hi != 0, 32 + _blen32(hi), _blen32(lo))
    rho = ((64 - p) - width + 1).astype(np.uint8)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> float:
    """Classic HLL estimator with small-range (linear counting) correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, key_col: str, *, p: int = 14) -> dict:
    """Approximate COUNT(DISTINCT key_col) over an integer key column.

    Per-batch: hash keys (splitmix64) and fold into a 2^p register array;
    each batch yields ONE row carrying its registers (2^p bytes). The
    register rows merge by elementwise max on the driver — at most
    #blocks × 2^p bytes ever reach it (16 KB/block at p=14), regardless of
    input size. → {"estimate": float, "p": int, "registers": ndarray}.
    """

    def fold(t: pa.Table) -> pa.Table:
        keys = (
            pc.cast(t.column(key_col), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        regs = _fold_registers(splitmix64(keys), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for batch in ds.map_batches(fold, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in batch.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return {"estimate": _estimate(merged), "p": p, "registers": merged}


def exact_distinct_by(ds, key_col: str, by_col: str):
    """Exact per-group distinct count: → Dataset(by_col, n_distinct).

    Two-level: per-batch pre-dedup of (by, key) pairs (combiner — the
    shuffle carries at most the pair cardinality per block), ONE
    groupby(by, key) shuffle to global-dedup, then a tiny groupby(by)
    count. SQL oracle: ``COUNT(DISTINCT key) GROUP BY by``.
    """
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        keys = [by_col, key_col]
        return t.select(keys).group_by(keys).aggregate([])

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby([by_col, key_col])
        .count()
        .groupby(by_col)
        .aggregate(Count(alias_name="n_distinct"))
    )


# ---------------------------------------------------------------------------
# heavy hitters: Misra–Gries candidate pass + exact confirm pass
# ---------------------------------------------------------------------------


def _mg_trim(counter, k: int):
    """Misra–Gries trim of an exact batch counter to ≤ k survivors: subtract
    the (k+1)-th largest count from everything, drop ≤0. Returns (survivors
    dict, deduction) — every key's true batch count is understated by at most
    ``deduction`` (Misra & Gries 1982; merge validity per Agarwal et al.
    2013, "Mergeable Summaries")."""
    if len(counter) <= k:
        return counter, 0
    vals = sorted(counter.values(), reverse=True)
    d = vals[k]
    return {w: c - d for w, c in counter.items() if c > d}, d


# reserved marker keys for the in-band totals (cannot collide with real
# keys, which are space-joined [a-z]+ tokens and so always start ≥ 'a')
_MK_TOTAL = "\x00total"
_MK_DEDUCT = "\x00deduct"

_TOK_RE = None  # compiled lazily (keep module import light)


def _ngram_counter(texts, ngram: int):
    """Exact n-gram Counter over a batch: ``[a-z]+`` runs of the lowercased
    text (the bigram_counts tokenization family), n-grams space-joined."""
    global _TOK_RE
    if _TOK_RE is None:
        import re

        _TOK_RE = re.compile(r"[a-z]+")
    from collections import Counter

    c: Counter = Counter()
    for text in texts:
        toks = _TOK_RE.findall((text or "").lower())
        if ngram == 1:
            c.update(toks)
        else:
            c.update(
                " ".join(toks[i : i + ngram])
                for i in range(len(toks) - ngram + 1)
            )
    return c


def heavy_hitters_exact(
    ds,
    threshold: int,
    *,
    text_col: str = "text",
    ngram: int = 1,
    k: int = 4096,
):
    """EXACT n-gram heavy hitters — every n-gram with total corpus count
    ≥ ``threshold``, with its exact count — without ever shuffling the full
    n-gram-count table (whose size at web scale is corpus-order for n ≥ 2).

    Two passes (the classic sketch-then-confirm shape):

    1. **Candidate pass**: per-batch exact Counter → Misra–Gries trim to ≤ k
       rows (plus two in-band marker rows carrying the batch's token total
       and MG deduction) → ONE groupby(key).sum over ≤ (k+2)·num_batches
       compact rows. Any key with true count ≥ threshold has merged count
       ≥ threshold − D where D = Σ per-batch deductions, so filtering the
       merged summary at ``threshold − D`` (dataset-side, BEFORE the driver
       pull) cannot drop a true heavy hitter; the surviving candidate set is
       mathematically ≤ n_tokens/(threshold − D) keys — tiny whenever the
       threshold is meaningfully above the MG noise floor. If D ≥ threshold
       (k too small for this corpus/threshold), raises — the caller must
       raise k rather than silently lose recall.
    2. **Confirm pass**: candidate set broadcast once via ``ray.put``;
       per-batch combiner counts ONLY candidate keys → ONE tiny
       groupby(key).sum → filter ≥ threshold. Output is bit-exact
       (SQL-oracle-able: GROUP BY key HAVING count(*) ≥ threshold).

    Tokenization matches the bigram_counts family (``[a-z]+`` lowercased,
    n-grams space-joined). → Dataset(key, n).
    """
    import functools

    import ray

    def mg_partial(t: pa.Table) -> pa.Table:
        c = _ngram_counter(t.column(text_col).to_pylist(), ngram)
        total = sum(c.values())
        surv, d = _mg_trim(c, k)
        keys = list(surv.keys()) + [_MK_TOTAL, _MK_DEDUCT]
        ns = list(surv.values()) + [total, d]
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "n": pa.array(ns, pa.int64()),
        })

    merged = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("key")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["key", "n"]),
                     batch_format="pyarrow")
    ).materialize()  # SMALL post-aggregation summary (≤ (k+2)·batches rows,
    # already reduced) — materialized so the two filters below don't each
    # re-run the corpus pass; the corpus itself is never materialized
    # markers are exactly 2 rows after the groupby — a bounded driver pull
    # (filters run distributed via map_batches so the summary never reaches
    # the driver unfiltered)
    def only_markers(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("key"), pa.scalar("a")))

    marks = {r["key"]: r["n"]
             for r in merged.map_batches(
                 only_markers, batch_format="pyarrow").take_all()
             if r["key"] in (_MK_TOTAL, _MK_DEDUCT)}
    deduct = int(marks.get(_MK_DEDUCT, 0))
    if deduct >= threshold:
        raise ValueError(
            f"MG noise floor {deduct} ≥ threshold {threshold}: raise k "
            f"(currently {k}) to keep the no-false-negative guarantee"
        )
    floor = threshold - deduct

    def only_candidates(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t.column("n"), pa.scalar(floor)),
            pc.greater_equal(t.column("key"), pa.scalar("a")),
        )
        return t.filter(mask)

    cand_rows = merged.map_batches(
        only_candidates, batch_format="pyarrow"
    ).take_all()  # bounded: ≤ n_tokens/(threshold − deduct) rows
    candidates = frozenset(r["key"] for r in cand_rows)
    cand_ref = ray.put(candidates)

    def confirm_partial(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        c = _ngram_counter(t.column(text_col).to_pylist(), ngram)
        keep = [kk for kk in c if kk in cand]
        return pa.table({
            "key": pa.array(keep, pa.string()),
            "n": pa.array([c[kk] for kk in keep], pa.int64()),
        })

    return (
        ds.map_batches(confirm_partial, batch_format="pyarrow")
        .groupby("key")
        .sum("n")
        .map_batches(
            functools.partial(_finish_hh, threshold=threshold),
            batch_format="pyarrow",
        )
    )


def _finish_hh(t: pa.Table, threshold: int) -> pa.Table:
    t = t.rename_columns(["key", "n"])
    return t.filter(pc.greater_equal(t.column("n"), pa.scalar(threshold)))


def hll_distinct_by(ds, key_col: str, by_col: str, *, p: int = 12):
    """Approximate per-group COUNT(DISTINCT key_col) — the 100-TB path for
    grouped distincts: per-batch per-group register folding (each batch
    emits ≤ |groups-in-batch| rows of 2^p register bytes — NOTHING key-sized
    crosses the network), ONE groupby(by) shuffle of those compact blobs,
    elementwise-max merge per group (associative + commutative ⇒ register
    state, and therefore the estimate, is bit-identical at any
    partitioning). The exact sibling (``exact_distinct_by``) shuffles the
    full (by, key) pair set; use this when keys are wide or pairs ≈ corpus.

    Assumes moderate group cardinality (registers per group = 2^p bytes;
    p=12 → 4 KB — 10^6 groups ⇒ 4 GB spread across the cluster, fine; the
    estimator error is the standard ~1.04/√2^p ≈ 1.6 %).
    → Dataset(by_col, n_distinct_approx float64).
    """

    def fold(t: pa.Table) -> pa.Table:
        by = t.column(by_col).to_numpy(zero_copy_only=False)
        keys = (
            pc.cast(t.column(key_col), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        h = splitmix64(keys)
        groups, inv = np.unique(by, return_inverse=True)
        blobs = []
        for gi in range(len(groups)):
            blobs.append(_fold_registers(h[inv == gi], p).tobytes())
        return pa.table({
            by_col: pa.array(groups),
            "regs": pa.array(blobs, pa.binary()),
        })

    def merge(g: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in g.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                       out=merged)
        return pa.table({
            by_col: g.column(by_col).slice(0, 1),
            "n_distinct_approx": pa.array([_estimate(merged)], pa.float64()),
        })

    return (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(by_col)
        .map_groups(merge, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------- #
# count-min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------- #

_CM_SEEDS = np.uint64(0xA076_1D64_78BD_642F)  # xxh64 prime as the row-seed base


def _cm_rows(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices: row d hashes key via splitmix64(key ^
    seed_d) mod width — independent-enough rows, fully deterministic."""
    k = keys.astype(np.uint64, copy=False)
    out = np.empty((depth, len(k)), dtype=np.int64)
    for d in range(depth):
        with np.errstate(over="ignore"):
            out[d] = (splitmix64(k ^ (_CM_SEEDS * np.uint64(d + 1)))
                      % np.uint64(width)).astype(np.int64)
    return out


def count_min_sketch(ds, key_col: str, *, width: int = 2048,
                     depth: int = 4) -> np.ndarray:
    """Build a count-min frequency sketch of an int64 key column — the
    mergeable bounded-memory alternative to an exact groupby count when
    only approximate per-key frequencies are needed (heavy-hitter
    prefilters, frequency-capped sampling at 100 TB). Guarantee (pinned in
    tests): estimate ≥ true count, and ≤ true + ε·N with ε = e/width per
    row, amplified across ``depth`` independent rows.

    Scale shape: per-batch combiner scatters into a local (depth, width)
    int64 matrix and emits only its NONZERO cells in long form → ONE
    groupby(cell).sum bounded by depth·width distinct keys → the final
    ≤ depth·width rows assemble the matrix driver-side. The shuffle
    carries pre-aggregated cells, never raw keys; sketches from disjoint
    data merge by addition (the partials ARE merged sketches).
    """
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column(key_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        m = np.zeros((depth, width), dtype=np.int64)
        if len(keys):
            rows = _cm_rows(keys, depth, width)
            for d in range(depth):
                np.add.at(m[d], rows[d], 1)
        flat = m.reshape(-1)
        nz = np.flatnonzero(flat)
        return pa.table({"_cell": pa.array(nz.astype(np.int64)),
                         "_n": pa.array(flat[nz])})

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_cell")
        .aggregate(Sum("_n", alias_name="_n"))
        .take_all()
    )
    m = np.zeros(depth * width, dtype=np.int64)
    for r in rows:
        m[r["_cell"]] = r["_n"]
    return m.reshape(depth, width)


def cm_estimate(sketch: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-estimate counts for ``keys``: min over rows of the hashed
    cell — the classic CM upper-bound-minimizing read."""
    depth, width = sketch.shape
    rows = _cm_rows(np.asarray(keys, dtype=np.int64), depth, width)
    ests = np.stack([sketch[d, rows[d]] for d in range(depth)])
    return ests.min(axis=0)


def hll_cooccurrence(ds, *, id_col: str, item_col: str, p: int = 14):
    """Approximate distinct-entity co-occurrence per unordered item pair via
    HLL SKETCH ALGEBRA — the 100-TB sibling of the exact
    ``groupstats.cooccurrence_pairs``: |A ∩ B| ≈ |A| + |B| − |A ∪ B|, where
    |A ∪ B| is estimated from the elementwise-max register merge (union is
    EXACT on HLL state). One register-blob shuffle builds a per-item sketch
    (nothing id-sized crosses the network); the pairwise algebra then runs
    on |items| blobs of 2^p bytes — driver work ∝ items² × 2^p, independent
    of corpus size. Register state is associative-max, so the estimates are
    bit-identical at any partitioning.

    → pyarrow.Table ``(type_a, type_b, n_ids_approx float64)`` with the
    diagonal = each item's own estimate; intersections clamp at 0.
    """

    def fold(t: pa.Table) -> pa.Table:
        # drop null ids/items at the Arrow level (np.unique on an object
        # array with None raises; a null id would ride float64)
        t = pa.table(
            {
                item_col: pc.cast(t.column(item_col), pa.string()),
                id_col: pc.cast(t.column(id_col), pa.int64()),
            }
        ).drop_null()
        by = t.column(item_col).to_numpy(zero_copy_only=False)
        keys = (
            t.column(id_col)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        h = splitmix64(keys)
        groups, inv = np.unique(by, return_inverse=True)
        blobs = [
            _fold_registers(h[inv == gi], p).tobytes()
            for gi in range(len(groups))
        ]
        return pa.table({
            item_col: pa.array(groups.astype(str)),
            "regs": pa.array(blobs, pa.binary()),
        })

    def merge(g: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in g.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                       out=merged)
        return pa.table({
            item_col: g.column(item_col).slice(0, 1),
            "regs": pa.array([merged.tobytes()], pa.binary()),
        })

    rows = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(item_col)
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )  # |items| rows of 2^p-byte blobs — small by the item-vocabulary bound
    items = sorted(r[item_col] for r in rows)
    regs = {
        r[item_col]: np.frombuffer(r["regs"], dtype=np.uint8) for r in rows
    }
    est = {k: _estimate(v) for k, v in regs.items()}
    out_a, out_b, out_n = [], [], []
    for i, a in enumerate(items):
        for b in items[i:]:
            if a == b:
                n = est[a]
            else:
                union = _estimate(np.maximum(regs[a], regs[b]))
                n = max(0.0, est[a] + est[b] - union)
            out_a.append(a)
            out_b.append(b)
            out_n.append(n)
    return pa.table({
        "type_a": pa.array(out_a, pa.string()),
        "type_b": pa.array(out_b, pa.string()),
        "n_ids_approx": pa.array(out_n, pa.float64()),
    })
