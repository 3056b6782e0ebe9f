"""Edit-distance-≤1 self-join over a string column (fuzzy dedup of short
fields: names, tokens, hostnames, product codes).

Algorithm: deletion-neighborhood blocking (the SymSpell construction —
public domain, Garbe 2012). For a word w let D(w) = {w} ∪ {w with one char
deleted}. Two distinct words a, b satisfy Levenshtein(a, b) ≤ 1 **iff**
D(a) ∩ D(b) ≠ ∅ AND a verification holds: sharing a variant with
|a| = |b| only proves ED ≤ 2 (e.g. "ab"/"ba" share "a"), so equal-length
candidates are confirmed by a Hamming-distance-≤1 check (for equal lengths,
ED = 1 ⟺ exactly one substitution ⟺ Hamming = 1); candidates with
||a|−|b|| = 1 need no check (the shared variant must be the shorter word
itself, i.e. a literal deletion). Lengths can never differ by ≥ 2.

Scale shape: distinct-value combiner per batch, variant expansion (cost ∝
Σ|word| over DISTINCT words per block — a dictionary-side loop, not a row
loop), ONE coarse keyed exchange on ``hash(variant) % P``, vectorized
in-partition candidate generation (sort by (variant, word), run-length the
variants, repeat/ramp pair enumeration) and a fully vectorized UTF-32
Hamming verify. The same (a, b) pair can share variants in several
partitions, so a second tiny coarse exchange on ``hash(a) % P`` dedups
pairs — exchange rows ∝ matched pairs, never the dictionary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nightcrawlercmd_ray.stages.groupstats import default_partitions


def _string_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized 64-bit string hash (polars/xxhash — no per-row Python)."""
    import polars as pl

    s = pl.from_arrow(
        col if isinstance(col, (pa.Array, pa.ChunkedArray))
        else pa.chunked_array([col])
    ).fill_null("")
    return s.hash(seed=7).to_numpy().astype(np.uint64)


def _deletion_variants(words: list[str]) -> tuple[list[str], list[str]]:
    """(variant, word) expansion: w itself plus every single-char deletion.
    Python loop over DISTINCT words only — bounded by dictionary size."""
    vs: list[str] = []
    ws: list[str] = []
    for w in words:
        vs.append(w)
        ws.append(w)
        for i in range(len(w)):
            vs.append(w[:i] + w[i + 1 :])
            ws.append(w)
    return vs, ws


def _hamming_le1_mask(a: list[str], b: list[str]) -> np.ndarray:
    """Vectorized Hamming ≤ 1 over equal-length string pairs, grouped by
    length: UTF-32 encode to fixed-width uint32 rows, count mismatches."""
    n = len(a)
    out = np.zeros(n, dtype=bool)
    lens = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    for L in np.unique(lens):
        idx = np.flatnonzero(lens == L)
        if L == 0:
            out[idx] = True  # both empty → equal (callers exclude a == b)
            continue
        xa = np.frombuffer(
            "".join(a[i] for i in idx).encode("utf-32-le"), np.uint32
        ).reshape(len(idx), L)
        xb = np.frombuffer(
            "".join(b[i] for i in idx).encode("utf-32-le"), np.uint32
        ).reshape(len(idx), L)
        out[idx] = (xa != xb).sum(axis=1) <= 1
    return out


def _expand_fn(col: str, P: int, side: int):
    """Per-batch variant expansion: distinct words → (variant, word, side)."""

    def expand(t: pa.Table) -> pa.Table:
        d = (
            pa.table({"w": pc.cast(t.column(col), pa.string())})
            .group_by(["w"])
            .aggregate([])
        )
        words = d.column("w").to_pylist()
        vs, ws = _deletion_variants([w for w in words if w is not None])
        out = pa.table(
            {
                "_v": pa.array(vs, pa.string()),
                "w": pa.array(ws, pa.string()),
                "_side": pa.array(np.full(len(vs), side, dtype=np.int64)),
            }
        )
        coarse = (_string_hash(out.column("_v")) % np.uint64(P)).astype(np.int64)
        return out.append_column("_c", pa.array(coarse))

    return expand


def edit_distance_pairs(
    ds,
    col: str,
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """All unordered pairs (a < b, string order) of DISTINCT values of
    ``col`` with Levenshtein distance ≤ 1.

    → Dataset ``(word_a, word_b)``, globally distinct.
    """
    P = num_partitions or default_partitions(n_rows)
    tagged = ds.map_batches(
        _expand_fn(col, P, 0), batch_format="pyarrow", batch_size=65536
    )
    return _ed1_core(tagged, P, bipartite=False)


def edit_distance_join(
    ds_a,
    ds_b,
    *,
    col_a: str,
    col_b: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """Bipartite record linkage: every (a ∈ A, b ∈ B) pair of DISTINCT
    values with Levenshtein(a, b) ≤ 1 — equality included (exact matches
    are linkages too). Same deletion-neighborhood blocking as
    :func:`edit_distance_pairs`, with a side tag riding the variant rows so
    only CROSS-side pairs are emitted (never A×A or B×B).

    → Dataset ``(word_a, word_b)`` — word_a from A, word_b from B.
    """
    P = num_partitions or default_partitions(n_rows)
    ta = ds_a.map_batches(
        _expand_fn(col_a, P, 0), batch_format="pyarrow", batch_size=65536
    )
    tb = ds_b.map_batches(
        _expand_fn(col_b, P, 1), batch_format="pyarrow", batch_size=65536
    )
    return _ed1_core(ta.union(tb), P, bipartite=True)


def _ed1_core(tagged, P: int, *, bipartite: bool):

    def candidates(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["_c"]).combine_chunks()
        t = t.group_by(["_v", "w", "_side"]).aggregate([])  # cross-block distinct
        order = pc.sort_indices(
            t, sort_keys=[("_v", "ascending"), ("w", "ascending"),
                          ("_side", "ascending")]
        )
        t = t.take(order)
        empty = pa.table(
            {
                "word_a": pa.array([], pa.string()),
                "word_b": pa.array([], pa.string()),
            }
        )
        n = t.num_rows
        if n == 0:
            return empty
        v_arr = t.column("_v").combine_chunks()
        new = np.ones(n, dtype=bool)
        if n > 1:
            # vectorized run boundaries on the actual variant strings
            neq = pc.not_equal(v_arr.slice(1), v_arr.slice(0, n - 1))
            new[1:] = neq.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        keep = counts > 1
        if not keep.any():
            return empty
        within = np.arange(n) - np.repeat(starts, counts)
        reps = np.repeat(counts, counts) - within - 1  # strict i < j
        a_idx = np.repeat(np.arange(n), reps)
        total = int(reps.sum())
        if total == 0:
            return empty
        offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b_idx = a_idx + 1 + (np.arange(total) - np.repeat(offs, reps))
        wa = t.column("w").take(pa.array(a_idx)).to_pylist()
        wb = t.column("w").take(pa.array(b_idx)).to_pylist()
        ok = np.ones(len(wa), dtype=bool)
        if bipartite:
            sd = t.column("_side").to_numpy(zero_copy_only=False)
            sa, sb = sd[a_idx], sd[b_idx]
            ok &= sa != sb  # cross-side pairs only
            # orient: word_a from side 0 (A), word_b from side 1 (B)
            flip = np.flatnonzero(ok & (sa == 1))
            if len(flip):
                wa = np.array(wa, dtype=object)
                wb = np.array(wb, dtype=object)
                wa[flip], wb[flip] = wb[flip], wa[flip].copy()
                wa, wb = wa.tolist(), wb.tolist()
        # within a variant run w is sorted; in the self-join the rows are
        # distinct words so word_a < word_b strictly. Only equal-length
        # pairs still need the Hamming verify (equal strings pass it — the
        # bipartite join keeps them as exact linkages; the self-join can
        # never produce them)
        la = np.fromiter((len(x) for x in wa), dtype=np.int64, count=len(wa))
        lb = np.fromiter((len(x) for x in wb), dtype=np.int64, count=len(wb))
        eq = np.flatnonzero((la == lb) & ok)
        if len(eq):
            ok[eq] &= _hamming_le1_mask(
                [wa[i] for i in eq], [wb[i] for i in eq]
            )
        pairs = pa.table(
            {
                "word_a": pa.array(wa, pa.string()),
                "word_b": pa.array(wb, pa.string()),
            }
        ).filter(pa.array(ok))
        # in-partition dedup (the same pair may share >1 variant here)
        pairs = pairs.group_by(["word_a", "word_b"]).aggregate([])
        h = (_string_hash(pairs.column("word_a")) % np.uint64(P)).astype(np.int64)
        return pairs.append_column("_c2", pa.array(h))

    def dedup_pairs(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["_c2"]).combine_chunks()
        t = t.group_by(["word_a", "word_b"]).aggregate([])
        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[("word_a", "ascending"), ("word_b", "ascending")],
            )
        )

    return (
        tagged.groupby("_c")
        .map_groups(candidates, batch_format="pyarrow")
        .groupby("_c2")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )
