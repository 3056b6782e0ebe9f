"""Grouped statistical aggregates: per-group MODE (most-frequent value with a
deterministic tie-break) and exact pairwise second moments (the covariance /
correlation building blocks) over integer columns.

The reference's nearest analog is its word-count report (``mainReport.go``
count-per-key with a pinned exemplar); these generalize that shape to the
statistics a corpus-profiling pass needs.

Scale shape:

* ``mode_per_group`` — per-batch COMBINER first (``pyarrow`` hash count of
  (group, value) inside ``map_batches``), so the shuffle carries one compact
  count row per distinct (group, value) per block, never raw rows; then ONE
  coarse keyed exchange (``group_hash % P``) and a fully vectorized
  in-partition run-sum + arg-max (sort by ``(group, -count, value)``, take
  group firsts). No per-group Python dispatch.
* ``pairwise_moments`` — a single streaming pass: every batch folds to ONE
  partial-moment row per column pair; the driver-visible reduce is a tiny
  ``groupby().sum()`` over ``blocks × pairs`` rows. Sums are exact int64 —
  callers supply integer-unit columns (cents / e2 units); the int64 headroom
  bound is documented per query (overflow would need ``Σx² ≥ 2^63``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _coarse_part(key: np.ndarray, P: int) -> np.ndarray:
    k = key.astype(np.uint64, copy=False)
    return ((k * _MIX) >> np.uint64(32)) % np.uint64(P)


def default_partitions(n_rows: int | None) -> int:
    """Coarse-partition count — single sizing policy, shared with the join
    stages (one place to tune)."""
    from nightcrawlercmd_ray.stages.joins import _coarse_partitions

    return _coarse_partitions(n_rows)


# --------------------------------------------------------------------------- #
# MODE per group
# --------------------------------------------------------------------------- #
def mode_per_group(
    ds,
    *,
    group_col: str,
    value_col: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """For each group: the most frequent value, ties broken to the SMALLEST
    value (string order), plus its count. Equivalent SQL::

        SELECT g, v, cnt FROM (SELECT g, v, count(*) cnt ... GROUP BY g, v)
        QUALIFY row_number() OVER (PARTITION BY g ORDER BY cnt DESC, v) = 1

    → Dataset ``(group_col, mode_value:str, cnt:int64)``, deterministic at
    any parallelism.
    """
    P = num_partitions or default_partitions(n_rows)

    def partial(t: pa.Table) -> pa.Table:
        counts = (
            pa.table(
                {
                    "g": pc.cast(t.column(group_col), pa.int64()),
                    "v": pc.cast(t.column(value_col), pa.string()),
                }
            )
            .group_by(["g", "v"])
            .aggregate([([], "count_all")])
        )
        g = counts.column("g").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "g": counts.column("g"),
                "v": counts.column("v"),
                "cnt": pc.cast(counts.column("count_all"), pa.int64()),
                "_c": pa.array(_coarse_part(g, P).astype(np.int64)),
            }
        )

    def winners(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["_c"]).combine_chunks()
        # fold duplicate (g, v) partials from different blocks
        t = t.group_by(["g", "v"]).aggregate([("cnt", "sum")])
        cnt = pc.cast(t.column("cnt_sum"), pa.int64())
        t = pa.table({"g": t.column("g"), "v": t.column("v"), "cnt": cnt})
        order = pc.sort_indices(
            t,
            sort_keys=[("g", "ascending"), ("cnt", "descending"), ("v", "ascending")],
        )
        t = t.take(order)
        g = t.column("g").to_numpy(zero_copy_only=False)
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.int64()),
                    "mode_value": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        first = np.ones(n, dtype=bool)
        first[1:] = g[1:] != g[:-1]
        idx = np.flatnonzero(first)
        win = t.take(pa.array(idx))
        return pa.table(
            {
                group_col: win.column("g"),
                "mode_value": win.column("v"),
                "cnt": win.column("cnt"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(winners, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------- #
# item co-occurrence by distinct entity
# --------------------------------------------------------------------------- #
def cooccurrence_pairs(
    ds,
    *,
    id_col: str,
    item_col: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """For every unordered item pair (a ≤ b, diagonal included): the number
    of DISTINCT entities that have both — the market-basket / co-click
    matrix. The diagonal row (a, a) is each item's distinct-entity count.

    Scale shape: per-batch distinct-(id, item) combiner (``pyarrow``
    hash-distinct — duplicate events never ride the shuffle), ONE coarse
    keyed exchange on ``hash(id) % P`` (each entity lands wholly in one
    partition, so in-partition pair counts are disjoint-complete), then a
    fully vectorized in-partition expansion: sort by (id, item), run-length
    the ids, and enumerate each run's i ≤ j index pairs with the repeat /
    ramp trick — no per-entity Python dispatch. The final exchange is the
    tiny |items|²-row pair-count fold. Per-entity pair fan-out is
    k(k+1)/2 — callers own the bound on distinct items per entity (item
    vocabularies here are small: event types, labels, tags).

    → Dataset ``(type_a, type_b, n_ids)``.
    """
    P = num_partitions or default_partitions(n_rows)

    def partial(t: pa.Table) -> pa.Table:
        d = (
            pa.table(
                {
                    "i": pc.cast(t.column(id_col), pa.int64()),
                    "v": pc.cast(t.column(item_col), pa.string()),
                }
            )
            .group_by(["i", "v"])
            .aggregate([])
        )
        ids = d.column("i").combine_chunks().to_numpy(zero_copy_only=False)
        return d.append_column(
            "_c", pa.array(_coarse_part(ids, P).astype(np.int64))
        )

    def pair_counts(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["_c"]).combine_chunks()
        t = t.group_by(["i", "v"]).aggregate([])  # cross-block distinct
        order = pc.sort_indices(
            t, sort_keys=[("i", "ascending"), ("v", "ascending")]
        )
        t = t.take(order)
        ids = t.column("i").to_numpy(zero_copy_only=False)
        n = len(ids)
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n_ids": pa.array([], pa.int64()),
                "_g": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        new = np.ones(n, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        # for each row (sorted, grouped): it is the 'a' of pairs with the
        # next (k - within_idx) rows of its own run, itself included
        within = np.arange(n) - np.repeat(starts, counts)
        reps = np.repeat(counts, counts) - within
        a_idx = np.repeat(np.arange(n), reps)
        offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b_idx = a_idx + (np.arange(int(reps.sum())) - np.repeat(offs, reps))
        items = t.column("v")
        pairs = pa.table(
            {
                "type_a": items.take(pa.array(a_idx)),
                "type_b": items.take(pa.array(b_idx)),
            }
        )
        c = pairs.group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "type_a": c.column("type_a"),
                "type_b": c.column("type_b"),
                "n_ids": pc.cast(c.column("count_all"), pa.int64()),
                "_g": pa.array(np.zeros(c.num_rows, np.int64)),
            }
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(pair_counts, batch_format="pyarrow")
    )

    def fold(t: pa.Table) -> pa.Table:
        g = (t.drop_columns(["_g"])
             .group_by(["type_a", "type_b"]).aggregate([("n_ids", "sum")]))
        out = pa.table(
            {
                "type_a": g.column("type_a"),
                "type_b": g.column("type_b"),
                "n_ids": pc.cast(g.column("n_ids_sum"), pa.int64()),
            }
        )
        return out.take(
            pc.sort_indices(
                out,
                sort_keys=[("type_a", "ascending"), ("type_b", "ascending")],
            )
        )

    # final fold in ONE call — groupby(const).map_groups hands the whole
    # partial set to `fold` (a split map_batches would emit the same pair
    # several times with partial sums once partials exceed one batch)
    return partials.groupby("_g").map_groups(fold, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# exact pairwise moments
# --------------------------------------------------------------------------- #
def pairwise_moments(ds, cols: list[str]):
    """Exact second moments for every unordered column pair (a ≤ b by name):
    ``(var_a, var_b, n, sum_a, sum_b, sum_aa, sum_bb, sum_ab)`` — all int64,
    associative, order-free. Covariance/correlation derive exactly:
    ``cov = (n·Σab − Σa·Σb) / n²``. Columns must already be integer-unit
    (cents / counts); callers own the ``Σx² < 2^63`` headroom argument.

    → pyarrow.Table, one row per pair, sorted by (var_a, var_b).
    """
    pairs = [(a, b) for i, a in enumerate(sorted(cols)) for b in sorted(cols)[i:]]

    def partial(t: pa.Table) -> pa.Table:
        # complete-case: drop rows with ANY null BEFORE to_numpy (a
        # null-bearing int64 column otherwise rides float64 — NaN becomes
        # INT64_MIN and >2^53 values lose exact identity)
        t = t.select(list(cols)).drop_null()
        arrs = {
            c: t.column(c).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            for c in cols
        }
        n = len(t)
        rows = {
            "var_a": [], "var_b": [], "n": [], "sum_a": [], "sum_b": [],
            "sum_aa": [], "sum_bb": [], "sum_ab": [],
        }
        for a, b in pairs:
            xa, xb = arrs[a], arrs[b]
            rows["var_a"].append(a)
            rows["var_b"].append(b)
            rows["n"].append(n)
            rows["sum_a"].append(int(xa.sum()))
            rows["sum_b"].append(int(xb.sum()))
            rows["sum_aa"].append(int((xa * xa).sum()))
            rows["sum_bb"].append(int((xb * xb).sum()))
            rows["sum_ab"].append(int((xa * xb).sum()))
        return pa.table(
            {
                "var_a": pa.array(rows["var_a"], pa.string()),
                "var_b": pa.array(rows["var_b"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "sum_a": pa.array(rows["sum_a"], pa.int64()),
                "sum_b": pa.array(rows["sum_b"], pa.int64()),
                "sum_aa": pa.array(rows["sum_aa"], pa.int64()),
                "sum_bb": pa.array(rows["sum_bb"], pa.int64()),
                "sum_ab": pa.array(rows["sum_ab"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    # blocks × pairs rows — a driver-side Arrow fold of a tiny table
    import ray

    tables = [x for x in ray.get(partials.to_arrow_refs()) if x.num_rows]
    if not tables:
        raise ValueError("pairwise_moments: no rows")
    t = pa.concat_tables(tables).combine_chunks()
    agg = t.group_by(["var_a", "var_b"]).aggregate(
        [("n", "sum"), ("sum_a", "sum"), ("sum_b", "sum"),
         ("sum_aa", "sum"), ("sum_bb", "sum"), ("sum_ab", "sum")]
    )
    out = pa.table(
        {
            "var_a": agg.column("var_a"),
            "var_b": agg.column("var_b"),
            "n": pc.cast(agg.column("n_sum"), pa.int64()),
            "sum_a": pc.cast(agg.column("sum_a_sum"), pa.int64()),
            "sum_b": pc.cast(agg.column("sum_b_sum"), pa.int64()),
            "sum_aa": pc.cast(agg.column("sum_aa_sum"), pa.int64()),
            "sum_bb": pc.cast(agg.column("sum_bb_sum"), pa.int64()),
            "sum_ab": pc.cast(agg.column("sum_ab_sum"), pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("var_a", "ascending"), ("var_b", "ascending")])
    )
