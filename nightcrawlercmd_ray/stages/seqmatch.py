"""Per-entity sequence pattern matching (MATCH_RECOGNIZE-lite): order each
entity's events, join the item column into one delimited string, and test a
regular expression against it — "did this user view, then (anything), then
purchase?" without per-user Python.

The reference's nearest analog is its body-match scan filter
(``mainScan.go`` substring tests per response); this lifts the idea to
ordered per-entity event streams.

Scale shape: ONE coarse keyed exchange on ``hash(id) % P`` (each entity's
events land wholly in one partition), then a fully vectorized in-partition
pipeline: Arrow sort by (id, *order_cols), run-length the ids, build the
per-entity sequences with ``LargeListArray`` offsets + the ``binary_join``
kernel, and evaluate the pattern with the RE2-based
``match_substring_regex`` kernel — the SAME regex engine DuckDB's
``regexp_matches`` uses, so results are SQL-oracle-able bit-for-bit.
Output rows ∝ entities, not events. Per-entity sequence length is bounded
by the entity's event count — callers own that bound (sessionize first for
unbounded streams).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nightcrawlercmd_ray.stages.groupstats import _coarse_part, default_partitions


def sequence_match(
    ds,
    *,
    id_col: str,
    item_col: str,
    order_cols: list[str],
    pattern: str,
    sep: str = ">",
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """→ Dataset ``(id_col, n_events, matched)`` — one row per entity;
    ``matched`` is int64 0/1 (RE2 partial match of ``pattern`` against the
    entity's ``sep``-joined, (*order_cols)-ordered item string). Item values
    must not contain ``sep`` (validated per batch)."""
    P = num_partitions or default_partitions(n_rows)

    def partial(t: pa.Table) -> pa.Table:
        items = pc.cast(t.column(item_col), pa.string())
        if pc.any(pc.match_substring(items, sep)).as_py():
            raise ValueError(
                f"sequence_match: {item_col!r} values contain the separator "
                f"{sep!r} — pick another sep"
            )
        cols = {
            "_id": pc.cast(t.column(id_col), pa.int64()),
            "_it": items,
        }
        for i, c in enumerate(order_cols):
            cols[f"_o{i}"] = t.column(c)
        out = pa.table(cols)
        ids = out.column("_id").combine_chunks().to_numpy(zero_copy_only=False)
        return out.append_column(
            "_c", pa.array(_coarse_part(ids, P).astype(np.int64))
        )

    def match_partition(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["_c"]).combine_chunks()
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "matched": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        keys = [("_id", "ascending")] + [
            (f"_o{i}", "ascending") for i in range(len(order_cols))
        ]
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        ids = t.column("_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        new = np.ones(n, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        # int32 list offsets: a partition holds ≪ 2^31 rows by construction
        offsets = pa.array(np.append(starts, n).astype(np.int32), pa.int32())
        seq_list = pa.ListArray.from_arrays(
            offsets, t.column("_it").combine_chunks()
        )
        seqs = pc.binary_join(seq_list, pa.scalar(sep, pa.string()))
        matched = pc.match_substring_regex(seqs, pattern)
        return pa.table(
            {
                id_col: pa.array(ids[starts]),
                "n_events": pa.array(counts),
                "matched": pc.cast(matched, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(match_partition, batch_format="pyarrow")
    )


def transition_counts(
    ds,
    *,
    id_col: str,
    item_col: str,
    order_cols: list[str],
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """Markov transition matrix over per-entity ordered item streams: for
    every adjacent (prev → next) item pair within an entity's
    (*order_cols)-ordered events, the total count across all entities —
    the corpus-level behavior model (SQL: LAG OVER PARTITION BY).

    Same one-exchange shape as :func:`sequence_match`; the in-partition
    work is a sort + two shifted-array compares. Output ∝ |items|².
    → Dataset ``(type_from, type_to, n)``, sorted.
    """
    P = num_partitions or default_partitions(n_rows)

    def partial(t: pa.Table) -> pa.Table:
        cols = {
            "_id": pc.cast(t.column(id_col), pa.int64()),
            "_it": pc.cast(t.column(item_col), pa.string()),
        }
        for i, c in enumerate(order_cols):
            cols[f"_o{i}"] = t.column(c)
        out = pa.table(cols)
        ids = out.column("_id").combine_chunks().to_numpy(zero_copy_only=False)
        return out.append_column(
            "_c", pa.array(_coarse_part(ids, P).astype(np.int64))
        )

    def count_partition(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["_c"]).combine_chunks()
        empty = pa.table(
            {
                "type_from": pa.array([], pa.string()),
                "type_to": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "_g": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        keys = [("_id", "ascending")] + [
            (f"_o{i}", "ascending") for i in range(len(order_cols))
        ]
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        ids = t.column("_id").to_numpy(zero_copy_only=False)
        same = ids[1:] == ids[:-1]  # adjacent rows of the SAME entity
        if not same.any():
            return empty
        items = t.column("_it").combine_chunks()
        idx = np.flatnonzero(same)
        pairs = pa.table(
            {
                "type_from": items.take(pa.array(idx)),
                "type_to": items.take(pa.array(idx + 1)),
            }
        )
        c = pairs.group_by(["type_from", "type_to"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "type_from": c.column("type_from"),
                "type_to": c.column("type_to"),
                "n": pc.cast(c.column("count_all"), pa.int64()),
                "_g": pa.array(np.zeros(c.num_rows, np.int64)),
            }
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(count_partition, batch_format="pyarrow")
    )

    def fold(t: pa.Table) -> pa.Table:
        g = (t.drop_columns(["_g"])
             .group_by(["type_from", "type_to"]).aggregate([("n", "sum")]))
        out = pa.table(
            {
                "type_from": g.column("type_from"),
                "type_to": g.column("type_to"),
                "n": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )
        return out.take(
            pc.sort_indices(
                out,
                sort_keys=[("type_from", "ascending"), ("type_to", "ascending")],
            )
        )

    # final fold in ONE call (see groupstats.cooccurrence_pairs: a split
    # map_batches would emit duplicate keys with partial sums)
    return partials.groupby("_g").map_groups(fold, batch_format="pyarrow")


def first_event_lag(
    ds,
    *,
    id_col: str,
    item_col: str,
    ts_col: str,
    from_item: str,
    to_item: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """Per-entity conversion lag: µs between the FIRST ``from_item`` and the
    FIRST ``to_item`` event, for entities where the latter is not earlier —
    the time-to-convert metric. Per-batch combiner (one min per (entity,
    side) per block), ONE coarse keyed exchange, vectorized in-partition
    min-fold + pivot. → Dataset ``(id_col, lag_us)``.
    """
    P = num_partitions or default_partitions(n_rows)
    SENT = np.int64(np.iinfo(np.int64).max)

    def partial(t: pa.Table) -> pa.Table:
        it = pc.cast(t.column(item_col), pa.string())
        mask = pc.or_(
            pc.equal(it, pa.scalar(from_item)), pc.equal(it, pa.scalar(to_item))
        )
        sel = pa.table(
            {
                "_id": pc.cast(t.column(id_col), pa.int64()),
                "_p": pc.cast(
                    pc.equal(it, pa.scalar(to_item)), pa.int64()
                ),
                "_ts": pc.cast(t.column(ts_col), pa.int64()),
            }
        ).filter(mask)
        g = sel.group_by(["_id", "_p"]).aggregate([("_ts", "min")])
        ids = g.column("_id").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_id": g.column("_id"),
                "_p": g.column("_p"),
                "_ts": g.column("_ts_min"),
                "_c": pa.array(_coarse_part(ids, P).astype(np.int64)),
            }
        )

    def lag_partition(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["_c"]).combine_chunks()
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "lag_us": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by(["_id", "_p"]).aggregate([("_ts", "min")])
        ids = g.column("_id").to_numpy(zero_copy_only=False)
        side = g.column("_p").to_numpy(zero_copy_only=False)
        ts = g.column("_ts_min").to_numpy(zero_copy_only=False)
        uids, inv = np.unique(ids, return_inverse=True)
        fr = np.full(len(uids), SENT)
        to = np.full(len(uids), SENT)
        fr[inv[side == 0]] = ts[side == 0]
        to[inv[side == 1]] = ts[side == 1]
        ok = (fr != SENT) & (to != SENT) & (to >= fr)
        return pa.table(
            {
                id_col: pa.array(uids[ok]),
                "lag_us": pa.array(to[ok] - fr[ok]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(lag_partition, batch_format="pyarrow")
    )
