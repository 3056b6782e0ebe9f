"""Distributed temporal joins — engine additions beyond the reference (which
has no join operators at all; SURVEY §2.6 covers only the crawl's URL⟕page
lookup). These are the join shapes a large-scale event/training-data pipeline
needs and Ray Data lacks natively: the **as-of join** (for each left row, the
latest right row with the same key and timestamp ≤ the left's).

Scale shape (the §2.6 custom-operator recipe, option (a)): both sides are
tagged and unioned into ONE stream, ONE coarse keyed shuffle
(``groupby(key_hash % P)``) co-locates each key's rows, and the per-partition
work is a single vectorized ``pandas.merge_asof`` over the partition's
key-sorted frame — no per-key Python dispatch, per-partition memory bounded
by the partition count (∝ row count). Raw payload columns ride the one
shuffle; nothing is ever materialized on the driver.

Partitioning assumption: a single join key's rows fit in one partition (keys
are hash-spread, so only a pathologically hot key violates this — salt such
keys upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _coarse_partitions(n_rows: int | None, rows_per_partition: int = 65536) -> int:
    if n_rows is None:
        n_rows = rows_per_partition  # unknown: single-partition fallback
    return int(min(1 << 16, max(1, n_rows // rows_per_partition + 1)))


def asof_join(
    left,
    right,
    *,
    by: str,
    on: str,
    suffix: str = "_r",
    num_partitions: int | None = None,
    n_rows: int | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
):
    """As-of join: for each left row, attach the LAST right row with the same
    ``by`` key and ``on`` value ≤ the left's (``direction="backward"``, the
    default) or the FIRST right row with ``on`` ≥ the left's
    (``direction="forward"``); inner — left rows with no match are dropped.
    ``tolerance`` (same units as ``on``) bounds the match gap: a candidate
    farther than ``tolerance`` is no match. Ties on the right (equal
    ``(by, on)``) resolve deterministically at any parallelism: the right
    frame is sorted by its payload columns, and pandas' merge_asof picks the
    LAST such row backward / the FIRST forward.

    ``by`` must be an integer key column and ``on`` an ordered numeric column
    (cast timestamps to int64 epoch units upstream) present in BOTH inputs.
    Right payload columns that clash with left names get ``suffix``.
    → Dataset(by, on, *left_payload, *right_payload[suffixed]).
    """
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = [n for n in l_schema.names if n not in (by, on)]
    r_names = [n for n in r_schema.names if n not in (by, on)]
    l_types = {n: l_schema.types[l_schema.names.index(n)] for n in l_names}
    r_types = {n: r_schema.types[r_schema.names.index(n)] for n in r_names}
    r_out = {n: (n + suffix if (n in l_names or n in (by, on)) else n) for n in r_names}

    union_fields = (
        [("_side", pa.int8()), (by, pa.int64()), (on, pa.int64())]
        + [(n, l_types[n]) for n in l_names]
        + [(r_out[n], r_types[n]) for n in r_names]
        + [("_m", pa.int8())]  # non-null marker on RIGHT rows: inner-join
        # filter keys off it, never off a payload column (a matched right row
        # whose first payload is legitimately null must survive, and a
        # payload-less right side must still give inner — ADVICE r2)
    )
    union_schema = pa.schema(union_fields)
    P = num_partitions or _coarse_partitions(n_rows)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
                by: pc.cast(t.column(by), pa.int64()),
                on: pc.cast(t.column(on), pa.int64()),
            }
            for name in l_names:
                cols[name] = (
                    pc.cast(t.column(name), l_types[name])
                    if side == 0 else pa.nulls(n, l_types[name])
                )
            for name in r_names:
                cols[r_out[name]] = (
                    pc.cast(t.column(name), r_types[name])
                    if side == 1 else pa.nulls(n, r_types[name])
                )
            cols["_m"] = (
                pa.array(np.ones(n, dtype=np.int8))
                if side == 1 else pa.nulls(n, pa.int8())
            )
            out = pa.table(cols)
            key = out.column(by).to_numpy(zero_copy_only=False).astype(np.uint64)
            part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
            return out.append_column("_c", pa.array(part.astype(np.int64)))

        return fn

    stream = left.map_batches(tag(0), batch_format="pyarrow", batch_size=65536).union(
        right.map_batches(tag(1), batch_format="pyarrow", batch_size=65536)
    )

    out_fields = (
        [(by, pa.int64()), (on, pa.int64())]
        + [(n, l_types[n]) for n in l_names]
        + [(r_out[n], r_types[n]) for n in r_names]
    )

    def merge_partition(g: pa.Table) -> pa.Table:
        # split sides at the ARROW level, then convert with ArrowDtype:
        # a plain to_pandas() coerces null-bearing int64 to float64, silently
        # corrupting 63-bit hash ids > 2^53 (ADVICE r2) — ArrowDtype keeps
        # every payload exact through the merge
        side = g.column("_side")
        lt = g.filter(pc.equal(side, 0)).select([by, on] + l_names)
        rt = g.filter(pc.equal(side, 1)).select(
            [by, on] + [r_out[n] for n in r_names] + ["_m"]
        )
        empty = pa.table(
            {name: pa.array([], typ) for name, typ in out_fields}
        )
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        lf = lt.to_pandas(types_mapper=pd.ArrowDtype)
        rf = rt.to_pandas(types_mapper=pd.ArrowDtype)
        # merge_asof needs both frames globally sorted by `on`; right-side
        # ties (same by+on) resolve to the last row in sort order, so sorting
        # the right frame by its payload columns pins the winner
        lf = lf.sort_values([on, by], kind="stable")
        rf = rf.sort_values([on, by] + [r_out[n] for n in r_names], kind="stable")
        m = pd.merge_asof(lf, rf, on=on, by=by, direction=direction,
                          tolerance=tolerance)
        m = m[m["_m"].notna()]  # inner semantics, keyed on the marker column
        cols = {}
        for name, typ in out_fields:
            cols[name] = pa.array(m[name], typ, from_pandas=True)
        return pa.table(cols)

    return (
        stream.map_batches(lambda t: t.cast(pa.schema(
            list(union_schema) + [pa.field("_c", pa.int64())])),
            batch_format="pyarrow")
        .groupby("_c")
        .map_groups(merge_partition, batch_format="pyarrow")
    )


def detect_hot_keys(ds, on: str, *, hot_fraction: float = 0.01,
                    n_rows: int | None = None) -> list[int]:
    """Estimate join keys hot enough to overflow a single partition: per
    batch, count the batch's top keys (a combiner — at most 32 candidate
    rows leave each batch), fold the partials on the driver, and return keys
    whose corpus-wide count exceeds ``hot_fraction`` of the total. One
    streaming pass, no shuffle, O(batches × 32) driver state."""
    def partial(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column(on), pa.int64())
        vc = keys.combine_chunks().value_counts()
        counts = vc.field("counts")
        order = pc.sort_indices(counts, sort_keys=[("", "descending")])[:32]
        return pa.table({
            "k": pc.take(vc.field("values"), order),
            "n": pc.take(counts, order),
            "tot": pa.array([len(keys)] + [0] * (min(32, len(order)) - 1)
                            if len(order) else [], pa.int64()),
        })

    folded: dict[int, int] = {}
    total = 0
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        folded[r["k"]] = folded.get(r["k"], 0) + r["n"]
        total += r["tot"]
    if total == 0:
        return []
    bar = max(1, int(total * hot_fraction))
    return sorted(k for k, n in folded.items() if n > bar)


def hash_join(
    left,
    right,
    *,
    on: str,
    how: str = "inner",
    suffix: str = "_r",
    num_partitions: int | None = None,
    n_rows: int | None = None,
    hot_keys: list[int] | None = None,
    salt_factor: int = 8,
):
    """Distributed equi-join of two big Datasets on an integer key column.

    Same scale shape as :func:`asof_join` (SURVEY §2.6 recipe (a)): tag both
    sides, union into one stream, ONE coarse keyed shuffle
    (``groupby(hash(on) % P)``) co-locates each key's rows, then one
    vectorized ``pandas.merge`` per partition. Use this when BOTH sides are
    large; for a small dim side prefer the broadcast-probe pattern
    (``ray.put`` an Arrow table + ``pc.index_in`` — see
    ``q_market_segment_totals``), which skips the shuffle entirely.

    ``how`` is ``"inner"``, ``"left"``, ``"outer"`` (FULL OUTER — unmatched
    rows of BOTH sides survive with null opposite payload; the ``on`` key is
    always populated), ``"semi"`` (left rows WITH ≥1 right match; right
    payload dropped) or ``"anti"`` (left rows with NO right match). For semi/anti the right side should be projected to just the key
    column upstream (and per-batch deduped — see ``tag``'s semi/anti path)
    so only distinct keys ride the shuffle. Right payload columns whose names
    clash with left ones get ``suffix``.

    Skew handling: by default one key's rows must fit in a partition. For a
    left-heavy hot key (the 75 %-hot-host shape), pass it in ``hot_keys``
    (e.g. from :func:`detect_hot_keys`): its LEFT rows are salted across
    ``salt_factor`` partitions and its RIGHT rows replicated to each — the
    join result is identical (tested), per-partition volume drops ~S×. A key
    hot on BOTH sides has a genuinely quadratic output; salting cannot fix
    that and such keys should be pre-aggregated instead.
    → Dataset(on, *left_payload, *right_payload[suffixed]) — left columns
    only for semi/anti.
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if how == "outer" and hot_keys:
        # replicated right rows of a hot key would each emit their own
        # right-only row in salt partitions with no left match — duplicates
        raise ValueError("hot_keys salting is incompatible with how='outer'")
    filter_only = how in ("semi", "anti")
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = [n for n in l_schema.names if n != on]
    r_names = [] if filter_only else [n for n in r_schema.names if n != on]
    l_types = {n: l_schema.types[l_schema.names.index(n)] for n in l_names}
    r_types = {n: r_schema.types[r_schema.names.index(n)] for n in r_names}
    r_out = {n: (n + suffix if (n in l_names or n == on) else n) for n in r_names}

    union_fields = (
        [("_side", pa.int8()), (on, pa.int64())]
        + [(n, l_types[n]) for n in l_names]
        + [(r_out[n], r_types[n]) for n in r_names]
    )
    union_schema = pa.schema(list(union_fields) + [("_c", pa.int64())])
    P = num_partitions or _coarse_partitions(n_rows)
    hot_arr = (np.asarray(sorted(hot_keys), dtype=np.int64)
               if hot_keys else None)
    S = max(1, int(salt_factor))

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            keys = pc.cast(t.column(on), pa.int64())
            if side == 1 and filter_only:
                # semi/anti only needs DISTINCT right keys — dedup per batch
                # before the shuffle so volume is bounded by key cardinality
                keys = pc.unique(keys.combine_chunks())
            n = len(keys)
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
                on: keys,
            }
            for name in l_names:
                cols[name] = (
                    pc.cast(t.column(name), l_types[name])
                    if side == 0 else pa.nulls(n, l_types[name])
                )
            for name in r_names:
                cols[r_out[name]] = (
                    pc.cast(t.column(name), r_types[name])
                    if side == 1 else pa.nulls(n, r_types[name])
                )
            out = pa.table(cols)
            key = out.column(on).to_numpy(zero_copy_only=False).astype(np.uint64)
            part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
            if hot_arr is not None and n:
                hot = np.isin(key.view(np.int64), hot_arr)
                if side == 0:
                    # spread a hot key's left rows over S partitions; any
                    # assignment is correct (the right side lands on all S)
                    salt = np.zeros(n, dtype=np.uint64)
                    salt[hot] = np.arange(int(hot.sum()), dtype=np.uint64) % np.uint64(S)
                    part = (part + salt) % np.uint64(P)
                elif hot.any():
                    # replicate the hot keys' right rows to every salt
                    idx = np.nonzero(hot)[0]
                    base = out.append_column(
                        "_c", pa.array(part.astype(np.int64)))
                    reps = [
                        out.take(pa.array(idx)).append_column(
                            "_c",
                            pa.array(((part[idx] + np.uint64(s))
                                      % np.uint64(P)).astype(np.int64)),
                        )
                        for s in range(1, S)
                    ]
                    return pa.concat_tables([base] + reps)
            return out.append_column("_c", pa.array(part.astype(np.int64)))

        return fn

    stream = left.map_batches(tag(0), batch_format="pyarrow", batch_size=65536).union(
        right.map_batches(tag(1), batch_format="pyarrow", batch_size=65536)
    )

    out_fields = (
        [(on, pa.int64())]
        + [(n, l_types[n]) for n in l_names]
        + [(r_out[n], r_types[n]) for n in r_names]
    )

    def merge_partition(g: pa.Table) -> pa.Table:
        # Arrow-level side split + ArrowDtype conversion: plain to_pandas()
        # coerces null-bearing int64 to float64, corrupting 63-bit hash ids
        # > 2^53 (ADVICE r2) — and CC/PageRank labels ride this join
        side = g.column("_side")
        lt = g.filter(pc.equal(side, 0)).select([on] + l_names)
        rt = g.filter(pc.equal(side, 1)).select([on] + [r_out[n] for n in r_names])
        if ((lt.num_rows == 0 and how != "outer")
                or (rt.num_rows == 0 and how in ("inner", "semi"))):
            return pa.table({name: pa.array([], typ) for name, typ in out_fields})
        if filter_only:
            # pure-Arrow membership probe: no pandas conversion at all
            mask = pc.is_in(lt.column(on), value_set=pc.unique(
                rt.column(on).combine_chunks()))
            if how == "anti":
                mask = pc.invert(mask)
            m_t = lt.filter(mask)
            return m_t.cast(pa.schema(out_fields))
        lf = lt.to_pandas(types_mapper=pd.ArrowDtype)
        rf = rt.to_pandas(types_mapper=pd.ArrowDtype)
        m = lf.merge(rf, on=on, how=how)
        cols = {}
        for name, typ in out_fields:
            cols[name] = pa.array(m[name], typ, from_pandas=True)
        return pa.table(cols)

    # NOTE: a fully-empty result Dataset reports schema() == None — Ray Data
    # short-circuits 0-row blocks (map fns are never invoked on them) and
    # drops their schema; callers needing the schema of an empty join result
    # should consult the inputs. Harmless downstream: aggregates/sorts/sinks
    # all accept the empty stream.
    return (
        stream.map_batches(lambda t: t.cast(union_schema), batch_format="pyarrow")
        .groupby("_c")
        .map_groups(merge_partition, batch_format="pyarrow")
    )


def broadcast_range_join(
    ds,
    col: str,
    *,
    breaks: list,
    labels: list[str],
    out_col: str = "tier",
    keep_unmatched: bool = False,
):
    """Range (band/interval) join against a SMALL side of half-open
    intervals ``[breaks[i], breaks[i+1]) → labels[i]`` — the "join fact rows
    to a tier/bucket table on lo <= v < hi" shape. The reference's nearest
    analog is the bucket status classifier (M22, exact-value cases); a real
    range join has no counterpart there.

    Scale shape: the interval side is tiny by construction, so this is the
    broadcast form — NO shuffle at all; each batch does one vectorized
    ``np.searchsorted`` against the breakpoint array captured in the task
    closure (shipped once per task, not per batch). Rows outside every
    interval are dropped unless ``keep_unmatched`` (then labelled null).
    → the input Dataset with ``out_col`` appended.
    """
    if len(labels) != len(breaks) - 1:
        raise ValueError("need len(labels) == len(breaks) - 1")
    lo, hi = breaks[0], breaks[-1]
    bks = np.asarray(breaks, dtype=np.float64)
    labs = pa.array(labels, pa.string())

    def tag_batch(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(col), pa.float64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        idx = np.searchsorted(bks, v, side="right") - 1
        ok = (v >= lo) & (v < hi)
        if not keep_unmatched:
            t = t.filter(pa.array(ok))
            idx = idx[ok]
            return t.append_column(out_col, labs.take(pa.array(idx)))
        take_idx = pa.array(
            np.where(ok, idx, -1), pa.int64(), mask=~ok, from_pandas=True
        )
        return t.append_column(out_col, labs.take(take_idx))

    return ds.map_batches(tag_batch, batch_format="pyarrow")


def content_hashes(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   hash_col: str = "h"):
    """(id, md5-hex) rows for snapshot comparison — md5 chosen because the
    SQL oracle (DuckDB ``md5(text)``) computes the identical digest."""
    import hashlib

    def fn(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(((x or "")).encode("utf-8")).hexdigest()
              for x in t.column(text_col).to_pylist()]
        return pa.table({
            id_col: t.column(id_col),
            hash_col: pa.array(hs, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def snapshot_diff(old, new, *, on: str = "doc_id", hash_col: str = "h",
                  num_partitions: int | None = None,
                  n_rows: int | None = None):
    """Recrawl / corpus-version delta: → Dataset(on, status) with status ∈
    {'added', 'removed', 'changed', 'same'} — the incremental-pipeline
    primitive that decides what a recrawl actually has to reprocess.

    Both inputs are (on, hash_col) rows (use :func:`content_hashes`; hashes,
    never text, ride the shuffles). Three keyed exchanges of compact rows,
    all through the same skew-aware machinery: inner join (same/changed by
    hash compare), new∖old anti (added), old∖new anti (removed), unioned.
    A FULL OUTER join would do it in one exchange; composing the existing
    verified inner/anti paths is preferred over a fifth merge code path —
    the exchanged rows are id+16-byte-hash either way.
    """

    def status_map(t: pa.Table) -> pa.Table:
        same = pc.equal(t.column(hash_col), t.column(hash_col + "_r"))
        st = pc.if_else(same, pa.scalar("same"), pa.scalar("changed"))
        return pa.table({on: t.column(on), "status": st})

    def const_status(val):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                on: t.column(on),
                "status": pa.array([val] * t.num_rows, pa.string()),
            })

        return fn

    # Each side is consumed by three joins below; a lazy input (typically a
    # content_hashes chain hashing the full corpus) would re-execute per
    # consumer. Materialize once — compact (id, hash) rows in the object
    # store, never driver memory.
    old = old.materialize()
    new = new.materialize()

    kw = {"num_partitions": num_partitions, "n_rows": n_rows}
    both = hash_join(new, old, on=on, how="inner", **kw).map_batches(
        status_map, batch_format="pyarrow")
    added = hash_join(new, old.select_columns([on]), on=on, how="anti",
                      **kw).map_batches(const_status("added"),
                                        batch_format="pyarrow")
    removed = hash_join(old, new.select_columns([on]), on=on, how="anti",
                        **kw).map_batches(const_status("removed"),
                                          batch_format="pyarrow")
    return both.union(added).union(removed)


def bloom_prefilter(left, right, *, on: str, n_right: int | None = None,
                    bits_per_key: int = 16, k: int = 11, seed: int = 7):
    """Bloom-filter join pushdown: drop left rows whose key CANNOT be in
    ``right`` before the join shuffle — the classic pre-exchange pruning
    when the left side is corpus-sized and only a sliver joins.

    The filter has NO false negatives (bits only ever set), so
    ``hash_join(bloom_prefilter(L, R, on=k), R, on=k)`` is IDENTICAL to the
    unfiltered join for inner/semi/left-payload semantics; ~ε false-positive
    rows (5e-4 at the 16 bits/key default) survive the filter and are
    dropped by the join itself.

    Scale shape: right keys fold into per-batch local Bloom words
    (vectorized ``add_batch``) → word-blob rows OR-merge on the driver
    (associative; |filter| bytes per batch) → ONE ``ray.put`` broadcast →
    pure vectorized ``contains_batch`` map over left. The filter is
    2 bytes/right-key at defaults: right sides up to ~10^9 keys broadcast
    fine (2 GB); beyond that use the keyed ``hash_join`` semi path, which
    never materializes a filter. Pass ``n_right`` (e.g. parquet metadata)
    to avoid a counting pass.
    """
    import ray

    from ..state.cuckoo import BloomSeenFilter

    if n_right is None:
        # count() would execute a lazy right chain once and the fold below
        # would re-execute it; right is the small side by contract, so
        # materializing it once is bounded (anti_join_ids/snapshot_diff class)
        right = right.materialize()
        n_right = right.count()
    cap = max(int(n_right), 1)

    def fold(t: pa.Table) -> pa.Table:
        f = BloomSeenFilter(capacity=cap, seed=seed,
                            bits_per_key=bits_per_key, k=k)
        keys = (
            pc.cast(t.column(on), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        f.add_batch(keys)
        return pa.table({"words": pa.array([f.words.tobytes()], pa.binary())})

    proto = BloomSeenFilter(capacity=cap, seed=seed,
                            bits_per_key=bits_per_key, k=k)
    merged = np.zeros_like(proto.words)
    for batch in right.select_columns([on]).map_batches(
        fold, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch.column("words").to_pylist():
            np.bitwise_or(merged, np.frombuffer(blob, dtype=np.uint64),
                          out=merged)
    words_ref = ray.put(merged.tobytes())

    def filt(t: pa.Table) -> pa.Table:
        f = BloomSeenFilter(capacity=cap, seed=seed,
                            bits_per_key=bits_per_key, k=k)
        f.words = np.frombuffer(ray.get(words_ref), dtype=np.uint64)
        keys = (
            pc.cast(t.column(on), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        return t.filter(pa.array(f.contains_batch(keys)))

    return left.map_batches(filt, batch_format="pyarrow")


def interval_self_join(ds, *, start_col: str, end_col: str,
                       id_cols: list[str], epoch_s: int = 3600,
                       suffixes: tuple = ("_a", "_b")):
    """All pairs of OVERLAPPING intervals (a.start ≤ b.end ∧ b.start ≤ a.end)
    — the range×range join (concurrent sessions, co-occurring incidents)
    that an equi-join cannot express.

    Scale shape: each interval is replicated to the epoch buckets
    [start//E .. end//E] it touches (replication factor = span/E — pick E
    near the median span), ONE epoch-keyed shuffle, then a vectorized
    in-bucket sweep: sorted by start, each row's overlap partners are the
    CONTIGUOUS run of later starts ≤ its end (searchsorted + repeat — no
    Python pair loop). Cross-epoch double counting is eliminated without a
    dedup shuffle by attributing each pair to exactly one epoch — the one
    containing max(start_a, start_b). Pairs are emitted in canonical
    orientation (lexicographically smaller id tuple first), so output is
    partition-invariant. A single epoch holding a large share of intervals
    is the skew case — the in-bucket sweep is O(n log n + output), so cost
    is output-bound, and output size is the join's intrinsic size.
    → Dataset(id_cols×2 suffixed, plus start/end pairs).
    """

    def replicate(t: pa.Table) -> pa.Table:
        s = t.column(start_col).to_numpy(zero_copy_only=False)
        e = t.column(end_col).to_numpy(zero_copy_only=False)
        e0 = s // epoch_s
        reps = (e // epoch_s - e0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t)), reps)
        ends_c = np.cumsum(reps)
        off = np.arange(int(ends_c[-1]) if len(ends_c) else 0) - np.repeat(
            ends_c - reps, reps)
        ep = e0[idx] + off
        return t.take(pa.array(idx)).append_column(
            "_epoch", pa.array(ep.astype(np.int64)))

    def sweep(g: pa.Table) -> pa.Table:
        a_names = [c + suffixes[0] for c in id_cols]
        b_names = [c + suffixes[1] for c in id_cols]
        schema_cols = a_names + b_names + [
            start_col + suffixes[0], end_col + suffixes[0],
            start_col + suffixes[1], end_col + suffixes[1],
        ]
        if g.num_rows < 2:
            return pa.table({c: pa.array([], pa.int64()) for c in schema_cols})
        ep = int(g.column("_epoch")[0].as_py())
        order_keys = [(start_col, "ascending")] + [
            (c, "ascending") for c in id_cols]
        g = g.sort_by(order_keys)
        s = g.column(start_col).to_numpy(zero_copy_only=False)
        e = g.column(end_col).to_numpy(zero_copy_only=False)
        n = len(s)
        hi = np.searchsorted(s, e, side="right")
        counts = np.maximum(hi - np.arange(n) - 1, 0)
        total = int(counts.sum())
        if total == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in schema_cols})
        i_idx = np.repeat(np.arange(n), counts)
        ends_c = np.cumsum(counts)
        j_idx = np.arange(total) - np.repeat(ends_c - counts, counts) + i_idx + 1
        # one-epoch attribution: keep pairs whose later start lives here
        keep = (s[j_idx] // epoch_s) == ep
        i_idx, j_idx = i_idx[keep], j_idx[keep]
        ids = [g.column(c).to_numpy(zero_copy_only=False) for c in id_cols]
        # canonical orientation: smaller id tuple first
        swap = np.zeros(len(i_idx), dtype=bool)
        decided = np.zeros(len(i_idx), dtype=bool)
        for col in ids:
            gt = (col[i_idx] > col[j_idx]) & ~decided
            lt = (col[i_idx] < col[j_idx]) & ~decided
            swap |= gt
            decided |= gt | lt
        a_idx = np.where(swap, j_idx, i_idx)
        b_idx = np.where(swap, i_idx, j_idx)
        out = {}
        for c, col in zip(id_cols, ids):
            out[c + suffixes[0]] = pa.array(col[a_idx].astype(np.int64))
            out[c + suffixes[1]] = pa.array(col[b_idx].astype(np.int64))
        out[start_col + suffixes[0]] = pa.array(s[a_idx].astype(np.int64))
        out[end_col + suffixes[0]] = pa.array(e[a_idx].astype(np.int64))
        out[start_col + suffixes[1]] = pa.array(s[b_idx].astype(np.int64))
        out[end_col + suffixes[1]] = pa.array(e[b_idx].astype(np.int64))
        return pa.table(out)

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("_epoch")
        .map_groups(sweep, batch_format="pyarrow")
    )


def point_in_interval_join(points, intervals, *, ts_col: str,
                           start_col: str, end_col: str,
                           by: str | None = None,
                           point_cols: list[str],
                           interval_cols: list[str],
                           epoch_s: int = 3600,
                           num_partitions: int | None = None,
                           n_rows: int | None = None):
    """Containment join: every (point, interval) pair with
    ``start ≤ ts ≤ end`` (and, when ``by`` is given, equal keys) — the
    two-table range join (event ∈ attribution window, reading ∈ outage,
    fetch ∈ maintenance window) that an equi-join cannot express and the
    interval SELF-join does not cover.

    Scale shape (the `interval_self_join` machinery, asymmetric): each
    interval replicates to the epoch buckets it touches (factor = span/E);
    each point routes to its SINGLE epoch — so a pair meets in exactly one
    bucket and no dedup shuffle is needed. ONE exchange keyed on
    ``hash(by?, epoch) % P`` COARSE partitions (a direct (by, epoch)
    groupby would dispatch one Python call per micro-group — the
    documented per-singleton-group trap; measured 6.8 s → ~1 s on the
    attribution query); inside a partition the (by, epoch) runs are found
    by ONE lexsort and each run probes as a vectorized grid mask (points
    × intervals of the run — with a ``by`` key and E near the interval
    span these are conversation-sized; without ``by``, a hot epoch is the
    documented skew case and cost is output-bound).
    → Dataset(point_cols + interval_cols + ts/start/end), int64 columns,
    partition-invariant.
    """
    all_cols = list(dict.fromkeys(
        point_cols + interval_cols + [ts_col, start_col, end_col]
        + ([by] if by else [])))
    if set(point_cols) & set(interval_cols):
        raise ValueError("point_cols and interval_cols must not overlap")

    def rep_intervals(t: pa.Table) -> pa.Table:
        s = t.column(start_col).to_numpy(zero_copy_only=False)
        e = t.column(end_col).to_numpy(zero_copy_only=False)
        e0 = s // epoch_s
        reps = (e // epoch_s - e0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t)), reps)
        ends_c = np.cumsum(reps)
        off = np.arange(int(ends_c[-1]) if len(ends_c) else 0) - np.repeat(
            ends_c - reps, reps)
        ep = e0[idx] + off
        out = {
            "_side": pa.array(np.ones(len(idx), np.int8)),
            "_epoch": pa.array(ep.astype(np.int64)),
            "_c": pa.array(_coarse_of(
                pc.cast(t.column(by), pa.int64()).to_numpy(
                    zero_copy_only=False)[idx] if by else None,
                ep.astype(np.int64))),
            ts_col: pa.nulls(len(idx), pa.int64()),
            start_col: pc.cast(t.column(start_col), pa.int64()).take(
                pa.array(idx)),
            end_col: pc.cast(t.column(end_col), pa.int64()).take(
                pa.array(idx)),
        }
        for c in point_cols:
            out[c] = pa.nulls(len(idx), pa.int64())
        for c in interval_cols:
            out[c] = pc.cast(t.column(c), pa.int64()).take(pa.array(idx))
        if by:
            out[by] = pc.cast(t.column(by), pa.int64()).take(pa.array(idx))
        return pa.table(out)

    def tag_points(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.int64())
        n = t.num_rows
        eps = ts.to_numpy(zero_copy_only=False) // epoch_s
        out = {
            "_side": pa.array(np.zeros(n, np.int8)),
            "_epoch": pa.array(eps),
            "_c": pa.array(_coarse_of(
                pc.cast(t.column(by), pa.int64()).to_numpy(
                    zero_copy_only=False) if by else None,
                eps)),
            ts_col: ts,
            start_col: pa.nulls(n, pa.int64()),
            end_col: pa.nulls(n, pa.int64()),
        }
        for c in point_cols:
            out[c] = pc.cast(t.column(c), pa.int64())
        for c in interval_cols:
            out[c] = pa.nulls(n, pa.int64())
        if by:
            out[by] = pc.cast(t.column(by), pa.int64())
        return pa.table(out)

    P = num_partitions or _coarse_partitions(n_rows, rows_per_partition=8192)

    def _coarse_of(byv, ep):
        h = ep.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        if byv is not None:
            h = h ^ (byv.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        return ((h >> np.uint64(17)) % np.uint64(P)).astype(np.int64)

    stream = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(rep_intervals, batch_format="pyarrow"))
    out_names = (point_cols + interval_cols
                 + ([by] if by else []) + [ts_col, start_col, end_col])

    def probe(g: pa.Table) -> pa.Table:
        # split sides at the ARROW level before any numpy conversion: the
        # cross-side null padding would otherwise route int64 through
        # float64 and corrupt values > 2^53 (the merge_partition hazard)
        side = g.column("_side")
        pt = g.filter(pc.equal(side, pa.scalar(0, pa.int8())))
        it = g.filter(pc.equal(side, pa.scalar(1, pa.int8())))
        empty = pa.table({c: pa.array([], pa.int64()) for c in out_names})
        if pt.num_rows == 0 or it.num_rows == 0:
            return empty
        ts_all = pt.column(ts_col).to_numpy(zero_copy_only=False)
        s_all = it.column(start_col).to_numpy(zero_copy_only=False)
        e_all = it.column(end_col).to_numpy(zero_copy_only=False)
        p_ep = pt.column("_epoch").to_numpy(zero_copy_only=False)
        i_ep = it.column("_epoch").to_numpy(zero_copy_only=False)
        if by:
            p_by = pt.column(by).to_numpy(zero_copy_only=False)
            i_by = it.column(by).to_numpy(zero_copy_only=False)
            p_ord = np.lexsort((p_ep, p_by))
            i_ord = np.lexsort((i_ep, i_by))
        else:
            p_by = i_by = None
            p_ord = np.argsort(p_ep, kind="stable")
            i_ord = np.argsort(i_ep, kind="stable")

        def _runs(b, e, order):
            eo = e[order]
            if b is not None:
                bo = b[order]
                brk = np.r_[True, (bo[1:] != bo[:-1]) | (eo[1:] != eo[:-1])]
            else:
                bo = None
                brk = np.r_[True, eo[1:] != eo[:-1]]
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], len(eo))
            return starts, ends, bo, eo

        ps, p_ends, pbo, peo = _runs(p_by, p_ep, p_ord)
        is_, i_ends, ibo, ieo = _runs(i_by, i_ep, i_ord)
        # two-pointer over the sorted (by, epoch) runs of both sides; each
        # matched run pair probes as one vectorized grid (no per-group
        # Ray dispatch — runs live inside this coarse partition)
        pi_parts, ii_parts = [], []
        i = j = 0
        while i < len(ps) and j < len(is_):
            kp = ((pbo[ps[i]], peo[ps[i]]) if by else (peo[ps[i]],))
            ki = ((ibo[is_[j]], ieo[is_[j]]) if by else (ieo[is_[j]],))
            if kp < ki:
                i += 1
            elif kp > ki:
                j += 1
            else:
                pidx = p_ord[ps[i]:p_ends[i]]
                iidx = i_ord[is_[j]:i_ends[j]]
                tsr = ts_all[pidx]
                sr = s_all[iidx]
                er = e_all[iidx]
                mask = (sr[None, :] <= tsr[:, None]) & \
                    (tsr[:, None] <= er[None, :])
                a, b2 = np.nonzero(mask)
                if len(a):
                    pi_parts.append(pidx[a])
                    ii_parts.append(iidx[b2])
                i += 1
                j += 1
        if not pi_parts:
            return empty
        pi = np.concatenate(pi_parts)
        ii = np.concatenate(ii_parts)
        out = {}
        for c in point_cols + ([by] if by else []) + [ts_col]:
            col = pt.column(c).to_numpy(zero_copy_only=False)
            out[c] = pa.array(col[pi].astype(np.int64))
        for c in interval_cols + [start_col, end_col]:
            col = it.column(c).to_numpy(zero_copy_only=False)
            out[c] = pa.array(col[ii].astype(np.int64))
        return pa.table({c: out[c] for c in out_names})

    return stream.groupby("_c").map_groups(probe, batch_format="pyarrow")
