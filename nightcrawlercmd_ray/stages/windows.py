"""Per-key ordered window functions (LAG-family) — the row-wise windowed
aggregate shape the reference lacks (its nearest analog is the crawl's
per-host FIFO ordering, ``mainCrawler.go:110-115``) but event/behavior
pipelines need constantly: for each row, a value computed from the PREVIOUS
row of the same key in event-time order.

Scale shape (same as stages/sessions.py): ONE coarse keyed shuffle
(``groupby(key_hash % P)``) co-locates each key's rows; in-partition work is
one vectorized sort + shifted-array compare with group-boundary masking —
no per-key Python dispatch. Partitioning assumption: one key's rows fit in
a partition (hash-spread; salt pathological keys upstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DELTA_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("gap_us", pa.int64()),  # null on each user's first event
        ("seq", pa.int64()),  # 1-based rank within the user's stream
    ]
)


def lag_deltas(
    events,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """For each event: the microsecond gap to the same user's previous event
    in ``(ts, event_id)`` order (null for the first), plus the 1-based rank.
    Equivalent SQL: ``LAG(epoch_us(ts)) OVER (PARTITION BY user ORDER BY
    ts, event_id)`` / ``ROW_NUMBER()`` — deterministic at any parallelism.
    → Dataset(DELTA_SCHEMA).
    """
    if num_partitions is None:
        if n_rows is None:
            n_rows = 1 << 16
        num_partitions = int(min(1 << 16, max(1, n_rows // 65536 + 1)))
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        user = pc.cast(t.column(user_col), pa.int64())
        ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64())
        key = user.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
        return pa.table({
            "user_id": user,
            "ts_us": ts_us,
            "event_id": pc.cast(t.column(id_col), pa.int64()),
            "_c": pa.array(part.astype(np.int64)),
        })

    def deltas_partition(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_c"]).combine_chunks()
        order = pc.sort_indices(
            t,
            sort_keys=[("user_id", "ascending"), ("ts_us", "ascending"),
                       ("event_id", "ascending")],
        )
        t = t.take(order)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        n = len(u)
        gap = np.zeros(n, dtype=np.int64)
        first = np.ones(n, dtype=bool)
        if n > 1:
            same = u[1:] == u[:-1]
            first[1:] = ~same
            gap[1:] = np.where(same, ts[1:] - ts[:-1], 0)
        # 1-based per-user rank: global position minus the user's start
        starts = np.flatnonzero(first)
        seq = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        ) + 1
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts_us": t.column("ts_us"),
            "gap_us": pa.array(
                np.ma.masked_array(gap, mask=first), pa.int64(), from_pandas=True
            ),
            "seq": pa.array(seq, pa.int64()),
        })

    return (
        events.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(deltas_partition, batch_format="pyarrow")
    )


def rolling_sum(
    events,
    *,
    window: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """Per-key moving-window sum: for each event, the sum of ``value`` (in
    integer cents, float-policy per SURVEY §3.4) over the last ``window``
    rows of the same key in ``(ts, id)`` order — SQL ``SUM(...) OVER
    (PARTITION BY user ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW)``.

    Scale shape identical to :func:`lag_deltas`: ONE coarse keyed shuffle,
    then an in-partition vectorized sort + prefix-sum — the window is
    computed as ``cumsum[i+1] - cumsum[max(i-window+1, group_start)]``
    with group boundaries masked, no per-key Python dispatch.
    → Dataset(event_id, user_id, roll_cents).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if num_partitions is None:
        if n_rows is None:
            n_rows = 1 << 16
        num_partitions = int(min(1 << 16, max(1, n_rows // 65536 + 1)))
    P = num_partitions
    W = window

    def prep(t: pa.Table) -> pa.Table:
        user = pc.cast(t.column(user_col), pa.int64())
        ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(t.column(value_col), pa.float64()), 100.0)),
            pa.int64(),
        )
        key = user.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
        return pa.table({
            "user_id": user,
            "ts_us": ts_us,
            "event_id": pc.cast(t.column(id_col), pa.int64()),
            "cents": cents,
            "_c": pa.array(part.astype(np.int64)),
        })

    def roll_partition(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_c"]).combine_chunks()
        order = pc.sort_indices(
            t,
            sort_keys=[("user_id", "ascending"), ("ts_us", "ascending"),
                       ("event_id", "ascending")],
        )
        t = t.take(order)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        v = t.column("cents").to_numpy(zero_copy_only=False)
        n = len(u)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        gstart = np.repeat(starts, np.diff(np.append(starts, n)))
        idx = np.arange(n, dtype=np.int64)
        wstart = np.maximum(idx - (W - 1), gstart)
        cs = np.concatenate([[0], np.cumsum(v, dtype=np.int64)])
        roll = cs[idx + 1] - cs[wstart]
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "roll_cents": pa.array(roll, pa.int64()),
        })

    return (
        events.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(roll_partition, batch_format="pyarrow")
    )


def cumulative_distinct(ds, *, key_col: str, ts_col: str,
                        bucket_s: int = 86400):
    """Running distinct-key count over time — (bucket_start_s, n_new, n_cum)
    per time bucket: how many keys (users, hosts, documents) have EVER been
    seen by the end of each bucket. The growth-curve statistic a crawl or
    event pipeline reports.

    Exact and shuffle-light: distinct count is first-seen arithmetic —
    per-batch (key, min bucket) combiner → ONE groupby(key).min shuffle
    (rows ∝ distinct keys) → tiny groupby(bucket).count → driver cumsum
    over the bucket axis (rows ∝ time buckets — bounded by timespan, never
    data size). SQL oracle: min-over-user + cumulative window sum.
    → sorted by bucket_start_s.
    """
    def first_seen(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        arr = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(arr.dtype, np.datetime64):
            secs = arr.astype("datetime64[s]").astype(np.int64)
        else:
            secs = arr.astype(np.int64)
        b = (secs // bucket_s) * bucket_s
        g = pa.table({"k": t.column(key_col), "b": pa.array(b, pa.int64())})
        return (g.group_by(["k"]).aggregate([("b", "min")])
                 .rename_columns(["k", "b"]))

    per_key = (
        ds.map_batches(first_seen, batch_format="pyarrow")
        .groupby("k")
        .min("b")
        .map_batches(lambda t: t.rename_columns(["k", "b"]),
                     batch_format="pyarrow")
    )
    counts = (
        per_key.groupby("b").count().take_all()
    )  # rows ∝ number of time buckets
    counts.sort(key=lambda r: r["b"])
    out_b, out_new, out_cum = [], [], []
    cum = 0
    for r in counts:
        cum += int(r["count()"])
        out_b.append(int(r["b"]))
        out_new.append(int(r["count()"]))
        out_cum.append(cum)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "bucket_start_s": pa.array(out_b, pa.int64()),
        "n_new": pa.array(out_new, pa.int64()),
        "n_cum": pa.array(out_cum, pa.int64()),
    }))



# --------------------------------------------------------------------------- #
# two-pass distributed prefix scans over arrival order
# --------------------------------------------------------------------------- #

def _part_of(ids: np.ndarray, span: int) -> np.ndarray:
    """Floored part key — numpy ``//`` in BOTH passes (Arrow's divide
    truncates toward zero, which would split negative ids across passes)."""
    return ids // span


def _part_prefix(ds, *, id_col: str, value_fn, monoid: str, identity: int,
                 span: int) -> dict[int, int]:
    """Pass A of a distributed prefix scan: reduce each ``id // span`` part
    to one value with the given monoid ('max' or 'sum'), shuffle the
    ≤⌈N/span⌉ partials, and fold the driver-side EXCLUSIVE prefix — the
    shared scaffolding of late_events / token_offsets (and the shape of
    sampling.token_budget_sample). ``value_fn(table) -> int64 ndarray``."""
    import ray
    from ray.data.aggregate import Max, Sum

    scatter = np.maximum.at if monoid == "max" else np.add.at
    agg = (Max if monoid == "max" else Sum)("_v", alias_name="_v")

    def partials(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        vals = value_fn(t)
        part = _part_of(ids, span)
        uniq, inv = np.unique(part, return_inverse=True)
        acc = np.full(len(uniq), identity, dtype=np.int64)
        scatter(acc, inv, vals)
        return pa.table({"_part": pa.array(uniq), "_v": pa.array(acc)})

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("_part").aggregate(agg).take_all()
    )
    rows.sort(key=lambda r: r["_part"])
    prefix: dict[int, int] = {}
    run = identity
    for r in rows:
        prefix[r["_part"]] = run
        run = max(run, r["_v"]) if monoid == "max" else run + r["_v"]
    return prefix


def late_events(ds, *, id_col: str = "event_id", ts_col: str = "ts",
                allowed_lateness_us: int = 60_000_000,
                part_span: int = 4096):
    """Streaming watermark / late-data detection: the watermark before a row
    is the maximum event-time seen over all EARLIER-ARRIVING rows
    (arrival order = ``id_col``), and a row is late iff
    ``ts + allowed_lateness < watermark`` — the flag a streaming window
    operator uses to route updates to side output (Beam/Flink semantics).
    The watermark is floored at 0 ("nothing seen yet"), so the intended
    domain is non-negative (post-epoch) event times; the SQL oracle
    mirrors the floor with GREATEST(COALESCE(...), 0).

    Scale shape — the distributed prefix scan (``_part_prefix``, max
    monoid): bounded pass-A partials → driver exclusive prefix-max →
    pass B is ONE bounded keyed shuffle where each ≤span-row group
    computes its local shifted cummax vectorized and merges the carried
    prefix. Integer microseconds end-to-end → hash-exact vs the oracle.
    → Dataset(id_col, ts_us, watermark_us, late).
    """
    import ray

    span = int(part_span)
    late_us = int(allowed_lateness_us)

    def ts_vals(t: pa.Table) -> np.ndarray:
        return pc.cast(t.column(ts_col), pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)

    pre_ref = ray.put(_part_prefix(
        ds, id_col=id_col, value_fn=ts_vals, monoid="max", identity=0,
        span=span,
    ))

    def add_part(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids),
            "ts_us": pa.array(ts_vals(t)),
            "_part": pa.array(_part_of(ids, span)),
        })

    def flag(g: pa.Table) -> pa.Table:
        pre = ray.get(pre_ref)
        part = int(g.column("_part")[0].as_py())
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, ts = ids[order], ts[order]
        local = np.maximum.accumulate(np.concatenate([[0], ts[:-1]]))
        wm = np.maximum(local, np.int64(pre.get(part, 0)))
        return pa.table({
            id_col: pa.array(ids),
            "ts_us": pa.array(ts),
            "watermark_us": pa.array(wm.astype(np.int64)),
            "late": pa.array(ts + late_us < wm),
        })

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(flag, batch_format="pyarrow")
    )


def token_offsets(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  part_span: int = 4096):
    """Global token-offset index: for each document, the exclusive prefix
    sum of whitespace-token counts over all LOWER-id docs — the
    (doc → byte/token offset) map a packed training corpus needs for
    O(1) random access into concatenated token streams. Tokens =
    ``len(text.split(' '))``, matching the packing family and the SQL
    oracle's ``len(string_split(text, ' '))``.

    Scale shape: the distributed prefix scan (``_part_prefix``, sum
    monoid) with a vectorized in-part cumsum in pass B.
    → Dataset(id_col, n_tokens, token_start).
    """
    import ray

    span = int(part_span)

    def ntok_vals(t: pa.Table) -> np.ndarray:
        texts = t.column(text_col).to_pylist()
        return np.fromiter((len((x or "").split(" ")) for x in texts),
                           dtype=np.int64, count=len(texts))

    pre_ref = ray.put(_part_prefix(
        ds, id_col=id_col, value_fn=ntok_vals, monoid="sum", identity=0,
        span=span,
    ))

    def add_part(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids),
            "_n": pa.array(ntok_vals(t)),
            "_part": pa.array(_part_of(ids, span)),
        })

    def offsets(g: pa.Table) -> pa.Table:
        pre = ray.get(pre_ref)
        part = int(g.column("_part")[0].as_py())
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        n = g.column("_n").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        start = pre.get(part, 0) + np.concatenate([[0], np.cumsum(n[:-1])])
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n),
            "token_start": pa.array(start.astype(np.int64)),
        })

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(offsets, batch_format="pyarrow")
    )


def window_ranks(ds, *, key_col: str, val_col: str, id_col: str,
                 n_tiles: int = 4, num_partitions: int | None = None,
                 n_rows: int | None = None):
    """The SQL ranking-window family per key, in one pass:
    ``row_number() OVER (PARTITION BY key ORDER BY val, id)``,
    ``rank()`` / ``dense_rank()`` ``OVER (... ORDER BY val)`` (ties on
    ``val`` share a rank; ``id`` is only the deterministic output order),
    and ``ntile(n_tiles) OVER (... ORDER BY val, id)`` with SQL's
    remainder rule (the first ``n % k`` tiles get the extra row).

    Scale shape: the lag_deltas shape — ONE coarse keyed shuffle
    co-locates each key's rows; in-partition work is one vectorized sort +
    run-boundary arithmetic (np.repeat of group/run starts), no per-key
    dispatch. Integer key/val contract (the repo's exact-value policy).
    → Dataset(key, id, val, row_num, rnk, dense_rnk, tile).
    """
    if num_partitions is None:
        if n_rows is None:
            n_rows = 1 << 16
        num_partitions = int(min(1 << 16, max(1, n_rows // 65536 + 1)))
    P = num_partitions
    k = int(n_tiles)
    if k < 1:
        raise ValueError("n_tiles must be >= 1")

    def prep(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column(key_col), pa.int64())
        karr = key.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((karr * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
        return pa.table({
            key_col: key,
            id_col: pc.cast(t.column(id_col), pa.int64()),
            val_col: pc.cast(t.column(val_col), pa.int64()),
            "_c": pa.array(part.astype(np.int64)),
        })

    def ranks_partition(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_c"]).combine_chunks()
        order = pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), (val_col, "ascending"),
            (id_col, "ascending")])
        t = t.take(order)
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        val = t.column(val_col).to_numpy(zero_copy_only=False)
        n = len(key)
        if n == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                val_col: pa.array([], pa.int64()),
                "row_num": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "dense_rnk": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
            })
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = key[1:] != key[:-1]
        new_run = new_key.copy()
        new_run[1:] |= val[1:] != val[:-1]
        idx = np.arange(n, dtype=np.int64)
        g_starts = np.flatnonzero(new_key)
        g_sizes = np.diff(np.append(g_starts, n))
        g_start_of = np.repeat(g_starts, g_sizes)
        pos = idx - g_start_of                      # 0-based within key
        row_num = pos + 1
        r_starts = np.flatnonzero(new_run)
        r_start_of = np.repeat(r_starts, np.diff(np.append(r_starts, n)))
        rnk = r_start_of - g_start_of + 1           # ties share first pos
        run_id = np.cumsum(new_run)                 # 1-based global run id
        dense = run_id - run_id[g_start_of] + 1
        size_of = np.repeat(g_sizes, g_sizes)
        q, r = size_of // k, size_of % k
        big = r * (q + 1)                           # rows in the fat tiles
        in_big = pos < big
        tile = np.where(
            in_big,
            pos // np.maximum(q + 1, 1),
            r + np.where(q > 0, (pos - big) // np.maximum(q, 1), 0),
        ) + 1
        return pa.table({
            key_col: t.column(key_col),
            id_col: t.column(id_col),
            val_col: t.column(val_col),
            "row_num": pa.array(row_num, pa.int64()),
            "rnk": pa.array(rnk.astype(np.int64), pa.int64()),
            "dense_rnk": pa.array(dense.astype(np.int64), pa.int64()),
            "tile": pa.array(tile.astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(ranks_partition, batch_format="pyarrow")
    )
