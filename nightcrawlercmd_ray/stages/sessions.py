"""Gap-based sessionization — the windowed-aggregate shape the reference
lacks entirely (its closest analog is the crawl's per-host politeness ticks)
but every large-scale event/behavior pipeline needs: split each user's event
stream into sessions wherever the inter-event gap exceeds a threshold, then
aggregate per session.

Scale shape: one coarse keyed shuffle (``groupby(user_hash % P)``) co-locates
each user's events; in-partition work is fully vectorized pandas (sort +
shift/cumsum + groupby-agg) — no per-user Python dispatch. Only the columns
the aggregate needs ride the shuffle. Partitioning assumption: one user's
events fit in a partition (hash-spread; salt pathological users upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("n_events", pa.int64()),
        ("start_s", pa.int64()),
        ("end_s", pa.int64()),
        ("sum_value_cents", pa.int64()),
    ]
)


def sessionize(
    events,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    gap_s: int = 1800,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """→ Dataset(user_id, session_id, n_events, start_s, end_s,
    sum_value_cents). ``session_id`` is the user's 1-based session ordinal in
    ``(ts, event_id)`` order; a session breaks when the gap to the previous
    event exceeds ``gap_s`` seconds. ``sum_value_cents`` sums per-event
    ``round(value*100)`` as int64 (the engine's documented cents policy).
    """
    if num_partitions is None:
        if n_rows is None:
            n_rows = 1 << 16
        num_partitions = int(min(1 << 16, max(1, n_rows // 65536 + 1)))
    P = num_partitions
    gap_us = int(gap_s) * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        user = pc.cast(t.column(user_col), pa.int64())
        ts_us = pc.cast(t.column(ts_col), pa.timestamp("us"))
        ts_us = pc.cast(ts_us, pa.int64())
        val = t.column(value_col)
        cents = pc.cast(pc.round(pc.multiply(pc.cast(val, pa.float64()),
                                             pa.scalar(100.0))), pa.int64())
        key = user.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
        return pa.table({
            "user_id": user,
            "_ts_us": ts_us,
            "_cents": cents,
            "_eid": pc.cast(t.column(id_col), pa.int64()),
            "_c": pa.array(part.astype(np.int64)),
        })

    def sessions_partition(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["_c"]).to_pandas()
        df = df.sort_values(["user_id", "_ts_us", "_eid"], kind="stable")
        u = df["user_id"].to_numpy()
        ts = df["_ts_us"].to_numpy()
        brk = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            same_user = u[1:] == u[:-1]
            brk[1:] = np.where(same_user & (ts[1:] - ts[:-1] <= gap_us), 0, 1)
        # 1-based per-user session ordinal: global cumsum re-based per user
        g_sess = np.cumsum(brk)
        df["_sess"] = g_sess
        first_sess = df.groupby("user_id")["_sess"].transform("min")
        df["session_id"] = df["_sess"] - first_sess + 1
        agg = df.groupby(["user_id", "session_id"], sort=True).agg(
            n_events=("_eid", "size"),
            start_us=("_ts_us", "min"),
            end_us=("_ts_us", "max"),
            sum_value_cents=("_cents", "sum"),
        ).reset_index()
        return pa.table({
            "user_id": pa.array(agg["user_id"].astype("int64"), pa.int64()),
            "session_id": pa.array(agg["session_id"].astype("int64"), pa.int64()),
            "n_events": pa.array(agg["n_events"].astype("int64"), pa.int64()),
            "start_s": pa.array(agg["start_us"] // 1_000_000, pa.int64()),
            "end_s": pa.array(agg["end_us"] // 1_000_000, pa.int64()),
            "sum_value_cents": pa.array(
                agg["sum_value_cents"].astype("int64"), pa.int64()),
        })

    return (
        events.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(sessions_partition, batch_format="pyarrow")
    )


def user_journeys(
    events,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    seq_col: str = "event_type",
    sep: str = ">",
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """Ordered per-key sequence assembly: each user's event types joined in
    ``(ts, id)`` order into one string — the "user journey" / behavior
    sequence a sequence-model training pipeline materializes. SQL:
    ``string_agg(type, sep ORDER BY ts, id) GROUP BY user``.

    Scale shape: same single coarse keyed shuffle as :func:`sessionize`;
    in-partition work is one vectorized sort then a pandas groupby-join
    (string concatenation is inherently per-key, but keys never cross
    partitions so there is no second shuffle). Partitioning assumption:
    one user's events fit in a partition.
    """
    if num_partitions is None:
        if n_rows is None:
            n_rows = 1 << 16
        num_partitions = int(min(1 << 16, max(1, n_rows // 65536 + 1)))
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        user = pc.cast(t.column(user_col), pa.int64())
        key = user.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
        return pa.table({
            "user_id": user,
            "ts_us": pc.cast(
                pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
            ),
            "event_id": pc.cast(t.column(id_col), pa.int64()),
            "step": pc.cast(t.column(seq_col), pa.string()),
            "_c": pa.array(part.astype(np.int64)),
        })

    def join_partition(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["_c"]).to_pandas()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        j = df.groupby("user_id", sort=True)["step"].agg(sep.join).reset_index()
        return pa.table({
            "user_id": pa.array(j["user_id"], pa.int64()),
            "journey": pa.array(j["step"], pa.string()),
        })

    return (
        events.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(join_partition, batch_format="pyarrow")
    )


def funnel_counts(
    events,
    *,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """First-touch strict-order funnel: how many users performed
    ``stages[0]``, then ``stages[1]`` STRICTLY after their first
    ``stages[0]``, then ``stages[2]`` strictly after that, … →
    Dataset(stage, event_type, n_users), ``stage`` 1-based, counts
    monotone non-increasing. (The classic conversion-funnel aggregate;
    same-timestamp events do NOT satisfy "after" — strict ``>`` on both
    the engine and SQL sides.)

    Scale shape: the single coarse ``user_hash % P`` shuffle of
    :func:`sessionize` co-locates each user's (ts, type) rows — only rows
    whose type participates in the funnel ride the exchange; per partition
    the stage fold is vectorized pandas (filter → merge-on-user → min);
    partitions hold disjoint users so per-partition stage counts SUM
    exactly — the driver-visible result is ``len(stages)`` rows from one
    tiny groupby-sum.
    """
    if num_partitions is None:
        if n_rows is None:
            n_rows = 1 << 16
        num_partitions = int(min(1 << 16, max(1, n_rows // 65536 + 1)))
    P = num_partitions
    wanted = list(stages)
    if not wanted:
        raise ValueError("funnel_counts needs at least one stage")

    def prep(t: pa.Table) -> pa.Table:
        typ = t.column(type_col)
        keep = pc.is_in(typ, value_set=pa.array(wanted, pa.string()))
        t = t.filter(pc.fill_null(keep, False))
        user = pc.cast(t.column(user_col), pa.int64())
        ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                        pa.int64())
        key = user.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
        return pa.table({
            "user_id": user,
            "_ts_us": ts_us,
            "_type": t.column(type_col),
            "_c": pa.array(part.astype(np.int64)),
        })

    def fold_partition(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["_c"]).to_pandas()
        counts: list[int] = []
        prev: pd.Series | None = None  # first-reach ts per surviving user
        for s in wanted:
            sub = df[df["_type"] == s]
            if prev is not None:
                sub = sub.merge(prev.rename("_prev"), left_on="user_id",
                                right_index=True)
                sub = sub[sub["_ts_us"] > sub["_prev"]]
            cur = sub.groupby("user_id")["_ts_us"].min()
            counts.append(int(cur.size))
            prev = cur
        return pa.table({
            "stage": pa.array(range(1, len(wanted) + 1), pa.int64()),
            "event_type": pa.array(wanted, pa.string()),
            "_n": pa.array(counts, pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        events.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(fold_partition, batch_format="pyarrow")
        .groupby(["stage", "event_type"])
        .aggregate(Sum("_n", alias_name="n_users"))
    )


def interval_union_per_key(
    ds,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
):
    """Total covered length per key after merging overlapping/touching
    intervals (the classic interval-union / coverage aggregate: per-user
    active time, per-host crawl-window coverage). An interval starts a new
    island iff its start exceeds the max end of ALL previous intervals of
    the same key in (start, end) order — exactly the SQL gaps-and-islands
    window formulation, so results are value-oracle-able.

    Scale shape: ONE coarse keyed exchange; in partition, sort + a fully
    vectorized segmented prefix-max. The prefix-max-with-group-resets runs
    on DENSE RANKS of the endpoint union with a per-group rank offset
    (group_idx · (R+1) ≤ n·(2n+1) ≪ 2^63 — the same trick on raw int64
    endpoint VALUES could overflow), then island lengths come from the raw
    values via ``reduceat``. Output rows ∝ keys.

    → Dataset ``(key_col, covered)`` in the units of start/end (int64).
    """
    from nightcrawlercmd_ray.stages.groupstats import (
        _coarse_part,
        default_partitions,
    )

    P = num_partitions or default_partitions(n_rows)

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "_k": pc.cast(t.column(key_col), pa.int64()),
                "_s": pc.cast(t.column(start_col), pa.int64()),
                "_e": pc.cast(t.column(end_col), pa.int64()),
            }
        )
        # drop rows with ANY null at the Arrow level BEFORE to_numpy: a
        # null-bearing int64 column otherwise converts via float64 (NaN +
        # >2^53 precision loss — the joins.py ADVICE-r2 hazard)
        out = out.drop_null()
        s = out.column("_s").combine_chunks().to_numpy(zero_copy_only=False)
        e = out.column("_e").combine_chunks().to_numpy(zero_copy_only=False)
        if len(s) and (e < s).any():
            raise ValueError(
                f"interval_union_per_key: {end_col!r} < {start_col!r}"
            )
        k = out.column("_k").combine_chunks().to_numpy(zero_copy_only=False)
        return out.append_column(
            "_c", pa.array(_coarse_part(k, P).astype(np.int64))
        )

    def union_partition(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_c"]).combine_chunks()
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "covered": pa.array([], pa.int64()),
            }
        )
        n = t.num_rows
        if n == 0:
            return empty
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("_k", "ascending"), ("_s", "ascending"),
                           ("_e", "ascending")],
            )
        )
        k = t.column("_k").to_numpy(zero_copy_only=False)
        s = t.column("_s").to_numpy(zero_copy_only=False)
        e = t.column("_e").to_numpy(zero_copy_only=False)
        newk = np.ones(n, dtype=bool)
        newk[1:] = k[1:] != k[:-1]
        kstarts = np.flatnonzero(newk)
        kcounts = np.diff(np.append(kstarts, n))
        group_idx = np.repeat(np.arange(len(kstarts)), kcounts)
        # dense ranks over the endpoint union (ties share a rank, so value
        # comparisons and rank comparisons agree exactly)
        space = np.unique(np.concatenate([s, e]))
        rs = np.searchsorted(space, s)
        re_ = np.searchsorted(space, e)
        R = np.int64(len(space) + 1)
        m = np.maximum.accumulate(re_ + group_idx * R)
        pe_rank = np.full(n, -1, dtype=np.int64)
        within = np.arange(n) - np.repeat(kstarts, kcounts)
        inner = within > 0
        pe_rank[inner] = m[np.flatnonzero(inner) - 1] - group_idx[inner] * R
        new_island = (~inner) | (rs > pe_rank)
        istarts = np.flatnonzero(new_island)
        imax_e = np.maximum.reduceat(e, istarts)
        ilen = imax_e - s[istarts]
        # islands are contiguous per key — fold island lengths per key
        ikey = k[istarts]
        knew = np.ones(len(istarts), dtype=bool)
        knew[1:] = ikey[1:] != ikey[:-1]
        kk = np.flatnonzero(knew)
        covered = np.add.reduceat(ilen, kk)
        return pa.table(
            {
                key_col: pa.array(ikey[kk]),
                "covered": pa.array(covered.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(union_partition, batch_format="pyarrow")
    )


def retention_cohorts(events, *, user_col: str = "user_id", ts_col: str = "ts",
                      bucket_us: int = 7 * 86_400_000_000,
                      num_partitions: int | None = None,
                      n_rows: int | None = None):
    """Cohort retention: users grouped by the time bucket of their FIRST
    event (their cohort); for each (cohort, age) — age in buckets since
    the cohort — the number of distinct users active in that bucket. The
    product-analytics retention triangle, and the reason a crawl/event
    store keeps per-user first-seen state.

    Scale shape: a user contributes at most one row per active bucket, so
    the exchange is per-batch-deduped (user, bucket) pairs — bounded by
    users × active buckets, not events. ONE coarse user-keyed shuffle
    co-locates each user's pairs; the cohort (min bucket) and ages are
    vectorized run arithmetic; per-partition (cohort, age) partial counts
    (exact — a user lives in one partition) fold through one tiny final
    groupby-sum. → Dataset(cohort, age, n_users).
    """
    if num_partitions is None:
        if n_rows is None:
            n_rows = 1 << 16
        num_partitions = int(min(1 << 16, max(1, n_rows // 65536 + 1)))
    P = num_partitions
    B = int(bucket_us)
    if B <= 0:
        raise ValueError("bucket_us must be positive")

    def prep(t: pa.Table) -> pa.Table:
        user = pc.cast(t.column(user_col), pa.int64())
        ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                        pa.int64())
        u = user.combine_chunks().to_numpy(zero_copy_only=False)
        b = ts_us.combine_chunks().to_numpy(zero_copy_only=False) // B
        # per-batch distinct (user, bucket) — the combiner that bounds the
        # shuffle at users × active buckets
        pairs = np.unique(np.stack([u, b], axis=1), axis=0)
        key = pairs[:, 0].astype(np.uint64)
        part = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(P)
        return pa.table({
            "u": pa.array(pairs[:, 0], pa.int64()),
            "b": pa.array(pairs[:, 1], pa.int64()),
            "_c": pa.array(part.astype(np.int64)),
        })

    def fold(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_c"]).combine_chunks()
        order = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                              ("b", "ascending")])
        t = t.take(order)
        u = t.column("u").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table({"cohort": pa.array([], pa.int64()),
                             "age": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        new_u = np.ones(n, dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        # cross-batch duplicates of a (user, bucket) pair survive the
        # per-batch combiner; drop them here (sorted ⇒ adjacent)
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (~new_u[1:]) & (b[1:] == b[:-1])
        starts = np.flatnonzero(new_u)
        cohort = np.repeat(b[starts], np.diff(np.append(starts, n)))
        age = b - cohort
        keep = ~dup
        pairs = np.stack([cohort[keep], age[keep]], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({
            "cohort": pa.array(uniq[:, 0], pa.int64()),
            "age": pa.array(uniq[:, 1], pa.int64()),
            "n_users": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = (
        events.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("_c")
        .map_groups(fold, batch_format="pyarrow")
        .groupby(["cohort", "age"]).sum("n_users")
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort": t.column("cohort"),
            "age": t.column("age"),
            "n_users": pc.cast(t.column("sum(n_users)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")
