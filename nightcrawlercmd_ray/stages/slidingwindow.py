"""Sliding (hopping) time-window aggregation.

The report pipeline's hourly aggregate (``queries()['events_hourly_window']``)
is a TUMBLING window; stream-analytics pipelines also need the overlapping
form — "count/sum per 1-hour window, advancing every 15 minutes" — which the
reference (single-pass serial maps, ``mainReport.go:365-371``) has no analog
for.

Scale shape: each event belongs to exactly ``window/slide`` windows (slide
must divide window), so a per-batch combiner expands events to (key,
window_start) partials and PRE-AGGREGATES them inside the batch
(``pyarrow.Table.group_by``) — the shuffle carries at most
|keys × occupied windows| rows per block, not window/slide × |rows|. One
``groupby`` merges partials. No per-row Python; the expansion is a numpy
tile/repeat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sliding_window_agg(
    events,
    *,
    window_s: int,
    slide_s: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Per-(key, window) event count and value sum (integer cents) over
    sliding windows ``[ws, ws + window_s)`` with starts at multiples of
    ``slide_s``. ``slide_s`` must divide ``window_s``.
    → Dataset(key, win_start_s, n_events, sum_value_cents).
    """
    if window_s % slide_s:
        raise ValueError("slide_s must divide window_s")
    k = window_s // slide_s

    def partial(t: pa.Table) -> pa.Table:
        ts_s = pc.cast(
            pc.floor(
                pc.divide(
                    pc.cast(
                        pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
                    ),
                    1_000_000,
                )
            ),
            pa.int64(),
        ).combine_chunks().to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(t.column(value_col), pa.float64()), 100.0)),
            pa.int64(),
        ).combine_chunks().to_numpy(zero_copy_only=False)
        keys = t.column(key_col)
        # latest window start containing t is floor(t/slide)*slide; the k
        # starts [latest - j*slide, j in 0..k-1] all satisfy ws > t - window
        latest = (ts_s // slide_s) * slide_s
        n = len(latest)
        ws = np.repeat(latest, k) - np.tile(
            np.arange(k, dtype=np.int64) * slide_s, n
        )
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        g = (
            pa.table({
                "key": keys.take(pa.array(idx)),
                "win_start_s": pa.array(ws, pa.int64()),
                "n_events": pa.array(np.ones(n * k, dtype=np.int64)),
                "sum_value_cents": pa.array(np.repeat(cents, k)),
            })
            .group_by(["key", "win_start_s"])
            .aggregate([("n_events", "sum"), ("sum_value_cents", "sum")])
        )
        return g.rename_columns(["key", "win_start_s", "n_events", "sum_value_cents"])

    from ray.data.aggregate import Sum

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["key", "win_start_s"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
        )
    )


def sliding_distinct(
    events,
    *,
    window_s: int,
    slide_s: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Per-(key, window) EXACT distinct-user count over sliding windows —
    the "unique visitors per trailing hour" statistic, which the
    sum/count ``sliding_window_agg`` cannot express (distinct is not a
    per-window additive merge).

    Scale shape (the ``exact_distinct_by`` recipe applied to the hop
    expansion): each event expands to its ``window/slide`` windows and the
    batch PRE-DEDUPES (key, window, user) triples, so the first shuffle
    carries at most the triple cardinality per block — never
    occurrences; one ``groupby(key, win, user)`` global-dedup, then a
    tiny ``groupby(key, win)`` count. ``slide_s`` must divide
    ``window_s``. → Dataset(key, win_start_s, n_users).
    """
    if window_s % slide_s:
        raise ValueError("slide_s must divide window_s")
    k = window_s // slide_s

    def triples(t: pa.Table) -> pa.Table:
        ts_s = pc.cast(
            pc.floor(
                pc.divide(
                    pc.cast(
                        pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
                    ),
                    1_000_000,
                )
            ),
            pa.int64(),
        ).combine_chunks().to_numpy(zero_copy_only=False)
        latest = (ts_s // slide_s) * slide_s
        n = len(latest)
        ws = np.repeat(latest, k) - np.tile(
            np.arange(k, dtype=np.int64) * slide_s, n
        )
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        return (
            pa.table({
                "key": t.column(key_col).take(idx),
                "win_start_s": pa.array(ws, pa.int64()),
                "user": pc.cast(t.column(user_col), pa.int64()).take(idx),
            })
            .group_by(["key", "win_start_s", "user"])
            .aggregate([])  # batch-local dedup: the combiner
        )

    from ray.data.aggregate import Count

    return (
        events.map_batches(triples, batch_format="pyarrow")
        .groupby(["key", "win_start_s", "user"])
        .count()
        .groupby(["key", "win_start_s"])
        .aggregate(Count(alias_name="n_users"))
    )
