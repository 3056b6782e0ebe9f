"""Deterministic sampling / mixture weighting for training-data pipelines.

Engine addition beyond the reference (which has no sampling at all —
SURVEY §2.6 "No top-k and no sampling"). These are the knobs a 100-TB
corpus-prep pipeline needs: drop-in per-source mixture weighting ("keep 50%
of English, 25% of German, 10% of the rest") and stable train/holdout
splits. Everything is a pure per-batch vectorized map — no shuffle, no
state, no RNG stream to coordinate — so the operators are trivially
scale-safe and **reproducible at any parallelism**: membership depends only
on (key, salt), never on row order, partition boundaries or worker count.

The hash is deliberately simple integer arithmetic —
``(key * 2654435761 + salt) mod 2^32`` (Knuth multiplicative) — so the
exact same predicate is expressible in ANSI SQL for the DuckDB oracle
(``queries()['sample_documents_stratified']`` ↔ its ``oracle_sql`` entry).
Rate → threshold uses ``round(rate * 2^32)`` once, driver-side; the hot
path compares uint32s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.uint64(2654435761)
_MASK32 = np.uint64(0xFFFFFFFF)


def hash_u32(key: np.ndarray, salt: int = 0) -> np.ndarray:
    """(key * 2654435761 + salt) mod 2^32 on uint64 — SQL-replicable."""
    k = key.astype(np.uint64, copy=False)
    return (k * _KNUTH + np.uint64(salt)) & _MASK32


def threshold_for(rate: float) -> int:
    """Inclusive-exclusive uint32 threshold for a keep-rate in [0, 1]."""
    return min(1 << 32, max(0, int(round(rate * (1 << 32)))))


def deterministic_sample(ds, *, key: str, rate: float, salt: int = 0):
    """Keep each row iff hash(key, salt) < rate·2^32. Pure map, no shuffle."""
    thr = np.uint64(threshold_for(rate))

    def keep(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(hash_u32(k, salt) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    *,
    key: str,
    stratum: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
):
    """Per-stratum keep-rates (mixture weighting): row kept iff
    hash(key, salt) < rates[stratum]·2^32, with ``default_rate`` for strata
    not listed. Vectorized threshold lookup via ``pc.index_in`` against the
    (tiny) rate table — closure-captured, no broadcast needed."""
    strata = pa.array(list(rates.keys()), pa.string())
    thrs = np.array([threshold_for(r) for r in rates.values()], dtype=np.uint64)
    default_thr = np.uint64(threshold_for(default_rate))

    def keep(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        idx = pc.index_in(t.column(stratum), value_set=strata)
        idx_np = idx.to_numpy(zero_copy_only=False)
        miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else (idx_np < 0)
        safe = np.where(miss, 0, idx_np).astype(np.int64)
        thr = np.where(miss, default_thr, thrs[safe])
        return t.filter(pa.array(hash_u32(k, salt) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def train_holdout_split(ds, *, key: str, holdout: float, salt: int = 0):
    """Stable (train, holdout) Dataset pair: a row is in holdout iff
    hash(key, salt) < holdout·2^32. The two datasets partition the input
    exactly and permanently (new data keeps old rows' assignment)."""
    thr = np.uint64(threshold_for(holdout))

    def side(want_holdout: bool):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            m = hash_u32(k, salt) < thr
            return t.filter(pa.array(m if want_holdout else ~m))

        return fn

    return (
        ds.map_batches(side(False), batch_format="pyarrow"),
        ds.map_batches(side(True), batch_format="pyarrow"),
    )


def sample_k_per_group(
    ds, *, key: str, group: str, k: int, salt: int = 0
):
    """Deterministic k-per-group sample: within each group keep the k rows
    with the smallest ``(hash_u32(key), key)`` rank — a reproducible
    "reservoir" that is independent of partitioning and row order (the
    hash IS the random draw, SQL-replicable as
    ``(key*2654435761+salt) % 2^32``).

    Scale shape: the selection is associative — each batch first cuts to
    its local top-k per group (combiner), the single keyed shuffle carries
    ≤ k·|groups in batch| rows, and the per-group merge re-cuts to the
    global k. No global sort.
    """

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_hr", pa.array([], pa.int64())) \
                if "_hr" not in t.column_names else t
        if "_hr" not in t.column_names:
            keys = pc.cast(t.column(key), pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            hr = hash_u32(keys, salt).astype(np.int64)
            t = t.append_column("_hr", pa.array(hr, pa.int64()))
        idx = pc.sort_indices(
            t, sort_keys=[(group, "ascending"), ("_hr", "ascending"),
                          (key, "ascending")],
        )
        t = t.take(idx)
        g = t.column(group).combine_chunks().to_numpy(zero_copy_only=False)
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        )
        return t.filter(pa.array(rank < k))

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby(group)
        .map_groups(local_topk, batch_format="pyarrow")
        .drop_columns(["_hr"])
    )
