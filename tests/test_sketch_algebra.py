"""HLL co-occurrence sketch algebra and the equi-depth histogram:
accuracy vs the exact operators, partition-invariance of register state,
heavy-tie empty buckets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.groupstats import cooccurrence_pairs
from nightcrawlercmd_ray.stages.quantiles import equidepth_histogram
from nightcrawlercmd_ray.stages.sketches import hll_cooccurrence


def _events(seed=40, n=20000, n_users=3000, n_types=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "u": rng.integers(0, n_users, n).astype(np.int64),
            "t": pd.Series(rng.integers(0, n_types, n)).map(
                lambda x: f"e{x}"
            ),
        }
    )


def test_hll_cooccurrence_tracks_exact_within_error():
    df = _events()
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    approx = (
        hll_cooccurrence(ds, id_col="u", item_col="t", p=14)
        .to_pandas().set_index(["type_a", "type_b"])["n_ids_approx"]
    )
    exact = (
        cooccurrence_pairs(ds, id_col="u", item_col="t", num_partitions=4)
        .to_pandas().set_index(["type_a", "type_b"])["n_ids"]
    )
    assert set(approx.index) == set(exact.index)
    for k in exact.index:
        # |A∩B| via inclusion-exclusion compounds three ±1.6% estimates —
        # 10% is a loose deterministic bound for these planted sizes
        assert abs(approx[k] - exact[k]) <= max(0.10 * exact[k], 40), (
            k, approx[k], exact[k],
        )


def test_hll_cooccurrence_partition_invariant_bit_exact():
    df = _events(seed=41)
    t = pa.Table.from_pandas(df)
    a = (
        hll_cooccurrence(ray.data.from_arrow(t).repartition(3),
                         id_col="u", item_col="t")
        .to_pandas()
    )
    b = (
        hll_cooccurrence(ray.data.from_arrow(t).repartition(17),
                         id_col="u", item_col="t")
        .to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)  # register max-merge is associative


def test_hll_cooccurrence_disjoint_items_near_zero():
    # users 0..999 only do 'a'; 1000..1999 only do 'b'
    u = np.arange(2000, dtype=np.int64)
    t = pa.table({"u": u, "t": pa.array(np.where(u < 1000, "a", "b"))})
    got = (
        hll_cooccurrence(ray.data.from_arrow(t).repartition(4),
                         id_col="u", item_col="t")
        .to_pandas().set_index(["type_a", "type_b"])["n_ids_approx"]
    )
    assert got[("a", "b")] <= 60  # ≈0 up to estimator noise
    assert abs(got[("a", "a")] - 1000) <= 50


@pytest.mark.parametrize("nparts", [1, 9])
def test_equidepth_histogram_vs_pandas(nparts):
    rng = np.random.default_rng(44)
    v = rng.integers(0, 10**9, 30000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": v})).repartition(nparts)
    got = equidepth_histogram(ds, "v", n_buckets=10).to_pandas()
    # oracle: quantile_disc edges (k = max(1, ceil(q*n))), bucket = #edges < v
    sv = np.sort(v)
    edges = np.array(
        [sv[max(1, int(np.ceil(q * len(v)))) - 1]
         for q in [i / 10 for i in range(1, 10)]]
    )
    b = np.searchsorted(edges, v, side="left")
    exp = np.bincount(b, minlength=10)
    assert got["bucket"].tolist() == list(range(10))
    assert got["n"].tolist() == exp.tolist()
    assert got["n"].sum() == len(v)


def test_equidepth_histogram_heavy_ties_emits_empty_buckets():
    # 95% of mass on one value: most decile edges coincide → empty buckets
    v = np.concatenate(
        [np.full(9500, 7, dtype=np.int64),
         np.arange(500, dtype=np.int64) + 100]
    )
    ds = ray.data.from_arrow(pa.table({"v": v})).repartition(3)
    got = equidepth_histogram(ds, "v", n_buckets=10).to_pandas()
    assert len(got) == 10
    assert got["n"].sum() == len(v)
    assert (got["n"] == 0).any()  # coincident edges leave empty buckets


def test_hll_cooccurrence_ignores_null_rows():
    t = pa.table(
        {
            "u": pa.array([1, 2, None, 3, 3], pa.int64()),
            "t": pa.array(["a", None, "b", "a", "b"]),
        }
    )
    got = (
        hll_cooccurrence(ray.data.from_arrow(t), id_col="u", item_col="t")
        .to_pandas().set_index(["type_a", "type_b"])["n_ids_approx"]
    )
    assert abs(got[("a", "a")] - 2) < 0.5  # users 1, 3
    assert abs(got[("b", "b")] - 1) < 0.5  # user 3 only (null id dropped)
    assert abs(got[("a", "b")] - 1) < 0.5  # user 3
