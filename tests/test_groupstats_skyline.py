"""Grouped stats (stages/groupstats) and 2-D skyline (stages/skyline):
pandas/numpy oracles, tie determinism, partition invariance, edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.groupstats import mode_per_group, pairwise_moments
from nightcrawlercmd_ray.stages.skyline import skyline_2d


def _mode_oracle(df: pd.DataFrame) -> pd.DataFrame:
    c = df.groupby(["g", "v"]).size().reset_index(name="cnt")
    c = c.sort_values(["g", "cnt", "v"], ascending=[True, False, True])
    out = c.groupby("g").first().reset_index()
    return out.rename(columns={"v": "mode_value"})[["g", "mode_value", "cnt"]]


@pytest.mark.parametrize("nparts,P", [(1, 1), (9, 4)])
def test_mode_matches_pandas_oracle(nparts, P):
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 60, n).astype(np.int64),
            "v": pd.Series(rng.zipf(1.6, n) % 23).map(lambda x: f"t{x:02d}"),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
    got = (
        mode_per_group(ds, group_col="g", value_col="v", num_partitions=P)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = _mode_oracle(df).sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_mode_tie_breaks_to_smallest_value():
    # g=0: 'b' and 'a' both appear twice -> 'a' wins; g=1 unique winner.
    t = pa.table(
        {
            "g": pa.array([0, 0, 0, 0, 1, 1, 1], pa.int64()),
            "v": pa.array(["b", "a", "b", "a", "z", "z", "y"]),
        }
    )
    got = (
        mode_per_group(
            ray.data.from_arrow(t).repartition(3), group_col="g", value_col="v",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got["mode_value"].tolist() == ["a", "z"]
    assert got["cnt"].tolist() == [2, 2]


def test_mode_empty_input():
    t = pa.table({"g": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
    got = mode_per_group(ray.data.from_arrow(t), group_col="g", value_col="v")
    assert got.count() == 0


@pytest.mark.parametrize("nparts", [1, 7])
def test_pairwise_moments_exact_vs_numpy(nparts):
    rng = np.random.default_rng(3)
    n = 4000
    cols = {c: rng.integers(-50, 50, n).astype(np.int64) for c in ("b", "a", "c")}
    ds = ray.data.from_arrow(pa.table(cols)).repartition(nparts)
    got = pairwise_moments(ds, ["b", "a", "c"]).to_pandas()
    names = sorted(cols)
    assert list(zip(got["var_a"], got["var_b"])) == [
        (a, b) for i, a in enumerate(names) for b in names[i:]
    ]
    for _, r in got.iterrows():
        xa, xb = cols[r["var_a"]], cols[r["var_b"]]
        assert r["n"] == n
        assert r["sum_a"] == xa.sum() and r["sum_b"] == xb.sum()
        assert r["sum_aa"] == (xa * xa).sum() and r["sum_bb"] == (xb * xb).sum()
        assert r["sum_ab"] == (xa * xb).sum()


def test_pairwise_moments_exact_covariance_derivation():
    # cov derives exactly from the integer sums: cov_num = n*Sab - Sa*Sb
    x = np.array([1, 2, 3, 4], dtype=np.int64)
    y = np.array([2, 4, 6, 9], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y}))
    got = pairwise_moments(ds, ["x", "y"]).to_pandas().set_index(["var_a", "var_b"])
    r = got.loc[("x", "y")]
    n = len(x)
    assert n * r["sum_ab"] - r["sum_a"] * r["sum_b"] == n * np.cov(x, y, bias=True)[
        0, 1
    ] * n


def _cooc_oracle(df: pd.DataFrame) -> pd.DataFrame:
    d = df.drop_duplicates()
    m = d.merge(d, on="u")
    m = m[m["t_x"] <= m["t_y"]]
    out = (
        m.groupby(["t_x", "t_y"]).size().reset_index(name="n_ids")
        .sort_values(["t_x", "t_y"]).reset_index(drop=True)
    )
    out.columns = ["type_a", "type_b", "n_ids"]
    return out


@pytest.mark.parametrize("nparts,P", [(1, 1), (9, 5)])
def test_cooccurrence_matches_pandas_oracle(nparts, P):
    from nightcrawlercmd_ray.stages.groupstats import cooccurrence_pairs

    rng = np.random.default_rng(21)
    n = 6000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 250, n).astype(np.int64),
            "t": pd.Series(rng.integers(0, 7, n)).map(lambda x: f"e{x}"),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
    got = cooccurrence_pairs(
        ds, id_col="u", item_col="t", num_partitions=P
    ).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _cooc_oracle(df), check_dtype=False)


def test_cooccurrence_diagonal_is_distinct_id_count():
    from nightcrawlercmd_ray.stages.groupstats import cooccurrence_pairs

    # user 1 fires 'a' three times -> diagonal counts the USER once
    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "t": pa.array(["a", "a", "a", "a", "b", "b"]),
        }
    )
    got = (
        cooccurrence_pairs(
            ray.data.from_arrow(t).repartition(3), id_col="u", item_col="t",
            num_partitions=2,
        )
        .to_pandas().set_index(["type_a", "type_b"])["n_ids"]
    )
    assert got[("a", "a")] == 2  # users 1, 2
    assert got[("b", "b")] == 2  # users 2, 3
    assert got[("a", "b")] == 1  # user 2 only


def _skyline_oracle(df: pd.DataFrame) -> pd.DataFrame:
    keep = []
    pts = df[["x", "y"]].to_numpy()
    for i, (x, y) in enumerate(pts):
        dom = (pts[:, 0] <= x) & (pts[:, 1] <= y) & (
            (pts[:, 0] < x) | (pts[:, 1] < y)
        )
        if not dom.any():
            keep.append(i)
    out = df.iloc[keep].sort_values(["x", "y", "id"]).reset_index(drop=True)
    return out


@pytest.mark.parametrize("nparts", [1, 13])
def test_skyline_matches_bruteforce(nparts):
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 500, n).astype(np.int64),
            "y": rng.integers(0, 500, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
    got = (
        skyline_2d(ds, x_col="x", y_col="y", id_col="id")
        .to_pandas()
        .reset_index(drop=True)
    )
    exp = _skyline_oracle(df)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_skyline_equal_points_all_survive():
    # three identical minimal points and one dominated point
    t = pa.table(
        {
            "id": pa.array([3, 1, 2, 9], pa.int64()),
            "x": pa.array([5, 5, 5, 6], pa.int64()),
            "y": pa.array([2, 2, 2, 3], pa.int64()),
        }
    )
    got = (
        skyline_2d(ray.data.from_arrow(t).repartition(2), x_col="x", y_col="y",
                   id_col="id")
        .to_pandas()
    )
    assert got["id"].tolist() == [1, 2, 3]


def test_skyline_single_row_and_line_front():
    t = pa.table(
        {
            "id": pa.array([0, 1, 2], pa.int64()),
            "x": pa.array([1, 2, 3], pa.int64()),
            "y": pa.array([3, 2, 1], pa.int64()),
        }
    )
    got = skyline_2d(ray.data.from_arrow(t), x_col="x", y_col="y", id_col="id")
    assert got.count() == 3  # strictly decreasing y: every point is on the front


# --------------------------------------------------------------------------- #
# weighted quantiles
# --------------------------------------------------------------------------- #
def _wq_oracle(v: np.ndarray, w: np.ndarray, num: int, den: int) -> int:
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = int(cw[-1])
    # peers-inclusive: cumweight(<=v) — advance cw to each value's last peer
    last = np.searchsorted(v, v, side="right") - 1
    cw_inc = cw[last]
    hit = np.flatnonzero(den * cw_inc >= num * total)
    return int(v[hit[0]])


@pytest.mark.parametrize("nparts", [1, 8])
def test_weighted_quantiles_vs_serial_oracle(nparts):
    from nightcrawlercmd_ray.stages.quantiles import weighted_quantiles_wide

    rng = np.random.default_rng(30)
    n = 30000
    v = rng.integers(-(10**12), 10**12, n).astype(np.int64)
    w = rng.integers(0, 6, n).astype(np.int64)  # zero weights present
    ds = ray.data.from_arrow(pa.table({"v": v, "w": w})).repartition(nparts)
    qs = [(1, 4), (1, 2), (3, 4), (99, 100)]
    got = weighted_quantiles_wide(
        ds, "v", "w", qs, out_names=["a", "b", "c", "d"], max_buckets=128
    ).to_pydict()
    for (num, den), name in zip(qs, ["a", "b", "c", "d"]):
        assert got[name][0] == _wq_oracle(v, w, num, den), (num, den)


def test_weighted_quantiles_ties_and_zero_weights():
    from nightcrawlercmd_ray.stages.quantiles import weighted_quantiles_wide

    # value 10 carries all the weight; 5 and 20 are zero-weight
    t = pa.table(
        {
            "v": pa.array([5, 10, 10, 20], pa.int64()),
            "w": pa.array([0, 3, 4, 0], pa.int64()),
        }
    )
    got = weighted_quantiles_wide(
        ray.data.from_arrow(t).repartition(2), "v", "w",
        [(1, 2)], out_names=["m"],
    ).to_pydict()
    assert got["m"][0] == 10


def test_weighted_quantiles_negative_weight_raises():
    from nightcrawlercmd_ray.stages.quantiles import weighted_quantiles_wide

    t = pa.table({"v": pa.array([1, 2], pa.int64()),
                  "w": pa.array([1, -1], pa.int64())})
    with pytest.raises(ValueError, match="negative weight"):
        weighted_quantiles_wide(ray.data.from_arrow(t), "v", "w",
                                [(1, 2)], out_names=["m"])


# --------------------------------------------------------------------------- #
# review-fix regressions
# --------------------------------------------------------------------------- #
def test_skyline_int64_max_point_survives():
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "x": pa.array([0, 5], pa.int64()),
            "y": pa.array([np.iinfo(np.int64).max, 3], pa.int64()),
        }
    )
    got = skyline_2d(ray.data.from_arrow(t), x_col="x", y_col="y", id_col="id")
    df = got.to_pandas()
    # (0, MAX) is undominated (smaller x) and must survive the sentinel path
    assert sorted(df["id"]) == [1, 2]


def test_pairwise_moments_complete_case_nulls():
    t = pa.table(
        {
            "a": pa.array([1, None, 3, 4], pa.int64()),
            "b": pa.array([2, 5, None, 7], pa.int64()),
        }
    )
    got = pairwise_moments(ray.data.from_arrow(t), ["a", "b"]).to_pandas()
    r = got.set_index(["var_a", "var_b"]).loc[("a", "b")]
    # complete cases: rows (1,2) and (4,7)
    assert r["n"] == 2 and r["sum_a"] == 5 and r["sum_b"] == 9
    assert r["sum_ab"] == 1 * 2 + 4 * 7


def test_pairwise_moments_empty_input_raises():
    t = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    with pytest.raises(ValueError, match="no rows"):
        pairwise_moments(ray.data.from_arrow(t), ["a", "b"])


@pytest.mark.parametrize("nparts", [1, 6])
def test_grouped_weighted_quantiles_vs_serial(nparts):
    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide_by

    rng = np.random.default_rng(77)
    n = 12000
    g = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    v = rng.integers(-(10**8), 10**8, n).astype(np.int64)
    w = rng.integers(0, 4, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v, "w": w})).repartition(
        nparts
    )
    got = exact_quantiles_wide_by(
        ds, "v", [(1, 2)], by_col="g", out_names=["m"], weight_col="w",
        max_buckets=64,
    ).to_pandas().set_index("g")["m"]
    for key in ["x", "y", "z"]:
        mask = g == key
        sv = np.sort(v[mask])
        sw = w[mask][np.argsort(v[mask], kind="stable")]
        cw = np.cumsum(sw)
        last = np.searchsorted(sv, sv, side="right") - 1
        hit = np.flatnonzero(2 * cw[last] >= cw[-1])
        assert got[key] == sv[hit[0]]


def test_grouped_weighted_quantiles_negative_weight_raises():
    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide_by

    t = pa.table({"g": pa.array(["a", "a"]),
                  "v": pa.array([1, 2], pa.int64()),
                  "w": pa.array([1, -2], pa.int64())})
    with pytest.raises(Exception, match="negative weight"):
        exact_quantiles_wide_by(
            ray.data.from_arrow(t), "v", [(1, 2)], by_col="g",
            out_names=["m"], weight_col="w",
        )
