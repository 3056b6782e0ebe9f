"""Generic ANALYZE (stages/analyze.analyze_columns): pandas oracle, partition
invariance, nulls / all-null / empty-table edges, float rejection."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.analyze import analyze_columns


def _table(n=3000, seed=6):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(-1000, 1000, n).astype(np.int64)
    strs = pd.Series(rng.integers(0, 40, n)).map(lambda x: f"s{x:02d}")
    strs = [None if i % 17 == 0 else s for i, s in zip(ids, strs)]
    return pa.table({
        "id": pa.array(ids),
        "v": pa.array(vals),
        "s": pa.array(strs, pa.string()),
    })


def _expect(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    rows = []
    for c in ("id", "s", "v"):
        col = df[c]
        mn, mx = col.dropna().min(), col.dropna().max()
        rows.append({
            "col": c, "n": len(col), "n_null": int(col.isna().sum()),
            "ndv": col.dropna().nunique(),
            "min_s": str(mn), "max_s": str(mx),
        })
    return pd.DataFrame(sorted(rows, key=lambda r: r["col"]))


@pytest.mark.parametrize("nparts", [1, 11])
def test_analyze_matches_pandas_oracle(nparts):
    t = _table()
    ds = ray.data.from_arrow(t).repartition(nparts)
    got = (analyze_columns(ds, ["id", "v", "s"]).to_pandas()
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, _expect(t), check_dtype=False)


def test_analyze_all_null_and_constant_columns():
    t = pa.table({
        "z": pa.array([None, None, None], pa.string()),
        "k": pa.array([7, 7, 7], pa.int64()),
    })
    got = (analyze_columns(ray.data.from_arrow(t), ["z", "k"])
           .to_pandas().set_index("col"))
    assert got.loc["z"].tolist() == [3, 3, 0, None, None]
    assert got.loc["k"].tolist() == [3, 0, 1, "7", "7"]


def test_analyze_rejects_floats():
    t = pa.table({"f": pa.array([1.5], pa.float64())})
    with pytest.raises(ValueError, match="quantize"):
        analyze_columns(ray.data.from_arrow(t), ["f"])
