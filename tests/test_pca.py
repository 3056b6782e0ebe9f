"""Distributed PCA / moment pass (stages/similarity.embedding_moments,
pca_embeddings): numpy-oracle equality, bit-exact partition invariance,
planted principal direction recovery, degenerate edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

SF_DIR = "/root/testdata/sf0.001"
QUANT = 1e4


def _vec_table(X):
    return pa.table({
        "vec_id": pa.array(np.arange(len(X)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float32())),
    })


def serial_moments(X, quant=QUANT):
    q = np.rint(np.asarray(X, np.float64) * quant).astype(np.int64)
    d = q.shape[1]
    out = {(0, 0): len(q)}
    for i in range(d):
        out[(i + 1, 0)] = int(q[:, i].sum())
        for j in range(i, d):
            out[(i + 1, j + 1)] = int((q[:, i] * q[:, j]).sum())
    return out


def test_moments_match_serial_and_partition_invariant():
    from nightcrawlercmd_ray.stages.similarity import embedding_moments

    rng = np.random.default_rng(5)
    X = (rng.random((300, 6)) - 0.5).astype(np.float32)
    expect = serial_moments(X)
    for blocks in (1, 9):
        ds = ray.data.from_arrow(_vec_table(X)).repartition(blocks)
        rows = embedding_moments(ds, quant=QUANT).take_all()
        got = {(r["i"], r["j"]): r["qs"] for r in rows}
        assert got == expect


def test_pca_matches_numpy_oracle():
    from nightcrawlercmd_ray.stages.similarity import (
        _eig_from_moments, pca_embeddings,
    )

    rng = np.random.default_rng(7)
    # planted structure: variance dominated by one known direction
    u = np.zeros(8); u[2] = 1.0
    X = (rng.normal(0, 0.02, (400, 8)) + np.outer(rng.normal(0, 0.3, 400), u))
    X = np.clip(X, -0.49, 0.49).astype(np.float32)

    ds = ray.data.from_arrow(_vec_table(X))
    out = pca_embeddings(ds, n_components=3, quant=QUANT).sort("vec_id").to_pandas()

    # numpy oracle on the SAME quantized data (shares only the sign rule)
    q = np.rint(np.asarray(X, np.float64) * QUANT) / QUANT
    mean = q.mean(axis=0)
    C = np.cov(q, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:3]
    W = v[:, order]
    for c in range(3):
        piv = int(np.argmax(np.abs(W[:, c])))
        if W[piv, c] < 0:
            W[:, c] = -W[:, c]
    # engine projects the RAW vectors (quantization is only for the exact
    # moment pass); mean/components come from the quantized covariance
    expect = (np.asarray(X, np.float64) - mean) @ W
    got = out[["pc1", "pc2", "pc3"]].to_numpy()
    assert np.allclose(got, expect, atol=1e-9)
    # planted direction: pc1 captures dimension 2's spread
    assert abs(np.corrcoef(got[:, 0], q[:, 2])[0, 1]) > 0.99


def test_pca_partition_invariant_bitexact():
    from nightcrawlercmd_ray.stages.similarity import pca_embeddings

    ds1 = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    a = pca_embeddings(ds1, n_components=2).sort("vec_id").to_pandas()
    ds2 = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                                columns=["vec_id", "embedding"]).repartition(7)
    b = pca_embeddings(ds2, n_components=2).sort("vec_id").to_pandas()
    assert (a["pc1"].to_numpy() == b["pc1"].to_numpy()).all()
    assert (a["pc2"].to_numpy() == b["pc2"].to_numpy()).all()


def test_pca_needs_two_rows():
    from nightcrawlercmd_ray.stages.similarity import pca_embeddings

    ds = ray.data.from_arrow(_vec_table(np.zeros((1, 4), np.float32)))
    with pytest.raises(ValueError, match="at least 2"):
        pca_embeddings(ds, n_components=1)
