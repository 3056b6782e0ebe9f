"""Distributed spherical k-means (stages/similarity.kmeans_embeddings) and
SemDeDup (semdedup): bit-exact vs a serial oracle running the identical
integer-quantized algorithm, partition invariance, planted-dup recall, and
the hot-cluster rep-only fallback."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.sampling import hash_u32
from nightcrawlercmd_ray.stages.similarity import (
    _quantize_unit,
    kmeans_embeddings,
    semdedup,
)


def _serial_kmeans(ids, X, k, iters, quant=1e6):
    """The exact same algorithm, single-process numpy."""
    h = hash_u32(ids.astype(np.int64)).astype(np.int64)
    order = np.lexsort((ids, h))[:k]
    x0 = X[order].astype(np.float64)
    cents = x0 / np.maximum(np.sqrt((x0 * x0).sum(1, keepdims=True)), 1e-300)
    for _ in range(iters):
        qc = np.rint(cents * quant).astype(np.int64)
        qx = _quantize_unit(X.astype(np.float64), quant)
        a = np.argmax(qx @ qc.T, axis=1)
        sums = np.zeros((k, X.shape[1]), dtype=np.int64)
        np.add.at(sums, a, qx)
        counts = np.bincount(a, minlength=k)
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] / (counts[nz, None] * quant)
        norms = np.sqrt((new * new).sum(1, keepdims=True))
        norms[norms == 0] = 1.0
        cents = new / norms
    qc = np.rint(cents * quant).astype(np.int64)
    qx = _quantize_unit(X.astype(np.float64), quant)
    scores = qx @ qc.T
    a = np.argmax(scores, axis=1)
    return cents, a, scores[np.arange(len(a)), a]


def _blobs(n=900, d=12, k=3, seed=2):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 6
    X = np.stack([centers[i % k] + rng.normal(size=d) * 0.4 for i in range(n)])
    ids = rng.permutation(n).astype(np.int64)
    return ids, X


@pytest.mark.parametrize("nparts", [1, 6])
def test_kmeans_bit_exact_vs_serial(nparts):
    ids, X = _blobs()
    exp_c, exp_a, exp_q = _serial_kmeans(ids, X, k=3, iters=5)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(X.tolist(), pa.list_(pa.float64()))})
    cents, assigned = kmeans_embeddings(
        ray.data.from_arrow(t).repartition(nparts), k=3, iters=5
    )
    assert np.array_equal(cents.view(np.int64), exp_c.view(np.int64))
    got = assigned.to_pandas().sort_values("vec_id").reset_index(drop=True)
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(got["cluster"].to_numpy(), exp_a[order])
    assert np.array_equal(got["qsim"].to_numpy(), exp_q[order])
    # blob recovery: each true blob lands in a single cluster
    true = np.arange(len(ids)) % 3
    for b in range(3):
        assert len(set(exp_a[true == b])) == 1


def test_semdedup_planted_recall_and_invariance():
    ids, X = _blobs(n=600)
    dup_src = ids[:40]
    pert = X[:40] + 1e-4  # ≥0.9999 cosine
    t = pa.table({
        "vec_id": pa.array(np.concatenate([ids, dup_src + 1_000_000])),
        "embedding": pa.array(np.concatenate([X, pert]).tolist(),
                              pa.list_(pa.float64())),
    })
    outs = []
    for nparts in (1, 5):
        dups = semdedup(
            ray.data.from_arrow(t).repartition(nparts),
            threshold=0.9995, k=3, iters=3,
        ).to_pandas().sort_values("vec_id").reset_index(drop=True)
        outs.append(dups)
        flagged = set(dups["vec_id"])
        # every planted pair has one member flagged, with the OTHER member
        # (or an even closer original) as its dup_of
        for s in dup_src:
            assert (int(s) in flagged) or (int(s) + 1_000_000 in flagged)
        # dup_of is always a smaller id in the same cluster
        assert (dups["dup_of"] < dups["vec_id"]).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_semdedup_hot_cluster_rep_only_fallback():
    # one tight cluster larger than group_cap → rep-only path: everything
    # similar to the min-id member is flagged against it, O(n) not O(n²)
    n = 64
    ids = np.arange(n, dtype=np.int64)
    X = np.tile(np.array([1.0, 2.0, 3.0, 4.0]), (n, 1)) + \
        np.linspace(0, 1e-5, n)[:, None]
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(X.tolist(), pa.list_(pa.float64()))})
    dups = semdedup(
        ray.data.from_arrow(t), threshold=0.999, k=2, iters=2, group_cap=16
    ).to_pandas()
    assert set(dups["dup_of"]) <= {0}  # rep is the min id
    assert len(dups) >= n - 2  # all near-identical rows flagged against it


@pytest.mark.parametrize("nparts", [1, 4])
def test_jl_project_serial_and_separation(nparts):
    """JL ±1 projection: bit-equal to a serial rebuild of the hashed sign
    matrix at any partitioning; preserves blob separation (within-blob
    projected distances stay below cross-blob ones)."""
    from nightcrawlercmd_ray.stages.similarity import jl_project

    rng = np.random.default_rng(9)
    d, K = 24, 8
    a = rng.normal(size=d)
    b = a + 10.0
    X = np.concatenate([
        a + rng.normal(size=(50, d)) * 0.1,
        b + rng.normal(size=(50, d)) * 0.1,
    ])
    ids = np.arange(100, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(X.tolist(), pa.list_(pa.float64()))})
    out = (
        jl_project(ray.data.from_arrow(t).repartition(nparts), out_dim=K)
        .to_pandas().sort_values(["vec_id", "j"]).reset_index(drop=True)
    )
    # serial rebuild
    q = np.rint(X * 1e4).astype(np.int64)
    i_idx = np.arange(1, d + 1, dtype=np.uint64)[:, None]
    j_idx = np.arange(K, dtype=np.uint64)[None, :]
    h = ((i_idx * np.uint64(K) + j_idx) * np.uint64(2654435761)) \
        & np.uint64(0xFFFFFFFF)
    S = np.where(h < np.uint64(1 << 31), 1, -1).astype(np.int64)
    exp = (q @ S).reshape(-1)
    assert np.array_equal(out["y"].to_numpy(), exp)
    # sign matrix must not be column-degenerate (the odd-multiplier parity
    # trap: low bit of knuth_hash(i*K+j) is parity(i*K+j))
    assert (np.abs(S.sum(axis=0)) < d).all()
    wide = out.pivot(index="vec_id", columns="j", values="y").to_numpy(float)
    blob = ids < 50
    within = np.linalg.norm(wide[blob][:10, None] - wide[blob][None, 10:20],
                            axis=2).max()
    across = np.linalg.norm(wide[blob][:10, None] - wide[~blob][None, :10],
                            axis=2).min()
    assert across > 2 * within


@pytest.mark.parametrize("nparts", [1, 6])
def test_hard_negatives_vs_serial(nparts):
    """Hard-negative mining: equals the serial masked-argmax (max integer
    dot among different-label rows, ties to smallest id) at any
    partitioning; a query whose label covers the whole corpus gets no row."""
    from nightcrawlercmd_ray.stages.similarity import hard_negatives

    rng = np.random.default_rng(23)
    n, d = 400, 8
    X = rng.normal(size=(n, d))
    labels = (np.arange(n) % 3).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "label": pa.array(labels[ids], pa.int32()),
                  "embedding": pa.array(X[ids].tolist(), pa.list_(pa.float64()))})
    qt = pa.table({"vec_id": pa.array(ids[:5]),
                   "label": pa.array(labels[ids[:5]], pa.int32()),
                   "embedding": pa.array(X[ids[:5]].tolist(),
                                         pa.list_(pa.float64()))})
    out = hard_negatives(
        ray.data.from_arrow(t).repartition(nparts), qt
    ).to_pandas()

    q = np.rint(X[ids[:5]] * 1e4).astype(np.int64)
    c = np.rint(X[ids] * 1e4).astype(np.int64)
    dots = q @ c.T
    for row, (qid, qlab) in zip(range(5), zip(ids[:5], labels[ids[:5]])):
        mask = (labels[ids] != qlab) & (ids != qid)
        dd = dots[row][mask]
        cand = ids[mask]
        best = dd.max()
        exp_neg = cand[dd == best].min()
        got = out[out["query_id"] == qid]
        assert int(got["neg_id"].iloc[0]) == exp_neg
        assert int(got["dot"].iloc[0]) == best

    # single-label corpus → no negatives exist → empty result
    t1 = pa.table({"vec_id": pa.array(np.arange(10, dtype=np.int64)),
                   "label": pa.array(np.zeros(10, np.int32)),
                   "embedding": pa.array(X[:10].tolist(), pa.list_(pa.float64()))})
    out1 = hard_negatives(ray.data.from_arrow(t1), t1.slice(0, 2)).to_pandas()
    assert len(out1) == 0


@pytest.mark.parametrize("nparts", [1, 5])
def test_nearest_centroid_classify_blobs(nparts):
    """Rocchio classification: recovers well-separated blob labels nearly
    perfectly and equals the serial integer-exact computation at any
    partitioning."""
    from nightcrawlercmd_ray.stages.similarity import nearest_centroid_classify

    rng = np.random.default_rng(29)
    n, d, L = 600, 10, 3
    centers = rng.normal(size=(L, d)) * 8
    labels = (np.arange(n) % L).astype(np.int64)
    X = centers[labels] + rng.normal(size=(n, d)) * 0.5
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "label": pa.array(labels[ids], pa.int32()),
                  "embedding": pa.array(X[ids].tolist(), pa.list_(pa.float64()))})
    out = nearest_centroid_classify(
        ray.data.from_arrow(t).repartition(nparts)
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert out["correct"].mean() > 0.98

    # serial reference: same quantization path
    qsum = np.zeros((L, d), dtype=np.int64)
    for l in range(L):
        qsum[l] = np.rint(X[labels == l] * 1e6).astype(np.int64).sum(axis=0)
    n_l = np.bincount(labels)
    qx = np.rint(X * 1e4).astype(np.int64)
    scores = (qx @ qsum.T).astype(np.float64) / n_l
    exp_pred = np.argmax(scores, axis=1)
    got = out.set_index("vec_id").loc[np.arange(n)]["pred_label"].to_numpy()
    assert np.array_equal(got, exp_pred[np.arange(n)])
