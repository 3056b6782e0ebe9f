"""Product quantization (stages/similarity.pq_train / pq_encode / pq_topk):
serial-oracle bit-exactness, the m=1/k=n degenerate case where ADC ranking
must EQUAL exact L2 brute force, partition invariance of codebooks and
codes, planted near-dup recall, and edge guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.sampling import hash_u32
from nightcrawlercmd_ray.stages.similarity import pq_encode, pq_topk, pq_train


def _mk_ds(ids, X, n_blocks=4):
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(n_blocks)


def _vectors(n=120, d=16, seed=3):
    rng = np.random.RandomState(seed)
    # float32-exact values: the Dataset column is list<float32>, so the
    # serial oracle must see the same numbers the engine reads back
    return (np.arange(n, dtype=np.int64),
            (rng.randn(n, d) / 4).astype(np.float32).astype(np.float64))


def _serial_pq_train(ids, X, m, k, iters, quant=1e6):
    """The identical integer algorithm, single-process numpy."""
    h = hash_u32(ids.astype(np.int64)).astype(np.int64)
    order = np.lexsort((ids, h))[:k]
    x0 = X[order].astype(np.float64)
    k_eff, d = x0.shape
    dsub = d // m
    books = np.ascontiguousarray(x0.reshape(k_eff, m, dsub).transpose(1, 0, 2))
    qx_all = np.rint(X * quant).astype(np.int64).reshape(len(X), m, dsub)
    for _ in range(iters):
        qb = np.rint(books * quant).astype(np.int64)
        cnorm = (qb * qb).sum(axis=2)
        sums = np.zeros((m, k_eff, dsub), dtype=np.int64)
        counts = np.zeros((m, k_eff), dtype=np.int64)
        for s in range(m):
            a = np.argmin(cnorm[s] - 2 * (qx_all[:, s, :] @ qb[s].T), axis=1)
            np.add.at(sums[s], a, qx_all[:, s, :])
            counts[s] += np.bincount(a, minlength=k_eff)
        nz = counts > 0
        books = books.copy()
        books[nz] = sums[nz] / (counts[nz, None] * quant)
    return books


def _serial_encode(X, books, quant=1e6):
    qb = np.rint(books * quant).astype(np.int64)
    m, k, dsub = qb.shape
    qx = np.rint(X * quant).astype(np.int64).reshape(len(X), m, dsub)
    cnorm = (qb * qb).sum(axis=2)
    codes = np.empty((len(X), m), dtype=np.uint8)
    for s in range(m):
        codes[:, s] = np.argmin(cnorm[s] - 2 * (qx[:, s, :] @ qb[s].T), axis=1)
    return codes


def test_pq_train_matches_serial_oracle():
    ids, X = _vectors()
    books = pq_train(_mk_ds(ids, X), m=4, k=8, iters=5)
    expect = _serial_pq_train(ids, X, m=4, k=8, iters=5)
    assert books.shape == (4, 8, 4)
    np.testing.assert_array_equal(books, expect)  # bit-exact, not allclose


def test_pq_train_and_encode_partition_invariant():
    ids, X = _vectors()
    b_a = pq_train(_mk_ds(ids, X, n_blocks=2), m=4, k=8, iters=4)
    b_b = pq_train(_mk_ds(ids, X, n_blocks=13), m=4, k=8, iters=4)
    np.testing.assert_array_equal(b_a, b_b)
    c_a = (pq_encode(_mk_ds(ids, X, 2), b_a).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    c_b = (pq_encode(_mk_ds(ids, X, 13), b_a).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert (c_a["codes"].apply(tuple) == c_b["codes"].apply(tuple)).all()
    np.testing.assert_array_equal(
        np.stack(c_a["codes"].to_numpy()),
        _serial_encode(X, b_a))


def test_pq_degenerate_equals_exact_l2_bruteforce():
    """m=1, k=n, iters=0: the codebook IS the point set, so ADC distance is
    the exact (quantized) L2 distance — ranking must equal brute force."""
    ids, X = _vectors(n=48, d=8)
    ds = _mk_ds(ids, X)
    books = pq_train(ds, m=1, k=48, iters=0)
    codes = pq_encode(ds, books)
    q = X[:3]
    out = pq_topk(codes, books, q, k=6).to_pandas()
    qX = np.rint(X * 1e6).astype(np.int64)
    qq = np.rint(q * 1e6).astype(np.int64)
    for qi in range(3):
        d2 = ((qX - qq[qi]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))[:6]
        got = out[out.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert got == ids[order].tolist()


def test_pq_topk_planted_near_dup_recall():
    """Each query is a corpus vector + tiny deterministic perturbation; PQ
    top-1 must recover the source vector."""
    ids, X = _vectors(n=200, d=16, seed=9)
    ds = _mk_ds(ids, X)
    books = pq_train(ds, m=4, k=16, iters=6)
    codes = pq_encode(ds, books)
    src = [5, 77, 140]
    q = X[src] + 1e-4
    out = pq_topk(codes, books, q, k=3).to_pandas()
    top1 = out[out["rank"] == 0].sort_values("query_id")["vec_id"].tolist()
    assert top1 == src


def test_pq_topk_partition_invariant_and_dist_exact():
    ids, X = _vectors(n=90, d=16, seed=5)
    books = pq_train(_mk_ds(ids, X), m=4, k=8, iters=3)
    q = X[:2]
    a = pq_topk(pq_encode(_mk_ds(ids, X, 3), books), books, q, k=5).to_pandas()
    b = pq_topk(pq_encode(_mk_ds(ids, X, 17), books), books, q, k=5).to_pandas()
    assert a.equals(b)
    # ADC distance must equal the serial reconstruction-based value
    codes = _serial_encode(X, books)
    qb = np.rint(books * 1e6).astype(np.int64)
    qq = np.rint(q * 1e6).astype(np.int64).reshape(2, 4, 4)
    for _, r in a.iterrows():
        cs = codes[ids == r["vec_id"]][0]
        d = sum(int((qb[s, cs[s]] @ qb[s, cs[s]])
                    - 2 * (qq[int(r["query_id"]), s] @ qb[s, cs[s]]))
                for s in range(4))
        assert d == r["adc_dist"]


def test_pq_guards():
    ids, X = _vectors(n=20, d=15)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(_mk_ds(ids, X), m=4, k=4, iters=1)
    ids2, X2 = _vectors(n=20, d=16)
    with pytest.raises(ValueError, match="uint8"):
        pq_encode(_mk_ds(ids2, X2), np.zeros((2, 300, 8)))


# --------------------------------------------------------------------------- #
# IVF-PQ (ivfpq_build / ivfpq_topk)
# --------------------------------------------------------------------------- #
from nightcrawlercmd_ray.stages.similarity import (  # noqa: E402
    ivfpq_build,
    ivfpq_topk,
)


def test_ivfpq_degenerate_equals_exact_l2():
    """Full probing + k=n residual codebook at 0 iterations: every residual
    is its own codeword, so ADC distances are the exact integer L2
    distances — ranking AND values must match brute force."""
    ids, X = _vectors(n=120, d=16, seed=11)
    ds = _mk_ds(ids, X, n_blocks=5)
    coarse, books, codes = ivfpq_build(
        ds, coarse_k=4, m=2, k=120, iters=0, coarse_iters=2)
    codes = codes.materialize()
    q = X[:3]
    out = ivfpq_topk(codes, coarse, books, q, k=5, nprobe=4).to_pandas()
    qX = np.rint(X * 1e6).astype(np.int64)
    qq = np.rint(q * 1e6).astype(np.int64)
    for qi in range(3):
        d2 = ((qX - qq[qi]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))[:5]
        sub = out[out.query_id == qi].sort_values("rank")
        assert sub["vec_id"].tolist() == ids[order].tolist()
        assert sub["adc_dist"].tolist() == d2[order].tolist()


def test_ivfpq_planted_recall_and_partition_invariance():
    ids, X = _vectors(n=200, d=16, seed=13)
    ds = _mk_ds(ids, X, n_blocks=4)
    coarse, books, codes = ivfpq_build(
        ds, coarse_k=8, m=4, k=16, iters=4, coarse_iters=3)
    codes = codes.materialize()
    src = [5, 77, 140]
    q = X[src] + 1e-4
    out = ivfpq_topk(codes, coarse, books, q, k=3, nprobe=2).to_pandas()
    top1 = out[out["rank"] == 0].sort_values("query_id")["vec_id"].tolist()
    assert top1 == src
    out_b = ivfpq_topk(codes.repartition(13), coarse, books, q,
                       k=3, nprobe=2).to_pandas()
    assert out.equals(out_b)
    # build itself is partition-invariant
    c2, b2, codes2 = ivfpq_build(
        _mk_ds(ids, X, n_blocks=11), coarse_k=8, m=4, k=16, iters=4,
        coarse_iters=3)
    np.testing.assert_array_equal(coarse, c2)
    np.testing.assert_array_equal(books, b2)


def test_ivfpq_nprobe_monotone():
    """More probes can only improve (never worsen) the best distance found
    per query — the IVF contract."""
    ids, X = _vectors(n=150, d=16, seed=17)
    ds = _mk_ds(ids, X)
    coarse, books, codes = ivfpq_build(
        ds, coarse_k=8, m=4, k=16, iters=3, coarse_iters=3)
    codes = codes.materialize()
    q = X[10:13] + 2e-3
    best = None
    for nprobe in (1, 2, 8):
        out = ivfpq_topk(codes, coarse, books, q, k=1,
                         nprobe=nprobe).to_pandas()
        cur = out.set_index("query_id")["adc_dist"]
        if best is not None:
            assert (cur <= best.reindex(cur.index).fillna(np.inf)).all()
        best = cur
