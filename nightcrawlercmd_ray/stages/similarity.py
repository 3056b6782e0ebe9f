"""Similarity search over an embedding column (``list<float>``).

Engine addition for training-data pipelines (no counterpart in the reference):

- ``knn_brute_force`` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul, per-batch top-k partials
  are reduced driver-side (k × n_queries is tiny). The scale baseline.
- ``knn_ivf`` — IVF-style scale path: k-means coarse centroids (trained on a
  sample), vectors bucketed by nearest centroid via ONE groupby shuffle;
  queries probe only ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)


def knn_brute_force(
    ds,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k for each query row. → Table(query_id, rank, vec_id,
    score), deterministic ties broken by (−score, vec_id)."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)

    def partial_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = _normalize(np.array(t.column(vec_col).to_pylist(), dtype=np.float32))
        ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
        sims = qm @ vecs.T  # (n_q, n_batch)
        n_take = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        # per-query batch-local top-k (argpartition → exact order later)
        part = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
        for qi in range(sims.shape[0]):
            for j in part[qi]:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float32()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(r["query_id"], []),
            (r["score"], -r["vec_id"], r["vec_id"]),
        )
        if len(heaps[r["query_id"]]) > k:
            heapq.heappop(heaps[r["query_id"]])
    out_q, out_rank, out_id, out_s = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda x: (-x[0], x[2]))
        for rank, (s, _, vid) in enumerate(best):
            out_q.append(qi)
            out_rank.append(rank)
            out_id.append(vid)
            out_s.append(s)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int32()),
            "rank": pa.array(out_rank, pa.int32()),
            "vec_id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float32()),
        }
    )


def train_centroids(ds, *, vec_col: str = "embedding", n_centroids: int = 16,
                    sample_frac: float = 0.2, iters: int = 10, seed: int = 7,
                    max_train: int = 65536) -> np.ndarray:
    """k-means on a BOUNDED sample: ``random_sample`` for spread, then
    ``limit(max_train)`` so the driver never holds more than ``max_train``
    vectors regardless of corpus size (r2 verdict #5: a frac-only sample is
    a driver OOM at 100 TB). Lloyd's steps are fully vectorized
    (``np.add.at`` scatter — no per-centroid Python loop)."""
    sample = (
        ds.random_sample(sample_frac, seed=seed).limit(int(max_train)).take_all()
    )
    x = _normalize(np.array([r[vec_col] for r in sample], dtype=np.float32))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        sums = np.zeros(cents.shape, dtype=np.float64)
        np.add.at(sums, assign, x.astype(np.float64))
        counts = np.bincount(assign, minlength=len(cents))
        nz = counts > 0  # empty clusters keep their previous centroid
        cents[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
        cents = _normalize(cents)
    return cents


def knn_ivf(
    ds,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int | None = None,
    nprobe: int = 4,
    seed: int = 7,
    n_rows: int | None = None,
    rows_per_group: int = 65536,
) -> pa.Table:
    """IVF top-k: bucket by nearest centroid (one shuffle, reusable), then
    search only the ``nprobe`` closest buckets per query.

    Scale shape (r2 verdict #5 fixes): ``n_centroids`` defaults to
    ~sqrt(corpus) so buckets stay small as the corpus grows; the shuffle key
    is ``(bucket, sub)`` with enough id-hash sub-splits that NO group ever
    materializes more than ~``rows_per_group`` vectors (a bucket's
    sub-partitions are searched independently and merged by the driver-side
    top-k fold, which is exact); group work is pure pyarrow/numpy."""
    if n_rows is None:
        n_rows = ds.count()
    if n_centroids is None:
        n_centroids = int(min(1 << 16, max(16, round(np.sqrt(n_rows)))))
    cents = train_centroids(ds, vec_col=vec_col, n_centroids=n_centroids, seed=seed)
    cents_ref = ray.put(cents)
    # expected bucket size n/n_centroids, sub-split to bound group memory
    n_sub = max(1, -(-n_rows // max(1, len(cents)) // rows_per_group))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        vecs = _normalize(np.array(t.column(vec_col).to_pylist(), dtype=np.float32))
        bucket = np.argmax(vecs @ c.T, axis=1).astype(np.int64)
        if n_sub > 1:
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
            sub = ((ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
                % np.uint64(n_sub)
            bucket = bucket * n_sub + sub.astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket))

    bucketed = ds.map_batches(assign, batch_format="pyarrow")
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    # invert: bucket -> queries probing it (sub-splits share the bucket's list)
    by_bucket: dict[int, list[int]] = {}
    for qi, bs in enumerate(probe):
        for b in bs:
            by_bucket.setdefault(int(b), []).append(qi)
    by_bucket_ref = ray.put(by_bucket)
    q_ref = ray.put(q)

    def bucket_topk(g: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int32()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float32())})
        b = int(g.column("_bucket")[0].as_py()) // n_sub
        probers = ray.get(by_bucket_ref).get(b, [])
        if not probers:
            return empty
        qm = ray.get(q_ref)[probers]
        vecs = _normalize(np.array(g.column(vec_col).to_pylist(), dtype=np.float32))
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = qm @ vecs.T
        n_take = min(k, sims.shape[1])
        part = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
        qidx = np.repeat(np.asarray(probers, dtype=np.int32), n_take)
        flat = part.reshape(-1)
        return pa.table({
            "query_id": pa.array(qidx),
            "vec_id": pa.array(ids[flat]),
            "score": pa.array(
                np.take_along_axis(sims, part, axis=1).reshape(-1)
                .astype(np.float32)),
        })

    partials = bucketed.groupby("_bucket").map_groups(
        bucket_topk, batch_format="pyarrow"
    ).take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(int(r["query_id"]), []),
            (r["score"], -int(r["vec_id"]), int(r["vec_id"])),
        )
        if len(heaps[int(r["query_id"])]) > k:
            heapq.heappop(heaps[int(r["query_id"])])
    out_q, out_rank, out_id, out_s = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda x: (-x[0], x[2]))
        for rank, (s, _, vid) in enumerate(best):
            out_q.append(qi)
            out_rank.append(rank)
            out_id.append(vid)
            out_s.append(s)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int32()),
            "rank": pa.array(out_rank, pa.int32()),
            "vec_id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float32()),
        }
    )


def group_vector_sums(
    ds,
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
    quant: float = 1e6,
):
    """Grouped vector aggregate — the distributed centroid computation
    (k-means/IVF building block, class-prototype extraction): per-group
    component-wise sums of the embedding column plus counts; centroid =
    qsum / (quant·n). Components are quantized to int64 (``round(x·quant)``)
    BEFORE summation so the result is exactly associative — identical at
    any parallelism and SQL-oracle-able bit-for-bit (float summation order
    would not be).

    Scale shape: per-batch numpy combiner reduces each block to
    |labels × dim| partial rows (long form: group, dim, qsum, n) → ONE
    small ``groupby(group, dim)`` shuffle.
    → Dataset(group_col, dim [1-based], qsum, n).
    """

    def partial(t: pa.Table) -> pa.Table:
        labels = t.column(group_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        if vecs.size == 0:
            return pa.table({
                group_col: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "qsum": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        q = np.round(vecs * quant).astype(np.int64)
        dim = q.shape[1]
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        g = np.repeat(uniq.astype(np.int64), dim)
        d = np.tile(np.arange(1, dim + 1, dtype=np.int64), len(uniq))
        return pa.table({
            group_col: pa.array(g),
            "dim": pa.array(d),
            "qsum": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(counts, dim)),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(Sum("qsum", alias_name="qsum"), Sum("n", alias_name="n"))
    )


def embedding_moments(ds, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", quant: float = 1e4):
    """First+second moment sums of the embedding column, integer-exact —
    the one-shuffle statistics pass PCA / whitening / covariance analysis is
    built on. Components are quantized to int64 (``round(x·quant)``) BEFORE
    any summation, so results are exactly associative (identical at any
    parallelism) and bit-comparable to a SQL oracle. int64 headroom: with
    |x| ≤ 0.5 and quant=1e4 the per-pair product is ≤ 2.5e7, so sums stay
    exact past 3×10^11 rows — raise/lower ``quant`` to trade precision for
    headroom and document the bound at the call site.

    Output (long form, 1-based dims): rows
      (i, j, qs)  i ≤ j  — Σ q_i·q_j   (upper-triangle second moments)
      (i, 0, qs)         — Σ q_i        (first moments)
      (0, 0, n)          — row count.

    Scale shape: per-batch numpy ``X.T @ X`` combiner reduces each block to
    d(d+1)/2 + d + 1 rows → ONE tiny groupby(i, j) shuffle; nothing
    row-count-sized ever crosses the network. → Dataset(i, j, qs).
    """

    def partial(t: pa.Table) -> pa.Table:
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        if vecs.size == 0:
            z = pa.array([], pa.int64())
            return pa.table({"i": z, "j": z, "qs": z})
        q = np.rint(vecs * quant).astype(np.int64)
        d = q.shape[1]
        s2 = q.T @ q  # int64 matmul, exact within the documented bound
        iu, ju = np.triu_indices(d)
        i_rows = np.concatenate([iu + 1, np.arange(1, d + 1), [0]])
        j_rows = np.concatenate([ju + 1, np.zeros(d, np.int64), [0]])
        qs_rows = np.concatenate([s2[iu, ju], q.sum(axis=0), [q.shape[0]]])
        return pa.table({
            "i": pa.array(i_rows.astype(np.int64)),
            "j": pa.array(j_rows.astype(np.int64)),
            "qs": pa.array(qs_rows.astype(np.int64)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .sum("qs")
        .map_batches(lambda t: t.rename_columns(["i", "j", "qs"]),
                     batch_format="pyarrow")
    )


def _eig_from_moments(rows, quant: float, n_components: int):
    """Driver-side finish: moment rows → (mean[d], components[d,k]).
    Deterministic: covariance is integer-exact, eigh of a fixed matrix, and
    each eigenvector's sign is normalized (largest-|entry| made positive,
    first index on ties)."""
    second = {(r["i"], r["j"]): r["qs"] for r in rows}
    n = int(second.pop((0, 0)))
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    d = max(i for i, j in second if j == 0)
    s1 = np.array([second.pop((i, 0)) for i in range(1, d + 1)], dtype=np.float64)
    C = np.zeros((d, d), dtype=np.float64)
    for (i, j), v in second.items():
        C[i - 1, j - 1] = v
        C[j - 1, i - 1] = v
    # covariance from integer sums: (S2 - outer(s1,s1)/n) / ((n-1)·quant²)
    C = (C - np.outer(s1, s1) / n) / ((n - 1) * quant * quant)
    mean = s1 / (n * quant)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order]
    for c in range(comps.shape[1]):
        col = comps[:, c]
        piv = int(np.argmax(np.abs(col)))
        if col[piv] < 0:
            comps[:, c] = -col
    return mean, comps, w[order]


def pca_embeddings(ds, *, n_components: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id", quant: float = 1e4):
    """Distributed PCA over the embedding column: integer-exact moment pass
    (``embedding_moments``, ONE tiny shuffle) → driver eigendecomposition of
    the d×d covariance (d² floats — microscopic at any corpus size) →
    broadcast (mean, components) → pure projection map. The corpus is
    touched exactly twice and never materialized; everything driver-side is
    O(d²), independent of row count.

    Output: (id_col, pc1..pcK float64) — bit-deterministic at any
    partitioning (the moment pass is integer-exact, the projection is
    per-row float math on identical inputs).
    """
    moment_rows = embedding_moments(
        ds, vec_col=vec_col, id_col=id_col, quant=quant
    ).take_all()  # d(d+1)/2 + d + 1 rows — bounded by dimension, not corpus
    mean, comps, _ = _eig_from_moments(moment_rows, quant, n_components)
    mean_ref = ray.put(mean)
    comp_ref = ray.put(comps)

    def project(t: pa.Table) -> pa.Table:
        m = ray.get(mean_ref)
        W = ray.get(comp_ref)
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        out = {id_col: t.column(id_col)}
        proj = np.zeros((len(t), W.shape[1]), dtype=np.float64)
        if vecs.size:
            # fixed dimension-order accumulation with elementwise kernels:
            # BLAS dgemm blocks by matrix SHAPE, so (X-m)@W drifts by ULPs
            # between batch sizes — this loop is bit-identical at any layout
            for kdim in range(W.shape[0]):
                proj += (vecs[:, kdim] - m[kdim])[:, None] * W[kdim]
        for c in range(W.shape[1]):
            out[f"pc{c + 1}"] = pa.array(proj[:, c], pa.float64())
        return pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# full-corpus k-means + SemDeDup
# --------------------------------------------------------------------------- #

def _quantize_unit(vecs: np.ndarray, quant: float) -> np.ndarray:
    """Per-row L2-normalize in float64, then quantize to int64. Every op is
    per-row (no cross-row BLAS accumulation), so the result is bit-identical
    at any batch shape / partitioning — the foundation of the exactness
    guarantees below. Zero vectors map to zero."""
    norms = np.sqrt((vecs * vecs).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return np.rint(vecs / norms * quant).astype(np.int64)


def kmeans_embeddings(ds, *, k: int = 16, iters: int = 8,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      quant: float = 1e6, keep_vec: bool = False,
                      materialize_input: bool = True):
    """Full-corpus spherical k-means (Lloyd's), deterministic at ANY
    parallelism — unlike ``train_centroids`` (a sampled, driver-local
    trainer for IVF bucketing), this is the distributed clustering operator
    itself (the SemDeDup / semantic-curation building block).

    Exactness design (why it is parallelism-invariant, which float k-means
    is not):
    - assignment scores are INTEGER dot products ``q(x) · q(c)`` of
      per-row-normalized quantized vectors (``_quantize_unit``) — int64
      matmul is exact and associative, so no BLAS batch-shape ULP drift
      (the pca_embeddings lesson); argmax ties break to the lowest
      cluster index;
    - centroid updates sum the SAME quantized vectors (integer, exactly
      associative) via a (cluster, dim)-keyed shuffle of per-batch
      combiner partials — ≤ k·d rows cross the network per iteration;
    - the driver renormalizes (float64 on identical inputs) and broadcasts
      re-quantized centroids for the next round. Empty clusters keep their
      previous centroid.
    - init: the k vectors with the smallest ``(knuth_hash(id), id)`` — a
      deterministic spread sample, no RNG stream.

    int64 headroom: |q| ≤ quant=1e6 ⇒ per-dim product ≤ 1e12, a d=1024 dot
    ≤ 1e15; centroid qsums stay exact past 9×10^12 rows/cluster.

    Each iteration is one pass + one k·d-row shuffle. With
    ``materialize_input`` (default) the PROJECTED (id, vec) columns are
    materialized into the object store once, so Lloyd's iterations re-read
    cached blocks instead of re-executing the upstream pipeline
    (parquet scan, planted maps, …) ``iters``+2 times — the standard Ray
    Data iteration pattern; blocks spill to disk rather than pinning
    memory. Pass False to keep the fully streaming re-execution when the
    projected input is larger than cluster storage.
    → (centroids float64 (k,d) ndarray,
    Dataset(id_col, cluster, qsim) final assignments).
    """
    from ray.data.aggregate import Sum

    from .sampling import hash_u32

    kk = int(k)
    cols = [id_col, vec_col]
    names = ds.schema().names
    if set(cols) <= set(names) and sorted(names) != sorted(cols):
        ds = ds.select_columns(cols)  # prune before caching/iterating
    if materialize_input:
        ds = ds.materialize()

    def local_init(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        h = hash_u32(ids).astype(np.int64)
        order = np.lexsort((ids, h))[:kk]
        return pa.table({
            id_col: pa.array(ids[order]),
            "_h": pa.array(h[order]),
            vec_col: t.column(vec_col).take(pa.array(order)),
        })

    seeds = (
        ds.map_batches(local_init, batch_format="pyarrow")
        .sort(["_h", id_col]).limit(kk).take_all()
    )
    x0 = np.asarray([r[vec_col] for r in seeds], dtype=np.float64)
    cents = x0 / np.maximum(np.sqrt((x0 * x0).sum(axis=1, keepdims=True)), 1e-300)
    k_eff, d = cents.shape

    for _ in range(int(iters)):
        qc = np.rint(cents * quant).astype(np.int64)
        qc_ref = ray.put(qc)

        def partial_sums(t: pa.Table) -> pa.Table:
            # sparse long form: only NONZERO qsum cells plus one count row
            # per non-empty cluster (_dim = -1) cross the network — absent
            # cells default to 0 in the driver fold, so a batch touching
            # few clusters ships few rows instead of always k·d
            qcm = ray.get(qc_ref)
            vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
            if vecs.size == 0:
                z = pa.array([], pa.int64())
                return pa.table({"_c": z, "_dim": z, "_v": z})
            qx = _quantize_unit(vecs, quant)
            a = np.argmax(qx @ qcm.T, axis=1)
            sums = np.zeros((len(qcm), qx.shape[1]), dtype=np.int64)
            np.add.at(sums, a, qx)
            counts = np.bincount(a, minlength=len(qcm)).astype(np.int64)
            flat = sums.reshape(-1)
            nz = np.flatnonzero(flat)
            live = np.flatnonzero(counts)
            return pa.table({
                "_c": pa.array(np.concatenate([nz // qx.shape[1], live])),
                "_dim": pa.array(np.concatenate(
                    [nz % qx.shape[1],
                     np.full(len(live), -1, dtype=np.int64)])),
                "_v": pa.array(np.concatenate([flat[nz], counts[live]])),
            })

        rows = (
            ds.map_batches(partial_sums, batch_format="pyarrow")
            .groupby(["_c", "_dim"])
            .aggregate(Sum("_v", alias_name="_v"))
            .take_all()
        )  # ≤ k·(d+1) rows by construction
        sums = np.zeros((k_eff, d), dtype=np.float64)
        counts = np.zeros(k_eff, dtype=np.int64)
        for r in rows:
            if r["_dim"] < 0:
                counts[r["_c"]] = r["_v"]
            else:
                sums[r["_c"], r["_dim"]] = r["_v"]
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] / (counts[nz, None] * quant)
        norms = np.sqrt((new * new).sum(axis=1, keepdims=True))
        norms[norms == 0] = 1.0
        cents = new / norms

    qc = np.rint(cents * quant).astype(np.int64)
    qc_ref = ray.put(qc)

    def final_assign(t: pa.Table) -> pa.Table:
        qcm = ray.get(qc_ref)
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        ids = pc.cast(t.column(id_col), pa.int64())
        if vecs.size == 0:
            a = np.zeros(0, dtype=np.int64)
            scores = np.zeros((0, len(qcm)), dtype=np.int64)
        else:
            qx = _quantize_unit(vecs, quant)
            scores = qx @ qcm.T
            a = np.argmax(scores, axis=1).astype(np.int64)
        cols = {id_col: ids,
                "cluster": pa.array(a),
                "qsim": pa.array(
                    scores[np.arange(len(a)), a].astype(np.int64)
                    if len(a) else np.zeros(0, np.int64))}
        if keep_vec:
            cols[vec_col] = t.column(vec_col)
        return pa.table(cols)

    return cents, ds.map_batches(final_assign, batch_format="pyarrow")


def semdedup(ds, *, threshold: float = 0.97, k: int | None = None,
             iters: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id", quant: float = 1e6,
             group_cap: int = 8192, n_rows: int | None = None,
             materialize_input: bool = True):
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal by
    clustering embeddings, then comparing pairs ONLY within a cluster —
    the k-means partition turns the O(n²) all-pairs problem into
    Σ O(|cluster|²) with |cluster| ≈ n/k.

    A row is a duplicate iff some SAME-CLUSTER row with a smaller id has
    quantized cosine ≥ threshold (``dup_of`` = the smallest such id) — the
    keep-lowest-id greedy, deterministic at any parallelism because both
    the clustering (``kmeans_embeddings``) and the integer similarity are.

    Scale shape: k defaults to ~sqrt(n) so expected cluster size is
    ~sqrt(n); the per-cluster work is one int64 matmul. Clusters larger
    than ``group_cap`` (degenerate corpora) fall back to an O(|cluster|)
    rep-only verify against the min-id member — recall loss is confined to
    that cluster and the cap event is the signal to raise k. Candidates
    within a cluster never leave it: ONE cluster-keyed shuffle total.
    → Dataset(id_col, dup_of, cluster), the duplicate rows only.
    """
    if n_rows is None:
        n_rows = ds.count()
    if k is None:
        k = int(min(1 << 16, max(4, round(np.sqrt(max(1, n_rows))))))
    thr_q = int(round(threshold * quant * quant))

    _, with_vec = kmeans_embeddings(
        ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col, quant=quant,
        keep_vec=True, materialize_input=materialize_input,
    )

    def find_dups(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = np.asarray(g.column(vec_col).take(pa.array(order)).to_pylist(),
                          dtype=np.float64)
        qx = _quantize_unit(vecs, quant)
        cluster = int(g.column("cluster")[0].as_py())
        n = len(ids)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "dup_of": pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64())})
        if n < 2:
            return empty
        if n > group_cap:
            # degenerate hot cluster: rep-only verify, O(n) not O(n²)
            sims = qx @ qx[0]
            dup = (sims >= thr_q) & (ids != ids[0])
            src = ids[dup]
            return pa.table({
                id_col: pa.array(src),
                "dup_of": pa.array(np.full(len(src), ids[0], dtype=np.int64)),
                "cluster": pa.array(np.full(len(src), cluster, np.int64)),
            })
        sims = qx @ qx.T
        hit = sims >= thr_q
        hit[np.tril_indices(n)] = False  # j>i only: ids sorted → j has bigger id
        j_idx, found = hit.T.argmax(axis=1), hit.T.any(axis=1)
        # for each column j (the later id), the FIRST i with a hit is the
        # smallest similar id (rows sorted ascending)
        src = ids[found]
        dup_of = ids[j_idx[found]]
        return pa.table({
            id_col: pa.array(src),
            "dup_of": pa.array(dup_of),
            "cluster": pa.array(np.full(len(src), cluster, np.int64)),
        })

    return with_vec.groupby("cluster").map_groups(
        find_dups, batch_format="pyarrow"
    )


def jl_project(ds, *, out_dim: int = 8, vec_col: str = "embedding",
               id_col: str = "vec_id", quant: float = 1e4):
    """Johnson–Lindenstrauss random projection (Achlioptas 2003 ±1 variant)
    — the dimensionality-reduction step in front of ANN / clustering at
    scale. The sign matrix is NOT stored or broadcast: entry (i, j) is a
    pure hash ``+1 if ((i·K + j)·2654435761) mod 2^32 < 2^31 else −1``
    (i = 1-based input dim, j = 0-based output dim) — the HIGH bit of the
    Knuth hash: the low bit would be parity of (i·K + j) because the
    multiplier is odd, collapsing the matrix to per-column constants. Every
    worker regenerates the matrix identically, so the operator is a
    stateless per-batch map with zero shuffle.

    Components are quantized to int64 (``round(x·quant)``) BEFORE the
    matmul, so projections are integer-exact — identical at any
    parallelism and SQL-replicable (``generate_subscripts`` + ``unnest`` +
    conditional sign sum). int64 headroom: |q| ≤ quant and d dims give
    |y| ≤ d·quant — exact far past d = 10^6.

    → Dataset(id_col, j, y) long form: output component j ∈ [0, out_dim).
    """
    K = int(out_dim)

    def project(t: pa.Table) -> pa.Table:
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if vecs.size == 0:
            z = pa.array([], pa.int64())
            return pa.table({id_col: z, "j": z, "y": z})
        q = np.rint(vecs * quant).astype(np.int64)
        d = q.shape[1]
        i_idx = np.arange(1, d + 1, dtype=np.uint64)[:, None]
        j_idx = np.arange(K, dtype=np.uint64)[None, :]
        h = ((i_idx * np.uint64(K) + j_idx) * np.uint64(2654435761)) \
            & np.uint64(0xFFFFFFFF)
        S = np.where(h < np.uint64(1 << 31), 1, -1).astype(np.int64)  # (d, K)
        y = q @ S  # exact int64
        return pa.table({
            id_col: pa.array(np.repeat(ids, K)),
            "j": pa.array(np.tile(np.arange(K, dtype=np.int64), len(ids))),
            "y": pa.array(y.reshape(-1)),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def hard_negatives(ds, query_table: pa.Table, *, vec_col: str = "embedding",
                   id_col: str = "vec_id", label_col: str = "label",
                   quant: float = 1e4) -> pa.Table:
    """Hard-negative mining for contrastive training (the DPR / SimCSE
    data-prep step): for each query vector, the corpus row with the
    HIGHEST inner product among rows of a DIFFERENT label (and different
    id). Scores are integer dot products of ``round(x·quant)`` components
    (raw, not unit-normalized — MIPS semantics), so results are exact,
    parallelism-invariant, and SQL-replicable via the
    ``generate_subscripts`` join (the embedding_moments pattern; a unit
    normalization would re-introduce float sum-order ULPs).

    Scale shape: the query matrix (``query_table``: id, label, vec — a
    bounded training batch) is broadcast once; each data batch does ONE
    int64 matmul + masked argmax and emits ≤ |queries| candidate rows; the
    driver folds blocks×|queries| rows. Zero shuffle.
    → Table(query_id, neg_id, dot), ties broken by smallest neg_id.
    """
    q_ids = np.asarray(query_table.column(id_col).to_pylist(), dtype=np.int64)
    q_labels = np.asarray(query_table.column(label_col).to_pylist(),
                          dtype=np.int64)
    q_mat = np.rint(np.asarray(query_table.column(vec_col).to_pylist(),
                               dtype=np.float64) * quant).astype(np.int64)
    q_ref = ray.put((q_ids, q_labels, q_mat))

    def local_best(t: pa.Table) -> pa.Table:
        qi, ql, qm = ray.get(q_ref)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        labels = pc.cast(t.column(label_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neg_id": pa.array([], pa.int64()),
                          "dot": pa.array([], pa.int64())})
        if vecs.size == 0:
            return empty
        x = np.rint(vecs * quant).astype(np.int64)
        dots = qm @ x.T  # (n_q, n_batch) exact int64
        ok = (ql[:, None] != labels[None, :]) & (qi[:, None] != ids[None, :])
        out_q, out_id, out_dot = [], [], []
        for k in range(len(qi)):
            m = ok[k]
            if not m.any():
                continue
            d = dots[k]
            # max dot, ties to smallest candidate id — vectorized
            cand = np.flatnonzero(m)
            dd = d[cand]
            best = dd.max()
            winners = cand[dd == best]
            j = winners[np.argmin(ids[winners])]
            out_q.append(qi[k])
            out_id.append(int(ids[j]))
            out_dot.append(int(d[j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neg_id": pa.array(out_id, pa.int64()),
                         "dot": pa.array(out_dot, pa.int64())})

    rows = ds.map_batches(local_best, batch_format="pyarrow").take_all()
    best: dict[int, tuple[int, int]] = {}
    for r in rows:
        cur = best.get(r["query_id"])
        key = (-r["dot"], r["neg_id"])
        if cur is None or key < cur:
            best[r["query_id"]] = key
    return pa.table({
        "query_id": pa.array(sorted(best), pa.int64()),
        "neg_id": pa.array([best[q][1] for q in sorted(best)], pa.int64()),
        "dot": pa.array([-best[q][0] for q in sorted(best)], pa.int64()),
    })


def nearest_centroid_classify(ds, *, label_col: str = "label",
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              cent_quant: float = 1e6,
                              vec_quant: float = 1e4):
    """Nearest-centroid (Rocchio) classification — the label-propagation /
    weak-supervision pass: build per-label mean vectors, assign every row
    to the label whose centroid has the highest mean inner product.

    Exactness: centroids come from ``group_vector_sums`` (quantized int64
    component sums — exactly associative); scores are
    ``(qx · qsum_l) / n_l`` where the dot is exact int64 and the single
    IEEE division of exact ints is bit-identical across engines, so the
    whole operator is SQL-replicable. int64/double headroom: |dot| ≤
    d·vec_quant·cent_quant·n_l — keep below 2^53 (documented; holds to
    ~10^7 rows/label at d=64 with the defaults).

    Scale shape: ONE (label, dim)-keyed shuffle bounded by |labels|·d for
    the centroids (driver pull bounded the same), broadcast, then a pure
    per-batch matmul+argmax map. Ties break to the smallest label.
    → Dataset(id_col, label_col, pred_label, correct).
    """
    cents_rows = group_vector_sums(
        ds.select_columns([label_col, vec_col]),
        group_col=label_col, vec_col=vec_col, quant=cent_quant,
    ).take_all()  # ≤ |labels|·d rows by construction
    labels = sorted({r[label_col] for r in cents_rows})
    lab_idx = {l: i for i, l in enumerate(labels)}
    d = max(r["dim"] for r in cents_rows)
    qsum = np.zeros((len(labels), d), dtype=np.int64)
    n_l = np.zeros(len(labels), dtype=np.int64)
    for r in cents_rows:
        qsum[lab_idx[r[label_col]], r["dim"] - 1] = r["qsum"]
        n_l[lab_idx[r[label_col]]] = r["n"]
    model_ref = ray.put((np.asarray(labels, dtype=np.int64), qsum, n_l))

    def classify(t: pa.Table) -> pa.Table:
        labs, qs, nl = ray.get(model_ref)
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        true = pc.cast(t.column(label_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ids = pc.cast(t.column(id_col), pa.int64())
        if vecs.size == 0:
            pred = np.zeros(0, dtype=np.int64)
        else:
            qx = np.rint(vecs * vec_quant).astype(np.int64)
            scores = (qx @ qs.T).astype(np.float64) / nl.astype(np.float64)
            pred = labs[np.argmax(scores, axis=1)]
        return pa.table({
            id_col: ids,
            label_col: pa.array(true),
            "pred_label": pa.array(pred),
            "correct": pa.array(pred == true),
        })

    return ds.map_batches(classify, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# product quantization (PQ) — the memory-bound ANN scale path
# --------------------------------------------------------------------------- #
def pq_train(ds, *, m: int = 8, k: int = 16, iters: int = 6,
             vec_col: str = "embedding", id_col: str = "vec_id",
             quant: float = 1e6, materialize_input: bool = True) -> np.ndarray:
    """Train product-quantization codebooks (Jégou, Douze & Schmid, TPAMI
    2011): split the ``d`` dimensions into ``m`` contiguous subspaces and run
    k-means with ``k`` codewords INDEPENDENTLY in each — all ``m`` trainings
    share every corpus pass (one scan + one ≤ k·(d+m)-row shuffle per Lloyd's
    iteration, not ``m`` scans). At 10^10 vectors the encoded corpus is
    ``m`` bytes/vector (vs 4·d float32), which is what lets the ANN index
    stay in cluster RAM — the scale rationale.

    Determinism (the ``kmeans_embeddings`` design, adapted to L2): raw
    subvectors are quantized to int64 (``rint(x·quant)``); assignment is
    ``argmin(‖c‖² − 2·x·c)`` in EXACT integer arithmetic (the dropped ‖x‖²
    is constant per row), ties to the lowest codeword index; updates sum the
    same int64 subvectors through a (subspace, codeword, dim)-keyed combiner
    shuffle; the driver renormalizes and re-broadcasts. Init: the ``k``
    vectors with smallest ``(knuth_hash(id), id)``, split across subspaces —
    no RNG. Bit-identical at any partitioning.

    → float64 codebooks of shape ``(m, k_eff, d/m)``.
    """
    from ray.data.aggregate import Sum

    from .sampling import hash_u32

    cols = [id_col, vec_col]
    names = ds.schema().names
    if set(cols) <= set(names) and sorted(names) != sorted(cols):
        ds = ds.select_columns(cols)
    if materialize_input:
        ds = ds.materialize()

    kk = int(k)

    def local_init(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        h = hash_u32(ids).astype(np.int64)
        order = np.lexsort((ids, h))[:kk]
        return pa.table({
            id_col: pa.array(ids[order]),
            "_h": pa.array(h[order]),
            vec_col: t.column(vec_col).take(pa.array(order)),
        })

    seeds = (
        ds.map_batches(local_init, batch_format="pyarrow")
        .sort(["_h", id_col]).limit(kk).take_all()
    )
    x0 = np.asarray([r[vec_col] for r in seeds], dtype=np.float64)
    k_eff, d = x0.shape
    if d % int(m):
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // int(m)
    # (m, k_eff, dsub): subspace s's codebook init = seed rows' s-th slice
    books = np.ascontiguousarray(
        x0.reshape(k_eff, m, dsub).transpose(1, 0, 2))

    for _ in range(int(iters)):
        qb = np.rint(books * quant).astype(np.int64)  # (m, k, dsub)
        qb_ref = ray.put(qb)

        def partial_sums(t: pa.Table) -> pa.Table:
            qbm = ray.get(qb_ref)
            mm, kc, dsb = qbm.shape
            vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
            if vecs.size == 0:
                z = pa.array([], pa.int64())
                return pa.table({"_s": z, "_c": z, "_dim": z, "_v": z})
            qx = np.rint(vecs * quant).astype(np.int64).reshape(
                len(vecs), mm, dsb)
            cnorm = (qbm * qbm).sum(axis=2)  # (m, k) exact int64
            sums = np.zeros((mm, kc, dsb), dtype=np.int64)
            counts = np.zeros((mm, kc), dtype=np.int64)
            for s in range(mm):
                # exact-integer L2 argmin; np.argmin ties → lowest index
                a = np.argmin(cnorm[s] - 2 * (qx[:, s, :] @ qbm[s].T), axis=1)
                np.add.at(sums[s], a, qx[:, s, :])
                counts[s] += np.bincount(a, minlength=kc)
            flat = sums.reshape(-1)
            nz = np.flatnonzero(flat)
            live = np.flatnonzero(counts.reshape(-1))
            return pa.table({
                "_s": pa.array(np.concatenate(
                    [nz // (kc * dsb), live // kc])),
                "_c": pa.array(np.concatenate(
                    [(nz // dsb) % kc, live % kc])),
                "_dim": pa.array(np.concatenate(
                    [nz % dsb, np.full(len(live), -1, dtype=np.int64)])),
                "_v": pa.array(np.concatenate(
                    [flat[nz], counts.reshape(-1)[live]])),
            })

        rows = (
            ds.map_batches(partial_sums, batch_format="pyarrow")
            .groupby(["_s", "_c", "_dim"])
            .aggregate(Sum("_v", alias_name="_v"))
            .take_all()
        )  # ≤ m·k·(dsub+1) = k·(d+m) rows by construction
        sums = np.zeros((m, k_eff, dsub), dtype=np.float64)
        counts = np.zeros((m, k_eff), dtype=np.int64)
        for r in rows:
            if r["_dim"] < 0:
                counts[r["_s"], r["_c"]] = r["_v"]
            else:
                sums[r["_s"], r["_c"], r["_dim"]] = r["_v"]
        nzm = counts > 0  # empty codewords keep their previous value
        books = books.copy()
        books[nzm] = sums[nzm] / (counts[nzm, None] * quant)
    return books


def pq_encode(ds, books: np.ndarray, *, vec_col: str = "embedding",
              id_col: str = "vec_id", quant: float = 1e6,
              keep_cols: list[str] | None = None):
    """Encode every vector to its ``m`` nearest-codeword indices (uint8 —
    ``k ≤ 256`` by design). Pure map, zero shuffle; the broadcast is the
    codebook (m·k·d/m floats). ``keep_cols`` pass through unchanged
    (e.g. an IVF bucket id). → Dataset(id_col, *keep_cols,
    codes list<uint8>)."""
    qb = np.rint(np.asarray(books, dtype=np.float64) * quant).astype(np.int64)
    if qb.shape[1] > 256:
        raise ValueError("PQ codes are uint8: k must be ≤ 256")
    qb_ref = ray.put(qb)

    def encode(t: pa.Table) -> pa.Table:
        qbm = ray.get(qb_ref)
        mm, kc, dsb = qbm.shape
        ids = pc.cast(t.column(id_col), pa.int64())
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        if vecs.size == 0:
            codes = np.zeros((0, mm), dtype=np.uint8)
        else:
            qx = np.rint(vecs * quant).astype(np.int64).reshape(
                len(vecs), mm, dsb)
            cnorm = (qbm * qbm).sum(axis=2)
            codes = np.empty((len(vecs), mm), dtype=np.uint8)
            for s in range(mm):
                codes[:, s] = np.argmin(
                    cnorm[s] - 2 * (qx[:, s, :] @ qbm[s].T), axis=1)
        out = {id_col: ids}
        for c in keep_cols or ():
            out[c] = t.column(c)
        out["codes"] = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), mm)
        return pa.table(out)

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(codes_ds, books: np.ndarray, queries: np.ndarray, *,
            k: int = 10, id_col: str = "vec_id",
            quant: float = 1e6) -> pa.Table:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: per query,
    an (m, k) integer lookup table of ``‖c‖² − 2·q_s·c`` (the dropped ‖q‖²
    is rank-invariant); each batch sums ``m`` table lookups per row — no
    float vector is ever touched after encoding, which is the whole point
    at 10^10 codes. Integer distances ⇒ deterministic ranking at any
    partitioning, ties by (distance, vec_id). → Table(query_id, rank,
    vec_id, adc_dist) — distances in the quantized integer metric."""
    qb = np.rint(np.asarray(books, dtype=np.float64) * quant).astype(np.int64)
    mm, kc, dsb = qb.shape
    q = np.rint(np.asarray(queries, dtype=np.float64) * quant).astype(np.int64)
    q = q.reshape(len(q), mm, dsb)
    cnorm = (qb * qb).sum(axis=2)  # (m, k)
    # (n_q, m, k) exact-integer ADC tables, broadcast once
    tables = np.stack(
        [cnorm[s] - 2 * (q[:, s, :] @ qb[s].T) for s in range(mm)], axis=1)
    t_ref = ray.put(tables)

    def partial_topk(t: pa.Table) -> pa.Table:
        tbl = ray.get(t_ref)  # (n_q, m, k)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        flat = t.column("codes").combine_chunks()
        codes = np.asarray(flat.flatten(), dtype=np.int64).reshape(len(ids), mm)
        if len(ids) == 0:
            z32 = pa.array([], pa.int32())
            return pa.table({"query_id": z32,
                             "vec_id": pa.array([], pa.int64()),
                             "adc_dist": pa.array([], pa.int64())})
        nq = tbl.shape[0]
        dist = np.zeros((nq, len(ids)), dtype=np.int64)
        for s in range(mm):
            dist += tbl[:, s, codes[:, s]]
        n_take = min(k, dist.shape[1])
        out_q, out_id, out_d = [], [], []
        for qi in range(nq):
            # lexsort, not argpartition: integer distances tie EXACTLY
            # (duplicate codes), and a distance-only cut keeps an
            # arbitrary k of the tied rows — the survivor set would then
            # depend on block layout, breaking partition invariance. The
            # (dist, vec_id) order pins the cut.
            take = np.lexsort((ids, dist[qi]))[:n_take]
            for j in take:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_d.append(int(dist[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int32()),
            "vec_id": pa.array(out_id, pa.int64()),
            "adc_dist": pa.array(out_d, pa.int64()),
        })

    partials = codes_ds.map_batches(
        partial_topk, batch_format="pyarrow").take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        # max-heap on (-dist, -vec_id): keep the k smallest (dist, vec_id)
        heapq.heappush(heaps.setdefault(r["query_id"], []),
                       (-r["adc_dist"], -r["vec_id"]))
        if len(heaps[r["query_id"]]) > k:
            heapq.heappop(heaps[r["query_id"]])
    out_q, out_rank, out_id, out_d = [], [], [], []
    for qi in sorted(heaps):
        best = sorted((-nd, -nv) for nd, nv in heaps[qi])
        for rank, (dist, vid) in enumerate(best):
            out_q.append(qi)
            out_rank.append(rank)
            out_id.append(vid)
            out_d.append(dist)
    return pa.table({
        "query_id": pa.array(out_q, pa.int32()),
        "rank": pa.array(out_rank, pa.int32()),
        "vec_id": pa.array(out_id, pa.int64()),
        "adc_dist": pa.array(out_d, pa.int64()),
    })


def ivfpq_build(ds, *, coarse_k: int = 16, m: int = 8, k: int = 16,
                coarse_iters: int = 4, iters: int = 6,
                vec_col: str = "embedding", id_col: str = "vec_id",
                quant: float = 1e6):
    """Build a faiss-style IVF-PQ index (coarse inverted lists + residual
    product codes — Jégou et al. 2011 §IV): the coarse quantizer is
    ``pq_train(m=1, k=coarse_k)`` — i.e. a FULL-CORPUS distributed
    integer-exact L2 k-means (not the sampled ``train_centroids``); each
    vector's residual is computed in INTEGER space (``q(x) − q(c_b)``,
    exact), and the PQ codebooks are trained on those residuals, sharing
    the one-pass-per-iteration shape throughout.

    → (coarse (coarse_k, d) float64,
       books (m, k, d/m) float64 residual codebooks,
       Dataset(id_col, bucket int64, codes list<uint8>)).

    Everything downstream of the two trainings is a pure map; the only
    exchanges are the trainings' ≤k·(d+m)-row combiner shuffles. The codes
    dataset is bucket+m bytes per vector — the RAM story at 10^10 vectors.

    Memory note: the residual dataset is materialized once (corpus-sized,
    like ``kmeans_embeddings``'s projected-input cache) so the residual
    training's iterations re-read object-store blocks instead of
    re-running the coarse assignment per pass; blocks spill to disk under
    pressure. If even spilled residuals are too large, drop the
    ``materialize()`` and recompute per pass — iterations × one extra map.
    """
    coarse = pq_train(ds, m=1, k=coarse_k, iters=coarse_iters,
                      vec_col=vec_col, id_col=id_col, quant=quant)[0]
    qcb = np.rint(coarse * quant).astype(np.int64)  # (ck, d)
    qcb_ref = ray.put(qcb)

    def to_residual(t: pa.Table) -> pa.Table:
        qc = ray.get(qcb_ref)
        ids = pc.cast(t.column(id_col), pa.int64())
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        if vecs.size == 0:
            return pa.table({
                id_col: ids,
                "_bucket": pa.array([], pa.int64()),
                "_res": pa.array([], pa.list_(pa.float64())),
            })
        qx = np.rint(vecs * quant).astype(np.int64)
        cn = (qc * qc).sum(axis=1)
        b = np.argmin(cn - 2 * (qx @ qc.T), axis=1)
        # integer residual scaled back to float: rint(res·quant) in pq_train
        # recovers the exact int (|res·quant| ≪ 2^53), so the whole chain
        # stays in exact integer arithmetic
        res = (qx - qc[b]) / quant
        return pa.table({
            id_col: ids,
            "_bucket": pa.array(b.astype(np.int64)),
            "_res": pa.array(res.tolist(), pa.list_(pa.float64())),
        })

    res_ds = ds.map_batches(to_residual, batch_format="pyarrow").materialize()
    books = pq_train(res_ds, m=m, k=k, iters=iters,
                     vec_col="_res", id_col=id_col, quant=quant,
                     materialize_input=False)
    codes_ds = pq_encode(
        res_ds, books, vec_col="_res", id_col=id_col, quant=quant,
        keep_cols=["_bucket"],
    ).map_batches(lambda t: t.rename_columns(
        ["bucket" if c == "_bucket" else c for c in t.column_names]),
        batch_format="pyarrow")
    return coarse, books, codes_ds


def ivfpq_topk(codes_ds, coarse: np.ndarray, books: np.ndarray,
               queries: np.ndarray, *, k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id", quant: float = 1e6) -> pa.Table:
    """ADC top-k over an IVF-PQ index: each query probes its ``nprobe``
    nearest coarse buckets; within a probed bucket the distance is the
    EXACT integer ``‖(q−c_b) − r_code‖²`` assembled from per-(query,
    bucket) lookup tables — floats never touched after encoding, rows
    outside probed buckets never scored. Deterministic ranking, ties by
    (distance, vec_id). → Table(query_id, rank, vec_id, adc_dist)."""
    qcb = np.rint(np.asarray(coarse, dtype=np.float64) * quant).astype(np.int64)
    qb = np.rint(np.asarray(books, dtype=np.float64) * quant).astype(np.int64)
    mm, kc, dsb = qb.shape
    q = np.rint(np.asarray(queries, dtype=np.float64) * quant).astype(np.int64)
    nq = len(q)
    cn = (qcb * qcb).sum(axis=1)
    probe = np.argsort(cn - 2 * (q @ qcb.T), axis=1, kind="stable")[:, :nprobe]
    rnorm = (qb * qb).sum(axis=2)  # (m, k)
    # per (query, probed bucket): g = q − c_b split into subspaces;
    # T[s, j] = ‖r‖² − 2 g_s·r_{s,j}; const = ‖g‖² added once
    tables = np.empty((nq, nprobe, mm, kc), dtype=np.int64)
    consts = np.empty((nq, nprobe), dtype=np.int64)
    for qi in range(nq):
        for pi, b in enumerate(probe[qi]):
            g = (q[qi] - qcb[b]).reshape(mm, dsb)
            consts[qi, pi] = int((g.astype(object) * g).sum())
            for s in range(mm):
                tables[qi, pi, s] = rnorm[s] - 2 * (qb[s] @ g[s])
    model_ref = ray.put((probe, tables, consts))

    def partial_topk(t: pa.Table) -> pa.Table:
        pr, tbl, cst = ray.get(model_ref)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        flat = t.column("codes").combine_chunks()
        codes = np.asarray(flat.flatten(), dtype=np.int64).reshape(
            len(ids), mm)
        out_q, out_id, out_d = [], [], []
        for qi in range(len(pr)):
            cand_d, cand_i = [], []
            for pi, b in enumerate(pr[qi]):
                sel = np.flatnonzero(buckets == b)
                if not len(sel):
                    continue
                d = np.full(len(sel), cst[qi, pi], dtype=np.int64)
                for s in range(mm):
                    d += tbl[qi, pi, s, codes[sel, s]]
                cand_d.append(d)
                cand_i.append(sel)
            if not cand_d:
                continue
            d = np.concatenate(cand_d)
            sel = np.concatenate(cand_i)
            n_take = min(k, len(d))
            # lexsort cut (see pq_topk): exact-integer distance ties must
            # resolve by vec_id or the local survivor set depends on
            # block layout
            take = np.lexsort((ids[sel], d))[:n_take]
            out_q.extend([qi] * n_take)
            out_id.extend(ids[sel[take]].tolist())
            out_d.extend(d[take].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int32()),
            "vec_id": pa.array(out_id, pa.int64()),
            "adc_dist": pa.array(out_d, pa.int64()),
        })

    partials = codes_ds.map_batches(
        partial_topk, batch_format="pyarrow").take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(heaps.setdefault(r["query_id"], []),
                       (-r["adc_dist"], -r["vec_id"]))
        if len(heaps[r["query_id"]]) > k:
            heapq.heappop(heaps[r["query_id"]])
    out_q, out_rank, out_id, out_d = [], [], [], []
    for qi in sorted(heaps):
        best = sorted((-nd, -nv) for nd, nv in heaps[qi])
        for rank, (dist, vid) in enumerate(best):
            out_q.append(qi)
            out_rank.append(rank)
            out_id.append(vid)
            out_d.append(dist)
    return pa.table({
        "query_id": pa.array(out_q, pa.int32()),
        "rank": pa.array(out_rank, pa.int32()),
        "vec_id": pa.array(out_id, pa.int64()),
        "adc_dist": pa.array(out_d, pa.int64()),
    })
