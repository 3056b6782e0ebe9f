"""Deduplication operators for web-text corpora — first-class engine additions
beyond the reference (which only has exact ``map[string]bool`` dedup, SURVEY
§2.7): the operations a 100 TB training-data pipeline needs.

All operators take/return ``ray.data.Dataset`` and follow the same scale
shape: vectorized per-batch signature computation (actor pools where state is
loaded), then ONE keyed shuffle (``groupby``) on the signature, then per-group
winner selection. Winners are pinned to ``min(id)`` so results are
deterministic under any parallelism.

Constructions are the standard published ones (Broder minhashing + LSH
banding, Charikar SimHash, n-gram Jaccard verification, cosine near-dup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.sketches import MinHasher, simhash_batch
from ..functions.textstats import jaccard, shingles
from ..functions.urlnorm import hash64

DUP_SCHEMA = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64())])


def _typed_dup_result(pairs_ds):
    """Aggregate candidate pairs to per-doc min(dup_of); guarantee the
    (doc_id, dup_of) schema survives an EMPTY result (a no-duplicates corpus
    is a legal outcome and downstream consumers still need the schema)."""
    from ray.data.aggregate import Min

    out = pairs_ds.groupby("doc_id").aggregate(Min("dup_of", alias_name="dup_of"))
    out = out.materialize()  # dup sets are small; makes the count free
    if out.count() == 0:
        return ray.data.from_arrow(DUP_SCHEMA.empty_table())
    return out


# --------------------------------------------------------------------------- #
# exact dedup: hash-partition + per-group first (pinned min id)
# --------------------------------------------------------------------------- #
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep one row per exact text value (winner = min id).

    hash(text) is computed vectorized per batch; the single shuffle groups by
    the 64-bit content hash, so only (hash → group) moves — never a
    text-keyed comparison across partitions.
    """

    def add_hash(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (hash64(x or "") & 0x7FFFFFFFFFFFFFFF for x in t.column(text_col).to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return t.append_column("_content_hash", pa.array(h, pa.int64()))

    def first_of_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_content_hash")
        .map_groups(first_of_group, batch_format="pandas")
        .drop_columns(["_content_hash"])
    )


# --------------------------------------------------------------------------- #
# MinHash + LSH near-dedup
# --------------------------------------------------------------------------- #
def minhash_band_rows(t: pa.Table, *, text_col: str, id_col: str, num_perm: int,
                      k: int, num_bands: int, seed: int) -> pa.Table:
    """text → (doc_id, band_id, band_hash, sig bytes). Stateless task (the
    MinHasher's permutation params rebuild in microseconds from the seed —
    cheaper than reserving an actor pool that can starve the shuffle)."""
    mh = MinHasher(num_perm=num_perm, k=k, seed=seed)
    ids, bids, bhashes, sigs = [], [], [], []
    for did, text in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        sig = mh.signature(text or "")
        sb = sig.tobytes()
        for b, h in enumerate(mh.bands(sig, num_bands)):
            ids.append(did)
            bids.append(b)
            bhashes.append(h)
            sigs.append(sb)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(bids, pa.int32()),
            "band_hash": pa.array(bhashes, pa.int64()),
            "sig": pa.array(sigs, pa.binary()),
        }
    )


def minhash_lsh_duplicates(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 128,
    k: int = 5,
    num_bands: int = 16,
    threshold: float = 0.8,
    seed: int = 1,
):
    """→ Dataset(doc_id, dup_of) — docs whose estimated Jaccard vs an earlier
    doc ≥ threshold. Pipeline: shingle→minhash→band rows → groupby(band) →
    in-group signature verify → per-doc min(dup_of) merge.

    Scale: the only all-to-all is the (band_id, band_hash) groupby of compact
    signature rows (num_bands × ~(8B keys + num_perm×8B sig) per doc) — raw
    text never shuffles. Hot buckets (boilerplate) are bounded by in-group
    pairwise verify against the min-id representative only: O(n) per bucket.
    """
    import functools

    sig_rows = ds.map_batches(
        functools.partial(
            minhash_band_rows, text_col=text_col, id_col=id_col,
            num_perm=num_perm, k=k, num_bands=num_bands, seed=seed,
        ),
        batch_format="pyarrow",
    )

    # Coarse-partition the bucket space: a groupby on the raw (band_id,
    # band_hash) key makes ~num_bands×n_docs nearly-singleton groups and
    # map_groups pays Python overhead PER GROUP (measured 11 s wall for <1 s
    # of compute at 5k docs). One shuffle on a 64-way coarse key + a
    # vectorized duplicated() pre-filter inside each partition leaves the
    # Python loop only the true collision buckets.
    def add_coarse(t: pa.Table) -> pa.Table:
        coarse = pc.cast(
            pc.bit_wise_and(t.column("band_hash"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return t.append_column("_coarse", coarse)

    def coarse_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dup_mask = g.duplicated(subset=["band_id", "band_hash"], keep=False)
        g = g[dup_mask]
        if g.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "dup_of": pd.Series(dtype="int64")})
        out_id, out_of = [], []
        for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
            grp = grp.sort_values("doc_id")
            rep = grp.iloc[0]
            rep_sig = np.frombuffer(rep["sig"], dtype=np.uint64)
            for _, row in grp.iloc[1:].iterrows():
                sig = np.frombuffer(row["sig"], dtype=np.uint64)
                if float(np.mean(sig == rep_sig)) >= threshold:
                    out_id.append(row["doc_id"])
                    out_of.append(rep["doc_id"])
        return pd.DataFrame({"doc_id": pd.array(out_id, dtype="int64"), "dup_of": pd.array(out_of, dtype="int64")})

    pairs = (
        sig_rows.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(coarse_bucket_pairs, batch_format="pandas")
    )
    # a doc may match in several bands → keep the smallest dup_of
    return _typed_dup_result(pairs)


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Remove near-duplicates: anti-join ds against the duplicate id set
    (broadcast — the dup set is small relative to the corpus)."""
    dups = minhash_lsh_duplicates(ds, text_col, id_col, **kw)
    dup_ref = ray.put({r["doc_id"] for r in dups.take_all()})

    def drop_dups(t: pa.Table) -> pa.Table:
        ids = ray.get(dup_ref)
        mask = [i not in ids for i in t.column(id_col).to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(drop_dups, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# SimHash near-dedup (Hamming radius over 64-bit sketches)
# --------------------------------------------------------------------------- #
def simhash_duplicates(
    ds, text_col: str = "text", id_col: str = "doc_id", *, max_hamming: int = 3
):
    """→ Dataset(doc_id, dup_of) under Hamming ≤ max_hamming.

    Block by 4 × 16-bit SimHash chunks (pigeonhole: any pair within Hamming≤3
    shares at least one exact chunk) → groupby(chunk) → in-bucket verify
    against the min-id representative.
    """

    def sig_rows(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t.column(text_col).to_pylist()]
        sims = simhash_batch(texts)
        ids = t.column(id_col).to_pylist()
        o_id, o_chunk_id, o_chunk, o_sim = [], [], [], []
        for did, s in zip(ids, sims.tolist()):
            for c in range(4):
                o_id.append(did)
                o_chunk_id.append(c)
                o_chunk.append((s >> (16 * c)) & 0xFFFF)
                o_sim.append(s)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "chunk_id": pa.array(o_chunk_id, pa.int32()),
                "chunk": pa.array(o_chunk, pa.int32()),
                "simhash": pa.array(np.array(o_sim, dtype=np.uint64)),
            }
        )

    # same coarse-partition trick as MinHash: avoid per-singleton-group cost
    def add_coarse(t: pa.Table) -> pa.Table:
        coarse = pc.cast(
            pc.bit_wise_and(t.column("chunk"), pa.scalar(63, pa.int32())),
            pa.int32(),
        )
        return t.append_column("_coarse", coarse)

    def coarse_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["chunk_id", "chunk"], keep=False)]
        if g.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "dup_of": pd.Series(dtype="int64")})
        out_id, out_of = [], []
        for _, grp in g.groupby(["chunk_id", "chunk"], sort=False):
            grp = grp.sort_values("doc_id")
            rep = int(grp.iloc[0]["simhash"])
            rep_id = grp.iloc[0]["doc_id"]
            for _, row in grp.iloc[1:].iterrows():
                if bin(int(row["simhash"]) ^ rep).count("1") <= max_hamming:
                    out_id.append(row["doc_id"])
                    out_of.append(rep_id)
        return pd.DataFrame({"doc_id": pd.array(out_id, dtype="int64"), "dup_of": pd.array(out_of, dtype="int64")})

    pairs = (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(coarse_bucket_pairs, batch_format="pandas")
    )
    return _typed_dup_result(pairs)


# --------------------------------------------------------------------------- #
# n-gram Jaccard verification (exact, for candidate pairs)
# --------------------------------------------------------------------------- #
def ngram_jaccard_pairs(ds, pairs, text_col: str = "text", id_col: str = "doc_id",
                        *, k: int = 5):
    """Exact word-k-shingle Jaccard for candidate (doc_id, dup_of) pairs.

    The candidate pair set is small (output of an LSH stage) → broadcast the
    needed texts: one pass collects texts of ids in the pair set, then the
    pair list is scored driver-side. → pyarrow Table(doc_id, dup_of, jaccard).
    """
    pair_rows = pairs.take_all()
    need = {r["doc_id"] for r in pair_rows} | {r["dup_of"] for r in pair_rows}
    need_ref = ray.put(need)

    def collect(t: pa.Table) -> pa.Table:
        ids = ray.get(need_ref)
        mask = [i in ids for i in t.column(id_col).to_pylist()]
        return t.filter(pa.array(mask, pa.bool_())).select([id_col, text_col])

    texts = {
        r[id_col]: r[text_col]
        for r in ds.map_batches(collect, batch_format="pyarrow").take_all()
    }
    out_a, out_b, out_j = [], [], []
    for r in pair_rows:
        a, b = r["doc_id"], r["dup_of"]
        out_a.append(a)
        out_b.append(b)
        out_j.append(
            jaccard(shingles(texts.get(a, ""), k), shingles(texts.get(b, ""), k))
        )
    return pa.table(
        {
            "doc_id": pa.array(out_a, pa.int64()),
            "dup_of": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


# --------------------------------------------------------------------------- #
# embedding-cosine near-dup
# --------------------------------------------------------------------------- #
def embedding_duplicates(
    ds, vec_col: str = "embedding", id_col: str = "vec_id",
    *, threshold: float = 0.95, num_buckets: int = 16, seed: int = 7,
):
    """Near-dup by cosine ≥ threshold, LSH-bucketed by random-hyperplane sign
    bits (Charikar) so only same-bucket pairs are compared; winner = min id.
    → Dataset(doc_id, dup_of)."""
    nbits = max(1, int(np.ceil(np.log2(num_buckets))))

    def bucketize(t: pa.Table) -> pa.Table:
        # vec is always cast to list<float32> so empty and non-empty blocks
        # agree on schema (parquet often delivers list<double>)
        vec_type = pa.list_(pa.float32())
        vecs = np.array(t.column(vec_col).to_pylist(), dtype=np.float32)
        if vecs.ndim == 1:  # empty batch
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32()),
                             "vec": pa.array([], vec_type)})
        rng = np.random.RandomState(seed)
        planes = rng.randn(vecs.shape[1], nbits).astype(np.float32)
        bits = (vecs @ planes) > 0
        bucket = bits @ (1 << np.arange(nbits))
        return pa.table(
            {
                "doc_id": pc.cast(t.column(id_col), pa.int64()),
                "bucket": pa.array(bucket.astype(np.int32)),
                "vec": pc.cast(t.column(vec_col), vec_type),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "dup_of": pd.Series(dtype="int64")})
        g = g.sort_values("doc_id").reset_index(drop=True)
        m = np.array(g["vec"].tolist(), dtype=np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
        sims = m @ m.T
        out_id, out_of = [], []
        ids = g["doc_id"].tolist()
        for j in range(1, len(ids)):
            earlier = np.nonzero(sims[j, :j] >= threshold)[0]
            if len(earlier):
                out_id.append(ids[j])
                out_of.append(ids[int(earlier[0])])
        return pd.DataFrame({"doc_id": pd.array(out_id, dtype="int64"), "dup_of": pd.array(out_of, dtype="int64")})

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return _typed_dup_result(pairs)
