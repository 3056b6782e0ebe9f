"""Cleanroom — the composed training-data preparation pipeline.

The end-to-end corpus-cleaning flow a 100 TB web-text training pipeline
runs (an engine addition beyond the reference, composing the mandated
training-data operators — SURVEY §8 "Engine additions"):

    documents ──▶ exact dedup ──▶ MinHash-LSH near-dedup ──▶ (optional)
    repeated-line removal ──▶ (optional) PII redaction ──▶ quality
    annotate (lang-id, quality score, token counts, fingerprint) ──▶
    quality filter ──▶ resumable partitioned Parquet

Curation rewrites run AFTER the dup decisions (dedup keys on raw text) and
fuse into the same stage-3 streaming pass — no extra pass over the corpus.

Scale shape:
- each stage is a Ray Data transform (map_batches / one keyed groupby per
  dedup family) — raw text shuffles ZERO times; only 8-byte hashes and
  compact signatures move between nodes;
- dup-id sets are only ever as large as the duplicate count (losers are
  emitted directly; no full-id materialization), checkpointed once to
  Parquet sidecar directories via distributed ``write_parquet`` (skipped on
  resume, never folded on the driver), and consumed either as a broadcast
  ``is_in`` filter (small sets) or a distributed hash anti-join (sets past
  ``broadcast_limit`` — web dup rates of 30-50 % make driver folds unbounded
  at 100 TB);
- output is hash-partitioned Parquet, ONE DIRECTORY PER PARTITION with an
  atomic done-marker: a failed run re-executes only the unfinished
  partitions' writes (and none of the dedup decisions, which reload from
  the sidecars). Never one giant file.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..stages.dedup import exact_duplicate_ids, minhash_lsh_duplicates
from ..stages.textops import annotate_text_batch


def _dup_sidecar(dir_path: str, compute_ds) -> int:
    """Stage checkpoint: the duplicate-id set written ONCE as a partitioned
    Parquet directory — distributed ``write_parquet`` (the ids never fold on
    the driver), atomic tmp-dir+rename, skipped on resume. Returns the id
    count (from parquet footers — no data read)."""
    if not os.path.isdir(dir_path):
        tmp = f"{dir_path}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)  # an EMPTY dup set writes no files
        compute_ds().write_parquet(tmp)
        os.replace(tmp, dir_path)
    return sum(
        pq.ParquetFile(f"{dir_path}/{f}").metadata.num_rows
        for f in os.listdir(dir_path) if f.endswith(".parquet")
    )


def _drop_sidecar_ids(ds, id_col: str, dir_path: str, n_ids: int,
                      broadcast_limit: int, n_rows: int | None = None):
    """Anti-join ds against a sidecar id set: broadcast ``is_in`` when small
    (zero shuffle), distributed ``hash_join(how='anti')`` when the set
    outgrows the fast path (r2 verdict #3 — never fold big id sets on the
    driver)."""
    from ..stages.dedup import anti_join_ids
    from ..util import read_parquet_clean

    if n_ids == 0:
        return ds
    if n_ids <= broadcast_limit:
        ids = pq.read_table(dir_path).column("doc_id").combine_chunks()
        return anti_join_ids(ds, ids, id_col, broadcast_limit=broadcast_limit)
    right = read_parquet_clean(dir_path, columns=["doc_id"])
    return anti_join_ids(ds, right, id_col, broadcast_limit=broadcast_limit,
                         n_rows=n_rows, n_dups=n_ids)


def write_partitioned(ds, out_dir: str, *, key_col: str, num_partitions: int,
                      skip_done: bool = True) -> dict:
    """Resumable hash-partitioned Parquet sink.

    One ``groupby(partition).map_groups`` task per partition writes
    ``part-K/data.parquet`` then an atomic ``_DONE`` marker (json with the
    row count). With ``skip_done``, rows of already-marked partitions are
    FILTERED OUT before the shuffle, so a resumed run moves and writes only
    the missing partitions. Returns {written: [...], skipped: [...], rows}.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = {
        int(d.split("-", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("part-") and os.path.exists(f"{out_dir}/{d}/_DONE")
    } if skip_done else set()

    def add_part(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        part = (keys.astype(np.uint64) % num_partitions).astype(np.int32)
        t = t.append_column("_part", pa.array(part))
        if done:
            mask = ~np.isin(part, np.fromiter(done, dtype=np.int32, count=len(done)))
            t = t.filter(pa.array(mask))
        return t

    def write_part(t: pa.Table) -> pa.Table:
        part = int(t.column("_part")[0].as_py())
        d = f"{out_dir}/part-{part:05d}"
        os.makedirs(d, exist_ok=True)
        body = t.drop_columns(["_part"]).sort_by(key_col)
        tmp = f"{d}/data.parquet.tmp-{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, f"{d}/data.parquet")
        with open(f"{d}/_DONE.tmp", "w") as f:
            json.dump({"rows": body.num_rows}, f)
        os.replace(f"{d}/_DONE.tmp", f"{d}/_DONE")
        return pa.table({"part": pa.array([part], pa.int32()),
                         "rows": pa.array([body.num_rows], pa.int64())})

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(write_part, batch_format="pyarrow")
    )
    written = {r["part"]: r["rows"] for r in out.take_all()}
    return {
        "written": sorted(written),
        "skipped": sorted(done),
        "rows": int(sum(written.values())),
    }


def read_partitioned(out_dir: str):
    """Read back a ``write_partitioned`` output directory as a Dataset."""
    from ..util import read_parquet_clean

    paths = sorted(
        f"{out_dir}/{d}/data.parquet"
        for d in os.listdir(out_dir)
        if d.startswith("part-") and os.path.exists(f"{out_dir}/{d}/data.parquet")
    )
    if not paths:  # everything filtered: a valid (empty) cleanroom result
        import ray.data

        return ray.data.from_items([])
    return read_parquet_clean(paths)


def cleanroom(
    documents_path: str,
    out_dir: str | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float | None = 0.3,
    min_tokens: int = 5,
    minhash_threshold: float | None = 0.8,
    num_partitions: int = 16,
    n_docs: int | None = None,
    redact_pii: bool = False,
    dedup_lines_words: int | None = None,
    broadcast_limit: int = 1 << 21,
):
    """Run the cleanroom flow over a documents Parquet table.

    Returns ``(dataset, info)`` — the cleaned, annotated Dataset (lazy; the
    caller consumes or writes it) and an info dict with stage counts. When
    ``out_dir`` is given, the result is written through the resumable
    partitioned sink, ``info`` carries the write manifest, and the returned
    Dataset reads back from the written partitions.
    """
    from ..util import read_parquet_clean

    if n_docs is None:
        n_docs = pq.ParquetFile(documents_path).metadata.num_rows

    if out_dir:
        # explicit out_dir pins resume identity: rerunning with the same
        # out_dir resumes its sidecars — the caller owns that contract
        side_dir = out_dir
    else:
        # input-keyed default (bug fix): the old shared
        # "/tmp/ncrawler_cleanroom" reused dup-set sidecars ACROSS
        # DIFFERENT INPUTS — a cleanroom run on corpus B silently applied
        # corpus A's duplicate ids (caught by the sf0.1 oracle audit:
        # 373 planted dups survived). The key covers the input identity
        # (path + mtime) and every knob that changes sidecar contents.
        import hashlib as _hl

        key = _hl.md5(
            f"{os.path.abspath(documents_path)}:"
            f"{os.path.getmtime(documents_path)}:"
            f"{id_col}:{text_col}:{minhash_threshold}".encode()
        ).hexdigest()[:12]
        side_dir = f"/tmp/ncrawler_cleanroom/side-{key}"
    os.makedirs(side_dir, exist_ok=True)

    # stage 1: exact duplicate ids (winner = min id, kept; losers dropped)
    def exact_dups():
        ds = read_parquet_clean(documents_path, columns=[id_col, text_col])
        return exact_duplicate_ids(ds, text_col, id_col, n_rows=n_docs)

    exact_dir = f"{side_dir}/_exact_dups"
    n_exact = _dup_sidecar(exact_dir, exact_dups)

    # stage 2: near-duplicate ids (MinHash-LSH over the exact survivors).
    # ``minhash_threshold=None`` skips the stage — the exact-only
    # composition every column of which a SQL oracle can replicate
    # (queries()['cleanroom_exact_documents'] runs the pipeline this way).
    if minhash_threshold is None:
        near_dir, n_near = None, 0
    else:
        def near_dups():
            ds = read_parquet_clean(documents_path, columns=[id_col, text_col])
            ds = _drop_sidecar_ids(ds, id_col, exact_dir, n_exact,
                                   broadcast_limit, n_rows=n_docs)
            return minhash_lsh_duplicates(
                ds, text_col, id_col, threshold=minhash_threshold,
                n_docs=n_docs
            ).select_columns(["doc_id"])

        near_dir = f"{side_dir}/_near_dups"
        n_near = _dup_sidecar(near_dir, near_dups)

    # stage 3: drop dups + (optional) curation rewrites + annotate +
    # quality-filter — ONE streaming pass. Curation runs AFTER the dup
    # decisions on purpose: dedup keys on the raw text, and redaction/line
    # dedup must not perturb which documents count as duplicates.
    ds = read_parquet_clean(documents_path)
    ds = _drop_sidecar_ids(ds, id_col, exact_dir, n_exact,
                           broadcast_limit, n_rows=n_docs)
    if near_dir is not None:
        ds = _drop_sidecar_ids(ds, id_col, near_dir, n_near,
                               broadcast_limit, n_rows=n_docs)

    def annotate_filter(t: pa.Table) -> pa.Table:
        if dedup_lines_words is not None:
            from ..stages.curation import dedup_lines_in_place

            # 0 = dedup natural \n lines; N>0 = regroup into N-word lines
            t = dedup_lines_in_place(t, text_col=text_col,
                                     words_per_line=dedup_lines_words or None)
        if redact_pii:
            from ..stages.curation import pii_redact_batch

            t = pii_redact_batch(t, text_col=text_col)
        t = annotate_text_batch(t, text_col=text_col)
        keep = pc.greater_equal(t.column("n_tokens_ws"),
                                pa.scalar(min_tokens, pa.int64()))
        if min_quality is not None:  # None → integer-only filter (oracle-able)
            keep = pc.and_(
                pc.greater_equal(t.column("quality"),
                                 pa.scalar(float(min_quality))),
                keep,
            )
        return t.filter(keep)

    ds = ds.map_batches(annotate_filter, batch_format="pyarrow")

    info = {
        "n_docs": n_docs,
        "exact_dups": n_exact,
        "near_dups": n_near,
    }
    if out_dir:
        info["write"] = write_partitioned(
            ds, f"{out_dir}/clean", key_col=id_col, num_partitions=num_partitions
        )
        ds = read_partitioned(f"{out_dir}/clean")
    return ds, info
