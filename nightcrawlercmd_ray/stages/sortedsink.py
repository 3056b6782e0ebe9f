"""Range-partitioned, globally-sorted, resumable Parquet sink.

Engine addition beyond the reference (whose sinks are single files —
SURVEY §2.1): the output-layout operator a 100-TB corpus needs for
sorted exports (id-ordered shards, score-ordered curricula). Global sort
WITHOUT ``ds.sort``'s all-to-all of full rows happening twice: boundaries
come from a bounded deterministic key sample, rows shuffle ONCE into key
ranges, each range sorts locally and writes one file with an atomic
``_DONE`` marker — reading the parts in range order is the globally
sorted dataset. Every row also gets its exact global rank (``pos``)
computed from the per-partition counts, so sortedness is value-checkable
(and SQL-oracle-able via ``row_number() OVER (ORDER BY ...)``).

Determinism: the boundary sample keeps keys with
``hash_u32(key) < rate·2^32`` — a pure function of the key, identical at
any parallelism — and the composite sort key packs (key, tie) into one
int64, so ranks are total and reproducible.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .sampling import hash_u32, threshold_for

_PACK = np.int64(1) << np.int64(32)


def _packed(t: pa.Table, key_col: str, tie_col: str) -> np.ndarray:
    """Total-order composite key ``key·2^32 + tie`` (documented domain:
    0 ≤ key < 2^31, 0 ≤ tie < 2^32 — doc lengths / ids)."""
    k = pc.cast(t.column(key_col), pa.int64()).to_numpy(zero_copy_only=False)
    tie = pc.cast(t.column(tie_col), pa.int64()).to_numpy(zero_copy_only=False)
    return k * _PACK + tie


def write_sorted_partitioned(
    ds, out_dir: str, *, key_col: str, tie_col: str,
    num_partitions: int, n_rows: int | None = None,
    max_sample: int = 65536, skip_done: bool = True,
) -> dict:
    """Write ``ds`` sorted by (key_col, tie_col) as ``num_partitions`` range
    parts, each ``part-K/data.parquet`` + ``_DONE``, plus a ``_MANIFEST``
    with boundaries and per-part counts. Adds a ``pos`` int64 column: the
    row's exact 0-based global rank.

    Scale shape: boundary sampling is a bounded pure map (≤ max_sample keys
    reach the driver regardless of corpus size); partition counts are a
    per-batch bincount + one P-row shuffle; data moves in exactly ONE
    range-keyed exchange; each part sorts ~n/P rows locally. A resumed run
    reloads boundaries/offsets from the manifest and rewrites only parts
    missing their marker (rows of done parts are filtered before the
    exchange). On resume the ``_MANIFEST`` is authoritative: its
    boundaries/offsets are reused and ``num_partitions``/``max_sample``
    arguments are ignored (a changed partitioning requires a fresh dir or
    ``skip_done=False``, which wipes stale parts first). Returns the
    manifest dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = f"{out_dir}/_MANIFEST"
    if skip_done and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            man = json.load(f)
        bounds = np.array(man["boundaries"], dtype=np.int64)
        offsets = np.array(man["offsets"], dtype=np.int64)
        counts = np.array(man["counts"], dtype=np.int64)
    else:
        # fresh boundaries: any part-* leftovers belong to a DIFFERENT
        # partitioning (other boundaries/num_partitions) — remove them, or
        # read_sorted would union stale ranges with the new ones
        for d in os.listdir(out_dir):
            if d.startswith("part-"):
                shutil.rmtree(f"{out_dir}/{d}", ignore_errors=True)
        if n_rows is None:
            n_rows = ds.count()
        rate = min(1.0, max_sample / max(1, n_rows))
        # max(1, ...): always sample SOMETHING (the canonical threshold_for
        # maps microscopic rates to 0, which would leave zero boundaries)
        thr = np.uint64(max(1, threshold_for(rate)))

        def sample_keys(t: pa.Table) -> pa.Table:
            k = _packed(t, key_col, tie_col)
            keep = hash_u32(k) < thr
            return pa.table({"_k": pa.array(k[keep], pa.int64())})

        sample = np.sort(np.array(
            [r["_k"] for r in
             ds.map_batches(sample_keys, batch_format="pyarrow").take_all()],
            dtype=np.int64,
        ))
        cuts = [sample[(len(sample) * j) // num_partitions]
                for j in range(1, num_partitions)] if len(sample) else []
        bounds = np.unique(np.array(cuts, dtype=np.int64))

        def part_counts(t: pa.Table) -> pa.Table:
            p = np.searchsorted(bounds, _packed(t, key_col, tie_col),
                                side="right")
            c = np.bincount(p, minlength=len(bounds) + 1).astype(np.int64)
            return pa.table({
                "_part": pa.array(np.arange(len(c), dtype=np.int64)),
                "_n": pa.array(c),
            })

        rows = (
            ds.map_batches(part_counts, batch_format="pyarrow")
            .groupby("_part").sum("_n").take_all()
        )
        counts = np.zeros(len(bounds) + 1, dtype=np.int64)
        for r in rows:
            counts[r["_part"]] = r["sum(_n)"]
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        man = {
            "key_col": key_col, "tie_col": tie_col,
            "boundaries": bounds.tolist(),
            "counts": counts.tolist(), "offsets": offsets.tolist(),
            "rows": int(counts.sum()),
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, manifest_path)

    done = {
        int(d.split("-", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("part-") and os.path.exists(f"{out_dir}/{d}/_DONE")
    } if skip_done else set()
    offsets_arr = offsets

    def add_part(t: pa.Table) -> pa.Table:
        p = np.searchsorted(bounds, _packed(t, key_col, tie_col),
                            side="right").astype(np.int64)
        t = t.append_column("_part", pa.array(p))
        if done:
            mask = ~np.isin(p, np.fromiter(done, np.int64, count=len(done)))
            t = t.filter(pa.array(mask))
        return t

    def write_part(g: pa.Table) -> pa.Table:
        part = int(g.column("_part")[0].as_py())
        k = _packed(g, key_col, tie_col)
        order = np.argsort(k, kind="stable")
        body = g.drop_columns(["_part"]).take(pa.array(order))
        pos = offsets_arr[part] + np.arange(len(order), dtype=np.int64)
        body = body.append_column("pos", pa.array(pos))
        d = f"{out_dir}/part-{part:05d}"
        os.makedirs(d, exist_ok=True)
        tmp = f"{d}/data.parquet.tmp-{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, f"{d}/data.parquet")
        with open(f"{d}/_DONE.tmp", "w") as f:
            json.dump({"rows": body.num_rows}, f)
        os.replace(f"{d}/_DONE.tmp", f"{d}/_DONE")
        return pa.table({"part": pa.array([part], pa.int64()),
                         "rows": pa.array([body.num_rows], pa.int64())})

    written = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )
    man["written"] = sorted(int(r["part"]) for r in written)
    man["skipped"] = sorted(done)
    return man


def read_sorted(out_dir: str):
    """Read a ``write_sorted_partitioned`` directory back as a Dataset.
    Parts are listed in range order, so consuming files in path order IS
    the global sort; the ``pos`` column carries the exact global rank for
    order-insensitive consumers."""
    from ..util import read_parquet_clean

    paths = sorted(
        f"{out_dir}/{d}/data.parquet"
        for d in os.listdir(out_dir)
        if d.startswith("part-") and os.path.exists(f"{out_dir}/{d}/_DONE")
    )
    if not paths:
        raise ValueError(f"read_sorted: no completed parts in {out_dir!r} "
                         "(no part-*/_DONE markers)")
    return read_parquet_clean(paths)


def compact_sorted(base_dir: str, delta_ds, out_dir: str, *,
                   tombstone_ds=None, skip_done: bool = True) -> dict:
    """LSM-style compaction: merge a sorted base (a
    ``write_sorted_partitioned`` directory) with a DELTA dataset into a new
    sorted directory WITHOUT re-sorting or even re-reading the whole base —
    the incremental-corpus maintenance step (recrawl appends, snapshot
    upserts) that pairs with ``snapshot_diff`` / ``incremental_dedup``.

    Scale shape: the base's range boundaries are reused, so the only
    exchange is the DELTA routed to its base parts (one keyed shuffle of
    delta rows; the base never moves); each touched part merges its sorted
    base file with its locally-sorted delta rows (stable: base rows precede
    delta rows on exact (key, tie) ties) and rewrites with fresh global
    ranks; an untouched part whose global offset is unchanged (every part
    BEFORE the first touched one — the whole base for an append-at-tail
    delta, the classic LSM case) is HARD-LINKED (zero IO); untouched parts
    whose offset shifted rewrite only to refresh ``pos``. A uniformly
    spread delta therefore degrades to a full rewrite — which is exactly
    what a major compaction is. Resumable like the writer: parts with a
    ``_DONE`` in ``out_dir`` are skipped, ``_MANIFEST`` written last.

    Boundaries are inherited, so a heavily skewed delta can fatten one
    range; rerun ``write_sorted_partitioned`` (fresh boundaries) when part
    sizes drift — the documented re-balance path. Returns the new manifest.

    ``tombstone_ds`` (optional) is a Dataset of (key_col, tie_col) rows to
    DELETE from the base during the same compaction — the LSM deletion
    path. Tombstones ride the identical keyed exchange as the delta (as
    compact key rows with an ``_op`` flag); each touched part drops its
    tombstoned base rows before merging its delta and ranks recompute.
    Contract: every tombstone must match exactly one base row (the caller
    derives them from the base corpus — see ``pipelines.refresh``); a miss
    raises rather than silently drifting the manifest counts.
    """
    with open(f"{base_dir}/_MANIFEST") as f:
        man = json.load(f)
    key_col, tie_col = man["key_col"], man["tie_col"]
    bounds = np.array(man["boundaries"], dtype=np.int64)
    base_counts = np.array(man["counts"], dtype=np.int64)
    base_offsets = np.array(man["offsets"], dtype=np.int64)
    os.makedirs(out_dir, exist_ok=True)

    if tombstone_ds is not None:
        # align tombstones to the delta schema (key/tie real, payload null)
        # and union into ONE stream so a part touched by both adds and
        # deletes is written exactly once by a single merge task
        d_schema = delta_ds.schema()
        if d_schema is None or not d_schema.names:
            # pure-deletion compaction: the delta is EMPTY (e.g. a refresh
            # whose new snapshot only removes docs) and carries no schema —
            # derive the row shape from the base parts instead of crashing
            import glob as _glob

            parts = sorted(_glob.glob(f"{base_dir}/part-*/data.parquet"))
            if not parts:
                raise ValueError("compact_sorted: empty base and delta")
            sch = pq.read_schema(parts[0])
            d_names = [n for n in sch.names if n != "pos"]
            d_types = [sch.field(n).type for n in d_names]
        else:
            d_names, d_types = d_schema.names, d_schema.types

        def tag_add(t: pa.Table) -> pa.Table:
            return t.select(d_names).append_column(
                "_op", pa.array(np.zeros(t.num_rows, dtype=np.int8)))

        def tag_del(t: pa.Table) -> pa.Table:
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for n, ty in zip(d_names, d_types):
                if n in (key_col, tie_col):
                    cols[n] = pc.cast(t.column(n), ty)
                else:
                    cols[n] = pa.nulls(t.num_rows, type=ty)
            return pa.table(cols).append_column(
                "_op", pa.array(np.ones(t.num_rows, dtype=np.int8)))

        stream = delta_ds.map_batches(tag_add, batch_format="pyarrow").union(
            tombstone_ds.map_batches(tag_del, batch_format="pyarrow"))
        # two consumers below (count pass + merge pass): run the tagging once
        stream = stream.materialize()
    else:
        stream = delta_ds

    # ---- pass 1: per-part add/delete counts (bounded: P rows cross) -----
    def part_counts(t: pa.Table) -> pa.Table:
        p = np.searchsorted(bounds, _packed(t, key_col, tie_col),
                            side="right")
        if "_op" in t.column_names:
            op = t.column("_op").to_numpy(zero_copy_only=False)
        else:
            op = np.zeros(len(p), dtype=np.int8)
        m = len(bounds) + 1
        add_c = np.bincount(p[op == 0], minlength=m).astype(np.int64)
        del_c = np.bincount(p[op == 1], minlength=m).astype(np.int64)
        return pa.table({
            "_part": pa.array(np.arange(m, dtype=np.int64)),
            "_n": pa.array(add_c),
            "_d": pa.array(del_c),
        })

    delta_counts = np.zeros(len(bounds) + 1, dtype=np.int64)
    del_counts = np.zeros(len(bounds) + 1, dtype=np.int64)
    for r in (stream.map_batches(part_counts, batch_format="pyarrow")
              .groupby("_part").sum(["_n", "_d"]).take_all()):
        delta_counts[r["_part"]] = r["sum(_n)"]
        del_counts[r["_part"]] = r["sum(_d)"]
    if (del_counts > base_counts).any():
        raise ValueError(
            "compact_sorted: more tombstones than base rows in part(s) "
            f"{np.flatnonzero(del_counts > base_counts).tolist()}")
    if 0 < del_counts.sum() <= 1_000_000:
        import ray

        # fail-fast pre-write validation (bounded): every tombstone must
        # match exactly one base row BEFORE any part is rewritten, so a
        # mis-keyed tombstone set (e.g. a later-generation refresh keying
        # against the wrong text — see refresh_corpus docstring) surfaces
        # as a clean error with out_dir untouched. Past the bound the
        # merge-time per-part check still enforces the same contract
        # (parts write atomically + _DONE markers, so even that failure
        # mode is resumable, not corrupt).
        def del_keys_rows(t: pa.Table) -> pa.Table:
            op = (t.column("_op").to_numpy(zero_copy_only=False)
                  if "_op" in t.column_names
                  else np.zeros(t.num_rows, dtype=np.int8))
            d = t.filter(pa.array(op == 1))
            return pa.table({"_k": pa.array(_packed(d, key_col, tie_col))})

        tomb_keys = np.sort(np.fromiter(
            (r["_k"] for r in stream.map_batches(
                del_keys_rows, batch_format="pyarrow").take_all()),
            np.int64))
        parts_to_check = np.flatnonzero(del_counts).tolist()

        @ray.remote
        def _match_count(part: int) -> int:
            bt = pq.read_table(f"{base_dir}/part-{part:05d}/data.parquet",
                               columns=[key_col, tie_col])
            keys = _packed(bt, key_col, tie_col)
            return int(np.isin(keys, tomb_keys).sum())

        matched = sum(ray.get([_match_count.remote(p_)
                               for p_ in parts_to_check]))
        if matched != tomb_keys.size:
            raise ValueError(
                f"compact_sorted: {tomb_keys.size} tombstone(s) match "
                f"{matched} base row(s) — each must match exactly one "
                "(is the tombstone key derived from the same text the "
                "base was sorted on?)")
    new_counts = base_counts + delta_counts - del_counts
    new_offsets = np.concatenate([[0], np.cumsum(new_counts)[:-1]])
    touched = set(np.flatnonzero(delta_counts + del_counts).tolist())

    done = {
        int(d.split("-", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("part-") and os.path.exists(f"{out_dir}/{d}/_DONE")
    } if skip_done else set()

    def _finish(d: str, body: pa.Table) -> None:
        tmp = f"{d}/data.parquet.tmp-{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, f"{d}/data.parquet")
        with open(f"{d}/_DONE.tmp", "w") as f:
            json.dump({"rows": body.num_rows}, f)
        os.replace(f"{d}/_DONE.tmp", f"{d}/_DONE")

    # ---- pass 2: route delta rows, merge each touched part --------------
    def add_part(t: pa.Table) -> pa.Table:
        p = np.searchsorted(bounds, _packed(t, key_col, tie_col),
                            side="right").astype(np.int64)
        t = t.append_column("_part", pa.array(p))
        if done:
            mask = ~np.isin(p, np.fromiter(done, np.int64, count=len(done)))
            t = t.filter(pa.array(mask))
        return t

    def merge_part(g: pa.Table) -> pa.Table:
        part = int(g.column("_part")[0].as_py())
        add = g.drop_columns(["_part"])
        del_keys = np.empty(0, dtype=np.int64)
        if "_op" in add.column_names:
            op = add.column("_op").to_numpy(zero_copy_only=False)
            dels = add.filter(pa.array(op == 1))
            del_keys = _packed(dels, key_col, tie_col)
            add = add.filter(pa.array(op == 0)).drop_columns(["_op"])
        base_path = f"{base_dir}/part-{part:05d}/data.parquet"
        if os.path.exists(base_path):
            base_t = pq.read_table(base_path).drop_columns(["pos"])
            if del_keys.size:
                keep = ~np.isin(_packed(base_t, key_col, tie_col), del_keys)
                hits = base_t.num_rows - int(keep.sum())
                if hits != del_keys.size:
                    raise ValueError(
                        f"compact_sorted: part {part}: {del_keys.size} "
                        f"tombstone(s) removed {hits} base row(s) — each "
                        "must match exactly one")
                base_t = base_t.filter(pa.array(keep))
            body = pa.concat_tables(
                [base_t, add.select(base_t.column_names).cast(base_t.schema)])
        elif del_keys.size:
            raise ValueError(
                f"compact_sorted: tombstones routed to empty base part {part}")
        else:
            body = add
        k = _packed(body, key_col, tie_col)
        order = np.argsort(k, kind="stable")  # stable ⇒ base before delta
        body = body.take(pa.array(order))
        pos = new_offsets[part] + np.arange(len(order), dtype=np.int64)
        body = body.append_column("pos", pa.array(pos))
        d = f"{out_dir}/part-{part:05d}"
        os.makedirs(d, exist_ok=True)
        _finish(d, body)
        return pa.table({"part": pa.array([part], pa.int64()),
                         "rows": pa.array([body.num_rows], pa.int64())})

    written = (
        stream.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(merge_part, batch_format="pyarrow")
        .take_all()
    )

    # ---- pass 3: untouched base parts — link (offset unchanged) or
    # pos-rewrite (offset shifted); distributed as a tiny part-id dataset
    import ray as _ray

    base_parts = {
        int(d.split("-", 1)[1])
        for d in os.listdir(base_dir)
        if d.startswith("part-")
        and os.path.exists(f"{base_dir}/{d}/_DONE")
    }
    carry = sorted(base_parts - touched - done)

    def carry_part(t: pa.Table) -> pa.Table:
        out_rows = []
        for part in t.column("part").to_pylist():
            src = f"{base_dir}/part-{part:05d}"
            d = f"{out_dir}/part-{part:05d}"
            os.makedirs(d, exist_ok=True)
            if new_offsets[part] == base_offsets[part]:
                # zero-IO carry: hard-link data + marker (copy fallback)
                for fn in ("data.parquet", "_DONE"):
                    dst = f"{d}/{fn}"
                    if os.path.exists(dst):
                        os.remove(dst)
                    try:
                        os.link(f"{src}/{fn}", dst)
                    except OSError:
                        shutil.copy2(f"{src}/{fn}", dst)
                n = int(base_counts[part])
            else:
                body = pq.read_table(f"{src}/data.parquet").drop_columns(
                    ["pos"])
                pos = new_offsets[part] + np.arange(body.num_rows,
                                                    dtype=np.int64)
                _finish(d, body.append_column("pos", pa.array(pos)))
                n = body.num_rows
            out_rows.append((part, n))
        return pa.table({
            "part": pa.array([p for p, _ in out_rows], pa.int64()),
            "rows": pa.array([n for _, n in out_rows], pa.int64()),
        })

    if carry:
        carried = (
            _ray.data.from_arrow(
                pa.table({"part": pa.array(carry, pa.int64())}))
            .repartition(min(len(carry), 32))
            .map_batches(carry_part, batch_format="pyarrow")
            .take_all()
        )
    else:
        carried = []

    new_man = {
        "key_col": key_col, "tie_col": tie_col,
        "boundaries": bounds.tolist(),
        "counts": new_counts.tolist(), "offsets": new_offsets.tolist(),
        "rows": int(new_counts.sum()),
        "removed": int(del_counts.sum()),
        "written": sorted(int(r["part"]) for r in written),
        "carried": sorted(int(r["part"]) for r in carried),
        "skipped": sorted(done),
    }
    tmp = f"{out_dir}/_MANIFEST.tmp"
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    os.replace(tmp, f"{out_dir}/_MANIFEST")
    return new_man


def read_sorted_range(out_dir: str, *, lo: int | None = None,
                      hi: int | None = None, key_col: str | None = None):
    """Read only the rows with ``lo ≤ key ≤ hi`` from a sorted directory —
    the predicate-pushdown payoff of the range-partitioned layout: the
    manifest's boundaries prune to the parts whose key range can overlap
    BEFORE any file is opened (I/O ∝ matching range, not corpus), then one
    exact vectorized filter trims the edge parts. ``lo``/``hi`` are in
    PACKED key units when ``key_col`` is None (key·2^32 + tie, matching the
    sink's total order) or plain key units when ``key_col`` names the
    sink's key column (the common call). → lazy Dataset.
    """
    import pyarrow.compute as _pc

    from ..util import read_parquet_clean

    with open(f"{out_dir}/_MANIFEST") as f:
        man = json.load(f)
    bounds = np.array(man["boundaries"], dtype=np.int64)
    if key_col is not None:
        if key_col != man["key_col"]:
            raise ValueError(
                f"read_sorted_range: key_col {key_col!r} does not match the "
                f"manifest's {man['key_col']!r}")
        lo_p = None if lo is None else lo * int(_PACK)
        hi_p = None if hi is None else hi * int(_PACK) + (int(_PACK) - 1)
    else:
        lo_p, hi_p = lo, hi
    # the writer assigns part = searchsorted(bounds, key, side='right'),
    # i.e. part p holds packed keys in [bounds[p-1], bounds[p]) — prune to
    # the parts whose interval intersects [lo_p, hi_p] with the SAME side
    # convention (a 'left' upper cut dropped rows whose key equals a
    # boundary exactly)
    first = 0 if lo_p is None else int(
        np.searchsorted(bounds, lo_p, side="right"))
    last = len(bounds) if hi_p is None else int(
        np.searchsorted(bounds, hi_p, side="right"))
    paths = [
        f"{out_dir}/part-{p:05d}/data.parquet"
        for p in range(first, last + 1)
        if os.path.exists(f"{out_dir}/part-{p:05d}/_DONE")
    ]
    if not paths:
        raise ValueError(
            f"read_sorted_range: no completed parts overlap "
            f"[{lo!r}, {hi!r}] in {out_dir!r}")
    ds = read_parquet_clean(paths)
    kc, tc = man["key_col"], man["tie_col"]

    def trim(t: pa.Table) -> pa.Table:
        packed = pa.array(_packed(t, kc, tc))
        mask = None
        if lo_p is not None:
            mask = _pc.greater_equal(packed, pa.scalar(lo_p, pa.int64()))
        if hi_p is not None:
            m2 = _pc.less_equal(packed, pa.scalar(hi_p, pa.int64()))
            mask = m2 if mask is None else _pc.and_(mask, m2)
        return t if mask is None else t.filter(mask)

    return ds.map_batches(trim, batch_format="pyarrow"), len(paths)


def merge_join_sorted(dir_a: str, dir_b: str, *, how: str = "inner",
                      right_suffix: str = "_r"):
    """Layout-aware sort-merge (zipper) join of two sorted directories on
    their key columns — ZERO shuffle. Side A's completed parts define the
    task ranges; each task opens its one A part, prunes side B to the parts
    whose key range can overlap (manifest boundaries — same convention as
    :func:`read_sorted_range`), trims B exactly, and hash-joins the two
    slices in Arrow. Correct because both layouts range-partition rows by
    key: every B row joinable with A-part-i's rows lives only in the B
    parts overlapping i's key range; each A row lives in exactly one part,
    so no output pair can be emitted twice even when one key value spans
    adjacent A parts.

    The payoff at scale: when both sides already share the sorted layout
    (the engine's export format), the join moves NO rows — tasks ∝ A
    parts, B I/O ∝ overlapping ranges. A general keyed join without the
    layout should use ``stages/joins.hash_join`` instead.

    Both sides' ``pos`` rank columns are dropped (ranks are layout
    metadata, not join payload). ``how``: 'inner' or 'left outer' (Arrow
    join types). → lazy Dataset of A columns + B columns (B key column and
    collisions suffixed with ``right_suffix``).
    """
    import ray

    from ..util import read_parquet_clean

    with open(f"{dir_a}/_MANIFEST") as f:
        man_a = json.load(f)
    with open(f"{dir_b}/_MANIFEST") as f:
        man_b = json.load(f)
    key_a, key_b = man_a["key_col"], man_b["key_col"]
    bounds_a = np.array(man_a["boundaries"], dtype=np.int64)
    bounds_b = np.array(man_b["boundaries"], dtype=np.int64)
    n_a = len(bounds_a) + 1

    counts_a = man_a["counts"]
    counts_b = man_b["counts"]

    # part-NUMBER → path maps: the writer creates no directory for an empty
    # part (a legitimately complete sink can have gaps), so pruning must
    # run in part-number space — a position-in-list index would shift after
    # any gap and silently join against the wrong B parts. A nonempty part
    # without its _DONE marker is an incomplete write: raise rather than
    # silently drop its matches.
    def _part_paths(d: str, counts: list[int], side: str) -> dict[int, str]:
        out = {}
        for p, cnt in enumerate(counts):
            path = f"{d}/part-{p:05d}/data.parquet"
            if os.path.exists(f"{d}/part-{p:05d}/_DONE"):
                out[p] = path
            elif cnt > 0:
                raise ValueError(
                    f"merge_join_sorted: incomplete {side} part {p} in {d!r}")
        return out

    a_parts = _part_paths(dir_a, counts_a, "A")
    b_parts = _part_paths(dir_b, counts_b, "B")
    specs = []
    for i in sorted(a_parts):
        # A part i holds packed keys in [bounds[i-1], bounds[i]) → key range
        klo = None if i == 0 else int(bounds_a[i - 1]) // int(_PACK)
        khi = (None if i == n_a - 1
               else (int(bounds_a[i]) - 1) // int(_PACK))
        # B parts overlapping [klo, khi] in PACKED units (right-side cut,
        # matching read_sorted_range's convention)
        lo_p = None if klo is None else klo * int(_PACK)
        hi_p = None if khi is None else khi * int(_PACK) + (int(_PACK) - 1)
        first = 0 if lo_p is None else int(
            np.searchsorted(bounds_b, lo_p, side="right"))
        last = len(bounds_b) if hi_p is None else int(
            np.searchsorted(bounds_b, hi_p, side="right"))
        specs.append({
            "a_path": a_parts[i],
            "b_paths": [b_parts[p] for p in range(first, last + 1)
                        if p in b_parts],
            "klo": -1 if klo is None else klo,
            "khi": -1 if khi is None else khi,
        })

    join_type = {"inner": "inner", "left outer": "left outer"}[how]
    if not b_parts:
        raise ValueError(f"merge_join_sorted: no completed parts in {dir_b!r}")
    if not specs:
        raise ValueError(f"merge_join_sorted: no completed parts in {dir_a!r}")
    b_schema_path = b_parts[min(b_parts)]

    def join_task(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            ta = pq.read_table(row["a_path"]).drop_columns(["pos"])
            tbs = [pq.read_table(p) for p in row["b_paths"]]
            if tbs:
                tb = pa.concat_tables(tbs).drop_columns(["pos"])
            else:
                # no overlapping B part: join against an EMPTY B table so
                # the output schema (and left-outer null columns) is stable
                tb = (pq.read_table(b_schema_path)
                      .drop_columns(["pos"]).slice(0, 0))
            k = pc.cast(tb.column(key_b), pa.int64())
            mask = None
            if row["klo"] >= 0:
                mask = pc.greater_equal(k, pa.scalar(row["klo"], pa.int64()))
            if row["khi"] >= 0:
                m2 = pc.less_equal(k, pa.scalar(row["khi"], pa.int64()))
                mask = m2 if mask is None else pc.and_(mask, m2)
            if mask is not None:
                tb = tb.filter(mask)
            j = ta.join(tb, keys=[key_a], right_keys=[key_b],
                        join_type=join_type, right_suffix=right_suffix)
            out.append(j)
        return pa.concat_tables(out, promote_options="default")

    return ray.data.from_items(specs).map_batches(
        join_task, batch_format="pyarrow", batch_size=1
    )


def rank_lookup(out_dir: str, ranks: list[int]) -> pa.Table:
    """Order statistics FROM THE LAYOUT: the sorted sink's manifest stores
    per-part offsets, so the k-th smallest row is one part lookup + one
    row-group point read — O(ranks) I/O on an already-sorted export, no
    scan, no narrowing passes. The layout-reuse sibling of
    ``quantiles.exact_quantiles_wide`` (use that when the data is NOT
    already sorted). Negative ranks index from the end (−1 = max).

    → driver-side Table of the requested rows, with ``pos`` (global rank),
    in the order requested.
    """
    with open(f"{out_dir}/_MANIFEST") as f:
        man = json.load(f)
    offsets = np.array(man["offsets"], dtype=np.int64)
    counts = np.array(man["counts"], dtype=np.int64)
    total = int(man["rows"])
    out = []
    for r in ranks:
        k = r + total if r < 0 else r
        if not (0 <= k < total):
            raise IndexError(f"rank_lookup: rank {r} outside [0, {total})")
        p = int(np.searchsorted(offsets, k, side="right")) - 1
        # skip empty parts that share the same offset
        while counts[p] == 0:
            p -= 1
        path = f"{out_dir}/part-{p:05d}/data.parquet"
        if not os.path.exists(f"{out_dir}/part-{p:05d}/_DONE"):
            raise ValueError(f"rank_lookup: incomplete part {p} in {out_dir!r}")
        local = k - int(offsets[p])
        pf = pq.ParquetFile(path)
        # read only the row group containing the local row
        rg_rows = [pf.metadata.row_group(i).num_rows
                   for i in range(pf.num_row_groups)]
        rg_off = np.concatenate([[0], np.cumsum(rg_rows)])
        rg = int(np.searchsorted(rg_off, local, side="right")) - 1
        t = pf.read_row_group(rg)
        out.append(t.slice(local - int(rg_off[rg]), 1))
    return pa.concat_tables(out)
