"""Incremental corpus refresh — the production operating loop that composes
this engine's snapshot/dedup/curation/sorted-sink pieces end-to-end:

    new crawl snapshot
      → snapshot_diff vs the previous snapshot (which docs actually changed)
      → cross-corpus dedup of the changed/added work set against the
        EXISTING corpus (exact 128-bit content match here; the near-dup
        variant is `stages.dedup.incremental_dedup` and drops in at the
        same point)
      → curation (PII redaction, minimum-length gate)
      → LSM compaction of the survivors into the sorted base corpus
        (`stages.sortedsink.compact_sorted`: base never re-sorts or moves).

Semantics are append-only (LSM level-0) by default: a changed document's
new version is appended under a version-offset id; readers take the latest
version per natural id. Deletion: ``delete_missing=True`` turns docs with
diff status ``removed`` into tombstones applied during compaction
(``stages.sortedsink.compact_sorted(tombstone_ds=...)`` — the touched base
parts drop those rows and ranks recompute); the default keeps the
append-only level-0 semantics.

Scale shape: every stage is an existing audited component — the diff and
dedup exchanges carry compact (id, hash) rows (never text), curation is a
pure map, and compaction shuffles ONLY the survivor delta. The work-id and
dup-id sets broadcast only while ≤ ``broadcast_limit``; past the gate they
route through the distributed semi/anti ``hash_join`` (compact id rows,
object store, never folded on the driver) — the full-re-snapshot case
where added+changed ≈ O(corpus) stays streaming.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import _content_hashes, _num_coarse_partitions, anti_join_ids
from ..stages.joins import content_hashes, hash_join, snapshot_diff
from ..stages.sortedsink import compact_sorted


def cross_exact_duplicate_ids(old_ds, delta_ds, *, text_col: str = "text",
                              id_col: str = "doc_id",
                              num_partitions: int | None = None,
                              n_rows: int | None = None):
    """→ Dataset(doc_id) of DELTA docs whose text exactly matches ANY old
    doc (two-seed 128-bit content hash — collision-safe at the 10^10
    design point). The bipartite analog of `exact_duplicate_ids`: sides
    ride one union + ONE coarse hash-keyed exchange as compact
    (id, h1, h2, side) rows; old×old and delta×delta pairs are never
    considered; per partition one lexsort + run mask finds delta rows
    sharing a hash run with an old row — no per-group dispatch."""
    import ray  # noqa: F401 — ray.data reached via the datasets

    P = _num_coarse_partitions(old_ds, num_partitions, n_rows,
                               rows_per_partition=262144)

    def hash_rows(side: int):
        def fn(t: pa.Table) -> pa.Table:
            h1, h2 = _content_hashes(t.column(text_col))
            coarse = (h1.view(np.uint64) % np.uint64(P)).astype(np.int64)
            return pa.table({
                "doc_id": pc.cast(t.column(id_col), pa.int64()),
                "_h1": pa.array(h1), "_h2": pa.array(h2),
                "_side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)),
                "_coarse": pa.array(coarse),
            })
        return fn

    stream = old_ds.map_batches(hash_rows(0), batch_format="pyarrow").union(
        delta_ds.map_batches(hash_rows(1), batch_format="pyarrow"))

    def partition_dups(g: pa.Table) -> pa.Table:
        h1 = g.column("_h1").to_numpy(zero_copy_only=False)
        h2 = g.column("_h2").to_numpy(zero_copy_only=False)
        side = g.column("_side").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, h2, h1))  # old (0) first within a run
        a, b, s, i = h1[order], h2[order], side[order], ids[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        run_id = np.cumsum(first) - 1
        n_runs = run_id[-1] + 1 if len(run_id) else 0
        has_old = np.zeros(n_runs, dtype=bool)
        np.logical_or.at(has_old, run_id, s == 0)
        dup = (s == 1) & has_old[run_id]
        return pa.table({"doc_id": pa.array(i[dup])})

    return (stream.groupby("_coarse")
            .map_groups(partition_dups, batch_format="pyarrow"))


def refresh_corpus(old_ds, new_ds, base_dir: str, out_dir: str, *,
                   text_col: str = "text", id_col: str = "doc_id",
                   min_chars: int = 1, version_offset: int = 1_000_000_000,
                   broadcast_limit: int = 1 << 21,
                   delete_missing: bool = False,
                   n_rows: int | None = None) -> dict:
    """Run the refresh loop (module docstring) and compact survivors into
    ``out_dir`` on top of the sorted base at ``base_dir`` (a
    `write_sorted_partitioned` directory of the old corpus keyed on
    (n_chars, doc_id)). Survivor ids carry ``version_offset`` so versions
    coexist under the sink's total order. ``delete_missing=True`` also
    tombstones docs the new snapshot dropped (diff status ``removed``) out
    of the merged corpus. Returns counter dict: {work, dup_dropped,
    short_dropped, survivors, removed, merged_rows, manifest}.

    Id sets ≤ ``broadcast_limit`` broadcast once (zero shuffle, vectorized
    ``is_in``); larger sets — the full-re-snapshot case where added+changed
    is corpus-sized — route through the distributed semi/anti
    ``stages.joins.hash_join`` so no id set ever folds on the driver.
    """
    import ray  # noqa: F401 — workers resolve broadcast refs via ray.get

    from ..stages.curation import pii_redact

    old_h = content_hashes(old_ds, text_col=text_col, id_col=id_col)
    new_h = content_hashes(new_ds, text_col=text_col, id_col=id_col)
    diff = snapshot_diff(old_h, new_h, on=id_col, n_rows=n_rows)
    if delete_missing:
        # one diff, three consumers (work ids, removed ids) — run it once
        diff = diff.materialize()

    def status_ids(*wanted: str):
        vs = pa.array(list(wanted))

        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("status"), value_set=vs))
            return pa.table(
                {id_col: pc.cast(t.column(id_col), pa.int64())})

        return fn

    # work set: added + changed ids — compact id rows, materialized in the
    # object store (spillable, never driver memory) so count + reuse cost
    # one execution
    work = diff.map_batches(
        status_ids("added", "changed"), batch_format="pyarrow").materialize()
    n_work = work.count()
    new_names = new_ds.schema().names

    if n_work <= broadcast_limit:
        work_ids = pa.array(
            sorted(r[id_col] for r in work.take_all()), pa.int64())
        work_ref = ray.put(work_ids)

        def keep_work(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(pc.cast(t.column(id_col), pa.int64()),
                                     value_set=ray.get(work_ref)))

        delta = new_ds.map_batches(keep_work, batch_format="pyarrow")
    else:
        # distributed fallback: semi hash_join narrows new_ds to the work
        # set without the id set ever leaving the cluster. The join is a
        # full keyed exchange and delta feeds TWO consumers (cross-corpus
        # dedup + the survivor chain) — materialize so it runs once.
        delta = hash_join(new_ds, work, on=id_col, how="semi",
                          n_rows=n_rows).select_columns(new_names)
        delta = delta.materialize()

    dups = cross_exact_duplicate_ids(
        old_ds, delta, text_col=text_col, id_col=id_col,
        n_rows=n_rows).materialize()
    n_dup = dups.count()
    survivors = pii_redact(
        anti_join_ids(delta, dups, id_col, broadcast_limit=broadcast_limit,
                      n_rows=n_rows, n_dups=n_dup),
        text_col=text_col)

    def finish(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t.column(text_col))
        keep = pc.greater_equal(n_chars, pa.scalar(min_chars, pa.int32()))
        t = t.filter(keep)
        return pa.table({
            id_col: pc.add(pc.cast(t.column(id_col), pa.int64()),
                           pa.scalar(version_offset, pa.int64())),
            "n_chars": pc.cast(
                pc.utf8_length(t.column(text_col)), pa.int64()),
        })

    survivor_keys = survivors.map_batches(finish, batch_format="pyarrow")

    tomb = None
    n_removed = 0
    if delete_missing:
        removed = diff.map_batches(
            status_ids("removed"), batch_format="pyarrow").materialize()
        n_removed = removed.count()
        if n_removed:
            # tombstones carry the base's sort key — (n_chars of the OLD
            # text, id) — so compaction can route them to their base part.
            # Narrow old_ds to the removed ids with the same gated pattern.
            old_names = old_ds.schema().names
            if n_removed <= broadcast_limit:
                rem_ids = pa.array(
                    sorted(r[id_col] for r in removed.take_all()), pa.int64())
                rem_ref = ray.put(rem_ids)

                def keep_removed(t: pa.Table) -> pa.Table:
                    return t.filter(pc.is_in(
                        pc.cast(t.column(id_col), pa.int64()),
                        value_set=ray.get(rem_ref)))

                old_removed = old_ds.map_batches(
                    keep_removed, batch_format="pyarrow")
            else:
                old_removed = hash_join(
                    old_ds, removed, on=id_col, how="semi",
                    n_rows=n_rows).select_columns(old_names)

            def tomb_keys(t: pa.Table) -> pa.Table:
                return pa.table({
                    id_col: pc.cast(t.column(id_col), pa.int64()),
                    "n_chars": pc.cast(
                        pc.utf8_length(t.column(text_col)), pa.int64()),
                })

            tomb = old_removed.map_batches(tomb_keys, batch_format="pyarrow")

    man = compact_sorted(base_dir, survivor_keys, out_dir, tombstone_ds=tomb)
    with open(f"{base_dir}/_MANIFEST") as f:
        base_rows = json.load(f)["rows"]
    n_survivors = int(man["rows"]) - int(base_rows) + n_removed
    return {
        "work": n_work,
        "dup_dropped": n_dup,
        "short_dropped": n_work - n_dup - n_survivors,
        "survivors": n_survivors,
        "removed": n_removed,
        "merged_rows": int(man["rows"]),
        "manifest": man,
    }
