"""Incremental corpus refresh (pipelines/refresh.py): end-to-end invariants
of the composed loop (diff → cross-corpus exact dedup → curation →
compaction) plus the bipartite exact-dup primitive's semantics and
partition invariance."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from nightcrawlercmd_ray.pipelines.refresh import (
    cross_exact_duplicate_ids,
    refresh_corpus,
)
from nightcrawlercmd_ray.stages.sortedsink import (
    read_sorted,
    write_sorted_partitioned,
)


def _docs(ids, texts, nparts=3):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(nparts)


@pytest.mark.parametrize("nparts", [1, 7])
def test_cross_exact_duplicate_ids_bipartite(nparts):
    """Only delta docs matching an OLD text are flagged: delta-internal
    duplicates and old-internal duplicates never produce rows."""
    old = _docs([1, 2, 3], ["alpha", "beta", "beta"], nparts)
    delta = _docs([10, 11, 12, 13],
                  ["alpha", "gamma", "gamma", "beta"], nparts)
    got = sorted(r["doc_id"] for r in
                 cross_exact_duplicate_ids(old, delta).take_all())
    # 10 matches old 'alpha', 13 matches old 'beta'; 11/12 (delta-internal
    # dup pair) and old-internal 2/3 are NOT flagged
    assert got == [10, 13]


def test_refresh_corpus_invariants(tmp_path):
    """The merged corpus = old ∪ curated survivors: no survivor text
    duplicates an old text, no survivor shorter than min_chars, changed
    docs appear under version-offset ids, ranks are exact."""
    rng = np.random.default_rng(8)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    base_texts = [f"document body number {i} " + "x" * int(rng.integers(5, 40))
                  for i in ids]
    old_ids = ids[ids % 4 != 0]
    old = _docs(old_ids.tolist(), [base_texts[i] for i in old_ids])
    new_texts = []
    for i in ids:
        if i % 13 == 0 and i % 4 == 0:
            new_texts.append(base_texts[(i + 1) % n])  # exact dup of old
        elif i % 17 == 0:
            new_texts.append("tiny")                    # below min_chars
        elif i % 3 == 0:
            new_texts.append(base_texts[i] + " v2")     # changed
        else:
            new_texts.append(base_texts[i])
    new = _docs(ids.tolist(), new_texts)

    def keyed(t):
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        })

    base_dir = str(tmp_path / "base")
    out_dir = str(tmp_path / "out")
    write_sorted_partitioned(
        old.map_batches(keyed, batch_format="pyarrow"), base_dir,
        key_col="n_chars", tie_col="doc_id", num_partitions=5,
    )
    stats = refresh_corpus(old, new, base_dir, out_dir, min_chars=8)
    assert stats["work"] > 0 and stats["dup_dropped"] > 0
    back = (read_sorted(out_dir).to_pandas()
            .sort_values("pos").reset_index(drop=True))
    assert back["pos"].tolist() == list(range(len(back)))
    key = back["n_chars"].values * (1 << 32) + back["doc_id"].values
    assert (np.diff(key) > 0).all()
    assert stats["merged_rows"] == len(back)
    # old rows all present under their natural ids
    olds = back[back["doc_id"] < 1_000_000_000]
    assert sorted(olds["doc_id"]) == sorted(old_ids.tolist())
    # survivors: version-offset ids, none dup of old, none under min_chars
    surv = back[back["doc_id"] >= 1_000_000_000]
    assert len(surv) == stats["work"] - stats["dup_dropped"] - sum(
        1 for i in ids
        if i % 17 == 0 and not (i % 13 == 0 and i % 4 == 0)
        and not (i % 4 != 0 and new_texts[i] == base_texts[i]))
    assert (surv["n_chars"] >= 8).all()


def test_refresh_counters_partition_work_set(tmp_path):
    """work = dup_dropped + short_dropped + survivors, and the merged total
    is base + survivors — the documented counter contract."""
    old = _docs([1, 2, 3], ["alpha document body", "beta document body",
                            "gamma document body"])
    new = _docs([1, 4, 5, 6],
                ["alpha document body CHANGED",  # changed → survivor
                 "beta document body",           # added, dup of old 2
                 "tiny",                         # added, length-gated
                 "delta document body"])         # added → survivor
    base_dir = str(tmp_path / "b")
    out_dir = str(tmp_path / "o")

    def keyed(t):
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        })

    write_sorted_partitioned(
        old.map_batches(keyed, batch_format="pyarrow"), base_dir,
        key_col="n_chars", tie_col="doc_id", num_partitions=2,
    )
    stats = refresh_corpus(old, new, base_dir, out_dir, min_chars=8)
    assert stats["work"] == 4
    assert stats["dup_dropped"] == 1
    assert stats["short_dropped"] == 1
    assert stats["survivors"] == 2
    assert stats["merged_rows"] == 3 + 2


def test_refresh_forced_distributed_path(tmp_path):
    """broadcast_limit=0 forces the semi/anti hash_join fallback for BOTH
    id sets (work + dup) — the 100-TB full-re-snapshot path. Stats and the
    merged corpus must be identical to the broadcast path."""
    rng = np.random.default_rng(11)
    n = 200
    ids = np.arange(n, dtype=np.int64)
    base_texts = [f"body of document {i} " + "y" * int(rng.integers(4, 30))
                  for i in ids]
    old_ids = ids[ids % 5 != 0]
    old = _docs(old_ids.tolist(), [base_texts[i] for i in old_ids])
    new_texts = []
    for i in ids:
        if i % 10 == 0 and i % 5 == 0:
            new_texts.append(base_texts[(i + 2) % n])  # dup of an old text
        elif i % 7 == 0:
            new_texts.append("tiny")
        elif i % 3 == 0:
            new_texts.append(base_texts[i] + " v2")
        else:
            new_texts.append(base_texts[i])
    new = _docs(ids.tolist(), new_texts)

    def keyed(t):
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        })

    outs = {}
    for label, limit in (("broadcast", 1 << 21), ("join", 0)):
        base_dir = str(tmp_path / f"base_{label}")
        out_dir = str(tmp_path / f"out_{label}")
        write_sorted_partitioned(
            old.map_batches(keyed, batch_format="pyarrow"), base_dir,
            key_col="n_chars", tie_col="doc_id", num_partitions=4,
        )
        stats = refresh_corpus(old, new, base_dir, out_dir, min_chars=8,
                               broadcast_limit=limit)
        back = (read_sorted(out_dir).to_pandas()
                .sort_values("pos").reset_index(drop=True))
        outs[label] = (stats, back)
    sb, bb = outs["broadcast"]
    sj, bj = outs["join"]
    assert {k: v for k, v in sb.items() if k != "manifest"} == \
        {k: v for k, v in sj.items() if k != "manifest"}
    assert sb["work"] > 0 and sb["dup_dropped"] > 0
    assert bb[["doc_id", "n_chars", "pos"]].equals(bj[["doc_id", "n_chars",
                                                      "pos"]])


def test_refresh_delete_missing_tombstones(tmp_path):
    """delete_missing=True drops docs the new snapshot removed: they vanish
    from the merged corpus, ranks recompute densely, and the counters carry
    the removed count."""
    old = _docs([1, 2, 3, 4], ["alpha document body", "beta document body",
                               "gamma document body", "delta document body"])
    # doc 2 and 4 are gone from the new snapshot; 1 unchanged; 3 changed
    new = _docs([1, 3, 5],
                ["alpha document body",
                 "gamma document body CHANGED",
                 "epsilon document body"])
    base_dir = str(tmp_path / "b")
    out_dir = str(tmp_path / "o")

    def keyed(t):
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        })

    write_sorted_partitioned(
        old.map_batches(keyed, batch_format="pyarrow"), base_dir,
        key_col="n_chars", tie_col="doc_id", num_partitions=2,
    )
    stats = refresh_corpus(old, new, base_dir, out_dir, min_chars=8,
                           delete_missing=True)
    assert stats["removed"] == 2
    assert stats["work"] == 2          # changed 3 + added 5
    assert stats["survivors"] == 2
    assert stats["merged_rows"] == 4 - 2 + 2
    back = (read_sorted(out_dir).to_pandas()
            .sort_values("pos").reset_index(drop=True))
    assert back["pos"].tolist() == list(range(len(back)))
    natural = set(back.loc[back["doc_id"] < 1_000_000_000, "doc_id"])
    assert natural == {1, 3}           # 2 and 4 tombstoned away
    key = back["n_chars"].values * (1 << 32) + back["doc_id"].values
    assert (np.diff(key) > 0).all()


def test_refresh_pure_deletion(ray_session, tmp_path):
    """A refresh whose new snapshot ONLY removes docs (zero added/changed)
    must compact cleanly — the empty survivor delta carries no schema, so
    compact_sorted derives the row shape from the base parts (pre-fix this
    crashed with AttributeError on schema().names)."""
    import pyarrow.compute as pc
    import ray

    from nightcrawlercmd_ray.pipelines.refresh import refresh_corpus
    from nightcrawlercmd_ray.stages.sortedsink import (
        read_sorted,
        write_sorted_partitioned,
    )

    old_rows = [{"doc_id": i, "text": f"document number {i} with body"}
                for i in range(1, 6)]
    old = ray.data.from_items(old_rows)

    def keyed(t):
        return t.append_column(
            "n_chars", pc.cast(pc.utf8_length(t.column("text")), "int64"))

    base = str(tmp_path / "base")
    write_sorted_partitioned(
        old.map_batches(keyed, batch_format="pyarrow"), base,
        key_col="n_chars", tie_col="doc_id", num_partitions=3)
    new = ray.data.from_items(
        [r for r in old_rows if r["doc_id"] not in (2, 4)])
    res = refresh_corpus(old, new, base, str(tmp_path / "out"),
                         delete_missing=True)
    assert res["work"] == 0 and res["removed"] == 2
    assert res["survivors"] == 0 and res["merged_rows"] == 3
    out = read_sorted(str(tmp_path / "out")).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3, 5]


def test_compact_misskeyed_tombstones_fail_before_any_write(
        ray_session, tmp_path):
    """A tombstone whose key matches no base row (e.g. keyed against text
    the base was NOT sorted on — the multi-generation pitfall) must raise
    BEFORE any part is written, leaving out_dir with zero completed parts."""
    import os

    import pyarrow.compute as pc
    import pytest
    import ray

    from nightcrawlercmd_ray.stages.sortedsink import (
        compact_sorted,
        write_sorted_partitioned,
    )

    old = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i} text body here"} for i in range(8)])

    def keyed(t):
        return t.append_column(
            "n_chars", pc.cast(pc.utf8_length(t.column("text")), "int64"))

    base = str(tmp_path / "base")
    write_sorted_partitioned(
        old.map_batches(keyed, batch_format="pyarrow"), base,
        key_col="n_chars", tie_col="doc_id", num_partitions=2)
    delta = ray.data.from_items(
        [{"doc_id": 100, "text": "added doc", "n_chars": 9}])
    # tombstone with a WRONG n_chars for doc 3 (its real key differs)
    tomb = ray.data.from_items([{"doc_id": 3, "n_chars": 999}])
    out = str(tmp_path / "out")
    with pytest.raises(ValueError, match="tombstone"):
        compact_sorted(base, delta, out, tombstone_ds=tomb)
    done = [d for d in os.listdir(out)
            if d.startswith("part-")
            and os.path.exists(f"{out}/{d}/_DONE")]
    assert done == []  # fail-fast: nothing was written
