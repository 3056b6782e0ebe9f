"""Composed training-data cleanroom pipeline: dedup → annotate → filter →
resumable partitioned sink."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from nightcrawlercmd_ray.pipelines.cleanroom import (
    cleanroom,
    read_partitioned,
    write_partitioned,
)

LONG = (
    "the quick brown fox jumps over the lazy dog and then runs far away into "
    "the deep green forest while the patient hunter watches quietly from a "
    "distance near the old stone bridge by the river"
)


def _doc_text(i):
    # every 4th word replaced by a doc-specific token: any 5-word shingle of
    # two different docs differs, so distinct docs are NOT near-dups at 0.8.
    # Long enough (~160 words) that the planted one-word-changed copy has
    # true Jaccard ≈ 0.97 — LSH miss probability ~1e-6 (not flake-prone).
    words = ((LONG + " ") * 4).split()
    ws = [f"tag{i}x{j}" if j % 4 == 0 else w for j, w in enumerate(words)]
    return f"document number {i} " + " ".join(ws)


def _corpus(path):
    rows = []
    for i in range(20):
        rows.append((i, _doc_text(i)))
    rows.append((100, rows[3][1]))  # exact dup of 3 (loser: 100)
    rows.append((101, rows[5][1]))  # exact dup of 5 (loser: 101)
    rows.append((102, rows[7][1].replace("quick", "swift", 1)))  # near dup of 7
    rows.append((103, "x"))  # too short: dropped by min_tokens
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(t, path)
    return rows


def test_cleanroom_end_to_end_and_resume(tmp_path):
    doc_path = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "out")
    _corpus(doc_path)

    ds, info = cleanroom(doc_path, out, min_tokens=3, num_partitions=4)
    ids = sorted(r["doc_id"] for r in ds.take_all())
    assert info["exact_dups"] == 2 and info["near_dups"] >= 1
    assert 100 not in ids and 101 not in ids and 102 not in ids  # dups dropped
    assert 103 not in ids  # junk filtered
    assert set(range(20)) <= set(ids)  # all originals survive
    # annotated columns present in the written output
    cols = set(ds.schema().names)
    assert {"quality", "n_tokens_ws", "detected_lang", "fingerprint"} <= cols
    written = info["write"]
    assert written["skipped"] == [] and written["rows"] == len(ids)

    # resume: drop ONE partition's marker+data; a re-run must rewrite only it
    parts = sorted(d for d in os.listdir(f"{out}/clean") if d.startswith("part-"))
    victim = parts[1]
    victim_id = int(victim.split("-", 1)[1])
    os.remove(f"{out}/clean/{victim}/_DONE")
    os.remove(f"{out}/clean/{victim}/data.parquet")
    mtimes = {
        d: os.path.getmtime(f"{out}/clean/{d}/data.parquet")
        for d in parts if d != victim
    }
    ds2, info2 = cleanroom(doc_path, out, min_tokens=3, num_partitions=4)
    w2 = info2["write"]
    assert w2["written"] == [victim_id]
    assert sorted(w2["skipped"] + w2["written"]) == [int(p.split("-", 1)[1]) for p in parts]
    for d, m in mtimes.items():  # untouched partitions were not rewritten
        assert os.path.getmtime(f"{out}/clean/{d}/data.parquet") == m
    assert sorted(r["doc_id"] for r in ds2.take_all()) == ids


def test_write_partitioned_atomic_markers(tmp_path, ray_docs_ds):
    out = str(tmp_path / "p")
    m = write_partitioned(ray_docs_ds, out, key_col="doc_id", num_partitions=3)
    assert m["rows"] == ray_docs_ds.count()
    for part in m["written"]:
        d = f"{out}/part-{part:05d}"
        assert json.load(open(f"{d}/_DONE"))["rows"] == pq.read_table(
            f"{d}/data.parquet"
        ).num_rows
    back = read_partitioned(out)
    assert back.count() == m["rows"]


def test_cleanroom_with_curation_stages(tmp_path):
    doc_path = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "out")
    rows = []
    for i in range(8):
        base = _doc_text(i)
        # plant PII and a repeated 3-word line boundary
        rows.append((i, base + f" mail u{i}@ex.net mail u{i}@ex.net"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(t, doc_path)

    ds, info = cleanroom(doc_path, out, min_tokens=3, num_partitions=2,
                         redact_pii=True, dedup_lines_words=3)
    got = {r["doc_id"]: r for r in ds.take_all()}
    assert set(got) == set(range(8))
    for i, r in got.items():
        assert "@" not in r["text"]            # redacted
        assert "<EMAIL>" in r["text"]
        assert r["n_emails"] >= 1
        lines = r["text"].split("\n")
        assert len(lines) == len(set(lines))   # no repeated 3-word lines
        assert r["n_lines_dropped"] >= 0
    # curation must not change WHICH docs survive dedup/quality
    ds2, info2 = cleanroom(doc_path, str(tmp_path / "out2"), min_tokens=3,
                           num_partitions=2)
    assert sorted(got) == sorted(r["doc_id"] for r in ds2.take_all())


def test_cleanroom_anti_join_path_matches_broadcast(tmp_path):
    """r2 verdict #3: with broadcast_limit=0 every dup set routes through the
    distributed hash anti-join — results must be identical to the broadcast
    fast path."""
    doc_a = str(tmp_path / "docs_a.parquet")
    doc_b = str(tmp_path / "docs_b.parquet")
    _corpus(doc_a)
    _corpus(doc_b)

    ds_b, info_b = cleanroom(doc_a, str(tmp_path / "out_bcast"), min_tokens=3,
                             num_partitions=4)
    ds_j, info_j = cleanroom(doc_b, str(tmp_path / "out_anti"), min_tokens=3,
                             num_partitions=4, broadcast_limit=0)
    assert info_j["exact_dups"] == info_b["exact_dups"]
    assert info_j["near_dups"] == info_b["near_dups"]
    ids_b = sorted(r["doc_id"] for r in ds_b.take_all())
    ids_j = sorted(r["doc_id"] for r in ds_j.take_all())
    assert ids_j == ids_b


def test_default_sidecar_is_input_keyed_no_cross_input_reuse(tmp_path):
    """Regression (r4 sf0.1 oracle audit): with out_dir=None the dup-set
    sidecars used to live in one shared /tmp dir, so a cleanroom run on a
    DIFFERENT corpus silently applied the previous corpus's duplicate ids.
    The default side_dir is now keyed by input identity — each corpus gets
    its own dup decisions without the caller managing directories."""
    import ray

    # corpus A: dup pair (3, 100)
    a_path = str(tmp_path / "a.parquet")
    _corpus(a_path)
    ds_a, info_a = cleanroom(a_path, None, minhash_threshold=None,
                             min_quality=None, min_tokens=1)
    ids_a = set(ds_a.to_pandas()["doc_id"])
    assert 100 not in ids_a and 101 not in ids_a and 3 in ids_a

    # corpus B: same doc ids but DIFFERENT dup structure (200 dups doc 9)
    rows = [(i, _doc_text(i)) for i in range(20)]
    rows.append((200, rows[9][1]))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    b_path = str(tmp_path / "b.parquet")
    pq.write_table(t, b_path)
    ds_b, info_b = cleanroom(b_path, None, minhash_threshold=None,
                             min_quality=None, min_tokens=1)
    ids_b = set(ds_b.to_pandas()["doc_id"])
    # B's own dup decision fires; A's decisions must NOT leak in
    assert 200 not in ids_b
    assert ids_b == set(range(20))
