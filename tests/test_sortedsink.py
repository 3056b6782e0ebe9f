"""Range-partitioned globally-sorted resumable sink
(stages/sortedsink.write_sorted_partitioned): exact global ranks at any
partitioning, range-ordered read-back, and resume that rewrites only the
missing parts bit-identically."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.sortedsink import (
    read_sorted,
    write_sorted_partitioned,
)

OUT = "/tmp/ncrawler_test_sorted"


def _data(n=2500, seed=4):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "n_chars": pa.array(rng.integers(0, 300, n).astype(np.int64)),
        "lang": pa.array(rng.choice(["en", "de"], n)),
    })


def _expected(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas().sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    df["pos"] = np.arange(len(df), dtype=np.int64)
    return df


@pytest.mark.parametrize("nparts", [1, 7])
def test_sorted_sink_global_ranks(nparts):
    t = _data()
    shutil.rmtree(OUT, ignore_errors=True)
    ds = ray.data.from_arrow(t).repartition(nparts)
    man = write_sorted_partitioned(
        ds, OUT, key_col="n_chars", tie_col="doc_id", num_partitions=6,
        n_rows=t.num_rows,
    )
    assert man["rows"] == t.num_rows and len(man["written"]) >= 1
    got = read_sorted(OUT).to_pandas().sort_values("pos").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_chars", "lang", "pos"]],
        _expected(t)[["doc_id", "n_chars", "lang", "pos"]],
    )
    # file order IS the sort order: per-part key ranges are disjoint+ordered
    parts = sorted(d for d in os.listdir(OUT) if d.startswith("part-"))
    last_hi = -1
    for d in parts:
        df = pd.read_parquet(f"{OUT}/{d}/data.parquet")
        if df.empty:
            continue
        k = df["n_chars"] * (1 << 32) + df["doc_id"]
        assert k.is_monotonic_increasing
        assert k.iloc[0] > last_hi
        last_hi = int(k.iloc[-1])


def test_sorted_sink_resume_rewrites_only_missing():
    t = _data(1400, seed=9)
    shutil.rmtree(OUT, ignore_errors=True)
    ds = ray.data.from_arrow(t).repartition(3)
    write_sorted_partitioned(ds, OUT, key_col="n_chars", tie_col="doc_id",
                             num_partitions=5, n_rows=t.num_rows)
    before = {
        d: open(f"{OUT}/{d}/data.parquet", "rb").read()
        for d in os.listdir(OUT) if d.startswith("part-")
    }
    victim = sorted(before)[2]
    os.remove(f"{OUT}/{victim}/_DONE")
    os.remove(f"{OUT}/{victim}/data.parquet")
    man2 = write_sorted_partitioned(ds, OUT, key_col="n_chars",
                                    tie_col="doc_id", num_partitions=5,
                                    n_rows=t.num_rows)
    assert man2["written"] == [int(victim.split("-")[1])]
    assert len(man2["skipped"]) == len(before) - 1
    after = {
        d: open(f"{OUT}/{d}/data.parquet", "rb").read()
        for d in os.listdir(OUT) if d.startswith("part-")
    }
    assert after == before  # bit-identical, including the rewritten part
    got = read_sorted(OUT).to_pandas().sort_values("pos").reset_index(drop=True)
    assert np.array_equal(got["pos"].to_numpy(), np.arange(t.num_rows))


def test_sorted_sink_duplicate_keys_and_tiny_sample():
    # heavy key ties + sample smaller than partitions: boundaries dedup,
    # empty parts allowed, ranks still exact
    n = 400
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_chars": pa.array(np.zeros(n, dtype=np.int64)),  # all-equal keys
    })
    shutil.rmtree(OUT, ignore_errors=True)
    write_sorted_partitioned(ray.data.from_arrow(t), OUT, key_col="n_chars",
                             tie_col="doc_id", num_partitions=8,
                             n_rows=n, max_sample=16)
    got = read_sorted(OUT).to_pandas().sort_values("pos")
    assert np.array_equal(got["doc_id"].to_numpy(), np.arange(n))


def test_epoch_shuffle_query_epochs_differ():
    """epoch_shuffle (registry query shape): rank by hashed id — shuffled
    vs id order, deterministic per epoch, different across epochs."""
    from nightcrawlercmd_ray.stages.sampling import shuffle_hash
    from nightcrawlercmd_ray.stages.sortedsink import (
        read_sorted,
        write_sorted_partitioned,
    )

    n = 1200
    ids = np.arange(n, dtype=np.int64)

    def run(epoch):
        out = f"{OUT}-epoch{epoch}"
        shutil.rmtree(out, ignore_errors=True)
        h = (shuffle_hash(ids, epoch) // np.uint64(2)).astype(np.int64)
        t = pa.table({"doc_id": pa.array(ids), "_shuf": pa.array(h)})
        write_sorted_partitioned(
            ray.data.from_arrow(t).repartition(4), out,
            key_col="_shuf", tie_col="doc_id", num_partitions=5, n_rows=n,
        )
        got = read_sorted(out).to_pandas().sort_values("pos")
        # serial expectation
        exp = ids[np.lexsort((ids, h))]
        assert np.array_equal(got["doc_id"].to_numpy(), exp)
        return tuple(got["doc_id"])

    e1, e1b, e2 = run(1), run(1), run(2)
    assert e1 == e1b          # deterministic within an epoch
    assert e1 != e2           # re-dealt across epochs
    assert e1 != tuple(ids)   # actually shuffled


# --------------------------------------------------------------------------- #
# compaction (stages/sortedsink.compact_sorted)
# --------------------------------------------------------------------------- #
from nightcrawlercmd_ray.stages.sortedsink import compact_sorted  # noqa: E402

CBASE = "/tmp/ncrawler_test_compact_base"
COUT = "/tmp/ncrawler_test_compact_out"


def _split(t: pa.Table, pred):
    mask = pred(t.column("doc_id").to_numpy(zero_copy_only=False))
    return t.filter(pa.array(mask)), t.filter(pa.array(~mask))


def _compact_setup(pred, n=2500, nparts=6):
    """Write base = pred rows, compact in the complement as the delta."""
    t = _data(n)
    base_t, delta_t = _split(t, pred)
    shutil.rmtree(CBASE, ignore_errors=True)
    shutil.rmtree(COUT, ignore_errors=True)
    write_sorted_partitioned(
        ray.data.from_arrow(base_t).repartition(5), CBASE,
        key_col="n_chars", tie_col="doc_id", num_partitions=nparts,
        n_rows=base_t.num_rows,
    )
    man = compact_sorted(
        CBASE, ray.data.from_arrow(delta_t).repartition(7), COUT)
    return t, man


def test_compact_sorted_equals_full_rewrite():
    """Compacted read-back == the full union written from scratch (exact
    ranks, every column), for a delta spread across the key range."""
    t, man = _compact_setup(lambda ids: ids % 3 != 0)
    assert man["rows"] == t.num_rows
    got = (read_sorted(COUT).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_chars", "lang", "pos"]],
        _expected(t)[["doc_id", "n_chars", "lang", "pos"]],
    )


def test_compact_tail_append_links_untouched_parts():
    """Append-at-tail delta (all delta keys > every base key): every base
    part is carried by HARD LINK (zero IO) except the last range."""
    t = _data(1500)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    keys = t.column("n_chars").to_numpy(zero_copy_only=False)
    cut = np.quantile(keys, 0.9)
    base_t = t.filter(pa.array(keys <= cut))
    delta_t = t.filter(pa.array(keys > cut))
    assert delta_t.num_rows > 0
    shutil.rmtree(CBASE, ignore_errors=True)
    shutil.rmtree(COUT, ignore_errors=True)
    write_sorted_partitioned(
        ray.data.from_arrow(base_t).repartition(4), CBASE,
        key_col="n_chars", tie_col="doc_id", num_partitions=6,
        n_rows=base_t.num_rows,
    )
    man = compact_sorted(CBASE, ray.data.from_arrow(delta_t), COUT)
    # correctness of the merged whole
    got = (read_sorted(COUT).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_chars", "lang", "pos"]],
        _expected(t)[["doc_id", "n_chars", "lang", "pos"]],
    )
    # zero-IO carry: every carried part shares its inode with the base file
    assert man["carried"], "tail-append delta should carry early parts"
    for part in man["carried"]:
        a = os.stat(f"{CBASE}/part-{part:05d}/data.parquet")
        b = os.stat(f"{COUT}/part-{part:05d}/data.parquet")
        assert a.st_ino == b.st_ino, f"part {part} was rewritten, not linked"


def test_compact_resume_rewrites_only_missing_parts():
    t, man = _compact_setup(lambda ids: ids % 2 == 0)
    before = (read_sorted(COUT).to_pandas()
              .sort_values("pos").reset_index(drop=True))
    victim = man["written"][0]
    os.remove(f"{COUT}/part-{victim:05d}/_DONE")
    delta_t = _split(t, lambda ids: ids % 2 == 0)[1]
    man2 = compact_sorted(CBASE, ray.data.from_arrow(delta_t), COUT)
    assert man2["written"] == [victim]
    assert set(man2["skipped"]) == set(man["written"]) - {victim}
    after = (read_sorted(COUT).to_pandas()
             .sort_values("pos").reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after)


def test_compact_sorted_tombstones_delete_and_rerank():
    """``tombstone_ds`` deletes its matched base rows in the SAME
    compaction pass as the delta merge: read-back == a full rewrite of
    (base − tombstoned) ∪ delta with exact dense ranks."""
    t = _data(1200, seed=9)
    base_t, delta_t = _split(t, lambda i: i % 3 != 0)
    bids = base_t.column("doc_id").to_numpy(zero_copy_only=False)
    dead_mask = bids % 5 == 0
    dead = base_t.filter(pa.array(dead_mask))
    assert dead.num_rows > 0
    shutil.rmtree(CBASE, ignore_errors=True)
    shutil.rmtree(COUT, ignore_errors=True)
    write_sorted_partitioned(
        ray.data.from_arrow(base_t).repartition(5), CBASE,
        key_col="n_chars", tie_col="doc_id", num_partitions=6,
        n_rows=base_t.num_rows,
    )
    tomb = ray.data.from_arrow(
        dead.select(["n_chars", "doc_id"])).repartition(3)
    man = compact_sorted(
        CBASE, ray.data.from_arrow(delta_t).repartition(7), COUT,
        tombstone_ds=tomb)
    surv = pa.concat_tables(
        [base_t.filter(pa.array(~dead_mask)), delta_t])
    assert man["rows"] == surv.num_rows
    assert man["removed"] == dead.num_rows
    got = (read_sorted(COUT).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_chars", "lang", "pos"]],
        _expected(surv)[["doc_id", "n_chars", "lang", "pos"]],
    )


def test_compact_sorted_tombstone_miss_raises():
    """A tombstone matching no base row must raise, not drift the counts."""
    t = _data(400, seed=10)
    base_t, delta_t = _split(t, lambda i: i % 2 == 0)
    shutil.rmtree(CBASE, ignore_errors=True)
    shutil.rmtree(COUT, ignore_errors=True)
    write_sorted_partitioned(
        ray.data.from_arrow(base_t).repartition(3), CBASE,
        key_col="n_chars", tie_col="doc_id", num_partitions=4,
        n_rows=base_t.num_rows,
    )
    ghost = pa.table({
        "n_chars": pa.array([5], pa.int64()),
        # an ODD id is never in the base split — no base row matches
        "doc_id": pa.array([1], pa.int64()),
    })
    with pytest.raises(Exception, match="tombstone"):
        compact_sorted(CBASE, ray.data.from_arrow(delta_t), COUT,
                       tombstone_ds=ray.data.from_arrow(ghost))


def test_compact_base_before_delta_on_ties():
    """Exact (key, tie) collisions across sides keep base rows first —
    deterministic multiset-merge semantics."""
    base_t = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "n_chars": pa.array([5, 5], pa.int64()),
        "lang": pa.array(["base", "base"]),
    })
    delta_t = pa.table({
        "doc_id": pa.array([7, 6], pa.int64()),
        "n_chars": pa.array([5, 5], pa.int64()),
        "lang": pa.array(["delta", "delta"]),
    })
    shutil.rmtree(CBASE, ignore_errors=True)
    shutil.rmtree(COUT, ignore_errors=True)
    write_sorted_partitioned(
        ray.data.from_arrow(base_t), CBASE, key_col="n_chars",
        tie_col="doc_id", num_partitions=2, n_rows=2,
    )
    compact_sorted(CBASE, ray.data.from_arrow(delta_t), COUT)
    got = (read_sorted(COUT).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    assert got["doc_id"].tolist() == [6, 7, 7, 8]
    assert got["lang"].tolist() == ["delta", "base", "delta", "base"]


def test_read_sorted_range_prunes_and_is_exact():
    """Range reads return exactly the in-range rows while opening only the
    parts whose boundary interval overlaps — I/O ∝ range, not corpus."""
    from nightcrawlercmd_ray.stages.sortedsink import read_sorted_range

    t = _data(3000)
    shutil.rmtree(OUT, ignore_errors=True)
    write_sorted_partitioned(
        ray.data.from_arrow(t).repartition(6), OUT,
        key_col="n_chars", tie_col="doc_id", num_partitions=10,
        n_rows=t.num_rows,
    )
    df = t.to_pandas()
    for lo, hi in [(50, 80), (0, 0), (250, None), (None, 10)]:
        ds, n_parts = read_sorted_range(OUT, lo=lo, hi=hi, key_col="n_chars")
        got = ds.to_pandas().sort_values("pos").reset_index(drop=True)
        m = df
        if lo is not None:
            m = m[m["n_chars"] >= lo]
        if hi is not None:
            m = m[m["n_chars"] <= hi]
        exp = (m.sort_values(["n_chars", "doc_id"])
               .reset_index(drop=True))
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), (lo, hi)
        total_parts = sum(1 for d in os.listdir(OUT) if d.startswith("part-"))
        if lo is not None and hi is not None and hi - lo < 50:
            assert n_parts < total_parts, (lo, hi, n_parts, total_parts)
    # full-range read == read_sorted
    ds_all, n_all = read_sorted_range(OUT, key_col="n_chars")
    assert ds_all.count() == t.num_rows
    with pytest.raises(ValueError, match="does not match"):
        read_sorted_range(OUT, lo=1, hi=2, key_col="doc_id")


def test_compact_and_range_read_error_edges(tmp_path):
    """Clear errors on misuse: compacting onto a directory with no
    manifest, and a range read with no overlapping completed parts."""
    from nightcrawlercmd_ray.stages.sortedsink import (
        compact_sorted,
        read_sorted_range,
    )

    delta = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "n_chars": pa.array([5], pa.int64())}))
    with pytest.raises(FileNotFoundError):
        compact_sorted(str(tmp_path / "nobase"), delta,
                       str(tmp_path / "out"))
    # a real base, then a range query beyond every key
    base = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "n_chars": pa.array([5, 6], pa.int64())})
    bdir = str(tmp_path / "base")
    write_sorted_partitioned(
        ray.data.from_arrow(base), bdir, key_col="n_chars",
        tie_col="doc_id", num_partitions=2, n_rows=2)
    ds, n_parts = read_sorted_range(bdir, lo=999, hi=2000,
                                    key_col="n_chars")
    # boundary pruning keeps at least the last part; the exact trim
    # leaves zero rows
    assert ds.count() == 0 and n_parts >= 1
    # inverted range: empty result, no crash
    ds2, _ = read_sorted_range(bdir, lo=6, hi=5, key_col="n_chars")
    assert ds2.count() == 0


def test_read_sorted_range_boundary_key_included(tmp_path):
    """Regression: a row whose packed key EQUALS a partition boundary was
    dropped when hi equaled that boundary (reader pruned with side='left'
    while the writer assigns with side='right')."""
    from nightcrawlercmd_ray.stages.sortedsink import read_sorted_range

    t = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "n_chars": pa.array([i // 2 for i in range(40)], pa.int64()),
    })
    d = str(tmp_path / "s")
    write_sorted_partitioned(
        ray.data.from_arrow(t), d, key_col="n_chars", tie_col="doc_id",
        num_partitions=5, n_rows=40)
    import json

    bounds = json.load(open(f"{d}/_MANIFEST"))["boundaries"]
    assert bounds, "need at least one boundary for the regression"
    # query hi exactly at each packed boundary: every key <= hi must appear
    df = t.to_pandas()
    for b in bounds:
        key_hi = b >> 32          # the key part of the packed boundary
        ds, _ = read_sorted_range(d, hi=key_hi, key_col="n_chars")
        got = sorted(ds.to_pandas()["doc_id"])
        exp = sorted(df[df["n_chars"] <= key_hi]["doc_id"])
        assert got == exp, (b, key_hi)
    # packed-mode: hi EXACTLY a boundary value (a real row's packed key —
    # boundaries come from the key sample) — the old side='left' cut
    # dropped precisely this row
    packed = df["n_chars"].to_numpy() * (1 << 32) + df["doc_id"].to_numpy()
    for b in bounds:
        ds, _ = read_sorted_range(d, hi=int(b))
        got = sorted(ds.to_pandas()["doc_id"])
        exp = sorted(df[packed <= b]["doc_id"])
        assert got == exp, b
        assert (packed == b).any()  # the boundary row itself exists


# --------------------------------------------------------------------------- #
# layout-aware zipper join
# --------------------------------------------------------------------------- #
def _zipper_inputs(tmp_path, seed=50, na=20000, nb=5000, dup_heavy=False):
    import numpy as np

    from nightcrawlercmd_ray.stages.sortedsink import write_sorted_partitioned

    rng = np.random.default_rng(seed)
    # dup_heavy plants one hot key so equal keys span adjacent A parts
    ka = rng.integers(0, 3000, na).astype(np.int64)
    if dup_heavy:
        ka[: na // 2] = 1500
    A = pa.table({"k": ka, "aid": np.arange(na, dtype=np.int64)})
    B = pa.table({
        "bk": rng.integers(0, 3000, nb).astype(np.int64),
        "bid": np.arange(nb, dtype=np.int64),
        "payload": rng.integers(0, 100, nb).astype(np.int64),
    })
    da = str(tmp_path / "a")
    db = str(tmp_path / "b")
    write_sorted_partitioned(ray.data.from_arrow(A).repartition(6), da,
                             key_col="k", tie_col="aid",
                             num_partitions=9, n_rows=na)
    write_sorted_partitioned(ray.data.from_arrow(B).repartition(4), db,
                             key_col="bk", tie_col="bid",
                             num_partitions=5, n_rows=nb)
    return A, B, da, db


@pytest.mark.parametrize("dup_heavy", [False, True])
def test_merge_join_sorted_inner_matches_pandas(tmp_path, dup_heavy):
    from nightcrawlercmd_ray.stages.sortedsink import merge_join_sorted

    A, B, da, db = _zipper_inputs(tmp_path, dup_heavy=dup_heavy)
    got = (
        merge_join_sorted(da, db).to_pandas()
        .sort_values(["aid", "bid"]).reset_index(drop=True)
    )
    exp = (
        A.to_pandas().merge(B.to_pandas(), left_on="k", right_on="bk")
        .drop(columns=["bk"]).sort_values(["aid", "bid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_merge_join_sorted_left_outer_nulls(tmp_path):
    from nightcrawlercmd_ray.stages.sortedsink import merge_join_sorted

    A, B, da, db = _zipper_inputs(tmp_path, seed=51)
    got = merge_join_sorted(da, db, how="left outer").to_pandas()
    exp = A.to_pandas().merge(
        B.to_pandas(), left_on="k", right_on="bk", how="left"
    )
    assert len(got) == len(exp)
    assert got["payload"].isna().sum() == exp["payload"].isna().sum()


def test_merge_join_sorted_disjoint_key_ranges(tmp_path):
    import numpy as np

    from nightcrawlercmd_ray.stages.sortedsink import (
        merge_join_sorted,
        write_sorted_partitioned,
    )

    A = pa.table({"k": np.arange(100, dtype=np.int64),
                  "aid": np.arange(100, dtype=np.int64)})
    B = pa.table({"bk": np.arange(5000, 5100, dtype=np.int64),
                  "bid": np.arange(100, dtype=np.int64)})
    da, db = str(tmp_path / "da"), str(tmp_path / "db")
    write_sorted_partitioned(ray.data.from_arrow(A), da, key_col="k",
                             tie_col="aid", num_partitions=3)
    write_sorted_partitioned(ray.data.from_arrow(B), db, key_col="bk",
                             tie_col="bid", num_partitions=3)
    assert merge_join_sorted(da, db).count() == 0
    assert merge_join_sorted(da, db, how="left outer").count() == 100


def test_merge_join_sorted_handles_empty_part_gaps(tmp_path):
    """A sink whose manifest records an empty part (no directory written)
    must still prune by part NUMBER — a positional index would shift after
    the gap and join the wrong parts."""
    import numpy as np

    from nightcrawlercmd_ray.stages.sortedsink import merge_join_sorted

    def craft(d, key_name, keys, payloads=None):
        os.makedirs(d, exist_ok=True)
        keys = np.sort(np.asarray(keys, dtype=np.int64))
        # 4 ranges with part 1 EMPTY: bounds at 10, 20, 30 (packed) with no
        # keys in [10, 20)
        bounds = [10 * (1 << 32), 20 * (1 << 32), 30 * (1 << 32)]
        parts = [keys[keys < 10], keys[(keys >= 10) & (keys < 20)],
                 keys[(keys >= 20) & (keys < 30)], keys[keys >= 30]]
        counts = [len(p) for p in parts]
        off = 0
        for i, p in enumerate(parts):
            if not len(p):
                continue
            pd_dir = f"{d}/part-{i:05d}"
            os.makedirs(pd_dir, exist_ok=True)
            cols = {key_name: pa.array(p),
                    "pos": pa.array(np.arange(off, off + len(p)))}
            if payloads is not None:
                cols["payload"] = pa.array(p * 10)
            import pyarrow.parquet as pq

            pq.write_table(pa.table(cols), f"{pd_dir}/data.parquet")
            open(f"{pd_dir}/_DONE", "w").write("ok")
            off += len(p)
        with open(f"{d}/_MANIFEST", "w") as f:
            json.dump({"key_col": key_name, "tie_col": key_name,
                       "boundaries": bounds, "counts": counts,
                       "offsets": np.concatenate(
                           [[0], np.cumsum(counts)[:-1]]).tolist(),
                       "rows": int(sum(counts))}, f)

    da, db = str(tmp_path / "ga"), str(tmp_path / "gb")
    a_keys = [1, 5, 25, 35]           # part 1 (keys 10..19) EMPTY
    b_keys = [1, 25, 25, 35, 41]      # part 1 EMPTY on B too
    craft(da, "k", a_keys)
    craft(db, "bk", b_keys, payloads=True)
    got = merge_join_sorted(da, db).to_pandas().sort_values(
        ["k", "payload"]).reset_index(drop=True)
    exp = sorted((a, b * 10) for a in a_keys for b in b_keys if a == b)
    assert list(zip(got["k"], got["payload"])) == exp


def test_rank_lookup_order_statistics(tmp_path):
    import numpy as np

    from nightcrawlercmd_ray.stages.sortedsink import (
        rank_lookup,
        write_sorted_partitioned,
    )

    rng = np.random.default_rng(71)
    n = 25000
    v = rng.integers(0, 10**9, n).astype(np.int64)
    t = pa.table({"v": v, "rid": np.arange(n, dtype=np.int64)})
    out = str(tmp_path / "rl")
    write_sorted_partitioned(ray.data.from_arrow(t).repartition(5), out,
                             key_col="v", tie_col="rid",
                             num_partitions=11, n_rows=n)
    sv = np.sort(v)
    ranks = [0, 1, n // 3, n // 2, n - 2, n - 1, -1]
    got = rank_lookup(out, ranks)
    exp = [int(sv[r]) for r in ranks]
    assert got.column("v").to_pylist() == exp
    assert got.column("pos").to_pylist() == [r % n for r in ranks]
    with pytest.raises(IndexError):
        rank_lookup(out, [n])
