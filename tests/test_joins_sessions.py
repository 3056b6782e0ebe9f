"""as-of join + sessionization: semantics (ties, inner, gap edges),
partition-count invariance, and a driver-style DuckDB oracle compare at
sf0.001 for the two new SQL-oracled queries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

SF_DIR = "/root/testdata/sf0.001"


def _ds(rows: dict) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table(rows))


@pytest.mark.parametrize("P", [1, 7])
def test_asof_join_semantics(P):
    from nightcrawlercmd_ray.stages.joins import asof_join

    left = _ds({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "t": pa.array([10, 20, 5, 15, 50], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"], pa.string()),
    })
    right = _ds({
        "k": pa.array([1, 1, 1, 2, 9], pa.int64()),
        "t": pa.array([10, 10, 18, 99, 1], pa.int64()),
        "rv": pa.array([100, 200, 300, 400, 500], pa.int64()),
    })
    out = (
        asof_join(left, right, by="k", on="t", num_partitions=P)
        .to_pandas().sort_values(["k", "t", "lv"]).reset_index(drop=True)
    )
    # k=1,t=5: no right row ≤ 5 → dropped (inner)
    # k=1,t=10: ties at t=10 → max payload wins (rv=200)
    # k=1,t=20: latest ≤ 20 is t=18 → rv=300
    # k=2,t=15: right t=99 > 15 → dropped;  k=3: no right key → dropped
    assert out["k"].tolist() == [1, 1]
    assert out["t"].tolist() == [10, 20]
    assert out["lv"].tolist() == ["a", "b"]
    assert out["rv"].tolist() == [200, 300]


def test_asof_join_null_first_payload_and_payloadless_right():
    """ADVICE r2 regressions: (a) a matched right row whose FIRST payload
    value is legitimately null must survive the inner filter; (b) a right
    side with only (by, on) must still give inner semantics (unmatched left
    rows dropped), not silently degrade to a left join."""
    from nightcrawlercmd_ray.stages.joins import asof_join

    left = _ds({"k": pa.array([1, 2], pa.int64()),
                "t": pa.array([10, 10], pa.int64()),
                "lv": pa.array(["a", "b"], pa.string())})
    right = _ds({"k": pa.array([1], pa.int64()),
                 "t": pa.array([5], pa.int64()),
                 "rv": pa.array([None], pa.int64())})
    out = asof_join(left, right, by="k", on="t", num_partitions=3).to_pandas()
    assert out["k"].tolist() == [1]  # k=2 unmatched → dropped
    assert out["lv"].tolist() == ["a"] and pd.isna(out["rv"].iloc[0])

    right2 = _ds({"k": pa.array([1], pa.int64()),
                  "t": pa.array([5], pa.int64())})  # payload-less right
    out2 = asof_join(left, right2, by="k", on="t", num_partitions=3).to_pandas()
    assert out2["k"].tolist() == [1] and out2["lv"].tolist() == ["a"]


def test_joins_preserve_63bit_int64_payloads():
    """ADVICE r2 regression: null-bearing int64 payloads must NOT pass
    through float64 (values > 2^53 silently corrupt). The repo's 63-bit hash
    ids ride these joins (CC/PageRank labels)."""
    from nightcrawlercmd_ray.stages.joins import asof_join, hash_join

    big = 4611686018427400249  # loses precision in float64
    left = _ds({"k": pa.array([1, 2], pa.int64()),
                "t": pa.array([10, 10], pa.int64()),
                "lv": pa.array([big, big + 2], pa.int64())})
    right = _ds({"k": pa.array([1, 2], pa.int64()),
                 "t": pa.array([5, 5], pa.int64()),
                 "rv": pa.array([big + 1, None], pa.int64())})
    out = (asof_join(left, right, by="k", on="t", num_partitions=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["lv"].tolist() == [big, big + 2]
    assert out["rv"].iloc[0] == big + 1 and pd.isna(out["rv"].iloc[1])

    hout = (hash_join(left.drop_columns(["t"]), right.drop_columns(["t"]),
                      on="k", how="left", num_partitions=2)
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert hout["lv"].tolist() == [big, big + 2]
    assert hout["rv"].iloc[0] == big + 1 and pd.isna(hout["rv"].iloc[1])


def test_asof_join_name_clash_suffix():
    from nightcrawlercmd_ray.stages.joins import asof_join

    left = _ds({"k": pa.array([1], pa.int64()), "t": pa.array([9], pa.int64()),
                "v": pa.array([7], pa.int64())})
    right = _ds({"k": pa.array([1], pa.int64()), "t": pa.array([3], pa.int64()),
                 "v": pa.array([8], pa.int64())})
    out = asof_join(left, right, by="k", on="t", num_partitions=2).to_pandas()
    assert sorted(out.columns) == ["k", "t", "v", "v_r"]
    assert out.iloc[0]["v"] == 7 and out.iloc[0]["v_r"] == 8


@pytest.mark.parametrize("P", [1, 5])
def test_sessionize_semantics(P):
    from nightcrawlercmd_ray.stages.sessions import sessionize

    base = 1_700_000_000_000_000  # µs
    m = 60_000_000  # one minute in µs
    ev = _ds({
        "event_id": pa.array(list(range(7)), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        # u1: t=0, 30m (gap == 1800s: SAME session), 61m (break), 62m
        # u2: t=0, 31m (break)   u3: single event
        "ts": pa.array(
            [base, base + 30 * m, base + 61 * m, base + 62 * m,
             base, base + 31 * m, base],
            pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0]),
    })
    out = (
        sessionize(ev, gap_s=1800, num_partitions=P)
        .to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    got = out[["user_id", "session_id", "n_events", "sum_value_cents"]].values.tolist()
    assert got == [
        [1, 1, 2, 300],   # 1.0+2.0
        [1, 2, 2, 1200],  # 4.0+8.0
        [2, 1, 1, 1600],
        [2, 2, 1, 3200],
        [3, 1, 1, 6400],
    ]
    u1s1 = out[(out.user_id == 1) & (out.session_id == 1)].iloc[0]
    assert u1s1["end_s"] - u1s1["start_s"] == 1800


def _duckdb_oracle(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for tbl in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ["events_asof_orders", "user_sessions", "funnel_users"])
def test_query_matches_duckdb_oracle(name):
    """Driver-style compare at sf0.001: same rows, columns, values."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    got = _normalize(entrymod.queries()[name](SF_DIR).to_pandas())
    want = _normalize(_duckdb_oracle(entrymod.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


# --------------------------------------------------------------------------- #
# hash_join (distributed equi-join)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("P", [1, 7])
@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_hash_join_vs_pandas(P, how):
    from nightcrawlercmd_ray.stages.joins import hash_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 40, 300)
    rk = rng.integers(0, 40, 120)
    left = _ds({"k": pa.array(lk, pa.int64()),
                "lv": pa.array(rng.integers(0, 1000, 300), pa.int64()),
                "ls": pa.array([f"L{i}" for i in range(300)], pa.string())})
    right = _ds({"k": pa.array(rk, pa.int64()),
                 "rv": pa.array(rng.integers(0, 1000, 120), pa.int64())})
    out = (
        hash_join(left, right, on="k", how=how, num_partitions=P)
        .to_pandas().sort_values(["k", "lv", "ls", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        left.to_pandas().merge(right.to_pandas(), on="k", how=how)
        .sort_values(["k", "lv", "ls", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(
        out[["k", "lv", "ls"]], exp[["k", "lv", "ls"]], check_dtype=False)
    # rv: nullable on left-join — compare as float with NaN alignment
    assert np.allclose(out["rv"].astype(float), exp["rv"].astype(float),
                       equal_nan=True)


def test_hash_join_name_clash_and_empty_side():
    from nightcrawlercmd_ray.stages.joins import hash_join

    left = _ds({"k": pa.array([1, 2], pa.int64()),
                "v": pa.array([7, 8], pa.int64())})
    right = _ds({"k": pa.array([1, 1], pa.int64()),
                 "v": pa.array([10, 20], pa.int64())})
    out = hash_join(left, right, on="k", num_partitions=3).to_pandas()
    assert sorted(out.columns) == ["k", "v", "v_r"]
    assert sorted(out["v_r"].tolist()) == [10, 20]
    # inner vs a key-disjoint right side → 0 rows, no crash (Ray Data
    # short-circuits 0-row blocks and drops their schema, so an all-empty
    # result reports schema()=None — documented in hash_join)
    right2 = _ds({"k": pa.array([99], pa.int64()),
                  "v": pa.array([0], pa.int64())})
    assert hash_join(left, right2, on="k", num_partitions=3).count() == 0
    # left join keeps unmatched left rows with null right payload
    out3 = hash_join(left, right2, on="k", how="left",
                     num_partitions=3).to_pandas()
    assert len(out3) == 2 and out3["v_r"].isna().all()
    # FULL OUTER keeps both exclusives; the key is always populated
    out4 = hash_join(left, right2, on="k", how="outer",
                     num_partitions=3).to_pandas()
    assert sorted(out4["k"].tolist()) == [1, 2, 99]
    r99 = out4[out4["k"] == 99]
    assert r99["v"].isna().all() and r99["v_r"].tolist() == [0]
    # outer with an EMPTY left side still emits every right row
    empty_left = _ds({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    out5 = hash_join(empty_left, right, on="k", how="outer",
                     num_partitions=3).to_pandas()
    assert sorted(out5["v_r"].tolist()) == [10, 20] and out5["v"].isna().all()
    # hot-key salting is incompatible with outer (documented)
    with pytest.raises(ValueError):
        hash_join(left, right, on="k", how="outer", hot_keys=[1])


# --------------------------------------------------------------------------- #
# sliding window / broadcast range join (round-2 additions)
# --------------------------------------------------------------------------- #
def test_sliding_window_membership_and_partition_invariance():
    """Each event lands in exactly window/slide windows; half-open bounds."""
    import pandas as pd

    from nightcrawlercmd_ray.stages.slidingwindow import sliding_window_agg

    # one event at t=3600 exactly: windows [900,4500) .. [3600,7200)
    df = pd.DataFrame({
        "event_type": ["a"],
        "ts": pd.to_datetime(["1970-01-01 01:00:00"]),
        "value": [1.0],
    })
    for nparts in (1, 3):
        out = (
            sliding_window_agg(
                ray.data.from_pandas(df).repartition(nparts),
                window_s=3600, slide_s=900,
            )
            .to_pandas().sort_values("win_start_s").reset_index(drop=True)
        )
        assert out["win_start_s"].tolist() == [900, 1800, 2700, 3600]
        assert out["n_events"].tolist() == [1, 1, 1, 1]
        assert out["sum_value_cents"].tolist() == [100] * 4


def test_sliding_window_rejects_nondividing_slide():
    import pytest as _pytest

    from nightcrawlercmd_ray.stages.slidingwindow import sliding_window_agg

    with _pytest.raises(ValueError):
        sliding_window_agg(None, window_s=3600, slide_s=1000)


def test_broadcast_range_join_bounds_and_unmatched():
    import pandas as pd

    from nightcrawlercmd_ray.stages.joins import broadcast_range_join

    df = pd.DataFrame({"v": [0.5, 1.0, 9.99, 10.0, 50.99, 51.0]})
    ds = ray.data.from_pandas(df).repartition(2)
    out = broadcast_range_join(
        ds, "v", breaks=[1, 10, 51], labels=["lo", "hi"]
    ).to_pandas().sort_values("v").reset_index(drop=True)
    # 0.5 and 51.0 fall outside every half-open interval and are dropped
    assert out["v"].tolist() == [1.0, 9.99, 10.0, 50.99]
    assert out["tier"].tolist() == ["lo", "lo", "hi", "hi"]

    kept = broadcast_range_join(
        ds, "v", breaks=[1, 10, 51], labels=["lo", "hi"], keep_unmatched=True
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert len(kept) == 6
    assert kept["tier"].isna().tolist() == [True, False, False, False, False, True]


def test_pivot_count_declared_domain_and_zeros():
    import pandas as pd

    from nightcrawlercmd_ray.stages.pivot import pivot_count

    df = pd.DataFrame({
        "r": ["a", "a", "b", "b", "b"],
        "c": ["x", "y", "x", "x", "q"],  # 'q' outside the declared domain
    })
    out = (
        pivot_count(ray.data.from_pandas(df).repartition(3), "r", "c", ["x", "y", "z"])
        .to_pandas().sort_values("r").reset_index(drop=True)
    )
    assert out.columns.tolist() == ["r", "x", "y", "z"]
    assert out.set_index("r").loc["a"].tolist() == [1, 1, 0]
    assert out.set_index("r").loc["b"].tolist() == [2, 0, 0]


@pytest.mark.parametrize("nparts", [1, 4])
def test_user_journeys_order_and_partition_invariance(nparts):
    import pandas as pd

    from nightcrawlercmd_ray.stages.sessions import user_journeys

    df = pd.DataFrame({
        "event_id": [3, 1, 2, 10],
        "user_id": [5, 5, 5, 6],
        "ts": pd.to_datetime(
            ["2024-01-01 00:02", "2024-01-01 00:00", "2024-01-01 00:01",
             "2024-01-01 09:00"]
        ),
        "event_type": ["c", "a", "b", "solo"],
    })
    out = (
        user_journeys(ray.data.from_pandas(df).repartition(nparts),
                      num_partitions=3)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert out["journey"].tolist() == ["a>b>c", "solo"]


# --------------------------------------------------------------------------- #
# hash_join skew salting
# --------------------------------------------------------------------------- #
def _skewed_inputs():
    rng = np.random.default_rng(13)
    # key 7 owns 60% of the left side; right has a handful of rows per key
    lk = np.where(rng.random(4000) < 0.6, 7, rng.integers(0, 50, 4000))
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "lv": pa.array(rng.integers(0, 1000, 4000), pa.int64())})
    rk = np.repeat(np.arange(0, 40, dtype=np.int64), 3)  # keys 40+ unmatched
    right = pa.table({"k": pa.array(rk),
                      "rv": pa.array(rng.integers(0, 9, len(rk)), pa.int64())})
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_salted_equals_unsalted(how):
    from nightcrawlercmd_ray.stages.joins import hash_join

    left_t, right_t = _skewed_inputs()
    kw = dict(on="k", how=how, num_partitions=11)
    base = hash_join(ray.data.from_arrow(left_t).repartition(5),
                     ray.data.from_arrow(right_t).repartition(3), **kw)
    salted = hash_join(ray.data.from_arrow(left_t).repartition(5),
                       ray.data.from_arrow(right_t).repartition(3),
                       hot_keys=[7], salt_factor=4, **kw)
    cols = base.schema().names if base.schema() else ["k"]
    b = base.to_pandas().sort_values(cols).reset_index(drop=True)
    s = salted.to_pandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s, check_exact=True)
    if how in ("inner", "left"):
        assert (b["k"] == 7).sum() >= 2000 * 3  # hot key's join output intact


def test_detect_hot_keys_finds_planted_skew():
    from nightcrawlercmd_ray.stages.joins import detect_hot_keys

    left_t, _ = _skewed_inputs()
    hot = detect_hot_keys(ray.data.from_arrow(left_t).repartition(6), "k",
                          hot_fraction=0.1)
    assert hot == [7]
    # uniform input: nothing crosses a 10% bar
    uni = pa.table({"k": pa.array(np.arange(5000) % 500, pa.int64())})
    assert detect_hot_keys(ray.data.from_arrow(uni).repartition(4), "k",
                           hot_fraction=0.1) == []


# --- snapshot_diff -----------------------------------------------------------


def test_snapshot_diff_all_statuses_and_partition_invariance():
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.joins import content_hashes, snapshot_diff

    old_docs = [{"doc_id": 1, "text": "alpha"}, {"doc_id": 2, "text": "beta"},
                {"doc_id": 3, "text": "gamma"}, {"doc_id": 4, "text": "delta"}]
    new_docs = [{"doc_id": 1, "text": "alpha"},          # same
                {"doc_id": 2, "text": "beta CHANGED"},   # changed
                {"doc_id": 4, "text": "delta"},          # same
                {"doc_id": 5, "text": "epsilon"}]        # added (3 removed)
    expect = {1: "same", 2: "changed", 3: "removed", 4: "same", 5: "added"}
    for blocks in (1, 3):
        old = content_hashes(ray.data.from_items(old_docs).repartition(blocks))
        new = content_hashes(ray.data.from_items(new_docs).repartition(blocks))
        out = snapshot_diff(old, new).to_pandas()
        assert dict(zip(out["doc_id"], out["status"])) == expect
        assert len(out) == 5  # every id appears exactly once


def test_snapshot_diff_empty_sides():
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.joins import snapshot_diff

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.string())}))
    side = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()), "h": pa.array(["x"], pa.string())}))
    out = snapshot_diff(empty, side).to_pandas()
    assert dict(zip(out["doc_id"], out["status"])) == {7: "added"}
    out2 = snapshot_diff(side, empty).to_pandas()
    assert dict(zip(out2["doc_id"], out2["status"])) == {7: "removed"}


# --- bloom_prefilter ---------------------------------------------------------


def test_bloom_prefilter_join_identity_and_pruning():
    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.joins import bloom_prefilter, hash_join

    rng = np.random.default_rng(31)
    left = pa.table({
        "k": pa.array(rng.integers(0, 100_000, 20_000), pa.int64()),
        "v": pa.array(np.arange(20_000), pa.int64()),
    })
    # right holds a 1% sliver of the key space
    right = pa.table({
        "k": pa.array(np.arange(0, 1000, dtype=np.int64)),
        "w": pa.array(np.arange(1000, dtype=np.int64)),
    })
    lds = ray.data.from_arrow(left).repartition(6)
    rds = ray.data.from_arrow(right).repartition(2)

    base = hash_join(lds, rds, on="k", how="inner").to_pandas()
    filtered_left = bloom_prefilter(lds, rds, on="k", n_right=1000)
    pushed = hash_join(filtered_left, rds, on="k", how="inner").to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "v", "w"]].to_numpy()))
    assert key(pushed) == key(base)  # identical join result

    # the filter actually prunes: survivors ≈ matches + ε·|left|
    n_kept = filtered_left.count()
    n_match = (left["k"].to_numpy() < 1000).sum()
    assert n_kept < n_match + 0.01 * len(left) + 50
    assert n_kept >= n_match  # no false negatives


def test_bloom_prefilter_empty_right_drops_everything():
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.joins import bloom_prefilter

    lds = ray.data.from_items([{"k": 1}, {"k": 2}])
    rds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert bloom_prefilter(lds, rds, on="k", n_right=0).count() == 0


# --- interval_self_join ------------------------------------------------------


def test_interval_self_join_matches_serial_oracle():
    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.joins import interval_self_join

    rng = np.random.default_rng(17)
    n = 300
    starts = rng.integers(0, 50_000, n)
    spans = rng.integers(0, 15_000, n)  # many intervals span several epochs
    t = pa.table({
        "uid": pa.array(np.arange(n), pa.int64()),
        "sid": pa.array(rng.integers(0, 5, n), pa.int64()),
        "s": pa.array(starts, pa.int64()),
        "e": pa.array(starts + spans, pa.int64()),
    })

    def serial():
        out = set()
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                if starts[i] <= starts[j] + spans[j] and starts[j] <= starts[i] + spans[i]:
                    a, b = sorted([i, j])
                    out.add((a, b))
        return out

    expect = serial()
    for blocks, epoch in ((1, 3600), (7, 3600), (7, 1000), (7, 100_000)):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = interval_self_join(
            ds, start_col="s", end_col="e", id_cols=["uid", "sid"],
            epoch_s=epoch,
        ).to_pandas()
        pairs = set(zip(got["uid_a"], got["uid_b"]))
        assert pairs == expect, (blocks, epoch)
        assert len(got) == len(expect)  # exactly-once attribution
        assert (got["uid_a"] < got["uid_b"]).all()  # canonical orientation


def test_interval_self_join_edges():
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.joins import interval_self_join

    # touching endpoints overlap (closed intervals); disjoint do not
    t = pa.table({
        "uid": pa.array([1, 2, 3], pa.int64()),
        "sid": pa.array([0, 0, 0], pa.int64()),
        "s": pa.array([0, 100, 250], pa.int64()),
        "e": pa.array([100, 200, 300], pa.int64()),
    })
    out = interval_self_join(ray.data.from_arrow(t), start_col="s",
                             end_col="e", id_cols=["uid", "sid"],
                             epoch_s=64).to_pandas()
    assert set(zip(out["uid_a"], out["uid_b"])) == {(1, 2)}
    one = interval_self_join(
        ray.data.from_items([{"uid": 1, "sid": 0, "s": 5, "e": 9}]),
        start_col="s", end_col="e", id_cols=["uid", "sid"], epoch_s=64,
    ).to_pandas()
    assert len(one) == 0


# --------------------------------------------------------------------------- #
# funnel_counts (first-touch strict-order funnel)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("P", [1, 5])
def test_funnel_counts_semantics(P):
    from nightcrawlercmd_ray.stages.sessions import funnel_counts

    us = int(1)  # microsecond step
    rows = {
        # user 1: full A->B->A, reaches all 3 stages
        # user 2: B before A only -> stops after stage 1 (A missing? no:
        #         has A at t=10, B at t=5 BEFORE A -> fails stage 2
        # user 3: A and B at the SAME timestamp -> strict '>' fails stage 2
        "user_id": [1, 1, 1, 2, 2, 3, 3],
        "ts":      [pd.Timestamp("2024-01-01 00:00:00"),
                    pd.Timestamp("2024-01-01 00:00:01"),
                    pd.Timestamp("2024-01-01 00:00:02"),
                    pd.Timestamp("2024-01-01 00:00:10"),
                    pd.Timestamp("2024-01-01 00:00:05"),
                    pd.Timestamp("2024-01-01 00:00:07"),
                    pd.Timestamp("2024-01-01 00:00:07")],
        "event_type": ["A", "B", "A", "A", "B", "A", "B"],
    }
    ds = _ds(rows).repartition(P)
    got = funnel_counts(ds, stages=["A", "B", "A"],
                        num_partitions=P).to_pandas()
    got = got.sort_values("stage").reset_index(drop=True)
    assert got["n_users"].tolist() == [3, 1, 1]
    assert got["event_type"].tolist() == ["A", "B", "A"]


def test_funnel_counts_empty_and_missing_type():
    from nightcrawlercmd_ray.stages.sessions import funnel_counts

    rows = {"user_id": [1], "ts": [pd.Timestamp("2024-01-01")],
            "event_type": ["A"]}
    got = funnel_counts(_ds(rows), stages=["Z", "A"],
                        num_partitions=2).to_pandas()
    got = got.sort_values("stage")
    assert got["n_users"].tolist() == [0, 0]
    with pytest.raises(ValueError):
        funnel_counts(_ds(rows), stages=[])


@pytest.mark.parametrize("P", [1, 5])
def test_asof_join_forward_with_tolerance(P):
    """direction='forward' picks the FIRST right row with on ≥ left's
    (ties → lowest payload, the deterministic sort); tolerance bounds the
    gap; inner semantics drop out-of-window lefts."""
    from nightcrawlercmd_ray.stages.joins import asof_join

    left = _ds({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "t": pa.array([10, 20, 5, 15, 50], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"], pa.string()),
    })
    right = _ds({
        "k": pa.array([1, 1, 1, 2, 9], pa.int64()),
        "t": pa.array([12, 12, 18, 99, 1], pa.int64()),
        "rv": pa.array([200, 100, 300, 400, 500], pa.int64()),
    })
    out = (
        asof_join(left, right, by="k", on="t", num_partitions=P,
                  direction="forward", tolerance=10)
        .to_pandas().sort_values(["k", "t", "lv"]).reset_index(drop=True)
    )
    # k=1,t=5:  first ≥5 is t=12 (gap 7 ≤ 10); tie at 12 → LOWEST rv=100
    # k=1,t=10: first ≥10 is t=12 → tie → rv=100
    # k=1,t=20: first ≥20 is none (18 < 20... next none) → dropped
    # k=2,t=15: right t=99, gap 84 > tolerance → dropped
    # k=3,t=50: no right key → dropped
    assert out["t"].tolist() == [5, 10]
    assert out["lv"].tolist() == ["c", "a"]
    assert out["rv"].tolist() == [100, 100]


def test_asof_join_backward_tolerance_prunes():
    from nightcrawlercmd_ray.stages.joins import asof_join

    left = _ds({"k": pa.array([1, 1], pa.int64()),
                "t": pa.array([100, 100], pa.int64()),
                "e": pa.array([1, 2], pa.int64())})
    right = _ds({"k": pa.array([1], pa.int64()),
                 "t": pa.array([10], pa.int64()),
                 "rv": pa.array([7], pa.int64())})
    with_tol = asof_join(left, right, by="k", on="t",
                         tolerance=50).to_pandas()
    assert len(with_tol) == 0  # gap 90 > 50
    no_tol = asof_join(left, right, by="k", on="t").to_pandas()
    assert len(no_tol) == 2 and (no_tol["rv"] == 7).all()


@pytest.mark.parametrize("epoch_s,nparts", [(4096, 3), (512, 9)])
def test_point_in_interval_join_vs_serial(epoch_s, nparts):
    """Containment join == the serial pandas non-equi join, exactly-once
    pairs, at multiple epoch sizes and partitionings, with and without a
    by key."""
    import numpy as np

    from nightcrawlercmd_ray.stages.joins import point_in_interval_join

    rng = np.random.RandomState(2)
    n_p, n_i = 1500, 200
    pts = pa.table({
        "event_id": pa.array(np.arange(n_p, dtype=np.int64)),
        "u": pa.array(rng.randint(0, 30, n_p).astype(np.int64)),
        "ts": pa.array(rng.randint(0, 100_000, n_p).astype(np.int64)),
    })
    st = rng.randint(0, 95_000, n_i).astype(np.int64)
    iv = pa.table({
        "win_id": pa.array(np.arange(n_i, dtype=np.int64)),
        "u": pa.array(rng.randint(0, 30, n_i).astype(np.int64)),
        "s": pa.array(st),
        "e": pa.array(st + rng.randint(1, 8000, n_i)),
    })
    P = ray.data.from_arrow(pts).repartition(nparts)
    iv_ds = ray.data.from_arrow(iv).repartition(3)
    pdf, idf = pts.to_pandas(), iv.to_pandas()

    out = point_in_interval_join(
        P, iv_ds, ts_col="ts", start_col="s", end_col="e", by="u",
        point_cols=["event_id"], interval_cols=["win_id"],
        epoch_s=epoch_s).to_pandas()
    m = pdf.merge(idf, on="u")
    m = m[(m["s"] <= m["ts"]) & (m["ts"] <= m["e"])]
    assert set(zip(out["event_id"], out["win_id"])) == set(
        zip(m["event_id"], m["win_id"]))
    assert len(out) == len(set(zip(out["event_id"], out["win_id"])))

    out2 = point_in_interval_join(
        P, iv_ds, ts_col="ts", start_col="s", end_col="e",
        point_cols=["event_id"], interval_cols=["win_id"],
        epoch_s=epoch_s).to_pandas()
    m2 = pdf.assign(_k=1).merge(idf.assign(_k=1), on="_k")
    m2 = m2[(m2["s"] <= m2["ts"]) & (m2["ts"] <= m2["e"])]
    assert set(zip(out2["event_id"], out2["win_id"])) == set(
        zip(m2["event_id"], m2["win_id"]))


def test_point_in_interval_join_edges():
    from nightcrawlercmd_ray.stages.joins import point_in_interval_join

    pts = ray.data.from_arrow(pa.table({
        "pid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, 999], pa.int64())}))
    iv = ray.data.from_arrow(pa.table({
        "wid": pa.array([7], pa.int64()),
        "s": pa.array([10], pa.int64()),
        "e": pa.array([10], pa.int64())}))  # degenerate [10,10]
    out = point_in_interval_join(
        pts, iv, ts_col="ts", start_col="s", end_col="e",
        point_cols=["pid"], interval_cols=["wid"], epoch_s=16).to_pandas()
    # touching endpoints are inclusive on both sides
    assert out["pid"].tolist() == [1] and out["wid"].tolist() == [7]
    with pytest.raises(ValueError, match="overlap"):
        point_in_interval_join(
            pts, iv, ts_col="ts", start_col="s", end_col="e",
            point_cols=["pid"], interval_cols=["pid"], epoch_s=16)


def test_melt_roundtrips_and_partition_invariant():
    """melt output = rows × |value_cols|, row-major interleave, exact
    values; invariant under input partitioning."""
    import numpy as np

    from nightcrawlercmd_ray.stages.pivot import melt

    t = pa.table({
        "k": pa.array([10, 20], pa.int64()),
        "a": pa.array([1, 2], pa.int64()),
        "b": pa.array([3, 4], pa.int64()),
    })
    for nparts in (1, 2):
        out = (melt(ray.data.from_arrow(t).repartition(nparts),
                    id_cols=["k"], value_cols=["a", "b"])
               .to_pandas().sort_values(["k", "variable"])
               .reset_index(drop=True))
        assert out["k"].tolist() == [10, 10, 20, 20]
        assert out["variable"].tolist() == ["a", "b", "a", "b"]
        assert out["value"].tolist() == [1, 3, 2, 4]


def test_melt_preserves_nulls_and_63bit_values():
    """Regression: the numpy interleave rode float64, so null int64 values
    became INT64_MIN and 63-bit ids lost low bits."""
    from nightcrawlercmd_ray.stages.pivot import melt

    big = (1 << 60) + 1  # not representable in float64
    t = pa.table({
        "k": pa.array([10, 20], pa.int64()),
        "a": pa.array([None, big], pa.int64()),
        "b": pa.array([3, None], pa.int64()),
    })
    # assert at the ARROW level: the operator's contract is exact int64
    # (a pandas conversion of a null-bearing int64 column is itself lossy)
    ds = melt(ray.data.from_arrow(t), id_cols=["k"], value_cols=["a", "b"])
    rows = sorted(
        ((r["k"], r["variable"], r["value"]) for r in ds.take_all()))
    assert rows == [(10, "a", None), (10, "b", 3),
                    (20, "a", big), (20, "b", None)]


# --------------------------------------------------------------------------- #
# interval union per key
# --------------------------------------------------------------------------- #
def _cover_oracle(ss, ee):
    iv = sorted(zip(ss, ee))
    tot, cs, ce = 0, None, None
    for a, b in iv:
        if cs is None or a > ce:
            if cs is not None:
                tot += ce - cs
            cs, ce = a, b
        else:
            ce = max(ce, b)
    return tot + (ce - cs if cs is not None else 0)


@pytest.mark.parametrize("nparts,P", [(1, 1), (7, 5)])
def test_interval_union_vs_serial_oracle(nparts, P):
    from nightcrawlercmd_ray.stages.sessions import interval_union_per_key

    rng = np.random.default_rng(61)
    n = 15000
    k = rng.integers(0, 250, n).astype(np.int64)
    s = rng.integers(0, 10**6, n).astype(np.int64)
    e = s + rng.integers(0, 5000, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": k, "s": s, "e": e})).repartition(
        nparts
    )
    got = (
        interval_union_per_key(
            ds, key_col="k", start_col="s", end_col="e", num_partitions=P
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    df = pd.DataFrame({"k": k, "s": s, "e": e})
    exp = (
        df.groupby("k")
        .apply(lambda g: _cover_oracle(g["s"].tolist(), g["e"].tolist()))
        .reset_index(name="covered")
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interval_union_touching_and_contained():
    from nightcrawlercmd_ray.stages.sessions import interval_union_per_key

    # [0,10] + touching [10,20] merge; [2,5] is contained; [30,31] separate
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1], pa.int64()),
            "s": pa.array([0, 10, 2, 30], pa.int64()),
            "e": pa.array([10, 20, 5, 31], pa.int64()),
        }
    )
    got = interval_union_per_key(
        ray.data.from_arrow(t).repartition(2), key_col="k",
        start_col="s", end_col="e", num_partitions=2,
    ).to_pandas()
    assert got["covered"].tolist() == [21]


def test_interval_union_rejects_inverted_interval():
    from nightcrawlercmd_ray.stages.sessions import interval_union_per_key

    t = pa.table({"k": pa.array([1], pa.int64()),
                  "s": pa.array([5], pa.int64()),
                  "e": pa.array([4], pa.int64())})
    with pytest.raises(Exception, match="interval_union"):
        interval_union_per_key(
            ray.data.from_arrow(t), key_col="k", start_col="s", end_col="e"
        ).to_pandas()


def test_interval_union_zero_length_intervals():
    from nightcrawlercmd_ray.stages.sessions import interval_union_per_key

    # points contribute 0 unless they extend an island
    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "s": pa.array([5, 7], pa.int64()),
                  "e": pa.array([5, 9], pa.int64())})
    got = interval_union_per_key(
        ray.data.from_arrow(t), key_col="k", start_col="s", end_col="e"
    ).to_pandas()
    assert got["covered"].tolist() == [2]


def test_interval_union_drops_null_rows():
    from nightcrawlercmd_ray.stages.sessions import interval_union_per_key

    t = pa.table(
        {
            "k": pa.array([1, 1, None], pa.int64()),
            "s": pa.array([0, None, 5], pa.int64()),
            "e": pa.array([10, 20, 9], pa.int64()),
        }
    )
    got = interval_union_per_key(
        ray.data.from_arrow(t), key_col="k", start_col="s", end_col="e"
    ).to_pandas()
    # only the fully non-null row contributes
    assert got["k"].tolist() == [1] and got["covered"].tolist() == [10]


# --------------------------------------------------------------------------- #
# retention cohorts
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("P", [1, 6])
def test_retention_cohorts_vs_pandas(P):
    from nightcrawlercmd_ray.stages.sessions import retention_cohorts

    rng = np.random.default_rng(5)
    n = 600
    B = 1000
    users = rng.integers(0, 40, n)
    ts = rng.integers(0, 20_000, n)
    ds = _ds({"user_id": pa.array(users, pa.int64()),
              "ts": pa.array(ts, pa.int64())})
    got = (retention_cohorts(ds, bucket_us=B, num_partitions=P)
           .to_pandas().sort_values(["cohort", "age"]).reset_index(drop=True))
    df = pd.DataFrame({"u": users, "b": ts // B})
    first = df.groupby("u")["b"].min().rename("cohort")
    pairs = df.drop_duplicates().join(first, on="u")
    pairs["age"] = pairs["b"] - pairs["cohort"]
    exp = (pairs.groupby(["cohort", "age"]).size().rename("n_users")
           .reset_index().sort_values(["cohort", "age"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_retention_cohorts_cross_batch_dedup():
    """The same (user, bucket) pair arriving in different input blocks must
    still count once."""
    from nightcrawlercmd_ray.stages.sessions import retention_cohorts

    t = pa.table({"user_id": pa.array([7, 7, 7, 7], pa.int64()),
                  "ts": pa.array([10, 15, 1010, 1012], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)  # one row per block
    got = (retention_cohorts(ds, bucket_us=1000, num_partitions=3)
           .to_pandas().sort_values("age").reset_index(drop=True))
    assert got["n_users"].tolist() == [1, 1]
    assert got["age"].tolist() == [0, 1]
