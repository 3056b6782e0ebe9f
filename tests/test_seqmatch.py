"""Per-entity sequence pattern matching (stages/seqmatch.sequence_match):
serial regex oracle, ordering determinism, separator validation, edges."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.seqmatch import sequence_match


def _oracle(df: pd.DataFrame, pattern: str) -> pd.DataFrame:
    rows = []
    for uid, g in df.sort_values(["ts", "eid"]).groupby("u", sort=True):
        seq = ">".join(g["t"])
        rows.append(
            {
                "u": uid,
                "n_events": len(g),
                "matched": int(re.search(pattern, seq) is not None),
            }
        )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("nparts,P", [(1, 1), (7, 4)])
def test_sequence_match_vs_serial_oracle(nparts, P):
    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 120, n).astype(np.int64),
            "t": pd.Series(rng.integers(0, 4, n)).map(
                {0: "view", 1: "click", 2: "purchase", 3: "error"}.get
            ),
            "ts": rng.integers(0, 10**6, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
        }
    )
    pattern = "view(>[a-z]+)*>purchase"
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
    got = (
        sequence_match(
            ds, id_col="u", item_col="t", order_cols=["ts", "eid"],
            pattern=pattern, num_partitions=P,
        )
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    exp = _oracle(df, pattern).sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sequence_match_order_matters():
    # purchase BEFORE view must not match "view then purchase"
    t = pa.table(
        {
            "u": pa.array([1, 1, 2, 2], pa.int64()),
            "t": pa.array(["purchase", "view", "view", "purchase"]),
            "ts": pa.array([1, 2, 1, 2], pa.int64()),
            "eid": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    got = (
        sequence_match(
            ray.data.from_arrow(t).repartition(2), id_col="u", item_col="t",
            order_cols=["ts", "eid"], pattern="view(>[a-z]+)*>purchase",
            num_partitions=2,
        )
        .to_pandas().set_index("u")["matched"]
    )
    assert got[1] == 0 and got[2] == 1


def test_sequence_match_separator_collision_raises():
    t = pa.table(
        {
            "u": pa.array([1], pa.int64()),
            "t": pa.array(["a>b"]),
            "ts": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="separator"):
        sequence_match(
            ray.data.from_arrow(t), id_col="u", item_col="t",
            order_cols=["ts"], pattern="a",
        ).to_pandas()


def test_sequence_match_single_event_users():
    t = pa.table(
        {
            "u": pa.array([5, 6], pa.int64()),
            "t": pa.array(["view", "purchase"]),
            "ts": pa.array([1, 1], pa.int64()),
        }
    )
    got = (
        sequence_match(
            ray.data.from_arrow(t), id_col="u", item_col="t",
            order_cols=["ts"], pattern="^view$",
        )
        .to_pandas().set_index("u")
    )
    assert got.loc[5, "matched"] == 1 and got.loc[6, "matched"] == 0
    assert got["n_events"].tolist() == [1, 1]


# --------------------------------------------------------------------------- #
# transition counts / first-event lag
# --------------------------------------------------------------------------- #
def _trans_oracle(df: pd.DataFrame) -> pd.DataFrame:
    s = df.sort_values(["u", "ts", "eid"])
    s["prev"] = s.groupby("u")["t"].shift(1)
    s = s[s["prev"].notna()]
    out = (
        s.groupby(["prev", "t"]).size().reset_index(name="n")
        .sort_values(["prev", "t"]).reset_index(drop=True)
    )
    out.columns = ["type_from", "type_to", "n"]
    return out


@pytest.mark.parametrize("nparts,P", [(1, 1), (8, 5)])
def test_transition_counts_vs_pandas(nparts, P):
    from nightcrawlercmd_ray.stages.seqmatch import transition_counts

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 200, n).astype(np.int64),
            "t": pd.Series(rng.integers(0, 5, n)).map(lambda x: f"e{x}"),
            "ts": rng.integers(0, 10**6, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
    got = transition_counts(
        ds, id_col="u", item_col="t", order_cols=["ts", "eid"],
        num_partitions=P,
    ).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _trans_oracle(df), check_dtype=False)


def test_transition_counts_no_cross_entity_pairs():
    from nightcrawlercmd_ray.stages.seqmatch import transition_counts

    # single-event users produce NO transitions even when adjacent in sort
    t = pa.table(
        {
            "u": pa.array([1, 2, 3], pa.int64()),
            "t": pa.array(["a", "b", "c"]),
            "ts": pa.array([1, 2, 3], pa.int64()),
        }
    )
    got = transition_counts(
        ray.data.from_arrow(t), id_col="u", item_col="t", order_cols=["ts"]
    )
    assert got.count() == 0


@pytest.mark.parametrize("nparts,P", [(1, 1), (7, 4)])
def test_first_event_lag_vs_pandas(nparts, P):
    from nightcrawlercmd_ray.stages.seqmatch import first_event_lag

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 150, n).astype(np.int64),
            "t": pd.Series(rng.integers(0, 4, n)).map(
                {0: "view", 1: "click", 2: "purchase", 3: "error"}.get
            ),
            "ts": rng.integers(0, 10**9, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
    got = (
        first_event_lag(
            ds, id_col="u", item_col="t", ts_col="ts",
            from_item="view", to_item="purchase", num_partitions=P,
        )
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    f = df.pivot_table(
        index="u", columns="t", values="ts", aggfunc="min"
    ).reindex(columns=["view", "purchase"])
    f = f.dropna()
    f = f[f["purchase"] >= f["view"]]
    exp = pd.DataFrame(
        {
            "u": f.index.to_numpy(),
            "lag_us": (f["purchase"] - f["view"]).astype(np.int64).to_numpy(),
        }
    ).sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_first_event_lag_excludes_purchase_before_view():
    from nightcrawlercmd_ray.stages.seqmatch import first_event_lag

    t = pa.table(
        {
            "u": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "t": pa.array(["purchase", "view", "view", "purchase", "view"]),
            "ts": pa.array([10, 20, 10, 15, 5], pa.int64()),
        }
    )
    got = first_event_lag(
        ray.data.from_arrow(t).repartition(2), id_col="u", item_col="t",
        ts_col="ts", from_item="view", to_item="purchase", num_partitions=2,
    ).to_pandas().set_index("u")
    assert 1 not in got.index  # purchase strictly before first view
    assert 3 not in got.index  # never purchased
    assert got.loc[2, "lag_us"] == 5
