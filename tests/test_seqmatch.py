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
