"""Semi-structured JSON column extraction: fast (vectorized regex) vs
strict (one batch-level json.loads) tier equivalence on clean input,
fail-closed nulls on dirty input, grouped stats vs a DuckDB json_extract
oracle, and partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.semistructured import (
    json_extract_scalar,
    json_field_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _clean_corpus(n=500, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ks = rng.integers(-50, 5_000, n)
    gs = rng.choice(["a", "b", "c"], n)
    props = [f'{{"k": {k}, "tag": "t{k % 7}"}}' for k in ks]
    return pd.DataFrame({"g": gs, "props": props, "k_true": ks})


@pytest.mark.parametrize("mode", ["fast", "strict"])
def test_extract_int_matches_truth(mode):
    df = _clean_corpus()
    ds = ray.data.from_pandas(df.drop(columns=["k_true"])).repartition(4)
    out = (
        json_extract_scalar(ds, col="props", field="k", out_col="kv",
                            kind="int", mode=mode)
        .to_pandas()
    )
    # row order is preserved within a map; join on props text to be safe
    merged = out.merge(df, on="props")
    assert (merged["kv"] == merged["k_true"]).all()


@pytest.mark.parametrize("mode", ["fast", "strict"])
def test_extract_string_field(mode):
    df = _clean_corpus(80)
    ds = ray.data.from_pandas(df.drop(columns=["k_true"]))
    out = json_extract_scalar(ds, col="props", field="tag", out_col="tv",
                              kind="string", mode=mode).to_pandas()
    merged = out.merge(df, on="props")
    assert (merged["tv"] == ("t" + (merged["k_true"] % 7).astype(str))).all()


def test_fast_mode_fails_closed_on_dirty_rows():
    rows = [
        '{"k": 3}',
        '{"nope": 1}',           # field absent → null
        None,                     # null row → null
        '{"k": null}',            # JSON null → null
        '{"k": true}',            # literal → 1
        '{"k": -2.5e1}',          # scientific → -25
        '{"s": "a\\"b", "k": 7}',  # escaped string elsewhere, k still found
    ]
    ds = ray.data.from_arrow(pa.table({"j": rows}))
    got = json_extract_scalar(ds, col="j", field="k", out_col="kv",
                              kind="float", mode="fast").to_pandas()["kv"]
    exp = [3.0, None, None, None, 1.0, -25.0, 7.0]
    for g, e in zip(got, exp):
        if e is None:
            assert pd.isna(g)
        else:
            assert g == e
    # escaped string VALUE fails closed to null in fast mode (never garbage)
    sv = json_extract_scalar(ds, col="j", field="s", out_col="sv",
                             kind="string", mode="fast").to_pandas()["sv"]
    assert pd.isna(sv.iloc[6])
    # strict mode decodes the escape correctly
    sv2 = json_extract_scalar(ds, col="j", field="s", out_col="sv",
                              kind="string", mode="strict").to_pandas()["sv"]
    assert sv2.iloc[6] == 'a"b'


@pytest.mark.parametrize("nparts", [1, 6])
@pytest.mark.parametrize("mode", ["fast", "strict"])
def test_field_stats_vs_duckdb(mode, nparts):
    import duckdb

    df = _clean_corpus(2_000, seed=11).drop(columns=["k_true"])
    ds = ray.data.from_pandas(df).repartition(nparts)
    got = (
        json_field_stats(ds, col="props", field="k", by="g", mode=mode)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    con = duckdb.connect()
    o = con.sql(
        "SELECT g, CAST(count(*) AS BIGINT) n,"
        " CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) sum_v,"
        " CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) min_v,"
        " CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) max_v"
        " FROM df GROUP BY g ORDER BY g"
    ).df()
    assert got.astype(o.dtypes.to_dict()).equals(o)


def test_registered_query_vs_oracle():
    import duckdb

    import __ray_entry__ as entrymod

    got = entrymod.queries()["json_props_stats"](SF_DIR).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    o = con.sql(entrymod.oracle_sql()["json_props_stats"]).df()
    cols = sorted(got.columns)
    assert cols == sorted(o.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    o = o[cols].sort_values(cols).reset_index(drop=True)
    assert got.astype(o.dtypes.to_dict()).equals(o)
