"""Pre-validates the driver's correctness gate: every SQL-oracled query in
__ray_entry__ must match DuckDB on the same parquet (row count + schema-name
set + exact values after canonical sort), per the driver compare semantics."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entrymod

SF_SQL = "/root/testdata/sf0.01"  # the tier the driver checks
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_duckdb(name):
    ray_fn = entrymod.queries()[name]
    got = _canon(_to_df(ray_fn(SF_SQL)))
    con = _duck(SF_SQL)
    expect = _canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(expect.columns), (got.columns, expect.columns)
    assert len(got) == len(expect), (len(got), len(expect))
    for col in got.columns:
        a, b = got[col], expect[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert all(
                (math.isnan(x) and math.isnan(y)) or x == pytest.approx(y, rel=1e-12)
                for x, y in zip(a, b)
            ), col
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), col


def test_rows_only_queries_smoke():
    """Every non-SQL query runs at sf0.001 and yields a stable schema."""
    qs = entrymod.queries()
    sql = set(entrymod.oracle_sql())
    import ray.data

    for name, fn in qs.items():
        if name in sql or name in ("crawl_bfs",):  # crawl covered below
            continue
        res = fn("/root/testdata/sf0.001")
        if isinstance(res, ray.data.Dataset):
            # Ray quirk: to_pandas() of a 0-row Dataset drops column names —
            # the schema is the stable contract
            assert len(res.schema().names) > 0, name
        else:
            df = _to_df(res)
            assert df is not None and len(df.columns) > 0, name


def test_entry_flagship():
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 100
    assert {"wave", "seq", "url", "status", "text"} <= set(df.columns)
    # crawl order is densely sequenced
    assert sorted(df["seq"]) == list(range(len(df)))
