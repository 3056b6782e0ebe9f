"""Strict dtype+value audit of every oracled query vs its DuckDB oracle.

The driver's correctness gate hashes values AFTER sorting columns by name;
a dtype gap (e.g. DuckDB SUM → HUGEIN T→ object/float vs the engine's
int64) can hash-mismatch even when values are numerically identical — the
r3 `classifier_scores_documents` red row. The repo's own oracle tests used
``check_dtype=False`` which masked exactly that. This audit runs every
query in ``__ray_entry__.queries()`` that has an ``oracle_sql()`` entry at
a given sf dir and reports any row where the pandas dtypes differ or the
strict frame compare fails.

Usage: python scripts/audit_oracle_dtypes.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return (df.sort_values(list(df.columns)).reset_index(drop=True)
            if len(df.columns) else df)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    import __ray_entry__ as entry

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    qs, oracles = entry.queries(), entry.oracle_sql()
    todo = [n for n in qs if n in oracles and (not names or any(f in n for f in names))]
    bad = []
    for i, name in enumerate(todo):
        try:
            res = qs[name](sf)
            a = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
            b = con.execute(oracles[name]).df()
            con.close()
            a, b = canon(a), canon(b)
            dt_a = {c: str(t) for c, t in a.dtypes.items()}
            dt_b = {c: str(t) for c, t in b.dtypes.items()}
            if dt_a != dt_b:
                diffs = {c: (dt_a.get(c), dt_b.get(c))
                         for c in set(dt_a) | set(dt_b)
                         if dt_a.get(c) != dt_b.get(c)}
                bad.append((name, f"DTYPE {diffs}"))
                print(f"[{i+1}/{len(todo)}] {name}: DTYPE {diffs}", flush=True)
                continue
            try:
                pd.testing.assert_frame_equal(a, b)
            except AssertionError as e:
                bad.append((name, f"VALUES {str(e).splitlines()[-1][:200]}"))
                print(f"[{i+1}/{len(todo)}] {name}: VALUES", flush=True)
                continue
            print(f"[{i+1}/{len(todo)}] {name}: ok", flush=True)
        except Exception:
            bad.append((name, "ERROR " + traceback.format_exc(limit=2)
                        .splitlines()[-1][:200]))
            print(f"[{i+1}/{len(todo)}] {name}: ERROR", flush=True)
    print(f"\n{len(todo) - len(bad)}/{len(todo)} strict-clean")
    for n, why in bad:
        print(f"  {n}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
