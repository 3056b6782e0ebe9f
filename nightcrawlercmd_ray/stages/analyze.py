"""Generic table statistics — the ANALYZE pass.

Engine addition beyond the reference (whose only whole-table statistics are
the report counters, mainReport.go): per-column row/null counts, EXACT
distinct-value counts and min/max — what an optimizer, an ingestion audit,
or a schema-drift monitor reads before touching 100 TB.

Scale shape: two combiner-first passes over the projected columns.
Pass A (stats): each batch folds every column to ONE row of
(n, n_null, min, max) partials → a |columns|-key groupby. Pass B (ndv):
each batch emits the per-batch DISTINCT 64-bit value hashes per column
(nulls excluded, matching SQL COUNT(DISTINCT)) → one (col, hash)-keyed
exchange whose volume is Σ distinct-per-block hashes — never the data —
then a |columns|-row count. The distinct key is a two-seed 128-bit hash
(the `dedup.py` content-hash pattern) — collision-safe past 10^10
distinct values, where a single 64-bit key would undercount.

min/max render as strings (ints via ``str()``, strings verbatim — Arrow
binary order matches DuckDB's default binary collation) so one output
schema covers mixed column types and the whole result is
SQL-oracle-able: ``CAST(MIN(c) AS VARCHAR)``. Float columns are rejected
(cross-engine float→string formatting is not pinned; quantize or cast
first, per the repo float policy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INT_KINDS = ("int8", "int16", "int32", "int64",
              "uint8", "uint16", "uint32", "uint64")


def analyze_columns(ds, columns: list[str]):
    """→ Dataset(col, n, n_null, ndv, min_s, max_s), one row per analyzed
    column, sorted by ``col``. See module docstring for shape/limits."""
    import polars as pl
    import ray
    from ray.data.aggregate import Max, Min, Sum

    schema = ds.schema()  # ray.data Schema: parallel .names / .types lists
    types = dict(zip(schema.names, schema.types))
    for c in columns:
        t = types[c]
        if not (pa.types.is_integer(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t)):
            raise ValueError(
                f"analyze_columns: column {c!r} has type {t} — only integer "
                "and string columns are supported (floats: quantize first)")
    ds = ds.select_columns(list(columns))

    int_cols = {c for c in columns if pa.types.is_integer(types[c])}

    def stats_partial(t: pa.Table) -> pa.Table:
        # min/max partials fold in their NATIVE type (typed side columns):
        # folding stringified ints with a string Min/Max would compare
        # lexicographically ('9374' > '14999') — rendering happens once,
        # after the numeric fold
        cols, ns, nulls = [], [], []
        mins_i, maxs_i, mins_s, maxs_s = [], [], [], []
        for c in columns:
            arr = t.column(c)
            cols.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            mn = pc.min(arr).as_py()
            mx = pc.max(arr).as_py()
            if c in int_cols:
                mins_i.append(mn), maxs_i.append(mx)
                mins_s.append(None), maxs_s.append(None)
            else:
                mins_i.append(None), maxs_i.append(None)
                mins_s.append(mn), maxs_s.append(mx)
        return pa.table({
            "col": pa.array(cols, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "_min_i": pa.array(mins_i, pa.int64()),
            "_max_i": pa.array(maxs_i, pa.int64()),
            "_min_s": pa.array(mins_s, pa.string()),
            "_max_s": pa.array(maxs_s, pa.string()),
        })

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("_min_i", alias_name="_min_i"),
            Max("_max_i", alias_name="_max_i"),
            Min("_min_s", alias_name="_min_s"),
            Max("_max_s", alias_name="_max_s"),
        )
    )

    def hash_partial(t: pa.Table) -> pa.Table:
        # TWO independent 64-bit hashes per value (the dedup.py 128-bit
        # content-hash pattern): a single 64-bit key has expected birthday
        # collisions — i.e. undercounted ndv — from ~10^9 distinct values
        out_c, out_h, out_h2 = [], [], []
        for c in columns:
            vals = t.column(c).drop_null()
            if len(vals) == 0:
                continue
            s = pl.from_arrow(vals.combine_chunks())
            h1 = s.hash(seed=0).to_numpy().astype(np.uint64).view(np.int64)
            h2 = s.hash(seed=1).to_numpy().astype(np.uint64).view(np.int64)
            pair = np.stack([h1, h2], axis=1)
            pair = np.unique(pair, axis=0)
            out_c.extend([c] * len(pair))
            out_h.extend(pair[:, 0].tolist())
            out_h2.extend(pair[:, 1].tolist())
        return pa.table({
            "col": pa.array(out_c, pa.string()),
            "_h": pa.array(out_h, pa.int64()),
            "_h2": pa.array(out_h2, pa.int64()),
        })

    def count_per_col(t: pa.Table) -> pa.Table:
        # after the (col, h, h2) groupby each distinct pair exists exactly
        # once globally, so ndv per col = a per-block count combiner + a
        # |columns|-row sum — NOT a second full shuffle of the distinct
        # pair set (which is corpus-sized for key-like columns)
        g = (t.select(["col"]).group_by("col")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["col", "ndv"])

    from ray.data.aggregate import Sum as _Sum

    ndv = (
        ds.map_batches(hash_partial, batch_format="pyarrow")
        .groupby(["col", "_h", "_h2"])
        .count()
        .map_batches(count_per_col, batch_format="pyarrow")
        .groupby("col")
        .aggregate(_Sum("ndv", alias_name="ndv"))
    )

    # |columns|-row join: both sides are column-count-sized — fold on the
    # driver rather than shipping a keyed exchange for a handful of rows
    stats_rows = {r["col"]: r for r in stats.take_all()}
    ndv_rows = {r["col"]: r["ndv"] for r in ndv.take_all()}
    cols = sorted(stats_rows)

    def _render(r, lo_hi: str):
        if r["col"] in int_cols:
            v = r[f"_{lo_hi}_i"]
            return None if v is None else str(v)
        return r[f"_{lo_hi}_s"]

    return ray.data.from_arrow(pa.table({
        "col": pa.array(cols, pa.string()),
        "n": pa.array([stats_rows[c]["n"] for c in cols], pa.int64()),
        "n_null": pa.array([stats_rows[c]["n_null"] for c in cols],
                           pa.int64()),
        "ndv": pa.array([ndv_rows.get(c, 0) for c in cols], pa.int64()),
        "min_s": pa.array([_render(stats_rows[c], "min") for c in cols],
                          pa.string()),
        "max_s": pa.array([_render(stats_rows[c], "max") for c in cols],
                          pa.string()),
    }))
