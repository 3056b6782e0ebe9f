"""Pivot (cross-tab) counts: rows × columns contingency table.

The reference's nearest analog is the report's per-status bucket tally
(M22/A5, a fixed two-way case); this is the general form — one output row
per ``row_col`` value, one output column per (known, small) ``col_col``
value, cells = row counts.

Scale shape: a per-batch ``pyarrow`` group-by combiner means the shuffle
carries at most |rows × cols| partials per block; the reshape runs once
over the merged (bounded, small-by-construction) result inside a single
constant-key ``map_groups`` — the raw table is never re-scanned. The
column domain must be declared (as in SQL's FILTER/CASE pivot) so the
output schema is stable and skew-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pivot_count(ds, row_col: str, col_col: str, col_values: list[str]):
    """→ Dataset(row_col, <one int64 count column per col_values entry>).
    Rows of ``col_col`` outside ``col_values`` are ignored (same as the
    SQL FILTER form)."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([row_col, col_col])
            .group_by([row_col, col_col])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([row_col, col_col, "_n"])

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([row_col, col_col])
        .aggregate(Sum("_n", alias_name="_n"))
    )

    def reshape(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_k"]).combine_chunks()
        row_vals = sorted(pc.unique(t.column(row_col)).to_pylist())
        row_idx = {v: i for i, v in enumerate(row_vals)}
        out = {row_col: pa.array(row_vals, t.schema.field(row_col).type)}
        rows = row_vals
        mats = {v: np.zeros(len(rows), dtype=np.int64) for v in col_values}
        for r, c, n in zip(
            t.column(row_col).to_pylist(),
            t.column(col_col).to_pylist(),
            t.column("_n").to_pylist(),
        ):
            if c in mats:
                mats[c][row_idx[r]] = n
        for v in col_values:
            out[v] = pa.array(mats[v])
        return pa.table(out)

    return (
        merged.map_batches(
            lambda t: t.append_column("_k", pa.array([0] * len(t), pa.int8())),
            batch_format="pyarrow",
        )
        .groupby("_k")
        .map_groups(reshape, batch_format="pyarrow")
    )


def melt(ds, *, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """UNPIVOT — wide → long (the inverse of :func:`pivot_count`): each input
    row becomes ``len(value_cols)`` rows of (id_cols..., variable, value).
    A pure stateless map (zero shuffle, output = input × |value_cols|);
    all ``value_cols`` must share one castable type (int64 here, per the
    repo's exact-integer policy — quantize floats first)."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = len(value_cols)
        out = {}
        for c in id_cols:
            # interleave so output order is row-major (id, var1), (id, var2)
            out[c] = t.column(c).take(pa.array(np.repeat(np.arange(n), k)))
        out[var_name] = pa.array(value_cols * n, pa.string())
        # stay at the ARROW level: a numpy round-trip would ride float64 on
        # null-bearing int64 (nulls → INT64_MIN, values > 2^53 rounded —
        # the joins.py merge_partition hazard). concat column-major, then
        # take in row-major order; nulls survive as nulls.
        cat = pa.concat_arrays([
            pc.cast(t.column(c), pa.int64()).combine_chunks()
            for c in value_cols
        ])
        p = np.arange(n * k)
        out[value_name] = cat.take(pa.array((p % k) * n + p // k))
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")
