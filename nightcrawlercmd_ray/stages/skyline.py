"""2-D skyline (Pareto-optimal front, minimize both dimensions).

A row survives iff no other row is ≤ on both dims and < on at least one
(equal points all survive). The classic use: "cheapest AND earliest" — no
order dominates a skyline order on (price, date).

Scale shape: the skyline operator is a *massive filter* — per block a
vectorized local skyline (sort by ``(x, y)``; a point survives iff its y is
its x-group's min AND strictly below the prefix-min over smaller x), which
is exact per block and reduces each block to O(distinct-x-on-the-front)
rows; local fronts then merge in ONE single-task pass over the tiny
candidate union (expected front size is O(H_n) ≈ ln n for independent
dims — at 10^10 rows the candidate union is blocks × ~25 rows, KBs).
The same formula runs in both passes, so the result is exact and
parallelism-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _local_skyline(t: pa.Table, x_col: str, y_col: str, id_col: str) -> pa.Table:
    t = t.combine_chunks()
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(
        t,
        sort_keys=[(x_col, "ascending"), (y_col, "ascending"), (id_col, "ascending")],
    )
    t = t.take(order)
    x = t.column(x_col).to_numpy(zero_copy_only=False)
    y = t.column(y_col).to_numpy(zero_copy_only=False)
    n = len(x)
    newx = np.ones(n, dtype=bool)
    newx[1:] = x[1:] != x[:-1]
    starts = np.flatnonzero(newx)
    counts = np.diff(np.append(starts, n))
    group_idx = np.repeat(np.arange(len(starts)), counts)
    gmin = np.repeat(y[starts], counts)  # sorted by y within x-group → first is min
    group_min = y[starts]
    prefix = np.minimum.accumulate(group_min)
    # min y over STRICTLY smaller x; the first x-group has no smaller x, so
    # it keeps its minima unconditionally (an INT64_MAX sentinel would
    # wrongly drop a legal y == INT64_MAX point on the strict compare)
    mlt = np.empty(len(starts), dtype=np.int64)
    if len(starts):
        mlt[0] = 0  # unused: masked by first_grp below
        mlt[1:] = prefix[:-1]
    first_grp = group_idx == 0
    keep = (y == gmin) & (first_grp | (y < mlt[group_idx]))
    return t.filter(pa.array(keep))


def skyline_2d(ds, *, x_col: str, y_col: str, id_col: str):
    """Exact 2-D minimize-both skyline of a Dataset with int64 dims.
    → Dataset, sorted by ``(x, y, id)``. Equal points all retained."""

    def local(t: pa.Table) -> pa.Table:
        out = _local_skyline(t, x_col, y_col, id_col)
        return out.append_column("_g", pa.array(np.zeros(len(out), np.int64)))

    def final(t: pa.Table) -> pa.Table:
        out = _local_skyline(t.drop_columns(["_g"]), x_col, y_col, id_col)
        return out.take(
            pc.sort_indices(
                out,
                sort_keys=[(x_col, "ascending"), (y_col, "ascending"),
                           (id_col, "ascending")],
            )
        )

    return (
        ds.map_batches(local, batch_format="pyarrow", batch_size=1 << 18)
        # the candidate union merges in ONE call — groupby(const).map_groups
        # hands the whole group to `final` (a split map_batches would apply
        # the formula per slice and let cross-slice dominated points survive)
        .groupby("_g")
        .map_groups(final, batch_format="pyarrow")
    )
