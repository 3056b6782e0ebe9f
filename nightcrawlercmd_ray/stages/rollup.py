"""ROLLUP / grouping-sets aggregation.

The reference's report tool only ever aggregates at one grain per pass
(``mainReport.go:365-371``); OLAP-style subtotal pyramids (by (a,b), by
(a), grand total) are a standard warehouse ask the engine should cover.

Scale shape: the data-sized work happens ONCE — a per-batch partial
aggregate at the FINEST grain followed by one ``groupby`` shuffle. Every
super-aggregate (the rolled-up levels) is derived from that finest-grain
result, which is bounded by the key-combination cardinality (thousands,
not data-sized), inside a single ``map_groups`` over a constant key — the
raw table is never re-scanned or re-shuffled per level. Partitioning
assumption: |finest-grain groups| fits in one partition; if a rollup's
finest grain were data-sized it would not be a useful rollup.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def rollup_sum_count(
    ds,
    keys: list[str],
    value_col: str,
):
    """SQL ``GROUP BY ROLLUP(k1, k2, ...)`` with ``sum(value) AS total`` and
    ``count(*) AS n``: one row per finest-grain group plus each prefix
    level with the rolled-out keys NULL, down to the grand total.
    ``value_col`` must already be integer (cents policy) so sums are exact.
    ROLLUP is GROUPING SETS over the key prefixes — a one-line wrapper so
    the partial/finest/expand scaffolding lives once in
    :func:`grouping_sets_sum_count`. → Dataset(*keys, total, n).
    """
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets_sum_count(ds, keys, value_col, sets=sets)


def cube_sum_count(
    ds,
    keys: list[str],
    value_col: str,
):
    """SQL ``GROUP BY CUBE(k1, k2, ...)``: every subset of the keys (2^k
    grouping sets), not just prefixes. CUBE is GROUPING SETS over all
    subsets — same single-scaffolding wrapper as ROLLUP.
    → Dataset(*keys, total, n).
    """
    from itertools import combinations

    sets = [tuple(keys)] + [
        kept for r in range(len(keys) - 1, -1, -1)
        for kept in combinations(keys, r)
    ]
    return grouping_sets_sum_count(ds, keys, value_col, sets=sets)


def grouping_sets_sum_count(
    ds,
    keys: list[str],
    value_col: str,
    sets: list[tuple[str, ...]],
):
    """SQL ``GROUP BY GROUPING SETS ((...), ...)``: arbitrary grouping-set
    list (each a subset of ``keys``, in any order; duplicates emit twice,
    per SQL). Completes the ROLLUP (prefixes) / CUBE (all subsets) family
    with caller-chosen grains. Identical scale shape: ONE data-sized pass
    at the finest grain, every requested set derived from that bounded
    result inside one constant-key ``map_groups``.
    → Dataset(*keys, total, n).
    """
    from ray.data.aggregate import Sum

    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} has keys not in {keys}: "
                             f"{sorted(unknown)}")

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(keys + [value_col])
            .group_by(keys)
            .aggregate([(value_col, "sum"), ([], "count_all")])
        )
        return g.rename_columns(keys + ["total", "n"])

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("total", alias_name="total"), Sum("n", alias_name="n"))
    )

    def expand(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_all"]).combine_chunks()
        out = []
        for s in sets:
            kept = [k for k in keys if k in s]  # canonical key order
            if kept == keys:
                g = t
            else:
                g = (
                    t.select(kept + ["total", "n"])
                    .group_by(kept)
                    .aggregate([("total", "sum"), ("n", "sum")])
                    .rename_columns(kept + ["total", "n"])
                )
            cols = {}
            for k in keys:
                cols[k] = g.column(k) if k in kept else \
                    pa.nulls(len(g), t.schema.field(k).type)
            cols["total"] = g.column("total")
            cols["n"] = g.column("n")
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    return (
        finest.map_batches(
            lambda t: t.append_column("_all", pa.array([0] * len(t), pa.int8())),
            batch_format="pyarrow",
        )
        .groupby("_all")
        .map_groups(expand, batch_format="pyarrow")
    )
