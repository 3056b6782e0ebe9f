"""Semi-structured (JSON string) column extraction — vectorized scalar-field
pulls from a JSON text column, the shape WARC/crawl metadata and event
telemetry arrive in at web scale.

Reference parity: NightCrawlerCmd keeps its scan/crawl side-data as flat
JSON objects on disk (``/root/reference/config/*.json`` consumed by
``mainFuzzer.go`` / ``mainBucketScan.go``); this stage is the dataset-side
equivalent — lifting a flat JSON column into typed Arrow columns without a
per-row Python ``json.loads`` in the hot path.

Two extraction tiers, both pure maps (zero shuffle, streaming):

* ``mode="fast"`` — a single ``pyarrow.compute.extract_regex`` call per
  batch (C++ regex over the whole column). Correct for FLAT objects whose
  target field is a JSON number / unquoted literal or a plain string
  without escapes — exactly the telemetry-props shape. Rows where the
  pattern misses yield null.
* ``mode="strict"`` — ONE CPython ``json.loads`` per batch: the column is
  joined into a single JSON array text (``[o1,o2,...]``) and parsed with
  the C-accelerated decoder in one call, then the field is gathered. Robust
  to nesting/escapes; still no per-row parse dispatch. Rows that are not
  valid JSON objects raise (the batch-level parse can't attribute them), so
  keep strict mode for trusted columns and fast mode for dirty ones.

At 100 TB: extraction fuses into the reading stage (map-only); the grouped
stats below use the house combiner shape — per-batch Arrow ``group_by``
partials, then one tiny ``groupby(by)`` over rows ∝ groups × blocks.
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NUM_RE_TMPL = (
    r'"{f}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|true|false|null)'
)
_STR_RE_TMPL = r'"{f}"\s*:\s*"(?P<v>[^"\\]*)"'


def _extract_fast(col: pa.ChunkedArray | pa.Array, field: str,
                  kind: str) -> pa.Array:
    tmpl = _STR_RE_TMPL if kind == "string" else _NUM_RE_TMPL
    pat = tmpl.format(f=field)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    hit = pc.extract_regex(col, pattern=pat)
    vals = pc.struct_field(hit, "v")
    if kind == "string":
        return vals
    # JSON literals: null → null, true/false → 1/0, else numeric cast
    vals = pc.replace_substring_regex(vals, pattern=r"^null$",
                                      replacement="")
    vals = pc.replace_substring_regex(vals, pattern=r"^true$",
                                      replacement="1")
    vals = pc.replace_substring_regex(vals, pattern=r"^false$",
                                      replacement="0")
    vals = pc.if_else(pc.equal(vals, ""), pa.nulls(len(vals), pa.string()),
                      vals)
    if kind == "int":
        return pc.cast(pc.cast(vals, pa.float64()), pa.int64())
    return pc.cast(vals, pa.float64())


def _extract_strict(col: pa.ChunkedArray | pa.Array, field: str,
                    kind: str) -> pa.Array:
    s = col.to_pylist()
    # one C-level parse for the whole batch; nulls hole-punched first
    idx = [i for i, v in enumerate(s) if v is not None]
    objs = json.loads("[" + ",".join(s[i] for i in idx) + "]") if idx else []
    out: list = [None] * len(s)
    for i, o in zip(idx, objs):
        v = o.get(field) if isinstance(o, dict) else None
        out[i] = v
    if kind == "string":
        return pa.array([None if v is None else str(v) for v in out],
                        pa.string())
    if kind == "int":
        return pa.array(
            [None if v is None or isinstance(v, str) else int(v)
             for v in out], pa.int64())
    return pa.array(
        [None if v is None or isinstance(v, str) else float(v)
         for v in out], pa.float64())


def json_extract_scalar(ds, *, col: str, field: str, out_col: str,
                        kind: str = "int", mode: str = "fast"):
    """Add ``out_col`` = the scalar ``field`` of the flat JSON object in
    ``col``. ``kind`` ∈ {int,float,string}; ``mode`` ∈ {fast,strict}
    (see module docstring). Pure map — streams."""
    if kind not in ("int", "float", "string"):
        raise ValueError(f"kind must be int|float|string, got {kind!r}")
    extract = _extract_fast if mode == "fast" else _extract_strict

    def add(t: pa.Table) -> pa.Table:
        vals = extract(t.column(col), field, kind)
        return t.append_column(out_col, vals)

    return ds.map_batches(add, batch_format="pyarrow")


def json_field_stats(ds, *, col: str, field: str, by: str,
                     mode: str = "fast"):
    """Per-``by`` integer stats (n, sum, min, max) of a numeric JSON
    ``field`` inside the JSON-string column ``col``.

    Combiner-first: each batch extracts vectorized and collapses to ≤|groups|
    partial rows with Arrow ``group_by``; the only shuffle is the final tiny
    ``groupby(by)`` over partials. Integer sums keep the result bit-exact
    and order-free (no float accumulation).
    → columns (by, n, sum_v, min_v, max_v), one row per group.
    """
    extract = _extract_fast if mode == "fast" else _extract_strict

    def partial(t: pa.Table) -> pa.Table:
        vals = extract(t.column(col), field, "int")
        g = pa.table({by: t.column(by), "_v": vals})
        agg = g.group_by([by]).aggregate(
            [("_v", "count"), ("_v", "sum"), ("_v", "min"), ("_v", "max")]
        )
        return agg.rename_columns([by, "_n", "_s", "_mn", "_mx"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            by: t.column(by),
            "n": pc.cast(t.column("_n"), pa.int64()),
            "sum_v": pc.cast(t.column("_s"), pa.int64()),
            "min_v": pc.cast(t.column("_mn"), pa.int64()),
            "max_v": pc.cast(t.column("_mx"), pa.int64()),
        })

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby(by)
        .aggregate(
            Sum("_n", alias_name="_n"),
            Sum("_s", alias_name="_s"),
            Min("_mn", alias_name="_mn"),
            Max("_mx", alias_name="_mx"),
        )
        .map_batches(rename, batch_format="pyarrow")
    )
