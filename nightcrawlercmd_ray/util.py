"""Small Dataset helpers shared across pipelines."""

from __future__ import annotations

from ray.data.aggregate import Count


def read_parquet_clean(path, **kw):
    """``ray.data.read_parquet`` with file-level schema metadata stripped.

    Parquet written through pandas carries a ``b'pandas'`` schema-metadata
    blob whose hash fails (``hash(schema)`` → "unhashable type: 'dict'" on
    this pyarrow), defeating Ray Data's per-block schema dedup in every
    shuffle reduce and forcing schema re-unification per block. Overriding
    the read schema with a metadata-stripped copy fixes it at the source —
    the read tasks themselves then yield clean-schema blocks (a post-read
    map_batches strip runs too late: the warning fires inside ReadParquet)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    f = path[0] if isinstance(path, (list, tuple)) and path else path
    if isinstance(f, str) and os.path.isdir(f):
        # directory of part files: schemas are uniform
        parts = sorted(p for p in os.listdir(f) if p.endswith(".parquet"))
        f = os.path.join(f, parts[0]) if parts else None
    if f is not None and os.path.isfile(f):
        if "schema" not in kw:
            schema = pq.read_schema(f)
            if schema.metadata:
                cols = kw.get("columns")
                if cols:  # schema must match the pruned column set
                    schema = pa.schema([schema.field(c) for c in cols])
                kw["schema"] = schema.remove_metadata()
        if "use_threads" not in kw:
            # Parquet reads split across tasks at ROW-GROUP granularity; a
            # file written as a few huge row groups (the driver testdata is
            # one 600k-row group) decodes serially in one task no matter how
            # many CPUs the cluster has. Turn on pyarrow's thread-parallel
            # decode inside the read task for such files; leave it off for
            # well-split files (our own sinks) where cross-task parallelism
            # already covers the cores and per-task threads would contend.
            md = pq.ParquetFile(f).metadata
            if md.num_row_groups and (
                md.num_rows / md.num_row_groups > 131_072
            ):
                kw["use_threads"] = True

    return ray.data.read_parquet(path, **kw)


def install_log_filters() -> None:
    """Silence ONE known-cosmetic Ray Data warning: the streaming executor
    logs "RefBundle with a different schema … new schema: ." whenever an
    all-to-all partition is legitimately empty (empty blocks carry a
    columnless schema — e.g. a sort partition that received no groups).
    The filter matches only that empty-new-schema form; real schema
    mismatches (two NON-empty schemas differing) still log. Idempotent."""
    import logging

    class _EmptySchemaBundleFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # True = keep
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg
                and "new schema: ." in msg
            )

    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(
        type(f).__name__ == "_EmptySchemaBundleFilter" for f in lg.filters
    ):
        lg.addFilter(_EmptySchemaBundleFilter())


def distinct(ds, col: str):
    """Distinct values of one column as a DATASET (``Dataset.unique`` returns
    a driver-side list — unusable for large cardinality). One hash shuffle."""
    return ds.groupby(col).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
