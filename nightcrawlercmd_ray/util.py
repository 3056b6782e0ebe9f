"""Small Dataset helpers shared across pipelines."""

from __future__ import annotations

from ray.data.aggregate import Count


def read_parquet_clean(path, **kw):
    """``ray.data.read_parquet`` with file-level schema metadata stripped.

    Parquet written through pandas carries a ``b'pandas'`` schema-metadata
    blob whose hash fails (``hash(schema)`` → "unhashable type: 'dict'" on
    this pyarrow), defeating Ray Data's per-block schema dedup in every
    shuffle reduce and forcing schema re-unification per block. Stripping is
    metadata-only (zero-copy) and fuses with the read."""
    import ray

    def strip(t):
        return t.replace_schema_metadata(None)

    return ray.data.read_parquet(path, **kw).map_batches(
        strip, batch_format="pyarrow"
    )


def distinct(ds, col: str):
    """Distinct values of one column as a DATASET (``Dataset.unique`` returns
    a driver-side list — unusable for large cardinality). One hash shuffle."""
    return ds.groupby(col).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
