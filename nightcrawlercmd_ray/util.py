"""Small Dataset helpers shared across pipelines."""

from __future__ import annotations

from ray.data.aggregate import Count


def distinct(ds, col: str):
    """Distinct values of one column as a DATASET (``Dataset.unique`` returns
    a driver-side list — unusable for large cardinality). One hash shuffle."""
    return ds.groupby(col).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
