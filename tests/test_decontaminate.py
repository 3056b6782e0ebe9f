"""Benchmark decontamination: planted-overlap recall, no-overlap specificity,
short-doc edge, and broadcast-ref plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.decontaminate import (
    benchmark_shingles,
    flag_contaminated,
)

BENCH = [
    "the quick brown foxes jumped over lazy sleeping dogs yesterday",
    "machine learning models require careful evaluation protocols always",
]


def _flag(df: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    ref = ray.put(benchmark_shingles(BENCH, k=k))
    ds = ray.data.from_pandas(df).repartition(2)
    return (
        flag_contaminated(ds, ref, k=k)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def test_planted_contamination_found_and_clean_docs_pass():
    df = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [
            # contains a full 5-gram from BENCH[0] (mid-sentence)
            "intro words then quick brown foxes jumped over lazy ending here",
            # same words but reordered — no shared 5-gram
            "lazy dogs jumped quick over brown sleeping foxes yesterday the",
            # entirely disjoint vocabulary
            "completely unrelated content about parquet files and arrow tables",
            # short doc: fewer than 5 qualifying words → 0 shingles
            "tiny",
        ],
    })
    out = _flag(df)
    assert out["contaminated"].tolist() == [True, False, False, False]
    assert out.loc[0, "n_hits"] >= 1
    assert out.loc[3, "n_shingles"] == 0
    # every doc appears exactly once regardless of shingle count
    assert out["doc_id"].tolist() == [10, 11, 12, 13]


def test_duplicate_shingle_positions_each_count():
    text = "alpha beta gamma delta epsilon " * 2  # the 5-gram repeats
    ref = ray.put(benchmark_shingles([text], k=5))
    out = (
        flag_contaminated(
            ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": [text]})),
            ref, k=5,
        ).to_pandas()
    )
    # 10 words → 6 shingle positions, all present in the benchmark set
    assert out.loc[0, "n_shingles"] == 6
    assert out.loc[0, "n_hits"] == 6


def test_empty_benchmark_flags_nothing():
    ref = ray.put(benchmark_shingles([], k=5))
    out = (
        flag_contaminated(
            ray.data.from_pandas(
                pd.DataFrame({"doc_id": [1], "text": [BENCH[0]]})
            ),
            ref, k=5,
        ).to_pandas()
    )
    assert not out["contaminated"].any()
