"""Inverted index (stages/textops.inverted_index): serial-oracle equality,
partition/coarse-count invariance, min_df filter, empty input."""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import ray

DOCS = [
    (1, "Apple banana cherry apple"),
    (2, "banana banana DATE elderberry"),
    (3, "cherry fig grape apple"),
    (4, ""),
    (5, None),
    (6, "grape grape grape banana"),
]


def serial_index(docs, min_df=1):
    from nightcrawlercmd_ray.functions.extractors import RE_WORD

    post = defaultdict(set)
    for did, text in docs:
        for w in {w.lower() for w in RE_WORD.findall(text or "")}:
            post[w].add(did)
    return {
        w: (len(ids), ",".join(str(i) for i in sorted(ids)))
        for w, ids in post.items()
        if len(ids) >= min_df
    }


def _run(blocks, min_df=1, num_partitions=None):
    from nightcrawlercmd_ray.stages.textops import inverted_index

    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = inverted_index(ds, min_df=min_df, num_partitions=num_partitions).to_pandas()
    return {r["word"]: (r["df"], r["postings"]) for _, r in out.iterrows()}


def test_matches_serial_and_partition_invariant():
    expect = serial_index(DOCS)
    assert _run(1) == expect
    assert _run(5) == expect
    # coarse partition count must not change results
    assert _run(3, num_partitions=1) == expect
    assert _run(3, num_partitions=17) == expect


def test_min_df_filter():
    expect = serial_index(DOCS, min_df=2)
    got = _run(4, min_df=2)
    assert got == expect
    assert all(df >= 2 for df, _ in got.values())
    # sanity on the fixture: banana appears in 3 docs, fig in 1
    assert got["banana"][0] == 3 and "fig" not in got


def test_empty_input():
    from nightcrawlercmd_ray.stages.textops import inverted_index

    ds = ray.data.from_items([{"doc_id": 1, "text": ""}])
    out = inverted_index(ds).to_pandas()
    assert len(out) == 0
    assert set(out.columns) >= {"word", "df", "postings"} or out.empty
