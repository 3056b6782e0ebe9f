"""BM25 ranked retrieval (stages/textops.bm25_topk) vs a serial oracle
computing the identical Okapi formula in the identical term order, plus
micro-semantics: idf floor, length normalization, tie-breaks."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.functions.extractors import RE_WORD
from nightcrawlercmd_ray.stages.textops import bm25_topk

QUERIES = [(1, "fast table scan"), (2, "hash merge batch")]
K1, B = 1.2, 0.75


def _serial_bm25(docs: pd.DataFrame, queries, k):
    qt = {qid: [w.lower() for w in RE_WORD.findall(q)] for qid, q in queries}
    toks = {r.doc_id: Counter(w.lower() for w in RE_WORD.findall(r.text))
            for r in docs.itertuples()}
    n = len(docs)
    avgdl = sum(sum(c.values()) for c in toks.values()) / n
    vocab = sorted({t for ts in qt.values() for t in ts})
    df = {w: sum(1 for c in toks.values() if w in c) for w in vocab}
    idf = {w: float(np.log1p((n - df[w] + 0.5) / (df[w] + 0.5)))
           for w in vocab}
    out = []
    for qid in sorted(qt):
        lst = []
        for did, tf in toks.items():
            dl = sum(tf.values())
            norm = K1 * (1 - B + B * dl / avgdl)
            s = 0.0
            for w in qt[qid]:
                f = tf.get(w, 0)
                if f:
                    s += idf[w] * (f * (K1 + 1.0)) / (f + norm)
            if s > 0:
                lst.append((s, did))
        lst.sort(key=lambda x: (-x[0], x[1]))
        out += [(qid, i, did, s) for i, (s, did) in enumerate(lst[:k], 1)]
    return out


@pytest.mark.parametrize("nparts", [1, 6])
def test_bm25_matches_serial_bit_exact(nparts):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    want = _serial_bm25(docs, QUERIES, k=8)
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"]).repartition(nparts)
    got = bm25_topk(ds, QUERIES, k=8)
    gl = list(zip(got.column("query_id").to_pylist(),
                  got.column("rank").to_pylist(),
                  got.column("doc_id").to_pylist(),
                  got.column("score").to_pylist()))
    assert gl == want  # float-exact: same formula, same term order


def test_bm25_micro_semantics():
    # shorter doc with the same tf outranks the longer one (length norm);
    # doc without the term scores 0 and is absent; ties -> doc_id asc
    rows = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            "apple apple banana",           # dl 3, tf(apple)=2
            "apple apple banana banana banana banana",  # dl 6, tf 2
            "cherry only here",
            "apple apple banana",           # exact tie with doc 1
        ],
    })
    got = bm25_topk(ray.data.from_arrow(rows), [(7, "apple")], k=10)
    ids = got.column("doc_id").to_pylist()
    assert ids == [1, 4, 2]  # tie 1<4 first, longer doc 2 last, 3 absent
    s = got.column("score").to_pylist()
    assert s[0] == s[1] > s[2] > 0


def test_bm25_rejects_empty_query_vocab():
    rows = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["xyz abc"]})
    with pytest.raises(ValueError):
        bm25_topk(ray.data.from_arrow(rows), [(1, "a of")], k=3)


def test_tfidf_top_terms_forced_join_path_bit_identical():
    """tfidf_top_terms with broadcast_limit=0 (the DF-table-outgrew-a-
    broadcast fallback: word-keyed resolve + doc-keyed top-k) must emit the
    exact rows of the broadcast path, at any partitioning."""
    from nightcrawlercmd_ray.stages.textops import tfidf_top_terms

    rng = np.random.default_rng(21)
    vocab = ["table", "scan", "merge", "batch", "hash", "index", "query",
             "joining", "filter", "sort"]
    ids = list(range(60))
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 25))))
             for _ in ids]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)

    def run(limit):
        got = tfidf_top_terms(ds, k=3, min_df=2,
                              broadcast_limit=limit).to_pandas()
        return (got.sort_values(["doc_id", "word"])
                .reset_index(drop=True)[["doc_id", "word", "tf", "df"]])

    pd.testing.assert_frame_equal(run(1 << 21), run(0))
