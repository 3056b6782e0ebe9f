"""BPE tokenizer (stages/bpe.py): distributed training ≡ serial naive oracle,
partition invariance, the textbook Sennrich example, encode roundtrip, and the
actor-pool encode stage end-to-end over real testdata documents."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

SF_DIR = "/root/testdata/sf0.001"


# --- serial oracle: naive full-recount BPE, independent of the engine's ----
# incremental pair→words index (re-derives pair counts from scratch each step)


def naive_train(texts, num_merges):
    from nightcrawlercmd_ray.stages.bpe import END

    wc = Counter()
    for t in texts:
        wc.update((t or "").lower().split())
    words = {w: tuple(w) + (END,) for w in wc}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        merges.append((l, r, n))
        joined = l + r
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return merges


def naive_encode(word, merges):
    from nightcrawlercmd_ray.stages.bpe import END

    syms = tuple(word) + (END,)
    for l, r, *_ in merges:  # rank order; re-scan the word per merge rule
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = tuple(out)
    return syms


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "the quick brown fox jumps over the lazy dog",
    "the the the of of and and to in in in",
]


def test_train_matches_naive_oracle_and_partition_invariant():
    from nightcrawlercmd_ray.stages.bpe import train_bpe

    expected = naive_train(TEXTS, 30)
    for blocks in (1, 7):
        ds = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(blocks)
        got = train_bpe(ds, num_merges=30)
        rows = list(
            zip(
                got.column("left").to_pylist(),
                got.column("right").to_pylist(),
                got.column("pair_count").to_pylist(),
            )
        )
        assert rows == expected
        assert got.column("rank").to_pylist() == list(range(len(expected)))


def test_sennrich_example_first_merges():
    # Classic example (arXiv:1508.07909 §3.2 figure 1): corpus low×5,
    # lower×2, newest×6, widest×3 → 'es' then 'est' merge first.
    from nightcrawlercmd_ray.stages.bpe import train_merges_from_vocab

    vocab = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = train_merges_from_vocab(vocab, 4)
    assert (merges[0][0], merges[0][1], merges[0][2]) == ("e", "s", 9)
    assert (merges[1][0], merges[1][1], merges[1][2]) == ("es", "t", 9)
    assert (merges[2][0], merges[2][1]) == ("est", "</w>")


def test_encode_matches_naive_and_roundtrips():
    from nightcrawlercmd_ray.stages.bpe import END, encode_word

    merges = naive_train(TEXTS, 30)
    ranks = {(l, r): i for i, (l, r, _n) in enumerate(merges)}
    words = sorted({w for t in TEXTS for w in t.split()})
    for w in words:
        got = encode_word(w, ranks)
        assert got == naive_encode(w, merges)
        # lossless: concatenating tokens (sans sentinel) re-yields the word
        assert "".join(got).replace(END, "") == w


def test_encode_stage_end_to_end_and_deterministic():
    from nightcrawlercmd_ray.stages.bpe import encode_documents, train_bpe

    path = f"{SF_DIR}/documents.parquet"
    n_docs = pq.read_metadata(path).num_rows
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    merges = train_bpe(ds, num_merges=80)
    assert merges.num_rows == 80

    out = (
        encode_documents(ds, merges, emit_tokens=True, concurrency=2)
        .sort("doc_id")
        .to_pandas()
    )
    assert len(out) == n_docs
    # token counts consistent with the emitted token lists
    assert (out["bpe_tokens"].map(len) == out["n_bpe"]).all()
    # BPE can only shorten the char+sentinel stream, never lengthen it
    raw = out  # encode appends columns, so text rides along
    base = raw["text"].map(lambda t: sum(len(w) + 1 for w in (t or "").lower().split()))
    assert (raw["n_bpe"] <= base).all()
    # and every nonempty doc still yields at least one token
    assert ((raw["n_bpe"] > 0) == (base > 0)).all()

    # spot-check one doc against the serial encoder
    merge_rows = list(
        zip(
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
            merges.column("pair_count").to_pylist(),
        )
    )
    row = raw.iloc[7]
    expect = [t for w in (row["text"] or "").lower().split() for t in naive_encode(w, merge_rows)]
    assert list(row["bpe_tokens"]) == expect

    # partition invariance of the hash projection
    out2 = (
        encode_documents(
            ray.data.read_parquet(path, columns=["doc_id", "text"]).repartition(5),
            merges,
        )
        .sort("doc_id")
        .to_pandas()
    )
    assert list(out2["bpe_hash"]) == list(out["bpe_hash"])


def test_vocab_cap_bounds_driver_pull():
    from nightcrawlercmd_ray.stages.bpe import word_frequencies

    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    capped = word_frequencies(ds, max_vocab_words=3).take_all()
    assert len(capped) == 3
    # cap keeps the MOST frequent words (n desc, word asc)
    full = word_frequencies(ds, max_vocab_words=10_000).take_all()
    full_sorted = sorted(full, key=lambda r: (-r["n"], r["word"]))
    assert [r["word"] for r in capped] == [r["word"] for r in full_sorted[:3]]


def test_empty_and_degenerate_inputs():
    from nightcrawlercmd_ray.stages.bpe import encode_documents, train_bpe, train_merges_from_vocab

    # corpus with a single repeated char-word: merges exhaust early
    merges = train_merges_from_vocab([("aa", 4)], 10)
    assert len(merges) == 2  # (a,a) then (aa,</w>)
    ds = ray.data.from_items([{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": None}])
    t = train_bpe(ds, num_merges=5)
    assert t.num_rows == 0
    out = encode_documents(ds, t).to_pandas()
    assert list(out["n_bpe"]) == [0, 0]
