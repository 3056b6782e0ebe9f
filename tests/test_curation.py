"""Curation stages: PII redaction, repeated-line removal, sequence packing.
Each operator is checked against a serial in-process oracle, on crafted edge
inputs, and for parallelism-invariance (same result at different block
counts)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.curation import (
    PII_PATTERNS,
    dedup_lines,
    dedup_lines_batch,
    lines_from_words,
    pack_concat_chunks,
    pack_greedy_bins,
    pii_redact,
    pii_redact_batch,
)


# --------------------------------------------------------------------------- #
# PII redaction
# --------------------------------------------------------------------------- #
def test_pii_redact_batch_counts_and_text():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail a.b+c@ex.co and d@sub.ex.org now",
            "host 10.0.0.1 and 255.255.255.255, call 555-0142",
            "clean text, no pii at all",
        ]),
    })
    out = pii_redact_batch(t)
    texts = out.column("text").to_pylist()
    assert texts[0] == "mail <EMAIL> and <EMAIL> now"
    assert texts[1] == "host <IP> and <IP>, call <PHONE>"
    assert texts[2] == "clean text, no pii at all"
    assert out.column("n_emails").to_pylist() == [2, 0, 0]
    assert out.column("n_ipv4").to_pylist() == [0, 2, 0]
    assert out.column("n_phones").to_pylist() == [0, 1, 0]


def test_pii_redact_sequential_passes():
    # an email containing a dotted quad is consumed by the EMAIL pass, so
    # the IP pass (which runs after) must not count it
    t = pa.table({"text": pa.array(["x 1.2.3.4@ex.com y"])})
    out = pii_redact_batch(t)
    assert out.column("text").to_pylist() == ["x <EMAIL> y"]
    assert out.column("n_emails").to_pylist() == [1]
    assert out.column("n_ipv4").to_pylist() == [0]


def test_pii_redact_dataset_matches_batch_oracle():
    rng = np.random.RandomState(11)
    rows = []
    for i in range(300):
        bits = ["w%d" % rng.randint(50) for _ in range(10)]
        if i % 3 == 0:
            bits.append(f"u{i}@ex{i % 7}.net")
        if i % 4 == 0:
            bits.append(f"192.168.{i % 256}.{(i * 3) % 256}")
        if i % 5 == 0:
            bits.append(f"{100 + i % 900}-{1000 + i % 9000}")
        rows.append(" ".join(bits))
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(rows)})
    expect = pii_redact_batch(t)
    got = (
        pii_redact(ray.data.from_arrow(t).repartition(7))
        .sort("doc_id")
        .to_pandas()
    )
    assert got["text"].tolist() == expect.column("text").to_pylist()
    for c in ("n_emails", "n_ipv4", "n_phones"):
        assert got[c].tolist() == expect.column(c).to_pylist()
    # planted categories all positively exercised
    assert got["n_emails"].sum() == 100
    assert got["n_ipv4"].sum() == 75
    assert got["n_phones"].sum() == 60


def test_pii_patterns_re2_safe():
    # oracle parity depends on the patterns staying in the RE2 subset
    for _, pat, _ in PII_PATTERNS:
        assert not re.search(r"\(\?[<=!]", pat), pat  # no lookaround
        assert not re.search(r"\\[1-9]", pat), pat    # no backrefs


# --------------------------------------------------------------------------- #
# repeated-line removal
# --------------------------------------------------------------------------- #
def test_dedup_lines_keep_first():
    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a\nb\na\nc\nb\na"]),
    })
    out = dedup_lines_batch(t)
    assert out.column("text").to_pylist() == ["a\nb\nc"]
    assert out.column("n_lines").to_pylist() == [6]
    assert out.column("n_dropped").to_pylist() == [3]


def test_dedup_lines_edge_cases():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "only one line", "x\nx\nx"]),
    })
    out = dedup_lines_batch(t)
    assert out.column("text").to_pylist() == ["", "only one line", "x"]
    assert out.column("n_dropped").to_pylist() == [0, 0, 2]


def test_lines_from_words_matches_sql_split_semantics():
    # split(' ') keeps empty strings — the SQL-parity contract
    assert lines_from_words("a b c d e", 2) == ["a b", "c d", "e"]
    assert lines_from_words("a  b", 2) == ["a ", "b"]
    assert lines_from_words("", 3) == [""]


def test_dedup_lines_dataset_words_per_line():
    texts = ["p q p q r s p q", "a b a b a b a b"]
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(texts)})
    got = (
        dedup_lines(ray.data.from_arrow(t).repartition(2), words_per_line=2)
        .sort("doc_id")
        .to_pandas()
    )
    assert got["text"].tolist() == ["p q\nr s", "a b"]
    assert got["n_lines"].tolist() == [4, 4]
    assert got["n_dropped"].tolist() == [2, 3]


# --------------------------------------------------------------------------- #
# sequence packing
# --------------------------------------------------------------------------- #
def _toy_docs(n=400, seed=5):
    rng = np.random.RandomState(seed)
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # gaps: ids need not be dense
    texts = [" ".join("t%d" % k for k in range(rng.randint(1, 40)))
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})


def _serial_concat_plan(t, budget, span):
    rows = sorted(
        zip(t.column("doc_id").to_pylist(),
            [len(x.split(" ")) for x in t.column("text").to_pylist()])
    )
    by_part: dict[int, list] = {}
    for did, ntok in rows:
        by_part.setdefault(did // span, []).append((did, ntok))
    out = {}
    for part, docs in by_part.items():
        cum = 0
        for did, ntok in docs:
            out[did] = (part, ntok, cum // budget,
                        (cum + ntok - 1) // budget, cum % budget)
            cum += ntok
    return out


@pytest.mark.parametrize("nblocks", [1, 5])
def test_pack_concat_chunks_vs_serial(nblocks):
    t = _toy_docs()
    got = (
        pack_concat_chunks(
            ray.data.from_arrow(t).repartition(nblocks),
            budget=64, part_span=50,
        )
        .sort("doc_id")
        .to_pandas()
    )
    expect = _serial_concat_plan(t, 64, 50)
    assert len(got) == t.num_rows
    for r in got.itertuples(index=False):
        assert expect[r.doc_id] == (
            r.part, r.n_tokens, r.start_chunk, r.end_chunk, r.chunk_offset
        ), r.doc_id


def _serial_greedy(t, budget, span):
    rows = sorted(
        zip(t.column("doc_id").to_pylist(),
            [len(x.split(" ")) for x in t.column("text").to_pylist()])
    )
    by_part: dict[int, list] = {}
    for did, ntok in rows:
        by_part.setdefault(did // span, []).append((did, ntok))
    out = {}
    for part, docs in by_part.items():
        b, fill, members = 0, 0, []
        fills = []
        for i, (did, ntok) in enumerate(docs):
            if i > 0 and fill + ntok > budget:
                fills.append(fill)
                b += 1
                fill = 0
            fill += ntok
            members.append((did, part, b, ntok))
        fills.append(fill)
        for did, p, bb, ntok in members:
            out[did] = (p, bb, ntok, fills[bb])
    return out


@pytest.mark.parametrize("nblocks", [1, 4])
def test_pack_greedy_bins_vs_serial(nblocks):
    t = _toy_docs(seed=9)
    got = (
        pack_greedy_bins(
            ray.data.from_arrow(t).repartition(nblocks),
            budget=64, part_span=50,
        )
        .sort("doc_id")
        .to_pandas()
    )
    expect = _serial_greedy(t, 64, 50)
    for r in got.itertuples(index=False):
        assert expect[r.doc_id] == (r.part, r.bin, r.n_tokens, r.bin_tokens), r.doc_id
    # no bin over budget unless it holds a single oversized doc
    bins = got.groupby(["part", "bin"]).agg(
        total=("n_tokens", "sum"), n=("n_tokens", "size"))
    over = bins[bins["total"] > 64]
    assert (over["n"] == 1).all()


def test_pack_greedy_oversized_doc_gets_own_bin():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", " ".join(["w"] * 100), "d e"]),
    })
    got = (
        pack_greedy_bins(ray.data.from_arrow(t), budget=10, part_span=1000)
        .sort("doc_id")
        .to_pandas()
    )
    assert got["bin"].tolist() == [0, 1, 2]
    assert got["bin_tokens"].tolist() == [3, 100, 2]


# --------------------------------------------------------------------------- #
# property tests (pure batch functions, no Ray)
# --------------------------------------------------------------------------- #
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_pii_alphabet = st.sampled_from(list("ab @.-3519\n") + ["@ex.co", "10.0.0.1",
                                                        "555-0142", "x@y.zz"])
_pii_text = st.lists(_pii_alphabet, max_size=40).map("".join)


@settings(max_examples=200, deadline=None)
@given(_pii_text)
def test_pii_redact_idempotent(s):
    t = pa.table({"text": pa.array([s], pa.string())})
    once = pii_redact_batch(t)
    twice = pii_redact_batch(once.select(["text"]))
    # placeholders contain no digits or '@', so a second pass is a no-op
    assert twice.column("text").to_pylist() == once.column("text").to_pylist()
    for c in ("n_emails", "n_ipv4", "n_phones"):
        assert twice.column(c).to_pylist() == [0]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab\n", max_size=8), max_size=10))
def test_dedup_lines_idempotent_and_order_preserving(lines):
    s = "\n".join(lines)
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([s], pa.string())})
    once = dedup_lines_batch(t)
    out = once.column("text").to_pylist()[0]
    kept = out.split("\n")
    # kept lines are distinct, in first-occurrence order, subsequence of input
    assert len(kept) == len(set(kept))
    src = s.split("\n")
    it = iter(src)
    assert all(any(ln == x for x in it) for ln in kept)
    again = dedup_lines_batch(once.select(["doc_id", "text"]))
    assert again.column("n_dropped").to_pylist() == [0]
    assert again.column("text").to_pylist() == [out]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab ", max_size=60), st.integers(1, 5))
def test_lines_from_words_roundtrip(s, n):
    assert " ".join(lines_from_words(s, n)) == s


# --------------------------------------------------------------------------- #
# packed-sequence materialization (plan ↔ chunks cross-check)
# --------------------------------------------------------------------------- #
def test_packed_chunks_match_plan_and_serial_tokens():
    from nightcrawlercmd_ray.stages.curation import (
        PAD_ID,
        _hash_token_ids,
        packed_chunks,
    )

    t = _toy_docs(n=120, seed=3)
    budget, span = 64, 50
    chunks = (
        packed_chunks(ray.data.from_arrow(t).repartition(4),
                      budget=budget, part_span=span)
        .sort(["part", "chunk"])
        .to_pandas()
    )
    plan = (
        pack_concat_chunks(ray.data.from_arrow(t), budget=budget,
                           part_span=span)
        .sort("doc_id")
        .to_pandas()
    )
    # serial reconstruction: concat hashed tokens in id order per part
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    per_part: dict[int, list] = {}
    for did, text in rows:
        per_part.setdefault(did // span, []).append(
            _hash_token_ids(text.split(" ")))
    for part, streams in per_part.items():
        flat = np.concatenate(streams)
        got = chunks[chunks["part"] == part].sort_values("chunk")
        ids = np.concatenate([np.asarray(x) for x in got["token_ids"]])
        n_chunks = len(got)
        assert n_chunks == max(1, -(-len(flat) // budget))
        assert (ids[:len(flat)] == flat).all()
        assert (ids[len(flat):] == PAD_ID).all()
        # padding confined to the final chunk and accounted
        assert got["n_pad"].iloc[:-1].eq(0).all()
        assert got["n_pad"].iloc[-1] == n_chunks * budget - len(flat)
    # every doc's tokens land where the PLAN says: offset in start_chunk
    by_key = {(r.part, r.chunk): np.asarray(r.token_ids)
              for r in chunks.itertuples(index=False)}
    for r in plan.itertuples(index=False):
        toks = _hash_token_ids(
            dict(rows)[r.doc_id].split(" "))
        seq = np.concatenate([by_key[(r.part, c)]
                              for c in range(r.start_chunk, r.end_chunk + 1)])
        off = r.chunk_offset
        assert (seq[off:off + len(toks)] == toks).all(), r.doc_id


def test_packed_chunks_n_docs_counts_overlaps():
    from nightcrawlercmd_ray.stages.curation import packed_chunks

    # 3 docs of 5 tokens, budget 4: chunks [d0,d0,d0,d0|d0? ...] — compute
    # via the operator and check against a direct interval count
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c d e", "f g h i j", "k l m n o"]),
    })
    got = (
        packed_chunks(ray.data.from_arrow(t), budget=4, part_span=100)
        .sort("chunk")
        .to_pandas()
    )
    # token intervals: d0 [0,5) d1 [5,10) d2 [10,15); chunks of 4:
    # c0 [0,4)=d0, c1 [4,8)=d0,d1, c2 [8,12)=d1,d2, c3 [12,16)=d2
    assert got["n_docs"].tolist() == [1, 2, 2, 1]
    assert got["n_pad"].tolist() == [0, 0, 0, 1]


def test_remove_boilerplate_lines_cross_doc():
    """Cross-document boilerplate removal: a line in ≥min_docs distinct docs
    is dropped everywhere (including repeated occurrences within one doc);
    rare lines survive in order; result is partition-count invariant."""
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.curation import remove_boilerplate_lines

    rows = []
    for i in range(6):
        body = f"unique body {i}\nFOOTER\nmiddle {i}\nFOOTER"
        rows.append((i, body))
    rows.append((6, "no footer here\nonly rare text"))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})

    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (remove_boilerplate_lines(ds, min_docs=3)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for i in range(6):
            assert out.loc[i, "text"] == f"unique body {i}\nmiddle {i}"
            assert out.loc[i, "n_boiler_dropped"] == 2  # both occurrences
        assert out.loc[6, "text"] == "no footer here\nonly rare text"
        assert out.loc[6, "n_boiler_dropped"] == 0


# --------------------------------------------------------------------------- #
# exact substring (k-word window) dedup — Lee et al. 2021
# --------------------------------------------------------------------------- #
def test_mask_duplicate_spans_vs_serial_oracle():
    """Spec check vs an in-process serial oracle on a crafted corpus:
    (a) a sentence shared by ≥2 docs is masked in ALL of them;
    (b) overlapping dup windows merge into one span;
    (c) a window repeated twice inside ONE doc does not count (min_docs
        is distinct-doc count);
    (d) docs shorter than k words are untouched;
    (e) result is partition-count invariant."""
    import ray

    from nightcrawlercmd_ray.stages.curation import mask_duplicate_spans

    k = 4
    shared = "alpha beta gamma delta epsilon"          # 5 words → 2 windows
    docs = [
        (0, f"intro zero {shared} outro zero"),
        (1, f"different lead {shared} different tail"),
        (2, "self rep self rep self rep self rep"),     # intra-doc repeat only
        (3, "short doc"),                               # < k words
        (4, ""),                                        # empty
    ]

    # serial oracle
    from collections import Counter
    cnt: Counter = Counter()
    for _, text in docs:
        ws = text.split(" ")
        cnt.update({" ".join(ws[i:i + k]) for i in range(max(0, len(ws) - k + 1))})
    hot = {g for g, n in cnt.items() if n >= 2}

    expect = {}
    for did, text in docs:
        ws = text.split(" ")
        covered = [False] * len(ws)
        for i in range(max(0, len(ws) - k + 1)):
            if " ".join(ws[i:i + k]) in hot:
                for j in range(i, i + k):
                    covered[j] = True
        expect[did] = (" ".join(w for w, c in zip(ws, covered) if not c),
                       len(ws), sum(covered))

    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (mask_duplicate_spans(ds, k=k, min_docs=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for _, row in out.iterrows():
            etext, enw, end_ = expect[row["doc_id"]]
            assert row["text"] == etext, row["doc_id"]
            assert row["n_words"] == enw
            assert row["n_dup_words"] == end_

    # positive assertions on the spec itself
    assert expect[0][2] == 5 and expect[1][2] == 5      # whole shared run masked
    assert shared not in expect[0][0] and shared not in expect[1][0]
    assert expect[2][2] == 0                            # intra-doc only → kept
    assert expect[3] == ("short doc", 2, 0)
    assert expect[4] == ("", 1, 0)


# --- chunk_documents_fixed ---------------------------------------------------


def test_chunker_reconstruction_and_overlap():
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.curation import chunk_documents_fixed

    texts = {1: "abcdefghij" * 100,  # 1000 chars
             2: "short",
             3: "",
             4: "x" * 512,            # exactly one window
             5: "y" * 513}            # forces a second window
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()]).repartition(3)
    out = chunk_documents_fixed(ds, size=512, overlap=64).to_pandas()
    out = out.sort_values(["doc_id", "chunk_id"])
    step = 512 - 64
    for did, grp in out.groupby("doc_id"):
        s = texts[did]
        assert list(grp["chunk_id"]) == list(range(len(grp)))
        # reconstruction: drop each chunk's first `overlap` chars after the
        # first chunk and concatenation re-yields the document
        rebuilt = "".join(
            c if i == 0 else c[64:] for i, c in enumerate(grp["chunk_text"]))
        assert rebuilt == s
        # consecutive chunks actually overlap by `overlap` chars
        chunks = list(grp["chunk_text"])
        for a, b in zip(chunks, chunks[1:]):
            assert a[step:] == b[: len(a) - step]
    assert len(out[out["doc_id"] == 3]) == 1  # empty doc → one empty chunk
    assert len(out[out["doc_id"] == 4]) == 1
    assert len(out[out["doc_id"] == 5]) == 2


def test_chunker_rejects_bad_overlap():
    import pytest as _pytest
    import ray

    from nightcrawlercmd_ray.stages.curation import chunk_documents_fixed

    ds = ray.data.from_items([{"doc_id": 1, "text": "abc"}])
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents_fixed(ds, size=64, overlap=64)


def test_normalize_text_nfc_control_and_spaceruns():
    """normalize_text: NFC composition, control strip (tab/newline kept as
    separators then runs collapsed), end-trim — matches a serial
    unicodedata reference on adversarial strings."""
    import unicodedata

    from nightcrawlercmd_ray.stages.curation import (
        RE_CONTROL,
        RE_SPACERUN,
        normalize_text,
    )

    cases = [
        "cafe\u0301 au lait",       # decomposed accent -> composed
        "x\x00y\x07z",                 # control bytes stripped
        "a\t\t  b\tc",                 # tab/space runs → single space
        "  padded  ",                  # trimmed
        "keep\nnewlines\nintact",      # \n survives
        "\nleading and trailing\n ",   # end-\n survives (trim ≡ strip(' '))
        "",                            # empty
        "ﬁ ＡＢ",                      # ligature/fullwidth: NFC keeps them
    ]
    ids = list(range(len(cases)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(cases, pa.string())})
    out = (
        normalize_text(ray.data.from_arrow(t).repartition(2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    def serial(s):
        s = unicodedata.normalize("NFC", s)
        s = RE_CONTROL.sub("", s)
        return RE_SPACERUN.sub(" ", s).strip(" ")

    assert list(out["text_norm"]) == [serial(s) for s in cases]
    assert out.loc[0, "text_norm"] == "café au lait"
    assert out.loc[1, "text_norm"] == "xyz"
    assert out.loc[2, "text_norm"] == "a b c"
    assert "\n" in out.loc[4, "text_norm"]
    assert (out["n_chars_norm"] == out["text_norm"].str.len()).all()
