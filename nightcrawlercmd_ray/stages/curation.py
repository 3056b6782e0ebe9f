"""Corpus-curation stages a large-scale training-data pipeline needs on top
of dedup: PII redaction, intra-document repetition removal, and sequence
packing (engine additions per the SURVEY mandate — the reference has no
counterpart; its nearest relative is the regex extractor family,
``/root/reference/mainWordlist.go:17-22``, which these stages deliberately
mirror in style: compiled-once patterns, vectorized per-batch application).

All three are shuffle-light by construction:

- ``pii_redact`` is a pure per-batch map (NO shuffle);
- ``dedup_lines`` is a pure per-batch map (line dedup is doc-local);
- the packers do ONE bounded keyed shuffle (``groupby(part)``) where
  ``part`` is a deterministic doc-id range, so group size is capped by
  ``part_span`` regardless of corpus size — at 100 TB the parts stream
  through ``map_groups`` with per-task memory ∝ part_span, never ∝ corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# Patterns are RE2-compatible (no backrefs / lookarounds) so the DuckDB
# oracle can run the literal same expressions; Python re and RE2 agree on
# leftmost, non-overlapping 'g' semantics for this subset.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_redact_batch(
    t: pa.Table,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> pa.Table:
    """Sequentially redact each PII category and count its matches at the
    point its pass runs (pass order is part of the spec — a category never
    sees text already replaced by an earlier one). Appends one ``n_<name>``
    int64 column per category and rewrites ``text_col`` in place."""
    compiled = [(name, re.compile(pat), repl) for name, pat, repl in patterns]
    texts = [x or "" for x in t.column(text_col).to_pylist()]
    counts: dict[str, list[int]] = {name: [] for name, _, _ in compiled}
    out_texts: list[str] = []
    for s in texts:
        for name, rx, repl in compiled:
            s, n = rx.subn(repl, s)
            counts[name].append(n)
        out_texts.append(s)
    cols = {c: t.column(c) for c in t.column_names}
    cols[text_col] = pa.array(out_texts, pa.string())
    out = pa.table(cols)
    for name, _, _ in compiled:
        out = out.append_column(f"n_{name}", pa.array(counts[name], pa.int64()))
    return out


def pii_redact(ds, text_col: str = "text",
               patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS):
    """Dataset-level PII scrub: pure ``map_batches``, no shuffle, patterns
    compiled once per task via the partial's closure."""
    import functools

    return ds.map_batches(
        functools.partial(pii_redact_batch, text_col=text_col,
                          patterns=patterns),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# intra-document repetition removal (C4-style repeated-line dedup)
# ---------------------------------------------------------------------------
def lines_from_words(text: str, words_per_line: int) -> list[str]:
    """Regroup a single-spaced text into fixed-width pseudo-lines — the
    deterministic derivation the oracled query uses on the newline-free
    synthetic corpus (``string_split(text, ' ')`` zipped ``n`` at a time).
    Uses ``split(' ')``, not ``split()``, to match SQL exactly (repeated
    spaces yield empty words on both sides)."""
    w = text.split(" ")
    return [" ".join(w[i:i + words_per_line])
            for i in range(0, len(w), words_per_line)]


def _dedup_lines_core(texts: list[str], words_per_line: int | None):
    out_text: list[str] = []
    out_lines: list[int] = []
    out_drop: list[int] = []
    for s in texts:
        lines = (lines_from_words(s, words_per_line)
                 if words_per_line else s.split("\n"))
        seen: set[str] = set()
        kept: list[str] = []
        for ln in lines:
            if ln in seen:
                continue
            seen.add(ln)
            kept.append(ln)
        out_text.append("\n".join(kept))
        out_lines.append(len(lines))
        out_drop.append(len(lines) - len(kept))
    return out_text, out_lines, out_drop


def dedup_lines_batch(t: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id",
                      words_per_line: int | None = None) -> pa.Table:
    """Keep the FIRST occurrence of each distinct line within a document and
    drop later repeats (the C4/Gopher boilerplate filter). Doc-local, so a
    pure per-batch map. When ``words_per_line`` is set the text is first
    regrouped via :func:`lines_from_words`; otherwise lines are ``\\n``
    splits. → columns (id_col, text, n_lines, n_dropped)."""
    texts = [x or "" for x in t.column(text_col).to_pylist()]
    out_text, out_lines, out_drop = _dedup_lines_core(texts, words_per_line)
    return pa.table({
        id_col: t.column(id_col),
        "text": pa.array(out_text, pa.string()),
        "n_lines": pa.array(out_lines, pa.int64()),
        "n_dropped": pa.array(out_drop, pa.int64()),
    })


def dedup_lines_in_place(t: pa.Table, text_col: str = "text",
                         words_per_line: int | None = None) -> pa.Table:
    """Column-preserving form for pipeline composition (cleanroom): rewrites
    ``text_col`` with repeats dropped and appends ``n_lines_dropped``."""
    texts = [x or "" for x in t.column(text_col).to_pylist()]
    out_text, _, out_drop = _dedup_lines_core(texts, words_per_line)
    cols = {c: t.column(c) for c in t.column_names}
    cols[text_col] = pa.array(out_text, pa.string())
    out = pa.table(cols)
    return out.append_column("n_lines_dropped", pa.array(out_drop, pa.int64()))


def dedup_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                words_per_line: int | None = None):
    import functools

    return ds.map_batches(
        functools.partial(dedup_lines_batch, text_col=text_col,
                          id_col=id_col, words_per_line=words_per_line),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------
def _token_parts(ds, id_col: str, text_col: str, part_span: int):
    """(id, part, n_tokens) rows — n_tokens = len(split(' ')) to match the
    SQL oracle; part = id // part_span bounds every downstream group."""
    def stats(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        ntok = np.fromiter(
            (len((x or "").split(" ")) for x in t.column(text_col).to_pylist()),
            dtype=np.int64, count=t.num_rows)
        return pa.table({
            id_col: ids,
            "part": pa.array(ids_np // part_span),
            "n_tokens": pa.array(ntok),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def pack_concat_chunks(ds, budget: int = 512, part_span: int = 100,
                       id_col: str = "doc_id", text_col: str = "text"):
    """GPT-style concat-and-chop packing plan: within each deterministic
    doc-id-range part, documents are concatenated in id order and the token
    stream is chopped into fixed ``budget``-token chunks; docs may span a
    chunk boundary. Emits, per doc, the chunk range it lands in and its
    offset in the first chunk — the plan a pack-writer needs to materialize
    training sequences.

    Scale shape: one ``groupby(part)`` shuffle of 3-int rows (never text);
    each group is ≤ ``part_span`` rows, cumsum'd with numpy. Deterministic
    at any parallelism (id-sorted within part, parts independent).
    → Dataset(id, part, n_tokens, start_chunk, end_chunk, chunk_offset).
    """
    def plan(g: pa.Table) -> pa.Table:
        g = g.sort_by([(id_col, "ascending")])
        ntok = g.column("n_tokens").to_numpy(zero_copy_only=False)
        cum_excl = np.cumsum(ntok) - ntok
        return pa.table({
            id_col: g.column(id_col),
            "part": g.column("part"),
            "n_tokens": g.column("n_tokens"),
            "start_chunk": pa.array(cum_excl // budget),
            "end_chunk": pa.array((cum_excl + ntok - 1) // budget),
            "chunk_offset": pa.array(cum_excl % budget),
        })

    return (
        _token_parts(ds, id_col, text_col, part_span)
        .groupby("part")
        .map_groups(plan, batch_format="pyarrow")
    )


def _hash_token_ids(words: list[str]) -> np.ndarray:
    """Deterministic 31-bit token ids from whitespace words — a stand-in
    vocabulary (no real BPE tokenizer ships in this sandbox; the id space
    and fixed-length layout are what the packing layer actually exercises).
    FNV-1a over utf-8 bytes, masked to int32-positive."""
    out = np.empty(len(words), dtype=np.int32)
    for i, w in enumerate(words):
        h = 0x811C9DC5
        for b in w.encode("utf-8"):
            h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
        out[i] = h & 0x7FFFFFFF
    return out


PAD_ID = -1


def packed_chunks(ds, budget: int = 512, part_span: int = 100,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Materialize the concat-and-chop plan: one output row per fixed-length
    training sequence — ``token_ids`` is EXACTLY ``budget`` ids (the final
    chunk of each part padded with ``PAD_ID``). Token stream = whitespace
    words in doc-id order, hashed via :func:`_hash_token_ids`, byte-for-byte
    the same layout :func:`pack_concat_chunks` plans (cross-checked in
    tests/test_curation.py).

    Scale shape: unlike the planner, TEXT rides this shuffle (it must — the
    sequences are built from it), but each ``map_groups`` group is still
    capped at ``part_span`` documents, and the output chunks stream straight
    to the consumer. → Dataset(part, chunk, token_ids, n_pad, n_docs).
    """
    def stats(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: ids,
            "part": pa.array(ids_np // part_span),
            "text": pc.cast(t.column(text_col), pa.string()),
        })

    def assemble(g: pa.Table) -> pa.Table:
        g = g.sort_by([(id_col, "ascending")])
        streams = [_hash_token_ids((x or "").split(" "))
                   for x in g.column("text").to_pylist()]
        lens = np.array([len(s) for s in streams], dtype=np.int64)
        total = int(lens.sum())
        n_chunks = max(1, -(-total // budget))
        flat = np.full(n_chunks * budget, PAD_ID, dtype=np.int32)
        flat[:total] = np.concatenate(streams) if streams else []
        # docs overlapping each chunk: doc i spans [cum[i], cum[i]+len)
        cum = np.cumsum(lens) - lens
        start_chunk = cum // budget
        end_chunk = (cum + np.maximum(lens, 1) - 1) // budget
        # docs touching chunk c = (#starts ≤ c) − (#ends < c), via two
        # cumulative bincounts — O(n_chunks), no per-chunk scan
        starts_cum = np.cumsum(np.bincount(start_chunk, minlength=n_chunks))
        ends_before = np.concatenate((
            [0], np.cumsum(np.bincount(end_chunk, minlength=n_chunks))[:-1]
        ))
        n_docs = (starts_cum - ends_before).astype(np.int64)
        part_val = int(g.column("part")[0].as_py()) if g.num_rows else 0
        n_pad = np.zeros(n_chunks, dtype=np.int64)
        if total < n_chunks * budget:
            n_pad[-1] = n_chunks * budget - total
        return pa.table({
            "part": pa.array(np.full(n_chunks, part_val, dtype=np.int64)),
            "chunk": pa.array(np.arange(n_chunks, dtype=np.int64)),
            "token_ids": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.int32()), budget),
            "n_pad": pa.array(n_pad),
            "n_docs": pa.array(n_docs),
        })

    return (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby("part")
        .map_groups(assemble, batch_format="pyarrow")
    )


def pack_greedy_bins(ds, budget: int = 512, part_span: int = 100,
                     id_col: str = "doc_id", text_col: str = "text"):
    """No-split first-fit-in-order packing: within each part, walk docs in
    id order, closing the current bin whenever the next doc would exceed
    ``budget``; a doc larger than ``budget`` gets a bin of its own. Unlike
    :func:`pack_concat_chunks` no document crosses a bin boundary (the
    fine-tuning / instruction-data packing discipline).

    Same scale shape as the chunk packer (one bounded keyed shuffle of int
    rows). → Dataset(id, part, bin, n_tokens, bin_tokens) where ``bin`` is
    part-local and ``bin_tokens`` is the filled size of the doc's bin.
    """
    def plan(g: pa.Table) -> pa.Table:
        g = g.sort_by([(id_col, "ascending")])
        ntok = g.column("n_tokens").to_numpy(zero_copy_only=False)
        bins = np.empty(len(ntok), dtype=np.int64)
        fill = 0
        b = 0
        fills: list[int] = []
        for i, n in enumerate(ntok):
            if i > 0 and fill + n > budget:
                fills.append(fill)
                b += 1
                fill = 0
            fill += int(n)
            bins[i] = b
        fills.append(fill)
        bin_tokens = np.array(fills, dtype=np.int64)[bins]
        return pa.table({
            id_col: g.column(id_col),
            "part": g.column("part"),
            "bin": pa.array(bins),
            "n_tokens": g.column("n_tokens"),
            "bin_tokens": pa.array(bin_tokens),
        })

    return (
        _token_parts(ds, id_col, text_col, part_span)
        .groupby("part")
        .map_groups(plan, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# cross-document boilerplate-line removal
# ---------------------------------------------------------------------------
def boilerplate_hot_lines(ds, text_col: str = "text", *, min_docs: int = 2):
    """→ Dataset(line, n) of lines appearing in ≥ ``min_docs`` DISTINCT
    documents — the global side of C4-style boilerplate removal (shared
    headers/footers/nav text repeated across a crawl).

    Scale shape: each batch pre-aggregates unique-lines-per-doc into a
    (line, partial doc count) Counter (a combiner — a line that appears in
    every doc of a batch leaves the batch as ONE row), then a single
    ``groupby(line).sum`` merges the partials. The shuffle is keyed on the
    exact line string so the result is byte-exact vs a SQL oracle (a 64-bit
    line hash would wrongly drop a rare line on collision); volume is
    bounded by distinct-lines-per-batch, not occurrences."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for x in t.column(text_col).to_pylist():
            for ln in set((x or "").split("\n")):
                c[ln] += 1
        return pa.table({"line": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("line")
        .aggregate(Sum("n", alias_name="n"))
    )

    def hot_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n"),
                                         pa.scalar(min_docs, pa.int64())))

    return counts.map_batches(hot_only, batch_format="pyarrow")


def remove_boilerplate_lines(ds, text_col: str = "text",
                             id_col: str = "doc_id", *, min_docs: int = 2):
    """Remove every line that occurs in ≥ ``min_docs`` distinct documents;
    surviving lines keep their order (re-joined with ``\\n``). Appends
    ``n_boiler_dropped`` (dropped line occurrences per doc).

    Two streaming passes: the global hot-line set (small by construction —
    bounded by corpus/min_docs distinct strings; boilerplate in practice)
    is computed once and broadcast via ``ray.put``; the rewrite pass is a
    pure per-batch map, zero shuffle of document text."""
    import ray

    hot_rows = boilerplate_hot_lines(
        ds, text_col, min_docs=min_docs).take_all()
    hot_ref = ray.put(frozenset(r["line"] for r in hot_rows))

    def drop(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        out_text, out_n = [], []
        for x in t.column(text_col).to_pylist():
            lines = (x or "").split("\n")
            kept = [ln for ln in lines if ln not in hot]
            out_text.append("\n".join(kept))
            out_n.append(len(lines) - len(kept))
        cols = {c: t.column(c) for c in t.column_names}
        cols[text_col] = pa.array(out_text, pa.string())
        out = pa.table(cols)
        return out.append_column("n_boiler_dropped",
                                 pa.array(out_n, pa.int64()))

    return ds.map_batches(drop, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-document exact substring (k-word window) dedup — Lee et al. 2021
# ---------------------------------------------------------------------------
def duplicate_window_shingles(ds, text_col: str = "text", *,
                              k: int = 8, min_docs: int = 2):
    """→ Dataset(shingle, n) of k-word windows appearing in ≥ ``min_docs``
    DISTINCT documents — the global side of exact-substring dedup
    ("Deduplicating Training Data Makes Language Models Better", Lee et al.
    2021: repeated ≥k-token substrings across a crawl are memorization
    hazards and should be masked).  The reference's nearest relative is its
    exact whole-page dedup (``map[string]bool``, SURVEY §2.7); this is the
    sub-document generalization a training-data pipeline needs.

    Tokenization is ``text.split(' ')`` — identical to the SQL oracle's
    ``string_split(text, ' ')`` (the documents corpus is single-spaced).

    Scale shape: per-batch combiner (per-doc DISTINCT windows → partial
    (shingle, doc count) rows) → ONE ``groupby(shingle).sum`` → filter.
    The exchange is inherently O(total windows) — true of every exact
    substring-dedup construction (suffix arrays also touch every token);
    what the combiner buys is one row per batch-distinct window.  At the
    100 TB design point, key this shuffle on a 128-bit window hash instead
    of the string (8-16× smaller rows; ``_content_hashes``-style double
    xxhash makes false merges ~2^-63) — string keying here is for byte-
    exactness vs the DuckDB oracle."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for x in t.column(text_col).to_pylist():
            ws = (x or "").split(" ")
            if len(ws) >= k:
                c.update({" ".join(ws[i:i + k])
                          for i in range(len(ws) - k + 1)})
        return pa.table({"shingle": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shingle")
        .aggregate(Sum("n", alias_name="n"))
    )

    def hot_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n"),
                                         pa.scalar(min_docs, pa.int64())))

    return counts.map_batches(hot_only, batch_format="pyarrow")


def mask_duplicate_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                         *, k: int = 8, min_docs: int = 2):
    """Exact substring dedup: remove from EVERY document all words covered
    by any k-word window that occurs in ≥ ``min_docs`` distinct documents
    (overlapping duplicate windows merge into spans).  Appends ``n_words``
    (pre-mask word count) and ``n_dup_words`` (words removed); surviving
    words keep their order (re-joined with a single space).

    Two streaming passes, mirroring :func:`remove_boilerplate_lines`: the
    duplicated-window set is bounded by *duplicated* content (not corpus
    size) and is broadcast once via ``ray.put``; the rewrite is a pure
    per-batch map — document text itself never shuffles.  If the dup set
    outgrows a broadcast (adversarial corpora), the fallback is the
    sidecar keyed-join shape used by ``pipelines/cleanroom._drop_sidecar_ids``:
    ship (doc_id, window start) rows through a doc-keyed shuffle instead."""
    import ray

    hot_rows = duplicate_window_shingles(
        ds, text_col, k=k, min_docs=min_docs).take_all()
    # Broadcast the hot set as word TUPLES plus a first-word prefilter:
    # the per-window probe is then one dict hit on a cached-hash str, and a
    # tuple is only materialized at candidate head positions.
    hot_tuples = frozenset(tuple(r["shingle"].split(" ")) for r in hot_rows)
    hot_ref = ray.put((hot_tuples, frozenset(w[0] for w in hot_tuples)))

    def mask(t: pa.Table) -> pa.Table:
        hot, heads = ray.get(hot_ref)
        out_text, out_nw, out_nd = [], [], []
        for x in t.column(text_col).to_pylist():
            ws = (x or "").split(" ")
            n = len(ws)
            out_nw.append(n)
            if n < k or not hot:
                out_text.append(" ".join(ws))
                out_nd.append(0)
                continue
            covered = np.zeros(n, dtype=bool)
            for i in range(n - k + 1):
                if ws[i] in heads and tuple(ws[i:i + k]) in hot:
                    covered[i:i + k] = True
            if covered.any():
                kept = [w for w, c in zip(ws, covered) if not c]
                out_text.append(" ".join(kept))
                out_nd.append(int(covered.sum()))
            else:
                out_text.append(" ".join(ws))
                out_nd.append(0)
        cols = {c: t.column(c) for c in t.column_names}
        cols[text_col] = pa.array(out_text, pa.string())
        out = pa.table(cols)
        return (out.append_column("n_words", pa.array(out_nw, pa.int64()))
                .append_column("n_dup_words", pa.array(out_nd, pa.int64())))

    return ds.map_batches(mask, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-domain (source/host) quality aggregation + filter
# ---------------------------------------------------------------------------
def source_quality_filter(ds, *, min_mean_chars: int,
                          id_col: str = "doc_id",
                          source_col: str = "source",
                          chars_col: str = "n_chars"):
    """Domain-level curation: aggregate a quality statistic per source
    (here mean document length in chars — the signal domain blocklists are
    built from) and keep only documents from sources whose mean clears the
    threshold. The comparison is an integer cross-multiplication
    (``sum_chars >= min_mean_chars * n_docs``) so the DuckDB oracle hashes
    bit-exact.

    Scale shape: per-batch combiner → ONE ``groupby(source).sum`` whose
    result is |distinct sources| (≈10^8 hosts at web scale, NOT corpus-
    sized) → broadcast the kept-source stats dict via ``ray.put`` → pure
    filter map. If the kept set outgrows a broadcast, flip to broadcasting
    the (usually far smaller) REJECTED set and keep-by-default, or fall
    back to the keyed ``stages/joins.hash_join`` semi-join — same output.
    → Dataset(doc_id, source, src_docs, src_chars) for kept documents."""
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        src = t.column(source_col).to_pylist()
        chars = pc.cast(t.column(chars_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        agg: dict[str, list[int]] = {}
        for s, c in zip(src, chars.tolist()):
            e = agg.setdefault(s, [0, 0])
            e[0] += 1
            e[1] += c
        return pa.table({
            source_col: pa.array(list(agg.keys()), pa.string()),
            "src_docs": pa.array([v[0] for v in agg.values()], pa.int64()),
            "src_chars": pa.array([v[1] for v in agg.values()], pa.int64()),
        })

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(source_col)
        .aggregate(Sum("src_docs", alias_name="src_docs"),
                   Sum("src_chars", alias_name="src_chars"))
        .take_all()
    )
    kept = {r[source_col]: (r["src_docs"], r["src_chars"]) for r in stats
            if r["src_chars"] >= min_mean_chars * r["src_docs"]}
    kept_ref = ray.put(kept)

    def filt(t: pa.Table) -> pa.Table:
        k = ray.get(kept_ref)
        src = t.column(source_col).to_pylist()
        mask = np.fromiter((s in k for s in src), dtype=bool, count=len(src))
        idx = np.flatnonzero(mask)
        srcs = [src[i] for i in idx.tolist()]
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()).take(pa.array(idx)),
            source_col: pa.array(srcs, pa.string()),
            "src_docs": pa.array([k[s][0] for s in srcs], pa.int64()),
            "src_chars": pa.array([k[s][1] for s in srcs], pa.int64()),
        })

    return ds.map_batches(filt, batch_format="pyarrow")


def chunk_documents_fixed(ds, *, size: int = 512, overlap: int = 64,
                          text_col: str = "text", id_col: str = "doc_id"):
    """RAG-prep chunker: fixed character windows with overlap — each doc
    yields ceil(max(len-overlap,1) / (size-overlap)) chunks of ``size``
    chars stepping ``size-overlap`` (the standard retrieval-index layout).
    Pure flat-map, zero shuffle, trivially resumable. Empty docs yield one
    empty chunk row (the doc stays addressable in the index).
    → (id_col, chunk_id [0-based], chunk_text, n_chars).

    Windows are CHARACTER-based (Python code points ≡ SQL substr semantics),
    which is what makes the DuckDB oracle bit-exact; a token-window variant
    would compose with the BPE encoder upstream."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap

    def chunk(t: pa.Table) -> pa.Table:
        ids, cids, texts, lens = [], [], [], []
        for did, text in zip(t.column(id_col).to_pylist(),
                             t.column(text_col).to_pylist()):
            s = text or ""
            n = len(s)
            k = 0
            while True:
                start = k * step
                piece = s[start:start + size]
                ids.append(did)
                cids.append(k)
                texts.append(piece)
                lens.append(len(piece))
                k += 1
                if start + size >= n:
                    break
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "chunk_id": pa.array(cids, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
            "n_chars": pa.array(lens, pa.int64()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


RE_CONTROL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
RE_SPACERUN = re.compile(r"[ \t]+")


def normalize_text(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Unicode + whitespace normalization — the canonicalization pass a
    web-text pipeline runs before hashing/dedup so that byte-different,
    render-identical documents (NFD vs NFC accents, fullwidth forms typed
    raw, stray control bytes, tab runs) collapse to one form:

    1. NFC normalize (composed forms; Python ``unicodedata`` and DuckDB
       ``nfc_normalize`` agree — pinned by the SQL oracle);
    2. strip control characters except ``\\n`` / ``\\r`` / ``\\t``;
    3. collapse space/tab runs to a single space;
    4. strip SPACES from the ends (``strip(' ')`` — exactly DuckDB's
       ``trim``; newlines are document structure and survive at the ends
       too, so the engine and the oracle agree on multi-line text).

    Pure stateless per-batch map: zero shuffle, trivially scale-safe.
    → Dataset(id_col, text_norm, n_chars_norm).
    """
    import unicodedata

    def norm(t: pa.Table) -> pa.Table:
        out = []
        for s in t.column(text_col).to_pylist():
            s = unicodedata.normalize("NFC", s or "")
            s = RE_CONTROL.sub("", s)
            # strip(' ') — not strip(): bare strip removes \n/unicode ws,
            # diverging from the oracle's trim() on multi-line text
            s = RE_SPACERUN.sub(" ", s).strip(" ")
            out.append(s)
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()),
            "text_norm": pa.array(out, pa.string()),
            "n_chars_norm": pa.array([len(s) for s in out], pa.int64()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")
