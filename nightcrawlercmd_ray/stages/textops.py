"""Text-analysis batch stages over a documents table: language-ID, quality
scoring, token counting, fingerprinting (engine additions, SURVEY mandate)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import (
    detect_lang,
    fingerprint,
    quality_features,
    quality_score,
    token_count_bpe,
    token_count_ws,
)


def annotate_text_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """One pass per batch → appended columns: detected_lang, quality,
    n_tokens_ws, n_tokens_bpe, fingerprint."""
    texts = [x or "" for x in t.column(text_col).to_pylist()]
    return (
        t.append_column("detected_lang", pa.array([detect_lang(x) for x in texts], pa.string()))
        .append_column("quality", pa.array([quality_score(x) for x in texts], pa.float64()))
        .append_column("n_tokens_ws", pa.array([token_count_ws(x) for x in texts], pa.int64()))
        .append_column("n_tokens_bpe", pa.array([token_count_bpe(x) for x in texts], pa.int64()))
        .append_column(
            "fingerprint",
            pa.array([fingerprint(x) & 0x7FFFFFFFFFFFFFFF for x in texts], pa.int64()),
        )
    )


def quality_features_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Full feature vector per doc (keyed by whatever id columns exist)."""
    texts = [x or "" for x in t.column(text_col).to_pylist()]
    feats = [quality_features(x) for x in texts]
    out = {c: t.column(c) for c in t.column_names if c != text_col}
    if feats:
        for key in feats[0]:
            out[key] = pa.array([f[key] for f in feats], pa.float64())
    return pa.table(out)


def annotate_documents(ds, text_col: str = "text"):
    import functools

    return ds.map_batches(
        functools.partial(annotate_text_batch, text_col=text_col),
        batch_format="pyarrow",
    )


def bigram_counts(ds, text_col: str = "text", top_k: int | None = None):
    """Corpus-wide word-bigram counts — the n-gram statistic a training-data
    pipeline derives for contamination checks and boilerplate detection.

    Tokenization: ``[a-z]+`` runs of the lowercased text (identical to
    ``list_filter(regexp_split_to_array(lower(text),'[^a-z]+'), x<>'')`` in
    the SQL oracle — ``re.findall`` IS split-then-drop-empties).

    Scale shape: per-batch combiner (a Counter over the batch's bigrams →
    partial ``(w1, w2, n)`` rows, so the shuffle carries the batch's
    DISTINCT bigrams, not one row per occurrence) → ONE
    ``groupby(w1, w2).sum`` shuffle → optional top-k via sort+limit (the
    grouped result is |distinct bigrams|, far smaller than the corpus).
    → Dataset(w1, w2, n) — sorted (n desc, w1, w2) when ``top_k`` is set.
    """
    import re
    from collections import Counter

    word_re = re.compile(r"[a-z]+")

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            toks = word_re.findall((text or "").lower())
            c.update(zip(toks, toks[1:]))
        w1 = pa.array([k[0] for k in c], pa.string())
        w2 = pa.array([k[1] for k in c], pa.string())
        n = pa.array(list(c.values()), pa.int64())
        return pa.table({"w1": w1, "w2": w2, "n": n})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["w1", "w2", "n"]),
            batch_format="pyarrow",
        )
    )
    if top_k is not None:
        out = out.sort(["n", "w1", "w2"], descending=[True, False, False]).limit(top_k)
    return out


def document_frequency(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-word document frequency — the DF side of TF-IDF and the statistic
    contamination/boilerplate filters threshold on ("appears in >x% of
    docs"). Tokenization matches the wordcount/wordlist family
    (``RE_WORD``, extractors.py: ``[a-zA-Z][a-z]{3,}`` lowercased).

    Scale shape: per-batch combiner — for each doc take the DISTINCT word
    set, then count docs per word within the batch, so the shuffle carries
    at most |distinct words in batch| rows → ONE ``groupby(word).sum``.
    → Dataset(word, df).
    """
    from collections import Counter

    from nightcrawlercmd_ray.functions.extractors import RE_WORD

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update({w.lower() for w in RE_WORD.findall(text or "")})
        return pa.table({
            "word": pa.array(list(c.keys()), pa.string()),
            "df": pa.array(list(c.values()), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("df")
        .map_batches(
            lambda t: t.rename_columns(["word", "df"]), batch_format="pyarrow"
        )
    )


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   min_df: int = 1, num_partitions: int | None = None,
                   n_docs: int | None = None):
    """Full inverted index: per word its document frequency and the complete
    doc_id-ascending posting list (comma-joined string — one row per term,
    the layout a search/retrieval stage consumes). Tokenization matches the
    wordcount/DF family (``RE_WORD`` lowercased) so the DuckDB oracle is
    shared machinery.

    Scale shape: per-batch combiner emits DISTINCT (word, doc_id) pairs
    (shuffle rows ∝ distinct pairs, never occurrences) tagged with a coarse
    key crc32(word) % P where P scales with the corpus
    (``dedup._num_coarse_partitions`` — bounded per-partition memory, groups
    big enough to amortize dispatch). ONE coarse shuffle; inside a partition
    the postings build is segment arithmetic over (word, doc_id)-sorted rows
    plus Arrow C kernels (``ListArray.from_arrays`` + ``binary_join``) — no
    per-word Python. Posting-list strings stay inside their partition until
    written. → Dataset(word, df, postings)."""
    import zlib
    from collections import defaultdict

    from ..functions.extractors import RE_WORD
    from .dedup import _num_coarse_partitions

    P = _num_coarse_partitions(ds, num_partitions, n_docs,
                               rows_per_partition=4000)

    def pairs(t: pa.Table) -> pa.Table:
        by_word: dict[str, list] = defaultdict(list)
        ids = t.column(id_col).to_pylist()
        for did, text in zip(ids, t.column(text_col).to_pylist()):
            for w in {w.lower() for w in RE_WORD.findall(text or "")}:
                by_word[w].append(did)
        words, dids, coarse = [], [], []
        for w, ds_ in by_word.items():
            c = zlib.crc32(w.encode()) % P
            words.extend([w] * len(ds_))
            dids.extend(ds_)
            coarse.extend([c] * len(ds_))
        return pa.table({
            "word": pa.array(words, pa.string()),
            "doc_id": pa.array(dids, pa.int64()),
            "_coarse": pa.array(coarse, pa.int64()),
        })

    def build_postings(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.string())})
        g = g.sort_by([("word", "ascending"), ("doc_id", "ascending")])
        w = g.column("word").to_numpy(zero_copy_only=False)
        new = np.empty(len(w), dtype=bool)
        new[0] = True
        new[1:] = w[1:] != w[:-1]
        starts = np.nonzero(new)[0]
        offsets = np.append(starts, len(w)).astype(np.int32)
        df = np.diff(offsets).astype(np.int64)
        did_str = pc.cast(g.column("doc_id").combine_chunks(), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets), did_str)
        postings = pc.binary_join(lists, ",")
        out = pa.table({"word": pa.array(w[starts], pa.string()),
                        "df": pa.array(df, pa.int64()),
                        "postings": postings})
        if min_df > 1:
            out = out.filter(pc.field("df") >= min_df)
        return out

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(build_postings, batch_format="pyarrow")
    )


def tfidf_top_terms(ds, k: int = 5, min_df: int = 2,
                    text_col: str = "text", id_col: str = "doc_id", *,
                    broadcast_limit: int = 2_000_000,
                    num_partitions: int | None = None):
    """Per-document top-k informative keywords: rank terms by TF descending
    with corpus document frequency as the informativeness tie-breaker
    (df ASC — rarer wins) then word — a deterministic integer-only TF-IDF
    ranking (no float idf, so the DuckDB oracle compares exactly). Terms in
    fewer than ``min_df`` docs are dropped. Tokenization = the wordcount
    family (``RE_WORD`` lowercased).

    Scale shape: ONE word shuffle total (inside ``document_frequency``);
    the DF side is pruned to ``min_df`` survivors and then EITHER broadcast
    once (``ray.put``) while ≤ ``broadcast_limit`` distinct words survive —
    TF, the DF probe and the top-k cut all stay local to each batch — OR,
    past the limit (web-scale vocab at min_df=2 is ~10^9), resolved by a
    coarse word-keyed shuffle of the per-doc distinct (word, tf) rows
    against the DF stream, followed by a doc-keyed shuffle for the top-k
    cut: exchange volume O(distinct doc-word pairs), the DF table never
    folds on the driver. Both paths are bit-identical (pinned in
    tests/test_textops_bm25.py with the join path forced).
    → Dataset(doc_id, word, tf, df).
    """
    from collections import Counter

    import ray

    from nightcrawlercmd_ray.functions.extractors import RE_WORD

    df_ds = document_frequency(ds, text_col, id_col)
    if min_df > 1:
        df_ds = df_ds.filter(expr=f"df >= {int(min_df)}")
    df_ds = df_ds.materialize()
    n_vocab = df_ds.count()

    if n_vocab <= broadcast_limit:
        df_ref = ray.put({r["word"]: int(r["df"])
                          for r in df_ds.take_all()})

        def topk(t: pa.Table) -> pa.Table:
            df_map = ray.get(df_ref)  # broadcast once; local-store read
            ids, words, tfs, dfs = [], [], [], []
            for did, text in zip(
                t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
            ):
                c = Counter(w.lower() for w in RE_WORD.findall(text or ""))
                scored = [
                    (w, n, df_map[w]) for w, n in c.items() if w in df_map
                ]
                scored.sort(key=lambda x: (-x[1], x[2], x[0]))
                for w, n, d in scored[:k]:
                    ids.append(did)
                    words.append(w)
                    tfs.append(n)
                    dfs.append(d)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "word": pa.array(words, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
            })

        return ds.map_batches(topk, batch_format="pyarrow")

    # keyed-join fallback: the pruned DF table outgrew a broadcast. Tag the
    # per-doc distinct (word, tf) rows and the DF rows into one stream,
    # coarse-shuffle on hash(word) % P to resolve each word's df inside its
    # partition (words without a surviving DF row drop there), then ONE
    # doc-keyed shuffle ranks and cuts top-k per document.
    from .dedup import _num_coarse_partitions
    from .fuzzyjoin import _string_hash

    # partition count scales with the corpus (bounded rows per resolve /
    # top-k group at any size) and an explicit num_partitions is honored
    # verbatim — a fixed floor would put ~1/64 of ALL distinct doc-word
    # pairs in one group at exactly the web scale that triggers this path
    P = _num_coarse_partitions(ds, num_partitions, None,
                               rows_per_partition=2000)

    def tf_rows(t: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for did, text in zip(
            pc.cast(t.column(id_col), pa.int64()).to_pylist(),
            t.column(text_col).to_pylist(),
        ):
            c = Counter(w.lower() for w in RE_WORD.findall(text or ""))
            for w, n in c.items():
                ids.append(did)
                words.append(w)
                tfs.append(n)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
            "df": pa.nulls(len(ids), pa.int64()),
        })

    def tag_df(t: pa.Table) -> pa.Table:
        return pa.table({
            "word": t.column("word"),
            "doc_id": pa.nulls(t.num_rows, pa.int64()),
            "tf": pa.nulls(t.num_rows, pa.int64()),
            "df": pc.cast(t.column("df"), pa.int64()),
        })

    def add_coarse(t: pa.Table) -> pa.Table:
        h = _string_hash(t.column("word"))
        return t.append_column(
            "_coarse", pa.array((h % np.uint64(P)).astype(np.int64)))

    def resolve_df(g: pa.Table) -> pa.Table:
        is_df = pc.is_valid(g.column("df"))
        dfs = g.filter(is_df)
        df_map = dict(zip(dfs.column("word").to_pylist(),
                          dfs.column("df").to_pylist()))
        rows = g.filter(pc.invert(is_df))
        words = rows.column("word").to_pylist()
        hit = [w in df_map for w in words]
        rows = rows.filter(pa.array(hit, pa.bool_()))
        return pa.table({
            "doc_id": pc.cast(rows.column("doc_id"), pa.int64()),
            "word": rows.column("word"),
            "tf": pc.cast(rows.column("tf"), pa.int64()),
            "df": pa.array([df_map[w] for w, h in zip(words, hit) if h],
                           pa.int64()),
        })

    resolved = (
        ds.map_batches(tf_rows, batch_format="pyarrow")
        .union(df_ds.map_batches(tag_df, batch_format="pyarrow"))
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(resolve_df, batch_format="pyarrow")
    )

    def doc_coarse(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False)
        c = (d.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            % np.uint64(P)
        return t.append_column("_dc", pa.array(c.astype(np.int64)))

    def doc_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "word": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            })
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        tf = g.column("tf").to_numpy(zero_copy_only=False)
        dfv = g.column("df").to_numpy(zero_copy_only=False)
        # RE_WORD tokens are pure ASCII letters: numpy '<U' code-point
        # order == the broadcast path's Python str sort
        w = np.asarray(g.column("word").to_pylist(), dtype=str)
        order = np.lexsort((w, dfv, -tf, d))
        ds_, tfs_, dfs_, ws_ = d[order], tf[order], dfv[order], w[order]
        new = np.ones(len(order), dtype=bool)
        new[1:] = ds_[1:] != ds_[:-1]
        idx = np.arange(len(order), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new, idx, 0))
        keep = (idx - run_start) < k
        return pa.table({
            "doc_id": pa.array(ds_[keep], pa.int64()),
            "word": pa.array(ws_[keep], pa.string()),
            "tf": pa.array(tfs_[keep], pa.int64()),
            "df": pa.array(dfs_[keep], pa.int64()),
        })

    return (
        resolved.map_batches(doc_coarse, batch_format="pyarrow")
        .groupby("_dc")
        .map_groups(
            lambda g: doc_topk(g.drop_columns(["_dc"])),
            batch_format="pyarrow")
    )


def doc_top_terms(ds, k: int = 5, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document top-k terms by term frequency (ties broken
    alphabetically) — the TF side of TF-IDF keyword extraction. Tokenization
    matches the wordcount family (``RE_WORD`` lowercased).

    Scale shape: embarrassingly parallel — TF and the top-k cut are local
    to each document, so this is a pure ``map_batches`` with NO shuffle;
    output is at most k rows per doc. SQL equivalent: ``row_number() OVER
    (PARTITION BY doc ORDER BY tf DESC, word) <= k``.
    → Dataset(doc_id, word, tf).
    """
    from collections import Counter

    from nightcrawlercmd_ray.functions.extractors import RE_WORD

    def partial(t: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for did, text in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            c = Counter(w.lower() for w in RE_WORD.findall(text or ""))
            for w, n in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]:
                ids.append(did)
                words.append(w)
                tfs.append(n)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "word": pa.array(words, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow")


def gopher_quality_signals(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition/quality signals per document (Rae et al.
    2021 §A1.1 repetition filters, the standard web-text curation battery):
    word count, mean word length, duplicate-line fraction (by lines and by
    characters), bullet/ellipsis line fractions, duplicate word-3-gram
    fraction. Pure per-batch map — ZERO shuffle; every value is an exact
    integer ratio (single IEEE division of int aggregates), so the whole
    battery is SQL-oracle-able bit-for-bit
    (``queries()['gopher_quality_documents']``).

    Tokenization contract (shared with the oracle): words = split on a
    single space; lines = split on '\\n'; bullet = line lstrip(' ') starts
    with '-' or '*' (DuckDB ``trim`` strips spaces only); ellipsis = line
    endswith '...'."""

    def sig(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        cols: dict[str, list] = {
            "n_words": [], "mean_word_len": [], "frac_dup_lines": [],
            "frac_dup_line_chars": [], "frac_bullet_lines": [],
            "frac_ellipsis_lines": [], "frac_dup_3grams": [],
        }
        for x in t.column(text_col).to_pylist():
            s = x or ""
            ws = s.split(" ")
            n_words = len(ws)  # split never yields [] — '' → ['']
            cols["n_words"].append(n_words)
            cols["mean_word_len"].append(sum(map(len, ws)) / n_words)
            ls = s.split("\n")
            n_lines = len(ls)
            distinct = set(ls)
            cols["frac_dup_lines"].append((n_lines - len(distinct)) / n_lines)
            tot_chars = sum(map(len, ls))
            dist_chars = sum(map(len, distinct))
            cols["frac_dup_line_chars"].append(
                (tot_chars - dist_chars) / max(tot_chars, 1))
            cols["frac_bullet_lines"].append(
                sum(1 for l in ls if l.lstrip(" ").startswith(("-", "*")))
                / n_lines)
            cols["frac_ellipsis_lines"].append(
                sum(1 for l in ls if l.endswith("...")) / n_lines)
            n_tg = n_words - 2
            if n_tg > 0:
                tgs = {" ".join(ws[i:i + 3]) for i in range(n_tg)}
                cols["frac_dup_3grams"].append((n_tg - len(tgs)) / n_tg)
            else:
                cols["frac_dup_3grams"].append(0.0)
        out = {id_col: ids, "n_words": pa.array(cols["n_words"], pa.int64())}
        for k in ("mean_word_len", "frac_dup_lines", "frac_dup_line_chars",
                  "frac_bullet_lines", "frac_ellipsis_lines",
                  "frac_dup_3grams"):
            out[k] = pa.array(cols[k], pa.float64())
        return pa.table(out)

    return ds.map_batches(sig, batch_format="pyarrow")


def top_word_ranks(ds, text_col: str, top_v: int) -> dict[str, int]:
    """Top-``top_v`` corpus vocabulary by (count desc, word asc — a total
    order) → {word: 1-based rank}. The shared vocabulary pass of
    ``word_rank_buckets`` and ``linear_classifier_scores`` (their SQL
    oracles replicate this exact ranking, so the total order lives in ONE
    place). ONE word-keyed shuffle with per-batch Counter combiners; the
    driver pull is capped at ``top_v`` rows BY CONSTRUCTION (sort+limit
    before ``take_all``) regardless of corpus size."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..functions.extractors import RE_WORD

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(w.lower() for w in RE_WORD.findall(text or ""))
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    top = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(top_v)
        .take_all()
    )
    top.sort(key=lambda r: (-r["n"], r["word"]))  # driver re-sort: determinism
    return {r["word"]: i + 1 for i, r in enumerate(top)}


def word_rank_buckets(ds, text_col: str = "text", id_col: str = "doc_id", *,
                      top_v: int = 10, head_max: int = 9,
                      middle_max: int = 10):
    """CCNet-style corpus quality bucketing (Wenzek et al. 2020: score each
    doc with a language model trained on trusted text, split the corpus
    into head/middle/tail by perplexity). The LM here is an integer-only
    proxy so the DuckDB oracle hashes bit-exact: words are ranked 1..top_v
    by corpus frequency (count desc, word asc — a total order), words
    outside the top-``top_v`` score ``top_v+1``, a doc's score is the SUM
    of its words' ranks, and buckets come from integer cross-multiplied
    mean-rank thresholds (``sum_rank <= head_max * n_tokens`` → head, ...
    ``<= middle_max * n_tokens`` → middle, else tail; zero-token docs are
    head by the same comparison). Tokenization = the wordcount family
    (``RE_WORD`` lowercased).

    Scale shape: the shared ``top_word_ranks`` vocabulary pass (ONE
    word-keyed shuffle, bounded broadcast); scoring is a pure per-batch
    map — zero further shuffle.
    → Dataset(doc_id, n_tokens, sum_rank, bucket)."""
    import ray

    from ..functions.extractors import RE_WORD

    rank_ref = ray.put(top_word_ranks(ds, text_col, top_v))
    unk = top_v + 1

    def score(t: pa.Table) -> pa.Table:
        rank = ray.get(rank_ref)
        nt, sr, bk = [], [], []
        for text in t.column(text_col).to_pylist():
            ws = RE_WORD.findall(text or "")
            n = len(ws)
            s = sum(rank.get(w.lower(), unk) for w in ws)
            nt.append(n)
            sr.append(s)
            bk.append("head" if s <= head_max * n
                      else "middle" if s <= middle_max * n else "tail")
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "sum_rank": pa.array(sr, pa.int64()),
            "bucket": pa.array(bk, pa.string()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def linear_classifier_scores(ds, *, n_classes: int = 3, vocab_size: int = 256,
                             text_col: str = "text", id_col: str = "doc_id",
                             weight_mod: int = 201):
    """fastText-style linear text-classifier INFERENCE at corpus scale —
    the "run a quality/topic classifier over every document" stage of a
    training-data pipeline (Joulin et al. 2017 shape: bag-of-words →
    weight-table lookup → per-class sum → argmax).

    The weight table here is a deterministic integer function of each
    word's corpus-frequency rank, standing in for trained weights:
    ``W[r, c] = ((r·C + c)·2654435761) mod 2^32 mod weight_mod − offset``
    with ``offset = (weight_mod−1)//2``. The broadcast + vectorized-scoring
    plumbing is the real operator (a trained weight matrix drops in
    unchanged); the synthetic weights make every score integer-exact and
    the whole pipeline SQL-replicable for the value oracle.

    Semantics: vocabulary = top ``vocab_size`` words by (count desc, word
    asc) over the RE_WORD-lowercased token stream, ranked r = 1..V; OOV
    tokens contribute nothing; ``score(doc, c) = Σ_occurrences W[rank, c]``;
    ``pred`` = argmax with ties to the lowest class.

    Scale shape: the shared ``top_word_ranks`` vocabulary pass (ONE
    word-keyed shuffle, bounded broadcast); scoring is a pure per-batch
    map (bincount over ranks × a (V+1)×C numpy matmul per doc).
    → Dataset(doc_id, n_hits, s0..s{C-1}, pred)."""
    import ray

    from ..functions.extractors import RE_WORD

    C, V, mod = int(n_classes), int(vocab_size), int(weight_mod)
    offset = (mod - 1) // 2

    rank_ref = ray.put(top_word_ranks(ds, text_col, V))
    # W[0] is the OOV row and stays 0 (OOV contributes nothing)
    r_idx = np.arange(1, V + 1, dtype=np.uint64)[:, None]
    c_idx = np.arange(C, dtype=np.uint64)[None, :]
    W = np.zeros((V + 1, C), dtype=np.int64)
    W[1:] = (((r_idx * np.uint64(C) + c_idx) * np.uint64(2654435761))
             & np.uint64(0xFFFFFFFF)).astype(np.int64) % mod - offset

    def score(t: pa.Table) -> pa.Table:
        rank = ray.get(rank_ref)
        n_rows = t.num_rows
        hits = np.zeros(n_rows, dtype=np.int64)
        scores = np.zeros((n_rows, C), dtype=np.int64)
        for i, text in enumerate(t.column(text_col).to_pylist()):
            ranks = [rank.get(w.lower(), 0) for w in RE_WORD.findall(text or "")]
            if not ranks:
                continue
            counts = np.bincount(ranks, minlength=V + 1).astype(np.int64)
            hits[i] = len(ranks) - counts[0]
            scores[i] = counts @ W
        cols = {id_col: pc.cast(t.column(id_col), pa.int64()),
                "n_hits": pa.array(hits, pa.int64())}
        for c in range(C):
            cols[f"s{c}"] = pa.array(scores[:, c], pa.int64())
        cols["pred"] = pa.array(np.argmax(scores, axis=1), pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_scores(ds, *, target_lang: str = "en", text_col: str = "text",
                id_col: str = "doc_id", lang_col: str = "lang",
                n_buckets: int | None = None):
    """DSIR-style importance scoring for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling": weight
    raw examples by how target-like their hashed-n-gram feature counts
    are). Features are word bigrams (the ``bigram_counts`` tokenizer:
    ``[a-z]+`` runs of the lowercase text); the target distribution is the
    ``lang_col == target_lang`` slice of the corpus, the raw distribution
    is the whole corpus.

    Outputs INTEGER mass sums rather than a float log-ratio so the DuckDB
    oracle hashes bit-exact: per doc, ``tgt_mass = Σ_occurrences
    target_count(bigram)`` and ``raw_mass = Σ_occurrences
    raw_count(bigram)`` — the importance ratio is ``tgt_mass/raw_mass``
    downstream, monotone in these sums.

    Scale shape: ONE bigram-keyed shuffle builds (bigram, raw_n, tgt_n)
    from per-batch combiners; scoring is a pure per-batch map against the
    broadcast table. With ``n_buckets=None`` features are the exact bigram
    strings (oracle mode — broadcast ∝ distinct bigrams); at the 100 TB
    design point pass ``n_buckets=K`` (DSIR's actual construction): bigrams
    hash into K buckets via the vectorized xxhash path so the broadcast
    table is EXACTLY K rows regardless of corpus size.
    → Dataset(doc_id, n_bigrams, raw_mass, tgt_mass)."""
    import re
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    word_re = re.compile(r"[a-z]+")

    def _feats(text: str) -> list:
        toks = word_re.findall((text or "").lower())
        feats = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if n_buckets is None:
            return feats
        import polars as pl

        if not feats:
            return []
        h = pl.Series(feats).hash(seed=0).to_numpy()
        return (h % np.uint64(n_buckets)).astype(np.int64).tolist()

    def partial(t: pa.Table) -> pa.Table:
        raw: Counter = Counter()
        tgt: Counter = Counter()
        for lang, text in zip(t.column(lang_col).to_pylist(),
                              t.column(text_col).to_pylist()):
            fs = _feats(text)
            raw.update(fs)
            if lang == target_lang:
                tgt.update(fs)
        keys = list(raw.keys())
        ftype = pa.string() if n_buckets is None else pa.int64()
        return pa.table({
            "f": pa.array(keys, ftype),
            "raw_n": pa.array([raw[k] for k in keys], pa.int64()),
            "tgt_n": pa.array([tgt[k] for k in keys], pa.int64()),
        })

    table = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum("raw_n", alias_name="raw_n"),
                   Sum("tgt_n", alias_name="tgt_n"))
        .take_all()
    )
    ref = ray.put({r["f"]: (r["raw_n"], r["tgt_n"]) for r in table})

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        nb, raw_mass, tgt_mass = [], [], []
        for text in t.column(text_col).to_pylist():
            fs = _feats(text)
            nb.append(len(fs))
            raw_mass.append(sum(m[f][0] for f in fs))
            tgt_mass.append(sum(m[f][1] for f in fs))
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()),
            "n_bigrams": pa.array(nb, pa.int64()),
            "raw_mass": pa.array(raw_mass, pa.int64()),
            "tgt_mass": pa.array(tgt_mass, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# BM25 ranked retrieval
# --------------------------------------------------------------------------- #
def bm25_topk(
    ds,
    queries: list[tuple[int, str]],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """BM25 ranked retrieval (Robertson & Zaragoza 2009, the Okapi
    formula with the +1 idf floor: idf = ln(1 + (N - df + ½)/(df + ½)))
    for a SMALL broadcast query set → pyarrow Table(query_id, rank,
    doc_id, score), rank 1-based, ties broken by doc_id ascending.
    Tokenization matches the wordcount family (``RE_WORD``, lowercased).

    Scale shape (two passes, no shuffle):
    1. stats pass — per-batch combiner emits (N_docs, Σ doc_len) scalars
       and df partials RESTRICTED to the query vocabulary (bounded by
       |query terms|, not corpus vocabulary); driver folds a tiny table.
    2. score pass — idf/avgdl broadcast once (``ray.put``); per batch,
       per-doc scores are computed in fixed query-term order (so each
       doc's float score is partition-invariant) and only the batch-local
       top-k per query leaves the task; the driver folds blocks×k×|queries|
       rows — the knn_brute_force pattern.
    """
    import ray

    from collections import Counter

    from nightcrawlercmd_ray.functions.extractors import RE_WORD

    qterms: dict[int, list[str]] = {
        qid: [w.lower() for w in RE_WORD.findall(q)] for qid, q in queries
    }
    vocab = sorted({t for ts in qterms.values() for t in ts})
    if not vocab:
        raise ValueError("bm25_topk: queries contain no indexable terms")
    vset = frozenset(vocab)

    def stats_partial(t: pa.Table) -> pa.Table:
        df_c: Counter = Counter()
        n_docs = t.num_rows
        total_len = 0
        for text in t.column(text_col).to_pylist():
            ws = [w.lower() for w in RE_WORD.findall(text or "")]
            total_len += len(ws)
            df_c.update(set(ws) & vset)
        words = list(df_c.keys())
        return pa.table({
            "word": pa.array(["\0N", "\0L"] + words, pa.string()),
            "n": pa.array([n_docs, total_len] + [df_c[w] for w in words],
                          pa.int64()),
        })

    stats = dict(
        (r["word"], r["n"])
        for r in ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("word").sum("n")
        .map_batches(lambda t: t.rename_columns(["word", "n"]),
                     batch_format="pyarrow")
        .take_all()
    )
    n_total = int(stats.pop("\0N", 0))
    total_len = int(stats.pop("\0L", 0))
    if n_total == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    avgdl = total_len / n_total if n_total else 1.0
    idf = {w: float(np.log1p((n_total - stats.get(w, 0) + 0.5)
                             / (stats.get(w, 0) + 0.5)))
           for w in vocab}
    model_ref = ray.put({"qterms": qterms, "idf": idf, "avgdl": avgdl,
                         "k1": k1, "b": b, "k": k})

    def score_partial(t: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        qt, idf_, avgdl_ = m["qterms"], m["idf"], m["avgdl"]
        k1_, b_, k_ = m["k1"], m["b"], m["k"]
        ids = pc.cast(t.column(id_col), pa.int64()).to_pylist()
        out_q, out_d, out_s = [], [], []
        rows: dict[int, list[tuple[float, int]]] = {qid: [] for qid in qt}
        for did, text in zip(ids, t.column(text_col).to_pylist()):
            tf = Counter(w.lower() for w in RE_WORD.findall(text or ""))
            dl = sum(tf.values())
            norm = k1_ * (1.0 - b_ + b_ * dl / avgdl_)
            for qid, terms in qt.items():
                s = 0.0
                for w in terms:  # fixed term order → partition-invariant
                    f = tf.get(w, 0)
                    if f:
                        s += idf_[w] * (f * (k1_ + 1.0)) / (f + norm)
                if s > 0.0:
                    rows[qid].append((s, did))
        for qid, lst in rows.items():
            # batch-local top-k: score desc, doc_id asc
            lst.sort(key=lambda x: (-x[0], x[1]))
            for s, did in lst[:k_]:
                out_q.append(qid)
                out_d.append(did)
                out_s.append(s)
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    # driver fold: blocks × k × |queries| rows
    best: dict[int, list[tuple[float, int]]] = {qid: [] for qid in qterms}
    for r in ds.map_batches(score_partial,
                            batch_format="pyarrow").take_all():
        best[r["query_id"]].append((r["score"], r["doc_id"]))
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid in sorted(best):
        lst = sorted(best[qid], key=lambda x: (-x[0], x[1]))[:k]
        for i, (s, did) in enumerate(lst, start=1):
            out_q.append(qid)
            out_r.append(i)
            out_d.append(did)
            out_s.append(s)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "score": pa.array(out_s, pa.float64())})


def pmi_bigrams(ds, *, text_col: str = "text", min_count: int = 5,
                k: int = 100):
    """Top-k word pairs by pointwise mutual information ratio
    ``(c_xy · N) / (c_x · c_y)`` — the collocation statistic (word2vec /
    phrase-mining lineage; the log is monotone, so ranking by the ratio IS
    ranking by PMI and keeps the score SQL-replicable: every factor is an
    exact-int double and the two multiplies + one divide happen in the
    same tree shape in both engines → bit-identical doubles).

    Scale shape: unigram + bigram counts are the standard per-batch-Counter
    → one-keyed-shuffle passes; N folds to a driver scalar. The unigram
    table broadcast is pruned to words with ``c ≥ min_count`` — SOUND,
    because a bigram with ``c_xy ≥ min_count`` implies both words have
    ``c ≥ min_count`` — which keeps it vocabulary-sized (the tfidf
    broadcast argument; swap for a keyed join if a corpus outgrows it).
    → Table(bigram, c_xy, pmi_ratio) — top k by (ratio desc, bigram asc).
    """
    import re
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    word_re = re.compile(r"[a-z]+")

    def uni_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(word_re.findall((text or "").lower()))
        return pa.table({"w": pa.array(list(c.keys()), pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()  # vocabulary-sized; consumed twice below — without
        # this the full corpus tokenization would re-execute per consumer
    )
    total = uni.sum("c")  # driver scalar: total token occurrences
    mc = pa.scalar(int(min_count), pa.int64())
    pruned = uni.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("c"), mc)),
        batch_format="pyarrow",
    ).take_all()
    counts_ref = ray.put({r["w"]: r["c"] for r in pruned})

    bg = bigram_counts(ds, text_col=text_col)

    def score(t: pa.Table) -> pa.Table:
        cdict = ray.get(counts_ref)
        keep = pc.greater_equal(t.column("n"), pa.scalar(int(min_count)))
        t = t.filter(keep)
        w1 = t.column("w1").to_pylist()
        w2 = t.column("w2").to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = np.array([cdict[w] for w in w1], dtype=np.float64)
        c2 = np.array([cdict[w] for w in w2], dtype=np.float64)
        ratio = (n * float(total)) / (c1 * c2) if len(n) else n
        return pa.table({
            "bigram": pa.array([f"{a} {b}" for a, b in zip(w1, w2)],
                               pa.string()),
            "c_xy": pa.array(n.astype(np.int64)),
            "pmi_ratio": pa.array(ratio, pa.float64()),
        })

    return (
        bg.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_ratio", "bigram"], descending=[True, False])
        .limit(int(k))
    )


def trending_terms(old_ds, new_ds, *, text_col: str = "text", k: int = 50):
    """Term drift between two corpus snapshots — the "what changed since
    the last crawl" statistic: per-word counts in each version, ranked by
    the smoothed rise ratio ``(c_new+1)/(c_old+1)`` (one exact-int IEEE
    division → bit-identical across engines; words absent from a version
    count 0). Tokenization = the wordcount family (RE_WORD lowercased).

    Scale shape: both versions stream through per-batch Counter combiners
    into ONE shared word-keyed shuffle (old emits (word, c, 0), new emits
    (word, 0, c) — the groupby's column sums ARE the full-outer join);
    ranking is a sort+limit over |vocabulary| rows.
    → Dataset(word, c_old, c_new, rise) — top k by (rise desc, word asc).
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..functions.extractors import RE_WORD

    def partial(which: int):
        def fn(t: pa.Table) -> pa.Table:
            c: Counter = Counter()
            for text in t.column(text_col).to_pylist():
                c.update(w.lower() for w in RE_WORD.findall(text or ""))
            vals = np.fromiter(c.values(), dtype=np.int64, count=len(c))
            zero = np.zeros(len(c), dtype=np.int64)
            return pa.table({
                "word": pa.array(list(c.keys()), pa.string()),
                "c_old": pa.array(vals if which == 0 else zero),
                "c_new": pa.array(vals if which == 1 else zero),
            })

        return fn

    merged = (
        old_ds.map_batches(partial(0), batch_format="pyarrow")
        .union(new_ds.map_batches(partial(1), batch_format="pyarrow"))
        .groupby("word")
        .aggregate(Sum("c_old", alias_name="c_old"),
                   Sum("c_new", alias_name="c_new"))
    )

    def score(t: pa.Table) -> pa.Table:
        co = t.column("c_old").to_numpy(zero_copy_only=False).astype(np.float64)
        cn = t.column("c_new").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("rise", pa.array((cn + 1.0) / (co + 1.0),
                                                pa.float64()))

    return (
        merged.map_batches(score, batch_format="pyarrow")
        .sort(["rise", "word"], descending=[True, False])
        .limit(int(k))
    )


def bigram_fluency(
    train_ds,
    score_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    backoff_num: int = 2,
    backoff_den: int = 5,
    min_count: int = 1,
    broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
):
    """Average next-word probability under a corpus-trained bigram model
    with stupid-backoff to unigrams (Brants et al. 2007 shape) — the cheap
    LM-fluency signal of a CCNet-style curation stack, in EXACT integer
    arithmetic so the SQL oracle hash-matches bit-for-bit:

    per adjacent token pair (x, y) of a scored doc (``[a-z]+`` runs of the
    lowercased text — the pinned bigram-family tokenizer)::

        s = (scale · c_xy) // c_x                 if bigram (x,y) in train
          = (scale·bn//bd · c_y) // N             elif unigram y in train
          = 0                                     otherwise

    where c are TRAIN-side counts, N the train token total; per doc emit
    ``n_pairs``, ``fluency_sum`` = Σs and ``avg_fluency`` = Σs // n_pairs
    (docs with no pair are dropped). Training on a snapshot and scoring the
    full corpus makes both backoff branches fire.

    Scale shape: both count passes are per-batch Counter combiners → ONE
    ``groupby.sum`` each (exchanges carry distinct n-grams only). The
    UNIGRAM table is vocabulary-sized and always broadcast (``ray.put``).
    The BIGRAM table is ``min_count``-pruned (a spec'd knob — pruned
    bigrams fall to the unigram backoff branch, exactly as an unseen
    bigram would; default 1 = no pruning, which is what the SQL oracle
    pins) and then EITHER broadcast when ≤ ``broadcast_limit`` distinct
    bigrams survive (the fast path) OR, past the limit, joined to the
    scored docs' pair stream by a coarse (w1, w2)-keyed shuffle — exchange
    volume O(total pairs), never a driver-side or broadcast copy of an
    unbounded bigram table (r3 verdict #3: the fallback used to be
    documented but unimplemented). Both paths are bit-identical (pinned in
    tests/test_textops_fluency.py with the join path forced).
    → Dataset(doc_id, n_pairs, fluency_sum, avg_fluency), all int64.
    """
    import re
    from collections import Counter

    import ray

    word_re = re.compile(r"[a-z]+")

    def unigram_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        total = 0
        for text in t.column(text_col).to_pylist():
            toks = word_re.findall((text or "").lower())
            total += len(toks)
            c.update(toks)
        return pa.table({
            "w": pa.array(list(c.keys()) + [""], pa.string()),
            "n": pa.array(list(c.values()) + [total], pa.int64()),
        })  # "" row carries the batch's token total through the same shuffle

    ug_rows = (
        train_ds.map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("w").sum("n")
        .take_all()
    )
    ug = {r["w"]: r["sum(n)"] for r in ug_rows}
    n_total = ug.pop("", 0)
    ug_ref = ray.put(ug)
    backoff_scale = scale * backoff_num // backoff_den

    bg_ds = bigram_counts(train_ds, text_col=text_col)
    if min_count > 1:
        bg_ds = bg_ds.filter(
            expr=f"n >= {int(min_count)}")
    bg_ds = bg_ds.materialize()
    n_bg = bg_ds.count()

    if n_bg <= broadcast_limit:
        bg = {(r["w1"], r["w2"]): r["n"] for r in bg_ds.take_all()}
        bg_ref = ray.put(bg)

        def score(t: pa.Table) -> pa.Table:
            ug_d = ray.get(ug_ref)  # broadcast once; local-store read
            bg_d = ray.get(bg_ref)
            ids, nps, sums, avgs = [], [], [], []
            for did, text in zip(
                pc.cast(t.column(id_col), pa.int64()).to_pylist(),
                t.column(text_col).to_pylist(),
            ):
                toks = word_re.findall((text or "").lower())
                if len(toks) < 2:
                    continue
                s_sum = 0
                for x, y in zip(toks, toks[1:]):
                    cxy = bg_d.get((x, y))
                    if cxy is not None:
                        s_sum += (scale * cxy) // ug_d[x]
                    else:
                        cy = ug_d.get(y)
                        if cy is not None:
                            s_sum += (backoff_scale * cy) // n_total
                n_pairs = len(toks) - 1
                ids.append(did)
                nps.append(n_pairs)
                sums.append(s_sum)
                avgs.append(s_sum // n_pairs)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_pairs": pa.array(nps, pa.int64()),
                "fluency_sum": pa.array(sums, pa.int64()),
                "avg_fluency": pa.array(avgs, pa.int64()),
            })

        return score_ds.map_batches(score, batch_format="pyarrow")

    # keyed-join fallback: the pruned bigram table outgrew a broadcast.
    # Tag both streams, coarse-shuffle on hash(w1,w2) % P, resolve each
    # pair's c_xy inside its partition, partial-aggregate per doc there,
    # then ONE small (doc_id)-keyed sum. Unigrams stay broadcast (vocab ≪
    # bigrams); per-pair scores need only c_xy from the shuffled side.
    from ray.data.aggregate import Sum

    from .dedup import _num_coarse_partitions
    from .fuzzyjoin import _string_hash

    # partition count scales with the scored corpus (bounded rows per
    # resolve group at any size) and an explicit num_partitions is honored
    # verbatim — a fixed floor would concentrate ~1/64 of ALL pair rows in
    # one group at exactly the web scale that triggers this path
    P = _num_coarse_partitions(score_ds, num_partitions, None,
                               rows_per_partition=2000)

    def pair_rows(t: pa.Table) -> pa.Table:
        ids, w1s, w2s = [], [], []
        for did, text in zip(
            pc.cast(t.column(id_col), pa.int64()).to_pylist(),
            t.column(text_col).to_pylist(),
        ):
            toks = word_re.findall((text or "").lower())
            for x, y in zip(toks, toks[1:]):
                ids.append(did)
                w1s.append(x)
                w2s.append(y)
        return pa.table({
            "w1": pa.array(w1s, pa.string()),
            "w2": pa.array(w2s, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "n": pa.nulls(len(ids), pa.int64()),
        })

    def tag_counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "w1": t.column("w1"),
            "w2": t.column("w2"),
            "doc_id": pa.nulls(t.num_rows, pa.int64()),
            "n": t.column("n"),
        })

    def add_coarse(t: pa.Table) -> pa.Table:
        h = _string_hash(t.column("w1")) * np.uint64(0x9E3779B97F4A7C15)
        h ^= _string_hash(t.column("w2"))
        return t.append_column(
            "_coarse", pa.array((h % np.uint64(P)).astype(np.int64)))

    def resolve_partition(g: pa.Table) -> pa.Table:
        ug_d = ray.get(ug_ref)
        is_count = pc.is_valid(g.column("n"))
        cnt = g.filter(is_count)
        bg_d = dict(zip(
            zip(cnt.column("w1").to_pylist(), cnt.column("w2").to_pylist()),
            cnt.column("n").to_pylist()))
        pairs = g.filter(pc.invert(is_count))
        sums: Counter = Counter()
        nps: Counter = Counter()
        for did, x, y in zip(
            pairs.column("doc_id").to_pylist(),
            pairs.column("w1").to_pylist(),
            pairs.column("w2").to_pylist(),
        ):
            nps[did] += 1
            cxy = bg_d.get((x, y))
            if cxy is not None:
                sums[did] += (scale * cxy) // ug_d[x]
            else:
                cy = ug_d.get(y)
                if cy is not None:
                    sums[did] += (backoff_scale * cy) // n_total
        ids = sorted(nps)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_pairs": pa.array([nps[i] for i in ids], pa.int64()),
            "fluency_sum": pa.array([sums[i] for i in ids], pa.int64()),
        })

    partials = (
        score_ds.map_batches(pair_rows, batch_format="pyarrow")
        .union(bg_ds.map_batches(tag_counts, batch_format="pyarrow"))
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(resolve_partition, batch_format="pyarrow")
    )

    def finish(t: pa.Table) -> pa.Table:
        np_ = t.column("n_pairs").to_numpy(zero_copy_only=False)
        s = t.column("fluency_sum").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_pairs": pa.array(np_, pa.int64()),
            "fluency_sum": pa.array(s, pa.int64()),
            "avg_fluency": pa.array(s // np_, pa.int64()),
        })

    return (
        partials.groupby("doc_id")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                   Sum("fluency_sum", alias_name="fluency_sum"))
        .map_batches(finish, batch_format="pyarrow")
    )
